"""Streaming upsert sink — the reference's S8 vector-store upsert
(`streamlit_app.py:108-121`, Pinecone `index.upsert` with retry)
re-expressed as a continuously-ingesting Structured Streaming sink:
stream -> foreachBatch -> last-writer-wins upsert into a parquet
store.

Exactly-once story: the foreachBatch body is a read-modify-write of
the whole store keyed by (id, version) LWW — IDEMPOTENT, so Spark's
at-least-once foreachBatch contract composes to exactly-once table
state (a replayed batch converges to the same table). Combined with
the checkpoint's offset log, a crashed-and-restarted query resumes
without losing or double-applying updates — the property
tests/test_streaming_upsert.py drives end to end.

At 100 TB the full-rewrite store below becomes a partitioned MERGE
(operators/upsert.upsert_cocluster rewrites only touched buckets);
the sink contract — idempotent LWW merge per micro-batch — is
unchanged, which is the point of routing every batch through the
same `upsert()` operator the batch path certifies.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.upsert import upsert
from ..storeswap import recover_store, swap_store, tmp_store

VECTOR_SCHEMA = "id string, doc_id long, ingest_version long, text string"


def apply_upsert_batch(
    spark: SparkSession,
    store_dir: str,
    batch: DataFrame,
    id_col: str = "id",
    version_col: str = "ingest_version",
) -> None:
    """One idempotent LWW merge of ``batch`` into the parquet store.
    Write-then-swap via the storeswap recover/swap protocol: a crash
    mid-write leaves the previous store intact, and a crash inside
    the rename-aside window is rolled back by recover_store before
    the next merge reads the store (LWW is idempotent, so the rolled-
    back batch re-applies for free) — the streaming twin of the batch
    store's marker-file ordering (operators/ann.py)."""
    recover_store(store_dir)
    if os.path.isdir(store_dir):
        existing = spark.read.parquet(store_dir)
        merged = upsert(existing, batch, id_col=id_col, version_col=version_col)
    else:
        merged = upsert(
            batch.limit(0), batch, id_col=id_col, version_col=version_col
        )
    tmp = tmp_store(store_dir)
    merged.write.mode("overwrite").parquet(tmp)
    swap_store(store_dir, tmp)


def run_upsert_stream(
    spark: SparkSession,
    src_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    query_name: str = "upsert_stream",
    schema: str = VECTOR_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain all currently-available files from ``src_dir`` into the
    store, one idempotent LWW merge per micro-batch; re-invoking with
    the same checkpoint resumes after a crash."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(src_dir)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        apply_upsert_batch(spark, store_dir, batch_df)

    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(_sink)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


UPSERT_STREAM_SCHEMA = "id string, text string, ingest_version long"


def streamed_upsert_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-query path: materialize the S8 fixture's existing table
    and update batch as two parquet files in a fingerprint-keyed
    landing dir, stream them through the LWW upsert sink (one
    micro-batch per file — the continuous-ingest shape), and return
    the final store. The landing + checkpoint + store build runs
    through the shared versioned-store core (store.ensure_store_dir —
    r10 review: the previous hand-rolled marker protocol deleted the
    live store IN PLACE before the stream rewrote it, exactly the
    reader-race window the versioned data dirs were introduced to
    close, and duplicated the crash-safety logic); the fingerprint
    salt folds in this module's code token, so a sink/kernel change
    rebuilds the store instead of serving one an old kernel wrote.

    The result equals upsert_compact's LWW compact by construction
    (versions differ on every colliding id, so micro-batch boundaries
    can't change the outcome) — the shared oracle certifies the whole
    write -> stream -> merge-per-batch -> store loop.
    """
    import glob
    import shutil
    import sys

    from ..io import table_path
    from ..operators.ann import INDEX_ROOT, dataset_dir_key, dataset_fingerprint
    from ..store import code_token, ensure_store_dir

    # late import: queries.py imports this module's sibling package
    from ..queries import _upsert_fixture

    root = os.path.join(
        INDEX_ROOT, f"upsert_stream_{dataset_dir_key(sf_dir)}"
    )
    salt = (
        f"upsert_stream:{code_token(sys.modules[__name__], _upsert_fixture)}"
    )
    fp = dataset_fingerprint(table_path(sf_dir, "documents"), salt=salt)

    def build(data_dir: str) -> None:
        # underscore-prefixed subdirs are invisible to the parquet
        # reader; the store itself is a named subdir so a per-batch
        # mode=overwrite store rewrite can never clobber them
        landing = os.path.join(data_dir, "_landing")
        os.makedirs(landing, exist_ok=True)
        existing, batch = _upsert_fixture(spark, sf_dir)
        for name, df in (("00_existing", existing), ("01_batch", batch)):
            tmp = os.path.join(data_dir, f"_tmp_{name}")
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            os.rename(part, os.path.join(landing, f"{name}.parquet"))
            shutil.rmtree(tmp)
        run_upsert_stream(
            spark,
            landing,
            os.path.join(data_dir, "store"),
            os.path.join(data_dir, "_ckpt"),
            query_name="upsert_store_stream",
            schema=UPSERT_STREAM_SCHEMA,
            max_files_per_trigger=1,
        )

    data_dir = ensure_store_dir(root, fp, build)
    # one-time migration sweep: the pre-r10 hand-rolled layout left
    # 'store'/'landing'/'ckpt' at the root; ensure_store_dir's GC
    # deliberately never touches non-owned sibling names (r8 ADVICE),
    # so this root cleans up its own legacy dirs after the flip
    for legacy in ("store", "landing", "ckpt"):
        full = os.path.join(root, legacy)
        if os.path.isdir(full):
            shutil.rmtree(full, ignore_errors=True)
    return spark.read.parquet(os.path.join(data_dir, "store"))
