"""Streaming continuous aggregate — incremental MV maintenance driven
by foreachBatch.

Unlike the LWW upsert sink (idempotent merge => at-least-once replay
is free), an ADDITIVE aggregate merge is NOT idempotent: a replayed
micro-batch would double-count. Exactly-once here therefore uses the
other standard foreachBatch mechanism — a TRANSACTIONAL sink keyed on
batch_id: the store carries the last applied batch id inside the
store directory itself, and data and watermark move together through
the storeswap recover/swap protocol — rename(tmp, store) is the
single commit point and a crash in the rename-aside window is rolled
back by recover_store before the next watermark read — so a crash at
any point either keeps the old store (batch re-applies cleanly) or
the new one (batch is skipped on replay). Both exactly-once
mechanisms are covered by the suite, including a kill-in-the-window
crash test (tests/test_storeswap.py).

The merge itself is partition-local and additive: counts and
DECIMAL-carrier sums of the incoming batch fold into the standing MV
rows with one group-by over (MV ∪ batch-aggregate) — no base-table
rescan, which is what makes a continuous aggregate affordable at
100 TB ingest rates. Decimal addition is associative, so the final MV
equals a from-scratch GROUP BY over all facts bit-for-bit — the
driver oracle for stream_mv_refresh is exactly that recompute (shared
with mv_incremental_refresh).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..storeswap import recover_store, swap_store, tmp_store

MV_DEC = "decimal(27,6)"
ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string"
)


def _mv_agg(batch: DataFrame) -> DataFrame:
    return batch.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        "o_orderstatus",
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        # normalize the widened sum type back to the carrier so the
        # stored schema is stable across batches (union coercion aside)
        F.sum(F.col("o_totalprice").cast(MV_DEC)).cast(MV_DEC).alias("revenue_dec"),
    )


def apply_mv_batch(
    spark: SparkSession, store_dir: str, batch: DataFrame, batch_id: int
) -> None:
    """Fold one micro-batch into the MV store, exactly once.

    The batch-id watermark lives INSIDE the store dir (_meta.json), so
    the store swap commits data and watermark together. The swap is
    two renames (dir-over-dir replace is impossible on POSIX), so
    recover_store runs FIRST: a crash between the renames leaves a
    dangling .old that recovery rolls back before the watermark is
    read — see storeswap's window analysis; rename(tmp, store) is the
    commit point. A replayed batch with id <= the stored watermark is
    a no-op.

    Deliberately NOT store.read_marker: a fingerprint marker that
    fails to parse safely degrades to a rebuild, but a watermark that
    fails to parse must fail LOUDLY — defaulting to -1 over existing
    data would re-fold already-committed batches into the additive MV
    (double counting), which is strictly worse than crashing."""
    recover_store(store_dir)
    meta_path = os.path.join(store_dir, "_meta.json")
    last = -1
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        # .get(key, -1) silently re-folded every committed batch when a
        # meta file PARSED but lacked the key (e.g. written by a future
        # or foreign store version) — the exact double-count the
        # docstring's fail-LOUDLY principle forbids; only json.load
        # errors were loud (r11 review)
        if "last_batch_id" not in meta:
            raise ValueError(
                f"MV store watermark {meta_path} has no last_batch_id: "
                "refusing to re-fold over existing data"
            )
        last = meta["last_batch_id"]
    if batch_id <= last:
        return  # replayed batch: already committed
    delta = _mv_agg(batch)
    data = os.path.join(store_dir, "data")
    if os.path.isdir(data):
        merged = (
            spark.read.parquet(data)
            .unionByName(delta)
            .groupBy("month", "o_orderstatus")
            .agg(
                F.sum("n_orders").alias("n_orders"),
                F.sum("revenue_dec").cast(MV_DEC).alias("revenue_dec"),
            )
        )
    else:
        merged = delta
    tmp = tmp_store(store_dir)
    os.makedirs(tmp, exist_ok=True)
    merged.write.mode("overwrite").parquet(os.path.join(tmp, "data"))
    with open(os.path.join(tmp, "_meta.json"), "w") as f:
        json.dump({"last_batch_id": batch_id}, f)
    swap_store(store_dir, tmp)


def run_mv_stream(
    spark: SparkSession,
    src_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    query_name: str = "mv_stream",
    schema: str = ORDERS_SCHEMA,
    max_files_per_trigger: int | None = 1,
) -> None:
    """Drain available fact files into the continuous aggregate, one
    transactional fold per micro-batch; same-checkpoint re-invocation
    is the crash-recovery path."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(src_dir)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        apply_mv_batch(spark, store_dir, batch_df, batch_id)

    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(_sink)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streamed_mv_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-query path: land the orders table as 4 files (one per
    micro-batch, split on o_orderkey % 4), stream them through the
    transactional additive sink, and return the final MV with the
    decimal carrier cast to double — which must equal a from-scratch
    GROUP BY over all orders (mv_incremental_refresh's oracle)."""
    import glob

    from ..io import read_table, table_path
    from ..operators.ann import INDEX_ROOT, dataset_dir_key, dataset_fingerprint

    root = os.path.join(INDEX_ROOT, f"mv_stream_{dataset_dir_key(sf_dir)}")
    salt = "mv_stream:v1"
    fp = dataset_fingerprint(table_path(sf_dir, "orders"), salt=salt)
    from ..store import read_marker, write_marker_atomic

    marker = os.path.join(root, "meta.json")
    store = os.path.join(root, "store")
    ok = read_marker(marker).get("fingerprint") == fp
    if not (ok and os.path.isdir(store)):
        if os.path.isdir(root):
            shutil.rmtree(root)
        landing = os.path.join(root, "landing")
        os.makedirs(landing, exist_ok=True)
        orders = read_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
        for i in range(4):
            part_df = orders.filter(F.col("o_orderkey") % 4 == i)
            tmp = os.path.join(root, f"_tmp_{i}")
            part_df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            os.rename(part, os.path.join(landing, f"{i:02d}_orders.parquet"))
            shutil.rmtree(tmp)
        run_mv_stream(
            spark,
            landing,
            store,
            os.path.join(root, "ckpt"),
            query_name="mv_store_stream",
        )
        write_marker_atomic(marker, {"fingerprint": fp, "salt": salt})
    mv = spark.read.parquet(os.path.join(store, "data"))
    return mv.select(
        "month",
        "o_orderstatus",
        "n_orders",
        F.col("revenue_dec").cast("double").alias("revenue"),
    )
