"""S8/S9 — vector upsert sink (reference `streamlit_app.py:97-121`).

The reference upserts id-keyed batches of 100 with 3 retries and
*silently skips* a batch that exhausts retries (at-most-once, partial
ingest — `streamlit_app.py:117-121`). We do not replicate silent data
loss: Spark task retries give all-or-nothing job semantics, and the
upsert itself is an idempotent last-writer-wins compaction keyed on
``id`` ordered by an explicit ``ingest_version`` (SURVEY.md §7 risk
note: never rely on file order).

Without Delta in this container, MERGE is rewritten as
union + row_number; on a Delta/Iceberg table this operator is
``MERGE INTO vectors USING batch ON id WHEN MATCHED UPDATE ...``.

Scale: the compaction shuffles on ``id`` (uniform hash key). With the
table bucketed by ``id``, repeated upserts co-locate and the window
needs no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_cocluster(
    existing: DataFrame,
    batch: DataFrame,
    id_col: str = "id",
    version_col: str = "ingest_version",
) -> DataFrame:
    """MERGE for an id-bucketed table: full-outer join on ``id`` with a
    per-pair version comparison — same last-writer-wins result as
    :func:`upsert`, different physical shape. When ``existing`` is a
    bucketed table (io.write_bucketed), its side of the join reads
    buckets directly with NO Exchange; only the (small) batch shuffles
    to match — or broadcasts. The union+window rewrite in
    :func:`upsert` shuffles the WHOLE table every merge; this is the
    one Delta/Iceberg MERGE actually executes on clustered storage,
    and the 100 TB repeated-ingest path (plan-asserted in
    tests/test_io_scale.py). Requires batch ids unique (true of any
    compacted batch; pre-compact with :func:`upsert` if not).
    """
    payload = [c for c in existing.columns if c != id_col]
    e = existing.select(id_col, F.struct(*payload).alias("__e"))
    b = batch.select(id_col, F.struct(*payload).alias("__b"))
    j = e.join(b, id_col, "full_outer")
    win = (
        F.when(F.col("__b").isNull(), F.col("__e"))
        .when(F.col("__e").isNull(), F.col("__b"))
        .when(
            F.col(f"__b.{version_col}") >= F.col(f"__e.{version_col}"),
            F.col("__b"),
        )
        .otherwise(F.col("__e"))
    )
    return j.select(id_col, win.alias("__w")).select(id_col, "__w.*")


def upsert(
    existing: DataFrame,
    batch: DataFrame,
    id_col: str = "id",
    version_col: str = "ingest_version",
) -> DataFrame:
    """Last-writer-wins by (id, version): the highest version per id
    survives; ties (same version in both inputs) prefer the batch.

    Idempotent: re-applying the same batch converges to the same table
    (strictly stronger than the reference's skip-on-failure ingest).
    """
    tagged_existing = existing.withColumn("__is_batch", F.lit(0))
    tagged_batch = batch.withColumn("__is_batch", F.lit(1))
    unioned = tagged_existing.unionByName(tagged_batch)
    w = Window.partitionBy(id_col).orderBy(
        F.desc(version_col), F.desc("__is_batch")
    )
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__is_batch")
    )
