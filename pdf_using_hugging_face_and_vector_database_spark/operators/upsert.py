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
