"""Checkpoint-based crash recovery: the property that makes a
Structured Streaming pipeline production-grade at 100 TB — a restarted
query resumes from the offset log and the STATE STORE, so it neither
reprocesses consumed input nor loses accumulated aggregation state.

The runner is a file-source -> running aggregation -> update-mode
memory sink with an explicit checkpointLocation and an availableNow
trigger: each invocation drains whatever input is new and terminates,
which is exactly the restart-after-crash shape (the reference's
retry loop, `streamlit_app.py:117-121`, simply re-uploads and
overwrites; here recovery is exact instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_LITE_SCHEMA = (
    "event_id long, user_id long, event_type string, value double"
)


def user_bucket_counts(events: DataFrame, n_buckets: int = 10) -> DataFrame:
    """Running per-bucket aggregation (count + exact decimal value
    sum) — unbounded keys are fine: the key domain is n_buckets."""
    return (
        events.groupBy((F.col("user_id") % n_buckets).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(27,6)"))
            .cast("double")
            .alias("value_sum"),
        )
    )


def run_counts_with_checkpoint(
    spark: SparkSession,
    src_dir: str,
    checkpoint_dir: str,
    query_name: str,
    n_buckets: int = 10,
) -> list:
    """One drain cycle: read new files from ``src_dir`` (offset log
    decides what is new), fold them into the checkpointed state, emit
    updated rows, terminate. Re-invoking with the same
    ``checkpoint_dir`` IS the crash-recovery path. The sink is
    foreachBatch (the memory sink is NOT fault-tolerant — Spark
    refuses to restart it from a checkpoint); emitted rows are
    returned. Returns the update-mode output rows of this cycle."""
    emitted: list = []

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        emitted.extend(batch_df.collect())

    stream = (
        spark.readStream.schema(EVENTS_LITE_SCHEMA).parquet(src_dir)
    )
    q = (
        user_bucket_counts(stream, n_buckets=n_buckets)
        .writeStream.outputMode("update")
        .foreachBatch(_sink)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return emitted
