"""Stream-stream event-time interval join — the Structured Streaming
surface the batch range join (operators/rangejoin.py) maps onto.

Both sides carry watermarks and the join condition bounds event-time
distance, so Spark can expire join state: a click older than the
watermark minus the interval can never match a future purchase and is
dropped from state. That bounded-state property is what makes the
join runnable forever at corpus scale; the bounded-replay harness
(finite fixture, memory sink) makes it oracle-checkable — the result
must equal the batch banded range join bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clicks_in_purchase_window_stream(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """(purchase, click) pairs where the same user's click falls within
    the hour before the purchase — streaming twin of
    queries.clicks_in_purchase_window, same output columns."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
    )
    return joined.select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
    )


def run_interval_join_to_memory(
    spark, sf_dir: str, query_name: str = "clicks_purchases_stream"
) -> DataFrame:
    """Drive the stream-stream join over the finite fixture (append
    mode — the only mode stream-stream joins support)."""
    from .windows import read_events_stream, stream_shuffle_partitions

    out = clicks_in_purchase_window_stream(read_events_stream(spark, sf_dir))
    with stream_shuffle_partitions(spark):
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
