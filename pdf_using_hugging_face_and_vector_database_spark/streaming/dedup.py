"""Streaming exact dedup — the dedup operator family's streaming twin.

``dropDuplicates`` on a stream keeps per-key state of every key seen;
``dropDuplicatesWithinWatermark`` bounds that state by the watermark
(keys older than the watermark are evicted — the only way dedup state
stays finite on an unbounded stream). The reference's upsert-by-id
last-writer-wins (`streamlit_app.py:102,110`) is the batch analog:
first-writer-wins per key within the watermark horizon.

Batch twin for the test: distinct (user_id, event_type) pairs — the
streamed result must cover exactly the same key set (which physical
row survives per key is arrival-order-dependent, so tests compare key
sets, not rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_events_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """First-seen-wins streaming dedup on ``keys``. With a watermark,
    state is bounded (dropDuplicatesWithinWatermark); without, state
    grows with distinct keys (only safe for finite key domains)."""
    if watermark is not None:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return events.dropDuplicates(list(keys))


def run_dedup_to_memory(
    spark, sf_dir: str, query_name: str = "events_dedup_stream"
) -> DataFrame:
    from .windows import read_events_stream, stream_shuffle_partitions

    out = dedup_events_stream(read_events_stream(spark, sf_dir))
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
