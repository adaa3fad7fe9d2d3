"""Watermarked tumbling-window aggregation over the events stream.

Batch twin: queries.events_hourly (same grouping logic) — the driver
oracle-checks the batch form; tests assert stream==batch on the same
input (SURVEY.md §5).

Scale: streaming state is keyed by (window, event_type); the watermark
bounds state size — late rows beyond 10 minutes are dropped instead of
accumulating unbounded state.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import EVENTS

# Streaming state partitioning is fixed at a query's FIRST start (it
# keys the state store layout), so it must be sized to the stream's
# key cardinality and throughput — NOT inherited from the batch
# session's shuffle setting. For the bounded fixture replays 8 is
# plenty; 32 batch partitions cost 4x in per-partition state-store
# open/commit overhead (measured 12s -> 3s on the stream-stream join).
STREAM_SHUFFLE_PARTITIONS = 8


@contextmanager
def stream_shuffle_partitions(spark, n: int = STREAM_SHUFFLE_PARTITIONS):
    """Scope the shuffle-partition setting around a stream start; the
    batch session value is restored afterwards."""
    conf = "spark.sql.shuffle.partitions"
    old = spark.conf.get(conf)
    spark.conf.set(conf, str(n))
    try:
        yield
    finally:
        spark.conf.set(conf, old)


def hourly_event_counts_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """events (streaming DF with ts timestamp) -> hourly tumbling
    counts/sums per event_type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # decimal-routed double sum: partial aggregation order (and
            # micro-batch boundaries) can't perturb the result, so the
            # stream is bit-identical to the batch twin and its oracle
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_windows_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Streaming gap-based sessionization — the same F.session_window
    operator as the batch twin (queries.session_windows_native), so
    stream==batch parity is oracle-checkable. State is keyed by
    (user_id, session); in production append mode + watermark bound
    it; the bounded-replay harness runs complete mode over the finite
    fixture."""
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def run_sessions_to_memory(
    spark, sf_dir: str, query_name: str = "sessions_stream"
) -> DataFrame:
    """Drive the streaming sessionization over the finite fixture."""
    agg = session_windows_stream(read_events_stream(spark, sf_dir))
    with stream_shuffle_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def read_events_stream(
    spark,
    sf_dir: str,
    directory: str | None = None,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming read of the events fixture (parquet directory source).

    The nanos timestamp lands as LongType under nanosAsLong; normalize
    like io.read_table does for batch.

    ``directory``/``glob`` point the file source somewhere other than
    the fixture dir (e.g. a derived landing dir that appends sentinel
    files — streaming/joins.outer_join_landing_dir) while the SCHEMA
    still comes from the canonical fixture file, so every landing
    variant is forced to write schema-identical files.
    ``max_files_per_trigger`` bounds batch admission — the knob that
    makes multi-batch watermark advancement deterministic in the
    bounded replays (file source processes files in mtime order).
    """
    import os

    from pyspark.sql import types as T

    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # same vanilla-session hazard as io.read_table (r11 review): the
    # NTZ cast below and every window/date_format downstream assume
    # session tz UTC — pin it for streams read outside get_spark()
    # single-arg get — a two-arg get validates the default string
    # against the timezone converter when the key is unset (vanilla
    # sessions) and throws INVALID_CONF_VALUE (see io.read_table)
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    static_schema = spark.read.parquet(path).schema
    # the fixture is a single file; the streaming file source wants a
    # directory, so stream the parent dir filtered to this file
    reader = spark.readStream.schema(static_schema).option(
        "pathGlobFilter", glob
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(directory or sf_dir)
    if isinstance(static_schema["ts"].dataType, T.LongType):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(static_schema["ts"].dataType, T.TimestampNTZType):
        # micros-NTZ fixture generation; UTC session makes the cast
        # value-identical to the nanos path (see io.read_table)
        stream = stream.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return stream


def run_stream_to_memory(spark, sf_dir: str, query_name: str = "events_hourly_stream") -> DataFrame:
    """Drive the streaming agg to completion over the (finite) fixture
    and return the result as a DataFrame — the test/demo harness."""
    agg = hourly_event_counts_stream(read_events_stream(spark, sf_dir))
    with stream_shuffle_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
