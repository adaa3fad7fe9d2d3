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

import datetime as dt
import os

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


def clicks_in_purchase_window_stream_outer(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """LEFT OUTER stream-stream interval join — streaming twin of
    queries.outer_range_join (range_join ``how='left'``), same output
    columns: every click paired with each same-user purchase window
    (hour before purchase) containing it, clicks inside no window
    null-extended exactly once.

    Spark emits the null-extended row only when the watermark proves
    no future purchase can still match (p_ts <= c_ts + 1h, so once
    watermark > c_ts + 1h) — state is evicted, the outer result
    appends. Both sides carry watermarks and the condition bounds
    event time in both directions, the requirements for outer
    stream-stream joins.
    """
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
        "leftOuter",
    )
    # user_id from the PRESERVED side — p_user is null on outer rows
    return joined.select(
        "click_id",
        F.col("c_user").alias("user_id"),
        F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        "purchase_id",
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
    )


# sentinel rows use negative ids (the fixture generator only emits
# non-negative event/user ids), so the output filter click_id >= 0 can
# never drop a real row
SENTINEL_DAYS = (30, 60)


def outer_join_landing_dir(sf_dir: str) -> str:
    """Materialize the landing directory the bounded OUTER-join replay
    streams from: the events fixture file plus two far-future sentinel
    files (one click + one purchase each, negative ids, staggered
    mtimes). Fingerprint-keyed like the other derived fixtures —
    rebuilt when the source table or the derivation constants change.

    Why sentinels: an outer stream-stream join emits a null-extended
    click only when the watermark passes c_ts + 1h, and the watermark
    used by micro-batch N is computed from data through batch N-1 —
    over a finite fixture the tail clicks would otherwise sit in state
    forever and the replay could never equal the batch answer. With
    ``maxFilesPerTrigger=1`` and mtime-ordered files the replay is
    three deterministic batches: (1) the real events; (2) sentinel A
    (+30 d) advances the watermark past every real click's horizon;
    (3) sentinel B (+60 d) is the real data whose batch evicts and
    emits every unmatched real click under A's watermark — no reliance
    on no-data batches, which processAllAvailable does not wait for.

    The driver-side write is test-scale fixture materialization ONLY —
    at 100 TB the landing zone exists upstream and the watermark
    advances because ingest never stops; the streaming plan is the
    product path.
    """
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..io import table_path
    from ..operators.ann import INDEX_ROOT, dataset_dir_key, dataset_fingerprint
    from ..store import code_token, read_marker, write_marker_atomic

    src = table_path(sf_dir, "events")
    path = os.path.join(
        INDEX_ROOT, f"outer_join_landing_{dataset_dir_key(sf_dir)}"
    )
    # the builder's own code token is in the salt (r10 review): any
    # change to the sentinel scheme — ids, schema handling, mtime
    # stagger — must rebuild the landing, not replay stale files the
    # code no longer describes
    salt = f"outerjoin:{SENTINEL_DAYS}:{code_token(outer_join_landing_dir)}"
    fp = dataset_fingerprint(src, salt=salt)
    marker = os.path.join(path, "meta.json")
    landing = os.path.join(path, "landing")
    if read_marker(marker).get("fingerprint") == fp:
        return landing
    os.makedirs(landing, exist_ok=True)
    if os.path.exists(marker):
        os.remove(marker)
    for stale in os.listdir(landing):
        os.remove(os.path.join(landing, stale))
    if os.path.isfile(src):
        shutil.copyfile(src, os.path.join(landing, "batch_0_events.parquet"))
        tbl = pq.read_table(src)
    else:
        # a Spark-written dataset (directory of part files): coalesce
        # into ONE landing file so all real data is admitted in ONE
        # micro-batch — per-part batches would advance the watermark
        # between unordered parts and silently DROP late rows from the
        # join (the file source admits whole files; parts carry
        # arbitrary time ranges)
        import glob as _glob

        parts = sorted(_glob.glob(os.path.join(src, "*.parquet")))
        tbl = pa.concat_tables([pq.read_table(p) for p in parts])
        pq.write_table(tbl, os.path.join(landing, "batch_0_events.parquet"))
    schema = tbl.schema
    max_ts = pc.max(tbl.column("ts")).as_py()
    base_mtime = os.stat(src).st_mtime
    for i, days in enumerate(SENTINEL_DAYS):
        ts = max_ts + dt.timedelta(days=days)
        rows = {
            "event_id": [-(4 * i + 1), -(4 * i + 2)],
            "ts": [ts, ts],
            "user_id": [-(4 * i + 1), -(4 * i + 2)],
            "event_type": ["click", "purchase"],
            "value": [0.0, 0.0],
            "props": ["{}", "{}"],
        }
        out = os.path.join(landing, f"batch_{i + 1}_sentinel.parquet")
        pq.write_table(
            pa.table(
                {f.name: pa.array(rows[f.name], type=f.type) for f in schema},
                schema=pa.schema(list(schema)),
            ),
            out,
        )
        # file source admits files in mtime order; stagger explicitly
        os.utime(out, (base_mtime + 10 * (i + 1), base_mtime + 10 * (i + 1)))
    os.utime(
        os.path.join(landing, "batch_0_events.parquet"),
        (base_mtime, base_mtime),
    )
    write_marker_atomic(marker, {"fingerprint": fp, "salt": salt})
    return landing


def run_outer_interval_join_to_memory(
    spark, sf_dir: str, query_name: str = "clicks_purchases_outer_stream"
) -> DataFrame:
    """Drive the LEFT OUTER stream-stream join over the sentinel-
    extended landing replay (append mode). Sentinel rows are filtered
    by their negative ids AFTER the sink, on the batch read of the
    memory table — NOT pre-sink: a pre-sink ``click_id >= 0`` filter
    gets pushed below the EventTimeWatermark operator on the preserved
    side, so the sentinel clicks never advance the click-side
    watermark, the global watermark (min of sides) stalls at the last
    REAL click, and the final real click's null-extension never flushes
    (observed: exactly one missing row, deterministically). The
    surviving output must equal the batch left banded range join
    bit-for-bit (shared oracle)."""
    from .windows import read_events_stream, stream_shuffle_partitions

    landing = outer_join_landing_dir(sf_dir)
    events = read_events_stream(
        spark, sf_dir, directory=landing, glob="*.parquet",
        max_files_per_trigger=1,
    )
    out = clicks_in_purchase_window_stream_outer(events)
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
    return spark.sql(f"SELECT * FROM {query_name}").filter(
        F.col("click_id") >= 0
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
