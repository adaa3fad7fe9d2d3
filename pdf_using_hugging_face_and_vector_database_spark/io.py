"""Table readers/writers.

All inputs are parquet (columnar, predicate-pushdown + column-pruning
friendly). At cluster scale the vectors table is written partitioned by
a metadata column so Q4 metadata-filtered search gets partition pruning
for free (SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schemas import TESTDATA_TABLES

_TZ_OVERRIDE_LOGGED = False


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver fixture table.

    Timestamp columns stored as TIMESTAMP(NANOS) surface as LongType
    (``spark.sql.legacy.parquet.nanosAsLong``); normalize them back to
    TimestampType (microsecond truncation — Spark's native precision).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # The engine's declared timestamp semantics are CIVIL UTC: every
    # date_format/to_date/string-anchor comparison in the query corpus
    # (and this reader's own NTZ->LTZ normalization below) assumes
    # session tz UTC, and the DuckDB oracle reads the same parquet as
    # naive UTC. get_spark() pins it, but the DRIVER hands queries a
    # VANILLA session that inherits the HOST zone — on a non-UTC host
    # every timestamp filter/bucket silently shifts by the zone offset
    # (r11 review: events_gapfill returned 248 vs 243 bucket-rows under
    # UTC vs America/New_York). Pin it here, the one entry point every
    # query reads fixtures through — same runtime-conf precedent as
    # nanosAsLong below; a no-op on UTC hosts.
    # single-arg get: conf.get(key, default) VALIDATES the default
    # string against the entry's converter when the key is unset —
    # exactly the vanilla-session case — and '' is not a timezone
    # (observed: INVALID_CONF_VALUE.TIME_ZONE on every vanilla query)
    tz_conf = "spark.sql.session.timeZone"
    prev_tz = spark.conf.get(tz_conf)
    if prev_tz != "UTC":
        # log once per process (ADVICE r11): the override is part of
        # the engine's civil-UTC contract, but a library consumer who
        # set a zone deliberately should be able to SEE it happen
        global _TZ_OVERRIDE_LOGGED
        if not _TZ_OVERRIDE_LOGGED:
            _TZ_OVERRIDE_LOGGED = True
            import sys

            print(
                "pdf_using_hugging_face_and_vector_database_spark: pinning "
                f"spark.sql.session.timeZone={prev_tz!r} -> 'UTC' for fixture "
                "reads (engine timestamp contract is civil UTC)",
                file=sys.stderr,
            )
        spark.conf.set(tz_conf, "UTC")

    ts_cols = {"events": ["ts"]}.get(name, [])
    if ts_cols:
        # Session requirement: TIMESTAMP(NANOS) parquet columns need
        # spark.sql.legacy.parquet.nanosAsLong=true — the fixture is
        # unreadable without it, so this reader enables it when the
        # session doesn't already have it on. NOTE: "explicitly set to
        # false" is indistinguishable from "unset" through conf.get, so
        # a caller wanting raw nanos longs must bypass read_table and
        # read the parquet directly.
        conf = "spark.sql.legacy.parquet.nanosAsLong"
        if spark.conf.get(conf, "false") != "true":
            spark.conf.set(conf, "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    for c in ts_cols:
        if isinstance(df.schema[c].dataType, T.LongType):
            # integer div: nanos exceed double precision (2^53)
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif isinstance(df.schema[c].dataType, T.TimestampNTZType):
            # fixture generations vary: TIMESTAMP(MICROS, no tz) surfaces
            # as TIMESTAMP_NTZ, which unix_micros/windowing reject.
            # Session tz is pinned to UTC, so the cast is value-identical
            # to the nanos->micros path above.
            df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use
    (S5 catalog surface). Views go through :func:`read_table` — NOT a
    raw parquet read — so they inherit the same tz pin and
    nanos-timestamp normalization as every DataFrame consumer (r13
    review wave 6: the raw-read version surfaced `events.ts` as a
    nanosecond LONG — or threw on a session without nanosAsLong —
    diverging from what the identically-named DataFrame tables
    contain)."""
    for name in TESTDATA_TABLES:
        if os.path.exists(table_path(sf_dir, name)):
            read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_vectors(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: str | None = None,
) -> None:
    """Persist a vectors table (reference S8 sink, `streamlit_app.py:106-112`).

    ``partition_by`` a low-cardinality metadata column (e.g. ``source``)
    so metadata-filtered search (Q4) prunes whole partitions at scale.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    buckets: int = 8,
    by: tuple[str, ...] = ("id",),
    sort_by: tuple[str, ...] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted table write: co-locates rows by hash(``by``)
    at WRITE time, so every later join/aggregation on those keys reads
    pre-partitioned, pre-sorted buckets and skips its shuffle entirely
    (tests/test_io_scale.py pins the shuffle-free SortMergeJoin plan).

    This is the 100 TB lever for the vectors table: repeated
    upsert-merge (S8), fetch-by-id (Q5) and id-keyed similarity joins
    all key on ``id`` — bucket once, never shuffle the corpus again.
    Bucketing metadata lives in the session catalog (saveAsTable), the
    data at ``path``.
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(buckets, *by)
        .sortBy(*(sort_by or by))
    )
    writer.saveAsTable(name)
