"""Salted-join skew lever: result-invariance + actual key spreading."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.operators.skew import (
    SALT_COL,
    explode_salt,
    salted_join,
    with_salt,
)


def _skewed(spark):
    # one hot key (0) carrying 90% of the rows + a uniform tail
    rows = [(0, i) for i in range(900)] + [(k, 1000 + k) for k in range(1, 101)]
    big = spark.createDataFrame(rows, "key long, row_id long")
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(0, 101)], "key long, dim string"
    )
    return big, small


def test_salted_join_equals_plain_join(spark):
    big, small = _skewed(spark)
    got = salted_join(big, small, on="key", spread_col="row_id", n_salt=8).collect()
    want = big.join(small, "key").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert SALT_COL not in salted_join(
        big, small, on="key", spread_col="row_id"
    ).columns


def test_hot_key_spreads_over_salts(spark):
    big, _ = _skewed(spark)
    salts = (
        with_salt(big, "row_id", 8)
        .filter(F.col("key") == 0)
        .select(SALT_COL)
        .distinct()
        .count()
    )
    # 900 rows of the hot key must land in (essentially) all 8 salts
    assert salts >= 7, salts


def test_explode_salt_replicates(spark):
    _, small = _skewed(spark)
    assert explode_salt(small, 8).count() == small.count() * 8


def test_range_join_banded_matches_naive(spark):
    """Banded interval join == naive conditional join, including both
    inclusive boundaries and intervals spanning many buckets."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.rangejoin import (
        range_join,
    )

    points = spark.createDataFrame(
        [(i, 1, f"2024-01-01 0{h}:{m:02d}:00") for i, (h, m) in enumerate(
            [(0, 0), (0, 30), (1, 0), (2, 15), (3, 59), (4, 0)]
        )],
        "pid long, user_id long, c_ts string",
    ).withColumn("c_ts", F.col("c_ts").cast("timestamp"))
    intervals = spark.createDataFrame(
        [
            (100, 1, "2024-01-01 00:00:00", "2024-01-01 01:00:00"),  # 2 buckets
            (101, 1, "2024-01-01 00:30:00", "2024-01-01 03:59:00"),  # 4 buckets
            (102, 2, "2024-01-01 00:00:00", "2024-01-01 23:00:00"),  # other key
        ],
        "iid long, user_id long, w_start string, w_end string",
    ).withColumn("w_start", F.col("w_start").cast("timestamp")).withColumn(
        "w_end", F.col("w_end").cast("timestamp")
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, "c_ts", "w_start", "w_end", on=("user_id",)
        ).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in points.join(
            intervals,
            (points.user_id == intervals.user_id)
            & (points.c_ts >= intervals.w_start)
            & (points.c_ts <= intervals.w_end),
        ).collect()
    }
    assert got == naive
    assert (0, 100) in got and (2, 100) in got  # both boundaries inclusive
    assert (5, 102) not in got  # key mismatch filtered


def test_range_join_left_outer_matches_naive(spark):
    """how='left': matched pairs == inner; every unmatched point comes
    back exactly once, null-extended on the interval columns — and the
    point's own key column survives (not the dropped interval-side
    copy)."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.rangejoin import (
        range_join,
    )

    points = spark.createDataFrame(
        [
            (0, 1, "2024-01-01 00:15:00"),  # inside both 100 and 101-ish
            (1, 1, "2024-01-01 10:00:00"),  # inside nothing
            (2, 3, "2024-01-01 00:15:00"),  # key with no intervals
        ],
        "pid long, user_id long, c_ts string",
    ).withColumn("c_ts", F.col("c_ts").cast("timestamp"))
    intervals = spark.createDataFrame(
        [
            (100, 1, "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
            (101, 1, "2024-01-01 00:10:00", "2024-01-01 03:59:00"),
            (102, 2, "2024-01-01 00:00:00", "2024-01-01 23:00:00"),
        ],
        "iid long, user_id long, w_start string, w_end string",
    ).withColumn("w_start", F.col("w_start").cast("timestamp")).withColumn(
        "w_end", F.col("w_end").cast("timestamp")
    )
    out = range_join(
        points, intervals, "c_ts", "w_start", "w_end", on=("user_id",),
        how="left",
    ).collect()
    got = {(r["pid"], r["iid"]) for r in out}
    assert got == {(0, 100), (0, 101), (1, None), (2, None)}
    # unmatched rows keep the POINT side's key (the r9 self-join
    # lineage fix: drop by unique renamed name, never df[col])
    by_pid = {r["pid"]: r for r in out if r["iid"] is None}
    assert by_pid[1]["user_id"] == 1 and by_pid[2]["user_id"] == 3
    assert by_pid[1]["w_start"] is None and by_pid[1]["w_end"] is None


def test_range_join_left_outer_self_lineage(spark):
    """Both sides carved from the SAME source DataFrame (the ambiguous
    self-join shape): unmatched rows must still carry the point-side
    key, and pairs must match the naive expression join."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.rangejoin import (
        range_join,
    )

    ev = spark.createDataFrame(
        [
            (0, 1, "click", "2024-01-01 00:15:00"),
            (1, 1, "click", "2024-01-01 10:00:00"),
            (2, 1, "purchase", "2024-01-01 00:30:00"),
            (3, 2, "purchase", "2024-01-01 05:00:00"),
        ],
        "event_id long, user_id long, event_type string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("iid"),
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("w_start"),
        F.col("ts").alias("w_end"),
    )
    out = range_join(
        clicks, purchases, "c_ts", "w_start", "w_end", on=("user_id",),
        how="left",
    ).collect()
    assert {(r["pid"], r["iid"]) for r in out} == {(0, 2), (1, None)}
    assert all(r["user_id"] is not None for r in out)


def test_range_join_how_contract(spark):
    """r10: right/full are IMPLEMENTED but demand interval_id (the
    identity that makes exactly-once null-extension of exploded
    intervals possible — the old NotImplementedError's reason, now an
    explicit API requirement); unknown modes still fail fast."""
    import pytest as _pytest

    from pdf_using_hugging_face_and_vector_database_spark.operators.rangejoin import (
        range_join,
    )

    df = spark.range(1).select(
        F.current_timestamp().alias("c_ts"),
        F.current_timestamp().alias("w_start"),
        F.current_timestamp().alias("w_end"),
    )
    for needs_id in ("right", "full"):
        with _pytest.raises(ValueError, match="interval_id"):
            range_join(df, df, "c_ts", "w_start", "w_end", how=needs_id)
    with _pytest.raises(ValueError, match="unknown how"):
        range_join(df, df, "c_ts", "w_start", "w_end", how="left_anti")


def test_skew_report_detects_planted_skew(spark):
    """A planted 30%-hot key must surface at rank 1 with the right
    share and a skew_factor near n_keys * share."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.profiling import (
        skew_report,
    )
    from pyspark.sql import functions as F

    df = spark.range(0, 10_000).select(
        F.when(F.col("id") < 3_000, F.lit(7))
        .otherwise(F.col("id") % 100)
        .alias("k")
    )
    rows = sorted(skew_report(df, "k", top_n=3).collect(), key=lambda r: r.rank)
    assert rows[0].key == "7"
    assert rows[0].cnt == 3_000 + 70  # hot block + its modulo share
    assert rows[0].share == round(rows[0].cnt / 10_000, 6)
    assert rows[0].skew_factor == round(rows[0].cnt / (10_000 / 100), 6)
    assert all(r.n_keys == 100 and r.n_rows == 10_000 for r in rows)


def test_salted_join_refuses_outer_small_side(spark):
    """r12 review: salted_join silently accepted how='right'/'full',
    but the small side is replicated n_salt times — an unmatched small
    row null-extends once PER REPLICA (measured below: n_salt copies),
    so the rewrite is NOT the plain join there. The guard must refuse;
    fails on the pre-r12 code (no raise, duplicated rows)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pdf_using_hugging_face_and_vector_database_spark.operators.skew import (
        SALT_COL,
        explode_salt,
        salted_join,
        with_salt,
    )

    big = spark.createDataFrame([(1, 10), (1, 11)], "k int, payload int")
    small = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    for how in ("right", "full", "left_outer_x"):
        with _pytest.raises(ValueError, match="salted_join"):
            salted_join(big, small, on="k", spread_col="payload",
                        n_salt=4, how=how)
    # Spark's aliases for the SAFE mode stay accepted (ADVICE r12: the
    # first guard rejected them, a regression for legitimate callers)
    plain = sorted(
        (r["k"], r["payload"], r["v"])
        for r in big.join(small, "k", "left").collect()
    )
    for how in ("left_outer", "leftouter"):
        got = sorted(
            (r["k"], r["payload"], r["v"])
            for r in salted_join(
                big, small, on="k", spread_col="payload", n_salt=4, how=how
            ).collect()
        )
        assert got == plain, how
    # the defect the guard prevents: the raw replicated build under
    # 'full' emits the never-matched small key once per salt replica
    raw = with_salt(big, "payload", 4).join(
        explode_salt(small, 4), ["k", SALT_COL], "full"
    )
    assert raw.filter(F.col("k") == 2).count() == 4  # not 1
    # the supported modes still equal the plain join
    for how in ("inner", "left"):
        got = salted_join(big, small, on="k", spread_col="payload",
                          n_salt=4, how=how)
        want = big.join(small, "k", how)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
