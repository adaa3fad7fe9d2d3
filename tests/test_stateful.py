"""applyInPandasWithState custom stateful op: final streaming state ==
batch groupBy aggregate on the same finite input (SURVEY.md §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.io import read_table
from pdf_using_hugging_face_and_vector_database_spark.streaming.stateful import (
    run_stateful_to_memory,
    running_user_stats,
)


def test_stateful_stream_matches_batch(spark, sf_dir):
    emitted = run_stateful_to_memory(spark, sf_dir).collect()
    # 'update' mode emits a running row per (user, micro-batch); the
    # final state is the emission with the highest n_events (monotone)
    final: dict[int, tuple] = {}
    for r in emitted:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], r["total_value"], r["max_event_id"])

    batch = {
        r["user_id"]: (r["n"], r["total"], r["max_id"])
        for r in read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
            F.max("event_id").alias("max_id"),
        )
        .collect()
    }
    assert set(final) == set(batch)
    for uid, (n_s, v_s, m_s) in final.items():
        n_b, v_b, m_b = batch[uid]
        assert n_s == n_b, uid
        assert m_s == m_b, uid
        assert abs(v_s - v_b) < 1e-6, uid


def test_stateful_null_nan_value_boundary(spark, tmp_path):
    """r15 review wave 10 (measured, recorded): across the Arrow
    boundary a SQL NULL double and a NaN both arrive as pandas NaN, so
    the stateful operator CANNOT reproduce SQL's split fates (sum
    skips NULL but propagates NaN; an all-NULL group sums to NULL).
    Its documented single fate: both are absent — an all-NULL/NaN user
    totals 0.0. This pin measures the operator's fate AND the batch
    twin's diverging ones, so the scoped equality claim (finite
    non-null values) stays honest."""
    import math
    import os

    rows = [
        (1, 10, "click", None),        # all-NULL user
        (2, 10, "click", float("nan")),  # all-NaN-ish user
        (3, 11, "click", 2.5),
        (4, 11, "click", None),         # mixed: NULL skipped both ways
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    )
    src = os.path.join(str(tmp_path), "ev")
    df.write.parquet(src)

    stream = spark.readStream.schema(
        "event_id long, user_id long, event_type string, value double"
    ).parquet(src)
    out = running_user_stats(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("nullnan_stateful")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["user_id"]: r
        for r in spark.sql(
            "SELECT * FROM nullnan_stateful"
        ).collect()
    }
    # operator fate: NULL and NaN both absent -> 0.0 totals
    assert got[10]["n_events"] == 2 and got[10]["total_value"] == 0.0
    assert got[11]["n_events"] == 2 and got[11]["total_value"] == 2.5

    # the batch twin's fates genuinely diverge here (why the equality
    # claim is scoped): sum over {NULL, NaN} propagates NaN, and an
    # all-NULL group would be NULL
    batch = {
        r["user_id"]: r
        for r in df.groupBy("user_id")
        .agg(F.sum("value").alias("s"))
        .collect()
    }
    assert math.isnan(batch[10]["s"])  # NaN propagates in SQL
    only_null = (
        spark.createDataFrame(
            [(9, None)], "user_id long, value double"
        )
        .groupBy("user_id")
        .agg(F.sum("value").alias("s"))
        .collect()[0]["s"]
    )
    assert only_null is None  # all-NULL group is NULL in SQL, 0.0 here
