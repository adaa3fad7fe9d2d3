"""applyInPandasWithState custom stateful op: final streaming state ==
batch groupBy aggregate on the same finite input (SURVEY.md §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.io import read_table
from pdf_using_hugging_face_and_vector_database_spark.streaming.stateful import (
    run_stateful_to_memory,
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
