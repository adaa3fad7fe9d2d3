"""Streaming == batch on the same finite input (SURVEY.md §2.6)."""

from __future__ import annotations

from pdf_using_hugging_face_and_vector_database_spark.queries import events_hourly
from pdf_using_hugging_face_and_vector_database_spark.streaming.windows import (
    run_stream_to_memory,
)


def test_stream_matches_batch(spark, sf_dir):
    stream_rows = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in run_stream_to_memory(spark, sf_dir).collect()
    }
    batch_rows = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in events_hourly(spark, sf_dir).collect()
    }
    assert set(stream_rows) == set(batch_rows)
    for k, (n_stream, v_stream) in stream_rows.items():
        n_batch, v_batch = batch_rows[k]
        assert n_stream == n_batch, k
        assert abs(v_stream - v_batch) < 1e-6, k


def test_stream_sessions_match_batch(spark, sf_dir):
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        session_windows_native,
    )
    from pdf_using_hugging_face_and_vector_database_spark.streaming.windows import (
        run_sessions_to_memory,
    )

    stream_rows = {
        (r["user_id"], r["session_start"]): (
            r["session_end"], r["n_events"], r["total_value"]
        )
        for r in run_sessions_to_memory(spark, sf_dir).collect()
    }
    batch_rows = {
        (r["user_id"], r["session_start"]): (
            r["session_end"], r["n_events"], r["total_value"]
        )
        for r in session_windows_native(spark, sf_dir).collect()
    }
    assert stream_rows == batch_rows


def test_stream_interval_join_matches_batch(spark, sf_dir):
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        clicks_in_purchase_window,
    )
    from pdf_using_hugging_face_and_vector_database_spark.streaming.joins import (
        run_interval_join_to_memory,
    )

    stream_pairs = {
        (r["purchase_id"], r["click_id"])
        for r in run_interval_join_to_memory(spark, sf_dir).collect()
    }
    batch_pairs = {
        (r["purchase_id"], r["click_id"])
        for r in clicks_in_purchase_window(spark, sf_dir).collect()
    }
    assert stream_pairs == batch_pairs


def test_stream_outer_interval_join_matches_batch(spark, sf_dir):
    """r10 outer parity: the LEFT OUTER stream-stream interval join's
    bounded replay equals the batch left banded range join on FULL
    rows — matched pairs identical, every unmatched click present
    exactly once null-extended (the sentinel files exist precisely to
    flush the tail; see streaming/joins.outer_join_landing_dir)."""
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        outer_range_join,
    )
    from pdf_using_hugging_face_and_vector_database_spark.streaming.joins import (
        run_outer_interval_join_to_memory,
    )

    stream_rows = [
        tuple(r) for r in run_outer_interval_join_to_memory(spark, sf_dir).collect()
    ]
    batch_rows = [tuple(r) for r in outer_range_join(spark, sf_dir).collect()]
    assert sorted(stream_rows, key=str) == sorted(batch_rows, key=str)
    # no sentinel leaked, and unmatched clicks appear exactly once
    assert all(r[0] >= 0 for r in stream_rows)
    nulls = [r for r in stream_rows if r[3] is None]
    assert len(nulls) == len({r[0] for r in nulls})
    assert nulls, "fixture should contain unconverted clicks"
