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


def test_outer_join_landing_store_protocol(spark, sf_dir, tmp_path, monkeypatch):
    """The sentinel landing dir follows the store marker protocol:
    built once per (source fingerprint, sentinel constants, builder
    code token); served on re-call without rewriting; a stale/absent
    marker forces a rebuild (crash-safe: marker is written LAST)."""
    import os

    from pdf_using_hugging_face_and_vector_database_spark.operators import ann
    from pdf_using_hugging_face_and_vector_database_spark.streaming import (
        joins as J,
    )

    monkeypatch.setattr(ann, "INDEX_ROOT", str(tmp_path))
    landing = J.outer_join_landing_dir(sf_dir)
    files = sorted(os.listdir(landing))
    assert files == [
        "batch_0_events.parquet",
        "batch_1_sentinel.parquet",
        "batch_2_sentinel.parquet",
    ]
    mtimes = [os.stat(os.path.join(landing, f)).st_mtime for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == 3  # batch order
    marker = os.path.join(os.path.dirname(landing), "meta.json")
    stamp = os.stat(os.path.join(landing, files[0])).st_mtime_ns
    # second call serves the existing landing (no rewrite)
    assert J.outer_join_landing_dir(sf_dir) == landing
    assert os.stat(os.path.join(landing, files[0])).st_mtime_ns == stamp
    # a corrupt marker (crash before the atomic flip) forces a rebuild
    with open(marker, "w") as f:
        f.write("{not json")
    assert J.outer_join_landing_dir(sf_dir) == landing
    assert os.path.exists(marker)
    import json as _json

    assert "fingerprint" in _json.load(open(marker))
