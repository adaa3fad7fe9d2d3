"""Streaming dedup covers exactly the batch-distinct key set."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.io import read_table
from pdf_using_hugging_face_and_vector_database_spark.streaming.dedup import (
    run_dedup_to_memory,
)


def test_streaming_dedup_matches_batch_distinct(spark, sf_dir):
    streamed = run_dedup_to_memory(spark, sf_dir).collect()
    stream_keys = [(r["user_id"], r["event_type"]) for r in streamed]
    # one surviving row per key
    assert len(stream_keys) == len(set(stream_keys))

    batch_keys = {
        (r["user_id"], r["event_type"])
        for r in read_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert set(stream_keys) == batch_keys


def test_stream_static_incremental_matches_batch(spark, sf_dir):
    """The stream-static incremental dedup must produce the exact same
    per-doc verdicts as the batch dedup_incremental query (same
    persisted corpus store, same fixture derivation) — stream==batch
    parity at the row level."""
    from pdf_using_hugging_face_and_vector_database_spark import queries as Q

    stream_rows = {
        tuple(r)
        for r in Q.stream_dedup_incremental(spark, sf_dir).collect()
    }
    batch_rows = {
        tuple(r) for r in Q.dedup_incremental(spark, sf_dir).collect()
    }
    assert stream_rows == batch_rows
    assert stream_rows  # non-empty
