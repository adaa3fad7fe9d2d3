"""Streaming LWW upsert sink: exactly-once table state from
at-least-once foreachBatch + idempotent merge, across restarts."""

from __future__ import annotations

import duckdb

from pdf_using_hugging_face_and_vector_database_spark.streaming.upsert_sink import (
    apply_upsert_batch,
    run_upsert_stream,
)


def _write_batch(con, path: str, rows: list[tuple]) -> None:
    vals = ", ".join(
        f"('{i}', {d}, {v}, '{t}')" for i, d, v, t in rows
    )
    con.sql(
        f"COPY (SELECT id, doc_id::BIGINT AS doc_id,"
        f" ingest_version::BIGINT AS ingest_version, text"
        f" FROM (VALUES {vals})"
        f" AS t(id, doc_id, ingest_version, text)) TO '{path}'"
        f" (FORMAT PARQUET)"
    )


def _store(spark, store_dir: str) -> dict[str, tuple[int, str]]:
    return {
        r["id"]: (r["ingest_version"], r["text"])
        for r in spark.read.parquet(store_dir).collect()
    }


def test_stream_upserts_apply_lww_across_restarts(spark, tmp_path):
    con = duckdb.connect()
    src = tmp_path / "src"
    src.mkdir()
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(con, str(src / "b1.parquet"), [
        ("a", 1, 1, "a-v1"), ("b", 2, 1, "b-v1"),
    ])
    run_upsert_stream(spark, str(src), store, ckpt)
    assert _store(spark, store) == {"a": (1, "a-v1"), "b": (1, "b-v1")}

    # crash happened; two more files land: an update, an insert, and a
    # STALE row (lower version than the store — must lose)
    _write_batch(con, str(src / "b2.parquet"), [
        ("a", 1, 3, "a-v3"), ("c", 3, 1, "c-v1"),
    ])
    _write_batch(con, str(src / "b3.parquet"), [
        ("a", 1, 2, "a-v2-stale"),
    ])
    run_upsert_stream(spark, str(src), store, ckpt)
    assert _store(spark, store) == {
        "a": (3, "a-v3"),
        "b": (1, "b-v1"),
        "c": (1, "c-v1"),
    }


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """Spark's foreachBatch contract is at-least-once: the same
    micro-batch may be re-applied after a crash. The LWW merge must
    converge to the identical store."""
    con = duckdb.connect()
    src = tmp_path / "src"
    src.mkdir()
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(con, str(src / "b1.parquet"), [
        ("a", 1, 2, "a-v2"), ("b", 2, 1, "b-v1"),
    ])
    run_upsert_stream(spark, str(src), store, ckpt)
    before = _store(spark, store)
    # replay the batch manually (what a crashed foreachBatch does)
    replay = spark.read.parquet(str(src / "b1.parquet"))
    apply_upsert_batch(spark, store, replay)
    assert _store(spark, store) == before
