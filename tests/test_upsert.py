from __future__ import annotations

from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.operators.upsert import upsert


def _tbl(spark, rows):
    return spark.createDataFrame(rows, ["id", "text", "ingest_version"])


def test_upsert_update_insert_keep(spark):
    existing = _tbl(spark, [("a", "old-a", 1), ("b", "old-b", 1)])
    batch = _tbl(spark, [("a", "new-a", 2), ("c", "new-c", 2)])
    out = {r["id"]: (r["text"], r["ingest_version"]) for r in upsert(existing, batch).collect()}
    assert out == {"a": ("new-a", 2), "b": ("old-b", 1), "c": ("new-c", 2)}


def test_upsert_idempotent(spark):
    existing = _tbl(spark, [("a", "old-a", 1), ("b", "old-b", 1)])
    batch = _tbl(spark, [("a", "new-a", 2)])
    once = upsert(existing, batch)
    twice = upsert(once, batch)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_upsert_same_version_batch_wins(spark):
    existing = _tbl(spark, [("a", "old-a", 1)])
    batch = _tbl(spark, [("a", "new-a", 1)])
    out = upsert(existing, batch).collect()
    assert out[0]["text"] == "new-a"
