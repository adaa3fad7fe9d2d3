from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.io import read_table
from pdf_using_hugging_face_and_vector_database_spark.operators.text_analysis import (
    doc_stats,
    language_id,
)
from pdf_using_hugging_face_and_vector_database_spark.operators.validation import (
    DimensionError,
    null_guard,
    validate_dim,
)


def test_validate_dim_passes_fixture(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    assert validate_dim(emb, dim=64).count() == 500


def test_validate_dim_strict_raises(spark):
    df = spark.createDataFrame([([1.0, 2.0],)], ["embedding"])
    with pytest.raises(DimensionError):
        validate_dim(df, dim=64)


def test_validate_dim_filter_mode(spark):
    df = spark.createDataFrame([([1.0] * 64,), ([1.0] * 3,)], ["embedding"])
    assert validate_dim(df, dim=64, strict=False).count() == 1


def test_null_guard(spark):
    df = spark.createDataFrame([(1, "x"), (2, None)], ["id", "content"])
    assert null_guard(df, "content").count() == 1


def test_doc_stats_sane(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    stats = doc_stats(docs).collect()
    assert len(stats) == 500
    for r in stats:
        assert r["n_tokens"] > 0
        assert 0.0 <= r["punct_ratio"] <= 1.0
        assert 0.0 <= r["quality_score"] <= 1.0


def test_doc_stats_token_count(spark):
    df = spark.createDataFrame([(1, "one  two   three")], ["doc_id", "text"])
    assert doc_stats(df).first()["n_tokens"] == 3


def test_language_id_fixed_examples(spark):
    df = spark.createDataFrame(
        [
            (1, "xx", "the cat and the dog is with of the house"),
            (2, "xx", "der hund und die katze ist mit der maus"),
        ],
        ["doc_id", "lang", "text"],
    )
    out = {r["doc_id"]: r["lang_guess"] for r in language_id(df).collect()}
    assert out == {1: "en", 2: "de"}
