"""Multi-format documents source: CSV/JSONL round-trip the parquet
fixture losslessly; malformed rows quarantine instead of failing."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.io import read_table
from pdf_using_hugging_face_and_vector_database_spark.sources.documents import (
    CORRUPT_COL,
    read_documents,
    write_documents,
)


def _fingerprint(df):
    return {
        r["doc_id"]: (r["text"], r["lang"], r["source"], r["n_chars"])
        for r in df.collect()
    }


def test_csv_json_roundtrip(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents")
    expected = _fingerprint(docs)
    for fmt in ("csv", "json"):
        path = str(tmp_path / f"docs_{fmt}")
        write_documents(docs, path, format=fmt)
        back = read_documents(spark, path, format=fmt)
        assert _fingerprint(back) == expected, fmt


def test_csv_roundtrip_distinguishes_null_from_empty_text(spark, tmp_path):
    """r13 review wave 5 (NULL/empty class): with default CSV options
    both NULL and '' serialize to an empty field and read back as NULL,
    silently conflating the empty-text document — the reference's
    OCR-error sentinel (errors -> '') — with a missing one. The \\N
    marker keeps them distinct both ways; fails on the pre-r13 code
    (doc 2's '' came back as None)."""
    df = spark.createDataFrame(
        [
            (1, "hello world", "en", "web", 11),
            (2, "", "en", "web", 0),
            (3, None, "en", "web", None),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(tmp_path / "null_vs_empty_csv")
    write_documents(df, path, format="csv")
    back = {r["doc_id"]: r["text"] for r in read_documents(spark, path, format="csv").collect()}
    assert back == {1: "hello world", 2: "", 3: None}


def test_malformed_json_quarantines(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "{this is not json}\n"
        '{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}\n'
    )
    clean = read_documents(spark, str(p), format="json")
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]
    # Spark disallows queries whose only referenced column is the
    # corrupt-record column on raw JSON/CSV — materialize first
    kept = read_documents(spark, str(p), format="json", keep_corrupt=True).cache()
    try:
        bad = kept.filter(F.col(CORRUPT_COL).isNotNull())
        assert bad.count() == 1
    finally:
        kept.unpersist()
