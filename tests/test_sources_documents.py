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


def test_csv_v1_exports_read_back_with_empty_null_marker(spark, tmp_path):
    """ADVICE r13: the \\N markers were an on-disk FORMAT change
    (CSV_LANDING_FORMAT_VERSION 1 -> 2). In a v1 export NULL lands as
    an UNQUOTED empty field and '' as a QUOTED one; the v1 reader
    conflated both to NULL. Under the v2 default reader the
    quoted-empty now reads back as '' — the documented drift for
    previously landed exports — while ``null_marker=""`` restores the
    exact v1 conflation for compatibility reads."""
    df = spark.createDataFrame(
        [
            (1, "hello", "en", "web", 5),
            (2, "", "en", "web", 0),
            (3, None, "en", "web", None),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(tmp_path / "v1_export")
    # v1 writer: plain CSV, no markers — NULL -> empty unquoted,
    # '' -> "" quoted
    df.write.mode("overwrite").option("header", "true").option(
        "escape", '"'
    ).csv(path)

    v2_default = {
        r["doc_id"]: r["text"]
        for r in read_documents(spark, path, format="csv").collect()
    }
    # the drift the version note documents: v1's quoted-empty fields
    # (read as NULL by the v1 reader) now come back as ''
    assert v2_default == {1: "hello", 2: "", 3: None}
    v1_compat = {
        r["doc_id"]: r["text"]
        for r in read_documents(
            spark, path, format="csv", null_marker=""
        ).collect()
    }
    assert v1_compat == {1: "hello", 2: None, 3: None}
