from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.operators.chunker import (
    _split_separator,
    chunk_separator,
    chunk_stride,
)


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_stride_short_text_single_chunk(spark):
    out = chunk_stride(_df(spark, ["hello world"]), chunk_size=120, chunk_overlap=20).collect()
    assert len(out) == 1
    assert out[0]["chunk_index"] == 0
    assert out[0]["chunk_text"] == "hello world"


def test_stride_exact_boundary(spark):
    # exactly chunk_size chars -> one chunk
    out = chunk_stride(_df(spark, ["x" * 120]), chunk_size=120, chunk_overlap=20).collect()
    assert len(out) == 1


def test_stride_overlap_and_coverage(spark):
    text = "".join(chr(ord("a") + i % 26) for i in range(300))
    rows = sorted(
        chunk_stride(_df(spark, [text]), chunk_size=120, chunk_overlap=20).collect(),
        key=lambda r: r["chunk_index"],
    )
    # stride 100: chunks at 0,100,200 -> 3 chunks
    assert len(rows) == 3
    # consecutive chunks overlap by exactly 20 chars
    for a, b in zip(rows, rows[1:]):
        assert a["chunk_text"][-20:] == b["chunk_text"][:20]
    # reconstruction: drop the 20-char overlap from each subsequent chunk
    recon = rows[0]["chunk_text"] + "".join(r["chunk_text"][20:] for r in rows[1:])
    assert recon == text


def test_stride_empty_text_one_empty_chunk(spark):
    out = chunk_stride(_df(spark, [""]), chunk_size=120, chunk_overlap=20).collect()
    assert len(out) == 1
    assert out[0]["chunk_text"] == ""


def test_stride_rejects_bad_overlap(spark):
    with pytest.raises(ValueError):
        chunk_stride(_df(spark, ["x"]), chunk_size=100, chunk_overlap=100)


def test_separator_merge_pure():
    # splits of 40 chars; size 100 packs 2 per chunk (40+1+40=81, +41>100)
    splits = ["a" * 40, "b" * 40, "c" * 40, "d" * 40]
    chunks = _split_separator(" ".join(splits), 100, 0, " ")
    assert all(len(c) <= 100 for c in chunks)
    assert "".join(chunks).replace(" ", "") == "a" * 40 + "b" * 40 + "c" * 40 + "d" * 40


def test_separator_overlap_carries_tail():
    splits = ["a" * 40, "b" * 40, "c" * 40]
    chunks = _split_separator(" ".join(splits), 90, 45, " ")
    # with 45-char overlap budget the b-split is retained into chunk 2
    assert len(chunks) == 2
    assert chunks[1].startswith("b" * 40)


def test_separator_udf_matches_pure(spark):
    texts = ["word " * 50, "x" * 10, ""]
    out = (
        chunk_separator(_df(spark, texts), chunk_size=60, chunk_overlap=10, separator=" ")
        .orderBy("doc_id", "chunk_index")
        .collect()
    )
    expected = []
    for i, t in enumerate(texts):
        for j, c in enumerate(_split_separator(t, 60, 10, " ")):
            expected.append((i, j, c))
    assert [(r["doc_id"], r["chunk_index"], r["chunk_text"]) for r in out] == expected


def test_chunk_stride_udtf_matches_relational(spark, sf_dir):
    """The Spark 4 UDTF chunker must be row-identical to the pure-SQL
    stride chunker (they share the driver oracle)."""
    from pdf_using_hugging_face_and_vector_database_spark.io import read_table
    from pdf_using_hugging_face_and_vector_database_spark.operators.chunker import (
        chunk_stride,
        chunk_stride_udtf,
    )

    docs = read_table(spark, sf_dir, "documents")
    rel = sorted(
        (r["doc_id"], r["chunk_index"], r["chunk_text"])
        for r in chunk_stride(docs, chunk_size=120, chunk_overlap=20).collect()
    )
    udtf = sorted(
        (r["doc_id"], r["chunk_index"], r["chunk_text"])
        for r in chunk_stride_udtf(
            spark, docs, chunk_size=120, chunk_overlap=20
        ).collect()
    )
    assert rel == udtf
