"""S1 streaming variant — continuous document ingest: binaryFile
readStream over a landing directory -> parse pages -> concat -> chunk
-> deterministic embed -> memory sink. The streaming analog of the
reference's one-file-per-interaction upload loop
(`streamlit_app.py:127`)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.operators.chunker import (
    stride_chunks_expr,
)
from pdf_using_hugging_face_and_vector_database_spark.operators.embedder import (
    embed_deterministic,
)
from pdf_using_hugging_face_and_vector_database_spark.sources.binaryfile import (
    read_pdf_dir,
    read_pdf_dir_stream,
)
from pdf_using_hugging_face_and_vector_database_spark.sources.pdf import parse_pdf_pages


def _landing_dir(tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    (d / "a.pdf").write_bytes("first page text\fsecond page".encode())
    (d / "b.pdf").write_bytes("single page doc".encode())
    (d / "ignored.txt").write_bytes(b"not a pdf")
    return str(d)


def test_batch_binaryfile_source_filters_pdfs(spark, tmp_path):
    d = _landing_dir(tmp_path)
    df = read_pdf_dir(spark, d)
    rows = df.select("path", "length").collect()
    assert len(rows) == 2
    assert all(r["path"].endswith(".pdf") for r in rows)


def test_stream_pdf_ingest_query_reconstructs_documents(spark, tmp_path, monkeypatch):
    """The registered driver query: landing dir of real PDFs -> stream
    -> parse -> reassemble must reproduce the source text exactly."""
    from pdf_using_hugging_face_and_vector_database_spark.operators import ann
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        stream_pdf_ingest,
    )

    monkeypatch.setattr(ann, "INDEX_ROOT", str(tmp_path / "idx"))
    sf = "/root/testdata/sf0.001"
    out = {r["doc_id"]: r for r in stream_pdf_ingest(spark, sf).collect()}
    src = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .filter("doc_id < 40")
        .collect()
    }
    assert set(out) == set(src)
    for doc_id, text in src.items():
        assert out[doc_id]["text"] == text
        assert out[doc_id]["n_pages"] == max(1, -(-len(text) // 400))


def test_streaming_ingest_end_to_end(spark, tmp_path):
    d = _landing_dir(tmp_path)
    stream = read_pdf_dir_stream(spark, d)
    # doc_id from the file path (stable content-addressed key)
    with_id = stream.withColumn(
        "doc_id", F.abs(F.xxhash64(F.col("path")))
    )
    pages = parse_pdf_pages(with_id)
    chunks = pages.select(
        "doc_id",
        "page_no",
        F.posexplode(
            stride_chunks_expr(F.col("page_text"), 10, 2)
        ).alias("chunk_index", "chunk_text"),
    )
    vectors = embed_deterministic(chunks, "chunk_text", dim=16)
    q = (
        vectors.writeStream.outputMode("append")
        .format("memory")
        .queryName("ingest_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT * FROM ingest_stream").collect()
    # 3 pages total; page texts of 15/11/15 chars -> 2/2/2 chunks @ (10,2)
    assert len(out) == 6
    assert {len(r["embedding"]) for r in out} == {16}
    # norms ~1 (unit embeddings) even through the streaming path
    for r in out:
        s = sum(x * x for x in r["embedding"])
        assert abs(s - 1.0) < 1e-9
