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


def test_pdf_landing_dir_handles_null_text_doc(spark, tmp_path, monkeypatch):
    """r13 review wave 5 (NULL class): the landing builder sliced
    r['text'] directly, so a NULL-text document among the first
    PDF_INGEST_DOCS crashed the fixture build with a TypeError. The
    fixture is NULL-free today, but the shape is in-model (the gopher
    NULL-text oracle work); a NULL text must degrade to one empty page
    — the parse kernel's errors->'' posture. Fails on the pre-r13
    code."""
    from pdf_using_hugging_face_and_vector_database_spark.operators import ann
    from pdf_using_hugging_face_and_vector_database_spark.streaming.ingest import (
        pdf_landing_dir,
    )

    monkeypatch.setattr(ann, "INDEX_ROOT", str(tmp_path / "idx"))
    docs = spark.createDataFrame(
        [
            (0, "real text " * 30, "en", "web", 300),
            (1, None, "en", "web", None),
            (2, "more text", "en", "web", 9),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    docs.coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    landing = pdf_landing_dir(spark, sf)
    names = sorted(f for f in os.listdir(landing) if f.endswith(".pdf"))
    assert names == ["doc_000000.pdf", "doc_000001.pdf", "doc_000002.pdf"]
    # the NULL-text doc parses to exactly one empty page
    pages = parse_pdf_pages(
        read_pdf_dir(spark, landing).withColumn(
            "doc_id",
            F.regexp_extract(F.col("path"), r"doc_(\d+)\.pdf$", 1).cast("long"),
        )
    )
    null_doc = pages.filter("doc_id = 1").select("page_no", "page_text").collect()
    assert [(r["page_no"], r["page_text"]) for r in null_doc] == [(0, "")]
