"""S2/S3/S4/T1/P2 — PDF ingest plumbing with the deterministic fakes
(real decoders absent in this container; schema/batch path is real)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.operators.pages import (
    concat_pages,
    ocr_fallback,
)
from pdf_using_hugging_face_and_vector_database_spark.sources.pdf import (
    ocr_pages,
    parse_pdf_pages,
)


def _binary_docs(spark, docs: dict[int, str]):
    rows = [(i, t.encode("utf-8")) for i, t in docs.items()]
    return spark.createDataFrame(rows, "doc_id long, content binary")


def test_parse_pages_explodes_formfeed(spark):
    df = _binary_docs(spark, {1: "page one\fpage two\fpage three", 2: "solo"})
    rows = parse_pdf_pages(df).orderBy("doc_id", "page_no").collect()
    assert [(r["doc_id"], r["page_no"], r["page_text"]) for r in rows] == [
        (1, 0, "page one"),
        (1, 1, "page two"),
        (1, 2, "page three"),
        (2, 0, "solo"),
    ]
    assert all(r["page_png"].startswith(b"FAKEPNG:") for r in rows)


PAGES_FIXTURE = [
    "Hello PDF world\nsecond line with (parens) and back\\slash",
    "Page two: the quick brown fox",
    "Page three has\nthree\nlines",
]


def test_pure_python_pdf_roundtrip():
    """A REAL (tiny, generated) PDF parses back to its exact page
    texts via the stdlib-only extractor — both uncompressed and
    Flate-compressed streams."""
    from pdf_using_hugging_face_and_vector_database_spark.sources.pdf_text import (
        extract_pdf_pages_text,
        make_pdf,
    )

    for compress in (False, True):
        blob = make_pdf(PAGES_FIXTURE, compress=compress)
        assert blob.startswith(b"%PDF") and b"%%EOF" in blob
        assert extract_pdf_pages_text(blob) == PAGES_FIXTURE, f"compress={compress}"


def test_pure_python_pdf_flate_stream_ending_in_cr():
    """Regression: a Flate stream whose compressed bytes end in 0x0d
    must not be truncated by EOL trimming — /Length is authoritative.
    ("xxx1503" compresses to a stream ending in 0x0d.)"""
    from pdf_using_hugging_face_and_vector_database_spark.sources.pdf_text import (
        extract_pdf_pages_text,
        make_pdf,
    )
    import zlib

    text = "xxx1503"
    assert zlib.compress(
        f"BT /F1 12 Tf 72 720 Td ({text}) Tj ET".encode()
    ).endswith(b"\r")  # the fixture actually exercises the edge
    assert extract_pdf_pages_text(make_pdf([text], compress=True)) == [text]


def test_parse_pdf_pages_malformed_pdf_degrades_to_empty_page(spark):
    """A %PDF payload the mini-parser can't handle (corrupt stream)
    degrades to one empty page — reference error semantics — instead
    of crashing the job or dropping the document."""
    bad = b"%PDF-1.4\n1 0 obj << /Length 9999 /Filter /FlateDecode >>\nstream\nnot-flate\nendstream\nendobj\ntrailer << /Root 1 0 R >>"
    df = spark.createDataFrame([(9, bad)], "doc_id long, content binary")
    rows = parse_pdf_pages(df).collect()
    assert [(r["doc_id"], r["page_no"], r["page_text"]) for r in rows] == [(9, 0, "")]


def test_pure_python_pdf_hex_strings():
    """Hex-string show ops (<...> Tj) decode too."""
    from pdf_using_hugging_face_and_vector_database_spark.sources.pdf_text import (
        extract_pdf_pages_text,
        make_pdf,
    )

    # equal-length substitution: /Length is authoritative for stream
    # extents, so the patched bytes must keep the stream size unchanged
    blob = make_pdf(["placeholder1"])
    hexed = blob.replace(b"(placeholder1) Tj", b"<686578206F6B> Tj")
    assert hexed != blob
    assert extract_pdf_pages_text(hexed) == ["hex ok"]


def test_parse_pdf_pages_real_pdf_binary(spark):
    """S2 end-to-end on actual PDF bytes through the Spark path: the
    mapInPandas parser must route %PDF content to the pure extractor
    and keep the (doc_id, page_no, page_text) contract."""
    from pdf_using_hugging_face_and_vector_database_spark.sources.pdf_text import (
        make_pdf,
    )

    df = spark.createDataFrame(
        [(1, make_pdf(PAGES_FIXTURE, compress=True)), (2, make_pdf(["solo page"]))],
        "doc_id long, content binary",
    )
    rows = parse_pdf_pages(df).orderBy("doc_id", "page_no").collect()
    assert [(r["doc_id"], r["page_no"], r["page_text"]) for r in rows] == [
        (1, 0, PAGES_FIXTURE[0]),
        (1, 1, PAGES_FIXTURE[1]),
        (1, 2, PAGES_FIXTURE[2]),
        (2, 0, "solo page"),
    ]


def test_concat_pages_order_correct(spark):
    # feed pages in scrambled order; concat must sort by page_no
    pages = spark.createDataFrame(
        [(1, 2, "C"), (1, 0, "A"), (1, 1, "B")],
        "doc_id long, page_no int, page_text string",
    ).repartition(4)
    out = concat_pages(pages).collect()
    assert out[0]["text"] == "ABC"


def test_ocr_fallback_doc_level(spark):
    """Reference semantics (`streamlit_app.py:63-69`): a doc with ANY
    embedded text uses the text layer for every page (no per-page OCR
    mixing); only a fully-empty doc falls back to OCR."""
    df = _binary_docs(
        spark,
        {
            1: "has text\f[[OCR:ignored]]",          # mixed: text layer wins
            2: "\f",                                  # empty: falls back to OCR
        },
    )
    pages = ocr_pages(parse_pdf_pages(df))
    # doc 2's pages are empty text; give its page 0 an OCR payload via marker
    # (fake OCR extracts [[OCR:...]] from page_text; doc 2 has none -> "")
    out = {r["doc_id"]: r["text"] for r in ocr_fallback(pages).collect()}
    assert out[1] == "has text[[OCR:ignored]]"
    assert out[2] == ""


def test_ocr_fallback_uses_ocr_text(spark):
    pages = spark.createDataFrame(
        [
            (1, 0, "", "recovered one"),
            (1, 1, " ", "recovered two"),
            (2, 0, "real text", "should not appear"),
        ],
        "doc_id long, page_no int, page_text string, ocr_text string",
    )
    out = {r["doc_id"]: r["text"] for r in ocr_fallback(pages).collect()}
    assert out[1] == "recovered onerecovered two"
    assert out[2] == "real text"
