"""S2/S3/S4 — PDF parse, page rasterize, OCR (reference
`streamlit_app.py:60-86`): per-page text extraction with a *doc-level*
OCR fallback when no page has an embedded text layer.

Parse picks the best available decoder per document:

1. PyMuPDF (``fitz``) when importable — the full real path (clusters);
2. actual ``%PDF`` bytes without fitz — the pure-Python text-layer
   extractor in ``sources/pdf_text.py`` (stdlib-only: object scan,
   page-tree walk, FlateDecode, Tj/TJ string ops), so real PDFs parse
   end-to-end even in this container;
3. anything else — a clearly marked deterministic fake: content bytes
   decoded as UTF-8, pages split on ``\\f`` (form feed) — same row
   shape, schema, and batch path as the real thing, so the Spark
   plumbing (mapInPandas, explode, doc-level fallback branch) is fully
   exercised by tests.

Rasterize/OCR (S3/S4) remain gated fakes without PIL/tesseract:
- fake rasterize: a deterministic pseudo-PNG (b"FAKEPNG" + md5 of the
  page text) — a stand-in binary multimodal column.
- fake OCR: extracts a marker payload ("[[OCR:...]]") if present,
  else "" — mirroring the reference's swallow-errors-to-"" behavior
  (`streamlit_app.py:84-86`).

All three run as ``mapInPandas`` over Arrow batches: one Python worker
per partition amortizes decoder/process startup (the reference forks a
tesseract subprocess per page, `streamlit_app.py:83`).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGES_SCHEMA = "doc_id long, page_no int, page_text string, page_png binary"


def _have_fitz() -> bool:
    try:
        import fitz  # noqa: F401,PLC0415

        return True
    except ImportError:
        return False


def _have_tesseract() -> bool:
    try:
        import pytesseract  # noqa: F401,PLC0415

        return True
    except ImportError:
        return False


def _fake_parse_pages(content: bytes) -> list[str]:
    """DETERMINISTIC FAKE (no PyMuPDF in container): utf-8 decode,
    pages split on form-feed."""
    try:
        text = (content or b"").decode("utf-8")
    except UnicodeDecodeError:
        return [""]
    return text.split("\f")


def _fake_png(page_text: str) -> bytes:
    """DETERMINISTIC FAKE rasterizer (no PyMuPDF): tagged md5 payload."""
    return b"FAKEPNG:" + hashlib.md5(page_text.encode("utf-8")).hexdigest().encode()


def _real_parse_pages(content: bytes) -> list[tuple[str, bytes]]:
    import fitz  # noqa: PLC0415

    doc = fitz.open(stream=content, filetype="pdf")
    out = []
    for page in doc:
        out.append((page.get_text("text"), page.get_pixmap().tobytes("png")))
    return out


def parse_pdf_pages(binary_df: DataFrame, doc_id_col: str = "doc_id") -> DataFrame:
    """S2+S3 — explode PDF binaries into per-page rows
    (doc_id, page_no, page_text, page_png).

    Input needs (doc_id, content:binary). Real PyMuPDF when importable;
    deterministic fake otherwise (same schema/partitioning).
    """
    use_real = _have_fitz()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .pdf_text import extract_pdf_pages_text

        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf[doc_id_col], pdf["content"]):
                content = bytes(content) if content is not None else b""
                if use_real:
                    pages = _real_parse_pages(content)
                elif content.startswith(b"%PDF"):
                    # real PDF, no fitz: pure-Python text-layer parse.
                    # Malformed/unsupported PDFs (corrupt Flate, object
                    # streams, encryption) degrade to ONE empty page —
                    # reference error semantics (errors -> "",
                    # streamlit_app.py:84-86) and the doc stays visible
                    # for the S4 OCR-fallback branch instead of
                    # vanishing or killing the job.
                    try:
                        texts = extract_pdf_pages_text(content) or [""]
                    except Exception:
                        texts = [""]
                    pages = [(t, _fake_png(t)) for t in texts]
                else:
                    pages = [(t, _fake_png(t)) for t in _fake_parse_pages(content)]
                for i, (text, png) in enumerate(pages):
                    rows.append((doc_id, i, text, png))
            yield pd.DataFrame(
                rows, columns=["doc_id", "page_no", "page_text", "page_png"]
            )

    return binary_df.select(F.col(doc_id_col), "content").mapInPandas(
        run, schema=PAGES_SCHEMA
    )


def ocr_pages(pages_df: DataFrame) -> DataFrame:
    """S4 — OCR each page image to text; per-page errors degrade to ""
    (reference semantics, `streamlit_app.py:84-86`)."""
    use_real = _have_tesseract()

    def _fake_ocr(png: bytes, page_text: str) -> str:
        # the fake "recognizes" an OCR payload marker in the page text
        if "[[OCR:" in (page_text or ""):
            return page_text.split("[[OCR:", 1)[1].split("]]", 1)[0]
        return ""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if use_real:
            import io  # noqa: PLC0415

            import pytesseract  # noqa: PLC0415
            from PIL import Image  # noqa: PLC0415
        for pdf in batches:
            ocr_texts = []
            for png, ptext in zip(pdf["page_png"], pdf["page_text"]):
                try:
                    if use_real:
                        img = Image.open(io.BytesIO(bytes(png)))
                        ocr_texts.append(pytesseract.image_to_string(img))
                    else:
                        ocr_texts.append(_fake_ocr(png, ptext))
                except Exception:
                    ocr_texts.append("")  # swallow per-page errors, as reference
            yield pdf.assign(ocr_text=ocr_texts)

    schema = PAGES_SCHEMA + ", ocr_text string"
    return pages_df.mapInPandas(run, schema=schema)
