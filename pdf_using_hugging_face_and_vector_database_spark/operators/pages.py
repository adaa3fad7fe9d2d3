"""T1 — per-page text concat (reference `streamlit_app.py:63,74-79`:
``"".join(page.get_text() for page in doc)``) and P2 — the doc-level
OCR fallback branch (`streamlit_app.py:65-69`).

Order matters: pages concatenate in page order, so the aggregation
sorts (page_no, text) structs before joining — ``collect_list`` alone
has no ordering guarantee across shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def concat_pages(
    df: DataFrame,
    doc_id: str = "doc_id",
    page_no: str = "page_no",
    text_col: str = "page_text",
    out_col: str = "text",
) -> DataFrame:
    """groupBy(doc) -> array_sort by page_no -> concat_ws('')."""
    return (
        df.groupBy(doc_id)
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col(page_no), F.col(text_col)))
                    ),
                    lambda s: s[text_col],
                ),
            ).alias(out_col)
        )
    )


def ocr_fallback(
    pages: DataFrame,
    ocr_text_col: str = "ocr_text",
    doc_id: str = "doc_id",
) -> DataFrame:
    """P2 — the reference's *doc-level* fallback: if a document's
    embedded text layer is empty after trimming, use OCR text for ALL
    its pages; otherwise use the text layer for all pages (a mixed
    scanned/text PDF gets no OCR — reference semantics,
    `streamlit_app.py:63-69`, preserved deliberately).

    Input: per-page rows with both page_text and ocr_text. Output:
    per-doc concatenated text.
    """
    text_layer = concat_pages(pages, doc_id=doc_id, text_col="page_text", out_col="text_layer")
    ocr_layer = concat_pages(pages, doc_id=doc_id, text_col=ocr_text_col, out_col="text_ocr")
    return (
        text_layer.join(ocr_layer, doc_id)
        .select(
            doc_id,
            F.when(
                F.length(F.trim(F.col("text_layer"))) > 0, F.col("text_layer")
            )
            .otherwise(F.col("text_ocr"))
            .alias("text"),
        )
    )
