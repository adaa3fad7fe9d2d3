"""T4/T5 — vector id + metadata construction (reference
`streamlit_app.py:102,147`).

The reference enumerates embeddings positionally (``doc-{i}``), which
restarts at doc-0 every upload and silently overwrites prior uploads
via upsert. We key by content position instead:
``doc-{doc_id}-{chunk_index}`` — stable, collision-free, and
join-friendly (documented divergence, SURVEY.md §2.3 T4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_vector_id(
    df: DataFrame,
    doc_id: str = "doc_id",
    chunk_index: str = "chunk_index",
    out_col: str = "id",
) -> DataFrame:
    return df.withColumn(
        out_col,
        F.concat_ws("-", F.lit("doc"), F.col(doc_id), F.col(chunk_index)),
    )


def with_metadata(
    df: DataFrame,
    chunk_index: str = "chunk_index",
    source: str = "source",
    out_col: str = "metadata",
) -> DataFrame:
    """The reference's per-chunk metadata dict
    ``{"chunk_index": i, "source": "uploaded_pdf"}`` as a map column."""
    return df.withColumn(
        out_col,
        F.create_map(
            F.lit("chunk_index"),
            F.col(chunk_index).cast("string"),
            F.lit("source"),
            F.col(source),
        ),
    )


def with_positional_id(df: DataFrame, order_col: str, out_col: str = "id") -> DataFrame:
    """The reference's literal positional scheme (``doc-{i}``) for
    parity demos — requires a global ordering, which is a single-point
    bottleneck at scale; prefer with_vector_id."""
    from pyspark.sql import Window

    w = Window.orderBy(order_col)
    return df.withColumn(
        out_col, F.concat(F.lit("doc-"), (F.row_number().over(w) - 1).cast("string"))
    )
