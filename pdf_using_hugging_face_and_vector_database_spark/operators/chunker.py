"""T2 — fixed-size text chunker (reference `streamlit_app.py:34-35`:
``CharacterTextSplitter(chunk_size=2000, chunk_overlap=100)``).

Two variants behind the same output schema (doc cols + ``chunk_index``
+ ``chunk_text``):

- :func:`chunk_stride` — fixed-stride windows, pure SQL
  (``posexplode(transform(sequence(...)))``). Stays in whole-stage
  codegen, scales linearly, and is exactly reproducible in the DuckDB
  oracle. This is the engine's default chunker.
- :func:`chunk_separator` — separator-aware greedy merge matching the
  published CharacterTextSplitter algorithm (split on ``"\\n\\n"``,
  greedily pack splits to ``chunk_size``, retain ``chunk_overlap``
  chars of tail). Arrow-batched Pandas UDF; rows-only checked.

At 100 TB both are embarrassingly parallel (per-row, no shuffle); the
explode multiplies rows in place within each task.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stride_chunks_expr(text: Column, chunk_size: int, chunk_overlap: int) -> Column:
    """Array of fixed-stride windows over ``text``.

    stride = size - overlap; n_chunks = 1 if len<=size else
    1 + ceil((len-size)/stride) (exact integer arithmetic so the DuckDB
    oracle matches bit-for-bit); chunk_i = substring(text, i*stride+1, size).
    """
    if chunk_overlap >= chunk_size:
        raise ValueError("chunk_overlap must be < chunk_size")
    stride = chunk_size - chunk_overlap
    length = F.length(text)
    n_chunks = F.when(length <= chunk_size, F.lit(1)).otherwise(
        F.lit(1) + ((length - F.lit(chunk_size) + F.lit(stride - 1)) / F.lit(stride)).cast("int")
    )
    return F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda i: F.substring(text, i * F.lit(stride) + F.lit(1), F.lit(chunk_size)),
    )


def chunk_stride(
    df: DataFrame,
    text_col: str = "text",
    chunk_size: int = 2000,
    chunk_overlap: int = 100,
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """One output row per chunk: ``keep_cols + (chunk_index, chunk_text)``."""
    arr = stride_chunks_expr(F.col(text_col), chunk_size, chunk_overlap)
    return df.select(
        *[F.col(c) for c in keep_cols],
        F.posexplode(arr).alias("chunk_index", "chunk_text"),
    )


def _split_separator(text: str, chunk_size: int, chunk_overlap: int, separator: str) -> list[str]:
    """Greedy separator merge, following the published langchain
    CharacterTextSplitter algorithm (split on separator, pack splits
    up to chunk_size, carry ``chunk_overlap`` chars of running tail).
    Pure function — deterministic, no library dependency."""
    if not text:
        return []
    splits = text.split(separator) if separator else [text]
    sep_len = len(separator)
    chunks: list[str] = []
    current: list[str] = []
    total = 0
    for s in splits:
        s_len = len(s)
        if current and total + s_len + sep_len > chunk_size:
            chunks.append(separator.join(current))
            # drop from the front until the retained tail <= overlap
            while current and total > chunk_overlap:
                total -= len(current[0]) + (sep_len if len(current) > 1 else 0)
                current.pop(0)
        current.append(s)
        total += s_len + (sep_len if len(current) > 1 else 0)
    if current:
        chunks.append(separator.join(current))
    # oversize single splits still emit (langchain warns, keeps them whole)
    return chunks


def chunk_separator(
    df: DataFrame,
    text_col: str = "text",
    chunk_size: int = 2000,
    chunk_overlap: int = 100,
    separator: str = "\n\n",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Separator-aware chunker (reference-faithful semantics) as an
    Arrow-batched Pandas UDF returning ``array<string>``, exploded."""

    @F.pandas_udf("array<string>")
    def split_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield s.map(
                lambda t: _split_separator(t or "", chunk_size, chunk_overlap, separator)
            )

    return df.select(
        *[F.col(c) for c in keep_cols],
        F.posexplode(split_udf(F.col(text_col))).alias("chunk_index", "chunk_text"),
    )


def chunk_stride_udtf(
    spark,
    df: DataFrame,
    text_col: str = "text",
    chunk_size: int = 2000,
    chunk_overlap: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """Python UDTF variant of :func:`chunk_stride` — the Spark 4 table
    function surface (SURVEY §2.5 UDF/UDAF/UDTF row): one LATERAL
    call per document emits its chunk rows. Same stride arithmetic as
    the pure-SQL shape, so they share an oracle; row-for-row identical
    (pinned in tests/test_chunker.py).

    The relational chunker remains the default at scale — a UDTF pays
    the Python-worker boundary — but the surface matters: it is how a
    user plugs a tokenizer-aware or semantic splitter into the same
    LATERAL position without touching the pipeline around it.
    """
    from pyspark.sql.functions import udtf

    stride = chunk_size - chunk_overlap

    @udtf(returnType="chunk_index int, chunk_text string")
    class StrideChunker:
        def eval(self, text: str):
            if text is None:
                return
            n = len(text)
            if n <= chunk_size:
                yield 0, text
                return
            count = 1 + ((n - chunk_size + stride - 1) // stride)
            for i in range(count):
                yield i, text[i * stride : i * stride + chunk_size]

    spark.udtf.register("stride_chunker_udtf", StrideChunker)
    view = f"__chunk_udtf_in_{id_col}"
    df.select(id_col, text_col).createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT d.{id_col}, c.chunk_index, c.chunk_text "
        f"FROM {view} d, LATERAL stride_chunker_udtf(d.{text_col}) c"
    )
