"""T3 — batch embedder (reference `streamlit_app.py:89-94`:
``SentenceTransformer('all-MiniLM-L6-v2').encode(texts) -> (n, 384)``).

Two implementations behind one interface (UDF-swap discipline,
SURVEY.md §5):

- :func:`embed_deterministic` — seeded md5 hash-projection to a unit
  vector, pure SQL, exactly reproducible in DuckDB. Used by every
  oracle-checked query.
- :func:`embed_model` — the real sentence-transformer as an *iterator*
  Pandas UDF with a per-executor-process model singleton (the
  reference reloads the model on every upload, `streamlit_app.py:138`
  — an anti-pattern we deliberately do not copy). Gated behind an
  import-try; this container has no torch, so it raises cleanly.

Scale: both are per-row map operators — no shuffle. The model variant
batches via Arrow (``spark.sql.execution.arrow.maxRecordsPerBatch``)
which replaces the reference's encode-internal minibatching
(`streamlit_app.py:94`).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash_components
from ..schemas import FIXTURE_DIM


def normalize_expr(arr: Column) -> Column:
    """Divide an (already materialized) array column by its L2 norm in
    one aggregate pass — the finish lambda sees the summed squares, so
    the norm is computed once per row, not once per element.

    Zero vectors stay zero (r12 review, the functions.vector
    .l2_normalize contract): non-ANSI 0.0/0.0 is NULL, which would
    poison every downstream dot/LSH hash. Unreachable from the
    deterministic md5 embedder (a component is exactly 0 only at an
    impossible half-integer hash), but the codec-gated real-model
    path can emit zero vectors for degenerate inputs."""
    return F.aggregate(
        arr,
        F.lit(0.0),
        lambda acc, x: acc + x * x,
        lambda sq: F.transform(
            arr,
            lambda x: F.when(sq == 0.0, F.lit(0.0)).otherwise(x / F.sqrt(sq)),
        ),
    )


def embed_deterministic(
    df: DataFrame,
    text_col: str = "chunk_text",
    out_col: str = "embedding",
    dim: int = FIXTURE_DIM,
) -> DataFrame:
    """L2-normalized ``array<double>`` embedding, a pure function of the
    text. Components are md5 hash projections folded into [-1, 1]
    (functions/hashing.py), then divided by the L2 norm — matching the
    reference's unit-sphere cosine geometry (`streamlit_app.py:49`).

    The raw components land in a temp column first so the 64 md5
    evaluations run once per row (the normalize pass re-reads the
    materialized array instead of re-deriving it).
    """
    tmp = f"__{out_col}_raw"
    return (
        df.withColumn(tmp, hash_components(F.col(text_col), dim))
        .withColumn(out_col, normalize_expr(F.col(tmp)))
        .drop(tmp)
    )


_MODEL_CACHE: dict[str, object] = {}


def _get_model(name: str):
    # Per-executor-process lazy singleton — loaded once per Python
    # worker, not once per upload like the reference (:138).
    if name not in _MODEL_CACHE:
        from sentence_transformers import SentenceTransformer  # noqa: PLC0415

        _MODEL_CACHE[name] = SentenceTransformer(name)
    return _MODEL_CACHE[name]


def model_available(name: str = "all-MiniLM-L6-v2") -> bool:
    try:
        import sentence_transformers  # noqa: F401,PLC0415

        return True
    except ImportError:
        return False


def embed_model(
    df: DataFrame,
    text_col: str = "chunk_text",
    out_col: str = "embedding",
    model_name: str = "all-MiniLM-L6-v2",
) -> DataFrame:
    """Model-backed embedder (384-d for the reference's default model).

    Raises ImportError at plan-build time if sentence-transformers is
    not installed (it is not baked into this container).
    """
    if not model_available(model_name):
        raise ImportError(
            "sentence-transformers not installed; use embed_deterministic "
            "for oracle-checkable runs (same operator interface)"
        )

    @F.pandas_udf("array<float>")
    def encode_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = _get_model(model_name)
        for s in it:
            vecs = model.encode(s.fillna("").tolist())
            yield pd.Series(list(vecs))

    return df.withColumn(out_col, encode_udf(F.col(text_col)))
