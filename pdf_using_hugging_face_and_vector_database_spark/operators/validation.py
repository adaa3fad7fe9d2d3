"""P5 — schema/dimension validation (reference `streamlit_app.py:142-143`:
``if embeddings.shape[1] != 384: st.error(...)``).

Spark SQL has no fixed-length array type, so dimension enforcement is
a validation operator applied at the write boundary — a cheap
``size(embedding) = dim`` predicate that stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class DimensionError(ValueError):
    pass


def dim_ok(vec_col: Column | str, dim: int) -> Column:
    vec_col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return vec_col.isNotNull() & (F.size(vec_col) == dim)


def validate_dim(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 384,
    strict: bool = True,
) -> DataFrame:
    """strict=True: raise if any row violates (one cheap count over the
    violating slice — the reference's behavior, as a job-level check).
    strict=False: filter violating rows through (quarantine pattern).
    """
    if strict:
        bad = df.filter(~dim_ok(vec_col, dim)).limit(1).count()
        if bad:
            raise DimensionError(f"embedding dimension != {dim}")
        return df
    return df.filter(dim_ok(vec_col, dim))


def null_guard(df: DataFrame, col: str) -> DataFrame:
    """P1 — reject null inputs (reference `streamlit_app.py:29-30`)."""
    return df.filter(F.col(col).isNotNull())
