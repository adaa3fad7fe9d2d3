"""Grouped-aggregate pandas UDFs (the PySpark UDAF surface).

NOTE: no ``from __future__ import annotations`` here — pandas_udf
infers the UDF variant (series-to-scalar = grouped agg) from REAL
type annotations; stringified ones raise UNSUPPORTED_SIGNATURE.
"""

import pandas as pd

from pyspark.sql import functions as F


@F.pandas_udf("double")
def median_udaf(v: pd.Series) -> float:
    """Exact interpolated median over one group's Arrow batch.

    NULL-only groups return NULL (r12 review adjudication): NULLs
    arrive as NaN in the Arrow batch and pandas' median skips them
    (matching SQL median's NULL-skip); an all-NULL group's NaN result
    was ALREADY nulled by the pandas->Arrow return conversion
    (measured: the old code returns NULL too), but that relied on an
    implicit conversion default — made explicit here so the SQL
    contract is in the code, pinned by
    tests/test_vector.py::test_median_udaf_null_only_group_is_null."""
    vv = v.dropna()
    if not len(vv):
        return None
    return float(vv.median())


# grouped-agg pandas UDFs cannot mix with built-in aggregates in one
# .agg() (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a UDAF too
@F.pandas_udf("long")
def count_udaf(v: pd.Series) -> int:
    return int(len(v))
