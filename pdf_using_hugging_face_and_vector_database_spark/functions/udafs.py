"""Grouped-aggregate pandas UDFs (the PySpark UDAF surface).

NOTE: no ``from __future__ import annotations`` here — pandas_udf
infers the UDF variant (series-to-scalar = grouped agg) from REAL
type annotations; stringified ones raise UNSUPPORTED_SIGNATURE.
"""

import pandas as pd

from pyspark.sql import functions as F


@F.pandas_udf("double")
def median_udaf(v: pd.Series) -> float:
    """Exact interpolated median over one group's Arrow batch."""
    return float(v.median())


# grouped-agg pandas UDFs cannot mix with built-in aggregates in one
# .agg() (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a UDAF too
@F.pandas_udf("long")
def count_udaf(v: pd.Series) -> int:
    return int(len(v))
