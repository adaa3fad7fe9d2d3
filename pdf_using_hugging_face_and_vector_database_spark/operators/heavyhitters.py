"""Misra-Gries heavy hitters — the deterministic bounded-memory
frequent-items summary (the fourth sketch family beside HLL++, GK,
and DataSketches HLL/KLL, and the only one with a DETERMINISTIC
error bound rather than a probabilistic one).

Scale shape: each partition keeps at most ``k`` counters regardless
of cardinality (mapInPandas, Arrow-batched), and partial summaries
merge by plain per-item summation. The classical guarantee survives
the merge: each partition undercounts any item by at most
n_p/(k+1) decrement rounds, so the summed estimate e(x) satisfies
``true(x) - n/(k+1) <= e(x) <= true(x)`` — every item with true
frequency above n/(k+1) is GUARANTEED present. That bound is what the
driver oracle asserts (gate-style, like datasketch_gates): the
summary itself is partition-order-dependent, the bound is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_partial(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: at most ``k`` (item, est)
    rows per partition, one pass, O(k) memory."""
    import pandas as pd

    def gen(batches):
        counters: dict = {}
        for pdf in batches:
            for v in pdf[col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {"item": list(counters.keys()), "est": list(counters.values())}
        )

    return df.select(F.col(col).alias(col)).mapInPandas(
        gen, f"item string, est long"
    )


def merged_summary(df: DataFrame, col: str, k: int) -> DataFrame:
    """Merge the per-partition summaries by summation — (item, est)
    with the additive n/(k+1) undercount bound intact."""
    return (
        misra_gries_partial(df, col, k)
        .groupBy("item")
        .agg(F.sum("est").alias("est"))
    )
