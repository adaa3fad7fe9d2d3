"""Incremental materialized-view maintenance.

A 100 TB warehouse cannot recompute its aggregate tables from scratch
every time late data lands; it refreshes only the partitions the new
batch touched and keeps every other MV row untouched. The operator
here is that splice:

    mv' = mv[partitions unchanged]  UNION  agg(base[partitions changed])

The changed-partition list is tiny by construction (it is the set of
partition keys in the incoming batch), so both joins broadcast it:
the keep side is a broadcast anti join over the MV (MV-scale, itself
small), and the recompute side is a broadcast semi join over the base
table — which prunes to the changed partitions' row groups when the
store is partitioned/clustered on the partition key, i.e. the scan
cost is proportional to the CHANGED data, never the corpus.

Correctness contract (driver-oracled in mv_incremental_refresh): the
spliced MV must equal a full from-scratch recompute, bit for bit —
exact-decimal sum carriers make the group aggregates independent of
which path produced them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def refresh_changed_partitions(
    base: DataFrame,
    mv: DataFrame,
    part_col: str,
    changed: DataFrame,
    agg_fn: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """Splice-refresh ``mv`` for the partition keys in ``changed``.

    ``base`` must carry ``part_col`` (the refreshed partitions are
    re-aggregated from it); ``changed`` is a 1-column DataFrame of
    partition keys; ``agg_fn`` maps a base slice to MV rows and MUST
    group by ``part_col`` (a partition's rows never mix with another
    partition's, which is what makes the splice sound).

    Both splice joins are NULL-SAFE (r12 review): groupBy treats NULL
    as a real partition key, but the plain-equality anti/semi joins
    never match NULL — so when the batch touched the NULL partition,
    the semi side skipped its recompute AND the anti side kept the
    stale NULL-partition MV row: the splice silently diverged from the
    from-scratch recompute exactly on that partition. Pinned by
    tests/test_matview.py::test_refresh_null_partition_key.
    """
    cond_keep = mv[part_col].eqNullSafe(changed[part_col])
    keep = mv.join(F.broadcast(changed), cond_keep, "left_anti")
    cond_re = base[part_col].eqNullSafe(changed[part_col])
    recomputed = agg_fn(base.join(F.broadcast(changed), cond_re, "left_semi"))
    return keep.unionByName(recomputed)
