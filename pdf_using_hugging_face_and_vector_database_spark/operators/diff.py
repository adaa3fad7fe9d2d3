"""Snapshot reconciliation — row-level diff of two table versions.

The CDC-backfill / data-reconciliation operator: given an old and a
new snapshot keyed the same way, emit one row per changed key with
the change class (insert / delete / update) and the exact set of
changed columns. At 100 TB this is one full-outer shuffle join on the
key (co-partitioned if both snapshots are bucketed on it) with a
codegen'd null-safe column comparison — no row-at-a-time logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Diff ``new`` against ``old``: returns
    (key..., change_type, changed_cols).

    - ``insert``: key only in new; ``delete``: key only in old;
    - ``update``: key in both with >=1 compare column differing under
      NULL-SAFE equality (NULL -> NULL is unchanged; NULL -> value is
      a change);
    - unchanged keys are dropped (the diff is the output, and at scale
      it is orders of magnitude smaller than the snapshots).

    ``changed_cols`` is name-sorted so downstream consumers and the
    cross-engine oracle see a canonical order.

    NULL-key contract (r12 review adjudication): the key join is
    PLAIN equality, so a row with a NULL key component matches
    nothing — it reports as ``delete`` (old side) or ``insert`` (new
    side), never ``update``/``same``. That is deliberate: a NULL key
    is not an identity (the rangejoin interval_id precedent), and the
    null-safe alternative would cross-match EVERY NULL-key old row
    with every NULL-key new row. Callers diffing tables whose keys
    can be NULL must filter or repair keys first. Pinned by
    tests/test_diff.py::test_table_diff_null_key_contract.

    Precondition (r15 review wave 10, recorded): ``key_cols`` must be
    unique within each snapshot — a duplicated key cross-multiplies in
    the full-outer join (m×n diff rows for that key), the standard CDC
    snapshot contract. Pre-compact with ``upsert`` if an input can
    carry duplicates (the general MERGE operator raises on them; a
    read-only diff has no cheap enforcement point without an extra
    window pass).
    """
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in key_cols],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in key_cols],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    cond = None
    for k in key_cols:
        eq = F.col(f"__ko_{k}") == F.col(f"__kn_{k}")
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")
    changed = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")),
                        F.lit(c),
                    )
                    for c in sorted(compare_cols)
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    change_type = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(F.size(changed) > 0, F.lit("update"))
        .otherwise(F.lit("same"))
    )
    out = j.select(
        *[
            F.coalesce(F.col(f"__ko_{k}"), F.col(f"__kn_{k}")).alias(k)
            for k in key_cols
        ],
        change_type.alias("change_type"),
        F.when(
            F.col("__in_old").isNotNull() & F.col("__in_new").isNotNull(),
            changed,
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
    )
    return out.filter(F.col("change_type") != "same")
