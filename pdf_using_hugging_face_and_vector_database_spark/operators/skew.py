"""Skew-safe equi-join via key salting (§2.5 joins at 100 TB).

AQE's skew-join split (enabled in session.py) handles skew it can SEE
at shuffle time; salting is the explicit lever when a hot key is known
or AQE's per-partition splitting isn't enough (e.g. one key is 30% of
the table — splitting its partition still leaves one straggler task
per split reading the same build side).

Shape: the BIG side gets a deterministic salt in [0, n_salt) derived
from a per-row column (NOT the join key — the whole point is spreading
one key's rows across salts); the SMALL side is exploded into n_salt
replicas; the join runs on (key, salt), so a hot key's rows land in
n_salt different shuffle partitions. Result is exactly the plain join
(verified against the unsalted oracle), cost is a small-side blow-up
of n_salt — the standard trade.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, spread_col: str | Column, n_salt: int) -> DataFrame:
    """Deterministic salt in [0, n_salt): pmod(xxhash64(spread_col)).
    ``spread_col`` must vary WITHIN a join key (a row id, an event id)
    — salting by the key itself would change nothing."""
    c = F.col(spread_col) if isinstance(spread_col, str) else spread_col
    return df.withColumn(SALT_COL, F.pmod(F.xxhash64(c), F.lit(n_salt)).cast("int"))


def explode_salt(df: DataFrame, n_salt: int) -> DataFrame:
    """Replicate every row once per salt value (the small-side half)."""
    # sequence of int literals is already array<int>; a generator can't
    # be nested inside a cast expression
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    spread_col: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on``, resistant to hot keys in
    ``big``. Semantically identical to ``big.join(small, on, how)`` for
    inner/left joins (small-side rows replicate; each big row matches
    exactly its own salt's replica).

    ``how`` is REFUSED outside inner/left (r12 review): the small side
    is physically replicated ``n_salt`` times, so under right/full a
    never-matched small row would null-extend once PER REPLICA —
    n_salt duplicate rows where the plain join emits one. The rewrite
    is only result-invariant when unmatched small rows are dropped
    (inner) or irrelevant (left); an outer-small salted join needs the
    dedup-by-identity recovery range_join uses, not this shape."""
    # Spark's join aliases for the safe modes stay accepted (ADVICE
    # r12: the r12 guard rejected 'left_outer'/'leftouter', which had
    # worked with identical semantics before it)
    how = {"left_outer": "left", "leftouter": "left"}.get(how, how)
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join: how={how!r} is not result-invariant under "
            "small-side replication (unmatched small rows would emit "
            "once per salt replica); use inner or left"
        )
    b = with_salt(big, spread_col, n_salt)
    s = explode_salt(small, n_salt)
    return b.join(s, [on, SALT_COL], how).drop(SALT_COL)
