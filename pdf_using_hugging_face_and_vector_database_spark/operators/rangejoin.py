"""Banded interval (range) join — a custom operator Spark lacks
natively (named in the build brief alongside as-of join; DuckDB plans
these with a native IEJoin, which serves as the oracle).

The naive plan for ``point.ts BETWEEN interval.start AND interval.end``
is a conditional cross product — O(|points| x |intervals|) per key at
100 TB. The banded rewrite makes it an EQUI-join:

- points get one bucket: floor(ts / W);
- intervals explode into every bucket they overlap,
  floor(start / W) .. floor(end / W) — (len/W + 1) rows each;
- join on (keys..., bucket), then the exact BETWEEN predicate verifies
  inside the join stage (codegen'd, before any materialization).

No dedup pass is needed: a point lives in exactly ONE bucket, so each
qualifying (point, interval) pair meets exactly once — unlike banded
self-joins (simhash/minhash) that must dropDuplicates. Choose W near
the typical interval length: W >> len wastes bucket selectivity,
W << len multiplies the interval explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUCKET_COL = "__rj_bucket"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    on: tuple[str, ...] = (),
    bucket_seconds: int = 3600,
    how: str = "inner",
    interval_id: tuple[str, ...] = (),
) -> DataFrame:
    """points ⋈ intervals where ``start <= ts <= end`` (inclusive both
    ends, matching SQL BETWEEN) and the ``on`` keys are equal. Output
    columns = points ∪ intervals (minus the helper bucket). Column
    names must be disjoint apart from ``on``.

    ``how``: ``'inner'``, ``'left'`` (all points kept; a point inside
    no interval comes back once, null-extended on the interval
    columns), ``'right'`` or ``'full'`` (r10: unmatched INTERVALS also
    kept, exactly once — requires ``interval_id``, see below). The
    variants place the exact BETWEEN predicate differently — and must:

    - inner: verify AFTER the equi-join (a plain codegen'd filter on
      the join output — the cheapest placement);
    - left: verify INSIDE the join condition, as equality conjuncts on
      (keys, bucket) plus the range residual — a post-join filter
      would silently drop the null-extended rows, degrading to inner.
      Catalyst still extracts the equality conjuncts, so the shuffle
      shape (hash-partition on keys+bucket) is identical to inner;
      the residual just evaluates during the probe. Because a point
      lives in exactly ONE bucket, an unmatched point null-extends
      exactly once — no dedup pass.
    - right/full: intervals are EXPLODED into one row per overlapped
      bucket, so null-extending the join's unmatched replicas would
      emit once per replica, not per interval. Instead the unmatched
      intervals are recovered from the ORIGINAL (un-exploded) side:
      matched ``interval_id``s are collected from the banded join
      (a distinct bounded by the matched-interval count) and
      anti-joined back — each never-matched interval then emits
      exactly once, null-extended on the point columns, with its own
      key values in the ``on`` columns. That is why these modes
      require ``interval_id`` (column(s) uniquely identifying an
      interval row, NON-NULL — an interval whose id is null is
      unidentifiable and is never null-extended, though it still
      joins normally on the matched side; SQL's null-never-equals
      would otherwise make a matched null-id interval ALSO emit as
      unmatched): there is no correct replica-level dedup without an
      identity, which is also why they were previously refused.
      ``interval_id`` must be disjoint from ``on``: in the full
      variant's left base an unmatched POINT carries a non-null value
      in the shared key column, which would poison the matched-id set
      and suppress legitimately unmatched intervals. right = inner ∪
      unmatched-intervals; full = left ∪ unmatched-intervals. Cost
      over left: the matched ids are a distinct bounded by the
      matched-interval count plus a broadcast-able anti-join on the
      interval side; the matched banded join feeds THREE consumers in
      one action, so it is PERSISTED by default (r11, measured at 50×:
      13.7 s → 3.21 s — ReusedExchange dedupes only the shuffle write,
      not the probe).

    CALLER CONTRACT (right/full only, ADVICE r11): the persisted base
    is registered in the session-lifetime ``caching`` registry at
    plan-build time. The driver's query wrappers call
    ``release_caches()`` between queries; any OTHER caller building
    right/full range joins repeatedly in one session (library use,
    property tests) must do the same — call
    ``caching.release_caches()`` per join, or build inside
    ``caching.scoped_caches()`` if the result is fully consumed within
    the scope. Without a release the cached bases accumulate until
    session end.
    """
    if how not in ("inner", "left", "right", "full"):
        raise ValueError(f"range_join: unknown how={how!r}")
    if how in ("right", "full"):
        if not interval_id:
            raise ValueError(
                "range_join how='right'/'full' needs interval_id: "
                "unmatched intervals are recovered by identity from the "
                "un-exploded side (an exploded replica cannot be "
                "null-extended exactly once without one)"
            )
        clash = sorted(set(interval_id) & set(on))
        if clash:
            raise ValueError(
                f"interval_id columns {clash} overlap the 'on' keys: in "
                "the full variant's left base an unmatched point carries "
                "a non-null value there, poisoning the matched-id set"
            )
    if how in ("right", "full"):
        missing = [c for c in interval_id if c not in intervals.columns]
        if missing:
            raise ValueError(f"interval_id columns not in intervals: {missing}")
        from ..caching import persist_tracked

        # matched side first: inner (right) or left (full) banded join.
        # PERSISTED (r11 — measured at 50×): the base feeds THREE
        # consumers inside one action — the matched-ids distinct, the
        # anti-join's broadcast side, and the union's matched branch —
        # and without the cache the banded-join PROBE re-ran per
        # consumer (ReusedExchange dedupes only the shuffle write).
        # That was fine at 10×/20× (exponents 0.09/0.12) but at 50×
        # the full variant read 13.7 s vs the left branch's 1.78 s
        # (exponent 0.62 vs 0.22) — the exact "materialize the matched
        # side first if the double probe mattered" escape hatch the
        # original design documented, now the default. MEMORY_AND_DISK
        # persist is the local stand-in for the warehouse
        # materialize-to-storage step; released by release_caches()
        # between queries like every tracked intermediate.
        base = persist_tracked(
            range_join(
                points, intervals, point_ts, start_col, end_col,
                on=on, bucket_seconds=bucket_seconds,
                how="inner" if how == "right" else "left",
            )
        )
        matched = base
        for c in interval_id:
            # in the full/left base the unmatched-POINT rows carry null
            # interval ids — they matched nothing (interval_id is
            # guarded disjoint from `on`, so no point-side value can
            # leak into this projection)
            matched = matched.filter(F.col(c).isNotNull())
        # tiny (bounded by the matched-interval count); derived from
        # the persisted base, so no extra probe
        mids = matched.select(
            *[F.col(c).alias(f"__rj_m_{c}") for c in interval_id]
        ).dropDuplicates()
        anti_cond = None
        for c in interval_id:
            term = intervals[c] == F.col(f"__rj_m_{c}")
            anti_cond = term if anti_cond is None else anti_cond & term
        # a null-id interval is unidentifiable: it can never appear in
        # mids (filtered above) and null-never-equals would keep it in
        # the anti-join even when MATCHED — emitting it twice. Exclude
        # it from recovery instead (documented contract).
        never_matched = intervals.join(mids, anti_cond, "left_anti")
        for c in interval_id:
            never_matched = never_matched.filter(F.col(c).isNotNull())
        point_types = {f.name: f.dataType for f in points.schema.fields}
        u = never_matched.select(
            *[
                F.col(c)
                if c in intervals.columns
                else F.lit(None).cast(point_types[c]).alias(c)
                for c in base.columns
            ]
        )
        return base.unionByName(u)
    w_us = F.lit(int(bucket_seconds) * 1_000_000)
    p = points.withColumn(
        BUCKET_COL, F.floor(F.unix_micros(F.col(point_ts)) / w_us)
    )
    i = intervals.withColumn(
        BUCKET_COL,
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / w_us),
                F.floor(F.unix_micros(F.col(end_col)) / w_us),
            )
        ),
    )
    if how == "left":
        # both sides may share lineage (self-join on one source table),
        # where df[col] disambiguation silently resolves to one side —
        # rename the interval side's key/bucket columns so every join
        # and drop reference is by a UNIQUE name instead
        rbucket = BUCKET_COL + "_r"
        rkeys = {k: f"__rj_r_{k}" for k in on}
        r = i.withColumnRenamed(BUCKET_COL, rbucket)
        for k, rk in rkeys.items():
            r = r.withColumnRenamed(k, rk)
        cond = F.col(BUCKET_COL) == F.col(rbucket)
        for k, rk in rkeys.items():
            cond = cond & (F.col(k) == F.col(rk))
        cond = cond & (F.col(point_ts) >= F.col(start_col)) & (
            F.col(point_ts) <= F.col(end_col)
        )
        joined = p.join(r, cond, "left")
        return joined.drop(BUCKET_COL, rbucket, *rkeys.values())
    joined = p.join(i, [*on, BUCKET_COL], how)
    verified = joined.filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col))
    )
    return verified.drop(BUCKET_COL)


def pit_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    time_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Point-in-time (AS OF) join of a fact table against a Type-2
    dimension: each fact row picks the dimension version whose
    half-open validity interval ``[valid_from, valid_to)`` contains
    the fact's ``time_col`` (``valid_to`` NULL = open current row).

    Scale shape: because SCD2 intervals are DISJOINT per key (the
    scd2_from_changelog invariant), this is a plain equi-join on the
    key with an interval residual — each fact matches at most one
    version, so no dedup, no window, no sort. Fact-side fan-out per
    key is the version count (change-log depth, bounded); the dim is
    usually the broadcast side. This is the shape warehouse PIT joins
    want at 100 TB — contrast the union+last_value as-of join
    (queries.asof_join_events), which is the EVENT-STREAM as-of where
    the right side has no interval structure to exploit.

    ``how='left'`` is supported as-is: the interval predicate lives
    INSIDE the join condition (unlike range_join's inner path), so
    facts before the first version or with an unknown key null-extend
    exactly once — semantics pinned by
    tests/test_pit.py::test_pit_join_left_outer_semantics.
    """
    cond = (
        (facts[key] == dim[key])
        & (facts[time_col] >= dim[valid_from])
        & (dim[valid_to].isNull() | (facts[time_col] < dim[valid_to]))
    )
    return facts.join(dim, cond, how).drop(dim[key])
