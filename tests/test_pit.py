"""pit_join: interval semantics against a hand-built SCD2 dimension —
half-open boundaries, open current row, before-first-version drop,
and the at-most-one-match invariant on the real query graph."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.operators.rangejoin import pit_join

DIM_ROWS = [
    # key, attr, valid_from, valid_to, version
    (1, "LOW", dt.date(2020, 1, 1), dt.date(2020, 6, 1), 1),
    (1, "HIGH", dt.date(2020, 6, 1), None, 2),
    (2, "MED", dt.date(2021, 1, 1), None, 1),
]


def _dim(spark):
    return spark.createDataFrame(
        DIM_ROWS, "k int, attr string, valid_from date, valid_to date, version int"
    )


def test_interval_semantics(spark):
    facts = spark.createDataFrame(
        [
            (1, dt.date(2020, 3, 1)),   # inside v1
            (1, dt.date(2020, 6, 1)),   # boundary: half-open -> v2
            (1, dt.date(2025, 1, 1)),   # open current row -> v2
            (1, dt.date(2019, 1, 1)),   # before first version -> dropped
            (2, dt.date(2021, 1, 1)),   # valid_from inclusive -> v1
            (3, dt.date(2021, 1, 1)),   # unknown key -> dropped
        ],
        "k int, t date",
    )
    out = pit_join(facts, _dim(spark), key="k", time_col="t").collect()
    got = {(r.k, str(r.t)): (r.attr, r.version) for r in out}
    assert got == {
        (1, "2020-03-01"): ("LOW", 1),
        (1, "2020-06-01"): ("HIGH", 2),
        (1, "2025-01-01"): ("HIGH", 2),
        (2, "2021-01-01"): ("MED", 1),
    }


def test_at_most_one_match_on_real_dim(spark, sf_dir):
    """Disjoint SCD2 intervals => the PIT join never duplicates a
    fact row. Checked on the actual query composition."""
    from pdf_using_hugging_face_and_vector_database_spark.io import read_table
    from pdf_using_hugging_face_and_vector_database_spark.operators.upsert import (
        scd2_from_changelog,
    )

    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    dim = scd2_from_changelog(
        orders.select("o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"),
        key="o_custkey",
        attr="o_orderpriority",
        order_cols=["o_orderdate", "o_orderkey"],
        valid_col="o_orderdate",
    )
    # the fixture has duplicate (l_orderkey, l_linenumber) pairs (dates
    # are drawn independently — see quality_gates), so tag each fact
    # row with a unique id for the duplication check
    facts = (
        li.join(
            F.broadcast(orders.select("o_orderkey", "o_custkey")),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .select("o_custkey", "l_shipdate", "l_orderkey")
        .withColumn("fid", F.monotonically_increasing_id())
        .persist()
    )
    n_facts = facts.count()  # pin the ids before both consumers
    j = pit_join(facts, dim, key="o_custkey", time_col="l_shipdate")
    dup = j.groupBy("fid").count().filter(F.col("count") > 1).count()
    assert dup == 0
    assert j.count() <= n_facts
    facts.unpersist()


def test_property_range_join_matches_reference(spark):
    """Randomized sweep (fixed seed) for the bucketed range join: tiny
    timestamp space with bucket_seconds chosen so intervals routinely
    CROSS bucket boundaries, plus zero-length intervals and points
    landing exactly on start/end (both inclusive, SQL BETWEEN). Must
    equal a plain-Python reference join exactly."""
    import random

    from pdf_using_hugging_face_and_vector_database_spark.operators.rangejoin import (
        range_join,
    )

    rng = random.Random(0xBEEF)
    base = dt.datetime(2024, 1, 1)

    def ts(sec):
        return base + dt.timedelta(seconds=sec)

    points = [
        (i, rng.choice(("k1", "k2")), ts(rng.randint(0, 600)))
        for i in range(120)
    ]
    intervals = []
    for j in range(40):
        s = rng.randint(0, 600)
        e = s + rng.choice((0, 1, rng.randint(2, 300)))  # incl. zero-length
        intervals.append((j, rng.choice(("k1", "k2")), ts(s), ts(e)))
    # force exact-boundary hits: copy some interval endpoints as points
    for j, key, s, e in intervals[:10]:
        points.append((1000 + j, key, s))
        points.append((2000 + j, key, e))

    pdf = spark.createDataFrame(points, "pid long, key string, ts timestamp")
    idf = spark.createDataFrame(
        intervals, "iid long, key string, start timestamp, end timestamp"
    )
    got = {
        (r.pid, r.iid)
        for r in range_join(
            pdf, idf, "ts", "start", "end", on=("key",), bucket_seconds=60
        ).collect()
    }
    want = {
        (pid, iid)
        for pid, pkey, pts in points
        for iid, ikey, s, e in intervals
        if pkey == ikey and s <= pts <= e
    }
    assert got == want


def test_property_range_join_left_matches_reference(spark):
    """Same randomized sweep for how='left' (r9): matched pairs equal
    the plain-Python reference join exactly, AND every point with no
    qualifying interval appears exactly once with a null interval id —
    total row count = |matches| + |unmatched points|."""
    import random

    from pdf_using_hugging_face_and_vector_database_spark.operators.rangejoin import (
        range_join,
    )

    rng = random.Random(0xFACE)
    base = dt.datetime(2024, 1, 1)

    def ts(sec):
        return base + dt.timedelta(seconds=sec)

    points = [
        (i, rng.choice(("k1", "k2", "k3")), ts(rng.randint(0, 600)))
        for i in range(120)
    ]
    intervals = []
    for j in range(30):
        s = rng.randint(0, 600)
        e = s + rng.choice((0, 1, rng.randint(2, 300)))
        intervals.append((j, rng.choice(("k1", "k2")), ts(s), ts(e)))
    for j, key, s, e in intervals[:8]:
        points.append((1000 + j, key, s))
        points.append((2000 + j, key, e))

    pdf = spark.createDataFrame(points, "pid long, key string, ts timestamp")
    idf = spark.createDataFrame(
        intervals, "iid long, key string, start timestamp, end timestamp"
    )
    rows = range_join(
        pdf, idf, "ts", "start", "end", on=("key",), bucket_seconds=60,
        how="left",
    ).collect()
    got_pairs = {(r.pid, r.iid) for r in rows if r.iid is not None}
    want_pairs = {
        (pid, iid)
        for pid, pkey, pts in points
        for iid, ikey, s, e in intervals
        if pkey == ikey and s <= pts <= e
    }
    assert got_pairs == want_pairs
    matched_pids = {p for p, _ in want_pairs}
    null_rows = [r for r in rows if r.iid is None]
    assert {r.pid for r in null_rows} == {
        pid for pid, _, _ in points if pid not in matched_pids
    }
    assert len(null_rows) == len(points) - len(matched_pids)  # exactly once
    assert len(rows) == len(want_pairs) + len(null_rows)
    # null-extended rows keep their point-side key (k3 points can
    # never match — the self-lineage regression surface)
    assert all(r.key is not None for r in rows)


def test_pit_join_left_outer_semantics(spark):
    """how='left' (r10 spare-slot groundwork): pit_join's interval
    predicate already lives INSIDE the join condition, so the left
    variant is correct as-is — facts before the first version or with
    an unknown key come back exactly once, null-extended on the
    dimension columns; matched facts behave identically to inner."""
    facts = spark.createDataFrame(
        [
            (1, dt.date(2020, 3, 1)),   # inside v1
            (1, dt.date(2019, 1, 1)),   # before first version -> null row
            (3, dt.date(2021, 1, 1)),   # unknown key -> null row
        ],
        "k int, t date",
    )
    out = pit_join(facts, _dim(spark), key="k", time_col="t", how="left").collect()
    got = {(r.k, str(r.t)): (r.attr, r.version) for r in out}
    assert got == {
        (1, "2020-03-01"): ("LOW", 1),
        (1, "2019-01-01"): (None, None),
        (3, "2021-01-01"): (None, None),
    }
    assert len(out) == 3  # unmatched facts appear exactly once
    # the fact-side key survives on null-extended rows
    assert all(r.k is not None for r in out)


def test_outer_pit_join_query_semantics(spark, sf_dir):
    """r10 registered row: every customer exactly once; customers with
    no orders (or first version after the audit instant) null-extend;
    matched rows agree with the INNER pit join on the same graph."""
    from pdf_using_hugging_face_and_vector_database_spark.io import read_table
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        outer_pit_join,
    )

    rows = outer_pit_join(spark, sf_dir).collect()
    n_cust = read_table(spark, sf_dir, "customer").count()
    assert len(rows) == n_cust  # disjoint intervals: one row per customer
    assert len({r.custkey for r in rows}) == n_cust
    nulls = [r for r in rows if r.priority_asof is None]
    assert nulls, "fixture has customers with no orders"
    # null-extension is all-or-nothing across the dimension columns
    for r in rows:
        dim_side = (r.priority_asof, r.version, r.valid_from)
        assert all(v is None for v in dim_side) or all(
            v is not None for v in dim_side
        )


def test_property_range_join_right_and_full_match_reference(spark):
    """Randomized sweep (fixed seed) for how='right'/'full' (r10 —
    retiring the operator's declared refusal): matched pairs equal the
    plain-Python reference exactly; every interval matching no point
    appears EXACTLY once null-extended (the replica-dedup hazard the
    old NotImplementedError documented); for full, unmatched points
    too; the on-key survives from whichever side is present."""
    import random

    from pdf_using_hugging_face_and_vector_database_spark.operators.rangejoin import (
        range_join,
    )

    rng = random.Random(0xD00D)
    base = dt.datetime(2024, 1, 1)

    def ts(sec):
        return base + dt.timedelta(seconds=sec)

    points = [
        (i, rng.choice(("k1", "k2", "k3")), ts(rng.randint(0, 600)))
        for i in range(100)
    ]
    intervals = []
    for j in range(40):
        s = rng.randint(0, 600)
        e = s + rng.choice((0, 1, rng.randint(2, 300)))
        # k4 intervals can never match (no k4 points) — and some
        # intervals span MANY buckets (bucket_seconds=60), the replica
        # explosion the exactly-once check targets
        intervals.append((j, rng.choice(("k1", "k2", "k4")), ts(s), ts(e)))
    pdf = spark.createDataFrame(points, "pid long, key string, ts timestamp")
    idf = spark.createDataFrame(
        intervals, "iid long, key string, start timestamp, end timestamp"
    )
    want_pairs = {
        (pid, iid)
        for pid, pkey, pts in points
        for iid, ikey, s, e in intervals
        if pkey == ikey and s <= pts <= e
    }
    matched_iids = {i for _, i in want_pairs}
    matched_pids = {p for p, _ in want_pairs}

    for how in ("right", "full"):
        rows = range_join(
            pdf, idf, "ts", "start", "end", on=("key",), bucket_seconds=60,
            how=how, interval_id=("iid",),
        ).collect()
        got_pairs = {
            (r.pid, r.iid) for r in rows if r.iid is not None and r.pid is not None
        }
        assert got_pairs == want_pairs, how
        null_point = [r for r in rows if r.pid is None]
        assert {r.iid for r in null_point} == {
            iid for iid, *_ in intervals if iid not in matched_iids
        }, how
        assert len(null_point) == len(intervals) - len(matched_iids), how
        # exactly once even for multi-bucket replicas, key from interval
        assert all(r.key is not None for r in null_point), how
        null_interval = [r for r in rows if r.iid is None]
        if how == "right":
            assert not null_interval
            assert len(rows) == len(want_pairs) + len(null_point)
        else:
            assert {r.pid for r in null_interval} == {
                pid for pid, _, _ in points if pid not in matched_pids
            }
            assert len(rows) == len(want_pairs) + len(null_point) + len(
                null_interval
            )


def test_range_join_right_full_guards(spark):
    """right/full without interval_id raise the documented ValueError;
    unknown how raises."""
    import pytest

    from pdf_using_hugging_face_and_vector_database_spark.operators.rangejoin import (
        range_join,
    )

    pdf = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1))], "pid long, ts timestamp"
    )
    idf = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2))],
        "iid long, start timestamp, end timestamp",
    )
    with pytest.raises(ValueError, match="interval_id"):
        range_join(pdf, idf, "ts", "start", "end", how="full")
    with pytest.raises(ValueError, match="unknown how"):
        range_join(pdf, idf, "ts", "start", "end", how="cross")
    with pytest.raises(ValueError, match="not in intervals"):
        range_join(
            pdf, idf, "ts", "start", "end", how="right", interval_id=("nope",)
        )


def test_range_join_interval_id_on_overlap_rejected(spark):
    """r10 review finding: an interval_id column shared with `on`
    would let unmatched POINTS poison the matched-id set (their
    point-side key is non-null in the left base) and silently
    suppress legitimately unmatched intervals — rejected up front."""
    import pytest

    from pdf_using_hugging_face_and_vector_database_spark.operators.rangejoin import (
        range_join,
    )

    pdf = spark.createDataFrame(
        [(1, "k", dt.datetime(2024, 1, 1))], "pid long, key string, ts timestamp"
    )
    idf = spark.createDataFrame(
        [(1, "k", dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2))],
        "iid long, key string, start timestamp, end timestamp",
    )
    with pytest.raises(ValueError, match="overlap the 'on' keys"):
        range_join(
            pdf, idf, "ts", "start", "end", on=("key",), how="full",
            interval_id=("key",),
        )


def test_range_join_null_interval_id_never_duplicates(spark):
    """r10 review finding: a null-id interval is unidentifiable — it
    must never emit twice (once matched, once 'unmatched'). Contract:
    it joins normally on the matched side but is excluded from
    unmatched recovery; non-null-id behavior is unaffected."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.rangejoin import (
        range_join,
    )

    t0 = dt.datetime(2024, 1, 1)
    pdf = spark.createDataFrame(
        [(1, "k", t0 + dt.timedelta(seconds=30))],
        "pid long, key string, ts timestamp",
    )
    idf = spark.createDataFrame(
        [
            # null id, MATCHES the point -> must emit exactly once
            (None, "k", t0, t0 + dt.timedelta(seconds=60)),
            # null id, matches nothing -> excluded from recovery
            (None, "k", t0 + dt.timedelta(days=5), t0 + dt.timedelta(days=6)),
            # normal unmatched interval -> null-extended once
            (7, "k", t0 + dt.timedelta(days=9), t0 + dt.timedelta(days=10)),
        ],
        "iid long, key string, start timestamp, end timestamp",
    )
    rows = range_join(
        pdf, idf, "ts", "start", "end", on=("key",), bucket_seconds=60,
        how="full", interval_id=("iid",),
    ).collect()
    matched = [r for r in rows if r.pid is not None and r.start is not None]
    assert len(matched) == 1 and matched[0].iid is None
    unmatched_intervals = [r for r in rows if r.pid is None]
    assert [r.iid for r in unmatched_intervals] == [7]
    assert len(rows) == 2


def test_range_join_property_all_variants(spark):
    """Hypothesis property pin over ALL FOUR outer variants vs a
    brute-force reference on random (point, interval) sets — including
    multi-bucket intervals (bucket_seconds=5 against spans up to 20s),
    empty sides, duplicate timestamps, and never-matched rows on both
    sides. Complements the fixed-seed randomized sweep above with
    shrinking counterexamples."""
    import datetime as dt

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pdf_using_hugging_face_and_vector_database_spark.operators.rangejoin import (
        range_join,
    )

    base = dt.datetime(2024, 1, 1)

    points_s = st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 24)),
        min_size=0,
        max_size=6,
    )
    intervals_s = st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 20), st.integers(0, 12)),
        min_size=0,
        max_size=5,
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(points_s, intervals_s)
    def run(pts, ivs):
        p_rows = [
            (i, k, base + dt.timedelta(seconds=t)) for i, (k, t) in enumerate(pts)
        ]
        i_rows = [
            (
                j,
                k,
                base + dt.timedelta(seconds=s),
                base + dt.timedelta(seconds=s + d),
            )
            for j, (k, s, d) in enumerate(ivs)
        ]
        pdf = spark.createDataFrame(
            p_rows, "pid long, k long, ts timestamp"
        ) if p_rows else spark.createDataFrame([], "pid long, k long, ts timestamp")
        idf = spark.createDataFrame(
            i_rows, "iid long, k long, s timestamp, e timestamp"
        ) if i_rows else spark.createDataFrame(
            [], "iid long, k long, s timestamp, e timestamp"
        )
        matched = {
            (pi, ij)
            for pi, (pk, pt) in enumerate(pts)
            for ij, (ik, s, d) in enumerate(ivs)
            if pk == ik and s <= pt <= s + d
        }
        m_points = {p for p, _ in matched}
        m_ivs = {i for _, i in matched}
        want = {
            "inner": matched,
            "left": matched
            | {(p, None) for p in range(len(pts)) if p not in m_points},
            "right": matched
            | {(None, i) for i in range(len(ivs)) if i not in m_ivs},
            "full": matched
            | {(p, None) for p in range(len(pts)) if p not in m_points}
            | {(None, i) for i in range(len(ivs)) if i not in m_ivs},
        }
        from pdf_using_hugging_face_and_vector_database_spark.caching import (
            release_caches,
        )

        try:
            for how in ("inner", "left", "right", "full"):
                kw = {"interval_id": ("iid",)} if how in ("right", "full") else {}
                out = range_join(
                    pdf, idf, point_ts="ts", start_col="s", end_col="e",
                    on=("k",), bucket_seconds=5, how=how, **kw,
                ).collect()
                got = {(r["pid"], r["iid"]) for r in out}
                assert got == want[how], (how, pts, ivs)
                assert len(out) == len(want[how]), (how, "duplicate rows")
        finally:
            # right/full register a tracked persist per build (caller
            # contract, ADVICE r11) — release per example so dozens of
            # hypothesis iterations don't accumulate cached bases
            release_caches()

    run()


def test_pit_boundary_ties_query_is_adversarial(spark, sf_dir):
    """r12 (VERDICT r11 item 4): the registered pit_boundary_ties row's
    input PROVABLY contains the boundary-tie shapes — every fact ts is
    exactly a version's valid_from (an AS-OF probe AT the instant),
    duplicated x2, and every version>=2 fact is simultaneously AT the
    previous version's valid_to — and the digest DISCRIMINATES both
    off-by-one kernel classes: strict `> valid_from` loses every
    at-start match; closed `<= valid_to` double-matches every abutting
    boundary fact."""
    from pdf_using_hugging_face_and_vector_database_spark.io import read_table
    from pdf_using_hugging_face_and_vector_database_spark.operators.upsert import (
        scd2_from_changelog,
    )
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        pit_boundary_ties,
    )

    orders = read_table(spark, sf_dir, "orders")
    dim = scd2_from_changelog(
        orders.select("o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"),
        key="o_custkey",
        attr="o_orderpriority",
        order_cols=["o_orderdate", "o_orderkey"],
        valid_col="o_orderdate",
    )
    n_versions = dim.count()
    n_multi = dim.filter(F.col("version") >= 2).count()
    assert n_versions > 0 and n_multi > 0  # end-ties exist in the input

    rows = pit_boundary_ties(spark, sf_dir).collect()
    tot = {c: sum(r[c] for r in rows) for c in
           ("n_facts", "n_at_start", "n_end_tied",
            "sum_matched_versions", "sum_src_versions")}
    # every boundary fact (x2 copies) matches exactly once...
    assert tot["n_facts"] == 2 * n_versions
    # ...AT the matched version's start instant (half-open semantics:
    # zero-length intervals from same-date changes may defer a fact to
    # the next version starting at the same instant — still at-start)
    assert tot["n_at_start"] == tot["n_facts"]
    # both copies of every version>=2 fact sit exactly at the previous
    # version's valid_to (abutting intervals)
    assert tot["n_end_tied"] == 2 * n_multi

    # discrimination, wrong kernel #1: strict `> valid_from` — every
    # at-start fact now matches the PREVIOUS version (or drops).
    bounds = dim.select(
        "o_custkey", F.col("valid_from").alias("ts"),
        F.col("version").alias("src_version"),
    )
    facts = bounds.withColumn("copy", F.lit(1)).unionByName(
        bounds.withColumn("copy", F.lit(2))
    )
    strict = facts.join(
        dim,
        (facts["o_custkey"] == dim["o_custkey"])
        & (facts["ts"] > dim["valid_from"])
        & (dim["valid_to"].isNull() | (facts["ts"] < dim["valid_to"])),
    )
    n_strict = strict.count()
    assert n_strict < tot["n_facts"]  # at minimum all version-1 facts drop
    assert strict.filter(F.col("ts") == F.col("valid_from")).count() == 0

    # discrimination, wrong kernel #2: closed `<= valid_to` — every
    # abutting-boundary fact ALSO matches the version it terminates.
    closed = facts.join(
        dim,
        (facts["o_custkey"] == dim["o_custkey"])
        & (facts["ts"] >= dim["valid_from"])
        & (dim["valid_to"].isNull() | (facts["ts"] <= dim["valid_to"])),
    )
    n_closed = closed.count()
    assert n_closed > tot["n_facts"]


def test_asof_boundary_ties_query_is_adversarial(spark, sf_dir):
    """r12 (VERDICT r11 item 4, as-of leg): the fixture has ZERO
    exact-ts purchase/click pairs (measured below), so the registered
    asof_boundary_ties row INJECTS them — and its output discriminates
    the strict-before kernel class: flipping the tie sort so purchases
    order BEFORE clicks at equal ts (the '<' semantics) loses every
    injected same-instant match."""
    from pyspark.sql import Window

    from pdf_using_hugging_face_and_vector_database_spark.io import read_table
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        asof_boundary_ties,
    )

    ev = read_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    native_ties = purchases.join(clicks, ["user_id", "ts"]).count()
    assert native_ties == 0  # the shape the fixture never carries
    n3 = purchases.filter(F.col("event_id") % 3 == 0).count()
    n6 = purchases.filter(F.col("event_id") % 6 == 0).count()
    assert n3 > 0 and n6 > 0  # injected ties + duplicate-instant ties

    rows = asof_boundary_ties(spark, sf_dir).collect()
    tied = {r.event_id for r in rows if r.matched_at_instant}
    # every %3 purchase matches AT its own instant; nothing else can
    # (native ties are zero and the wrong-user click has a different key)
    assert tied == {r.event_id for r in rows if r.event_id % 3 == 0}
    assert len(tied) == n3

    # discrimination: the strict-before kernel (purchases sort FIRST at
    # equal ts -> a same-instant click is not yet visible) loses every
    # injected tie
    at3 = purchases.filter(F.col("event_id") % 3 == 0).select("user_id", "ts")
    at6 = purchases.filter(F.col("event_id") % 6 == 0).select("user_id", "ts")
    wrong7 = purchases.filter(F.col("event_id") % 7 == 0).select(
        (F.col("user_id") + 1).alias("user_id"), "ts"
    )
    aug = clicks.unionByName(at3).unionByName(at6).unionByName(wrong7)
    tagged = purchases.withColumn(
        "__click_ts", F.lit(None).cast("timestamp")
    ).unionByName(
        aug.select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id",
            "ts",
            F.col("ts").alias("__click_ts"),
        )
    )
    w_strict = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("__click_ts").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    strict = (
        tagged.withColumn(
            "click_ts", F.last("__click_ts", ignorenulls=True).over(w_strict)
        )
        .filter(F.col("event_id").isNotNull())
        .withColumn(
            "tied", F.coalesce(F.col("ts") == F.col("click_ts"), F.lit(False))
        )
    )
    assert strict.filter(F.col("tied")).count() == 0


def test_asof_kernel_property_random_ties(spark):
    """Hypothesis property pin for the union+last_value as-of kernel
    (asof_join_events / asof_boundary_ties): random event sets with
    DELIBERATE same-instant collisions (timestamps drawn from a tiny
    domain) must match a brute-force at-or-before reference — ties at
    the probe instant match (>= semantics), per-user isolation holds,
    and purchases with no prior click null-extend."""
    import datetime as dt

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from pyspark.sql import Window

    base = dt.datetime(2024, 1, 1)

    purchases_s = st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 6)),  # (user, t)
        min_size=0, max_size=5,
    )
    clicks_s = st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 6)),
        min_size=0, max_size=6,
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(purchases_s, clicks_s)
    def run(ps, cs):
        p_rows = [
            (i, u, base + dt.timedelta(seconds=t)) for i, (u, t) in enumerate(ps)
        ]
        c_rows = [(u, base + dt.timedelta(seconds=t)) for u, t in cs]
        pdf = (
            spark.createDataFrame(p_rows, "event_id long, user_id long, ts timestamp")
            if p_rows
            else spark.createDataFrame([], "event_id long, user_id long, ts timestamp")
        )
        cdf = (
            spark.createDataFrame(c_rows, "user_id long, ts timestamp")
            if c_rows
            else spark.createDataFrame([], "user_id long, ts timestamp")
        )
        tagged = pdf.withColumn(
            "__click_ts", F.lit(None).cast("timestamp")
        ).unionByName(
            cdf.select(
                F.lit(None).cast("long").alias("event_id"),
                "user_id",
                "ts",
                F.col("ts").alias("__click_ts"),
            )
        )
        w = (
            Window.partitionBy("user_id")
            .orderBy(F.col("ts"), F.col("__click_ts").asc_nulls_last())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out = (
            tagged.withColumn(
                "click_ts", F.last("__click_ts", ignorenulls=True).over(w)
            )
            .filter(F.col("event_id").isNotNull())
            .collect()
        )
        got = {r.event_id: r.click_ts for r in out}
        want = {}
        for i, (u, t) in enumerate(ps):
            cands = [ct for cu, ct in cs if cu == u and ct <= t]
            want[i] = (
                base + dt.timedelta(seconds=max(cands)) if cands else None
            )
        assert got == want, (ps, cs)

    run()
