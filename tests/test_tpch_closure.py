"""Plan-shape assertions for the full-22 TPC-H closure queries —
the scale-survival properties each shape exists to prove. Values are
certified by the DuckDB oracles (tools/compare_oracle.py / driver);
these tests pin the physical plans."""

from __future__ import annotations

from pdf_using_hugging_face_and_vector_database_spark import queries as Q
from pdf_using_hugging_face_and_vector_database_spark.plans import (
    formatted_plan,
    has_pushed_filters,
    has_take_ordered,
)


def test_q2_min_cost_topn_is_take_ordered(spark, sf_dir):
    """The final top-20 must be TakeOrdered, and the region filter
    must prune before the cost aggregate (pushed to the region scan)."""
    df = Q.min_cost_supplier(spark, sf_dir)
    assert has_take_ordered(df)
    assert has_pushed_filters(df, "r_name")


def test_q4_exists_is_semi_join_without_lineitem_agg(spark, sf_dir):
    """EXISTS must lower to a semi join: lineitem feeds the join
    directly, no aggregate of lineitem anywhere below it, and the
    quarter filter reaches the orders scan."""
    df = Q.priority_order_counts(spark, sf_dir)
    plan = formatted_plan(df)
    assert "LeftSemi" in plan
    assert has_pushed_filters(df, "o_orderdate")


def test_q7_both_nation_dims_broadcast(spark, sf_dir):
    """The two aliased nation dims must both broadcast — the pair
    disjunction must never become a shuffle key."""
    plan = formatted_plan(Q.nation_pair_volume(spark, sf_dir))
    assert plan.count("BroadcastExchange") >= 2
    assert has_pushed_filters(Q.nation_pair_volume(spark, sf_dir), "l_shipdate")


def test_q9_part_filter_prunes_before_joins(spark, sf_dir):
    """The p_name LIKE filter must reach the part scan so the 4-way
    join fans out only matched parts."""
    assert has_pushed_filters(Q.product_profit(spark, sf_dir), "p_name")


def test_q11_scalar_threshold_is_broadcast_not_resort(spark, sf_dir):
    """The HAVING scalar (1-row mean) must arrive via broadcast; the
    per-part aggregate is computed once, not once per side."""
    plan = formatted_plan(Q.important_parts(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_q16_not_in_is_broadcast_anti_join(spark, sf_dir):
    """NOT IN over the tiny negative-balance supplier list must be a
    broadcast anti join against lineitem, never a shuffle."""
    plan = formatted_plan(Q.supplier_part_counts(spark, sf_dir))
    assert "LeftAnti" in plan
    assert "BroadcastExchange" in plan


def test_q19_disjunction_pushes_part_half_to_scan(spark, sf_dir):
    """Each branch's brand+size conjunct must reach the part scan as
    one pushed disjunction (the l_quantity half stays post-join)."""
    assert has_pushed_filters(Q.disjunctive_revenue(spark, sf_dir), "p_brand")


def test_q21_sole_late_semi_plus_window(spark, sf_dir):
    """EXISTS(other supplier) -> left semi against the full lineitem;
    NOT EXISTS(other late supplier) -> min==max window over the late
    rows' order partition (r16 — the r15 left-anti self-join planned
    the late lineitem ⋈ orders subtree twice; the window keeps one).
    lineitem is never aggregated before the filters."""
    plan = formatted_plan(Q.waiting_suppliers(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "LeftAnti" not in plan
    assert "Window" in plan
    # one late subtree: 5 scans total (late lineitem + orders, the
    # semi's full lineitem, supplier, nation) — the r15 anti-join
    # shape carried 7 (a second late lineitem ⋈ orders subtree)
    n_scans = sum(
        1
        for line in plan.splitlines()
        if line.lstrip().startswith("(") and "Scan parquet" in line
    )
    assert n_scans == 5, plan
    assert has_take_ordered(Q.waiting_suppliers(spark, sf_dir))


def test_q22_anti_join_prunes_recent_orders_scan(spark, sf_dir):
    """NOT EXISTS(recent order) -> anti join; the idleness-window
    date filter must reach the orders scan so the anti side reads a
    fraction of orders."""
    df = Q.idle_rich_customers(spark, sf_dir)
    plan = formatted_plan(df)
    assert "LeftAnti" in plan
    assert has_pushed_filters(df, "o_orderdate")


def test_q11_and_q20_selectivity_is_sf_invariant(spark):
    """The mean-relative thresholds must stay selective as SF grows:
    nonempty and strictly partial at both sf0.001 and sf0.01 (the
    absolute-fraction version returned 0 rows at sf0.1 — this guards
    the fix)."""
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        n_parts = Q.read_table(spark, sf, "part").count()
        picked = Q.important_parts(spark, sf).count()
        assert 0 < picked < n_parts, (sf, picked, n_parts)


def test_queries_tz_independent_via_read_table(spark, sf_dir):
    """r11 review: the engine's timestamp semantics are civil UTC and
    the DuckDB oracle reads the fixtures as naive UTC, but the DRIVER
    hands queries a vanilla session inheriting the HOST zone — on a
    non-UTC host every timestamp filter/bucket shifted by the offset
    (events_gapfill: 248 vs 243 bucket-rows UTC vs America/New_York).
    read_table now pins session tz UTC at read time, so a query must
    return identical results no matter what zone the session starts
    in."""
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        events_gapfill,
        events_hourly,
    )

    def digest():
        g = events_gapfill(spark, sf_dir).agg({"n_events": "sum"}).collect()[0][0]
        h = events_hourly(spark, sf_dir).count()
        return (g, h)

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    want = digest()
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got = digest()
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert got == want
