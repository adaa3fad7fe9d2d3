"""pagerank: exact agreement with a pure-Python twin of the same
rounded power iteration, plus structural sanity on the query graph."""

from __future__ import annotations

from decimal import Decimal

from pdf_using_hugging_face_and_vector_database_spark.operators.graph import pagerank


def _py_pagerank(edge_list, n_iters=5, damping=0.85):
    edges = sorted(set(edge_list))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    ranks = {v: round(1.0 / n, 9) for v in nodes}
    teleport = (1.0 - damping) / n
    for _ in range(n_iters):
        inflow = {v: Decimal(0) for v in nodes}
        for s, d in edges:
            inflow[d] += Decimal(repr(round(ranks[s] / deg[s], 9)))
        ranks = {
            v: round(teleport + damping * float(inflow[v]), 9) for v in nodes
        }
    return {v: round(r, 6) for v, r in ranks.items()}


def test_pagerank_matches_python_twin(spark):
    edges = [
        ("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"),
        ("b", "c"), ("d", "a"),  # d is a source-only node
        ("c", "e"),              # e is a sink (dangling)
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.rank for r in pagerank(df, n_iters=5).collect()}
    assert got == _py_pagerank(edges, n_iters=5)


def test_pagerank_hub_ranks_highest(spark):
    """Every spoke points at the hub: the hub must dominate."""
    edges = [(f"n{i}", "hub") for i in range(20)] + [("hub", "n0")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.rank for r in pagerank(df, n_iters=3).collect()}
    assert got["hub"] == max(got.values())
    assert got["hub"] > 10 * got["n5"]


def test_query_graph_is_bipartite_doubled(spark, sf_dir):
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        supplier_pagerank,
    )

    rows = supplier_pagerank(spark, sf_dir).collect()
    nodes = {r.node for r in rows}
    assert all(v[0] in "cs" for v in nodes)
    assert any(v.startswith("c") for v in nodes)
    assert any(v.startswith("s") for v in nodes)
    # probability-ish mass: no dangling nodes in the doubled graph, so
    # total rank stays ~1
    assert abs(sum(r.rank for r in rows) - 1.0) < 1e-3


def test_pagerank_empty_edges(spark):
    """r10 review: an empty edge table returns the empty contract
    schema instead of a driver ZeroDivisionError."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.graph import (
        pagerank,
    )

    edges = spark.createDataFrame([], "src string, dst string")
    out = pagerank(edges)
    assert out.columns == ["node", "rank"]
    assert out.count() == 0


def test_pagerank_assume_flags_match_defensive_path(spark):
    """r15 optimization: on a provably distinct, symmetric edge list
    the assume_distinct/assume_symmetric fast path (no edge distinct,
    node set derived from the out-degree aggregation, out_deg carried
    in the rank vector) returns EXACTLY the defensive path's ranks."""
    base = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")]
    sym = sorted(set(base) | {(d, s) for s, d in base})
    df = spark.createDataFrame(sym, "src string, dst string")
    slow = {r.node: r.rank for r in pagerank(df, n_iters=4).collect()}
    fast = {
        r.node: r.rank
        for r in pagerank(
            df, n_iters=4, assume_distinct=True, assume_symmetric=True
        ).collect()
    }
    assert fast == slow
    assert fast == _py_pagerank(sym, n_iters=4)
