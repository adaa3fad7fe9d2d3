"""Iterative graph algorithms over edge tables.

Connected components (dedup.neardup_representatives) covered the
fixpoint-contraction family; PageRank here covers the fixed-iteration
power-method family — the other shape a 100 TB graph job takes:
K rounds of (join edge table to rank vector) + (group by destination),
each round one shuffle on the node key, the edge table partitioned
once and reused.

Cross-engine determinism: double summation order is engine- and
partitioning-dependent, and a power method AMPLIFIES ulp drift over
rounds. Every per-edge contribution is therefore rounded to 9 dp and
summed on the repo's scale-9 decimal carrier, and every new rank is
re-rounded to 9 dp — the same associativity-proofing used by
dsir_select and retrieval_eval, which makes 5 iterations bit-stable
between Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC9 = "decimal(27,9)"


def pagerank(
    edges: DataFrame,
    n_iters: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    assume_distinct: bool = False,
    assume_symmetric: bool = False,
) -> DataFrame:
    """PageRank over a directed edge list (one row per distinct edge).

    Simplifications, stated so the oracle can replay them exactly:
    dangling-node mass is NOT redistributed (their outflow vanishes,
    the standard join-based formulation), and teleport mass (1-d)/N
    goes to every node each round. Returns (node, rank) with rank
    rounded to 6 dp.

    ``assume_distinct``: the caller proves the edge list is already
    one row per distinct edge — skips the defensive ``.distinct()``,
    which is a full shuffle of the edge table (the single biggest
    Exchange of the query at corpus scale; r15 optimization).
    ``assume_symmetric``: the caller proves every node appears as a
    src (e.g. the edge list carries both directions) — the node set
    is then exactly the out-degree table's key set, so node discovery
    rides the degree aggregation instead of paying its own
    union+distinct shuffle, and every node has ``out_deg >= 1``.

    ``assume_symmetric`` is an UNVERIFIED caller promise (r15 ADVICE):
    if it is passed on a graph where some node appears only as a dst,
    those nodes are DROPPED FROM THE OUTPUT ENTIRELY — missing rows,
    not merely wrong ranks — because the node set is derived from the
    src side alone. Pass it only with a proof in hand (the engine's
    one fast-path caller, queries.supplier_pagerank, unions both edge
    directions so every node is a src by construction). Setting
    ``SPARK_GRAFT_GRAPH_CHECKS=1`` verifies the promise at run time
    (one anti-join count per call — debug tooling, not the product
    path) and raises instead of silently dropping nodes.
    """
    import os

    from ..caching import persist_tracked

    edges = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if not assume_distinct:
        edges = edges.distinct()
    edges = persist_tracked(edges)
    # out_deg is carried IN the rank vector (one column of the
    # node-scale table) instead of re-joined every round: the per-round
    # rank/out_deg division reads it in place, removing one join (and
    # its exchange) from each of the n_iters rounds (r15 optimization).
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    if assume_symmetric:
        if os.environ.get("SPARK_GRAFT_GRAPH_CHECKS") == "1":
            # debug gate: a dst never appearing as a src falsifies the
            # promise and would silently vanish from the result
            n_bad = (
                edges.select(F.col("dst").alias("node"))
                .join(
                    deg.select(F.col("src").alias("node")),
                    "node",
                    "left_anti",
                )
                .count()
            )
            if n_bad:
                raise ValueError(
                    f"assume_symmetric violated: {n_bad} dst rows whose "
                    f"node never appears as a src would be dropped"
                )
        node_deg = persist_tracked(
            deg.select(F.col("src").alias("node"), "out_deg")
        )
    else:
        nodes = (
            edges.select(F.col("src").alias("node"))
            .union(edges.select(F.col("dst").alias("node")))
            .distinct()
        )
        node_deg = persist_tracked(
            nodes.join(
                deg.withColumnRenamed("src", "node"), "node", "left"
            )
        )
    n = node_deg.count()
    if n == 0:
        # an empty edge table has no ranks — return the empty result
        # with the contract schema instead of a driver-side
        # ZeroDivisionError in 1.0/n (r10 review)
        return node_deg.select("node", F.lit(0.0).alias("rank"))
    ranks = node_deg.select(
        "node", "out_deg", F.round(F.lit(1.0 / n), 9).alias("rank")
    )
    teleport = (1.0 - damping) / n
    for _ in range(n_iters):
        # the rank×degree vector is NODE-scale; broadcasting it keeps
        # the edge table unshuffled, so each round pays exactly one
        # Exchange (the dst groupBy). At web-graph scale where the
        # rank vector itself doesn't broadcast, pre-partition edges by
        # src and this becomes a co-partitioned shuffle join — the
        # groupBy stays the only per-round data movement that grows.
        # contrib = round(rank / out_deg, 9) depends only on src, so it
        # is computed on the NODE-scale side before the broadcast —
        # same value per edge bit-for-bit, but the division + 9 dp
        # round run |nodes| times per round instead of |edges| times
        # (the per-edge work left is the decimal cast + sum the
        # cross-engine associativity-proofing requires). Nodes with no
        # out-edges contribute nothing — the old deg inner join dropped
        # them; the out_deg filter keeps the same contract.
        rd = ranks.filter(F.col("out_deg").isNotNull()).select(
            F.col("node").alias("src"),
            F.round(F.col("rank") / F.col("out_deg"), 9).alias("contrib"),
        )
        contribs = (
            edges.join(F.broadcast(rd), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.sum(F.col("contrib").cast(DEC9)).cast("double").alias("inflow")
            )
        )
        ranks = persist_tracked(
            node_deg.join(contribs, "node", "left").select(
                "node",
                "out_deg",
                F.round(
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0)),
                    9,
                ).alias("rank"),
            )
        )
        # NO per-round materialization: each round's broadcast exchange
        # executes the (persisted) previous rank vector inside the one
        # final job, so lineage depth never bites — measured 16-25 s
        # WITH a per-round count() vs 6.5 s without at sf0.1 (the
        # counts were pure overhead: ~12 extra jobs)
    return ranks.select("node", F.round("rank", 6).alias("rank"))
