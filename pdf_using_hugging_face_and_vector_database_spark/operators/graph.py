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
) -> DataFrame:
    """PageRank over a directed edge list (one row per distinct edge).

    Simplifications, stated so the oracle can replay them exactly:
    dangling-node mass is NOT redistributed (their outflow vanishes,
    the standard join-based formulation), and teleport mass (1-d)/N
    goes to every node each round. Returns (node, rank) with rank
    rounded to 6 dp.
    """
    from ..caching import persist_tracked

    edges = persist_tracked(
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
    )
    nodes = persist_tracked(
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        # an empty edge table has no ranks — return the empty result
        # with the contract schema instead of a driver-side
        # ZeroDivisionError in 1.0/n (r10 review)
        return nodes.select("node", F.lit(0.0).alias("rank"))
    deg = persist_tracked(
        edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    )
    ranks = nodes.select(
        "node", F.round(F.lit(1.0 / n), 9).alias("rank")
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
        # cross-engine associativity-proofing requires)
        rd = (
            ranks.alias("r")
            .join(deg.alias("d"), F.col("r.node") == F.col("d.src"))
            .select(
                F.col("d.src").alias("src"),
                F.round(F.col("r.rank") / F.col("d.out_deg"), 9).alias(
                    "contrib"
                ),
            )
        )
        contribs = (
            edges.join(F.broadcast(rd), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.sum(F.col("contrib").cast(DEC9)).cast("double").alias("inflow")
            )
        )
        ranks = persist_tracked(
            nodes.join(contribs, "node", "left").select(
                "node",
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
