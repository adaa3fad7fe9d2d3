"""Record linkage / entity resolution.

The classic two-stage shape every large-scale ER system uses
(Fellegi-Sunter lineage): BLOCK so the pair space is per-bucket, not
all-pairs, then score candidate pairs with field similarities and
keep the best match per incoming record. Here the similarity is
Levenshtein edit distance — a JVM built-in in Spark SQL and a
built-in in DuckDB with identical standard semantics, so the whole
pipeline is exactly replayable cross-engine (no phonetic/Jaro
dialects).

Scale shape: the block join shuffles on the block key only (pair
count = sum of block sizes squared — the blocking key's job is to
keep that sum sane, so at 100 TB the key must be COMPOSITE: a
corruption-invariant name feature crossed with the coarse attribute,
which is what entity_resolution does with (right(name,3), nation) —
measured 387x fewer candidate pairs than nation alone at sf0.1, a
cut that widens linearly with data), the edit distance is codegen'd
per pair, and best-match selection is one window per dirty record
partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def best_match(
    dirty: DataFrame,
    clean: DataFrame,
    block_col,
    text_col: str,
    id_col: str,
    max_dist: int = 3,
) -> DataFrame:
    """Resolve each ``dirty`` record to its best ``clean`` candidate
    within the same block: minimum edit distance, ties to the smaller
    candidate id; records with no candidate within ``max_dist`` are
    dropped (unresolved). ``block_col`` is one column name or a list
    of names — a composite key joins on every component, so block
    cardinality is the product of the components' cardinalities (the
    scale lever: within-block pair count is quadratic in block size).
    Returns (dirty_id, match_id, lev, name_sim) with name_sim =
    1 - lev/max length, rounded to 6 dp."""
    blks = [block_col] if isinstance(block_col, str) else list(block_col)
    blk_names = [f"__blk{i}" for i in range(len(blks))]
    d = dirty.select(
        F.col(id_col).alias("dirty_id"),
        *[F.col(b).alias(n) for b, n in zip(blks, blk_names)],
        F.col(text_col).alias("__dt"),
    )
    c = clean.select(
        F.col(id_col).alias("match_id"),
        *[F.col(b).alias(n) for b, n in zip(blks, blk_names)],
        F.col(text_col).alias("__ct"),
    )
    lev = F.levenshtein("__dt", "__ct")
    # length filter BEFORE the edit distance: lev(a,b) >= |len(a) -
    # len(b)|, so the band is pure pruning — the O(len^2) DP never
    # runs for pairs that cannot match. (On the fixture's fixed-width
    # names it prunes little — measured ~6 s either way at sf0.1, 9M
    # pairs — but on real variable-length name data this is the
    # standard first cut.)
    len_band = (
        F.abs(F.length("__dt") - F.length("__ct")) <= F.lit(max_dist)
    )
    pairs = (
        d.join(c, blk_names)
        .filter(len_band)
        .withColumn("lev", lev)
        .filter(F.col("lev") <= max_dist)
    )
    w = Window.partitionBy("dirty_id").orderBy("lev", "match_id")
    # name_sim guard (r15 review wave 10 — the r14 cosine ANSI class):
    # two EMPTY strings in one block reach here with lev = 0 and
    # max length 0, and the plain division made that pair a
    # query-killing DIVIDE_BY_ZERO under Spark 4 ANSI (NULL under
    # DuckDB's /). Empty-vs-empty is an exact match: one deterministic
    # fate, name_sim = 1.0. (The entity_resolution oracle's fixture
    # names are provably non-empty, so its twin needs no CASE.)
    maxlen = F.greatest(F.length("__dt"), F.length("__ct")).cast("double")
    sim = F.when(maxlen == 0.0, F.lit(1.0)).otherwise(
        F.lit(1.0) - F.col("lev").cast("double") / maxlen
    )
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "dirty_id",
            "match_id",
            "lev",
            F.round(sim, 6).alias("name_sim"),
        )
    )
