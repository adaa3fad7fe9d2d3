"""Exact set-similarity self-join via prefix filtering (PPJoin-style).

The fourth dedup modality beside exact-hash, MinHash-LSH, and
SimHash: an EXACT Jaccard-threshold join whose candidate generation
is pruned but provably complete — no false negatives, unlike the
probabilistic LSH band join (reference analogue: the near-duplicate
detection implied by the vector store's cosine metric,
`streamlit_app.py:49`; this is the set-space counterpart).

Prefix-filtering principle (Chaudhuri et al. 2006 / Xiao et al.
PPJoin, both published): order every set by a single global total
order (ascending document frequency, rarest first — ties broken by
element value so the order is deterministic). If J(a, b) >= t, the
two sets must share at least one element within their first
``|s| - ceil(t * |s|) + 1`` elements under that order. So an
equi-join on exploded PREFIX elements proposes every qualifying pair
while skipping the all-pairs cross product entirely.

Scale shape: one explode + groupBy for document frequencies (the
inverted-index shuffle every exact set-join pays), one shuffle join
to attach ranks, a bucket self-join on prefix elements (candidates
only — prefix length shrinks as t grows), then an exact verify over
just the candidates. Rare-first ordering makes prefix buckets the
SMALLEST buckets of the index, which is what keeps the self-join
sub-quadratic; AQE skew-join splits any residual hot element.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_gram_sets(
    df: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distinct word n-gram set per document: (doc_id, g).

    explode + collect_set, NOT array_distinct(transform(sequence(...))):
    the higher-order-function form is CodegenFallback (interpreted per
    row) and measured 15.8s vs 2.5s at sf0.1 for the same sets (see
    queries.neardup_jaccard, where the shape was first established).

    Deliberately NOT shared with curation's exploded word-n-gram
    helper (r10 review adjudication): the quality/contamination paths
    DROP a zero-token doc's '' gram (it would flag every empty-doc
    pair as contaminated), while this set-similarity path follows the
    DEDUP convention and KEEPS it — two empty docs are Jaccard-1
    duplicates and must keep matching (the oracle's word-n-gram helper
    carries the same drop_empty switch).
    """
    from ..functions.text import tokens

    toked = df.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__t"))
    n_pos = F.greatest(F.size("__t") - F.lit(n - 1), F.lit(1))
    exploded = toked.select(
        "doc_id", "__t", F.explode(F.sequence(F.lit(1), n_pos)).alias("pos")
    )
    gram = F.concat_ws(
        " ", *[F.get("__t", F.col("pos") - 1 + F.lit(j)) for j in range(n)]
    )
    return (
        exploded.select("doc_id", gram.alias("__g1"))
        .groupBy("doc_id")
        .agg(F.collect_set("__g1").alias("g"))
    )


def encoded_sets(
    gsets: DataFrame,
    id_col: str = "doc_id",
    set_col: str = "g",
) -> DataFrame:
    """Dictionary-encode every set: (doc_id, gi) with ``gi`` an
    ascending ``array<long>`` of element ids whose NUMERIC order is
    the PPJoin global total order (document frequency asc, element
    asc — rarest first). This is the canonical PPJoin layout: the
    prefix is a plain ``slice`` of the sorted id array, the self-join
    shuffles 8-byte longs instead of multi-word shingle strings, and
    the exact verify intersects long arrays (measured 6x faster than
    string-array intersects at sf0.1).

    Ids are collision-FREE and ORDER-FUNCTIONAL: eid is the dense
    0-based rank of (df, el) under the global total order, computed as
    a pure function of the data (round-7 rework of the
    ``monotonically_increasing_id``-after-orderBy derivation, whose
    correctness leaned on two undocumented Spark contracts — mid()
    tracking range-partition order, and persist pinning one
    materialization of positionally-assigned ids). Pure derivation
    means a recomputed lineage reproduces the SAME ids, so the
    persist_tracked below is a pure cache, not a correctness
    requirement.

    Scale shape of the rank: a single global ``row_number`` window
    would drag the whole dictionary through one task, so the rank is
    two-level — (1) row_number within (df, 4-char element prefix)
    buckets (skew-bounded: a bucket is one frequency class of one
    prefix), (2) bucket base offsets via a running sum over the
    bucket-COUNT table, which is metadata-scale (one row per distinct
    (df, prefix)). String-prefix bucketing preserves the order because
    byte-lexicographic comparison is monotone under prefixing; the
    single-partition window only ever sees the tiny count table.
    """
    from pyspark.sql import Window

    from ..caching import persist_tracked

    el = gsets.select(
        F.col(id_col).alias("doc_id"), F.explode(set_col).alias("el")
    )
    freq = el.groupBy("el").agg(F.count(F.lit(1)).alias("df"))
    # The vocabulary table feeds TWO branches of the rank (within-
    # bucket row_number AND bucket sizes); uncached, each branch
    # repays the full corpus explode + count — measured 12.4 s vs
    # 7.4 s for the whole join on the 10x corpus (process-isolated
    # min-of-3). It is the smallest relation in the operator
    # (dictionary-scale: one row per distinct element), so caching it
    # is the standard build-the-inverted-index-once shape.
    bucketed = persist_tracked(
        freq.withColumn("__p", F.substring("el", 1, 4))
    )
    w_in = Window.partitionBy("df", "__p").orderBy("el")
    ranked = bucketed.withColumn("__rk", F.row_number().over(w_in))
    sizes = bucketed.groupBy("df", "__p").agg(
        F.count(F.lit(1)).alias("__n")
    )
    w_off = (
        Window.orderBy("df", "__p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = sizes.select(
        "df",
        "__p",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    dic = ranked.join(offs, ["df", "__p"]).select(
        "el", (F.col("__off") + F.col("__rk") - F.lit(1)).alias("eid")
    )
    # Explicit partition width for the cached encoded corpus. Dense
    # ranks delta-compress far better than the element strings they
    # replace, so AQE's BYTE-based partition coalescing sees a tiny
    # relation and materializes the cache into ~1 partition — but every
    # downstream consumer (prefix self-join probe, array-intersect
    # verify) is per-ROW expensive, and a 1-partition cache serializes
    # them (measured 5.4 s vs 2.8 s for the full join at sf0.1; the
    # probe stage ran 4 tasks instead of 128). An explicit repartition
    # on the grouping key is not AQE-coalescable, and the groupBy
    # below reuses its hash partitioning, so this costs no extra
    # shuffle; the session shuffle width is the operator's scale knob.
    try:
        n_parts = int(
            gsets.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    except (TypeError, ValueError):
        # the conf can be non-numeric (e.g. "auto" under some AQE
        # setups); fall back to the cluster's default width rather
        # than breaking every PPJoin query (r7 ADVICE item 4)
        n_parts = gsets.sparkSession.sparkContext.defaultParallelism
    return persist_tracked(
        el.join(dic, "el")
        .repartition(n_parts, "doc_id")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("eid")).alias("gi"))
    )


def _prefix_pairs_encoded(enc: DataFrame, threshold: float) -> DataFrame:
    """Candidate pairs (id_a < id_b) from encoded sets via prefix +
    length + positional filters. Complete for Jaccard >= threshold;
    may contain false positives (the caller verifies exactly).

    The ceil in the prefix length subtracts 1e-9 first so a float
    product that lands epsilon ABOVE an integer cannot shorten the
    prefix by one and silently drop a qualifying pair — erring long
    costs candidates, erring short costs correctness.
    """
    s = F.size("gi")
    plen = (
        s
        - F.ceil(s.cast("double") * F.lit(threshold) - F.lit(1e-9)).cast("int")
        + F.lit(1)
    )
    pp = enc.select(
        "doc_id",
        s.alias("__s"),
        F.posexplode(F.slice("gi", F.lit(1), plen)).alias("pos", "el"),
    )
    lhs = pp.alias("l")
    rhs = pp.alias("r")
    # length filter: J >= t  =>  t * max(|a|, |b|) <= min(|a|, |b|).
    # positional filter (PPJoin): a match at 0-indexed prefix positions
    # (i, j) bounds the total overlap by 1 + min(sa-i-1, sb-j-1); a
    # qualifying pair needs overlap >= t/(1+t) * (sa+sb), and its FIRST
    # shared element always passes the bound, so keeping a pair when
    # ANY matched prefix element passes stays complete. On a corpus
    # with repeated common shingles this is the filter that bites:
    # measured 735k -> far fewer candidates at sf0.1 (see query doc).
    min_overlap = F.ceil(
        F.lit(threshold / (1.0 + threshold))
        * (F.col("l.__s") + F.col("r.__s")).cast("double")
        - F.lit(1e-9)
    )
    ubound = (
        F.lit(1)
        + F.least(
            F.col("l.__s") - F.col("l.pos") - F.lit(1),
            F.col("r.__s") - F.col("r.pos") - F.lit(1),
        )
    )
    return (
        lhs.join(
            rhs,
            (F.col("l.el") == F.col("r.el"))
            & (F.col("l.doc_id") < F.col("r.doc_id"))
            & (
                F.least("l.__s", "r.__s").cast("double")
                >= F.lit(threshold) * F.greatest("l.__s", "r.__s").cast("double")
            )
            & (ubound >= min_overlap),
        )
        .select(
            F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def prefix_filtered_pairs(
    gsets: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    set_col: str = "g",
) -> DataFrame:
    """Candidate pairs (id_a < id_b) via prefix filtering + length
    filter. Complete for Jaccard >= threshold; may contain false
    positives (the caller verifies exactly)."""
    return _prefix_pairs_encoded(
        encoded_sets(gsets, id_col, set_col), threshold
    )


def set_similarity_join(
    gsets: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    set_col: str = "g",
) -> DataFrame:
    """Exact Jaccard-threshold self-join: prefix-filtered candidates,
    then exact |intersect| / |union| verify over candidates only.
    Returns (id_a, id_b, jaccard) with jaccard rounded to 6 dp; the
    threshold cut runs on the UNROUNDED IEEE quotient (identical in
    Spark and DuckDB), so the boundary cannot drift cross-engine.

    The verify runs on the dictionary-ENCODED sets: ids are
    collision-free, so |intersect|/|union| over id arrays equals the
    same over the original element sets exactly — while intersecting
    longs instead of shingle strings (6x at sf0.1) and broadcasting
    8-byte ids instead of text.
    """
    return set_similarity_join_encoded(
        encoded_sets(gsets.filter(F.size(set_col) > 0), id_col, set_col),
        threshold,
    )


def set_similarity_join_encoded(enc: DataFrame, threshold: float) -> DataFrame:
    """The candidate + verify half of :func:`set_similarity_join`,
    over an ALREADY dictionary-encoded corpus ``(doc_id, gi)`` —
    split out (round 8) so the encoded corpus can come from a
    fingerprint-keyed store (store.persisted_result): encoding is a
    pure function of the corpus, built once per corpus version, while
    every join run pays only the prefix probe + verify. Semantics are
    identical to calling set_similarity_join on the raw sets."""
    cand = _prefix_pairs_encoded(enc, threshold)
    ga = enc.select(F.col("doc_id").alias("id_a"), F.col("gi").alias("__ga"))
    gb = enc.select(F.col("doc_id").alias("id_b"), F.col("gi").alias("__gb"))
    # broadcast the PER-DOC id tables, not the pair list: on a corpus
    # with repeated shingles the candidate set can be orders of
    # magnitude larger than the doc count, and shipping it twice as a
    # broadcast was the cost center (measured at sf0.1). At scale,
    # where neither side broadcasts, drop the hints and this becomes
    # the standard pair-by-id shuffle join.
    joined = cand.join(F.broadcast(ga), "id_a").join(F.broadcast(gb), "id_b")
    inter = F.size(F.array_intersect("__ga", "__gb")).cast("double")
    union = (F.size("__ga") + F.size("__gb")).cast("double") - inter
    return (
        joined.filter(inter / union >= F.lit(threshold))
        .select("id_a", "id_b", F.round(inter / union, 6).alias("jaccard"))
    )
