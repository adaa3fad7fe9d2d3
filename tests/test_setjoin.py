"""Exact set-similarity join (PPJoin-style prefix filtering):
correctness against a brute-force all-pairs truth, boundary behavior,
and the no-cross-product plan property."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

from pdf_using_hugging_face_and_vector_database_spark import queries as Q
from pdf_using_hugging_face_and_vector_database_spark.operators.setjoin import (
    prefix_filtered_pairs,
    set_similarity_join,
    word_gram_sets,
)
from pdf_using_hugging_face_and_vector_database_spark.plans import formatted_plan

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("g", ArrayType(StringType())),
    ]
)


def _brute_force(rows, t):
    out = {}
    for (ida, sa), (idb, sb) in combinations(rows, 2):
        a, b = set(sa), set(sb)
        if not a or not b:
            continue
        inter = len(a & b)
        uni = len(a | b)
        if inter / uni >= t:
            key = (min(ida, idb), max(ida, idb))
            out[key] = round(inter / uni, 6)
    return out


def _spark_result(spark, rows, t):
    df = spark.createDataFrame(
        [(i, list(s)) for i, s in rows], schema=SCHEMA
    )
    got = set_similarity_join(df, t).collect()
    return {(r.id_a, r.id_b): r.jaccard for r in got}


def test_matches_brute_force(spark):
    """Deterministic mixed corpus: identical docs, near-dups at several
    overlap levels, disjoint docs, an empty set, and a singleton."""
    rows = [
        (1, ["a", "b", "c", "d", "e"]),
        (2, ["a", "b", "c", "d", "e"]),  # J(1,2) = 1.0
        (3, ["a", "b", "c", "d", "x"]),  # J(1,3) = 4/6 = 0.667
        (4, ["a", "b", "x", "y", "z"]),  # J(1,4) = 2/8 = 0.25
        (5, ["p", "q", "r"]),  # disjoint from 1..4
        (6, ["p", "q", "r", "s"]),  # J(5,6) = 3/4 = 0.75
        (7, []),  # empty: never matches
        (8, ["a"]),  # singleton
        (9, ["a"]),  # J(8,9) = 1.0
    ]
    for t in (0.4, 0.6, 0.75, 1.0):
        assert _spark_result(spark, rows, t) == _brute_force(rows, t), t


def test_threshold_boundary_pair_is_kept(spark):
    """J exactly == t must survive the cut (>=, not >) — and the
    1e-9-guarded ceil must not shorten the prefix past it."""
    rows = [(1, ["a", "b", "c"]), (2, ["a", "b", "c", "d", "e"])]
    # J = 3/5 = 0.6 exactly
    got = _spark_result(spark, rows, 0.6)
    assert got == {(1, 2): 0.6}
    assert _spark_result(spark, rows, 0.61) == {}


def test_prefix_candidates_complete_but_pruned(spark):
    """The candidate set contains every qualifying pair and, for a
    corpus of mostly-disjoint docs, far fewer than all pairs."""
    rows = [(i, [f"t{i}_{j}" for j in range(10)] + ["shared"]) for i in range(20)]
    rows.append((100, [f"t5_{j}" for j in range(10)] + ["shared"]))  # dup of 5
    df = spark.createDataFrame([(i, list(s)) for i, s in rows], schema=SCHEMA)
    cand = {
        (r.id_a, r.id_b)
        for r in prefix_filtered_pairs(df, 0.8).collect()
    }
    assert (5, 100) in cand
    # every doc shares "shared", but at t=0.8 the length+prefix filters
    # must prune the all-pairs blowup (21*20/2 = 210 pairs)
    assert len(cand) < 50


def test_no_cross_product_in_plan(spark, sf_dir):
    """The candidate join must be an equi-join on prefix elements —
    never a cartesian / nested-loop over the corpus."""
    plan = formatted_plan(Q.neardup_ppjoin(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_query_agrees_with_lsh_verify_path(spark, sf_dir):
    """Cross-operator consistency: every pair the exact join reports at
    t=0.6 must also be reported by neardup_jaccard's LSH+verify path
    at its 0.5 cut IF the LSH bands proposed it — and where both
    report a pair, the jaccard values must be identical."""
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in Q.neardup_ppjoin(spark, sf_dir).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.jaccard
        for r in Q.neardup_jaccard(spark, sf_dir).collect()
    }
    overlap = set(exact) & set(lsh)
    assert overlap, "expected shared near-dup pairs between the two paths"
    for k in overlap:
        assert exact[k] == lsh[k], k


def test_encoded_ids_follow_df_then_element_order(spark):
    """The encoding contract everything rests on: element-id NUMERIC
    order must equal the (document frequency asc, element asc) global
    total order. Since round 7 eid is the dense 0-based rank of
    (df, el) computed order-functionally (two-level bucketed
    row_number — see encoded_sets), so this test also pins density:
    ids are exactly 0..N-1 in order. The fixture exercises both rank
    levels: rare1/rare2 share the 4-char prefix bucket 'rare' (within-
    bucket ordering), mid/common live in different buckets (offset
    ordering). Completeness itself is guarded by the brute-force
    tests."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.setjoin import (
        encoded_sets,
    )
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    rows = [
        (1, ["common", "mid", "rare1"]),
        (2, ["common", "mid", "rare2"]),
        (3, ["common", "mid"]),
        (4, ["common"]),
    ]
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("g", ArrayType(StringType()))]
    )
    enc = encoded_sets(spark.createDataFrame(rows, schema))
    gi = {r.doc_id: r.gi for r in enc.collect()}
    # df: rare1=1, rare2=1, mid=3, common=4 -> order rare1 < rare2 < mid < common
    rare1 = gi[1][0]
    rare2 = gi[2][0]
    mid_id = gi[3][0]
    common = gi[4][0]
    assert rare1 < rare2 < mid_id < common
    # dense rank: ids are exactly 0..N-1 along the (df, el) order
    assert [rare1, rare2, mid_id, common] == [0, 1, 2, 3]
    # each doc's array is ascending = rarest-first prefix order
    for arr in gi.values():
        assert list(arr) == sorted(arr)
    # doc 1's prefix (rarest element) is rare1, not common
    assert gi[1][0] == rare1 and gi[1][-1] == common


def test_encoded_join_plan_shape(spark, sf_dir):
    """Structural pins for the encoded join: the per-doc id tables are
    BROADCAST into the verify (never a shuffle of the pair list), no
    cartesian product anywhere, and — since round 8 — the encoded
    corpus comes from the persisted_ppjoin_encoded parquet STORE, not
    a persist_tracked lineage: the plan must show store FileScans and
    NO InMemoryTableScan (caching the store read measured 4.0 s vs
    2.5 s — materialization serialized the broadcast build; the query
    deliberately re-scans the ~MB-scale parquet)."""
    from pdf_using_hugging_face_and_vector_database_spark.plans.explain import count_nodes

    df = Q.neardup_ppjoin(spark, sf_dir)
    assert count_nodes(df, "BroadcastHashJoin") >= 2
    assert count_nodes(df, "CartesianProduct") == 0
    assert count_nodes(df, "InMemoryTableScan") == 0
    plan = df._jdf.queryExecution().executedPlan().treeString()
    assert "ppjoin_encoded_" in plan  # reads the fingerprint-keyed store


def test_encoded_cache_keeps_parallelism(spark):
    """Regression guard for the AQE cache-coalescing trap: dense ids
    delta-compress so well that AQE's byte-based coalescing collapsed
    the materialized encoded corpus to ~1 partition, serializing every
    per-row-expensive downstream consumer (probe + verify ran 4 tasks
    instead of 128; full join 5.4 s vs 2.8 s at sf0.1). encoded_sets
    now repartitions on doc_id at the session shuffle width — which
    AQE must NOT coalesce away. This pins the materialized cache's
    width to the configured shuffle partitions."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.setjoin import (
        encoded_sets,
    )

    rows = [(i, [f"e{i}", f"e{i + 1}", "shared"]) for i in range(40)]
    enc = encoded_sets(spark.createDataFrame(rows, SCHEMA))
    enc.count()  # materialize the cache
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert enc.rdd.getNumPartitions() == width


def test_property_random_corpora_match_brute_force(spark):
    """Randomized sweep (fixed seed) for the exactness claim: on a
    ~150-doc corpus of random sets over a SHARED 12-element pool (so
    overlaps at every Jaccard level actually occur, including empty
    sets and duplicates) the prefix-filtered + encoded join must
    equal the brute-force all-pairs join at several thresholds —
    completeness AND precision, jaccard values included. All docs go
    through ONE Spark evaluation per threshold to keep the sweep
    affordable (hypothesis-driving Spark per-example would pay a job
    per case)."""
    import random

    rng = random.Random(0xC0FFEE)
    pool = [f"e{i}" for i in range(12)]
    rows = []
    doc_id = 0
    for _ in range(25):
        for _ in range(rng.randint(2, 10)):
            rows.append((doc_id, sorted(rng.sample(pool, rng.randint(0, 8)))))
            doc_id += 1
    for t in (0.34, 0.5, 0.67, 1.0):
        assert _spark_result(spark, rows, t) == _brute_force(rows, t), t


def test_property_encoded_ids_match_python_reference(spark):
    """Randomized reference sweep for the order-functional encoding
    (the round-7 ADVICE rework): eid must equal the dense 0-based rank
    of (document frequency asc, element asc) computed independently in
    Python. The pool is adversarial for the two-level rank: elements
    shorter than the 4-char prefix (including the empty string),
    groups sharing a 4-char prefix but diverging later (the
    within-bucket orderBy path), multi-byte UTF-8 (accented, CJK,
    astral-plane emoji — Spark's UTF8String compare is byte-wise,
    which equals code-point order, which is Python's str order; this
    sweep pins that the two agree), and near-equal strings that
    straddle bucket boundaries. Frequencies are randomized so df ties
    and df-crossing prefixes both occur."""
    import random

    from pdf_using_hugging_face_and_vector_database_spark.operators.setjoin import (
        encoded_sets,
    )

    pool = [
        "", "a", "ab", "abc", "abcd", "abcde", "abcdf", "abcdg",
        "abce", "zzzz0001", "zzzz0002", "préfix", "préfiy",
        "日本語テスト", "日本語テス", "😀astral", "😀astrb", "e1", "e2",
    ]
    rng = random.Random(0xB00C)
    for _ in range(5):
        rows = []
        for doc_id in range(40):
            k = rng.randint(1, len(pool))
            rows.append((doc_id, sorted(rng.sample(pool, k))))
        enc = encoded_sets(spark.createDataFrame(rows, SCHEMA))
        got = {r.doc_id: list(r.gi) for r in enc.collect()}
        # python twin: df per element, dense rank of (df, el)
        df_count: dict[str, int] = {}
        for _, els in rows:
            for e in els:
                df_count[e] = df_count.get(e, 0) + 1
        order = sorted(df_count, key=lambda e: (df_count[e], e))
        eid = {e: i for i, e in enumerate(order)}
        want = {d: sorted(eid[e] for e in els) for d, els in rows}
        assert got == want


def test_encoded_sets_nonnumeric_shuffle_conf(spark, monkeypatch):
    """r7 ADVICE item 4: a non-numeric spark.sql.shuffle.partitions
    (e.g. "auto" on vendored distros) must fall back to
    defaultParallelism instead of breaking every PPJoin query. Stock
    Spark 4 rejects such values at conf.set, so the hostile value is
    injected at the RuntimeConfig.get seam the operator reads."""
    from pyspark.sql.conf import RuntimeConfig

    from pdf_using_hugging_face_and_vector_database_spark.operators.setjoin import (
        encoded_sets,
    )

    real_get = RuntimeConfig.get

    def fake_get(self, key, *args, **kwargs):
        if key == "spark.sql.shuffle.partitions":
            return "auto"
        # pass the default through untouched — pyspark uses a _NoValue
        # sentinel, so forcing default=None would change semantics
        return real_get(self, key, *args, **kwargs)

    monkeypatch.setattr(RuntimeConfig, "get", fake_get)
    rows = [(i, [f"e{i}", "shared"]) for i in range(6)]
    enc = encoded_sets(spark.createDataFrame(rows, SCHEMA))
    assert enc.count() == 6
