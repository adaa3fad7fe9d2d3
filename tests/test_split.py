"""hash_split: deterministic train/val/test assignment — stability
under corpus growth, per-stratum proportions, and the zero-shuffle
plan property."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark import queries as Q
from pdf_using_hugging_face_and_vector_database_spark.operators.curation import hash_split
from pdf_using_hugging_face_and_vector_database_spark.plans.explain import count_shuffles


def test_assignment_stable_under_growth(spark):
    """A doc's split is a function of its key alone: adding rows must
    not flip any existing assignment (the property window-based
    splits lack)."""
    small = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in hash_split(small).collect()}
    b = {r.doc_id: r.split for r in hash_split(big).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_proportions_within_tolerance(spark):
    df = spark.range(0, 20_000).withColumnRenamed("id", "doc_id")
    counts = {
        r.split: r["count"]
        for r in hash_split(df).groupBy("split").count().collect()
    }
    n = sum(counts.values())
    assert n == 20_000
    assert abs(counts["train"] / n - 0.8) < 0.02
    assert abs(counts["val"] / n - 0.1) < 0.01
    assert abs(counts["test"] / n - 0.1) < 0.01


def test_custom_fractions_and_buckets(spark):
    df = spark.range(0, 5_000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, fractions={"a": 0.5, "b": 0.5}, buckets=10)
    got = {r.split for r in out.select("split").distinct().collect()}
    assert got == {"a", "b"}
    assert out.filter(F.col("bucket") >= 10).count() == 0


def test_split_is_shuffle_free(spark, sf_dir):
    """The assignment is a pure projection: zero Exchanges in the
    dataset_split plan."""
    assert count_shuffles(Q.dataset_split(spark, sf_dir)) == 0


def test_leakage_counts_are_consistent(spark, sf_dir):
    """Per-group member counts must sum, and the synthetic corpus
    (doc + its truncation, identical keys mod 100000) is expected to
    leak: a pair's two members hash independently, so ~16% of pairs
    straddle train/test."""
    rows = Q.split_leakage(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_train + r.n_val + r.n_test == r.n_docs
        assert r.leaked == (r.n_train > 0 and r.n_test > 0)
    assert any(r.leaked for r in rows)


def test_weighted_sample_prefers_heavy_docs(spark, sf_dir):
    """Deterministic E-S draw: exactly k rows per source, and the
    weight bias must show — the sampled docs' mean token count
    exceeds the corpus mean (longer docs draw smaller keys)."""
    from pdf_using_hugging_face_and_vector_database_spark.io import read_table
    from pdf_using_hugging_face_and_vector_database_spark.functions.text import (
        token_count,
    )
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        WRS_PER_SOURCE,
        weighted_sample,
    )

    rows = weighted_sample(spark, sf_dir).collect()
    per_source = {}
    for r in rows:
        per_source.setdefault(r.source, []).append(r.rank)
    assert all(sorted(v) == list(range(1, WRS_PER_SOURCE + 1))
               for v in per_source.values())
    sampled_mean = sum(r.weight for r in rows) / len(rows)
    docs = read_table(spark, sf_dir, "documents")
    corpus_mean = (
        docs.select(F.avg(token_count(F.col("text")))).collect()[0][0]
    )
    assert sampled_mean > corpus_mean


def test_misra_gries_bounds_and_memory(spark):
    """MG guarantee on an adversarial skew: k counters, item with
    freq > n/(k+1) always present, estimates within the additive
    bound, and the summary never exceeds k rows per partition."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.heavyhitters import (
        merged_summary,
        misra_gries_partial,
    )

    # 10k rows: 'hot' 40%, 'warm' 20%, 100 cold tails
    rows = (
        [("hot",)] * 4000 + [("warm",)] * 2000
        + [(f"cold{i % 100}",) for i in range(4000)]
    )
    df = spark.createDataFrame(rows, "v string").repartition(8)
    k = 4
    parts = misra_gries_partial(df, "v", k)
    # mapInPandas emits one summary per partition, <= k rows each
    assert parts.count() <= k * 8
    est = {r.item: r.est for r in merged_summary(df, "v", k).collect()}
    n = 10_000
    for item, true in (("hot", 4000), ("warm", 2000)):
        assert item in est
        assert est[item] <= true
        assert est[item] >= true - n / (k + 1)


def test_property_misra_gries_bound_random_streams(spark):
    """Randomized sweep (fixed seed): on random zipf-ish streams over
    varying partition counts, the merged MG summary must (a) never
    overestimate, (b) stay within the additive n/(k+1) bound, and
    (c) report EVERY item whose true frequency exceeds n/(k+1) — the
    guarantee that must survive the per-partition merge."""
    import random

    from pdf_using_hugging_face_and_vector_database_spark.operators.heavyhitters import (
        merged_summary,
    )

    rng = random.Random(0x4E0)
    for trial, (n_items, n_rows, k, parts) in enumerate(
        [(30, 3000, 5, 4), (80, 5000, 8, 8), (10, 2000, 3, 2)]
    ):
        weights = [1.0 / (i + 1) ** 1.2 for i in range(n_items)]
        stream = rng.choices(
            [f"t{trial}i{i}" for i in range(n_items)], weights=weights, k=n_rows
        )
        true = {}
        for v in stream:
            true[v] = true.get(v, 0) + 1
        df = spark.createDataFrame([(v,) for v in stream], "v string").repartition(
            parts
        )
        est = {r.item: r.est for r in merged_summary(df, "v", k).collect()}
        bound = n_rows / (k + 1)
        for item, e in est.items():
            assert e <= true[item], (trial, item)
            assert e >= true[item] - bound, (trial, item)
        for item, t in true.items():
            if t > bound:
                assert item in est, (trial, item, t, bound)
