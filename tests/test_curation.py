"""Curation operator family: PII scrub, sequence packing,
contamination detection (operators/curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.operators.curation import (
    contamination_hits,
    pack_sequences,
    scrub_pii,
)


def test_scrub_pii_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "reach me at jane.doe+x@corp.example.org today"),
            (2, "call 555-0199-22 or 212-5551"),
            (3, "no pii here"),
            (4, "two mails a@b.io c@d.co and 999-1234"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_phones"] == 0
    assert "<EMAIL>" in out[1]["clean_text"]
    assert "jane" not in out[1]["clean_text"]
    assert out[2]["n_phones"] == 2 and "<PHONE>" in out[2]["clean_text"]
    assert out[3]["n_redactions"] == 0 and out[3]["clean_text"] == "no pii here"
    assert out[4]["n_redactions"] == 3


def test_scrub_pii_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = scrub_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_sequences_budget_arithmetic(spark):
    # one group (ids all ≡ 1 mod 32), token counts 3,3,3 with budget 5:
    # before = 0,3,6 -> packs 0,0,1; the middle doc overflows pack 0
    df = spark.createDataFrame(
        [(1, "a b c"), (33, "d e f"), (65, "g h i")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in pack_sequences(df, budget=5, n_groups=32).collect()
    }
    assert all(r["pack_group"] == 1 for r in out.values())
    assert [out[i]["pack_id"] for i in (1, 33, 65)] == [0, 0, 1]
    assert [out[i]["overflowed"] for i in (1, 33, 65)] == [False, True, False]


def test_pack_sequences_groups_are_independent(spark):
    # same token stream in two groups packs identically
    rows = [(i, "w " * 10) for i in range(0, 8)]
    out = pack_sequences(
        spark.createDataFrame(rows, "doc_id long, text string"),
        budget=25,
        n_groups=2,
    ).collect()
    by_group = {}
    for r in sorted(out, key=lambda r: r["doc_id"]):
        by_group.setdefault(r["pack_group"], []).append(r["pack_id"])
    assert by_group[0] == by_group[1]


def test_contamination_hits_finds_planted_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely different words about sorting networks here"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(900, "quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    out = contamination_hits(corpus, bench, n=8).collect()
    assert len(out) == 1
    row = out[0]
    assert (row["corpus_doc"], row["bench_doc"]) == (1, 900)
    assert row["n_shared_grams"] >= 1


def test_contamination_broadcasts_benchmark(spark):
    corpus = spark.createDataFrame([(1, "a b c d e f g h i")], "doc_id long, text string")
    bench = spark.createDataFrame([(2, "a b c d e f g h")], "doc_id long, text string")
    plan = (
        contamination_hits(corpus, bench, n=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_mixture_sample_rates_cap_epochs(spark):
    from pdf_using_hugging_face_and_vector_database_spark.operators.curation import (
        mixture_sample,
    )

    rows = [(i, "keep" if i < 40 else "tail") for i in range(80)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = mixture_sample(
        df,
        rates={"keep": 100},
        default_rate=0,
        cap=10,
        repeats={"keep": 3},
    ).collect()
    # default rate 0 -> tail source fully dropped
    assert {r["source"] for r in out} == {"keep"}
    # cap 10 of the 40 sampled docs, each repeated 3 epochs
    assert len(out) == 30
    assert {r["epoch"] for r in out} == {1, 2, 3}
    assert max(r["rank_in_source"] for r in out) == 10
    # deterministic: same input -> identical id set
    out2 = mixture_sample(
        df, rates={"keep": 100}, default_rate=0, cap=10, repeats={"keep": 3}
    ).collect()
    assert sorted((r["doc_id"], r["epoch"]) for r in out) == sorted(
        (r["doc_id"], r["epoch"]) for r in out2
    )


def test_scrub_pii_counts_match_replacements(spark):
    """r10 review: a digit-bearing email must not ALSO count as a
    phone — counts mirror the sequential replacement, so the audit
    numbers always agree with the redacted output."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.curation import (
        scrub_pii,
    )

    df = spark.createDataFrame(
        [(1, "contact 555-1234@example.com now")], "doc_id long, text string"
    )
    r = scrub_pii(df).collect()[0]
    assert r.n_emails == 1 and r.n_phones == 0 and r.n_redactions == 1
    assert "<EMAIL>" in r.clean_text and "<PHONE>" not in r.clean_text


def test_mixture_sample_repeats_zero_drops_source(spark):
    """r10 review: repeats=0 means 'drop the source' — previously
    F.sequence(1, 0) generated the DESCENDING [1, 0] and emitted the
    doc twice."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.curation import (
        mixture_sample,
    )

    df = spark.createDataFrame(
        [(i, "keep" if i % 2 else "drop") for i in range(40)],
        "doc_id long, source string",
    )
    out = mixture_sample(
        df, rates={}, default_rate=100, repeats={"drop": 0, "keep": 2},
        cap=1000,
    ).collect()
    assert all(r.source == "keep" for r in out)
    assert {r.epoch for r in out} == {1, 2}


def test_dsir_weights_keep_empty_docs(spark):
    """r10 review: a zero-token doc must come back (n_grams 0, neutral
    weight 0.0) instead of silently vanishing from the weights."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.curation import (
        dsir_weights
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "alpha beta gamma", "web"), (2, "", "web"), (3, "   ", "web")],
        "doc_id long, text string, source string",
    )
    rows = {r.doc_id: r for r in dsir_weights(
        df, target_pred=F.col("source") == "none"
    ).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2].n_grams == 0 and rows[2].dsir_weight == 0.0
    assert rows[3].n_grams == 0 and rows[3].dsir_weight == 0.0
    assert rows[1].n_grams == 3


def test_contamination_ignores_empty_docs(spark):
    """r10 review: zero-token docs previously produced the '' gram and
    flagged every empty-doc pair as mutually contaminated."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.curation import (
        contamination_hits,
    )

    corpus = spark.createDataFrame(
        [(1, ""), (2, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(10, ""), (11, "quick brown fox jumps over the lazy dog extra")],
        "doc_id long, text string",
    )
    rows = contamination_hits(corpus, bench, n=8).collect()
    assert all(r.corpus_doc != 1 for r in rows)  # empty never pairs
    assert any(r.corpus_doc == 2 and r.bench_doc == 11 for r in rows)
