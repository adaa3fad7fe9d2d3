"""Unit invariants for BPE merge induction and DSIR selection (values
are oracle-certified; these pin algorithmic properties the hash
compare can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.io import read_table
from pdf_using_hugging_face_and_vector_database_spark.operators.curation import (
    dsir_weights,
)
from pdf_using_hugging_face_and_vector_database_spark.operators.text_analysis import (
    BPE_EOW,
    bpe_merge_table,
)


def test_bpe_merges_are_well_formed(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    rows = bpe_merge_table(docs, n_merges=4).collect()
    assert [r["merge_rank"] for r in rows] == [1, 2, 3, 4]
    seen = set()
    for r in rows:
        assert r["merged"] == r["lhs"] + r["rhs"]
        assert r["pair_count"] > 0
        # a rule can't repeat: once merged, the pair no longer exists
        assert (r["lhs"], r["rhs"]) not in seen
        seen.add((r["lhs"], r["rhs"]))


def test_bpe_later_rounds_can_use_merged_symbols(spark, sf_dir):
    """At least one rule must consume a previously-merged symbol (the
    point of iterating); on the fixture round 4+ merges 'er'+EOW."""
    docs = read_table(spark, sf_dir, "documents")
    rows = bpe_merge_table(docs, n_merges=6).collect()
    merged_syms = {r["merged"] for r in rows}
    assert any(
        r["lhs"] in merged_syms or r["rhs"].removesuffix(BPE_EOW) in merged_syms
        for r in rows[1:]
    )


def test_dsir_target_slice_scores_higher(spark, sf_dir):
    """The defining property: documents FROM the target slice must
    average a higher importance weight than the rest."""
    docs = read_table(spark, sf_dir, "documents")
    w = dsir_weights(docs, F.col("source") == "src0")
    j = w.join(docs.select("doc_id", "source"), "doc_id")
    means = {
        r["is_tgt"]: r["m"]
        for r in j.groupBy((F.col("source") == "src0").alias("is_tgt"))
        .agg(F.avg("dsir_weight").alias("m"))
        .collect()
    }
    assert means[True] > means[False]


def test_dsir_weights_are_length_normalized(spark):
    """Weights are per-gram MEANS: within one corpus, a doc and its
    text-doubled twin have the same gram proportions, so their weights
    must be exactly equal (selection can't silently prefer long docs).
    Same-corpus comparison — a cross-corpus one would pick up
    add-alpha smoothing shifts and prove nothing."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "src0"),
            (2, "alpha beta gamma alpha beta gamma", "src1"),
            (3, "delta epsilon zeta eta", "src1"),
        ],
        "doc_id long, text string, source string",
    )
    w = {
        r["doc_id"]: (r["dsir_weight"], r["n_grams"])
        for r in dsir_weights(docs, F.col("source") == "src0").collect()
    }
    assert w[2][1] == 2 * w[1][1]
    assert w[1][0] == w[2][0]


def test_bpe_apply_counts_and_greedy_semantics(spark):
    """Encode with a hand-built merge chain: 'aa'+'a' must NOT
    re-merge overlapping occurrences (greedy left-to-right), and the
    chained rule must consume the output symbol of the earlier rule."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.text_analysis import bpe_apply

    df = spark.createDataFrame(
        [(1, "aaaa ab"), (2, "b")], "doc_id long, text string"
    )
    # rules: (a,a)->aa then (aa,a)->aaa
    out = {
        r.doc_id: r
        for r in bpe_apply(df, [("a", "a"), ("aa", "a")]).collect()
    }
    # 'aaaa' -> [a][a][a][a][</w>] -> [aa][aa][</w>] (greedy pairs, no
    # overlap) -> rule 2 needs [aa][a], absent -> 3 tokens
    # 'ab' -> [a][b][</w>] -> 3 tokens;  'b' -> [b][</w>] -> 2 tokens
    assert out[1].n_words == 2
    assert out[1].n_tokens == 3 + 3
    assert out[1].n_base_symbols == 5 + 3
    assert out[2].n_tokens == 2
    assert out[2].compression == 1.0


def test_bpe_encode_compresses_the_corpus(spark, sf_dir):
    """Learned merges must strictly compress: every doc's token count
    lands strictly between 0 and its base symbol count."""
    from pdf_using_hugging_face_and_vector_database_spark.queries import bpe_encode

    rows = bpe_encode(spark, sf_dir).collect()
    assert rows
    assert all(0 < r.n_tokens < r.n_base_symbols for r in rows)
