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


def test_property_bpe_merges_match_reference(spark):
    """Randomized sweep (fixed seed): the distributed BPE trainer on a
    random small-alphabet corpus must produce the EXACT merge table of
    a plain-Python reference implementing the documented semantics —
    per-position (overlap-inclusive) pair counts weighted by word
    frequency, tie-break (count desc, lhs asc, rhs asc), and greedy
    left-to-right non-overlapping application. Small alphabets force
    dense tie-breaking, the part dialect bugs hide in."""
    import random

    from pdf_using_hugging_face_and_vector_database_spark.operators.text_analysis import (
        BPE_EOW,
        bpe_merge_table,
    )

    rng = random.Random(0xB9E)
    words = [
        "".join(rng.choices("abc", k=rng.randint(1, 5))) for _ in range(60)
    ]
    text_rows = [(i, " ".join(rng.sample(words, rng.randint(1, 8))))
                 for i in range(30)]

    # reference trainer over the exact word histogram of the corpus
    hist = {}
    for _i, t in text_rows:
        for w in t.split():
            hist[w] = hist.get(w, 0) + 1
    vocab = [(c, tuple(list(w) + [BPE_EOW])) for w, c in hist.items()]
    want = []
    for rank in range(1, 13):
        pc = {}
        for cnt, seq in vocab:
            for i in range(len(seq) - 1):
                pc[(seq[i], seq[i + 1])] = pc.get((seq[i], seq[i + 1]), 0) + cnt
        if not pc:
            break
        (lhs, rhs), n = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want.append((rank, lhs, rhs, lhs + rhs, n))
        nxt = []
        for cnt, seq in vocab:
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == lhs and seq[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            nxt.append((cnt, tuple(out)))
        vocab = nxt

    docs = spark.createDataFrame(text_rows, "doc_id long, text string")
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in bpe_merge_table(docs, n_merges=12).collect()
    ]
    assert got == want


def test_bpe_bracket_words_normalized(spark):
    """r10 review: '[' and ']' are the encoding's reserved delimiters —
    a bracket inside a word previously corrupted merge induction and
    inflated token counts. Bracket chars are stripped (both engines);
    counts stay exact."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.text_analysis import (
        bpe_apply,
        bpe_merge_table,
    )

    df = spark.createDataFrame(
        [(1, "a[b a[b ][ c]d"), (2, "ab ab cd")],
        "doc_id long, text string",
    )
    merges = [
        (r.lhs, r.rhs)
        for r in bpe_merge_table(df, n_merges=2).orderBy("merge_rank").collect()
    ]
    # normalized corpus = {ab x4, cd x2, '][' -> '' dropped}
    assert all("[" not in l + r and "]" not in l + r for l, r in merges)
    out = {r.doc_id: r for r in bpe_apply(df, merges).collect()}
    # doc 1: tokens a[b, a[b, ][, c]d -> normalized ab, ab, cd ('][' drops)
    assert out[1].n_words == 3
    assert out[1].n_tokens == out[2].n_tokens  # same normalized content
