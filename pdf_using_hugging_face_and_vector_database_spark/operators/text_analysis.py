"""Text-analysis operators: per-document statistics, quality scoring,
language-ID, fingerprinting (north-star LLM-pipeline family).

Everything is a narrow projection + (optionally) one aggregation —
column-pruned scans, no Python. At 100 TB these run at parquet-scan
speed; the corpus-level rollups do a single map-side-combined groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_int, simhash
from ..functions.text import (
    LANG_MARKERS,
    lang_scores,
    punct_ratio,
    token_count,
    tokens,
)


def doc_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc stats + a simple composite quality score in [0, 1]:
    rewards mid-length docs, penalizes extreme punctuation density and
    very short tokens (heuristic quality filter a training-data
    pipeline would gate on)."""
    text = F.col(text_col)
    n_tokens = token_count(text)
    n_chars = F.length(text)
    # total non-space chars / token count
    non_space = F.length(F.replace(text, F.lit(" "), F.lit("")))
    avg_token_len = F.when(
        n_tokens > 0, non_space.cast("double") / n_tokens.cast("double")
    ).otherwise(F.lit(0.0))
    pr = punct_ratio(text)
    quality = (
        F.least(n_tokens.cast("double") / F.lit(20.0), F.lit(1.0)) * F.lit(0.5)
        + F.when((avg_token_len >= 3) & (avg_token_len <= 10), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(pr <= 0.1, F.lit(0.2)).otherwise(F.lit(0.0))
    )
    return df.select(
        "doc_id",
        n_chars.alias("n_chars_actual"),
        n_tokens.alias("n_tokens"),
        F.round(avg_token_len, 6).alias("avg_token_len"),
        F.round(pr, 6).alias("punct_ratio"),
        F.round(quality, 6).alias("quality_score"),
    )


def language_id_expr(text: Column) -> Column:
    """Argmax of per-language stopword-marker scores; ties resolve to
    the first language in LANG_MARKERS order (deterministic, mirrored
    exactly by the oracle SQL)."""
    scores = lang_scores(text)
    langs = list(LANG_MARKERS)
    # Sequential CASE: lang_i wins if its score >= every later lang's
    # (earlier langs already failed), so first-in-order wins ties.
    expr = None
    for i, lang in enumerate(langs[:-1]):
        cond = None
        for other in langs[i + 1 :]:
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit(langs[-1]))


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.select(
        "doc_id",
        F.col("lang").alias("lang_labeled"),
        language_id_expr(F.col(text_col)).alias("lang_guess"),
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """Document fingerprints: 48-bit md5 prefix (content identity) +
    16-bit SimHash over tokens (near-identity).

    Physical shape: explode token hashes -> ONE groupBy with ``bits``
    conditional integer sums (whole-stage codegen + map-side partial
    aggregation; the array-fold form of simhash() is CodegenFallback
    and interprets bits*tokens per row). Integer arithmetic -> result
    is exactly order-independent, bit-identical to the oracle.
    """
    from ..functions.hashing import element_hashes

    text = F.col(text_col)
    hashed = df.select(
        id_col, F.explode_outer(element_hashes(tokens(text))).alias("h")
    )
    bit_sums = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"__bit{b}")
            for b in range(bits)
        ]
    )
    sim = F.lit(0).cast("long")
    for b in range(bits):
        sim = sim + F.when(F.col(f"__bit{b}") > 0, F.lit(2**b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    base = df.select(id_col, md5_int(text, 12).alias("content_fp48"))
    return base.join(bit_sums, id_col).select(
        id_col, "content_fp48", sim.alias("simhash16")
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 2,
    dup_n: int = 3,
    min_unique: float = 0.35,
    max_top: float = 0.10,
    max_dup: float = 0.05,
) -> DataFrame:
    """Gopher-style repetition quality filters (Rae et al. 2021, public
    Gopher paper §A1.1): per-document lexical-diversity and n-gram
    repetition fractions plus a pass/fail gate — the filter family a
    training-data pipeline runs before dedup.

    Metrics (simplified but deterministic; overlapping-gram chars are
    counted once PER OCCURRENCE, not once per position, so the
    fractions can exceed Gopher's — the thresholds are calibrated to
    this definition):

    - ``unique_word_frac``   distinct tokens / tokens
    - ``top{n}gram_char_frac``  MAX over ``top_n``-grams of
      (count * gram length) / doc chars — the heaviest-COVERAGE gram,
      which is not always the most FREQUENT gram (a rarer but longer
      gram can cover more chars; r10 review adjudication: the
      max-coverage form is the stricter, more conservative gate and
      the oracle replays the same formula, so it is the documented
      contract rather than a divergence from it)
    - ``dup{n}gram_char_frac``  chars in word ``dup_n``-grams occurring
      >= 2 times (count * gram length summed) / doc chars

    Physical shape: one narrow base projection + two explode ->
    groupBy(id, gram) -> groupBy(id) branches joined back on the id —
    all whole-stage-codegen'd integer arithmetic with map-side partial
    aggregation, the same shingle shape as MinHash signing. At 100 TB
    each branch is one shuffle keyed by (id, gram), skew-free (gram
    counts are bounded per doc).
    """
    text = F.col(text_col)
    toks = tokens(text)
    base = df.select(
        id_col,
        F.length(text).alias("__n_chars"),
        # greatest(., 0): size(NULL) is NULL (or -1 under the legacy
        # conf) — a NULL-text doc must gate as empty, not as NULL
        F.greatest(F.size(toks), F.lit(0)).alias("n_words"),
        F.greatest(F.size(F.array_distinct(toks)), F.lit(0)).alias("__n_unique"),
    )

    def gram_counts(n: int) -> DataFrame:
        from .curation import _word_ngrams_exploded

        # codegen'd explode-sequence shingling (array-building HOFs are
        # CodegenFallback; measured 6.2s -> below 2s at sf0.1)
        grams = _word_ngrams_exploded(df, n, text_col, id_col)
        return grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("cnt"))

    top = gram_counts(top_n).groupBy(id_col).agg(
        F.max(F.col("cnt") * F.length("gram")).alias("__top_chars")
    )
    dup = gram_counts(dup_n).groupBy(id_col).agg(
        F.sum(
            F.when(F.col("cnt") >= 2, F.col("cnt") * F.length("gram")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("__dup_chars")
    )
    # LEFT joins + zero fills (r11 review): the gram helper drops a
    # zero-token doc's '' gram, so inner joins made such a doc VANISH
    # from the gate's output instead of failing it — a quality FILTER
    # must judge every input row (an empty doc scores uniq 0 and
    # fails), not silently lose the worst ones. Invisible on the
    # fixtures (no empty docs); pinned by tests/test_validation_text.py.
    joined = base.join(top, id_col, "left").join(dup, id_col, "left")
    denom_c = F.greatest(F.col("__n_chars"), F.lit(1)).cast("double")
    uniq = F.coalesce(F.col("__n_unique"), F.lit(0)).cast(
        "double"
    ) / F.greatest(F.col("n_words"), F.lit(1)).cast("double")
    top_frac = F.coalesce(F.col("__top_chars"), F.lit(0)).cast("double") / denom_c
    dup_frac = F.coalesce(F.col("__dup_chars"), F.lit(0)).cast("double") / denom_c
    return joined.select(
        id_col,
        "n_words",
        F.round(uniq, 6).alias("unique_word_frac"),
        F.round(top_frac, 6).alias(f"top{top_n}gram_char_frac"),
        F.round(dup_frac, 6).alias(f"dup{dup_n}gram_char_frac"),
        (
            (uniq >= min_unique) & (top_frac <= max_top) & (dup_frac <= max_dup)
        ).alias("passes_repetition"),
    )


def crossdoc_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
    flag_frac: float = 0.5,
) -> DataFrame:
    """Cross-document duplicated-span detection at word n-gram
    granularity — the shingle-level approximation of suffix-array
    corpus dedup (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): a doc whose spans mostly re-occur in
    OTHER documents is boilerplate / template / memorization risk even
    when no whole-doc near-dup fires.

    Per doc: the fraction of its word ``n``-gram occurrences whose gram
    appears in >= ``min_docs`` distinct documents, and an
    ``is_boilerplate`` flag at ``flag_frac``.

    Physical shape: explode shingles -> groupBy(gram, id) [map-side
    partial] -> per-gram distinct-doc counts as a WINDOW count over
    the (gram, id) rows -> groupBy(id). The window replaces the r15
    self-join of per_doc against its own groupBy(gram) aggregate —
    Spark planned that join's two branches as two full shingle
    explodes + two (gram, id) shuffles (the branches disagree on the
    n_occ column, so AQE's ReuseExchange cannot deduplicate them;
    plan receipt in plans/r16/) — and n_docs = count over the gram
    partition of per_doc is the same integer by construction (one
    row per (gram, doc)). A universal gram's window partition holds
    at most one row per doc (bounded by |docs|, not occurrences) —
    the same skew bound the join shape had.
    """
    from pyspark.sql import Window

    from .curation import _word_ngrams_exploded

    grams = _word_ngrams_exploded(df, n, text_col, id_col)
    per_doc = grams.groupBy("gram", id_col).agg(F.count(F.lit(1)).alias("n_occ"))
    joined = per_doc.withColumn(
        "n_docs", F.count(F.lit(1)).over(Window.partitionBy("gram"))
    )
    agg = joined.groupBy(id_col).agg(
        F.sum("n_occ").alias("n_grams"),
        F.sum(
            F.when(F.col("n_docs") >= min_docs, F.col("n_occ")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("dup_grams"),
    )
    frac = F.col("dup_grams").cast("double") / F.col("n_grams").cast("double")
    return agg.select(
        id_col,
        "n_grams",
        "dup_grams",
        F.round(frac, 6).alias("dup_span_frac"),
        (frac >= flag_frac).alias("is_boilerplate"),
    )


def corpus_rollup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level rollup by (lang, source): doc counts, token sums,
    char sums — single shuffle, partial-agg'd map-side."""
    return (
        df.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(F.col(text_col))).alias("total_tokens"),
            F.sum(F.length(F.col(text_col))).alias("total_chars"),
            F.max(F.length(F.col(text_col))).alias("max_chars"),
        )
    )


def token_segments(
    df: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode each document into consecutive ``n``-token segments
    (``seg_idx`` 1-based, last segment ragged). The segment grain for
    corpus-level exact-substring dedup (the word-aligned approximation
    of suffix-array dedup, cf. Lee et al. 2022 "Deduplicating Training
    Data Makes Language Models Better").

    Pure SQL (explode over a codegen'd sequence), so the explode runs
    JVM-side at scan speed. Empty/short docs yield one (possibly
    empty) segment so every input row survives to the rewrite."""
    toks = tokens(F.col(text_col))
    n_segs = F.greatest(
        ((F.size(toks) + F.lit(n - 1)) / F.lit(n)).cast("int"), F.lit(1)
    )
    return (
        df.select(
            F.col(id_col),
            toks.alias("__toks"),
            F.explode(F.sequence(F.lit(1), n_segs)).alias("seg_idx"),
        )
        .select(
            id_col,
            "seg_idx",
            F.array_join(
                F.slice(
                    F.col("__toks"),
                    (F.col("seg_idx") - F.lit(1)) * F.lit(n) + F.lit(1),
                    n,
                ),
                " ",
            ).alias("seg"),
        )
    )


def segment_dedup_rewrite(
    df: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level exact segment dedup with document REWRITE: split
    every doc into ``n``-token segments, keep only the globally FIRST
    occurrence of each distinct segment (order: ``(doc_id, seg_idx)``),
    and reassemble each document from its surviving segments.

    This is the destructive twin of ``crossdoc_duplicate_spans`` —
    that one detects duplicated spans, this one removes them (the
    C4/RefinedWeb "remove repeated content" rewrite, at word-aligned
    segment granularity).

    Scale shape (100 TB): one window shuffle keyed on the segment TEXT
    (uniform hash key — no skew beyond genuinely viral segments, whose
    groups are only as big as their duplicate count), then one groupBy
    on ``doc_id`` to reassemble. No joins, no all-pairs anywhere;
    both exchanges are on keys with bounded group sizes. For truly hot
    segments (boilerplate repeated millions of times) the window's
    per-group sort is O(group log group) on (doc_id, seg_idx) pairs
    only — a few MB even at 1e6 duplicates.

    Returns one row per input doc:
    ``(doc_id, n_segments, kept_segments, clean_text)``."""
    from pyspark.sql import Window

    segs = token_segments(df, n, text_col=text_col, id_col=id_col)
    w = Window.partitionBy("seg").orderBy(id_col, "seg_idx")
    flagged = segs.withColumn(
        "keep", F.row_number().over(w) == F.lit(1)
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.col("keep").cast("int")).alias("kept_segments"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("keep"),
                                F.struct("seg_idx", "seg"),
                            )
                        )
                    ),
                    lambda s: s["seg"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )


def bigram_lm_xent(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document cross-entropy under a corpus-trained bigram MLE
    language model — the CCNet-style "score each doc with an LM
    trained on the corpus itself" quality signal, at n=2.

    p(w2 | w1) = c(w1, w2) / c(w1-as-context); per-doc
    xent = mean over the doc's bigram occurrences of -ln p. Every
    occurrence's logprob is rounded to 6 decimals, decimal-summed
    (order-independent), divided by the bigram count, rounded again —
    so the DuckDB oracle reproduces it bit-for-bit.

    Scale shape (100 TB): bigram explode is codegen'd; the model is
    two map-side-combined groupBys over the bigram key (vocab², far
    smaller than the corpus); scoring joins the exploded corpus to the
    model on the bigram key — the model side is tiny relative to the
    corpus and broadcasts (vocab² rows); per-doc reduce is one
    groupBy on doc_id. Docs with < 2 tokens emit n_bigrams=0 and NULL
    xent rather than disappearing."""
    # token array materialized ONCE per row before the pair build — an
    # element_at lambda over a sequence would re-evaluate the split per
    # element (O(tokens^2) per doc, measured 10x slower at sf0.1)
    npairs = F.greatest(F.size(F.col("__t")) - F.lit(1), F.lit(0))
    big = (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("__t"))
        .select(
            id_col,
            F.slice(F.col("__t"), F.lit(1), npairs).alias("w1s"),
            F.slice(F.col("__t"), F.lit(2), npairs).alias("w2s"),
        )
        .select(
            id_col, F.explode_outer(F.arrays_zip("w1s", "w2s")).alias("bg")
        )
        .select(id_col, F.col("bg.w1s").alias("w1"), F.col("bg.w2s").alias("w2"))
    )

    observed = big.filter(F.col("w1").isNotNull())
    c2 = observed.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    # context counts as a WINDOW sum over the bigram rows (r16): the
    # r15 c2 ⋈ groupBy(w1) self-join re-ran the corpus bigram explode
    # + (w1, w2) shuffle for the c1 branch (same double-subtree shape
    # as crossdoc_spans/tfidf — plan receipt in plans/r16/);
    # ctx = sum(c) over the w1 partition is the same integer by
    # construction (c2 is one row per (w1, w2)).
    from pyspark.sql import Window

    model = c2.withColumn(
        "ctx", F.sum("c").over(Window.partitionBy("w1"))
    ).select(
        "w1",
        "w2",
        F.round(
            -F.log(F.col("c").cast("double") / F.col("ctx").cast("double")), 6
        ).alias("lp"),
    )
    scored = big.join(
        F.broadcast(model), ["w1", "w2"], "left"
    )
    dec = "decimal(27,6)"
    return scored.groupBy(id_col).agg(
        F.count(F.col("lp")).alias("n_bigrams"),
        F.when(
            F.count(F.col("lp")) > 0,
            F.round(
                (
                    F.sum(F.col("lp").cast(dec)).cast("double")
                    / F.count(F.col("lp")).cast("double")
                ),
                6,
            ),
        ).alias("xent"),
    )


BPE_EOW = "</w>"


def _bpe_word(word: Column) -> Column:
    """Strip the BPE encoding's reserved delimiter chars from a word
    (see bpe_merge_table's normalization contract) — scalar replaces,
    codegen'd, mirrored by the DuckDB replays."""
    return F.replace(F.replace(word, F.lit("["), F.lit("")), F.lit("]"), F.lit(""))


def bpe_merge_table(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> DataFrame:
    """Distributed BPE merge induction (Sennrich et al. 2016): the
    first ``n_merges`` merge rules learned from the corpus.

    Scale shape — the one trick every BPE-at-scale trainer uses: the
    corpus is scanned ONCE into the word histogram (explode + one
    map-side-combined groupBy); every merge round after that runs on
    the HISTOGRAM (vocabulary-scale, millions of rows at 100 TB, never
    the corpus). Each round is one explode+groupBy over the histogram
    plus a 1-row collect (the argmax pair), and the evolving histogram
    is persist_tracked so round r+1 does not recompute rounds 0..r.

    Symbol sequences are bracket-delimited strings (``[h][i][</w>]``)
    so that applying a merge is ONE literal ``replace``: the pattern
    ``[a][b]`` consumes its delimiters entirely (no shared boundary
    chars), making left-to-right non-overlapping replace exactly the
    greedy BPE application rule — identical semantics in Spark and
    DuckDB, no regex dialect, no lookaround (the oracle replays the
    same replace chain).

    Ties on pair count break (count desc, lhs asc, rhs asc) — ASCII
    binary compare in both engines.

    Normalization contract (r10 review): ``[`` and ``]`` are the
    encoding's RESERVED delimiters — a bracket inside a word would
    make the symbol string ambiguous (merging symbols that are
    themselves brackets re-parses into phantom symbols, corrupting
    later merge rounds and token counts). Bracket chars are therefore
    stripped from words before encoding, in the trainer AND the
    applier AND both DuckDB replays; words that become empty are
    dropped. A scalar replace after the explode — stays codegen'd.
    """
    from ..caching import persist_tracked
    from ..functions.text import tokens

    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("__raw"))
        .select(_bpe_word(F.col("__raw")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    chars = F.filter(F.split(F.col("word"), ""), lambda c: c != "")
    vocab = persist_tracked(
        words.select(
            "cnt",
            F.concat(
                F.lit("["),
                F.array_join(chars, "]["),
                F.lit("]["),
                F.lit(BPE_EOW),
                F.lit("]"),
            ).alias("seq"),
        )
    )

    merge_rows = []
    for rank in range(1, n_merges + 1):
        syms = F.split(
            F.expr("substring(seq, 2, length(seq) - 2)"), r"\]\["
        )
        pairs = (
            vocab.select("cnt", syms.alias("syms"))
            .select("cnt", "syms", F.posexplode("syms").alias("i", "lhs"))
            .filter(F.col("i") < F.size("syms") - 1)
            .select(
                "cnt",
                "lhs",
                F.element_at("syms", F.col("i") + 2).alias("rhs"),
            )
        )
        top = (
            pairs.groupBy("lhs", "rhs")
            .agg(F.sum("cnt").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not top:
            break
        lhs, rhs, pc = top[0]["lhs"], top[0]["rhs"], top[0]["pair_count"]
        merge_rows.append((rank, lhs, rhs, lhs + rhs, pc))
        # NOTE: the previous round's cache must stay alive until the
        # NEXT round's collect materializes this lazy select (else
        # every round recomputes from the corpus scan — O(K) scans);
        # release_caches() retires the K vocabulary-scale snapshots
        # when the query completes.
        vocab = persist_tracked(
            vocab.select(
                "cnt",
                F.replace(
                    F.col("seq"),
                    F.lit(f"[{lhs}][{rhs}]"),
                    F.lit(f"[{lhs}{rhs}]"),
                ).alias("seq"),
            )
        )

    spark = df.sparkSession
    return spark.createDataFrame(
        merge_rows,
        "merge_rank int, lhs string, rhs string, merged string, pair_count long",
    )


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode every document with a learned BPE merge chain and report
    per-doc token statistics — the tokenizer APPLICATION half of the
    bpe_merge_table/bpe_apply pair (train once, encode the corpus).

    Scale shape: the merge chain runs over the DISTINCT-WORD table
    (vocabulary-scale), never per occurrence — each word is encoded
    once and joined back to the corpus on the word key. Merges are
    driver literals (a learned tokenizer is small by construction), so
    each merge is one codegen'd literal replace with the same greedy
    left-to-right non-overlap semantics as training; the bracket
    delimiters make `[a][b]` unambiguous (see bpe_merge_table).

    Output per doc: n_words, n_tokens (post-merge), n_base_symbols
    (chars + one end-of-word marker per word), and the compression
    ratio base/tokens.
    """
    from ..functions.text import occurrence_count, tokens

    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("__raw"))
        .select(_bpe_word(F.col("__raw")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    chars = F.filter(F.split(F.col("word"), ""), lambda c: c != "")
    seq = F.concat(
        F.lit("["),
        F.array_join(chars, "]["),
        F.lit("]["),
        F.lit(BPE_EOW),
        F.lit("]"),
    )
    enc = words.select("word", seq.alias("seq"))
    for lhs, rhs in merges:
        enc = enc.select(
            "word",
            F.replace(
                F.col("seq"), F.lit(f"[{lhs}][{rhs}]"), F.lit(f"[{lhs}{rhs}]")
            ).alias("seq"),
        )
    enc = enc.select(
        "word",
        occurrence_count(F.col("seq"), "[").cast("long").alias("w_tokens"),
        (F.length("word") + F.lit(1)).cast("long").alias("w_base"),
    )
    # vocabulary-scale side broadcast; at a 100 TB corpus vocabulary
    # (millions of words) drop the hint and this is a word-key shuffle
    # join against a table still ~6 orders smaller than the corpus
    doc_words = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__raw")
    ).select(
        id_col, _bpe_word(F.col("__raw")).alias("word")
    ).filter(F.col("word") != "")
    return (
        doc_words.join(F.broadcast(enc), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("w_tokens").alias("n_tokens"),
            F.sum("w_base").alias("n_base_symbols"),
        )
        .withColumn(
            "compression",
            F.round(
                F.col("n_base_symbols").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ),
        )
    )
