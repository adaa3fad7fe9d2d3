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
from ..functions.text import LANG_MARKERS, lang_scores, punct_ratio, token_count, tokens


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
