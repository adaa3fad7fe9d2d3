"""Text-analysis expressions: tokenization, quality features,
language-ID scoring — the LLM-data-pipeline operator family
(BASELINE.json north star), all as pure SQL expressions so they run
JVM-side at 100 TB and are reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker lists for the n-gram/stopword
# language-ID heuristic. Deliberately short: the heuristic is the
# operator; the lexicon is a pluggable parameter.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "with"),
    "de": ("der", "und", "die", "ist", "mit"),
    "es": ("el", "la", "de", "es", "con"),
    "fr": ("le", "la", "et", "est", "avec"),
    "zh": ("shi", "de", "he", "zai", "you"),
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokens, empties dropped (portable: split + filter)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(text, " "), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    """Whitespace token count; 0 for NULL text — Spark's legacy
    size(NULL) is -1, which previously leaked a NEGATIVE count into
    doc_stats' quality score (outside its documented [0,1]) and into
    pack_sequences' cumulative-token arithmetic (r10 review)."""
    return F.greatest(F.size(tokens(text)), F.lit(0))


def occurrence_count(text: Column, needle: str) -> Column:
    """Occurrences of a literal substring, via length arithmetic —
    identical semantics in Spark and DuckDB (no regex dialect issues)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


def stopword_hits(text: Column, words: tuple[str, ...]) -> Column:
    """Count of marker-word occurrences (space-delimited match).

    Spaces are DOUBLED before matching (r12 review): adjacent repeats
    ("the the") share their delimiter space, so the replace-based
    count saw only the first occurrence (" the the " contains two
    overlapping " the " matches but replace consumes one). With every
    single space expanded to two, consecutive word matches never
    overlap and each occurrence counts. The DuckDB oracle mirrors the
    same padding (oracle._stopword_score)."""
    padded = F.concat(
        F.lit(" "), F.replace(text, F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    out = F.lit(0)
    for w in words:
        out = out + occurrence_count(padded, f" {w} ")
    return out


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: stopword_hits(text, ws) for lang, ws in LANG_MARKERS.items()}


def punct_ratio(text: Column | str) -> Column:
    """Fraction of chars that are . , ; : ! ? — a quality-score feature."""
    text = F.col(text) if isinstance(text, str) else text
    stripped = text
    for ch in ".,;:!?":
        stripped = F.replace(stripped, F.lit(ch), F.lit(""))
    return (F.length(text) - F.length(stripped)).cast("double") / F.greatest(
        F.length(text).cast("double"), F.lit(1.0)
    )


# BPE-ish pre-tokenizer regex: letter runs, single digits (GPT-style
# digit splitting), or any single other non-space symbol. Kept to
# constructs with identical semantics in Java regex (Spark) and RE2
# (DuckDB) so the count is oracle-checkable.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def bpe_token_count(text: Column | str) -> Column:
    """Sub-word-ish token count: number of BPE_TOKEN_RE matches. A real
    BPE tokenizer merges within these pre-token spans, so this counts
    pre-tokens — the standard cheap proxy for LLM token budgeting
    (within ~1.3x of real BPE counts on prose)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0)))


def word_ngrams(text: Column, n: int) -> Column:
    """Word n-gram shingles (space-joined) — ~4x fewer shingles than
    char n-grams on prose, the standard corpus-dedup choice at scale
    (char shingles stay the default for short/noisy text). DEDUP
    convention: a sub-n doc keeps its whole text as one gram and a
    zero-token doc yields the '' gram — two empty docs ARE duplicates
    and must keep matching; quality/contamination paths instead drop
    the '' gram (curation._word_ngrams_exploded, r10 review)."""
    # Referencing `toks` inside the position lambda is NOT the
    # norm-in-lambda O(dim^2) class (r15 review wave 11, MEASURED
    # before touching): unlike the vector norm — whose in-lambda
    # aggregate re-evaluates per element and cost 10x (see
    # l2_normalize) — the tokenization here is evaluated once per row
    # (2000-token docs show no quadratic blowup: 2.98 s vs 2.71 s for
    # a lambda-variable-bound rewrite, while at fixture doc sizes the
    # wrapper's nesting overhead made that rewrite 2x SLOWER:
    # 0.26 -> 0.52 s at sf0.1). Keep the direct form.
    toks = tokens(text)
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )


def char_ngrams(text: Column, n: int) -> Column:
    """All character n-grams of a string as an array (for Jaccard /
    MinHash shingling). Pure SQL: transform over a position sequence.

    NULL-text contract (r12 review adjudication): a NULL text yields a
    NULL array — the doc then DROPS from explode-based dedup paths
    (vs the word path, where concat_ws folds NULL to the '' gram).
    Dedup inputs are non-null by the ingest contract (P1 null_guard,
    mirroring the reference's empty-text fallback,
    streamlit_app.py:65-69); callers outside that contract must
    null-guard first. Documented rather than papered over so the
    word/char asymmetry is a visible boundary, not a silent one."""
    return F.when(
        F.length(text) < n, F.array(text)
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(text) - F.lit(n - 1)),
            lambda i: F.substring(text, i, F.lit(n)),
        )
    )
