"""Pins for the round-15 Unicode case/collation adversarial row: the
raw fixture is measured pure-ASCII (so no casing/collation contract had
oracle coverage before this row), every injected class is non-empty,
the naive kernels diverge across engines exactly as the certified
per-engine spellings predict (JVM full case mappings vs utf8proc 1:1;
code-point vs grapheme reverse), the honest non-divergences are
recorded (code-point length/substr/strpos, binary code-point collation
incl. astral, capital-sharp-S / titlecase-digraph / precomposed-accent
casing), and the template invariants the DuckDB twin's compensation
depends on are asserted so a future template edit cannot silently
skew the oracle."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.io import read_table
from pdf_using_hugging_face_and_vector_database_spark.queries import (
    UNICASE_DOCS,
    UNICASE_PREFIX_CHARS,
    UNICASE_TEMPLATES,
    unicode_case_contracts,
)

N_CLS = len(UNICASE_TEMPLATES)


def _rows(spark, sf_dir):
    return {
        r["kernel"]: r for r in unicode_case_contracts(spark, sf_dir).collect()
    }


def _duck_aug_digest(sf_dir: str, expr: str) -> int:
    """The oracle's aug CTE + 24-bit-md5 digest sum, with an arbitrary
    per-row expression — used to probe NAIVE (uncompensated) kernels
    against the certified Spark digests."""
    tmpl_case = (
        f"CASE (doc_id % {N_CLS}) "
        + " ".join(
            "WHEN %d THEN '%s'" % (i, t.replace("'", "''"))
            for i, t in enumerate(UNICASE_TEMPLATES[:-1])
        )
        + " ELSE '%s' END" % UNICASE_TEMPLATES[-1].replace("'", "''")
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con.sql(
        f"""
WITH aug AS (
  SELECT doc_id,
         substr(text, 1, {UNICASE_PREFIX_CHARS}) || ' ' || {tmpl_case} AS s
  FROM documents WHERE doc_id < {UNICASE_DOCS})
SELECT CAST(sum(('0x' || substr(md5(doc_id::VARCHAR || ':' || {expr}),
                 1, 6))::BIGINT) AS BIGINT) FROM aug
"""
    ).fetchone()[0]


def test_unicode_row_is_adversarial(spark, sf_dir):
    """Measured claims (the r13/r14/r15-overflow adversarial pattern):

    (1) the RAW fixture is pure ASCII with no tab/CR/LF — zero docs
    where byte length differs from char length — so every case-mapping
    / code-point / collation contract had no oracle coverage before
    this row, while every injected template class is provably
    non-empty;

    (2) the naive kernels diverge ACROSS engines exactly as the
    certified per-engine spellings predict: the JVM expands ß/ﬁ/ﬂ via
    full case mapping where utf8proc maps 1:1, lowers İ to i+U+0307
    where utf8proc drops the dot, applies the Greek final-sigma
    context rule that utf8proc lacks, and reverses CODE POINTS where
    DuckDB reverses graphemes — on the actual augmented fixture the
    naive DuckDB digests differ from the certified Spark digests;

    (3) the honest non-divergences are recorded: code-point length /
    substr / strpos, binary code-point collation (U+FFFD sorts BELOW
    an astral emoji — UTF-16 code-unit order would say otherwise),
    capital sharp S, the titlecase digraph, precomposed accents, and
    astral/PUA identity casing agree raw in both engines."""
    docs = read_table(spark, sf_dir, "documents")
    raw = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(
            F.when(F.octet_length("text") != F.length("text"), 1)
        ).alias("non_ascii"),
        F.count(
            F.when(
                F.col("text").rlike("[\\t\\r\\n]"), 1
            )
        ).alias("ws"),
        F.min(F.length("text")).alias("minlen"),
    ).collect()[0]
    assert raw["non_ascii"] == 0 and raw["ws"] == 0
    assert raw["minlen"] >= UNICASE_PREFIX_CHARS  # prefix always full
    per_cls = (
        docs.filter(F.col("doc_id") < UNICASE_DOCS)
        .groupBy((F.col("doc_id") % N_CLS).alias("cls"))
        .count()
        .collect()
    )
    assert len(per_cls) == N_CLS and all(r["count"] > 0 for r in per_cls)

    rows = _rows(spark, sf_dir)
    assert set(rows) == {
        "upper_fold_expansion",
        "lower_idot_sigma",
        "ascii_casing_agree",
        "codepoint_metrics",
        "reverse_codepoint_agree",
        "binary_order_rank",
        "initcap_ascii",
    }
    n = UNICASE_DOCS
    per = n // N_CLS
    assert rows["upper_fold_expansion"]["n_rows"] == n
    assert rows["upper_fold_expansion"]["marked_rows"] == per
    assert rows["lower_idot_sigma"]["marked_rows"] == 2 * per
    assert rows["ascii_casing_agree"]["marked_rows"] == 0  # ASCII proof
    assert rows["codepoint_metrics"]["marked_rows"] == n  # all multibyte
    assert rows["reverse_codepoint_agree"]["n_rows"] == n - per
    assert rows["binary_order_rank"]["n_rows"] == n

    # (2) fixture-level naive-vs-certified divergence: the UNcompensated
    # DuckDB kernels disagree with the certified Spark digests
    assert _duck_aug_digest(sf_dir, "upper(s)") != int(
        rows["upper_fold_expansion"]["digest"]
    )
    assert _duck_aug_digest(sf_dir, "lower(s)") != int(
        rows["lower_idot_sigma"]["digest"]
    )
    # ... while the compensated spellings are exactly the oracle gate
    # (tri-scale compare_oracle); the engine-level mappings underneath:
    sp = spark.sql(
        "SELECT upper('straße ﬁ ﬂ') a, lower('İ') b, lower('ΣΟΦΟΣ') c,"
        " reverse('éx') d, upper('ẞ') e, lower('ẞ') f,"
        " upper('ǅ') g, upper('émigré') h, upper('\U0001d518') i"
    ).collect()[0]
    du = duckdb.sql(
        "SELECT upper('straße ﬁ ﬂ'), lower('İ'), lower('ΣΟΦΟΣ'),"
        " reverse('e' || chr(769) || 'x'), upper('ẞ'), lower('ẞ'),"
        " upper('ǅ'), upper('émigré'), upper('\U0001d518')"
    ).fetchone()
    # full-vs-simple upper: JVM grows the string, utf8proc maps 1:1
    assert sp["a"] == "STRASSE FI FL"
    assert du[0] == "STRAẞE ﬁ ﬂ"
    # dotted capital I: JVM emits i + combining dot, utf8proc bare i
    assert sp["b"] == "i̇" and du[1] == "i"
    # final-sigma context rule: JVM only
    assert sp["c"] == "σοφος" and du[2] == "σοφοσ"
    # reverse: code points (JVM) vs graphemes (DuckDB)
    assert sp["d"] == "x́e" and du[3] == "xé"
    # honest agreements: capital sharp S, titlecase digraph,
    # precomposed accents, astral/PUA identity casing
    assert sp["e"] == du[4] == "ẞ" and sp["f"] == du[5] == "ß"
    assert sp["g"] == du[6] == "Ǆ"
    assert sp["h"] == du[7] == "ÉMIGRÉ"
    assert sp["i"] == du[8] == "\U0001d518"
    # code-point metrics + collation agree raw (so those legs need no
    # compensation): U+FFFD < U+1F600 in BOTH engines — UTF-16
    # code-unit order would put the surrogate pair FIRST
    mp = spark.sql(
        "SELECT length('a\U0001f600b́') l,"
        " substring('ab\U0001f600cd', 2, 3) s,"
        " instr('ab\U0001f600cd', 'c') p,"
        " '�' < '\U0001f600' o"
    ).collect()[0]
    md = duckdb.sql(
        "SELECT length('a\U0001f600b' || chr(769)),"
        " substr('ab\U0001f600cd', 2, 3),"
        " strpos('ab\U0001f600cd', 'c'),"
        " chr(65533) < chr(128512)"
    ).fetchone()
    assert (mp["l"], mp["s"], mp["p"], mp["o"]) == (4, "b\U0001f600c", 4, True)
    assert tuple(md) == (4, "b\U0001f600c", 4, True)

    # Python's str casing matches the JVM on every divergent class —
    # the property the third derivation rests on (CPython implements
    # the same full mappings + Final_Sigma from its own tables)
    assert "straße ﬁ ﬂ".upper() == "STRASSE FI FL"
    assert "İ".lower() == "i̇"
    assert "ΣΟΦΟΣ".lower() == "σοφος"


def test_unicode_template_invariants():
    """The DuckDB twin's compensation is only valid under these
    template-shape constraints — assert them so a future template edit
    fails HERE instead of silently skewing the oracle."""
    t = UNICASE_TEMPLATES
    for s in t:
        assert not s.startswith(" ") and not s.endswith(" ")
        assert "\t" not in s and "\n" not in s and "\r" not in s
    # class-0's divergent full-mapping set is exactly {ß, ﬁ, ﬂ}; no
    # other class carries them
    for i, s in enumerate(t):
        hits = set(s) & set("ßﬁﬂ")
        assert hits == (set("ßﬁﬂ") if i == 0 else set()), i
    # İ only in class 1 (the lower-compensation replace target)
    for i, s in enumerate(t):
        assert ("İ" in s) == (i == 1), i
    # sigma only in class 2, and every WORD-FINAL Σ (followed by a
    # space or end-of-string — the ones the sentinel-space rewrite
    # turns into ς) is preceded by a letter, so the JVM's Final_Sigma
    # context condition holds for exactly those positions; no
    # pre-existing lowercase σ/ς anywhere
    for i, s in enumerate(t):
        assert ("Σ" in s) == (i == 2), i
        assert "σ" not in s and "ς" not in s, i
    t2 = t[2]
    for j, ch in enumerate(t2):
        if ch == "Σ" and (j + 1 == len(t2) or t2[j + 1] == " "):
            assert j > 0 and t2[j - 1].isalpha(), j
    # combining marks only in class 4 (excluded from the reverse leg)
    import unicodedata

    for i, s in enumerate(t):
        has_comb = any(unicodedata.combining(ch) for ch in s)
        assert has_comb == (i == 4), i


def test_unicode_contracts_deterministic(spark, sf_dir):
    a = sorted(map(tuple, _rows(spark, sf_dir).values()))
    b = sorted(map(tuple, _rows(spark, sf_dir).values()))
    assert a == b
