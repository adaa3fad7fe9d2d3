"""Deterministic hashing primitives shared by the test embedder,
MinHash/SimHash dedup, and document fingerprinting.

Everything is built on ``md5`` because it is the one hash computed
identically by Spark SQL and the DuckDB oracle — ``xxhash64``/``hash``
differ between engines. We take the first 6 hex chars (24 bits), which
is exactly representable in a DOUBLE, so all downstream arithmetic is
bit-identical across engines.

Spark:  conv(substring(md5(s), 1, 6), 16, 10)
DuckDB: ('0x' || substr(md5(s), 1, 6))::BIGINT
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^24 - 1: max value of a 6-hex-char hash; the [-1, 1] fold divisor.
MAX24 = float(0xFFFFFF)


def md5_int(col: Column, nhex: int = 6) -> Column:
    """First ``nhex`` hex chars of md5 as an exact integer (LongType)."""
    return F.conv(F.substring(F.md5(col), 1, nhex), 16, 10).cast("long")


def hash_components(text: Column, dim: int, salt: str = "") -> Column:
    """``dim`` pseudo-random components in [-1, 1], a pure function of
    the text — the deterministic stand-in for the sentence-transformer
    (reference T3, ``streamlit_app.py:93-94``) that the DuckDB oracle
    can reproduce exactly (SURVEY.md §5 determinism requirement).

    component_j = md5_int(text || ':' || salt || j) / (2^24-1) * 2 - 1
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: md5_int(F.concat(text, F.lit(":" + salt), j.cast("string")))
        / F.lit(MAX24)
        * F.lit(2.0)
        - F.lit(1.0),
    )


def minhash_signature(shingles: Column, num_hashes: int) -> Column:
    """MinHash signature of a set of string shingles: for each seed k,
    min over shingles of md5_int(k || '#' || shingle).

    Pure SQL (transform + array_min) — identical in DuckDB via
    list_transform + list_min, so near-dup dedup is oracle-checkable.
    P[minhash_k(A) = minhash_k(B)] = Jaccard(A, B).
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda k: F.array_min(
            F.transform(
                shingles,
                lambda s: md5_int(F.concat(k.cast("string"), F.lit("#"), s)),
            )
        ),
    )


def simhash(tokens: Column, bits: int = 16) -> Column:
    """SimHash of a token array: bit b is 1 iff the sum over tokens of
    ±1 (sign of bit b of the token hash) is positive.

    Returns a LongType fingerprint. Near-dup candidates = small Hamming
    distance (compared via bit_count(a XOR b) at the call site).
    """
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.when(
            F.aggregate(
                F.transform(
                    tokens,
                    lambda t: F.when(
                        # bit b of the token hash: (h div 2^b) mod 2
                        (md5_int(t) / F.pow(F.lit(2.0), b.cast("double"))).cast("long")
                        % 2
                        == 1,
                        F.lit(1),
                    ).otherwise(F.lit(-1)),
                ),
                F.lit(0),
                lambda a, x: a + x,
            )
            > 0,
            F.pow(F.lit(2.0), b.cast("double")).cast("long"),
        ).otherwise(F.lit(0)),
    )
