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


def md5_int_py(s: str, nhex: int = 6) -> int:
    """Driver-side twin of :func:`md5_int` (same value, plain Python)."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:nhex], 16)


def det_components_py(text: str, dim: int, salt: str = "") -> list[float]:
    """Driver-side twin of :func:`hash_components` (RAW, un-normalized
    components): for queries whose oracle compares cosines of the raw
    component vectors, the query literal must live in the same raw
    space — normalizing first would change the floating-point result
    even though cosine is mathematically scale-invariant."""
    return [md5_int_py(f"{text}:{salt}{j}") / MAX24 * 2.0 - 1.0 for j in range(dim)]


def det_embed_py(text: str, dim: int, salt: str = "") -> list[float]:
    """Driver-side twin of the deterministic embedder
    (operators/embedder.py): used to turn a query *string* into a query
    *vector* that lives in the same hash-projection space as the
    corpus embeddings — bit-identical to the Spark/DuckDB expression.
    """
    comps = det_components_py(text, dim, salt)
    sq = 0.0
    for x in comps:
        sq += x * x
    norm = sq**0.5
    return [x / norm for x in comps]


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


# modulus for the (a*h + b) % p MinHash permutation family: the first
# prime above 2^24, so products a*h stay far inside exact-int64 range.
P_MINHASH = 16_777_259


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) permutation parameters, a odd (invertible
    enough for hashing purposes); identical constants are embedded in
    the DuckDB oracle SQL."""
    return [
        (md5_int_py(f"mh-a:{k}") * 2 + 1, md5_int_py(f"mh-b:{k}"))
        for k in range(num_hashes)
    ]


# ---- polynomial rolling-hash fingerprint constants (Rabin-Karp) ----
# fp(doc) = sum_i (tok_hash_i * B^i) mod M, position-sensitive (unlike
# the MinHash/SimHash *set* fingerprints). Sizing keeps every product
# exactly inside int64 in BOTH engines: tok_hash < 2^20, coef < M <
# 2^31 -> term < 2^51; partial sums of <= MAXPOS terms < 2^41.
ROLLING_B = 1_000_003
ROLLING_M = 2_147_483_647  # 2^31 - 1 (prime)
ROLLING_MAXPOS = 1024      # coefficient table size; positions wrap
ROLLING_TOKMOD = 1_048_576  # 2^20


def rolling_coefs() -> list[int]:
    """B^pos mod M for pos in [0, MAXPOS) — precomputed driver-side so
    neither engine needs modular exponentiation; embedded as an array
    literal in the Spark plan and the oracle SQL alike."""
    out, c = [], 1
    for _ in range(ROLLING_MAXPOS):
        out.append(c)
        c = (c * ROLLING_B) % ROLLING_M
    return out


def element_hashes(elements: Column, hash_fn: str = "md5", nhex: int = 6) -> Column:
    """Hash of each array element — computed ONCE per element; the k
    MinHash variants / SimHash bits derive from this by integer
    arithmetic (the hash is the expensive part at scale).

    hash_fn='md5'     — oracle-parity hash (reproducible in DuckDB);
    ``nhex`` hex chars = 4*nhex bits (6 → 24-bit for MinHash perms,
    12 → 48-bit for wide SimHash fingerprints).
    hash_fn='xxhash64' — native Spark hash, ~5x cheaper; same 24-bit
    range. Use for production-scale dedup where cross-engine
    reproducibility is not required (measured: the md5 dominates
    signature cost at 500k docs).

    The 24-bit fold is a BITMASK of the raw hash's low bits, not
    abs()+modulo (r14, queued r13 nit): ``abs(h) % 2^24`` could never
    actually emit a negative — ``abs(Long.MIN_VALUE)`` overflows to
    itself but 2^24 divides 2^63 so the remainder is exactly 0 — but
    it folds ``h`` and ``-h`` onto the same bucket (halving the
    effective space for sign-symmetric pairs) and burns an abs+mod
    where an AND does. The mask keeps the raw low 24 bits uniform.
    Pin: tests/test_dedup.py::test_element_hashes_xxhash64_is_low_bit_mask.
    """
    if hash_fn == "md5":
        return F.transform(elements, lambda s: md5_int(s, nhex))
    if hash_fn == "xxhash64":
        return F.transform(elements, lambda s: F.xxhash64(s).bitwiseAND(F.lit(0xFFFFFF)))
    raise ValueError(f"unknown hash_fn: {hash_fn}")


def minhash_from_hashes(hashes: Column, num_hashes: int) -> Column:
    """MinHash signature from pre-computed element hashes:
    sig_k = min_h (a_k*h + b_k) mod p.  P[sig_k(A)=sig_k(B)] = Jaccard."""

    def one(a: int, b: int) -> Column:
        return F.array_min(
            F.transform(hashes, lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(P_MINHASH))
        )

    return F.array(*[one(a, b) for a, b in minhash_params(num_hashes)])


def minhash_signature(shingles: Column, num_hashes: int) -> Column:
    """Convenience: hash shingles then build the signature. Prefer
    materializing element_hashes in a column first when the signature
    feeds a self-join (operators/dedup.py does)."""
    return minhash_from_hashes(element_hashes(shingles), num_hashes)


def simhash_from_hashes(hashes: Column, bits: int = 16) -> Column:
    """SimHash from pre-computed element hashes: bit b of the result is
    1 iff sum over elements of ±1 (bit b of the element hash) > 0.
    Bit extraction is shiftright+mask — no re-hashing per bit."""
    def signs(b: int) -> Column:
        # closure keeps the transform lambda unary (a 2-arg lambda
        # would receive the element index as its second argument)
        return F.transform(
            hashes,
            lambda h: F.when(
                F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1)),
        )

    out = F.lit(0).cast("long")
    for b in range(bits):
        bit_sum = F.aggregate(signs(b), F.lit(0), lambda a, x: a + x)
        out = out + F.when(bit_sum > 0, F.lit(2**b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def simhash(tokens: Column, bits: int = 16) -> Column:
    return simhash_from_hashes(element_hashes(tokens), bits)
