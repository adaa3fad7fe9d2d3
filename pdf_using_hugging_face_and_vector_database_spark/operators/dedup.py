"""Deduplication operator family (BASELINE.json north star: the
LLM-training-data-pipeline ops the reference's corpus ingest implies).

All variants are built from relational primitives + the deterministic
md5 hashing in functions/hashing.py, so each is oracle-checkable and
shuffle-efficient:

- exact:     one groupBy on a 256-bit content hash (map-side partial
             agg; the only shuffle is on the hash key, which is
             uniformly distributed — no skew by construction).
- MinHash:   shingle -> signature -> band -> bucket self-join. The
             self-join is on (band_index, band_hash) — candidate pairs
             only, never the O(n^2) cross product.
- SimHash:   16/32-bit sign fingerprint; near-dups = equal fingerprint
             (or small Hamming distance at the call site).
- n-gram Jaccard: verification metric on candidate pairs.
- embedding: cosine >= threshold within a blocking key (exact variant;
             the unblocked scale path is LSH, operators/ann.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import (
    element_hashes,
    md5_int,
    minhash_from_hashes,
    simhash_from_hashes,
)
from ..functions.text import char_ngrams, tokens
from ..functions.vector import dot, l2_norm


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup by content hash: one survivor (min id) per distinct
    text; ``dup_count`` reports group size. Equivalent to the
    reference's upsert-by-id last-writer-wins collapse
    (`streamlit_app.py:102,110`) but keyed on content, not position.
    """
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("content_hash"))
        .agg(
            F.min(id_col).alias("kept_" + id_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def with_minhash(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 16,
    ngram: int = 4,
    out_col: str = "minhash",
) -> DataFrame:
    """Append a MinHash signature (array<long>) over character
    ``ngram``-shingles of the text.

    Two-step: the per-shingle md5 hashes land in a temp column first so
    each shingle is hashed ONCE; the k permutations are then integer
    arithmetic over that array (the md5 dominates cost at scale)."""
    tmp = f"__{out_col}_hs"
    return (
        df.withColumn(tmp, element_hashes(char_ngrams(F.col(text_col), ngram)))
        .withColumn(out_col, minhash_from_hashes(F.col(tmp), num_hashes))
        .drop(tmp)
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` rows, self-join
    on (band_index, band signature) to get candidate pairs (a < b),
    then report the MinHash Jaccard estimate (= fraction of equal
    signature components — exact integer arithmetic, so the DuckDB
    oracle matches bit-for-bit).

    Scale shape: explode(bands) -> shuffle on band hash -> join. Bucket
    sizes are data-dependent; AQE skew-join splits hot buckets.
    """
    rows_per_band = num_hashes // bands
    # persist: the self-join would otherwise recompute the signature
    # derivation (shingling + hashing) for BOTH sides of the join — at
    # scale you persist the signature table anyway (it is the index)
    df = df.persist()
    banded = df.select(
        F.col(id_col),
        F.col(sig_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.slice(sig_col, b * F.lit(rows_per_band) + F.lit(1), rows_per_band),
            )
        ).alias("band_index", "band_sig"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band_index") == F.col("r.band_index"))
            & (F.col("l.band_sig") == F.col("r.band_sig"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col(f"l.{sig_col}").alias("sig_a"),
            F.col(f"r.{sig_col}").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda eq: eq,
        )
    ).cast("double") / F.lit(float(num_hashes))
    out = pairs.select("id_a", "id_b", est.alias("jaccard_est"))
    # note: the persisted signature table stays cached for reuse across
    # queries in a session; call .unpersist() on the input to reclaim
    return out


def with_simhash(
    df: DataFrame,
    text_col: str = "text",
    bits: int = 16,
    out_col: str = "simhash",
) -> DataFrame:
    """Append a SimHash fingerprint (long) over whitespace tokens
    (token hashes materialized once; bits derived by shift+mask)."""
    tmp = f"__{out_col}_hs"
    return (
        df.withColumn(tmp, element_hashes(tokens(F.col(text_col))))
        .withColumn(out_col, simhash_from_hashes(F.col(tmp), bits))
        .drop(tmp)
    )


def ngram_jaccard(a: Column, b: Column, n: int = 4) -> Column:
    """Exact set-Jaccard of character n-grams (verification metric for
    candidate pairs; array_intersect/union are distinct-set semantics).
    """
    ga, gb = char_ngrams(a, n), char_ngrams(b, n)
    inter = F.size(F.array_intersect(ga, gb)).cast("double")
    union = F.size(F.array_union(ga, gb)).cast("double")
    return inter / union


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (a < b) with cosine >= threshold.

    ``block_col`` bounds the self-join to same-block pairs — at 100 TB
    you never run the unblocked O(n^2); use LSH buckets (operators/ann)
    or a semantic blocking key as here.
    """
    import numpy as np
    import pandas as pd

    if block_col is None:
        # unblocked exact pairing: single group (never do this at scale)
        df = df.withColumn("__blk", F.lit(0))
        block_col = "__blk"

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        # dense matmul per block — the FAISS-shaped inner loop; Arrow
        # hands us the block columnar, numpy does pairs*dim flops
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine_sim": []})
        mat = np.array(pdf[vec_col].tolist(), dtype="float64")
        norms = np.linalg.norm(mat, axis=1)
        sims = (mat @ mat.T) / np.outer(norms, norms)
        ia, ib = np.triu_indices(len(ids), 1)
        return pd.DataFrame(
            {"id_a": ids[ia], "id_b": ids[ib], "cosine_sim": sims[ia, ib]}
        )

    pairs = df.select(id_col, vec_col, block_col).groupBy(block_col).applyInPandas(
        block_pairs, "id_a long, id_b long, cosine_sim double"
    )
    # round JVM-side (BigDecimal HALF_UP — matches the oracle's round)
    return pairs.select(
        "id_a", "id_b", F.round("cosine_sim", 6).alias("cosine_sim")
    ).filter(F.col("cosine_sim") >= threshold)
