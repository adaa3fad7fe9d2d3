"""Scale-stress: run the headline operator chains at ~100x the sf0.1
fixture scale (synthetic expansion) and report rows/sec. This is the
local stand-in for the 1000-executor question: do the plan shapes
(shuffle-free ingest, banded LSH, top-k reduce) survive a 100x blowup
in rows, or does something go quadratic / spill / collect.

Usage: python tools/scale_stress.py [expansion_factor]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.functions.hashing import det_embed_py
from pdf_using_hugging_face_and_vector_database_spark.io import read_table
from pdf_using_hugging_face_and_vector_database_spark.operators.chunker import chunk_stride
from pdf_using_hugging_face_and_vector_database_spark.operators.dedup import (
    minhash_candidate_pairs,
    with_minhash,
)
from pdf_using_hugging_face_and_vector_database_spark.operators.embedder import (
    embed_deterministic,
)
from pdf_using_hugging_face_and_vector_database_spark.operators.ids import with_vector_id
from pdf_using_hugging_face_and_vector_database_spark.operators.search import topk_cosine
from pdf_using_hugging_face_and_vector_database_spark.session import get_spark


def expanded_corpus(spark, sf_dir: str, factor: int):
    """documents x factor with per-replica salted text (cheap JVM-side
    mutation so replicas are near- but not exact duplicates)."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    return docs.crossJoin(reps).select(
        (F.col("doc_id") * factor + F.col("rep")).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" rep "), F.col("rep").cast("string")).alias("text"),
        "source",
    )


def timed(label: str, df, n_expected_hint: str = ""):
    t0 = time.time()
    df.write.mode("overwrite").format("noop").save()
    dt = time.time() - t0
    print(f"{label}: {dt:.1f}s {n_expected_hint}")
    return dt


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale_stress")
    corpus = expanded_corpus(spark, sf_dir, factor)
    n = corpus.count()
    print(f"corpus: {n:,} docs (factor {factor})")

    # 1. flagship ingest: chunk -> embed -> id (shuffle-free)
    t0 = time.time()
    chunks = chunk_stride(corpus, chunk_size=500, chunk_overlap=50, keep_cols=("doc_id", "source"))
    vec = with_vector_id(embed_deterministic(chunks, "chunk_text", dim=64))
    timed("ingest chunk+embed64+id", vec)
    n_chunks = chunks.count()
    dt = time.time() - t0
    print(f"  -> {n_chunks:,} chunks, {n_chunks/dt:,.0f} chunks/s end-to-end")

    # 2. build + store the vectors table, then query the STORED table
    # (the realistic Q1: index built once, queried many times)
    import tempfile

    vec_path = os.path.join(tempfile.gettempdir(), "scale_vectors")
    emb = embed_deterministic(
        chunk_stride(corpus, chunk_size=2000, chunk_overlap=0), "chunk_text", dim=64
    ).select(F.col("doc_id").alias("vec_id"), "embedding")
    t0 = time.time()
    emb.write.mode("overwrite").parquet(vec_path)
    print(f"vector index build+write ({n:,} vecs): {time.time()-t0:.1f}s")
    stored = spark.read.parquet(vec_path)
    q = det_embed_py("scale stress query", 64)
    t0 = time.time()
    topk_cosine(stored, q, k=10).write.mode("overwrite").format("noop").save()
    dt = time.time() - t0
    print(f"q1 top-10 over stored {n:,} vectors: {dt:.1f}s ({n/dt:,.0f} vec/s)")

    # 3. MinHash LSH candidate generation (the quadratic-risk op),
    # scale shape: explode + grouped mins, fully codegen'd
    from pdf_using_hugging_face_and_vector_database_spark.operators.dedup import (
        minhash_signatures_agg,
    )

    t0 = time.time()
    sigs = minhash_signatures_agg(
        corpus, num_hashes=16, ngram=3, hash_fn="xxhash64", shingle="word"
    ).persist()
    n_sigs = sigs.count()
    dt_sig = time.time() - t0
    print(f"minhash signatures ({n_sigs:,} docs, word-3, xxhash64): {dt_sig:.1f}s ({n_sigs/dt_sig:,.0f} docs/s)")

    # group representatives: O(n) output (pairwise output is O(group^2)
    # — 60M pairs at this scale; measured before this path existed)
    from pdf_using_hugging_face_and_vector_database_spark.operators.dedup import (
        neardup_representatives,
    )

    t0 = time.time()
    reps = neardup_representatives(sigs, num_hashes=16, bands=4, rounds=2)
    n_groups = reps.select("group_rep").distinct().count()
    dt = time.time() - t0
    print(f"near-dup groups over {n:,} docs: {n_groups:,} groups in {dt:.1f}s")

    spark.stop()


if __name__ == "__main__":
    main()
