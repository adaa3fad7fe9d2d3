"""Scale-exponent measurement for the headline scale-risk operators.

Runs each operator at 1x and Kx (default 10x ~= sf1) of the sf0.1
fixture via deterministic synthetic expansion, and reports the
observed scaling exponent  e = log(t_K / t_1) / log(K)  per operator:
e ~= 1 is linear (the shape survives), e ~= 2 means something went
all-pairs. Writes the JSON report to the path given as argv[2]
(default SCALE_r4.json at the repo root).

Operators (the round-3 verdict's four + incremental dedup):
- minhash_signatures  : explode + one grouped min-agg (docs)
- neardup_groups      : LSH banding + star-contraction CC (fixpoint)
- incremental_dedup   : fixed-size batch broadcast-probed against the
                        Kx corpus signature table (expect e ~= 1:
                        corpus-scan-bound, corpus never shuffles)
- q2_knn_join         : 5-query kNN join over the embeddings corpus
- lsh_similarity_join : MLlib BRP-LSH self-join (candidate generation
                        + exact filter; the q3_ann_lsh_join PRODUCT
                        path — its test-scale exact-verify side is
                        intentionally quadratic and excluded)

Usage: python tools/scale_run.py [K] [out.json]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.io import read_table
from pdf_using_hugging_face_and_vector_database_spark.operators.ann import BrpLshIndex
from pdf_using_hugging_face_and_vector_database_spark.operators.dedup import (
    minhash_signatures_agg,
    neardup_representatives,
)
from pdf_using_hugging_face_and_vector_database_spark.operators.search import knn_join
from pdf_using_hugging_face_and_vector_database_spark.session import get_spark

ANN_JOIN_COS = 0.45  # mirror queries.py


def expanded_docs(spark, sf_dir: str, factor: int):
    """documents x factor; each replica's text gets a distinct suffix
    so replicas are near- (not exact) duplicates — group structure
    stays linear in the corpus (groups of ~factor)."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    return docs.crossJoin(reps).select(
        (F.col("doc_id") * factor + F.col("rep")).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" rep "), F.col("rep").cast("string")).alias(
            "text"
        ),
    )


def expanded_embeddings(spark, sf_dir: str, factor: int):
    """embeddings x factor with deterministic per-(rep, component)
    noise (~0.05 on ~unit vectors): replicas stay near-duplicates of
    their base (cosine >> join threshold) but are distinct vectors, so
    the similarity-join output grows ~linearly with the corpus (pair
    groups of ~factor), not quadratically."""
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    noisy = F.transform(
        "embedding",
        lambda x, i: x.cast("double")
        + ((F.col("rep") * 31 + i) % 11 - 5).cast("double") * 0.01,
    )
    return emb.crossJoin(reps).select(
        (F.col("vec_id") * factor + F.col("rep")).alias("vec_id"),
        noisy.alias("embedding"),
        "label",
    )


def _min_of(n_runs: int, fn) -> float:
    """min-of-N wall time — filters the box's background-load spikes
    (documented +/-2x single-run noise) out of the exponent."""
    best = float("inf")
    for _ in range(n_runs):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 2)


def run_scale(spark, sf_dir: str, factor: int) -> dict:
    import shutil
    import tempfile

    out: dict = {"factor": factor}
    scratch = tempfile.mkdtemp(prefix=f"scale_{factor}x_")
    try:
        # materialize the expanded corpora to parquet first so every
        # timed operator reads real files (same I/O shape as the sf
        # fixtures; expansion cost excluded from the timings)
        docs_path = os.path.join(scratch, "documents.parquet")
        emb_path = os.path.join(scratch, "embeddings.parquet")
        expanded_docs(spark, sf_dir, factor).write.mode("overwrite").parquet(
            docs_path
        )
        expanded_embeddings(spark, sf_dir, factor).write.mode(
            "overwrite"
        ).parquet(emb_path)
        docs = spark.read.parquet(docs_path)
        emb = spark.read.parquet(emb_path)
        out["n_docs"] = docs.count()
        out["n_vecs"] = emb.count()

        out["minhash_signatures_sec"] = _min_of(
            2,
            lambda: minhash_signatures_agg(
                docs, num_hashes=16, ngram=3, shingle="word", hash_fn="xxhash64"
            )
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        sigs = minhash_signatures_agg(
            docs, num_hashes=16, ngram=3, shingle="word", hash_fn="xxhash64"
        ).persist()
        out["minhash_docs"] = sigs.count()

        groups: dict = {}

        def _run_groups():
            reps = neardup_representatives(sigs, num_hashes=16, bands=4)
            groups["n"] = reps.select("group_rep").distinct().count()

        out["neardup_groups_sec"] = _min_of(2, _run_groups)
        out["neardup_groups"] = groups["n"]

        # incremental dedup: a FIXED-size daily batch probed against
        # the Kx corpus signature table. Expect exponent ~1 (the cost
        # is the corpus-side signature scan + map-side broadcast
        # probe; the corpus never shuffles — plan-asserted in tests).
        # The corpus sigs are read from PARQUET, not the in-memory
        # persist above — the production probe pays the store scan.
        from pdf_using_hugging_face_and_vector_database_spark.operators.dedup import (
            incremental_candidate_pairs,
        )

        sig_store = os.path.join(scratch, "sigs.parquet")
        sigs.write.mode("overwrite").parquet(sig_store)
        sigs_pq = spark.read.parquet(sig_store)

        batch = (
            read_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .filter(F.col("doc_id") % 10 == 0)
            .select(
                (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
                F.substring(F.col("text"), 1, F.length("text") - F.lit(10)).alias(
                    "text"
                ),
            )
        )
        batch_sigs = minhash_signatures_agg(
            batch, num_hashes=16, ngram=3, shingle="word", hash_fn="xxhash64"
        ).persist()
        out["incremental_batch_docs"] = batch_sigs.count()
        inc: dict = {}

        def _run_incremental():
            inc["n"] = (
                incremental_candidate_pairs(
                    sigs_pq, batch_sigs, num_hashes=16, bands=4
                )
                .filter(F.col("jaccard_est") >= 0.5)
                .count()
            )

        out["incremental_dedup_sec"] = _min_of(2, _run_incremental)
        out["incremental_matches"] = inc["n"]
        batch_sigs.unpersist()
        sigs.unpersist()

        queries = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_embedding"),
        )
        out["q2_knn_join_sec"] = _min_of(
            2,
            lambda: knn_join(queries, emb, k=3)
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )

        pairs: dict = {}

        def _run_lsh():
            # measure the PRODUCT parameterization q3_ann_lsh_join
            # ships (r7: real buckets after the recall-constrained
            # sweep), not a bespoke one — scale evidence must describe
            # the code that runs
            from pdf_using_hugging_face_and_vector_database_spark.queries import (
                ANN_JOIN_BUCKET_LEN,
                ANN_JOIN_TABLES,
            )

            idx = BrpLshIndex(
                bucket_length=ANN_JOIN_BUCKET_LEN,
                num_hash_tables=ANN_JOIN_TABLES,
            ).fit(emb)
            pairs["n"] = idx.similarity_self_join(
                max_cos_dist=1.0 - ANN_JOIN_COS
            ).count()

        out["lsh_similarity_join_sec"] = _min_of(2, _run_lsh)
        out["lsh_join_pairs"] = pairs["n"]
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return out


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALE_r4.json",
        )
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale_run")
    spark.sparkContext.setLogLevel("ERROR")
    # warm JVM codegen + the Python worker daemon (pandas/pyarrow
    # import) so the 1x timings measure plans, not interpreter startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.createDataFrame([(0, 1.0)], "k long, v double").groupBy(
        "k"
    ).applyInPandas(lambda p: p, "k long, v double").write.mode(
        "overwrite"
    ).format("noop").save()
    base = run_scale(spark, sf_dir, 1)
    big = run_scale(spark, sf_dir, factor)
    exponents = {}
    for key in (
        "minhash_signatures_sec",
        "neardup_groups_sec",
        "incremental_dedup_sec",
        "q2_knn_join_sec",
        "lsh_similarity_join_sec",
    ):
        t1, tk = max(base[key], 0.05), max(big[key], 0.05)
        exponents[key.replace("_sec", "")] = round(
            math.log(tk / t1) / math.log(factor), 3
        )
    report = {
        "sf_dir": sf_dir,
        "expansion_factor": factor,
        "base": base,
        "expanded": big,
        "scaling_exponent": exponents,
        "note": (
            "exponent = log(t_Kx/t_1x)/log(K); ~1.0 linear, ~2.0 "
            "quadratic. Sub-linear values mean fixed per-job overhead "
            "still dominates at 1x. Box has background load; single "
            "runs carry +/-2x per-operator noise."
        ),
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["scaling_exponent"]))
    spark.stop()


if __name__ == "__main__":
    main()
