"""50x scale point for the two OUTPUT-BOUND joins (r7 verdict item 6):

- neardup_ppjoin's kernel (word_gram_sets -> set_similarity_join):
  suffix-replica expansion makes every base doc's K replicas mutual
  near-dups, so the verified OUTPUT grows ~K^2 by design — the test
  is whether TIME stays proportional to output (sec/pair flat or
  falling as K grows = output-bound optimum) or a kernel term emerges
  (sec/pair rising = something super-linear in the input sneaked in).
- the MLlib BRP-LSH self-join at q3_ann_lsh_join's SHIPPED
  parameterization (bucket_length / tables / cosine floor imported
  from queries.py, never hardcoded): same output-bound shape via the
  noisy-replica embedding expansion.

Both records carry pair counts at 1x and Kx so the sec/pair ratio is
computable from the JSON alone; the 10x/20x history lives in
SCALE_r7_ppjoin*.json and SCALE_r4*.json (indexed in SCALE.md).

Usage: python tools/scale_run_h.py [K] [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_using_hugging_face_and_vector_database_spark.caching import release_caches
from pdf_using_hugging_face_and_vector_database_spark.operators.ann import BrpLshIndex
from pdf_using_hugging_face_and_vector_database_spark.operators.setjoin import (
    set_similarity_join,
    word_gram_sets,
)
from pdf_using_hugging_face_and_vector_database_spark.queries import (
    ANN_JOIN_BUCKET_LEN,
    ANN_JOIN_COS,
    ANN_JOIN_TABLES,
    PPJOIN_THRESHOLD,
    WORD_NGRAM,
)
from pdf_using_hugging_face_and_vector_database_spark.session import get_spark
from tools.scale_run import _min_of, expanded_docs, expanded_embeddings


def run(spark, sf_dir: str, factor: int) -> dict:
    out: dict = {"factor": factor}
    scratch = tempfile.mkdtemp(prefix=f"scaleh_{factor}x_")
    try:
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

        n_pairs: dict = {}

        def _ppjoin():
            release_caches()
            gsets = word_gram_sets(docs, WORD_NGRAM)
            n_pairs["pp"] = set_similarity_join(gsets, PPJOIN_THRESHOLD).count()

        out["ppjoin_sec"] = _min_of(2, _ppjoin)
        out["ppjoin_pairs"] = n_pairs["pp"]
        out["ppjoin_usec_per_pair"] = round(
            1e6 * out["ppjoin_sec"] / max(out["ppjoin_pairs"], 1), 2
        )

        def _lsh():
            release_caches()
            idx = BrpLshIndex(
                bucket_length=ANN_JOIN_BUCKET_LEN,
                num_hash_tables=ANN_JOIN_TABLES,
            ).fit(emb)
            n_pairs["lsh"] = idx.similarity_self_join(
                max_cos_dist=1.0 - ANN_JOIN_COS
            ).count()

        out["lsh_join_sec"] = _min_of(2, _lsh)
        out["lsh_join_pairs"] = n_pairs["lsh"]
        out["lsh_usec_per_pair"] = round(
            1e6 * out["lsh_join_sec"] / max(out["lsh_join_pairs"], 1), 2
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return out


def main() -> None:
    import math

    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    if factor < 2:
        sys.exit("factor must be >= 2 (exponent divides by log(factor))")
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SCALE_r8_50x.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale_run_h")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    r1 = run(spark, sf_dir, 1)
    rk = run(spark, sf_dir, factor)
    result = {
        "sf_dir": sf_dir,
        "base": r1,
        "expanded": rk,
        "exponents": {
            k.removesuffix("_sec"): round(
                math.log(rk[k] / r1[k]) / math.log(factor), 2
            )
            for k in ("ppjoin_sec", "lsh_join_sec")
        },
        "note": (
            "output-bound joins: read the exponent TOGETHER with the "
            "pair counts — usec_per_pair flat/falling at Kx means time "
            "tracks output (fine); rising means a kernel term emerged"
        ),
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
