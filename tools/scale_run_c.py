"""Scale exponents for the post-sweep round-4 additions (companion to
scale_run.py / scale_run_b.py):

- neardup_ppjoin's kernel (word_gram_sets -> set_similarity_join):
  candidate generation is prefix-bucketed; the synthetic expansion
  makes every base doc's K replicas mutual near-dups, so the OUTPUT
  grows ~K^2 per base group exactly like the LSH similarity join did
  at 20x (time ∝ output is the output-bound optimum — read the
  exponent together with the pair count).
- pagerank over a K-replicated purchase graph (K disjoint copies,
  rep-shifted node ids): nodes, edges, and per-round shuffle all grow
  linearly; expect e ~= 1.

Usage: python tools/scale_run_c.py [K] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.caching import release_caches
from pdf_using_hugging_face_and_vector_database_spark.io import read_table
from pdf_using_hugging_face_and_vector_database_spark.operators.graph import pagerank
from pdf_using_hugging_face_and_vector_database_spark.operators.setjoin import (
    set_similarity_join,
    word_gram_sets,
)
from pdf_using_hugging_face_and_vector_database_spark.session import get_spark
from tools.scale_run import _min_of, expanded_docs


def expanded_edges(spark, sf_dir: str, factor: int):
    """customer↔supplier purchase edges x factor: rep-shifted node ids
    give K disjoint copies of the base graph (structure preserved,
    size linear)."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    ipairs = (
        li.join(
            F.broadcast(orders.select("o_orderkey", "o_custkey")),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    shifted = ipairs.crossJoin(reps).select(
        F.concat(
            F.lit("c"), (F.col("o_custkey") * factor + F.col("rep"))
        ).alias("src"),
        F.concat(
            F.lit("s"), (F.col("l_suppkey") * factor + F.col("rep"))
        ).alias("dst"),
    )
    return shifted.union(
        shifted.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def run(spark, sf_dir: str, factor: int) -> dict:
    import shutil
    import tempfile

    out: dict = {"factor": factor}
    scratch = tempfile.mkdtemp(prefix=f"scalec_{factor}x_")
    try:
        docs_path = os.path.join(scratch, "documents.parquet")
        expanded_docs(spark, sf_dir, factor).write.mode("overwrite").parquet(
            docs_path
        )
        docs = spark.read.parquet(docs_path)
        out["n_docs"] = docs.count()

        pair_count = {}

        def _ppjoin():
            release_caches()
            gsets = word_gram_sets(docs, 3)
            pair_count["n"] = set_similarity_join(gsets, 0.6).count()

        out["ppjoin_sec"] = _min_of(2, _ppjoin)
        out["ppjoin_pairs"] = pair_count["n"]

        edges_path = os.path.join(scratch, "edges.parquet")
        expanded_edges(spark, sf_dir, factor).write.mode("overwrite").parquet(
            edges_path
        )
        edges = spark.read.parquet(edges_path)
        out["n_edges"] = edges.count()

        def _pr():
            release_caches()
            pagerank(edges, n_iters=5).write.mode("overwrite").format(
                "noop"
            ).save()

        out["pagerank_sec"] = _min_of(2, _pr)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return out


def main() -> None:
    import math

    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SCALE_r4c.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale_run_c")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.createDataFrame([(0, 1.0)], "k long, v double").groupBy(
        "k"
    ).applyInPandas(lambda p: p, "k long, v double").write.mode(
        "overwrite"
    ).format("noop").save()

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
            for k in ("ppjoin_sec", "pagerank_sec")
        },
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
