"""Scale exponent for semantic_dedup (changed round 6: constant plane
weights + persisted bucketed corpus): 10x-expanded embeddings scratch
fixture, identical code path, min-of-2, exponent = log-ratio. The
bucket-bounded pairs kernel should stay near-linear: bucket count is
fixed (2^planes), so per-bucket population grows linearly and the
chunked kernel's work grows ~quadratically per bucket but the
threshold filter keeps outputs bounded — read the exponent together
with the pair count.

Usage: python tools/scale_run_e.py [K] [out.json]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_using_hugging_face_and_vector_database_spark.caching import release_caches
from pdf_using_hugging_face_and_vector_database_spark.queries import QUERIES
from pdf_using_hugging_face_and_vector_database_spark.session import get_spark
from tools.scale_run import _min_of
from tools.scale_run_d import expanded_embeddings_full


def run(spark, sf_dir: str, factor: int) -> dict:
    out = {"factor": factor}
    scratch = tempfile.mkdtemp(prefix=f"scale_e_{factor}x_")
    try:
        expanded_embeddings_full(spark, sf_dir, factor).write.mode(
            "overwrite"
        ).parquet(os.path.join(scratch, "embeddings.parquet"))
        out["n_vecs"] = spark.read.parquet(
            os.path.join(scratch, "embeddings.parquet")
        ).count()

        def _run():
            release_caches()
            QUERIES["semantic_dedup"](spark, scratch).write.mode(
                "overwrite"
            ).format("noop").save()

        out["semantic_dedup_sec"] = _min_of(2, _run)
        out["n_dropped"] = (
            QUERIES["semantic_dedup"](spark, scratch)
            .filter("is_dropped")
            .count()
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
        import glob

        from pdf_using_hugging_face_and_vector_database_spark.operators.ann import (
            INDEX_ROOT,
            dataset_dir_key,
        )

        for p in glob.glob(
            os.path.join(INDEX_ROOT, f"*_{dataset_dir_key(scratch)}")
        ):
            shutil.rmtree(p, ignore_errors=True)
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SCALE_r6_semdedup.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale_run_e")
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
            "semantic_dedup": round(
                math.log(rk["semantic_dedup_sec"] / r1["semantic_dedup_sec"])
                / math.log(factor),
                2,
            )
        },
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
