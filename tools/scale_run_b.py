"""Scale exponents for the late-round-4 operator families (companion
to scale_run.py, which covers the dedup/ANN headline risks):

- dsir_weights   : explode + bucket agg + broadcast stats join +
                   per-doc agg (expect e ~= 1, scan-bound)
- bpe_merges     : corpus scan -> word histogram, then K
                   histogram-scale rounds (expect e < 1: the
                   histogram is vocabulary-sized and the fixture
                   vocabulary is CONSTANT under expansion, so only
                   the initial scan scales)
- events_gapfill-style window fill over an expanded per-type series
                   (expect e ~= 1: one grid join + one running
                   window over bounded partitions)

Usage: python tools/scale_run_b.py [K] [out.json]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.operators.curation import (
    dsir_weights,
)
from pdf_using_hugging_face_and_vector_database_spark.operators.text_analysis import (
    bpe_merge_table,
)
from pdf_using_hugging_face_and_vector_database_spark.session import get_spark
from tools.scale_run import _min_of, expanded_docs


def run(spark, sf_dir: str, factor: int) -> dict:
    import shutil
    import tempfile

    out: dict = {"factor": factor}
    scratch = tempfile.mkdtemp(prefix=f"scaleb_{factor}x_")
    try:
        docs_path = os.path.join(scratch, "documents.parquet")
        expanded_docs(spark, sf_dir, factor).write.mode("overwrite").parquet(
            docs_path
        )
        docs = spark.read.parquet(docs_path)
        out["n_docs"] = docs.count()

        out["dsir_weights_sec"] = _min_of(
            2,
            lambda: dsir_weights(docs, F.col("doc_id") % 20 == 0)
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )

        def _bpe():
            from pdf_using_hugging_face_and_vector_database_spark.caching import (
                release_caches,
            )

            release_caches()
            bpe_merge_table(docs, n_merges=3).collect()

        out["bpe_merges_sec"] = _min_of(2, _bpe)

        # gap-fill shape over an expanded series: bin to a fixed
        # bucket grid per (doc_id % 5) "type" and forward-fill — the
        # window partitions stay bounded (grid x types)
        def _fill():
            binned = docs.groupBy(
                (F.col("doc_id") % 5).alias("t"),
                (F.col("doc_id") % 10080).alias("minute"),
            ).agg(F.count(F.lit(1)).alias("n"))
            grid = (
                docs.select((F.col("doc_id") % 5).alias("t"))
                .distinct()
                .crossJoin(
                    spark.range(10080).select(F.col("id").alias("minute"))
                )
            )
            from pyspark.sql import Window

            w = (
                Window.partitionBy("t")
                .orderBy("minute")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            (
                grid.join(binned, ["t", "minute"], "left")
                .select(
                    "t",
                    "minute",
                    F.last("n", ignorenulls=True).over(w).alias("filled"),
                )
                .write.mode("overwrite")
                .format("noop")
                .save()
            )

        out["gapfill_sec"] = _min_of(2, _fill)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SCALE_r4b.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale_b")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.createDataFrame([(0, 1.0)], "k long, v double").groupBy("k").applyInPandas(
        lambda p: p, "k long, v double"
    ).write.mode("overwrite").format("noop").save()

    r1 = run(spark, sf_dir, 1)
    rk = run(spark, sf_dir, factor)
    report = {"sf_dir": sf_dir, "runs": [r1, rk], "exponents": {}}
    for key in ("dsir_weights_sec", "bpe_merges_sec", "gapfill_sec"):
        t1, tk = r1[key], rk[key]
        if t1 > 0 and tk > 0:
            report["exponents"][key.removesuffix("_sec")] = round(
                math.log(tk / t1) / math.log(factor), 2
            )
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
