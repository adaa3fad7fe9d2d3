"""Scale exponents for the STREAMING family (r6 verdict item 5): 10x
scratch fixtures, identical code paths, exponent = log-ratio — the
one operator family with no SCALE_* entry until round 7.

Design claims under test (each query's docstring):
- stream_dedup_incremental: stream-static band join, stateless end to
  end, linear in batch size (the static corpus signature store is
  pre-built OUTSIDE the timed window at both factors — the build/probe
  split is the design; what's timed is the stream run + verdict agg).
- stream_upsert_store: foreachBatch LWW merge, linear in batch bytes.
- stream_mv_refresh: foreachBatch transactional additive fold into a
  month-scale MV; micro-batch COUNT is fixed (4), batch SIZE grows
  10x, so the fold must stay linear. For these two the fixture roots
  are deleted before every timed run (fingerprint-fresh runs reuse
  the finished store by design, which would otherwise time a parquet
  read); the timed region therefore includes the linear landing-file
  write + the stream itself.

Replica texts get a per-rep character TRANSLATION (not a suffix):
suffixed replicas of one doc are char-7-gram near-dups of EACH OTHER,
which would make the dedup stream's match output quadratic in the
factor and measure output growth, not operator growth. Translated
replicas keep intra-family jaccard low, so matches stay 1:1
(batch doc -> its own corpus replica) and the exponent measures the
join. rep 0 is the identity mapping, so factor=1 is byte-identical
to the base fixture modulo the scratch path.

Usage: python tools/scale_run_f.py [K] [out.json]
"""

from __future__ import annotations

import glob
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.caching import release_caches
from pdf_using_hugging_face_and_vector_database_spark.io import read_table
from pdf_using_hugging_face_and_vector_database_spark.operators.ann import (
    INDEX_ROOT,
    dataset_dir_key,
)
from pdf_using_hugging_face_and_vector_database_spark.queries import QUERIES
from pdf_using_hugging_face_and_vector_database_spark.session import get_spark
from tools.scale_run import _min_of

_ALPHA = "etaoinshr"  # high-frequency letters: translation perturbs most grams
# second, disjoint high-frequency alphabet: composing two independent
# rotations gives 9*9 = 81 DISTINCT translations (r14 review wave 7:
# a single 9-letter rotation repeats every 9 reps, so rep 9/18/27 got
# the IDENTITY map — at the shipped factors 10/20/50 whole replica
# families were byte-identical to rep 0, the exact-duplicate blow-up
# the translation scheme exists to prevent; the dedup/simhash match
# counts inflated superlinearly and partly measured the replica
# scheme. Pin: tests/test_scale_tools.py)
_ALPHA2 = "ldcumwfgp"


def _rep_translated_docs(spark, sf_dir: str, factor: int):
    """documents x factor with per-rep character translation (rep 0 =
    identity) and rekeyed doc_id = doc_id * factor + rep. The per-rep
    map composes a rotation of _ALPHA (r mod 9) with a rotation of the
    disjoint _ALPHA2 (r div 9): every rep in [0, 81) gets a distinct
    translation and only rep 0 is the identity."""
    if factor > len(_ALPHA) * len(_ALPHA2):
        raise ValueError(
            f"factor {factor} exceeds the {len(_ALPHA) * len(_ALPHA2)} "
            "distinct per-rep translations — replicas would collide"
        )
    docs = read_table(spark, sf_dir, "documents")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    text = F.col("text")
    # CASE over the bounded rep domain: translate is JVM-side, rep
    # count is the expansion factor (small), so this stays codegen.
    # rep 0 falls through to the identity text.
    out_text = text
    for r in range(1, factor):
        r1 = r % len(_ALPHA)
        r2 = (r // len(_ALPHA)) % len(_ALPHA2)
        rot1 = _ALPHA[r1:] + _ALPHA[:r1]
        rot2 = _ALPHA2[r2:] + _ALPHA2[:r2]
        out_text = F.when(
            F.col("rep") == r,
            F.translate(F.translate(text, _ALPHA, rot1), _ALPHA2, rot2),
        ).otherwise(out_text)
    return docs.crossJoin(reps).select(
        (F.col("doc_id") * factor + F.col("rep")).alias("doc_id"),
        out_text.alias("text"),
        "lang",
        "source",
        F.length(out_text).alias("n_chars"),
    )


def _expanded_orders(spark, sf_dir: str, factor: int):
    orders = read_table(spark, sf_dir, "orders")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    others = [c for c in orders.columns if c != "o_orderkey"]
    return orders.crossJoin(reps).select(
        (F.col("o_orderkey") * factor + F.col("rep")).alias("o_orderkey"),
        *others,
    )


def _rm_fixture_roots(scratch: str) -> None:
    key = dataset_dir_key(scratch)
    for d in glob.glob(os.path.join(INDEX_ROOT, f"*{key}*")):
        shutil.rmtree(d, ignore_errors=True)


def _rm_stream_roots(scratch: str) -> None:
    key = dataset_dir_key(scratch)
    for stem in ("upsert_stream", "mv_stream"):
        shutil.rmtree(
            os.path.join(INDEX_ROOT, f"{stem}_{key}"), ignore_errors=True
        )


def run(spark, sf_dir: str, factor: int) -> dict:
    out: dict = {"factor": factor}
    scratch = tempfile.mkdtemp(prefix=f"scale_f_{factor}x_")
    try:
        # documents must land as a single FILE named documents.parquet
        # (matching the driver testdata layout): the dedup stream reads
        # pathGlobFilter="documents.parquet", which matches files, not
        # a directory of part files — a directory fixture streams ZERO
        # rows (caught by the stream_dedup_matches sanity count below)
        tmp = os.path.join(scratch, "_tmp_docs")
        _rep_translated_docs(spark, sf_dir, factor).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.rename(part, os.path.join(scratch, "documents.parquet"))
        shutil.rmtree(tmp)
        _expanded_orders(spark, sf_dir, factor).write.mode(
            "overwrite"
        ).parquet(os.path.join(scratch, "orders.parquet"))
        out["n_docs"] = spark.read.parquet(
            os.path.join(scratch, "documents.parquet")
        ).count()
        out["n_orders"] = spark.read.parquet(
            os.path.join(scratch, "orders.parquet")
        ).count()

        # untimed warm-up run builds the corpus signature store (the
        # build/probe split is the operator's design) + JIT paths
        QUERIES["stream_dedup_incremental"](spark, scratch).write.mode(
            "overwrite"
        ).format("noop").save()

        def _dedup():
            release_caches()
            QUERIES["stream_dedup_incremental"](spark, scratch).write.mode(
                "overwrite"
            ).format("noop").save()

        out["stream_dedup_sec"] = _min_of(2, _dedup)
        out["stream_dedup_matches"] = (
            QUERIES["stream_dedup_incremental"](spark, scratch)
            .filter("is_dup")
            .count()
        )
        if out["stream_dedup_matches"] == 0:
            raise RuntimeError(
                "dedup stream saw no matches — fixture layout broken "
                "(empty stream?); exponent would be meaningless"
            )

        def _upsert():
            release_caches()
            _rm_stream_roots(scratch)
            QUERIES["stream_upsert_store"](spark, scratch).write.mode(
                "overwrite"
            ).format("noop").save()

        out["stream_upsert_sec"] = _min_of(2, _upsert)

        def _mv():
            release_caches()
            _rm_stream_roots(scratch)
            QUERIES["stream_mv_refresh"](spark, scratch).write.mode(
                "overwrite"
            ).format("noop").save()

        out["stream_mv_sec"] = _min_of(2, _mv)
    finally:
        _rm_fixture_roots(scratch)
        shutil.rmtree(scratch, ignore_errors=True)
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SCALE_r7_streaming.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale_f")
    base = run(spark, sf_dir, 1)
    expanded = run(spark, sf_dir, factor)
    exps = {}
    for name, key in (
        ("stream_dedup_incremental", "stream_dedup_sec"),
        ("stream_upsert_store", "stream_upsert_sec"),
        ("stream_mv_refresh", "stream_mv_sec"),
    ):
        exps[name] = round(
            math.log(expanded[key] / base[key]) / math.log(factor), 2
        )
    payload = {
        "sf_dir": sf_dir,
        "timed_region_note": (
            "dedup: stream run + verdict agg, corpus signature store "
            "pre-built untimed (build/probe split); upsert/mv: landing "
            "write + stream run, fixture roots deleted per run so the "
            "stream re-executes"
        ),
        "base": base,
        "expanded": expanded,
        "exponents": exps,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
