"""Scale exponents for the CURATION + text-analysis + index-build
family (round 7): 10x scratch fixtures, identical code paths,
exponent = log-ratio. These are the remaining headline operators with
no SCALE_* entry: the curation trio (pii_scrub, contamination_check,
pack_sequences), the banded SimHash join, the broadcast-df tf-idf,
the IVF index BUILD, and the Misra-Gries heavy hitters.

Design claims under test (each query's docstring):
- pii_scrub: one regex-codegen projection pass — linear in bytes.
- contamination_check: corpus scan joined against a BROADCAST bench
  13-gram table — linear in corpus, constant in bench.
- pack_sequences: hash-binned greedy packing (no global window) —
  linear in docs.
- neardup_simhash: banded Hamming equi-join; translated replicas
  (see below) keep match output linear in the factor, so the
  exponent measures the join, not output growth.
- tfidf_top_terms: tf over the corpus + BROADCAST document-frequency
  join, fixed top-k output.
- q3_ann_build: 2 Lloyd passes + partitioned write — linear in
  vectors at fixed n_cells/iters (index roots removed before every
  timed run, so the BUILD is what's timed).
- heavy_hitters_events: O(k)-memory partition summaries + merge —
  linear in rows at fixed k; replicas reuse the key distribution so
  the output set is constant (operator growth, not output growth).

Replica texts get a per-rep character TRANSLATION (same rationale as
tools/scale_run_f.py): suffixed copies would be near-dups of each
other and make the SimHash join's output quadratic in the factor.
Embeddings get a per-rep cyclic ROTATION of the vector (norm- and
distribution-preserving, cluster-layout-perturbing); events are
replicated with rekeyed event_id (same event_type/user distribution).

Usage: python tools/scale_run_g.py [K] [out.json]
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
from pdf_using_hugging_face_and_vector_database_spark.queries import EMBED_DIM, QUERIES
from pdf_using_hugging_face_and_vector_database_spark.session import get_spark
from tools.scale_run import _min_of
from tools.scale_run_f import _rep_translated_docs

TIMED = (
    ("pii_scrub", "pii_scrub_sec"),
    ("contamination_check", "contamination_sec"),
    ("pack_sequences", "pack_sequences_sec"),
    ("neardup_simhash", "simhash_sec"),
    ("tfidf_top_terms", "tfidf_sec"),
    ("q3_ann_build", "ann_build_sec"),
    ("heavy_hitters_events", "heavy_hitters_sec"),
)


def _rep_rotated_embeddings(spark, sf_dir: str, factor: int):
    """embeddings x factor: rep r cyclically rotates the vector by r
    positions (rep 0 = identity) and rekeys vec_id. Rotation keeps
    norms and the coordinate distribution bit-exact while moving the
    points, so k-means sees a genuinely larger corpus, not factor
    coincident copies."""
    emb = read_table(spark, sf_dir, "embeddings")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    vec = F.col("embedding")
    out_vec = vec
    for r in range(1, factor):
        rot = F.concat(
            F.slice(vec, r + 1, EMBED_DIM - r), F.slice(vec, 1, r)
        )
        out_vec = F.when(F.col("rep") == r, rot).otherwise(out_vec)
    return emb.crossJoin(reps).select(
        (F.col("vec_id") * factor + F.col("rep")).alias("vec_id"),
        out_vec.alias("embedding"),
        "label",
    )


def _rep_events(spark, sf_dir: str, factor: int):
    """events x factor with rekeyed event_id; ts/user/type/value kept,
    so the heavy-hitter key distribution (and thus the output set) is
    factor-invariant."""
    ev = read_table(spark, sf_dir, "events")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    others = [c for c in ev.columns if c != "event_id"]
    return ev.crossJoin(reps).select(
        (F.col("event_id") * factor + F.col("rep")).alias("event_id"),
        *others,
    )


def _rm_fixture_roots(scratch: str) -> None:
    key = dataset_dir_key(scratch)
    for d in glob.glob(os.path.join(INDEX_ROOT, f"*{key}*")):
        shutil.rmtree(d, ignore_errors=True)


def run(spark, sf_dir: str, factor: int) -> dict:
    out: dict = {"factor": factor}
    scratch = tempfile.mkdtemp(prefix=f"scale_g_{factor}x_")
    try:
        _rep_translated_docs(spark, sf_dir, factor).write.mode(
            "overwrite"
        ).parquet(os.path.join(scratch, "documents.parquet"))
        _rep_rotated_embeddings(spark, sf_dir, factor).write.mode(
            "overwrite"
        ).parquet(os.path.join(scratch, "embeddings.parquet"))
        _rep_events(spark, sf_dir, factor).write.mode("overwrite").parquet(
            os.path.join(scratch, "events.parquet")
        )
        out["n_docs"] = read_table(spark, scratch, "documents").count()
        out["n_vecs"] = read_table(spark, scratch, "embeddings").count()
        out["n_events"] = read_table(spark, scratch, "events").count()

        # sanity: the SimHash join must see matches at both factors,
        # and its match count must stay ~linear (translated replicas);
        # a superlinear count means the fixture is measuring output
        # growth and the exponent would be meaningless
        out["simhash_pairs"] = QUERIES["neardup_simhash"](spark, scratch).count()
        if out["simhash_pairs"] == 0:
            raise RuntimeError("simhash join saw no pairs — fixture broken")

        for qname, key in TIMED:

            def _one(qname=qname):
                release_caches()
                if qname == "q3_ann_build":
                    _rm_fixture_roots(scratch)  # time the BUILD, cold
                QUERIES[qname](spark, scratch).write.mode("overwrite").format(
                    "noop"
                ).save()

            _one()  # untimed warm-up: JIT + store builds off the clock
            out[key] = _min_of(2, _one)
    finally:
        _rm_fixture_roots(scratch)
        shutil.rmtree(scratch, ignore_errors=True)
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SCALE_r7_curation.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale_g")
    t0 = time.time()
    base = run(spark, sf_dir, 1)
    expanded = run(spark, sf_dir, factor)
    exps = {
        name: round(math.log(expanded[key] / base[key]) / math.log(factor), 2)
        for name, key in TIMED
    }
    payload = {
        "sf_dir": sf_dir,
        "timed_region_note": (
            "query build + noop-sink write, min-of-2; release_caches "
            "runs in each timed run's preamble (millisecond bookkeeping, "
            "uniform across factors — r14 wave-7 correction: this note "
            "previously claimed it ran outside the window); q3_ann_build "
            "removes the index roots before every timed run so the cold "
            "BUILD is measured; one untimed warm-up per query pays JIT + "
            "store builds"
        ),
        "pair_growth_note": (
            "simhash_pairs must grow ~linearly (translated replicas); "
            "recorded at both factors for the reader to verify"
        ),
        "base": base,
        "expanded": expanded,
        "exponents": exps,
        "wall_sec": round(time.time() - t0, 1),
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"exponents": exps}))


if __name__ == "__main__":
    main()
