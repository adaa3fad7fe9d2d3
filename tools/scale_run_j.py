"""Scale exponents for the STREAM-STREAM interval-join family (first
coverage — r7's streaming rows covered dedup/upsert/mv but not the
interval joins; round 10 added the LEFT OUTER variant, so the currency
rule wants the family pinned).

Replica construction: events xK REKEYED BY USER (scale_run_i's
expanded_events — ``user_id*K + rep``, same timestamps), so the user
population grows xK while per-user density (and thus per-key join
state and match fan-out) stays constant: qualifying pairs and
unmatched clicks both grow ~K by construction (counts recorded), and
the exponent measures the watermarked join's shuffle + state-store
work, not output blow-up.

Timed region: the bounded replay (stream start -> processAllAvailable
-> memory-sink read), i.e. what a micro-batch pass over the same data
costs. The sentinel landing directory for the OUTER variant is built
UNTIMED before the first run (fixture materialization, the r7
"store pre-built untimed" discipline); the INNER variant streams the
fixture dir directly.

Usage: python tools/scale_run_j.py [K] [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_using_hugging_face_and_vector_database_spark.caching import release_caches
from pdf_using_hugging_face_and_vector_database_spark.session import get_spark
from tools.scale_run import _min_of
from tools.scale_run_i import expanded_events


def run(spark, sf_dir: str, factor: int) -> dict:
    from pdf_using_hugging_face_and_vector_database_spark.operators.ann import (
        INDEX_ROOT,
        dataset_dir_key,
    )
    from pdf_using_hugging_face_and_vector_database_spark.queries import QUERIES
    from pdf_using_hugging_face_and_vector_database_spark.streaming.joins import (
        outer_join_landing_dir,
    )

    out: dict = {"factor": factor}
    scratch = tempfile.mkdtemp(prefix=f"scalej_{factor}x_")
    try:
        # the streaming file source's pathGlobFilter matches the
        # fixture's single-FILE shape (events.parquet), so coalesce the
        # Spark-written dataset into one file (untimed fixture prep)
        import glob as _glob

        import pyarrow as pa
        import pyarrow.parquet as pq

        tmp_ds = os.path.join(scratch, "_events_ds")
        expanded_events(spark, sf_dir, factor).write.mode("overwrite").parquet(
            tmp_ds
        )
        # cast to the FIXTURE's arrow schema: Spark 4 writes ts as
        # timestamp[ns], which the session's legacy nanosAsLong flag
        # turns into a physical-INT64-vs-timestamp read error; the
        # fixture shape is timestamp[us]
        fixture_schema = pq.ParquetFile(
            os.path.join(sf_dir, "events.parquet")
        ).schema_arrow.remove_metadata()
        tbl = pa.concat_tables(
            pq.read_table(p)
            for p in sorted(_glob.glob(os.path.join(tmp_ds, "*.parquet")))
        ).cast(fixture_schema)
        pq.write_table(tbl, os.path.join(scratch, "events.parquet"))
        shutil.rmtree(tmp_ds, ignore_errors=True)
        out["n_events"] = spark.read.parquet(
            os.path.join(scratch, "events.parquet")
        ).count()
        # sentinel landing build is untimed fixture materialization
        outer_join_landing_dir(scratch)

        counts: dict = {}

        def _inner():
            release_caches()
            counts["inner"] = QUERIES["stream_clicks_purchases"](
                spark, scratch
            ).count()

        out["stream_inner_sec"] = _min_of(2, _inner)
        out["stream_inner_pairs"] = counts["inner"]

        def _outer():
            release_caches()
            counts["outer"] = QUERIES["stream_outer_interval_join"](
                spark, scratch
            ).count()

        out["stream_outer_sec"] = _min_of(2, _outer)
        out["stream_outer_rows"] = counts["outer"]
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
        # the scratch dataset's landing dir is keyed by the temp path —
        # never reusable once the scratch is gone
        shutil.rmtree(
            os.path.join(
                INDEX_ROOT, f"outer_join_landing_{dataset_dir_key(scratch)}"
            ),
            ignore_errors=True,
        )
    return out


def main() -> None:
    import math

    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    if factor < 2:
        sys.exit("factor must be >= 2 (exponent divides by log(factor))")
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SCALE_r10_streamjoin.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale_run_j")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    r1 = run(spark, sf_dir, 1)
    rk = run(spark, sf_dir, factor)
    result = {
        "sf_dir": sf_dir,
        "timed_region_note": (
            "bounded replay only (stream start -> processAllAvailable -> "
            "memory-sink read); outer sentinel landing pre-built untimed"
        ),
        "base": r1,
        "expanded": rk,
        "exponents": {
            "stream_clicks_purchases": round(
                math.log(rk["stream_inner_sec"] / r1["stream_inner_sec"])
                / math.log(factor),
                2,
            ),
            "stream_outer_interval_join": round(
                math.log(rk["stream_outer_sec"] / r1["stream_outer_sec"])
                / math.log(factor),
                2,
            ),
        },
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
