"""Min-of-N cold timing probe for a subset of registered queries at an
arbitrary sf dir — the bench.py measurement discipline (release_caches +
clearCache outside the timed window, cold plans) without the full-suite
sweep. Usage:

    python tools/time_queries.py [--sf DIR] [--n N] name [name ...]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import run_to_completion  # noqa: E402
from pdf_using_hugging_face_and_vector_database_spark.caching import (  # noqa: E402
    release_caches,
)
from pdf_using_hugging_face_and_vector_database_spark.queries import QUERIES  # noqa: E402
from pdf_using_hugging_face_and_vector_database_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    # fail fast on unregistered names BEFORE the JVM spins up (r14
    # wave 7, the compare_oracle unknown-name precedent): a typo'd
    # adjudication probe previously timed every name before it and
    # then died mid-run on a KeyError
    unknown = set(args.names) - set(QUERIES)
    if unknown:
        # stderr (r15 ADVICE): stdout carries the timing lines scripted
        # consumers parse, and is often redirected to a receipt file —
        # the error must stay visible and out of the data stream
        print(
            f"ERROR: unknown query name(s): {sorted(unknown)}",
            file=sys.stderr,
        )
        sys.exit(2)
    spark = get_spark(app_name="time_queries")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    run_to_completion(QUERIES["q5_fetch_by_ids"](spark, args.sf))
    spark.createDataFrame([(0, 1.0)], "k long, v double").groupBy("k").applyInPandas(
        lambda p: p, "k long, v double"
    ).write.mode("overwrite").format("noop").save()
    for name in args.names:
        runs = []
        for _ in range(args.n):
            release_caches()
            spark.catalog.clearCache()
            t0 = time.time()
            run_to_completion(QUERIES[name](spark, args.sf))
            runs.append(round(time.time() - t0, 3))
        print(f"{name}: min={min(runs)} runs={runs}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
