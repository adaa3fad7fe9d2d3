"""Load-robust A/B instrument: run queries with Spark event logging on
and report per-run aggregate task metrics (executor CPU time, run time,
shuffle bytes, input bytes, #jobs/#stages/#tasks) parsed from the event
log. CPU time and byte counts are far more stable than wall-clock on a
box with external load waves (the r14/r15 bench saga); wall-clock is
still printed for quiet-window confirmation.

Usage:
    python tools/metrics_probe.py [--sf DIR] [--n N] name [name ...]
"""

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_using_hugging_face_and_vector_database_spark.caching import (  # noqa: E402
    release_caches,
)
from pdf_using_hugging_face_and_vector_database_spark.queries import QUERIES  # noqa: E402

EVDIR = "/tmp/spark-events-probe"


def get_spark_with_eventlog(app_name: str):
    import os as _os

    from pyspark.sql import SparkSession

    cpus = _os.environ.get("SPARK_GRAFT_CPUS", "32")
    shutil.rmtree(EVDIR, ignore_errors=True)
    _os.makedirs(EVDIR, exist_ok=True)
    return (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", _os.environ.get("SPARK_DRIVER_MEM", "90g"))
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVDIR)
        .config("spark.eventLog.compress", "false")
        .getOrCreate()
    )


def parse_metrics(since_line: int) -> tuple[dict, int]:
    """Aggregate task metrics from the (single) event log file starting
    at line `since_line`; returns (metrics, new_line_count)."""
    # Spark 4 writes a rolling event-log DIRECTORY (eventlog_v2_*)
    # containing events_* part files; concatenate them in order
    roots = sorted(glob.glob(os.path.join(EVDIR, "*")))
    assert len(roots) == 1, roots
    if os.path.isdir(roots[0]):
        files = sorted(
            glob.glob(os.path.join(roots[0], "events_*")),
            key=lambda p: int(os.path.basename(p).split("_")[1]),
        )
    else:
        files = roots
    m = {
        "jobs": 0,
        "stages": 0,
        "tasks": 0,
        "cpu_sec": 0.0,
        "run_sec": 0.0,
        "shuffle_write_mb": 0.0,
        "shuffle_read_mb": 0.0,
        "input_mb": 0.0,
    }
    n = 0
    i = -1
    for path in files:
        with open(path) as f:
            for line in f:
                i += 1
                n = i + 1
                if i < since_line:
                    continue
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                et = ev.get("Event")
                if et == "SparkListenerJobStart":
                    m["jobs"] += 1
                elif et == "SparkListenerStageCompleted":
                    m["stages"] += 1
                elif et == "SparkListenerTaskEnd":
                    m["tasks"] += 1
                    tm = ev.get("Task Metrics") or {}
                    m["cpu_sec"] += tm.get("Executor CPU Time", 0) / 1e9
                    m["run_sec"] += tm.get("Executor Run Time", 0) / 1e3
                    sw = tm.get("Shuffle Write Metrics") or {}
                    m["shuffle_write_mb"] += (
                        sw.get("Shuffle Bytes Written", 0) / 1e6
                    )
                    sr = tm.get("Shuffle Read Metrics") or {}
                    m["shuffle_read_mb"] += (
                        sr.get("Local Bytes Read", 0)
                        + sr.get("Remote Bytes Read", 0)
                    ) / 1e6
                    im = tm.get("Input Metrics") or {}
                    m["input_mb"] += im.get("Bytes Read", 0) / 1e6
    for k in list(m):
        if isinstance(m[k], float):
            m[k] = round(m[k], 3)
    return m, n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    unknown = set(args.names) - set(QUERIES)
    if unknown:
        print(f"ERROR: unknown query name(s): {sorted(unknown)}", file=sys.stderr)
        sys.exit(2)
    spark = get_spark_with_eventlog("metrics_probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    QUERIES["q5_fetch_by_ids"](spark, args.sf).write.mode("overwrite").format(
        "noop"
    ).save()
    cursor = 0
    # flush events of the warmup
    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
    _, cursor = parse_metrics(0)
    for name in args.names:
        for rep in range(args.n):
            release_caches()
            spark.catalog.clearCache()
            spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
            _, cursor = parse_metrics(cursor)
            with open("/proc/loadavg") as f:
                load = f.read().split()[0]
            t0 = time.time()
            QUERIES[name](spark, args.sf).write.mode("overwrite").format(
                "noop"
            ).save()
            wall = round(time.time() - t0, 3)
            spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
            m, cursor = parse_metrics(cursor)
            print(
                f"{name} rep{rep}: wall={wall}s load={load} {json.dumps(m)}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
