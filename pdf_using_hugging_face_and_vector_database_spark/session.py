"""SparkSession builder tuned for the engine.

Local test mode runs ``local[$SPARK_GRAFT_CPUS]`` in one JVM; the same
configs are the ones that matter on a 1000-executor cluster:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting) —
  at 100 TB the static ``spark.sql.shuffle.partitions`` is always wrong
  for some stage, so let AQE re-plan.
- Arrow on — every Python-side operator in this engine is a Pandas UDF
  (batched, columnar transfer), never a row-at-a-time Python UDF.
- UTC session timezone — deterministic timestamp semantics and parity
  with the DuckDB oracle.
- Broadcast threshold left at default (10 MB): dimension tables
  (region/nation/supplier at any SF, query-vector sides of similarity
  joins) broadcast; fact tables never do.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Scratch space floor for preferring RAM-backed local dirs: leave
# plenty of headroom — test-scale shuffle/state files are MBs.
_SHM_MIN_FREE_BYTES = 16 * 2**30


def scratch_local_dir() -> str | None:
    """Directory for Spark's node-local scratch I/O (shuffle files,
    spills, and — via java.io.tmpdir — the bounded replays' temporary
    streaming progress/state directories).

    Spark's default is /tmp, which on this machine is the shared data
    disk: every shuffle write and state-store commit then contends
    with unrelated disk traffic (measured r15: the streaming interval
    join reads 3.9 s on a quiet disk but 45-75 s during the box's
    recurring external I/O waves, while the same query on tmpfs stays
    at ~9 s under the same waves). Production analogue: point
    spark.local.dir at the fastest node-local storage (NVMe/RAM disk),
    never at a shared or network volume — the same knob, sized to the
    node. Override with $SPARK_GRAFT_LOCAL_DIR; empty string disables
    the tmpfs preference.
    """
    override = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if override is not None:
        return override or None
    if os.path.isdir("/dev/shm"):
        import shutil

        try:
            if shutil.disk_usage("/dev/shm").free >= _SHM_MIN_FREE_BYTES:
                # no mkdir here (this helper stays side-effect-free —
                # the pool-safety source scan depends on it): Spark's
                # DiskBlockManager / Utils.createTempDir mkdirs() the
                # root including parents on first use
                return "/dev/shm/sparkgraft_local"
        except OSError:
            return None
    return None


def get_spark(
    app_name: str = "pdf_hf_vdb_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``shuffle_partitions`` defaults to the local core count — on a real
    cluster you would size it to ~2-3x total executor cores and let AQE
    coalesce; locally 200 default just adds scheduling overhead.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if str(cpus).isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # the events fixture stores TIMESTAMP(NANOS) which the vanilla
        # reader rejects; read as long and convert in io.read_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "90g"))
        .config("spark.ui.enabled", "false")
    )
    local_dir = scratch_local_dir()
    if local_dir:
        # shuffle files + spills; java.io.tmpdir additionally moves the
        # bounded-replay streams' TEMPORARY progress/state dirs (their
        # state-store commit I/O is the disk-sensitive path). Explicit
        # durable progress dirs passed by callers (matview/recovery)
        # are storage-contract decisions and are not affected. Only
        # effective when this builder launches the JVM — an already-
        # running session keeps its dirs, which is the safe behavior.
        builder = builder.config("spark.local.dir", local_dir).config(
            "spark.driver.extraJavaOptions", f"-Djava.io.tmpdir={local_dir}"
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
