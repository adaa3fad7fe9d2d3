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
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
