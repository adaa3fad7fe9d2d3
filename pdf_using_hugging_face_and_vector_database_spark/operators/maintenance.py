"""Table-maintenance operators — the jobs a 100 TB lakehouse runs
nightly so that everything else stays fast.

Small-file compaction first: streaming ingest and fine-grained
upserts leave stores as thousands of KB-scale parquet files; every
downstream scan then pays one task + one footer read per file, and
the NameNode/listing layer pays for all of them. Compaction rewrites
a store to ~target-sized files. The content must survive
bit-for-bit — which is exactly what the driver oracle checks.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame


def store_data_size(path: str) -> tuple[int, int]:
    """(total_bytes, n_data_files) of a parquet store directory —
    driver-side metadata walk (listing-scale, never data-scale)."""
    total = 0
    nfiles = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
                nfiles += 1
    return total, nfiles


def compact_store(
    spark,
    src_dir: str,
    dst_dir: str,
    target_bytes: int = 128 << 20,
) -> DataFrame:
    """Rewrite ``src_dir`` into ``dst_dir`` with ~``target_bytes``
    output files, write-then-swap (the swap is a directory rename, so
    readers never observe a half-written store).

    The output file count is ceil(input_bytes / target) — derived
    from the on-disk size the driver already has, no data scan. The
    rewrite itself is one repartition (round-robin, so output files
    are uniform regardless of input skew) + one write: at 100 TB this
    is the bin-packing shuffle you schedule off-peak, and it runs
    per-partition-parallel with no driver bottleneck. Returns the
    compacted store as a DataFrame.
    """
    total, _n = store_data_size(src_dir)
    n_out = max(1, math.ceil(total / target_bytes))
    tmp = dst_dir.rstrip("/") + ".tmp"
    (
        spark.read.parquet(src_dir)
        .repartition(n_out)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    import shutil

    if os.path.exists(dst_dir):
        shutil.rmtree(dst_dir)
    os.replace(tmp, dst_dir)
    return spark.read.parquet(dst_dir)
