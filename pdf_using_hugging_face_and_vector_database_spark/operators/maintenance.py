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

from ..storeswap import recover_store, swap_store, tmp_store


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
    recover_store(src_dir)
    recover_store(dst_dir)
    total, _n = store_data_size(src_dir)
    n_out = max(1, math.ceil(total / target_bytes))
    tmp = tmp_store(dst_dir)
    (
        spark.read.parquet(src_dir)
        .repartition(n_out)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    swap_store(dst_dir, tmp)
    return spark.read.parquet(dst_dir)


def cluster_store(
    spark,
    src_dir: str,
    dst_dir: str,
    key: str,
    n_files: int | None = None,
    target_bytes: int = 128 << 20,
) -> DataFrame:
    """Rewrite a store CLUSTERED on ``key``: range-repartition so each
    output file owns a disjoint key range, sort within partitions so
    every parquet row group's min/max stats are tight. After this, any
    point or range predicate on ``key`` prunes to the few row groups
    whose [min, max] intersect it — the data-skipping layout that
    turns a 100 TB scan into a few-GB scan without an index.

    Same write-then-swap contract as compact_store. Output file count
    defaults to the same size-derived heuristic.
    """
    from pyspark.sql import functions as F

    recover_store(src_dir)
    recover_store(dst_dir)
    if n_files is None:
        total, _ = store_data_size(src_dir)
        n_files = max(1, math.ceil(total / target_bytes))
    tmp = tmp_store(dst_dir)
    (
        spark.read.parquet(src_dir)
        .repartitionByRange(n_files, F.col(key))
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    swap_store(dst_dir, tmp)
    return spark.read.parquet(dst_dir)


def row_group_ranges(path: str, key: str) -> list[tuple]:
    """(min, max) of ``key`` for every parquet row group in the store —
    driver-side metadata read via pyarrow (footers only, never data).
    The clustering quality metric: disjoint ranges == perfect
    skipping; heavy overlap == every range query touches every file."""
    import pyarrow.parquet as pq

    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
            ci = schema_names.index(key)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is not None and st.has_min_max:
                    out.append((st.min, st.max))
    return out


def overlap_fraction(ranges: list[tuple]) -> float:
    """Fraction of range pairs that overlap — 0.0 is perfectly
    clustered, ~1.0 is unclustered."""
    n = len(ranges)
    if n < 2:
        return 0.0
    hits = 0
    pairs = 0
    for i in range(n):
        for j in range(i + 1, n):
            pairs += 1
            a, b = ranges[i], ranges[j]
            if a[0] <= b[1] and b[0] <= a[1]:
                hits += 1
    return hits / pairs


def ensure_store(base_dir: str, fingerprint: str, build) -> str:
    """Fingerprint-keyed store-build idiom for the maintenance
    fixtures — a thin alias for the shared marker protocol in
    ``store.ensure_store_dir`` (round-8 consolidation: one crash-safe
    contract, one test surface, no bespoke marker I/O here)."""
    from ..store import ensure_store_dir

    return ensure_store_dir(base_dir, fingerprint, build)


def zorder_value(cols, mins, maxs, bits: int | None = None):
    """Morton (Z-order) key from N numeric columns: each column is
    min/max-scaled to ``bits`` buckets (stats come from a cheap
    pre-pass aggregate, broadcast as literals), then the bucket bits
    are interleaved. Rows close in EVERY dimension get close z-values,
    so sorting by z gives row groups whose min/max stats are tight in
    ALL the z-ordered columns at once — the multi-column data-skipping
    layout (single-key clustering only tightens one column).
    Pure codegen'd bit arithmetic; no shuffle of its own.

    The interleaved key must fit a signed 64-bit long: bits are
    placed at positions up to len(cols)*bits - 1, and position 63 is
    the sign bit (position >= 64 wraps mod 64 in the JVM), either of
    which silently corrupts the Morton order. ``bits=None`` (default)
    picks min(16, 63 // len(cols)) — with 4 columns that is 15 bits
    each, still 32k buckets per dimension, far finer than any
    row-group layout resolves. An EXPLICIT ``bits`` that cannot fit is
    still shrunk (a corrupted Morton order is never acceptable) but
    warns, so a caller requesting a specific resolution sees the
    downgrade (ADVICE r5)."""
    import warnings

    from pyspark.sql import functions as F

    n = len(cols)
    if 63 // n < 1:
        raise ValueError(f"zorder_value: {n} columns cannot share a 63-bit key")
    if bits is None:
        bits = min(16, 63 // n)
    elif n * bits > 63:
        warnings.warn(
            f"zorder_value: requested bits={bits} with {n} columns "
            f"exceeds the 63-bit key; shrinking to {63 // n} bits "
            f"({1 << (63 // n)} buckets per dimension)",
            stacklevel=2,
        )
        bits = 63 // n
    import math as _math

    scaled = []
    for c, lo, hi in zip(cols, mins, maxs):
        c = F.col(c) if isinstance(c, str) else c
        # a zero-row store or an all-NULL key column has no min/max
        # (None stats): every row degenerates to bucket 0 for that
        # dimension instead of crashing with a bare float(None)
        # TypeError on the driver (r10 review)
        # NON-FINITE stats degenerate the same way (r15 review wave
        # 10, the r14 special-float class applied here): SQL max()
        # treats NaN as greatest and keeps ±Inf, so ONE special value
        # in the key column handed this scaler a NaN/Inf span — NaN
        # fails every Python comparison (the span<=0 guard passes it
        # through) and the per-row floor over a NaN/Inf quotient goes
        # NULL, so EVERY row coalesced to bucket 0: the whole
        # dimension's clustering silently evaporated with no error
        # (measured: all-zero z keys). Callers (zorder_store) now
        # aggregate finite-only stats; this guard keeps the scaler
        # safe for direct callers too.
        if (
            lo is None
            or hi is None
            or not _math.isfinite(float(lo))
            or not _math.isfinite(float(hi))
        ):
            scaled.append(F.lit(0).cast("long"))
            continue
        span = float(hi) - float(lo)
        if span <= 0:
            scaled.append(F.lit(0).cast("long"))
            continue
        cap = F.lit((1 << bits) - 1).cast("long")
        b = F.floor(
            (c.cast("double") - F.lit(float(lo)))
            / F.lit(span)
            * F.lit(float((1 << bits) - 1))
        ).cast("long")
        # NULL key values scale to bucket 0, NOT the max bucket:
        # Spark's least/greatest SKIP nulls (least(NULL, cap) = cap),
        # so a NULL row previously landed co-located with the genuine
        # max rows, inflating the top row groups' min/max spread in
        # the other dimensions (r10 review). Coalesce the scaled value
        # BEFORE the clamp — bucket 0 matches where repartitionByRange
        # places NULLS FIRST. Special ROW values get one deterministic
        # edge each (r15): +Inf clamps to the top bucket, NaN and −Inf
        # to bucket 0 (floor of their quotients is NULL/NULL-ish, and
        # the finite-stats scaling no longer sees them in lo/hi).
        scaled.append(
            F.when(c.cast("double") == F.lit(float("inf")), cap)
            .otherwise(
                F.greatest(
                    F.least(
                        F.coalesce(b, F.lit(0).cast("long")),
                        cap,
                    ),
                    F.lit(0),
                )
            )
        )
    # Column & / | are BOOLEAN operators in PySpark — bitwise ops must
    # go through bitwiseAND / bitwiseOR
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, s in enumerate(scaled):
            bit = F.shiftrightunsigned(s, i).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j).cast("long"))
    return z


def zorder_store(
    spark,
    src_dir: str,
    dst_dir: str,
    keys: list[str],
    n_files: int | None = None,
    target_bytes: int = 128 << 20,
    bits: int | None = None,
) -> DataFrame:
    """Rewrite a store Z-ORDERED on ``keys``: one stats pre-pass for
    min/max, then range-repartition + sort on the interleaved Morton
    key. Same write-then-swap contract as cluster_store."""
    from pyspark.sql import functions as F

    recover_store(src_dir)
    recover_store(dst_dir)
    df = spark.read.parquet(src_dir)
    # stats in DOUBLE space (temporal keys become epoch seconds —
    # TIMESTAMP_NTZ has no direct double cast, so route through
    # timestamp), keeping the scaling arithmetic uniform across types
    dtypes = dict(df.dtypes)
    def _num(k):
        c = F.col(k)
        if dtypes[k].startswith(("timestamp", "date")):
            c = c.cast("timestamp")
        return c.cast("double")

    kcols = [_num(k) for k in keys]

    # finite-only stats (r15 review wave 10): SQL min/max keep NaN
    # (greatest) and ±Inf, and ONE special value in a key column made
    # the scaler's span NaN/Inf — every row then bucketed to 0 and the
    # dimension's clustering silently evaporated. Scale from the
    # finite mass; special rows get deterministic edge buckets inside
    # zorder_value.
    def _finite(c):
        return F.when(
            ~F.isnan(c) & (F.abs(c) != F.lit(float("inf"))), c
        )

    stats = df.agg(
        *[F.min(_finite(c)).alias(f"min_{k}") for k, c in zip(keys, kcols)],
        *[F.max(_finite(c)).alias(f"max_{k}") for k, c in zip(keys, kcols)],
    ).collect()[0]
    mins = [stats[f"min_{k}"] for k in keys]
    maxs = [stats[f"max_{k}"] for k in keys]
    if n_files is None:
        total, _ = store_data_size(src_dir)
        n_files = max(1, math.ceil(total / target_bytes))
    z = zorder_value(kcols, mins, maxs, bits=bits)
    tmp = tmp_store(dst_dir)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    swap_store(dst_dir, tmp)
    return spark.read.parquet(dst_dir)
