"""compact_store: file-count mechanics, content preservation, and the
write-then-swap crash-safety property (content equality vs the source
table is driver-oracled in store_compaction)."""

from __future__ import annotations

import os

from pdf_using_hugging_face_and_vector_database_spark.operators.maintenance import (
    compact_store,
    store_data_size,
)


def _parquet_files(path):
    out = []
    for root, _d, files in os.walk(path):
        out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    return out


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    spark.range(0, 10_000).repartition(32).write.parquet(src)
    assert len(_parquet_files(src)) == 32
    total, nf = store_data_size(src)
    assert nf == 32 and total > 0
    out = compact_store(spark, src, dst, target_bytes=max(total // 3, 1))
    n_after = len(_parquet_files(dst))
    assert 0 < n_after < 32
    # every row survives, exactly once
    assert out.count() == 10_000
    assert out.selectExpr("sum(id)").collect()[0][0] == 10_000 * 9_999 // 2
    # no leftover tmp dir from the swap
    assert not os.path.exists(dst + ".tmp")


def test_compaction_is_idempotent_and_replaces(spark, tmp_path):
    """Re-running compaction over the same source must atomically
    replace the destination, not accumulate files."""
    src = str(tmp_path / "frag2")
    dst = str(tmp_path / "compact2")
    spark.range(0, 1_000).repartition(8).write.parquet(src)
    total, _ = store_data_size(src)
    compact_store(spark, src, dst, target_bytes=max(total, 1))
    first = sorted(_parquet_files(dst))
    out = compact_store(spark, src, dst, target_bytes=max(total, 1))
    assert out.count() == 1_000
    assert len(_parquet_files(dst)) == len(first)


def test_single_target_file_when_target_exceeds_size(spark, tmp_path):
    src = str(tmp_path / "frag3")
    dst = str(tmp_path / "compact3")
    spark.range(0, 100).repartition(4).write.parquet(src)
    compact_store(spark, src, dst, target_bytes=1 << 30)
    assert len(_parquet_files(dst)) == 1


def test_clustering_tightens_row_group_ranges(spark, tmp_path):
    """After cluster_store, row-group [min,max] key ranges must be
    (near-)disjoint — footer-stats proof that a range predicate can
    skip — while the scrambled input's ranges all overlap."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.maintenance import (
        cluster_store,
        overlap_fraction,
        row_group_ranges,
    )
    from pyspark.sql import functions as F

    src = str(tmp_path / "scrambled")
    dst = str(tmp_path / "clustered")
    # keys scrambled round-robin across 8 files
    spark.range(0, 50_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    ).repartition(8).write.parquet(src)
    before = overlap_fraction(row_group_ranges(src, "k"))
    assert before > 0.9  # every scrambled file spans ~the full domain
    out = cluster_store(spark, src, dst, key="k", n_files=8)
    after = overlap_fraction(row_group_ranges(dst, "k"))
    assert after < 0.05
    assert out.count() == 50_000
    # content preserved exactly
    assert out.selectExpr("sum(k)").collect()[0][0] == 50_000 * 49_999 // 2


def test_clustered_ranges_cover_all_rows(spark, tmp_path):
    """Every key must land inside its file's stated [min,max] — i.e.
    the stats a skipper would trust are sound."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.maintenance import (
        cluster_store,
        row_group_ranges,
    )
    from pyspark.sql import functions as F

    src = str(tmp_path / "s2")
    dst = str(tmp_path / "c2")
    spark.range(0, 5_000).select(F.col("id").alias("k")).repartition(
        4
    ).write.parquet(src)
    cluster_store(spark, src, dst, key="k", n_files=4)
    ranges = row_group_ranges(dst, "k")
    lo = min(r[0] for r in ranges)
    hi = max(r[1] for r in ranges)
    assert lo == 0 and hi == 4_999


def test_zorder_tightens_both_columns(spark, tmp_path):
    """Z-order on (x, y): row-group [min,max] overlap must drop
    substantially for BOTH keys vs the scrambled layout — the property
    single-key clustering can only deliver for one."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.maintenance import (
        overlap_fraction,
        row_group_ranges,
        zorder_store,
    )
    from pyspark.sql import functions as F

    src = str(tmp_path / "zsrc")
    dst = str(tmp_path / "zdst")
    # x and y independent, both uniform — the honest 2-D case
    n = 65536
    spark.range(0, n).select(
        F.col("id").alias("x"),
        ((F.col("id") * 48271) % n).alias("y"),
    ).repartition(8).write.parquet(src)
    before_x = overlap_fraction(row_group_ranges(src, "x"))
    before_y = overlap_fraction(row_group_ranges(src, "y"))
    assert before_x > 0.9 and before_y > 0.9
    out = zorder_store(spark, src, dst, keys=["x", "y"], n_files=16)
    after_x = overlap_fraction(row_group_ranges(dst, "x"))
    after_y = overlap_fraction(row_group_ranges(dst, "y"))
    # 16 z-runs of a 2-D curve: each file spans ~1/4 of each axis; the
    # range-partition boundaries aren't quadrant-aligned, so pairwise
    # overlap lands ~0.55-0.65 per axis (vs 0.2 for perfectly aligned
    # cells) — the property under test is that BOTH axes drop well
    # below the everything-overlaps baseline at once
    assert after_x <= 0.7 and after_y <= 0.7
    assert after_x < before_x and after_y < before_y
    assert out.count() == n
    assert out.selectExpr("sum(x)").collect()[0][0] == n * (n - 1) // 2


def test_zorder_value_locality(spark):
    """Morton keys: quadrant identity — points in the same quadrant of
    a 2-bit grid share their top z-bits."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.maintenance import (
        zorder_value,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x long, y long"
    )
    z = zorder_value(["x", "y"], [0, 0], [3, 3], bits=2)
    rows = df.select("x", "y", z.alias("z")).collect()
    got = {(r.x, r.y): r.z for r in rows}
    assert len(set(got.values())) == 16  # bijective on the grid
    # top bits (z >> 2) identify the 2x2 quadrant
    for (x, y), zv in got.items():
        assert zv >> 2 == ((y >> 1) << 1 | (x >> 1))


def test_zorder_value_many_columns_stays_in_63_bits(spark):
    """4+ columns at the default 16 bits would push interleaved bit
    positions to/past the sign bit (silent Morton corruption);
    zorder_value must auto-shrink bits so len(cols)*bits <= 63 and
    every z-value stays non-negative with locality intact."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.maintenance import (
        zorder_value,
    )
    from pyspark.sql import functions as F

    df = spark.range(256).select(
        (F.col("id") % 4).alias("a"),
        (F.col("id") / 4 % 4).cast("long").alias("b"),
        (F.col("id") / 16 % 4).cast("long").alias("c"),
        (F.col("id") / 64 % 4).cast("long").alias("d"),
    )
    z = zorder_value(["a", "b", "c", "d"], [0] * 4, [3] * 4)  # default bits=16
    rows = df.select("a", "b", "c", "d", z.alias("z")).collect()
    assert all(r.z >= 0 for r in rows)
    # corner ordering must hold: the all-min corner is the global min,
    # the all-max corner the global max
    by_key = {(r.a, r.b, r.c, r.d): r.z for r in rows}
    assert by_key[(0, 0, 0, 0)] == min(by_key.values())
    assert by_key[(3, 3, 3, 3)] == max(by_key.values())
    import pytest

    with pytest.raises(ValueError):
        zorder_value([f"c{i}" for i in range(64)], [0] * 64, [1] * 64)


def test_zorder_value_warns_on_explicit_bits_shrink(spark):
    """An explicitly requested resolution that cannot fit 63 bits is
    shrunk (never silently corrupted) but must WARN so the caller sees
    the downgrade; the auto default must stay silent (ADVICE r5)."""
    import warnings

    from pdf_using_hugging_face_and_vector_database_spark.operators.maintenance import (
        zorder_value,
    )

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        zorder_value(["a", "b", "c", "d"], [0] * 4, [3] * 4, bits=16)
    assert any("shrinking to 15 bits" in str(x.message) for x in w)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        zorder_value(["a", "b", "c", "d"], [0] * 4, [3] * 4)
    assert not w


def test_zorder_handles_empty_and_null_stats(spark, tmp_path):
    """r10 review: a zero-row store (None min/max stats) must not
    crash zorder_store with a bare float(None) TypeError; NULL key
    values bucket to 0 (with repartitionByRange's NULLS FIRST), not
    to the max bucket via least(NULL, cap)."""
    import os

    from pdf_using_hugging_face_and_vector_database_spark.operators.maintenance import (
        zorder_store,
        zorder_value,
    )
    from pyspark.sql import functions as F

    src = os.path.join(str(tmp_path), "src")
    dst = os.path.join(str(tmp_path), "dst")
    empty = spark.createDataFrame([], "x long, y long")
    empty.write.parquet(src)
    out = zorder_store(spark, src, dst, keys=["x", "y"])
    assert out.count() == 0

    # NULL x buckets to 0: its z-value must equal the z-value of the
    # MINIMUM x, never the maximum's
    df = spark.createDataFrame(
        [(0, 0), (1023, 0), (None, 0)], "x long, y long"
    )
    z = df.select(
        "x", zorder_value(["x", "y"], mins=[0, 0], maxs=[1023, 0]).alias("z")
    ).collect()
    by_x = {r.x: r.z for r in z}
    assert by_x[None] == by_x[0]
    assert by_x[None] != by_x[1023]


def test_zorder_survives_special_float_keys(spark, tmp_path):
    """r15 review wave 10 (the r14 special-float class applied to the
    maintenance path): SQL max() keeps NaN (greatest) and +Inf, so ONE
    special value in a z-order key column previously handed the scaler
    a NaN/Inf span — NaN fails every Python comparison, the per-row
    floor over the NaN/Inf quotient went NULL, and EVERY row coalesced
    to bucket 0: the whole store's clustering silently evaporated
    (measured all-zero z keys), with no error to notice. Stats are now
    finite-only and special rows get one deterministic edge bucket
    each (NaN/−Inf → 0, +Inf → top). Fails on the old code (all z
    equal)."""
    import os

    from pdf_using_hugging_face_and_vector_database_spark.operators.maintenance import (
        row_group_ranges,
        zorder_store,
        zorder_value,
    )

    rows = [
        (0.0, 0.0),
        (100.0, 100.0),
        (float("nan"), 50.0),
        (50.0, float("inf")),
        (float("-inf"), 25.0),
    ]
    df = spark.createDataFrame(rows, "x double, y double")
    # what zorder_store's finite-only pre-pass now yields
    z = df.select(
        "x",
        "y",
        zorder_value(
            ["x", "y"], mins=[0.0, 0.0], maxs=[100.0, 100.0], bits=8
        ).alias("z"),
    ).collect()
    by_xy = {(str(r.x), str(r.y)): r.z for r in z}
    # the finite extremes must spread across the key space (old code:
    # every z == 0 because the NaN/Inf span zeroed both dimensions)
    assert by_xy[("0.0", "0.0")] != by_xy[("100.0", "100.0")]
    # deterministic special fates: NaN and -Inf dimensions bucket 0,
    # +Inf dimension buckets top
    zmap = dict(by_xy)
    z_nan_as_min = df.sparkSession.createDataFrame(
        [(0.0, 50.0)], "x double, y double"
    ).select(
        zorder_value(["x", "y"], mins=[0.0, 0.0], maxs=[100.0, 100.0], bits=8)
        .alias("z")
    ).collect()[0].z
    assert zmap[("nan", "50.0")] == z_nan_as_min
    # -inf x ties the minimum-x placement for its dimension
    z_min_x = df.sparkSession.createDataFrame(
        [(0.0, 25.0)], "x double, y double"
    ).select(
        zorder_value(["x", "y"], mins=[0.0, 0.0], maxs=[100.0, 100.0], bits=8)
        .alias("z")
    ).collect()[0].z
    assert zmap[("-inf", "25.0")] == z_min_x
    # +inf y ties the maximum-y placement for its dimension
    z_max_y = df.sparkSession.createDataFrame(
        [(50.0, 100.0)], "x double, y double"
    ).select(
        zorder_value(["x", "y"], mins=[0.0, 0.0], maxs=[100.0, 100.0], bits=8)
        .alias("z")
    ).collect()[0].z
    assert zmap[("50.0", "inf")] == z_max_y

    # end-to-end: the store rewrite keeps every row bit-for-bit and
    # still tightens finite row-group ranges with specials present
    src = os.path.join(str(tmp_path), "src")
    dst = os.path.join(str(tmp_path), "dst")
    import math

    big = [(float(i % 97), float((i * 7) % 89)) for i in range(2000)]
    big += [(float("nan"), 1.0), (float("inf"), 2.0), (3.0, float("-inf"))]
    spark.createDataFrame(big, "x double, y double").repartition(8).write.parquet(src)
    out = zorder_store(spark, src, dst, keys=["x", "y"], n_files=4)
    assert out.count() == len(big)
    from pyspark.sql import functions as F

    got_nan = out.filter(F.isnan("x")).count()
    assert got_nan == 1
    # clustering quality is real again: multiple distinct x ranges
    ranges = [
        (lo, hi)
        for lo, hi in row_group_ranges(dst, "x")
        if lo is not None and math.isfinite(lo)
    ]
    assert len({r for r in ranges}) > 1
