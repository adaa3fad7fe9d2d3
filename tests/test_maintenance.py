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
