"""Incremental MV refresh: the splice must be genuine (both branches
non-empty), equal the full recompute, and lower to broadcast
anti/semi joins on the changed-partition list."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark import queries as Q
from pdf_using_hugging_face_and_vector_database_spark.io import read_table
from pdf_using_hugging_face_and_vector_database_spark.operators.matview import (
    refresh_changed_partitions,
)
from pdf_using_hugging_face_and_vector_database_spark.plans import formatted_plan


def test_splice_equals_full_recompute(spark):
    base = spark.range(0, 1_000).select(
        (F.col("id") % 10).alias("p"), F.col("id").alias("v")
    )

    def agg(df):
        return df.groupBy("p").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))

    stale = agg(base.filter(F.col("v") % 7 != 0))  # MV missing some rows
    changed = (
        base.filter(F.col("v") % 7 == 0).select("p").distinct()
    )
    got = {
        r.p: (r.s, r.n)
        for r in refresh_changed_partitions(base, stale, "p", changed, agg).collect()
    }
    want = {r.p: (r.s, r.n) for r in agg(base).collect()}
    assert got == want


def test_splice_branches_both_contribute(spark, sf_dir):
    """The fixture's late batch must touch SOME months but not all —
    otherwise the query certifies a plain recompute, not a splice."""
    orders = read_table(spark, sf_dir, "orders")
    months = (
        orders.select(F.date_format("o_orderdate", "yyyy-MM").alias("m"))
        .distinct()
        .count()
    )
    changed = (
        orders.filter(F.col("o_orderkey") % 1000 == 7)
        .select(F.date_format("o_orderdate", "yyyy-MM").alias("m"))
        .distinct()
        .count()
    )
    assert 0 < changed < months


def test_refresh_plan_broadcasts_partition_list(spark, sf_dir):
    plan = formatted_plan(Q.mv_incremental_refresh(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan
    assert "LeftSemi" in plan


def test_refresh_null_partition_key(spark):
    """r12 review: groupBy treats NULL as a real partition key, but
    the splice's plain-equality anti/semi joins never match NULL — a
    batch touching the NULL partition left its stale MV row in place
    and skipped the recompute. Null-safe joins make the splice equal
    the full recompute again. Fails on the pre-r12 code (stale NULL
    row survives, fresh one never computed)."""
    base = spark.createDataFrame(
        [(None, 1), (None, 2), ("a", 10), ("b", 20)], "p string, v int"
    )

    def agg(df):
        return df.groupBy("p").agg(
            F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
        )

    # stale MV built before the second NULL-partition row and one 'a'
    # row landed
    stale = agg(
        spark.createDataFrame([(None, 1), ("a", 3), ("b", 20)], "p string, v int")
    )
    changed = spark.createDataFrame([(None,), ("a",)], "p string").select("p")
    got = {
        r.p: (r.s, r.n)
        for r in refresh_changed_partitions(
            base, stale, "p", changed, agg
        ).collect()
    }
    want = {r.p: (r.s, r.n) for r in agg(base).collect()}
    assert got == want
    assert got[None] == (3, 2)  # the NULL partition was recomputed
