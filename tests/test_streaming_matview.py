"""Transactional additive MV sink: batch-id replay skip, atomic
commit of data+watermark, and restart-with-new-files recovery."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.streaming.matview import (
    ORDERS_SCHEMA,
    apply_mv_batch,
    run_mv_stream,
)


def _orders_df(spark, keys):
    import datetime as dt

    rows = [
        (k, k % 7, "O", 10.0 * (k + 1), dt.datetime(2020, 1 + (k % 3), 1), "P")
        for k in keys
    ]
    return spark.createDataFrame(rows, ORDERS_SCHEMA)


def _mv(spark, store):
    return {
        (r.month, r.o_orderstatus): (r.n_orders, float(r.revenue_dec))
        for r in spark.read.parquet(os.path.join(store, "data")).collect()
    }


def test_replayed_batch_is_skipped(spark, tmp_path):
    """Additive merges double-count on replay — the batch-id watermark
    must make a re-applied batch a no-op."""
    store = str(tmp_path / "mv")
    b0 = _orders_df(spark, range(10))
    apply_mv_batch(spark, store, b0, batch_id=0)
    once = _mv(spark, store)
    apply_mv_batch(spark, store, b0, batch_id=0)  # replay
    assert _mv(spark, store) == once
    # a NEW batch id still applies
    apply_mv_batch(spark, store, _orders_df(spark, range(10, 14)), batch_id=1)
    after = _mv(spark, store)
    assert sum(n for n, _ in after.values()) == 14


def test_stream_restart_folds_only_new_files(spark, tmp_path):
    """Same checkpoint, new landing file: the restarted query must
    apply exactly the new rows on top of the recovered store."""
    landing = tmp_path / "landing"
    landing.mkdir()
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    def land(name, keys):
        import glob
        import shutil

        tmp = str(tmp_path / f"_tmp_{name}")
        _orders_df(spark, keys).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.rename(part, str(landing / f"{name}.parquet"))
        shutil.rmtree(tmp)

    land("00", range(20))
    run_mv_stream(spark, str(landing), store, ckpt, query_name="mv_t1")
    first = _mv(spark, store)
    assert sum(n for n, _ in first.values()) == 20

    land("01", range(20, 30))
    run_mv_stream(spark, str(landing), store, ckpt, query_name="mv_t2")
    second = _mv(spark, store)
    assert sum(n for n, _ in second.values()) == 30
    # the streamed store equals a from-scratch aggregate of all rows
    truth = {
        (r.month, r.o_orderstatus): (r.n_orders, float(r.revenue_dec))
        for r in _orders_df(spark, range(30))
        .groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(27,6)")).alias(
                "revenue_dec"
            ),
        )
        .collect()
    }
    assert second == truth


def test_keyless_watermark_fails_loudly(spark, tmp_path):
    """r11 review: a _meta.json that PARSES but lacks last_batch_id
    (future/foreign store version) must raise, not default to -1 and
    re-fold committed batches into the additive MV (double count) —
    only unparseable JSON failed loudly before."""
    import json

    import pytest

    store = str(tmp_path / "mv")
    apply_mv_batch(spark, store, _orders_df(spark, [1, 2]), 0)
    with open(os.path.join(store, "_meta.json"), "w") as f:
        json.dump({"some_other_key": 0}, f)
    with pytest.raises(ValueError, match="no last_batch_id"):
        apply_mv_batch(spark, store, _orders_df(spark, [1, 2]), 0)
