"""Crash-window recovery for every directory-store swap: the two
renames of the swap protocol are NOT atomic together, so a crash
between them leaves no store dir — recover_store must roll the
dangling ``.old`` back before any sink reads its watermark, or a
transactional additive sink silently folds the replayed batch into
an EMPTY store (the exact data-loss the round-4 advisor flagged)."""

from __future__ import annotations

import json
import os

from pdf_using_hugging_face_and_vector_database_spark.storeswap import (
    recover_store,
    swap_store,
    tmp_store,
)


def _mk_store(path, tag):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "payload.txt"), "w") as f:
        f.write(tag)


def _tag(path):
    with open(os.path.join(path, "payload.txt")) as f:
        return f.read()


def test_recover_restores_dangling_old(tmp_path):
    """Crash between rename(store, old) and rename(tmp, store): store
    missing, .old = pre-batch state, .tmp = post-batch state. Recovery
    must restore the OLD state (pre-batch watermark -> the batch
    re-applies) and discard the uncommitted tmp."""
    store = str(tmp_path / "store")
    _mk_store(store + ".old", "pre")
    _mk_store(store + ".tmp", "post")
    recover_store(store)
    assert _tag(store) == "pre"
    assert not os.path.exists(store + ".old")
    assert not os.path.exists(store + ".tmp")


def test_recover_keeps_committed_store(tmp_path):
    """Crash after rename(tmp, store) but before the final cleanup:
    the NEW state is committed; recovery must keep it and only
    discard the leftover .old."""
    store = str(tmp_path / "store")
    _mk_store(store, "post")
    _mk_store(store + ".old", "pre")
    recover_store(store)
    assert _tag(store) == "post"
    assert not os.path.exists(store + ".old")


def test_recover_discards_partial_tmp(tmp_path):
    """Crash mid-write of tmp: store intact, tmp partial — recovery
    discards tmp, keeps store."""
    store = str(tmp_path / "store")
    _mk_store(store, "v1")
    _mk_store(store + ".tmp", "partial")
    recover_store(store)
    assert _tag(store) == "v1"
    assert not os.path.exists(store + ".tmp")


def test_swap_promotes_tmp(tmp_path):
    store = str(tmp_path / "store")
    _mk_store(store, "v1")
    tmp = tmp_store(store)
    _mk_store(tmp, "v2")
    swap_store(store, tmp)
    assert _tag(store) == "v2"
    assert not os.path.exists(store + ".old")
    assert not os.path.exists(store + ".tmp")


def test_mv_batch_survives_swap_window_crash(spark, tmp_path):
    """End-to-end on the additive MV sink: apply batch 0, simulate a
    crash inside batch 1's swap window (store renamed aside, tmp
    fully written), then replay batch 1. Without recovery the sink
    would see last_batch_id=-1 and fold batch 1 into an empty MV;
    with recovery the final MV equals the clean two-batch result."""
    import datetime as dt

    from pdf_using_hugging_face_and_vector_database_spark.streaming.matview import (
        ORDERS_SCHEMA,
        apply_mv_batch,
    )

    def orders(keys):
        rows = [
            (k, k % 7, "O", 10.0 * (k + 1), dt.datetime(2020, 1, 1), "P")
            for k in keys
        ]
        return spark.createDataFrame(rows, ORDERS_SCHEMA)

    def mv(store):
        return {
            (r.month, r.o_orderstatus): (r.n_orders, float(r.revenue_dec))
            for r in spark.read.parquet(os.path.join(store, "data")).collect()
        }

    clean = str(tmp_path / "clean")
    apply_mv_batch(spark, clean, orders(range(10)), batch_id=0)
    apply_mv_batch(spark, clean, orders(range(10, 14)), batch_id=1)
    want = mv(clean)

    crashed = str(tmp_path / "crashed")
    apply_mv_batch(spark, crashed, orders(range(10)), batch_id=0)
    # simulate the crash window: batch 1's tmp fully written, store
    # renamed aside, process dies before rename(tmp, store)
    tmp = crashed + ".tmp"
    os.makedirs(tmp)
    spark.read.parquet(os.path.join(crashed, "data")).write.parquet(
        os.path.join(tmp, "data")
    )  # stand-in post-state; content irrelevant — it must be DISCARDED
    with open(os.path.join(tmp, "_meta.json"), "w") as f:
        json.dump({"last_batch_id": 1}, f)
    os.rename(crashed, crashed + ".old")

    # restart: foreachBatch replays batch 1
    apply_mv_batch(spark, crashed, orders(range(10, 14)), batch_id=1)
    assert mv(crashed) == want
