"""Generic fingerprint-keyed persisted-result store (store.py):
build-once/read-after semantics and the crash-safe marker ordering
the two LSH audit truth tables rely on."""

from __future__ import annotations

import json
import os
import shutil
import uuid

import pytest

from pdf_using_hugging_face_and_vector_database_spark.operators.ann import INDEX_ROOT
from pdf_using_hugging_face_and_vector_database_spark.store import persisted_result


@pytest.fixture
def store_name():
    name = f"test_store_{uuid.uuid4().hex[:12]}"
    yield name
    shutil.rmtree(os.path.join(INDEX_ROOT, name), ignore_errors=True)


def _counting_build(spark, calls, rows):
    def build():
        calls.append(1)
        return spark.createDataFrame(rows, "k long, v string")

    return build


def test_build_once_then_read(spark, store_name):
    calls = []
    rows = [(1, "a"), (2, "b")]
    build = _counting_build(spark, calls, rows)
    first = persisted_result(spark, store_name, "fp1", build)
    assert sorted((r.k, r.v) for r in first.collect()) == rows
    second = persisted_result(spark, store_name, "fp1", build)
    assert sorted((r.k, r.v) for r in second.collect()) == rows
    assert len(calls) == 1  # second call served from the store


def test_fingerprint_change_rebuilds(spark, store_name):
    calls = []
    build = _counting_build(spark, calls, [(1, "a")])
    persisted_result(spark, store_name, "fp1", build)
    persisted_result(spark, store_name, "fp2", build)
    assert len(calls) == 2
    # marker now records the new fingerprint: fp2 reads, fp1 rebuilds
    persisted_result(spark, store_name, "fp2", build)
    assert len(calls) == 2


def test_killed_build_rebuilds(spark, store_name):
    """Data written but no marker (a build killed before the atomic
    marker rename) must fail the check and rebuild, not serve the
    possibly-partial data."""
    calls = []
    build = _counting_build(spark, calls, [(1, "a")])
    persisted_result(spark, store_name, "fp1", build)
    os.remove(os.path.join(INDEX_ROOT, store_name, "meta.json"))
    persisted_result(spark, store_name, "fp1", build)
    assert len(calls) == 2


def test_corrupt_marker_rebuilds(spark, store_name):
    calls = []
    build = _counting_build(spark, calls, [(1, "a")])
    persisted_result(spark, store_name, "fp1", build)
    marker = os.path.join(INDEX_ROOT, store_name, "meta.json")
    with open(marker, "w") as f:
        f.write("{not json")
    out = persisted_result(spark, store_name, "fp1", build)
    assert len(calls) == 2
    assert out.count() == 1
    with open(marker) as f:
        assert json.load(f)["fingerprint"] == "fp1"
