"""Pins for the round-14 review wave 7 over the scale-measurement
tools — the r12 lesson (a receipt can measure the replica scheme, not
the operator) applied to the remaining replica builders."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")


def test_rep_translated_docs_are_pairwise_distinct(spark, sf_dir):
    """r14 wave 7: the per-rep translation must be INJECTIVE over the
    rep domain. The old single-9-letter-rotation scheme repeated every
    9 reps, so at the shipped factors (10/20/50) rep 9/18/... carried
    the IDENTITY map and whole replica families were byte-identical to
    rep 0 — exact duplicates, the blow-up the translation scheme
    exists to prevent, inflating the streaming-dedup and simhash match
    counts superlinearly. Fails on the old code (rep 9 == rep 0)."""
    from tools.scale_run_f import _rep_translated_docs

    factor = 19  # covers two collision points of the old scheme (9, 18)
    expanded = _rep_translated_docs(spark, sf_dir, factor)
    base_docs = 500  # sf0.001 documents fixture
    assert expanded.count() == base_docs * factor
    # no two replicas of any base doc may share a text; the fixture
    # itself has no cross-doc exact dups, so a global check suffices
    dup_texts = (
        expanded.groupBy("text").count().filter("count > 1").count()
    )
    assert dup_texts == 0


def test_rep_translated_docs_rep0_is_identity(spark, sf_dir):
    """factor=1 must stay byte-identical to the base fixture (the
    1x/Kx comparison anchors on it)."""
    from pdf_using_hugging_face_and_vector_database_spark.io import read_table
    from tools.scale_run_f import _rep_translated_docs

    base = {
        r["doc_id"]: r["text"]
        for r in read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    got = {
        r["doc_id"]: r["text"]
        for r in _rep_translated_docs(spark, sf_dir, 1)
        .select("doc_id", "text")
        .collect()
    }
    assert got == base


def test_rep_translated_docs_rejects_oversized_factor(spark, sf_dir):
    """Past the 81 distinct translations the scheme MUST refuse rather
    than silently collide."""
    from tools.scale_run_f import _rep_translated_docs

    with pytest.raises(ValueError, match="distinct per-rep translations"):
        _rep_translated_docs(spark, sf_dir, 82)


def test_time_queries_rejects_unknown_query_names(tmp_path):
    """r14 wave 7 (the compare_oracle unknown-name precedent): the
    adjudication probe must fail fast (exit 2, before the JVM spins
    up) on a typo'd name instead of timing every earlier name and then
    dying on a KeyError. Fails on the old code (no guard)."""
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(ROOT, "tools", "time_queries.py"),
            "--sf",
            str(tmp_path),
            "definitely_not_a_registered_query",
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 2, proc.stdout + proc.stderr
    # r15 ADVICE: the error goes to stderr so receipt files (stdout
    # redirects) never ingest it, and stays visible on the terminal
    assert "unknown query name" in proc.stderr
    assert "unknown query name" not in proc.stdout
