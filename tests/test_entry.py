"""Driver-contract smoke: entry() runs, queries()/oracle_sql() are
consistent, every query executes at sf0.001."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"id", "doc_id", "chunk_index", "source", "score"}
    # scores are cosine values, descending
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in scores)


def test_oracle_keys_subset_of_queries():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    # the vast majority of queries must be oracle-checked
    assert len(o) >= 20


def test_all_queries_run(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        n = df.count()
        assert n >= 0, name
