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


def test_readme_query_count_matches_registry():
    """The README's 'N named queries' figure must track len(QUERIES)
    — it drifted twice (r4 verdict); now it's pinned by the suite."""
    import os
    import re

    from pdf_using_hugging_face_and_vector_database_spark.queries import QUERIES

    readme = os.path.join(os.path.dirname(__file__), "..", "README.md")
    with open(readme) as f:
        m = re.search(r"(\d+) named queries", f.read())
    assert m, "README must state the named-query count"
    assert int(m.group(1)) == len(QUERIES)
