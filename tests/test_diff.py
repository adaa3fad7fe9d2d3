"""table_diff: change classification, null-safe compares, canonical
changed-column sets."""

from __future__ import annotations

from pdf_using_hugging_face_and_vector_database_spark.operators.diff import table_diff

SCHEMA = "k long, a string, b string"


def test_change_classes_and_null_safety(spark):
    old = spark.createDataFrame(
        [
            (1, "x", "y"),      # unchanged -> dropped
            (2, "x", "y"),      # b changes
            (3, None, "y"),     # a: NULL -> value (change)
            (4, "x", None),     # b: NULL -> NULL (no change) + a changes
            (5, "x", "y"),      # deleted
        ],
        SCHEMA,
    )
    new = spark.createDataFrame(
        [
            (1, "x", "y"),
            (2, "x", "z"),
            (3, "v", "y"),
            (4, "w", None),
            (6, "n", "m"),      # inserted
        ],
        SCHEMA,
    )
    out = {
        r.k: (r.change_type, list(r.changed_cols))
        for r in table_diff(old, new, ["k"], ["a", "b"]).collect()
    }
    assert out == {
        2: ("update", ["b"]),
        3: ("update", ["a"]),
        4: ("update", ["a"]),
        5: ("delete", []),
        6: ("insert", []),
    }


def test_multi_column_change_is_sorted(spark):
    old = spark.createDataFrame([(1, "x", "y")], SCHEMA)
    new = spark.createDataFrame([(1, "p", "q")], SCHEMA)
    (row,) = table_diff(old, new, ["k"], ["b", "a"]).collect()
    assert row.change_type == "update"
    assert list(row.changed_cols) == ["a", "b"]


def test_identical_snapshots_diff_empty(spark):
    df = spark.createDataFrame([(1, "x", "y"), (2, None, None)], SCHEMA)
    assert table_diff(df, df, ["k"], ["a", "b"]).count() == 0


def test_entity_resolution_links_back_to_source(spark, sf_dir):
    """Every corrupted record must resolve to its own source row with
    edit distance exactly 1 (one deleted character)."""
    from pdf_using_hugging_face_and_vector_database_spark.queries import entity_resolution

    rows = entity_resolution(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.match_id == r.dirty_id - 1000000
        assert r.lev == 1


def test_best_match_tie_breaks_and_max_dist(spark):
    from pdf_using_hugging_face_and_vector_database_spark.operators.linkage import (
        best_match,
    )

    clean = spark.createDataFrame(
        [(1, "alpha", 0), (2, "alphx", 0), (3, "omega", 0)],
        "id long, name string, blk int",
    )
    dirty = spark.createDataFrame(
        [(10, "alph", 0), (11, "zzzzzzzzzz", 0)],
        "id long, name string, blk int",
    )
    out = {
        r.dirty_id: (r.match_id, r.lev)
        for r in best_match(
            dirty, clean, block_col="blk", text_col="name", id_col="id"
        ).collect()
    }
    # 'alph' is lev 1 from both 'alpha' and 'alphx': tie -> smaller id
    assert out == {10: (1, 1)}  # 11 unresolved (beyond max_dist)


def test_best_match_composite_block_key(spark):
    """A list-valued block_col joins on every component: candidates
    sharing only one component never pair up."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.linkage import (
        best_match,
    )

    clean = spark.createDataFrame(
        [(1, "alpha", 0, "a"), (2, "alphx", 0, "b"), (3, "alpho", 1, "a")],
        "id long, name string, blk int, sfx string",
    )
    dirty = spark.createDataFrame(
        [(10, "alph", 0, "a")], "id long, name string, blk int, sfx string"
    )
    out = {
        r.dirty_id: (r.match_id, r.lev)
        for r in best_match(
            dirty,
            clean,
            block_col=["blk", "sfx"],
            text_col="name",
            id_col="id",
        ).collect()
    }
    # id 2 shares blk but not sfx; id 3 shares sfx but not blk: only
    # id 1 is a candidate even though all three are within lev 1.
    assert out == {10: (1, 1)}


def test_property_random_snapshots_match_reference(spark):
    """Randomized sweep (fixed seed): table_diff over random snapshot
    pairs — random inserts/deletes, per-column random mutations
    including NULL->value, value->NULL, and NULL->NULL — must equal a
    plain-Python reference diff exactly (change class AND the sorted
    changed-column set). All generated cases ride one Spark call."""
    import random

    rng = random.Random(0xD1FF)
    vals = ["x", "y", "z", None]
    old_rows, new_rows = [], []
    expect = {}
    k = 0
    for _ in range(200):
        k += 1
        in_old = rng.random() < 0.9
        in_new = rng.random() < 0.9 if in_old else True
        o = (rng.choice(vals), rng.choice(vals))
        n = (
            (o[0] if rng.random() < 0.6 else rng.choice(vals)),
            (o[1] if rng.random() < 0.6 else rng.choice(vals)),
        )
        if in_old:
            old_rows.append((k, *o))
        if in_new:
            new_rows.append((k, *n))
        if in_old and not in_new:
            expect[k] = ("delete", [])
        elif in_new and not in_old:
            expect[k] = ("insert", [])
        else:
            changed = sorted(
                c for c, ov, nv in (("a", o[0], n[0]), ("b", o[1], n[1]))
                if ov != nv  # Python != is null-safe for None
            )
            if changed:
                expect[k] = ("update", changed)
    old = spark.createDataFrame(old_rows, SCHEMA)
    new = spark.createDataFrame(new_rows, SCHEMA)
    got = {
        r.k: (r.change_type, list(r.changed_cols))
        for r in table_diff(old, new, ["k"], ["a", "b"]).collect()
    }
    assert got == expect


def test_table_diff_null_key_contract(spark):
    """r12 review adjudication: a NULL key is not an identity — the
    plain-equality key join reports a NULL-keyed row as delete (old)
    or insert (new), never update/same, and two NULL-keyed rows never
    cross-match. Behavior pin for the documented contract."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.diff import (
        table_diff,
    )

    old = spark.createDataFrame(
        [(None, "a"), (1, "x")], "k int, v string"
    )
    new = spark.createDataFrame(
        [(None, "a"), (1, "x")], "k int, v string"
    )
    rows = table_diff(old, new, ["k"], ["v"]).collect()
    got = sorted((r.k, r.change_type) for r in rows)
    # identical tables, but the NULL-keyed row surfaces as BOTH a
    # delete and an insert (unidentifiable); the keyed row is 'same'
    # and dropped
    assert got == [(None, "delete"), (None, "insert")]


def test_best_match_survives_empty_strings(spark):
    """r15 review wave 10 (the r14 cosine ANSI class): two EMPTY
    strings in one block produced lev = 0 over max length 0, and the
    plain division in name_sim made that pair a query-killing
    DIVIDE_BY_ZERO under Spark 4 ANSI (NULL under DuckDB's /).
    Empty-vs-empty is an exact match and now gets the one
    deterministic fate name_sim = 1.0. Fails (crashes) on the old
    code."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.linkage import (
        best_match,
    )

    dirty = spark.createDataFrame(
        [(1, "b1", ""), (2, "b1", "abc")], "id long, blk string, name string"
    )
    clean = spark.createDataFrame(
        [(10, "b1", ""), (20, "b1", "abd")], "id long, blk string, name string"
    )
    got = {
        r["dirty_id"]: r
        for r in best_match(
            dirty, clean, "blk", text_col="name", id_col="id"
        ).collect()
    }
    assert got[1]["match_id"] == 10 and got[1]["lev"] == 0
    assert got[1]["name_sim"] == 1.0
    assert got[2]["match_id"] == 20 and got[2]["name_sim"] < 1.0
