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
