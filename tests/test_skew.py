"""Salted-join skew lever: result-invariance + actual key spreading."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.operators.skew import (
    SALT_COL,
    explode_salt,
    salted_join,
    with_salt,
)


def _skewed(spark):
    # one hot key (0) carrying 90% of the rows + a uniform tail
    rows = [(0, i) for i in range(900)] + [(k, 1000 + k) for k in range(1, 101)]
    big = spark.createDataFrame(rows, "key long, row_id long")
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(0, 101)], "key long, dim string"
    )
    return big, small


def test_salted_join_equals_plain_join(spark):
    big, small = _skewed(spark)
    got = salted_join(big, small, on="key", spread_col="row_id", n_salt=8).collect()
    want = big.join(small, "key").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert SALT_COL not in salted_join(
        big, small, on="key", spread_col="row_id"
    ).columns


def test_hot_key_spreads_over_salts(spark):
    big, _ = _skewed(spark)
    salts = (
        with_salt(big, "row_id", 8)
        .filter(F.col("key") == 0)
        .select(SALT_COL)
        .distinct()
        .count()
    )
    # 900 rows of the hot key must land in (essentially) all 8 salts
    assert salts >= 7, salts


def test_explode_salt_replicates(spark):
    _, small = _skewed(spark)
    assert explode_salt(small, 8).count() == small.count() * 8
