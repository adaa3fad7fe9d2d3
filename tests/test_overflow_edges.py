"""Pins for the round-15 overflow/precision adversarial row: the raw
fixture never approaches a numeric boundary, the injected classes are
non-empty, the naive kernels crash or diverge exactly as the certified
contracts predict (including one honest cross-engine divergence and two
honest both-engines-refuse records), and no raw float crosses the
result boundary."""

from __future__ import annotations

import decimal

import duckdb
import pytest
from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.io import read_table
from pdf_using_hugging_face_and_vector_database_spark.queries import (
    OVFL_BIGMAX,
    OVFL_CLASS_MOD,
    OVFL_GROUP_CUT,
    OVFL_GROUP_MOD,
    overflow_precision_contracts,
)


def _rows(spark, sf_dir):
    return {
        r["kernel"]: r
        for r in overflow_precision_contracts(spark, sf_dir).collect()
    }


def _classed(spark, sf_dir):
    eid = F.col("event_id")
    cls_pos = (eid % OVFL_CLASS_MOD == 0) & (
        eid % OVFL_GROUP_MOD < OVFL_GROUP_CUT
    )
    return read_table(spark, sf_dir, "events").select(
        "event_id",
        cls_pos.alias("is_pos"),
        (eid % OVFL_CLASS_MOD == 1).alias("is_neg"),
        (eid % OVFL_CLASS_MOD == 2).alias("is_dbl"),
        (eid % 4 == 2).alias("is_tie"),
    )


def test_overflow_row_is_adversarial(spark, sf_dir):
    """Measured claims (the r13/r14 adversarial-row pattern):

    (1) the RAW fixture never approaches a numeric boundary — the
    value column tops out in the hundreds and even event_id*1000+7
    (the benign derived magnitude) sits orders of magnitude below
    BIGINT max — so overflow/precision contracts had zero oracle
    coverage before this row, while every injected class is provably
    non-empty;

    (2) the naive kernels fail exactly as the certified contracts
    predict: Spark's plain BIGINT sum is a query-killing
    ARITHMETIC_OVERFLOW under ANSI while DuckDB's silently promotes
    to HUGEINT (the engines do not even diverge the same way — one
    crashes, one answers), the naive multiply REFUSES in both engines
    (recorded honestly; try_multiply ↔ HUGEINT-range-CASE is the
    shared contract), and DuckDB's bare DOUBLE→BIGINT cast ROUNDS
    where Spark's ANSI cast truncates — a measured cross-engine
    divergence on every .5 tie row, which is why the certified leg
    spells truncation per engine."""
    ev = read_table(spark, sf_dir, "events")
    raw = ev.agg(
        F.max(F.abs("value")).alias("vmax"),
        F.max("event_id").alias("emax"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert raw["vmax"] < 1e6
    assert raw["emax"] * 1000 + 7 < OVFL_BIGMAX / 1e6

    cl = _classed(spark, sf_dir)
    counts = cl.agg(
        *[
            F.count(F.when(F.col(c), 1)).alias(c)
            for c in ("is_pos", "is_neg", "is_dbl", "is_tie")
        ]
    ).collect()[0]
    assert all(counts[c] > 0 for c in ("is_pos", "is_neg", "is_dbl", "is_tie"))

    rows = _rows(spark, sf_dir)
    assert set(rows) == {
        "sum_decimal_route",
        "try_sum_null_on_overflow",
        "mul_try_null",
        "mul_decimal_exact",
        "cast_range_null",
        "cast_fraction_contracts",
        "decimal_tie_round",
    }
    n = raw["n"]
    # per-row legs cover every event; group legs cover every group
    for k in (
        "mul_try_null",
        "mul_decimal_exact",
        "cast_range_null",
        "cast_fraction_contracts",
        "decimal_tie_round",
    ):
        assert rows[k]["n_rows"] == n, k
    assert rows["try_sum_null_on_overflow"]["n_rows"] == OVFL_GROUP_MOD
    # every near-max row overflows x3; no benign row does
    assert rows["mul_try_null"]["boundary_rows"] == counts["is_pos"]
    # the out-of-int-range doubles are exactly the NULL try_casts
    assert rows["cast_range_null"]["boundary_rows"] == counts["is_dbl"]
    # both try_sum fates exist at EVERY sf: near-max values land only
    # in groups 0..GROUP_CUT-1 by construction
    eid = F.col("event_id")
    benign = eid * 1000 + 7
    big_pos = F.when(
        (eid % OVFL_CLASS_MOD == 0) & (eid % OVFL_GROUP_MOD < OVFL_GROUP_CUT),
        F.lit(OVFL_BIGMAX) - eid % 1009,
    ).otherwise(benign)
    fates = (
        ev.select((eid % OVFL_GROUP_MOD).alias("g"), big_pos.alias("b"))
        .groupBy("g")
        .agg(F.try_sum("b").alias("t"))
        .select("g", F.col("t").isNull().alias("overflowed"))
        .collect()
    )
    null_groups = {r["g"] for r in fates if r["overflowed"]}
    real_groups = {r["g"] for r in fates if not r["overflowed"]}
    assert null_groups and real_groups
    assert null_groups <= set(range(OVFL_GROUP_CUT))
    assert real_groups >= set(range(OVFL_GROUP_CUT, OVFL_GROUP_MOD))

    # (2a) naive Spark sum CRASHES under ANSI; naive DuckDB sum ANSWERS
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        ev.select(big_pos.alias("b")).agg(F.sum("b")).collect()
    got = duckdb.sql(
        f"SELECT sum(x) FROM (VALUES ({OVFL_BIGMAX}), ({OVFL_BIGMAX})) t(x)"
    ).fetchone()[0]
    assert got == 2 * OVFL_BIGMAX  # HUGEINT promotion, no error

    # (2b) honest both-engines-refuse record: the naive multiply is an
    # error in BOTH engines (no silent wraparound anywhere)
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        ev.select((big_pos * F.lit(3)).alias("m")).agg(F.max("m")).collect()
    with pytest.raises(Exception, match="Out of Range"):
        duckdb.sql(f"SELECT {OVFL_BIGMAX} * 3").fetchall()
    # ... and so is the naive out-of-range cast in both
    with pytest.raises(Exception, match="CAST_OVERFLOW|cannot be cast"):
        ev.select(
            F.expr("cast(cast(1.0e10 as double) as int)").alias("c")
        ).agg(F.max("c")).collect()
    with pytest.raises(Exception, match="Conversion Error|Out of Range"):
        duckdb.sql("SELECT CAST(1.0e10 AS INTEGER)").fetchall()

    # (2c) measured cross-engine divergence: Spark's bare DOUBLE cast
    # TRUNCATES toward zero (2.7 -> 2) while DuckDB's bare DOUBLE cast
    # rounds HALF TO EVEN (2.7 -> 3, 2.5 -> 2, 3.5 -> 4) — and
    # DuckDB's DECIMAL cast rounds half AWAY from zero (2.5 -> 3), a
    # third behavior inside one engine. The certified leg spells
    # truncation per engine for exactly this reason.
    spark_cast = spark.sql(
        "SELECT cast(cast(2.7 as double) as bigint) a,"
        " cast(cast(3.5 as double) as bigint) b"
    ).collect()[0]
    duck_cast = duckdb.sql(
        "SELECT CAST(2.7::DOUBLE AS BIGINT), CAST(3.5::DOUBLE AS BIGINT),"
        " CAST(2.5::DOUBLE AS BIGINT), CAST(2.5 AS BIGINT)"
    ).fetchone()
    assert (spark_cast["a"], spark_cast["b"]) == (2, 3)  # trunc
    assert tuple(duck_cast) == (3, 4, 2, 3)  # half-even dbl, half-away dec

    # (2d) Python's default decimal rounding is banker's — it diverges
    # from the certified half-away-from-zero tie contract on any tie
    # whose kept digit is even; the third derivation must (and does)
    # use explicit ROUND_HALF_UP
    tie = decimal.Decimal("7.0050")
    half_up = tie.quantize(decimal.Decimal("0.01"), decimal.ROUND_HALF_UP)
    half_even = tie.quantize(decimal.Decimal("0.01"), decimal.ROUND_HALF_EVEN)
    assert str(half_up) == "7.01" and str(half_even) == "7.00"
    got = spark.sql(
        "SELECT cast(round(cast('7.0050' as decimal(20,4)), 2) as string) r"
    ).collect()[0]["r"]
    assert got == "7.01"

    # (3) no raw float crosses the result boundary
    from pyspark.sql import types as T

    out = overflow_precision_contracts(spark, sf_dir)
    assert not any(
        isinstance(f.dataType, (T.DoubleType, T.FloatType, T.DecimalType))
        for f in out.schema.fields
    ), out.schema


def test_overflow_contracts_deterministic(spark, sf_dir):
    a = sorted(map(tuple, _rows(spark, sf_dir).values()))
    b = sorted(map(tuple, _rows(spark, sf_dir).values()))
    assert a == b
