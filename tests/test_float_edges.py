"""Pins for the round-14 float-edge adversarial row: the raw fixture
is special-free, the injected classes are non-empty, the naive kernel
variants diverge, and no raw special float ever crosses the result
boundary (the driver's pandas comparator must never see a NaN cell)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.io import read_table
from pdf_using_hugging_face_and_vector_database_spark.queries import (
    FLOATEDGE_MOD,
    float_edge_contracts,
)


def _rows(spark, sf_dir):
    return {
        r["kernel"]: r for r in float_edge_contracts(spark, sf_dir).collect()
    }


def test_float_edge_query_is_adversarial(spark, sf_dir):
    """Measured claims (the r13/r14 adversarial-row pattern):

    (1) the RAW fixture's value column carries ZERO NaN / ±Infinity
    (and every value is finite), so the special-float contracts had
    never been certified before this row, while every injected class
    is provably non-empty;

    (2) naive kernels diverge: a nanvl-cleaning max (the common
    NaN-suppressing idiom) reports +Inf where the certified contract
    is NaN; Python's IEEE semantics (``nan != nan``) fragment NaN
    grouping into distinct dict entries AND leave a naive ``sorted()``
    with NaN mid-sequence, where BOTH engines fold NaN to one key and
    sort it greatest — the SQL-vs-IEEE divergence is exactly why the
    contracts need pinning. (Measured non-divergence recorded too: the
    ``x = x`` filter keeps NaN in BOTH engines because SQL equality —
    unlike IEEE — holds NaN equal to itself.)"""
    ev = read_table(spark, sf_dir, "events")
    raw = ev.select(
        F.sum(F.isnan("value").cast("int")).alias("nans"),
        F.sum((F.abs("value") == F.lit(float("inf"))).cast("int")).alias(
            "infs"
        ),
    ).collect()[0]
    assert (raw["nans"], raw["infs"]) == (0, 0)

    n = ev.count()
    per_class = {
        k: ev.filter(F.col("event_id") % FLOATEDGE_MOD == k).count()
        for k in range(5)
    }
    assert all(v > 0 for v in per_class.values())

    rows = _rows(spark, sf_dir)
    assert set(rows) == {
        "rank_total_order",
        "group_fold",
        "agg_propagation",
        "join_special_keys",
        "div_zero_null",
    }
    n_special = per_class[0] + per_class[1] + per_class[2]
    assert rows["rank_total_order"]["n_rows"] == n
    assert rows["rank_total_order"]["specials_touched"] == n_special
    # NaN folds to ONE group, +Inf/-Inf one each -> special group mass
    # equals the injected special rows
    assert rows["group_fold"]["specials_touched"] == n_special
    # +-0.0 fold: the joined row count covers all five injected classes
    # through FOUR distinct dim keys (NaN, Inf, -Inf, the folded zero)
    assert rows["join_special_keys"]["n_rows"] >= per_class[3] + per_class[4]
    # div contract: NaN/Inf rows divide by NaN -> NaN; finite (incl.
    # the zero classes) divide by exact 0.0 -> NULL
    assert rows["div_zero_null"]["specials_touched"] == n_special
    assert rows["div_zero_null"]["n_rows"] == n

    # (2a) the nanvl-cleaning max kernel diverges: certified max class
    # is 'nan' (NaN is greatest), the cleaned kernel reports +Inf
    m = F.col("event_id") % FLOATEDGE_MOD
    x = (
        F.when(m == 0, F.lit(float("nan")))
        .when(m == 1, F.lit(float("inf")))
        .when(m == 2, F.lit(float("-inf")))
        .when(m == 3, F.expr("CAST('-0.0' AS DOUBLE)"))
        .when(m == 4, F.lit(0.0))
        .otherwise(F.col("value"))
    )
    certified_max = ev.select(x.alias("x")).agg(F.max("x")).collect()[0][0]
    assert math.isnan(certified_max)
    cleaned_max = (
        ev.select(x.alias("x"))
        .agg(F.max(F.nanvl(F.col("x"), F.lit(None))))
        .collect()[0][0]
    )
    assert cleaned_max == float("inf") and not math.isnan(cleaned_max)

    # (2b) measured NON-divergence, recorded: SQL equality holds
    # NaN = NaN (unlike IEEE), so the x = x filter drops NOTHING in
    # Spark — the IEEE-style NaN-drop idiom is not expressible as a
    # plain self-equality there
    kept = ev.select(x.alias("x")).filter(F.col("x") == F.col("x")).count()
    assert kept == n

    # (2c) Python-naive NaN handling diverges both ways: dict grouping
    # fragments where SQL folds, and sorted() leaves NaN mid-sequence
    # where both engines sort it greatest
    d = {}
    for v in (float("nan"), float("nan")):
        d[v] = d.get(v, 0) + 1
    assert len(d) == 2  # two NaN instances -> two dict keys in Python
    s = sorted([3.0, float("nan"), 1.0, 2.0])
    assert not (
        s[0] <= s[-1] and math.isnan(s[-1])
    )  # naive sort neither totals nor places NaN last

    # (3) no raw special float crosses the result boundary: the output
    # schema carries no floating-point column at all
    from pyspark.sql import types as T

    out = float_edge_contracts(spark, sf_dir)
    assert not any(
        isinstance(f.dataType, (T.DoubleType, T.FloatType))
        for f in out.schema.fields
    ), out.schema


def test_float_edge_contracts_deterministic(spark, sf_dir):
    a = sorted(map(tuple, _rows(spark, sf_dir).values()))
    b = sorted(map(tuple, _rows(spark, sf_dir).values()))
    assert a == b
    assert not any(
        isinstance(v, float) and math.isnan(v) for row in a for v in row
    )
