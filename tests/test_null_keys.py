"""Pins for the round-14 NULL-bearing-keys adversarial row: the raw
fixture is NULL-free, the derived key classes are provably non-empty,
and each naive kernel variant (default-placement window order, `!=`
change detection, unmasked as-of) actually diverges from the pinned
contract — so the row certifies NULL semantics, not fixture luck."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.io import read_table
from pdf_using_hugging_face_and_vector_database_spark.queries import (
    NULLKEY_CLASS,
    NULLKEY_NULL_TAG,
    NULLKEY_TS_MOD,
    null_keys_contracts,
)


def _rows(spark, sf_dir):
    out = null_keys_contracts(spark, sf_dir)
    return {r["kernel"]: r for r in out.collect()}


def _keyed_events(spark, sf_dir):
    return read_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.nullif(F.col("event_type"), F.lit(NULLKEY_CLASS)).alias("k"),
        "event_type",
    )


def test_null_keys_query_is_adversarial(spark, sf_dir):
    """Two claims, both measured (the r13 hostile-text precedent):

    (1) the RAW fixture carries ZERO NULLs in any key column the row
    touches — the NULL family had never been certified by a driver row
    before this one — while the derived input provably contains NULL
    keys in every class the row drives;

    (2) the row DISCRIMINATES the naive kernel classes: Spark's
    DEFAULT ascending order places NULLs FIRST (DuckDB places them
    LAST), so the un-pinned window rank digest differs; a naive `!=`
    change detector misses every NULL<->value transition; plain
    equality drops every NULL join key that null-safe equality keeps;
    and the unmasked as-of kernel hands a NULL-time probe the user's
    latest click instead of the no-match contract."""
    ev = _keyed_events(spark, sf_dir)

    # (1a) the raw fixture is NULL-free on every touched column
    raw = ev.select(
        F.sum(F.col("event_id").isNull().cast("int")).alias("ids"),
        F.sum(F.col("user_id").isNull().cast("int")).alias("users"),
        F.sum(F.col("ts").isNull().cast("int")).alias("ts"),
        F.sum(F.col("event_type").isNull().cast("int")).alias("types"),
    ).collect()[0]
    assert (raw["ids"], raw["users"], raw["ts"], raw["types"]) == (0, 0, 0, 0)

    # (1b) the derived classes are non-empty: nullif produces NULL keys
    # and the modulus produces NULL as-of probe times
    n_null_k = ev.filter(F.col("k").isNull()).count()
    assert n_null_k > 0
    n_null_tsk = ev.filter(
        (F.col("event_type") == "purchase")
        & (F.col("event_id") % NULLKEY_TS_MOD == 0)
    ).count()
    assert n_null_tsk > 0

    rows = _rows(spark, sf_dir)
    assert set(rows) == {
        "window_rank_asc",
        "window_rank_desc",
        "grouped_nulls",
        "join_drop",
        "join_null_safe",
        "change_detect",
        "asof_null_key",
    }
    # nulls_touched certifies NULL presence inside the gated output
    assert rows["window_rank_asc"]["nulls_touched"] == n_null_k
    assert rows["grouped_nulls"]["nulls_touched"] == n_null_k
    assert rows["asof_null_key"]["nulls_touched"] == n_null_tsk

    # (2a) default ascending order (Spark: NULLS FIRST) diverges from
    # the pinned ASC NULLS LAST digest
    from pdf_using_hugging_face_and_vector_database_spark.functions.hashing import (
        md5_int,
    )

    w_naive = Window.partitionBy("user_id").orderBy("k", "event_id")
    naive_digest = (
        ev.select("user_id", "k", F.row_number().over(w_naive).alias("rn"))
        .agg(
            F.sum(
                md5_int(
                    F.concat_ws(
                        ":",
                        F.col("user_id").cast("string"),
                        F.col("rn").cast("string"),
                        F.coalesce(F.col("k"), F.lit(NULLKEY_NULL_TAG)),
                    )
                )
            ).cast("long")
        )
        .collect()[0][0]
    )
    assert naive_digest != rows["window_rank_asc"]["digest"]

    # (2b) naive != change detection misses exactly the null-involved
    # transitions
    wcd = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cd = ev.select("k", F.lag("k").over(wcd).alias("prev"))
    naive_changes = cd.filter(F.col("k") != F.col("prev")).count()
    contract = rows["change_detect"]
    assert naive_changes != contract["n_rows"]
    assert contract["n_rows"] - naive_changes == contract["nulls_touched"]
    assert contract["nulls_touched"] > 0

    # (2c) plain equality drops exactly the NULL-key rows null-safe
    # equality keeps
    drop, safe = rows["join_drop"], rows["join_null_safe"]
    assert drop["nulls_touched"] == n_null_k
    assert safe["n_rows"] - drop["n_rows"] == n_null_k
    assert safe["nulls_touched"] == n_null_k

    # (2d) the UNMASKED as-of kernel hands NULL-time probes the user's
    # latest click under NULLS LAST — the mask is load-bearing
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.when(F.col("event_id") % NULLKEY_TS_MOD == 0, F.lit(None))
        .otherwise(F.col("ts"))
        .alias("tsk"),
    )
    clicks = ev.filter(F.col("event_type") == NULLKEY_CLASS).select(
        "user_id", "ts"
    )
    tagged = purchases.withColumn(
        "__click_ts", F.lit(None).cast("timestamp")
    ).unionByName(
        clicks.select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id",
            F.col("ts").alias("tsk"),
            F.col("ts").alias("__click_ts"),
        )
    )
    wa = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("tsk").asc_nulls_last(), F.col("__click_ts").asc_nulls_last()
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unmasked = (
        tagged.withColumn(
            "match", F.last("__click_ts", ignorenulls=True).over(wa)
        )
        .filter(F.col("event_id").isNotNull())
        .agg(
            F.sum(
                md5_int(
                    F.concat_ws(
                        ":",
                        F.col("event_id").cast("string"),
                        F.coalesce(
                            F.unix_micros(F.col("match")).cast("string"),
                            F.lit(NULLKEY_NULL_TAG),
                        ),
                    )
                )
            ).cast("long")
        )
        .collect()[0][0]
    )
    assert unmasked != rows["asof_null_key"]["digest"]


def test_null_keys_contracts_deterministic(spark, sf_dir):
    """Digest stability: two independent builds collect identical rows
    (rank tiebreaks are total orders; digests are order-insensitive
    sums)."""
    a = sorted(map(tuple, _rows(spark, sf_dir).values()))
    b = sorted(map(tuple, _rows(spark, sf_dir).values()))
    assert a == b
