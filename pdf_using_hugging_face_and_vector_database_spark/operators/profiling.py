"""Data profiling + data-quality gates — the dbt-test / Deequ-style
operations a production pipeline runs before trusting a table.

Both operators are single-pass: profiling is ONE aggregation row per
table (count-distincts share the expand + one shuffle), quality rules
are conditional counts folded into the same scan; referential rules
add one anti-join each. At 100 TB these run at scan speed — no
operator here is more expensive than the query it gates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

PROFILE_SCHEMA = (
    "column string, n_nulls long, n_distinct long, "
    "min_num double, max_num double, min_str string, max_str string"
)


def profile_columns(
    df: DataFrame,
    numeric_cols: Sequence[str],
    string_cols: Sequence[str] = (),
    date_cols: Sequence[str] = (),
) -> DataFrame:
    """One profile row per column: null count, exact distinct count,
    min/max (typed — numeric columns fill min_num/max_num, string and
    date columns fill min_str/max_str; dates render as yyyy-MM-dd to
    dodge cross-engine timestamp formatting).

    Shape: a UNION of per-column single-row aggregates, each a
    column-pruned scan with the standard 2-phase partial-distinct
    aggregate. NOT one wide agg: N countDistincts in a single agg
    lower to an Expand with factor N+1 (every input row replicated
    per distinct column) — measured 18 s vs 2 s on a 600k-row table
    for N=8. The union's branches each read one column, so total IO
    is one full-width scan and every branch stays in whole-stage
    codegen."""
    branches: list[DataFrame] = []

    def _base(c: str) -> list[Column]:
        return [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_nulls"),
            F.countDistinct(c).alias("n_distinct"),
        ]

    for c in numeric_cols:
        branches.append(
            df.agg(
                *_base(c),
                F.round(F.min(c).cast("double"), 6).alias("min_num"),
                F.round(F.max(c).cast("double"), 6).alias("max_num"),
            ).select(
                F.lit(c).alias("column"),
                "n_nulls",
                "n_distinct",
                "min_num",
                "max_num",
                F.lit(None).cast("string").alias("min_str"),
                F.lit(None).cast("string").alias("max_str"),
            )
        )
    for c in string_cols:
        branches.append(
            df.agg(
                *_base(c),
                F.min(c).alias("min_str"),
                F.max(c).alias("max_str"),
            ).select(
                F.lit(c).alias("column"),
                "n_nulls",
                "n_distinct",
                F.lit(None).cast("double").alias("min_num"),
                F.lit(None).cast("double").alias("max_num"),
                "min_str",
                "max_str",
            )
        )
    for c in date_cols:
        branches.append(
            df.agg(
                *_base(c),
                F.date_format(F.min(c), "yyyy-MM-dd").alias("min_str"),
                F.date_format(F.max(c), "yyyy-MM-dd").alias("max_str"),
            ).select(
                F.lit(c).alias("column"),
                "n_nulls",
                "n_distinct",
                F.lit(None).cast("double").alias("min_num"),
                F.lit(None).cast("double").alias("max_num"),
                "min_str",
                "max_str",
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


RULES_SCHEMA = "rule string, n_rows long, n_violations long, ok boolean"


def validate_rules(
    df: DataFrame,
    rules: Sequence[tuple[str, Column]],
    anti_rules: Sequence[tuple[str, DataFrame, Column]] = (),
) -> DataFrame:
    """Constraint validation: each rule is (name, violation predicate)
    folded into one conditional-count pass over the scan;
    ``anti_rules`` are referential checks (name, right_df, join_cond)
    counting left rows with NO match — one broadcast/shuffle anti-join
    each. Output is the audit report: violations and a hard
    ok = (violations == 0)."""
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.when(pred, 1).otherwise(0)).alias(f"v__{i}")
        for i, (_, pred) in enumerate(rules)
    ]
    row = df.agg(*aggs).head()
    n_rows = int(row["__n"])
    out = [
        (name, n_rows, int(row[f"v__{i}"]), int(row[f"v__{i}"]) == 0)
        for i, (name, _) in enumerate(rules)
    ]
    for name, right, cond in anti_rules:
        n_orphans = df.join(right, cond, "left_anti").count()
        out.append((name, n_rows, n_orphans, n_orphans == 0))
    spark: SparkSession = df.sparkSession
    return spark.createDataFrame(out, RULES_SCHEMA)


def skew_report(
    df: DataFrame,
    key_col: str,
    top_n: int = 5,
) -> DataFrame:
    """Join-key skew diagnostic — the report an operator reads BEFORE
    shuffling 100 TB on a key: per-key row counts aggregated once,
    then the heavy-hitter keys with their corpus share plus the
    summary stats every skew decision needs (distinct keys, mean and
    max per-key count, skew_factor = max/mean). A skew_factor near 1
    clears the key for a plain hash shuffle; a large one routes the
    join through salting (operators/skew.salted_join) or AQE skew
    handling.

    One groupBy (the same shuffle the join would do, but counting
    only) + a top-n over the key-count table — at scale the count
    table is keys-scale, orders below the fact table.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
    )
    top = (
        counts.orderBy(F.desc("cnt"), "key")
        .limit(top_n)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("cnt"), "key")),
        )
    )
    mean_cnt = F.col("n_rows").cast("double") / F.col("n_keys").cast("double")
    return top.crossJoin(F.broadcast(stats)).select(
        "rank",
        F.col("key").cast("string").alias("key"),
        "cnt",
        F.round(F.col("cnt").cast("double") / F.col("n_rows").cast("double"), 6).alias(
            "share"
        ),
        "n_keys",
        "n_rows",
        F.round(mean_cnt, 6).alias("mean_cnt"),
        F.round(F.col("max_cnt").cast("double") / mean_cnt, 6).alias(
            "skew_factor"
        ),
    )
