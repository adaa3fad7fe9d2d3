"""Plan-shape assertions (SURVEY.md §4): the properties that decide
whether a query survives a 100×-1000× scale-up are visible in the
formatted physical plan — filter pushdown into the parquet scan,
column pruning (ReadSchema), broadcast vs shuffle join selection, and
TakeOrderedAndProject for top-k. tests/test_plans.py pins them so a
refactor that silently loses a pushdown fails CI.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if the scan's PushedFilters mention every fragment (e.g. a
    column name) — i.e. the predicate reached the parquet reader."""
    plan = formatted_plan(df)
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    pushed = ", ".join(m)
    return all(f in pushed for f in fragments)


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column sets actually read by each scan (column pruning check:
    a count over a 384-float vector table must NOT read the vectors)."""
    plan = formatted_plan(df)
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def has_shuffle_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def has_take_ordered(df: DataFrame) -> bool:
    """orderBy().limit(k) must lower to TakeOrderedAndProject — a
    per-partition top-k + driver merge, never a full global sort."""
    return "TakeOrderedAndProject" in formatted_plan(df)


def count_nodes(df: DataFrame, op: str) -> int:
    """Number of physical operators named ``op``, counted via the
    formatted plan's numbered operator headers — the tree line and the
    detail block never double-count, and expression text (which may
    mention the same word) is not consulted."""
    return len(re.findall(rf"\(\d+\) {re.escape(op)}\b", formatted_plan(df)))


def window_arguments(df: DataFrame) -> list[str]:
    """The Arguments line of every Window operator's detail block —
    i.e. the window-function list actually evaluated per pass. Lets a
    test assert 'this aggregate is computed once' against the
    operator's own expression list instead of substring-counting the
    whole plan dump."""
    plan = formatted_plan(df)
    return re.findall(
        r"\(\d+\) Window\nInput[^\n]*\nArguments: ([^\n]*)", plan
    )


def count_shuffles(df: DataFrame) -> int:
    """Number of Exchange operators (counted via the formatted plan's
    numbered operator headers, so the tree line and its detail block
    aren't double-counted)."""
    return len(re.findall(r"\(\d+\) Exchange", formatted_plan(df)))
