"""Custom stateful streaming operator — ``applyInPandasWithState``.

The reference has no streaming at all (SURVEY.md §2.5 'streaming'
row); this is the north-star custom-stateful-operator primitive the
task calls for: per-key state maintained explicitly across
micro-batches, beyond what built-in windowed aggregation expresses.

``running_user_stats`` keeps one small (n_events, total_value,
max_event_id) tuple per user in GroupState and emits the updated
running totals each micro-batch. Scale shape: state size is
O(|distinct users|), not O(|events|); each micro-batch shuffles only
on user_id, and the Arrow batches keep the Python boundary vectorized.
An idle-timeout (``GroupStateTimeout.ProcessingTimeTimeout``) would
bound state for ever-growing key domains; the fixture's user domain is
finite so NoTimeout keeps the operator deterministic for the
stream==batch test (tests/test_stateful.py).

Batch twin (oracle-checkable shape): ``events.groupBy(user_id)
.agg(count, sum, max)`` — the test asserts final stream state equals
the batch aggregate on the same finite input.

Value-column boundary (r15 review wave 10, measured): the equality
claim above is scoped to FINITE, NON-NULL values — which the events
fixture provides. Across the Arrow boundary a SQL NULL double and a
NaN both arrive as pandas NaN, so Python cannot reproduce SQL's
split fates (sum skips NULL but PROPAGATES NaN; an all-NULL group
sums to NULL, not 0.0). This operator's pandas ``sum()`` therefore
treats both as absent: an all-NULL/NaN user totals 0.0 where the
batch twin yields NULL/NaN. One deterministic, documented fate —
pinned (with the batch twin's diverging fates measured alongside) in
tests/test_stateful.py::test_stateful_null_nan_value_boundary.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, max_event_id long"
STATE_SCHEMA = "n_events long, total_value double, max_event_id long"


def _update_user_stats(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total, max_id = state.get if state.exists else (0, 0.0, -1)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            max_id = max(max_id, int(pdf["event_id"].max()))
    state.update((n, total, max_id))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "max_event_id": [max_id],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming events -> per-user running (count, sum, max) with
    explicit per-key state; emits the current running value for every
    user seen in each micro-batch (output mode 'update')."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def run_stateful_to_memory(
    spark, sf_dir: str, query_name: str = "user_stats_stream"
) -> DataFrame:
    """Drive the stateful operator over the finite events fixture; the
    last emitted row per user is the final state."""
    from .windows import read_events_stream, stream_shuffle_partitions

    out = running_user_stats(read_events_stream(spark, sf_dir))
    with stream_shuffle_partitions(spark):
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
