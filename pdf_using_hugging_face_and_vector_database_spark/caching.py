"""Session-lifetime cache registry.

Operators that persist intermediates (LSH signature tables, candidate
pair sets, gram sets) register them here instead of calling
``.persist()`` bare, so a long-lived session running many queries (the
driver runs the full registry back-to-back) can release accumulated
executor memory between queries: ``__spark_entry__.queries()`` wraps
every registered query to call :func:`release_caches` first — by then
the previous query's result has been collected, so its intermediates
are dead weight.

At cluster scale the same registry is the handle a pipeline scheduler
uses to pin an index (signature table) across queries and drop it when
the stage retires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() + register for later release_caches()."""
    df.persist()
    _PERSISTED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked intermediate; returns how many."""
    n = len(_PERSISTED)
    for df in _PERSISTED:
        try:
            df.unpersist()
        except Exception:
            pass  # session may already be stopped
    _PERSISTED.clear()
    return n
