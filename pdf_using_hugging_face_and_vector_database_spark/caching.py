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


def scoped_caches():
    """Context manager releasing only the caches registered INSIDE the
    scope — the store-build hygiene (round 8): a persisted-store build
    may cache intermediates (e.g. the PPJoin vocabulary, whose
    two-branch reuse is the r7 scale lesson), but once the result is
    on parquet those caches are dead weight for the rest of the
    session; callers outside the scope keep theirs."""
    import contextlib

    @contextlib.contextmanager
    def _scope():
        start = len(_PERSISTED)
        try:
            yield
        finally:
            for df in _PERSISTED[start:]:
                try:
                    df.unpersist()
                except Exception:
                    pass
            del _PERSISTED[start:]

    return _scope()


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
