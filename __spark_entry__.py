"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship E1 pipeline (documents -> chunk ->
deterministic embed -> vectors -> cosine top-k with metadata filter) at
sf0.001. ``queries()`` / ``oracle_sql()`` expose the operator inventory
(SURVEY.md §2) with DuckDB oracles generated from the same constants.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pdf_using_hugging_face_and_vector_database_spark import oracle as _oracle
from pdf_using_hugging_face_and_vector_database_spark import queries as _queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _queries.flagship(spark, SMOKE_SF_DIR)


def _released(fn: Callable[[SparkSession, str], DataFrame]):
    """Release the previous query's tracked caches before building the
    next one (by then its result has been collected); keeps a long
    all-registry run from accumulating executor memory."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf_using_hugging_face_and_vector_database_spark.caching import (
            release_caches,
        )

        release_caches()
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _released(fn) for name, fn in _queries.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (ANSI, runs on the driver's
    pre-registered parquet views). As of round 4 every registered
    query has an entry — non-SQL-expressible surfaces (k-means cells,
    LSH buckets, streaming) emit seed-independent invariant rows whose
    booleans/counts the oracle re-asserts."""
    return _oracle.oracle_sql()
