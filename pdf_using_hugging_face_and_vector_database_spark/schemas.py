"""Explicit StructType schemas for the engine data model (SURVEY.md §1).

The reference keeps all schemas implicit/duck-typed; its only schema
declarations are the index DDL (dim=384, metric=cosine,
``streamlit_app.py:49``) and a runtime dimension assertion
(``streamlit_app.py:142-143``). We make every abstraction an explicit
columnar schema.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Reference D1/D2 (`streamlit_app.py:62-63`): raw document + extracted text.
DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

# Reference D3 (`streamlit_app.py:34-35`): one row per chunk instead of a
# Python list of langchain Documents.
CHUNKS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("chunk_index", T.IntegerType(), False),
        T.StructField("chunk_text", T.StringType(), True),
    ]
)

# Reference D4 (`streamlit_app.py:94`): np.ndarray(n, 384) -> array column.
EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

# Reference D5 (`streamlit_app.py:102,147`): (id, values, metadata) upsert
# tuple -> persisted vectors table. Keyed by (doc_id, chunk_index) — the
# reference's positional `doc-{i}` ids silently collide across uploads
# (documented divergence, SURVEY.md §2.3 T4).
VECTORS = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("chunk_index", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("ingest_version", T.LongType(), False),
    ]
)

# Multimodal raw-binary ingest row (Spark binaryFile source shape).
BINARY_DOCUMENTS = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("modificationTime", T.TimestampType(), True),
        T.StructField("length", T.LongType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)

# Per-page rows emitted by the PDF page scan (S2/S3).
PAGES = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("page_no", T.IntegerType(), False),
        T.StructField("page_text", T.StringType(), True),
        T.StructField("page_png", T.BinaryType(), True),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

# The reference's fixed embedding geometry (`streamlit_app.py:49,142`).
REFERENCE_DIM = 384
REFERENCE_METRIC = "cosine"
# The oracle fixture space (64-d unit vectors, FIXTURES.md).
FIXTURE_DIM = 64

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
