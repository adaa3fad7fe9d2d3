"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference vector-database ingest pipeline
(PranjalAmbwani1305/Pdf-using-Hugging-face-and-vector-database).

The reference (``streamlit_app.py``, 151 LoC) implements:

    PDF bytes -> text extraction (+OCR fallback) -> fixed-size chunking
              -> sentence embedding (384-d) -> batched upsert into a
              cosine-metric vector index

This package re-expresses that pipeline — and the implied query surface
(cosine top-k, similarity join, metadata-filtered search, ANN) plus the
LLM-data-pipeline operator family (dedup, text analysis, multimodal
columns) — as lazy, Catalyst-optimizable PySpark DataFrame operators
designed for 100 TB scale.

Layout:
    session    SparkSession builder (AQE, Arrow, UTC)
    schemas    explicit StructTypes for the engine data model (SURVEY §1)
    io         table readers/writers over parquet
    functions/ pure-Column expression builders (vector math, text stats,
               hashing) — JVM-side, whole-stage-codegen friendly
    operators/ the operator inventory (SURVEY §2): chunker, embedder,
               search, dedup, upsert, validation, ids, pages
    sources/   document ingest (binaryFile PDF source, parse/OCR UDFs)
    streaming/ Structured Streaming ingest + windowed aggregation
    plans/     plan inspection helpers (pushdown/broadcast assertions)
"""

__version__ = "0.1.0"
