"""S1 — PDF upload source (reference `streamlit_app.py:127`:
``st.file_uploader(type="pdf")``).

Spark-native: the ``binaryFile`` source over a landing directory,
type-filtered by glob — batch or streaming. Rows:
(path, modificationTime, length, content:binary).

Scale: binaryFile splits by file; pair with
``spark.sql.files.maxPartitionBytes`` and many small files coalesce
via AQE. For millions of tiny PDFs, prefer a packed format (tar/
sequence) upstream; the operator surface stays the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_pdf_dir(spark: SparkSession, path: str, glob: str = "*.pdf") -> DataFrame:
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def read_pdf_dir_stream(spark: SparkSession, path: str, glob: str = "*.pdf") -> DataFrame:
    """Streaming variant — the continuous analog of the reference's
    one-file-per-interaction upload loop. Streaming sources require an
    explicit schema; binaryFile's is fixed."""
    from ..schemas import BINARY_DOCUMENTS

    return (
        spark.readStream.format("binaryFile")
        .schema(BINARY_DOCUMENTS)
        .option("pathGlobFilter", glob)
        .load(path)
    )
