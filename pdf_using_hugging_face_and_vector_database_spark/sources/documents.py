"""Multi-format documents source: the text-corpus counterpart of the
binaryFile PDF source (reference S1, `streamlit_app.py:127` — the
reference accepts exactly one upload format; a corpus engine must
ingest whatever the lake holds).

One reader surface over parquet / CSV / JSON-lines with the DOCUMENTS
schema enforced at the boundary (explicit schema = no inference scan:
at 100 TB a schema-inference pass over CSV/JSON is a full extra read).
Malformed rows land in a quarantine column instead of failing the job
(PERMISSIVE + columnNameOfCorruptRecord), mirroring the reference's
degrade-don't-crash OCR error handling (`streamlit_app.py:84-86`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import DOCUMENTS

CORRUPT_COL = "_corrupt_record"

# CSV cannot distinguish NULL from '' without an explicit marker: with
# the default options BOTH serialize to an empty field and read back as
# NULL, silently conflating the empty-text document — the reference's
# OCR-error sentinel (errors -> "", streamlit_app.py:84-86) — with a
# missing one (r13 review wave 5; the NULL/empty bug class). The
# Hive/MySQL \N convention keeps them distinct both ways. Documented
# boundary: a text whose ENTIRE value is the two characters \N still
# conflates with NULL (the marker-collision case inherent to CSV).
CSV_NULL_MARKER = "\\N"

# On-disk CSV landing format version (ADVICE r13: the \N markers were a
# FORMAT CHANGE, not just a reader fix).
#   v1 (pre-r13): NULL serialized as an empty field; empty-quoted
#       fields read back as NULL (the conflation the markers fix).
#   v2 (current): NULL writes \N, '' stays ''.
# CSVs landed by the v1 writer — or external CSVs using the
# empty-as-NULL convention — read DIFFERENTLY under the v2 reader:
# their empty-quoted fields come back as '' instead of NULL. Re-read
# such exports with read_documents(..., null_marker="") (the v1
# convention), or re-land them.
CSV_LANDING_FORMAT_VERSION = 2


def _schema_with_quarantine() -> T.StructType:
    return T.StructType(
        [*DOCUMENTS.fields, T.StructField(CORRUPT_COL, T.StringType(), True)]
    )


def read_documents(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    keep_corrupt: bool = False,
    null_marker: str = CSV_NULL_MARKER,
) -> DataFrame:
    """Read a documents table from ``path`` in ``format``
    (parquet | csv | json). Non-parquet reads enforce the DOCUMENTS
    schema explicitly and quarantine malformed records.
    ``null_marker`` selects the CSV NULL convention — the v2 landing
    default is \\N; pass ``""`` for v1 / external empty-as-NULL
    exports (see CSV_LANDING_FORMAT_VERSION)."""
    if format == "parquet":
        return spark.read.parquet(path)
    if format not in ("csv", "json"):
        raise ValueError(f"unsupported documents format: {format}")
    reader = (
        spark.read.format(format)
        .schema(_schema_with_quarantine())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if format == "csv":
        # multiline text fields need quoting; header matches schema names
        reader = (
            reader.option("header", "true")
            .option("multiLine", "true")
            .option("escape", '"')
            .option("nullValue", null_marker)
        )
        if null_marker:
            reader = reader.option("emptyValue", "")
    df = reader.load(path)
    if keep_corrupt:
        return df
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def write_documents(
    df: DataFrame, path: str, format: str = "parquet", mode: str = "overwrite"
) -> None:
    """Round-trip writer (test support + landing-zone export)."""
    writer = df.write.mode(mode).format(format)
    if format == "csv":
        writer = (
            writer.option("header", "true")
            .option("escape", '"')
            .option("quoteAll", "true")
            .option("nullValue", CSV_NULL_MARKER)
        )
    writer.save(path)
