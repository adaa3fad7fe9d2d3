"""Streaming exact dedup — the dedup operator family's streaming twin.

``dropDuplicates`` on a stream keeps per-key state of every key seen;
``dropDuplicatesWithinWatermark`` bounds that state by the watermark
(keys older than the watermark are evicted — the only way dedup state
stays finite on an unbounded stream). The reference's upsert-by-id
last-writer-wins (`streamlit_app.py:102,110`) is the batch analog:
first-writer-wins per key within the watermark horizon.

Batch twin for the test: distinct (user_id, event_type) pairs — the
streamed result must cover exactly the same key set (which physical
row survives per key is arrival-order-dependent, so tests compare key
sets, not rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_events_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """First-seen-wins streaming dedup on ``keys``. With a watermark,
    state is bounded (dropDuplicatesWithinWatermark); without, state
    grows with distinct keys (only safe for finite key domains)."""
    if watermark is not None:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return events.dropDuplicates(list(keys))


def run_dedup_to_memory(
    spark, sf_dir: str, query_name: str = "events_dedup_stream"
) -> DataFrame:
    from .windows import read_events_stream, stream_shuffle_partitions

    out = dedup_events_stream(read_events_stream(spark, sf_dir))
    with stream_shuffle_partitions(spark):
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")

def incremental_dedup_stream(
    batch_stream: DataFrame,
    corpus_sigs: DataFrame,
    num_hashes: int = 16,
    ngram: int = 7,
    bands: int = 4,
) -> DataFrame:
    """STREAM-STATIC join flavor of incremental dedup: a stream of new
    documents is signed per-row (stateless array-fold MinHash — no
    aggregation, so append mode needs no watermark), banded, and inner-
    joined against the STATIC corpus signature table (the persisted
    fingerprint-keyed store). Emits one candidate row per (batch doc,
    corpus doc, band) collision with the exact MinHash Jaccard
    estimate; cross-band pair dedup is a batch step over the sink
    (dropDuplicates in-stream would grow unbounded state for no
    benefit on an append-only candidate feed).

    Scale: the static side is re-read per micro-batch (Spark's
    stream-static contract — it also picks up corpus-store updates
    between micro-batches); bucket the signature store by band hash to
    co-locate the join. Per-micro-batch the stream side is small, so
    state is zero — this operator is stateless end to end.
    """
    from ..operators.dedup import (
        banded_signatures,
        minhash_jaccard_est,
        with_minhash,
    )

    signed = with_minhash(
        batch_stream, text_col="text", num_hashes=num_hashes, ngram=ngram
    )
    banded = banded_signatures(
        signed, "doc_id", "minhash", num_hashes, bands, "batch_id", "sig_b"
    )
    cbanded = banded_signatures(
        corpus_sigs, "doc_id", "minhash", num_hashes, bands, "corpus_id", "sig_c"
    )
    est = minhash_jaccard_est(F.col("sig_b"), F.col("sig_c"), num_hashes)
    return banded.join(cbanded, ["band_index", "band_sig"]).select(
        "batch_id", "corpus_id", est.alias("jaccard_est")
    )


def run_incremental_dedup_to_memory(
    spark,
    sf_dir: str,
    query_name: str = "incremental_dedup_stream",
    num_hashes: int = 16,
    ngram: int = 7,
    bands: int = 4,
    trunc: int = 10,
) -> DataFrame:
    """Drive the stream-static incremental dedup over the finite batch
    fixture (same derivation as the batch dedup_incremental query:
    docs ≡0 mod 5 truncated, ≡1 mod 5 reversed) and return the sunk
    candidate rows. The caller passes the same constants as the batch
    twin so the two share one oracle."""
    import os

    from .windows import stream_shuffle_partitions

    path = os.path.join(sf_dir, "documents.parquet")
    static_schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(static_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    ).select("doc_id", "text")
    from ..operators.dedup import derive_incremental_batch, persisted_signatures
    from ..io import read_table

    batch_stream = derive_incremental_batch(stream, trunc=trunc)

    corpus = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus_sigs = persisted_signatures(
        spark, sf_dir, corpus, num_hashes, ngram, "char", "char7base"
    )
    out = incremental_dedup_stream(
        batch_stream, corpus_sigs, num_hashes=num_hashes, ngram=ngram, bands=bands
    )
    with stream_shuffle_partitions(spark):
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
