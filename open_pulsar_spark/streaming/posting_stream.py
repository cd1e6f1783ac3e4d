"""Streaming posting-index maintenance — per-term bounded posting
samples of an unbounded document stream, kept as mergeable bottom-k
partial segments (the incremental form of
operators.text.term_posting_index's posting side).

A 100 TB ingest wants "which documents carry this term" answerable
without re-scanning history — contamination lookups and
exact-substring attribution consult it at serve time. The bottom-k
posting sample is the right store for the same reason the KMV sketch
is (kmv_stream's contract, same kernel, same merge):

  micro-batch of (doc_id, source, text)
    → tokens → per-(term, Arrow batch) bottom-k doc_id partial
      (the SAME sketch.bottom_k_kernel the batch index runs —
      truncation inside the map task, ≤ k rows per term per batch)
    → one epoch segment of (term, doc_id) rows

  fold: bottom-k of the distinct union of all segment rows per term
    == the batch sample of the union of all batches' rows, exactly —
    so a stream-maintained posting sample and term_posting_index's
    over the same rows are BIT-IDENTICAL (tested), whatever the
    batching.

Replay contract: identical to kmv_stream — epoch-overwrite segments
give exactly-once partials under at-least-once foreachBatch, and the
fold is duplicate-TOLERANT (array_distinct before the slice), so
crash-duplicated rows and repeated epoch-less backfills cannot change
the result.

Scale: each epoch segment holds ≤ k rows per term SEEN IN THAT BATCH
(not per term in the vocabulary); the read-side merge is O(live
segment rows). Serving a bounded query (the usual case) should pass
`terms` to read_postings so the merge aggregates only the probed
terms — maintaining the full vocabulary's samples is the index
builder's job, probing a handful is the serve path's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_pulsar_spark.operators.text import _posting_kernel, _posting_merge
from open_pulsar_spark.streaming.segments import (
    auto_compact,
    read_segments,
    segment_path,
    write_segment,
)

_PARTIAL_SCHEMA = "term STRING, doc_id LONG, epoch LONG"


def update_postings(
    spark: SparkSession,
    docs: DataFrame,
    store_path: str,
    epoch_id: int | None,
) -> None:
    """Fold one batch of (doc_id, ..., text) rows into the posting
    store: tokens → bottom-k partial rows → one epoch segment.
    Idempotent per epoch (overwrite; no-op once committed); epoch-less
    calls write a unique batch segment, safe because the fold is
    duplicate-tolerant (module docstring)."""
    if epoch_id is not None:
        seg, committed = segment_path(store_path, epoch_id)
        if committed:
            return
    tok = docs.select(
        F.explode(F.split("text", " ")).alias("term"), "doc_id"
    )
    partial = tok.select("term", "doc_id").mapInPandas(
        _posting_kernel(), "term STRING, doc_id LONG"
    ).withColumn(
        "epoch", F.lit(-1 if epoch_id is None else epoch_id).cast("long")
    )
    write_segment(partial, store_path, epoch_id)


def read_postings(
    spark: SparkSession,
    store_path: str,
    terms: list[str] | None = None,
) -> DataFrame:
    """The current merged samples (term, posting_sample) — the
    bottom-k of the distinct union of every segment's rows,
    bit-identical to the batch index's sample over the same rows.
    Pass `terms` to merge only the probed terms (the serve path)."""
    raw = read_segments(spark, store_path, _PARTIAL_SCHEMA)
    if raw is None:
        return spark.createDataFrame(
            [], "term STRING, posting_sample STRING"
        )
    rows = raw.select("term", "doc_id")
    if terms is not None:
        rows = rows.where(F.col("term").isin(list(terms)))
    return _posting_merge(rows)


def start_posting_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    compact_max_segments: int | None = 64,
):
    """docs(doc_id, ..., text) stream → continuously-maintained
    posting store. File-level auto-compaction bounds the segment
    count; the duplicate-tolerant fold makes the mid-compaction
    window a non-event (the kmv_stream contract)."""

    def step(batch_df: DataFrame, epoch_id: int) -> None:
        update_postings(spark, batch_df, store_path, epoch_id)
        auto_compact(
            spark,
            store_path,
            _PARTIAL_SCHEMA,
            dedup_keys=["epoch", "term", "doc_id"],
            cluster_cols=["term"],
            max_segments=compact_max_segments,
        )

    return (
        docs_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(step)
        .start()
    )
