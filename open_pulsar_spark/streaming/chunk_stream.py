"""Streaming chunk-store maintenance — the content-addressable-store
ledger of an unbounded multimodal ingest, kept as additive epoch
partials (the incremental form of operators.multimodal.
multimodal_chunk_dedup).

A blob store ingesting media payloads at 100 TB wants "how much of
what arrived is byte-identical at chunk granularity" continuously —
the number that sizes the dedup store and decides whether snapshots
chunk-dedup — without re-scanning history:

  micro-batch of (doc_id, text, …) payload rows
    → with_binary_payload → fixed-offset chunk explode
    → per-(kind, xxhash64(chunk)) counts (multimodal.chunk_counts —
      the SAME producer as the batch query)
    → one epoch segment of (kind, h, cnt, blen) rows

  fold: dedup (epoch, kind, h) → sum cnt / max blen per (kind, h) →
    multimodal.chunk_stats — equals the batch query over the union of
    all delivered rows exactly, whatever the batching (tested).

Replay contract: ADDITIVE store (dq_stream/cms_stream's class): a
double-counted epoch would inflate cnt, so exactly-once rests on the
epoch-overwrite segment protocol (a replayed epoch overwrites its own
partial), reads dedup on (epoch, kind, h) first so the mid-compaction
duplicate window cannot double-count, and the epoch id is REQUIRED —
there is no -1 backfill sentinel; backfills reserve their own epochs.

Store size: ≤ distinct-chunks-per-batch rows per epoch (8-byte hash
keys, never the chunk bytes); compaction is file-level; same-(kind, h)
rows are deliberately NOT collapsed across epochs — rows keep their
epoch so the epoch-overwrite replay contract stays well-defined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_pulsar_spark.operators.multimodal import chunk_counts, chunk_stats
from open_pulsar_spark.streaming.segments import (
    auto_compact,
    read_segments,
    update_partial_store,
)

_CHUNK_SCHEMA = "kind STRING, h LONG, cnt LONG, blen INT, epoch LONG"
_DEDUP_KEYS = ["epoch", "kind", "h"]
_CLUSTER_COLS = ["kind"]


def update_chunks(
    spark: SparkSession,
    docs: DataFrame,
    store_path: str,
    epoch_id: int,
) -> None:
    """Fold one batch's chunk counts into the store. Idempotent per
    epoch (overwrite; no-op once committed). The epoch is REQUIRED:
    the fold is additive, so an epoch-less rerun would double-count
    (dq_stream contract)."""
    if epoch_id is None:
        raise ValueError(
            "chunk store is additive: every write needs its own epoch id"
        )
    update_partial_store(docs, store_path, epoch_id, chunk_counts)


def read_chunk_counts(spark: SparkSession, store_path: str) -> DataFrame:
    """The current merged (kind, h, cnt, blen) ledger: dedup on
    (epoch, kind, h) FIRST — the mid-compaction duplicate window —
    then the additive fold."""
    raw = read_segments(spark, store_path, _CHUNK_SCHEMA)
    if raw is None:
        return spark.createDataFrame(
            [], "kind STRING, h LONG, cnt LONG, blen INT"
        )
    return (
        raw.dropDuplicates(_DEDUP_KEYS)
        .groupBy("kind", "h")
        .agg(
            F.sum("cnt").cast("bigint").alias("cnt"),
            F.max("blen").alias("blen"),
        )
    )


def chunk_dedup_stats(spark: SparkSession, store_path: str) -> DataFrame:
    """Per-kind dedup statistics from the stream-maintained store —
    the same chunk_stats expression as the batch query, so the numbers
    agree bit-for-bit with multimodal_chunk_dedup over the union of
    all delivered rows."""
    return chunk_stats(read_chunk_counts(spark, store_path)).orderBy("kind")


def start_chunk_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    compact_max_segments: int | None = 64,
):
    """docs(doc_id, text, …) stream → continuously-maintained chunk
    store. Not on start_partial_stream: the additive fold must never
    see a -1 backfill sentinel, so the step calls update_chunks (which
    enforces the epoch) rather than the shared epoch-optional writer
    (same posture as start_dq_stream)."""

    def step(batch_df: DataFrame, epoch_id: int) -> None:
        update_chunks(spark, batch_df, store_path, epoch_id)
        auto_compact(
            spark,
            store_path,
            _CHUNK_SCHEMA,
            dedup_keys=_DEDUP_KEYS,
            cluster_cols=_CLUSTER_COLS,
            max_segments=compact_max_segments,
        )

    return (
        docs_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(step)
        .start()
    )
