"""Streaming vocabulary ledger — the corpus token-frequency table of
an unbounded document stream kept as ADDITIVE per-epoch partials, with
the Zipf rank-frequency fit computed at read time (the incremental
form of operators.text.corpus_zipf_fit).

Token counts are the textbook additive reduction: each micro-batch
reduces to its own (t, freq) partial map-side; the fold sums partials
per token; the read path runs the SAME zipf_fit_from_vocab used by
the batch query on the folded vocabulary — so a stream-maintained
corpus-health gauge and the batch query over the union of all
delivered rows are BIT-IDENTICAL (tested), whatever the batching.
The ledger generalizes: any vocabulary readout (OOV rate, keyness)
can fold from the same store.

Replay contract: additive partials (cms_stream's class, applied
verbatim) — epoch is REQUIRED, a replayed epoch is skipped by the
overwrite contract, and the fold dedups (epoch, t) before summing so
a mid-compaction double-read cannot double-add. Epoch-less backfills
are refused (no safe sentinel for additive folds).

Store size: ≤ |batch vocabulary| rows per epoch — sublinear in the
token volume (types, not tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_pulsar_spark.operators.text import (
    vocab_counts,
    zipf_fit_from_vocab,
)
from open_pulsar_spark.streaming.segments import (
    read_segments,
    start_partial_stream,
    update_partial_store,
)

_PARTIAL_SCHEMA = "t STRING, freq LONG, epoch LONG"
_DEDUP_KEYS = ["epoch", "t"]
_CLUSTER_COLS = ["t"]


def _vocab_stream_partial(docs: DataFrame) -> DataFrame:
    """docs → per-batch (t, freq) partial counts (the SAME reduction
    as the batch query, so the fold bit-matches it)."""
    return vocab_counts(docs)


def update_vocab(
    spark: SparkSession,
    docs: DataFrame,
    store_path: str,
    epoch_id: int | None,
) -> None:
    """Fold one batch of documents into the vocabulary store. Additive
    contract: epoch is REQUIRED (replays overwrite-skip; there is no
    duplicate-tolerant fold to hide behind)."""
    if epoch_id is None:
        raise ValueError(
            "vocab_stream partials are additive: epoch-less backfills "
            "would double-add on rerun; supply an epoch id"
        )
    update_partial_store(docs, store_path, epoch_id, _vocab_stream_partial)


def read_vocab(spark: SparkSession, store_path: str) -> DataFrame:
    """The folded (t, freq) vocabulary: dedup (epoch, t) — replay and
    mid-compaction safety — then sum partials per token."""
    raw = read_segments(spark, store_path, _PARTIAL_SCHEMA)
    if raw is None:
        return spark.createDataFrame([], "t STRING, freq LONG")
    return (
        raw.dropDuplicates(["epoch", "t"])
        .groupBy("t")
        .agg(F.sum("freq").cast("bigint").alias("freq"))
    )


def zipf_readout(spark: SparkSession, store_path: str) -> DataFrame:
    """The 1-row Zipf fit from the stream-maintained vocabulary — the
    same zipf_fit_from_vocab as the batch query, so the readout
    (integer nano-log moments, identical ranking) agrees bit-for-bit
    with a batch run over the union of all delivered documents."""
    return zipf_fit_from_vocab(spark, read_vocab(spark, store_path))


def start_vocab_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    compact_max_segments: int | None = 64,
):
    """documents stream → continuously-maintained vocabulary store, on
    the shared partial-stream scaffold."""
    return start_partial_stream(
        docs_stream,
        store_path,
        checkpoint,
        partial_of=_vocab_stream_partial,
        schema=_PARTIAL_SCHEMA,
        dedup_keys=_DEDUP_KEYS,
        cluster_cols=_CLUSTER_COLS,
        compact_max_segments=compact_max_segments,
    )
