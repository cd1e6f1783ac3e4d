"""Streaming data-quality ledger — per-rule violation counts of an
unbounded document stream, kept as additive epoch partials (the
incremental form of operators.profiling.dq_violation_counts' row-level
rule class).

A 100 TB ingest publishes its trust report continuously, not by
re-scanning history: each micro-batch contributes one row per rule
(violations + rows checked in THAT batch), and the serve-time fold is
a plain sum — additive, mergeable, O(#rules) per epoch.

  micro-batch of (doc_id, source, text, n_chars)
    → one conditional-sum aggregate (map-only partials, single row)
    → stack to (rule, n_violations, n_checked) → one epoch segment

Replay contract: like cms_stream (the other ADDITIVE store), the fold
is duplicate-SENSITIVE — a double-counted epoch would inflate the
ledger — so exactly-once rests on the epoch-overwrite segment
protocol (a replayed epoch overwrites its own partial, never
double-adds), and reads dedup on (epoch, rule) first so the
mid-compaction duplicate window cannot double-count either. Backfills
must carry their own reserved epoch ids (update_dq requires an epoch;
there is no -1 sentinel here, unlike the duplicate-tolerant bottom-k
stores).

Rule scope: only rules that are ADDITIVE over batches belong here —
row-level predicates (ranges, null/derived-column consistency).
Cross-batch rules (uniqueness of doc_id over the whole history,
referential integrity against a mutable dimension) are NOT
batch-additive; they live in the batch suite or a keyed state store,
and this module deliberately excludes them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_pulsar_spark.streaming.segments import (
    auto_compact,
    read_segments,
    update_partial_store,
)

_LEDGER_SCHEMA = "rule STRING, n_violations LONG, n_checked LONG, epoch LONG"
_DEDUP_KEYS = ["epoch", "rule"]
_CLUSTER_COLS = ["rule"]

# (rule name, violation predicate SQL) — additive row-level rules on
# the documents stream, names shared with the batch suite where the
# semantics coincide
DQ_STREAM_RULES = [
    ("documents_nchars_mismatch", "n_chars != length(text)"),
    ("documents_null_text", "text IS NULL"),
    ("documents_short_text", "n_chars < 50"),
]


def _dq_partial(docs: DataFrame) -> DataFrame:
    """One conditional-sum aggregate over the batch → one row → stack
    to (rule, n_violations, n_checked). Map-only partials; the single
    result row is the only thing shuffled."""
    aggs = [F.count("*").cast("bigint").alias("n")]
    for i, (_, pred) in enumerate(DQ_STREAM_RULES):
        aggs.append(
            F.sum(F.when(F.expr(pred), 1).otherwise(0))
            .cast("bigint")
            .alias(f"v{i}")
        )
    arms = ", ".join(
        f"'{name}', v{i}" for i, (name, _) in enumerate(DQ_STREAM_RULES)
    )
    return docs.agg(*aggs).select(
        F.expr(
            f"stack({len(DQ_STREAM_RULES)}, {arms}) as (rule, n_violations)"
        ),
        F.col("n").alias("n_checked"),
    )


def update_dq(
    spark: SparkSession,
    docs: DataFrame,
    store_path: str,
    epoch_id: int,
) -> None:
    """Fold one batch's rule counts into the ledger. Idempotent per
    epoch (overwrite; no-op once committed). The epoch is REQUIRED:
    the fold is additive, so an epoch-less rerun would double-count —
    backfills must reserve their own epoch ids (cms_stream contract)."""
    if epoch_id is None:
        raise ValueError(
            "dq ledger is additive: every write needs its own epoch id"
        )
    update_partial_store(docs, store_path, epoch_id, _dq_partial)


def read_dq(spark: SparkSession, store_path: str) -> DataFrame:
    """The current ledger (rule, n_violations, n_checked): dedup on
    (epoch, rule) FIRST — the mid-compaction duplicate window — then
    sum. Equals the batch aggregate over the union of all delivered
    rows, whatever the batching (tested)."""
    raw = read_segments(spark, store_path, _LEDGER_SCHEMA)
    if raw is None:
        return spark.createDataFrame(
            [], "rule STRING, n_violations LONG, n_checked LONG"
        )
    return (
        raw.dropDuplicates(_DEDUP_KEYS)
        .groupBy("rule")
        .agg(
            F.sum("n_violations").cast("bigint").alias("n_violations"),
            F.sum("n_checked").cast("bigint").alias("n_checked"),
        )
        .orderBy("rule")
    )


def start_dq_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    compact_max_segments: int | None = 64,
):
    """docs(doc_id, ..., text, n_chars) stream → continuously-
    maintained DQ ledger. Not on start_partial_stream: the additive
    fold must never see a -1 backfill sentinel, so the step calls
    update_dq (which enforces the epoch) rather than the shared
    epoch-optional writer."""

    def step(batch_df: DataFrame, epoch_id: int) -> None:
        update_dq(spark, batch_df, store_path, epoch_id)
        auto_compact(
            spark,
            store_path,
            _LEDGER_SCHEMA,
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
