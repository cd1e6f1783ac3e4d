"""Streaming optimizer-statistics maintenance — the per-key count
ledger behind join-cardinality estimation, kept current as events
arrive (the incremental form of profiling.join_size_estimate's
statistics side: streaming ANALYZE).

Per-key counts are ADDITIVE, so this store runs the cms/cusum/dq
contract: epoch segments are REQUIRED (an epoch-less additive write
has no safe sentinel — a replayed backfill would double-add), reads
dedup (epoch, key) BEFORE summing so the mid-compaction double-read
window cannot double-count:

  micro-batch of events
    → (user_id, n) per-batch counts (map-side combine: batch volume
      collapses to ≤ |keys-in-batch| rows)
    → one epoch segment

  read: dedup (epoch, user_id) → sum per key → the SAME
    join_size_report estimator math as the batch query — so the
    stream-maintained statistics price the self-join identically to a
    batch ANALYZE over the union of all delivered rows, whatever the
    batching (tested).

This is the statistics-freshness story at 100 TB: cardinality
estimates are only as good as the last ANALYZE, and a count ledger
folded per micro-batch keeps ndv/N/MCV current without rescanning
history. (ndv here is exact because the ledger is keyed; a
sketch-backed ndv would plug in the KMV/HLL stores.)

Reference parity: none — extends the profiling family (SURVEY §2.10)
into the streaming layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_pulsar_spark.streaming.segments import (
    read_segments,
    start_partial_stream,
    update_partial_store,
)

_PARTIAL_SCHEMA = "user_id LONG, n LONG, epoch LONG"
_DEDUP_KEYS = ["epoch", "user_id"]
_CLUSTER_COLS = ["user_id"]


def _stats_partial(events: DataFrame) -> DataFrame:
    """events → per-batch (user_id, n) counts."""
    return events.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n")
    )


def update_stats(
    spark: SparkSession,
    events: DataFrame,
    store_path: str,
    epoch_id: int | None,
) -> None:
    """Fold one batch of events into the count ledger. ADDITIVE store:
    the epoch is mandatory (no -1 sentinel) — replaying a committed
    epoch is a no-op by overwrite, but an epoch-less duplicate would
    double-add."""
    if epoch_id is None:
        raise ValueError(
            "stats_stream is additive: epoch-less backfills would "
            "double-count on redelivery; pass a unique epoch id"
        )
    update_partial_store(events, store_path, epoch_id, _stats_partial)


def read_counts(spark: SparkSession, store_path: str) -> DataFrame:
    """The current folded (user_id, n) statistics. Dedup on
    (epoch, user_id) FIRST — see module docstring — then key-sum."""
    raw = read_segments(spark, store_path, _PARTIAL_SCHEMA)
    if raw is None:
        return spark.createDataFrame([], "user_id LONG, n LONG")
    return (
        raw.dropDuplicates(["epoch", "user_id"])
        .groupBy("user_id")
        .agg(F.sum("n").cast("bigint").alias("n"))
    )


def stats_readout(spark: SparkSession, store_path: str) -> DataFrame:
    """The graded join-size estimator table from the stream-maintained
    ledger — the SAME join_size_report as the batch query, bit-matched
    over the union of all delivered rows."""
    from open_pulsar_spark.operators.profiling import join_size_report

    return join_size_report(spark, read_counts(spark, store_path))


def start_stats_stream(
    spark: SparkSession,
    events_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    compact_max_segments: int | None = 64,
):
    """events stream → continuously-maintained count ledger, on the
    shared partial-stream scaffold."""
    return start_partial_stream(
        events_stream,
        store_path,
        checkpoint,
        partial_of=_stats_partial,
        schema=_PARTIAL_SCHEMA,
        dedup_keys=_DEDUP_KEYS,
        cluster_cols=_CLUSTER_COLS,
        compact_max_segments=compact_max_segments,
    )


def partition_plan_readout(spark: SparkSession, store_path: str) -> DataFrame:
    """Range-partition plan from the SAME stream-maintained per-key
    count ledger the join-size estimator folds — one additive
    statistics store, two planning readouts (cardinality estimation
    AND range boundaries): runs the batch query's
    partition_plan_from_counts over the folded counts, so the numbers
    bit-match events_partition_plan over the union of all delivered
    rows."""
    from open_pulsar_spark.operators.skew import partition_plan_from_counts

    return partition_plan_from_counts(
        spark,
        read_counts(spark, store_path).select(
            "user_id", F.col("n").alias("cnt")
        ),
    )
