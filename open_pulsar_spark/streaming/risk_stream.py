"""Streaming tail-risk monitor — the purchase-cents histogram ledger
folded per micro-batch, serving the VaR95/CVaR95 readout live (the
batch purchase_value_tail_risk, kept current).

Cents are exact integers, so the per-cents-bucket histogram is
ADDITIVE: this store runs the cms/stats/fano contract — epoch segments
are REQUIRED (an epoch-less additive write has no safe sentinel; a
replayed backfill would double-add), and reads dedup (epoch, cents)
BEFORE summing so the mid-compaction double-read window cannot
double-count:

  micro-batch of events
    → purchase slice → (cents, w) per-batch bucket counts
      (map-side combine)
    → one epoch segment

  read: dedup (epoch, cents) → sum per cents → the SAME
    tail_risk_from_cents_hist close as the batch query (VaR rank,
    boundary bucket, tail mean — all off the ledger), so the live risk
    readout bit-matches a batch scan over the union of all delivered
    events, whatever the batching (tested).

The ops story at 100 TB: the exact p95 order statistic needs full
history, so a naive implementation rescans the stream per refresh; the
folded ledger is |distinct cents| rows (value-domain-bounded) and the
readout is one prefix-scaffold pass over the ledger regardless of
event volume.

Reference parity: none — extends the monitoring/risk family
(SURVEY §2.10) into the streaming layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_pulsar_spark.streaming.segments import (
    read_segments,
    start_partial_stream,
    update_partial_store,
)

_PARTIAL_SCHEMA = "cents LONG, w LONG, epoch LONG"
_DEDUP_KEYS = ["epoch", "cents"]
_CLUSTER_COLS = ["cents"]


def _risk_partial(events: DataFrame) -> DataFrame:
    """events → per-batch (cents, w) purchase-value bucket counts —
    the same purchase slice and cents rounding as the batch query."""
    return (
        events.where(
            (F.col("event_type") == "purchase") & F.col("value").isNotNull()
        )
        .select(F.expr("cast(round(value * 100) as bigint)").alias("cents"))
        .groupBy("cents")
        .agg(F.count("*").cast("bigint").alias("w"))
    )


def update_risk(
    spark: SparkSession,
    events: DataFrame,
    store_path: str,
    epoch_id: int | None,
) -> None:
    """Fold one batch of events into the cents ledger. ADDITIVE store:
    the epoch is mandatory — replaying a committed epoch is a no-op by
    overwrite, but an epoch-less duplicate would double-add."""
    if epoch_id is None:
        raise ValueError(
            "risk_stream is additive: epoch-less backfills would "
            "double-count on redelivery; pass a unique epoch id"
        )
    update_partial_store(events, store_path, epoch_id, _risk_partial)


def read_hist(spark: SparkSession, store_path: str) -> DataFrame:
    """The current folded (cents, w) histogram. Dedup on (epoch, cents)
    FIRST — see module docstring — then bucket-sum."""
    raw = read_segments(spark, store_path, _PARTIAL_SCHEMA)
    if raw is None:
        return spark.createDataFrame([], "cents LONG, w LONG")
    return (
        raw.dropDuplicates(["epoch", "cents"])
        .groupBy("cents")
        .agg(F.sum("w").cast("bigint").alias("w"))
    )


def risk_readout(spark: SparkSession, store_path: str) -> DataFrame:
    """The live VaR95/CVaR95 readout from the stream-maintained ledger
    — the SAME tail_risk_from_cents_hist close as the batch
    purchase_value_tail_risk, bit-matched over the union of all
    delivered events."""
    from open_pulsar_spark.operators.analytics import tail_risk_from_cents_hist

    return tail_risk_from_cents_hist(spark, read_hist(spark, store_path))


def start_risk_stream(
    spark: SparkSession,
    events_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    compact_max_segments: int | None = 64,
):
    """events stream → continuously-maintained purchase-cents ledger,
    on the shared partial-stream scaffold."""
    return start_partial_stream(
        events_stream,
        store_path,
        checkpoint,
        partial_of=_risk_partial,
        schema=_PARTIAL_SCHEMA,
        dedup_keys=_DEDUP_KEYS,
        cluster_cols=_CLUSTER_COLS,
        compact_max_segments=compact_max_segments,
    )
