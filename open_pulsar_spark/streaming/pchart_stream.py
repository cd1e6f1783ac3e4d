"""Streaming SPC p-chart — the daily (events, errors) ledger folded
per micro-batch, serving the error-rate control chart live (the batch
error_rate_pchart, kept current).

Per-day counts are ADDITIVE, so this store runs the cms/stats/dq
contract: epoch segments are REQUIRED (an epoch-less additive write
has no safe sentinel — a replayed backfill would double-add), reads
dedup (epoch, d) BEFORE summing so the mid-compaction double-read
window cannot double-count:

  micro-batch of events
    → (epoch-day, n, e) per-batch counts (map-side combine)
    → one epoch segment

  read: dedup (epoch, d) → sum per day → the SAME pchart_from_daily
    close as the batch query (center line, 3σ binomial band as the
    exact integer inequality), so the live chart bit-matches a batch
    scan over the union of all delivered events, whatever the
    batching (tested).

The ops story at 100 TB: the control band needs the GLOBAL process
average, so a naive implementation rescans history every refresh;
the folded ledger is |days| rows, and the 3σ test is integer
arithmetic against a 1-row total — the chart refresh costs O(days)
regardless of event volume.

Reference parity: none — extends the monitoring family
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

_PARTIAL_SCHEMA = "d LONG, n LONG, e LONG, epoch LONG"
_DEDUP_KEYS = ["epoch", "d"]
_CLUSTER_COLS = ["d"]


def _pchart_partial(events: DataFrame) -> DataFrame:
    """events → per-batch (epoch-day, total, errors) counts."""
    return events.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("d")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("e"),
    )


def update_pchart(
    spark: SparkSession,
    events: DataFrame,
    store_path: str,
    epoch_id: int | None,
) -> None:
    """Fold one batch of events into the day ledger. ADDITIVE store:
    the epoch is mandatory — replaying a committed epoch is a no-op by
    overwrite, but an epoch-less duplicate would double-add."""
    if epoch_id is None:
        raise ValueError(
            "pchart_stream is additive: epoch-less backfills would "
            "double-count on redelivery; pass a unique epoch id"
        )
    update_partial_store(events, store_path, epoch_id, _pchart_partial)


def read_daily(spark: SparkSession, store_path: str) -> DataFrame:
    """The current folded (d, n_events, n_errors) day ledger. Dedup on
    (epoch, d) FIRST — see module docstring — then day-sum."""
    raw = read_segments(spark, store_path, _PARTIAL_SCHEMA)
    if raw is None:
        return spark.createDataFrame([], "d LONG, n_events LONG, n_errors LONG")
    return (
        raw.dropDuplicates(["epoch", "d"])
        .groupBy("d")
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.sum("e").cast("bigint").alias("n_errors"),
        )
    )


def pchart_readout(spark: SparkSession, store_path: str) -> DataFrame:
    """The live control chart from the stream-maintained ledger — the
    SAME pchart_from_daily close as the batch error_rate_pchart,
    bit-matched over the union of all delivered events."""
    from open_pulsar_spark.operators.analytics import pchart_from_daily

    daily = read_daily(spark, store_path).select(
        F.timestamp_seconds(F.col("d") * 86400).alias("day"),
        "n_events",
        "n_errors",
    )
    return pchart_from_daily(spark, daily)


def start_pchart_stream(
    spark: SparkSession,
    events_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    compact_max_segments: int | None = 64,
):
    """events stream → continuously-maintained p-chart ledger, on the
    shared partial-stream scaffold."""
    return start_partial_stream(
        events_stream,
        store_path,
        checkpoint,
        partial_of=_pchart_partial,
        schema=_PARTIAL_SCHEMA,
        dedup_keys=_DEDUP_KEYS,
        cluster_cols=_CLUSTER_COLS,
        compact_max_segments=compact_max_segments,
    )
