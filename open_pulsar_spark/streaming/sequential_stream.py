"""Streaming experiment ledger — the daily per-variant exposure/
conversion counts of an unbounded event stream kept as ADDITIVE
per-epoch partials, with the anytime-valid monitor computed at read
time (the incremental form of operators.analytics.ab_test_sequential).

This is the natural deployment of a peeking-safe test: the boundary
is DESIGNED to be read continuously, so its inputs should be
maintained continuously — per micro-batch, events reduce to per-day
variant counts (map-side combinable, ≤ |days touched| rows/epoch);
the fold sums partials per day; the read path runs the SAME
sequential_from_daily as the batch query — so the live monitor and a
batch run over the union of all delivered rows are BIT-IDENTICAL
(tested), whatever the batching.

Replay contract: additive partials (cms_stream's class) — epoch is
REQUIRED, a replayed epoch is skipped by the overwrite contract, and
the fold dedups (epoch, day) before summing. Epoch-less backfills are
refused.

Store size: ≤ |days touched per batch| rows per epoch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_pulsar_spark.operators.analytics import (
    sequential_daily_counts,
    sequential_from_daily,
)
from open_pulsar_spark.streaming.segments import (
    read_segments,
    start_partial_stream,
    update_partial_store,
)

_PARTIAL_SCHEMA = (
    "day DATE, d_na LONG, d_nb LONG, d_ca LONG, d_cb LONG, epoch LONG"
)
_DEDUP_KEYS = ["epoch", "day"]
_CLUSTER_COLS = ["day"]


def _seq_stream_partial(events: DataFrame) -> DataFrame:
    """events → per-batch daily variant counts (the SAME md5-coin
    tagging and reduction as the batch query)."""
    tagged = events.select(
        F.to_date("ts").alias("day"),
        F.expr(
            "CASE WHEN conv(substring(md5(cast(user_id as string)), 1, 8),"
            " 16, 10) % 2 = 0 THEN 0 ELSE 1 END"
        ).alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "conv"
        ),
    )
    return sequential_daily_counts(tagged)


def update_experiment(
    spark: SparkSession,
    events: DataFrame,
    store_path: str,
    epoch_id: int | None,
) -> None:
    """Fold one batch of events into the experiment ledger. Additive
    contract: epoch is REQUIRED."""
    if epoch_id is None:
        raise ValueError(
            "sequential_stream partials are additive: epoch-less "
            "backfills would double-add on rerun; supply an epoch id"
        )
    update_partial_store(events, store_path, epoch_id, _seq_stream_partial)


def read_daily_counts(spark: SparkSession, store_path: str) -> DataFrame:
    """The folded daily variant counts: dedup (epoch, day), then sum."""
    raw = read_segments(spark, store_path, _PARTIAL_SCHEMA)
    if raw is None:
        return spark.createDataFrame(
            [], "day DATE, d_na LONG, d_nb LONG, d_ca LONG, d_cb LONG"
        )
    return (
        raw.dropDuplicates(["epoch", "day"])
        .groupBy("day")
        .agg(
            F.sum("d_na").cast("bigint").alias("d_na"),
            F.sum("d_nb").cast("bigint").alias("d_nb"),
            F.sum("d_ca").cast("bigint").alias("d_ca"),
            F.sum("d_cb").cast("bigint").alias("d_cb"),
        )
    )


def monitor_readout(spark: SparkSession, store_path: str) -> DataFrame:
    """The anytime-valid monitor table from the stream-maintained
    ledger — the same sequential_from_daily as the batch query, so
    the peeking-safe boundary and significance flags agree bit-for-bit
    with a batch run over the union of all delivered rows."""
    return sequential_from_daily(spark, read_daily_counts(spark, store_path))


def start_experiment_stream(
    spark: SparkSession,
    events_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    compact_max_segments: int | None = 64,
):
    """events stream → continuously-maintained experiment ledger, on
    the shared partial-stream scaffold."""
    return start_partial_stream(
        events_stream,
        store_path,
        checkpoint,
        partial_of=_seq_stream_partial,
        schema=_PARTIAL_SCHEMA,
        dedup_keys=_DEDUP_KEYS,
        cluster_cols=_CLUSTER_COLS,
        compact_max_segments=compact_max_segments,
    )
