"""Streaming hourly-dispersion monitor — the (type, hour) count ledger
folded per micro-batch, serving the Fano overdispersion readout live
(the batch events_hourly_fano, kept current).

Per-(type, hour) counts are ADDITIVE, so this store runs the
cms/stats/pchart contract: epoch segments are REQUIRED (an epoch-less
additive write has no safe sentinel — a replayed backfill would
double-add); reads dedup (epoch, event_type, hr) BEFORE summing so the
mid-compaction double-read window cannot double-count:

  micro-batch of events
    → (epoch-hour, type, n) per-batch counts (map-side combine)
    → one epoch segment

  read: dedup (epoch, type, hr) → sum per (type, hour) → the SAME
    fano_from_hourly close as the batch query (moments + span from the
    ledger itself), so the live dispersion readout bit-matches a batch
    scan over the union of all delivered events, whatever the batching
    (tested).

The ops story at 100 TB: Fano needs the full-history hourly moments,
so a naive implementation rescans the stream per refresh; the folded
ledger is |types|·|hours| rows (calendar-bounded) and the close is
O(ledger) integer arithmetic regardless of event volume.

Reference parity: none — extends the monitoring family (SURVEY §2.10)
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

_PARTIAL_SCHEMA = "event_type STRING, hr LONG, n LONG, epoch LONG"
_DEDUP_KEYS = ["epoch", "event_type", "hr"]
_CLUSTER_COLS = ["event_type", "hr"]


def _fano_partial(events: DataFrame) -> DataFrame:
    """events → per-batch (type, epoch-hour, count)."""
    return events.groupBy(
        "event_type",
        F.expr("unix_seconds(date_trunc('hour', ts)) div 3600")
        .cast("bigint")
        .alias("hr"),
    ).agg(F.count("*").cast("bigint").alias("n"))


def update_fano(
    spark: SparkSession,
    events: DataFrame,
    store_path: str,
    epoch_id: int | None,
) -> None:
    """Fold one batch of events into the hourly ledger. ADDITIVE
    store: the epoch is mandatory — replaying a committed epoch is a
    no-op by overwrite, but an epoch-less duplicate would double-add."""
    if epoch_id is None:
        raise ValueError(
            "fano_stream is additive: epoch-less backfills would "
            "double-count on redelivery; pass a unique epoch id"
        )
    update_partial_store(events, store_path, epoch_id, _fano_partial)


def read_hourly(spark: SparkSession, store_path: str) -> DataFrame:
    """The current folded (event_type, h, c) hourly ledger. Dedup on
    (epoch, type, hr) FIRST — see module docstring — then hour-sum."""
    raw = read_segments(spark, store_path, _PARTIAL_SCHEMA)
    if raw is None:
        return spark.createDataFrame(
            [], "event_type STRING, h TIMESTAMP, c LONG"
        )
    return (
        raw.dropDuplicates(["epoch", "event_type", "hr"])
        .groupBy("event_type", "hr")
        .agg(F.sum("n").cast("bigint").alias("c"))
        .select(
            "event_type",
            F.timestamp_seconds(F.col("hr") * 3600).alias("h"),
            "c",
        )
    )


def fano_readout(spark: SparkSession, store_path: str) -> DataFrame:
    """The live dispersion readout from the stream-maintained ledger —
    the SAME fano_from_hourly close as the batch events_hourly_fano,
    bit-matched over the union of all delivered events."""
    from open_pulsar_spark.operators.analytics import fano_from_hourly

    return fano_from_hourly(
        spark, read_hourly(spark, store_path), "fano_stream_hourly"
    )


def start_fano_stream(
    spark: SparkSession,
    events_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    compact_max_segments: int | None = 64,
):
    """events stream → continuously-maintained hourly-count ledger, on
    the shared partial-stream scaffold."""
    return start_partial_stream(
        events_stream,
        store_path,
        checkpoint,
        partial_of=_fano_partial,
        schema=_PARTIAL_SCHEMA,
        dedup_keys=_DEDUP_KEYS,
        cluster_cols=_CLUSTER_COLS,
        compact_max_segments=compact_max_segments,
    )


def mix_readout(spark: SparkSession, store_path: str) -> DataFrame:
    """SECOND readout off the same hourly ledger (one ledger, two
    readouts — the active_stream membership-grid pattern): the
    weekday/weekend per-day-rate lift, via the SAME
    weekday_mix_from_daily close as the batch weekday_weekend_mix —
    the ledger's hours roll up to (type, day) counts, and the observed
    calendar is the ledger's own distinct days, exactly as the batch
    query derives it from raw events."""
    from open_pulsar_spark.operators.analytics import weekday_mix_from_daily

    daily = (
        read_hourly(spark, store_path)
        .groupBy("event_type", F.date_trunc("day", "h").alias("day"))
        .agg(F.sum("c").cast("bigint").alias("n"))
    )
    return weekday_mix_from_daily(spark, daily, "fano_stream_mix_daily")
