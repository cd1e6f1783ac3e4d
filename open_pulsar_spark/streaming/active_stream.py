"""Streaming active-user ledger — the deduped (user, day) membership
grid maintained per micro-batch, serving the DAU/WAU/MAU dashboard
live (the batch events_dau_wau_mau, kept current).

Membership is SET-IDEMPOTENT (a user is active on a day or not —
seeing the same (user, day) twice changes nothing), so this store
runs the posting/winnow contract: per-batch partials are the batch's
DISTINCT (user, day) rows, reads dedup (user, day) across segments,
and replays/mid-compaction double-reads are harmless by idempotence
(epochs still tag segments so committed-epoch overwrite skips
rewrites).

  micro-batch of events
    → DISTINCT (user_id, epoch-day) rows (map-side dedup per batch)
    → one epoch segment

  read: distinct (user_id, d) across segments → the SAME
    dau_wau_mau_from_user_days closing as the batch query — the live
    dashboard bit-matches a batch scan over the union of all
    delivered events, whatever the batching (tested).

At 100 TB the ledger is |distinct user-days| rows — the engagement
fact's natural grain, far below event volume; compaction rewrites it
into one segment and idempotence makes that trivially safe.

Reference parity: none — extends the event-analytics family
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

_PARTIAL_SCHEMA = "user_id LONG, d LONG, epoch LONG"
_DEDUP_KEYS = ["user_id", "d"]
_CLUSTER_COLS = ["d"]


def _active_partial(events: DataFrame) -> DataFrame:
    """events → the batch's distinct (user_id, epoch-day) rows."""
    return events.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("d"),
    ).distinct()


def update_active(
    spark: SparkSession,
    events: DataFrame,
    store_path: str,
    epoch_id: int | None,
) -> None:
    """Fold one batch of events into the membership ledger. Idempotent
    store: epoch-less backfills are SAFE (duplicates vanish in the
    read-side distinct), so unlike the additive stores a None epoch is
    accepted and written as a batch segment."""
    update_partial_store(events, store_path, epoch_id, _active_partial)


def read_user_days(spark: SparkSession, store_path: str) -> DataFrame:
    """The current deduped (user_id, d) membership grid."""
    raw = read_segments(spark, store_path, _PARTIAL_SCHEMA)
    if raw is None:
        return spark.createDataFrame([], "user_id LONG, d LONG")
    return raw.select("user_id", "d").distinct()


def dau_readout(spark: SparkSession, store_path: str) -> DataFrame:
    """DAU/WAU/MAU + stickiness from the stream-maintained membership
    grid — the SAME dau_wau_mau_from_user_days closing as the batch
    query, bit-matched over the union of all delivered events."""
    from open_pulsar_spark.operators.analytics import (
        dau_wau_mau_from_user_days,
    )

    return dau_wau_mau_from_user_days(spark, read_user_days(spark, store_path))


def start_active_stream(
    spark: SparkSession,
    events_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    compact_max_segments: int | None = 64,
):
    """events stream → continuously-maintained membership ledger, on
    the shared partial-stream scaffold."""
    return start_partial_stream(
        events_stream,
        store_path,
        checkpoint,
        partial_of=_active_partial,
        schema=_PARTIAL_SCHEMA,
        dedup_keys=_DEDUP_KEYS,
        cluster_cols=_CLUSTER_COLS,
        compact_max_segments=compact_max_segments,
    )


def growth_readout(spark: SparkSession, store_path: str) -> DataFrame:
    """Daily growth accounting (new / retained / resurrected / dormant
    + quick ratio) from the stream-maintained membership grid — the
    SAME growth_accounting_from_user_days closing as the batch
    user_growth_accounting query, bit-matched over the union of all
    delivered events whatever the batching (tested). Membership is
    set-idempotent, so replays and epoch-less backfills cannot
    perturb the ledger."""
    from open_pulsar_spark.operators.analytics import (
        growth_accounting_from_user_days,
    )

    grid = read_user_days(spark, store_path).select(
        "user_id",
        F.timestamp_seconds(F.col("d") * 86400).alias("day"),
    )
    return growth_accounting_from_user_days(
        spark, grid, "active_stream_growth_seq"
    )
