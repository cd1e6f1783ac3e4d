"""Streaming zone-map maintenance — per-Z-bucket (count, min, max)
statistics of an unbounded event stream, kept as per-epoch partial
segments (the ingest-side half of the layout story:
analytics.layout_skipping_effectiveness PRICES pruning on a finished
layout; this store is how a lakehouse writer keeps the zone maps
current while data lands).

Contract note — this store MIXES the two partial classes the engine's
streams established:
  - n_events is ADDITIVE (cms_stream's class): epoch REQUIRED, the
    fold dedups (epoch, zbucket) before summing, replays overwrite;
  - z_min / z_max are IDEMPOTENT (hll_stream's class): min/max of
    min/max, duplicate-proof by construction.
The fold applies the strict contract (the additive one) to the whole
row — one dedup pass protects both halves, and the idempotent columns
simply don't need it. Batch parity: the folded store equals the same
aggregate computed one-shot over the union of all delivered rows
(tested), which is events_zorder_layout's bucket frame minus its
non-mergeable n_users column (distinct counts don't fold; the HLL
register store is the engine's mergeable answer to that).

Store size: ≤ |buckets touched per batch| rows per epoch — bounded by
the 16-bit bucket space, not the event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_pulsar_spark.operators.analytics import _z_col
from open_pulsar_spark.streaming.segments import (
    read_segments,
    start_partial_stream,
    update_partial_store,
)

_PARTIAL_SCHEMA = (
    "zbucket LONG, n_events LONG, z_min LONG, z_max LONG, epoch LONG"
)
_DEDUP_KEYS = ["epoch", "zbucket"]
_CLUSTER_COLS = ["zbucket"]


def _zonemap_partial(events: DataFrame) -> DataFrame:
    """events → per-batch bucket statistics (the SAME Morton key as
    events_zorder_layout, so batch and stream bucket identically)."""
    return (
        events.select(_z_col().alias("z"))
        .groupBy(F.shiftright("z", 16).cast("long").alias("zbucket"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("z").cast("long").alias("z_min"),
            F.max("z").cast("long").alias("z_max"),
        )
    )


def update_zonemap(
    spark: SparkSession,
    events: DataFrame,
    store_path: str,
    epoch_id: int | None,
) -> None:
    """Fold one batch of events into the zone-map store. The additive
    half (n_events) sets the contract: epoch is REQUIRED."""
    if epoch_id is None:
        raise ValueError(
            "zonemap_stream partials carry an additive count: epoch-less "
            "backfills would double-add on rerun; supply an epoch id"
        )
    update_partial_store(events, store_path, epoch_id, _zonemap_partial)


def read_zonemap(spark: SparkSession, store_path: str) -> DataFrame:
    """The folded zone maps (zbucket, n_events, z_min, z_max): dedup
    (epoch, zbucket) — replay and mid-compaction safety for the
    additive count — then sum counts and min/max the envelopes."""
    raw = read_segments(spark, store_path, _PARTIAL_SCHEMA)
    if raw is None:
        return spark.createDataFrame(
            [], "zbucket LONG, n_events LONG, z_min LONG, z_max LONG"
        )
    return (
        raw.dropDuplicates(["epoch", "zbucket"])
        .groupBy("zbucket")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.min("z_min").cast("long").alias("z_min"),
            F.max("z_max").cast("long").alias("z_max"),
        )
    )


def start_zonemap_stream(
    spark: SparkSession,
    events_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    compact_max_segments: int | None = 64,
):
    """events stream → continuously-maintained zone-map store, on the
    shared partial-stream scaffold."""
    return start_partial_stream(
        events_stream,
        store_path,
        checkpoint,
        partial_of=_zonemap_partial,
        schema=_PARTIAL_SCHEMA,
        dedup_keys=_DEDUP_KEYS,
        cluster_cols=_CLUSTER_COLS,
        compact_max_segments=compact_max_segments,
    )
