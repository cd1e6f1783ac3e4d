"""Streaming open-order backlog — the daily (+opened, −closed) ledger
folded per micro-batch, serving the backlog depth curve live (the
batch orders_backlog_depth, kept current).

Input contract: RESOLVED order spans (o_orderkey, open_day, close_day)
— the event an order system emits when an order's last line ships (or
at placement with the close arriving later as its own span row is NOT
supported: a span is one immutable fact, so per-day ±1 deltas are
additive and the store runs the cms/stats/pchart contract). Epoch
segments are REQUIRED (an epoch-less additive write has no safe
sentinel — a replayed backfill would double-add); reads dedup
(epoch, d) BEFORE summing so the mid-compaction double-read window
cannot double-count:

  micro-batch of spans
    → (epoch-day, n_opened, n_closed) per-batch deltas (map-side
      combine; each span contributes +1 on its open day and +1 closed
      on its close day)
    → one epoch segment

  read: dedup (epoch, d) → sum per day → the SAME backlog_from_daily
    close as the batch query (running depth + all-time peak flag), so
    the live curve bit-matches a batch sweep over the union of all
    delivered spans, whatever the batching (tested).

The ops story at 100 TB: the depth curve needs a GLOBAL running sum,
so a naive implementation rescans every open interval per refresh;
the folded ledger is |days| rows and the close is O(days) arithmetic
regardless of order volume.

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

_PARTIAL_SCHEMA = "d LONG, o LONG, c LONG, epoch LONG"
_DEDUP_KEYS = ["epoch", "d"]
_CLUSTER_COLS = ["d"]

_EPOCH_DAY = "datediff(to_date({col}), date'1970-01-01')"


def _backlog_partial(spans: DataFrame) -> DataFrame:
    """spans → per-batch (epoch-day, opened, closed) deltas: the open
    and close sides aggregate separately then full-outer-merge on the
    day, all map-side combinable."""
    opened = spans.groupBy(
        F.expr(_EPOCH_DAY.format(col="open_day")).cast("bigint").alias("d")
    ).agg(F.count("*").cast("bigint").alias("o"))
    closed = spans.groupBy(
        F.expr(_EPOCH_DAY.format(col="close_day")).cast("bigint").alias("d")
    ).agg(F.count("*").cast("bigint").alias("c"))
    return (
        opened.join(closed, "d", "full")
        .select(
            "d",
            F.coalesce("o", F.lit(0)).cast("bigint").alias("o"),
            F.coalesce("c", F.lit(0)).cast("bigint").alias("c"),
        )
    )


def update_backlog(
    spark: SparkSession,
    spans: DataFrame,
    store_path: str,
    epoch_id: int | None,
) -> None:
    """Fold one batch of resolved spans into the day ledger. ADDITIVE
    store: the epoch is mandatory — replaying a committed epoch is a
    no-op by overwrite, but an epoch-less duplicate would double-add."""
    if epoch_id is None:
        raise ValueError(
            "backlog_stream is additive: epoch-less backfills would "
            "double-count on redelivery; pass a unique epoch id"
        )
    update_partial_store(spans, store_path, epoch_id, _backlog_partial)


def read_daily(spark: SparkSession, store_path: str) -> DataFrame:
    """The current folded (d, n_opened, n_closed) day ledger. Dedup on
    (epoch, d) FIRST — see module docstring — then day-sum."""
    raw = read_segments(spark, store_path, _PARTIAL_SCHEMA)
    if raw is None:
        return spark.createDataFrame(
            [], "d LONG, n_opened LONG, n_closed LONG"
        )
    return (
        raw.dropDuplicates(["epoch", "d"])
        .groupBy("d")
        .agg(
            F.sum("o").cast("bigint").alias("n_opened"),
            F.sum("c").cast("bigint").alias("n_closed"),
        )
    )


def backlog_readout(spark: SparkSession, store_path: str) -> DataFrame:
    """The live backlog curve from the stream-maintained ledger — the
    SAME backlog_from_daily close as the batch orders_backlog_depth,
    bit-matched over the union of all delivered spans."""
    from open_pulsar_spark.operators.analytics import backlog_from_daily

    daily = read_daily(spark, store_path).select(
        F.timestamp_seconds(F.col("d") * 86400).alias("day"),
        "n_opened",
        "n_closed",
    )
    return backlog_from_daily(spark, daily)


def start_backlog_stream(
    spark: SparkSession,
    spans_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    compact_max_segments: int | None = 64,
):
    """resolved-span stream → continuously-maintained backlog ledger,
    on the shared partial-stream scaffold."""
    return start_partial_stream(
        spans_stream,
        store_path,
        checkpoint,
        partial_of=_backlog_partial,
        schema=_PARTIAL_SCHEMA,
        dedup_keys=_DEDUP_KEYS,
        cluster_cols=_CLUSTER_COLS,
        compact_max_segments=compact_max_segments,
    )
