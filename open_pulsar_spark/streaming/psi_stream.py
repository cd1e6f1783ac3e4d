"""Streaming PSI drift monitor — the live value-bin distribution of an
unbounded event stream kept as ADDITIVE per-epoch partials, scored at
read time against a FROZEN baseline distribution with the exact PSI
closing of operators.profiling.events_value_psi.

The batch query self-baselines (first time half vs second); a
production monitor freezes the baseline at deploy time and asks "has
the live distribution drifted from THAT". So this module maintains one
additive (bin, cnt) ledger for the live stream, snapshots a baseline
from any frame with freeze_baseline, and psi_readout runs the shared
psi_from_cells on (baseline × live ledger) — one closing computation,
so the monitor and the batch query cannot round or sum differently.

Replay contract: additive partials (cms_stream's class) — epoch is
REQUIRED, a replayed epoch is skipped by the overwrite contract, and
the fold dedups (epoch, bin) before summing. The baseline is a plain
one-shot parquet snapshot (no epochs — it is frozen by definition).

Store size: ≤ ~16 rows per epoch (power-of-two cent bins) — bounded by
the value range, not the event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_pulsar_spark.operators.profiling import (
    psi_from_cells,
    value_log_bin,
)
from open_pulsar_spark.streaming.segments import (
    read_segments,
    start_partial_stream,
    update_partial_store,
)

_PARTIAL_SCHEMA = "bin BIGINT, cnt LONG, epoch LONG"
_DEDUP_KEYS = ["epoch", "bin"]
_CLUSTER_COLS = ["bin"]


def _bin_counts(events: DataFrame) -> DataFrame:
    """events → (bin, cnt) partial counts on the SHARED binning
    expression (profiling.value_log_bin), so ledger and batch query
    bucket identically."""
    return (
        events.select(value_log_bin(F.col("value")))
        .groupBy("bin")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def freeze_baseline(
    spark: SparkSession, events: DataFrame, baseline_path: str
) -> None:
    """Snapshot a frame's value-bin distribution as THE baseline
    (overwrite — a baseline is re-frozen deliberately, never folded)."""
    _bin_counts(events).write.mode("overwrite").parquet(baseline_path)


def read_baseline(spark: SparkSession, baseline_path: str) -> DataFrame:
    return spark.read.schema("bin BIGINT, cnt LONG").parquet(baseline_path)


def update_psi(
    spark: SparkSession,
    events: DataFrame,
    store_path: str,
    epoch_id: int | None,
) -> None:
    """Fold one batch of events into the live bin ledger. Additive
    contract: epoch is REQUIRED."""
    if epoch_id is None:
        raise ValueError(
            "psi_stream partials are additive: epoch-less backfills "
            "would double-add on rerun; supply an epoch id"
        )
    update_partial_store(events, store_path, epoch_id, _bin_counts)


def read_live_bins(spark: SparkSession, store_path: str) -> DataFrame:
    """The folded live (bin, cnt): dedup (epoch, bin), then sum."""
    raw = read_segments(spark, store_path, _PARTIAL_SCHEMA)
    if raw is None:
        return spark.createDataFrame([], "bin BIGINT, cnt LONG")
    return (
        raw.dropDuplicates(["epoch", "bin"])
        .groupBy("bin")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def psi_readout(
    spark: SparkSession, baseline_path: str, store_path: str
) -> DataFrame:
    """PSI of the live ledger against the frozen baseline — the same
    psi_from_cells closing as the batch query (nano-grid terms,
    order-independent integer total), so a monitor threshold tuned on
    batch numbers transfers unchanged."""
    base = read_baseline(spark, baseline_path).select(
        "bin", F.col("cnt").alias("n_base")
    )
    live = read_live_bins(spark, store_path).select(
        "bin", F.col("cnt").alias("n_cur")
    )
    cell = base.join(live, "bin", "full").select(
        "bin",
        F.coalesce("n_base", F.lit(0)).cast("bigint").alias("n_base"),
        F.coalesce("n_cur", F.lit(0)).cast("bigint").alias("n_cur"),
    )
    return psi_from_cells(spark, cell)


def start_psi_stream(
    spark: SparkSession,
    events_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    compact_max_segments: int | None = 64,
):
    """events stream → continuously-maintained live bin ledger, on the
    shared partial-stream scaffold."""
    return start_partial_stream(
        events_stream,
        store_path,
        checkpoint,
        partial_of=_bin_counts,
        schema=_PARTIAL_SCHEMA,
        dedup_keys=_DEDUP_KEYS,
        cluster_cols=_CLUSTER_COLS,
        compact_max_segments=compact_max_segments,
    )
