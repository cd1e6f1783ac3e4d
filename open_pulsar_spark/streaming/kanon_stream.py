"""Streaming k-anonymity monitor — the per-quasi-identifier-tuple
class-size ledger, kept current as customer rows arrive, serving the
SAME release-risk audit as the batch customer_kanonymity_audit.

Equivalence-class sizes are ADDITIVE per QI tuple, so this store runs
the cms/stats contract verbatim: epoch segments are REQUIRED (an
epoch-less additive write has no safe sentinel — a replayed backfill
would double-add), reads dedup (epoch, quasi...) BEFORE summing so the
mid-compaction double-read window cannot double-count:

  micro-batch of customer rows
    → (c_nationkey, c_mktsegment, sz) per-batch class counts
      (map-side combine: batch volume collapses to ≤ |tuples-in-batch|
      rows)
    → one epoch segment

  read: dedup (epoch, quasi...) → sum per tuple → the SAME
    profiling.kanonymity_report over the folded class frame — so the
    live privacy monitor quotes the risk a batch audit over the union
    of all delivered rows would, whatever the batching (tested).

This completes the served privacy family: doc_pii_scrub screens
content, the RTBF tombstone machinery deletes, and this ledger watches
re-identification risk LIVE — a release gate can block the moment a
new ingest pushes risk_ppm over policy, instead of at the next batch
audit. At 100 TB the ledger is |distinct QI tuples| rows — tiny by
construction (generalized quasi-identifiers), far below the fact
volume that feeds it.

Reference parity: none — extends the profiling/privacy family
(SURVEY §2.10) into the streaming layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_pulsar_spark.operators.profiling import KANON_QUASI
from open_pulsar_spark.streaming.segments import (
    read_segments,
    start_partial_stream,
    update_partial_store,
)

_PARTIAL_SCHEMA = "c_nationkey INT, c_mktsegment STRING, sz LONG, epoch LONG"
_DEDUP_KEYS = ["epoch", *KANON_QUASI]
_CLUSTER_COLS = list(KANON_QUASI)


def _kanon_partial(customers: DataFrame) -> DataFrame:
    """customer rows → per-batch (quasi..., sz) class counts."""
    return customers.groupBy(*KANON_QUASI).agg(
        F.count("*").cast("bigint").alias("sz")
    )


def update_kanon(
    spark: SparkSession,
    customers: DataFrame,
    store_path: str,
    epoch_id: int | None,
) -> None:
    """Fold one batch of customer rows into the class-size ledger.
    ADDITIVE store: the epoch is mandatory (no -1 sentinel) — replaying
    a committed epoch is a no-op by overwrite, but an epoch-less
    duplicate would double-add."""
    if epoch_id is None:
        raise ValueError(
            "kanon_stream is additive: epoch-less backfills would "
            "double-count on redelivery; pass a unique epoch id"
        )
    update_partial_store(customers, store_path, epoch_id, _kanon_partial)


def read_class_sizes(spark: SparkSession, store_path: str) -> DataFrame:
    """The current folded (quasi..., sz) equivalence-class frame.
    Dedup on (epoch, quasi...) FIRST — see module docstring — then
    tuple-sum."""
    raw = read_segments(spark, store_path, _PARTIAL_SCHEMA)
    if raw is None:
        return spark.createDataFrame(
            [], "c_nationkey INT, c_mktsegment STRING, sz LONG"
        )
    return (
        raw.dropDuplicates(["epoch", *KANON_QUASI])
        .groupBy(*KANON_QUASI)
        .agg(F.sum("sz").cast("bigint").alias("sz"))
    )


def kanon_readout(spark: SparkSession, store_path: str) -> DataFrame:
    """The k-grid release-risk audit from the stream-maintained class
    ledger — the SAME profiling.kanonymity_report as the batch query,
    bit-matched over the union of all delivered rows."""
    from open_pulsar_spark.operators.profiling import kanonymity_report

    return kanonymity_report(spark, read_class_sizes(spark, store_path))


def start_kanon_stream(
    spark: SparkSession,
    customers_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    compact_max_segments: int | None = 64,
):
    """customer stream → continuously-maintained class-size ledger, on
    the shared partial-stream scaffold."""
    return start_partial_stream(
        customers_stream,
        store_path,
        checkpoint,
        partial_of=_kanon_partial,
        schema=_PARTIAL_SCHEMA,
        dedup_keys=_DEDUP_KEYS,
        cluster_cols=_CLUSTER_COLS,
        compact_max_segments=compact_max_segments,
    )


# --------------------------------------------------------------------------
# l-diversity ledger — the SENSITIVE-CELL counts (quasi..., band, cnt),
# additive per cell exactly like the class sizes above, serving the
# batch customer_ldiversity_audit's homogeneity-attack readout live.
# k-anonymity watches class SIZE; this ledger watches class DIVERSITY —
# together they are the full release gate (a new ingest can push a
# class below l without changing any class below k).
# --------------------------------------------------------------------------
_LDIV_SCHEMA = (
    "c_nationkey INT, c_mktsegment STRING, band LONG, cnt LONG, epoch LONG"
)
_LDIV_KEYS = ["epoch", *KANON_QUASI, "band"]


def _ldiv_partial(customers: DataFrame) -> DataFrame:
    """customer rows → per-batch (quasi..., band, cnt) sensitive-cell
    counts — the SAME banding expression as the batch query (imported
    constants, offset keeps the div operand non-negative)."""
    from open_pulsar_spark.operators.profiling import (
        LDIV_BAND_OFFSET,
        LDIV_BAND_WIDTH,
    )

    return customers.groupBy(
        *KANON_QUASI,
        F.expr(
            f"(cast(round(c_acctbal * 100) as bigint) + {LDIV_BAND_OFFSET})"
            f" div {LDIV_BAND_WIDTH}"
        )
        .cast("bigint")
        .alias("band"),
    ).agg(F.count("*").cast("bigint").alias("cnt"))


def update_ldiv(
    spark: SparkSession,
    customers: DataFrame,
    store_path: str,
    epoch_id: int | None,
) -> None:
    """Fold one batch of customer rows into the sensitive-cell ledger.
    ADDITIVE store: the epoch is mandatory (same contract as
    update_kanon — an epoch-less backfill would double-add)."""
    if epoch_id is None:
        raise ValueError(
            "ldiv_stream is additive: epoch-less backfills would "
            "double-count on redelivery; pass a unique epoch id"
        )
    update_partial_store(customers, store_path, epoch_id, _ldiv_partial)


def read_sensitive_cells(spark: SparkSession, store_path: str) -> DataFrame:
    """The current folded (quasi..., band, cnt) sensitive-cell frame.
    Dedup on (epoch, quasi..., band) FIRST — the mid-compaction
    double-read guard — then cell-sum."""
    raw = read_segments(spark, store_path, _LDIV_SCHEMA)
    if raw is None:
        return spark.createDataFrame(
            [], "c_nationkey INT, c_mktsegment STRING, band LONG, cnt LONG"
        )
    return (
        raw.dropDuplicates(_LDIV_KEYS)
        .groupBy(*KANON_QUASI, "band")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def ldiv_readout(spark: SparkSession, store_path: str) -> DataFrame:
    """The l-grid homogeneity-risk audit from the stream-maintained
    sensitive-cell ledger — the SAME profiling.ldiversity_report as the
    batch query, bit-matched over the union of all delivered rows."""
    from open_pulsar_spark.operators.profiling import ldiversity_report

    return ldiversity_report(spark, read_sensitive_cells(spark, store_path))


def start_ldiv_stream(
    spark: SparkSession,
    customers_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    compact_max_segments: int | None = 64,
):
    """customer stream → continuously-maintained sensitive-cell ledger,
    on the shared partial-stream scaffold."""
    return start_partial_stream(
        customers_stream,
        store_path,
        checkpoint,
        partial_of=_ldiv_partial,
        schema=_LDIV_SCHEMA,
        dedup_keys=_LDIV_KEYS,
        cluster_cols=[*KANON_QUASI, "band"],
        compact_max_segments=compact_max_segments,
    )
