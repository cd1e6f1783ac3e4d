"""Streaming LAST-WRITER-WINS keyed store — the dimension-table
maintenance contract (CDC upserts + deletes folded into a current
snapshot), the third fold class next to ADDITIVE (cms/stats/kanon:
sum partials) and IDEMPOTENT (hll/winnow: max/set partials).

LWW rows are NOT mergeable by sum or max of values — the CURRENT
value is the one from the highest epoch that touched the key, and a
delete in a later epoch must beat an upsert in an earlier one. The
store therefore keeps (k, op, cents, epoch) change rows in epoch
segments and resolves at READ time:

  micro-batch of change rows (k, op 'U'/'D', cents)
    → per-batch LAST change per key (a batch can carry several
      changes for one key — max epoch can't order those, so the
      batch kernel pre-resolves with a deterministic in-batch rank)
    → one epoch segment

  read: dedup (epoch, k) → per key take the row of the MAX epoch →
    drop rows whose winning op is 'D' → the current snapshot. A
    replayed epoch is a no-op by overwrite; the mid-compaction
    double-read window only duplicates (epoch, k) rows, which the
    dedup removes — the same two safety arguments as the additive
    stores, applied to a pick-max-not-sum resolve.

Reference parity: the reference's task-state file IS an LWW store
(each rewrite of state.json replaces the row wholesale —
SURVEY.md §2.11 K4); this is that contract made keyed, epoch-safe
and distributed. The batch twin is orders_cdc_merge's decision
table: applying this store's read over the same change stream yields
the same surviving (key, cents) set (tested).

At 100 TB this is how dimension tables stay current next to the
fact streams: the store is |keys| rows after compaction, the read
resolve is one window-free groupBy (max_by), and the whole thing is
the poor man's Delta CDF apply — no table format required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_pulsar_spark.streaming.segments import (
    read_segments,
    start_partial_stream,
    update_partial_store,
)

_PARTIAL_SCHEMA = "k LONG, op STRING, cents LONG, seq LONG, n LONG, epoch LONG"
_DEDUP_KEYS = ["epoch", "k"]
_CLUSTER_COLS = ["k"]


def _lww_partial(changes: DataFrame) -> DataFrame:
    """(k, op, cents[, seq]) change rows → ONE winning change per key
    for this batch: highest `seq` wins (callers that have no sequence
    column get one derived as a constant 0 — then the batch must not
    carry conflicting changes per key). Deterministic: ties on seq
    resolve by (op, cents) lexicographically so replays of the same
    batch pick the same winner. `n` counts the change rows folded into
    this winner — the ADDITIVE sidecar that lets the AS-OF readout
    report version counts without keeping losing rows."""
    cols = changes.columns
    if "seq" not in cols:
        changes = changes.withColumn("seq", F.lit(0).cast("long"))
    return (
        changes.groupBy("k")
        .agg(
            F.max_by(
                F.struct("op", "cents"), F.struct("seq", "op", "cents")
            ).alias("w"),
            F.max("seq").cast("long").alias("seq"),
            F.count("*").cast("long").alias("n"),
        )
        .select(
            "k",
            F.col("w.op").alias("op"),
            F.col("w.cents").alias("cents"),
            "seq",
            "n",
        )
    )


def update_lww(
    spark: SparkSession,
    changes: DataFrame,
    store_path: str,
    epoch_id: int | None,
) -> None:
    """Fold one batch of change rows into the LWW store. The epoch is
    mandatory: LWW resolves BY epoch, so an epoch-less write has no
    position in the order (unlike the additive stores, where the
    objection is double-counting, here it is unresolvable conflicts)."""
    if epoch_id is None:
        raise ValueError(
            "lww_stream resolves by epoch: an epoch-less write has no "
            "position in the last-writer order; pass a unique epoch id"
        )
    update_partial_store(changes, store_path, epoch_id, _lww_partial)


def read_current(spark: SparkSession, store_path: str) -> DataFrame:
    """The current snapshot: per key, the value written by the highest
    (epoch, seq); keys whose winning op is a delete are ABSENT.
    Dedup (epoch, k) first — the compaction double-read window."""
    raw = read_segments(spark, store_path, _PARTIAL_SCHEMA)
    if raw is None:
        return spark.createDataFrame([], "k LONG, cents LONG")
    return (
        raw.dropDuplicates(["epoch", "k"])
        .groupBy("k")
        .agg(
            F.max_by(
                F.struct("op", "cents"), F.struct("epoch", "seq")
            ).alias("w")
        )
        .where(F.col("w.op") != "D")
        .select("k", F.col("w.cents").alias("cents"))
    )


def read_asof(
    spark: SparkSession, store_path: str, as_of_epoch: int
) -> DataFrame:
    """TIME-TRAVEL readout: the snapshot as it stood after epoch
    `as_of_epoch` committed — resolve only over segments with
    epoch ≤ as_of_epoch, exactly the `SELECT ... FOR TIMESTAMP AS OF`
    read orders_asof_snapshot performs over the batch SCD2 history
    (granularity is the epoch boundary, the same version-granularity
    contract lakehouse time travel gives). Returns, per surviving key:
    the winning value, the (epoch, seq) it was written at, and
    `n_versions` — the count of ALL change rows folded for the key up
    to the epoch (deletes count as versions; a later un-resolved
    delete does not hide earlier versions). The store never rewrites
    history, so every past epoch stays readable — compaction unions
    segments with the epoch column intact."""
    raw = read_segments(spark, store_path, _PARTIAL_SCHEMA)
    empty = "k LONG, cents LONG, epoch LONG, seq LONG, n_versions LONG"
    if raw is None:
        return spark.createDataFrame([], empty)
    h = raw.dropDuplicates(["epoch", "k"]).where(
        F.col("epoch") <= F.lit(int(as_of_epoch))
    )
    return (
        h.groupBy("k")
        .agg(
            F.max_by(
                F.struct("op", "cents", "epoch", "seq"),
                F.struct("epoch", "seq"),
            ).alias("w"),
            F.sum("n").cast("long").alias("n_versions"),
        )
        .where(F.col("w.op") != "D")
        .select(
            "k",
            F.col("w.cents").alias("cents"),
            F.col("w.epoch").alias("epoch"),
            F.col("w.seq").alias("seq"),
            "n_versions",
        )
    )


def start_lww_stream(
    spark: SparkSession,
    changes_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    compact_max_segments: int | None = 64,
):
    """Change stream → continuously-maintained LWW store, on the
    shared partial-stream scaffold. Compaction is SAFE for LWW with
    epoch-tagged rows: the compactor unions segments verbatim (epoch
    column intact), so the read-time max-epoch resolve sees the same
    rows before and after."""
    return start_partial_stream(
        changes_stream,
        store_path,
        checkpoint,
        partial_of=_lww_partial,
        schema=_PARTIAL_SCHEMA,
        dedup_keys=_DEDUP_KEYS,
        cluster_cols=_CLUSTER_COLS,
        compact_max_segments=compact_max_segments,
    )
