"""Streaming count-min-sketch maintenance — the frequency profile of
an unbounded document stream, kept as mergeable per-epoch partial
grids in a segment store.

Batch CMS (operators.sketch.shingle_cms_heavy_hitters) profiles a
static corpus; a 100 TB ingest wants the sketch maintained AS DATA
ARRIVES so "how often does this shingle occur so far" is answerable
without re-scanning history. Mergeability is the whole point of the
sketch: each micro-batch reduces to its own (depth × width) partial
grid map-side, and the current sketch is the cell-wise SUM of all
partials — so the store never holds more than 4096 rows per epoch and
the merge is a plain aggregate.

Replay safety is inherited from streaming.segments, with one extra
rule because the data is ADDITIVE (summing tolerates neither loss nor
double-count):

  - each epoch's partial grid is an epoch-keyed segment (overwrite,
    no-op once committed) → at-least-once foreachBatch delivery yields
    exactly-once partials;
  - every cell row carries its epoch, and READS dedup on
    (epoch, d, slot) BEFORE summing — so the mid-compaction window
    where a cell exists in both its source segment and the new
    compact- segment collapses to one row instead of double-counting
    (the same duplicate-tolerance contract the dedup joins rely on,
    expressed additively);
  - compaction is therefore FILE-level only (fewer, clustered files;
    row count unchanged). A true additive fold (re-aggregating epochs
    into one row per cell) changes row identity and must only run in
    a maintenance window with no concurrent readers — fold_grid below
    does it by rewriting into a fresh store.

Reference parity: none — extends the sketch family (SURVEY §2.10) into
the streaming layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_pulsar_spark.operators.sketch import _CMS_SLOT_SPARK, CMS_DEPTH
from open_pulsar_spark.streaming.segments import (
    auto_compact,
    read_segments,
    segment_path,
    write_segment,
)

_GRID_SCHEMA = "d INT, slot BIGINT, cnt LONG, epoch LONG"

# THE slot expression is imported from the batch sketch, not copied:
# stream- and batch-maintained grids must hash a shingle to the same
# cell or every cross-check between them is silently garbage.
_SLOT = _CMS_SLOT_SPARK


def _partial_grid(docs: DataFrame, epoch_id: int) -> DataFrame:
    """One micro-batch's (per-doc distinct) shingle stream → its
    partial CMS grid: ≤ depth × width rows regardless of batch size
    (map-side partial aggregation does the heavy reduction). The Arrow
    shingle kernel is IMPORTED from dedup (shared with the batch
    sketch) so stream counts are comparable with batch profiles."""
    from open_pulsar_spark.operators.dedup import shingle_stream_kernel

    shingles = docs.dropDuplicates(["doc_id"]).select("text").mapInPandas(
        shingle_stream_kernel, "t string"
    )
    depths = F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("d")
    return (
        shingles.select(depths, "t")
        .select("d", F.expr(_SLOT).alias("slot"))
        .groupBy("d", "slot")
        .agg(F.count("*").alias("cnt"))
        .withColumn("epoch", F.lit(epoch_id).cast("long"))
    )


def update_cms(spark: SparkSession, docs: DataFrame, grid_path: str, epoch_id: int) -> None:
    """Fold one batch into the sketch store (idempotent per epoch:
    a replayed epoch overwrites its own partial, never double-adds)."""
    seg, committed = segment_path(grid_path, epoch_id)
    if committed:
        return
    write_segment(_partial_grid(docs, epoch_id), grid_path, epoch_id)


def read_cms(spark: SparkSession, grid_path: str) -> DataFrame:
    """The current merged grid (d, slot, cnt). Dedup on
    (epoch, d, slot) FIRST — see module docstring — then cell-sum."""
    raw = read_segments(spark, grid_path, _GRID_SCHEMA)
    if raw is None:
        return spark.createDataFrame([], "d INT, slot BIGINT, cnt LONG")
    return (
        raw.dropDuplicates(["epoch", "d", "slot"])
        .groupBy("d", "slot")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(spark: SparkSession, grid_path: str, items: list[str]) -> DataFrame:
    """Point estimates for shingle strings: min over depth rows of the
    item's cell — the standard CMS read (always an overcount).
    Items are a bounded probe list (broadcast side)."""
    grid = read_cms(spark, grid_path)
    probe = spark.createDataFrame([(t,) for t in items], "t STRING").select(
        "t", F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("d")
    ).select("t", "d", F.expr(_SLOT).alias("slot"))
    return (
        F.broadcast(probe)
        .join(grid, ["d", "slot"], "left")
        .groupBy("t")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("n_cms"))
        .orderBy("t")
    )


def start_cms_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    grid_path: str,
    checkpoint: str,
    compact_max_segments: int | None = 64,
):
    """docs(doc_id, text) stream → continuously-maintained CMS store.
    File-level auto-compaction keeps the segment count bounded; rows
    keep their epoch tags so reads stay double-count-safe through the
    compaction window."""

    def step(batch_df: DataFrame, epoch_id: int) -> None:
        update_cms(spark, batch_df, grid_path, epoch_id)
        auto_compact(
            spark,
            grid_path,
            _GRID_SCHEMA,
            dedup_keys=["epoch", "d", "slot"],
            cluster_cols=["d", "slot"],
            max_segments=compact_max_segments,
        )

    return (
        docs_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(step)
        .start()
    )


def fold_grid(spark: SparkSession, grid_path: str, dest_path: str) -> int:
    """Maintenance-window additive fold: rewrite the whole store as ONE
    epoch-0 grid (≤ depth × width rows) at dest_path. Run only with no
    concurrent readers/writers of grid_path — folding changes row
    identity, which the online duplicate-tolerance rule cannot cover.
    Returns the folded cell count."""
    folded = read_cms(spark, grid_path).withColumn("epoch", F.lit(0).cast("long"))
    n = folded.count()
    folded.coalesce(1).write.mode("overwrite").parquet(
        segment_path(dest_path, 0)[0]
    )
    return n
