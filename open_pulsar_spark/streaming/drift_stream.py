"""Streaming embedding-drift monitoring — the incremental form of
clustering.embedding_centroid_drift.

The batch query computes per-label fixed-point centroids of two corpus
snapshots and reports the squared L2 shift. A pipeline watching a live
ingest doesn't recompute snapshot centroids from scratch; it maintains
MERGEABLE per-label centroid partials — raw integer component sums and
member counts, NOT rounded means — as epoch-keyed segments, because
sums are associative where means are not: any set of partial segments
folds to exactly the centroid the batch query computes over the same
rows (the same partial/merge contract as the sketch family and
cms_stream's grids).

  micro-batch of (vec_id, label, embedding)
    → quantize to the engine's fixed-point grid (clustering.SCALE)
    → per-(label, dim) integer sums + counts (a label×DIM aggregate —
      the corpus is never shuffled)
    → one epoch segment of partial rows

Replay contract: epoch-overwrite segments (write_segment skips a
committed epoch), so at-least-once foreachBatch delivery yields
exactly-once partials; the fold dedups (epoch, label, dim) first so a
crash mid-compaction (duplicated rows) cannot double-count — the
cms_stream rule.

Drift between two stores (yesterday's corpus vs today's, or two
ingest feeds) folds each store and compares centroids — when the two
stores hold a corpus split the way the batch query splits it, the
result is BIT-IDENTICAL to embedding_centroid_drift (tested).

At 100 TB the store is |labels|×DIM×(epochs-since-compaction) rows of
integers — config-sized; each micro-batch costs one map-only quantize
pass + one tiny aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_pulsar_spark.streaming.segments import (
    auto_compact,
    read_segments,
    write_segment,
)

_PARTIAL_SCHEMA = "label INT, dim INT, s LONG, n LONG, epoch LONG"


def update_drift_partials(
    spark: SparkSession,
    batch_embs: DataFrame,
    store_path: str,
    epoch_id: int,
) -> None:
    """One micro-batch step: quantize, aggregate per-(label, dim) raw
    sums + counts, write one epoch segment of partials.

    `epoch_id` is REQUIRED (unlike the novelty index, whose fold is a
    duplicate-tolerant min): partials are SUMS, and fold_centroids
    dedups on (epoch, label, dim) to survive crash-duplicated rows —
    so two writes sharing an epoch value would collapse to one
    arbitrary row per cell, silently corrupting every centroid. Batch
    bootstraps go through backfill_drift_partials, which maps a
    required slice_id onto a reserved negative-epoch range."""
    if epoch_id is None:
        raise ValueError(
            "epoch_id is required; use backfill_drift_partials for "
            "batch bootstraps"
        )
    from open_pulsar_spark.operators.clustering import _Q_EXPR

    partials = (
        batch_embs.select("label", F.expr(_Q_EXPR).alias("q"))
        .select("label", F.posexplode("q").alias("pos", "v"))
        .groupBy("label", F.col("pos").alias("dim"))
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        .withColumn("epoch", F.lit(epoch_id).cast("long"))
        .select(
            F.col("label").cast("int"),
            F.col("dim").cast("int"),
            "s",
            "n",
            "epoch",
        )
    )
    write_segment(partials, store_path, epoch_id)


def backfill_drift_partials(
    spark: SparkSession,
    embs: DataFrame,
    store_path: str,
    slice_id: int,
) -> None:
    """Bootstrap a drift store from an existing corpus slice.

    `slice_id` is REQUIRED and must be unique per slice (0, 1, 2, …):
    each maps to a reserved negative epoch (-2, -3, …), so a rerun of
    the same slice overwrites its own segment instead of appending a
    duplicate (replay-idempotent, like a streaming epoch), and two
    different slices can never collide on an epoch value — the
    collision would silently drop one slice's sums at fold time.
    Streaming epochs are non-negative, so the ranges cannot overlap.
    Same contract as novelty_stream.backfill_novelty_index."""
    if slice_id < 0:
        raise ValueError(f"slice_id must be >= 0, got {slice_id}")
    update_drift_partials(spark, embs, store_path, epoch_id=-2 - slice_id)


def fold_centroids(spark: SparkSession, store_path: str) -> DataFrame | None:
    """All partial segments → (label, dim, cval, n): the fixed-point
    centroid per label, computed from RAW sums with ONE grid-rounded
    division at the end — identical to the batch query's centroid over
    the same member rows regardless of how they were batched.
    Duplicate partial rows (crash mid-compaction) dedup on
    (epoch, label, dim) before the fold."""
    parts = read_segments(spark, store_path, _PARTIAL_SCHEMA)
    if parts is None:
        return None
    return (
        parts.dropDuplicates(["epoch", "label", "dim"])
        .groupBy("label", "dim")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        .select(
            "label",
            "dim",
            F.expr(
                "cast(floor(cast(s as double) / n + 0.5d) as bigint)"
            ).alias("cval"),
            "n",
        )
    )


def drift_between(
    spark: SparkSession, old_store: str, new_store: str
) -> DataFrame:
    """Squared L2 centroid shift per label between two partial stores —
    the streaming twin of embedding_centroid_drift's output contract:
    (label, n_old, n_new, sq_shift) ordered by shift desc. Labels
    present in only one store drop out (inner join), matching the
    batch query."""
    old = fold_centroids(spark, old_store)
    new = fold_centroids(spark, new_store)
    if old is None or new is None:
        return spark.createDataFrame(
            [], "label BIGINT, n_old BIGINT, n_new BIGINT, sq_shift BIGINT"
        )
    o = old.select(
        "label", "dim", F.col("cval").alias("o"), F.col("n").alias("n_old")
    )
    n = new.select(
        "label", "dim", F.col("cval").alias("c_new"), F.col("n").alias("n_new")
    )
    return (
        o.join(n, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.max("n_old").cast("bigint").alias("n_old"),
            F.max("n_new").cast("bigint").alias("n_new"),
            F.sum((F.col("o") - F.col("c_new")) * (F.col("o") - F.col("c_new")))
            .cast("bigint")
            .alias("sq_shift"),
        )
        .select(F.col("label").cast("bigint").alias("label"), "n_old", "n_new", "sq_shift")
        .orderBy(F.desc("sq_shift"), "label")
    )


def start_drift_stream(
    spark: SparkSession,
    embs_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    compact_max_segments: int | None = 64,
):
    """Wire the partial maintenance as a streaming query over
    (vec_id, label, embedding) rows; the store self-compacts (partials
    stay per-epoch inside the compact segment — the fold dedups, never
    pre-merges across epochs, so compaction only rewrites files)."""

    def step(batch_df: DataFrame, epoch_id: int) -> None:
        update_drift_partials(spark, batch_df, store_path, epoch_id=epoch_id)
        auto_compact(
            spark,
            store_path,
            _PARTIAL_SCHEMA,
            dedup_keys=["epoch", "label", "dim"],
            cluster_cols=["label", "dim"],
            max_segments=compact_max_segments,
        )

    return (
        embs_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(step)
        .start()
    )
