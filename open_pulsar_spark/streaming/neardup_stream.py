"""Streaming near-duplicate filtering against a persisted corpus
index — the incremental form of dedup.dedup_minhash_lsh.

A 100 TB curation pipeline doesn't re-run batch LSH over the whole
corpus when new documents arrive; it keeps a SIGNATURE INDEX (the
per-doc band signatures + shingle-hash sketches, ~500 B/doc — the
compact artifact the batch operator already computes) and checks each
incoming micro-batch against it:

  batch of new docs
    → minhash signatures (the same Arrow kernel as batch dedup)
    → band equi-join against the index (candidates only)
    → exact-Jaccard verify on the hash sketches
    → survivors append to BOTH the output and the index

Dedup here is *against history AND within the batch* (a batch that
contains its own near-dups keeps the lowest doc_id — same
representative rule as dedup_clusters). The index grows by survivors
only, so a duplicate storm cannot bloat it.

State choice: the index lives as parquet appended via foreachBatch,
NOT in the streaming state store — it is a JOIN-side dataset (queried
by band signature), orders of magnitude larger than keyed state
should be. foreachBatch is AT-LEAST-ONCE, so idempotence is built in
here rather than assumed: every index append lands in its own
epoch-keyed subdirectory (`epoch=<id>`), a replayed epoch overwrites
its own subdir instead of appending twice, and the history join
excludes self-matches (`doc_id != idx_doc_id`) so a replayed batch
that already reached the index does not drop its own survivors at
Jaccard 1.0. At scale the index is a partitioned table bucketed on
the band signature.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_pulsar_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    LSH_BANDS,
    LSH_ROWS,
    _minhash_sigs,
)

_INDEX_SCHEMA = "doc_id LONG, band INT, sig STRING, hs ARRAY<BIGINT>"


def _bands_of(sigs: DataFrame) -> DataFrame:
    """(doc_id, m0..mk, hs) → exploded (doc_id, band, sig, hs)."""
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "|",
                            *[F.col(f"m{b * LSH_ROWS + r}") for r in range(LSH_ROWS)],
                        ).alias("sig"),
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("bs"),
        "hs",
    ).select("doc_id", "bs.band", "bs.sig", "hs")


def _near_dup_of(cand: DataFrame) -> DataFrame:
    """Candidate rows (doc_id, hs, idx_doc_id, idx_hs) → verified dups."""
    inter = F.size(F.array_intersect("hs", "idx_hs"))
    jacc = inter * F.lit(1.0) / (F.size("hs") + F.size("idx_hs") - inter)
    return cand.where(jacc >= JACCARD_THRESHOLD)


def _index_subdirs(index_path: str) -> list[str]:
    """Committed (has _SUCCESS) index segment dirs, sorted by name."""
    if not os.path.isdir(index_path):
        return []
    return sorted(
        os.path.join(index_path, d)
        for d in os.listdir(index_path)
        if os.path.isdir(os.path.join(index_path, d))
        and os.path.exists(os.path.join(index_path, d, "_SUCCESS"))
    )


def read_index(spark: SparkSession, index_path: str) -> DataFrame | None:
    """The signature index as a DataFrame, or None when empty.

    Segments are read as an explicit path list (no partition
    discovery), so stream-epoch dirs and compaction dirs can coexist;
    duplicate rows across segments (possible mid-compaction) are
    harmless — the candidate join dedups downstream.
    """
    dirs = _index_subdirs(index_path)
    if not dirs:
        return None
    return spark.read.schema(_INDEX_SCHEMA).parquet(*dirs)


def filter_batch_against_index(
    spark: SparkSession,
    batch_docs: DataFrame,
    index_path: str,
    epoch_id: int | None = None,
) -> DataFrame:
    """One micro-batch step: returns surviving docs (doc_id) and
    writes their band rows to the index. Pure function of (batch,
    index dir) — callable from foreachBatch or a batch backfill loop.

    Idempotent under replay when `epoch_id` is given: the index write
    targets `index_path/epoch=<id>` with overwrite (a half-written dir
    from a crash is cleaned, a committed one is left alone), and the
    history join below excludes self-matches, so re-running an epoch
    whose rows already reached the index reproduces the same survivor
    set instead of dropping everything as a 1.0-Jaccard self-dup.
    """
    sigs = _minhash_sigs(batch_docs).persist()
    sigs.count()  # pin before the multi-consumer reads below
    bands = _bands_of(sigs)

    index = read_index(spark, index_path)
    if index is not None:
        hist_cand = (
            bands.join(
                index.select(
                    "band",
                    "sig",
                    F.col("doc_id").alias("idx_doc_id"),
                    F.col("hs").alias("idx_hs"),
                ),
                ["band", "sig"],
            )
            # a replayed epoch finds its own rows in the index;
            # self-matches are replay artifacts, not duplicates
            .where(F.col("doc_id") != F.col("idx_doc_id"))
            .select("doc_id", "hs", "idx_doc_id", "idx_hs")
            .distinct()
        )
        dup_vs_history = (
            _near_dup_of(hist_cand).select("doc_id").distinct()
        )
    else:
        dup_vs_history = spark.createDataFrame([], "doc_id LONG")

    # within-batch near-dups: keep the lowest doc_id of each pair
    a, b = bands.alias("a"), bands.alias("b")
    in_batch_cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.sig") == F.col("b.sig")))
        .where(F.col("a.doc_id") > F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.hs").alias("hs"),
            F.col("b.doc_id").alias("idx_doc_id"),
            F.col("b.hs").alias("idx_hs"),
        )
        .distinct()
    )
    dup_in_batch = _near_dup_of(in_batch_cand).select("doc_id").distinct()

    dups = dup_vs_history.unionAll(dup_in_batch).distinct()
    survivors = sigs.select("doc_id").join(dups, "doc_id", "left_anti")

    # write survivors' band rows into their own index segment:
    #   epoch given   -> epoch=<id>, skipped when already committed
    #                    (replay no-op), overwritten when half-written
    #   no epoch      -> unique batch-<token> segment (backfill path)
    if epoch_id is not None:
        seg = os.path.join(index_path, f"epoch={epoch_id}")
        committed = os.path.exists(os.path.join(seg, "_SUCCESS"))
    else:
        seg = os.path.join(index_path, f"batch-{uuid.uuid4().hex[:12]}")
        committed = False
    if not committed:
        bands.join(survivors, "doc_id").select(
            "doc_id", "band", "sig", "hs"
        ).write.mode("overwrite").parquet(seg)
    out = survivors
    sigs.unpersist()
    return out


def start_neardup_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
):
    """Wire the incremental near-dup filter as a streaming query:
    docs(doc_id, text) stream → surviving doc_ids appended to out_path.

    Both sinks are epoch-keyed: a replayed epoch overwrites its own
    `epoch=<id>` subdir in out_path (reads of out_path see `epoch` as
    a partition column), so at-least-once foreachBatch delivery yields
    exactly-once *contents*.
    """

    def step(batch_df: DataFrame, epoch_id: int) -> None:
        survivors = filter_batch_against_index(
            spark, batch_df, index_path, epoch_id=epoch_id
        )
        survivors.write.mode("overwrite").parquet(
            os.path.join(out_path, f"epoch={epoch_id}")
        )

    return (
        docs_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(step)
        .start()
    )


def compact_index(spark: SparkSession, index_path: str, target_files: int = 8) -> int:
    """Rewrite the signature index segments into one `target_files`-file
    compacted segment. Returns the row count.

    foreachBatch appends one segment per micro-batch, so a long-lived
    stream accretes small files (the classic streaming-sink problem) —
    listing cost grows linearly and the band join's scan tasks shrink
    below useful sizes. Compaction is the standard fix, done
    crash-safely WITHOUT a window where the index disappears: write the
    merged rows into a new `compact-<token>` segment inside the live
    dir, then delete the source segments. A concurrent micro-batch
    always sees a live index; mid-swap it may see old+new segments
    (duplicate rows — harmless, the candidate join dedups), and a crash
    between write and delete leaves duplicates that the next compaction
    removes.

    At 100 TB this is the nightly OPTIMIZE job, and the rewrite also
    re-clusters by band signature (sortWithinPartitions) so the
    per-batch candidate join reads contiguous signature ranges.
    """
    import shutil

    src_dirs = _index_subdirs(index_path)
    if not src_dirs:
        return 0
    df = spark.read.schema(_INDEX_SCHEMA).parquet(*src_dirs).dropDuplicates(
        ["doc_id", "band"]
    )
    n = df.count()
    dest = os.path.join(index_path, f"compact-{uuid.uuid4().hex[:12]}")
    (
        df.repartition(target_files, "band", "sig")
        .sortWithinPartitions("band", "sig")
        .write.mode("overwrite")
        .parquet(dest)
    )
    for d in src_dirs:
        shutil.rmtree(d, ignore_errors=True)
    return n
