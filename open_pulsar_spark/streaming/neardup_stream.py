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
should be, and foreachBatch gives exactly-once appends per epoch when
paired with the checkpoint. At scale the index is a partitioned table
bucketed on the band signature.
"""

from __future__ import annotations

import os

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


def filter_batch_against_index(
    spark: SparkSession, batch_docs: DataFrame, index_path: str
) -> DataFrame:
    """One micro-batch step: returns surviving docs (doc_id) and
    appends their band rows to the index. Pure function of (batch,
    index dir) — callable from foreachBatch or a batch backfill loop.
    """
    sigs = _minhash_sigs(batch_docs).persist()
    sigs.count()  # pin before the multi-consumer reads below
    bands = _bands_of(sigs)

    if os.path.isdir(index_path) and any(
        f.endswith(".parquet") for f in os.listdir(index_path)
    ):
        index = spark.read.schema(_INDEX_SCHEMA).parquet(index_path)
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

    # append survivors' band rows to the index (epoch-idempotence comes
    # from foreachBatch + checkpoint at the caller)
    bands.join(survivors, "doc_id").select("doc_id", "band", "sig", "hs").write.mode(
        "append"
    ).parquet(index_path)
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
    """

    def step(batch_df: DataFrame, epoch_id: int) -> None:
        survivors = filter_batch_against_index(spark, batch_df, index_path)
        survivors.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(
            out_path
        )

    return (
        docs_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(step)
        .start()
    )


def compact_index(spark: SparkSession, index_path: str, target_files: int = 8) -> int:
    """Rewrite the signature index into `target_files` files.

    foreachBatch appends one file set per micro-batch, so a long-lived
    stream accretes small files (the classic streaming-sink problem) —
    listing cost grows linearly and the band join's scan tasks shrink
    below useful sizes. Compaction is the standard fix: read, coalesce,
    rewrite to a temp dir, atomic-swap. Returns the row count.

    At 100 TB this is the nightly OPTIMIZE job, and the rewrite also
    re-clusters by band signature (sortWithinPartitions) so the
    per-batch candidate join reads contiguous signature ranges.
    """
    import shutil

    df = spark.read.schema(_INDEX_SCHEMA).parquet(index_path)
    n = df.count()
    tmp = index_path.rstrip("/") + ".compact.tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        df.repartition(target_files, "band", "sig")
        .sortWithinPartitions("band", "sig")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    old = index_path.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(index_path, old)
    os.rename(tmp, index_path)
    shutil.rmtree(old, ignore_errors=True)
    return n
