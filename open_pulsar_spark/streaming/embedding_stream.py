"""Streaming embedding near-dup filtering against a persisted bucket
index — the EMBEDDING twin of neardup_stream (which covers text): the
incremental form of operators.similarity.dedup_embedding_lsh.

Arriving embedding micro-batches are sign-LSH bucket-tagged map-side
(the same hyperplanes as the batch operator, so batch backfill and the
stream agree on buckets), then checked for cosine near-duplicates

  - against HISTORY: an equi-join on the bucket id against the
    persisted index — candidates are same-bucket vectors only, never
    the whole corpus;
  - WITHIN the batch: same-bucket self-join, lowest vec_id survives.

Survivors append to the output and to the index. The index stores
UNIT-NORMALIZED doubles, so the verify is a plain dot product (one
`aggregate(zip_with(...))` JVM expression — no Python in the join).

Replay safety mirrors neardup_stream: every index/output write lands
in an `epoch=<id>` segment (overwrite, skipped when already
committed), and the history join excludes self-matches, so
at-least-once foreachBatch delivery yields exactly-once contents.

Scale: the index is ~8·d B/vector partitioned by bucket; each batch
shuffles once on the bucket id. A hot bucket is the skew unit — the
knob is N_PLANES (more planes → smaller buckets), same trade as the
batch operator.
"""

from __future__ import annotations

import os
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_pulsar_spark.streaming.neardup_stream import _index_subdirs

COS_DUP_THRESHOLD = 0.4  # same near-dup bar as dedup_embedding_cosine/_lsh

_EMB_INDEX_SCHEMA = "vec_id LONG, bucket LONG, emb ARRAY<DOUBLE>"

# dot of unit vectors == cosine; plain JVM expression, no UDF
_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)"


def _tag_batch(batch: DataFrame) -> DataFrame:
    """(vec_id, embedding) → (vec_id, bucket, emb) with emb unit-norm.

    Map-only Arrow pass; reuses the batch operator's hyperplanes so
    stream and backfill assign identical buckets.
    """
    from open_pulsar_spark.operators.similarity import _block_norm, _buckets_of

    def tag(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            _, raw, unit = _block_norm(pdf)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "bucket": _buckets_of(raw),
                    "emb": list(unit),
                }
            )

    return batch.select("vec_id", "embedding").mapInPandas(tag, _EMB_INDEX_SCHEMA)


def read_embedding_index(spark: SparkSession, index_path: str) -> DataFrame | None:
    dirs = _index_subdirs(index_path)
    if not dirs:
        return None
    return spark.read.schema(_EMB_INDEX_SCHEMA).parquet(*dirs)


def filter_embeddings_against_index(
    spark: SparkSession,
    batch: DataFrame,
    index_path: str,
    epoch_id: int | None = None,
    threshold: float = COS_DUP_THRESHOLD,
) -> DataFrame:
    """One micro-batch step: survivors (vec_id) out, surviving tagged
    vectors appended to the bucket index. Idempotent under epoch
    replay (see module docstring)."""
    tagged = _tag_batch(batch).persist()
    tagged.count()  # pin before multi-consumer reads

    cos_hist = F.expr(_DOT.format(a="emb", b="idx_emb"))
    index = read_embedding_index(spark, index_path)
    if index is not None:
        dup_vs_history = (
            tagged.join(
                index.select(
                    "bucket",
                    F.col("vec_id").alias("idx_vec_id"),
                    F.col("emb").alias("idx_emb"),
                ),
                "bucket",
            )
            # replayed epochs find their own rows; self-matches are
            # replay artifacts, not duplicates
            .where(F.col("vec_id") != F.col("idx_vec_id"))
            .where(cos_hist >= threshold)
            .select("vec_id")
            .distinct()
        )
    else:
        dup_vs_history = spark.createDataFrame([], "vec_id LONG")

    a, b = tagged.alias("a"), tagged.alias("b")
    cos_batch = F.expr(_DOT.format(a="a.emb", b="b.emb"))
    dup_in_batch = (
        a.join(b, F.col("a.bucket") == F.col("b.bucket"))
        .where(F.col("a.vec_id") > F.col("b.vec_id"))
        .where(cos_batch >= threshold)
        .select(F.col("a.vec_id").alias("vec_id"))
        .distinct()
    )

    dups = dup_vs_history.unionAll(dup_in_batch).distinct()
    survivors = tagged.select("vec_id").join(dups, "vec_id", "left_anti")

    if epoch_id is not None:
        seg = os.path.join(index_path, f"epoch={epoch_id}")
        committed = os.path.exists(os.path.join(seg, "_SUCCESS"))
    else:
        seg = os.path.join(index_path, f"batch-{uuid.uuid4().hex[:12]}")
        committed = False
    if not committed:
        tagged.join(survivors, "vec_id").select(
            "vec_id", "bucket", "emb"
        ).write.mode("overwrite").parquet(seg)
    out = survivors
    tagged.unpersist()
    return out


def start_embedding_dedup_stream(
    spark: SparkSession,
    emb_stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
):
    """embeddings(vec_id, embedding) stream → surviving vec_ids in
    epoch-keyed segments under out_path (epoch is a partition column
    on read)."""

    def step(batch_df: DataFrame, epoch_id: int) -> None:
        survivors = filter_embeddings_against_index(
            spark, batch_df, index_path, epoch_id=epoch_id
        )
        survivors.write.mode("overwrite").parquet(
            os.path.join(out_path, f"epoch={epoch_id}")
        )

    return (
        emb_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(step)
        .start()
    )


def compact_embedding_index(
    spark: SparkSession, index_path: str, target_files: int = 8
) -> int:
    """Merge the per-epoch segments into one bucket-clustered segment
    (crash-safe, no index-less window — same scheme as
    neardup_stream.compact_index). Returns the deduped row count."""
    import shutil

    src_dirs = _index_subdirs(index_path)
    if not src_dirs:
        return 0
    df = (
        spark.read.schema(_EMB_INDEX_SCHEMA)
        .parquet(*src_dirs)
        .dropDuplicates(["vec_id"])
    )
    n = df.count()
    dest = os.path.join(index_path, f"compact-{uuid.uuid4().hex[:12]}")
    (
        df.repartition(target_files, "bucket")
        .sortWithinPartitions("bucket", "vec_id")
        .write.mode("overwrite")
        .parquet(dest)
    )
    for d in src_dirs:
        shutil.rmtree(d, ignore_errors=True)
    return n
