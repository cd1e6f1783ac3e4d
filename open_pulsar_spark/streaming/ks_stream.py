"""Streaming distribution-drift monitor — the per-(source, doc-length)
count ledger folded per micro-batch, serving the pairwise two-sample
Kolmogorov–Smirnov matrix live (the batch source_length_ks_matrix,
kept current).

Per-(source, length) counts are ADDITIVE, so this store runs the
fano/risk/mk contract: epoch segments are REQUIRED (an epoch-less
additive write has no safe sentinel — a replayed backfill would
double-add); reads dedup (epoch, source, v) BEFORE summing so the
mid-compaction double-read window cannot double-count:

  micro-batch of documents
    → (source, n_chars, c) per-batch counts (map-side combine)
    → one epoch segment

  read: dedup (epoch, source, v) → sum per (source, v) → the SAME
    ks_matrix_from_counts close as the batch query (exact integer
    cross-multiplied ECDF gaps in decimal(38,0), ppm D statistic,
    pure-integer α = 0.05 significance), so the live drift matrix
    bit-matches a batch scan over the union of all delivered
    documents, whatever the batching (tested).

The ops story at 100 TB: an ECDF needs each source's FULL length
distribution, so a naive implementation rescans the corpus per
refresh; the folded ledger is |sources| × |distinct lengths| rows
(content-bounded — the length range saturates) and the close's pair
join runs on that grid regardless of corpus volume.

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

_PARTIAL_SCHEMA = "source STRING, v LONG, c LONG, epoch LONG"
_DEDUP_KEYS = ["epoch", "source", "v"]
_CLUSTER_COLS = ["source", "v"]


def _ks_partial(docs: DataFrame) -> DataFrame:
    """documents → per-batch (source, n_chars, count) grid cells —
    the same length grain as the batch query."""
    return docs.groupBy(
        "source", F.col("n_chars").cast("bigint").alias("v")
    ).agg(F.count("*").cast("bigint").alias("c"))


def update_ks(
    spark: SparkSession,
    docs: DataFrame,
    store_path: str,
    epoch_id: int | None,
) -> None:
    """Fold one batch of documents into the length-count ledger.
    ADDITIVE store: the epoch is mandatory — replaying a committed
    epoch is a no-op by overwrite, but an epoch-less duplicate would
    double-add."""
    if epoch_id is None:
        raise ValueError(
            "ks_stream is additive: epoch-less backfills would "
            "double-count on redelivery; pass a unique epoch id"
        )
    update_partial_store(docs, store_path, epoch_id, _ks_partial)


def read_counts(spark: SparkSession, store_path: str) -> DataFrame:
    """The current folded (source, v, c) length-count grid. Dedup on
    (epoch, source, v) FIRST — see module docstring — then cell-sum."""
    raw = read_segments(spark, store_path, _PARTIAL_SCHEMA)
    if raw is None:
        return spark.createDataFrame([], "source STRING, v LONG, c LONG")
    return (
        raw.dropDuplicates(["epoch", "source", "v"])
        .groupBy("source", "v")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )


def ks_readout(spark: SparkSession, store_path: str) -> DataFrame:
    """The live pairwise-KS drift matrix from the stream-maintained
    ledger — the SAME ks_matrix_from_counts close as the batch
    source_length_ks_matrix, bit-matched over the union of all
    delivered documents."""
    from open_pulsar_spark.operators.profiling import ks_matrix_from_counts

    return ks_matrix_from_counts(
        spark, read_counts(spark, store_path), "ks_stream_cnt"
    )


def start_ks_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    compact_max_segments: int | None = 64,
):
    """document stream → continuously-maintained length-count ledger,
    on the shared partial-stream scaffold."""
    return start_partial_stream(
        docs_stream,
        store_path,
        checkpoint,
        partial_of=_ks_partial,
        schema=_PARTIAL_SCHEMA,
        dedup_keys=_DEDUP_KEYS,
        cluster_cols=_CLUSTER_COLS,
        compact_max_segments=compact_max_segments,
    )
