"""Streaming corpus ingestion: the batch curation funnel
(operators/curation.py) applied to a document STREAM — quality gate,
watermark-bounded exact dedup, and deterministic sampling, all as one
Structured Streaming pipeline.

This is the 100 TB ingest shape: documents arrive continuously from
the crawler bus; each micro-batch is filtered and deduped against
bounded state (the watermark evicts fingerprint state, so memory is
O(arrival rate × watermark), never O(corpus)). The cross-corpus
near-dup pass (MinHash) stays a periodic batch job over the
accumulated table — streaming handles the high-frequency exact-dup
and quality decisions that cut volume 10-100× before anything lands.

Reference parity: the reference's bus consumer dedups in-flight work
per chat key with in-memory sets (telegram-agent.py:374-390); this is
the same admission-control idea with state bounded by event time
instead of process lifetime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


DOC_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ingest_ts", TimestampType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def read_doc_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based streaming source over document-shaped parquet (the
    crawler-bus stand-in; swap for the bus connector in production)."""
    return (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def quality_gate(docs: DataFrame, threshold: float = 0.6) -> DataFrame:
    """The batch quality score (doc_quality_score) as a stream filter —
    pure expressions, so it runs unchanged on a streaming frame. Uses
    text.quality_expr, THE one shared definition, so a weight change
    can never desynchronize the stream gate from the batch funnel."""
    from open_pulsar_spark.operators.text import quality_expr

    return docs.where(quality_expr(F.col("text")) >= threshold)


def dedup_gate(docs: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exact-dup admission control: first arrival of a content
    fingerprint wins; replays within the watermark are dropped and the
    fingerprint state is evicted as event time advances."""
    return (
        docs.withColumn("fingerprint", F.md5("text"))
        .withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def sample_gate(docs: DataFrame, rate_pct: int = 50) -> DataFrame:
    """Deterministic hash sampling (corpus_sample_stratified's coin) —
    stateless, so replays and restarts make identical decisions."""
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    return docs.where(bucket < rate_pct)


def curate_stream(
    docs: DataFrame, watermark: str = "1 hour", rate_pct: int = 100
) -> DataFrame:
    """quality → exact-dedup → sample, composed on the stream."""
    return sample_gate(dedup_gate(quality_gate(docs), watermark), rate_pct)
