"""Streaming maintenance of the hypertable rollup's base layer.

`operators.analytics.events_rollup_cascade` states the batch shape:
hourly partials → daily → monthly, each level aggregating the
previous. This module is the streaming half — the hourly layer is
MAINTAINED continuously from the event stream, and the coarser grains
refresh from it in O(#hours) batch passes that never touch raw
events:

  events stream
    → watermarked 1-hour tumbling agg (count + sum partials)
    → foreachBatch: overwrite each hour's PARTITION of the hourly
      table (dynamic partition overwrite)
    → refresh_daily(): hourly table → daily table, batch, tiny

Idempotence: an hourly window is recomputed-in-full by Spark's
streaming aggregation state each time late (within-watermark) data
arrives, so "upsert" is exactly dynamic-partition-overwrite of that
window's partition — replaying an epoch rewrites the same partitions
with the same content (the same replay-safe idiom as
sinks.idempotent_epoch_sink). Sums (not avgs) are stored so daily
re-aggregates losslessly.

State bound: streaming-agg state is one row per (open window); the
watermark evicts windows older than the lateness bound, so state is
O(watermark / window) regardless of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """events(ts, value, ...) stream → per-hour partial aggregates."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
        .select(F.col("w.start").alias("b"), "n", "sv")
    )


def start_hourly_maintenance(
    spark: SparkSession, events: DataFrame, hourly_path: str, checkpoint: str
):
    """Continuously maintain the hourly table at `hourly_path`,
    partitioned by the hour bucket (dynamic partition overwrite)."""

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.withColumn("hour_key", F.date_format("b", "yyyy-MM-dd-HH"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("hour_key")
            .parquet(hourly_path)
        )

    return (
        hourly_rollup(events)
        .writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(upsert)
        .start()
    )


def refresh_daily(spark: SparkSession, hourly_path: str, daily_path: str) -> DataFrame:
    """Daily grain from the hourly table — O(#hours) rows in, O(#days)
    out, raw events never touched. Returns the daily frame (also
    written to daily_path for downstream monthly/reporting refreshes).
    """
    hourly = spark.read.parquet(hourly_path)
    daily = (
        hourly.groupBy(F.date_trunc("day", "b").alias("b"))
        .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    )
    daily.write.mode("overwrite").parquet(daily_path)
    return spark.read.parquet(daily_path)
