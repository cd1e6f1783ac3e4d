"""Message-bus source/sink abstraction.

The engine's streaming layer only requires "a streaming DataFrame with
a known schema" in and "a foreachBatch/format sink" out, so the bus is
swappable behind one URI-style dispatch:

  file:///path      — directory file source (parquet/json), used by all
                      tests; each new file ≙ one micro-batch of bus
                      messages (offset tracking via checkpoint WAL).
  memory://name     — in-memory sink for assertions.
  pulsar://host:port/topic
                    — Apache Pulsar via the public pulsar-spark
                      connector (`io.streamnative.connectors`), which
                      is a JAR on the session classpath, not a Python
                      dependency. This container doesn't ship it, so
                      the builder raises a clear error unless the
                      format is actually registered.
  kafka://host:port/topic
                    — same pattern through Spark's built-in Kafka
                      source (also JAR-gated in this container).

At 100 TB the bus partitioning is the stream's parallelism: one Spark
input partition per bus partition, keyed state partitioned by the
message key — nothing in the engine assumes a single consumer.

Reference parity: replaces the long-poll source + offset file
(telegram-agent.py:154-166, :113-124; SURVEY §2.1 S3, §2.9 T1/T2) —
the checkpoint WAL is the offset store, micro-batch trigger is the
poll loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


@dataclass
class BusConfig:
    uri: str
    schema: StructType | None = None        # required for file sources
    file_format: str = "parquet"
    max_files_per_trigger: int = 1
    starting_offsets: str = "earliest"
    options: dict[str, str] | None = None


def _has_format(spark: SparkSession, fmt: str) -> bool:
    """True if a DataSource format is registered on the classpath.

    lookupDataSource takes a SQLConf (not the SparkConf that
    spark._jsc.sc().conf() returns — passing that makes py4j raise for
    EVERY format, even parquet). Resolved via SQLConf.get() which is
    correct on the driver thread.
    """
    try:
        sql_conf = spark._jvm.org.apache.spark.sql.internal.SQLConf.get()
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            fmt, sql_conf
        )
        return True
    except Exception:  # noqa: BLE001 — py4j raises opaque wrapper types
        return False


def read_bus(spark: SparkSession, conf: BusConfig) -> DataFrame:
    """Open a streaming DataFrame over the configured bus."""
    parsed = urlparse(conf.uri)
    scheme = parsed.scheme or "file"

    if scheme == "file":
        if conf.schema is None:
            raise ValueError("file bus requires an explicit schema")
        reader = (
            spark.readStream.schema(conf.schema)
            .option("maxFilesPerTrigger", conf.max_files_per_trigger)
        )
        for k, v in (conf.options or {}).items():
            reader = reader.option(k, v)
        return reader.format(conf.file_format).load(parsed.path)

    if scheme == "pulsar":
        if not _has_format(spark, "pulsar"):
            raise RuntimeError(
                "pulsar connector not on the classpath; launch with "
                "--packages io.streamnative.connectors:pulsar-spark-connector_2.13:<ver> "
                "(JVM-side dependency, not pip-installable)"
            )
        return (
            spark.readStream.format("pulsar")
            .option("service.url", f"pulsar://{parsed.netloc}")
            .option("topics", parsed.path.lstrip("/"))
            .option("startingOffsets", conf.starting_offsets)
            .load()
        )

    if scheme == "kafka":
        if not _has_format(spark, "kafka"):
            raise RuntimeError(
                "kafka source not on the classpath; launch with "
                "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-ver>"
            )
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", parsed.netloc)
            .option("subscribe", parsed.path.lstrip("/"))
            .option("startingOffsets", conf.starting_offsets)
            .load()
        )

    raise ValueError(f"unknown bus scheme {scheme!r} in {conf.uri!r}")


def write_bus(df: DataFrame, conf: BusConfig, checkpoint: str, query_name: str = "bus_sink"):
    """Start a streaming write to the configured bus/sink."""
    parsed = urlparse(conf.uri)
    scheme = parsed.scheme or "file"
    writer = df.writeStream.option("checkpointLocation", checkpoint)

    if scheme == "memory":
        return writer.format("memory").queryName(parsed.netloc or query_name).start()
    if scheme == "file":
        return (
            writer.format(conf.file_format)
            .option("path", parsed.path)
            .outputMode("append")
            .start()
        )
    if scheme == "pulsar":
        spark = df.sparkSession
        if not _has_format(spark, "pulsar"):
            raise RuntimeError("pulsar connector not on the classpath (see read_bus)")
        return (
            writer.format("pulsar")
            .option("service.url", f"pulsar://{parsed.netloc}")
            .option("topic", parsed.path.lstrip("/"))
            .start()
        )
    raise ValueError(f"unknown sink scheme {scheme!r} in {conf.uri!r}")
