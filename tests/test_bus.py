"""Message-bus abstraction: file bus end-to-end, connector gating."""

from __future__ import annotations

import pytest

from open_pulsar_spark.sources.bus import BusConfig, read_bus, write_bus
from open_pulsar_spark.streaming.events_stream import EVENT_SCHEMA


def test_file_bus_roundtrip(spark, tmp_path):
    import datetime as dt

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10, 0), 1, "click", 1.0, "{}")], EVENT_SCHEMA
    ).coalesce(1).write.parquet(src)
    stream = read_bus(spark, BusConfig(uri=f"file://{src}", schema=EVENT_SCHEMA))
    assert stream.isStreaming
    q = write_bus(
        stream, BusConfig(uri="memory://bus_out"), checkpoint=str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()
    assert spark.sql("select * from bus_out").count() == 1


def test_file_bus_json_format(spark, tmp_path):
    from pyspark.sql.types import StructType

    src = str(tmp_path / "jsrc")
    schema = "update_id LONG, chat_id LONG, text STRING"
    spark.createDataFrame([(1, 7, "hi")], schema).coalesce(1).write.json(src)
    stream = read_bus(
        spark,
        BusConfig(
            uri=f"file://{src}",
            schema=StructType.fromDDL(schema),
            file_format="json",
        ),
    )
    q = write_bus(
        stream, BusConfig(uri="memory://bus_json"), checkpoint=str(tmp_path / "jck")
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from bus_json").collect()
    assert [(r.update_id, r.chat_id, r.text) for r in rows] == [(1, 7, "hi")]


def test_file_bus_requires_schema(spark):
    with pytest.raises(ValueError, match="schema"):
        read_bus(spark, BusConfig(uri="file:///tmp/x"))


def test_pulsar_gated_with_clear_error(spark):
    with pytest.raises(RuntimeError, match="pulsar connector"):
        read_bus(spark, BusConfig(uri="pulsar://localhost:6650/topic"))


def test_unknown_scheme_rejected(spark):
    with pytest.raises(ValueError, match="unknown bus scheme"):
        read_bus(spark, BusConfig(uri="carrier-pigeon://coop/topic"))


def test_has_format_detects_builtin_parquet(spark):
    # ADVICE r1: lookupDataSource needs a SQLConf; the old SparkConf
    # call made _has_format report False even for built-in formats.
    from open_pulsar_spark.sources.bus import _has_format

    assert _has_format(spark, "parquet") is True
    assert _has_format(spark, "json") is True
    assert _has_format(spark, "definitely-not-a-format") is False


def test_pulsar_reader_spec_contract():
    """The pulsar branch's option construction, pinned without a broker
    (reference source contract: telegram-agent.py:154-166)."""
    from open_pulsar_spark.sources.bus import bus_reader_spec, bus_writer_spec

    fmt, opts, path = bus_reader_spec(
        BusConfig(uri="pulsar://broker1:6650/ingest", starting_offsets="latest")
    )
    assert fmt == "pulsar" and path is None
    assert opts == {
        "service.url": "pulsar://broker1:6650",
        "topics": "ingest",
        "startingOffsets": "latest",
    }

    fmt, opts = bus_writer_spec(BusConfig(uri="pulsar://broker1:6650/replies"))
    assert fmt == "pulsar"
    assert opts == {"service.url": "pulsar://broker1:6650", "topic": "replies"}


def test_kafka_reader_spec_contract():
    from open_pulsar_spark.sources.bus import bus_reader_spec, bus_writer_spec

    fmt, opts, path = bus_reader_spec(
        BusConfig(
            uri="kafka://b1:9092/events",
            options={"kafka.security.protocol": "SSL"},
        )
    )
    assert fmt == "kafka" and path is None
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092",
        "subscribe": "events",
        "startingOffsets": "earliest",
        "kafka.security.protocol": "SSL",
    }

    fmt, opts = bus_writer_spec(BusConfig(uri="kafka://b1:9092/out"))
    assert fmt == "kafka"
    assert opts == {"kafka.bootstrap.servers": "b1:9092", "topic": "out"}


def test_file_reader_spec_carries_trigger_and_extras():
    from open_pulsar_spark.sources.bus import bus_reader_spec

    fmt, opts, path = bus_reader_spec(
        BusConfig(
            uri="file:///data/in",
            file_format="json",
            max_files_per_trigger=5,
            options={"multiLine": "true"},
        )
    )
    assert (fmt, path) == ("json", "/data/in")
    assert opts == {"maxFilesPerTrigger": "5", "multiLine": "true"}
