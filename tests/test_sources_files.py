"""Batch file sources: schema contract, drift failure, corrupt-row
quarantine — SURVEY §2.1 (S2/S6/S7 config-and-log shaped inputs) for
the batch side."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from open_pulsar_spark.sources.files import (
    SchemaDriftError,
    check_schema,
    quarantine_corrupt,
    read_batch,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
    ]
)


def test_csv_roundtrip_with_schema(spark, tmp_path):
    p = os.path.join(tmp_path, "in.csv")
    with open(p, "w") as f:
        f.write("id,name\n1,alpha\n2,beta\n")
    df = read_batch(spark, p, "csv", SCHEMA)
    assert sorted((r.id, r.name) for r in df.collect()) == [(1, "alpha"), (2, "beta")]


def test_json_requires_schema(spark, tmp_path):
    p = os.path.join(tmp_path, "in.json")
    with open(p, "w") as f:
        f.write('{"id": 1, "name": "alpha"}\n')
    with pytest.raises(ValueError, match="explicit schema"):
        read_batch(spark, p, "json")
    df = read_batch(spark, p, "json", SCHEMA)
    assert df.collect()[0].name == "alpha"


def test_parquet_schema_drift_fails(spark, tmp_path):
    p = os.path.join(tmp_path, "t.parquet")
    spark.createDataFrame([(1, "x")], "id LONG, label STRING").write.parquet(p)
    with pytest.raises(SchemaDriftError, match="missing column 'name'"):
        read_batch(spark, p, "parquet", SCHEMA)


def test_check_schema_type_mismatch(spark):
    df = spark.createDataFrame([("1", "x")], "id STRING, name STRING")
    with pytest.raises(SchemaDriftError, match="expected bigint, got string"):
        check_schema(df, SCHEMA)


def test_check_schema_projects_declared_order(spark):
    df = spark.createDataFrame([("x", 7, 1)], "name STRING, extra LONG, id LONG")
    out = check_schema(df, SCHEMA)
    assert out.columns == ["id", "name"]


def test_corrupt_json_rows_are_quarantined(spark, tmp_path):
    p = os.path.join(tmp_path, "bad.json")
    with open(p, "w") as f:
        f.write('{"id": 1, "name": "ok"}\n{\"id\": oops not json\n')
    schema = StructType(
        list(SCHEMA.fields) + [StructField("_corrupt_record", StringType())]
    )
    df = read_batch(spark, p, "json", schema)
    clean, bad = quarantine_corrupt(df)
    assert [r.id for r in clean.collect()] == [1]
    assert bad.count() == 1
    assert "oops" in bad.collect()[0]._corrupt_record


def test_write_training_shards_layout(spark, tmp_path):
    from open_pulsar_spark.streaming.sinks import write_training_shards

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "de", "tok " * 50) for i in range(40)],
        "doc_id LONG, lang STRING, text STRING",
    ).withColumn("text", F.rtrim("text"))
    out = os.path.join(tmp_path, "shards")
    write_training_shards(docs, out, budget=500)
    back = spark.read.parquet(out)
    # partition columns survive, every doc lands exactly once
    assert back.count() == 40
    assert {"lang", "shard_id"} <= set(back.columns)
    # per-shard token total stays within budget + one doc overshoot
    sums = (
        back.withColumn("n", F.size(F.split("text", " ")))
        .groupBy("lang", "shard_id")
        .agg(F.sum("n").alias("tokens"))
        .collect()
    )
    assert all(r.tokens <= 500 + 50 for r in sums)
    # one file per shard (training-loader contract)
    for r in sums:
        d = os.path.join(out, f"lang={r.lang}", f"shard_id={r.shard_id}")
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1


def test_text_format_reads_lines(spark, tmp_path):
    p = os.path.join(tmp_path, "log.txt")
    with open(p, "w") as f:
        f.write("line one\nline two\n")
    df = read_batch(spark, p, "text")
    assert sorted(r.value for r in df.collect()) == ["line one", "line two"]


def test_orc_roundtrip_with_schema_contract(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from open_pulsar_spark.sources.files import SchemaDriftError, read_batch

    path = str(tmp_path / "orc")
    spark.createDataFrame(
        [(1, "a", 2.0), (2, "b", 3.0)], "id long, name string, extra double"
    ).write.orc(path)
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    out = read_batch(spark, path, "orc", schema)
    # declared projection, declared order, extras pruned
    assert out.columns == ["id", "name"]
    assert {r.id for r in out.collect()} == {1, 2}
    missing = StructType(schema.fields + [StructField("absent", LongType())])
    try:
        read_batch(spark, path, "orc", missing)
        raise AssertionError("expected SchemaDriftError")
    except SchemaDriftError:
        pass


def test_read_stream_csv_quarantines_corrupt_rows(spark, tmp_path):
    """read_stream over CSV: clean rows land, corrupt rows quarantine
    per batch (PERMISSIVE + _corrupt_record through foreachBatch), the
    schema contract is enforced, and schema-less csv streaming is
    refused."""
    import pytest
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from open_pulsar_spark.sources.files import quarantine_corrupt, read_stream

    src = tmp_path / "csv_src"
    src.mkdir()
    (src / "a.csv").write_text("id,name\n1,alpha\n2,beta\n")
    (src / "b.csv").write_text('id,name\nnot_a_number,"unclosed\n3,gamma\n')

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    with pytest.raises(ValueError):
        read_stream(spark, str(src), "csv")

    stream = read_stream(
        spark, str(src), "csv", schema=schema, max_files_per_trigger=1
    )
    assert stream.isStreaming

    got_clean, got_bad = [], []

    def sink(batch, _epoch):
        clean, bad = quarantine_corrupt(batch)
        got_clean.extend((r.id, r.name) for r in clean.collect())
        got_bad.extend(r._corrupt_record for r in bad.collect())

    q = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", str(tmp_path / "ck")
    ).start()
    q.processAllAvailable()
    q.stop()

    assert sorted(got_clean) == [(1, "alpha"), (2, "beta"), (3, "gamma")]
    assert len(got_bad) == 1 and "not_a_number" in got_bad[0]
