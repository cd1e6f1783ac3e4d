"""Table catalog: nanos-timestamp events load on a session without the
legacy conf pre-set (the driver scenario), schema sanity."""

from __future__ import annotations

import pytest

from open_pulsar_spark.tables import TABLE_NAMES, load_table
from tests.conftest import SF_SMALL


def test_events_ts_is_usable_timestamp(spark):
    ev = load_table(spark, SF_SMALL, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    r = ev.orderBy("event_id").first()
    assert r.ts.year == 2024


def test_all_tables_load(spark):
    for name in TABLE_NAMES:
        assert load_table(spark, SF_SMALL, name).count() > 0


def test_unknown_table_rejected(spark):
    with pytest.raises(KeyError):
        load_table(spark, SF_SMALL, "nope")


def test_bigint_ts_rescaled_only_when_parquet_declares_nanos(spark, tmp_path):
    """A bigint column named like a timestamp is rescaled ns->us ONLY
    when the parquet footer declares TIMESTAMP(NANOS); a plain int64
    column with the same name must pass through untouched (testdata
    physical types drift between rounds — silent /1000 is the hazard)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from open_pulsar_spark.tables import _normalize_timestamps, _parquet_nanos_columns

    us = 1_704_103_200_000_000  # 2024-01-01 10:00:00 in microseconds

    # Case 1: genuine TIMESTAMP(NANOS) parquet -> nanosAsLong makes
    # Spark read bigint; the footer gate must fire and rescale.
    p_ns = str(tmp_path / "ns.parquet")
    pq.write_table(
        pa.table({"ts": pa.array([us * 1000], type=pa.timestamp("ns"))}),
        p_ns,
        store_schema=False,  # no arrow schema override: Spark sees raw INT64/TIMESTAMP(NANOS)
    )
    assert _parquet_nanos_columns(p_ns) == {"ts"}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(p_ns)
    if dict(df.dtypes)["ts"] == "bigint":  # nanosAsLong path
        out = _normalize_timestamps(df, _parquet_nanos_columns(p_ns))
        assert dict(out.dtypes)["ts"] == "timestamp"
        assert out.first().ts.year == 2024

    # Case 2: plain int64 named ts -> NOT a nanos column; values must
    # survive bit-for-bit (no /1000).
    p_int = str(tmp_path / "int.parquet")
    pq.write_table(pa.table({"ts": pa.array([us], type=pa.int64())}), p_int)
    assert _parquet_nanos_columns(p_int) == set()
    df2 = spark.read.parquet(p_int)
    out2 = _normalize_timestamps(df2, _parquet_nanos_columns(p_int))
    assert dict(out2.dtypes)["ts"] == "bigint"
    assert out2.first().ts == us


def test_widen_for_kernel_raises_narrow_scans(spark):
    from open_pulsar_spark.tables import load_table, widen_for_kernel

    from tests.conftest import SF_SMALL

    narrow = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    widened = widen_for_kernel(narrow)
    target = spark.sparkContext.defaultParallelism
    assert widened.rdd.getNumPartitions() >= min(
        target, narrow.rdd.getNumPartitions() + 1
    ) or narrow.rdd.getNumPartitions() >= target
    # already-wide frames pass through untouched (no extra exchange)
    wide = narrow.repartition(target)
    assert widen_for_kernel(wide) is wide
