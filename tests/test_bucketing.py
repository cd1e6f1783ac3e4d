"""Bucketed-layout join: the SCALE.md co-location claim, asserted on a
real physical plan — both sides bucketed on the join key must join
with NO shuffle exchange on either side."""

from __future__ import annotations

import pytest

from open_pulsar_spark.tables import load_table, write_bucketed
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, SF_SMALL, "orders")
    lineitem = load_table(spark, SF_SMALL, "lineitem")
    write_bucketed(orders, "orders_b", str(base / "orders_b"), "o_orderkey")
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        str(base / "lineitem_b"),
        "o_orderkey",
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    # force the sort-merge path so the assertion is about bucketing,
    # not about AQE choosing broadcast on tiny test data
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_b").join(
            spark.table("lineitem_b"), "o_orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan        # co-located: no shuffle at all
        # and it actually computes
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_unbucketed_join_shuffles_for_contrast(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, SF_SMALL, "orders")
        li = load_table(spark, SF_SMALL, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        plan = orders.join(li, "o_orderkey")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan            # the layout, not luck, removed it
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_date_partitioned_layout_prunes_partitions(spark, tmp_path):
    """The SCALE.md layout claim for facts ('events by user_id+date'):
    a date filter over a date-partitioned dataset must prune at the
    FILE LISTING level (PartitionFilters in the scan), not scan
    everything and filter rows."""
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_SMALL, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    path = str(tmp_path / "events_by_date")
    ev.write.partitionBy("event_date").parquet(path)

    one_day = ev.select("event_date").distinct().limit(1).collect()[0][0]
    back = spark.read.parquet(path).where(F.col("event_date") == one_day)
    plan_buf = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan_buf
    assert f"(event_date = {one_day})" in plan_buf or "isnotnull(event_date" in plan_buf
    # and the pruned read returns exactly that day's rows
    expected = ev.where(F.col("event_date") == one_day).count()
    assert back.count() == expected > 0
