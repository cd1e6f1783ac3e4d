"""Bucketing: the 100 TB co-location story, made executable.

SCALE.md and a dozen docstrings say "bucket the fact tables on their
natural keys and the sessionization/fact-fact shuffles disappear".
This test proves the engine's plans actually take that deal: the same
orders ⋈ lineitem join compiles WITH two shuffle exchanges over plain
parquet and WITHOUT any over tables bucketed on the join key — so the
claim is a property of our query shapes, not a slogan (a refactor
that broke exchange reuse or added a non-key repartition would fail
here)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from open_pulsar_spark.tables import load_table
from tests.conftest import SF_SMALL


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_fact_join_elides_both_shuffles(spark):
    o = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_quantity"
    )

    def the_join(orders, lineitem):
        # force the sort-merge path so the exchange question is the
        # only variable (a broadcast join hides it at test scale)
        j = orders.hint("merge").join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        )
        return j.groupBy("o_orderkey").agg(
            F.sum("l_quantity").alias("qty")
        )

    plain = _plan_of(the_join(o, li))
    # plain parquet: both sides shuffle on the join key
    assert plain.count("Exchange") >= 2

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    try:
        bo = spark.table("b_orders")
        bl = spark.table("b_lineitem")
        bucketed = _plan_of(the_join(bo, bl))
        # bucketed on the join key: NO exchange anywhere — the join
        # reads co-located buckets and the aggregate reuses the same
        # distribution
        assert "Exchange" not in bucketed, bucketed
        # and the answers are identical
        want = sorted(
            tuple(r) for r in the_join(o, li).collect()
        )
        got = sorted(tuple(r) for r in the_join(bo, bl).collect())
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
