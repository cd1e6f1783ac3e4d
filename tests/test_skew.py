"""Salted aggregation/join equivalence against unsalted plans, on a
deliberately skewed frame (one key owning ~90% of rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_pulsar_spark.operators.skew import (
    salted_agg_sum,
    salted_join,
    top_frequency_keys,
)


def _skewed(spark):
    hot = spark.range(900).select(
        F.lit("hot").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    cold = spark.range(100).select(
        F.concat(F.lit("c"), F.col("id") % 10).alias("k"), (F.col("id") * 1.0).alias("v")
    )
    return hot.unionAll(cold)


def test_salted_sum_equals_plain_sum(spark):
    df = _skewed(spark)
    plain = {r.k: r.s for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {r.k: r.sum_v for r in salted_agg_sum(df, "k", "v", buckets=8).collect()}
    assert salted == plain


def test_salted_join_equals_plain_join(spark):
    big = _skewed(spark)
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"c{i}", f"C{i}") for i in range(10)], "k STRING, label STRING"
    )
    plain = sorted((r.k, r.v, r.label) for r in big.join(dim, "k").collect())
    salted = sorted(
        (r.k, r.v, r.label) for r in salted_join(big, dim, "k", buckets=8).collect()
    )
    assert salted == plain


def test_top_frequency_diagnostic(spark):
    out = top_frequency_keys(_skewed(spark), "k", n=1).collect()
    assert out[0].k == "hot" and out[0].share == 0.9
