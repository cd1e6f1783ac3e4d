"""Spot-checks of the declared query surface: every registered query
runs at sf0.001 with a sane schema, and a representative subset is
hash-compared against its DuckDB oracle in-process (the full gate is
tools/verify_oracle.py)."""

from __future__ import annotations

import pytest

from open_pulsar_spark import registry
from tests.conftest import SF_SMALL

ORACLE_SUBSET = [
    "q1_pricing_summary",
    "top3_orders_per_customer",
    "user_sessionize",
    "click_asof_purchase",
    "dedup_minhash_lsh",
    "doc_text_stats",
    "parse_tasks",
    "multimodal_features",
]


def test_every_query_has_an_oracle_or_is_documented():
    qs, oracles = registry.all_queries(), registry.all_oracles()
    assert set(oracles) <= set(qs)
    missing = set(qs) - set(oracles)
    # current surface is fully SQL-expressible; anything added without
    # an oracle must be a genuinely non-SQL operator
    assert missing == set()


@pytest.mark.parametrize("name", ORACLE_SUBSET)
def test_query_matches_duckdb_oracle(spark, name):
    from tools.verify_oracle import compare, duck_connect

    con = duck_connect(SF_SMALL)
    res = compare(
        name, spark, con, SF_SMALL,
        registry.all_queries()[name], registry.all_oracles()[name],
    )
    assert res["status"] == "OK", res


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_disc_price" in df.columns
