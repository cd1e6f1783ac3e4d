"""Query registry: the single source of truth for the engine's declared
query surface.

Every operator the engine claims (SURVEY.md §2) registers here with a
Spark implementation and, when SQL-expressible, a DuckDB oracle string.
`__spark_entry__.py` re-exports this registry verbatim, so implementing
an operator == registering it here.

Keeping the Spark code and the oracle SQL side by side in each module is
what keeps output column names in sync (the driver's compare hashes
values after sorting columns by name — names must match exactly).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query, optionally with its DuckDB oracle SQL.

    Queries with no oracle get the driver's weaker rows-only check
    (reserved for genuinely non-SQL-expressible operators).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from open_pulsar_spark.operators import (  # noqa: F401
        analytics,
        clustering,
        curation,
        dedup,
        graph,
        linkage,
        multimodal,
        profiling,
        relational,
        relational_ext,
        similarity,
        sketch,
        skew,
        tasks,
        text,
        windows,
    )


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)
