"""Broadcast-hint audit: walk a query's *analyzed* logical plan and report
every explicit ``F.broadcast`` hint together with the parquet tables its
subtree reads.

Why this exists (SCALE.md "Global posture"): an explicit broadcast hint is
*not* demoted by AQE, so a hint over a table that grows with scale factor
(customer / part / supplier / the facts) is a latent hard failure at the
100 TB north star — Spark refuses broadcasts > 8 GB.  The engine's rule is
that forced hints may only cover frames that stay bounded at any SF:

- schema-bounded base tables (``region`` = 5 rows, ``nation`` = 25);
- driver-local literal frames (``LocalRelation`` / ``LogicalRDD``), which
  are config-bounded by construction;
- *derived* frames that a bounding operator (global/bounded-domain
  ``Aggregate``, ``GlobalLimit``, ``Deduplicate`` over a bounded domain)
  reduces to a bounded row count, e.g. a 1-row total, a per-brand (25) or
  per-dow (7) stat frame, a top-N head.

``tests/test_plans.py::test_no_forced_broadcast_of_sf_linear_tables`` pins
the rule over every registered query: a hint whose subtree touches an
SF-linear table must carry a bounding operator AND appear in the test's
reviewed allowlist.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

# base tables whose row count is fixed by the schema, not the scale factor
SCHEMA_BOUNDED = frozenset({"nation", "region"})

# tables that grow linearly with scale factor — never raw-broadcastable
SF_LINEAR = frozenset(
    {
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    }
)

# first column of each base table → table name (relation lines in the
# analyzed tree render the relation's full output in schema order)
_FIRST_COL = {
    "r_regionkey": "region",
    "n_nationkey": "nation",
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "o_orderkey": "orders",
    "l_orderkey": "lineitem",
    "event_id": "events",
    "doc_id": "documents",
    "vec_id": "embeddings",
}

# logical nodes that can reduce an unbounded input to a bounded frame
# (whether they actually do depends on the grouping domain — that human
# judgment lives in the test's allowlist)
_BOUNDING_NODES = ("Aggregate", "GlobalLimit", "LocalLimit", "Deduplicate")

# leaf nodes that are driver-local literal frames
_LOCAL_LEAVES = ("LocalRelation", "LogicalRDD", "OneRowRelation", "Range")


@dataclass(frozen=True)
class BroadcastHint:
    """One ``ResolvedHint (strategy=broadcast)`` node in an analyzed plan."""

    tables: frozenset[str]  # parquet base tables read inside the hint
    has_bounding_op: bool  # Aggregate/Limit/Deduplicate between hint and scan
    local_only: bool  # subtree reads no parquet relation at all

    @property
    def sf_linear_tables(self) -> frozenset[str]:
        return self.tables & SF_LINEAR


def _depth_and_text(line: str) -> tuple[int, str]:
    """Tree-string lines prefix each level with one of ':- ', '+- ',
    ':  ', '   ' (3 chars per level)."""
    i = 0
    while line[i : i + 3] in (":- ", "+- ", ":  ", "   ") and i + 3 <= len(line):
        i += 3
    return i // 3, line[i:]


def broadcast_hints(df: DataFrame) -> list[BroadcastHint]:
    """Scan ``df``'s analyzed logical plan for explicit broadcast hints."""
    tree = df._jdf.queryExecution().analyzed().toString()
    parsed = [_depth_and_text(ln) for ln in tree.splitlines() if ln.strip()]
    hints: list[BroadcastHint] = []
    for idx, (depth, text) in enumerate(parsed):
        if not text.startswith("ResolvedHint") or "broadcast" not in text:
            continue
        tables: set[str] = set()
        bounding = False
        local = True
        for d2, t2 in parsed[idx + 1 :]:
            if d2 <= depth:
                break
            if t2.startswith("Relation [") and " parquet" in t2:
                first_col = t2[len("Relation [") :].split("#", 1)[0].split(",", 1)[0]
                tables.add(_FIRST_COL.get(first_col, f"?{first_col}"))
                local = False
            elif t2.startswith(_LOCAL_LEAVES):
                pass  # literal frame: bounded by construction
            elif t2.startswith(_BOUNDING_NODES):
                bounding = True
        hints.append(
            BroadcastHint(
                tables=frozenset(tables), has_bounding_op=bounding, local_only=local
            )
        )
    return hints


def frame_profile(df: DataFrame) -> BroadcastHint:
    """Profile a frame that is ABOUT to be broadcast-hinted: the parquet
    base tables its plan reads and whether a bounding operator sits above
    every scan.  Used by the test-suite ``F.broadcast`` monkeypatch, which
    catches hints applied inside eagerly-executed driver-side jobs that
    never appear in the returned DataFrame's plan (e.g. the collected
    cell frames of the ANOVA/DiD family)."""
    tree = df._jdf.queryExecution().analyzed().toString()
    tables: set[str] = set()
    bounding = False
    local = True
    for ln in tree.splitlines():
        _, text = _depth_and_text(ln)
        if text.startswith("Relation [") and " parquet" in text:
            first_col = text[len("Relation [") :].split("#", 1)[0].split(",", 1)[0]
            tables.add(_FIRST_COL.get(first_col, f"?{first_col}"))
            local = False
        elif text.startswith(_BOUNDING_NODES):
            bounding = True
    return BroadcastHint(
        tables=frozenset(tables), has_bounding_op=bounding, local_only=local
    )


def violating_hints(
    df: DataFrame, allowed_bounded: frozenset[frozenset[str]] = frozenset()
) -> list[BroadcastHint]:
    """Hints that break the scale rule.

    A hint passes when its subtree reads only schema-bounded tables and/or
    literal frames, or when it reads SF-linear tables but (a) a bounding
    operator sits between the hint and every scan and (b) the reviewed
    allowlist carries its exact table set for this query.
    """
    bad = []
    for h in broadcast_hints(df):
        if not h.sf_linear_tables:
            continue
        if h.has_bounding_op and h.tables in allowed_bounded:
            continue
        bad.append(h)
    return bad
