"""Data profiling & quality suite — the ANALYZE/SUMMARIZE/Deequ-class
surface an engine needs before any 100 TB corpus is trusted: a
one-scan Pearson correlation matrix from exact integer sums, a
SUMMARIZE-style per-column profile, a declarative data-quality rule
suite, and a mutual-information readout for categorical feature
selection.

Shared scale contract: every statistic here is either (a) an algebraic
sum whose partials merge (map-side combine, one reduce to O(1) rows),
(b) the Expand plan Spark compiles multi-column DISTINCT aggregates to
(rows × #distinct-columns through ONE shuffle, partially aggregated
map-side), or (c) a left join against a DEDUPED reference key whose
null side feeds one more conditional sum (referential rules). No
operator here ever materializes more than O(#columns + #rules) rows on
the driver; floats appear only in the final O(1)-row projection,
computed with the identical expression shape as the DuckDB oracle so
round(·, 6) agrees bit-for-bit (the repo's established log/ratio
parity pattern, see curation.py PMI).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_pulsar_spark.registry import query
from open_pulsar_spark.tables import load_table

# --------------------------------------------------------------------------
# lineitem_corr_matrix — one-scan Pearson correlation matrix from exact
# integer sums (the distributive-statistics pattern).
# --------------------------------------------------------------------------
_CORR_COLS = ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]


def _corr_pairs() -> list[tuple[str, str]]:
    return [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ]


def _corr_oracle() -> str:
    ints = ", ".join(
        f"round({c} * 100)::BIGINT AS {c[2:]}" for c in _CORR_COLS
    )
    sums = ["count(*)::BIGINT AS n"]
    for c in _CORR_COLS:
        s = c[2:]
        sums.append(f"sum({s})::HUGEINT AS s_{s}")
        sums.append(f"sum({s} * {s})::HUGEINT AS s_{s}_{s}")
    for a, b in _corr_pairs():
        x, y = a[2:], b[2:]
        sums.append(f"sum({x} * {y})::HUGEINT AS s_{x}_{y}")
    arms = []
    for a, b in _corr_pairs():
        x, y = a[2:], b[2:]
        corr = (
            f"round((n::DOUBLE * s_{x}_{y}::DOUBLE"
            f" - s_{x}::DOUBLE * s_{y}::DOUBLE)"
            f" / sqrt((n::DOUBLE * s_{x}_{x}::DOUBLE"
            f" - s_{x}::DOUBLE * s_{x}::DOUBLE)"
            f" * (n::DOUBLE * s_{y}_{y}::DOUBLE"
            f" - s_{y}::DOUBLE * s_{y}::DOUBLE)), 6)"
        )
        arms.append(f"SELECT '{a}' AS col_x, '{b}' AS col_y, n, {corr} AS corr FROM s")
    return f"""
    WITH ints AS (SELECT {ints} FROM lineitem),
    s AS (SELECT {", ".join(sums)} FROM ints)
    {" UNION ALL ".join(arms)}
    ORDER BY col_x, col_y
    """


@query("lineitem_corr_matrix", oracle=_corr_oracle())
def lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix over lineitem's numeric measures in
    ONE scan: every pairwise corr is closed-form from distributive
    sums (n, Σx, Σx², Σxy) — 15 sums + a count, all partials merge
    map-side, one reduce to a single row, then O(#pairs) arithmetic.
    This is how you correlate at 100 TB: never a second pass, never a
    driver-side fit, and the sums are EXACT because every measure is
    integer cents (×100) — Spark sums them as decimal(38,0) and DuckDB
    as HUGEINT, so both engines feed bit-identical integers into the
    identical double-precision closing expression (round 6 agrees).

    Scale: the scan reads exactly four columns (pruned ReadSchema);
    the aggregate is a map-only partial + 1-row final — shuffle bytes
    are O(#partitions × 16 sums). The pair unpivot (stack) runs on the
    single result row.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ints = li.select(
        *[
            F.round(F.col(c) * 100).cast("bigint").alias(c[2:])
            for c in _CORR_COLS
        ]
    )
    aggs = [F.count("*").cast("bigint").alias("n")]
    for c in _CORR_COLS:
        s = c[2:]
        aggs.append(
            F.sum(F.col(s).cast("decimal(38,0)")).alias(f"s_{s}")
        )
        aggs.append(
            F.sum((F.col(s) * F.col(s)).cast("decimal(38,0)")).alias(
                f"s_{s}_{s}"
            )
        )
    for a, b in _corr_pairs():
        x, y = a[2:], b[2:]
        aggs.append(
            F.sum((F.col(x) * F.col(y)).cast("decimal(38,0)")).alias(
                f"s_{x}_{y}"
            )
        )
    s = ints.agg(*aggs)

    def corr_expr(x: str, y: str):
        n = F.col("n").cast("double")
        sx = F.col(f"s_{x}").cast("double")
        sy = F.col(f"s_{y}").cast("double")
        sxx = F.col(f"s_{x}_{x}").cast("double")
        syy = F.col(f"s_{y}_{y}").cast("double")
        sxy = F.col(f"s_{x}_{y}").cast("double")
        return F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        )

    # compute all pair correlations on the ONE result row, then unpivot
    # with stack — re-referencing `s` once per pair would compile one
    # lineitem scan per pair (exchange reuse across union branches does
    # not fire; dedup._pin documents the contract)
    wide = s.select(
        "n",
        *[
            corr_expr(a[2:], b[2:]).alias(f"corr_{a[2:]}_{b[2:]}")
            for a, b in _corr_pairs()
        ],
    )
    arms = ", ".join(
        f"'{a}', '{b}', corr_{a[2:]}_{b[2:]}" for a, b in _corr_pairs()
    )
    return wide.select(
        F.expr(
            f"stack({len(_corr_pairs())}, {arms}) as (col_x, col_y, corr)"
        ),
        "n",
    ).select("col_x", "col_y", "n", "corr").orderBy("col_x", "col_y")


# --------------------------------------------------------------------------
# orders_profile / documents_profile — SUMMARIZE-style per-column
# profiles in one pass per table.
# --------------------------------------------------------------------------
# per table: [(column, Spark min/max canonicalizer, DuckDB twin)]
_PROFILE_SPECS = {
    "orders": [
        ("o_custkey", "CAST({c} AS STRING)", "{c}::VARCHAR"),
        ("o_orderdate", "date_format({c}, 'yyyy-MM-dd')",
         "strftime({c}, '%Y-%m-%d')"),
        ("o_orderpriority", "{c}", "{c}"),
        ("o_orderstatus", "{c}", "{c}"),
        ("o_totalprice", "CAST(CAST(round({c} * 100) AS BIGINT) AS STRING)",
         "(round({c} * 100)::BIGINT)::VARCHAR"),
    ],
    # text itself is profiled by length only (doc_text_stats owns
    # content statistics; a min/max over raw document bodies would put
    # whole documents in the profile rows)
    "documents": [
        ("doc_id", "CAST({c} AS STRING)", "{c}::VARCHAR"),
        ("lang", "{c}", "{c}"),
        ("n_chars", "CAST({c} AS STRING)", "{c}::VARCHAR"),
        ("source", "{c}", "{c}"),
    ],
}


def _profile_oracle(table: str) -> str:
    arms = []
    for c, _, fmt in _PROFILE_SPECS[table]:
        arms.append(
            f"""SELECT '{c}' AS column_name,
                count(*)::BIGINT AS n_rows,
                (count(*) - count({c}))::BIGINT AS n_null,
                count(DISTINCT {c})::BIGINT AS n_distinct,
                {fmt.format(c=f"min({c})")} AS min_val,
                {fmt.format(c=f"max({c})")} AS max_val
            FROM {table}"""
        )
    return " UNION ALL ".join(arms) + " ORDER BY column_name"


def _profile_table(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Per-column SINGLE-DISTINCT aggregates, submitted concurrently
    (guide §2.6): an agg with one count_distinct plans as the
    Expand-free two-level distinct (partial dedup by the column
    map-side, merge, then count — VERDICT r12 item 6), and each job's
    scan is pruned to ITS column, so the row stream is never
    multiplied. The r12 shape put all columns in one aggregate, which
    compiles to an Expand plan — every input row fanned to
    (#distinct-columns + 1) tagged rows before the first partial
    aggregate (measured at sf0.1: orders 150k rows → 900k through the
    hash aggregate). One scan of all columns vs N pruned one-column
    scans is I/O-neutral on a columnar store; the thread pool overlaps
    the N jobs so their stage tails back-fill. Exactness is untouched
    — same count/null/distinct/min/max, assembled into the same
    5-rows-per-table local frame.

    SIZE-ADAPTIVE (the scale-adaptive settings rule): for a SMALL
    table the N extra job schedulings cost more than the Expand
    multiplication saves (measured at sf0.1: documents, 5k rows,
    0.45 s one-pass vs 0.85 s per-column — while orders, 150k rows,
    went 3.2 s → 1.0 s), so the row count from the parquet FOOTER
    (driver-side metadata, no job) picks the plan; both shapes compute
    the identical exact result."""
    spec = _PROFILE_SPECS[table]
    df = load_table(spark, sf_dir, table)

    n_rows_meta = None
    try:
        import pyarrow.parquet as pq

        n_rows_meta = pq.ParquetFile(
            f"{sf_dir}/{table}.parquet"
        ).metadata.num_rows
    except Exception:
        pass  # unknown layout: fall through to the fan-out plan

    if n_rows_meta is not None and n_rows_meta < 50_000:
        # one-pass Expand plan: (len(spec)+1)x row multiplication is
        # cheaper than len(spec) job schedulings at this cardinality
        aggs = [F.count("*").cast("bigint").alias("n_rows")]
        for c, fmt, _ in spec:
            aggs.append(
                (F.count("*") - F.count(c)).cast("bigint").alias(f"null_{c}")
            )
            aggs.append(
                F.count_distinct(F.col(c)).cast("bigint").alias(f"nd_{c}")
            )
            aggs.append(F.expr(fmt.format(c=f"min({c})")).alias(f"min_{c}"))
            aggs.append(F.expr(fmt.format(c=f"max({c})")).alias(f"max_{c}"))
        s = df.agg(*aggs)
        arms = ", ".join(
            f"'{c}', `null_{c}`, `nd_{c}`, `min_{c}`, `max_{c}`"
            for c, _, _ in spec
        )
        return (
            s.select(
                F.expr(
                    f"stack({len(spec)}, {arms})"
                    " as (column_name, n_null, n_distinct, min_val, max_val)"
                ),
                "n_rows",
            )
            .select(
                "column_name", "n_rows", "n_null", "n_distinct",
                "min_val", "max_val",
            )
            .orderBy("column_name")
        )

    def one(col_spec):
        c, fmt, _ = col_spec
        spark.sparkContext.setJobDescription(f"profile {table}.{c}")
        row = df.agg(
            F.count("*").cast("bigint").alias("n_rows"),
            (F.count("*") - F.count(c)).cast("bigint").alias("n_null"),
            F.count_distinct(F.col(c)).cast("bigint").alias("n_distinct"),
            F.expr(fmt.format(c=f"min({c})")).alias("min_val"),
            F.expr(fmt.format(c=f"max({c})")).alias("max_val"),
        ).collect()[0]
        return (
            c,
            row["n_rows"],
            row["n_null"],
            row["n_distinct"],
            row["min_val"],
            row["max_val"],
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(spec)) as pool:
        rows = sorted(pool.map(one, spec))
    return spark.createDataFrame(
        rows,
        "column_name STRING, n_rows BIGINT, n_null BIGINT,"
        " n_distinct BIGINT, min_val STRING, max_val STRING",
    ).orderBy("column_name")


@query("orders_profile", oracle=_profile_oracle("orders"))
def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUMMARIZE/ANALYZE-style table profile: per column, row count,
    null count, EXACT distinct count, and canonical min/max — the
    statistics a query optimizer's ANALYZE collects and a data
    engineer's first look at an unfamiliar 100 TB table. Plan shape:
    _profile_table (concurrent Expand-free per-column single-distinct
    aggregates over pruned one-column scans). Canonical strings
    (dates as yyyy-MM-dd, money as integer cents) keep the schema
    uniform across column types.
    """
    return _profile_table(spark, sf_dir, "orders")


@query("documents_profile", oracle=_profile_oracle("documents"))
def documents_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-table twin of orders_profile: doc_id/lang/n_chars/
    source profiled in the same concurrent per-column single-distinct
    shape (_profile_table).
    The text column is deliberately excluded — content statistics
    belong to doc_text_stats, and a min/max over raw bodies would put
    whole documents in the profile rows.
    """
    return _profile_table(spark, sf_dir, "documents")


# --------------------------------------------------------------------------
# functional_dependency_mining — approximate-FD DISCOVERY (the
# constraint-suggestion half of the DQ family: dq_violation_counts
# checks declared rules, this measures which rules the data could bear).
# --------------------------------------------------------------------------
# (table, determinant, dependent) candidates — PUBLIC schema knowledge.
# n_nationkey → n_name is a true FD (key) and anchors the scale's top;
# the rest are plausible-but-false dependencies whose measured strength
# is the point.
FD_CANDIDATES = (
    ("nation", "n_nationkey", "n_name"),
    ("part", "p_brand", "p_type"),
    ("lineitem", "l_returnflag", "l_linestatus"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("orders", "o_orderpriority", "o_orderstatus"),
)


def _fd_oracle() -> str:
    parts = []
    for tbl, det, dep in FD_CANDIDATES:
        name = f"{tbl}: {det} -> {dep}"
        parts.append(f"""
    SELECT '{name}' AS candidate,
           sum(tot)::BIGINT AS n_rows,
           count(*)::BIGINT AS n_det_values,
           sum(tot - mx)::BIGINT AS n_violations,
           ((sum(tot) - sum(tot - mx)) * 1000000 // sum(tot))::BIGINT
               AS strength_ppm,
           (CASE WHEN (sum(tot) - sum(tot - mx)) * 100 >= sum(tot) * 99
                 THEN 1 ELSE 0 END)::INT AS holds_99
    FROM (SELECT {det} AS d, max(n) AS mx, sum(n) AS tot
          FROM (SELECT {det}, {dep}, count(*)::BIGINT AS n
                FROM {tbl} GROUP BY 1, 2) GROUP BY 1)""")
    return (
        "SELECT * FROM ("
        + " UNION ALL ".join(parts)
        + ") ORDER BY candidate"
    )


@query("functional_dependency_mining", oracle=_fd_oracle())
def functional_dependency_mining(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Approximate functional-dependency MINING (the Tane/Deequ
    constraint-suggestion shape): for each candidate X → Y in
    {FD_CANDIDATES}, the minimum rows that would need to change for
    the FD to hold exactly (per determinant value, everything outside
    the majority dependent value is a violation — the g3 error
    measure), its strength in ppm, and whether it clears a 99% bar.
    dq_violation_counts CHECKS rules someone wrote; this DISCOVERS
    which rules the data could bear — the profiling pass that writes
    the next version of the rule suite. The true key-FD
    nation.n_nationkey → n_name anchors strength at exactly 10⁶.

    Determinism: violations count via max-per-group (no majority
    tie-break needed — only the majority's SIZE matters); strength is
    one trunc-div ppm on positive operands.

    Scale: each candidate is one map-combinable (X, Y) count aggregate
    + one X-keyed rollup + a 1-row reduce, unioned — never a join, no
    window over any fact table; candidate list is config-bounded."""
    branches = []
    for tbl, det, dep in FD_CANDIDATES:
        name = f"{tbl}: {det} -> {dep}"
        c = (
            load_table(spark, sf_dir, tbl)
            .select(det, dep)
            .groupBy(det, dep)
            .agg(F.count("*").cast("bigint").alias("n"))
        )
        m = c.groupBy(det).agg(
            F.max("n").alias("mx"), F.sum("n").alias("tot")
        )
        branches.append(
            m.agg(
                F.lit(name).alias("candidate"),
                F.sum("tot").cast("bigint").alias("n_rows"),
                F.count("*").cast("bigint").alias("n_det_values"),
                F.sum(F.col("tot") - F.col("mx"))
                .cast("bigint")
                .alias("n_violations"),
                F.expr(
                    "cast((sum(tot) - sum(tot - mx)) * 1000000"
                    " div sum(tot) as bigint)"
                ).alias("strength_ppm"),
                F.expr(
                    "cast(CASE WHEN (sum(tot) - sum(tot - mx)) * 100"
                    " >= sum(tot) * 99 THEN 1 ELSE 0 END as int)"
                ).alias("holds_99"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionAll(b)
    return out.orderBy("candidate")


# --------------------------------------------------------------------------
# dq_violation_counts — declarative data-quality rule suite (the
# Deequ/dbt-tests class) in minimal scans.
# --------------------------------------------------------------------------
@query(
    "dq_violation_counts",
    oracle="""
    WITH li AS (
        SELECT count(*)::BIGINT AS n,
               sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                        THEN 1 ELSE 0 END)::BIGINT AS qty_range,
               sum(CASE WHEN l_extendedprice <= 0
                        THEN 1 ELSE 0 END)::BIGINT AS nonpos_price,
               sum(CASE WHEN l_discount < 0 OR l_discount > 0.5
                        THEN 1 ELSE 0 END)::BIGINT AS disc_range
        FROM lineitem
    ),
    ord AS (
        SELECT count(*)::BIGINT AS n,
               sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                        THEN 1 ELSE 0 END)::BIGINT AS status_domain,
               sum(CASE WHEN o_totalprice <= 0
                        THEN 1 ELSE 0 END)::BIGINT AS nonpos_total,
               (count(*) - count(DISTINCT o_orderkey))::BIGINT AS dup_key
        FROM orders
    ),
    doc AS (
        SELECT count(*)::BIGINT AS n,
               (count(*) - count(DISTINCT doc_id))::BIGINT AS dup_id,
               sum(CASE WHEN n_chars < 50 THEN 1 ELSE 0 END)::BIGINT
                   AS short_text,
               sum(CASE WHEN n_chars != length(text)
                        THEN 1 ELSE 0 END)::BIGINT AS nchars_mismatch
        FROM documents
    ),
    li_orphan AS (
        SELECT count(*)::BIGINT AS v FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)
    ),
    ord_orphan AS (
        SELECT count(*)::BIGINT AS v FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)
    )
    SELECT * FROM (
        SELECT 'documents_dup_doc_id' AS rule, dup_id AS n_violations,
               n AS n_checked FROM doc
        UNION ALL
        SELECT 'documents_nchars_mismatch', nchars_mismatch, n FROM doc
        UNION ALL
        SELECT 'documents_short_text', short_text, n FROM doc
        UNION ALL
        SELECT 'lineitem_discount_range', disc_range, n FROM li
        UNION ALL
        SELECT 'lineitem_nonpositive_price', nonpos_price, n FROM li
        UNION ALL
        SELECT 'lineitem_orphan_orderkey', li_orphan.v, li.n
        FROM li_orphan, li
        UNION ALL
        SELECT 'lineitem_qty_range', qty_range, n FROM li
        UNION ALL
        SELECT 'orders_dup_orderkey', dup_key, n FROM ord
        UNION ALL
        SELECT 'orders_nonpositive_total', nonpos_total, n FROM ord
        UNION ALL
        SELECT 'orders_orphan_custkey', ord_orphan.v, ord.n
        FROM ord_orphan, ord
        UNION ALL
        SELECT 'orders_status_domain', status_domain, n FROM ord
    ) ORDER BY rule
    """,
)
def dq_violation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality suite (the Deequ / dbt-tests class):
    eleven rules across three tables, reported as (rule, n_violations,
    n_checked) — the trust report a 100 TB ingest publishes before any
    downstream query runs.

    Scale contract, by rule class — ONE pass per table, total:
    - ROW-LEVEL rules (ranges, domains, non-positivity, derived-column
      consistency) are conditional sums in one aggregate: map-only
      partials to a single row. Adding a rule adds an expression,
      never a pass.
    - REFERENTIAL rules fold into the SAME pass: the fact side left
      joins the reference's DEDUPED key column (dedup keeps the left
      row count exact even if the reference itself violated
      uniqueness), and the orphan count is one more conditional sum
      on the join's null side. AQE broadcasts the key side when it
      fits, shuffles on the key when it doesn't.
    - UNIQUENESS rules ride the same aggregate as count(*) −
      count(DISTINCT key) via the Expand plan (map-side partial dedup
      before the one shuffle).
    Each table's rules then STACK from its single result row — one
    subtree per table, never re-referenced (exchange reuse across
    union branches does not fire; see dedup._pin's contract), so the
    whole suite is exactly three scans + two key joins.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    docs = load_table(spark, sf_dir, "documents")

    def flag(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    ord_keys = orders.select(
        F.col("o_orderkey").alias("ref_orderkey")
    ).distinct()
    li_agg = (
        li.select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
        .join(ord_keys, F.col("l_orderkey") == F.col("ref_orderkey"), "left")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            flag(
                (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
            ).alias("qty_range"),
            flag(F.col("l_extendedprice") <= 0).alias("nonpos_price"),
            flag(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 0.5)
            ).alias("disc_range"),
            flag(F.col("ref_orderkey").isNull()).alias("orphan"),
        )
    )
    cust_keys = cust.select(
        F.col("c_custkey").alias("ref_custkey")
    ).distinct()
    ord_agg = (
        orders.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .join(cust_keys, F.col("o_custkey") == F.col("ref_custkey"), "left")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            flag(~F.col("o_orderstatus").isin("O", "F", "P")).alias(
                "status_domain"
            ),
            flag(F.col("o_totalprice") <= 0).alias("nonpos_total"),
            (F.count("*") - F.count_distinct(F.col("o_orderkey")))
            .cast("bigint")
            .alias("dup_key"),
            flag(F.col("ref_custkey").isNull()).alias("orphan"),
        )
    )
    doc_agg = docs.agg(
        F.count("*").cast("bigint").alias("n"),
        (F.count("*") - F.count_distinct(F.col("doc_id")))
        .cast("bigint")
        .alias("dup_id"),
        flag(F.col("n_chars") < 50).alias("short_text"),
        flag(F.col("n_chars") != F.length("text")).alias("nchars_mismatch"),
    )

    def stacked(agg_row: DataFrame, rules: list[tuple[str, str]]) -> DataFrame:
        arms = ", ".join(f"'{name}', {col}" for name, col in rules)
        return agg_row.select(
            F.expr(
                f"stack({len(rules)}, {arms}) as (rule, n_violations)"
            ),
            F.col("n").alias("n_checked"),
        )

    out = (
        stacked(
            doc_agg,
            [
                ("documents_dup_doc_id", "dup_id"),
                ("documents_nchars_mismatch", "nchars_mismatch"),
                ("documents_short_text", "short_text"),
            ],
        )
        .unionAll(
            stacked(
                li_agg,
                [
                    ("lineitem_discount_range", "disc_range"),
                    ("lineitem_nonpositive_price", "nonpos_price"),
                    ("lineitem_orphan_orderkey", "orphan"),
                    ("lineitem_qty_range", "qty_range"),
                ],
            )
        )
        .unionAll(
            stacked(
                ord_agg,
                [
                    ("orders_dup_orderkey", "dup_key"),
                    ("orders_nonpositive_total", "nonpos_total"),
                    ("orders_orphan_custkey", "orphan"),
                    ("orders_status_domain", "status_domain"),
                ],
            )
        )
    )
    return out.orderBy("rule")


# --------------------------------------------------------------------------
# flag_status_mutual_info — categorical dependence readout for feature
# selection (information-theoretic profiling).
# --------------------------------------------------------------------------
@query(
    "flag_status_mutual_info",
    oracle="""
    WITH cells AS (
        SELECT l_returnflag AS rf, l_linestatus AS ls,
               count(*)::BIGINT AS nxy
        FROM lineitem GROUP BY 1, 2
    ),
    tot AS (SELECT sum(nxy)::BIGINT AS n FROM cells),
    mx AS (SELECT rf, sum(nxy)::BIGINT AS nx FROM cells GROUP BY rf),
    my AS (SELECT ls, sum(nxy)::BIGINT AS ny FROM cells GROUP BY ls)
    SELECT c.rf AS l_returnflag, c.ls AS l_linestatus,
           c.nxy AS n_joint,
           round(ln(c.nxy::DOUBLE * t.n::DOUBLE
                    / (mx.nx::DOUBLE * my.ny::DOUBLE)), 6) AS pmi_nats,
           round((c.nxy::DOUBLE / t.n::DOUBLE)
                 * ln(c.nxy::DOUBLE * t.n::DOUBLE
                      / (mx.nx::DOUBLE * my.ny::DOUBLE)), 6)
               AS mi_contrib_nats
    FROM cells c
    JOIN mx USING (rf) JOIN my USING (ls) CROSS JOIN tot t
    ORDER BY l_returnflag, l_linestatus
    """,
)
def flag_status_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical-dependence profile: pointwise and total mutual
    information between l_returnflag and l_linestatus from ONE count
    aggregate — the feature-selection readout ('are these two columns
    redundant?') that at 100 TB must come from counts, not samples.

    Scale: one (flag × status) groupBy over the fact table — the only
    pass over data. Margins and the total derive from the TINY cells
    frame (≤ |flags|·|statuses| rows), so the joins and the
    unpartitioned sum all run on a config-sized frame, the same shape
    corpus_source_drift uses for its KL margins. Counts are exact
    BIGINTs; the single ln(·) per output row is computed with the
    identical expression in both engines (round 6).
    """
    li = load_table(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_returnflag").alias("rf"), F.col("l_linestatus").alias("ls")
    ).agg(F.count("*").cast("bigint").alias("nxy"))
    from open_pulsar_spark.operators.dedup import _pin

    cells = _pin("mi_cells", cells)
    mx = cells.groupBy("rf").agg(F.sum("nxy").cast("bigint").alias("nx"))
    my = cells.groupBy("ls").agg(F.sum("nxy").cast("bigint").alias("ny"))
    # the total comes from an unpartitioned window over the JOINED
    # frame (each cell appears exactly once, so the window sum is the
    # grand total) — fine because the frame is ≤ |flags|·|statuses|
    # rows, and it avoids the 1-row cross join's nested-loop plan
    # (the corpus_source_drift margin pattern)
    from pyspark.sql.window import Window

    joined = (
        cells.join(mx, "rf")
        .join(my, "ls")
        .withColumn(
            "n", F.sum("nxy").over(Window.partitionBy()).cast("bigint")
        )
    )
    ratio = (
        F.col("nxy").cast("double")
        * F.col("n").cast("double")
        / (F.col("nx").cast("double") * F.col("ny").cast("double"))
    )
    return joined.select(
        F.col("rf").alias("l_returnflag"),
        F.col("ls").alias("l_linestatus"),
        F.col("nxy").alias("n_joint"),
        F.round(F.log(ratio), 6).alias("pmi_nats"),
        F.round(
            (F.col("nxy").cast("double") / F.col("n").cast("double"))
            * F.log(ratio),
            6,
        ).alias("mi_contrib_nats"),
    ).orderBy("l_returnflag", "l_linestatus")


# --------------------------------------------------------------------------
# embedding_covariance_topk — dimension-correlation profile of the
# embedding space (the embedding-side member of the profiling family).
# --------------------------------------------------------------------------
COV_TOPK = 15

_SCATTER_CACHE: dict[tuple[str, str], tuple] = {}
_SCATTER_LOCK = threading.Lock()


def _scatter_sums(spark: SparkSession, sf_dir: str):
    """The one-pass integer scatter aggregates of the quantized
    embedding matrix — (n, upper-triangle pair sums [(i, j, Σxixj)],
    per-dim sums {d: Σx}, per-dim square sums {d: Σx²}) — MEMOIZED per
    (Spark application, sf_dir), the clustering._fit train-once
    contract: embedding_covariance_topk and embedding_pca_power
    consume the identical aggregates (the 40M-row pair explode is the
    dominant cost of both), the sums are exact integers so the cache
    is bit-identical to recomputing, and dead-app entries evict on
    insert. ~2 KB per live entry. The lock is held across the compute
    so concurrent FAIR-pool consumers serialize into one pass."""
    from open_pulsar_spark.operators.clustering import _Q_EXPR
    from open_pulsar_spark.operators.dedup import _pin

    key = (spark.sparkContext.applicationId, sf_dir)
    with _SCATTER_LOCK:
        hit = _SCATTER_CACHE.get(key)
        if hit is not None:
            return hit
        emb = _pin(
            "cov_q",
            load_table(spark, sf_dir, "embeddings").select(
                F.expr(_Q_EXPR).alias("q")
            ),
        )
        n = emb.count()
        up = (
            emb.select(
                F.explode(
                    F.expr(
                        "flatten(transform(q, (xi, i) ->"
                        " transform(slice(q, i + 2, size(q) - i - 1),"
                        " (xj, k) -> struct(i as i, i + 1 + k as j,"
                        " xi * xj as p))))"
                    )
                ).alias("e")
            )
            .select("e.i", "e.j", "e.p")
            .groupBy("i", "j")
            .agg(F.sum(F.col("p").cast("decimal(38,0)")).alias("sij"))
        )
        dims = (
            emb.select(F.posexplode("q").alias("d", "x"))
            .groupBy("d")
            .agg(
                F.sum(F.col("x").cast("decimal(38,0)")).alias("s"),
                F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias(
                    "ss"
                ),
            )
        )
        up_rows = [(r.i, r.j, int(r.sij)) for r in up.collect()]
        dim_rows = dims.collect()
        s_by_d = {r.d: int(r.s) for r in dim_rows}
        ss_by_d = {r.d: int(r.ss) for r in dim_rows}
        # consumption is fully eager (count + two collects) and cache
        # hits return the driver tuples — release the executor memory
        # instead of pinning the quantized corpus for the app lifetime
        # (_release keeps the _pin registry consistent with reality)
        from open_pulsar_spark.operators.dedup import _release

        _release("cov_q")
        from open_pulsar_spark.operators.clustering import _evict_other_apps

        _evict_other_apps(_SCATTER_CACHE, key[0])
        hit = (n, up_rows, s_by_d, ss_by_d)
        _SCATTER_CACHE[key] = hit
    return hit


def _cov_oracle() -> str:
    from open_pulsar_spark.operators.clustering import DIM, SCALE

    q = (
        "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)"
        f" * {SCALE} + 0.5) AS BIGINT))"
    )
    return f"""
    WITH q AS (SELECT {q} AS qv FROM embeddings),
    n AS (SELECT count(*)::BIGINT AS n FROM q),
    dims AS (
        SELECT t.i AS d,
               sum(qv[t.i + 1])::HUGEINT AS s,
               sum(qv[t.i + 1] * qv[t.i + 1])::HUGEINT AS ss
        FROM q, range(0, {DIM}) t(i) GROUP BY 1
    ),
    pairs AS (
        SELECT ti.i AS i, tj.i AS j,
               sum(qv[ti.i + 1] * qv[tj.i + 1])::HUGEINT AS sij
        FROM q, range(0, {DIM}) ti(i), range(0, {DIM}) tj(i)
        WHERE ti.i < tj.i GROUP BY 1, 2
    ),
    c AS (
        SELECT p.i, p.j,
               n.n::DOUBLE * p.sij::DOUBLE - di.s::DOUBLE * dj.s::DOUBLE
                   AS num,
               n.n::DOUBLE * di.ss::DOUBLE - di.s::DOUBLE * di.s::DOUBLE
                   AS vi,
               n.n::DOUBLE * dj.ss::DOUBLE - dj.s::DOUBLE * dj.s::DOUBLE
                   AS vj
        FROM pairs p
        JOIN dims di ON di.d = p.i
        JOIN dims dj ON dj.d = p.j
        CROSS JOIN n
    )
    SELECT i, j, round(num / sqrt(vi * vj), 6) AS corr
    FROM c WHERE vi > 0 AND vj > 0
    ORDER BY abs(corr) DESC, i, j LIMIT {COV_TOPK}
    """


@query("embedding_covariance_topk", oracle=_cov_oracle())
def embedding_covariance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {COV_TOPK} most-correlated embedding-dimension pairs — the
    redundancy/anisotropy profile of the embedding space (highly
    correlated dimensions mean wasted capacity, and they are what an
    OPQ-style rotation or PCA would exploit; this readout says whether
    that is worth doing BEFORE anyone trains anything).

    Scale contract (the corr-matrix pattern lifted from 4 columns to
    {COV_TOPK}-of-2016 dimension pairs): vectors quantize to the
    engine's fixed-point grid (clustering._Q_EXPR, so sums are exact
    integers and order-independent), each vector EXPLODES to its
    upper-triangle pair products inside codegen (no self-join of the
    exploded frame — the pair list is built per-row by a nested
    transform over the array), and one groupBy(i, j) collapses
    everything map-side to DIM·(DIM+1)/2 partial rows per partition.
    Per-dimension sums ride a posexplode aggregate; the closing corr
    arithmetic runs on the config-sized (2016-row) frame with the
    oracle's expression shape, and the top-k orders by the ROUNDED
    |corr| (then keys) so the cut cannot hinge on libm. At 100 TB the
    explode is 2080× row amplification of already-scanned integers —
    map-local, shuffle-free until the 2016-group aggregate — the
    standard exact formulation when a BLAS partial (mapInPandas outer
    product) is not warranted. The scatter aggregates themselves come
    from _scatter_sums — computed once per (application, sf_dir) and
    shared with embedding_pca_power; the closing corr arithmetic runs
    in Spark over the config-sized (2016-row) frame built from the
    cached exact integers, so results are bit-identical to the
    uncached plan.
    """
    n, up_rows, s_by_d, ss_by_d = _scatter_sums(spark, sf_dir)
    from decimal import Decimal

    # DECIMAL(38,0) columns, not LONG: the cached sums are exact Python
    # ints and the pre-refactor plan carried decimal end-to-end — a
    # LONG schema would narrow the exactness envelope to 2^63
    rows = [
        tuple([i, j] + [Decimal(v) for v in
                        (sij, s_by_d[i], s_by_d[j], ss_by_d[i], ss_by_d[j])])
        for (i, j, sij) in up_rows
    ]
    sij = spark.createDataFrame(
        rows,
        "i INT, j INT, sij DECIMAL(38,0), si DECIMAL(38,0),"
        " sj DECIMAL(38,0), sii DECIMAL(38,0), sjj DECIMAL(38,0)",
    )
    nn = F.lit(float(n))
    num = (
        nn * F.col("sij").cast("double")
        - F.col("si").cast("double") * F.col("sj").cast("double")
    )
    vi = (
        nn * F.col("sii").cast("double")
        - F.col("si").cast("double") * F.col("si").cast("double")
    )
    vj = (
        nn * F.col("sjj").cast("double")
        - F.col("sj").cast("double") * F.col("sj").cast("double")
    )
    # zero-variance dimensions (a constant/zero-padded slot) are
    # EXCLUDED, matching the oracle — a 0 denominator would throw
    # under ANSI mode and has no defined correlation anyway
    return (
        sij.where((vi > 0) & (vj > 0))
        .select(
            "i", "j", F.round(num / F.sqrt(vi * vj), 6).alias("corr")
        )
        .orderBy(F.abs(F.col("corr")).desc(), "i", "j")
        .limit(COV_TOPK)
    )


# --------------------------------------------------------------------------
# lineitem_price_histogram — equi-depth histogram (optimizer statistics).
# --------------------------------------------------------------------------
HIST_BINS = 16


@query(
    "lineitem_price_histogram",
    oracle=f"""
    WITH r AS (
        SELECT l_extendedprice AS price,
               row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
                                  l_linenumber) AS rk,
               count(*) OVER () AS n
        FROM lineitem)
    SELECT (((rk - 1) * {HIST_BINS}) // n + 1)::BIGINT AS bin,
           count(*)   AS n_rows,
           min(price) AS lo,
           max(price) AS hi
    FROM r GROUP BY 1 ORDER BY bin
    """,
)
def lineitem_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram of l_extendedprice — the optimizer/
    ANALYZE statistics artifact (selectivity estimation wants equal
    ROW mass per bucket, not equal value ranges; a heavy-tailed price
    column makes equi-width bins useless). Bin assignment is the
    Bresenham spread ((rk-1)·B) div n — deterministic in both engines,
    unlike NTILE's first-buckets-get-extras convention — over the
    total order (price, orderkey, linenumber).

    Scale: the global rank comes from prefix.global_prefix (range
    partition → ≤32 per-partition counts to the driver → parallel
    windows + broadcast offsets), so the biggest table in the schema
    never funnels through a single-partition ORDER BY window; the
    {HIST_BINS}-row result materializes before the partitioning cache
    releases. This query IS the engine's answer to "compute ANALYZE
    stats at 100 TB".
    """
    from open_pulsar_spark.operators.prefix import global_prefix

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("price"), "l_orderkey", "l_linenumber"
    )
    aug, totals, release = global_prefix(
        spark, li, ["price", "l_orderkey", "l_linenumber"]
    )
    out = (
        aug.withColumn(
            "bin",
            F.expr(f"((rk - 1) * {HIST_BINS}) div {totals['n']} + 1").cast(
                "bigint"
            ),
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("price").alias("lo"),
            F.max("price").alias("hi"),
        )
        .orderBy("bin")
    )
    result = spark.createDataFrame(out.collect(), out.schema)
    release()
    return result


# --------------------------------------------------------------------------
# embedding_pca_power — leading principal component by power iteration.
# --------------------------------------------------------------------------
PCA_ROUNDS = 8
_PCA_DOWN = 1 << 30  # scatter-matrix scale-down so entries stay bigint


def _pca_oracle() -> str:
    from open_pulsar_spark.operators.clustering import DIM, SCALE

    q = (
        "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)"
        f" * {SCALE} + 0.5) AS BIGINT))"
    )
    # one unrolled power-iteration round: u = M v; mx = max|u|;
    # v' = round(u * 4096 / mx) on the fixed-point grid
    def rnd(k: int, prev_v: str) -> str:
        return f"""
    u{k} AS (SELECT m.d, sum(m.val * {prev_v}.v)::BIGINT AS u
             FROM m JOIN {prev_v} ON m.e = {prev_v}.d GROUP BY m.d),
    x{k} AS (SELECT max(abs(u)) AS mx FROM u{k}),
    v{k} AS (SELECT d, CASE WHEN mx = 0 THEN 0
                            ELSE CAST(floor(u * 4096.0 / mx + 0.5) AS BIGINT)
                       END AS v
             FROM u{k} CROSS JOIN x{k})"""

    rounds = ",".join(rnd(k, f"v{k-1}") for k in range(1, PCA_ROUNDS + 1))
    return f"""
    WITH qv AS (SELECT {q} AS qv FROM embeddings),
    n AS (SELECT count(*)::HUGEINT AS n FROM qv),
    dims AS (
        SELECT t.i AS d,
               sum(qv[t.i + 1])::HUGEINT AS s,
               sum(qv[t.i + 1] * qv[t.i + 1])::HUGEINT AS ss
        FROM qv, range(0, {DIM}) t(i) GROUP BY 1
    ),
    up AS (
        SELECT ti.i AS i, tj.i AS j,
               sum(qv[ti.i + 1] * qv[tj.i + 1])::HUGEINT AS sij
        FROM qv, range(0, {DIM}) ti(i), range(0, {DIM}) tj(i)
        WHERE ti.i < tj.i GROUP BY 1, 2
    ),
    m AS (
        SELECT i AS d, j AS e,
               CAST(floor((n.n * up.sij - di.s * dj.s) / {_PCA_DOWN}.0 + 0.5)
                    AS BIGINT) AS val
        FROM up JOIN dims di ON di.d = up.i
                JOIN dims dj ON dj.d = up.j CROSS JOIN n
        UNION ALL
        SELECT j, i,
               CAST(floor((n.n * up.sij - di.s * dj.s) / {_PCA_DOWN}.0 + 0.5)
                    AS BIGINT)
        FROM up JOIN dims di ON di.d = up.i
                JOIN dims dj ON dj.d = up.j CROSS JOIN n
        UNION ALL
        SELECT d, d,
               CAST(floor((n.n * ss - s * s) / {_PCA_DOWN}.0 + 0.5) AS BIGINT)
        FROM dims CROSS JOIN n
    ),
    v0 AS (SELECT t.i AS d, 4096::BIGINT AS v FROM range(0, {DIM}) t(i)),
    {rounds}
    SELECT d::BIGINT AS d, v / 4096.0 AS loading
    FROM v{PCA_ROUNDS}
    ORDER BY d
    """


@query("embedding_pca_power", oracle=_pca_oracle())
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading principal component of the embedding space by {PCA_ROUNDS}
    rounds of POWER ITERATION over the centered scatter matrix — the
    direction embedding_covariance_topk's pairwise readout hints at,
    computed outright: the axis an OPQ-style rotation would align
    first, and the anisotropy direction mean-ablation papers subtract.
    The synthetic embeddings' spectrum is nearly flat (top eigengap
    ~6%), so the honest quality metric is captured ENERGY, not
    eigenvector alignment: measured Rayleigh quotient after
    {PCA_ROUNDS} rounds = 0.91×top-eigenvalue at sf0.001, 0.95× at
    sf0.01 (tests/test_operators.py pins ≥ 0.85 and exact-integer
    equality with a numpy replica of the same iteration).
    Every step is deterministic and engine-identical: the scatter
    matrix n·Σxy − Σx·Σy is exact integer arithmetic on the fixed-
    point grid (scaled down by 2^30 into bigint range), and each
    round renormalizes the iterate back onto the 4096 grid with the
    engine's shared floor(x+0.5) rule — so after {PCA_ROUNDS} rounds
    both engines hold bit-identical integer vectors, no eigensolver
    and no libm ordering anywhere.

    Scale: the heavy phase is the SHARED _scatter_sums aggregate
    (computed once per application/sf_dir, reused verbatim by
    embedding_covariance_topk — per-row upper-triangle explode in
    codegen, DIM(DIM+1)/2 partial rows per partition, map-side
    combine); the matrix (2080 upper+diagonal entries) is driver-side —
    bounded by construction, the k-means/centroid contract — and the
    iteration runs driver-side in exact Python integers: DIM²-sized
    matvecs, trivially cheap, NEVER another pass over the corpus. At
    ~3e9 summed grid units per dimension the double-exact window of
    the scale-down shifts — raise _PCA_DOWN with the corpus (same
    plan, same parity argument).
    """
    import math

    from open_pulsar_spark.operators.clustering import DIM

    n, up_rows, s_by_d, ss_by_d = _scatter_sums(spark, sf_dir)
    # full matrix from the upper triangle + diagonal, scaled to bigint
    M = [[0] * DIM for _ in range(DIM)]
    for i, j, sij in up_rows:  # DIM(DIM-1)/2 rows — bounded by construction
        val = math.floor(
            (n * sij - s_by_d[i] * s_by_d[j]) / float(_PCA_DOWN) + 0.5
        )
        M[i][j] = M[j][i] = val
    for d in range(DIM):
        M[d][d] = math.floor(
            (n * ss_by_d[d] - s_by_d[d] * s_by_d[d]) / float(_PCA_DOWN) + 0.5
        )
    v = [4096] * DIM
    for _ in range(PCA_ROUNDS):
        u = [sum(M[d][e] * v[e] for e in range(DIM)) for d in range(DIM)]
        mx = max(abs(x) for x in u)
        v = [
            0 if mx == 0 else math.floor(x * 4096.0 / mx + 0.5) for x in u
        ]
    # v/4096 is an exact dyadic rational in double — NO decimal rounding
    # anywhere (a 6-dp round would hit guaranteed .5 ties on this grid,
    # where Python rounds half-to-even and DuckDB half-away-from-zero)
    return spark.createDataFrame(
        [(d, v[d] / 4096.0) for d in range(DIM)],
        "d LONG, loading DOUBLE",
    ).orderBy("d")


# --------------------------------------------------------------------------
# join_size_estimate — optimizer-style cardinality estimation, graded.
# --------------------------------------------------------------------------
JSE_HH = 10  # heavy hitters kept exactly by the corrected estimator


@query(
    "join_size_estimate",
    oracle=f"""
    WITH counts AS (
        SELECT user_id, count(*)::BIGINT AS n FROM events GROUP BY user_id),
    st AS (
        SELECT sum(n)::HUGEINT AS big_n, count(*)::BIGINT AS ndv,
               sum(n * n)::HUGEINT AS exact_sz
        FROM counts),
    hh AS (
        SELECT n FROM counts ORDER BY n DESC, user_id LIMIT {JSE_HH}),
    hs AS (SELECT sum(n)::HUGEINT AS hh_n, sum(n * n)::HUGEINT AS hh_sq,
                  count(*)::BIGINT AS h FROM hh),
    hist AS (
        SELECT floor(log2(n))::BIGINT AS bin,
               sum(n)::HUGEINT AS s_b, count(*)::BIGINT AS k_b
        FROM counts GROUP BY 1),
    he AS (SELECT sum(s_b * s_b // k_b)::HUGEINT AS est_hist FROM hist),
    est AS (
        SELECT 'uniform' AS estimator,
               (st.big_n * st.big_n // st.ndv)::HUGEINT AS est_n,
               st.exact_sz::HUGEINT AS exact_n
        FROM st
        UNION ALL
        SELECT 'hh_corrected',
               (hs.hh_sq
                + (st.big_n - hs.hh_n) * (st.big_n - hs.hh_n)
                  // greatest(st.ndv - hs.h, 1))::HUGEINT,
               st.exact_sz::HUGEINT
        FROM st, hs
        UNION ALL
        SELECT 'histogram', he.est_hist, st.exact_sz::HUGEINT
        FROM st, he)
    -- >2^63-capable exact counters leave the query as digit STRINGs:
    -- both engines print the same decimal digits, and the driver's
    -- value hash canonicalizes STRING identically (DECIMAL(38,0) was
    -- the round-7 hash-mismatch culprit)
    SELECT estimator, est_n::VARCHAR AS est_rows,
           exact_n::VARCHAR AS exact_rows,
           (abs(est_n - exact_n) * 1000000 // exact_n)::BIGINT
               AS rel_err_ppm
    FROM est
    WHERE exact_n IS NOT NULL
    ORDER BY estimator
    """,
)
def join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation, GRADED: the size of the events
    self-join on user_id (the canonical 'will this shuffle explode'
    question — Σ n_k², driven entirely by key skew) estimated two ways
    an optimizer would, next to the exact answer:
      - `uniform`: N²/ndv — what a cost model with only (count, ndv)
        statistics can say; under skew it UNDERestimates, sometimes
        catastrophically;
      - `hh_corrected`: exact Σ n² over the top-{JSE_HH} heavy hitters
        plus the uniform tail — what ANALYZE's most-common-values
        list buys;
      - `histogram`: power-of-two equi-width buckets over the COUNT
        distribution, uniform within each bucket (Σ_b S_b²/k_b) — the
        full-histogram statistics shape, the rung between MCV and
        exact.
    The rel_err_ppm column prices each statistic set, the measured
    companion to events_key_skew_profile's diagnosis.

    Determinism: every moment is an exact integer (DECIMAL(38) Spark /
    HUGEINT oracle — Σn·Σn reaches ~10¹⁴ at test scale and far beyond
    at 100 TB); divisions are single trunc-divs on positive operands.

    Scale: ONE aggregate over events builds the per-key count frame;
    the stats and the exact answer come from one more aggregate over
    it; the heavy-hitter cut is TakeOrdered({JSE_HH}). The exact
    Σ n_k² here costs one extra sum over the already-aggregated counts
    frame — the point is grading the estimators against it, which a
    production optimizer cannot afford to do per query and this
    harness does once per statistics refresh."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    from open_pulsar_spark.operators.dedup import _pin

    counts = _pin(
        "jse_counts",
        ev.groupBy("user_id").agg(F.count("*").cast("bigint").alias("n")),
    )
    return join_size_report(spark, counts)


def join_size_report(spark: SparkSession, counts: DataFrame) -> DataFrame:
    """(user_id, n) per-key count frame → the graded estimator table —
    THE one estimator computation, shared by the batch query and the
    streaming statistics store (streaming/stats_stream.py) so a folded
    count ledger and a batch scan price the statistics identically."""
    schema = (
        "estimator STRING, est_rows STRING,"
        " exact_rows STRING, rel_err_ppm LONG"
    )
    st = counts.agg(
        F.sum("n").cast("decimal(38,0)").alias("big_n"),
        F.count("*").cast("bigint").alias("ndv"),
        F.sum(F.expr("cast(n as decimal(38,0)) * n")).alias("exact_sz"),
    ).first()
    if st.big_n is None:
        # empty input: both engines agree on an empty report (the
        # oracle's WHERE exact_rows IS NOT NULL drops its NULL rows)
        return spark.createDataFrame([], schema)
    big_n, ndv, exact = int(st.big_n), int(st.ndv), int(st.exact_sz)
    hh = counts.orderBy(F.desc("n"), "user_id").limit(JSE_HH).agg(
        F.sum("n").cast("decimal(38,0)").alias("hh_n"),
        F.sum(F.expr("cast(n as decimal(38,0)) * n")).alias("hh_sq"),
        F.count("*").cast("bigint").alias("h"),
    ).first()
    hh_n, hh_sq, h = int(hh.hh_n), int(hh.hh_sq), int(hh.h)
    # power-of-two histogram over the count distribution: ≤ ~log2(max n)
    # bins, collected exactly (floor(log2) is the PSI binning precedent
    # — same libm double on both engines, exact at every power of two)
    bins = (
        counts.groupBy(F.expr("floor(log2(n))").cast("bigint").alias("bin"))
        .agg(
            F.sum("n").cast("decimal(38,0)").alias("s_b"),
            F.count("*").cast("bigint").alias("k_b"),
        )
        .collect()
    )
    est_hist = sum(int(b.s_b) * int(b.s_b) // int(b.k_b) for b in bins)
    uniform = (big_n * big_n) // ndv
    corrected = hh_sq + (big_n - hh_n) * (big_n - hh_n) // max(ndv - h, 1)
    rows = [
        ("hh_corrected", corrected, exact),
        ("histogram", est_hist, exact),
        ("uniform", uniform, exact),
    ]
    # STRING output for the exact counters: Σn² and N²/ndv exceed 2^63
    # well before the 100 TB point (10¹² events at mild skew ⇒ moments
    # ~10²⁰+), and digit strings are exact at any width while hashing
    # identically on both engines (unlike DECIMAL(38,0), the round-7
    # driver-hash culprit). Arithmetic stays in unbounded Python ints.
    out = [
        (
            e,
            str(int(est)),
            str(int(exact)),
            abs(int(est) - exact) * 10**6 // exact,
        )
        for e, est, exact in rows
    ]
    return spark.createDataFrame(out, schema).orderBy("estimator")


# --------------------------------------------------------------------------
# events_value_psi — population-stability-index drift between the corpus's
# two time halves (the model-monitoring staple next to the KL lang drift).
# --------------------------------------------------------------------------
@query(
    "events_value_psi",
    oracle="""
    WITH bounds AS (
        SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS piv_us
        FROM events),
    binned AS (
        SELECT CASE WHEN epoch_us(ts) < (SELECT piv_us FROM bounds)
                    THEN 0 ELSE 1 END AS period,
               floor(log2(greatest(round(value * 100)::BIGINT, 1)))::BIGINT
                   AS bin
        FROM events),
    tot AS (SELECT sum(CASE WHEN period = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
                   sum(CASE WHEN period = 1 THEN 1 ELSE 0 END)::BIGINT AS n1
            FROM binned),
    cell AS (
        SELECT bin,
               sum(CASE WHEN period = 0 THEN 1 ELSE 0 END)::BIGINT AS n_base,
               sum(CASE WHEN period = 1 THEN 1 ELSE 0 END)::BIGINT AS n_cur
        FROM binned GROUP BY bin),
    terms AS (
        SELECT bin, n_base, n_cur,
               CASE WHEN n_base > 0 AND n_cur > 0 THEN
                   CAST(round(
                       (n_base * 1.0 / (SELECT n0 FROM tot)
                        - n_cur * 1.0 / (SELECT n1 FROM tot))
                       * ln((n_base * 1.0 / (SELECT n0 FROM tot))
                            / (n_cur * 1.0 / (SELECT n1 FROM tot)))
                       * 1000000000, 0) AS BIGINT)
               END AS psi_term_nano
        FROM cell)
    SELECT bin, n_base, n_cur, psi_term_nano,
           sum(psi_term_nano) OVER ()::BIGINT AS psi_total_nano
    FROM terms
    WHERE (SELECT n0 FROM tot) > 0 AND (SELECT n1 FROM tot) > 0
    ORDER BY bin
    """,
)
def events_value_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the event-value distribution
    between the corpus's two time halves — the model-monitoring
    staple ('did the input distribution move enough to retrain'):
    PSI = Σ (p_b − q_b)·ln(p_b/q_b) over value bins, with the usual
    reading ≤0.1 stable / 0.1-0.25 drifting / >0.25 shifted. Sits
    next to corpus_source_drift's KL (language mix) and
    embedding_centroid_drift (vector space) as the numeric-feature
    leg of the drift suite.

    Determinism: bins are integer powers of two over cents (the
    doc_length_log_histogram rule — no data-dependent quantile edges,
    so bin assignment is exact in both engines); the time pivot is
    integer µs midpoint arithmetic; each ln term is computed with the
    identical double expression shape and rounded onto a NANO-unit
    integer grid BEFORE summation (the Benford χ² contract), so the
    total is order-independent and engine-exact. Bins present in only
    one half carry a NULL term (the standard smoothed-PSI caveat,
    surfaced rather than hidden) and drop out of the sum.

    Scale: one pass bins map-side (the pivot is a 1-row aggregate
    broadcast as a scalar); the cell frame is O(#bins) ≈ 16 rows —
    the window total runs on that bounded frame. Nothing changes at
    100 TB except the scan."""
    ev = load_table(spark, sf_dir, "events").select("ts", "value")
    piv = ev.agg(
        F.expr("(unix_micros(min(ts)) + unix_micros(max(ts))) div 2").alias(
            "pivot"
        )
    ).first()
    if piv.pivot is None:
        return spark.createDataFrame(
            [],
            "bin BIGINT, n_base BIGINT, n_cur BIGINT,"
            " psi_term_nano BIGINT, psi_total_nano BIGINT",
        )
    pivot = int(piv.pivot)
    binned = ev.select(
        F.when(F.expr(f"unix_micros(ts) < {pivot}"), 0)
        .otherwise(1)
        .alias("period"),
        value_log_bin(F.col("value")).alias("bin"),
    )
    cell = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("period") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_base"),
        F.sum(F.when(F.col("period") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_cur"),
    )
    return psi_from_cells(spark, cell)


def value_log_bin(value):
    """value → power-of-two cent bin — the ONE binning expression,
    shared by the batch PSI query and the streaming bin ledger so the
    two cannot bucket differently."""
    return (
        F.floor(
            F.log2(F.greatest(F.round(value * 100).cast("bigint"), F.lit(1)))
        )
        .cast("bigint")
        .alias("bin")
    )


def psi_from_cells(spark: SparkSession, cell: DataFrame) -> DataFrame:
    """(bin, n_base, n_cur) cell counts → the PSI table — THE one
    closing computation (totals, nano-grid terms, order-independent
    integer total), shared by the batch query and the streaming bin
    ledger's readout (streaming/psi_stream.py). Empty input (or an
    empty side) degrades the same way on both engines: missing bins
    carry NULL terms; zero totals return an empty table."""
    tot = cell.agg(
        F.sum("n_base").cast("bigint").alias("n0"),
        F.sum("n_cur").cast("bigint").alias("n1"),
    ).first()
    if tot.n0 is None or tot.n1 is None or tot.n0 == 0 or tot.n1 == 0:
        return spark.createDataFrame(
            [],
            "bin BIGINT, n_base BIGINT, n_cur BIGINT,"
            " psi_term_nano BIGINT, psi_total_nano BIGINT",
        )
    n0, n1 = int(tot.n0), int(tot.n1)
    term = F.when(
        (F.col("n_base") > 0) & (F.col("n_cur") > 0),
        F.round(
            (
                F.col("n_base") * F.lit(1.0) / F.lit(n0)
                - F.col("n_cur") * F.lit(1.0) / F.lit(n1)
            )
            * F.log(
                (F.col("n_base") * F.lit(1.0) / F.lit(n0))
                / (F.col("n_cur") * F.lit(1.0) / F.lit(n1))
            )
            * F.lit(1000000000),
            0,
        ).cast("bigint"),
    ).alias("psi_term_nano")
    from pyspark.sql.window import Window

    w = Window.partitionBy()
    return (
        cell.select("bin", "n_base", "n_cur", term)
        .select(
            "*",
            F.sum("psi_term_nano").over(w).cast("bigint").alias(
                "psi_total_nano"
            ),
        )
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# customer_kanonymity_audit — re-identification risk of the quasi-
# identifier tuple (the privacy leg of the DQ suite).
# --------------------------------------------------------------------------
KANON_QUASI = ("c_nationkey", "c_mktsegment")  # published quasi-identifiers
KANON_KS = (2, 5, 10)  # the k thresholds a release policy quotes


@query(
    "customer_kanonymity_audit",
    oracle=f"""
    WITH g AS (
        SELECT {", ".join(KANON_QUASI)}, count(*)::BIGINT AS sz
        FROM customer GROUP BY {", ".join(KANON_QUASI)}),
    tot AS (SELECT count(*)::BIGINT AS n_groups,
                   sum(sz)::BIGINT AS n_rows FROM g),
    ks AS (SELECT unnest([{", ".join(str(k) for k in KANON_KS)}])::INT AS k)
    SELECT ks.k,
           (SELECT n_groups FROM tot) AS n_groups,
           sum(CASE WHEN g.sz < ks.k THEN 1 ELSE 0 END)::BIGINT
               AS n_groups_below_k,
           sum(CASE WHEN g.sz < ks.k THEN g.sz ELSE 0 END)::BIGINT
               AS n_rows_below_k,
           (sum(CASE WHEN g.sz < ks.k THEN g.sz ELSE 0 END) * 1000000
               // (SELECT n_rows FROM tot))::BIGINT AS risk_ppm
    FROM ks CROSS JOIN g
    GROUP BY ks.k
    ORDER BY ks.k
    """,
)
def customer_kanonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-ANONYMITY audit of the customer table under the published
    quasi-identifier tuple {KANON_QUASI}: for each policy threshold
    k ∈ {KANON_KS}, how many equivalence classes are smaller than k
    and what fraction of ROWS (ppm) sits in them — the
    re-identification risk number a privacy review quotes before a
    data release, and the measurement that prices generalization
    (coarsen a column until risk_ppm is acceptable). The privacy leg
    of the DQ suite next to doc_pii_scrub (content) and the RTBF
    tombstone machinery (deletion).

    Scale: ONE groupBy over the quasi-identifier tuple reduces the
    table to its equivalence classes (map-side combinable); the
    |ks| × |classes| grading explodes the BOUNDED class frame, never
    the table. All integer arithmetic."""
    cust = load_table(spark, sf_dir, "customer").select(*KANON_QUASI)
    g = cust.groupBy(*KANON_QUASI).agg(
        F.count("*").cast("bigint").alias("sz")
    )
    from open_pulsar_spark.operators.dedup import _pin

    return kanonymity_report(spark, _pin("kanon_groups", g))


def kanonymity_report(spark: SparkSession, groups: DataFrame) -> DataFrame:
    """(quasi..., sz) equivalence-class frame → the k-grid audit table
    — THE one k-anonymity computation, shared by the batch query and
    the streaming class-size ledger (streaming/kanon_stream.py): a
    folded per-QI-tuple count store and a batch table scan price the
    release risk identically. Only `sz` is read; the quasi columns
    exist so the caller's frame is self-describing."""
    g = groups
    tot = g.agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum("sz").cast("bigint").alias("n_rows"),
    ).first()
    if tot.n_rows is None:
        return spark.createDataFrame(
            [],
            "k INT, n_groups BIGINT, n_groups_below_k BIGINT,"
            " n_rows_below_k BIGINT, risk_ppm BIGINT",
        )
    n_groups, n_rows = int(tot.n_groups), int(tot.n_rows)
    # k-grid via map-side explode over the bounded class frame — no
    # join at all (a crossJoin here compiles to a nested-loop)
    ks_arr = "array(" + ",".join(str(k) for k in KANON_KS) + ")"
    return (
        g.select("sz", F.explode(F.expr(ks_arr)).alias("k"))
        .select("sz", F.col("k").cast("int").alias("k"))
        .groupBy("k")
        .agg(
            F.lit(n_groups).cast("bigint").alias("n_groups"),
            F.sum(F.when(F.col("sz") < F.col("k"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_groups_below_k"),
            F.sum(F.when(F.col("sz") < F.col("k"), F.col("sz")).otherwise(0))
            .cast("bigint")
            .alias("n_rows_below_k"),
            F.expr(
                f"cast(sum(CASE WHEN sz < k THEN sz ELSE 0 END) * 1000000"
                f" div {n_rows} as bigint)"
            ).alias("risk_ppm"),
        )
        .orderBy("k")
    )


# --------------------------------------------------------------------------
# customer_ldiversity_audit — sensitive-attribute diversity WITHIN the
# k-anonymity equivalence classes (the homogeneity-attack audit).
# --------------------------------------------------------------------------
# Sensitive attribute: the account-balance band. Banding runs on integer
# cents with a +100000 offset so the div operand is never negative
# (Spark `div` truncates, DuckDB `//` floors — they agree only on a
# non-negative domain; acctbal ≥ -999.99 ⇒ cents+100000 ≥ 1).
LDIV_BAND_OFFSET = 100000          # cents; clears TPC-H's acctbal ≥ -999.99
LDIV_BAND_WIDTH = 250000           # 2500-currency-unit bands (5 at TPC-H range)
LDIV_LS = (2, 3, 5)                # the l thresholds a release policy quotes

_LDIV_BAND_SQL = (
    f"(CAST(round(c_acctbal * 100) AS BIGINT) + {LDIV_BAND_OFFSET})"
    f" // {LDIV_BAND_WIDTH}"
)


@query(
    "customer_ldiversity_audit",
    oracle=f"""
    WITH cells AS (
        SELECT {", ".join(KANON_QUASI)},
               ({_LDIV_BAND_SQL})::BIGINT AS band,
               count(*)::BIGINT AS cnt
        FROM customer GROUP BY 1, 2, 3),
    cls AS (
        SELECT {", ".join(KANON_QUASI)},
               count(*)::BIGINT AS l_distinct,
               sum(cnt)::BIGINT AS sz
        FROM cells GROUP BY 1, 2),
    tot AS (SELECT count(*)::BIGINT AS n_classes,
                   sum(sz)::BIGINT AS n_rows,
                   min(l_distinct)::BIGINT AS min_l FROM cls),
    ls AS (SELECT unnest([{", ".join(str(v) for v in LDIV_LS)}])::INT AS l)
    SELECT ls.l,
           (SELECT n_classes FROM tot) AS n_classes,
           (SELECT min_l FROM tot) AS min_l,
           sum(CASE WHEN cls.l_distinct < ls.l THEN 1 ELSE 0 END)::BIGINT
               AS n_classes_below_l,
           sum(CASE WHEN cls.l_distinct < ls.l THEN cls.sz ELSE 0 END)::BIGINT
               AS n_rows_below_l,
           (sum(CASE WHEN cls.l_distinct < ls.l THEN cls.sz ELSE 0 END)
               * 1000000 // (SELECT n_rows FROM tot))::BIGINT AS risk_ppm
    FROM ls CROSS JOIN cls
    GROUP BY ls.l
    ORDER BY ls.l
    """,
)
def customer_ldiversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-DIVERSITY audit (Machanavajjhala et al.) of the customer table:
    k-anonymity bounds class SIZE, but a class of 50 rows that all
    share one sensitive value still leaks it — the homogeneity attack.
    For each policy threshold l ∈ {LDIV_LS}, how many equivalence
    classes under the published quasi-identifiers {KANON_QUASI} carry
    fewer than l DISTINCT account-balance bands, what fraction of ROWS
    (ppm) sits in them, and the table's realized min_l (the largest l
    the release actually satisfies). Completes the served privacy
    family: doc_pii_scrub (content), RTBF tombstones (deletion),
    customer_kanonymity_audit (class size), this query (class
    diversity).

    Scale: ONE groupBy over (quasi..., band) reduces the table to its
    occupied cells (map-side combinable); the class rollup and the
    |ls|-grid explode run on the BOUNDED cell frame, never the table.
    All integer arithmetic — banding offsets cents onto a non-negative
    domain so trunc-vs-floor division cannot diverge."""
    cust = load_table(spark, sf_dir, "customer").select(
        *KANON_QUASI, "c_acctbal"
    )
    cells = cust.groupBy(
        *KANON_QUASI,
        F.expr(
            f"(cast(round(c_acctbal * 100) as bigint) + {LDIV_BAND_OFFSET})"
            f" div {LDIV_BAND_WIDTH}"
        )
        .cast("bigint")
        .alias("band"),
    ).agg(F.count("*").cast("bigint").alias("cnt"))
    from open_pulsar_spark.operators.dedup import _pin

    return ldiversity_report(spark, _pin("ldiv_cells", cells))


def ldiversity_report(spark: SparkSession, cells: DataFrame) -> DataFrame:
    """(quasi..., band, cnt) sensitive-cell frame → the l-grid audit
    table — THE one l-diversity computation, shared by the batch query
    and the streaming sensitive-cell ledger (kanon_stream.py's second
    store): a folded per-(QI, band) count store and a batch table scan
    price the homogeneity risk identically. Only the quasi columns and
    `cnt` are grouped/summed; `band` is consumed by the distinct-count
    rollup."""
    cls = cells.groupBy(*KANON_QUASI).agg(
        F.count("*").cast("bigint").alias("l_distinct"),
        F.sum("cnt").cast("bigint").alias("sz"),
    )
    tot = cls.agg(
        F.count("*").cast("bigint").alias("n_classes"),
        F.sum("sz").cast("bigint").alias("n_rows"),
        F.min("l_distinct").cast("bigint").alias("min_l"),
    ).first()
    if tot.n_rows is None:
        return spark.createDataFrame(
            [],
            "l INT, n_classes BIGINT, min_l BIGINT,"
            " n_classes_below_l BIGINT, n_rows_below_l BIGINT,"
            " risk_ppm BIGINT",
        )
    n_classes, n_rows = int(tot.n_classes), int(tot.n_rows)
    min_l = int(tot.min_l)
    ls_arr = "array(" + ",".join(str(v) for v in LDIV_LS) + ")"
    return (
        cls.select(
            "l_distinct", "sz", F.explode(F.expr(ls_arr)).alias("l")
        )
        .select(
            "l_distinct", "sz", F.col("l").cast("int").alias("l")
        )
        .groupBy("l")
        .agg(
            F.lit(n_classes).cast("bigint").alias("n_classes"),
            F.lit(min_l).cast("bigint").alias("min_l"),
            F.sum(F.when(F.col("l_distinct") < F.col("l"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_classes_below_l"),
            F.sum(
                F.when(F.col("l_distinct") < F.col("l"), F.col("sz"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_rows_below_l"),
            F.expr(
                f"cast(sum(CASE WHEN l_distinct < l THEN sz ELSE 0 END)"
                f" * 1000000 div {n_rows} as bigint)"
            ).alias("risk_ppm"),
        )
        .orderBy("l")
    )


# --------------------------------------------------------------------------
# table_broadcast_advisor — join-strategy sizing for every catalog table
# (the planner-statistics readout behind autoBroadcastJoinThreshold).
# --------------------------------------------------------------------------
BROADCAST_THRESHOLD_B = 10 * 1024 * 1024   # Spark's default 10 MB
TARGET_PART_B = 128 * 1024 * 1024          # maxPartitionBytes default

# (column, kind) per table — PUBLIC schema knowledge (TESTDATA.md).
# kind → in-memory width model (UnsafeRow-ish accounting):
#   i4 = 4 B, fix8 = 8 B, str = 8 B + octet_length, vec = 16 B + 4·len
_ADVISOR_SPEC = {
    "region": [("r_regionkey", "i4"), ("r_name", "str")],
    "nation": [("n_nationkey", "i4"), ("n_name", "str"),
               ("n_regionkey", "i4")],
    "customer": [("c_custkey", "fix8"), ("c_name", "str"),
                 ("c_nationkey", "i4"), ("c_acctbal", "fix8"),
                 ("c_mktsegment", "str")],
    "supplier": [("s_suppkey", "fix8"), ("s_name", "str"),
                 ("s_nationkey", "i4"), ("s_acctbal", "fix8")],
    "part": [("p_partkey", "fix8"), ("p_name", "str"),
             ("p_brand", "str"), ("p_type", "str"), ("p_size", "i4"),
             ("p_retailprice", "fix8")],
    "orders": [("o_orderkey", "fix8"), ("o_custkey", "fix8"),
               ("o_orderstatus", "str"), ("o_totalprice", "fix8"),
               ("o_orderdate", "fix8"), ("o_orderpriority", "str")],
    "lineitem": [("l_orderkey", "fix8"), ("l_partkey", "fix8"),
                 ("l_suppkey", "fix8"), ("l_linenumber", "i4"),
                 ("l_quantity", "fix8"), ("l_extendedprice", "fix8"),
                 ("l_discount", "fix8"), ("l_tax", "fix8"),
                 ("l_returnflag", "str"), ("l_linestatus", "str"),
                 ("l_shipdate", "fix8")],
    "events": [("event_id", "fix8"), ("ts", "fix8"), ("user_id", "fix8"),
               ("event_type", "str"), ("value", "fix8"),
               ("props", "str")],
    "documents": [("doc_id", "fix8"), ("text", "str"), ("lang", "str"),
                  ("source", "str"), ("n_chars", "fix8")],
    "embeddings": [("vec_id", "fix8"), ("embedding", "vec"),
                   ("label", "i4")],
}


def _advisor_width_terms(spec, len_fn: str, bytes_fn: str) -> str:
    """The shared row-width expression: fixed widths fold into one
    constant; variable columns add string-byte / element-count terms.
    `len_fn` is the array-length function ('size' Spark / 'len'
    DuckDB); `bytes_fn` the string-byte-length function
    ('octet_length' Spark / 'strlen' DuckDB — DuckDB's octet_length
    is BLOB-only) — the only dialect differences."""
    fixed = 0
    var_terms = []
    for col, kind in spec:
        if kind == "i4":
            fixed += 4
        elif kind == "fix8":
            fixed += 8
        elif kind == "str":
            fixed += 8
            var_terms.append(f"coalesce({bytes_fn}({col}), 0)")
        elif kind == "vec":
            fixed += 16
            var_terms.append(f"4 * coalesce({len_fn}({col}), 0)")
    return " + ".join([str(fixed)] + var_terms)


def _advisor_oracle() -> str:
    arms = []
    for t, spec in _ADVISOR_SPEC.items():
        width = _advisor_width_terms(spec, "len", "strlen")
        arms.append(f"""SELECT '{t}' AS table_name,
               count(*)::BIGINT AS n_rows,
               coalesce(sum({width}), 0)::BIGINT AS est_bytes,
               CASE WHEN count(*) > 0
                    THEN (sum({width}) // count(*))::BIGINT END
                   AS avg_row_bytes,
               CASE WHEN coalesce(sum({width}), 0)
                             <= {BROADCAST_THRESHOLD_B}
                    THEN 1 ELSE 0 END::BIGINT AS broadcastable,
               ((coalesce(sum({width}), 0) + {TARGET_PART_B} - 1)
                   // {TARGET_PART_B})::BIGINT AS est_scan_partitions
        FROM {t}""")
        # noqa: the per-table scan is the point — stats come from data
    return "\n    UNION ALL ".join(arms) + "\n    ORDER BY table_name"


@query("table_broadcast_advisor", oracle=_advisor_oracle())
def table_broadcast_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy SIZING for every catalog table: estimated
    in-memory bytes under a fixed width model (8 B fixed-width
    columns, 4 B ints, 8 B + octet_length per string, 16 B + 4·len
    per float vector), whether the table fits Spark's default 10 MB
    autoBroadcastJoinThreshold, and how many 128 MB scan partitions
    it implies — the ANALYZE-style statistics a cost-based planner
    (and a human review) reads before choosing broadcast vs
    shuffle joins and sizing spark.sql.shuffle.partitions. The
    measured companion to tables.BROADCASTABLE's static allowlist:
    at sf0.1 region/nation/supplier sit far under the threshold
    while lineitem/events/documents are firmly shuffle-side; the
    crossover as sf grows is exactly what this table watches.

    Determinism: octet_length on identical UTF-8 bytes and fixed
    per-type constants — every number is an exact integer on both
    engines (never engine row-size estimates, which are not
    portable).

    Scale: one aggregate per table (map-combinable sums; the string
    tables pay one octet_length pass over columns they'd scan for
    any profile); arms union to a 10-row frame. At 100 TB this is
    the statistics-refresh job you run per snapshot — and the width
    model is the portable proxy for executor memory, not file bytes
    (parquet compresses; broadcast hash tables don't)."""
    frames = []
    for t, spec in _ADVISOR_SPEC.items():
        width = _advisor_width_terms(spec, "size", "octet_length")
        df = load_table(spark, sf_dir, t)
        frames.append(
            df.agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.coalesce(F.expr(f"sum({width})"), F.lit(0))
                .cast("bigint")
                .alias("est_bytes"),
            ).select(
                F.lit(t).alias("table_name"),
                "n_rows",
                "est_bytes",
                F.when(
                    F.col("n_rows") > 0,
                    F.expr("est_bytes div n_rows"),
                )
                .cast("bigint")
                .alias("avg_row_bytes"),
                F.when(
                    F.col("est_bytes") <= BROADCAST_THRESHOLD_B, 1
                )
                .otherwise(0)
                .cast("bigint")
                .alias("broadcastable"),
                F.expr(
                    f"(est_bytes + {TARGET_PART_B} - 1)"
                    f" div {TARGET_PART_B}"
                )
                .cast("bigint")
                .alias("est_scan_partitions"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("table_name")


# --------------------------------------------------------------------------
# order_total_reconciliation — cross-fact integrity: does the order
# header's total agree with its recomputed line-level total?
# --------------------------------------------------------------------------
@query(
    "order_total_reconciliation",
    oracle="""
    WITH line AS (
        SELECT l_orderkey AS k,
               sum(round(l_extendedprice * (1 - l_discount)
                         * (1 + l_tax) * 100)::BIGINT)::BIGINT
                   AS line_cents,
               count(*)::BIGINT AS n_lines
        FROM lineitem GROUP BY l_orderkey),
    hdr AS (
        SELECT o_orderkey AS k,
               round(o_totalprice * 100)::BIGINT AS hdr_cents
        FROM orders),
    j AS (
        SELECT h.k, h.hdr_cents, l.line_cents, l.n_lines,
               CASE WHEN l.k IS NULL THEN 'no_lines'
                    WHEN h.hdr_cents = l.line_cents THEN 'exact'
                    WHEN abs(h.hdr_cents - l.line_cents) * 100
                             <= abs(h.hdr_cents) THEN 'within_1pct'
                    WHEN abs(h.hdr_cents - l.line_cents) * 20
                             <= abs(h.hdr_cents) THEN 'within_5pct'
                    ELSE 'divergent' END AS bucket
        FROM hdr h LEFT JOIN line l ON l.k = h.k)
    SELECT bucket,
           count(*)::BIGINT AS n_orders,
           coalesce(sum(abs(hdr_cents - line_cents)), 0)::BIGINT
               AS abs_gap_cents,
           coalesce(max(abs(hdr_cents - line_cents)), 0)::BIGINT
               AS max_gap_cents
    FROM j
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def order_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-fact RECONCILIATION: each order header's stored total vs
    the total recomputed from its line items (Σ extendedprice ·
    (1−discount) · (1+tax), per-row integer cents), bucketed exact /
    within-1% / within-5% / divergent / no-lines with gap mass and
    the worst gap per bucket — the financial-integrity audit
    dq_violation_counts' row-level rules cannot express (every row
    can pass its own checks while the FACTS disagree with each
    other). On synthetic data the drift is expected and measured, not
    asserted away; in production this is the closing-the-books query.

    Determinism: per-row rounding to integer cents BEFORE the
    per-order sum (the engine-wide money rule), integer threshold
    compares (gap·100 ≤ |total| is the float-free form of gap ≤ 1%).

    Scale: one map-combinable per-order aggregate over lineitem, one
    equi-join on the natural key (the canonical fact-fact join both
    sides already shuffle on), a 5-bucket rollup. Bucketing the join
    tables on orderkey makes it exchange-free."""
    li = load_table(spark, sf_dir, "lineitem")
    line = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.sum(
            F.round(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * 100
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("line_cents"),
        F.count("*").cast("bigint").alias("n_lines"),
    )
    hdr = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("hdr_cents"),
    )
    gap = F.abs(F.col("hdr_cents") - F.col("line_cents"))
    j = hdr.join(line, "k", "left").select(
        "hdr_cents",
        "line_cents",
        F.when(F.col("line_cents").isNull(), "no_lines")
        .when(F.col("hdr_cents") == F.col("line_cents"), "exact")
        .when(gap * 100 <= F.abs(F.col("hdr_cents")), "within_1pct")
        .when(gap * 20 <= F.abs(F.col("hdr_cents")), "within_5pct")
        .otherwise("divergent")
        .alias("bucket"),
    )
    return (
        j.groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.coalesce(
                F.sum(F.abs(F.col("hdr_cents") - F.col("line_cents"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("abs_gap_cents"),
            F.coalesce(
                F.max(F.abs(F.col("hdr_cents") - F.col("line_cents"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("max_gap_cents"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# brand_return_rate_wilson — proportion ranking done right: order by the
# Wilson lower confidence bound, not the raw rate.
# --------------------------------------------------------------------------
@query(
    "brand_return_rate_wilson",
    oracle="""
    WITH g AS (
        SELECT p.p_brand AS brand,
               count(*)::HUGEINT AS n,
               sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                   ::HUGEINT AS k
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1),
    s AS (
        -- s ≈ sqrt(n·(k(n−k)+n)) · 1e6, exact integer sqrt via the
        -- corrected floor(sqrt(double)) (±1 adjustment; exact while
        -- sqrt(x) < ~9e15 — the documented envelope)
        SELECT brand, n, k,
               (SELECT s0
                    + (CASE WHEN (s0+1)*(s0+1)
                            <= n*(k*(n-k)+n)*1000000000000
                            THEN 1 ELSE 0 END)
                    - (CASE WHEN s0*s0 > n*(k*(n-k)+n)*1000000000000
                            THEN 1 ELSE 0 END)
                FROM (SELECT floor(sqrt((n*(k*(n-k)+n)
                          *1000000000000)::DOUBLE))::HUGEINT AS s0))
                   AS sq
        FROM g)
    SELECT brand,
           n::BIGINT AS n_lines,
           k::BIGINT AS n_returned,
           (k * 1000000 // n)::BIGINT AS rate_ppm,
           (((k + 2) * n * 1000000 - 2 * sq) // (n * (n + 4)))::BIGINT
               AS wilson_lb_ppm,
           row_number() OVER (
               ORDER BY ((k + 2) * n * 1000000 - 2 * sq)
                        // (n * (n + 4)) DESC, brand)::INT AS rk
    FROM s
    ORDER BY rk
    """,
)
def brand_return_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETURN-RATE ranking by the WILSON LOWER BOUND (z = 2): a brand
    with 3/5 returns must not outrank one with 400/1000 — sorting by
    the lower confidence bound of the proportion (the Evan Miller /
    Reddit-comment-ranking correction) is the standard fix, here in
    EXACT integer arithmetic: with z² = 4 the bound reduces to
    (k + 2 − 2·√((k(n−k)+n)/n)) / (n+4), and scaling the radicand by
    10¹² makes the square root an INTEGER sqrt of an exact moment —
    math.isqrt on the Spark close, corrected floor(sqrt) in the
    oracle (the corpus_neyman_allocation contract). The raw rate sits
    beside the bound so the reordering is visible.

    Scale: one unhinted dim join (part is SF-linear — AQE broadcasts
    the 2-column projection while it fits) + one map-combinable brand
    aggregate; the ≤|brands|-row close runs in Python ints."""
    import math

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_returnflag"
    )
    parts = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    g = (
        li.join(parts, li.l_partkey == parts.p_partkey)
        .groupBy("brand")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("k"),
        )
    )
    schema = (
        "brand STRING, n_lines BIGINT, n_returned BIGINT, rate_ppm BIGINT,"
        " wilson_lb_ppm BIGINT, rk INT"
    )
    rows = [(r.brand, int(r.n), int(r.k)) for r in g.collect()]
    if not rows:
        return spark.createDataFrame([], schema)
    scored = []
    for brand, n, k in rows:
        sq = math.isqrt(n * (k * (n - k) + n) * 10**12)
        lb = ((k + 2) * n * 10**6 - 2 * sq) // (n * (n + 4))
        scored.append((brand, n, k, k * 10**6 // n, lb))
    scored.sort(key=lambda t: (-t[4], t[0]))
    out = [
        (brand, n, k, rate, lb, i + 1)
        for i, (brand, n, k, rate, lb) in enumerate(scored)
    ]
    return spark.createDataFrame(out, schema).orderBy("rk")


# --------------------------------------------------------------------------
# source_length_ks_matrix — pairwise two-sample Kolmogorov–Smirnov
# distance between sources' document-length distributions.
# corpus_source_drift watches ONE source's language mix over time; the
# KS matrix answers the cross-sectional question — which sources are
# drawing documents from visibly DIFFERENT length regimes? A high-KS
# outlier row is the "this crawler is truncating / this dump is
# concatenating" alarm that length histograms per source make you
# eyeball and this query makes a number.
# --------------------------------------------------------------------------
KS_C2_PPM = 1844164  # 1.358² · 1e6 — the α = 0.05 two-sample KS critical
#                      constant, squared onto a ppm grid so the
#                      significance test is a pure integer inequality.


@query(
    "source_length_ks_matrix",
    oracle=f"""
    WITH cnt AS (
        SELECT source, n_chars AS v, count(*)::BIGINT AS c
        FROM documents GROUP BY 1, 2),
    vals AS (SELECT DISTINCT v FROM cnt),
    srcs AS (SELECT source, sum(c)::BIGINT AS n FROM cnt GROUP BY 1),
    spine AS (
        SELECT s.source, s.n, vals.v,
               sum(coalesce(c.c, 0)) OVER (PARTITION BY s.source
                                           ORDER BY vals.v)::BIGINT AS cum
        FROM srcs s CROSS JOIN vals
        LEFT JOIN cnt c ON c.source = s.source AND c.v = vals.v),
    pairs AS (
        SELECT a.source AS src_a, b.source AS src_b,
               max(a.n) AS n_a, max(b.n) AS n_b,
               max(abs(a.cum::HUGEINT * b.n - b.cum::HUGEINT * a.n)) AS m
        FROM spine a JOIN spine b
          ON b.v = a.v AND b.source > a.source
        GROUP BY a.source, b.source)
    SELECT src_a, src_b, n_a, n_b,
           (m * 1000000 // (n_a::HUGEINT * n_b))::BIGINT AS ks_ppm,
           CASE WHEN (m * 1000000 // (n_a::HUGEINT * n_b))
                     * (m * 1000000 // (n_a::HUGEINT * n_b)) * n_a * n_b
                   > {KS_C2_PPM}::HUGEINT * (n_a + n_b) * 1000000
                THEN 1 ELSE 0 END AS drift
    FROM pairs
    ORDER BY src_a, src_b
    """,
)
def source_length_ks_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS statistic for every source pair over the
    doc-length (n_chars) distribution: D = max_x |ECDF_a − ECDF_b|,
    computed EXACTLY as max |cum_a·n_b − cum_b·n_a| / (n_a·n_b) in
    integers, on a ppm grid, with the α = 0.05 significance call
    D > 1.358·√((n_a+n_b)/(n_a·n_b)) squared into the pure-integer
    inequality ks² · n_a·n_b > {KS_C2_PPM} · (n_a+n_b) · 10⁶. EVERY
    cross-multiplied term — the ECDF gap m (≤ n_a·n_b, past bigint at
    n_a·n_b > ~9.2e18), the ks_ppm numerator m·10⁶, and both sides of
    the significance inequality — runs in decimal(38,0) on the Spark
    side and HUGEINT in the oracle, so nothing overflows below ~10³⁸
    (ks_ppm²·n_a·n_b tops out near 10³⁶ at 10¹² docs per source).

    Determinism: integer counts, integer cross-multiplied ECDF gaps,
    one trunc-div, and an integer significance inequality — no floats
    anywhere.

    Scale: one (source × length) count aggregate over the corpus is
    the only full-data pass; the ECDF spine is |sources| × |distinct
    lengths| — both CONTENT-bounded (length range saturates ~500
    values) — so the pair join runs on a few-thousand-row frame at
    ANY SF, the ab_test/anova bounded-close shape.

    The (source, v, c) count grid and the ECDF/pair close are split
    (ks_matrix_from_counts) and SHARED with the streaming twin
    (streaming/ks_stream.py), which folds the grid as an additive
    ledger."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = docs.groupBy(
        "source", F.col("n_chars").alias("v")
    ).agg(F.count("*").cast("bigint").alias("c"))
    return ks_matrix_from_counts(spark, cnt)


def ks_matrix_from_counts(
    spark: SparkSession, cnt: DataFrame, pin_name: str = "ks_cnt"
) -> DataFrame:
    """The pairwise-KS close over a (source, v, c) length-count grid —
    the ONE close shared by the batch source_length_ks_matrix and
    streaming/ks_stream's readout off its additive count ledger, so
    batch and stream cannot drift. The ECDF spine and pair join stay
    content-bounded regardless of who feeds the grid.

    ``pin_name``: callers with a DIFFERENT input lineage (the
    streaming readout) must pass their own name — app-scoped pins are
    keyed by name, so two interleaved lazy consumers sharing one name
    would unpersist each other's generation mid-plan (ADVICE r11)."""
    from open_pulsar_spark.operators.dedup import _pin

    cnt = _pin(pin_name, cnt)
    from pyspark.sql.window import Window

    vals = cnt.select("v").distinct()
    srcs = cnt.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    w_cum = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spine = (
        srcs.crossJoin(vals)
        .join(cnt, ["source", "v"], "left")
        .select(
            "source",
            "n",
            "v",
            F.sum(F.coalesce("c", F.lit(0)))
            .over(w_cum)
            .cast("bigint")
            .alias("cum"),
        )
    )
    a = spine.select(
        F.col("source").alias("src_a"),
        F.col("n").alias("na"),
        "v",
        F.col("cum").alias("cum_a"),
    )
    b = spine.select(
        F.col("source").alias("src_b"),
        F.col("n").alias("nb"),
        "v",
        F.col("cum").alias("cum_b"),
    )
    pairs = (
        a.join(b, "v")
        .where(F.col("src_b") > F.col("src_a"))
        .groupBy("src_a", "src_b")
        .agg(
            F.max("na").alias("n_a"),
            F.max("nb").alias("n_b"),
            # the cross-multiplied ECDF gap is ≤ n_a·n_b, past bigint
            # once n_a·n_b > ~9.2e18 — decimal(38,0) end to end (m is
            # internal only; the emitted ks_ppm is ≤ 10⁶, bigint-safe)
            F.max(
                F.abs(
                    F.expr(
                        "cast(cum_a as decimal(38,0)) * nb"
                        " - cast(cum_b as decimal(38,0)) * na"
                    )
                )
            ).alias("m"),
        )
    )
    return pairs.select(
        "src_a",
        "src_b",
        "n_a",
        "n_b",
        F.expr(
            "cast(m * 1000000"
            " div (cast(n_a as decimal(38,0)) * n_b) as bigint)"
        ).alias("ks_ppm"),
        F.expr(
            # div yields LONG even on decimals — re-widen ks before the
            # square so ks²·n_a·n_b stays decimal(38,0)
            f"CASE WHEN cast(m * 1000000"
            f"           div (cast(n_a as decimal(38,0)) * n_b)"
            f"           as decimal(38,0))"
            f" * (m * 1000000 div (cast(n_a as decimal(38,0)) * n_b))"
            f" * n_a * n_b"
            f" > cast({KS_C2_PPM} as decimal(38,0)) * (n_a + n_b) * 1000000"
            f" THEN 1 ELSE 0 END"
        ).alias("drift"),
    ).orderBy("src_a", "src_b")


# --------------------------------------------------------------------------
# segment_value_psi_drift — Population Stability Index of the
# order-value distribution, first half of the calendar vs second half,
# per market segment. The KS matrix above compares SOURCES
# cross-sectionally; PSI is the longitudinal twin scoring how far a
# segment's spending distribution has walked over time — the model-
# monitoring number (PSI > 0.2 = retrain/investigate) computed the
# exact-integer way.
# --------------------------------------------------------------------------
PSI_ALERT_NANO = 200000000  # the conventional PSI > 0.2 alert level


@query(
    "segment_value_psi_drift",
    oracle=f"""
    WITH o AS (
        SELECT c.c_mktsegment AS segment,
               CASE WHEN epoch_us(o.o_orderdate) * 2 <=
                         (SELECT min(epoch_us(o_orderdate))
                              + max(epoch_us(o_orderdate)) FROM orders)
                    THEN 1 ELSE 2 END AS half,
               length(bin(round(o.o_totalprice * 100)::BIGINT)) AS bkt
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
    cb AS (
        SELECT segment, bkt,
               sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT AS c1,
               sum(CASE WHEN half = 2 THEN 1 ELSE 0 END)::BIGINT AS c2
        FROM o GROUP BY segment, bkt),
    t AS (
        SELECT segment,
               sum(c1)::BIGINT AS t1, sum(c2)::BIGINT AS t2,
               count(*)::BIGINT AS nb
        FROM cb GROUP BY segment),
    terms AS (
        SELECT cb.segment,
               ((cb.c2 + 1)::HUGEINT * (t.t1 + t.nb)
                - (cb.c1 + 1)::HUGEINT * (t.t2 + t.nb)) AS num,
               ((t.t1 + t.nb)::HUGEINT * (t.t2 + t.nb)) AS den,
               (CAST(round(ln(cb.c2 + 1) * 1000000000) AS BIGINT)
                + CAST(round(ln(t.t1 + t.nb) * 1000000000) AS BIGINT)
                - CAST(round(ln(cb.c1 + 1) * 1000000000) AS BIGINT)
                - CAST(round(ln(t.t2 + t.nb) * 1000000000) AS BIGINT))
                   AS l_nano
        FROM cb JOIN t ON t.segment = cb.segment),
    per AS (
        SELECT segment,
               sum(CASE WHEN num * l_nano >= 0
                        THEN  (abs(num) * abs(l_nano)) // den
                        ELSE -((abs(num) * abs(l_nano)) // den)
                   END)::BIGINT AS psi_nano
        FROM terms GROUP BY segment)
    SELECT p.segment, t.t1 AS n_h1, t.t2 AS n_h2, t.nb AS n_buckets,
           p.psi_nano,
           CASE WHEN p.psi_nano > {PSI_ALERT_NANO} THEN 1 ELSE 0 END
               AS drift_alert
    FROM per p JOIN t ON t.segment = p.segment
    ORDER BY p.segment
    """,
)
def segment_value_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI of order value per segment across the calendar midpoint:
    orders bucket by the BIT LENGTH of their exact cent total (a
    power-of-two histogram computed with string/integer ops — no
    float log can flip a boundary), each half's distribution is
    add-one smoothed over the segment's observed buckets, and
    PSI = Σ (p₂−p₁)·ln(p₂/p₁) is assembled per bucket as
    (c₂'·T₁' − c₁'·T₂')·L / (T₁'·T₂') with L the nano-grid sum of four
    SINGLE ln roundings of integer counts (the keyness contract),
    sign-split trunc-div per bucket, summed in nano units. Alerts at
    the conventional PSI > 0.2.

    Determinism: the calendar split compares 2·epoch_µs against the
    integer min+max sum (no midpoint division); buckets, counts, the
    cross-multiplied numerator, and the per-bucket close are exact
    integers (128-bit where products demand it); ln enters only as
    single nano-roundings of integer-valued arguments.

    Scale: one fact pass after an unhinted customer join builds the
    (segment × bucket × half) counts — ~5 × ~25 × 2 cells at ANY SF
    (order values are range-bounded, so bit-length buckets saturate);
    everything after runs on that bounded frame."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    span = orders.agg(
        (
            F.min(F.unix_micros("o_orderdate"))
            + F.max(F.unix_micros("o_orderdate"))
        ).alias("mm")
    )
    o = (
        orders.join(cust, "o_custkey")
        .crossJoin(F.broadcast(span))
        .select(
            "segment",
            F.when(
                F.unix_micros("o_orderdate") * 2 <= F.col("mm"), 1
            )
            .otherwise(2)
            .alias("half"),
            F.length(F.bin(F.col("cents"))).alias("bkt"),
        )
    )
    cb = o.groupBy("segment", "bkt").agg(
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("c1"),
        F.sum(F.when(F.col("half") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("c2"),
    )
    from open_pulsar_spark.operators.dedup import _pin

    cb = _pin("psi_cb", cb)
    t = cb.groupBy("segment").agg(
        F.sum("c1").cast("bigint").alias("t1"),
        F.sum("c2").cast("bigint").alias("t2"),
        F.count("*").cast("bigint").alias("nb"),
    )
    terms = cb.join(F.broadcast(t), "segment").select(
        "segment",
        F.expr(
            "cast(c2 + 1 as decimal(38,0)) * (t1 + nb)"
            " - cast(c1 + 1 as decimal(38,0)) * (t2 + nb)"
        ).alias("num"),
        F.expr(
            "cast(t1 + nb as decimal(38,0)) * (t2 + nb)"
        ).alias("den"),
        (
            F.round(F.log(F.col("c2") + 1) * 1000000000, 0).cast("bigint")
            + F.round(F.log(F.col("t1") + F.col("nb")) * 1000000000, 0)
            .cast("bigint")
            - F.round(F.log(F.col("c1") + 1) * 1000000000, 0).cast(
                "bigint"
            )
            - F.round(F.log(F.col("t2") + F.col("nb")) * 1000000000, 0)
            .cast("bigint")
        ).alias("l_nano"),
    )
    per = terms.groupBy("segment").agg(
        F.sum(
            F.expr(
                "CASE WHEN num * l_nano >= 0"
                " THEN  cast((abs(num) * abs(l_nano)) div den as bigint)"
                " ELSE -cast((abs(num) * abs(l_nano)) div den as bigint)"
                " END"
            )
        )
        .cast("bigint")
        .alias("psi_nano")
    )
    return (
        per.join(t, "segment")
        .select(
            "segment",
            F.col("t1").alias("n_h1"),
            F.col("t2").alias("n_h2"),
            F.col("nb").alias("n_buckets"),
            "psi_nano",
            F.when(F.col("psi_nano") > PSI_ALERT_NANO, 1)
            .otherwise(0)
            .alias("drift_alert"),
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# orders_benford_audit — first-digit Benford conformance of order
# totals. Organic multiplicative quantities follow log10(1+1/d);
# fabricated, capped, or template-generated money values don't — the
# classic forensic-accounting / synthetic-data screen, scored with a
# χ² whose expected counts come from ppm INTEGER LITERALS (they sum to
# exactly 1e6, so the expected masses partition N·1e6 exactly).
# --------------------------------------------------------------------------
BENFORD_PPM = (301030, 176091, 124939, 96910, 79181, 66947, 57992,
               51153, 45757)  # round(1e6·log10(1+1/d)), d = 1..9; Σ = 1e6
assert sum(BENFORD_PPM) == 10**6
CHI2_8DF_05_MICRO = 15507000  # χ²(8 df, α = 0.05) = 15.507 on the micro grid

_BENFORD_SQL = "VALUES " + ", ".join(
    f"({d}, {p})" for d, p in enumerate(BENFORD_PPM, start=1)
)


@query(
    "orders_benford_audit",
    oracle=f"""
    WITH exp_raw(digit, p_ppm) AS ({_BENFORD_SQL}),
    obs AS (
        SELECT substr(round(o_totalprice * 100)::BIGINT::VARCHAR, 1, 1)
                   ::INT AS digit,
               count(*)::BIGINT AS n_obs
        FROM orders WHERE o_totalprice > 0
        GROUP BY 1),
    n AS (SELECT sum(n_obs)::BIGINT AS n FROM obs),
    cells AS (
        SELECT e.digit, coalesce(o.n_obs, 0)::BIGINT AS n_obs,
               (n.n * e.p_ppm)::BIGINT AS e_ppm,
               ((coalesce(o.n_obs, 0)::HUGEINT * 1000000 - n.n * e.p_ppm)
                * (coalesce(o.n_obs, 0)::HUGEINT * 1000000 - n.n * e.p_ppm)
                // (n.n::HUGEINT * e.p_ppm))::BIGINT AS chi2_term_micro
        FROM exp_raw e
        LEFT JOIN obs o ON o.digit = e.digit
        CROSS JOIN n)
    SELECT digit, n_obs, e_ppm, chi2_term_micro,
           (SELECT sum(chi2_term_micro) FROM cells)::BIGINT
               AS chi2_total_micro,
           CASE WHEN (SELECT sum(chi2_term_micro) FROM cells)
                     > {CHI2_8DF_05_MICRO} THEN 1 ELSE 0 END
               AS benford_alert
    FROM cells
    ORDER BY digit
    """,
)
def orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals: observed counts per
    leading digit of the exact cent value vs the Benford expectation
    N·log10(1+1/d), χ²-scored on a micro integer grid with the
    α = 0.05, 8-df critical value 15.507 as an integer literal. The
    data-forensics screen a pipeline runs on any money or count column
    it didn't generate itself — template or capped values light it up.

    Determinism: digits come from the decimal string of exact integer
    cents; the Benford masses are ppm literals summing to exactly 1e6;
    each χ² term is one 128-bit-safe integer trunc-div; the alert is
    an integer comparison.

    Scale: one map-side digit projection + a 9-group aggregate; the
    χ² close runs on the 9-row digit frame (the bounded-close shape).
    """
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 0
    )
    obs = orders.select(
        F.expr(
            "cast(substring(cast(cast(round(o_totalprice * 100) as bigint)"
            " as string), 1, 1) as int)"
        ).alias("digit")
    ).groupBy("digit").agg(F.count("*").cast("bigint").alias("n_obs"))
    exp = spark.createDataFrame(
        [(d, p) for d, p in enumerate(BENFORD_PPM, start=1)],
        "digit INT, p_ppm BIGINT",
    )
    n = obs.agg(F.sum("n_obs").cast("bigint").alias("n"))
    cells = (
        exp.join(obs, "digit", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "digit",
            F.coalesce("n_obs", F.lit(0)).cast("bigint").alias("n_obs"),
            (F.col("n") * F.col("p_ppm")).cast("bigint").alias("e_ppm"),
            F.expr(
                "cast((cast(coalesce(n_obs, 0) as decimal(38,0)) * 1000000"
                " - cast(n as decimal(38,0)) * p_ppm)"
                " * (cast(coalesce(n_obs, 0) as decimal(38,0)) * 1000000"
                " - cast(n as decimal(38,0)) * p_ppm)"
                " div (cast(n as decimal(38,0)) * p_ppm) as bigint)"
            ).alias("chi2_term_micro"),
        )
    )
    from open_pulsar_spark.operators.dedup import _pin

    cells = _pin("benford_cells", cells)
    tot = cells.agg(
        F.sum("chi2_term_micro").cast("bigint").alias("chi2_total_micro")
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_obs",
            "e_ppm",
            "chi2_term_micro",
            "chi2_total_micro",
            F.when(
                F.col("chi2_total_micro") > CHI2_8DF_05_MICRO, 1
            )
            .otherwise(0)
            .alias("benford_alert"),
        )
        .orderBy("digit")
    )


# --------------------------------------------------------------------------
# doc_dup_rate_by_source — which source is flooding the corpus with
# exact duplicates? The dedup family removes duplicates; this is the
# upstream ATTRIBUTION readout — per source, how much of its intake is
# corpus-wide duplicated text (byte-exact), so the crawler/dump that
# needs fixing gets named instead of silently deduped forever.
# --------------------------------------------------------------------------
@query(
    "doc_dup_rate_by_source",
    oracle="""
    WITH h AS (SELECT doc_id, source, md5(text) AS hh FROM documents),
    g AS (SELECT hh, count(*)::BIGINT AS c FROM h GROUP BY 1)
    SELECT h.source,
           count(*)::BIGINT AS n_docs,
           sum(CASE WHEN g.c > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_docs,
           (sum(CASE WHEN g.c > 1 THEN 1 ELSE 0 END)::HUGEINT * 1000000
            // count(*))::BIGINT AS dup_ppm
    FROM h JOIN g ON g.hh = h.hh
    GROUP BY 1 ORDER BY 1
    """,
)
def doc_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: documents whose byte-exact text (md5) appears MORE
    THAN ONCE corpus-wide, as a count and a ppm incidence — exact-dup
    pollution attributed to its origin (a doc duplicated across two
    sources charges both: each copy's slot is wasted wherever it
    lands).

    Determinism: md5 hex is identical in both engines (the
    doc_fingerprint contract); integer counts and one widened
    trunc-div.

    Scale: one hash aggregate (map-side combinable on the 32-char
    digest, never the text), one digest-keyed join back (AQE handles
    the SF-linear build side), one rollup to the ≤|sources| grid. At
    10¹² docs the digest join is the standard dedup shuffle — no
    text ever moves twice."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.md5("text").alias("hh")
    )
    g = docs.groupBy("hh").agg(F.count("*").cast("bigint").alias("c"))
    return (
        docs.join(g, "hh")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_docs"),
            F.expr(
                "cast(cast(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)"
                " as decimal(38,0)) * 1000000 div count(*) as bigint)"
            ).alias("dup_ppm"),
        )
        .orderBy("source")
    )
