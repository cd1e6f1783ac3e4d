"""Semantic clustering over the embeddings table — fixed-point k-means.

The curation operator the similarity family was missing: dedup and ANN
find NEAR-dups; clustering partitions the WHOLE corpus into semantic
groups (topic balancing, per-cluster sampling quotas, IVF coarse
centroids that are actually learned instead of arithmetic — see
similarity.ann_ivf_coarse's docstring hook).

Determinism design (the part worth reading): Lloyd's algorithm over
floats is NOT reproducible across engines, partitionings, or retries —
every centroid mean is an order-dependent float sum, and one ulp moves
an argmin at a cluster boundary, which cascades through later rounds.
At 100 TB reproducibility beats the last ulp of centroid precision, so
this k-means runs on a fixed-point grid:

  - components quantize to integers: floor(x * 4096 + 0.5) (12-bit
    grid; the driver's embeddings are unit-norm with |x| < 0.6, so
    |q| < 2500 and a 64-dim squared distance < 2^31 — exact int64);
  - every distance is an integer sum of integer squares →
    order-independent, bit-identical in Spark, DuckDB, and any
    partitioning;
  - centroid update rounds the mean BACK to the grid
    (floor(sum/count + 0.5)): integer sums are exact, the one IEEE
    division is deterministic, so new centroids are integers again;
  - argmin ties break toward the smaller centroid id in both engines.

Iteration runs driver-coordinated: K centroids are driver-scale BY
CONSTRUCTION (like a broadcast join's build side), so each round is one
map-only assignment pass + one (cid, dim) aggregate of K×64 rows
collected to the driver and re-emitted as literal arrays. The corpus is
never shuffled, never collected, and the assignment expression is pure
Catalyst (zip_with/aggregate over array literals — no Python UDF, no
join). Reference parity: none — the reference has no vector surface;
this extends SURVEY.md §2.10's LLM-operator family.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_pulsar_spark.registry import query
from open_pulsar_spark.tables import load_table

SCALE = 4096
K = 10
DIM = 64
UPDATE_ROUNDS = 2

_Q_EXPR = (
    f"transform(embedding, x -> cast(floor(cast(x as double) * {SCALE} + 0.5d) as bigint))"
)


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_Q_EXPR).alias("q")
    )


def _assign_col(cents: list[tuple[int, list[int]]]):
    """array_min over (dist, cid) structs == integer argmin with
    min-cid tie-break, all in whole-stage codegen."""
    structs = []
    for cid, vec in cents:
        arr = "array(" + ",".join(f"{int(v)}L" for v in vec) + ")"
        dist = f"aggregate(zip_with(q, {arr}, (x, c) -> (x - c) * (x - c)), 0L, (a, v) -> a + v)"
        structs.append(f"struct({dist} as dist, {int(cid)} as cid)")
    return F.expr("array_min(array(" + ",".join(structs) + "))")


def _update(qdf: DataFrame, cents: list[tuple[int, list[int]]]):
    """One Lloyd round: assign (map-only) → grid-rounded mean per
    (cid, dim) → K×64 rows to the driver."""
    rows = (
        qdf.withColumn("asg", _assign_col(cents))
        .select(F.col("asg.cid").alias("cid"), F.posexplode("q"))
        .groupBy("cid", "pos")
        .agg(F.sum("col").alias("s"), F.count("*").alias("n"))
        .collect()
    )
    acc: dict[int, dict[int, int]] = {}
    for r in rows:
        acc.setdefault(r.cid, {})[r.pos] = math.floor(r.s / r.n + 0.5)
    return sorted((cid, [dims[i] for i in range(DIM)]) for cid, dims in acc.items())


def _kmeans_oracle() -> str:
    zip_dist = "list_sum(list_transform(list_zip(v.q, c.c), p -> (p[1]-p[2])*(p[1]-p[2])))"

    def assign_cte(name: str, cent: str) -> str:
        return f"""
    {name} AS (
        SELECT vec_id, q, cid, CAST(dist AS BIGINT) AS sq_dist FROM (
            SELECT v.vec_id, v.q, c.cid, {zip_dist} AS dist,
                row_number() OVER (PARTITION BY v.vec_id
                                   ORDER BY {zip_dist}, c.cid) AS rn
            FROM q v CROSS JOIN {cent} c) WHERE rn = 1
    )"""

    def update_cte(name: str, assigned: str) -> str:
        return f"""
    {name} AS (
        SELECT cid, list(cval ORDER BY dim) AS c FROM (
            SELECT a.cid, dims.dim,
                   CAST(floor(CAST(sum(a.q[dims.dim]) AS DOUBLE) / count(*) + 0.5)
                        AS BIGINT) AS cval
            FROM {assigned} a
            CROSS JOIN (SELECT unnest(generate_series(1, {DIM})) AS dim) dims
            GROUP BY a.cid, dims.dim)
        GROUP BY cid
    )"""

    return f"""
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE} + 0.5) AS BIGINT)) AS q
        FROM embeddings
    ),
    c0 AS (SELECT vec_id AS cid, q AS c FROM q WHERE vec_id < {K}),
    {assign_cte("a0", "c0")},
    {update_cte("c1", "a0")},
    {assign_cte("a1", "c1")},
    {update_cte("c2", "a1")},
    {assign_cte("a2", "c2")}
    SELECT vec_id, cid::BIGINT AS cluster, sq_dist FROM a2 ORDER BY vec_id
    """


@query("kmeans_embeddings", oracle=_kmeans_oracle())
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K=10 fixed-point k-means over the embedding corpus: seeds are
    the first K vectors, two grid-rounded Lloyd updates, output is the
    final (vec_id, cluster, sq_dist) assignment.

    Scale: each round is one map-only pass over the corpus plus a K×DIM
    aggregate; the corpus is never shuffled (the groupBy key space is
    K×DIM = 640 rows) and never collected. Round count is fixed, so the
    job graph is static — at 100 TB this is UPDATE_ROUNDS+1 scans, all
    whole-stage-codegen arithmetic.
    """
    qdf = _quantized(spark, sf_dir)
    seeds = sorted(
        (r.vec_id, list(r.q)) for r in qdf.where(F.col("vec_id") < K).collect()
    )
    cents = seeds
    for _ in range(UPDATE_ROUNDS):
        cents = _update(qdf, cents)
    return (
        qdf.withColumn("asg", _assign_col(cents))
        .select(
            "vec_id",
            F.col("asg.cid").cast("bigint").alias("cluster"),
            F.col("asg.dist").alias("sq_dist"),
        )
        .orderBy("vec_id")
    )


@query(
    "kmeans_cluster_sizes",
    oracle=f"""
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE} + 0.5) AS BIGINT)) AS q
        FROM embeddings
    ),
    c0 AS (SELECT vec_id AS cid, q AS c FROM q WHERE vec_id < {K}),
    a0 AS (
        SELECT vec_id, cid FROM (
            SELECT v.vec_id, c.cid,
                row_number() OVER (PARTITION BY v.vec_id ORDER BY
                    list_sum(list_transform(list_zip(v.q, c.c),
                             p -> (p[1]-p[2])*(p[1]-p[2]))), c.cid) AS rn
            FROM q v CROSS JOIN c0 c) WHERE rn = 1
    )
    SELECT cid::BIGINT AS cluster, count(*) AS n_members
    FROM a0 GROUP BY cid ORDER BY cluster
    """,
)
def kmeans_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed-round cluster occupancy (assignment against the K seed
    vectors, no update rounds) — the balance diagnostic a curation
    pipeline reads before committing to per-cluster sampling quotas.

    Scale: one map-only assignment pass + a K-row aggregate.
    """
    qdf = _quantized(spark, sf_dir)
    seeds = sorted(
        (r.vec_id, list(r.q)) for r in qdf.where(F.col("vec_id") < K).collect()
    )
    return (
        qdf.withColumn("asg", _assign_col(seeds))
        .groupBy(F.col("asg.cid").cast("bigint").alias("cluster"))
        .agg(F.count("*").alias("n_members"))
        .orderBy("cluster")
    )
