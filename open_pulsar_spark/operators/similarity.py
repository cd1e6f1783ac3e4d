"""L4 similarity search over the `embeddings` table (array<float>, 64-d).

Two paths:
  - ann_topk_bruteforce: exact cosine top-k — the baseline. The query
    set broadcasts; the corpus streams; per-corpus-partition ranking
    then a tiny global top-k. Linear in corpus size, no corpus shuffle.
  - ann_lsh_bucketed: random-hyperplane (sign) LSH — the 100 TB path.
    Bucket assignment is map-only; the probe is an equi-join on the
    bucket id, so the candidate set is |bucket| per query, not
    |corpus|.
  - dedup_embedding_cosine: exact all-pairs threshold pairs — the
    ground-truth near-dup formulation (quadratic on purpose; the LSH
    bucket join is the scale path for the same verify expression).

Float parity: dot products are an UNROLLED left-associative 64-term
sum (`v[0]*u[0] + v[1]*u[1] + ...`) over the vector cast to double.
Left-associative addition reproduces the sequential loop DuckDB's
`list_dot_product` runs, so Spark and the oracle agree bit-for-bit
(verified empirically), and unlike `F.aggregate`+`zip_with` (an
interpreted higher-order function) it stays inside whole-stage
codegen. Similarities are additionally rounded to 6 dp in the output.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_pulsar_spark.registry import query
from open_pulsar_spark.tables import load_table

DIM = 64
N_QUERIES = 8      # vec_id < 8 are the probe vectors
TOP_K = 5
N_PLANES = 6       # LSH hyperplanes → 64 buckets

# Deterministic hyperplanes, rounded so the literals embedded in the
# Spark plan and the oracle SQL are the exact same doubles.
_PLANES: list[list[float]] = [
    [round(float(x), 6) for x in row]
    for row in np.random.RandomState(7).randn(N_PLANES, DIM)
]


def dot_cols(a: str, b: str) -> Column:
    """Unrolled codegen-friendly dot product of two array columns."""
    e = F.col(a)[0] * F.col(b)[0]
    for i in range(1, DIM):
        e = e + F.col(a)[i] * F.col(b)[i]
    return e


def dot_lit(a: str, plane: list[float]) -> Column:
    """Unrolled dot product of an array column with a literal vector."""
    e = F.col(a)[0] * F.lit(plane[0])
    for i in range(1, DIM):
        e = e + F.col(a)[i] * F.lit(plane[i])
    return e


def _normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, v: array<double>, nrm) — norm computed map-side once."""
    return (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("nrm", F.sqrt(dot_cols("v", "v")))
    )


_NORM_SQL = "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"


def _plane_sql(p: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in p) + "]::DOUBLE[]"


_BUCKET_SQL = " + ".join(
    f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {_plane_sql(p)}) > 0 "
    f"THEN {1 << h} ELSE 0 END)"
    for h, p in enumerate(_PLANES)
)


def _bucket_col() -> Column:
    """LSH bucket id: sign bit per hyperplane, folded into an int."""
    e = F.when(dot_lit("v", _PLANES[0]) > 0, F.lit(1)).otherwise(0)
    for h in range(1, N_PLANES):
        e = e + F.when(dot_lit("v", _PLANES[h]) > 0, F.lit(1 << h)).otherwise(0)
    return e


def _rank_topk(scored: DataFrame) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cosine"), "rk")
        .orderBy("query_id", "rk")
    )


# --------------------------------------------------------------------------
# ann_topk_bruteforce — exact cosine top-k for a broadcast query set.
# --------------------------------------------------------------------------
@query(
    "ann_topk_bruteforce",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, {_NORM_SQL} AS nrm
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM e WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               list_dot_product(q.qv, e.v) / (q.qn * e.nrm) AS cos
        FROM q JOIN e ON e.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rk
        FROM scored
    )
    SELECT query_id, neighbor_id, round(cos, 6) AS cosine, rk
    FROM ranked WHERE rk <= {TOP_K}
    ORDER BY query_id, rk
    """,
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for each of the first 8 vectors.

    Scale: the query side is broadcast (queries are always small); the
    corpus is scanned once; ranking partitions by query_id. Cost is
    O(|queries| × |corpus|) multiply-adds with no corpus shuffle.
    """
    # persist: corpus and broadcast query side share the normalization
    # subplan (64-term dot) — cache so it's computed once.
    emb = _normalized(spark, sf_dir).persist()
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    scored = emb.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot_cols("qv", "v") / (F.col("qn") * F.col("nrm"))).alias("cos"),
    )
    return _rank_topk(scored)


# --------------------------------------------------------------------------
# ann_lsh_bucketed — random-hyperplane LSH candidate retrieval.
# --------------------------------------------------------------------------
@query(
    "ann_lsh_bucketed",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, {_NORM_SQL} AS nrm,
                      {_BUCKET_SQL} AS bucket
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, bucket
          FROM e WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               list_dot_product(q.qv, e.v) / (q.qn * e.nrm) AS cos
        FROM q JOIN e ON q.bucket = e.bucket AND e.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rk
        FROM scored
    )
    SELECT query_id, neighbor_id, round(cos, 6) AS cosine, rk
    FROM ranked WHERE rk <= {TOP_K}
    ORDER BY query_id, rk
    """,
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5: sign-LSH with 6 fixed hyperplanes → 64
    buckets; candidates are only corpus vectors in the query's bucket.

    Scale: bucket assignment is map-only; the probe join is an
    equi-join on bucket id (with the small query side broadcast), so
    work per query is |bucket| ≈ |corpus|/64 — the knob is N_PLANES.
    An IVF variant would replace the hash with learned centroids; the
    plumbing (assign → equi-join → rank) is identical.
    """
    # persist: bucket assignment is 6 unrolled plane dots — compute once
    # for both the corpus side and the broadcast query side.
    emb = _normalized(spark, sf_dir).withColumn("bucket", _bucket_col()).persist()
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("bucket").alias("qbucket"),
    )
    scored = emb.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot_cols("qv", "v") / (F.col("qn") * F.col("nrm"))).alias("cos"),
    )
    return _rank_topk(scored)


# --------------------------------------------------------------------------
# ann_ivf_coarse — IVF-style coarse quantization ANN.
# --------------------------------------------------------------------------
CENTROID_MOD = 137
CENTROID_RESIDUE = 3  # vec_id % 137 == 3 → deterministic centroid subset

_CENTROID_SQL = f"vec_id % {CENTROID_MOD} = {CENTROID_RESIDUE}"

@query(
    "ann_ivf_coarse",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, {_NORM_SQL} AS nrm
               FROM embeddings),
    c AS (SELECT vec_id AS centroid_id, v AS cv, nrm AS cn FROM e WHERE {_CENTROID_SQL}),
    assigned AS (
        SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, c.centroid_id,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY list_dot_product(e.v, c.cv) / (e.nrm * c.cn) DESC,
                                c.centroid_id) AS rn
            FROM e CROSS JOIN c)
        WHERE rn = 1),
    q AS (SELECT e.vec_id AS query_id, e.v AS qv, e.nrm AS qn, a.centroid_id
          FROM e JOIN assigned a ON e.vec_id = a.vec_id
          WHERE e.vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               list_dot_product(q.qv, e.v) / (q.qn * e.nrm) AS cos
        FROM q
        JOIN assigned a ON a.centroid_id = q.centroid_id
        JOIN e ON e.vec_id = a.vec_id AND e.vec_id <> q.query_id),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rk
        FROM scored)
    SELECT query_id, neighbor_id, round(cos, 6) AS cosine, rk
    FROM ranked WHERE rk <= {TOP_K}
    ORDER BY query_id, rk
    """,
)
def ann_ivf_coarse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN: a deterministic centroid subset partitions the
    corpus into inverted lists (nearest-centroid assignment); a query
    probes only its own list.

    Scale: assignment is a map-side argmax against the BROADCAST
    centroid set (linear in corpus × k centroids); the probe join is an
    equi-join on centroid_id. Swap the arithmetic centroid choice for
    k-means centroids and the plumbing — assign → equi-join → rank —
    is production IVF. nprobe>1 = join against the top-n assigned
    centroids instead of rank-1.
    """
    emb = _normalized(spark, sf_dir).persist()
    cent = emb.where(
        F.col("vec_id") % CENTROID_MOD == CENTROID_RESIDUE
    ).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    arn = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), "centroid_id")
    assigned = (
        emb.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "centroid_id",
            (dot_cols("v", "cv") / (F.col("nrm") * F.col("cn"))).alias("ccos"),
        )
        .withColumn("rn", F.row_number().over(arn))
        .where(F.col("rn") == 1)
        .select("vec_id", "centroid_id")
    )
    q = (
        emb.where(F.col("vec_id") < N_QUERIES)
        .join(assigned, "vec_id")
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            F.col("centroid_id").alias("qcentroid"),
        )
    )
    scored = (
        assigned.join(F.broadcast(q), F.col("centroid_id") == F.col("qcentroid"))
        .where(F.col("vec_id") != F.col("query_id"))
        .join(emb, "vec_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot_cols("qv", "v") / (F.col("qn") * F.col("nrm"))).alias("cos"),
        )
    )
    return _rank_topk(scored)


# --------------------------------------------------------------------------
# dedup_embedding_cosine — vector near-duplicate pairs (exact).
# --------------------------------------------------------------------------
@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, {_NORM_SQL} AS nrm
               FROM embeddings)
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4
    ORDER BY a_id, b_id
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ 0.4), exact all-pairs via
    Arrow-batched blocked matmul.

    All-pairs vector math is the one pattern where row-at-a-time JVM
    expressions lose by orders of magnitude to vectorized BLAS: each
    partition multiplies its block of normalized vectors against the
    broadcast corpus matrix (numpy matmul), emitting only pairs over
    threshold. O(n²·d) FLOPs but ~GFLOP/s per core instead of ~MFLOP/s.

    Scale: at 100 TB the corpus no longer broadcasts whole — block BOTH
    sides (grid of corpus chunks joined to row blocks) or prefilter
    candidates with the LSH bucket equi-join (ann_lsh_bucketed) before
    this exact verify. The per-block compute kernel stays identical.

    Parity: numpy's pairwise summation differs from the oracle's
    sequential loop only at ~1e-16 relative; the 6-dp rounding absorbs
    it (a disagreement needs a cosine within 1e-15 of the threshold or
    a rounding boundary — measure-zero for continuous data).
    """
    import pandas as pd

    emb = _normalized(spark, sf_dir).select(
        "vec_id", F.expr("transform(v, x -> x / nrm)").alias("u")
    )
    # Broadcast the normalized corpus (id-sorted for deterministic output).
    corpus = (
        emb.orderBy("vec_id").select("vec_id", "u").toPandas()
    )
    ids = np.asarray(corpus["vec_id"], dtype=np.int64)
    mat = np.stack(corpus["u"].to_numpy()).astype(np.float64)
    bc = spark.sparkContext.broadcast((ids, mat))

    out_schema = "a_id LONG, b_id LONG, cos DOUBLE"

    def fn(batches):
        c_ids, c_mat = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            block = np.stack(pdf["u"].to_numpy()).astype(np.float64)
            b_ids = np.asarray(pdf["vec_id"], dtype=np.int64)
            sims = block @ c_mat.T  # (block, corpus)
            hit_r, hit_c = np.where(
                (sims >= 0.4) & (b_ids[:, None] < c_ids[None, :])
            )
            if len(hit_r):
                yield pd.DataFrame(
                    {
                        "a_id": b_ids[hit_r],
                        "b_id": c_ids[hit_c],
                        "cos": sims[hit_r, hit_c],
                    }
                )

    return (
        emb.mapInPandas(fn, out_schema)
        .select("a_id", "b_id", F.round("cos", 6).alias("cosine"))
        .orderBy("a_id", "b_id")
    )
