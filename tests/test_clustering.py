"""Fixed-point k-means: the determinism claims are the feature, so
they are tested directly — same result under any partitioning, exact
integer distances, grid-valued centroids."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_pulsar_spark.operators import clustering as C
from tests.conftest import SF_SMALL


def _assign_with(qdf, cents):
    return (
        qdf.withColumn("asg", C._assign_col(cents))
        .select("vec_id", F.col("asg.cid").alias("cid"), F.col("asg.dist").alias("d"))
        .orderBy("vec_id")
        .collect()
    )


def test_update_rounds_are_partitioning_invariant(spark):
    """The whole design goal: centroid updates are integer sums + one
    deterministic division, so ANY repartitioning yields bit-identical
    centroids — the property float Lloyd's does not have."""
    qdf = C._quantized(spark, SF_SMALL)
    seeds = sorted(
        (r.vec_id, list(r.q)) for r in qdf.where(F.col("vec_id") < C.K).collect()
    )
    c_a = C._update(qdf, seeds)
    c_b = C._update(qdf.repartition(7), seeds)
    c_c = C._update(qdf.repartition(1), seeds)
    assert c_a == c_b == c_c


def test_assignment_tie_breaks_toward_smaller_cid(spark):
    """Two identical centroids ⇒ every vector ties exactly (integer
    distances) and must land on the smaller cid."""
    qdf = C._quantized(spark, SF_SMALL)
    vec = list(qdf.where(F.col("vec_id") == 0).collect()[0].q)
    rows = _assign_with(qdf, [(3, vec), (9, vec)])
    assert {r.cid for r in rows} == {3}


def test_distances_are_exact_integers_and_centroids_on_grid(spark):
    """sq_dist is an int64 (no float path anywhere), and every updated
    centroid component is an integer on the quantization grid."""
    out = C.kmeans_embeddings(spark, SF_SMALL)
    assert dict(out.dtypes)["sq_dist"] == "bigint"
    qdf = C._quantized(spark, SF_SMALL)
    seeds = sorted(
        (r.vec_id, list(r.q)) for r in qdf.where(F.col("vec_id") < C.K).collect()
    )
    for _, comps in C._update(qdf, seeds):
        assert all(isinstance(v, int) for v in comps)
        assert len(comps) == C.DIM


def test_every_vector_assigned_exactly_once(spark):
    out = C.kmeans_embeddings(spark, SF_SMALL).collect()
    n_vec = len({r.vec_id for r in out})
    assert len(out) == n_vec
    assert {r.cluster for r in out} <= set(range(C.K))
