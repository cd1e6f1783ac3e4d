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


def test_pq_recall_floor_vs_exact_incell_ranking(spark):
    """Every approximate path ships with a measured-recall harness:
    IVF-PQ's ADC top-k must recover a sane fraction of the EXACT
    in-cell cosine top-k (ann_ivf_kmeans). With 256 trained codes x 16
    subspaces and nprobe=2, measured recall@5 vs full brute force is
    0.60 (round 5; was 0.25 at 16 codes x 8 subspaces in round 4);
    the floor leaves margin for per-round testdata regeneration while
    still catching a broken codebook/LUT (which drops recall to
    ~chance, < 0.1)."""
    from open_pulsar_spark.registry import all_queries

    qs = all_queries()
    exact: dict[int, set] = {}
    for r in qs["ann_ivf_kmeans"](spark, SF_SMALL).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx: dict[int, set] = {}
    for r in qs["ann_ivf_pq"](spark, SF_SMALL).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(approx) == set(exact)
    recalls = [
        len(exact[q] & approx[q]) / len(exact[q]) for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.4, recalls


def test_pq_refined_recall_beats_pure_adc(spark):
    """The exact-re-rank stage must actually help: refined recall vs
    brute-force truth is measured 0.875 (round 5) against pure ADC's
    0.60 — assert refined ≥ ADC and refined ≥ 0.6 so a broken
    shortlist join (which silently degrades to ADC-or-worse ranking)
    is caught on data, not assumed from the plan."""
    from open_pulsar_spark.registry import all_queries

    qs = all_queries()
    truth: dict[int, set] = {}
    for r in qs["ann_topk_bruteforce"](spark, SF_SMALL).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    def recall(name: str) -> float:
        got: dict[int, set] = {}
        for r in qs[name](spark, SF_SMALL).collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        rs = [len(truth[q] & got[q]) / len(truth[q]) for q in truth]
        return sum(rs) / len(rs)

    r_adc = recall("ann_ivf_pq")
    r_ref = recall("ann_ivf_pq_refined")
    assert r_ref >= r_adc, (r_ref, r_adc)
    assert r_ref >= 0.6, r_ref


def test_pq_codebook_training_partitioning_invariant(spark):
    """PQ inherits the fixed-point determinism contract: a training
    round over ANY repartitioning of the corpus yields bit-identical
    codebooks (integer sums + one deterministic division per cell)."""
    res = C._residual_frame(spark, SF_SMALL)
    cb_rows = sorted(
        (r.vec_id, list(r.r))
        for r in res.where(F.col("vec_id") < C.PQ_NCODES).collect()
    )
    donors = [
        [
            (code, rvec[m * C.PQ_SUBDIM : (m + 1) * C.PQ_SUBDIM])
            for code, rvec in cb_rows
        ]
        for m in range(C.PQ_M)
    ]
    trained = C._pq_train_round(res, donors)
    assert C._pq_train_round(res.repartition(7), donors) == trained
    assert C._pq_train_round(res.repartition(3), donors) == trained
