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
    # round-13: every operator whose internals were restructured that
    # round stays pinned to its oracle in-process (the full gate is
    # still tools/verify_oracle.py)
    "part_copurchase_triangles",
    "copurchase_assortativity",
    "copurchase_negative_samples",
    "dedup_jaccard_prefix_join",
    "lsh_s_curve",
    "orders_profile",
    "documents_profile",
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


def test_token_extraction_matches_reference_golden_fixture(spark):
    # The reference's unit-test oracle (tests/test-features.sh:234-267):
    # its exact fixture JSON must yield 3800 total tokens and a 200000
    # context window through the engine's JSON-extraction expressions.
    import pyspark.sql.functions as F

    fixture = (
        '{"type": "result", "session_id": "test-123",'
        ' "usage": {"input_tokens": 1000, "cache_creation_input_tokens": 500,'
        ' "cache_read_input_tokens": 2000, "output_tokens": 300},'
        ' "modelUsage": {"claude-x": {"inputTokens": 1000, "outputTokens": 300,'
        ' "contextWindow": 200000}}}'
    )
    # the reference reads the FIRST modelUsage entry's contextWindow
    # without knowing the model name; Spark form: parse the block as a
    # map and take the first value, defaulting to 200k.
    def window_col():
        mu = F.from_json(
            F.get_json_object("j", "$.modelUsage"),
            "map<string, struct<contextWindow: long>>",
        )
        return F.coalesce(
            F.try_element_at(F.map_values(mu), F.lit(1))["contextWindow"],
            F.lit(200000),
        )

    df = spark.createDataFrame([(fixture,)], "j STRING")
    g = lambda p: F.coalesce(F.get_json_object("j", p).cast("bigint"), F.lit(0))
    row = df.select(
        (
            g("$.usage.input_tokens")
            + g("$.usage.cache_creation_input_tokens")
            + g("$.usage.cache_read_input_tokens")
            + g("$.usage.output_tokens")
        ).alias("tokens"),
        window_col().alias("window"),
    ).collect()[0]
    assert row.tokens == 3800
    assert row.window == 200000

    # distinguish extraction from the 200k fallback: a non-default
    # window must come through, and a missing block must default.
    df2 = spark.createDataFrame(
        [
            ('{"modelUsage": {"m": {"contextWindow": 150000}}}',),
            ('{"result": "no usage"}',),
        ],
        "j STRING",
    )
    wins = [r.w for r in df2.select(window_col().alias("w")).collect()]
    assert wins == [150000, 200000]


def test_distributed_label_propagation_matches_union_find(spark):
    """The large-graph branch of dedup_clusters (iterative min-label
    propagation) must produce the same connected components as the
    driver-side union-find: chains force multi-round convergence,
    cliques converge in one, singleton-free by construction."""
    from open_pulsar_spark.operators.dedup import _propagate_labels_distributed

    edges = (
        # chain 1-2-3-4-5 (diameter 4 → several rounds)
        [(1, 2), (2, 3), (3, 4), (4, 5)]
        # clique 10,11,12
        + [(10, 11), (10, 12), (11, 12)]
        # pair 20-21
        + [(20, 21)]
        # star centered at 33 with leaves 30,31,32 (min is a leaf)
        + [(33, 30), (33, 31), (33, 32)]
    )
    pairs = spark.createDataFrame(edges, "a_id LONG, b_id LONG")
    got = {
        (r.u, r.label)
        for r in _propagate_labels_distributed(pairs).collect()
    }
    want = (
        {(n, 1) for n in (1, 2, 3, 4, 5)}
        | {(n, 10) for n in (10, 11, 12)}
        | {(n, 20) for n in (20, 21)}
        | {(n, 30) for n in (30, 31, 32, 33)}
    )
    assert got == want


def test_pps_sample_hits_telescope_to_k(spark):
    """corpus_sample_pps: lattice hits must telescope to EXACTLY
    PPS_K (each document's count is a difference of ceils over the
    shared cumulative axis), every hit count is >= 1 after the
    filter, and token-mass dominance holds: a selected doc's interval
    contains a lattice point, so no document with n_tokens >= ceil(T/K)
    can be skipped."""
    from open_pulsar_spark.operators.curation import PPS_K, corpus_sample_pps
    from tests.conftest import SF_SMALL

    rows = corpus_sample_pps(spark, SF_SMALL).collect()
    assert sum(r.n_hits for r in rows) == PPS_K
    assert all(r.n_hits >= 1 for r in rows)
    assert len(rows) <= PPS_K
    # selected set is deterministic: re-running yields identical rows
    again = corpus_sample_pps(spark, SF_SMALL).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_posting_index_partition_invariant(spark):
    """term_posting_index's bottom-k posting sample truncates inside
    each Arrow batch, so batch/partition boundaries must shape only
    the partials, never the merged result: the same rows under 1 and
    13 input partitions yield identical posting samples. Exercises
    the operator's OWN kernel and merge (text._posting_kernel /
    text._posting_merge), not a copy — a dropped array_distinct or a
    truncation moved out of the map task fails here."""
    from pyspark.sql import functions as F

    from open_pulsar_spark.operators import text as T

    rows = [
        (i, " ".join(
            ["the"]                      # stop word: in every doc
            + ([f"w{i % 7}"] * 2)        # mid-frequency terms
            + ([f"rare{i}"] if i % 3 == 0 else [])
        ))
        for i in range(40)
    ]
    for n_parts in (1, 13):
        df = spark.createDataFrame(rows, "doc_id LONG, text STRING").repartition(
            n_parts
        )
        tok = df.select(
            "doc_id", F.explode(F.split("text", " ")).alias("term")
        )
        partial = tok.select("term", "doc_id").mapInPandas(
            T._posting_kernel(), "term STRING, doc_id LONG"
        )
        got = {
            (r.term, r.posting_sample)
            for r in T._posting_merge(partial).collect()
        }
        if n_parts == 1:
            base = got
    assert got == base
    # the stop word's sample is the k smallest doc_ids, truncated
    stop = dict(base)["the"]
    assert stop == ",".join(str(i) for i in range(T.POSTING_K))


def test_bitext_mining_margin_semantics(spark):
    """Every mined pair is (non-pivot → pivot), admitted at the
    threshold, unique per target, and margin-consistent."""
    from open_pulsar_spark.operators.similarity import (
        BITEXT_MIN_COS,
        BITEXT_PIVOT,
        bitext_mining_pairs,
    )

    rows = bitext_mining_pairs(spark, SF_SMALL).collect()
    assert rows, "sf0.001 corpus should mine at least one pair"
    tgts = [r.tgt_id for r in rows]
    assert len(tgts) == len(set(tgts)), "one best pair per target"
    for r in rows:
        assert r.tgt_lang != BITEXT_PIVOT
        assert r.cosine >= BITEXT_MIN_COS
        # margin is cos1 - cos2 (or cos1 - 0 when no runner-up); cos2
        # may be negative, so the bound is cos1 + 1, and cos2 <= cos1
        # keeps it non-negative
        assert -1e-9 <= r.margin <= r.cosine + 1.0 + 1e-9


def test_chunk_dedup_accounting_invariants(spark):
    """Distinct-chunk accounting can only shrink, never grow, and the
    chunk count telescopes to the per-doc ceil sum."""
    import math

    from pyspark.sql import functions as F

    from open_pulsar_spark.operators.multimodal import (
        CHUNK_BYTES,
        multimodal_chunk_dedup,
        with_binary_payload,
    )
    from open_pulsar_spark.tables import load_table

    out = {r.kind: r for r in multimodal_chunk_dedup(spark, SF_SMALL).collect()}
    assert set(out) == {"image", "audio", "video"}
    payload = with_binary_payload(load_table(spark, SF_SMALL, "documents"))
    expected = {
        r.kind: r.n
        for r in payload.groupBy("kind")
        .agg(F.sum(F.ceil(F.col("n_bytes") / F.lit(float(CHUNK_BYTES)))).alias("n"))
        .collect()
    }
    for kind, r in out.items():
        assert r.n_distinct <= r.n_chunks
        assert r.bytes_distinct <= r.bytes_total
        assert math.isclose(
            r.dedup_ratio, 1.0 - r.bytes_distinct / r.bytes_total, abs_tol=1e-6
        )
        assert r.n_chunks == expected[kind]


def test_vocab_oov_rate_agrees_with_text_stats(spark):
    from open_pulsar_spark.operators.text import doc_text_stats, vocab_oov_rate

    oov = {r.doc_id: r for r in vocab_oov_rate(spark, SF_SMALL).collect()}
    stats = {r.doc_id: r for r in doc_text_stats(spark, SF_SMALL).collect()}
    assert set(oov) == set(stats)
    for doc_id, r in oov.items():
        assert r.n_tokens == stats[doc_id].n_tokens
        assert 0 <= r.n_oov <= r.n_tokens


def test_temperature_mix_flattens_toward_uniform(spark):
    """α<1 tempering must up-weight tail sources, down-weight heads,
    preserve the size ordering, and stay a probability vector."""
    from open_pulsar_spark.operators.curation import corpus_temperature_mix

    rows = corpus_temperature_mix(spark, SF_SMALL).collect()
    assert abs(sum(r.p_temp for r in rows) - 1.0) < 1e-4
    by_share = sorted(rows, key=lambda r: r.n_tokens)
    for a, b in zip(by_share, by_share[1:]):
        assert a.p_temp <= b.p_temp + 1e-9, "tempering must not reorder sources"
    assert by_share[0].boost >= by_share[-1].boost, "tail boosted over head"


def test_events_key_skew_profile_empty_input(spark, tmp_path):
    """Empty fact table: the query must return the oracle's well-defined
    single row (0 keys, NULL share) instead of crashing on int(None)."""
    from open_pulsar_spark.operators.analytics import events_key_skew_profile

    sf = tmp_path / "sf_empty"
    sf.mkdir()
    spark.createDataFrame([], "user_id bigint, event_type string").write.parquet(
        str(sf / "events.parquet")
    )
    row = events_key_skew_profile(spark, str(sf)).collect()[0]
    assert row.n_keys == 0
    assert row.n_rows is None
    assert row.top10_share is None


def test_customer_fuzzy_matches_finds_planted_typos(spark, tmp_path):
    """Blocked edit-distance join must find exactly the planted
    distance-≤1 pairs and nothing else (deletion-neighborhood
    completeness for substitution, insertion AND deletion edits)."""
    from open_pulsar_spark.operators.linkage import customer_fuzzy_matches

    sf = tmp_path / "sf_fuzzy"
    sf.mkdir()
    rows = [
        (1, "alice smith"),
        (2, "alice smyth"),   # substitution -> dist 1 with #1
        (3, "alice smithh"),  # insertion    -> dist 1 with #1
        (4, "alice smit"),    # deletion     -> dist 1 with #1, #4-#2 dist 2
        (5, "robert jones"),  # unrelated
    ]
    spark.createDataFrame(rows, "c_custkey bigint, c_name string").write.parquet(
        str(sf / "customer.parquet")
    )
    got = {
        (r.a_custkey, r.b_custkey, r.dist)
        for r in customer_fuzzy_matches(spark, str(sf)).collect()
    }
    assert got == {(1, 2, 1), (1, 3, 1), (1, 4, 1)}


def test_source_token_keyness_sign_matches_odds(spark):
    """z must be positive exactly when the source's prior-smoothed odds
    for the token exceed the rest-of-corpus odds (Monroe et al. eq. 16)."""
    import math

    from open_pulsar_spark.operators.text import source_token_keyness

    rows = source_token_keyness(spark, SF_SMALL).collect()
    assert rows
    # reconstruct totals from the output itself
    yw = {}
    for r in rows:
        yw[r.t] = r.y_src + r.y_rest
    ni = {}
    for r in rows:
        ni[r.source] = ni.get(r.source, 0) + r.y_src
    n = sum(ni.values())
    for r in rows[:200]:
        w = yw[r.t]
        num_i = (r.y_src + w) / (ni[r.source] + n - r.y_src - w)
        nj = n - ni[r.source]
        num_j = (r.y_rest + w) / (nj + n - r.y_rest - w)
        want = math.copysign(1.0, math.log(num_i / num_j))
        if abs(r.z) > 1e-6:
            assert math.copysign(1.0, r.z) == want, (r.source, r.t)


def test_curation_agreement_kappa_identity(spark):
    from open_pulsar_spark.operators.curation import curation_agreement_kappa

    r = curation_agreement_kappa(spark, SF_SMALL).collect()[0]
    assert 0.0 <= r.po <= 1.0 and 0.0 <= r.pe <= 1.0
    assert r.n_agree <= r.n_docs
    if r.kappa is not None:
        assert abs(r.kappa - (r.po - r.pe) / (1.0 - r.pe)) < 1e-4
        assert r.kappa <= 1.0


def test_embedding_quantization_error_bounds(spark):
    """Absmax int8 rounding error is ≤ half a quantization step:
    max_abs_err ≤ scale/(2·127) ≤ max|x|/254 for every label."""
    from open_pulsar_spark.operators.clustering import (
        embedding_quantization_error,
    )

    rows = embedding_quantization_error(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.mean_abs_err <= r.max_abs_err
        # |x| ≤ ~1.5 for the synthetic embeddings -> hard ceiling
        assert r.max_abs_err <= 1.5 / 254


def test_crossentropy_diagonal_is_minimal_per_eval_column(spark):
    """Each eval source should be best predicted by its own LM — the
    diagonal must not exceed any off-diagonal entry of its column
    (holds whenever sources have genuinely distinct token mixes)."""
    from open_pulsar_spark.operators.text import source_crossentropy_matrix

    rows = source_crossentropy_matrix(spark, SF_SMALL).collect()
    by_eval = {}
    for r in rows:
        by_eval.setdefault(r.eval_source, {})[r.train_source] = r.cross_entropy
    assert by_eval
    for ev, col in by_eval.items():
        assert col[ev] == min(col.values()), ev


def test_label_affinity_is_valid_cosine(spark):
    from open_pulsar_spark.operators.clustering import label_embedding_affinity

    rows = label_embedding_affinity(spark, SF_SMALL).collect()
    labels = set()
    for r in rows:
        assert r.label_a < r.label_b
        labels.update((r.label_a, r.label_b))
        if r.cos_sim is not None:
            assert -1.0 - 1e-9 <= r.cos_sim <= 1.0 + 1e-9
    k = len(labels)
    assert len(rows) == k * (k - 1) // 2


def test_split_leakage_cluster_policy_is_zero(spark):
    """The audit's reason to exist: the cluster policy must admit ZERO
    cross-split near-dup pairs (both members hash the same rep)."""
    from open_pulsar_spark.operators.curation import split_leakage_audit

    rows = {r.policy: r for r in split_leakage_audit(spark, SF_SMALL).collect()}
    assert set(rows) == {"cluster", "naive"}
    assert rows["cluster"].n_cross_split == 0
    assert rows["cluster"].n_pairs == rows["naive"].n_pairs


def test_dedup_token_savings_conservation(spark):
    from open_pulsar_spark.operators.curation import dedup_token_savings

    for r in dedup_token_savings(spark, SF_SMALL).collect():
        assert 0 <= r.n_docs_kept <= r.n_docs
        assert 0 <= r.n_tokens_kept <= r.n_tokens
        assert abs(r.token_savings - (1 - r.n_tokens_kept / r.n_tokens)) < 1e-5


def test_kmv_weekly_rollup_merge_equals_direct_sketch(spark):
    """Merging daily sketches must equal sketching the week directly —
    the mergeability contract (bottom-k of distinct union of per-day
    bottom-ks == the week's bottom-k over all its users)."""
    from pyspark.sql import functions as F

    from open_pulsar_spark.operators.sketch import (
        KMV_K,
        _UU_SPARK,
        bottom_k_kernel,
        bottom_k_merge_expr,
        events_kmv_weekly_rollup,
    )
    from open_pulsar_spark.tables import load_table

    rolled = {
        r.week: r.n_est
        for r in events_kmv_weekly_rollup(spark, SF_SMALL).collect()
    }
    ev = load_table(spark, SF_SMALL, "events").select(
        F.to_date(F.date_trunc("week", "ts")).alias("week"),
        F.expr(_UU_SPARK).alias("u"),
    )
    direct = (
        ev.mapInPandas(bottom_k_kernel("week", "u", KMV_K), "week DATE, u DOUBLE")
        .groupBy("week")
        .agg(bottom_k_merge_expr("u", KMV_K).alias("mins"))
    )
    from open_pulsar_spark.operators.sketch import _kmv_estimate_col

    got = {
        r.week: r.est
        for r in direct.select("week", _kmv_estimate_col(F.col("mins")).alias("est")).collect()
    }
    assert got == rolled


def test_chisq_is_zero_under_independence(spark, tmp_path):
    """A product-form contingency (perfectly independent margins) must
    score chi2 == 0 and cramers_v == 0."""
    from open_pulsar_spark.operators.analytics import events_type_hour_chisq

    sf = tmp_path / "sf_chisq"
    sf.mkdir()
    import datetime

    rows = []
    eid = 0
    # 2 types x 2 bands, counts r_i*c_j/n exactly: margins (30, 10)x(20, 20)
    for t, hour, cnt in (
        ("a", 1, 15), ("a", 7, 15), ("b", 1, 5), ("b", 7, 5),
    ):
        for _ in range(cnt):
            rows.append(
                (eid, datetime.datetime(2024, 1, 1, hour), 1, t)
            )
            eid += 1
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    ).write.parquet(str(sf / "events.parquet"))
    r = events_type_hour_chisq(spark, str(sf)).collect()[0]
    assert r.n_events == 40
    assert r.df == 1
    assert r.chi2 == 0.0
    assert r.cramers_v == 0.0


def test_chisq_degenerate_table_yields_null_v(spark, tmp_path):
    """One event type only -> df = 0: chi2 is 0 and Cramér's V is NULL
    (undefined), matching the oracle instead of dividing by zero."""
    from open_pulsar_spark.operators.analytics import events_type_hour_chisq

    sf = tmp_path / "sf_chisq_deg"
    sf.mkdir()
    import datetime

    rows = [
        (i, datetime.datetime(2024, 1, 1, h), 1, "only")
        for i, h in enumerate((1, 7, 13, 19))
    ]
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    ).write.parquet(str(sf / "events.parquet"))
    r = events_type_hour_chisq(spark, str(sf)).collect()[0]
    assert r.df == 0
    assert r.chi2 == 0.0
    assert r.cramers_v is None


def test_pca_power_matches_replica_and_captures_energy(spark):
    """Two honest checks: (a) the engine's iterate equals a numpy
    replica of the SAME fixed-point iteration exactly (integer grid,
    so equality is exact); (b) the iterate captures >= 0.85 of the top
    eigenvalue's energy (Rayleigh quotient) — on this nearly-flat
    spectrum eigenvector alignment is not reachable in bounded rounds,
    captured energy is the meaningful convergence metric."""
    import numpy as np

    from open_pulsar_spark.operators.profiling import (
        PCA_ROUNDS,
        _PCA_DOWN,
        embedding_pca_power,
    )
    from open_pulsar_spark.tables import load_table

    rows = embedding_pca_power(spark, SF_SMALL).collect()
    got = np.array(
        [r.loading for r in sorted(rows, key=lambda r: r.d)]
    ) * 4096.0
    emb = load_table(spark, SF_SMALL, "embeddings").select("embedding").collect()
    X = np.floor(np.array([r.embedding for r in emb], dtype=np.float64) * 4096 + 0.5)
    n = len(X)
    Cr = np.floor(
        (n * (X.T @ X) - np.outer(X.sum(0), X.sum(0))) / _PCA_DOWN + 0.5
    )
    v = np.ones(X.shape[1]) * 4096
    for _ in range(PCA_ROUNDS):
        u = Cr @ v
        mx = np.abs(u).max()
        v = np.floor(u * 4096.0 / mx + 0.5)
    assert np.array_equal(got, v), (got[:5], v[:5])
    w = np.linalg.eigvalsh(Cr)[-1]
    ray = (v @ Cr @ v) / (v @ v)
    assert ray >= 0.85 * w, (ray, w)


def test_token_communities_edges_stay_within_component(spark):
    """Every positive-PMI edge must connect two tokens of the SAME
    community (closure soundness), and n_members must match the
    actual member counts."""
    from collections import Counter

    from open_pulsar_spark.operators.curation import (
        PMI_MIN_COUNT,
        _token_pairs,
        token_communities,
    )
    from open_pulsar_spark.tables import load_table
    from pyspark.sql import functions as F

    rows = token_communities(spark, SF_SMALL).collect()
    comm = {r.token: r.community for r in rows}
    sizes = Counter(r.community for r in rows)
    for r in rows:
        assert r.n_members == sizes[r.community]
    docs = load_table(spark, SF_SMALL, "documents")
    cb = (
        _token_pairs(docs)
        .groupBy("prev", "cur")
        .agg(F.count("*").alias("c2"))
        .collect()
    )
    npairs = sum(r.c2 for r in cb)
    c1l = Counter(); c1r = Counter()
    for r in cb:
        c1l[r.prev] += r.c2
        c1r[r.cur] += r.c2
    for r in cb:
        if r.c2 >= PMI_MIN_COUNT and r.c2 * npairs > c1l[r.prev] * c1r[r.cur]:
            assert comm[r.prev] == comm[r.cur], (r.prev, r.cur)


def test_dedup_canonical_groups_variants(spark, tmp_path):
    """Re-cased / re-punctuated / re-spaced copies must share one
    canonical fingerprint, with n_raw_variants counting the distinct
    byte forms; unrelated text stays separate."""
    from open_pulsar_spark.operators.dedup import dedup_canonical_exact

    sf = tmp_path / "sf_canon"
    sf.mkdir()
    rows = [
        (1, "The quick brown fox"),
        (2, "the quick  brown fox!!"),
        (3, "THE QUICK, BROWN FOX."),
        (4, "a different document"),
        (5, "a different document"),  # byte-identical pair
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        str(sf / "documents.parquet")
    )
    got = {r.keep_doc_id: r for r in dedup_canonical_exact(spark, str(sf)).collect()}
    assert set(got) == {1, 4}
    assert got[1].n_copies == 3 and got[1].n_raw_variants == 3
    assert got[4].n_copies == 2 and got[4].n_raw_variants == 1


def test_engagement_corr_matches_numpy(spark):
    """The integer-moment Pearson/OLS must equal numpy's float result
    on the same user vectors (within closing-division tolerance)."""
    import numpy as np

    from open_pulsar_spark.operators.analytics import (
        user_engagement_purchase_corr,
    )
    from open_pulsar_spark.tables import load_table
    from pyspark.sql import functions as F

    r = user_engagement_purchase_corr(spark, SF_SMALL).collect()[0]
    ev = {
        u.user_id: u.n
        for u in load_table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    od = {
        u.user_id: u.c
        for u in load_table(spark, SF_SMALL, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"))
        .agg(
            F.sum(F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")).alias("c")
        )
        .collect()
    }
    users = sorted(set(ev) | set(od))
    x = np.array([ev.get(u, 0) for u in users], dtype=np.float64)
    y = np.array([od.get(u, 0) for u in users], dtype=np.float64)
    assert r.n_users == len(users)
    want = np.corrcoef(x, y)[0, 1]
    assert abs(r.corr - want) < 1e-5
    slope = np.polyfit(x, y, 1)[0] / 100.0
    assert abs(r.slope_per_event - slope) < max(1e-4, abs(slope) * 1e-3)


def test_cuped_reduces_variance_and_preserves_pooled_mean(spark):
    """CUPED must not move the POOLED mean (Σ adjustments telescope to
    zero over all users) and var_reduction must equal rho² in [0, 1]."""
    from open_pulsar_spark.operators.analytics import ab_test_cuped

    rows = ab_test_cuped(spark, SF_SMALL).collect()
    assert len(rows) == 2
    n = sum(r.n_users for r in rows)
    pooled_raw = sum(r.mean_post * r.n_users for r in rows) / n
    pooled_adj = sum(r.mean_post_cuped * r.n_users for r in rows) / n
    assert abs(pooled_raw - pooled_adj) < 1e-3
    for r in rows:
        assert 0.0 <= r.var_reduction <= 1.0
        assert r.theta == rows[0].theta  # pooled, constant across variants


def test_rec_hitrate_no_leakage_and_bounds(spark):
    """hit-rate bounds, coverage >= hits, and the split hygiene: the
    rec lists must be reproducible from TRAIN baskets alone."""
    from open_pulsar_spark.operators.graph import copurchase_rec_hitrate

    r = copurchase_rec_hitrate(spark, SF_SMALL).collect()[0]
    assert 0 <= r.n_hits <= r.n_covered <= r.n_probes
    assert abs(r.hitrate - r.n_hits / r.n_probes) < 1e-5


def test_triangle_counts_match_bruteforce(spark):
    """part_copurchase_triangles equals an in-test brute-force closure
    over the same undirected edge set at sf0.001 (independent of the
    degree-orientation trick), and coefficients respect the ppm grid."""
    from pyspark.sql import functions as F

    from open_pulsar_spark.registry import all_queries
    from open_pulsar_spark.tables import load_table
    from tests.conftest import SF_SMALL

    got = {
        r.p_partkey: (r.degree, r.tri_count, r.coeff_ppm)
        for r in all_queries()["part_copurchase_triangles"](
            spark, SF_SMALL
        ).collect()
    }
    li = load_table(spark, SF_SMALL, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    )
    op = [(r.ok, r.pk) for r in li.distinct().collect()]
    from collections import defaultdict

    by_order = defaultdict(set)
    for ok, pk in op:
        by_order[ok].add(pk)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    # count each triangle once: iterate edges with w > v > u
    tri = defaultdict(int)
    for u, v in edges:
        for w in adj[u] & adj[v]:
            if w > v:  # u < v < w given edge tuples are ordered
                tri[u] += 1
                tri[v] += 1
                tri[w] += 1
    want = sorted(
        ((pk, n) for pk, n in tri.items()),
        key=lambda t: (-t[1], t[0]),
    )[: len(got)]
    assert {pk for pk, _ in want} == set(got)
    for pk, n in want:
        d, tc, ppm = got[pk]
        assert tc == n
        assert d == len(adj[pk])
        assert ppm == (2 * 1_000_000 * n) // (d * (d - 1))


def test_hll_estimate_is_monotone_in_the_data(spark):
    """Registers are maxima, so feeding MORE data can never lower the
    estimate: hll over half the events ≤ hll over all events, per
    type. (The property the idempotent-merge contract rests on.)"""
    from pyspark.sql import functions as F

    from open_pulsar_spark.operators.sketch import (
        _hll_user_day_key,
        hll_estimate_col,
        hll_fold,
        hll_partial,
    )
    from open_pulsar_spark.tables import load_table
    from tests.conftest import SF_SMALL

    ev = load_table(spark, SF_SMALL, "events")

    def est(df):
        keyed = df.select("event_type", _hll_user_day_key().alias("key"))
        return {
            r.event_type: r.e
            for r in hll_fold(hll_partial(keyed))
            .select("event_type", hll_estimate_col().alias("e"))
            .collect()
        }

    half = est(ev.where(F.col("event_id") % 2 == 0))
    full = est(ev)
    assert set(half) <= set(full)
    for t, e in half.items():
        assert e <= full[t], t


def test_itemset_supports_are_anti_monotone(spark):
    """Apriori's foundation, checked on the query's own output: every
    k-itemset's support is ≤ the support of each of its (k−1)-subsets,
    and every reported subset of a reported itemset is itself
    reported (no pruning hole)."""
    from open_pulsar_spark.registry import all_queries
    from tests.conftest import SF_SMALL

    rows = all_queries()["event_type_itemsets"](spark, SF_SMALL).collect()
    sup = {tuple(sorted(r.itemset.split("+"))): r.support for r in rows}
    for items, s in sup.items():
        if len(items) == 1:
            continue
        for i in range(len(items)):
            sub = items[:i] + items[i + 1 :]
            assert sub in sup, (items, sub)
            assert s <= sup[sub], (items, sub, s, sup[sub])


def test_next_event_prediction_evaluates_nonvacuously(spark):
    """At sf0.001 no user hashes into the test buckets, so the oracle
    comparison there passes on 0 rows — this test pins the evaluation
    logic at sf0.01 where both splits are populated: non-empty output,
    hits bounded by probes, hitrate consistent with the counts, and
    the model column never falls to the '(cold)' fallback when every
    previous-type exists in training."""
    from open_pulsar_spark.registry import all_queries

    rows = all_queries()["next_event_prediction_hitrate"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.n_hits <= r.n_test
        assert abs(r.hitrate - round(r.n_hits / r.n_test, 6)) < 1e-9
        assert r.predicted_next != "(cold)"


def test_acf_degenerate_series_yields_empty_on_both_engines(spark):
    """ADVICE r6: a CONSTANT daily series has zero variance (den = 0),
    which used to null out on Spark but divide-by-zero in the DuckDB
    oracle. Both now agree on an EMPTY table (the oracle filters
    den > 0); same for a fully empty series."""
    import datetime

    import duckdb

    from open_pulsar_spark.operators.analytics import acf_from_daily

    const = spark.createDataFrame(
        [(datetime.date(2024, 1, 1 + i), 500) for i in range(30)],
        "day DATE, cents LONG",
    )
    assert acf_from_daily(spark, const, pin_ns="acf_t1").count() == 0
    empty = spark.createDataFrame([], "day DATE, cents LONG")
    assert acf_from_daily(spark, empty, pin_ns="acf_t2").count() == 0
    # oracle replica of the constant case: WHERE den > 0 drops all rows
    con = duckdb.connect()
    n = con.execute(
        """
        WITH daily AS (
            SELECT (DATE '2024-01-01' + (i || ' days')::INTERVAL)::DATE AS day,
                   500::BIGINT AS cents
            FROM range(30) t(i)),
        st AS (SELECT count(*)::BIGINT AS n, sum(cents)::BIGINT AS s FROM daily),
        c AS (SELECT day, (SELECT n FROM st)::HUGEINT * cents
                              - (SELECT s FROM st)::HUGEINT AS nx FROM daily),
        den AS (SELECT sum(nx * nx)::HUGEINT AS d FROM c)
        SELECT count(*) FROM c WHERE (SELECT d FROM den) > 0
        """
    ).fetchone()[0]
    assert n == 0


def test_join_size_report_empty_input_and_counter_width(spark):
    """ADVICE r6 + the round-7 driver-hash contract: join_size_report
    on an EMPTY counts frame returns an empty report (was: TypeError
    on int(None)), and the est/exact columns are exact digit STRINGs —
    wide enough for 100 TB-scale moments (Σn² > 2^63, which killed
    LONG in r6) while avoiding DECIMAL in a final schema (which the
    driver's value-hash canonicalizes differently — r7's only red
    row)."""
    from open_pulsar_spark.operators.profiling import join_size_report

    empty = spark.createDataFrame([], "user_id LONG, n LONG")
    out = join_size_report(spark, empty)
    assert out.count() == 0
    assert dict(out.dtypes)["est_rows"] == "string"
    assert dict(out.dtypes)["exact_rows"] == "string"
    # a single key with n = 2^33 events: exact size 2^66 > LONG range,
    # carried loss-free as decimal digits
    big = spark.createDataFrame([(1, 2**33)], "user_id LONG, n LONG")
    row = {r.estimator: r for r in join_size_report(spark, big).collect()}
    assert row["uniform"].exact_rows == str(2**66)
    assert row["uniform"].est_rows == str(2**66)


def test_revenue_weekly_bucket_floors_pre_1970_dates(spark):
    """ADVICE r6: week_id must FLOOR on BOTH engines, not truncate
    toward zero — a 1969 date lands in week -1's bucket, not week 0's.
    (DuckDB's integer // itself truncates, so the oracle spells out
    floor(d / 7.0) — this test pins both sides of that contract.)"""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("1969-12-29",), ("1970-01-02",)], "d STRING"
    ).select(
        F.floor(
            F.datediff(F.col("d").cast("date"), F.lit("1970-01-01").cast("date"))
            / 7
        )
        .cast("bigint")
        .alias("week_id")
    )
    got = sorted(r.week_id for r in df.collect())
    import duckdb

    want = sorted(
        r[0]
        for r in duckdb.connect()
        .execute(
            "SELECT floor(date_diff('day', DATE '1970-01-01', d) / 7.0)"
            "::BIGINT FROM "
            "(VALUES (DATE '1969-12-29'), (DATE '1970-01-02')) t(d)"
        )
        .fetchall()
    )
    assert got == want == [-1, 0]


def test_degenerate_empty_tables_yield_empty_on_guarded_queries(spark, tmp_path):
    """Round-7 hardening: queries that collect a driver-side scalar
    (corpus-end timestamp, edge count, variance) must return EMPTY on
    empty input — matching their oracles' empty CTE output — instead
    of crashing on None or dividing by zero."""
    from pyspark.sql import functions as F  # noqa: F401

    from open_pulsar_spark.registry import all_queries
    from open_pulsar_spark.tables import load_table
    from tests.conftest import SF_SMALL

    sf = str(tmp_path / "sf_empty")
    for t in ("events", "lineitem", "orders"):
        load_table(spark, SF_SMALL, t).limit(0).write.mode("overwrite").parquet(
            f"{sf}/{t}.parquet"
        )
    qs = all_queries()
    for name in (
        "user_survival_curve",
        "bundle_modularity",
        "revenue_acf",
        "revenue_ewma",
        "orders_benford_test",
    ):
        rows = qs[name](spark, sf).collect()
        assert rows == [], (name, rows)


def test_lsh_s_curve_shape_and_consistency(spark):
    """lsh_s_curve invariants: the analytic curve is strictly
    increasing in J and hits 1.0 at the exact-dup bucket; measured
    catches never exceed truth; every populated bucket at this SF is
    high-J (the generator makes near-dups, not mid-J pairs) and fully
    caught — consistent with theory ≥ 0.97 there."""
    from open_pulsar_spark.registry import all_queries
    from tests.conftest import SF_SMALL

    rows = all_queries()["lsh_s_curve"](spark, SF_SMALL).collect()
    assert [r.j_bucket for r in rows] == list(range(3, 11))
    theory = [r.theory_ppm for r in rows]
    assert theory == sorted(theory) and len(set(theory)) == len(theory)
    assert theory[-1] == 1_000_000
    for r in rows:
        assert 0 <= r.n_caught <= r.n_true
        if r.n_true > 0:
            assert r.catch_ppm == r.n_caught * 1_000_000 // r.n_true
        else:
            assert r.catch_ppm is None


def test_blocked_embedding_pairs_match_unblocked_exactly(spark):
    """_embedding_pairs_blocked with a tiny block size (forcing many
    sub-blocks and cross-block cells) must emit the identical pair set
    and 6-dp cosines as the unblocked per-bucket kernel — the blocked
    path exists to bound per-task memory under a hot sign bucket, not
    to change a single pair."""
    from open_pulsar_spark.operators.similarity import (
        _embedding_pairs,
        _embedding_pairs_blocked,
    )
    from tests.conftest import SF_SMALL

    want = {
        (r.a_id, r.b_id, round(r.cos, 6))
        for r in _embedding_pairs(spark, SF_SMALL).collect()
    }
    got = {
        (r.a_id, r.b_id, round(r.cos, 6))
        for r in _embedding_pairs_blocked(
            spark, SF_SMALL, block_rows=3
        ).collect()
    }
    assert got == want and len(want) > 0


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark, tmp_path):
    """The winnowing THEOREM on data: two documents sharing a token
    run of >= WINNOW_GUARANTEE (= w + k - 1) tokens must share at
    least one fingerprint hash — deterministically, not
    probabilistically (the property minhash banding cannot offer).
    Also: selected density stays within the scheme's [1/w, 1] bounds
    and fingerprints dedup across overlapping windows."""
    from pyspark.sql import functions as F  # noqa: F401

    from open_pulsar_spark.operators.dedup import (
        WINNOW_GUARANTEE,
        _winnow_fps,
        winnowing_overlap_pairs,
    )

    shared = " ".join(f"s{i}" for i in range(WINNOW_GUARANTEE))
    docs = [
        (1, f"alpha beta gamma {shared} delta epsilon zeta"),
        (2, f"one two three four five {shared} six seven"),
        (3, "totally unrelated words nothing in common here at all ok"),
    ]
    sf = str(tmp_path / "sf_winnow")
    spark.createDataFrame(docs, "doc_id LONG, text STRING").write.parquet(
        f"{sf}/documents.parquet"
    )
    fps = _winnow_fps(spark, sf)
    rows = fps.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.h)
    assert by_doc[1] & by_doc[2], "guaranteed shared fingerprint missing"
    assert not (by_doc[3] & (by_doc[1] | by_doc[2]))
    # density bounds: ≥ 1 per w windows (dedup), ≤ 1 per window
    for r in (
        fps.groupBy("doc_id", "n_windows")
        .agg(F.count("*").alias("n_fp"))
        .collect()
    ):
        assert 1 <= r.n_fp <= r.n_windows
    # the pair detector surfaces (1, 2) — at MIN_SHARED=3 the shared
    # run of w+k-1 tokens yields exactly one guaranteed fingerprint,
    # so check the raw shared-count path rather than the thresholded
    # output when the overlap is minimal
    pairs = winnowing_overlap_pairs(spark, sf).collect()
    assert all((p.a_id, p.b_id) != (1, 3) for p in pairs)


def test_mutual_knn_pairs_are_reciprocal_and_bounded(spark):
    """Every emitted pair must appear in BOTH directed top-k lists
    (the criterion's whole point), outputs are unique (a < b), and
    the pair count is bounded by k·n/2."""
    from open_pulsar_spark.operators.similarity import (
        MKNN_K,
        embedding_mutual_knn_pairs,
    )
    from open_pulsar_spark.tables import load_table
    from tests.conftest import SF_SMALL

    rows = embedding_mutual_knn_pairs(spark, SF_SMALL).collect()
    n = load_table(spark, SF_SMALL, "embeddings").count()
    pairs = [(r.a_id, r.b_id) for r in rows]
    assert len(pairs) == len(set(pairs))
    assert all(a < b for a, b in pairs)
    assert 0 < len(pairs) <= MKNN_K * n / 2


def test_psi_is_zero_for_identical_halves_and_detects_shift(spark, tmp_path):
    """PSI contract on constructed data: two identical half-period
    distributions give PSI = 0 exactly (every p_b == q_b makes each
    nano term round to 0); a deliberate distribution shift yields a
    clearly positive total; empty events give an empty report."""
    import datetime

    from open_pulsar_spark.registry import all_queries

    q = all_queries()["events_value_psi"]

    def write_sf(name, rows):
        sf = str(tmp_path / name)
        spark.createDataFrame(
            rows, "event_id LONG, ts TIMESTAMP, user_id LONG,"
            " event_type STRING, value DOUBLE, props STRING"
        ).write.parquet(f"{sf}/events.parquet")
        return sf

    t0 = datetime.datetime(2024, 1, 1)

    def ev(i, day, value):
        return (i, t0 + datetime.timedelta(days=day), 1, "view", value, "{}")

    same = [ev(i, 0, float(v)) for i, v in enumerate([1, 2, 4, 8, 16] * 8)]
    same += [
        ev(100 + i, 10, float(v)) for i, v in enumerate([1, 2, 4, 8, 16] * 8)
    ]
    rows = q(spark, write_sf("sf_same", same)).collect()
    assert rows and all(r.psi_total_nano == 0 for r in rows)

    shifted = [ev(i, 0, 1.0) for i in range(40)]
    shifted += [ev(100 + i, 10, 400.0) for i in range(40)]
    rows = q(spark, write_sf("sf_shift", shifted)).collect()
    # disjoint bins: every term is NULL (one-sided), total NULL — the
    # surfaced degenerate; a PARTIAL shift must be positive
    mixed = [ev(i, 0, 1.0) for i in range(30)] + [
        ev(50 + i, 0, 400.0) for i in range(10)
    ]
    mixed += [ev(100 + i, 10, 1.0) for i in range(10)] + [
        ev(150 + i, 10, 400.0) for i in range(30)
    ]
    rows = q(spark, write_sf("sf_mix", mixed)).collect()
    assert rows and rows[0].psi_total_nano > 0

    empty = write_sf("sf_none", [])
    assert q(spark, empty).count() == 0


def test_zipf_fit_recovers_slope_on_constructed_zipfian_corpus(spark, tmp_path):
    """corpus_zipf_fit on a corpus built to BE Zipfian (freq of type
    r = 600 // r, one doc) must recover slope ≈ -1 with high r² —
    while the engine's synthetic corpus honestly reads as NON-Zipfian
    (r² ≈ 0.05 at sf0.1), this pins that the gauge itself works."""
    from open_pulsar_spark.registry import all_queries

    words = []
    for r in range(1, 61):
        words += [f"w{r:03d}"] * (600 // r)
    sf = str(tmp_path / "sf_zipf")
    spark.createDataFrame(
        [(1, " ".join(words), "en", "synth", len(words))],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    ).write.parquet(f"{sf}/documents.parquet")
    row = all_queries()["corpus_zipf_fit"](spark, sf).collect()[0]
    assert row.n_types == 60
    assert -1.2 < row.slope < -0.8
    assert row.r2 > 0.95


def test_sequential_ab_controls_peeking_on_null_data(spark):
    """The anytime boundary's defining property on A/A-like data: the
    deterministic md5 coin splits the same population, so with no
    real treatment effect the boundary should rarely be crossed —
    assert the final-day diff sits INSIDE the boundary at this SF,
    the boundary shrinks monotonically with n, and counts are
    cumulative (non-decreasing)."""
    from open_pulsar_spark.registry import all_queries
    from tests.conftest import SF_SMALL

    rows = all_queries()["ab_test_sequential"](spark, SF_SMALL).collect()
    assert len(rows) > 5
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_a >= prev.n_a and cur.n_b >= prev.n_b
        if prev.bound_ppm is not None and cur.bound_ppm is not None:
            assert cur.bound_ppm <= prev.bound_ppm
    last = rows[-1]
    assert last.significant == 0
    assert abs(last.diff_ppm) < last.bound_ppm


def test_payload_entropy_separates_uniform_from_constant(spark, tmp_path):
    """The entropy gauge's contract on constructed payloads: a
    constant byte string scores ~0 nano-nats, a 256-symbol uniform
    string scores ~ln 256, and both engines' integer formula agrees
    with a direct Python computation to the grid's truncation."""
    import math

    from open_pulsar_spark.registry import all_queries

    # doc_id % 3: 0->image slot... build one doc per kind with known bytes
    const_text = "a" * 512
    uniform_text = "".join(chr(32 + (i % 96)) for i in range(960))
    sf = str(tmp_path / "sf_ent")
    spark.createDataFrame(
        [
            (0, const_text, "en", "s", len(const_text)),
            (1, uniform_text, "en", "s", len(uniform_text)),
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    ).write.parquet(f"{sf}/documents.parquet")
    rows = {
        r.kind: r
        for r in all_queries()["multimodal_payload_entropy"](
            spark, sf
        ).collect()
    }
    assert rows["image"].mean_h_nano == 0  # doc 0: constant bytes
    want = round(math.log(96) * 1e9)  # doc 1: exactly uniform over 96 syms
    assert abs(rows["audio"].mean_h_nano - want) < 1000


def test_bootstrap_poisson_grid_is_the_poisson1_cdf():
    """The hardcoded integer CDF grid behind revenue_bootstrap_ci IS
    round(CDF_Poisson(1)(k) * 1e6): recompute from math.exp with
    exact-rational factorials and compare — a typo in the constants
    would silently bias every replicate weight on BOTH engines (parity
    green, statistics wrong), which is exactly the failure class the
    WINNOW_K hardcode review flagged."""
    import math

    from open_pulsar_spark.operators.analytics import _POIS_CDF_PPM

    cum, fact = 0.0, 1
    want = []
    for k in range(len(_POIS_CDF_PPM)):
        if k > 0:
            fact *= k
        cum += math.exp(-1.0) / fact
        want.append(round(cum * 1_000_000))
    assert list(_POIS_CDF_PPM) == want
    assert all(a < b for a, b in zip(_POIS_CDF_PPM, _POIS_CDF_PPM[1:]))
    assert _POIS_CDF_PPM[-1] < 1_000_000


def test_bench_and_audit_lists_resolve_in_registry():
    """Every name in bench.py's HEADLINE/EXTRA/v2 lists and
    explain_audit's AUDITED list is a registered query — a typo here
    would crash the driver's per-round bench/plan runs at the worst
    possible time (no local test exercises those lists otherwise)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import bench
    from tools import explain_audit

    qs = set(registry.all_queries())
    for name, lst in (
        ("HEADLINE", bench.HEADLINE),
        ("EXTRA", bench.EXTRA),
        ("HEADLINE_V2_ADDITIONS", bench.HEADLINE_V2_ADDITIONS),
        ("AUDITED", explain_audit.AUDITED),
    ):
        missing = [n for n in lst if n not in qs]
        assert not missing, (name, missing)
    # AUDITED is registry-derived: every registered query gets a plan
    # audit (a hand-maintained list silently lost 58 names in round 9)
    assert set(explain_audit.AUDITED) == qs
    # v2 additions must be timed: every one rides EXTRA
    assert set(bench.HEADLINE_V2_ADDITIONS) <= set(bench.EXTRA) | set(
        bench.HEADLINE
    )


def test_purchase_survival_km_hand_computed_fixture(spark, tmp_path):
    """VERDICT r9 task #5: purchase_survival_km has never been
    driver-sampled, and its ln-term close rides engine log() calls —
    pin the exact output on a hand-computable KM table so a testdata
    regeneration (or a log/rounding drift) can't silently break it.

    Fixture: user 1 purchases on days 0/2/5 (gaps 2 and 3 days → two
    EVENT observations), user 2 purchases once on day 0, and a
    non-purchase event on day 8 sets the horizon — so user 1 is
    censored at 3 days, user 2 at 8. By hand:
      spine  t=2: (e=1,c=0)  t=3: (e=1,c=1)  t=8: (e=0,c=1)
      risk   t=2: 4          t=3: 3          t=8: 1
      terms  ln3−ln4 = −287682072 nano; ln2−ln3 = −405465108; 0
      ln S   −287682072, −693147180, −693147180
    """
    import datetime

    from open_pulsar_spark.registry import all_queries

    D = datetime.datetime
    rows = [
        (1, 1, D(2024, 1, 1), "purchase"),
        (2, 1, D(2024, 1, 3), "purchase"),
        (3, 1, D(2024, 1, 6), "purchase"),
        (4, 2, D(2024, 1, 1), "purchase"),
        (5, 2, D(2024, 1, 9), "view"),  # horizon pin, not a purchase
    ]
    sf = tmp_path / "sf_km"
    sf.mkdir()
    spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string"
    ).write.parquet(str(sf / "events.parquet"))
    got = [
        tuple(r)
        for r in all_queries()["purchase_survival_km"](
            spark, str(sf)
        ).collect()
    ]
    assert got == [
        (2, 4, 1, 0, -287682072),
        (3, 3, 1, 1, -693147180),
        (8, 1, 0, 1, -693147180),
    ]


def test_session_conversion_attribution_hand_computed_fixture(spark, tmp_path):
    """VERDICT r9 task #5: pin session_conversion_attribution's exact
    output on a hand-computable session table (never driver-sampled).

    Fixture (30-min session gap): user 1 session A = view→click→
    purchase (entry view, first-touch converts, last touch = click),
    then after a 2-h gap session B = a lone purchase (entry purchase,
    converts, last touch = direct); user 2 session C = click→view
    (entry click, no conversion)."""
    import datetime

    from open_pulsar_spark.registry import all_queries

    D = datetime.datetime
    rows = [
        (1, 1, D(2024, 1, 1, 10, 0), "view"),
        (2, 1, D(2024, 1, 1, 10, 5), "click"),
        (3, 1, D(2024, 1, 1, 10, 10), "purchase"),
        (4, 1, D(2024, 1, 1, 12, 0), "purchase"),
        (5, 2, D(2024, 1, 1, 10, 0), "click"),
        (6, 2, D(2024, 1, 1, 10, 10), "view"),
    ]
    sf = tmp_path / "sf_attr"
    sf.mkdir()
    spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string"
    ).write.parquet(str(sf / "events.parquet"))
    got = [
        tuple(r)
        for r in all_queries()["session_conversion_attribution"](
            spark, str(sf)
        ).collect()
    ]
    assert got == [
        ("click", 1, 0, 0, 1),
        ("direct", 0, 0, 0, 1),
        ("purchase", 1, 1, 1000000, 0),
        ("view", 1, 1, 1000000, 0),
    ]


def test_purchase_value_tail_risk_hand_computed_fixture(spark, tmp_path):
    """purchase_value_tail_risk closes driver-side (VaR boundary row +
    exact totals); pin its exact output on a hand-computable tail.

    Fixture: 20 purchases of 1..20 dollars. n = 20, VaR rank =
    ceil(0.95·20) = 19 → VaR95 = 1900 cents; tail = {1900, 2000} →
    tail_n = 2, CVaR95 = 3900 // 2 = 1950."""
    import datetime

    from open_pulsar_spark.registry import all_queries

    rows = [
        (i, 1, datetime.datetime(2024, 1, 1, 0, i), "purchase", float(i))
        for i in range(1, 21)
    ]
    sf = tmp_path / "sf_tail"
    sf.mkdir()
    spark.createDataFrame(
        rows,
        "event_id bigint, user_id bigint, ts timestamp,"
        " event_type string, value double",
    ).write.parquet(str(sf / "events.parquet"))
    got = [
        tuple(r)
        for r in all_queries()["purchase_value_tail_risk"](
            spark, str(sf)
        ).collect()
    ]
    assert got == [(20, 19, 1900, 2, 1950)]


def test_customer_rfm_segments_hand_computed_fixture(spark, tmp_path):
    """VERDICT r10 task #3: customer_rfm_segments closes from a small
    collected boundary map (ntile quintile boundaries located on the
    prefix scaffold and broadcast back as literal comparisons) — pin
    the exact output on a hand-computable 7-customer table so a
    testdata regeneration that shifts distributions can't silently
    break the Python close.

    Fixture: 7 customers. n=7 → quintile sizes [2,2,1,1,1] (n mod 5
    leading tiles get the extra row), boundary ranks {2,4,5,6},
    tile = 1 + #{boundaries strictly before the row}. Customer 1 has
    TWO orders (recency/frequency/monetary aggregation all exercised);
    customers 2–7 one each. Recency rank == custkey (cust 1 newest);
    frequency rank == custkey (cust 1 freq 2, rest tie at 1, custkey
    tiebreak); monetary rank is REVERSED (cust 7 richest). By hand:
    rank→tile: 1→1 2→1 3→2 4→2 5→3 6→4 7→5."""
    import datetime

    from open_pulsar_spark.registry import all_queries

    D = datetime.date
    rows = [(1, D(2024, 1, 6), 60.0), (1, D(2024, 1, 7), 40.0)] + [
        (k, D(2024, 1, 8 - k), 100.0 * k) for k in range(2, 8)
    ]
    sf = tmp_path / "sf_rfm"
    sf.mkdir()
    spark.createDataFrame(
        rows, "o_custkey bigint, o_orderdate date, o_totalprice double"
    ).write.parquet(str(sf / "orders.parquet"))
    got = [
        tuple(r)
        for r in all_queries()["customer_rfm_segments"](
            spark, str(sf)
        ).collect()
    ]
    assert got == [
        (1, D(2024, 1, 7), 2, 100.0, 1, 1, 5),
        (2, D(2024, 1, 6), 1, 200.0, 1, 1, 4),
        (3, D(2024, 1, 5), 1, 300.0, 2, 2, 3),
        (4, D(2024, 1, 4), 1, 400.0, 2, 2, 2),
        (5, D(2024, 1, 3), 1, 500.0, 3, 3, 2),
        (6, D(2024, 1, 2), 1, 600.0, 4, 4, 1),
        (7, D(2024, 1, 1), 1, 700.0, 5, 5, 1),
    ]


def test_conversion_lag_quantiles_hand_computed_fixture(spark, tmp_path):
    """VERDICT r10 task #3: conversion_lag_quantiles closes from four
    collected order statistics (two middle ranks, the p90 rank, rank
    n) — pin the exact output on a hand-computable lag table.

    Fixture: users 1–10 convert with lag exactly 10·u seconds (first
    view at T0, first purchase T0+10u); a later second view/purchase
    for user 1 exercises the min() firsts; user 11 views only, user 12
    purchases BEFORE viewing, user 13 purchases only — all three
    excluded. n=10 → middle ranks (5,6): (50+60)//2 = 55; p90 rank
    (9·10+9)//10 = 9 → 90; max = 100."""
    import datetime

    from open_pulsar_spark.registry import all_queries

    T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    S = datetime.timedelta(seconds=1)
    rows = []
    eid = 0
    for u in range(1, 11):
        eid += 1
        rows.append((eid, u, T0, "view"))
        eid += 1
        rows.append((eid, u, T0 + 10 * u * S, "purchase"))
    rows += [
        (100, 1, T0 + 3600 * S, "view"),  # later extras: min() wins
        (101, 1, T0 + 7200 * S, "purchase"),
        (102, 11, T0, "view"),  # never purchases
        (103, 12, T0, "purchase"),  # purchase precedes view
        (104, 12, T0 + 5 * S, "view"),
        (105, 13, T0, "purchase"),  # never views
    ]
    sf = tmp_path / "sf_lag"
    sf.mkdir()
    spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string"
    ).write.parquet(str(sf / "events.parquet"))
    got = [
        tuple(r)
        for r in all_queries()["conversion_lag_quantiles"](
            spark, str(sf)
        ).collect()
    ]
    assert got == [("max", 100, 10), ("p50", 55, 10), ("p90", 90, 10)]


def test_tail_risk_hist_close_matches_bruteforce_on_random_multisets(spark):
    """The shared tail_risk_from_cents_hist close (batch query +
    streaming risk ledger both serve it) vs a brute-force Python
    oracle over seeded random cents multisets — heavy ties, skewed
    tails, and the n < 20 small-sample edge where ceil(0.95n) = n."""
    import random

    from open_pulsar_spark.operators.analytics import tail_risk_from_cents_hist

    rng = random.Random(11)
    cases = [
        [rng.randint(1, 6) * 100 for _ in range(rng.randint(1, 400))]
        for _ in range(4)
    ] + [
        sorted(rng.randint(0, 10**7) for _ in range(50)),
        [500],  # n=1: k=1, tail is the whole singleton
        [100, 100, 100],  # all-ties
    ]
    for vals in cases:
        hist: dict[int, int] = {}
        for v in vals:
            hist[v] = hist.get(v, 0) + 1
        df = spark.createDataFrame(
            sorted(hist.items()), "cents LONG, w LONG"
        )
        got = tuple(tail_risk_from_cents_hist(spark, df).collect()[0])
        s = sorted(vals)
        n = len(s)
        k = (95 * n + 99) // 100
        tail = s[k - 1 :]
        want = (n, k, s[k - 1], len(tail), sum(tail) // len(tail))
        assert got == want, f"vals(n={n}): {got} != {want}"


def test_lag_quantiles_close_matches_bruteforce_on_random_lags(spark):
    """The shared lag_quantiles_from_firsts close (batch query +
    streaming lag ledger) vs a brute-force Python oracle on seeded
    random firsts tables — non-converters and purchase-before-view
    rows mixed in, odd/even n for both median branches."""
    import random

    from open_pulsar_spark.operators.analytics import lag_quantiles_from_firsts

    rng = random.Random(23)
    for n_conv in (1, 2, 7, 40, 101):
        rows, lags = [], []
        uid = 0
        for _ in range(n_conv):
            uid += 1
            v = rng.randint(0, 10**6)
            lag = rng.randint(0, 10**5)
            rows.append((uid, v, v + lag))
            lags.append(lag)
        # excluded shapes: view-only, purchase-only, purchase < view
        rows += [(uid + 1, 5, None), (uid + 2, None, 5), (uid + 3, 10, 3)]
        df = spark.createDataFrame(
            rows, "user_id LONG, first_view LONG, first_purchase LONG"
        )
        got = [tuple(r) for r in lag_quantiles_from_firsts(spark, df).collect()]
        s = sorted(lags)
        n = len(s)
        want = [
            ("max", s[-1], n),
            ("p50", (s[(n + 1) // 2 - 1] + s[(n + 2) // 2 - 1]) // 2, n),
            ("p90", s[(9 * n + 9) // 10 - 1], n),
        ]
        assert got == want, f"n={n}: {got} != {want}"


def test_user_rfm_segments_hand_computed_fixture(spark, tmp_path):
    """Pin user_rfm_segments' quintile-rank scoring and lifecycle
    labels on the same hand-computable 7-customer table as the
    customer_rfm pin (different scoring law: score = 1 + 5·(rk−1)//n,
    so n=7 maps rank→score [1,1,2,3,3,4,5]).

    By hand: recency ranks are custkey-REVERSED (cust 7 stalest),
    frequency ranks put cust 1 (2 orders) last ascending, monetary
    ranks ascend with custkey. Labels walk the CASE: c1 (5,5,1) loyal,
    c2 (4,1,1) new, c3/c4 regular, c5–c7 (r ≤ 2, f ≥ 3) at_risk."""
    import datetime

    from open_pulsar_spark.registry import all_queries

    D = datetime.date
    rows = [(1, D(2024, 1, 6), 60.0), (1, D(2024, 1, 7), 40.0)] + [
        (k, D(2024, 1, 8 - k), 100.0 * k) for k in range(2, 8)
    ]
    sf = tmp_path / "sf_urfm"
    sf.mkdir()
    spark.createDataFrame(
        rows, "o_custkey bigint, o_orderdate date, o_totalprice double"
    ).write.parquet(str(sf / "orders.parquet"))
    got = [
        tuple(r)
        for r in all_queries()["user_rfm_segments"](spark, str(sf)).collect()
    ]
    assert got == [
        (1, 3, 4, "at_risk", 1, 60000, 5),
        (1, 4, 5, "at_risk", 1, 70000, 6),
        (2, 3, 3, "at_risk", 1, 50000, 4),
        (3, 1, 2, "regular", 1, 30000, 2),
        (3, 2, 3, "regular", 1, 40000, 3),
        (4, 1, 1, "new", 1, 20000, 1),
        (5, 5, 1, "loyal", 1, 10000, 0),
    ]


def test_scaffold_closes_partition_invariant(spark):
    """The prefix-scaffold contract: rank/order-statistic closes are
    BIT-IDENTICAL whatever the shuffle partitioning (range boundaries
    are sampled, but rank and prefix sums over a total order are
    partition-invariant). Re-run the three scaffold-closing queries
    under a different spark.sql.shuffle.partitions and require equal
    output — the end-to-end form of test_prefix's parts sweep."""
    from open_pulsar_spark.registry import all_queries
    from tests.conftest import SF_SMALL

    qs = all_queries()
    names = (
        "customer_rfm_segments",
        "conversion_lag_quantiles",
        "purchase_value_tail_risk",
    )
    base = {
        n: [tuple(r) for r in qs[n](spark, SF_SMALL).collect()] for n in names
    }
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        for n in names:
            alt = [tuple(r) for r in qs[n](spark, SF_SMALL).collect()]
            assert alt == base[n], f"{n} varies with shuffle partitioning"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_dow_anova_close_matches_bruteforce_on_random_series(spark):
    """The shared dow_anova_from_daily close (batch revenue_dow_anova +
    streaming anova ledger both serve it) vs a brute-force Python
    oracle over seeded random daily series — plus the degenerate
    shapes: a constant series (SStotal = 0 → empty on both engines),
    a single-day series (one observation, SStotal = 0 → empty), and a
    hand-computed equal-group-means case where the clamped SSbetween
    numerator lands exactly on 0."""
    import datetime as _dt
    import random

    from open_pulsar_spark.operators.analytics import dow_anova_from_daily

    def brute(pairs):
        groups: dict[int, list[int]] = {}
        for ed, cents in pairs:
            groups.setdefault(((ed % 7) + 7) % 7, []).append(cents)
        rows = sorted(
            (dow, len(v), sum(v), sum(x * x for x in v))
            for dow, v in groups.items()
        )
        n = sum(r[1] for r in rows)
        st = sum(r[2] for r in rows)
        s2t = sum(r[3] for r in rows)
        sst = n * s2t - st * st
        if sst <= 0:
            return []
        a = sum((s * s * 10**6) // ng for _, ng, s, _ in rows)
        eta2 = max(a * n - st * st * 10**6, 0) * 10**6 // (sst * 10**6)
        return [(d, ng, s, s // ng, eta2) for d, ng, s, _ in rows]

    def run(pairs):
        epoch = _dt.date(1970, 1, 1)
        df = spark.createDataFrame(
            [(epoch + _dt.timedelta(days=ed), c) for ed, c in pairs],
            "day DATE, cents LONG",
        )
        return [tuple(r) for r in dow_anova_from_daily(spark, df).collect()]

    rng = random.Random(12)
    cases = [
        # dense multi-week series, varied magnitudes
        [(ed, rng.randint(0, 10**7)) for ed in range(10_000, 10_060)],
        # sparse days with heavy ties across weekdays
        [(ed, rng.choice([100, 100, 200])) for ed in rng.sample(range(9000, 9200), 40)],
        # two-weekday series
        [(7 * k, rng.randint(1, 500)) for k in range(10)]
        + [(7 * k + 1, rng.randint(1, 500)) for k in range(10)],
    ]
    for pairs in cases:
        assert run(pairs) == brute(pairs), pairs[:5]

    # constant series: SStotal = 0 → empty table (both engines)
    assert run([(ed, 4200) for ed in range(100, 121)]) == []
    # single observation: SStotal = 0 → empty
    assert run([(5, 12345)]) == []
    # hand-computed equal-means: dow4 = {100, 300}, dow5 = {200} —
    # group means both 200, SSbetween numerator exactly 0 → eta2 0
    assert run([(4, 100), (11, 300), (5, 200)]) == [
        (4, 2, 400, 200, 0),
        (5, 1, 200, 200, 0),
    ]


def test_prefix_join_hash_order_equals_string_order(spark):
    """Round-13 change: the prefix-filter window orders tokens by
    (df, xxhash64) with an in-query injectivity witness, instead of
    carrying the shingle string as a third tiebreak. On a corpus with
    no observed 64-bit collision the two orders are the SAME total
    order, so the emitted pairs must be identical; the forced fallback
    exercises the collision branch end-to-end."""
    from open_pulsar_spark.operators.dedup import (
        PPJ_TAU_DEN,
        PPJ_TAU_NUM,
        _prefix_jaccard_pairs,
    )

    fast = sorted(
        map(
            tuple,
            _prefix_jaccard_pairs(
                spark, SF_SMALL, PPJ_TAU_NUM, PPJ_TAU_DEN, "t_hashord_a",
                with_counts=True,
            ).collect(),
        )
    )
    slow = sorted(
        map(
            tuple,
            _prefix_jaccard_pairs(
                spark, SF_SMALL, PPJ_TAU_NUM, PPJ_TAU_DEN, "t_hashord_b",
                with_counts=True, _force_string_order=True,
            ).collect(),
        )
    )
    assert fast == slow and len(fast) > 0
