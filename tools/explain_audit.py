"""Dump formatted physical plans for the headline queries → PLANS.md.

The audit criteria (what a good plan looks like at 100 TB):
  - parquet scans show PushedFilters + a pruned ReadSchema;
  - dimension joins are BroadcastHashJoin (no fact-table shuffle);
  - aggregations show two HashAggregate nodes (partial + final);
  - no BroadcastNestedLoopJoin / CartesianProduct outside the
    deliberately-bounded brute-force baselines;
  - WholeStageCodegen spans cover the hot expressions.

Usage: python tools/explain_audit.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDITED = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "q7_nation_volume",
    "q10_returned_customers",
    "top3_orders_per_customer",
    "user_sessionize",
    "click_asof_purchase",
    "dedup_minhash_lsh",
    "ann_lsh_bucketed",
    "doc_text_stats",
    "corpus_sample_stratified",
    "benchmark_contamination",
    "corpus_curation_pipeline",
    "events_zorder_layout",
    "events_value_band_join",
    "events_rollup_cascade",
    "source_kmv_distinct",
    "doc_shard_packing",
    "q9_brand_profit",
    "dedup_clusters",
    "corpus_sample_exact_k",
    "corpus_sample_pps",
    "term_posting_index",
    "multimodal_resize_specs",
    "dedup_embedding_lsh",
    "value_quantile_sketch",
    "events_funnel_24h",
    "doc_repetition_stats",
    "dedup_embedding_cosine",
    "dedup_simhash_pairs",
    "dedup_cluster_quality_pick",
    "q4_priority_late_orders",
    "q6_forecast_revenue",
    "q8_market_share",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q22_idle_customers",
    "kmeans_embeddings",
    "events_transition_matrix",
    "ann_ivf_kmeans",
    "source_neardup_matrix",
    "doc_containment_pairs",
    "shingle_cms_heavy_hitters",
    "user_day_activity_fulljoin",
    "user_activity_islands",
    "q2_min_cost_supplier",
    "q11_important_part_value",
    "q12_priority_ship_delay",
    "q16_supplier_variety",
    "q20_dominant_part_suppliers",
    "q21_waiting_orders_suppliers",
    "ann_ivf_pq",
    "ann_ivf_pq_refined",
    "doc_repeated_substring_coverage",
    "events_peak_concurrency",
    "ann_hard_negatives",
    "quality_llm_calibration",
    "embedding_centroid_drift",
    "doc_repeated_spans",
    "semantic_dedup_actions",
    "part_copurchase_pagerank",
    "user_value_sax_blocks",
    "sax_block_candidate_pairs",
    "corpus_snapshot_diff",
    "langid_confusion",
    "events_type_pivot",
    "user_retention_cohorts",
    "revenue_pareto",
    "cluster_aware_split",
    "doc_ngram_novelty",
    "source_overlap_kmv",
    "bpe_merge_candidates",
    "embedding_outliers",
    "doc_bigram_logprob",
    "corpus_embedding_coverage",
    "doc_curation_verdicts",
    "token_pmi_pairs",
    "user_feature_assembly",
    "embedding_norm_stats",
    "doc_unigram_logprob",
    "doc_tfidf_topterms",
    "ab_test_report",
    "segment_revenue_trend",
    "lineitem_corr_matrix",
    "orders_profile",
    "dq_violation_counts",
    "flag_status_mutual_info",
    "dedup_jaccard_prefix_join",
    "segment_revenue_theilsen",
    "part_affinity_lift",
    "dedup_lsh_recall_full",
    "embedding_covariance_topk",
    "events_dow_forecast_backtest",
    "documents_profile",
    "events_key_skew_profile",
    "bitext_mining_pairs",
    "multimodal_chunk_dedup",
    "vocab_oov_rate",
    "corpus_temperature_mix",
    "part_price_size_skyline",
    "lineitem_price_histogram",
    "hybrid_rrf_retrieval",
    "customer_fuzzy_matches",
    "source_token_keyness",
    "curation_agreement_kappa",
    "embedding_quantization_error",
    "source_crossentropy_matrix",
    "label_embedding_affinity",
    "split_leakage_audit",
    "dedup_token_savings",
    "events_kmv_weekly_rollup",
    "events_type_hour_chisq",
    "embedding_pca_power",
    "token_communities",
    "dedup_canonical_exact",
    "user_engagement_purchase_corr",
    "ab_test_cuped",
    "copurchase_rec_hitrate",
    # round-5 additions
    "part_copurchase_triangles",
    "revenue_cusum_changepoint",
    "events_hll_distinct",
    "event_type_itemsets",
    "part_bundle_components",
    "next_event_prediction_hitrate",
    "purchase_touch_attribution",
    "part_supplier_hhi",
    "revenue_gini",
    "conversion_lag_quantiles",
    "copurchase_assortativity",
    "layout_skipping_effectiveness",
    "user_bot_regularity",
    "kmeans_silhouette",
    # round-6 additions
    "paragraph_neardup_pairs",
    "paragraph_neardup_doc_clusters",
    "event_type_sequences",
    "orders_benford_test",
    "corpus_vocab_growth",
    "user_survival_curve",
    "part_bundle_kcore",
    "revenue_acf",
    "source_bloom_filter",
    "bundle_modularity",
    "embedding_dim_ablation",
    "join_size_estimate",
    "revenue_ewma",
    "event_value_quantiles_by_type",
    "bloom_join_pruning",
    # round-7 additions
    "lsh_bucket_skew_profile",
    "dedup_lsh_capped_recall",
    "ann_sq8_recall",
    "lsh_s_curve",
    "doc_winnowing_fingerprints",
    "winnowing_overlap_pairs",
    "embedding_mutual_knn_pairs",
    "events_value_psi",
    "corpus_zipf_fit",
    "customer_kanonymity_audit",
    "events_partition_plan",
    "revenue_dow_anova",
    "ab_test_sequential",
    "multimodal_payload_entropy",
    "winnowing_capped_recall",
    # round-8 additions
    "winnowing_shared_runs",
    "bm25_topk",
    "copurchase_link_prediction",
    "context_window_packing",
    "revenue_bootstrap_ci",
    "ivf_list_balance",
    "copurchase_edge_novelty",
    "user_entropy_rate",
    "sketch_accuracy_matrix",
    "session_gap_sensitivity",
    "click_asof_tolerance",
    "table_broadcast_advisor",
    "lang_token_fertility",
    "embedding_label_knn_accuracy",
    "ab_test_power_mde",
    "retrieval_label_precision",
    "orders_cdc_merge",
    "user_features_point_in_time",
    "ivf_nprobe_recall_curve",
    "order_total_reconciliation",
    "chunk_overlap_grid",
    "cohort_ltv_curve",
    "price_quantity_elasticity",
    "winnowing_cross_source_matrix",
    "events_dau_wau_mau",
    # round-8 continuation
    "customer_ldiversity_audit",
    "forecast_conformal_interval",
    "embedding_hbos_outliers",
    "revenue_trend_seasonal_split",
    "revenue_seasonal_anomalies",
    "ivf_assignment_churn",
    "retrieval_ndcg",
    "retrieval_mrr",
    "segment_diff_in_diff",
    "doc_char_entropy",
    "revenue_holt_forecast",
    "next_event_calibration",
    "functional_dependency_mining",
    "events_lateness_profile",
    "corpus_neyman_allocation",
    "retrieval_mmr_topk",
    "event_dwell_quantiles",
    "revenue_cusum_hierarchy",
    "event_type_audience_overlap",
    "revenue_twoway_anova",
    "copurchase_negative_samples",
    "multimodal_magic_type_audit",
    "doc_rake_keyphrases",
    "quality_token_lorenz",
    "ltv_forecast_backtest",
    "churn_rule_backtest",
    "doc_boilerplate_coverage",
    "brand_return_rate_wilson",
    "shipping_delay_quantiles",
    "orders_asof_snapshot",
    "revenue_tail_index",
    "brand_seasonal_demand_index",
    "order_basket_profile",
    "customer_reorder_cycle",
    "brand_lifecycle_mix",
    "segment_brand_entropy",
    "event_type_burstiness",
    "brand_market_coverage",
    "dedup_cluster_size_histogram",
    # round-9 wave
    "retrieval_map",
    "retrieval_recall_at_k",
    "daily_order_cusum",
    "segment_revenue_mann_kendall",
    "user_growth_accounting",
    "tokenizer_vocab_coverage",
    "dedup_quality_shift",
    "dsir_importance_weights",
    "dedup_containment",
    "source_length_ks_matrix",
    "user_rfm_segments",
    "session_conversion_attribution",
    "segment_value_psi_drift",
    "orders_benford_audit",
    "error_rate_pchart",
    "part_abc_xyz_classes",
    "purchase_survival_km",
    "nation_supplier_hhi",
    "markov_entropy_rate",
    "token_dispersion_profile",
    "user_event_gini",
    "part_association_rules",
    "embedding_dim_truncation_recall",
    "orders_backlog_depth",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from open_pulsar_spark import get_spark, registry

    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()

    print("# PLANS — physical-plan audit (auto-generated by tools/explain_audit.py)\n")
    print(f"Scale dir: `{sf_dir}`. Criteria in the tool's docstring.\n")
    for name in AUDITED:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            qs[name](spark, sf_dir).explain("formatted")
        plan = buf.getvalue()
        flags = []
        if "PushedFilters: [" in plan and "PushedFilters: []" not in plan:
            flags.append("pushdown")
        if "BroadcastHashJoin" in plan:
            flags.append("broadcast-join")
        if "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan:
            flags.append("WARNING:nested-loop/cartesian")
        # default tag is computed, not assumed: 'map-only' only when the
        # plan truly has no exchange — a window/aggregate query with no
        # pushdown or broadcast flag still shuffles, and an iterative /
        # prefix-sum query that ran eagerly returns a LocalTableScan
        # whose interesting plans executed driver-coordinated jobs
        if not flags:
            if "LocalTableScan" in plan or "ExistingRDD" in plan:
                flags.append("eager-materialized (iterative/prefix job ran driver-coordinated stages)")
            elif "Exchange" in plan:
                flags.append("shuffle")
            else:
                flags.append("map-only")
        print(f"## {name}  `[{', '.join(flags)}]`\n")
        print("```")
        print(plan.strip())
        print("```\n")
    spark.stop()


if __name__ == "__main__":
    main()
