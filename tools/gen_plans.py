"""Generate PLANS.md: physical plan trees for the headline queries.

Evidence for the 100 TB posture: each plan shows where the shuffles are,
which joins broadcast, and that scans carry pushed filters and pruned
schemas. Regenerate after plan-affecting changes:

    python tools/gen_plans.py
"""

from __future__ import annotations

import os
import re
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_DIR = "/root/testdata/sf0.01"

QUERIES = [
    "q1_pricing_summary",
    "e2_sql_regional_revenue",
    "j1_inner_equi_join",
    "j8_asof_join",
    "j10_salted_skew_join",
    "j11_bucketed_join",
    "s11_partitioned_lake",
    "a8_pivot",
    "o3_top_k_per_group",
    "x1_exact_dedup",
    "x1b_incremental_dedup",
    "x2_minhash_near_dedup",
    "x3_similarity_bruteforce",
    "x4b_term_frequency",
    "x4f_corpus_curation",
    "x4g_column_profile",
    "s14_snapshot_diff",
    "a10_stats_agg",
    "a11_incremental_rollup",
    "s8b_dq_report",
    "x4h_pii_redaction",
    "x6d_decontamination",
    # round-7 additions
    "x2i_lsh_exact_rescore",
    "x4j_unigram_logprob",
    "x6d2_decontamination_normalized",
    "a11b_cdc_rollup_compose",
    "x4k_tfidf",
    "x4l_trigram_stats",
    "x2j_semantic_dedup",
    "x3h_ann_recall_eval",
    "x6e_mixture_reweight",
    "x6f_length_histogram",
    "x6g_per_source_sample",
    "e2_sql_large_quantity",
    "x1c_dedup_rate_by_source",
    "w8_time_range_window",
    "x3i_dim_truncation_recall",
    "x5i_audio_rms_profile",
    "x6h_packing_efficiency",
    "x2k_quality_dedup_manifest",
    "x4n_quality_deciles",
    "x3j_pq_codes",
    "x3k_pq_adc_topk",
    "x3l_pq_recall",
    "x6i_corpus_funnel",
    "x3m_pq_ivf_search",
    "x2m_threshold_sweep",
    "j12_interval_grid_join",
    "x6j_dedup_aware_mixture",
    "x4e2_lang_confusion",
    "a12_hll_sketch_rollup",
    "x2n_incremental_near_dedup",
    "w9_rolling_zscore_anomaly",
    "x5k_scene_change",
    "x4m_source_vocab_overlap",
    # round-8 additions
    "w4b_quartile_cutpoints",
    "x4n2_quality_deciles_scalable",
    "s16b_zorder_layout_scalable",
    "x2p_paragraph_near_dedup",
    "e2_sql_waiting_orders",
    "x6k_incremental_admission_funnel",
    "e2_sql_order_distribution",
    "e2_sql_dormant_customers",
    "x2q_duplicated_gram_mass",
    "x3n_pq_refine_topk",
    "x5l_audio_silence_trim",
    "w10_ewma",
    "j8b_asof_join_tolerance",
    "x6l_shard_manifest",
    "f4_iter_udf",
    "x2r_cross_source_gram_flow",
    "s17_write_audit_publish",
    "a13_heavy_hitters",
    "x4o_token_entropy",
    "x3p_ivf_nprobe_sweep",
    "x5m_image_phash_dedup",
    "x5n_audio_fingerprint_dedup",
    "u5_bag_setops",
    # round-9 additions
    "x2s_substring_span_dedup",
    "x2s2_span_dedup_by_source",
    "x6m_importance_resample",
    "x6b2_bfd_packing",
    "x6h2_packing_comparison",
    "e2_sql_top_supplier",
    "e2_sql_forecast_revenue",
    "e2_sql_volume_shipping",
    "e2_sql_market_share",
    "x4p_zipf_fit",
    "w11_cumulative_distinct",
    "x3q_mrl_refine_topk",
    "x5o_image_patchify",
    "x3r_kmeans_step",
    "s18_cdc_apply",
    "x4q_readability",
    "x5p_audio_decimate",
    "s19_dynamic_partition_overwrite",
    "j8c_asof_join_nearest",
    "x2v_containment_rescore",
    "u6_not_in_null_semantics",
    "x4s_bigram_logprob",
    "w12_retention_cohorts",
    # round-10 additions
    "e2_sql_promising_parts",
    "e2_sql_min_cost_supplier",
    "e2_sql_product_profit",
    "e2_sql_important_stock",
    "e2_sql_priority_shipping",
    "e2_sql_supplier_part_counts",
    "x2s3_span_dedup_mapcombine",
    "x3r2_kmeans_train",
    "s20_incremental_lake_merge",
    "x4t_quality_ensemble",
    "t10_streaming_cumulative_distinct",
    "a14_countmin_sketch",
    "w13_rolling_distinct_users",
    "x3s_radius_search",
    "x5q_image_histogram",
    "x6n_temperature_mixture",
    "x2w_prefix_filter_join",
    "x3t_filtered_search",
    "x6p_epoch_schedule",
    "s21_merge_on_read",
    "a15_grouped_mode",
    "t11_foreachbatch_upsert",
    # round-11 additions
    "x2w2_prefix_filter_full_corpus",
    "s22_dpp_pruned_join",
    "t12_streaming_decontamination",
    "x1d_url_dedup_report",
    "a16_skew_histogram_2d",
    "a8b_unpivot",
    "x4w_gopher_rules",
    "x2y_lsh_parameter_planner",
    "x6s_decontaminated_mixture",
    "s23_generation_vacuum",
    "x3u_ivf_knn_graph",
    "f5_cogrouped_asof",
    "x6t_curriculum_anneal",
    "x3v_knn_graph_recall",
    # round-12 additions (j10b additionally gets a runtime final-plan
    # section below — the skew split exists only after execution)
    "x3w_knn_graph_multiprobe_repair",
    "s7d_mongomock_upsert",
    "t6c_state_ttl_expiry",
    "j10b_aqe_skew_join",
    "x6u_epoch_reshuffle_manifest",
    "x1e_bloom_prescreen",
    "s24_incremental_file_ledger",
    "s7e_mongomock_readback",
    "w14_time_weighted_avg",
    # round-13 additions
    "x5m2_hamming_near_dedup",
    "x4u_bm25_retrieval",
    "s25_generation_drift_audit",
    "x6v_chunk_overlap_manifest",
    "x3x_incremental_ivf_admission",
    "x5n2_hamming_audio_near_dedup",
    "x6w_chunk_decontamination",
    # round-14 additions
    "x2e2_global_dedup_clusters",
    "x4v_hybrid_rrf_fusion",
    "x6x_chunk_bm25_retrieval",
    "x5r_video_near_dedup",
    "w15_gaps_islands",
    "x5s_keyframe_select",
    "x6y_dedup_survivorship",
    "x4x_retrieval_eval",
    "x5t_audio_gain_normalize",
    "x6z_token_budget_waterfill",
    "x3y_mips_matmul_topk",
    "x4y_keyword_extract",
    "a17_weighted_median",
    "x2z_lsh_quality_audit",
    "f6_map_in_arrow",
    "s26_time_travel_read",
    # round-15 additions
    "x2e2b_global_dedup_clusters_full",
    "x6y2_dedup_survivorship_full",
    "x2e3_incremental_closure",
    "x4z_mmr_diversified_retrieval",
    "x6y3_incremental_survivorship",
    "x6z2_dedup_aware_waterfill",
    "x5u_shot_segmentation",
    "x4z2_chunk_mmr_rerank",
    "a18_grouped_mad",
    "f7_apply_in_arrow",
    # round-16 additions
    "x2j2_semdedup_prune",
    "x2e4_closure_retraction",
    "x6y4_retraction_survivorship",
    "x3z_trained_ivf_topk",
    "x6b3_takedown_pack_audit",
    "a19_grouped_trimmed_mean",
    "x6q_split_leakage_audit",
    "e3_curation_pipeline",
    # round-17 additions
    "x3x2_ivf_cell_split",
    "x6q2_cluster_coherent_split",
    "x6b4_incremental_repack",
    "x3x3_post_split_centroids",
    "x6b5_repack_reconciliation",
    "x3z2_post_split_ivf_topk",
    "a20_grouped_winsorized_mean",
    "x6q3_split_ratio_drift",
    "x3z3_post_split_recall",
    # round-18 additions
    "a19b_trimmed_mean_scalable",
    "a20b_winsorized_mean_scalable",
    "x2j2b_semdedup_prune_post_split",
    "x3x4_ivf_cell_merge",
    "x3x5_post_merge_centroids",
    "x3z4_tombstone_ivf_topk",
    "x3z5_tombstone_occupancy",
    "x3z6_post_merge_ivf_topk",
    "x3x6_maintenance_plan",
]


def main() -> None:
    from ssn_college_software_architecture_assignments__spark import (
        build_session,
        registry,
    )

    spark = build_session(app_name="gen-plans", shuffle_partitions=8)
    qs = registry.all_queries()
    defs = registry.load_all()

    lines = [
        "# PLANS — physical plans of the headline queries",
        "",
        "Auto-generated by `python tools/gen_plans.py` (sf0.01, AQE on; on",
        "real data AQE additionally coalesces partitions and splits skewed",
        "joins at runtime). Tree + scan pushdown evidence per query; the",
        "takeaway per plan is in the operator's docstring.",
        "",
    ]
    for name in QUERIES:
        # plans must be the uncached shape: an earlier query's persist()
        # would substitute InMemoryRelation into later identical subtrees
        spark.catalog.clearCache()
        df = qs[name](spark, SF_DIR)
        jvm_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = df._jdf.queryExecution().explainString(jvm_mode)
        tree = plan.split("\n\n")[0]
        pushed = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
        # partition pruning evidence: static ranges AND injected
        # dynamicpruningexpression nodes (s11/s22)
        parts = re.findall(r"PartitionFilters: \[[^\]]*\]", plan)
        schemas = re.findall(r"ReadSchema: [^\n]*", plan)
        doc = (defs[name].doc or "").strip().split("\n\n")[0]
        lines.append(f"## {name}")
        lines.append("")
        if doc:
            lines.append(re.sub(r"\s+", " ", doc))
            lines.append("")
        lines.append("```")
        lines.append(tree.strip())
        for p in dict.fromkeys(pushed):
            lines.append(p)
        for p in dict.fromkeys(parts):
            if p != "PartitionFilters: []":
                lines.append(p)
        for s in dict.fromkeys(schemas):
            lines.append(s)
        lines.append("```")
        lines.append("")

    # j10b's claim is RUNTIME evidence: the skew split appears only in
    # the executed final adaptive plan, so record that too.
    from ssn_college_software_architecture_assignments__spark.operators.joins import (
        j10b_skew_evidence,
    )

    spark.catalog.clearCache()
    final = j10b_skew_evidence(spark, SF_DIR)
    tree = final.split("\n\n")[0]
    lines.append("## j10b_aqe_skew_join — FINAL adaptive plan (executed)")
    lines.append("")
    lines.append(
        "Runtime skew evidence: OptimizeSkewedJoin split the planted hot "
        "partition (`skew=true` on the SortMergeJoin, `skewed` on the "
        "AQEShuffleRead) — gated in tests/test_plan_shapes.py."
    )
    lines.append("")
    lines.append("```")
    for ln in tree.splitlines():
        if any(
            k in ln
            for k in ("SortMergeJoin", "AQEShuffleRead", "AdaptiveSparkPlan")
        ):
            lines.append(ln.rstrip()[:120])
    lines.append("```")
    lines.append("")

    out = os.path.join(REPO_ROOT, "PLANS.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(QUERIES)} plans)")


if __name__ == "__main__":
    main()
