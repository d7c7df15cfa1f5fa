"""QUERIES / ORACLE_SQL assembly (the driver-facing catalog dicts).

Split from the former pipelines/queries.py monolith (r4 verdict
next-round #5); statement order inside this module is the original
file order. Explicit cross-module imports are generated: backward
dependencies at the top, forward (function-body-only) dependencies at
the bottom so package import order stays acyclic.
"""
from __future__ import annotations

from ._shared import (
    PAGES_CTE,
    US,
    W15M,
    W1D,
    W1H,
    _ROLLUP_SQL,
    _curation_sql,
    _langid_sql,
    _lttb_sql,
    _minhash_sql,
    _minmaxlttb_sql,
    _nanm4_sql,
    _nanminmax_sql,
    _simhash_neardup_sql,
    _simhash_sql,
)
from .corpus_rollup import (
    q_backfill_15m,
    q_compaction_roundtrip_15m,
    q_compress_roundtrip_15m,
    q_crawl_rate_1h,
    q_distinct_urls_per_domain,
    q_gapfill_15m,
    q_page_rollup_15m,
    q_page_rollup_multi_15m,
    q_pages_extract,
    q_retention_trim_15m,
    q_rollup_cascade_1d,
    q_rollup_cascade_1h,
    q_topk_buckets_per_domain,
    q_topk_domains,
)
from .events_windows import (
    ANOMALY_SQL,
    ROLLING_STATS_SQL,
    q_anomaly_events,
    q_rolling_stats_events,
    q_sessions_users,
    q_sliding_events_1h_15m,
    q_window_events_1h,
)
from .downsample_core import (
    _lod_pyramid_sql,
    _lttb_gapped_midpoint_sql,
    q_lod_pyramid_events,
    q_lttb_events,
    q_lttb_events_gapped_midpoint,
    q_m4_events,
    q_minmax_events,
    q_minmax_events_dt64bool,
    q_minmax_events_withx,
    q_minmaxlttb_bigseries,
    q_minmaxlttb_events,
    q_nanminmaxlttb_events,
)
from .series_stats import (
    ASOF_ENRICH_SQL,
    CORR_PAIRS_SQL,
    COUNTER_RATE_SQL,
    EWMA_SQL,
    EXACT_QUANTILES_SQL,
    HIST_QUANTILES_SQL,
    INTERARRIVAL_SQL,
    KMEANS_SQL,
    PROFILE_SQL,
    RESAMPLE_SQL,
    SEASONAL_HOD_SQL,
    SPEARMAN_SQL,
    STATE_CHANGES_SQL,
    THRESHOLD_CROSSINGS_SQL,
    TWA_SQL,
    q_asof_enrich_events,
    q_corr_pairs_15m,
    q_counter_rate_1h,
    q_ewma_15m,
    q_exact_quantiles_15m,
    q_hist_quantiles_1h,
    q_interarrival_quantiles_events,
    q_kmeans_embeddings,
    q_profile_events,
    q_resample_linear_15m,
    q_seasonal_hod_events,
    q_spearman_pairs_15m,
    q_state_changes_events,
    q_threshold_crossings_events,
    q_twa_events_1h,
)
from .joins_tpch import (
    LINEITEM_SUMMARY_SQL,
    ORDERS_BY_NATION_SQL,
    SESSION_LABEL_SQL,
    q_lineitem_pricing_summary,
    q_orders_by_nation_broadcast,
    q_session_label_events,
)
from .bigseries_nan import (
    _bigseries_sql,
    _m4_bigseries_sql,
    _minmax_bigseries_sql,
    q_everynth_events,
    q_m4_bigseries,
    q_minmax_bigseries,
    q_minmax_events_partitioned,
    q_nanm4_events,
    q_nanminmax_events,
)
from .dedup_text import (
    REPETITION_SQL,
    SPAN_DEDUP_SQL,
    q_dedup_exact_pages,
    q_repetition_docs,
    q_span_dedup_docs,
    q_token_count_docs,
)
from .neardup_sampling import (
    CHUNK_DOCS_SQL,
    INCREMENTAL_DEDUP_SQL,
    PACK_SEQUENCES_SQL,
    TFIDF_SQL,
    VOCAB_SQL,
    WARC_EXTRACT_SQL,
    _SAMPLE_SQL,
    _SPLIT_SQL,
    _STRAT_SQL,
    _build_pii_sql,
    _contamination_sql,
    q_chunk_docs,
    q_contamination_docs,
    q_fingerprint_docs,
    q_gzip_text_docs,
    q_incremental_dedup_docs,
    q_lang_id_docs,
    q_minhash_docs,
    q_near_dup_clusters,
    q_near_dup_pages,
    q_ngram_jaccard_docs,
    q_pack_sequences_docs,
    q_pii_scrub_docs,
    q_quality_docs,
    q_sample_docs,
    q_sample_stratified_docs,
    q_simhash_docs,
    q_simhash_near_dup_pages,
    q_tfidf_terms,
    q_token_stats_docs,
    q_train_split_docs,
    q_vocab_docs,
    q_warc_extract_docs,
)
from .embeddings_sim import (
    q_embedding_near_dups,
    q_knn_embeddings,
    q_knn_ivf_embeddings,
    q_token_count_bpeish,
)
from .multimodal_curation import (
    MULTIMODAL_JPEG_SQL,
    MULTIMODAL_PNG_SQL,
    q_chunkstore_downsample,
    q_corpus_curation,
    q_multimodal_frame_sample,
    q_multimodal_jpeg_decode,
    q_multimodal_mulaw_decode,
    q_multimodal_png_decode,
    q_multimodal_wav_decode,
)
from .graph_link import (
    LINK_GRAPH_SQL,
    PAGERANK_SQL,
    q_link_graph_docs,
    q_pagerank_docs,
)
from .ext_stream_text import (
    BPE_SQL,
    BPE_TOKENIZE_SQL,
    BURN_RATE_SQL,
    CANONICAL_URLS_SQL,
    COHORT_SQL,
    COOCCURRENCE_SQL,
    CUSUM_SQL,
    DOMAIN_CONCENTRATION_SQL,
    FUNNEL_SQL,
    HOLT_SQL,
    LAG_CORR_SQL,
    LANG_PIVOT_SQL,
    MAD_OUTLIERS_SQL,
    NORMALIZE_SQL,
    PERCENTILE_RANK_SQL,
    POSTINGS_SQL,
    ROLLING_MEDIAN_SQL,
    SHIPPING_PRIORITY_SQL,
    SNAPSHOT_DIFF_SQL,
    THEIL_SEN_SQL,
    UPSERT_LATEST_SQL,
    WINSORIZE_SQL,
    q_bpe_merges_docs,
    q_bpe_tokenize_docs,
    q_burn_rate_alerts,
    q_canonical_urls_docs,
    q_cohort_retention_users,
    q_cooccurrence_docs,
    q_cusum_events,
    q_domain_concentration_docs,
    q_funnel_users,
    q_holt_15m,
    q_lag_corr_15m,
    q_lang_source_pivot,
    q_mad_outliers_15m,
    q_normalize_docs,
    q_percentile_rank_15m,
    q_postings_docs,
    q_rolling_median_15m,
    q_shipping_priority,
    q_snapshot_diff_docs,
    q_theil_sen_15m,
    q_upsert_latest_events,
    q_winsorize_15m,
)
from .ext_sketch_rel import (
    ACF_SQL,
    ACTIVITY_COVERAGE_SQL,
    ANTI_JOIN_SQL,
    BLOOM_SQL,
    CALENDAR_ROLLUP_SQL,
    CMS_SQL,
    CUBE_SQL,
    DOMAIN_CAP_SQL,
    EMBEDDING_EXACT_SQL,
    EVENT_TRANSITIONS_SQL,
    GAP_PROFILE_SQL,
    GROUP_SAMPLES_SQL,
    MIXTURE_ORDER_SQL,
    OLS_SLOPE_SQL,
    PURCHASE_IMPACT_SQL,
    SKYLINE_ORDERS_SQL,
    STREAKS_SQL,
    TABLE_CHECKSUM_SQL,
    TRAINING_ORDER_SQL,
    TRIANGLES_SQL,
    URL_BLOCKLIST_SQL,
    WEIGHTED_MEDIAN_SQL,
    ZORDER_SQL,
    q_acf_15m,
    q_activity_coverage_events,
    q_anti_join_lineitems,
    q_bloom_semi_join,
    q_calendar_rollup_month,
    q_cms_heavy_hitters_docs,
    q_cube_docs,
    q_domain_cap_docs,
    q_embedding_near_dups_exact,
    q_event_transitions,
    q_gap_profile_events,
    q_group_samples_docs,
    q_mixture_order_docs,
    q_ols_slope_1h,
    q_purchase_impact_events,
    q_skyline_orders,
    q_streaks_events,
    q_table_checksum_events,
    q_training_order_docs,
    q_triangle_counts_docs,
    q_url_blocklist_docs,
    q_weighted_median_lineitem,
    q_zorder_zone_maps_events,
)
from .ext_stats_embed import (
    BENFORD_SQL,
    CENTROID_CLASSIFY_SQL,
    CLASSIFY_CONFUSION_SQL,
    CLUSTER_ARI_SQL,
    COVERAGE_SQL,
    EMBEDDING_COV_SQL,
    GINI_SQL,
    HEATMAP_TILES_SQL,
    HYBRID_RRF_SQL,
    HYSTERESIS_SQL,
    KNN_OUTLIERS_SQL,
    KWIC_SQL,
    LOCAL_SUPPLIER_SQL,
    MANN_WHITNEY_SQL,
    MUTUAL_NN_SQL,
    PROMO_SHARE_SQL,
    SAX_SQL,
    SEASONAL_DECOMP_SQL,
    SESSION_PATHS_SQL,
    SLIDING_WAU_SQL,
    SURVIVORSHIP_SQL,
    TERM_DRIFT_SQL,
    q_benford_orders,
    q_centroid_classify_embeddings,
    q_classify_confusion_embeddings,
    q_cluster_ari_embeddings,
    q_coverage_sample_docs,
    q_embedding_covariance,
    q_gini_orders,
    q_heatmap_tiles_events,
    q_hybrid_rrf_docs,
    q_hysteresis_alerts_events,
    q_knn_outliers_embeddings,
    q_kwic_docs,
    q_local_supplier_volume,
    q_mann_whitney_events,
    q_mutual_nn_embeddings,
    q_promo_share_month,
    q_sax_events,
    q_seasonal_decompose_1h,
    q_semantic_prune_embeddings,
    q_session_paths_events,
    q_sliding_wau_events,
    q_survivorship_users,
    q_term_drift_docs,
)
from .ext_fidelity_users import (
    AMOC_SQL,
    ASSOC_RULES_SQL,
    ATTRIBUTION_SQL,
    BIGRAM_FAM_SQL,
    BOOLEAN_SEARCH_SQL,
    CONVERSION_LATENCY_SQL,
    ED1_PAIRS_SQL,
    FLEET_BANDS_SQL,
    GAPFILL_LINEAR_SQL,
    GRAPH_DEGREE_SQL,
    HAAR_ENERGY_SQL,
    JSON_PROPS_SQL,
    KS_TEST_SQL,
    LTV_CURVE_SQL,
    MARKOV_BASELINE_SQL,
    OHLC_SQL,
    RFM_SQL,
    TIER_CONSISTENCY_SQL,
    TOP_MOVERS_SQL,
    WELCH_T_SQL,
    _lttb_fidelity_sql,
    q_amoc_changepoint_15m,
    q_assoc_rules_events,
    q_attribution_events,
    q_bigram_familiarity_docs,
    q_boolean_search_docs,
    q_conversion_latency_users,
    q_ed1_pairs_docs,
    q_fleet_bands_1h,
    q_gapfill_linear_15m,
    q_graph_degree_stats_docs,
    q_haar_energy_15m,
    q_json_props_events,
    q_ks_test_events,
    q_lttb_fidelity_events,
    q_ltv_curve_users,
    q_markov_baseline_events,
    q_ohlc_15m,
    q_rfm_segments_users,
    q_sax_motifs_events,
    q_tier_consistency_events,
    q_top_movers_events,
    q_welch_t_events,
)
from .ext_control_ops import (
    BACKTEST_NAIVE_SQL,
    CLAMPED_BALANCE_SQL,
    DEADBAND_SQL,
    EXPECTATIONS_SQL,
    HUFFMAN_SQL,
    INCIDENT_COVERAGE_SQL,
    ISOTONIC_SQL,
    KALMAN_SQL,
    MMR_SELECT_SQL,
    RATE_LIMIT_SQL,
    RDP_SIMPLIFY_SQL,
    READABILITY_SQL,
    TOKEN_BUCKET_SQL,
    VW_SIMPLIFY_SQL,
    q_backtest_naive_1h,
    q_clamped_balance_events,
    q_deadband_events,
    q_expectations_events,
    q_huffman_code_docs,
    q_incident_coverage_events,
    q_isotonic_fit_1h,
    q_kalman_1h,
    q_mmr_select_embeddings,
    q_rate_limit_users,
    q_rdp_simplify_15m,
    q_readability_docs,
    q_token_bucket_events,
    q_vw_simplify_15m,
)
from .ext_cluster_graph import (
    BFS_HOPS_SQL,
    CHURN_FEATURES_SQL,
    DBSCAN_SQL,
    DTW_PAIRS_SQL,
    EXPERIMENT_SQL,
    INTERVAL_UNION_SQL,
    IPS_POLICY_SQL,
    KCORE_SQL,
    QUANTILE_NORMALIZE_SQL,
    RETURNED_REVENUE_SQL,
    WEIGHTED_SAMPLE_SQL,
    q_bfs_hops_docs,
    q_churn_features_users,
    q_dbscan_embeddings,
    q_dtw_pairs_1d,
    q_experiment_readout_users,
    q_interval_union_events,
    q_ips_policy_eval_events,
    q_kcore_docs,
    q_quantile_normalize_1d,
    q_returned_revenue_customers,
    q_weighted_sample_docs,
)
from .ext_text_graph import (
    BOXPLOT_SQL,
    BURSTINESS_SQL,
    BUSDAY_ROLLUP_SQL,
    CLASS_TERMS_SQL,
    CLUSTERING_COEFF_SQL,
    COVISIT_SQL,
    DECISION_STUMP_SQL,
    DISCORD_SQL,
    LABEL_PROP_SQL,
    LATENESS_SQL,
    MANN_KENDALL_SQL,
    MEDIAN_OF_MEANS_SQL,
    MOTIF_SQL,
    PAGE_HINKLEY_SQL,
    PMI_PAIRS_SQL,
    SWEEPLINE_SQL,
    _langid_confusion_sql,
    q_boxplot_15m,
    q_burstiness_events,
    q_busday_rollup_orders,
    q_class_terms_docs,
    q_clustering_coeff_docs,
    q_covisit_users,
    q_decision_stump_users,
    q_discord_1h,
    q_label_propagation_docs,
    q_langid_confusion_docs,
    q_lateness_accounting_events,
    q_mann_kendall_15m,
    q_median_of_means_15m,
    q_motif_1h,
    q_page_hinkley_15m,
    q_pmi_pairs_docs,
    q_sweepline_audit_events,
)
from .ext_round4 import (
    BACKTEST_SNAIVE_SQL,
    CDC_CHUNK_SQL,
    CDC_CHUNK_UTF8_SQL,
    CDC_DEDUP_SQL,
    CHI2_SQL,
    CUSTDIST_SQL,
    DOMINANT_PERIOD_SQL,
    ED2_PAIRS_SQL,
    HOLTWINTERS_SQL,
    JOIN_SIZE_SQL,
    KEYWORD_TAG_SQL,
    LOD_ROUTE_SQL,
    MODULARITY_SQL,
    MULTIMODAL_GIF_SQL,
    ORDER_PRIORITY_SQL,
    PPR_SQL,
    PROFIT_SQL,
    QUANTIZED_KNN_SQL,
    SALES_OPPORTUNITY_SQL,
    TWOHOP_SQL,
    VOCAB_OVERLAP_SQL,
    q_backtest_snaive_1h,
    q_cdc_chunk_docs,
    q_cdc_chunk_docs_utf8,
    q_cdc_dedup_corpus,
    q_chi2_lang_source,
    q_custdist_orders,
    q_dominant_period_1h,
    q_ed2_pairs_docs,
    q_holtwinters_1h,
    q_join_size_profile,
    q_keyword_tag_docs,
    q_lod_route_events,
    q_modularity_docs,
    q_multimodal_gif_decode,
    q_order_priority_check,
    q_ppr_docs,
    q_profit_by_nation_year,
    q_quantized_knn_recall,
    q_sales_opportunity_nations,
    q_twohop_docs,
    q_vocab_overlap_sources,
)
from .ext_sketches2 import (
    ASSORTATIVITY_SQL,
    HITS_SQL,
    KENDALL_SQL,
    KMV_SQL,
    LOG2HIST_SQL,
    ORDINAL_SQL,
    RECIPROCITY_SQL,
    q_assortativity_docs,
    q_hits_docs,
    q_kendall_pairs_1h,
    q_kmv_distinct_domains,
    q_log2hist_events,
    q_ordinal_patterns_15m,
    q_reciprocity_docs,
)

QUERIES = {
    "pages_extract": q_pages_extract,
    "page_rollup_15m": q_page_rollup_15m,
    "rollup_cascade_1h": q_rollup_cascade_1h,
    "rollup_cascade_1d": q_rollup_cascade_1d,
    "crawl_rate_1h": q_crawl_rate_1h,
    "gapfill_15m": q_gapfill_15m,
    "retention_trim_15m": q_retention_trim_15m,
    "backfill_15m": q_backfill_15m,
    "page_rollup_multi_15m": q_page_rollup_multi_15m,
    "topk_buckets_per_domain": q_topk_buckets_per_domain,
    "distinct_urls_per_domain": q_distinct_urls_per_domain,
    "compress_roundtrip_15m": q_compress_roundtrip_15m,
    "compaction_roundtrip_15m": q_compaction_roundtrip_15m,
    "topk_domains": q_topk_domains,
    "window_events_1h": q_window_events_1h,
    "sliding_events_1h_15m": q_sliding_events_1h_15m,
    "sessions_users": q_sessions_users,
    "rolling_stats_events": q_rolling_stats_events,
    "anomaly_events": q_anomaly_events,
    "everynth_events": q_everynth_events,
    "minmax_events": q_minmax_events,
    "lod_pyramid_events": q_lod_pyramid_events,
    "m4_events": q_m4_events,
    "lttb_events": q_lttb_events,
    "lttb_events_gapped_midpoint": q_lttb_events_gapped_midpoint,
    "minmaxlttb_events": q_minmaxlttb_events,
    "nanminmaxlttb_events": q_nanminmaxlttb_events,
    "nanminmax_events": q_nanminmax_events,
    "nanm4_events": q_nanm4_events,
    "minmax_events_withx": q_minmax_events_withx,
    "minmax_events_dt64bool": q_minmax_events_dt64bool,
    "minmaxlttb_bigseries": q_minmaxlttb_bigseries,
    "minmax_bigseries": q_minmax_bigseries,
    "m4_bigseries": q_m4_bigseries,
    "asof_enrich_events": q_asof_enrich_events,
    "resample_linear_15m": q_resample_linear_15m,
    "corr_pairs_15m": q_corr_pairs_15m,
    "threshold_crossings_events": q_threshold_crossings_events,
    "interarrival_quantiles_events": q_interarrival_quantiles_events,
    "twa_events_1h": q_twa_events_1h,
    "exact_quantiles_15m": q_exact_quantiles_15m,
    "seasonal_hod_events": q_seasonal_hod_events,
    "ewma_15m": q_ewma_15m,
    "hist_quantiles_1h": q_hist_quantiles_1h,
    "counter_rate_1h": q_counter_rate_1h,
    "orders_by_nation_broadcast": q_orders_by_nation_broadcast,
    "lineitem_pricing_summary": q_lineitem_pricing_summary,
    "session_label_events": q_session_label_events,
    "minmax_events_partitioned": q_minmax_events_partitioned,
    "dedup_exact_pages": q_dedup_exact_pages,
    "token_count_docs": q_token_count_docs,
    "span_dedup_docs": q_span_dedup_docs,
    "repetition_docs": q_repetition_docs,
    "near_dup_pages": q_near_dup_pages,
    "near_dup_clusters": q_near_dup_clusters,
    "simhash_docs": q_simhash_docs,
    "simhash_near_dup_pages": q_simhash_near_dup_pages,
    "ngram_jaccard_docs": q_ngram_jaccard_docs,
    "contamination_docs": q_contamination_docs,
    "vocab_docs": q_vocab_docs,
    "link_graph_docs": q_link_graph_docs,
    "pagerank_docs": q_pagerank_docs,
    "cusum_events": q_cusum_events,
    "postings_docs": q_postings_docs,
    "lag_corr_15m": q_lag_corr_15m,
    "normalize_docs": q_normalize_docs,
    "mad_outliers_15m": q_mad_outliers_15m,
    "canonical_urls_docs": q_canonical_urls_docs,
    "snapshot_diff_docs": q_snapshot_diff_docs,
    "holt_15m": q_holt_15m,
    "theil_sen_15m": q_theil_sen_15m,
    "shipping_priority": q_shipping_priority,
    "funnel_users": q_funnel_users,
    "cohort_retention_users": q_cohort_retention_users,
    "lang_source_pivot": q_lang_source_pivot,
    "burn_rate_alerts": q_burn_rate_alerts,
    "cooccurrence_docs": q_cooccurrence_docs,
    "bpe_merges_docs": q_bpe_merges_docs,
    "percentile_rank_15m": q_percentile_rank_15m,
    "bpe_tokenize_docs": q_bpe_tokenize_docs,
    "domain_concentration_docs": q_domain_concentration_docs,
    "winsorize_15m": q_winsorize_15m,
    "rolling_median_15m": q_rolling_median_15m,
    "upsert_latest_events": q_upsert_latest_events,
    "cms_heavy_hitters_docs": q_cms_heavy_hitters_docs,
    "zorder_zone_maps_events": q_zorder_zone_maps_events,
    "acf_15m": q_acf_15m,
    "cube_docs": q_cube_docs,
    "table_checksum_events": q_table_checksum_events,
    "event_transitions": q_event_transitions,
    "bloom_semi_join": q_bloom_semi_join,
    "triangle_counts_docs": q_triangle_counts_docs,
    "spearman_pairs_15m": q_spearman_pairs_15m,
    "profile_events": q_profile_events,
    "state_changes_events": q_state_changes_events,
    "kmeans_embeddings": q_kmeans_embeddings,
    "gap_profile_events": q_gap_profile_events,
    "purchase_impact_events": q_purchase_impact_events,
    "activity_coverage_events": q_activity_coverage_events,
    "skyline_orders": q_skyline_orders,
    "streaks_events": q_streaks_events,
    "calendar_rollup_month": q_calendar_rollup_month,
    "anti_join_lineitems": q_anti_join_lineitems,
    "group_samples_docs": q_group_samples_docs,
    "ols_slope_1h": q_ols_slope_1h,
    "weighted_median_lineitem": q_weighted_median_lineitem,
    "sax_events": q_sax_events,
    "gini_orders": q_gini_orders,
    "benford_orders": q_benford_orders,
    "kwic_docs": q_kwic_docs,
    "mann_whitney_events": q_mann_whitney_events,
    "sliding_wau_events": q_sliding_wau_events,
    "survivorship_users": q_survivorship_users,
    "embedding_covariance": q_embedding_covariance,
    "hybrid_rrf_docs": q_hybrid_rrf_docs,
    "centroid_classify_embeddings": q_centroid_classify_embeddings,
    "semantic_prune_embeddings": q_semantic_prune_embeddings,
    "mutual_nn_embeddings": q_mutual_nn_embeddings,
    "knn_outliers_embeddings": q_knn_outliers_embeddings,
    "seasonal_decompose_1h": q_seasonal_decompose_1h,
    "hysteresis_alerts_events": q_hysteresis_alerts_events,
    "coverage_sample_docs": q_coverage_sample_docs,
    "term_drift_docs": q_term_drift_docs,
    "session_paths_events": q_session_paths_events,
    "heatmap_tiles_events": q_heatmap_tiles_events,
    "classify_confusion_embeddings": q_classify_confusion_embeddings,
    "local_supplier_volume": q_local_supplier_volume,
    "promo_share_month": q_promo_share_month,
    "cluster_ari_embeddings": q_cluster_ari_embeddings,
    "lttb_fidelity_events": q_lttb_fidelity_events,
    "assoc_rules_events": q_assoc_rules_events,
    "haar_energy_15m": q_haar_energy_15m,
    "attribution_events": q_attribution_events,
    "amoc_changepoint_15m": q_amoc_changepoint_15m,
    "boolean_search_docs": q_boolean_search_docs,
    "top_movers_events": q_top_movers_events,
    "rfm_segments_users": q_rfm_segments_users,
    "bigram_familiarity_docs": q_bigram_familiarity_docs,
    "json_props_events": q_json_props_events,
    "conversion_latency_users": q_conversion_latency_users,
    "ks_test_events": q_ks_test_events,
    "markov_baseline_events": q_markov_baseline_events,
    "gapfill_linear_15m": q_gapfill_linear_15m,
    "welch_t_events": q_welch_t_events,
    "fleet_bands_1h": q_fleet_bands_1h,
    "tier_consistency_events": q_tier_consistency_events,
    "ed1_pairs_docs": q_ed1_pairs_docs,
    "graph_degree_stats_docs": q_graph_degree_stats_docs,
    "sax_motifs_events": q_sax_motifs_events,
    "ohlc_15m": q_ohlc_15m,
    "ltv_curve_users": q_ltv_curve_users,
    "clamped_balance_events": q_clamped_balance_events,
    "token_bucket_events": q_token_bucket_events,
    "rdp_simplify_15m": q_rdp_simplify_15m,
    "vw_simplify_15m": q_vw_simplify_15m,
    "deadband_events": q_deadband_events,
    "incident_coverage_events": q_incident_coverage_events,
    "backtest_naive_1h": q_backtest_naive_1h,
    "rate_limit_users": q_rate_limit_users,
    "readability_docs": q_readability_docs,
    "isotonic_fit_1h": q_isotonic_fit_1h,
    "mmr_select_embeddings": q_mmr_select_embeddings,
    "kalman_1h": q_kalman_1h,
    "expectations_events": q_expectations_events,
    "huffman_code_docs": q_huffman_code_docs,
    "dtw_pairs_1d": q_dtw_pairs_1d,
    "dbscan_embeddings": q_dbscan_embeddings,
    "interval_union_events": q_interval_union_events,
    "experiment_readout_users": q_experiment_readout_users,
    "kcore_docs": q_kcore_docs,
    "weighted_sample_docs": q_weighted_sample_docs,
    "bfs_hops_docs": q_bfs_hops_docs,
    "churn_features_users": q_churn_features_users,
    "ips_policy_eval_events": q_ips_policy_eval_events,
    "returned_revenue_customers": q_returned_revenue_customers,
    "quantile_normalize_1d": q_quantile_normalize_1d,
    "pmi_pairs_docs": q_pmi_pairs_docs,
    "class_terms_docs": q_class_terms_docs,
    "langid_confusion_docs": q_langid_confusion_docs,
    "busday_rollup_orders": q_busday_rollup_orders,
    "clustering_coeff_docs": q_clustering_coeff_docs,
    "lateness_accounting_events": q_lateness_accounting_events,
    "decision_stump_users": q_decision_stump_users,
    "mann_kendall_15m": q_mann_kendall_15m,
    "page_hinkley_15m": q_page_hinkley_15m,
    "covisit_users": q_covisit_users,
    "boxplot_15m": q_boxplot_15m,
    "median_of_means_15m": q_median_of_means_15m,
    "discord_1h": q_discord_1h,
    "motif_1h": q_motif_1h,
    "label_propagation_docs": q_label_propagation_docs,
    "burstiness_events": q_burstiness_events,
    "sweepline_audit_events": q_sweepline_audit_events,
    "training_order_docs": q_training_order_docs,
    "url_blocklist_docs": q_url_blocklist_docs,
    "embedding_near_dups_exact": q_embedding_near_dups_exact,
    "domain_cap_docs": q_domain_cap_docs,
    "mixture_order_docs": q_mixture_order_docs,
    "incremental_dedup_docs": q_incremental_dedup_docs,
    "minhash_docs": q_minhash_docs,
    "lang_id_docs": q_lang_id_docs,
    "quality_docs": q_quality_docs,
    "token_stats_docs": q_token_stats_docs,
    "fingerprint_docs": q_fingerprint_docs,
    "pii_scrub_docs": q_pii_scrub_docs,
    "tfidf_terms": q_tfidf_terms,
    "gzip_text_docs": q_gzip_text_docs,
    "warc_extract_docs": q_warc_extract_docs,
    "chunk_docs": q_chunk_docs,
    "pack_sequences_docs": q_pack_sequences_docs,
    "sample_docs": q_sample_docs,
    "sample_stratified_docs": q_sample_stratified_docs,
    "train_split_docs": q_train_split_docs,
    "token_count_bpeish": q_token_count_bpeish,
    "embedding_near_dups": q_embedding_near_dups,
    "knn_embeddings": q_knn_embeddings,
    "knn_ivf_embeddings": q_knn_ivf_embeddings,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    "multimodal_wav_decode": q_multimodal_wav_decode,
    "multimodal_mulaw_decode": q_multimodal_mulaw_decode,
    "multimodal_png_decode": q_multimodal_png_decode,
    "multimodal_jpeg_decode": q_multimodal_jpeg_decode,
    "corpus_curation": q_corpus_curation,
    "chunkstore_downsample": q_chunkstore_downsample,
}

ORACLE_SQL = {
    "pages_extract": f"""
        WITH {PAGES_CTE}
        SELECT url, ts_us, text, lang FROM pages
    """,
    "page_rollup_15m": _ROLLUP_SQL.format(cte=PAGES_CTE, w=W15M),
    "rollup_cascade_1h": _ROLLUP_SQL.format(cte=PAGES_CTE, w=W1H),
    "rollup_cascade_1d": _ROLLUP_SQL.format(cte=PAGES_CTE, w=W1D),
    "crawl_rate_1h": f"""
        WITH {PAGES_CTE}
        SELECT series_id, (ts_us // {W1H}) * {W1H} AS bucket, count(*) AS n
        FROM pages GROUP BY 1, 2
    """,
    "topk_domains": f"""
        WITH {PAGES_CTE}
        SELECT series_id, CAST(sum(y) AS BIGINT) AS sum_chars
        FROM pages GROUP BY 1
        ORDER BY sum_chars DESC, series_id LIMIT 5
    """,
    "backfill_15m": _ROLLUP_SQL.format(cte=PAGES_CTE, w=W15M),
    "page_rollup_multi_15m": f"""
        WITH {PAGES_CTE}
        SELECT series_id,
               (ts_us // {W15M}) * {W15M} AS bucket,
               min(y) AS min_len, max(y) AS max_len,
               CAST(sum(y) AS BIGINT) AS sum_len,
               min(length(text) - length(replace(text, ' ', '')) + 1) AS min_tok,
               max(length(text) - length(replace(text, ' ', '')) + 1) AS max_tok,
               CAST(sum(length(text) - length(replace(text, ' ', '')) + 1)
                    AS BIGINT) AS sum_tok,
               count(*) AS n
        FROM pages GROUP BY 1, 2
    """,
    "topk_buckets_per_domain": f"""
        WITH {PAGES_CTE},
        r AS (
            SELECT series_id, (ts_us // {W15M}) * {W15M} AS bucket,
                   count(*) AS n
            FROM pages GROUP BY 1, 2
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY series_id
                                         ORDER BY n DESC, bucket) AS rk
            FROM r
        )
        SELECT series_id, bucket, n FROM ranked WHERE rk <= 3
    """,
    "retention_trim_15m": f"""
        WITH {PAGES_CTE},
        r AS (
            SELECT series_id,
                   (ts_us // {W15M}) * {W15M} AS bucket,
                   min(y) AS min_y, max(y) AS max_y,
                   CAST(sum(y) AS BIGINT) AS sum_y, count(*) AS n,
                   CAST(sum(y) AS DOUBLE) / count(*) AS mean_y
            FROM pages GROUP BY 1, 2
        )
        SELECT * FROM r
        WHERE bucket >= (SELECT max(bucket) FROM r) + {W15M} - {3 * W1H + W15M}
    """,
    "gapfill_15m": f"""
        WITH {PAGES_CTE},
        r AS (
            SELECT series_id, (ts_us // {W15M}) * {W15M} AS bucket, count(*) AS n
            FROM pages GROUP BY 1, 2
        ),
        b AS (SELECT series_id, min(bucket) mn, max(bucket) mx FROM r GROUP BY 1),
        g AS (SELECT series_id, unnest(range(mn, mx + 1, {W15M})) AS bucket FROM b)
        SELECT g.series_id, g.bucket,
               COALESCE(r.n, 0) AS n,
               r.series_id IS NULL AS is_gap
        FROM g LEFT JOIN r ON g.series_id = r.series_id AND g.bucket = r.bucket
    """,
    "compress_roundtrip_15m": _ROLLUP_SQL.format(cte=PAGES_CTE, w=W15M),
    "compaction_roundtrip_15m": _ROLLUP_SQL.format(cte=PAGES_CTE, w=W15M),
    # exact side hash-verified; TRUE pins the sketch's <=6% accuracy band
    "distinct_urls_per_domain": f"""
        WITH {PAGES_CTE}
        SELECT series_id AS domain,
               count(DISTINCT url) AS exact_distinct,
               TRUE AS est_in_band
        FROM pages GROUP BY 1
    """,
    "window_events_1h": f"""
        SELECT event_type,
               (epoch_us(ts) // {W1H}) * {W1H} AS bucket,
               min(value) AS min_v,
               max(value) AS max_v,
               count(*) AS n,
               CAST(round(sum(value) * 100, 0) AS BIGINT) AS sum_cents
        FROM events GROUP BY 1, 2
    """,
    "sliding_events_1h_15m": f"""
        SELECT event_type,
               (epoch_us(ts) // {W15M}) * {W15M} - j.j * {W15M} AS bucket,
               min(value) AS min_v,
               max(value) AS max_v,
               count(*) AS n,
               CAST(round(sum(value) * 100, 0) AS BIGINT) AS sum_cents
        FROM events, generate_series(0, 3) j(j)
        GROUP BY 1, 2
    """,
    "sessions_users": f"""
        WITH o AS (
            SELECT user_id, epoch_us(ts) AS t, event_id FROM events
        ),
        s AS MATERIALIZED (
            SELECT user_id, t, event_id,
                   CASE WHEN lag(t) OVER w IS NULL
                             OR t - lag(t) OVER w > {30 * 60 * US}
                        THEN 1 ELSE 0 END AS brk
            FROM o
            WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
        ),
        t2 AS (
            SELECT user_id, t,
                   SUM(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sess
            FROM s
        )
        SELECT user_id AS series_id,
               min(t) AS session_start,
               max(t) AS session_end,
               count(*) AS n_events
        FROM t2 GROUP BY user_id, sess
    """,
    "everynth_events": f"""
        WITH s AS MATERIALIZED (
            SELECT event_type, event_id,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY ts, event_id) - 1 AS rn,
                   count(*) OVER (PARTITION BY event_type) AS cnt
            FROM events
        )
        SELECT s.event_type, s.event_id
        FROM s JOIN generate_series(0, 49) k(k)
          ON s.rn = CAST(FLOOR(k.k * GREATEST(1.0, s.cnt / 50.0)) AS BIGINT)
        WHERE k.k * GREATEST(1.0, s.cnt / 50.0) < s.cnt - 0.1
    """,
    # MinMax/M4 bin-exact oracles: nb equal-ish index bins whose boundaries
    # replicate numpy's searchsorted-over-linspace (floor(i*((n-1)/nb))+1),
    # argmin/argmax with FIRST-occurrence tie-breaking via min(rn) over the
    # rows attaining the bin extreme.
    "lod_pyramid_events": _lod_pyramid_sql(),
    "minmax_events": """
        WITH s AS MATERIALIZED (
            SELECT event_type, event_id, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY ts, event_id) - 1 AS rn,
                   count(*) OVER (PARTITION BY event_type) AS cnt
            FROM events
        ),
        binned AS MATERIALIZED (
            SELECT s.*, b.i,
                   CASE WHEN b.i = 0 THEN 0
                        ELSE CAST(FLOOR(b.i * ((s.cnt - 1.0) / 10)) AS BIGINT) + 1
                   END AS lo,
                   CASE WHEN b.i = 9 THEN s.cnt
                        ELSE CAST(FLOOR((b.i + 1) * ((s.cnt - 1.0) / 10)) AS BIGINT) + 1
                   END AS hi
            FROM s JOIN generate_series(0, 9) b(i) ON TRUE
        ),
        inbin AS MATERIALIZED (SELECT * FROM binned WHERE rn >= lo AND rn < hi),
        ext AS MATERIALIZED (
            SELECT event_type, i,
                   min(value) AS mn, max(value) AS mx
            FROM inbin GROUP BY 1, 2
        ),
        sel AS (
            SELECT ib.event_type,
                   min(ib.rn) FILTER (WHERE ib.value = e.mn) AS rn_min,
                   min(ib.rn) FILTER (WHERE ib.value = e.mx) AS rn_max
            FROM inbin ib JOIN ext e ON ib.event_type = e.event_type AND ib.i = e.i
            GROUP BY ib.event_type, ib.i
        ),
        picked AS (
            SELECT event_type, rn_min AS rn FROM sel
            UNION
            SELECT event_type, rn_max AS rn FROM sel
        )
        SELECT s.event_type, s.event_id, s.value
        FROM s JOIN picked p ON s.event_type = p.event_type AND s.rn = p.rn
    """,
    "m4_events": """
        WITH s AS MATERIALIZED (
            SELECT event_type, event_id, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY ts, event_id) - 1 AS rn,
                   count(*) OVER (PARTITION BY event_type) AS cnt
            FROM events
        ),
        binned AS MATERIALIZED (
            SELECT s.*, b.i,
                   CASE WHEN b.i = 0 THEN 0
                        ELSE CAST(FLOOR(b.i * ((s.cnt - 1.0) / 5)) AS BIGINT) + 1
                   END AS lo,
                   CASE WHEN b.i = 4 THEN s.cnt
                        ELSE CAST(FLOOR((b.i + 1) * ((s.cnt - 1.0) / 5)) AS BIGINT) + 1
                   END AS hi
            FROM s JOIN generate_series(0, 4) b(i) ON TRUE
        ),
        inbin AS MATERIALIZED (SELECT * FROM binned WHERE rn >= lo AND rn < hi),
        ext AS MATERIALIZED (
            SELECT event_type, i, min(rn) AS first_rn, max(rn) AS last_rn,
                   min(value) AS mn, max(value) AS mx
            FROM inbin GROUP BY 1, 2
        ),
        sel AS (
            SELECT ib.event_type, ib.i,
                   any_value(e.first_rn) AS first_rn,
                   any_value(e.last_rn) AS last_rn,
                   min(ib.rn) FILTER (WHERE ib.value = e.mn) AS rn_min,
                   min(ib.rn) FILTER (WHERE ib.value = e.mx) AS rn_max
            FROM inbin ib JOIN ext e ON ib.event_type = e.event_type AND ib.i = e.i
            GROUP BY ib.event_type, ib.i
        ),
        picked AS (            -- duplicates retained (M4 keeps multiplicity)
            SELECT event_type, first_rn AS rn FROM sel
            UNION ALL SELECT event_type, rn_min FROM sel
            UNION ALL SELECT event_type, rn_max FROM sel
            UNION ALL SELECT event_type, last_rn FROM sel
        )
        SELECT s.event_type, s.event_id, s.value
        FROM s JOIN picked p ON s.event_type = p.event_type AND s.rn = p.rn
    """,
    # exact index-selection oracles for the sequential kernels: the LTTB
    # bucket loop replayed as a recursive CTE (same f64 operation order,
    # exact integer bucket sums, argmax == max(struct(area, -idx)))
    "lttb_events": _lttb_sql(50),
    "lttb_events_gapped_midpoint": _lttb_gapped_midpoint_sql(40),
    "minmaxlttb_events": _minmaxlttb_sql(20, 4, None, True),
    "nanminmaxlttb_events": _minmaxlttb_sql(20, 4, 37, False),
    "nanminmax_events": _nanminmax_sql(20, 37),
    "nanm4_events": _nanm4_sql(20, 37),
    "minmaxlttb_bigseries": _bigseries_sql(40, 4),
    "minmax_bigseries": _minmax_bigseries_sql(40),
    "m4_bigseries": _m4_bigseries_sql(40),
    "asof_enrich_events": ASOF_ENRICH_SQL,
    "resample_linear_15m": RESAMPLE_SQL,
    "corr_pairs_15m": CORR_PAIRS_SQL,
    "threshold_crossings_events": THRESHOLD_CROSSINGS_SQL,
    "interarrival_quantiles_events": INTERARRIVAL_SQL,
    "twa_events_1h": TWA_SQL,
    "exact_quantiles_15m": EXACT_QUANTILES_SQL,
    "seasonal_hod_events": SEASONAL_HOD_SQL,
    "ewma_15m": EWMA_SQL,
    "hist_quantiles_1h": HIST_QUANTILES_SQL,
    "counter_rate_1h": COUNTER_RATE_SQL,
    "orders_by_nation_broadcast": ORDERS_BY_NATION_SQL,
    "lineitem_pricing_summary": LINEITEM_SUMMARY_SQL,
    "session_label_events": SESSION_LABEL_SQL,
    # with-x + gaps: bins equidistant in x-value (searchsorted-over-linspace
    # replayed as "count of interior boundaries strictly below x"), empty
    # bins vanish, <=2-point bins pass through
    "minmax_events_withx": f"""
        WITH e AS (
            SELECT event_type, event_id, epoch_us(ts) AS x,
                   CAST(round(value * 100) AS BIGINT) AS cy
            FROM events
            WHERE (epoch_us(ts) // {86_400_000_000}) % 9 < 4
        ),
        s AS MATERIALIZED (
            SELECT *, row_number() OVER (PARTITION BY event_type
                                         ORDER BY x, event_id) - 1 AS rn,
                   min(x) OVER (PARTITION BY event_type) AS x0,
                   max(x) OVER (PARTITION BY event_type) AS xn
            FROM e
        ),
        assigned AS MATERIALIZED (
            SELECT s.event_type, s.event_id, s.x, s.cy, s.rn,
                   count(k.k) AS bin
            FROM s LEFT JOIN generate_series(1, 9) k(k)
              ON CAST(s.x0 AS DOUBLE)
                 + k.k * ((CAST(s.xn AS DOUBLE)
                           - CAST(s.x0 AS DOUBLE)) / 10.0)
                 < CAST(s.x AS DOUBLE)
            GROUP BY ALL
        ),
        ext AS MATERIALIZED (
            SELECT event_type, bin, count(*) AS nbin,
                   min(cy) AS mn, max(cy) AS mx
            FROM assigned GROUP BY 1, 2
        ),
        sel AS (
            SELECT a.event_type, a.bin,
                   min(a.rn) FILTER (WHERE a.cy = e.mn) AS rn_min,
                   min(a.rn) FILTER (WHERE a.cy = e.mx) AS rn_max
            FROM assigned a JOIN ext e ON a.event_type = e.event_type
                                      AND a.bin = e.bin
            WHERE e.nbin > 2
            GROUP BY 1, 2
        ),
        picked AS (
            SELECT event_type, rn_min AS rn FROM sel
            UNION SELECT event_type, rn_max FROM sel
            UNION SELECT a.event_type, a.rn
                  FROM assigned a JOIN ext e ON a.event_type = e.event_type
                                            AND a.bin = e.bin
                  WHERE e.nbin <= 2
        )
        SELECT a.event_type, a.event_id, a.cy AS cents
        FROM assigned a
        JOIN picked p ON a.event_type = p.event_type AND a.rn = p.rn
    """,
    # dtype-view row: x = raw timestamp (i64 view), y = bool (i8 view);
    # same equidistant x-value binning replay as minmax_events_withx but
    # over the FULL series and a boolean y (false < true ordering == the
    # kernel's i8 view ordering; first-occurrence ties both sides)
    "minmax_events_dt64bool": """
        WITH e AS (
            SELECT event_type, event_id, epoch_us(ts) AS x,
                   (value >= 0) AS flag
            FROM events
        ),
        s AS MATERIALIZED (
            SELECT *, row_number() OVER (PARTITION BY event_type
                                         ORDER BY x, event_id) - 1 AS rn,
                   min(x) OVER (PARTITION BY event_type) AS x0,
                   max(x) OVER (PARTITION BY event_type) AS xn
            FROM e
        ),
        assigned AS MATERIALIZED (
            SELECT s.event_type, s.event_id, s.x, s.flag, s.rn,
                   count(k.k) AS bin
            FROM s LEFT JOIN generate_series(1, 9) k(k)
              ON CAST(s.x0 AS DOUBLE)
                 + k.k * ((CAST(s.xn AS DOUBLE)
                           - CAST(s.x0 AS DOUBLE)) / 10.0)
                 < CAST(s.x AS DOUBLE)
            GROUP BY ALL
        ),
        ext AS MATERIALIZED (
            SELECT event_type, bin, count(*) AS nbin,
                   min(flag) AS mn, max(flag) AS mx
            FROM assigned GROUP BY 1, 2
        ),
        sel AS (
            SELECT a.event_type, a.bin,
                   min(a.rn) FILTER (WHERE a.flag = e.mn) AS rn_min,
                   min(a.rn) FILTER (WHERE a.flag = e.mx) AS rn_max
            FROM assigned a JOIN ext e ON a.event_type = e.event_type
                                      AND a.bin = e.bin
            WHERE e.nbin > 2
            GROUP BY 1, 2
        ),
        picked AS (
            SELECT event_type, rn_min AS rn FROM sel
            UNION SELECT event_type, rn_max FROM sel
            UNION SELECT a.event_type, a.rn
                  FROM assigned a JOIN ext e ON a.event_type = e.event_type
                                            AND a.bin = e.bin
                  WHERE e.nbin <= 2
        )
        SELECT a.event_type, a.event_id, a.flag
        FROM assigned a
        JOIN picked p ON a.event_type = p.event_type AND a.rn = p.rn
    """,
    "dedup_exact_pages": f"""
        WITH {PAGES_CTE}
        SELECT md5(text) AS text_md5,
               arg_min(url, ts_us) AS url,
               min(ts_us) AS first_ts_us
        FROM pages GROUP BY 1
    """,
    "span_dedup_docs": SPAN_DEDUP_SQL,
    "repetition_docs": REPETITION_SQL,
    "token_count_docs": """
        SELECT doc_id,
               length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
        FROM documents
    """,
    "near_dup_pages": f"""
        WITH {PAGES_CTE},
        p AS (SELECT url || '#' || CAST(ts_us AS VARCHAR) AS pid, text FROM pages)
        SELECT x.pid AS a, y.pid AS b, 1.0 AS jaccard
        FROM p x JOIN p y ON x.text = y.text AND x.pid < y.pid
    """,
    # pair SQL + recursive transitive closure: component = min reachable pid
    "near_dup_clusters": f"""
        WITH RECURSIVE {PAGES_CTE},
        p AS MATERIALIZED (
            SELECT url || '#' || CAST(ts_us AS VARCHAR) AS pid, text
            FROM pages
        ),
        ed AS MATERIALIZED (
            SELECT x.pid AS src, y.pid AS dst
            FROM p x JOIN p y ON x.text = y.text AND x.pid <> y.pid
        ),
        reach(node, lbl) AS (
            SELECT DISTINCT src, src FROM ed
            UNION
            SELECT ed.dst, r.lbl FROM reach r JOIN ed ON ed.src = r.node
        )
        SELECT node, min(lbl) AS component FROM reach GROUP BY node
    """,
    # quality panel: exact ASCII re-statement of quality_batch —
    # n_tokens counts non-empty whitespace-split tokens, ratios divide by
    # max(1, denominator) in f64 (identical rounding: one division)
    "quality_docs": """
        WITH t AS (
            SELECT doc_id, text, length(text) AS n_chars,
                   list_filter(string_split_regex(text, '\\s+'),
                               x -> x <> '') AS toks
            FROM documents
        )
        SELECT doc_id, n_chars,
               len(toks) AS n_tokens,
               CAST(len(list_filter(toks, x -> x IN
                    ('the','and','of','to','a','in','is','it','that','for')))
                    AS DOUBLE) / greatest(1, len(toks)) AS stopword_ratio,
               CAST(length(regexp_replace(text, '[[:alnum:][:space:]]', '',
                    'g')) AS DOUBLE) / greatest(1, n_chars) AS punct_ratio,
               CAST(length(regexp_replace(text, '[^A-Z]', '', 'g'))
                    AS DOUBLE) / greatest(1, n_chars) AS upper_ratio
        FROM t
    """,
    "token_stats_docs": """
        SELECT doc_id,
               length(text) AS n_chars,
               length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
               CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / (length(text) - length(replace(text, ' ', '')) + 1)
                 AS mean_token_len
        FROM documents
    """,
    "lang_id_docs": _langid_sql(),
    # rollup -> (chunk store roundtrip is lossless, so the oracle skips it)
    # per-series with-x MinMax over (bucket, sum_y): x-value bins via
    # boundary counts, <=2-point passthrough, empty bins vanish, unique'd
    "chunkstore_downsample": f"""
        WITH {PAGES_CTE},
        r AS MATERIALIZED (
            SELECT series_id, (ts_us // {W15M}) * {W15M} AS x,
                   CAST(sum(y) AS BIGINT) AS cy
            FROM pages GROUP BY 1, 2
        ),
        s AS MATERIALIZED (
            SELECT *, row_number() OVER (PARTITION BY series_id
                                         ORDER BY x) - 1 AS rn,
                   min(x) OVER (PARTITION BY series_id) AS x0,
                   max(x) OVER (PARTITION BY series_id) AS xn
            FROM r
        ),
        assigned AS MATERIALIZED (
            SELECT s.series_id, s.x, s.cy, s.rn, count(k.k) AS bin
            FROM s LEFT JOIN generate_series(1, 3) k(k)
              ON CAST(s.x0 AS DOUBLE)
                 + k.k * ((CAST(s.xn AS DOUBLE)
                           - CAST(s.x0 AS DOUBLE)) / 4.0)
                 < CAST(s.x AS DOUBLE)
            GROUP BY ALL
        ),
        ext AS MATERIALIZED (
            SELECT series_id, bin, count(*) AS nbin,
                   min(cy) AS mn, max(cy) AS mx
            FROM assigned GROUP BY 1, 2
        ),
        sel AS (
            SELECT a.series_id, a.bin,
                   min(a.rn) FILTER (WHERE a.cy = e.mn) AS rn_min,
                   min(a.rn) FILTER (WHERE a.cy = e.mx) AS rn_max
            FROM assigned a JOIN ext e ON a.series_id = e.series_id
                                      AND a.bin = e.bin
            WHERE e.nbin > 2
            GROUP BY 1, 2
        ),
        picked AS (
            SELECT series_id, rn_min AS rn FROM sel
            UNION SELECT series_id, rn_max FROM sel
            UNION SELECT a.series_id, a.rn
                  FROM assigned a JOIN ext e ON a.series_id = e.series_id
                                            AND a.bin = e.bin
                  WHERE e.nbin <= 2
        )
        SELECT a.series_id, a.x AS bucket, a.cy AS sum_y
        FROM assigned a
        JOIN picked p ON a.series_id = p.series_id AND a.rn = p.rn
    """,
    "corpus_curation": _curation_sql(),
    "simhash_docs": _simhash_sql(),
    "simhash_near_dup_pages": _simhash_neardup_sql(3),
    # the quadratic definition the prefix-filter join must EQUAL, restated
    # as an inverted-index join (pairs at J >= 0.5 share >= 1 gram, so the
    # gram equi-join finds every qualifying pair; n_inter >= t*n_union is
    # the same double comparison the Ray verify runs)
    "ngram_jaccard_docs": """
        WITH g AS MATERIALIZED (
            SELECT doc_id, unnest(list_distinct(list_transform(
                       range(1, length(text) - 3),
                       i -> substring(text, i, 5)))) AS gram
            FROM documents
        ),
        sz AS MATERIALIZED (
            SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id
        ),
        inter AS MATERIALIZED (
            SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_inter
            FROM g x JOIN g y ON x.gram = y.gram AND x.doc_id < y.doc_id
            GROUP BY x.doc_id, y.doc_id
        )
        SELECT i.a, i.b, i.n_inter,
               sa.n + sb.n - i.n_inter AS n_union,
               CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter)
                    AS jaccard
        FROM inter i
        JOIN sz sa ON sa.doc_id = i.a
        JOIN sz sb ON sb.doc_id = i.b
        WHERE CAST(i.n_inter AS DOUBLE)
              >= 0.5 * (sa.n + sb.n - i.n_inter)
    """,
    "contamination_docs": _contamination_sql(),
    "vocab_docs": VOCAB_SQL,
    "link_graph_docs": LINK_GRAPH_SQL,
    "pagerank_docs": PAGERANK_SQL,
    "cusum_events": CUSUM_SQL,
    "postings_docs": POSTINGS_SQL,
    "lag_corr_15m": LAG_CORR_SQL,
    "normalize_docs": NORMALIZE_SQL,
    "mad_outliers_15m": MAD_OUTLIERS_SQL,
    "canonical_urls_docs": CANONICAL_URLS_SQL,
    "snapshot_diff_docs": SNAPSHOT_DIFF_SQL,
    "holt_15m": HOLT_SQL,
    "theil_sen_15m": THEIL_SEN_SQL,
    "shipping_priority": SHIPPING_PRIORITY_SQL,
    "funnel_users": FUNNEL_SQL,
    "cohort_retention_users": COHORT_SQL,
    "lang_source_pivot": LANG_PIVOT_SQL,
    "burn_rate_alerts": BURN_RATE_SQL,
    "cooccurrence_docs": COOCCURRENCE_SQL,
    "bpe_merges_docs": BPE_SQL,
    "percentile_rank_15m": PERCENTILE_RANK_SQL,
    "bpe_tokenize_docs": BPE_TOKENIZE_SQL,
    "domain_concentration_docs": DOMAIN_CONCENTRATION_SQL,
    "winsorize_15m": WINSORIZE_SQL,
    "rolling_median_15m": ROLLING_MEDIAN_SQL,
    "upsert_latest_events": UPSERT_LATEST_SQL,
    "cms_heavy_hitters_docs": CMS_SQL,
    "zorder_zone_maps_events": ZORDER_SQL,
    "acf_15m": ACF_SQL,
    "cube_docs": CUBE_SQL,
    "table_checksum_events": TABLE_CHECKSUM_SQL,
    "event_transitions": EVENT_TRANSITIONS_SQL,
    "bloom_semi_join": BLOOM_SQL,
    "triangle_counts_docs": TRIANGLES_SQL,
    "spearman_pairs_15m": SPEARMAN_SQL,
    "profile_events": PROFILE_SQL,
    "state_changes_events": STATE_CHANGES_SQL,
    "kmeans_embeddings": KMEANS_SQL,
    "gap_profile_events": GAP_PROFILE_SQL,
    "purchase_impact_events": PURCHASE_IMPACT_SQL,
    "activity_coverage_events": ACTIVITY_COVERAGE_SQL,
    "skyline_orders": SKYLINE_ORDERS_SQL,
    "streaks_events": STREAKS_SQL,
    "calendar_rollup_month": CALENDAR_ROLLUP_SQL,
    "anti_join_lineitems": ANTI_JOIN_SQL,
    "group_samples_docs": GROUP_SAMPLES_SQL,
    "ols_slope_1h": OLS_SLOPE_SQL,
    "weighted_median_lineitem": WEIGHTED_MEDIAN_SQL,
    "sax_events": SAX_SQL,
    "gini_orders": GINI_SQL,
    "benford_orders": BENFORD_SQL,
    "kwic_docs": KWIC_SQL,
    "mann_whitney_events": MANN_WHITNEY_SQL,
    "sliding_wau_events": SLIDING_WAU_SQL,
    "survivorship_users": SURVIVORSHIP_SQL,
    "embedding_covariance": EMBEDDING_COV_SQL,
    "hybrid_rrf_docs": HYBRID_RRF_SQL,
    "centroid_classify_embeddings": CENTROID_CLASSIFY_SQL,
    "mutual_nn_embeddings": MUTUAL_NN_SQL,
    "knn_outliers_embeddings": KNN_OUTLIERS_SQL,
    "seasonal_decompose_1h": SEASONAL_DECOMP_SQL,
    "hysteresis_alerts_events": HYSTERESIS_SQL,
    "coverage_sample_docs": COVERAGE_SQL,
    "term_drift_docs": TERM_DRIFT_SQL,
    "session_paths_events": SESSION_PATHS_SQL,
    "heatmap_tiles_events": HEATMAP_TILES_SQL,
    "local_supplier_volume": LOCAL_SUPPLIER_SQL,
    "promo_share_month": PROMO_SHARE_SQL,
    "lttb_fidelity_events": _lttb_fidelity_sql(50),
    "assoc_rules_events": ASSOC_RULES_SQL,
    "haar_energy_15m": HAAR_ENERGY_SQL,
    "attribution_events": ATTRIBUTION_SQL,
    "amoc_changepoint_15m": AMOC_SQL,
    "boolean_search_docs": BOOLEAN_SEARCH_SQL,
    "top_movers_events": TOP_MOVERS_SQL,
    "rfm_segments_users": RFM_SQL,
    "bigram_familiarity_docs": BIGRAM_FAM_SQL,
    "json_props_events": JSON_PROPS_SQL,
    "conversion_latency_users": CONVERSION_LATENCY_SQL,
    "ks_test_events": KS_TEST_SQL,
    "markov_baseline_events": MARKOV_BASELINE_SQL,
    "gapfill_linear_15m": GAPFILL_LINEAR_SQL,
    "welch_t_events": WELCH_T_SQL,
    "fleet_bands_1h": FLEET_BANDS_SQL,
    "tier_consistency_events": TIER_CONSISTENCY_SQL,
    "ed1_pairs_docs": ED1_PAIRS_SQL,
    "graph_degree_stats_docs": GRAPH_DEGREE_SQL,
    "ohlc_15m": OHLC_SQL,
    "ltv_curve_users": LTV_CURVE_SQL,
    "clamped_balance_events": CLAMPED_BALANCE_SQL,
    "token_bucket_events": TOKEN_BUCKET_SQL,
    "rdp_simplify_15m": RDP_SIMPLIFY_SQL,
    "vw_simplify_15m": VW_SIMPLIFY_SQL,
    "deadband_events": DEADBAND_SQL,
    "incident_coverage_events": INCIDENT_COVERAGE_SQL,
    "backtest_naive_1h": BACKTEST_NAIVE_SQL,
    "rate_limit_users": RATE_LIMIT_SQL,
    "readability_docs": READABILITY_SQL,
    "isotonic_fit_1h": ISOTONIC_SQL,
    "mmr_select_embeddings": MMR_SELECT_SQL,
    "kalman_1h": KALMAN_SQL,
    "expectations_events": EXPECTATIONS_SQL,
    "huffman_code_docs": HUFFMAN_SQL,
    "dtw_pairs_1d": DTW_PAIRS_SQL,
    "dbscan_embeddings": DBSCAN_SQL,
    "interval_union_events": INTERVAL_UNION_SQL,
    "experiment_readout_users": EXPERIMENT_SQL,
    "kcore_docs": KCORE_SQL,
    "weighted_sample_docs": WEIGHTED_SAMPLE_SQL,
    "bfs_hops_docs": BFS_HOPS_SQL,
    "churn_features_users": CHURN_FEATURES_SQL,
    "ips_policy_eval_events": IPS_POLICY_SQL,
    "returned_revenue_customers": RETURNED_REVENUE_SQL,
    "quantile_normalize_1d": QUANTILE_NORMALIZE_SQL,
    "pmi_pairs_docs": PMI_PAIRS_SQL,
    "class_terms_docs": CLASS_TERMS_SQL,
    "langid_confusion_docs": _langid_confusion_sql(),
    "busday_rollup_orders": BUSDAY_ROLLUP_SQL,
    "clustering_coeff_docs": CLUSTERING_COEFF_SQL,
    "lateness_accounting_events": LATENESS_SQL,
    "decision_stump_users": DECISION_STUMP_SQL,
    "mann_kendall_15m": MANN_KENDALL_SQL,
    "page_hinkley_15m": PAGE_HINKLEY_SQL,
    "covisit_users": COVISIT_SQL,
    "boxplot_15m": BOXPLOT_SQL,
    "median_of_means_15m": MEDIAN_OF_MEANS_SQL,
    "discord_1h": DISCORD_SQL,
    "motif_1h": MOTIF_SQL,
    "label_propagation_docs": LABEL_PROP_SQL,
    "burstiness_events": BURSTINESS_SQL,
    "sweepline_audit_events": SWEEPLINE_SQL,
    "sax_motifs_events": """
WITH base AS ({sax}),
m0 AS (
    SELECT series_id, sax,
           unnest(range(1, length(sax) - 1)) AS i
    FROM base
),
m AS (SELECT series_id, substr(sax, CAST(i AS INT), 3) AS g FROM m0),
c AS (SELECT series_id, g, count(*) AS c FROM m GROUP BY 1, 2),
r AS (
    SELECT series_id, g, c,
           row_number() OVER (PARTITION BY series_id
                              ORDER BY c DESC, g) AS rn,
           CAST(sum(c) OVER (PARTITION BY series_id) AS BIGINT)
               AS n_grams
    FROM c
)
SELECT series_id, g AS motif, CAST(c AS BIGINT) AS cnt, n_grams
FROM r WHERE rn = 1
""".format(sax=SAX_SQL),
    "cluster_ari_embeddings": CLUSTER_ARI_SQL.format(base=KMEANS_SQL),
    "classify_confusion_embeddings":
        CLASSIFY_CONFUSION_SQL.format(base=CENTROID_CLASSIFY_SQL),
    "semantic_prune_embeddings": """
SELECT vec_id, cluster, d2,
       row_number() OVER (PARTITION BY cluster
                          ORDER BY d2, vec_id) AS rk
FROM (""" + KMEANS_SQL + """) base
QUALIFY rk <= 32
""",
    "training_order_docs": TRAINING_ORDER_SQL,
    "url_blocklist_docs": URL_BLOCKLIST_SQL,
    "embedding_near_dups_exact": EMBEDDING_EXACT_SQL,
    "domain_cap_docs": DOMAIN_CAP_SQL,
    "mixture_order_docs": MIXTURE_ORDER_SQL,
    "incremental_dedup_docs": INCREMENTAL_DEDUP_SQL,
    "minhash_docs": _minhash_sql(),
    # the WAV payload carries the text's own bytes as PCM16 samples, so
    # the decoded waveform stats replay directly from the text (ASCII:
    # unicode(char) == byte)
    "multimodal_wav_decode": """
        SELECT doc_id AS media_id,
               length(text) AS n_samples,
               CAST(COALESCE(list_sum(list_transform(
                    range(1, length(text) + 1),
                    i -> unicode(substring(text, i, 1)))), 0) AS BIGINT)
                    AS sum_codes,
               CAST(CASE WHEN length(text) = 0 THEN -1
                    ELSE unicode(substring(text, 1, 1)) END AS BIGINT) AS first_code,
               CAST(CASE WHEN length(text) = 0 THEN -1
                    ELSE unicode(substring(text, length(text), 1))
               END AS BIGINT) AS last_code
        FROM documents
    """,
    # G.711 mu-law companding replayed arithmetically: sample = byte b,
    # 14-bit mag = b//4 + 33 (positive branch, no clip below 8159), segment
    # = (mag > 63), mantissa = (mag >> (seg+1)) & 15, decoded =
    # ((mant*8 + 132) << seg) - 132 — the exact encode+decode the Ray side
    # runs through the AU container and the vectorized G.711 codec
    "multimodal_mulaw_decode": """
        WITH codes AS MATERIALIZED (
            SELECT doc_id,
                   list_transform(range(1, length(text) + 1), i ->
                       unicode(substring(text, i, 1)) // 4 + 33) AS mags
            FROM documents
        ),
        dec AS MATERIALIZED (
            SELECT doc_id,
                   list_transform(mags, m ->
                       ((m // (CASE WHEN m > 63 THEN 4 ELSE 2 END)) % 16)
                       * 8 * (CASE WHEN m > 63 THEN 2 ELSE 1 END)
                       + 132 * (CASE WHEN m > 63 THEN 2 ELSE 1 END)
                       - 132) AS d
            FROM codes
        )
        SELECT doc_id AS media_id,
               len(d) AS n_samples,
               CAST(COALESCE(list_sum(d), 0) AS BIGINT) AS sum_codes,
               CAST(CASE WHEN len(d) = 0 THEN -1 ELSE d[1] END
                    AS BIGINT) AS first_code,
               CAST(CASE WHEN len(d) = 0 THEN -1 ELSE d[len(d)] END
                    AS BIGINT) AS last_code
        FROM dec
    """,
    # real MP4 demux replay: the frame plan (8 + n_chars%25 frames, frame i
    # = substr(text, 1+(i*11)%(n_chars-4), 1+(i+n_chars)%5)) and the
    # EveryNth float-step selection (same arithmetic as everynth_events)
    # are restated over text; the Ray side computes the SAME stats from
    # the bytes the ISO BMFF demuxer extracted out of mdat
    "multimodal_frame_sample": """
        WITH d AS MATERIALIZED (
            SELECT doc_id, text, n_chars, 8 + n_chars % 25 AS n_total
            FROM documents
        ),
        sel AS MATERIALIZED (
            SELECT d.doc_id, d.text, d.n_chars,
                   CAST(FLOOR(k.k * GREATEST(1.0, d.n_total / 16.0))
                        AS BIGINT) AS i
            FROM d JOIN generate_series(0, 15) k(k)
              ON k.k * GREATEST(1.0, d.n_total / 16.0) < d.n_total - 0.1
        )
        SELECT doc_id AS media_id,
               count(*) AS n_sel,
               40 * min(i) AS first_ts,
               40 * max(i) AS last_ts,
               CAST(sum(1 + (i + n_chars) % 5) AS BIGINT) AS sel_bytes,
               CAST(sum(unicode(substring(text,
                    1 + (i * 11) % (n_chars - 4), 1))) AS BIGINT) AS head_cs
        FROM sel GROUP BY doc_id
    """,
    "multimodal_png_decode": MULTIMODAL_PNG_SQL,
    "multimodal_jpeg_decode": MULTIMODAL_JPEG_SQL,
    # the GPT-2-style pretokenizer count; RE2 has no lookahead, so the
    # `\\s+(?!\\S)` (trailing-whitespace) branch is dropped — equivalent on
    # this corpus (no trailing whitespace), verified doc-by-doc
    "token_count_bpeish": r"""
        SELECT doc_id,
               len(regexp_extract_all(text,
                   '''s|''t|''re|''ve|''m|''ll|''d| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+'
               )) AS n_bpeish_tokens
        FROM documents
    """,
    # the defining byte-Horner recurrence, replayed exactly in HUGEINT
    # (ASCII corpus: unicode(char) == utf-8 byte)
    "fingerprint_docs": """
        SELECT doc_id,
               CAST(list_reduce(list_prepend(0::HUGEINT,
                    list_transform(range(1, length(text) + 1),
                                   i -> unicode(substring(text, i, 1))::HUGEINT)),
                    (h, c) -> (h * 1000003 + c) % 2305843009213693951)
                    AS BIGINT) AS fingerprint
        FROM documents
    """,
    # hash61 replayed in HUGEINT; thresholds are the SAME integers the Ray
    # filter compares against (rate_threshold), so the row sets are equal
    "rolling_stats_events": ROLLING_STATS_SQL,
    "anomaly_events": ANOMALY_SQL,
    "pii_scrub_docs": _build_pii_sql(),
    "tfidf_terms": TFIDF_SQL,
    # gzip roundtrip is lossless -> the oracle is the plain token-stats SQL
    "gzip_text_docs": """
        SELECT doc_id,
               length(text) AS n_chars,
               length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
               CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / (length(text) - length(replace(text, ' ', '')) + 1)
                 AS mean_token_len
        FROM documents
    """,
    "warc_extract_docs": WARC_EXTRACT_SQL,
    "chunk_docs": CHUNK_DOCS_SQL,
    "pack_sequences_docs": PACK_SEQUENCES_SQL,
    "sample_docs": _SAMPLE_SQL,
    "sample_stratified_docs": _STRAT_SQL,
    "train_split_docs": _SPLIT_SQL,
    "knn_embeddings": """
        WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               row_number() OVER (
                 ORDER BY list_cosine_similarity(embedding, (SELECT qe FROM q))
                          DESC, vec_id) AS rank
        FROM embeddings WHERE vec_id > 0
        ORDER BY rank LIMIT 10
    """,
}

# the partitioned path must agree with the per-series path bin-for-bin
ORACLE_SQL["minmax_events_partitioned"] = ORACLE_SQL["minmax_events"]
# exhaustive-probe IVF (nprobe == n_lists) provably equals brute force —
# same oracle; the approximate regime is pytest-pinned (see the query)
ORACLE_SQL["knn_ivf_embeddings"] = ORACLE_SQL["knn_embeddings"]

# round-4 additions
QUERIES["kendall_pairs_1h"] = q_kendall_pairs_1h
ORACLE_SQL["kendall_pairs_1h"] = KENDALL_SQL
QUERIES["ordinal_patterns_15m"] = q_ordinal_patterns_15m
ORACLE_SQL["ordinal_patterns_15m"] = ORDINAL_SQL
QUERIES["hits_docs"] = q_hits_docs
ORACLE_SQL["hits_docs"] = HITS_SQL
QUERIES["reciprocity_docs"] = q_reciprocity_docs
ORACLE_SQL["reciprocity_docs"] = RECIPROCITY_SQL
QUERIES["assortativity_docs"] = q_assortativity_docs
ORACLE_SQL["assortativity_docs"] = ASSORTATIVITY_SQL
QUERIES["kmv_distinct_domains"] = q_kmv_distinct_domains
ORACLE_SQL["kmv_distinct_domains"] = KMV_SQL
QUERIES["log2hist_events"] = q_log2hist_events
ORACLE_SQL["log2hist_events"] = LOG2HIST_SQL

QUERIES["multimodal_gif_decode"] = q_multimodal_gif_decode
ORACLE_SQL["multimodal_gif_decode"] = MULTIMODAL_GIF_SQL

QUERIES["chi2_lang_source"] = q_chi2_lang_source
ORACLE_SQL["chi2_lang_source"] = CHI2_SQL

QUERIES["holtwinters_1h"] = q_holtwinters_1h
ORACLE_SQL["holtwinters_1h"] = HOLTWINTERS_SQL

QUERIES["keyword_tag_docs"] = q_keyword_tag_docs
ORACLE_SQL["keyword_tag_docs"] = KEYWORD_TAG_SQL
QUERIES["backtest_snaive_1h"] = q_backtest_snaive_1h
ORACLE_SQL["backtest_snaive_1h"] = BACKTEST_SNAIVE_SQL
QUERIES["twohop_docs"] = q_twohop_docs
ORACLE_SQL["twohop_docs"] = TWOHOP_SQL

QUERIES["order_priority_check"] = q_order_priority_check
ORACLE_SQL["order_priority_check"] = ORDER_PRIORITY_SQL
QUERIES["custdist_orders"] = q_custdist_orders
ORACLE_SQL["custdist_orders"] = CUSTDIST_SQL
QUERIES["sales_opportunity_nations"] = q_sales_opportunity_nations
ORACLE_SQL["sales_opportunity_nations"] = SALES_OPPORTUNITY_SQL

QUERIES["vocab_overlap_sources"] = q_vocab_overlap_sources
ORACLE_SQL["vocab_overlap_sources"] = VOCAB_OVERLAP_SQL

QUERIES["ppr_docs"] = q_ppr_docs
ORACLE_SQL["ppr_docs"] = PPR_SQL

QUERIES["modularity_docs"] = q_modularity_docs
ORACLE_SQL["modularity_docs"] = MODULARITY_SQL

QUERIES["dominant_period_1h"] = q_dominant_period_1h
ORACLE_SQL["dominant_period_1h"] = DOMINANT_PERIOD_SQL

QUERIES["quantized_knn_recall"] = q_quantized_knn_recall
ORACLE_SQL["quantized_knn_recall"] = QUANTIZED_KNN_SQL

QUERIES["profit_by_nation_year"] = q_profit_by_nation_year
ORACLE_SQL["profit_by_nation_year"] = PROFIT_SQL
QUERIES["join_size_profile"] = q_join_size_profile
ORACLE_SQL["join_size_profile"] = JOIN_SIZE_SQL

QUERIES["lod_route_events"] = q_lod_route_events
ORACLE_SQL["lod_route_events"] = LOD_ROUTE_SQL

QUERIES["ed2_pairs_docs"] = q_ed2_pairs_docs
ORACLE_SQL["ed2_pairs_docs"] = ED2_PAIRS_SQL

QUERIES["cdc_chunk_docs"] = q_cdc_chunk_docs
ORACLE_SQL["cdc_chunk_docs"] = CDC_CHUNK_SQL
QUERIES["cdc_chunk_docs_utf8"] = q_cdc_chunk_docs_utf8
ORACLE_SQL["cdc_chunk_docs_utf8"] = CDC_CHUNK_UTF8_SQL
QUERIES["cdc_dedup_corpus"] = q_cdc_dedup_corpus
ORACLE_SQL["cdc_dedup_corpus"] = CDC_DEDUP_SQL

from .ext_round5 import (  # noqa: E402  (round-5 continuation wave)
    KCENTER_SQL,
    LINK_PREDICT_SQL,
    VARINT_POSTINGS_SQL,
    q_kcenter_select_embeddings,
    q_link_predict_docs,
    q_varint_postings_docs,
)

QUERIES["link_predict_docs"] = q_link_predict_docs
ORACLE_SQL["link_predict_docs"] = LINK_PREDICT_SQL
QUERIES["varint_postings_docs"] = q_varint_postings_docs
ORACLE_SQL["varint_postings_docs"] = VARINT_POSTINGS_SQL
QUERIES["kcenter_select_embeddings"] = q_kcenter_select_embeddings
ORACLE_SQL["kcenter_select_embeddings"] = KCENTER_SQL

from .ext_round5b import (  # noqa: E402  (round-5 closing wave)
    BM25_SQL,
    MACD_SQL,
    MATRIX_PROFILE_SQL,
    q_bm25_docs,
    q_macd_15m,
    q_matrix_profile_1h,
)

QUERIES["macd_15m"] = q_macd_15m
ORACLE_SQL["macd_15m"] = MACD_SQL
QUERIES["matrix_profile_1h"] = q_matrix_profile_1h
ORACLE_SQL["matrix_profile_1h"] = MATRIX_PROFILE_SQL
QUERIES["bm25_docs"] = q_bm25_docs
ORACLE_SQL["bm25_docs"] = BM25_SQL

from .ext_round5b import (  # noqa: E402  (round-5 closing wave, part 2)
    PHRASE_SEARCH_SQL,
    ROARING_POSTINGS_SQL,
    q_phrase_search_docs,
    q_roaring_postings_docs,
)

QUERIES["roaring_postings_docs"] = q_roaring_postings_docs
ORACLE_SQL["roaring_postings_docs"] = ROARING_POSTINGS_SQL
QUERIES["phrase_search_docs"] = q_phrase_search_docs
ORACLE_SQL["phrase_search_docs"] = PHRASE_SEARCH_SQL

from .ext_round5c import (  # noqa: E402  (round-5 closing wave, part 3)
    BOILERPLATE_GRAMS_SQL,
    DUP_WINDOW_SQL,
    LARGE_VOLUME_SQL,
    SMALL_QTY_SQL,
    TOP_SUPPLIER_SQL,
    q_boilerplate_grams_source,
    q_dup_window_docs,
    q_large_volume_orders,
    q_small_qty_revenue,
    q_top_supplier_revenue,
)

QUERIES["dup_window_docs"] = q_dup_window_docs
ORACLE_SQL["dup_window_docs"] = DUP_WINDOW_SQL
QUERIES["boilerplate_grams_source"] = q_boilerplate_grams_source
ORACLE_SQL["boilerplate_grams_source"] = BOILERPLATE_GRAMS_SQL
QUERIES["top_supplier_revenue"] = q_top_supplier_revenue
ORACLE_SQL["top_supplier_revenue"] = TOP_SUPPLIER_SQL
QUERIES["small_qty_revenue"] = q_small_qty_revenue
ORACLE_SQL["small_qty_revenue"] = SMALL_QTY_SQL
QUERIES["large_volume_orders"] = q_large_volume_orders
ORACLE_SQL["large_volume_orders"] = LARGE_VOLUME_SQL

from .ext_round5c import (  # noqa: E402
    MARKET_SHARE_SQL,
    VOLUME_SHIPPING_SQL,
    q_market_share_year,
    q_volume_shipping_pairs,
)

QUERIES["volume_shipping_pairs"] = q_volume_shipping_pairs
ORACLE_SQL["volume_shipping_pairs"] = VOLUME_SHIPPING_SQL
QUERIES["market_share_year"] = q_market_share_year
ORACLE_SQL["market_share_year"] = MARKET_SHARE_SQL

from .ext_round5c import (  # noqa: E402
    CLOSENESS_SQL,
    q_closeness_docs,
)

QUERIES["closeness_docs"] = q_closeness_docs
ORACLE_SQL["closeness_docs"] = CLOSENESS_SQL

from .ext_round5c import (  # noqa: E402
    BRAND_QTY_SQL,
    q_brand_qty_revenue,
)

QUERIES["brand_qty_revenue"] = q_brand_qty_revenue
ORACLE_SQL["brand_qty_revenue"] = BRAND_QTY_SQL

from .ext_round5d import (  # noqa: E402
    BOLLINGER_SQL,
    DRAWDOWN_SQL,
    HAMPEL_SQL,
    RSI_SQL,
    q_bollinger_1h,
    q_drawdown_1h,
    q_hampel_15m,
    q_rsi_1h,
)

QUERIES["hampel_15m"] = q_hampel_15m
ORACLE_SQL["hampel_15m"] = HAMPEL_SQL
QUERIES["bollinger_1h"] = q_bollinger_1h
ORACLE_SQL["bollinger_1h"] = BOLLINGER_SQL
QUERIES["drawdown_1h"] = q_drawdown_1h
ORACLE_SQL["drawdown_1h"] = DRAWDOWN_SQL
QUERIES["rsi_1h"] = q_rsi_1h
ORACLE_SQL["rsi_1h"] = RSI_SQL

from .ext_round5e import (  # noqa: E402
    CONTAINMENT_SQL,
    HEAPS_SQL,
    MISRA_GRIES_SQL,
    q_containment_docs,
    q_heaps_law_docs,
    q_misra_gries_terms,
)

QUERIES["containment_docs"] = q_containment_docs
ORACLE_SQL["containment_docs"] = CONTAINMENT_SQL
QUERIES["heaps_law_docs"] = q_heaps_law_docs
ORACLE_SQL["heaps_law_docs"] = HEAPS_SQL
QUERIES["misra_gries_terms"] = q_misra_gries_terms
ORACLE_SQL["misra_gries_terms"] = MISRA_GRIES_SQL

from .ext_round5e import (  # noqa: E402
    PQ_RECALL_SQL,
    q_pq_recall_embeddings,
)

QUERIES["pq_recall_embeddings"] = q_pq_recall_embeddings
ORACLE_SQL["pq_recall_embeddings"] = PQ_RECALL_SQL

from .multimodal_curation import (  # noqa: E402
    AUDIO_FEATURES_SQL,
    q_audio_features_wav,
)

QUERIES["audio_features_wav"] = q_audio_features_wav
ORACLE_SQL["audio_features_wav"] = AUDIO_FEATURES_SQL

from .multimodal_curation import (  # noqa: E402
    IMAGE_FEATURES_SQL,
    q_image_features_bmp,
)

QUERIES["image_features_bmp"] = q_image_features_bmp
ORACLE_SQL["image_features_bmp"] = IMAGE_FEATURES_SQL

from .ext_round5d import (  # noqa: E402
    FOR_BITPACK_SQL,
    q_for_bitpack_15m,
)

QUERIES["for_bitpack_15m"] = q_for_bitpack_15m
ORACLE_SQL["for_bitpack_15m"] = FOR_BITPACK_SQL

from .ext_sketch_rel import (  # noqa: E402
    ZONE_PRUNE_SQL,
    q_zone_map_prune_events,
)

QUERIES["zone_map_prune_events"] = q_zone_map_prune_events
ORACLE_SQL["zone_map_prune_events"] = ZONE_PRUNE_SQL

from .ext_round5d import (  # noqa: E402
    CROSTON_SQL,
    q_croston_1h,
)

QUERIES["croston_1h"] = q_croston_1h
ORACLE_SQL["croston_1h"] = CROSTON_SQL

from .ext_round5f import (  # noqa: E402
    EXCESS_QTY_SQL,
    IMPORTANT_PARTS_SQL,
    MIN_COST_SUPPLIER_SQL,
    REVENUE_BAND_SQL,
    SHIP_DELAY_PRIORITY_SQL,
    SOLE_LATE_SQL,
    SUPPLIER_CNT_SQL,
    q_excess_qty_suppliers,
    q_important_parts_by_nation,
    q_min_cost_supplier_parts,
    q_revenue_band_by_year,
    q_ship_delay_priority,
    q_sole_late_supplier_orders,
    q_supplier_cnt_part_class,
)

QUERIES["min_cost_supplier_parts"] = q_min_cost_supplier_parts
ORACLE_SQL["min_cost_supplier_parts"] = MIN_COST_SUPPLIER_SQL
QUERIES["revenue_band_by_year"] = q_revenue_band_by_year
ORACLE_SQL["revenue_band_by_year"] = REVENUE_BAND_SQL
QUERIES["important_parts_by_nation"] = q_important_parts_by_nation
ORACLE_SQL["important_parts_by_nation"] = IMPORTANT_PARTS_SQL
QUERIES["ship_delay_priority"] = q_ship_delay_priority
ORACLE_SQL["ship_delay_priority"] = SHIP_DELAY_PRIORITY_SQL
QUERIES["supplier_cnt_part_class"] = q_supplier_cnt_part_class
ORACLE_SQL["supplier_cnt_part_class"] = SUPPLIER_CNT_SQL
QUERIES["excess_qty_suppliers"] = q_excess_qty_suppliers
ORACLE_SQL["excess_qty_suppliers"] = EXCESS_QTY_SQL
QUERIES["sole_late_supplier_orders"] = q_sole_late_supplier_orders
ORACLE_SQL["sole_late_supplier_orders"] = SOLE_LATE_SQL

from .ext_round5g import (  # noqa: E402
    CANONICAL_DOCS_SQL,
    NOVELTY_SQL,
    RLE_SQL,
    q_canonical_docs,
    q_novelty_docs,
    q_rle_roundtrip_events,
)

QUERIES["rle_roundtrip_events"] = q_rle_roundtrip_events
ORACLE_SQL["rle_roundtrip_events"] = RLE_SQL
QUERIES["canonical_docs"] = q_canonical_docs
ORACLE_SQL["canonical_docs"] = CANONICAL_DOCS_SQL
QUERIES["novelty_docs"] = q_novelty_docs
ORACLE_SQL["novelty_docs"] = NOVELTY_SQL

from .ext_round5h import (  # noqa: E402
    IMAGE_FEATURES_PPM_SQL,
    JL_DISTORTION_SQL,
    q_image_features_ppm,
    q_jl_distortion_embeddings,
)

QUERIES["jl_distortion_embeddings"] = q_jl_distortion_embeddings
ORACLE_SQL["jl_distortion_embeddings"] = JL_DISTORTION_SQL
QUERIES["image_features_ppm"] = q_image_features_ppm
ORACLE_SQL["image_features_ppm"] = IMAGE_FEATURES_PPM_SQL

from .ext_round5i import (  # noqa: E402
    DECAYED_SQL,
    TRIPLET_SQL,
    q_decayed_activity_users,
    q_triplet_margin_embeddings,
)

QUERIES["triplet_margin_embeddings"] = q_triplet_margin_embeddings
ORACLE_SQL["triplet_margin_embeddings"] = TRIPLET_SQL
QUERIES["decayed_activity_users"] = q_decayed_activity_users
ORACLE_SQL["decayed_activity_users"] = DECAYED_SQL

from .ext_round5j import (  # noqa: E402
    SDT_SQL,
    SHARED_SUBSTRING_SQL,
    q_sdt_compress_15m,
    q_shared_substring_docs,
)

QUERIES["shared_substring_docs"] = q_shared_substring_docs
ORACLE_SQL["shared_substring_docs"] = SHARED_SUBSTRING_SQL
QUERIES["sdt_compress_15m"] = q_sdt_compress_15m
ORACLE_SQL["sdt_compress_15m"] = SDT_SQL

from .ext_round5j import (  # noqa: E402
    ADPCM_SQL,
    q_multimodal_adpcm_decode,
)

QUERIES["multimodal_adpcm_decode"] = q_multimodal_adpcm_decode
ORACLE_SQL["multimodal_adpcm_decode"] = ADPCM_SQL

from .ext_round5j import AMS_SQL, q_ams_f2_users  # noqa: E402

QUERIES["ams_f2_users"] = q_ams_f2_users
ORACLE_SQL["ams_f2_users"] = AMS_SQL

from .ext_round5j import HILBERT_SQL, q_hilbert_zone_maps_events  # noqa: E402

QUERIES["hilbert_zone_maps_events"] = q_hilbert_zone_maps_events
ORACLE_SQL["hilbert_zone_maps_events"] = HILBERT_SQL

from .ext_round5j import THETA_SQL, q_theta_1h  # noqa: E402

QUERIES["theta_1h"] = q_theta_1h
ORACLE_SQL["theta_1h"] = THETA_SQL

from .ext_round5j import DELTA_ROLLUP_SQL, q_delta_rollup_15m  # noqa: E402

QUERIES["delta_rollup_15m"] = q_delta_rollup_15m
ORACLE_SQL["delta_rollup_15m"] = DELTA_ROLLUP_SQL

from .ext_round5j import MIN_WINDOW_SQL, q_min_window_docs  # noqa: E402

QUERIES["min_window_docs"] = q_min_window_docs
ORACLE_SQL["min_window_docs"] = MIN_WINDOW_SQL

from .ext_round5j import RING_SQL, q_ring_rebalance_docs  # noqa: E402

QUERIES["ring_rebalance_docs"] = q_ring_rebalance_docs
ORACLE_SQL["ring_rebalance_docs"] = RING_SQL

from .ext_round5j import MEETING_SQL, q_meeting_select_users  # noqa: E402

QUERIES["meeting_select_users"] = q_meeting_select_users
ORACLE_SQL["meeting_select_users"] = MEETING_SQL

from .ext_round5j import RANSAC_SQL, q_ransac_line_1h  # noqa: E402

QUERIES["ransac_line_1h"] = q_ransac_line_1h
ORACLE_SQL["ransac_line_1h"] = RANSAC_SQL

from .ext_round5j import SCENE_SQL, q_scene_change_frames  # noqa: E402

QUERIES["scene_change_frames"] = q_scene_change_frames
ORACLE_SQL["scene_change_frames"] = SCENE_SQL

from .ext_round5j import SOUNDEX_SQL, q_soundex_blocks_docs  # noqa: E402

QUERIES["soundex_blocks_docs"] = q_soundex_blocks_docs
ORACLE_SQL["soundex_blocks_docs"] = SOUNDEX_SQL

from .ext_round5j import (  # noqa: E402
    BUDGET_SELECT_SQL,
    q_budget_select_lineitems,
)

QUERIES["budget_select_lineitems"] = q_budget_select_lineitems
ORACLE_SQL["budget_select_lineitems"] = BUDGET_SELECT_SQL

from .ext_round5j import (  # noqa: E402
    GAPFILL_SEASONAL_SQL,
    q_gapfill_seasonal_1h,
)

QUERIES["gapfill_seasonal_1h"] = q_gapfill_seasonal_1h
ORACLE_SQL["gapfill_seasonal_1h"] = GAPFILL_SEASONAL_SQL

from .ext_round5j import LTOB_SQL, q_ltob_events  # noqa: E402

QUERIES["ltob_events"] = q_ltob_events
ORACLE_SQL["ltob_events"] = LTOB_SQL

from .ext_round5j import EF_POSTINGS_SQL, q_ef_postings_docs  # noqa: E402

QUERIES["ef_postings_docs"] = q_ef_postings_docs
ORACLE_SQL["ef_postings_docs"] = EF_POSTINGS_SQL

from .ext_round5j import BLOOM_FPR_SQL, q_bloom_fpr_audit_users  # noqa: E402

QUERIES["bloom_fpr_audit_users"] = q_bloom_fpr_audit_users
ORACLE_SQL["bloom_fpr_audit_users"] = BLOOM_FPR_SQL

from .ext_round5j import MEDIAN_SELECT_SQL, q_median_select_events  # noqa: E402

QUERIES["median_select_events"] = q_median_select_events
ORACLE_SQL["median_select_events"] = MEDIAN_SELECT_SQL

from .ext_round5k import PETTITT_SQL, q_pettitt_15m  # noqa: E402

QUERIES["pettitt_15m"] = q_pettitt_15m
ORACLE_SQL["pettitt_15m"] = PETTITT_SQL

from .ext_round5k import ANAGRAM_SQL, q_anagram_groups_vocab  # noqa: E402

QUERIES["anagram_groups_vocab"] = q_anagram_groups_vocab
ORACLE_SQL["anagram_groups_vocab"] = ANAGRAM_SQL

from .ext_round5k import FRONT_CODE_SQL, q_front_code_vocab  # noqa: E402

QUERIES["front_code_vocab"] = q_front_code_vocab
ORACLE_SQL["front_code_vocab"] = FRONT_CODE_SQL

from .ext_round5k import AR1_SQL, q_ar1_1h  # noqa: E402

QUERIES["ar1_1h"] = q_ar1_1h
ORACLE_SQL["ar1_1h"] = AR1_SQL

from .ext_round5k import ALLEN_SQL, q_allen_relations_events  # noqa: E402

QUERIES["allen_relations_events"] = q_allen_relations_events
ORACLE_SQL["allen_relations_events"] = ALLEN_SQL

from .ext_round5k import WJACCARD_SQL, q_weighted_jaccard_docs  # noqa: E402

QUERIES["weighted_jaccard_docs"] = q_weighted_jaccard_docs
ORACLE_SQL["weighted_jaccard_docs"] = WJACCARD_SQL

from .ext_round5k import SSSP_SQL, q_sssp_docs  # noqa: E402

QUERIES["sssp_docs"] = q_sssp_docs
ORACLE_SQL["sssp_docs"] = SSSP_SQL

from .ext_round5k import LINEAR_COUNT_SQL, q_linear_count_domains  # noqa: E402

QUERIES["linear_count_domains"] = q_linear_count_domains
ORACLE_SQL["linear_count_domains"] = LINEAR_COUNT_SQL

from .ext_round5k import SIMPLE8B_SQL, q_simple8b_events  # noqa: E402

QUERIES["simple8b_events"] = q_simple8b_events
ORACLE_SQL["simple8b_events"] = SIMPLE8B_SQL

from .ext_round5k import WILCOXON_SQL, q_wilcoxon_signed_1h  # noqa: E402

QUERIES["wilcoxon_signed_1h"] = q_wilcoxon_signed_1h
ORACLE_SQL["wilcoxon_signed_1h"] = WILCOXON_SQL

from .ext_round5k import RUNS_SQL, q_runs_test_15m  # noqa: E402

QUERIES["runs_test_15m"] = q_runs_test_15m
ORACLE_SQL["runs_test_15m"] = RUNS_SQL

from .ext_round5k import QN_SQL, q_qn_scale_15m  # noqa: E402

QUERIES["qn_scale_15m"] = q_qn_scale_15m
ORACLE_SQL["qn_scale_15m"] = QN_SQL

from .ext_round5k import LZ_SQL, q_lz_complexity_15m  # noqa: E402

QUERIES["lz_complexity_15m"] = q_lz_complexity_15m
ORACLE_SQL["lz_complexity_15m"] = LZ_SQL

from .ext_round5k import MTF_SQL, q_mtf_score_users  # noqa: E402

QUERIES["mtf_score_users"] = q_mtf_score_users
ORACLE_SQL["mtf_score_users"] = MTF_SQL

from .ext_round5k import (  # noqa: E402
    TRANSPOSITION_SQL,
    q_transposition_pairs_docs,
)

QUERIES["transposition_pairs_docs"] = q_transposition_pairs_docs
ORACLE_SQL["transposition_pairs_docs"] = TRANSPOSITION_SQL

from .ext_round5k import GOLOMB_SQL, q_golomb_postings_docs  # noqa: E402

QUERIES["golomb_postings_docs"] = q_golomb_postings_docs
ORACLE_SQL["golomb_postings_docs"] = GOLOMB_SQL

from .ext_round5k import SAVGOL_SQL, q_savgol_15m  # noqa: E402

QUERIES["savgol_15m"] = q_savgol_15m
ORACLE_SQL["savgol_15m"] = SAVGOL_SQL

from .ext_round5k import OLS_INFLUENCE_SQL, q_ols_influence_1h  # noqa: E402

QUERIES["ols_influence_1h"] = q_ols_influence_1h
ORACLE_SQL["ols_influence_1h"] = OLS_INFLUENCE_SQL

from .ext_round5k import MIS_SQL, q_mis_docs  # noqa: E402

QUERIES["mis_docs"] = q_mis_docs
ORACLE_SQL["mis_docs"] = MIS_SQL

from .ext_round5k import G2_SQL, q_g2_collocations_docs  # noqa: E402

QUERIES["g2_collocations_docs"] = q_g2_collocations_docs
ORACLE_SQL["g2_collocations_docs"] = G2_SQL

from .ext_round5k import MST_SQL, q_mst_docs  # noqa: E402

QUERIES["mst_docs"] = q_mst_docs
ORACLE_SQL["mst_docs"] = MST_SQL

from .ext_round5k import CAPTURE_SQL, q_capture_recapture_users  # noqa: E402

QUERIES["capture_recapture_users"] = q_capture_recapture_users
ORACLE_SQL["capture_recapture_users"] = CAPTURE_SQL

from .ext_round5k import WILSON_SQL, q_wilson_interval_events  # noqa: E402

QUERIES["wilson_interval_events"] = q_wilson_interval_events
ORACLE_SQL["wilson_interval_events"] = WILSON_SQL

from .ext_round5k import HRW_SQL, q_hrw_rebalance_docs  # noqa: E402

QUERIES["hrw_rebalance_docs"] = q_hrw_rebalance_docs
ORACLE_SQL["hrw_rebalance_docs"] = HRW_SQL

from .ext_round5k import SPC_SQL, q_spc_rules_15m  # noqa: E402

QUERIES["spc_rules_15m"] = q_spc_rules_15m
ORACLE_SQL["spc_rules_15m"] = SPC_SQL

from .ext_round5k import SINGLE_LINKAGE_SQL, q_single_linkage_docs  # noqa: E402

QUERIES["single_linkage_docs"] = q_single_linkage_docs
ORACLE_SQL["single_linkage_docs"] = SINGLE_LINKAGE_SQL

from .ext_round5k import WL_SQL, q_wl_refinement_docs  # noqa: E402

QUERIES["wl_refinement_docs"] = q_wl_refinement_docs
ORACLE_SQL["wl_refinement_docs"] = WL_SQL

from .ext_round5k import RAKE_SQL, q_rake_words_docs  # noqa: E402

QUERIES["rake_words_docs"] = q_rake_words_docs
ORACLE_SQL["rake_words_docs"] = RAKE_SQL

from .ext_round5k import KATZ_SQL, q_katz_docs  # noqa: E402

QUERIES["katz_docs"] = q_katz_docs
ORACLE_SQL["katz_docs"] = KATZ_SQL

from .ext_round5k import ADAPTATION_SQL, q_term_adaptation_docs  # noqa: E402

QUERIES["term_adaptation_docs"] = q_term_adaptation_docs
ORACLE_SQL["term_adaptation_docs"] = ADAPTATION_SQL

from .ext_round5k import LOGODDS_SQL, q_log_odds_sources_docs  # noqa: E402

QUERIES["log_odds_sources_docs"] = q_log_odds_sources_docs
ORACLE_SQL["log_odds_sources_docs"] = LOGODDS_SQL

from .ext_round5k import DOUBLE_SWEEP_SQL, q_double_sweep_docs  # noqa: E402

QUERIES["double_sweep_docs"] = q_double_sweep_docs
ORACLE_SQL["double_sweep_docs"] = DOUBLE_SWEEP_SQL

from .ext_round5k import SET_COVER_SQL, q_set_cover_sources  # noqa: E402

QUERIES["set_cover_sources"] = q_set_cover_sources
ORACLE_SQL["set_cover_sources"] = SET_COVER_SQL

from .ext_round5k import K_ANON_SQL, q_k_anonymity_events  # noqa: E402

QUERIES["k_anonymity_events"] = q_k_anonymity_events
ORACLE_SQL["k_anonymity_events"] = K_ANON_SQL

from .ext_round5k import SPRT_SQL, q_sprt_users  # noqa: E402

QUERIES["sprt_users"] = q_sprt_users
ORACLE_SQL["sprt_users"] = SPRT_SQL

from .ext_round5k import BWT_SQL, q_bwt_docs  # noqa: E402

QUERIES["bwt_docs"] = q_bwt_docs
ORACLE_SQL["bwt_docs"] = BWT_SQL

from .ext_round5k import KNAPSACK_SQL, q_knapsack_suppliers  # noqa: E402

QUERIES["knapsack_suppliers"] = q_knapsack_suppliers
ORACLE_SQL["knapsack_suppliers"] = KNAPSACK_SQL
