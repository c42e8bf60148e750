"""Query-registry assembly + driver-window ordering.

The driver's correctness gate grades ``list(QUERIES)[:50]`` — the first
50 entries in registration order — per round. Rounds 2-4 produced
driver-green rows for 149 of the 153 entries registered through round 4
(the frozensets ``_R2_GREEN`` / ``_R3_GREEN`` / ``_R4_GREEN`` mirror
CORRECTNESS_r0{2,3,4}.json). This module rebuilds the registry in a
curated order so the round-5 window grades exactly what has never been
graded green:

1. ``_ROTATE_FIRST_R5`` — the single r4 red (q12, an oracle typing bug
   since fixed) plus the three entries registered past the full r4
   window (slots 0-3);
2. remaining *fresh* entries (round-5 additions in extra_queries /
   r5_queries, in neither frozen green set nor the rotate list) in
   registration order — fresh work is graded the round it ships
   (slots 4+);
3. the 149 entries already driver-green in r2 ∪ r3 ∪ r4, deferred past
   the window.

The dicts are mutated in place so every existing ``from ... import
QUERIES`` reference observes the new order.
"""

from glamira_end_to_end_data_pipeline_spark.plans.queries import ORACLES, QUERIES

# registration side-effects: each module adds entries to QUERIES/ORACLES
from glamira_end_to_end_data_pipeline_spark.plans import (  # noqa: E402,F401
    ingest_queries,
    northstar_queries,
    star_queries,
    streaming_queries,
)

# extra_queries MUST import last: its entries deliberately land at the
# end of the fresh ordering, outside the already-full round-4 window.
from glamira_end_to_end_data_pipeline_spark.plans import extra_queries  # noqa: E402,F401

# round-5 fresh entries — land behind the four front-loaded re-grades,
# inside the (otherwise empty) round-5 window.
from glamira_end_to_end_data_pipeline_spark.plans import r5_queries  # noqa: E402,F401

# Round-5 front-loads: the single r4 failure (q12 — oracle typing bug,
# now CAST-to-BIGINT-fixed) plus the three entries registered past the
# full r4 window and therefore never driver-graded. These MUST occupy
# window slots 0-3 in round 5.
_ROTATE_FIRST_R5 = (
    "q12_priority_by_flag",
    "graph_triangles",
    "stream_cdc_apply",
    "graph_link_prediction",
)

# Driver-green in CORRECTNESS_r02.json (round-2 window).
_R2_GREEN = frozenset(
    {
        "flagship_daily_events",
        "p1_typed_projection",
        "p6_p7_membership_coalesce",
        "q1_pricing_summary",
        "q3_shipping_priority",
        "a1_a3_topk_event_types",
        "a2_multicol_distinct",
        "a5_minmax_date_range",
        "a6_a7_worklist_pick",
        "j1_j5_star_join_defaults",
        "j3_computed_date_key_join",
        "j4_composite_key_null_miss",
        "j7_anti_join_unprocessed",
        "j9_not_in_null_aware",
        "q4_semi_join_priority",
        "q6_forecast_revenue",
        "q5_local_supplier_volume",
        "q18_large_volume_customers",
        "j_skew_salted",
        "a_skewed_salted_agg",
        "j_bucketed_colocated",
        "j6_value_range_join",
        "w1_dedup_latest",
        "w3_date_spine",
        "w6_forward_fill",
        "w7_new_vs_returning",
        "a_cohort_retention",
        "a_funnel_conversion",
        "w8_event_transitions",
        "w9_ntile_quartiles",
        "w5_scd2_user_segments",
        "j8_asof_event_segments",
        "w4_rolling_user_value",
        "dq_schema_checks",
        "f_json_parse_corrupt",
        "f_date_parts_dim",
        "f_surrogate_keys",
        "f_ip_enrichment",
        "f_string_cleaning",
        "f_misc_scalars",
        "a8_running_counters",
        "a_approx_sketches",
        "a_exact_percentiles",
        "f_pandas_udaf_robust_stats",
        "a_multigrain_rollup",
        "a_cube_weekday_mix",
        "a_pivot_daily_mix",
        "setops_users_vs_customers",
        "s7_master_schema_rules",
        "s9_load_routing",
    }
)

# Driver-green in CORRECTNESS_r03.json (round-3 window).
_R3_GREEN = frozenset(
    {
        "s4_text_ip_worklist",
        "s12_crawler_parse",
        "emb_quantize_int8",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_clusters",
        "dedup_ngram_jaccard",
        "dedup_simhash",
        "emb_cosine_topk",
        "emb_ann_lsh_topk",
        "emb_ivf_topk",
        "emb_near_dup_pairs",
        "text_token_stats",
        "text_quality_score",
        "text_language_id",
        "text_fingerprint",
        "text_split_assign",
        "text_pack_sequences",
        "text_shuffle_shards",
        "text_decontaminate",
        "text_repetition_filter",
        "text_quality_filter_stratified",
        "text_vocab_topk",
        "text_pii_scrub",
        "star_stg_summary",
        "star_dim_customer",
        "star_dim_session_context",
        "star_dim_date",
        "star_dim_product",
        "star_dim_location",
        "star_fact_sales_order",
        "stream_star_fact_incremental",
        "stream_tumbling_event_counts",
        "stream_session_windows",
        "stream_sliding_window_counts",
        "stream_dedup_replayed",
        "stream_interval_join_attribution",
        "s5_s6_incremental_ingest",
        "s_csv_round_trip",
        "s_schema_evolution",
        "s_partitioned_lake",
        "mm_extract_features",
        "mm_feature_ann_topk",
        "mm_resize_images",
        "mm_video_frame_sample",
        "q2_min_cost_supplier",
        "q21_waiting_suppliers",
        "emb_ivf_refined_topk",
        "star_date_range",
        "text_pretraining_pipeline",
    }
)

# Driver-green in CORRECTNESS_r04.json (round-4 window; the only red
# row was q12_priority_by_flag, an oracle typing bug re-front-loaded in
# _ROTATE_FIRST_R5 after the CAST fix).
_R4_GREEN = frozenset(
    {
        "q7_volume_shipping",
        "q8_market_share",
        "q10_returned_items",
        "q13_customer_distribution",
        "q14_promo_effect",
        "q20_excess_shippers",
        "dq_volume_anomaly",
        "a_histogram",
        "lake_zorder_codes",
        "dedup_retain_corpus",
        "dedup_winnowing_pairs",
        "emb_pq_codes",
        "emb_pq_adc_topk",
        "emb_ivfpq_topk",
        "text_chunk_documents",
        "text_char_entropy",
        "text_sample_stratified",
        "text_mix_epochs",
        "text_lm_score",
        "text_bm25_topk",
        "q19_disjunctive_revenue",
        "q22_dormant_balances",
        "q9_product_profit",
        "q11_important_parts",
        "q15_top_supplier",
        "q16_supplier_part_counts",
        "q17_small_quantity_revenue",
        "a_grouping_sets",
        "a_corr_stats",
        "graph_pagerank",
        "w_sessionize_batch",
        "dedup_segment_boilerplate",
        "text_bpe_merges",
        "dedup_semantic_retain",
        "text_hybrid_rrf",
        "text_dsir_select",
        "emb_ann_recall",
        "text_bpe_encode",
        "text_ppl_buckets",
        "emb_indexing_pipeline",
        "text_classifier_score",
        "text_domain_cap",
        "emb_mmr_rerank",
        "s_orc_round_trip",
        "lake_merge_upsert",
        "lake_snapshot_read",
        "lake_gc_orphans",
        "lake_compact_commit",
        "stream_snapshot_commits",
    }
)

_DRIVER_GREEN = _R2_GREEN | _R3_GREEN | _R4_GREEN

# ROUND-6 TODO (apply BEFORE adding round-6 entries): fold the green
# rows of CORRECTNESS_r05.json into a `_R5_GREEN` frozenset, OR it into
# _DRIVER_GREEN, and clear _ROTATE_FIRST_R5 to () — re-front-loading
# only rows that FAILED in r5 after fixing them. Step 2 of
# _window_order() then auto-front-loads whatever round 6 registers
# fresh. Keep never-graded entry count ≤ 50 before registering more.
#
# The round-5 window (slots 0-49) as shipped: the 31 never-graded
# entries below, then 19 deferred greens re-graded as filler. Expected
# _R5_GREEN therefore contains (at least) these 31 names:
# q12_priority_by_flag, graph_triangles, stream_cdc_apply,
# graph_link_prediction, graph_adamic_adar, graph_kcore,
# emb_ivf_kcenter_topk, lake_incremental_across_compaction, a_incremental_rollup_merge,
# text_tfidf_topterms, dedup_cross_batch_minhash, dq_profile_columns,
# j_interval_overlap, emb_ivf_partitioned_prune, dedup_containment_snippets,
# s_jsonl_round_trip, scd2_apply_changes, dq_freshness_check,
# a_countmin_tokens, text_bigram_pmi, dq_k_anonymity,
# lake_schema_evolution_snapshot, dedup_minhash_estimate, stream_watermark_finalization,
# lake_stats_pruned_read, graph_lpa_communities, lake_rollback_commit,
# j10_null_safe_join, w10_rank_distributions, dq_psi_drift,
# j_fuzzy_name_match.


def _window_order() -> list[str]:
    registered = list(QUERIES)
    front = [n for n in _ROTATE_FIRST_R5 if n in QUERIES]
    fresh = [
        n
        for n in registered
        if n not in _ROTATE_FIRST_R5 and n not in _DRIVER_GREEN
    ]
    deferred = [n for n in registered if n in _DRIVER_GREEN]
    return front + fresh + deferred


def _apply_order() -> None:
    order = _window_order()
    q = {n: QUERIES[n] for n in order}
    o = {n: ORACLES[n] for n in order if n in ORACLES}
    QUERIES.clear()
    QUERIES.update(q)
    ORACLES.clear()
    ORACLES.update(o)


_apply_order()

__all__ = ["ORACLES", "QUERIES"]
