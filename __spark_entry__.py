"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real content lives in ``openalex_walden_spark.queries`` — this file
just adapts the CATALOG registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from openalex_walden_spark import queries as _q  # noqa: E402

_q.load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    d0_works_build is the engine's signature shape: the nested walden
    works row built end-to-end (priority merge, authorship fusion,
    schema conformance) — the reference's CreateWorksBase plane.
    """
    spec = _q.CATALOG["d0_works_build"]
    return spec.spark(spark, SMOKE_SF_DIR)


# The driver's CORRECTNESS sweep verifies the FIRST 50 entries of
# ``queries()`` in insertion order.  Round 2 verified these 50 (all
# green, CORRECTNESS_r02.json); they move to the back so round 3's
# window covers the yet-unchecked queries.  Local parity
# (tests/test_parity.py, all oracles) still guards the whole catalog.
_R2_GREEN = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "join_anti_customers_without_orders", "join_semi_customers_with_urgent",
    "join_full_outer_nation_counts", "join_nullsafe_band",
    "subquery_orders_above_cust_avg", "agg_having_priority_spread",
    "agg_grouping_sets", "agg_percentiles_by_segment", "agg_max_by_order",
    "agg_conditional_battery", "agg_sorted_collect",
    "w1_top_order_per_customer", "w2_qualify_top3_orders",
    "w3_percent_rank_cohort", "w4_fwci_ratio", "w5_running_revenue",
    "w6_flag_propagation", "w7_count_over_partition", "w8_ntile_quartiles",
    "w1_quality_ladder_pick", "d5_citation_counts", "d5_counts_by_year",
    "j13_posexplode_seats", "d1_priority_merge", "j6_range_window_revenue",
    "j7_alive_per_year", "j8_blocking_fuzzy_match", "d2_identity_resolution",
    "d9_change_detection", "t1_global_topk_orders", "t2_array_cap_top5",
    "u2_union_distinct_nations", "u4_except_non_urgent_customers",
    "d2_cascade_run", "d10_authorship_fusion", "text_quality_features",
    "text_lang_id", "dedup_exact_documents", "dedup_minhash_lsh_pairs",
    "dedup_simhash", "ann_cosine_topk", "llm_judge_verdicts",
    "text_token_stats", "dedup_ngram_jaccard", "llm_embed_vectors",
    "ev_counts_by_type_day", "ev_tumbling_hourly",
]

# Green in CORRECTNESS_r04.json — retired to the tail so round 5's
# 50-slot window can cover never-verified queries.
_R4_GREEN = [
    "s4_change_feed", "p2_doi_normalize", "p3_title_normalize",
    "p4_license_normalize", "p6_inverted_index", "p7_merge_key",
    "p15_boolean_normalize", "p7_merge_key_badtitle", "p5_author_key_blocks",
    "multimodal_decode", "ann_ivf_topk", "embedding_neardup_pairs",
    "a7_histogram_zero_bucket", "a8_tall_metrics", "s6_json_export_shape",
    "skew_salted_agg", "skew_salted_join", "multimodal_frame_sample",
    "multimodal_resize", "j9_merge_scd1_batch", "j9_merge_state_rounds",
    "d3_best_location_pick", "d4_oa_status", "d6_unique_gate_match",
    "d7_type_classification", "d11_entity_aggregates", "d12_curation_overlay",
    "p8_affiliation_filter", "p9_langcode_map", "p10_version_detect",
    "p11_oai_id_extract", "s8_model_inference", "d8_reference_resolution",
    "d5_percentile_flags", "d6_and_cascade", "d7_type_cascade",
    "d0_works_build", "p12_tei_extract", "d0_works_enriched",
    "udf_award_normalize", "udf_names_compatible_pairs",
    "udf_priority_best_fold", "award_family_merge", "f_string_date_battery",
]

# Never driver-verified (deferred two rounds) — FRONT of round 5's window.
_DEFER_NEXT = [
    "text_fingerprint_winnow", "dedup_connected_components",
    "sample_stratified_hash", "decontaminate_eval_overlap",
    "quality_filter_gate", "award_oa_compliance",
    "s3_identifier_and_variables", "u1_conform_union", "a6_distinct_pairs",
    "j12_using_join", "u3_union_missing_columns", "f_map_battery",
    "f_hof_predicate_battery", "f_null_setops_battery",
    "f_array_map_json_battery",
]

# Errored in r4 on the (now-fixed) events-loader NTZ bug — must re-verify.
_EV_RETRY = [
    "ev_scd1_latest_state", "ev_sessionize", "ev_expectations_gate",
    "ev_json_extract", "ev_sliding_30m", "ev_watermark_late_drop",
]


# Green in CORRECTNESS_r05.json (all 50 of round 5's window) — retired
# to the tail so round 6's window covers never-verified queries.
_R5_GREEN = _DEFER_NEXT + _EV_RETRY + [
    "agg_pivot_status", "f_unpivot_melt", "quality_gopher_repetition",
    "pii_scrub_redact", "search_boolean_retrieval", "dedup_segments_exact",
    "search_bm25_topk", "ann_sq8_topk", "mixture_rebalance_sample",
    "pack_sequences_chunked", "sample_importance_weighted", "ev_funnel_steps",
    "ev_session_window", "ev_scd2_history", "s4_incremental_agg_maintenance",
    "semdedup_prune", "d6_pattern_cascade", "j14_asof_join",
    "ev_hypertable_rollup", "sketch_countmin_estimates", "j15_range_join",
    "ev_gapfill_locf", "sketch_hll_distinct", "sketch_bloom_probe",
    "graph_triangle_count",
]

# Never driver-verified (added late in round 5; locally parity-green) —
# FRONT of round 6's window for hard CORRECTNESS rows.  Also here:
# queries whose semantics CHANGED in round 6 (the audit now measures the
# trained index; pagerank now runs to its exact fixed point), so their
# old green rows no longer vouch for the current behavior.
_R6_FRONT = [
    "dedup_prefix_filter_pairs", "sketch_hll_merge_rollup",
    "sketch_bloom_join_prune", "graph_label_propagation",
    "hierarchy_flatten_doubling", "layout_zorder_stats",
    "profile_table_stats", "quality_lm_surprisal", "kmeans_lloyd_step",
    "ann_ivf_multiprobe_topk", "ann_recall_audit", "w9_range_frame_trailing",
    "fit_isotonic_pava", "graph_pagerank_fixedpoint",
    "udf_award_family_battery", "d7_reference_cascade", "d7_dict_fallback",
]


def _driver_order() -> list[str]:
    """Window composition: never-verified queries first (round 5's late
    additions), then anything newer added this round, then the retired
    green tail (r5, then r4, then r2)."""
    front = [n for n in _R6_FRONT if n in _q.CATALOG]
    back = set(front) | set(_R5_GREEN) | set(_R4_GREEN) | set(_R2_GREEN)
    fresh = [n for n in _q.CATALOG if n not in back]
    tail = [n for n in _R5_GREEN + _R4_GREEN + _R2_GREEN if n in _q.CATALOG]
    return front + fresh + tail


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _q.CATALOG[name].spark for name in _driver_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted → rows-only check)."""
    return {
        name: _q.CATALOG[name].oracle
        for name in _driver_order()
        if _q.CATALOG[name].oracle is not None
    }
