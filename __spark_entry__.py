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

# Unverified queries that don't fit the 50-slot window this round.
# Chosen because their §2 ops already hold a driver-green row via
# another query (S3 via every scan, U1 inside d1_priority_merge, A6 via
# the W1/W2 ladders, §2.8 vocabulary via the two batteries kept
# in-window) — they take the front of round 4's window.
_DEFER_NEXT = [
    # new this round — front of round 4's window
    "text_fingerprint_winnow", "dedup_connected_components",
    "sample_stratified_hash", "decontaminate_eval_overlap",
    "quality_filter_gate", "award_oa_compliance",
    "s3_identifier_and_variables", "u1_conform_union", "a6_distinct_pairs",
    "j12_using_join", "u3_union_missing_columns", "f_map_battery",
    "f_hof_predicate_battery", "f_null_setops_battery",
    # deferred to make room for j9_merge_state_rounds (the new bucketed
    # MERGE layer belongs under this round's gate); §2.8 keeps
    # f_string_date_battery in-window
    "f_array_map_json_battery",
]


def _driver_order() -> list[str]:
    back = set(_R2_GREEN) | set(_DEFER_NEXT)
    front = [n for n in _q.CATALOG if n not in back]
    tail = [n for n in _DEFER_NEXT + _R2_GREEN if n in _q.CATALOG]
    return front + tail


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
