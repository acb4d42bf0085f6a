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
# ``queries()`` in insertion order, so the order below IS the hard
# sf0.01 re-verification schedule.  ``driver_window_state.json``
# records each query's most-recent green CORRECTNESS round plus the
# ordered never-verified backlog; it is MACHINE-maintained — at round
# start, ``python scripts/record_round.py <N>`` ingests the driver's
# CORRECTNESS_r0N.json (green rows -> last_green=N, drained from
# pending) so no hand-edited per-round list can drift from the driver's
# actual artifacts (the round-8 failure mode).  ``_driver_order``
# fronts queries changed since their last green, then the backlog
# oldest-debt-first, then brand-new queries, then the stalest greens.
# Hand-maintained residue is only ``_CHANGED_THIS_ROUND`` /
# ``_WINDOW_EXEMPT`` — both mechanically audited against git AND
# against the committed output goldens by tests/test_driver_window.py.

_STATE_PATH = os.path.join(_REPO_ROOT, "driver_window_state.json")
with open(_STATE_PATH, encoding="utf-8") as _f:
    _STATE = __import__("json").load(_f)

# query name -> round of its most recent green driver row
_LAST_GREEN: dict[str, int] = {
    k: int(v) for k, v in _STATE["last_green"].items()
}

# Queries whose plan or semantics changed SINCE their last green driver
# row, so that row no longer vouches for current behavior.  These MUST
# win window slots even over never-verified new queries: a stale green
# is worse than an unchecked new query because it *looks* verified.
# Appended by the round as changes land; membership is cross-checked
# mechanically against git by tests/test_driver_window.py (queries whose
# defining module changed since the last round-boundary commit must be
# here or never-verified).
_CHANGED_THIS_ROUND: list[str] = [
    # r15 OPTIMIZATION round replans (outputs proven identical: sf0.01
    # oracle parity + byte-stable goldens; see OPTIMIZATION_r15.md):
    # - checkpoint-truncated doubling/propagation loops
    #   (operators/checkpoints.py run_truncated_loop): the unrolled
    #   plans re-instantiated every earlier round geometrically (3^4 =
    #   81 base copies / 243 input scans for the lineage closure); each
    #   round now executes exactly once
    "institution_ancestors_lineage",
    "hierarchy_flatten_doubling",
    "graph_label_propagation",
    # - one-window density edge plane (operators/density.py; the r14
    #   verdict's #1 landing): the second full-frame nth_value window —
    #   and its full partition-local re-sort of the mirrored pair plane
    #   — is replaced by a persist_scalar'd single-window output feeding
    #   a (g, pt) core table joined onto the eps-pre-filtered
    #   candidates; outputs bit-identical, A/B 8.07 -> 6.43 s at sf0.1
    "overmerge_density_split",
    "overmerge_screened_density",
    # - map-side array-intersection verify for the exact set-similarity
    #   join (queries/llmdata.py): the candidate x tokens exploded
    #   verify join and its 9M-row aggregate are gone; n_inter/n_union/
    #   jaccard bit-identical, A/B 5.37 -> 3.69 s at sf0.1
    "dedup_prefix_filter_pairs",
    # - parallelizing key-only repartition under single-row-group
    #   fixture scans feeding regex-heavy parses (the scan is ONE task
    #   no matter what maxPartitionBytes says, so these parses ran on
    #   one core): letten 55-74 s -> 5.6-6.0 s at sf0.1; rows identical,
    #   goldens order-insensitive and unchanged
    "letten_parse_laureates",
    "acmedsci_parse_awards",
    "laureate_prize_parse",
    "method5_parse_awards",
]

# Queries whose defining MODULE changed this round but whose own plan
# and semantics provably did not (e.g. a sibling query was added to the
# module, or a comment-only edit).  Each entry needs a reason the judge
# can check against the diff; tests/test_driver_window.py rejects any
# module-changed green query that is neither here nor in
# _CHANGED_THIS_ROUND.  Reset to {} at every round boundary.
#
# The r15 OPERATOR diffs that trip the one-hop import audit are:
# - operators/guardrails.py: persist_scalar gained a DOCSTRING (the
#   session-owner release contract) and persist_fixed_width now rejects
#   non-numeric array elements — its ONLY call site is the trainer's
#   array<bigint> quantized corpus (grep: one call, queries/advanced.py
#   train_ivf_centroids), which was accepted before and after, so no
#   query's plan or output changes.
# - operators/checkpoints.py: a NEW helper (run_truncated_loop) was
#   added; the pre-existing janitor/lock code is untouched, so
#   pagerank_fixedpoint / connected_components callers are unaffected
#   (their call sites changed in r14 and were driver-verified then).
_WINDOW_EXEMPT: dict[str, str] = {
    # llmdata.py's one r15 edit is dedup_prefix_filter_pairs' verify
    # rewrite (fronted in _CHANGED_THIS_ROUND); every other query in
    # the module is untouched.  The module is additionally flagged for
    # importing guardrails' persist guards (docstring + a fixed-width
    # element check whose sole call site is advanced.py's trainer) and
    # the checkpoints module (this module's iterative call site,
    # dedup_connected_components via components.py, is plan-identical:
    # the janitor code it uses is untouched).
    name: (
        "sibling-module flag only: llmdata.py's r15 edit is the "
        "dedup_prefix_filter_pairs verify rewrite (fronted); this query "
        "is untouched; the flagged operator diffs are the persist-guard "
        "docstring/element-check (only call site: advanced.py trainer, "
        "array<bigint> — accepted before and after) and a NEW "
        "checkpoints helper this module does not call; golden unchanged")
    for name in (
        "text_quality_features", "text_lang_id", "dedup_exact_documents",
        "dedup_minhash_lsh_pairs", "dedup_simhash", "ann_cosine_topk",
        "llm_judge_verdicts", "text_token_stats", "dedup_ngram_jaccard",
        "llm_embed_vectors", "text_fingerprint_winnow",
        "dedup_connected_components", "sample_stratified_hash",
        "decontaminate_eval_overlap", "quality_filter_gate",
        "quality_gopher_repetition", "pii_scrub_redact",
        "search_boolean_retrieval", "dedup_segments_exact",
        "search_bm25_topk", "ann_sq8_topk", "mixture_rebalance_sample",
        "pack_sequences_chunked", "sample_importance_weighted",
        "quality_lm_surprisal",
        "chunk_documents_overlap", "bpe_top_merges", "crawl_drain_queue",
        "search_hybrid_rrf",
    )
}
_WINDOW_EXEMPT.update({
    # advanced.py is unedited; flagged for the same guardrails /
    # checkpoints import.  The persist_fixed_width element-check DOES
    # gate its trainer call site — but the cached frame is (vec_id
    # bigint, qx array<bigint>), numeric before and after, so the guard
    # accepts identically and the trainer's plan is byte-identical.
    name: (
        "import-flag only: advanced.py is unedited in r15; its "
        "persist_fixed_width call caches (bigint, array<bigint>) which "
        "the tightened numeric-element guard accepts unchanged; the new "
        "checkpoints helper is not called here; golden unchanged")
    for name in (
        "p5_author_key_blocks", "multimodal_decode", "ann_ivf_topk",
        "embedding_neardup_pairs", "a7_histogram_zero_bucket",
        "a8_tall_metrics", "s6_json_export_shape", "skew_salted_agg",
        "skew_salted_join", "multimodal_frame_sample", "multimodal_resize",
        "semdedup_prune", "kmeans_lloyd_step", "ann_ivf_multiprobe_topk",
        "ann_ivf_trained_topk", "ann_recall_audit", "ann_srp_bucket_pairs",
        "s6_export_authors_shape", "s6_export_salt_ladder",
        "s6_export_funders_shape", "s6_export_sources_shape",
        "s6_export_topic_hierarchy_shape", "s6_export_institutions_shape",
        "s6_export_publishers_shape", "s6_export_keywords_shape",
        "s6_export_awards_shape", "s6_export_concepts_shape",
        "s6_export_common_entities",
    )
})
_WINDOW_EXEMPT.update({
    # domain2.py / nested.py / timeseries.py / sketches.py are unedited;
    # flagged only for importing guardrails' persist_scalar, whose r15
    # diff is docstring-only for that function.
    name: (
        "import-flag only: this module is unedited in r15 and imports "
        "only persist_scalar from the changed guardrails module — the "
        "r15 diff to persist_scalar is docstring-only (session-owner "
        "contract note); golden unchanged")
    for name in (
        "j9_merge_scd1_batch", "j9_merge_state_rounds", "a6_distinct_pairs",
        "d3_best_location_pick", "d4_oa_status", "d6_unique_gate_match",
        "d7_type_classification", "d11_entity_aggregates",
        "d12_curation_overlay", "p8_affiliation_filter", "p9_langcode_map",
        "p10_version_detect", "p11_oai_id_extract", "s8_model_inference",
        "d8_reference_resolution", "d5_percentile_flags", "d6_and_cascade",
        "d7_type_cascade", "award_oa_compliance",
        "d0_works_build", "p12_tei_extract", "d0_works_enriched",
        "fulltext_work_build",
        "j14_asof_join", "ev_hypertable_rollup", "sketch_countmin_estimates",
        "j15_range_join", "ev_gapfill_locf", "w9_range_frame_trailing",
        "fit_isotonic_pava",
        "sketch_hll_distinct", "sketch_bloom_probe",
        "sketch_hll_merge_rollup", "sketch_bloom_join_prune",
    )
})
_WINDOW_EXEMPT.update({
    # overmerge.py is unedited; flagged for importing the changed
    # density operator, whose only two call sites —
    # overmerge_density_split and overmerge_screened_density — are
    # fronted in _CHANGED_THIS_ROUND (grep: density_split_stats is
    # called nowhere else).  These two siblings never call the density
    # operator.
    name: (
        "import-flag only: overmerge.py's r15 flag is the density "
        "operator edit; its only call sites (the two density queries) "
        "are fronted, and this query does not call density_split_stats; "
        "golden unchanged")
    for name in ("overmerge_pairwise_signal", "overmerge_centroid_fit")
})
_WINDOW_EXEMPT.update({
    # graphops.py's r15 edits are the checkpoint-truncated LPA and
    # doubling loops (both fronted); pagerank/triangle are untouched
    # column algebra in the same module.  enrichmerge.py's r15 edit is
    # institution_ancestors_lineage (fronted); its siblings are
    # untouched.
    name: (
        "sibling-module flag only: this module's r15 change is the "
        "checkpoint-truncated loop in a SIBLING query (fronted in "
        "_CHANGED_THIS_ROUND); this query's own code is untouched; "
        "golden unchanged")
    for name in (
        "graph_pagerank_fixedpoint", "graph_triangle_count",
        "topics_merge_output", "concepts_keywords_dynamic",
    )
})

# Every query with a green driver row, stalest round first (name
# tie-break) — the tail of the re-verification schedule.
_ROTATION = [
    name for name, _ in sorted(_LAST_GREEN.items(), key=lambda kv: (kv[1], kv[0]))
]

# Ordered never-verified backlog (oldest debt first; round-9 additions
# queue behind the round-8 overflow).  Maintained by record_round.py:
# greens drain out, brand-new catalog entries append.
_NEVER_VERIFIED_BACKLOG = [n for n in _STATE["pending"]]


def _driver_order() -> list[str]:
    """Changed-since-last-green first, then the never-verified backlog
    oldest-debt-first, then every green query oldest-green-first, then
    queries added mid-round (not yet in the state file) last.

    Mid-round additions queue BEHIND the stale-green rotation (round-10
    change): they are parity+golden-green locally and enter the pending
    backlog at the next boundary (record_round.py), where they front the
    NEXT window — whereas a round-2 green has gone many rounds without a
    hard driver check and must win the contested slots now.  With the
    backlog large this is what keeps the drain schedule converging."""
    front = [n for n in _CHANGED_THIS_ROUND if n in _q.CATALOG]
    known = set(front) | set(_ROTATION) | set(_NEVER_VERIFIED_BACKLOG)
    backlog = [
        n for n in _NEVER_VERIFIED_BACKLOG
        if n in _q.CATALOG and n not in set(front)
    ]
    tail = [n for n in _ROTATION if n in _q.CATALOG and n not in set(front)]
    fresh = [n for n in _q.CATALOG if n not in known]
    return front + backlog + tail + fresh


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
