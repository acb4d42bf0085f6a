"""Semantic contracts for the sketch / graph / mixture operators.

Oracle parity (test_parity.py) already pins Spark == DuckDB; these tests
pin the operators' MATHEMATICAL contracts — the properties a user relies
on that bit-parity alone doesn't prove (estimator accuracy, zero false
negatives, probability-mass behavior, fair-share capping).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openalex_walden_spark import queries as q

q.load_all()


def _run(spark, sf_dir, name):
    return q.CATALOG[name].spark(spark, sf_dir)


def test_hll_estimate_tracks_exact_distinct(spark, sf_dir, duck):
    est = {
        (r["l_returnflag"], r["l_linestatus"]): r["hll_estimate"]
        for r in _run(spark, sf_dir, "sketch_hll_distinct").collect()
    }
    exact = {
        (rf, ls): n
        for rf, ls, n in duck.sql(
            "SELECT l_returnflag, l_linestatus, COUNT(DISTINCT l_partkey) "
            "FROM lineitem GROUP BY 1, 2"
        ).fetchall()
    }
    assert set(est) == set(exact)
    for key, n in exact.items():
        # 512 registers → standard error 1.04/sqrt(512) ≈ 4.6%; allow 3σ.
        assert est[key] == pytest.approx(n, rel=0.15), (key, est[key], n)


def test_bloom_has_zero_false_negatives(spark, sf_dir):
    rows = {
        (r["bloom_maybe"], r["truly_present"]): r["n_customers"]
        for r in _run(spark, sf_dir, "sketch_bloom_probe").collect()
    }
    # A present key must always probe positive.
    assert (False, True) not in rows
    # The filter must accept every inserted key (the TT quadrant exists
    # whenever the build set is non-empty).
    assert rows.get((True, True), 0) > 0


def test_pagerank_scores_positive_and_mass_bounded(spark, sf_dir):
    rows = _run(spark, sf_dir, "graph_pagerank_fixedpoint").collect()
    n = len(rows)
    assert n > 0
    total = sum(r["pagerank_fp"] for r in rows)
    one = 1_000_000_000_000
    base = 150_000_000_000
    # Every node holds at least the teleport mass; total mass never
    # exceeds the starting mass (dangling mass only leaks out).
    assert all(r["pagerank_fp"] >= base for r in rows)
    assert n * base <= total <= n * one
    # The damping sink must actually differentiate nodes.
    assert len({r["pagerank_fp"] for r in rows}) > 1


def test_session_window_consistent_with_batch_sessionize(spark, sf_dir):
    native = _run(spark, sf_dir, "ev_session_window")
    batch = _run(spark, sf_dir, "ev_sessionize")
    # Same session partitioning → identical (user, n_events) multisets.
    n_nat = sorted(
        (r["user_id"], r["n_events"]) for r in native.collect()
    )
    n_bat = sorted(
        (r["user_id"], r["n_events"]) for r in batch.collect()
    )
    assert n_nat == n_bat
    # Session windows never overlap for one user: start >= previous end
    # is too strict (end = last + gap, gap defines the split), but
    # starts must be strictly increasing and start < end everywhere.
    from collections import defaultdict

    per_user = defaultdict(list)
    for r in native.collect():
        per_user[r["user_id"]].append(
            (r["session_start_us"], r["session_end_us"])
        )
    for spans in per_user.values():
        spans.sort()
        assert all(s < e for s, e in spans)
        assert all(
            spans[i][1] <= spans[i + 1][0] for i in range(len(spans) - 1)
        )


def test_semdedup_census_conserves_vectors(spark, sf_dir):
    rows = _run(spark, sf_dir, "semdedup_prune").collect()
    for r in rows:
        assert r["n_kept"] + r["n_pruned"] == r["n_vectors"]
        assert r["n_kept"] >= 1  # the lowest-id vector always survives


def test_mixture_rebalance_caps_every_source_at_fair_share(spark, sf_dir):
    rows = _run(spark, sf_dir, "mixture_rebalance_sample").collect()
    total = sum(r["tokens_before"] for r in rows)
    fair = total / len(rows)
    for r in rows:
        assert 0 <= r["n_docs_after"] <= r["n_docs_before"]
        assert r["tokens_after"] <= r["tokens_before"]
        # An under-represented source is never downsampled.
        if r["tokens_before"] <= fair:
            assert r["keep_threshold"] == 1_000_000
            assert r["n_docs_after"] == r["n_docs_before"]
        # Hash sampling is unbiased: kept tokens land near
        # rate * tokens_before (loose 3σ-ish bound, small fixtures).
        expected = r["keep_threshold"] / 1_000_000 * r["tokens_before"]
        assert r["tokens_after"] == pytest.approx(expected, rel=0.35), r


def test_mixture_sample_is_deterministic_across_runs(spark, sf_dir):
    a = _run(spark, sf_dir, "mixture_rebalance_sample").collect()
    b = _run(spark, sf_dir, "mixture_rebalance_sample").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
