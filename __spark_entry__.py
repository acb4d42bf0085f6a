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
_CHANGED_THIS_ROUND: list[str] = []

# Queries whose defining MODULE changed this round but whose own plan
# and semantics provably did not (e.g. a sibling query was added to the
# module, or a comment-only edit).  Each entry needs a reason the judge
# can check against the diff; tests/test_driver_window.py rejects any
# module-changed green query that is neither here nor in
# _CHANGED_THIS_ROUND.  Reset to {} at every round boundary.
_WINDOW_EXEMPT: dict[str, str] = {}

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
