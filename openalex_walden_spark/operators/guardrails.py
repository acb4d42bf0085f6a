"""Guardrails: blocking post-build QA checks (SURVEY.md §5 layer 2).

The reference gates its nightly DAG on 9 numeric assertions
(``notebooks/end2end/Guardrails.ipynb``: ≤5M rows changed/24h, ≤2M
attribute loss vs pinned baselines, total-works loss ≤2M, citation drop
≤5%) — failure raises and blocks every downstream sync. Same contract
here: declare checks, evaluate them in one pass each, raise
``GuardrailViolation`` with the full report if any fails.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame


class GuardrailViolation(AssertionError):
    """At least one blocking check failed; carries the full report."""

    def __init__(self, report: list["GuardrailResult"]):
        self.report = report
        failed = [r for r in report if not r.ok]
        super().__init__(
            "guardrails failed: "
            + "; ".join(f"{r.name} (value={r.value}, limit={r.limit})" for r in failed)
        )


@dataclass
class GuardrailResult:
    name: str
    value: float
    limit: float
    ok: bool


@dataclass
class Guardrail:
    """One check: ``metric(df) <= limit`` (use negated metrics for
    lower bounds)."""

    name: str
    metric: Callable[[DataFrame], float]
    limit: float


def row_count_drift(previous_count: int) -> Callable[[DataFrame], float]:
    """Absolute row-count change vs the previous snapshot (the ≤5M-rows
    changed / total-loss ≤2M guards)."""

    def m(df: DataFrame) -> float:
        return float(abs(df.count() - previous_count))

    return m


def null_fraction(column: str) -> Callable[[DataFrame], float]:
    """Fraction of NULLs in a column (the ≤5% missing-author-ids guard)."""

    def m(df: DataFrame) -> float:
        from pyspark.sql import functions as F

        row = df.agg(
            F.count("*").alias("n"),
            F.count_if(F.col(column).isNull()).alias("nulls"),
        ).collect()[0]
        return (row["nulls"] / row["n"]) if row["n"] else 0.0

    return m


def attribute_loss(column: str, baseline_non_null: int) -> Callable[[DataFrame], float]:
    """How many non-null values of ``column`` were lost vs a pinned
    baseline count (the attribute-loss ≤2M family)."""

    def m(df: DataFrame) -> float:
        from pyspark.sql import functions as F

        have = df.agg(F.count_if(F.col(column).isNotNull()).alias("n")).collect()[0]["n"]
        return float(max(0, baseline_non_null - have))

    return m


def run_guardrails(df: DataFrame, checks: list[Guardrail]) -> list[GuardrailResult]:
    """Evaluate every check; raise GuardrailViolation if any fails.

    All checks run (no short-circuit) so the report names every breach —
    operators fix one overnight run, not one failure per night.
    """
    report = [
        GuardrailResult(c.name, v, c.limit, v <= c.limit)
        for c in checks
        for v in [float(c.metric(df))]
    ]
    if any(not r.ok for r in report):
        raise GuardrailViolation(report)
    return report


def persist_scalar(df: DataFrame, level=None) -> DataFrame:
    """Persist a reused subplan, refusing nested/array columns.

    Caching an exploded fact whose rows still carry array/map/struct
    columns is a measured memory cliff (the columnar cache builder
    materializes every container) — at 100 TB it's the difference
    between a spillable scalar cache and an executor OOM. Every persist
    in the engine goes through this guard: project the containers away
    (or explode them to rows) first.

    SESSION-OWNER CONTRACT (r14 verdict #7 / ADVICE): a query function
    that persists a subplan its RETURNED DataFrame still reads cannot
    unpersist it — doing so before the caller materializes the result
    would defeat the cache.  Ownership of release therefore sits with
    the session owner: the bench calls ``spark.catalog.clearCache()``
    before every timed run, the full-catalog sweep
    (scripts/driver_sim.py) sweeps between queries, and a long-lived
    production session must do the same between pipeline stages.  All
    caches are within-run subplan reuse, never cross-run result caches.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    if bad:
        raise ValueError(
            f"refusing to persist non-scalar columns {bad}: project or "
            "explode containers before caching (memory-cliff guard)"
        )
    if level is not None:
        return df.persist(level)
    return df.persist()  # MEMORY_AND_DISK: spills, never OOMs


def persist_fixed_width(df: DataFrame, level=None) -> DataFrame:
    """Persist a subplan whose only containers are FIXED-WIDTH arrays
    of scalars (e.g. a quantized embedding: array<bigint> of dim 64).

    The scalar-only guard above exists because caching UNBOUNDED
    containers (documents, token lists, collect_list rollups) is a
    memory cliff.  A fixed-dimension numeric vector is not that case —
    every row costs dim x 8 bytes by construction, the cache stays
    spillable, and caching the quantized corpus across an iterative
    trainer's rounds is the canonical pattern (MLlib's KMeans persists
    its input for exactly this reason).  Array elements must be NUMERIC
    (fixed bytes per element — r14 ADVICE: an array<string> column is
    the unbounded token-list cliff persist_scalar exists to block, so
    this guard must not accept it); LENGTH-boundedness remains the
    caller's assertion, since a schema cannot carry a dimension.  Maps,
    structs, and nested arrays still refuse.
    """
    from pyspark.sql.types import ArrayType, MapType, NumericType, StructType

    bad = []
    for f in df.schema.fields:
        t = f.dataType
        if isinstance(t, (MapType, StructType)):
            bad.append(f.name)
        elif isinstance(t, ArrayType) and not isinstance(
            t.elementType, NumericType
        ):
            bad.append(f.name)
    if bad:
        raise ValueError(
            f"refusing to persist non-numeric container columns {bad}: "
            "only scalars and fixed-width NUMERIC arrays are cacheable "
            "(memory-cliff guard)"
        )
    if level is not None:
        return df.persist(level)
    return df.persist()  # MEMORY_AND_DISK: spills, never OOMs
