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
    its input for exactly this reason).  The CALLER asserts the
    fixed-width contract; this guard still refuses maps, structs, and
    nested arrays, where per-row cost is unbounded or hidden.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = []
    for f in df.schema.fields:
        t = f.dataType
        if isinstance(t, (MapType, StructType)):
            bad.append(f.name)
        elif isinstance(t, ArrayType) and isinstance(
            t.elementType, (ArrayType, MapType, StructType)
        ):
            bad.append(f.name)
    if bad:
        raise ValueError(
            f"refusing to persist nested-container columns {bad}: only "
            "scalars and fixed-width scalar arrays are cacheable "
            "(memory-cliff guard)"
        )
    if level is not None:
        return df.persist(level)
    return df.persist()  # MEMORY_AND_DISK: spills, never OOMs
