"""Snapshot smoke tests (SURVEY.md §5 layer 3) as engine operators.

The reference validates every published snapshot with a 27-cell
notebook (``notebooks/snapshot/smoke_tests.ipynb``), thirteen check
families: per-entity id-format regexes (T1), entity counts vs an
expected total with tolerance (T2), field completeness vs the
canonical serving field list (T3), sampled-record comparison (T4),
authorship/affiliation population rates (T5/5b), nested structure spot
checks (T6), null checks on required fields (T7), duplicate ids (T8),
manifest validation (T9), partition path format (T10), truncated-JSON
validity (T11), updated-date recency (T12), and keyword/SDG population
rates (T13).  Those checks are operational notebook code there; here
they are a reusable harness: ``smoke_aggregate`` compiles the
scan-shaped checks (T1/T5/T7/T8/T13-style) into ONE aggregate pass
over the snapshot frame, the directory-shaped checks (T9/T10) walk the
export layout, and the schema-shaped checks (T3/T6) introspect
fields — all failures collected into one report (the guardrails
contract, ``operators/guardrails.py``).  The API-facing halves of
T2/T4 are a network seam: the caller supplies the expected count /
expected records, the harness does the comparison.

Scale: every frame check rides a single scan-aggregate (count /
count_if), so the whole battery is one job over data that is already
serving-shaped — no joins, no shuffles beyond the final count.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class SmokeResult:
    name: str
    ok: bool
    detail: str


class SmokeFailure(AssertionError):
    def __init__(self, report: list[SmokeResult]):
        self.report = report
        failed = [r for r in report if not r.ok]
        super().__init__(
            "snapshot smoke tests failed: "
            + "; ".join(f"{r.name} ({r.detail})" for r in failed)
        )


def _check(name: str, ok: bool, detail: str) -> SmokeResult:
    return SmokeResult(name=name, ok=ok, detail=detail)


def smoke_test_snapshot(
    spark: SparkSession,
    path: str,
    id_field: str,
    id_pattern: str,
    required_fields: tuple[str, ...] = (),
    raise_on_failure: bool = True,
) -> list[SmokeResult]:
    """Validate an ``export_snapshot`` directory end-to-end.

    Checks (each mirrors a smoke_tests.ipynb cell):
    1. every line parses as JSON and carries the id field,
    2. ids match ``id_pattern`` (the per-entity regex),
    3. ids are unique,
    4. required fields are non-null,
    5. the manifest exists and its file list + byte totals match disk.
    """
    # only the data files — the directory also holds manifest.json
    docs = spark.read.text(os.path.join(path, "part-*"))
    id_col = F.get_json_object(F.col("value"), f"$.{id_field}")

    agg_exprs = [
        F.count("*").alias("n"),
        F.count_if(id_col.isNull()).alias("bad_json_or_id"),
        F.count_if(~id_col.rlike(id_pattern) & id_col.isNotNull()).alias("bad_format"),
        F.countDistinct(id_col).alias("n_ids"),
    ]
    for rf in required_fields:
        agg_exprs.append(
            F.count_if(
                F.get_json_object(F.col("value"), f"$.{rf}").isNull()
            ).alias(f"null_{rf}")
        )
    row = docs.agg(*agg_exprs).collect()[0]

    report = [
        _check("json_and_id_present", row["bad_json_or_id"] == 0,
               f"{row['bad_json_or_id']}/{row['n']} rows missing parseable id"),
        _check("id_format", row["bad_format"] == 0,
               f"{row['bad_format']} ids fail /{id_pattern}/"),
        _check("id_unique", row["n_ids"] == row["n"] - row["bad_json_or_id"],
               f"{row['n'] - row['bad_json_or_id'] - row['n_ids']} duplicate ids"),
    ]
    for rf in required_fields:
        report.append(
            _check(f"required_{rf}", row[f"null_{rf}"] == 0,
                   f"{row[f'null_{rf}']} rows missing {rf}")
        )

    manifest_path = os.path.join(path, "manifest.json")
    if not os.path.exists(manifest_path):
        report.append(_check("manifest_exists", False, "manifest.json missing"))
    else:
        with open(manifest_path) as fh:
            manifest = json.load(fh)
        on_disk = sorted(
            f for f in os.listdir(path)
            if f.startswith("part-") and not f.endswith(".crc")
        )
        listed = sorted(e["file"] for e in manifest.get("entries", []))
        sizes_ok = all(
            os.path.getsize(os.path.join(path, e["file"])) == e["bytes"]
            for e in manifest.get("entries", [])
            if os.path.exists(os.path.join(path, e["file"]))
        )
        report.append(
            _check("manifest_files_match", listed == on_disk,
                   f"manifest lists {len(listed)} files, disk has {len(on_disk)}")
        )
        report.append(_check("manifest_sizes_match", sizes_ok, "byte counts diverge"))

    if raise_on_failure and any(not r.ok for r in report):
        raise SmokeFailure(report)
    return report


# --------------------------------------------------------------------------
# Single-pass health aggregate (T1/T5/T7/T8/T12/T13 in one scan)
# --------------------------------------------------------------------------
def smoke_aggregate(
    df: DataFrame,
    id_col: str = "id",
    id_pattern: str = r"^https://openalex[.]org/W[0-9]+$",
    required_fields: tuple[str, ...] = (),
    populated: dict[str, Column] | None = None,
    updated_col: str | None = None,
    as_of: str | None = None,
) -> DataFrame:
    """Compile the scan-shaped smoke checks into ONE aggregate row:
    total / null-id / malformed-id / duplicate-id counts (T1+T8),
    per-required-field null counts (T7), per-signal population counts
    (T5/T13 — each entry a boolean Column), and the snapshot's staleness
    in days vs ``as_of`` (T12, integer so the row hashes exactly).
    One shuffle-free scan; the final exchange carries one row."""
    aggs = [
        F.count("*").cast("bigint").alias("n_total"),
        F.count_if(F.col(id_col).isNull()).cast("bigint").alias("n_null_id"),
        F.count_if(
            F.col(id_col).isNotNull() & ~F.col(id_col).rlike(id_pattern)
        ).cast("bigint").alias("n_bad_id_format"),
        (F.count(id_col) - F.countDistinct(id_col)).cast("bigint").alias("n_dup_ids"),
    ]
    for rf in required_fields:
        aggs.append(
            F.count_if(F.col(rf).isNull()).cast("bigint").alias(f"n_null_{rf}")
        )
    for name, cond in (populated or {}).items():
        aggs.append(F.count_if(cond).cast("bigint").alias(f"n_{name}"))
    if updated_col is not None and as_of is not None:
        aggs.append(
            F.datediff(F.lit(as_of).cast("date"), F.max(F.col(updated_col)))
            .cast("bigint")
            .alias("days_stale")
        )
    return df.agg(*aggs)


# --------------------------------------------------------------------------
# T2: count vs expected (the API half is the caller's seam)
# --------------------------------------------------------------------------
def count_tolerance_check(
    name: str, observed: int, expected: int, tolerance: float = 0.05
) -> SmokeResult:
    """T2: |observed - expected| / expected within tolerance (reference
    compares the snapshot count to the live API count at 5%)."""
    if expected == 0:
        diff = 0.0 if observed == 0 else float("inf")
    else:
        diff = abs(observed - expected) / expected
    return _check(
        f"count_{name}", diff <= tolerance,
        f"observed={observed} expected={expected} diff={diff:.2%}",
    )


# --------------------------------------------------------------------------
# T3/T6: field + nested-structure completeness
# --------------------------------------------------------------------------
def schema_completeness_check(
    name: str,
    actual_fields: set[str],
    expected_fields: set[str],
    known_exclusions: frozenset[str] = frozenset(),
    known_extras: frozenset[str] = frozenset(),
) -> SmokeResult:
    """T3: every canonical serving field present (minus the documented
    exclusions); extras beyond the documented ones are reported but not
    fatal — mirroring the notebook, which only fails on MISSING."""
    missing = expected_fields - actual_fields - known_exclusions
    extra = actual_fields - expected_fields - known_extras
    detail = f"{len(actual_fields)} fields"
    if missing:
        detail += f"; MISSING: {sorted(missing)}"
    if extra:
        detail += f"; extra (non-fatal): {sorted(extra)}"
    return _check(f"field_completeness_{name}", not missing, detail)


def nested_structure_check(
    df: DataFrame, col: str, expected_subfields: set[str]
) -> SmokeResult:
    """T6: the nested struct (or array-of-struct) column carries every
    expected subfield — checked against the SCHEMA, not a sampled row,
    so an empty snapshot still validates its shape."""
    dt = df.schema[col].dataType
    inner = getattr(dt, "elementType", dt)  # array<struct> -> struct
    actual = {f.name for f in getattr(inner, "fields", [])}
    missing = expected_subfields - actual
    return _check(
        f"nested_structure_{col}", not missing,
        f"missing subfields: {sorted(missing)}" if missing else
        f"all {len(expected_subfields)} subfields present",
    )


# --------------------------------------------------------------------------
# T10: partition path format
# --------------------------------------------------------------------------
def partition_path_check(
    path: str, key: str = "updated_date", value_pattern: str = r"\d{4}-\d{2}-\d{2}"
) -> SmokeResult:
    """T10: every ``<key>=`` partition directory under ``path`` carries a
    plain date value — an URL-encoded colon ('%3A') or a timestamp
    suffix means the export partitioned on an un-truncated timestamp
    (the reference's observed failure shape)."""
    parts = [
        d for d in os.listdir(path)
        if d.startswith(f"{key}=") and os.path.isdir(os.path.join(path, d))
    ]
    rx = re.compile(rf"^{re.escape(key)}={value_pattern}$")
    bad = [d for d in parts if "%3A" in d or "00:00:00" in d or not rx.match(d)]
    ok = bool(parts) and not bad
    detail = f"{len(parts)} partitions"
    if bad:
        detail += f", malformed: {bad[:3]}"
    elif not parts:
        detail = "no partitions found"
    return _check(f"partition_format_{key}", ok, detail)


# --------------------------------------------------------------------------
# T11: truncated-JSON validity
# --------------------------------------------------------------------------
def json_field_validity_check(
    df: DataFrame,
    col: str,
    json_schema: str = "map<string,array<int>>",
    threshold: int = 0,
) -> SmokeResult:
    """T11: every non-null value of ``col`` must still parse as JSON of
    the serving shape (the truncation path must never emit a torn
    document).  ``from_json`` returning NULL for a non-null input IS
    the parse failure — no Python UDF in the scan."""
    row = df.agg(
        F.count_if(F.col(col).isNotNull()).alias("n_vals"),
        F.count_if(
            F.col(col).isNotNull() & F.from_json(F.col(col), json_schema).isNull()
        ).alias("n_invalid"),
    ).collect()[0]
    return _check(
        f"json_valid_{col}", row["n_invalid"] <= threshold,
        f"{row['n_invalid']}/{row['n_vals']} invalid JSON values "
        f"(threshold <= {threshold})",
    )


def population_rate_check(
    name: str, populated: int, total: int, min_rate: float
) -> SmokeResult:
    """T5/T13: population-rate floor (authorships, affiliations,
    keywords, SDGs ... as count pairs from ``smoke_aggregate``)."""
    rate = populated / total if total else 0.0
    return _check(
        f"population_{name}", rate >= min_rate,
        f"{populated}/{total} ({rate:.1%}) vs floor {min_rate:.0%}",
    )


def recency_check(days_stale: int | None, max_days: int = 7) -> SmokeResult:
    """T12: the newest updated_date must be recent."""
    ok = days_stale is not None and days_stale <= max_days
    return _check(
        "updated_date_recency", ok,
        f"max updated_date is {days_stale} days old (threshold <= {max_days})",
    )
