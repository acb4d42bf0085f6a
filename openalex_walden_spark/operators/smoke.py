"""Snapshot smoke tests (SURVEY.md §5 layer 3) as engine operators.

The reference validates every published snapshot with a 27-cell
notebook (``notebooks/snapshot/smoke_tests.ipynb``): id-format regexes
per entity, null/duplicate checks, JSON validity of truncated fields,
manifest + partition-path coherence. Those checks are operational code
there; here they are a reusable harness over an exported snapshot
directory — each check one aggregate pass, all failures collected into
one report (the guardrails contract, ``operators/guardrails.py``).

Scale: every check is a single scan-aggregate over the export (count /
count_if), so the whole battery is one job per check over data that is
already serving-shaped — no joins, no shuffles beyond the final count.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
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
