#!/usr/bin/env python
"""Regenerate the committed golden output fingerprints.

Usage:
    python scripts/gen_goldens.py            # all catalog queries
    python scripts/gen_goldens.py q1 q2 ...  # refresh only the named ones

Writes ``tests/goldens_sf0001.json``: one ``{"rows": N, "hash": sha256}``
per catalog query, computed at the test scale factor (sf0.001 unless
``SPARK_GRAFT_TEST_SF_DIR`` points elsewhere) with the SAME Spark session
config as ``tests/conftest.py`` so the parity suite reproduces the hash
bit-for-bit.  The fingerprint is order-insensitive (rows and columns are
canonically sorted before hashing — ``oracle.golden_hash``), so partition
count and task order cannot perturb it.

Workflow contract (enforced by tests/test_driver_window.py): regenerating
a golden whose query already has a green driver row REQUIRES fronting that
query in ``__spark_entry__._CHANGED_THIS_ROUND`` — the boundary-diff audit
compares this file against its version at the round-boundary commit.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDENS_PATH = os.path.join(REPO, "tests", "goldens_sf0001.json")
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    from pyspark.sql import SparkSession

    from openalex_walden_spark import queries as q
    from openalex_walden_spark.oracle import golden_hash

    q.load_all()
    only = set(sys.argv[1:])
    unknown = only - set(q.CATALOG)
    if unknown:
        print(f"unknown queries: {sorted(unknown)}", file=sys.stderr)
        return 2

    existing: dict[str, dict] = {}
    if os.path.exists(GOLDENS_PATH):
        with open(GOLDENS_PATH, encoding="utf-8") as f:
            existing = json.load(f)

    # Mirror tests/conftest.py exactly — the parity suite must reproduce
    # every hash this script writes.
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("openalex-walden-spark-goldens")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = sorted(only) if only else sorted(q.CATALOG)
    out = dict(existing)
    changed, failed = [], []
    for i, name in enumerate(names, 1):
        try:
            df = q.CATALOG[name].spark(spark, SF_DIR)
            g = golden_hash(df.toPandas(), df.schema)
        except Exception as ex:  # noqa: BLE001
            failed.append(name)
            print(f"[{i}/{len(names)}] FAIL {name}: {str(ex)[:160]}")
            continue
        if existing.get(name) != g:
            changed.append(name)
        out[name] = g
        print(f"[{i}/{len(names)}] {name}: rows={g['rows']} {g['hash'][:12]}")
    spark.stop()

    # Drop goldens for queries that no longer exist.
    stale = [n for n in out if n not in q.CATALOG]
    for n in stale:
        del out[n]

    with open(GOLDENS_PATH, "w", encoding="utf-8") as f:
        json.dump(dict(sorted(out.items())), f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"\nwrote {GOLDENS_PATH}: {len(out)} entries "
        f"({len(changed)} changed, {len(stale)} removed, {len(failed)} failed)"
    )
    if changed:
        print("changed (front these in _CHANGED_THIS_ROUND if driver-green):")
        for n in changed:
            print(f"  {n}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
