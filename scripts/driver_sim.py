#!/usr/bin/env python
"""Simulate the driver: entry() smoke + full queries()/oracle_sql() sweep.

Usage: python scripts/driver_sim.py [sf_dir]   (default /root/testdata/sf0.01)
This is the project's verify recipe (.claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as e
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    assert len(e.entry(spark).collect()) > 0, "entry() returned no rows"

    from openalex_walden_spark.oracle import canonical_rows, duckdb_connect

    con = duckdb_connect(sf)
    qs, osql = e.queries(), e.oracle_sql()
    fails = []
    for name, fn in sorted(qs.items()):
        try:
            sdf = fn(spark, sf).toPandas()
            if name in osql:
                ddf = con.sql(osql[name]).df()
                ok = (
                    len(sdf) == len(ddf)
                    and sorted(sdf.columns) == sorted(ddf.columns)
                    and canonical_rows(sdf) == canonical_rows(ddf)
                )
                kind = "oracle"
            else:
                ok = len(sdf.columns) > 0
                kind = "rows-only"
        except Exception as ex:  # noqa: BLE001
            ok, kind = False, f"ERROR {str(ex)[:120]}"
        print(("OK  " if ok else "FAIL"), f"{name:40s}", len(sdf) if ok else kind)
        if not ok:
            fails.append(name)
    print(f"\n{len(qs) - len(fails)}/{len(qs)} pass; FAILS: {fails}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
