#!/usr/bin/env python
"""Dev loop: parity-check named catalog queries against the DuckDB oracle.

Usage: python scripts/dev_parity.py name1 name2 ... [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    argv = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    args = argv

    from pyspark.sql import SparkSession

    from openalex_walden_spark import queries as q
    from openalex_walden_spark.oracle import canonical_rows, duckdb_connect

    q.load_all()
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connect(sf)
    rc = 0
    for name in args:
        spec = q.CATALOG[name]
        try:
            sdf = spec.spark(spark, sf)
            s_cols = sorted(sdf.columns)
            s_rows = canonical_rows(sdf.toPandas())
            o = con.sql(spec.oracle).df()
            o_cols = sorted(o.columns)
            o_rows = canonical_rows(o)
            ok = s_cols == o_cols and s_rows == o_rows
            print(
                f"{'OK  ' if ok else 'FAIL'} {name:40s} "
                f"spark={len(s_rows)} oracle={len(o_rows)}"
            )
            if not ok:
                rc = 1
                if s_cols != o_cols:
                    print(f"  cols spark={s_cols}\n  cols duck ={o_cols}")
                sset, oset = set(s_rows), set(o_rows)
                for r in list(sset - oset)[:5]:
                    print("  spark-only:", r)
                for r in list(oset - sset)[:5]:
                    print("  duck-only :", r)
        except Exception as ex:  # noqa: BLE001
            rc = 1
            print(f"ERR  {name}: {ex}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
