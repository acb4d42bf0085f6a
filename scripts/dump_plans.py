#!/usr/bin/env python
"""Dump .explain("formatted") for named catalog queries to files.

Usage: python scripts/dump_plans.py SUFFIX name1 name2 ... [--sf DIR] [--out DIR]

Writes <out>/<name>_<suffix>.txt with the formatted physical plan, plus a
one-line summary (#Exchange, join strategies, Python eval nodes) to stdout.
Planning only — nothing is executed.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    argv = sys.argv[1:]
    sf = "/root/testdata/sf0.1"
    out = os.path.join(REPO, "plans", "r14")
    if "--sf" in argv:
        i = argv.index("--sf")
        sf = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if "--out" in argv:
        i = argv.index("--out")
        out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    suffix, names = argv[0], argv[1:]
    os.makedirs(out, exist_ok=True)

    from pyspark.sql import SparkSession

    from openalex_walden_spark import queries as q

    q.load_all()
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("plan-dump")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spec = q.CATALOG[name]
        df = spec.spark(spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(set(re.findall(
            r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)\b", plan)))
        py = sorted(set(re.findall(
            r"\b(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas"
            r"|FlatMapGroupsInPandas)\b", plan)))
        print(f"{name}: Exchange={n_ex} joins={joins} python={py} -> {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
