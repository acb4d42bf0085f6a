#!/usr/bin/env python
"""Quiet-host A/B for `graph_pagerank_fixedpoint` (round-12 verdict #2).

The label history: r8 best 3.86s -> r11 7.42s -> r12 driver 5.40s (1.40x
r8 on a session whose calibration ran FASTER than r11) — the one label
that did not track the host meters across two normalization attempts.
The suspect cost is scheduling latency across its ~2x max_rounds jobs.

This script times, min-of-5 at sf0.1 on the bench Spark config, the
SAME commit under three cadences:

  A. current      check_every=2  (checkpoint + fingerprint every 2)
  B. check-1      check_every=1  (checkpoint + fingerprint every round)
  C. check-4      check_every=4  (half the checks, deeper broadcast chains)

plus the bench's `jobs` calibration (15 empty jobs) in the same session,
so the verdict's jobs-normalized comparison is same-session data.

Usage: python scripts/ab_pagerank.py [runs-per-variant]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    runs_per = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("pagerank-ab")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.ansi.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from openalex_walden_spark.operators.pagerank import pagerank_fixedpoint
    from openalex_walden_spark.queries import graphops as g

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    src = (F.col("l_orderkey") % g._PR_NODES).alias("src")
    dst = (F.col("l_partkey") % g._PR_NODES).alias("dst")
    edges_df = li.select(src, dst).where(F.col("src") != F.col("dst")).distinct()

    def jobs_calib() -> float:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _j in range(15):
                spark.range(32).count()
            runs.append(time.perf_counter() - t0)
        return round(min(runs), 3)

    def time_variant(check_every: int, bcast: bool) -> list[float]:
        times = []
        for _ in range(runs_per):
            t0 = time.perf_counter()
            scores = pagerank_fixedpoint(
                edges_df,
                damping_num=g._PR_NUM,
                damping_den=g._PR_DEN,
                max_rounds=g._PR_MAX_ROUNDS,
                check_every=check_every,
                broadcast_scores=bcast,
            )
            n = scores.count()
            times.append(round(time.perf_counter() - t0, 3))
            assert n == g._PR_NODES or n > 0
        return times

    # warm the session (fixture read, codegen, broadcast plumbing)
    edges_df.count()
    jobs_before = jobs_calib()
    out = {"sf_dir": SF_DIR, "jobs_calib_before": jobs_before}
    for label, ce, bc in (
        ("A_check2_current", 2, True),
        ("D_shuffle_check2", 2, False),
        ("E_shuffle_check4", 4, False),
    ):
        times = time_variant(ce, bc)
        out[label] = {"times": times, "min": min(times)}
        print(f"{label}: min {min(times)}s of {times}", flush=True)
    out["jobs_calib_after"] = jobs_calib()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
