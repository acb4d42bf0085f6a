#!/usr/bin/env python
"""Count the Spark JOBS each pagerank variant schedules (round-13).

Wall-clock A/B on this host is hopeless (same-commit single-run spread
3-12x, jobs-calib drifting 2.3x within a session), but the quantity the
r12 verdict identified as pagerank's denominator — scheduling latency x
NUMBER OF JOBS — has a host-independent half.  Job ids are monotone per
SparkContext, so bracketing a variant between two single-job probes
yields its exact job count.

Usage: python scripts/ab_pagerank_jobs.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("pagerank-jobcount")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.ansi.enabled", "true")
        .getOrCreate()
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    from openalex_walden_spark.operators.pagerank import pagerank_fixedpoint
    from openalex_walden_spark.queries import graphops as g

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    src = (F.col("l_orderkey") % g._PR_NODES).alias("src")
    dst = (F.col("l_partkey") % g._PR_NODES).alias("dst")
    edges_df = li.select(src, dst).where(F.col("src") != F.col("dst")).distinct()
    edges_df.count()  # warm

    def probe_job_id(tag: str) -> int:
        sc.setJobGroup(tag, tag)
        spark.range(2).count()
        sc.setJobGroup("", "")
        ids = sc.statusTracker().getJobIdsForGroup(tag)
        assert ids, tag
        return max(ids)

    import time

    out = {"sf_dir": SF_DIR}
    for label, ce, bc, aqe, parts in (
        ("A_bcast_check2", 2, True, "true", 32),
        ("F_bcast_check2_noaqe", 2, True, "false", 32),
        ("G_shuffle_check2_noaqe_p8", 2, False, "false", 8),
        ("H_shuffle_check4_noaqe_p8", 4, False, "false", 8),
    ):
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        t0 = time.perf_counter()
        before = probe_job_id(f"pre_{label}")
        scores = pagerank_fixedpoint(
            edges_df,
            damping_num=g._PR_NUM,
            damping_den=g._PR_DEN,
            max_rounds=g._PR_MAX_ROUNDS,
            check_every=ce,
            broadcast_scores=bc,
        )
        fp = scores.selectExpr(
            "sum(cast(xxhash64(node, score) as decimal(38,0))) AS h",
            "count(*) AS n",
        ).first()
        after = probe_job_id(f"post_{label}")
        out[label] = {
            "jobs": after - before - 1,
            "wall": round(time.perf_counter() - t0, 3),
            "fingerprint": str(fp["h"]),
            "rows": fp["n"],
        }
        print(f"{label}: {out[label]}", flush=True)
    same = len({v["fingerprint"] for k, v in out.items() if k != "sf_dir"}) == 1
    out["all_variants_bit_identical"] = same
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
