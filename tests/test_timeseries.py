"""Brute-force cross-checks for the time-series custom operators.

The DuckDB oracle proves engine parity on the fixture; these tests prove
the SEMANTICS against a naive per-row Python reference on seeded random
timelines — including the edge cases fixtures under-sample (equal
timestamps probe==build, duplicate build timestamps, users with no build
rows, intervals that touch bucket boundaries).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _random_events(seed: int, n: int = 300, users: int = 7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append(
            (
                i,  # event_id
                rng.randrange(users),  # user_id
                rng.randrange(0, 100) * 300_000_000,  # ts_us on 5-min grid → ties
                rng.choice(["click", "purchase", "error", "view"]),
                float(rng.randrange(1000)) / 10.0,
            )
        )
    return rows


def _spark_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts_us bigint, event_type string, value double"
    )


def _asof_spark(spark, rows):
    """The j14 composition inlined over an arbitrary events frame."""
    e = _spark_events(spark, rows)
    wd = Window.partitionBy("user_id", "ts_us").orderBy(F.col("event_id").desc())
    build = (
        e.where(F.col("event_type") == "click")
        .withColumn("rn", F.row_number().over(wd))
        .where(F.col("rn") == 1)
        .select(
            "user_id", "ts_us", F.lit(0).alias("tag"),
            F.lit(None).cast("bigint").alias("event_id"),
            F.col("value").alias("b_value"),
        )
    )
    probe = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts_us", F.lit(1).alias("tag"), "event_id",
        F.lit(None).cast("double").alias("b_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        build.unionByName(probe)
        .select(
            "event_id", "user_id", "ts_us", "tag",
            F.last("b_value", ignorenulls=True).over(w).alias("asof_value"),
        )
        .where(F.col("tag") == 1)
    )
    return {r.event_id: r.asof_value for r in out.collect()}


def _asof_brute(rows):
    out = {}
    for eid, uid, ts, typ, _v in rows:
        if typ != "purchase":
            continue
        cands = [
            (bts, beid, bv)
            for beid, buid, bts, btyp, bv in rows
            if btyp == "click" and buid == uid and bts <= ts
        ]
        if not cands:
            out[eid] = None
        else:
            best_ts = max(c[0] for c in cands)
            # deterministic pick at the matched ts: max event_id
            out[eid] = max(
                (c for c in cands if c[0] == best_ts), key=lambda c: c[1]
            )[2]
    return out


def test_asof_join_matches_brute_force(spark):
    for seed in (7, 42, 1999):
        rows = _random_events(seed)
        assert _asof_spark(spark, rows) == _asof_brute(rows), f"seed {seed}"


_WIN = 30 * 60 * 1_000_000


def _range_spark(spark, rows):
    e = _spark_events(spark, rows)
    err = e.where(F.col("event_type") == "error").select(
        "user_id",
        F.col("ts_us").alias("lo"),
        (F.col("ts_us") + _WIN).alias("hi"),
    )
    buckets = F.expr(f"sequence(lo div {_WIN}, (hi - 1) div {_WIN})")
    err_b = err.select("user_id", "lo", "hi", F.explode(buckets).alias("b"))
    p = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us",
        F.expr(f"ts_us div {_WIN}").alias("b"),
    )
    hits = (
        p.join(err_b, ["user_id", "b"])
        .where((F.col("lo") <= F.col("ts_us")) & (F.col("ts_us") < F.col("hi")))
        .groupBy("event_id")
        .agg(F.count("*").alias("n"))
    )
    counts = {r.event_id: r.n for r in hits.collect()}
    return {
        eid: counts.get(eid, 0)
        for eid, _u, _t, typ, _v in rows
        if typ == "purchase"
    }


def _range_brute(rows):
    out = {}
    for eid, uid, ts, typ, _v in rows:
        if typ != "purchase":
            continue
        out[eid] = sum(
            1
            for _beid, buid, bts, btyp, _bv in rows
            if btyp == "error" and buid == uid and bts <= ts < bts + _WIN
        )
    return out


def test_range_join_matches_brute_force(spark):
    for seed in (3, 77, 2024):
        rows = _random_events(seed)
        assert _range_spark(spark, rows) == _range_brute(rows), f"seed {seed}"
