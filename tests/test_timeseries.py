"""Brute-force cross-checks for the time-series custom operators.

The DuckDB oracle proves engine parity on the fixture; these tests prove
the SEMANTICS of the REGISTERED queries (not a copy) against a naive
per-row Python reference on seeded random timelines — including the edge
cases fixtures under-sample (equal timestamps probe==build, duplicate
build timestamps, NULL build values at the matched timestamp, users with
no build rows, intervals touching bucket boundaries). Each timeline is
written as an events.parquet under a tmp dir so the query runs through
the production loader + catalog path end-to-end.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from openalex_walden_spark import queries as q

q.load_all()

_WIN = 30 * 60 * 1_000_000


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
                # NULL values MUST appear: the as-of match may carry one
                None if rng.random() < 0.15 else float(rng.randrange(1000)) / 10.0,
            )
        )
    return rows


def _write_events_dir(spark, tmp_path, rows, name):
    """Materialize a timeline as <dir>/events.parquet in the fixture's
    shape (ts TIMESTAMP) so load_table derives ts_us exactly as in
    production."""
    sf_dir = tmp_path / name
    sf_dir.mkdir()
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts_us bigint, event_type string, value double"
    ).select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(sf_dir / "events.parquet"))
    return str(sf_dir)


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
            out[eid] = (None, None)
        else:
            best_ts = max(c[0] for c in cands)
            # deterministic pick at the matched ts: max event_id — even
            # when that row's value is NULL (the carried struct keeps it)
            pick = max((c for c in cands if c[0] == best_ts), key=lambda c: c[1])
            out[eid] = (pick[2], best_ts)
    return out


def test_asof_join_matches_brute_force(spark, tmp_path):
    spec = q.CATALOG["j14_asof_join"]
    for seed in (7, 42, 1999):
        rows = _random_events(seed)
        sf_dir = _write_events_dir(spark, tmp_path, rows, f"asof_{seed}")
        got = {
            r.event_id: (r.last_click_value, r.last_click_ts_us)
            for r in spec.spark(spark, sf_dir).collect()
        }
        assert got == _asof_brute(rows), f"seed {seed}"


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


def test_range_join_matches_brute_force(spark, tmp_path):
    spec = q.CATALOG["j15_range_join"]
    for seed in (3, 77, 2024):
        rows = _random_events(seed)
        sf_dir = _write_events_dir(spark, tmp_path, rows, f"range_{seed}")
        got = {
            r.event_id: r.n_error_windows
            for r in spec.spark(spark, sf_dir).collect()
        }
        assert got == _range_brute(rows), f"seed {seed}"
