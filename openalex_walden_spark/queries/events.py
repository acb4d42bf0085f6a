"""Event-stream analytics (SURVEY.md §2.9 St2/St5 batch-checkable cores,
plus watermark/window extensions the `events` fixture exists for).

The streaming runtime itself (Structured Streaming file source,
``Trigger.AvailableNow``, ``foreachBatch`` SCD1) lives in
``openalex_walden_spark/streaming/`` with its own tests; these catalog
entries are the *deterministic batch semantics* of each streaming op, so
the DuckDB oracle can gate them — the same split the reference makes
(``apply_changes`` sequencing is by-column, not by wall clock —
``Crossref.py:594-602``).

Timezone-proofing: every time value is ``ts_us`` (µs since epoch BIGINT,
see tables.py) — raw TIMESTAMPs never cross the oracle boundary. Day and
hour buckets are integer divisions of ``ts_us``: identical arithmetic in
both engines, and at 100 TB the bucket expression is codegen'd and
partition-prunable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from openalex_walden_spark.queries.registry import register

_US_PER_DAY = 86_400_000_000
_US_PER_HOUR = 3_600_000_000
_SESSION_GAP_US = 30 * 60 * 1_000_000

# DuckDB reads the nanos column as TIMESTAMP (µs truncation) — epoch_us
# matches Spark's `ts div 1000` exactly.
_TSUS_DUCK = "epoch_us(ts)"


# --------------------------------------------------------------------------
# daily counts (tumbling-day window as integer bucket)
# --------------------------------------------------------------------------
_DAILY_SQL = f"""
SELECT event_type,
       {_TSUS_DUCK} // {_US_PER_DAY} AS day_bucket,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type, {_TSUS_DUCK} // {_US_PER_DAY}
"""


@register("ev_counts_by_type_day", oracle=_DAILY_SQL, tags=("events", "agg"), tables=("events",))
def ev_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-day aggregation expressed as an integer day bucket — the
    batch equivalent of `window(ts, '1 day')` without timezone coupling."""
    e = spark.table("events")
    return (
        e.groupBy(
            "event_type",
            (F.col("ts_us") / _US_PER_DAY).cast("bigint").alias("day_bucket"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


# --------------------------------------------------------------------------
# hourly tumbling window per type
# --------------------------------------------------------------------------
_HOURLY_SQL = f"""
SELECT {_TSUS_DUCK} // {_US_PER_HOUR} AS hour_bucket,
       event_type,
       COUNT(*) AS n_events
FROM events
GROUP BY {_TSUS_DUCK} // {_US_PER_HOUR}, event_type
"""


@register("ev_tumbling_hourly", oracle=_HOURLY_SQL, tags=("events", "agg", "window"), tables=("events",))
def ev_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling counts — the batch core of the Structured-Streaming
    windowed aggregation exercised in tests/test_streaming.py."""
    e = spark.table("events")
    return (
        e.groupBy(
            (F.col("ts_us") / _US_PER_HOUR).cast("bigint").alias("hour_bucket"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"))
    )


# --------------------------------------------------------------------------
# St2 core: SCD1 latest-state materialization (keyed upsert semantics)
# --------------------------------------------------------------------------
_SCD1_SQL = f"""
SELECT user_id,
       event_type AS last_type,
       value      AS last_value,
       {_TSUS_DUCK} AS last_ts_us
FROM (
  SELECT *,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY {_TSUS_DUCK} DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


@register("ev_scd1_latest_state", oracle=_SCD1_SQL, tags=("events", "St2", "W1"), tables=("events",))
def ev_scd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 keyed-upsert semantics as a batch window-dedup: latest record
    per key ordered by (sequence, event_id tie-break) — exactly what the
    reference's `apply_changes(keys=…, sequence_by=…, scd_type=1)`
    materializes (Crossref.py:594-602). The streaming foreachBatch MERGE
    (streaming/scd1.py) must converge to this result; the test suite
    asserts that equivalence."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    return (
        spark.table("events")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
            F.col("ts_us").alias("last_ts_us"),
        )
    )


# --------------------------------------------------------------------------
# sessionization via lag + running flag-sum
# --------------------------------------------------------------------------
_SESSION_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, {_TSUS_DUCK} AS ts_us,
         CASE WHEN {_TSUS_DUCK} - lag({_TSUS_DUCK})
                OVER (PARTITION BY user_id ORDER BY {_TSUS_DUCK} ASC, event_id ASC)
              > {_SESSION_GAP_US} OR
              lag({_TSUS_DUCK}) OVER (PARTITION BY user_id
                                      ORDER BY {_TSUS_DUCK} ASC, event_id ASC) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, event_id, ts_us,
         SUM(new_session) OVER (PARTITION BY user_id
                                ORDER BY ts_us ASC, event_id ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       COUNT(*) AS n_events,
       MAX(ts_us) - MIN(ts_us) AS duration_us
FROM sessions
GROUP BY user_id, session_idx
"""


@register("ev_sessionize", oracle=_SESSION_SQL, tags=("events", "session", "W5"), tables=("events",))
def ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag to flag session
    starts, running sum to number sessions, then per-session rollup.
    The batch analogue of `session_window()` — two window passes over one
    user_id shuffle, reusing the same partitioning (no second exchange)."""
    order = (F.col("ts_us").asc(), F.col("event_id").asc())
    w_lag = Window.partitionBy("user_id").orderBy(*order)
    w_run = w_lag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("ts_us").over(w_lag)
    flagged = spark.table("events").select(
        "user_id",
        "event_id",
        "ts_us",
        F.when(
            prev.isNull() | ((F.col("ts_us") - prev) > _SESSION_GAP_US), F.lit(1)
        ).otherwise(F.lit(0)).alias("new_session"),
    )
    sessions = flagged.withColumn(
        "session_idx", F.sum("new_session").over(w_run)
    )
    return (
        sessions.groupBy("user_id", F.col("session_idx").cast("bigint").alias("session_idx"))
        .agg(
            F.count("*").alias("n_events"),
            (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        )
    )


# --------------------------------------------------------------------------
# St5: expectations / data-quality gate metrics
# --------------------------------------------------------------------------
_EXPECT_SQL = """
SELECT 'value_non_negative' AS expectation,
       count_if(value IS NOT NULL AND value >= 0)::BIGINT AS n_pass,
       count_if(value IS NULL OR value < 0)::BIGINT AS n_fail
FROM events
UNION ALL
SELECT 'known_event_type' AS expectation,
       count_if(event_type IN ('click','view','signup','purchase','error'))::BIGINT AS n_pass,
       count_if(event_type NOT IN ('click','view','signup','purchase','error')
                OR event_type IS NULL)::BIGINT AS n_fail
FROM events
"""


@register("ev_expectations_gate", oracle=_EXPECT_SQL, tags=("events", "St5"), tables=("events",))
def ev_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations with pass/fail metrics — the engine's
    `@dlt.expect` analogue (Crossref.py:225). The streaming form
    (streaming/expectations.py) quarantines failures; this is its
    metrics contract."""
    from openalex_walden_spark.streaming.expectations import expectation_metrics

    e = spark.table("events")
    known = F.col("event_type").isin("click", "view", "signup", "purchase", "error")
    return expectation_metrics(
        e,
        {
            "value_non_negative": F.col("value").isNotNull() & (F.col("value") >= 0),
            "known_event_type": known & F.col("event_type").isNotNull(),
        },
    )


# --------------------------------------------------------------------------
# JSON path extraction from the props column (§2.8 JSON)
# --------------------------------------------------------------------------
_JSON_SQL = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM events
GROUP BY event_type
"""


@register("ev_json_extract", oracle=_JSON_SQL, tags=("events", "json"), tables=("events",))
def ev_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-STRING path extraction (`col:json_path` idiom,
    MatchAuthors.ipynb cell 3 `judge_json:same_person`) via
    get_json_object, aggregated per type."""
    e = spark.table("events")
    return (
        e.groupBy("event_type")
        .agg(
            F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
            F.count("*").alias("n"),
        )
    )


# --------------------------------------------------------------------------
# S4/St3: change-data-feed derivation between two table versions
# --------------------------------------------------------------------------
_CDF_SQL = """
WITH v1 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
  WHERE o_orderkey % 97 <> 0
),
v2 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 100 = 0 THEN 'X' ELSE o_orderstatus END
           AS o_orderstatus,
         o_totalprice
  FROM orders
)
SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
       CASE WHEN a.o_orderkey IS NULL THEN 'insert'
            WHEN b.o_orderkey IS NULL THEN 'delete'
            ELSE 'update_postimage' END AS _change_type
FROM v1 a FULL OUTER JOIN v2 b ON a.o_orderkey = b.o_orderkey
WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
   OR a.o_orderstatus <> b.o_orderstatus
   OR a.o_totalprice <> b.o_totalprice
"""


@register(
    "s4_change_feed",
    oracle=_CDF_SQL,
    tags=("source", "S4", "St3", "D9", "J5"),
    tables=("orders",),
)
def s4_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/St3: derive the change feed between two table versions — the
    rows a CDF reader would emit (`readChangeFeed` semantics,
    ``Crossref.py:326-329``): full-outer join on the key, classify
    insert / delete / update_postimage, suppress no-op rows via the
    change predicate (the D9 discipline). This is the explicit
    change-log fallback the engine's St3 chaining streams from
    (``streaming/scd1.py`` changelog_path). One shuffle on the key;
    the change predicate prunes before anything downstream runs.
    """
    o = spark.table("orders")
    v1 = o.where(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    v2 = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 100 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        "o_totalprice",
    )
    a, b = v1.alias("a"), v2.alias("b")
    joined = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    change_type = (
        F.when(F.col("a.o_orderkey").isNull(), F.lit("insert"))
        .when(F.col("b.o_orderkey").isNull(), F.lit("delete"))
        .otherwise(F.lit("update_postimage"))
    )
    changed = (
        F.col("a.o_orderkey").isNull()
        | F.col("b.o_orderkey").isNull()
        | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))
        | (F.col("a.o_totalprice") != F.col("b.o_totalprice"))
    )
    return joined.where(changed).select(
        F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
        change_type.alias("_change_type"),
    )


# --------------------------------------------------------------------------
# sliding window: 30-min windows advancing every 15 min (each event in 2)
# --------------------------------------------------------------------------
_US_15M = 900_000_000

_SLIDING_SQL = f"""
WITH contrib AS (
  SELECT event_type,
         ({_TSUS_DUCK} // {_US_15M}) * {_US_15M} AS w_start
  FROM events
  UNION ALL
  SELECT event_type,
         ({_TSUS_DUCK} // {_US_15M} - 1) * {_US_15M} AS w_start
  FROM events
)
SELECT w_start, event_type, COUNT(*) AS n_events
FROM contrib GROUP BY w_start, event_type
"""


@register(
    "ev_sliding_30m",
    oracle=_SLIDING_SQL,
    tags=("events", "agg", "window", "sliding"),
    tables=("events",),
)
def ev_sliding_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation: 30-minute windows advancing every 15
    minutes, so each event lands in exactly two windows — the
    Structured Streaming ``window(ts, '30 minutes', '15 minutes')``
    semantics, stated over ``ts_us`` integer arithmetic so the oracle
    replicates the overlap exactly (the window start set of an event at
    time t is {floor(t/slide)·slide, (floor(t/slide)-1)·slide}).
    Map-side explode of 2 contributions per row, one shuffle on
    (window, type) — the same cost profile the streaming form has."""
    ev = spark.table("events")
    w0 = (F.col("ts_us") / _US_15M).cast("long") * _US_15M
    contrib = ev.select(
        "event_type",
        F.explode(F.array(w0, w0 - _US_15M)).alias("w_start"),
    )
    return contrib.groupBy("w_start", "event_type").agg(
        F.count("*").alias("n_events")
    )


# --------------------------------------------------------------------------
# watermark late-data policy: events older than (max ts - 1h) are dropped
# --------------------------------------------------------------------------
_LATE_SQL = f"""
WITH mx AS (SELECT max({_TSUS_DUCK}) AS m FROM events),
kept AS (
  SELECT {_TSUS_DUCK} // {_US_PER_HOUR} AS hour_bucket, event_type
  FROM events, mx
  WHERE {_TSUS_DUCK} >= mx.m - {_US_PER_HOUR}
)
SELECT hour_bucket, event_type, COUNT(*) AS n_events
FROM kept GROUP BY hour_bucket, event_type
"""


@register(
    "ev_watermark_late_drop",
    oracle=_LATE_SQL,
    tags=("events", "watermark", "window"),
    tables=("events",),
)
def ev_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The watermark's late-data policy as its deterministic batch
    statement: with a 1-hour watermark, events older than (max event
    time − 1h) are dropped before the windowed aggregation — exactly
    what ``withWatermark('ts', '1 hour')`` guarantees at stream end.
    The high-water read is a 1-row aggregate broadcast into the filter
    (no driver loop); the kept set then aggregates on the bucket."""
    ev = spark.table("events")
    mx = ev.agg(F.max("ts_us").alias("m"))
    kept = ev.crossJoin(F.broadcast(mx)).where(
        F.col("ts_us") >= F.col("m") - F.lit(_US_PER_HOUR)
    )
    return (
        kept.select(
            (F.col("ts_us") / _US_PER_HOUR).cast("long").alias("hour_bucket"),
            "event_type",
        )
        .groupBy("hour_bucket", "event_type")
        .agg(F.count("*").alias("n_events"))
    )


# --------------------------------------------------------------------------
# Funnel / ordered-sequence match (the windowFunnel-style operator)
# --------------------------------------------------------------------------
_FUNNEL_SQL = f"""
WITH s1 AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN {_TSUS_DUCK} END) AS t1
  FROM events GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min({_TSUS_DUCK}) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND s1.t1 IS NOT NULL AND {_TSUS_DUCK} > s1.t1
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min({_TSUS_DUCK}) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND {_TSUS_DUCK} > s2.t2
  GROUP BY e.user_id
)
SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
       CAST(CASE WHEN s3.t3 IS NOT NULL THEN 3
                 WHEN s2.t2 IS NOT NULL THEN 2
                 WHEN s1.t1 IS NOT NULL THEN 1
                 ELSE 0 END AS INT) AS steps
FROM s1
LEFT JOIN s2 ON s2.user_id = s1.user_id
LEFT JOIN s3 ON s3.user_id = s1.user_id
"""


@register(
    "ev_funnel_steps",
    oracle=_FUNNEL_SQL,
    tags=("events", "funnel", "sequence"),
    tables=("events",),
)
def ev_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel match (signup → click → purchase, each step
    strictly after the previous): per user, the step timestamps reached
    and the completed-step count — the windowFunnel/sequence-match
    operator of event-analytics engines.

    The relational form needs one aggregation + join PER STEP (the
    oracle's three stages — fine for 3 steps, linear in funnel depth);
    this implementation folds each user's time-sorted event array once:
    collect_list → array_sort → one ``aggregate`` HOF carrying
    (t1, t2, t3) state. ONE shuffle total, any funnel depth, and the
    fold is codegen'd — the shape that survives a 100-TB event table
    where per-step self-joins would each reshuffle it.

    Skew bound: only funnel-step event types are collected (the filter
    reaches the parquet scan — plan-pinned by
    test_funnel_collect_is_type_bounded), so a hot user's array holds
    its signup/click/purchase events only, never its page-view firehose
    — at a realistic event mix that is orders of magnitude off the
    per-key state. Other types can never change the fold, so semantics
    are identical; the steps=0 universe (users with no funnel events at
    all) is restored by a left join from the distinct-user aggregate,
    whose scan prunes to the user_id column."""
    e = spark.table("events").where(
        F.col("event_type").isin("signup", "click", "purchase")
    )
    users = spark.table("events").select("user_id").distinct()
    evs = F.array_sort(
        F.collect_list(F.struct("ts_us", "event_id", "event_type"))
    )
    fold = F.expr(
        """
        aggregate(
          evs,
          named_struct('t1', cast(null as bigint),
                       't2', cast(null as bigint),
                       't3', cast(null as bigint)),
          (s, e) -> named_struct(
            't1', CASE WHEN s.t1 IS NULL AND e.event_type = 'signup'
                       THEN e.ts_us ELSE s.t1 END,
            't2', CASE WHEN s.t2 IS NULL AND s.t1 IS NOT NULL
                        AND e.event_type = 'click' AND e.ts_us > s.t1
                       THEN e.ts_us ELSE s.t2 END,
            't3', CASE WHEN s.t3 IS NULL AND s.t2 IS NOT NULL
                        AND e.event_type = 'purchase' AND e.ts_us > s.t2
                       THEN e.ts_us ELSE s.t3 END)
        )
        """
    )
    steps = (
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
    )
    folded = (
        e.groupBy("user_id")
        .agg(evs.alias("evs"))
        .select("user_id", fold.alias("f"))
        .select("user_id", "f.t1", "f.t2", "f.t3")
    )
    return users.join(folded, "user_id", "left").withColumn(
        "steps", steps.cast("int")
    )


# --------------------------------------------------------------------------
# Native session_window aggregation (the Structured-Streaming session op)
# --------------------------------------------------------------------------
_SESSWIN_SQL = f"""
WITH flagged AS (
  SELECT user_id, {_TSUS_DUCK} AS ts_us,
         CASE WHEN lag({_TSUS_DUCK}) OVER w IS NULL
                OR {_TSUS_DUCK} - lag({_TSUS_DUCK}) OVER w > {_SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY {_TSUS_DUCK}, event_id)
),
islands AS (
  SELECT user_id, ts_us,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
                                ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
)
SELECT user_id,
       MIN(ts_us) AS session_start_us,
       MAX(ts_us) + {_SESSION_GAP_US} AS session_end_us,
       COUNT(*) AS n_events
FROM islands
GROUP BY user_id, island
"""


@register(
    "ev_session_window",
    oracle=_SESSWIN_SQL,
    tags=("events", "session", "streaming-shape"),
    tables=("events",),
)
def ev_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE ``session_window()`` operator (30-min gap), the
    streaming-capable session shape: ``groupBy(user, session_window(ts))``
    runs unchanged under ``readStream`` with a watermark, where the
    state store merges windows incrementally.  ``ev_sessionize`` is the
    two-window batch analogue; this entry pins the built-in operator's
    semantics against the same gap-island oracle — Spark defines
    session end as last-event-time + gap, which the oracle reproduces
    as ``MAX(ts_us) + gap``.

    One shuffle on user_id; the session merge happens inside the
    aggregation operator (no second window pass).
    """
    e = spark.table("events")  # loader normalizes ts to TIMESTAMP (UTC)
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            F.unix_micros(F.col("sw.end")).alias("session_end_us"),
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# SCD2 validity-interval history (the warehouse companion to St2's SCD1)
# --------------------------------------------------------------------------
_SCD2_SQL = f"""
WITH deduped AS (
  SELECT user_id, {_TSUS_DUCK} AS ts_us, event_type
  FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, {_TSUS_DUCK}
                                 ORDER BY event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
),
changes AS (
  SELECT user_id, ts_us, event_type
  FROM (
    SELECT user_id, ts_us, event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev
    FROM deduped
  ) WHERE prev IS NULL OR event_type <> prev
)
SELECT user_id, event_type, ts_us AS valid_from_us,
       lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS valid_to_us,
       lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL
         AS is_current
FROM changes
"""


@register(
    "ev_scd2_history",
    oracle=_SCD2_SQL,
    tags=("events", "scd2", "window"),
    tables=("events",),
)
def ev_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build: turn each user's event stream into
    validity-interval rows — a new row opens only when the tracked
    attribute CHANGES (consecutive equal values coalesce into one
    interval), `valid_to_us` chains to the next change, and the open
    interval is flagged current.  This is the type-2 companion to the
    engine's SCD1 plane (St2/J9): same keyed-latest discipline, but
    history-preserving.

    Same-timestamp ties resolve deterministically (max event_id) BEFORE
    the change scan — expressed as a lag-based first-of-ts-group filter
    under the SAME (user_id)-partitioned ordering as the change windows,
    so all passes (tie dedup, lag change-flag, lead chain) share one
    partitioning and Catalyst plans a single Exchange (plan-pinned).
    """
    tie_w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").asc(), F.col("event_id").desc()
    )
    # Ordered (ts asc, event_id desc), the first row of each ts group is
    # the max-event_id tie winner.
    deduped = (
        spark.table("events")
        .select(
            "user_id",
            "ts_us",
            "event_type",
            F.lag("ts_us").over(tie_w).alias("prev_ts"),
        )
        .where(F.col("prev_ts").isNull() | (F.col("prev_ts") != F.col("ts_us")))
        .drop("prev_ts")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us")
    changes = (
        deduped.withColumn("prev", F.lag("event_type").over(w))
        .where(F.col("prev").isNull() | (F.col("event_type") != F.col("prev")))
        .drop("prev")
    )
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(w).alias("valid_to_us"),
        F.lead("ts_us").over(w).isNull().alias("is_current"),
    )


# --------------------------------------------------------------------------
# Incremental aggregate maintenance from the S4 change feed (IVM)
# --------------------------------------------------------------------------
# The oracle recomputes the aggregate directly from the NEW table
# version; the Spark side maintains it incrementally (old aggregate +
# retract/add deltas from the change feed).  Hash-equality between the
# two IS the incremental-view-maintenance identity, checked by the
# driver on every run.
_IVM_SQL = """
WITH v2 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 100 = 0 THEN 'X' ELSE o_orderstatus END
           AS o_orderstatus,
         o_totalprice
  FROM orders
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM v2
GROUP BY o_orderstatus
"""


@register(
    "s4_incremental_agg_maintenance",
    oracle=_IVM_SQL,
    tags=("events", "S4", "ivm", "agg"),
    tables=("orders",),
)
def s4_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: keep a per-status (count, revenue)
    aggregate current by folding the S4 change feed into the OLD
    aggregate instead of rescanning the new table version.  Inserts add
    (+1, +price); deletes retract (-1, -price); updates emit BOTH a
    preimage retraction and a postimage addition — which handles
    group-key migration (an update that changes o_orderstatus moves
    mass between groups).  The oracle recomputes from the new version
    directly, so the driver's hash check proves the IVM identity
    old ⊕ Δ == recompute on every run.

    Scale shape: the base aggregate is group-sized, the delta stream is
    change-sized (≪ table-sized at steady state), and money folds at
    DECIMAL(18,2) so addition is exact and order-independent.  This is
    the batch form of what streaming `foreachBatch` maintenance does
    with the St3 changelog.
    """
    o = spark.table("orders")
    v1 = o.where(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    v2 = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 100 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        "o_totalprice",
    )
    dec = 'cast(o_totalprice as decimal(18,2))'
    base = v1.groupBy("o_orderstatus").agg(
        F.count("*").alias("dcnt"), F.expr(f"sum({dec})").alias("damt")
    )

    a, b = v1.alias("a"), v2.alias("b")
    joined = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    pre = F.struct(
        F.col("a.o_orderstatus").alias("o_orderstatus"),
        F.lit(-1).cast("bigint").alias("dcnt"),
        F.expr("-cast(a.o_totalprice as decimal(18,2))").alias("damt"),
    )
    post = F.struct(
        F.col("b.o_orderstatus").alias("o_orderstatus"),
        F.lit(1).cast("bigint").alias("dcnt"),
        F.expr("cast(b.o_totalprice as decimal(18,2))").alias("damt"),
    )
    entries = (
        F.when(F.col("a.o_orderkey").isNull(), F.array(post))
        .when(F.col("b.o_orderkey").isNull(), F.array(pre))
        .otherwise(F.array(pre, post))
    )
    changed = (
        F.col("a.o_orderkey").isNull()
        | F.col("b.o_orderkey").isNull()
        | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))
        | (F.col("a.o_totalprice") != F.col("b.o_totalprice"))
    )
    deltas = (
        joined.where(changed)
        .select(F.explode(entries).alias("e"))
        .select("e.o_orderstatus", "e.dcnt", "e.damt")
    )
    return (
        base.unionByName(deltas)
        .groupBy("o_orderstatus")
        .agg(F.sum("dcnt").alias("n_orders"), F.sum("damt").alias("amt"))
        .where(F.col("n_orders") > 0)
        .select(
            "o_orderstatus",
            "n_orders",
            F.col("amt").cast("double").alias("total_price"),
        )
    )
