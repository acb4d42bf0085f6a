"""Time-series custom operators Spark lacks as primitives: as-of join,
hypertable-style multi-granularity rollup, and a count-min sketch.

These are the "custom operator" family the engine needs beyond the
reference's own inventory (the reference's analogue is the event/metrics
plane: `walden_end2end.yaml` windowed syncs and the Guardrails metric
rollups) — each implemented as a composition of existing DataFrame ops,
never per-row Python:

- **as-of join**: the classic "latest reading at or before t" join.  A
  naive range join is O(probe x build) and Spark would BNLJ it; the
  scalable form here is the union + ordered-window merge-scan — one
  shuffle on the key, zero pair blowup, identical result to DuckDB's
  native ``ASOF JOIN`` (the oracle).
- **hypertable rollup**: one pass producing hour/day/all-time continuous
  aggregates via GROUPING SETS over integer time buckets (the
  TimescaleDB continuous-aggregate shape).  Catalyst expands the sets in
  a single Expand node — one shuffle for all three granularities.
- **count-min sketch**: the fixed-size frequency summary (Cormode &
  Muthukrishnan).  Built relationally so the DuckDB oracle can replay
  it bit-for-bit: exact token counts first (one shuffle, vocab-sized
  output), then the d x w counter matrix from the vocab — the sketch of
  a 100-TB corpus costs one token-count shuffle plus a vocab-sized agg.

Timezone-proofing follows events.py: all time arithmetic on ``ts_us``
(BIGINT microseconds), buckets are integer divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from openalex_walden_spark.queries.events import _TSUS_DUCK

# One definition of the portable 60-bit md5-prefix hash for the whole
# catalog: a second copy here would let the idioms drift apart and break
# cross-query hash compatibility silently.
from openalex_walden_spark.queries.llmdata import _H_DUCK, _H_SPARK
from openalex_walden_spark.queries.registry import register

_US_PER_DAY = 86_400_000_000
_US_PER_HOUR = 3_600_000_000


# --------------------------------------------------------------------------
# J14: as-of join — for each purchase, the latest click at-or-before it
# --------------------------------------------------------------------------
# The build side is deduped to one row per (user, ts) with a
# deterministic pick (max event_id) BEFORE the as-of match: DuckDB's
# ASOF JOIN is free to return any of several build rows sharing the
# matched timestamp, so parity requires the tie to be resolved up front
# in both engines.
_ASOF_SQL = f"""
WITH b AS (
  SELECT user_id, {_TSUS_DUCK} AS b_ts_us, value AS b_value,
         row_number() OVER (PARTITION BY user_id, {_TSUS_DUCK}
                            ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'click'
), bd AS (SELECT user_id, b_ts_us, b_value FROM b WHERE rn = 1),
p AS (
  SELECT event_id, user_id, {_TSUS_DUCK} AS ts_us, value
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts_us, p.value,
       bd.b_value AS last_click_value, bd.b_ts_us AS last_click_ts_us
FROM p ASOF LEFT JOIN bd
  ON p.user_id = bd.user_id AND p.ts_us >= bd.b_ts_us
"""


@register(
    "j14_asof_join",
    oracle=_ASOF_SQL,
    tags=("events", "join", "asof"),
    tables=("events",),
)
def j14_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event picks up the latest click
    at-or-before its timestamp for the same user (NULL if none).

    Spark has no ASOF JOIN operator; the scalable composition is the
    union + ordered-window merge-scan: tag build rows 0 and probe rows
    1, sort each user's timeline once, and carry the last build ROW
    forward with ``last(struct(...), ignoreNulls)`` over ROWS UNBOUNDED
    PRECEDING.  The carried unit must be the struct, not the bare value:
    a matched click whose ``value`` is genuinely NULL is still the
    as-of match (ASOF returns its NULL), and a bare-column carry would
    skip it and resurrect an older click's value — the struct-null is
    the only "no build row" sentinel.  Build-before-probe ordering at
    equal ts makes the match inclusive (>=), matching ASOF semantics.
    One shuffle on user_id, linear scan per key — no range-join pair
    explosion, which is what makes this survive a 100-TB event table
    where a probe x build theta-join would BNLJ."""
    e = spark.table("events")
    wd = Window.partitionBy("user_id", "ts_us").orderBy(F.col("event_id").desc())
    build = (
        e.where(F.col("event_type") == "click")
        .withColumn("rn", F.row_number().over(wd))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "ts_us",
            F.lit(0).alias("tag"),
            F.lit(None).cast("bigint").alias("event_id"),
            F.lit(None).cast("double").alias("value"),
            F.struct(
                F.col("ts_us").alias("b_ts_us"), F.col("value").alias("b_value")
            ).alias("b"),
        )
    )
    probe = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts_us",
        F.lit(1).alias("tag"),
        "event_id",
        "value",
        F.lit(None).cast("struct<b_ts_us:bigint,b_value:double>").alias("b"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_b = F.last("b", ignorenulls=True).over(w)
    merged = build.unionByName(probe).select(
        "event_id",
        "user_id",
        "ts_us",
        "value",
        "tag",
        last_b.getField("b_value").alias("last_click_value"),
        last_b.getField("b_ts_us").alias("last_click_ts_us"),
    )
    return merged.where(F.col("tag") == 1).drop("tag")


# --------------------------------------------------------------------------
# Hypertable rollup: hour/day/all-time continuous aggregates in one pass
# --------------------------------------------------------------------------
_ROLLUP_SQL = f"""
SELECT event_type,
       {_TSUS_DUCK} // {_US_PER_DAY}  AS day_bucket,
       {_TSUS_DUCK} // {_US_PER_HOUR} AS hour_bucket,
       CAST(GROUPING(({_TSUS_DUCK} // {_US_PER_DAY}),
                     ({_TSUS_DUCK} // {_US_PER_HOUR})) AS INT) AS lvl,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY GROUPING SETS (
  (event_type, {_TSUS_DUCK} // {_US_PER_DAY}, {_TSUS_DUCK} // {_US_PER_HOUR}),
  (event_type, {_TSUS_DUCK} // {_US_PER_DAY}),
  (event_type)
)
"""


@register(
    "ev_hypertable_rollup",
    oracle=_ROLLUP_SQL,
    tags=("events", "agg", "rollup"),
    tables=("events",),
)
def ev_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: hourly, daily and
    per-type-total rollups of the event stream in ONE aggregation.

    GROUPING SETS compiles to a single Expand + one shuffle in Spark
    (vs three separate scans+shuffles for three materialized views);
    ``lvl`` is the grouping bitmask (0=hour, 1=day, 3=type-total) a
    serving layer would partition the rollup table by.  Sums go through
    DECIMAL so both engines add exactly."""
    return spark.sql(
        f"""
        SELECT event_type,
               ts_us DIV {_US_PER_DAY}  AS day_bucket,
               ts_us DIV {_US_PER_HOUR} AS hour_bucket,
               CAST(grouping(ts_us DIV {_US_PER_DAY}) * 2
                    + grouping(ts_us DIV {_US_PER_HOUR}) AS INT) AS lvl,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY event_type, ts_us DIV {_US_PER_DAY}, ts_us DIV {_US_PER_HOUR}
        GROUPING SETS (
          (event_type, ts_us DIV {_US_PER_DAY}, ts_us DIV {_US_PER_HOUR}),
          (event_type, ts_us DIV {_US_PER_DAY}),
          (event_type)
        )
        """
    )


# --------------------------------------------------------------------------
# Count-min sketch over document tokens + heavy-hitter estimate audit
# --------------------------------------------------------------------------
_CMS_D = 4  # hash rows (seeds)
_CMS_W = 256  # counters per row
_CMS_MIN_N = 200  # heavy-hitter audit threshold

_CMS_SQL = f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS tok
  FROM documents
),
vocab AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
cells AS (
  SELECT seed,
         {_H_DUCK.format(x="seed::VARCHAR || ':' || tok")} % {_CMS_W} AS bucket,
         CAST(SUM(n) AS BIGINT) AS cnt
  FROM vocab, (SELECT unnest(range({_CMS_D})) AS seed)
  GROUP BY seed, bucket
),
hh AS (SELECT tok, n FROM vocab WHERE n >= {_CMS_MIN_N})
SELECT hh.tok, hh.n AS true_n, MIN(cells.cnt) AS est_n
FROM hh
JOIN cells
  ON cells.bucket =
     {_H_DUCK.format(x="cells.seed::VARCHAR || ':' || hh.tok")} % {_CMS_W}
GROUP BY hh.tok, hh.n
"""


@register(
    "sketch_countmin_estimates",
    oracle=_CMS_SQL,
    tags=("llmdata", "sketch"),
    tables=("documents",),
)
def sketch_countmin_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch of corpus token frequencies, audited against the
    exact counts for every heavy hitter (true count >= 200): output is
    (token, true_n, est_n) with est_n >= true_n guaranteed by the
    sketch's one-sided error.

    Built relationally in two shuffles that a 100-TB corpus would need
    anyway: (1) exact token counts (the vocab — tiny relative to the
    corpus; Zipf vocabularies grow sublinearly), (2) the d x w counter
    matrix aggregated FROM the vocab, so the corpus-sized explode is
    touched exactly once and the d-way expansion multiplies only
    vocab-sized data.  The probe join hashes each heavy hitter into its
    d buckets and takes MIN — the classic point query.  All hashing is
    the portable md5-prefix idiom so DuckDB replays the sketch
    bit-for-bit."""
    from openalex_walden_spark.operators.guardrails import persist_scalar

    d = spark.table("documents")
    toks = d.select(
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
        ).alias("tok")
    )
    # vocab feeds BOTH the sketch build and the heavy-hitter probe;
    # without the persist the DAG lowers to a tree and the corpus-sized
    # explode+aggregate runs twice (two full scans at 100 TB).
    vocab = persist_scalar(toks.groupBy("tok").agg(F.count("*").alias("n")))
    seeds = spark.range(_CMS_D).select(F.col("id").cast("int").alias("seed"))
    bucket = F.expr(
        _H_SPARK.format(x="concat(cast(seed as string), ':', tok)")
    ) % _CMS_W
    cells = (
        vocab.crossJoin(F.broadcast(seeds))
        .groupBy("seed", bucket.alias("bucket"))
        .agg(F.sum("n").alias("cnt"))
    )
    hh = vocab.where(F.col("n") >= _CMS_MIN_N).withColumnRenamed("n", "true_n")
    probe = hh.crossJoin(F.broadcast(seeds)).select(
        "tok", "true_n", "seed", bucket.alias("bucket")
    )
    return (
        probe.join(cells, ["seed", "bucket"])
        .groupBy("tok", "true_n")
        .agg(F.min("cnt").alias("est_n"))
    )


# --------------------------------------------------------------------------
# J15: range join — purchases inside [error, error+30min] windows
# --------------------------------------------------------------------------
_RANGE_WIN_US = 30 * 60 * 1_000_000
_RANGE_SQL = f"""
WITH err AS (
  SELECT user_id, event_id AS err_id, {_TSUS_DUCK} AS lo,
         {_TSUS_DUCK} + {_RANGE_WIN_US} AS hi
  FROM events WHERE event_type = 'error'
),
p AS (
  SELECT event_id, user_id, {_TSUS_DUCK} AS ts_us
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts_us,
       CAST(COUNT(err.err_id) AS BIGINT) AS n_error_windows
FROM p LEFT JOIN err
  ON p.user_id = err.user_id AND err.lo <= p.ts_us AND p.ts_us < err.hi
GROUP BY p.event_id, p.user_id, p.ts_us
"""


@register(
    "j15_range_join",
    oracle=_RANGE_SQL,
    tags=("events", "join", "range"),
    tables=("events",),
)
def j15_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (point-in-interval) join: for each purchase, how many
    half-open 30-minute error windows [error_ts, error_ts+30m) of the
    same user contain it.

    Spark would execute the raw inequality join as a per-key nested
    loop; the scale form here is bucket blocking: each error interval
    explodes into the (at most 2) 30-minute buckets it touches, the
    purchase LEFT-joins on (user_id, its own bucket) with the exact
    containment predicate in the join condition — one equi-shuffled
    join whose unmatched probes surface as NULL err_ids, so the
    zero-match rows come from ``count(err_id)`` instead of a second
    evaluation of the whole subplan (a union + anti-join restore was
    measured to run the bucket join twice: DataFrame DAGs lower to
    trees, and cross-branch CSE needs an explicit persist).  Fan-out is
    bounded by interval_len/bucket_len + 1 per build row regardless of
    data volume, the classic bounded-expansion range join (DuckDB's
    native IEJoin is the oracle)."""
    e = spark.table("events")
    err = e.where(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"),
        F.col("event_id").alias("err_id"),
        F.col("ts_us").alias("lo"),
        (F.col("ts_us") + _RANGE_WIN_US).alias("hi"),
    )
    # half-open [lo, hi): the last touched bucket is (hi-1) div W
    buckets = F.expr(f"sequence(lo div {_RANGE_WIN_US}, (hi - 1) div {_RANGE_WIN_US})")
    err_b = err.select("e_user", "err_id", "lo", "hi", F.explode(buckets).alias("e_b"))
    p = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us",
        F.expr(f"ts_us div {_RANGE_WIN_US}").alias("b"),
    )
    cond = (
        (F.col("user_id") == F.col("e_user"))
        & (F.col("b") == F.col("e_b"))
        & (F.col("lo") <= F.col("ts_us"))
        & (F.col("ts_us") < F.col("hi"))
    )
    return (
        p.join(err_b, cond, "left")
        .groupBy("event_id", "user_id", "ts_us")
        .agg(F.count("err_id").cast("bigint").alias("n_error_windows"))
    )


# --------------------------------------------------------------------------
# Gap-fill + LOCF forward fill (the timeseries "time_bucket_gapfill" shape)
# --------------------------------------------------------------------------
_GAPFILL_SQL = f"""
WITH actual AS (
  SELECT event_type, {_TSUS_DUCK} // {_US_PER_HOUR} AS bucket,
         MAX(value) AS v, COUNT(*) AS n
  FROM events GROUP BY event_type, {_TSUS_DUCK} // {_US_PER_HOUR}
),
bounds AS (
  SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi FROM actual
  GROUP BY event_type
),
grid AS (
  SELECT b.event_type, g.bucket
  FROM bounds b, UNNEST(generate_series(b.lo, b.hi)) AS g(bucket)
)
SELECT g.event_type,
       g.bucket * {_US_PER_HOUR} AS bucket_us,
       last_value(a.v IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.bucket
         ROWS UNBOUNDED PRECEDING) AS v_filled,
       a.bucket IS NULL AS is_gap,
       COALESCE(a.n, 0) AS n_events
FROM grid g LEFT JOIN actual a
  ON a.event_type = g.event_type AND a.bucket = g.bucket
"""


@register(
    "ev_gapfill_locf",
    oracle=_GAPFILL_SQL,
    tags=("events", "timeseries", "gapfill"),
    tables=("events",),
)
def ev_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series with LOCF (last-observation-carried-
    forward): densify each event_type's hour range (sequence + explode
    builds the grid — no driver loop), left-join the actual buckets,
    and forward-fill misses with ``last(v, ignoreNulls)`` — the
    TimescaleDB ``time_bucket_gapfill + locf`` shape Spark has no
    primitive for.  The carried metric is MAX(value): order-independent,
    so both engines agree bit-for-bit (an avg of doubles would not).

    Scale shape: the actual-bucket aggregate is (types x hours)-sized —
    time-bounded, tiny next to the raw stream; the grid explodes from a
    types-sized bounds table; the fill is one window over the grid.
    """
    e = spark.table("events")
    actual = (
        e.groupBy(
            "event_type",
            F.expr(f"ts_us div {_US_PER_HOUR}").alias("bucket"),
        )
        .agg(F.max("value").alias("v"), F.count("*").alias("n"))
    )
    bounds = actual.groupBy("event_type").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.expr("sequence(lo, hi)")).alias("bucket"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(actual, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            (F.col("bucket") * _US_PER_HOUR).alias("bucket_us"),
            F.last("v", ignorenulls=True).over(w).alias("v_filled"),
            F.col("n").isNull().alias("is_gap"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
    )


# --------------------------------------------------------------------------
# RANGE-frame trailing window (interval frame, not row frame)
# --------------------------------------------------------------------------
_RANGE_FRAME_SQL = f"""
SELECT event_id, user_id, {_TSUS_DUCK} AS ts_us,
       COUNT(*) OVER w AS n_trailing_1h,
       CAST(SUM(event_id % 1000) OVER w AS BIGINT) AS ck_trailing_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY {_TSUS_DUCK}
             RANGE BETWEEN {_US_PER_HOUR} PRECEDING AND CURRENT ROW)
"""


@register(
    "w9_range_frame_trailing",
    oracle=_RANGE_FRAME_SQL,
    tags=("events", "window", "range-frame"),
    tables=("events",),
)
def w9_range_frame_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-interval window aggregate: for every event, the count
    and an integer checksum of the same user's events in the preceding
    hour — a VALUE-based ``rangeBetween`` frame, not a row frame.  ROWS
    frames (w5) count physical neighbors; RANGE frames bound the frame
    by the ordering value itself, which is the correct semantics for
    "activity in the last hour" when events are irregularly spaced, and
    handles ts ties by including all peers (making the result
    order-deterministic without a tie-break column).

    The frame works on ``ts_us`` BIGINT microseconds — numeric RANGE
    frames are exact integer comparisons in both engines (an INTERVAL
    frame over timestamps would drag session-timezone semantics in).
    The summed metric is an integer (event_id mod 1000), keeping the
    aggregate hash-exact.

    Scale shape: one user_id exchange + in-partition sort — identical
    cost to any W-family ladder; the frame bound adds no shuffle.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-_US_PER_HOUR, Window.currentRow)
    )
    return spark.table("events").select(
        "event_id",
        "user_id",
        "ts_us",
        F.count("*").over(w).alias("n_trailing_1h"),
        F.sum(F.col("event_id") % 1000).over(w).cast("bigint").alias("ck_trailing_1h"),
    )


# --------------------------------------------------------------------------
# Per-key isotonic regression (PAVA) via grouped-map applyInPandas
# --------------------------------------------------------------------------
def _pava(y):
    """Pool-adjacent-violators over INTEGER observations, in exact
    rational arithmetic: each block level is carried as (sum, count)
    Python ints (arbitrary precision) and violator comparisons are
    cross-multiplications, so the merge path is rounding-free; each
    output value is a single correctly-rounded division sum/count.
    Sequential by nature — the reason this operator is a grouped-map
    pandas function and not a window expression."""
    sums, cnts = [], []
    for v in y:
        cs, cc = int(v), 1
        # merge backwards while the previous block level exceeds ours:
        # sums[-1]/cnts[-1] > cs/cc  ⟺  sums[-1]*cc > cs*cnts[-1]
        while sums and sums[-1] * cc > cs * cnts[-1]:
            cs += sums.pop()
            cc += cnts.pop()
        sums.append(cs)
        cnts.append(cc)
    out = []
    for s, c in zip(sums, cnts):
        out.extend([s / c] * c)  # int/int → correctly-rounded double
    return out


_ISO_SCHEMA = "user_id long, ts_us long, y double, y_fit double"

# DuckDB oracle via the minimax characterization of the L2 isotonic fit:
#     fit[i] = max_{j<=i} min_{k>=i} avg(y[j..k])
# (Robertson/Wright/Dykstra, *Order Restricted Statistical Inference*).
# Hash-exactness argument: y is quantized to BIGINT up front (identical
# IEEE expr in both engines), so every candidate average is an exact
# rational num/den with |num| << 2^53; double division is correctly
# rounded, and rounding is monotone, so it commutes with the running
# MIN/MAX — the oracle's double equals fl(true rational fit), which is
# exactly what the Spark side's exact-rational PAVA emits.  O(n²) rows
# per key — fine for bounded per-entity series (n <= ~100 here); the
# ORACLE is quadratic, the engine path stays O(n) per key.
_PAVA_SQL = f"""
WITH base AS (
  SELECT user_id, {_TSUS_DUCK} AS ts_us,
         CAST(FLOOR(value * 100) AS BIGINT) AS yq,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY {_TSUS_DUCK}, event_id) AS i
  FROM events
), pre AS (
  SELECT user_id, i, ts_us, yq,
         SUM(yq) OVER (PARTITION BY user_id ORDER BY i) AS s
  FROM base
), pairs AS (          -- avg(y[j..k]) as exact rational (num, den)
  SELECT a.user_id, a.i AS j, b.i AS k,
         b.s - a.s + a.yq AS num, b.i - a.i + 1 AS den
  FROM pre a JOIN pre b ON a.user_id = b.user_id AND b.i >= a.i
), rm AS (             -- rm(j,i) = min over k>=i of avg(y[j..k])
  SELECT user_id, j, k AS i,
         MIN(CAST(num AS DOUBLE) / den) OVER (
           PARTITION BY user_id, j ORDER BY k DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mn
  FROM pairs
), fit AS (            -- fit[i] = max over j<=i of rm(j,i); grid has j<=i
  SELECT user_id, i, MAX(mn) AS y_fit
  FROM rm GROUP BY user_id, i
)
SELECT p.user_id, p.ts_us, CAST(p.yq AS DOUBLE) AS y, f.y_fit
FROM pre p JOIN fit f ON p.user_id = f.user_id AND p.i = f.i
"""


@register(
    "fit_isotonic_pava",
    oracle=_PAVA_SQL,
    tags=("timeseries", "applyInPandas", "ml"),
    tables=("events",),
)
def fit_isotonic_pava(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user isotonic regression: fit the best non-decreasing curve
    (L2) to each user's value series in event-time order, via
    pool-adjacent-violators — calibration's workhorse (probability
    calibration, monotone metric smoothing).

    This is the engine's grouped-map ``applyInPandas`` exemplar: PAVA's
    merge stack is irreducibly sequential WITHIN a key, so no window or
    HOF expresses it — but it is embarrassingly parallel ACROSS keys,
    exactly the contract ``groupBy(key).applyInPandas`` gives: one
    shuffle on user_id, then each group fits in a single Arrow batch in
    C-speed pandas.  Each group's rows arrive as one pandas frame; the
    fit sorts by (ts_us, event_id) for a total order, so output is
    partition-invariant and retry-deterministic.

    Values are quantized to integer cents (floor(value*100)) BEFORE the
    fit so the whole computation is exact rational arithmetic and the
    DuckDB minimax oracle reproduces the doubles bit-for-bit — the
    catalog's last rows-only entry upgraded to a hash-checked one.

    Scale note: a group must fit in one worker's memory — true for
    per-user series (the reference's biggest per-entity group is
    bounded the same way, D11); for unbounded keys the fix is
    time-chunked keys, not a bigger executor.
    """
    from openalex_walden_spark.deploy import ensure_shipped

    ensure_shipped(spark)  # the grouped-map closure references _pava,
    # so the package must be importable on executors (any fresh-process
    # driver whose cwd is elsewhere reproduces ModuleNotFoundError
    # without this — caught by the sweep, not by repo-cwd pytest).
    ev = spark.table("events").select(
        "user_id",
        "ts_us",
        "event_id",
        F.floor(F.col("value") * F.lit(100)).cast("long").alias("yq"),
    )

    def fit(pdf):
        pdf = pdf.sort_values(["ts_us", "event_id"], kind="mergesort")
        yq = pdf["yq"].tolist()
        return pdf.assign(
            y=[float(v) for v in yq], y_fit=_pava(yq)
        )[["user_id", "ts_us", "y", "y_fit"]]

    return ev.groupBy("user_id").applyInPandas(fit, _ISO_SCHEMA)
