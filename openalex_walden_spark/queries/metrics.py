"""Daily-metrics monitor ports (reference ``notebooks/metrics/``).

Three reference jobs live here, re-expressed Spark-first:

* ``WorksDailyMetrics.py`` — the tall (metric, dimension, value) coverage
  snapshot.  The reference computes a cached thin projection, then runs a
  scalar aggregate plus three GROUP BYs **driver-side**, looping over
  ``.collect()`` rows to assemble the tall frame.  Here the whole thing is
  ONE distributed plan: thin projection → single-pass aggregate →
  ``stack()`` unpivot, unioned with the grouped counts — no driver loops,
  no cache round-trips, and the union is a metadata-only operator so the
  thin scan is shared via plan reuse where Spark can.

* ``AuthorshipDailyMetrics.py`` — the authorship monitor: ordered
  fingerprint hashes per work, the typed change-event precedence ladder
  (GREW > SHRANK > NAMES_CHANGED > ORCIDS_CHANGED > METADATA_CHANGED,
  lines 195-214), the null-orcids-hash backfill guard (rows fingerprinted
  before the column existed must not read as ORCID changes), and the
  null-seat flow conservation accounting (``GREATEST(prev-new, 0)``
  asymmetric fills/adds split by eligibility, lines 222-233).

* the blocking-health histogram (lines 513-560): block sizes recomputed
  for today's keys only, bucketed 0/1-10/11-100/101-1000/1000+, plus
  p50/p95/max.  The reference uses ``percentile_approx``; this port uses
  the EXACT interpolating percentile so Spark and DuckDB agree bit-for-bit
  — block-size distributions are bounded (one row per block key), so the
  exact sort is cheap at any corpus scale.

Fixtures follow the repo convention: before/after authorship states are
derived from ``lineitem`` with deterministic per-orderkey mutations chosen
to exercise every branch of the event ladder; no synthetic data files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openalex_walden_spark.queries.registry import register

# ---------------------------------------------------------------------------
# Works daily metrics — tall unpivot (WorksDailyMetrics.py)
# ---------------------------------------------------------------------------
# Thin flag projection over `documents`, mirroring the reference's _thin view
# (WorksDailyMetrics.py:66-104): each coverage predicate becomes a 0/1 flag
# computed once, so the scalar aggregate and every grouped count read the
# same narrow frame.

_SCALAR_METRICS = [
    # (flag expr fragment shared by both dialects, metric name)
    ("CASE WHEN text IS NOT NULL AND length(trim(text)) > 0 THEN 1 ELSE 0 END", "docs_with_text"),
    ("CASE WHEN lang IS NOT NULL THEN 1 ELSE 0 END", "docs_with_language"),
    ("CASE WHEN n_chars > 500 THEN 1 ELSE 0 END", "docs_long"),
    ("CASE WHEN source = 'web' THEN 1 ELSE 0 END", "docs_from_web"),
    ("CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END", "docs_updated_on_date"),
]

# Synthetic indexed_in-style array: a doc can carry 0..3 tags, so the
# exploded dimension (works_by_indexed_in, WorksDailyMetrics.py:163-169)
# has real multi-membership and real drop-outs.
_TAGS_SPARK = (
    "filter(array("
    "  CASE WHEN n_chars > 500 THEN 'long' END,"
    "  CASE WHEN lang = 'en' THEN 'english' END,"
    "  CASE WHEN doc_id % 3 = 0 THEN 'sampled' END"
    "), x -> x IS NOT NULL)"
)

_METRICS_TALL_ORACLE = f"""
WITH thin AS (
  SELECT {', '.join(f'{expr} AS f{i}' for i, (expr, _) in enumerate(_SCALAR_METRICS))},
         lang, source,
         CASE WHEN n_chars > 500 THEN 1 ELSE 0 END AS is_long,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
         CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS is_sampled
  FROM documents
),
scalars AS (
  SELECT COUNT(*)::BIGINT AS count_total,
         {', '.join(f'SUM(f{i})::BIGINT AS f{i}' for i in range(len(_SCALAR_METRICS)))}
  FROM thin
)
SELECT 'docs_total' AS metric, '(all)' AS dimension, count_total AS value FROM scalars
{''.join(f"UNION ALL SELECT '{name}', '(all)', f{i} FROM scalars " for i, (_, name) in enumerate(_SCALAR_METRICS))}
UNION ALL
SELECT 'docs_by_lang', COALESCE(lang, '(null)'), COUNT(*)::BIGINT FROM thin GROUP BY lang
UNION ALL
SELECT 'docs_by_source', COALESCE(source, '(null)'), COUNT(*)::BIGINT FROM thin GROUP BY source
UNION ALL
SELECT 'docs_by_tag', tag, cnt FROM (
  SELECT 'long' AS tag, SUM(is_long)::BIGINT AS cnt FROM thin
  UNION ALL SELECT 'english', SUM(is_en)::BIGINT FROM thin
  UNION ALL SELECT 'sampled', SUM(is_sampled)::BIGINT FROM thin
) t WHERE cnt > 0
ORDER BY metric, dimension
"""


@register(
    "metrics_works_daily_tall",
    oracle=_METRICS_TALL_ORACLE,
    tags=("metrics", "unpivot", "agg"),
    tables=("documents",),
)
def metrics_works_daily_tall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tall coverage snapshot in ONE distributed plan (WorksDailyMetrics.py).

    The reference's per-metric ``.collect()`` loops become: single-pass
    scalar aggregate → ``stack`` unpivot, unioned with the grouped and
    exploded-array counts.  Map-side partial aggregation applies to every
    arm; nothing but the final tall frame reaches the driver.
    """
    thin = spark.table("documents").selectExpr(
        *[f"{expr} AS f{i}" for i, (expr, _) in enumerate(_SCALAR_METRICS)],
        "lang",
        "source",
        f"{_TAGS_SPARK} AS tags",
    )

    n = len(_SCALAR_METRICS)
    stack_args = ", ".join(
        ["'docs_total', count_total"]
        + [f"'{name}', f{i}" for i, (_, name) in enumerate(_SCALAR_METRICS)]
    )
    scalars = (
        thin.agg(
            F.count(F.lit(1)).alias("count_total"),
            *[F.sum(f"f{i}").alias(f"f{i}") for i in range(n)],
        )
        .selectExpr(f"stack({n + 1}, {stack_args}) AS (metric, value)")
        .select("metric", F.lit("(all)").alias("dimension"), F.col("value").cast("long"))
    )
    by_lang = (
        thin.groupBy("lang")
        .count()
        .select(
            F.lit("docs_by_lang").alias("metric"),
            F.coalesce("lang", F.lit("(null)")).alias("dimension"),
            F.col("count").cast("long").alias("value"),
        )
    )
    by_source = (
        thin.groupBy("source")
        .count()
        .select(
            F.lit("docs_by_source").alias("metric"),
            F.coalesce("source", F.lit("(null)")).alias("dimension"),
            F.col("count").cast("long").alias("value"),
        )
    )
    by_tag = (
        thin.select(F.explode("tags").alias("tag"))
        .groupBy("tag")
        .count()
        .select(
            F.lit("docs_by_tag").alias("metric"),
            F.col("tag").alias("dimension"),
            F.col("count").cast("long").alias("value"),
        )
    )
    return (
        scalars.unionByName(by_lang)
        .unionByName(by_source)
        .unionByName(by_tag)
        .orderBy("metric", "dimension")
    )


# ---------------------------------------------------------------------------
# Authorship monitor fixtures: before/after seat states over lineitem
# ---------------------------------------------------------------------------
# work = l_orderkey, seat = l_linenumber, name = 'S'||suppkey, orcid on
# partkey%4=0 seats, corresponding = first seat, author_id NULL on 'R'
# returnflag seats.  The after-state mutates seat 1 per orderkey%17 class so
# every branch of the event ladder fires; %17 in {7..16} stays unchanged and
# must be filtered out by the hash gate, exactly as in the reference's
# candidate WHERE (AuthorshipDailyMetrics.py:211-214).
#
#   %17=0  GREW            (before drops seat 1 → after has one more)
#   %17=1  SHRANK          (after drops seat 1)
#   %17=2  NAMES_CHANGED   (seat-1 name rewritten, counts equal)
#   %17=3  ORCIDS_CHANGED  (seat-1 orcid rewritten, names equal)
#   %17=4  orcid rewritten BUT fingerprint orcids_hash is NULL (pre-backfill
#          row) → must classify METADATA_CHANGED, not ORCIDS_CHANGED
#   %17=5  METADATA_CHANGED (corresponding flag flips; names/orcids equal)
#   %17=6  new work (no fingerprint row) → change-events skip it; the flow
#          query counts its null seats under added_new_works

_SEATS_COMMON = """
  SELECT l_orderkey AS work_id, l_linenumber AS seq,
         concat('S', CAST(l_suppkey AS {str_t})) AS name,
         CASE WHEN l_partkey % 4 = 0
              THEN concat('0000-', CAST(l_partkey AS {str_t})) END AS orcid,
         (l_linenumber = 1) AS corr,
         concat('N', CAST(l_suppkey % 25 AS {str_t})) AS affil,
         CASE WHEN l_returnflag = 'R' THEN NULL
              ELSE CAST(l_suppkey AS BIGINT) END AS author_id
  FROM lineitem
"""

# after-state seat mutations (applied to seat 1 of the mutation classes)
_AFTER_MUT = """
  SELECT work_id, seq,
         CASE WHEN seq = 1 AND work_id % 17 = 2 THEN concat(name, 'X') ELSE name END AS name,
         CASE WHEN seq = 1 AND work_id % 17 IN (3, 4) THEN '0000-REV' ELSE orcid END AS orcid,
         CASE WHEN seq = 1 AND work_id % 17 = 5 THEN NOT corr ELSE corr END AS corr,
         affil,
         CASE WHEN work_id % 5 = 0 AND author_id IS NULL AND seq = 1
              THEN 7777  -- a filled seat (null -> assigned)
              WHEN work_id % 7 = 1 AND seq = 1 THEN NULL  -- a new null seat
              ELSE author_id END AS author_id
  FROM seats WHERE NOT (seq = 1 AND work_id % 17 = 1)
"""

_BEFORE_SEL = "SELECT * FROM seats WHERE NOT (seq = 1 AND work_id % 17 = 0)"

# Ordered fingerprint state per work.  The reference sorts authorships by
# order number and hashes the transformed lists (AuthorshipDailyMetrics.py:
# 151-170); both dialects here hash a seq-ordered '#'-joined list via md5
# (xxhash64 has no DuckDB twin; the reference's own D9 discipline makes the
# same md5-for-portability trade, see walden.d9_change_detection).
_STATE_DUCK = """
  SELECT work_id,
         COUNT(*)::INT AS base_n,
         md5(string_agg(name, '#' ORDER BY seq)) AS names_hash,
         md5(string_agg(
           concat_ws('|', name, COALESCE(orcid, ''), CAST(corr AS VARCHAR), affil),
           '#' ORDER BY seq)) AS content_hash,
         md5(string_agg(COALESCE(orcid, ''), '#' ORDER BY seq)) AS orcids_hash,
         COUNT(*)::INT AS seat_n,
         SUM(CASE WHEN author_id IS NULL THEN 1 ELSE 0 END)::INT AS null_seat_n,
         (MIN(work_id) % 2 = 0) AS eligible
  FROM {src} GROUP BY work_id
"""


def _seat_states(spark: SparkSession):
    """Register _before/_after fingerprint-state temp views (Spark side)."""
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW seats AS "
        + _SEATS_COMMON.format(str_t="STRING")
    )
    spark.sql(f"CREATE OR REPLACE TEMP VIEW _before_seats AS {_BEFORE_SEL}")
    spark.sql(f"CREATE OR REPLACE TEMP VIEW _after_seats AS {_AFTER_MUT}")
    for side in ("before", "after"):
        spark.sql(
            f"""
            CREATE OR REPLACE TEMP VIEW _{side}_state AS
            SELECT work_id,
                   CAST(COUNT(*) AS INT) AS base_n,
                   md5(concat_ws('#', transform(array_sort(collect_list(struct(seq, name))),
                       x -> x.name))) AS names_hash,
                   md5(concat_ws('#', transform(
                       array_sort(collect_list(struct(seq,
                         concat_ws('|', name, COALESCE(orcid, ''), CAST(corr AS STRING), affil)))),
                       x -> x.col2))) AS content_hash,
                   md5(concat_ws('#', transform(array_sort(collect_list(struct(seq,
                       COALESCE(orcid, '')))), x -> x.col2))) AS orcids_hash,
                   CAST(COUNT(*) AS INT) AS seat_n,
                   CAST(SUM(CASE WHEN author_id IS NULL THEN 1 ELSE 0 END) AS INT) AS null_seat_n,
                   (MIN(work_id) % 2 = 0) AS eligible
            FROM _{side}_seats GROUP BY work_id
            """
        )


_DUCK_STATES = f"""
seats AS ({_SEATS_COMMON.format(str_t="VARCHAR")}),
before_state AS ({_STATE_DUCK.format(src=f"({_BEFORE_SEL})")}),
after_state AS ({_STATE_DUCK.format(src=f"({_AFTER_MUT})")})
"""

# fingerprint table = before-state, minus the "new work" class, with the
# pre-backfill NULL orcids_hash rows (%17=4)
_FPR_DUCK = """
  SELECT work_id, base_n, names_hash, content_hash,
         CASE WHEN work_id % 17 = 4 THEN NULL ELSE orcids_hash END AS orcids_hash,
         seat_n, null_seat_n, eligible
  FROM before_state WHERE work_id % 17 <> 6
"""

_EVENTS_ORACLE = f"""
WITH {_DUCK_STATES},
fpr AS ({_FPR_DUCK})
SELECT
  c.work_id,
  CASE WHEN c.base_n > f.base_n THEN 'GREW'
       WHEN c.base_n < f.base_n THEN 'SHRANK'
       WHEN c.names_hash IS DISTINCT FROM f.names_hash THEN 'NAMES_CHANGED'
       WHEN f.orcids_hash IS NOT NULL
            AND c.orcids_hash IS DISTINCT FROM f.orcids_hash THEN 'ORCIDS_CHANGED'
       ELSE 'METADATA_CHANGED' END AS event_type,
  f.base_n AS prev_base_n,
  c.base_n AS new_base_n,
  (c.names_hash IS DISTINCT FROM f.names_hash) AS names_changed,
  (c.content_hash IS DISTINCT FROM f.content_hash) AS content_changed,
  (f.orcids_hash IS NOT NULL
   AND c.orcids_hash IS DISTINCT FROM f.orcids_hash) AS orcids_changed
FROM after_state c
JOIN fpr f ON c.work_id = f.work_id
WHERE c.base_n <> f.base_n
   OR c.names_hash IS DISTINCT FROM f.names_hash
   OR c.content_hash IS DISTINCT FROM f.content_hash
ORDER BY c.work_id
"""


@register(
    "metrics_authorship_change_events",
    oracle=_EVENTS_ORACLE,
    tags=("metrics", "change-detection", "D9"),
    tables=("lineitem",),
)
def metrics_authorship_change_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed authorship change events (AuthorshipDailyMetrics.py:184-217).

    Candidate state joins the fingerprint table on work_id; only hash-diff
    rows pass the gate, and the event type is the reference's precedence
    ladder with the null-safe compares (``<=>``) and the orcids-backfill
    guard: a fingerprint row whose orcids_hash is still NULL (written
    before the column existed) must never classify as ORCIDS_CHANGED.
    Both sides aggregate map-side to one row per work before the join, so
    the shuffle carries fingerprints, never seat rows.
    """
    _seat_states(spark)
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW _fpr AS
        SELECT work_id, base_n, names_hash, content_hash,
               CASE WHEN work_id % 17 = 4 THEN NULL ELSE orcids_hash END AS orcids_hash,
               seat_n, null_seat_n, eligible
        FROM _before_state WHERE work_id % 17 <> 6
        """
    )
    return spark.sql(
        """
        SELECT
          c.work_id,
          CASE WHEN c.base_n > f.base_n THEN 'GREW'
               WHEN c.base_n < f.base_n THEN 'SHRANK'
               WHEN NOT (c.names_hash <=> f.names_hash) THEN 'NAMES_CHANGED'
               WHEN f.orcids_hash IS NOT NULL
                    AND NOT (c.orcids_hash <=> f.orcids_hash) THEN 'ORCIDS_CHANGED'
               ELSE 'METADATA_CHANGED' END AS event_type,
          f.base_n AS prev_base_n,
          c.base_n AS new_base_n,
          NOT (c.names_hash <=> f.names_hash) AS names_changed,
          NOT (c.content_hash <=> f.content_hash) AS content_changed,
          (f.orcids_hash IS NOT NULL
           AND NOT (c.orcids_hash <=> f.orcids_hash)) AS orcids_changed
        FROM _after_state c
        JOIN _fpr f ON c.work_id = f.work_id
        WHERE c.base_n <> f.base_n
           OR NOT (c.names_hash <=> f.names_hash)
           OR NOT (c.content_hash <=> f.content_hash)
        ORDER BY c.work_id
        """
    )


_FLOW_ORACLE = f"""
WITH {_DUCK_STATES},
fpr AS ({_FPR_DUCK})
SELECT
  SUM(CASE WHEN f.work_id IS NOT NULL
           THEN GREATEST(f.null_seat_n - c.null_seat_n, 0) ELSE 0 END)::BIGINT AS filled,
  SUM(CASE WHEN f.work_id IS NOT NULL
           THEN GREATEST(c.null_seat_n - f.null_seat_n, 0) ELSE 0 END)::BIGINT AS added_existing,
  SUM(CASE WHEN f.work_id IS NULL THEN c.null_seat_n ELSE 0 END)::BIGINT AS added_new_works,
  SUM(CASE WHEN f.work_id IS NOT NULL AND c.eligible
           THEN GREATEST(f.null_seat_n - c.null_seat_n, 0) ELSE 0 END)::BIGINT AS eligible_filled,
  SUM(CASE WHEN f.work_id IS NOT NULL AND c.eligible
           THEN GREATEST(c.null_seat_n - f.null_seat_n, 0) ELSE 0 END)::BIGINT AS eligible_added_existing,
  SUM(CASE WHEN f.work_id IS NULL AND c.eligible
           THEN c.null_seat_n ELSE 0 END)::BIGINT AS eligible_added_new_works,
  SUM(CASE WHEN f.work_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS new_works
FROM after_state c
LEFT JOIN fpr f ON c.work_id = f.work_id
"""


@register(
    "metrics_null_seat_flow",
    oracle=_FLOW_ORACLE,
    tags=("metrics", "agg"),
    tables=("lineitem",),
)
def metrics_null_seat_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-seat flow conservation (AuthorshipDailyMetrics.py:222-233).

    fills vs adds are the two GREATEST() half-differences of null_seat_n
    across the fingerprint join — a seat count can move both ways on the
    same day only through distinct works, so the halves never double-count.
    The new-works arm (fingerprint miss) books its whole null count as
    added_new_works.  One aggregate over the per-work joined states; the
    eligible split reuses the same flags, not a second scan.
    """
    _seat_states(spark)
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW _fpr AS
        SELECT work_id, null_seat_n, eligible
        FROM _before_state WHERE work_id % 17 <> 6
        """
    )
    return spark.sql(
        """
        SELECT
          CAST(SUM(CASE WHEN f.work_id IS NOT NULL
                   THEN GREATEST(f.null_seat_n - c.null_seat_n, 0) ELSE 0 END) AS BIGINT) AS filled,
          CAST(SUM(CASE WHEN f.work_id IS NOT NULL
                   THEN GREATEST(c.null_seat_n - f.null_seat_n, 0) ELSE 0 END) AS BIGINT) AS added_existing,
          CAST(SUM(CASE WHEN f.work_id IS NULL THEN c.null_seat_n ELSE 0 END) AS BIGINT) AS added_new_works,
          CAST(SUM(CASE WHEN f.work_id IS NOT NULL AND c.eligible
                   THEN GREATEST(f.null_seat_n - c.null_seat_n, 0) ELSE 0 END) AS BIGINT) AS eligible_filled,
          CAST(SUM(CASE WHEN f.work_id IS NOT NULL AND c.eligible
                   THEN GREATEST(c.null_seat_n - f.null_seat_n, 0) ELSE 0 END) AS BIGINT) AS eligible_added_existing,
          CAST(SUM(CASE WHEN f.work_id IS NULL AND c.eligible
                   THEN c.null_seat_n ELSE 0 END) AS BIGINT) AS eligible_added_new_works,
          CAST(SUM(CASE WHEN f.work_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS new_works
        FROM _after_state c
        LEFT JOIN _fpr f ON c.work_id = f.work_id
        """
    )


# ---------------------------------------------------------------------------
# Blocking-health histogram (AuthorshipDailyMetrics.py:513-560)
# ---------------------------------------------------------------------------
# AFM analog: customers carry a mixed-granularity block key (a quarter of
# them share coarse per-nation blocks; the rest spread over ~300 fine
# blocks), so the size buckets are genuinely populated.  "Pending" rows are
# an orders sample; a slice of them points at a block key that exists in no
# AFM row (the 0 bucket).

_BLOCK_KEY = (
    "CASE WHEN c_custkey % 4 = 0 THEN CAST(c_nationkey AS BIGINT) "
    "ELSE 10000 + c_custkey % 300 END"
)

_BLOCKS_CTES = f"""
afm AS (
  SELECT c_custkey, {_BLOCK_KEY} AS block_key FROM customer
),
pending AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 11 = 5 THEN 99999
              ELSE ({_BLOCK_KEY.replace("c_custkey", "o_custkey").replace("c_nationkey", "o_custkey % 25")}) END AS block_key,
         CASE WHEN o_orderkey % 3 = 0 THEN 'AMBIGUOUS' ELSE 'MATCHED' END AS match_outcome
  FROM orders WHERE o_orderkey % 13 = 0
),
block_sizes AS (
  SELECT block_key, COUNT(*) AS n
  FROM afm
  WHERE block_key IN (SELECT DISTINCT block_key FROM pending)
  GROUP BY block_key
),
joined AS (
  SELECT p.match_outcome, COALESCE(b.n, 0) AS n
  FROM pending p LEFT JOIN block_sizes b ON p.block_key = b.block_key
)
"""

_BLOCK_ORACLE = f"""
WITH {_BLOCKS_CTES}
SELECT 'batch_block_size' AS metric, 'p50' AS dimension,
       CAST(FLOOR(quantile_cont(n, 0.5)) AS BIGINT) AS value FROM joined
UNION ALL
SELECT 'batch_block_size', 'p95', CAST(FLOOR(quantile_cont(n, 0.95)) AS BIGINT) FROM joined
UNION ALL
SELECT 'batch_block_size', 'max', MAX(n)::BIGINT FROM joined
UNION ALL
SELECT 'ambiguous_by_block_size',
       CASE WHEN n = 0 THEN '0'
            WHEN n <= 10 THEN '1-10'
            WHEN n <= 100 THEN '11-100'
            WHEN n <= 1000 THEN '101-1000'
            ELSE '1000+' END,
       COUNT(*)::BIGINT
FROM joined WHERE match_outcome = 'AMBIGUOUS'
GROUP BY 2
ORDER BY metric, dimension
"""


@register(
    "metrics_block_size_health",
    oracle=_BLOCK_ORACLE,
    tags=("metrics", "histogram", "agg"),
    tables=("customer", "orders"),
)
def metrics_block_size_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-health metrics (AuthorshipDailyMetrics.py:513-560).

    Block sizes are recomputed for TODAY'S keys only — the IN-subquery
    semi-join prunes the AFM aggregate to the pending batch's keys before
    counting, so the daily cost tracks the batch, not the corpus.  The
    reference's ``percentile_approx`` becomes the exact interpolating
    ``percentile`` (bounded input: one row per block key) so the DuckDB
    ``quantile_cont`` oracle matches bit-for-bit.
    """
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW _blocks_joined AS WITH "
        + _BLOCKS_CTES.replace("AS BIGINT", "AS BIGINT")
        + " SELECT * FROM joined"
    )
    return spark.sql(
        """
        SELECT 'batch_block_size' AS metric, 'p50' AS dimension,
               CAST(FLOOR(percentile(n, 0.5)) AS BIGINT) AS value FROM _blocks_joined
        UNION ALL
        SELECT 'batch_block_size', 'p95',
               CAST(FLOOR(percentile(n, 0.95)) AS BIGINT) FROM _blocks_joined
        UNION ALL
        SELECT 'batch_block_size', 'max', CAST(MAX(n) AS BIGINT) FROM _blocks_joined
        UNION ALL
        SELECT 'ambiguous_by_block_size',
               CASE WHEN n = 0 THEN '0'
                    WHEN n <= 10 THEN '1-10'
                    WHEN n <= 100 THEN '11-100'
                    WHEN n <= 1000 THEN '101-1000'
                    ELSE '1000+' END,
               CAST(COUNT(*) AS BIGINT)
        FROM _blocks_joined WHERE match_outcome = 'AMBIGUOUS'
        GROUP BY 2
        ORDER BY metric, dimension
        """
    )
