"""The name-anchored author guard (UpdateWorkAuthors.ipynb, oxjob #608)
and the string-drift intake (oxjob #592).

Author identity is bound to (work_id, author_sequence), but author
arrays shift: a position's author_id is only valid while the name at
that position stays the same person.  Before the affiliation MERGE, the
reference judges every position whose incoming name differs from the
bound one:

- verdict: ABSTAIN_CJK (frozen-parser false-positive class, by unicode
  block) / ABSTAIN_UNPARSED (no parse row — the raw-equality fallback in
  names_compatible is unreachable here since admission requires
  differing raws) / COMPATIBLE / INCOMPATIBLE;
- corroboration: only works with >= 2 INCOMPATIBLE positions invalidate
  (one renamed seat is an edit, two is an array shift);
- curated claims hold a position regardless;
- the hypothetical rebind cascade: invalidated seats try to adopt a
  FREED donor id (the displaced author whose profile display-name still
  parses compatibly), exact-name tier before compatible tier, then the
  legacy-table fallback (exact tier, then parsed tier), each tier only
  on a UNIQUE candidate; a candidate already occupying a surviving seat
  of the work, curator-removed from the work, or chosen by two receivers
  is eliminated;
- telemetry: one aggregate row (incompatible = would_invalidate +
  curated_holds + isolated_holds, plus the rebind tier split).

One SQL template compiles to both dialects (CJK regex spelling, explode
syntax, and the names_compatible macro differ), so the oracle checks
the decision cascade itself.

Fixture: seats from lineitem (3 per order, deduped — the synthetic
data repeats seat keys), names 'F<j> L<i>' with a name-pure parse rule
(i%9==7 buckets and CJK names do not parse); binding ids derive from
the name buckets so a freed donor's profile display name reconstructs
exactly; incoming names change per (okey+seq)%4, a second seat changes
on okey%5==0 works (corroboration), and okey%45==0 works shift seat
2's name onto seat 1 so the freed-donor exact realign fires; claims on
okey%7==0, removes on okey%11==0; legacy rows carry the binding id on
even works so the legacy fallback tiers fire.  Every telemetry class
is non-zero at sf0.01 (realign 19, legacy 40, curated 52, both
abstains, isolated holds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openalex_walden_spark.queries.registry import register


def _compat(d: str, al, af, bl, bf, ar, br) -> str:
    sw = "starts_with" if d == "duckdb" else "startswith"
    ew = "ends_with" if d == "duckdb" else "endswith"
    return f"""COALESCE(CASE
  WHEN {al} IS NULL OR {bl} IS NULL
    THEN lower(trim({ar})) = lower(trim({br}))
  WHEN {al} = {bl}
   AND (left({af}, 1) = left({bf}, 1)
        OR {af} IS NULL OR {bf} IS NULL) THEN TRUE
  WHEN {al} = {bf} AND {af} = {bl} THEN TRUE
  WHEN ({sw}({al}, {bl}) OR {ew}({al}, {bl})
        OR {sw}({bl}, {al}) OR {ew}({bl}, {al}))
   AND least(length({al}), length({bl})) >= 4
   AND (left({af}, 1) = left({bf}, 1)
        OR {af} IS NULL OR {bf} IS NULL) THEN TRUE
  ELSE FALSE END, FALSE)"""


_CJK_DUCK = r"[\x{1100}-\x{11FF}\x{3040}-\x{30FF}\x{4E00}-\x{9FFF}]"
_CJK_SPARK = "[\\u1100-\\u11FF\\u3040-\\u30FF\\u4E00-\\u9FFF]"


def _batch_sql(d: str) -> str:
    """The guard batch as one dialect-parameterized SQL text."""
    cjk = _CJK_DUCK if d == "duckdb" else _CJK_SPARK
    regex = "regexp_matches" if d == "duckdb" else "regexp_like"
    # seat name generators (i = last bucket, j = first bucket)
    cur_i = "(l_orderkey * 3 + l_linenumber) % 50"
    cur_j = "(l_orderkey + l_linenumber) % 20"
    return f"""
WITH seats AS (
  -- the synthetic lineitem repeats (orderkey, linenumber) pairs; the
  -- derived seat rows are identical, so DISTINCT restores seat keys
  SELECT DISTINCT l_orderkey AS work_id, l_linenumber AS seq,
         {cur_i} AS ci, {cur_j} AS cj,
         CASE WHEN (l_orderkey + l_linenumber) % 13 = 0 THEN NULL
              ELSE ((l_orderkey * 3 + l_linenumber) % 50) * 20
                   + ((l_orderkey + l_linenumber) % 20) + 1 END AS author_id
  FROM lineitem WHERE l_linenumber <= 3
),
named AS (
  SELECT work_id, seq, author_id,
         CASE WHEN ci % 9 = 8
              THEN 'F' || CAST(cj AS {{STR}}) || ' 学' || CAST(ci AS {{STR}})
              ELSE 'F' || CAST(cj AS {{STR}}) || ' L' || CAST(ci AS {{STR}})
         END AS current_name,
         ci, cj
  FROM seats
),
incoming AS (
  SELECT work_id, seq, ci, cj,
         CASE
           WHEN work_id % 45 = 0 AND seq = 1
             THEN 'F' || CAST((work_id + 2) % 20 AS {{STR}})
                  || ' L' || CAST((work_id * 3 + 2) % 50 AS {{STR}})
           WHEN (work_id + seq) % 4 = 0 OR (work_id % 5 = 0 AND seq <= 2)
           THEN CASE
             WHEN work_id % 8 < 3
               THEN 'F' || CAST((cj + 7) % 20 AS {{STR}})
                    || ' Q' || CAST((ci + 31) % 50 AS {{STR}})
             WHEN ci % 9 = 7
               THEN 'X' || CAST(ci AS {{STR}}) || '-' || CAST(cj AS {{STR}})
             ELSE 'G' || CAST(cj AS {{STR}}) || ' L' || CAST(ci AS {{STR}})
           END
           ELSE NULL
         END AS incoming_name
  FROM named
),
-- the mechanical parse table — a PURE function of the name string so
-- one name parses one way regardless of which seat mentions it: a name
-- 'A B' parses to (last=lower(B), first=lower(A)); single-token 'X...'
-- names and CJK names do not parse; 'L' buckets in the unparsed class
-- (i%9=7) do not parse (the frozen-parser gap)
parse AS (
  SELECT name,
         CASE WHEN {regex}(name, '{cjk}') OR name NOT LIKE '% %' THEN NULL
              WHEN name LIKE '% L%'
               AND CAST(split_part(name, ' L', 2) AS INT) % 9 = 7 THEN NULL
              ELSE lower(split_part(name, ' ', 2)) END AS match_last,
         CASE WHEN {regex}(name, '{cjk}') OR name NOT LIKE '% %' THEN NULL
              WHEN name LIKE '% L%'
               AND CAST(split_part(name, ' L', 2) AS INT) % 9 = 7 THEN NULL
              ELSE lower(split_part(name, ' ', 1)) END AS match_first
  FROM (
    SELECT DISTINCT current_name AS name FROM named
    UNION
    SELECT DISTINCT incoming_name FROM incoming
    WHERE incoming_name IS NOT NULL
  )
),
changed AS (
  SELECT i.work_id, i.seq AS author_sequence,
         i.incoming_name, n.current_name,
         n.author_id AS current_author_id
  FROM incoming i
  JOIN named n ON n.work_id = i.work_id AND n.seq = i.seq
  WHERE i.incoming_name IS NOT NULL AND n.author_id IS NOT NULL
    AND NOT (lower(trim(i.incoming_name)) IS NOT DISTINCT FROM
             lower(trim(n.current_name)))
),
judged AS (
  SELECT c.*,
         an_i.match_last AS in_last, an_i.match_first AS in_first,
         an_c.match_last AS cur_last, an_c.match_first AS cur_first,
         CASE
           WHEN {regex}(c.incoming_name, '{cjk}')
             OR {regex}(c.current_name, '{cjk}') THEN 'ABSTAIN_CJK'
           WHEN an_i.match_last IS NULL OR an_c.match_last IS NULL
             THEN 'ABSTAIN_UNPARSED'
           WHEN {_compat(d, 'an_i.match_last', 'an_i.match_first',
                         'an_c.match_last', 'an_c.match_first',
                         'c.incoming_name', 'c.current_name')}
             THEN 'COMPATIBLE'
           ELSE 'INCOMPATIBLE'
         END AS verdict
  FROM changed c
  LEFT JOIN parse an_i ON trim(c.incoming_name) = an_i.name
  LEFT JOIN parse an_c ON trim(c.current_name) = an_c.name
),
counted AS (
  SELECT *,
         COUNT(CASE WHEN verdict = 'INCOMPATIBLE' THEN 1 END)
           OVER (PARTITION BY work_id) AS work_incompat_count
  FROM judged
),
claims AS (
  SELECT o_orderkey AS work_id,
         'F' || CAST((o_orderkey + 1 + 7) % 20 AS {{STR}})
           || ' Q' || CAST(((o_orderkey * 3 + 1) % 50 + 31) % 50 AS {{STR}})
           AS raw_author_name
  FROM orders WHERE o_orderkey % 7 = 0
),
curated AS (
  SELECT DISTINCT c.work_id, c.author_sequence
  FROM counted c
  JOIN claims cc ON cc.work_id = c.work_id
   AND lower(trim(cc.raw_author_name)) = lower(trim(c.incoming_name))
),
flagged AS (
  SELECT c.*,
         (cu.work_id IS NOT NULL) AS curated_hold,
         (c.verdict = 'INCOMPATIBLE' AND c.work_incompat_count >= 2
          AND cu.work_id IS NULL) AS invalidate
  FROM counted c
  LEFT JOIN curated cu
    ON c.work_id = cu.work_id AND c.author_sequence = cu.author_sequence
),
-- authors dim: a profile's display name derives from its id, so a
-- freed donor's profile parses compatibly iff the id buckets align
profiles AS (
  SELECT c_custkey % 1000 + 1 AS id,
         'F' || CAST((c_custkey % 1000) % 20 AS {{STR}})
           || ' L' || CAST(CAST(((c_custkey % 1000)
                                 - (c_custkey % 1000) % 20) / 20 AS INT)
                           AS {{STR}}) AS display_name,
         lower('L' || CAST(CAST(((c_custkey % 1000)
                                 - (c_custkey % 1000) % 20) / 20 AS INT)
                           AS {{STR}})) AS p_last,
         lower('F' || CAST((c_custkey % 1000) % 20 AS {{STR}})) AS p_first
  FROM customer
),
profile1 AS (
  SELECT id, MIN(display_name) AS display_name,
         MIN(p_last) AS p_last, MIN(p_first) AS p_first
  FROM profiles GROUP BY id
),
freed_pairs AS (
  SELECT f.work_id, f.current_name AS donor_name,
         f.current_author_id AS donor_id,
         f.cur_last AS donor_last, f.cur_first AS donor_first
  FROM flagged f
  LEFT JOIN profile1 oa ON f.current_author_id = oa.id
  WHERE f.invalidate
    AND {_compat(d, 'f.cur_last', 'f.cur_first', 'oa.p_last',
                 'oa.p_first', 'f.current_name', 'oa.display_name')}
),
realign_cand AS (
  SELECT f.work_id, f.author_sequence,
         COUNT(DISTINCT CASE WHEN lower(trim(fp.donor_name))
                                  = lower(trim(f.incoming_name))
                             THEN fp.donor_id END) AS n_exact,
         MIN(CASE WHEN lower(trim(fp.donor_name))
                       = lower(trim(f.incoming_name))
                  THEN fp.donor_id END) AS id_exact,
         COUNT(DISTINCT CASE WHEN {_compat(d, 'f.in_last', 'f.in_first',
                                           'fp.donor_last', 'fp.donor_first',
                                           'f.incoming_name', 'fp.donor_name')}
                             THEN fp.donor_id END) AS n_compat,
         MIN(CASE WHEN {_compat(d, 'f.in_last', 'f.in_first',
                                'fp.donor_last', 'fp.donor_first',
                                'f.incoming_name', 'fp.donor_name')}
                  THEN fp.donor_id END) AS id_compat
  FROM flagged f
  JOIN freed_pairs fp ON fp.work_id = f.work_id
  WHERE f.invalidate
  GROUP BY f.work_id, f.author_sequence
),
realign_unique AS (
  SELECT work_id, author_sequence, chosen_id,
         COUNT(*) OVER (PARTITION BY work_id, chosen_id) AS n_receivers
  FROM (
    SELECT work_id, author_sequence,
           CASE WHEN n_exact = 1 THEN id_exact
                WHEN n_exact = 0 AND n_compat = 1 THEN id_compat
           END AS chosen_id
    FROM realign_cand
  ) WHERE chosen_id IS NOT NULL
),
legacy AS (
  SELECT DISTINCT l_orderkey AS work_id,
         CASE WHEN l_orderkey % 3 = 0
              THEN 'F' || CAST((l_orderkey + l_linenumber + 7) % 20 AS {{STR}})
                   || ' Q' || CAST(((l_orderkey * 3 + l_linenumber) % 50 + 31) % 50 AS {{STR}})
              ELSE 'Z' || CAST(l_linenumber AS {{STR}}) END AS raw_author_name,
         CASE WHEN l_orderkey % 2 = 0
              THEN ((l_orderkey * 3 + l_linenumber) % 50) * 20
                   + ((l_orderkey + l_linenumber) % 20) + 1
              ELSE (l_orderkey * 7 + l_linenumber) % 400 + 1
         END AS author_id
  FROM lineitem WHERE l_linenumber <= 2
),
legacy_ok AS (
  SELECT DISTINCT f.work_id, f.author_sequence
  FROM flagged f
  JOIN legacy l ON l.work_id = f.work_id
               AND l.author_id = f.current_author_id
  WHERE f.invalidate
),
legacy_exact AS (
  SELECT f.work_id, f.author_sequence,
         MIN(l.author_id) AS id_l, COUNT(DISTINCT l.author_id) AS n_l
  FROM flagged f
  JOIN legacy l ON l.work_id = f.work_id
   AND lower(trim(l.raw_author_name)) = lower(trim(f.incoming_name))
  WHERE f.invalidate
  GROUP BY f.work_id, f.author_sequence
),
legacy_parsed AS (
  SELECT f.work_id, f.author_sequence,
         MIN(l.author_id) AS id_l, COUNT(DISTINCT l.author_id) AS n_l
  FROM flagged f
  JOIN legacy l ON l.work_id = f.work_id
  JOIN parse pn ON trim(l.raw_author_name) = pn.name
  WHERE f.invalidate AND f.in_last IS NOT NULL
    AND pn.match_last = f.in_last
    AND COALESCE(pn.match_first, '') = COALESCE(f.in_first, '')
  GROUP BY f.work_id, f.author_sequence
),
candidate AS (
  SELECT f.*,
         CASE WHEN r.n_receivers = 1 THEN r.chosen_id END
           AS realign_author_id,
         (lk.work_id IS NOT NULL) AS legacy_fallback_ok,
         CASE WHEN le.n_l = 1 THEN le.id_l
              WHEN le.work_id IS NULL AND lp.n_l = 1 THEN lp.id_l
         END AS legacy_rebind_id,
         COALESCE(
           CASE WHEN r.n_receivers = 1 THEN r.chosen_id END,
           CASE WHEN lk.work_id IS NOT NULL THEN
             CASE WHEN le.n_l = 1 THEN le.id_l
                  WHEN le.work_id IS NULL AND lp.n_l = 1 THEN lp.id_l
             END
           END) AS rebind_candidate
  FROM flagged f
  LEFT JOIN realign_unique r
    ON f.work_id = r.work_id AND f.author_sequence = r.author_sequence
  LEFT JOIN legacy_ok lk
    ON f.work_id = lk.work_id AND f.author_sequence = lk.author_sequence
  LEFT JOIN legacy_exact le
    ON f.work_id = le.work_id AND f.author_sequence = le.author_sequence
  LEFT JOIN legacy_parsed lp
    ON f.work_id = lp.work_id AND f.author_sequence = lp.author_sequence
),
occupied AS (
  SELECT DISTINCT n.work_id, n.author_id
  FROM named n
  WHERE n.author_id IS NOT NULL AND NOT EXISTS (
    SELECT 1 FROM flagged f
    WHERE f.invalidate AND f.work_id = n.work_id
      AND f.author_sequence = n.seq
  )
),
removes AS (
  SELECT o_orderkey AS work_id,
         (o_orderkey * 7 + 1) % 400 + 1 AS author_id
  FROM orders WHERE o_orderkey % 11 = 0
)
SELECT c.work_id, c.author_sequence, c.incoming_name, c.current_name,
       c.current_author_id, c.verdict, c.work_incompat_count,
       c.curated_hold, c.invalidate, c.realign_author_id,
       c.legacy_fallback_ok, c.legacy_rebind_id, c.rebind_candidate,
       CASE WHEN c.rebind_candidate IS NULL THEN NULL
            WHEN o.author_id IS NOT NULL THEN NULL
            WHEN rm.author_id IS NOT NULL THEN NULL
            WHEN COUNT(*) OVER (PARTITION BY c.work_id, c.rebind_candidate)
                 > 1 THEN NULL
            ELSE c.rebind_candidate
       END AS rebind_author_id
FROM candidate c
LEFT JOIN occupied o
  ON c.work_id = o.work_id AND c.rebind_candidate = o.author_id
LEFT JOIN removes rm
  ON c.work_id = rm.work_id AND c.rebind_candidate = rm.author_id
"""


def _fmt(sql: str, d: str) -> str:
    return sql.replace("{STR}", "VARCHAR" if d == "duckdb" else "STRING")


_BATCH_DUCK = _fmt(_batch_sql("duckdb"), "duckdb")
_BATCH_SPARK = _fmt(_batch_sql("spark"), "spark")


@register(
    "guard_verdict_batch",
    oracle=_BATCH_DUCK,
    tags=("domain", "D6", "guard", "W7"),
    tables=("lineitem", "orders", "customer"),
)
def guard_verdict_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oxjob #608 name-anchored guard batch (UpdateWorkAuthors.ipynb
    cell 11): three-state verdicts with the CJK and unparsed abstain
    classes, work-level corroboration, curated holds, and the full
    hypothetical rebind cascade (freed-donor exact/compatible tiers,
    legacy exact/parsed tiers, occupied/removed/multi-receiver
    eliminations).  One template, both dialects.

    Plan: seat-keyed joins shuffle once on work_id; the parse table is
    a distinct-name dim (broadcast-sized); verdict and corroboration
    are a window over the changed subset, not the seat table."""
    return spark.sql(_BATCH_SPARK)


_TELEMETRY_DUCK = f"""
WITH batch AS ({_BATCH_DUCK})
SELECT COUNT(*) AS changed_name_positions,
  COUNT(CASE WHEN verdict = 'INCOMPATIBLE' THEN 1 END) AS incompatible,
  COUNT(CASE WHEN verdict = 'ABSTAIN_UNPARSED' THEN 1 END) AS abstain_unparsed,
  COUNT(CASE WHEN verdict = 'ABSTAIN_CJK' THEN 1 END) AS abstain_cjk,
  COUNT(CASE WHEN curated_hold AND verdict = 'INCOMPATIBLE' THEN 1 END)
    AS curated_holds,
  COUNT(CASE WHEN invalidate THEN 1 END) AS would_invalidate,
  COUNT(CASE WHEN invalidate AND rebind_author_id IS NOT NULL THEN 1 END)
    AS rebindable,
  COUNT(CASE WHEN invalidate AND rebind_author_id IS NOT NULL
              AND rebind_author_id = realign_author_id THEN 1 END)
    AS realign_tier,
  COUNT(CASE WHEN invalidate AND rebind_author_id IS NOT NULL
              AND (realign_author_id IS NULL
                   OR rebind_author_id != realign_author_id) THEN 1 END)
    AS legacy_tier,
  COUNT(CASE WHEN verdict = 'INCOMPATIBLE' AND work_incompat_count = 1
              AND NOT curated_hold THEN 1 END) AS isolated_holds
FROM batch
"""

_TELEMETRY_SPARK = _TELEMETRY_DUCK.replace(_BATCH_DUCK, _BATCH_SPARK)


@register(
    "guard_telemetry_rollup",
    oracle=_TELEMETRY_DUCK,
    tags=("domain", "D6", "guard", "A6"),
    tables=("lineitem", "orders", "customer"),
)
def guard_telemetry_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-run guard telemetry (UpdateWorkAuthors.ipynb cell 16):
    the observation contract's accounting identity — incompatible =
    would_invalidate + curated_holds + isolated_holds — plus the rebind
    tier split, as one aggregate over the batch."""
    return spark.sql(_TELEMETRY_SPARK)


# ---------------------------------------------------------------------------
# String-drift intake (oxjob #592, cell 7)
# ---------------------------------------------------------------------------
# Landing-page re-parses merge new affiliation strings into the works
# base WITHOUT bumping work-level updated_date, so watermark intake
# misses them; the drift scan anti-joins every (work, seat, string) of
# the base against the current work_authors state.  base <- lineitem
# seats with strings 's<partkey%40>'; current <- the same minus strings
# on (okey+seat)%6=0 rows (those drifted in).

_DRIFT_SQL = """
WITH base AS (
  SELECT l_orderkey AS work_id, l_linenumber AS author_sequence,
         's' || CAST(l_partkey % 40 AS VARCHAR) AS raw_string
  FROM lineitem WHERE l_linenumber <= 4
),
current_state AS (
  SELECT work_id, author_sequence, raw_string
  FROM base WHERE (work_id + author_sequence) % 6 <> 0
)
SELECT DISTINCT b.work_id
FROM base b
LEFT JOIN current_state w
  ON b.work_id = w.work_id
 AND b.author_sequence = w.author_sequence
 AND b.raw_string = w.raw_string
WHERE w.work_id IS NULL
"""


@register(
    "work_authors_string_drift",
    oracle=_DRIFT_SQL.replace("VARCHAR", "VARCHAR"),
    tags=("domain", "D9", "guard", "J4"),
    tables=("lineitem",),
)
def work_authors_string_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oxjob #592 drift intake (UpdateWorkAuthors.ipynb cell 7):
    works whose base authorship strings drifted from the current
    work_authors state without an updated_date bump — a seat+string
    anti-join, distinct on the work.

    Plan: one left-anti hash join on (work, seat, string); both sides
    prune to the exploded string projection before the join."""
    return spark.sql(_DRIFT_SQL.replace("VARCHAR", "STRING"))
