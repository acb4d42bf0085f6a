"""D6 full-breadth author matching: 8 name patterns x {inst, source,
topic} signal strategies + the guarded ORCID tier.

Ports the reference's complete matching cascade
(``notebooks/end2end/MatchAuthors.ipynb`` cell 9): block on
(first-initial, family), evaluate the 8 name-agreement patterns against
every candidate in the block, count matches per (strategy x pattern)
tier, accept only tiers with EXACTLY ONE match, in the reference's
precedence order (s1 name-only > s6 name+inst+source > s2 name+inst >
s4 name+inst+topic > s5 name+source > s3 name+topic; the s8 tiers are
retired there for judged precision and are omitted here too). The ORCID
tier is global (no block), guarded against publisher ORCID-stamping, and
picks the most-cited holder; it wins over the name cascade.

Both engines run the SAME SQL text (dialect-swapped functions only), so
the driver's hash check proves the 22-tier decision table row-by-row.

Scale: one equi-join on the block key (never cross-block), per-seat
aggregation rides the same shuffle, ORCID tier is a second equi-join on
the orcid value; everything else is column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openalex_walden_spark.queries.registry import register

# Dialect-templated cascade. Placeholders: {STR} cast type, {ARR2} two-
# element array constructor, {OVERLAP} array-overlap fn, {MAXBY} arg-max.
_TEMPLATE = """
WITH batch AS (
  SELECT c_custkey AS work_id,
         c_custkey % 120 AS iden,
         concat('fn', CAST(c_custkey % 120 % 9 AS {STR})) AS fullfirst,
         concat('md', CAST(c_custkey % 120 % 5 AS {STR})) AS fullmid,
         concat('fam', CAST(c_custkey % 120 % 40 AS {STR})) AS pn_last,
         CASE WHEN c_custkey % 11 = 0
              THEN concat('orc', CAST(c_custkey % 120 AS {STR})) END AS incoming_orcid,
         {ARR2_C} AS institution_ids,
         c_custkey % 30 AS work_source_id,
         c_custkey % 20 AS work_topic_id
  FROM customer
),
batch_parsed AS (
  -- Shape selectors use moduli COPRIME to the 120-identity cycle (7, 11)
  -- so name shape varies independently of identity — with shared factors
  -- the full-first/full-middle combination would be identity-determined
  -- and entire pattern tiers could never fire.
  SELECT work_id, iden, pn_last, incoming_orcid, institution_ids,
         work_source_id, work_topic_id,
         CASE WHEN work_id % 7 >= 4 THEN substring(fullfirst, 1, 1)
              ELSE fullfirst END AS pn_first,
         CASE CAST(work_id % 11 % 3 AS INT)
              WHEN 1 THEN fullmid
              WHEN 2 THEN substring(fullmid, 1, 1) END AS pn_middle,
         concat(substring(fullfirst, 1, 1), ' ',
                concat('fam', CAST(iden % 40 AS {STR}))) AS block_key
  FROM batch
),
profiles AS (
  SELECT s_suppkey AS author_id,
         s_suppkey % 120 AS iden,
         concat('fn', CAST(s_suppkey % 120 % 9 AS {STR})) AS fullfirst,
         concat('md', CAST(s_suppkey % 120 % 5 AS {STR})) AS fullmid,
         concat('fam', CAST(s_suppkey % 120 % 40 AS {STR})) AS cand_last,
         CASE WHEN s_suppkey % 2 = 0
              THEN concat('orc', CAST(s_suppkey % 120 AS {STR})) END AS orcid,
         {ARR2_S} AS candidate_institution_ids,
         s_suppkey % 30 AS cand_source_id,
         s_suppkey % 20 AS cand_topic_id,
         s_suppkey * 7 % 1000 AS cited_by_count,
         s_suppkey % 50 AS works_count
  FROM supplier
),
profiles_parsed AS (
  SELECT author_id, cand_last, orcid, candidate_institution_ids,
         cand_source_id, cand_topic_id, cited_by_count, works_count,
         CASE WHEN author_id % 7 >= 5 THEN substring(fullfirst, 1, 1)
              ELSE fullfirst END AS cand_first,
         CASE CAST(author_id % 11 % 3 AS INT)
              WHEN 1 THEN fullmid
              WHEN 2 THEN substring(fullmid, 1, 1) END AS cand_middle,
         concat(substring(fullfirst, 1, 1), ' ', cand_last) AS block_key
  FROM profiles
),
orcid_matches AS (
  SELECT bp.work_id,
         COUNT(DISTINCT p.author_id) AS orcid_match_count,
         {MAXBY}(p.author_id,
                 (p.cited_by_count * 1000 + p.works_count) * 10000000
                 - p.author_id) AS orcid_author_id
  FROM batch_parsed bp
  JOIN profiles_parsed p ON p.orcid = bp.incoming_orcid
  WHERE bp.incoming_orcid IS NOT NULL
  GROUP BY bp.work_id
),
blocked AS (
  SELECT e.work_id, e.pn_first, e.pn_middle, e.pn_last,
         substring(e.pn_first, 1, 1) AS pn_first_initial,
         e.institution_ids, e.work_source_id, e.work_topic_id,
         p.author_id, p.cand_first, p.cand_middle, p.cand_last,
         substring(p.cand_first, 1, 1) AS cand_first_initial,
         p.candidate_institution_ids, p.cand_source_id, p.cand_topic_id
  FROM batch_parsed e
  LEFT JOIN profiles_parsed p
    ON p.block_key = e.block_key AND e.block_key != ''
),
signals AS (
  SELECT *,
         ({OVERLAP}(candidate_institution_ids, institution_ids)) AS has_inst,
         (cand_source_id = work_source_id) AS has_source,
         (cand_topic_id = work_topic_id) AS has_topic,
         (length(pn_first) > 1 AND length(pn_middle) > 1
          AND length(cand_first) > 1 AND length(cand_middle) > 1
          AND pn_first = cand_first AND pn_middle = cand_middle
          AND pn_last = cand_last) AS p1,
         (length(pn_first) > 1 AND (pn_middle IS NULL OR length(pn_middle) <= 1)
          AND length(cand_first) > 1
          AND pn_first = cand_first AND pn_last = cand_last
          AND (cand_middle IS NULL OR pn_middle IS NULL
               OR substring(pn_middle, 1, 1) = substring(cand_middle, 1, 1))) AS p2,
         (length(pn_first) = 1 AND pn_middle IS NOT NULL
          AND length(cand_first) > 1 AND cand_middle IS NOT NULL
          AND substring(pn_first, 1, 1) = substring(cand_first, 1, 1)
          AND substring(pn_middle, 1, 1) = substring(cand_middle, 1, 1)
          AND pn_last = cand_last) AS p3,
         (length(pn_first) = 1 AND length(cand_first) = 1
          AND pn_middle IS NOT NULL AND cand_middle IS NOT NULL
          AND length(pn_middle) <= 1 AND length(cand_middle) <= 1
          AND substring(pn_first, 1, 1) = substring(cand_first, 1, 1)
          AND substring(pn_middle, 1, 1) = substring(cand_middle, 1, 1)
          AND pn_last = cand_last) AS p4,
         (length(pn_first) > 1 AND length(cand_first) > 1
          AND pn_first = cand_first AND pn_last = cand_last
          AND pn_middle IS NULL) AS p5,
         (length(pn_first) = 1 AND pn_middle IS NULL
          AND length(cand_first) > 1
          AND substring(pn_first, 1, 1) = substring(cand_first, 1, 1)
          AND pn_last = cand_last) AS p6,
         (length(pn_first) = 1 AND length(cand_first) = 1
          AND pn_middle IS NULL AND cand_middle IS NULL
          AND substring(pn_first, 1, 1) = substring(cand_first, 1, 1)
          AND pn_last = cand_last) AS p7,
         (length(pn_first) > 1 AND length(cand_first) = 1
          AND substring(pn_first, 1, 1) = substring(cand_first, 1, 1)
          AND pn_last = cand_last) AS p8
  FROM blocked
),
agg AS (
  SELECT work_id,
    SUM(CASE WHEN p1 THEN 1 ELSE 0 END) AS s1_n1,
    SUM(CASE WHEN p2 THEN 1 ELSE 0 END) AS s1_n2,
    SUM(CASE WHEN p5 THEN 1 ELSE 0 END) AS s1_n5,
    SUM(CASE WHEN p1 AND has_inst THEN 1 ELSE 0 END) AS s2_n1,
    SUM(CASE WHEN p2 AND has_inst THEN 1 ELSE 0 END) AS s2_n2,
    SUM(CASE WHEN p5 AND has_inst THEN 1 ELSE 0 END) AS s2_n5,
    SUM(CASE WHEN p6 AND has_inst THEN 1 ELSE 0 END) AS s2_n6,
    SUM(CASE WHEN p1 AND has_inst AND has_source THEN 1 ELSE 0 END) AS s6_n1,
    SUM(CASE WHEN p2 AND has_inst AND has_source THEN 1 ELSE 0 END) AS s6_n2,
    SUM(CASE WHEN p5 AND has_inst AND has_source THEN 1 ELSE 0 END) AS s6_n5,
    SUM(CASE WHEN p6 AND has_inst AND has_source THEN 1 ELSE 0 END) AS s6_n6,
    SUM(CASE WHEN p1 AND has_inst AND has_topic THEN 1 ELSE 0 END) AS s4_n1,
    SUM(CASE WHEN p2 AND has_inst AND has_topic THEN 1 ELSE 0 END) AS s4_n2,
    SUM(CASE WHEN p5 AND has_inst AND has_topic THEN 1 ELSE 0 END) AS s4_n5,
    SUM(CASE WHEN p6 AND has_inst AND has_topic THEN 1 ELSE 0 END) AS s4_n6,
    SUM(CASE WHEN p1 AND has_source THEN 1 ELSE 0 END) AS s5_n1,
    SUM(CASE WHEN p2 AND has_source THEN 1 ELSE 0 END) AS s5_n2,
    SUM(CASE WHEN p5 AND has_source THEN 1 ELSE 0 END) AS s5_n5,
    SUM(CASE WHEN p6 AND has_source THEN 1 ELSE 0 END) AS s5_n6,
    SUM(CASE WHEN p1 AND has_topic THEN 1 ELSE 0 END) AS s3_n1,
    SUM(CASE WHEN p2 AND has_topic THEN 1 ELSE 0 END) AS s3_n2,
    SUM(CASE WHEN p5 AND has_topic THEN 1 ELSE 0 END) AS s3_n5,
    MAX(CASE WHEN p1 THEN author_id END) AS m_s1_n1,
    MAX(CASE WHEN p2 THEN author_id END) AS m_s1_n2,
    MAX(CASE WHEN p5 THEN author_id END) AS m_s1_n5,
    MAX(CASE WHEN p1 AND has_inst THEN author_id END) AS m_s2_n1,
    MAX(CASE WHEN p2 AND has_inst THEN author_id END) AS m_s2_n2,
    MAX(CASE WHEN p5 AND has_inst THEN author_id END) AS m_s2_n5,
    MAX(CASE WHEN p6 AND has_inst THEN author_id END) AS m_s2_n6,
    MAX(CASE WHEN p1 AND has_inst AND has_source THEN author_id END) AS m_s6_n1,
    MAX(CASE WHEN p2 AND has_inst AND has_source THEN author_id END) AS m_s6_n2,
    MAX(CASE WHEN p5 AND has_inst AND has_source THEN author_id END) AS m_s6_n5,
    MAX(CASE WHEN p6 AND has_inst AND has_source THEN author_id END) AS m_s6_n6,
    MAX(CASE WHEN p1 AND has_inst AND has_topic THEN author_id END) AS m_s4_n1,
    MAX(CASE WHEN p2 AND has_inst AND has_topic THEN author_id END) AS m_s4_n2,
    MAX(CASE WHEN p5 AND has_inst AND has_topic THEN author_id END) AS m_s4_n5,
    MAX(CASE WHEN p6 AND has_inst AND has_topic THEN author_id END) AS m_s4_n6,
    MAX(CASE WHEN p1 AND has_source THEN author_id END) AS m_s5_n1,
    MAX(CASE WHEN p2 AND has_source THEN author_id END) AS m_s5_n2,
    MAX(CASE WHEN p5 AND has_source THEN author_id END) AS m_s5_n5,
    MAX(CASE WHEN p6 AND has_source THEN author_id END) AS m_s5_n6,
    MAX(CASE WHEN p1 AND has_topic THEN author_id END) AS m_s3_n1,
    MAX(CASE WHEN p2 AND has_topic THEN author_id END) AS m_s3_n2,
    MAX(CASE WHEN p5 AND has_topic THEN author_id END) AS m_s3_n5,
    COUNT(author_id) AS total_candidates_in_block,
    SUM(CASE WHEN p1 OR p2 OR p3 OR p4 OR p5 OR p6 OR p7 OR p8
             THEN 1 ELSE 0 END) AS total_name_matches
  FROM signals
  GROUP BY work_id
),
final_decision AS (
  SELECT a.work_id,
    CASE
      WHEN om.orcid_author_id IS NOT NULL THEN 'MATCHED'
      WHEN (s1_n1=1 OR s1_n2=1 OR s1_n5=1 OR
            s6_n1=1 OR s6_n2=1 OR s6_n5=1 OR s6_n6=1 OR
            s2_n1=1 OR s2_n2=1 OR s2_n5=1 OR s2_n6=1 OR
            s4_n1=1 OR s4_n2=1 OR s4_n5=1 OR s4_n6=1 OR
            s5_n1=1 OR s5_n2=1 OR s5_n5=1 OR s5_n6=1 OR
            s3_n1=1 OR s3_n2=1 OR s3_n5=1) THEN 'MATCHED'
      WHEN total_candidates_in_block = 0 THEN 'NO_CANDIDATES'
      ELSE 'AMBIGUOUS'
    END AS match_outcome,
    CASE
      WHEN s1_n1 = 1 THEN m_s1_n1 WHEN s1_n2 = 1 THEN m_s1_n2
      WHEN s1_n5 = 1 THEN m_s1_n5
      WHEN s6_n1 = 1 THEN m_s6_n1 WHEN s6_n2 = 1 THEN m_s6_n2
      WHEN s6_n5 = 1 THEN m_s6_n5 WHEN s6_n6 = 1 THEN m_s6_n6
      WHEN s2_n1 = 1 THEN m_s2_n1 WHEN s2_n2 = 1 THEN m_s2_n2
      WHEN s2_n5 = 1 THEN m_s2_n5 WHEN s2_n6 = 1 THEN m_s2_n6
      WHEN s4_n1 = 1 THEN m_s4_n1 WHEN s4_n2 = 1 THEN m_s4_n2
      WHEN s4_n5 = 1 THEN m_s4_n5 WHEN s4_n6 = 1 THEN m_s4_n6
      WHEN s5_n1 = 1 THEN m_s5_n1 WHEN s5_n2 = 1 THEN m_s5_n2
      WHEN s5_n5 = 1 THEN m_s5_n5 WHEN s5_n6 = 1 THEN m_s5_n6
      WHEN s3_n1 = 1 THEN m_s3_n1 WHEN s3_n2 = 1 THEN m_s3_n2
      WHEN s3_n5 = 1 THEN m_s3_n5
    END AS name_author_id,
    CASE
      WHEN s1_n1 = 1 THEN 's1_n1' WHEN s1_n2 = 1 THEN 's1_n2'
      WHEN s1_n5 = 1 THEN 's1_n5'
      WHEN s6_n1 = 1 THEN 's6_n1' WHEN s6_n2 = 1 THEN 's6_n2'
      WHEN s6_n5 = 1 THEN 's6_n5' WHEN s6_n6 = 1 THEN 's6_n6'
      WHEN s2_n1 = 1 THEN 's2_n1' WHEN s2_n2 = 1 THEN 's2_n2'
      WHEN s2_n5 = 1 THEN 's2_n5' WHEN s2_n6 = 1 THEN 's2_n6'
      WHEN s4_n1 = 1 THEN 's4_n1' WHEN s4_n2 = 1 THEN 's4_n2'
      WHEN s4_n5 = 1 THEN 's4_n5' WHEN s4_n6 = 1 THEN 's4_n6'
      WHEN s5_n1 = 1 THEN 's5_n1' WHEN s5_n2 = 1 THEN 's5_n2'
      WHEN s5_n5 = 1 THEN 's5_n5' WHEN s5_n6 = 1 THEN 's5_n6'
      WHEN s3_n1 = 1 THEN 's3_n1' WHEN s3_n2 = 1 THEN 's3_n2'
      WHEN s3_n5 = 1 THEN 's3_n5'
    END AS name_match_tier,
    COALESCE(om.orcid_match_count, 0) AS orcid_match_count,
    om.orcid_author_id
  FROM agg a
  LEFT JOIN orcid_matches om ON a.work_id = om.work_id
)
SELECT work_id, match_outcome, name_match_tier,
       COALESCE(orcid_author_id, name_author_id) AS existing_author_id,
       CASE WHEN orcid_author_id IS NOT NULL THEN 'orcid'
            WHEN name_author_id IS NOT NULL THEN 'name' END AS match_method,
       CAST(orcid_match_count AS BIGINT) AS orcid_match_count,
       (orcid_author_id IS NOT NULL AND name_author_id IS NOT NULL
        AND orcid_author_id <> name_author_id) AS orcid_name_conflict,
       (orcid_author_id IS NOT NULL AND name_author_id IS NULL)
         AS orcid_blind_match
FROM final_decision
"""

_SPARK_SQL = _TEMPLATE.format(
    STR="STRING",
    ARR2_C="array(c_custkey % 50, c_custkey % 13)",
    ARR2_S="array(s_suppkey % 50, s_suppkey % 13)",
    OVERLAP="arrays_overlap",
    MAXBY="max_by",
)

_DUCK_SQL = _TEMPLATE.format(
    STR="VARCHAR",
    ARR2_C="[c_custkey % 50, c_custkey % 13]",
    ARR2_S="[s_suppkey % 50, s_suppkey % 13]",
    OVERLAP="list_has_any",
    MAXBY="arg_max",
)


@register(
    "d6_pattern_cascade",
    oracle=_DUCK_SQL,
    tags=("domain", "D6", "J8", "A4"),
    tables=("customer", "supplier"),
)
def d6_pattern_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-breadth D6: the 22 accepted (strategy x pattern) tiers plus
    the guarded global ORCID tier, one decision row per seat."""
    return spark.sql(_SPARK_SQL)
