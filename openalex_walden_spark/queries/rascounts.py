"""RAS works-counts refresh (reference
``notebooks/end2end/RefreshRasWorksCounts.ipynb``): rebuild per-raw-
affiliation-string works counts from exploded authorships, join the
institutions MV, and MERGE with a content-hash change gate so only
rows whose data actually changed get a fresh ``refreshed_at`` — the
signal the incremental ES sync keys on.

Ported semantics:

* works_count = COUNT(DISTINCT work_id) over the double explode
  (authorships → raw_affiliation_strings);
* LEFT JOIN from the MV so strings with ZERO works still appear with
  works_count = 0 (stale counts must not persist in the index);
* the content hash covers the SORTED institution arrays + countries +
  works_count (array sort = deterministic hash across runs — the
  reference's explicit requirement), with the first-run
  ``COALESCE(target.content_hash, '')`` NULL tolerance;
* MERGE: matched + hash-changed → update (refresh), unmatched →
  insert, matched + same hash → no-op excluded from the feed.

Scale: one distinct-count aggregation keyed on the string, one
string-keyed MV join, map-side sha-256; the update set is the delta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openalex_walden_spark.queries.registry import register

# ---------------------------------------------------------------------------
# Fixture arithmetic (identical in both engines)
# ---------------------------------------------------------------------------
# works-side ras <- lineitem: 'A-<sk%23+2>' (so counts vary by string)
# MV <- k in 2..30: 'A-<k>' for k<=24 (countable) else 'Z-<k>' (zero-
#   count arm); institution arrays sorted; override arm when k%5=0
# prev state <- k%3<>1 exists; hash matches current when k%4<2

_MV_DUCK = """
  SELECT CASE WHEN k <= 24 THEN concat('A-', CAST(k AS VARCHAR))
              ELSE concat('Z-', CAST(k AS VARCHAR)) END AS raw_affiliation_string,
         k,
         array_to_string(list_sort([k, (k % 7) + 2]), ',') AS inst_ids_sig,
         array_to_string(list_sort([k]), ',') AS model_ids_sig,
         CASE WHEN k % 5 = 0 THEN '99' ELSE '' END AS override_sig,
         concat('C', CAST(k % 9 AS VARCHAR)) AS countries_sig,
         CASE WHEN k % 6 = 0 THEN 'model' ELSE 'exact' END AS source
  FROM (SELECT n + 2 AS k FROM range(0, 29) t(n)) ks
"""

_ORACLE_RAS = f"""
WITH counts AS (
  SELECT concat('A-', CAST(l_suppkey % 23 + 2 AS VARCHAR)) AS ras,
         count(DISTINCT l_orderkey) AS works_count
  FROM lineitem GROUP BY 1
),
mv AS ({_MV_DUCK}),
source AS (
  SELECT m.raw_affiliation_string, m.k, m.inst_ids_sig, m.model_ids_sig,
         m.override_sig, m.countries_sig, m.source,
         coalesce(c.works_count, 0) AS works_count,
         sha256(concat(m.inst_ids_sig, '|', m.model_ids_sig, '|', m.override_sig,
                       '|', m.countries_sig, '|',
                       CAST(coalesce(c.works_count, 0) AS VARCHAR))) AS content_hash
  FROM mv m LEFT JOIN counts c ON c.ras = m.raw_affiliation_string
),
prev AS (
  SELECT raw_affiliation_string,
         CASE WHEN k % 4 < 2 THEN content_hash ELSE 'stale' END AS prev_hash
  FROM source WHERE k % 3 <> 1
)
SELECT s.raw_affiliation_string, s.works_count, s.inst_ids_sig, s.countries_sig,
       s.source, s.content_hash,
       CASE WHEN p.raw_affiliation_string IS NULL THEN 'insert' ELSE 'update' END AS action
FROM source s
LEFT JOIN prev p ON p.raw_affiliation_string = s.raw_affiliation_string
WHERE p.raw_affiliation_string IS NULL OR coalesce(p.prev_hash, '') <> s.content_hash
ORDER BY s.raw_affiliation_string
"""


@register(
    "ras_counts_refresh",
    oracle=_ORACLE_RAS,
    tags=("rascounts", "hashgate", "merge"),
    tables=("lineitem",),
)
def ras_counts_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gated RAS works-count refresh
    (RefreshRasWorksCounts.ipynb; see module docstring)."""
    counts = (
        spark.table("lineitem")
        .selectExpr("concat('A-', CAST(l_suppkey % 23 + 2 AS STRING)) AS ras", "l_orderkey")
        .groupBy("ras")
        .agg(F.countDistinct("l_orderkey").alias("works_count"))
    )
    mv = spark.range(0, 29).selectExpr(
        "id + 2 AS k",
        "CASE WHEN id + 2 <= 24 THEN concat('A-', CAST(id + 2 AS STRING))"
        " ELSE concat('Z-', CAST(id + 2 AS STRING)) END AS raw_affiliation_string",
        "array_join(array_sort(array(id + 2, ((id + 2) % 7) + 2)), ',') AS inst_ids_sig",
        "array_join(array_sort(array(id + 2)), ',') AS model_ids_sig",
        "CASE WHEN (id + 2) % 5 = 0 THEN '99' ELSE '' END AS override_sig",
        "concat('C', CAST((id + 2) % 9 AS STRING)) AS countries_sig",
        "CASE WHEN (id + 2) % 6 = 0 THEN 'model' ELSE 'exact' END AS source",
    )
    source = (
        mv.join(F.broadcast(counts), mv.raw_affiliation_string == counts.ras, "left")
        .selectExpr(
            "raw_affiliation_string", "k", "inst_ids_sig", "model_ids_sig",
            "override_sig", "countries_sig", "source",
            "coalesce(works_count, 0) AS works_count",
        )
        .selectExpr(
            "*",
            "sha2(concat(inst_ids_sig, '|', model_ids_sig, '|', override_sig,"
            " '|', countries_sig, '|', CAST(works_count AS STRING)), 256) AS content_hash",
        )
    )
    prev = source.where("k % 3 <> 1").selectExpr(
        "raw_affiliation_string AS p_ras",
        "CASE WHEN k % 4 < 2 THEN content_hash ELSE 'stale' END AS prev_hash",
    )
    return (
        source.join(prev, source.raw_affiliation_string == prev.p_ras, "left")
        .where("p_ras IS NULL OR coalesce(prev_hash, '') <> content_hash")
        .selectExpr(
            "raw_affiliation_string", "works_count", "inst_ids_sig", "countries_sig",
            "source", "content_hash",
            "CASE WHEN p_ras IS NULL THEN 'insert' ELSE 'update' END AS action",
        )
        .orderBy("raw_affiliation_string")
    )


# ---------------------------------------------------------------------------
# Content-index grobid gap fill (notebooks/elastic/d1_antijoin_grobid.py)
# ---------------------------------------------------------------------------
# The oxjob #202 Track-1 reconciliation: work_ids that ARE in the
# serving index (with a pdf_uuid) but whose grobid_uuid is NULL even
# though locations_mapped has grobid content for them — the ~9.35%
# BAD_404 cohort.  Two semantics carry the whole fix:
# * the BAD-COHORT anti-join runs BEFORE the pick, so a work whose only
#   good XML has a bad sibling keeps the good one (dropping after the
#   pick would turn a fixable 404 into BAD_BYTE garbage);
# * MIN(grobid_uuid) picks deterministically among surviving siblings.

_GAP_ORACLE = """
WITH lm AS (
  SELECT l_orderkey AS work_id,
         concat('g', CAST((l_partkey * 3 + l_linenumber) % 900 AS VARCHAR)) AS grobid_uuid
  FROM lineitem WHERE l_linenumber <= 3 AND l_suppkey % 4 <> 0
),
d1 AS (
  SELECT o_orderkey AS work_id,
         concat('p', CAST(o_orderkey AS VARCHAR)) AS pdf_uuid,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL
              ELSE concat('g', CAST(o_orderkey % 900 AS VARCHAR)) END AS grobid_uuid
  FROM orders WHERE o_orderkey % 5 <> 4
),
bad AS (
  SELECT concat('g', CAST(n * 7 % 900 AS VARCHAR)) AS bad_uuid FROM range(0, 60) t(n)
  UNION
  SELECT concat('g', CAST(n * 11 % 900 AS VARCHAR)) FROM range(0, 40) t(n)
),
candidates AS (
  SELECT lm.work_id, lm.grobid_uuid
  FROM lm
  JOIN d1 ON d1.work_id = lm.work_id
  WHERE d1.grobid_uuid IS NULL AND d1.pdf_uuid IS NOT NULL
),
good AS (
  SELECT c.work_id, c.grobid_uuid
  FROM candidates c
  LEFT JOIN bad b ON b.bad_uuid = c.grobid_uuid
  WHERE b.bad_uuid IS NULL
)
SELECT work_id, min(grobid_uuid) AS grobid_uuid
FROM good GROUP BY work_id
ORDER BY work_id
"""


@register(
    "content_grobid_gap_fill",
    oracle=_GAP_ORACLE,
    tags=("contentindex", "antijoin", "reconcile"),
    tables=("lineitem", "orders"),
)
def content_grobid_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The column-level serving-index gap set with the bad-cohort
    anti-join ordered BEFORE the sibling pick
    (d1_antijoin_grobid.py; see the section comment)."""
    lm = spark.table("lineitem").where("l_linenumber <= 3 AND l_suppkey % 4 <> 0").selectExpr(
        "l_orderkey AS work_id",
        "concat('g', CAST((l_partkey * 3 + l_linenumber) % 900 AS STRING)) AS grobid_uuid",
    )
    d1 = spark.table("orders").where("o_orderkey % 5 <> 4").selectExpr(
        "o_orderkey AS d1_work",
        "concat('p', CAST(o_orderkey AS STRING)) AS pdf_uuid",
        "CASE WHEN o_orderkey % 3 = 0 THEN NULL"
        " ELSE concat('g', CAST(o_orderkey % 900 AS STRING)) END AS d1_grobid",
    )
    bad = (
        spark.range(0, 60)
        .selectExpr("concat('g', CAST(id * 7 % 900 AS STRING)) AS bad_uuid")
        .unionByName(
            spark.range(0, 40).selectExpr("concat('g', CAST(id * 11 % 900 AS STRING)) AS bad_uuid")
        )
        .distinct()
    )
    candidates = lm.join(
        d1.where("d1_grobid IS NULL AND pdf_uuid IS NOT NULL"),
        F.col("work_id") == F.col("d1_work"),
    ).select("work_id", "grobid_uuid")
    good = candidates.join(F.broadcast(bad), F.col("grobid_uuid") == F.col("bad_uuid"), "left_anti")
    return good.groupBy("work_id").agg(F.min("grobid_uuid").alias("grobid_uuid")).orderBy("work_id")
