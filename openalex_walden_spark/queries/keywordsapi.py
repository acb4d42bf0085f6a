"""Keywords API build + content-hash churn gate (reference
``notebooks/keywords/CreateKeywordsAPI.ipynb`` cells 0-2).

Ported semantics (cell 1 unless noted):

* explode works.keywords, then per-(work, keyword.id) dedup via the
  reference's ``QUALIFY ROW_NUMBER() ... ORDER BY work_id`` — the
  order key is CONSTANT inside the partition, so the reference's pick
  is arbitrary; it is harmless there (and exactly reproducible here)
  because duplicate (work, keyword) rows are identical tuples — the
  fixture keeps display_name functionally dependent on the keyword id
  for the same reason the production table is: one keyword, one name;
* per-keyword rollup: ANY_VALUE(display_name),
  COUNT(DISTINCT work_id) works_count (INT), SUM(cited_by_count)
  cast INT;
* **INNER JOIN against the keywords dimension** on
  ``REPLACE(id, 'https://openalex.org/keywords/', '')`` with
  MIN(created_datetime) per keyword — a keyword appearing on works
  but missing from the dimension table is DROPPED (preserved quirk;
  the fixture's kw-70..79 exercise it);
* works_api_url concat; created_date = DATE_TRUNC('SECOND', min
  created) rendered as a string (oracle-compared outputs never ship
  raw TIMESTAMPs);
* **churn gate** (cells 0 + 2): md5-60bit over
  CONCAT_WS('|', id, display_name, works_count, cited_by_count)
  (xxhash64 -> md5-for-portability, the d9_change_detection trade),
  LEFT JOIN the previous snapshot's hash table; new-or-changed rows
  bump updated_date, unchanged keep the stored one (timestamps
  pinned — CURRENT_TIMESTAMP is a seam).  Fixture old snapshot:
  keyword-ordinal % 7 == 0 perturbed ("changed"), % 11 == 3 absent
  ("new").

Scale: one explode + one (work, keyword) dedup window + one keyword
rollup (COUNT DISTINCT shuffles on the keyword key), a broadcast-size
dimension join, and a keyword-keyed churn join.  No collect, no
Python.

Fixture: works from ``orders``, the per-work keyword list from
``lineitem`` (l_partkey % 80 -> kw ids, so multiple lineitems of one
order collide on a keyword and exercise the dedup), the keywords
dimension from ``part`` (several rows per keyword_id -> MIN created).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openalex_walden_spark.queries.registry import register

_KW_PREFIX = "https://openalex.org/keywords/"


def _sql(dialect: str) -> str:
    sp = dialect == "spark"
    S = "STRING" if sp else "VARCHAR"
    cs = lambda e: f"CAST({e} AS {S})"  # noqa: E731
    h60 = (
        (lambda x: f"cast(conv(substr(md5({x}), 1, 15), 16, 10) as bigint)")
        if sp else
        (lambda x: f"(('0x' || substr(md5({x}), 1, 15))::BIGINT)")
    )
    if sp:
        created = ("date_format(date_trunc('SECOND', "
                   "CAST(min(created_raw) AS TIMESTAMP)), "
                   "'yyyy-MM-dd HH:mm:ss')")
        kdate = ("date_format(date_add(CAST('2023-01-01' AS DATE), "
                 "CAST(p_partkey % 600 AS INT)), "
                 "'yyyy-MM-dd HH:mm:ss')")
    else:
        created = ("strftime(date_trunc('second', "
                   "CAST(min(created_raw) AS TIMESTAMP)), "
                   "'%Y-%m-%d %H:%M:%S')")
        kdate = ("strftime(CAST('2023-01-01' AS DATE) + "
                 "CAST(p_partkey % 600 AS INT), '%Y-%m-%d %H:%M:%S')")
    return f"""
WITH works AS (
  SELECT o_orderkey AS work_id,
         CAST(o_orderkey % 131 AS INT) AS cited_by_count
  FROM orders
),
exploded AS (
  SELECT w.work_id, w.cited_by_count,
         concat('{_KW_PREFIX}kw-', {cs('l.l_partkey % 80')}) AS kw_id,
         concat('Keyword ', {cs('l.l_partkey % 80')}) AS display_name
  FROM works w JOIN lineitem l ON l.l_orderkey = w.work_id
),
dedup AS (
  SELECT work_id, cited_by_count, kw_id, display_name
  FROM (
    SELECT *, row_number() OVER (
             PARTITION BY work_id, kw_id ORDER BY work_id) AS rn
    FROM exploded
  ) x WHERE rn = 1
),
aggregated_counts AS (
  SELECT kw_id AS id,
         any_value(display_name) AS display_name,
         CAST(count(DISTINCT work_id) AS INT) AS works_count,
         CAST(sum(cited_by_count) AS INT) AS cited_by_count
  FROM dedup GROUP BY kw_id
),
keywords_dim AS (
  SELECT concat('kw-', {cs('p_partkey % 70')}) AS keyword_id,
         {kdate} AS created_raw
  FROM part
),
kw_min AS (
  SELECT keyword_id, {created} AS created_date
  FROM keywords_dim GROUP BY keyword_id
),
api AS (
  SELECT ac.id, ac.display_name, ac.works_count, ac.cited_by_count,
         concat('https://api.openalex.org/works?filter=keywords.id:',
                'keywords/', kw.keyword_id) AS works_api_url,
         kw.created_date
  FROM aggregated_counts ac
  JOIN kw_min kw
    ON kw.keyword_id = replace(ac.id, '{_KW_PREFIX}', '')
),
hashed AS (
  SELECT *, {h60(
      "concat_ws('|', id, coalesce(display_name, ''), "
      + cs('works_count') + ", " + cs('cited_by_count') + ")")}
    AS content_hash
  FROM api
),
old_snapshot AS (
  SELECT id,
         CASE WHEN CAST(replace(id, '{_KW_PREFIX}kw-', '') AS BIGINT)
                   % 7 = 0
              THEN {h60("concat('PERTURBED|', id)")}
              ELSE content_hash END AS old_hash
  FROM hashed
  WHERE CAST(replace(id, '{_KW_PREFIX}kw-', '') AS BIGINT) % 11 <> 3
)
SELECT h.id, h.display_name, h.works_count, h.cited_by_count,
       h.works_api_url, h.created_date,
       CASE WHEN o.id IS NULL THEN 'new'
            WHEN h.content_hash <> o.old_hash THEN 'changed'
            ELSE 'unchanged' END AS churn,
       CASE WHEN o.id IS NULL OR h.content_hash <> o.old_hash
            THEN '2026-08-16 00:00:00'
            ELSE '2026-07-01 00:00:00' END AS updated_date
FROM hashed h LEFT JOIN old_snapshot o ON h.id = o.id
"""


@register(
    "keywords_api_build",
    oracle=_sql("duck"),
    tags=("domain", "D11", "keywords"),
    tables=("orders", "lineitem", "part"),
    doc=(
        "Keywords API build + churn gate (notebooks/keywords/"
        "CreateKeywordsAPI.ipynb cells 0-2)"
    ),
)
def keywords_api_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-work keyword dedup, keyword rollup with the inner-join
    dimension drop quirk, MIN-created date, and the content-hash
    churn gate (module docstring has the semantics map)."""
    return spark.sql(_sql("spark"))
