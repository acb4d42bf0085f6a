"""Sources API summary statistics (reference
``notebooks/sources/CreateSourcesApi.ipynb`` cell 3): the per-source
citation metrics and topic-share aggregation behind the public API.

Ported semantics:

* **h-index** by the reference's exact device: citations sorted
  descending, then ``ARRAY_MAX(ZIP_WITH(sorted, SEQUENCE(1, n),
  (c, rank) -> IF(c >= rank, rank, 0)))`` — the largest rank whose
  citation count still clears it;
* **i10-index** (works with ≥ 10 citations) and the two-year mean
  citedness (AVG over works published in the last two years, NULL →
  0.0 when the window is empty);
* **topic_share** via GROUPING SETS ((source, topic), (topic)): the
  per-topic GLOBAL total rides the same aggregation as the per-source
  counts, then a window lifts it onto each source row — share =
  count / total.  Top-25 in the reference's comparator order (count
  DESC then id);
* MAX_BY(display_name, score) picks each topic's best-scored naming.

Determinism: shares are emitted at integer fixed point (parts-per-
billion via exact BIGINT division) instead of ROUND(x, 7) — a share
that is exactly 1/2^k (e.g. 1/256 = 0.00390625) rounds differently
under Java HALF_UP vs C half-even at the 7th digit, so the float
rendering is the one thing the reference does that cannot be made
engine-exact.  The two-year window is pinned to the fixture's fixed
"current year" (wall-clock is non-deterministic by design here).

Scale: one works-scan aggregation per source (collect_list of per-work
citation counts is bounded by a source's works — the reference accepts
this for ~250k sources; the heavy part, topic share, is GROUPING SETS
so the global totals need NO second scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openalex_walden_spark.queries.registry import register

_CUR_YEAR = 2026  # pinned (reference uses YEAR(current_date()))
_TOP_K = 5


def _api_sql(dialect: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    if dialect == "spark":
        hindex = (
            "CAST(array_max(zip_with("
            " sort_array(collect_list(cited), false),"
            " sequence(1, size(collect_list(cited))),"
            " (c, r) -> IF(c >= r, r, 0))) AS INT)"
        )
        i10 = "CAST(count_if(cited >= 10) AS INT)"
        maxby = "max_by"
        topk_sig = (
            "array_join(transform(slice(array_sort(collect_list("
            "named_struct('negcnt', -cnt, 'id', topic_id, 'sig',"
            " concat(topic_id, ':', CAST(cnt AS STRING)))))"
            f", 1, {_TOP_K}), x -> x.sig), ';')"
        )
        share_sig = (
            "array_join(transform(slice(array_sort(collect_list("
            "named_struct('negppb', -share_ppb, 'id', topic_id, 'sig',"
            " concat(topic_id, ':', CAST(share_ppb AS STRING)))))"
            f", 1, {_TOP_K}), x -> x.sig), ';')"
        )
    else:
        hindex = (
            "CAST(coalesce(list_max(list_transform("
            " list_zip(list_sort(list(cited), 'DESC'),"
            "          range(1, len(list(cited)) + 1)),"
            " p -> CASE WHEN p[1] >= p[2] THEN p[2] ELSE 0 END)), 0) AS INT)"
        )
        i10 = "CAST(count(*) FILTER (WHERE cited >= 10) AS INT)"
        maxby = "arg_max"
        topk_sig = (
            "array_to_string(list_transform(list_sort(list("
            " struct_pack(negcnt := -cnt, id := topic_id, sig :="
            " concat(topic_id, ':', CAST(cnt AS VARCHAR)))))"
            f"[1:{_TOP_K}], x -> x.sig), ';')"
        )
        share_sig = (
            "array_to_string(list_transform(list_sort(list("
            " struct_pack(negppb := -share_ppb, id := topic_id, sig :="
            " concat(topic_id, ':', CAST(share_ppb AS VARCHAR)))))"
            f"[1:{_TOP_K}], x -> x.sig), ';')"
        )
    intdiv = " div " if dialect == "spark" else " // "
    return f"""
WITH works AS (
  SELECT l_orderkey AS work_id,
         CAST(l_suppkey % 60 AS BIGINT) AS source_id,
         CAST(l_partkey % 90 AS INT) AS cited,
         CAST(1995 + l_orderkey % 31 AS INT) AS pub_year,
         (l_partkey % 3 = 0) AS is_oa
  FROM lineitem WHERE l_linenumber = 1
),
main_agg AS (
  SELECT source_id,
         CAST(count(*) AS INT) AS works_count,
         CAST(sum(cited) AS INT) AS cited_by_count,
         CAST(sum(CASE WHEN is_oa THEN 1 ELSE 0 END) AS INT) AS oa_works_count,
         avg(CASE WHEN pub_year >= {_CUR_YEAR} - 2 THEN cited END) AS two_year_mean0,
         {i10} AS i10_index,
         {hindex} AS h_index
  FROM works GROUP BY source_id
),
work_topics AS (
  SELECT DISTINCT w.source_id, w.work_id,
         concat('T', CAST((w.work_id + t.j) % 40 AS {s})) AS topic_id,
         concat('Topic ', CAST((w.work_id + t.j) % 40 AS {s})) AS display_name,
         CAST((w.work_id * 7 + t.j) % 100 AS INT) AS score
  FROM works w{', UNNEST(range(0, 2)) AS t(j)' if dialect == 'duck'
               else ' LATERAL VIEW explode(sequence(0, 1)) t AS j'}
  WHERE (w.work_id + t.j) % 5 <> 4
),
counts AS (
  SELECT source_id, topic_id,
         {maxby}(display_name, score) AS display_name,
         CAST(count(DISTINCT work_id) AS BIGINT) AS cnt
  FROM work_topics
  GROUP BY GROUPING SETS ((source_id, topic_id), (topic_id))
),
with_totals AS (
  SELECT source_id, topic_id, display_name, cnt,
         max(CASE WHEN source_id IS NULL THEN cnt END)
           OVER (PARTITION BY topic_id) AS topic_total
  FROM counts
),
shares AS (
  SELECT source_id, topic_id, display_name, cnt,
         (cnt * 1000000000){intdiv}topic_total AS share_ppb
  FROM with_totals WHERE source_id IS NOT NULL
),
topic_aggs AS (
  SELECT source_id,
         {topk_sig} AS topics_sig,
         {share_sig} AS topic_share_sig
  FROM shares GROUP BY source_id
)
SELECT m.source_id, m.works_count, m.cited_by_count, m.oa_works_count,
       m.h_index, m.i10_index,
       coalesce(m.two_year_mean0, 0.0) AS two_year_mean,
       coalesce(t.topics_sig, '') AS topics_sig,
       coalesce(t.topic_share_sig, '') AS topic_share_sig
FROM main_agg m
LEFT JOIN topic_aggs t ON t.source_id = m.source_id
ORDER BY m.source_id
"""


@register(
    "source_api_summary_stats",
    oracle=_api_sql("duck"),
    tags=("sourcesapi", "metrics", "hindex"),
    tables=("lineitem",),
)
def source_api_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source h-index / i10 / two-year-mean + GROUPING-SETS topic
    share (CreateSourcesApi.ipynb cell 3; see module docstring)."""
    return spark.sql(_api_sql("spark"))
