"""Publishers API build + content-hash churn gate (reference
``notebooks/publishers/CreatePublishersAPI.ipynb`` cells 0-2).

Ported semantics (cell 1 unless noted):

* **work->publisher pairs**: explode works.locations, keep
  ``host_organization LIKE 'https://openalex.org/P%'``, strip the
  prefix to a BIGINT publisher id, DISTINCT over
  (work, publisher, year, cited) — a work listing the same publisher
  in two locations counts once;
* yearly + total counts, then ``counts_by_year`` filtered to
  2014..current-year and sorted descending (current year pinned to
  the fixture's 2026 — wall-clock is a seam, as in sourcesapi);
* **summary_stats**: two-year mean citedness (AVG over pairs
  published in the last two years, COALESCE 0.0), i10 (pairs with
  >= 10 citations, COALESCE 0), and the h-index by the reference's
  exact ZIP_WITH/SEQUENCE device — **h_index is deliberately NOT
  COALESCEd** (a publisher with no works ships NULL h_index but 0.0
  mean and 0 i10 — a real asymmetry in the reference SELECT);
* **roles**: the publisher's own 'publisher' role plus entity_link
  partners labelled institution/funder, works_count looked up
  per-role (own counts / institutions_api / funders_api), then the
  ``rn = 1 OR role != 'funder'`` dedup — ONLY funders are deduped to
  the top-works one; duplicate institution links all survive.
  DEVIATIONS (each neutral to content): the reference's OR-condition
  entity_link join is decomposed into a UNION of two equi-joins (no
  nested-loop; identical output because a link row matches at most
  one side in the fixture and non-I/F partners are filtered), and
  the roles array is rendered deterministically sorted (the
  reference's COLLECT_LIST order is undefined);
* every array/struct output renders as a JSON string (driver-canon
  contract): lineage, alternate_titles/country_codes (the reference
  from_json's stored JSON and re-emits — the identity is kept as the
  raw stored string), roles, counts_by_year; the ids struct flattens
  to ``id_openalex``/``ror_id``/``wikidata_id`` scalars;
* ``WHERE merge_into_id IS NULL`` drops merged-away publishers;
* **churn gate** (cells 0 + 2): md5-60bit over the CONCAT_WS('|') of
  the rendered content fields (the reference uses xxhash64 —
  md5-for-portability, same trade as d9_change_detection), LEFT JOIN
  against the previous snapshot's hash table, and updated_date bumps
  only for new-or-changed rows (timestamps pinned: CURRENT_TIMESTAMP
  is a seam).  The fixture's old snapshot marks id%9==0 rows changed
  and id%5==3 rows brand-new.

Scale: pairs is one explode + DISTINCT (shuffle on the pair key),
counts/stats are one aggregation each over pairs, roles joins are
dimension-sized (entity_link ~10^6 rows in production — broadcast),
and the churn join is publisher-keyed.  collect_list of per-publisher
citations is bounded by a publisher's works — accepted by the
reference for the same cardinality (~10k publishers).

Fixture: works from ``orders``, locations from ``lineitem`` (P-link
lattice incl. NULL and non-P hosts), publishers from ``part``
(merge_into_id lattice), entity_link from ``nation`` + extra funder
links from ``region`` (multi-funder publishers exercise the
top-funder dedup), institutions/funders API lookups from ``nation``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openalex_walden_spark.queries.registry import register

_CUR_YEAR = 2026  # pinned (reference: YEAR(current_date()))


def _sql(dialect: str) -> str:
    sp = dialect == "spark"
    S = "STRING" if sp else "VARCHAR"
    cs = lambda e: f"CAST({e} AS {S})"  # noqa: E731
    null_s = f"CAST(NULL AS {S})"
    if sp:
        hindex = (
            "CAST(array_max(zip_with("
            " sort_array(collect_list(cited_by_count), false),"
            " sequence(1, size(collect_list(cited_by_count))),"
            " (c, r) -> IF(c >= r, r, 0))) AS INT)"
        )
        i10 = "CAST(count_if(cited_by_count >= 10) AS INT)"
        cby = (
            "to_json(sort_array(filter(collect_list(named_struct("
            " 'year', publication_year,"
            " 'works_count', yr_works,"
            " 'cited_by_count', yr_cited)),"
            f" x -> x.year >= 2014 AND x.year <= {_CUR_YEAR}), false))"
        )
        roles_json = (
            "to_json(array_sort(collect_list(named_struct("
            "'role', role, 'id', role_id, 'works_count', rw))))"
        )
    else:
        hindex = (
            "CAST(coalesce(list_max(list_transform("
            " list_zip(list_sort(list(cited_by_count), 'DESC'),"
            "          range(1, len(list(cited_by_count)) + 1)),"
            " p -> CASE WHEN p[1] >= p[2] THEN p[2] ELSE 0 END)), "
            "0) AS INT)"
        )
        i10 = "CAST(count(*) FILTER (WHERE cited_by_count >= 10) AS INT)"
        cby = (
            "CAST(to_json(list_sort(list_filter(list(struct_pack("
            " year := publication_year,"
            " works_count := yr_works,"
            " cited_by_count := yr_cited)),"
            f" x -> x.year >= 2014 AND x.year <= {_CUR_YEAR}), 'DESC')) "
            f"AS VARCHAR)"
        )
        roles_json = (
            "CAST(to_json(list_sort(list(struct_pack("
            "role := role, id := role_id, works_count := rw)))) "
            "AS VARCHAR)"
        )
    h60 = (
        (lambda x: f"cast(conv(substr(md5({x}), 1, 15), 16, 10) as bigint)")
        if sp else
        (lambda x: f"(('0x' || substr(md5({x}), 1, 15))::BIGINT)")
    )
    content_fields = (
        "concat_ws('|', {a}id, display_name, "
        "coalesce(alternate_titles, '[]'), "
        "coalesce(country_codes, '[]'), "
        f"coalesce({cs('hierarchy_level')}, ''), "
        "coalesce(parent_publisher, '{{}}'), coalesce(ror_id, ''), "
        "coalesce(image_url, ''), coalesce(image_thumbnail_url, ''), "
        "coalesce(wikidata_id, ''), coalesce(homepage_url, ''), "
        f"coalesce({cs('works_count')}, '0'), "
        f"coalesce({cs('cited_by_count')}, '0'), "
        "ss_2yr_mean_citedness, "
        f"coalesce({cs('ss_h_index')}, ''), {cs('ss_i10_index')}, "
        "roles_json, counts_by_year_json)"
    )
    return f"""
WITH works AS (
  SELECT o_orderkey AS work_id,
         CAST(1992 + o_orderkey % 35 AS INT) AS publication_year,
         CAST(o_orderkey % 83 AS INT)
           + CASE WHEN o_orderkey % 17 = 0 THEN 40 ELSE 0 END
           AS cited_by_count
  FROM orders
),
locations AS (
  SELECT l_orderkey AS work_id,
         CASE CAST(l_suppkey % 7 AS INT)
           WHEN 0 THEN {null_s}
           WHEN 1 THEN concat('https://openalex.org/S',
                              {cs('l_suppkey % 40')})
           ELSE concat('https://openalex.org/P', {cs('l_suppkey % 97')})
         END AS host_organization
  FROM lineitem
),
pairs AS (
  SELECT DISTINCT w.work_id,
         CAST(replace(l.host_organization,
                      'https://openalex.org/P', '') AS BIGINT)
           AS publisher_id,
         w.publication_year, w.cited_by_count
  FROM works w JOIN locations l ON l.work_id = w.work_id
  WHERE l.host_organization IS NOT NULL
    AND l.host_organization LIKE 'https://openalex.org/P%'
),
yearly AS (
  SELECT publisher_id, publication_year,
         CAST(count(work_id) AS BIGINT) AS yr_works,
         CAST(sum(cited_by_count) AS BIGINT) AS yr_cited
  FROM pairs GROUP BY publisher_id, publication_year
),
totals AS (
  SELECT publisher_id,
         CAST(count(work_id) AS BIGINT) AS total_works,
         CAST(sum(cited_by_count) AS BIGINT) AS total_cited
  FROM pairs GROUP BY publisher_id
),
pub_stats AS (
  SELECT publisher_id,
         CAST(avg(CASE WHEN publication_year >= {_CUR_YEAR - 2}
                       THEN cited_by_count END) AS DOUBLE)
           AS two_year_mean,
         {i10} AS i10_index,
         {hindex} AS h_index
  FROM pairs GROUP BY publisher_id
),
counts AS (
  SELECT t.publisher_id AS id, t.total_works AS works_count,
         t.total_cited AS cited_by_count,
         {cby} AS cby_json
  FROM totals t LEFT JOIN yearly y ON t.publisher_id = y.publisher_id
  GROUP BY t.publisher_id, t.total_works, t.total_cited
),
publishers AS (
  SELECT CAST(p_partkey AS BIGINT) AS id,
         concat('Publisher ', {cs('p_partkey')}) AS display_name,
         CASE WHEN p_partkey % 6 = 0 THEN {null_s}
              ELSE concat('["Alt ', {cs('p_partkey')}, '"]') END
           AS alternate_titles,
         CASE WHEN p_partkey % 4 = 0 THEN '["US","GB"]'
              ELSE '["DE"]' END AS country_codes,
         CAST(p_partkey % 3 AS INT) AS hierarchy_level,
         CASE WHEN p_partkey % 5 = 0
              THEN concat('https://openalex.org/P',
                          {cs('p_partkey % 20')}) ELSE {null_s} END
           AS parent_publisher,
         CASE WHEN p_partkey % 7 = 0 THEN {null_s}
              ELSE concat('https://ror.org/0',
                          lpad({cs('p_partkey % 999')}, 3, '0')) END
           AS ror_id,
         CASE WHEN p_partkey % 8 = 0
              THEN concat('https://img.example/p', {cs('p_partkey')})
              ELSE {null_s} END AS image_url,
         CASE WHEN p_partkey % 8 = 0
              THEN concat('https://img.example/t', {cs('p_partkey')})
              ELSE {null_s} END AS image_thumbnail_url,
         CASE WHEN p_partkey % 9 = 0 THEN {null_s}
              ELSE concat('https://www.wikidata.org/wiki/Q',
                          {cs('p_partkey * 31 % 100000')}) END
           AS wikidata_id,
         CASE WHEN p_partkey % 10 = 0 THEN {null_s}
              ELSE concat('https://publisher', {cs('p_partkey')},
                          '.example.com') END AS homepage_url,
         concat('20', lpad({cs('p_partkey % 20')}, 2, '0'),
                '-01-15 00:00:00') AS created_date,
         CASE WHEN p_partkey % 13 = 0
              THEN CAST(p_partkey + 1 AS BIGINT) END AS merge_into_id
  FROM part WHERE p_partkey <= 120
),
entity_link AS (
  SELECT CASE WHEN n_nationkey % 2 = 0
              THEN concat('P', {cs('(n_nationkey * 4) % 97')})
              ELSE concat('I', {cs('n_nationkey')}) END AS id_1,
         CASE WHEN n_nationkey % 2 = 0
              THEN CASE WHEN n_nationkey % 3 = 0
                        THEN concat('F', {cs('n_nationkey')})
                        ELSE concat('I', {cs('n_nationkey')}) END
              ELSE concat('P', {cs('(n_nationkey * 4) % 97')}) END AS id_2
  FROM nation
  UNION ALL
  SELECT concat('P', {cs('(r_regionkey * 8) % 97')}),
         concat('F', {cs('r_regionkey + 10')}) FROM region
  UNION ALL
  SELECT concat('F', {cs('r_regionkey + 15')}),
         concat('P', {cs('(r_regionkey * 8) % 97')}) FROM region
),
institutions_api AS (
  SELECT CAST(n_nationkey AS BIGINT) AS id,
         CAST(n_nationkey * 11 % 500 AS INT) AS works_count FROM nation
),
funders_api AS (
  SELECT CAST(n_nationkey AS BIGINT) AS id,
         CAST(n_nationkey * 13 % 400 AS INT) AS works_count FROM nation
),
-- the reference's OR-condition join, decomposed (module docstring)
links_expanded AS (
  SELECT p.id AS publisher_id, el.id_1, el.id_2
  FROM publishers p JOIN entity_link el
    ON el.id_1 = concat('P', {cs('p.id')})
  UNION ALL
  SELECT p.id AS publisher_id, el.id_1, el.id_2
  FROM publishers p JOIN entity_link el
    ON el.id_2 = concat('P', {cs('p.id')})
),
all_entity_ids AS (
  SELECT id AS publisher_id, concat('P', {cs('id')}) AS entity_id,
         'publisher' AS role
  FROM publishers
  UNION ALL
  SELECT publisher_id,
         CASE WHEN id_1 LIKE 'P%' THEN id_2 ELSE id_1 END AS entity_id,
         CASE WHEN id_1 LIKE 'I%' OR id_2 LIKE 'I%' THEN 'institution'
              WHEN id_1 LIKE 'F%' OR id_2 LIKE 'F%' THEN 'funder' END
           AS role
  FROM links_expanded
  WHERE id_1 LIKE 'I%' OR id_1 LIKE 'F%'
     OR id_2 LIKE 'I%' OR id_2 LIKE 'F%'
),
roles_with_counts AS (
  SELECT ae.publisher_id, ae.role,
         concat('https://openalex.org/', ae.entity_id) AS role_id,
         CASE WHEN ae.role = 'publisher' THEN wc.works_count
              WHEN ae.role = 'institution' THEN i_api.works_count
              WHEN ae.role = 'funder' THEN f_api.works_count END
           AS works_count
  FROM all_entity_ids ae
  LEFT JOIN counts wc
    ON ae.role = 'publisher' AND ae.publisher_id = wc.id
  LEFT JOIN institutions_api i_api
    ON ae.role = 'institution'
   AND ae.entity_id = concat('I', {cs('i_api.id')})
  LEFT JOIN funders_api f_api
    ON ae.role = 'funder'
   AND ae.entity_id = concat('F', {cs('f_api.id')})
),
deduplicated_roles AS (
  SELECT publisher_id, role, role_id,
         CAST(coalesce(works_count, 0) AS INT) AS rw,
         row_number() OVER (
           PARTITION BY publisher_id, role
           ORDER BY works_count DESC, role_id) AS rn
  FROM roles_with_counts
),
publisher_roles AS (
  SELECT publisher_id, {roles_json} AS roles_json
  FROM deduplicated_roles
  WHERE rn = 1 OR role <> 'funder'
  GROUP BY publisher_id
),
api AS (
  SELECT p.id,
         concat('["https://openalex.org/P', {cs('p.id')}, '"]')
           AS lineage_json,
         p.display_name, p.alternate_titles, p.country_codes,
         p.hierarchy_level, p.parent_publisher,
         concat('https://openalex.org/P', {cs('p.id')}) AS id_openalex,
         p.ror_id, p.image_url, p.image_thumbnail_url, p.wikidata_id,
         p.homepage_url,
         CAST(coalesce(c.works_count, 0) AS BIGINT) AS works_count,
         CAST(coalesce(c.cited_by_count, 0) AS BIGINT)
           AS cited_by_count,
         coalesce(ps.two_year_mean, 0.0) AS ss_2yr_mean_citedness,
         ps.h_index AS ss_h_index,
         CAST(coalesce(ps.i10_index, 0) AS INT) AS ss_i10_index,
         coalesce(pr.roles_json, '[]') AS roles_json,
         coalesce(c.cby_json, '[]') AS counts_by_year_json,
         concat('https://api.openalex.org/sources?filter=',
                'host_organization.id:P', {cs('p.id')})
           AS sources_api_url,
         p.created_date
  FROM publishers p
  LEFT JOIN counts c ON p.id = c.id
  LEFT JOIN pub_stats ps ON ps.publisher_id = p.id
  LEFT JOIN publisher_roles pr ON p.id = pr.publisher_id
  WHERE p.merge_into_id IS NULL
),
hashed AS (
  SELECT *, {h60(content_fields.format(a=''))} AS content_hash
  FROM api
),
-- previous-round state (a fixture input in this harness): rows with
-- id%9==0 carry a perturbed hash ("content changed since last run"),
-- id%5==3 rows are absent ("new publisher"); everything else stores
-- the live hash ("unchanged")
old_snapshot AS (
  SELECT id,
         CASE WHEN id % 9 = 0
              THEN {h60("concat('PERTURBED|', " + cs('id') + ")")}
              ELSE content_hash END AS old_hash
  FROM hashed WHERE id % 5 <> 3
)
SELECT h.id, h.lineage_json, h.display_name, h.alternate_titles,
       h.country_codes, h.hierarchy_level, h.parent_publisher,
       h.id_openalex, h.ror_id, h.image_url, h.image_thumbnail_url,
       h.wikidata_id, h.homepage_url, h.works_count, h.cited_by_count,
       h.ss_2yr_mean_citedness, h.ss_h_index, h.ss_i10_index,
       h.roles_json, h.counts_by_year_json, h.sources_api_url,
       h.created_date,
       CASE WHEN o.id IS NULL THEN 'new'
            WHEN h.content_hash <> o.old_hash THEN 'changed'
            ELSE 'unchanged' END AS churn,
       CASE WHEN o.id IS NULL OR h.content_hash <> o.old_hash
            THEN '{_CUR_YEAR}-08-16 00:00:00'
            ELSE '{_CUR_YEAR}-07-01 00:00:00' END AS updated_date
FROM hashed h LEFT JOIN old_snapshot o ON h.id = o.id
"""


@register(
    "publishers_api_build",
    oracle=_sql("duck"),
    tags=("domain", "D11", "publishers"),
    tables=("orders", "lineitem", "part", "nation", "region"),
    doc=(
        "Publishers API build + churn gate (notebooks/publishers/"
        "CreatePublishersAPI.ipynb cells 0-2)"
    ),
)
def publishers_api_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Work->publisher pair derivation, counts_by_year window,
    summary-stats trio (h_index deliberately un-COALESCEd), the
    top-funder-only roles dedup, and the content-hash churn gate
    (module docstring has the semantics map and the two documented
    DEVIATIONS: OR-join decomposition, sorted roles render)."""
    return spark.sql(_sql("spark"))
