"""Location→source resolution ladder (reference
``notebooks/end2end/CreateLocationsWithSources.ipynb``): attach a
source_id to every ingested location through the reference's exact
rung order.

Rungs (cell 1, then cells 3-7):

1. **Source pool hygiene** — merged-away sources (``merge_into_id IS
   NOT NULL``) and the hard denylist (Internet Archive, CiteSeer X,
   Scopus, ResearchGate, …) never match anything.
2. **Per-provenance primary match**:
   * journal provenances (crossref &c): explode the ids array, keep
     issn-namespace entries, rank namespaces ``eissn < lissn < pissn``
     (then id text) per location, join issn → source where EACH issn
     resolves to its MIN source id, keep the best-ranked resolved row;
   * ``datacite``: explode ``datacite_client`` ids with relationship
     ``self`` OR NULL (typed relationships never match), join the
     datacite map, min source id;
   * ``pubmed``: the constant PubMed source id;
   * ``repo``/``repo_backfill``: endpoint_id → source with the min-id
     rank per endpoint.
3. **Unique-display-name fallback** — unmatched locations join
   ``source_name = display_name`` but ONLY display names held by
   exactly one live source (the ``HAVING count(*) = 1`` guard: an
   ambiguous name must never guess).
4. **Manual ladders** over what is STILL unmatched, in order: base-URL
   extraction (``REGEXP_EXTRACT(url, 'https?://(www\\.)?([^/]+)', 2)``)
   against the hand-curated host map, DOI-prefix rules (ssrn,
   preprints.org, chemrxiv), lowercase source-name rules (biorxiv,
   medrxiv, research square), publisher-contains rules.

The port adds a ``match_stage`` column naming the rung that fired
(primary / display_name / url / doi_prefix / source_name / publisher /
unmatched) so the oracle hash pins the LADDER ORDER, not just the final
ids — a location eligible for two rungs must take the earlier one.

Scale: the sources dim and all its derived maps are broadcast; the
location side never shuffles — every rung is a broadcast left join +
CASE, so the ladder is one map-side pass at any corpus size.  The
explode rungs fan out only id-array entries (bounded per location).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openalex_walden_spark.queries.registry import register

# ---------------------------------------------------------------------------
# Fixture arithmetic (identical in both engines)
# ---------------------------------------------------------------------------
# locations <- lineitem: provenance by l_partkey%7 (repo, repo_backfill,
#   datacite, pubmed, else crossref); native_id unique per row
# ids (crossref): eissn 'E<sk%50>' unless sk%3=0; pissn 'P<pk%60>';
#   lissn 'L<sk%40>' when pk%5=0
# ids (datacite): 'DC<sk%30>' rel self when sk%4<2, rel NULL when =2,
#   rel 'part' when =3 (must be ignored)
# repo endpoint <- 'ep<sk%25>'
# sources k=1..80: merged when k%17=0; denylist {13, 26}; issns:
#   even k -> 'E<k%50>', odd k -> 'P<k%60>', k%9=0 adds 'L<k%40>';
#   datacite id 'DC<k%30>' when k%3=0; endpoint 'ep<k%25>' when k%2=1;
#   display 'Src <k>' but k%10=0 collides as 'Dup Name' (ambiguous ->
#   excluded); is_oa = k%4=0
# manual rungs <- crossref-unmatched rows get urls/dois/names by okey mods

_LOC_DUCK = """
  SELECT concat('L', CAST(l_orderkey AS VARCHAR), '.', CAST(l_linenumber AS VARCHAR),
                '.', CAST(l_partkey AS VARCHAR)) AS native_id,
         CASE CAST(l_partkey % 7 AS INT)
           WHEN 0 THEN 'repo' WHEN 1 THEN 'repo_backfill' WHEN 2 THEN 'datacite'
           WHEN 3 THEN 'pubmed' ELSE 'crossref' END AS provenance,
         l_orderkey AS okey, l_partkey AS pk, l_suppkey AS sk,
         concat('ep', CAST(l_suppkey % 25 AS VARCHAR)) AS endpoint_id,
         CASE WHEN l_partkey % 11 = 0 THEN concat('Src ', CAST((l_suppkey % 80) + 1 AS VARCHAR))
              WHEN l_partkey % 11 = 1 THEN 'Dup Name' END AS source_name,
         CASE WHEN l_orderkey % 31 = 0 AND l_linenumber = 1
              THEN concat('https://www.europepmc.org/a/', CAST(l_partkey AS VARCHAR))
              WHEN l_orderkey % 31 = 1 AND l_linenumber = 1
              THEN concat('http://cyberleninka.ru/x/', CAST(l_partkey AS VARCHAR))
              WHEN l_orderkey % 31 = 2 AND l_linenumber = 1
              THEN concat('https://hal.science/hal-', CAST(l_partkey AS VARCHAR)) END
           AS landing_page_url,
         CASE WHEN l_orderkey % 37 = 0 AND l_linenumber = 1
              THEN concat('10.2139/ssrn.', CAST(l_partkey AS VARCHAR))
              WHEN l_orderkey % 37 = 1 AND l_linenumber = 1
              THEN concat('10.26434/chemrxiv-', CAST(l_partkey AS VARCHAR))
              ELSE concat('10.999/x', CAST(l_partkey AS VARCHAR)) END AS best_doi,
         CASE WHEN l_orderkey % 41 = 0 AND l_linenumber = 2 THEN 'BioRxiv'
              WHEN l_orderkey % 41 = 1 AND l_linenumber = 2 THEN 'Research Square' END
           AS manual_source_name,
         CASE WHEN l_orderkey % 43 = 0 AND l_linenumber = 3
              THEN 'The Research Square Platform LLC' END AS publisher
  FROM lineitem
"""

_SRC_DUCK = """
  SELECT k,
         (k % 17 = 0) AS merged,
         (k IN (13, 26)) AS denied,
         concat('Src ', CAST(k AS VARCHAR)) AS display_name0,
         CASE WHEN k % 10 = 0 THEN 'Dup Name'
              ELSE concat('Src ', CAST(k AS VARCHAR)) END AS display_name,
         (k % 4 = 0) AS is_oa
  FROM (SELECT n + 1 AS k FROM range(0, 80) t(n)) ks
"""

_ORACLE_LOC_SOURCES = f"""
WITH locs AS ({_LOC_DUCK}),
src AS ({_SRC_DUCK}),
live AS (SELECT * FROM src WHERE NOT merged AND NOT denied),
issn_map AS (  -- issn -> min live source id
  SELECT issn, min(k) AS source_id FROM (
    SELECT concat('E', CAST(k % 50 AS VARCHAR)) AS issn, k FROM live WHERE k % 2 = 0
    UNION ALL
    SELECT concat('P', CAST(k % 60 AS VARCHAR)), k FROM live WHERE k % 2 = 1
    UNION ALL
    SELECT concat('L', CAST(k % 40 AS VARCHAR)), k FROM live WHERE k % 9 = 0
  ) m GROUP BY issn
),
dc_map AS (
  SELECT dc, min(k) AS source_id FROM (
    SELECT concat('DC', CAST(k % 30 AS VARCHAR)) AS dc, k FROM live WHERE k % 3 = 0
  ) m GROUP BY dc
),
ep_map AS (
  SELECT ep, min(k) AS source_id FROM (
    SELECT concat('ep', CAST(k % 25 AS VARCHAR)) AS ep, k FROM live WHERE k % 2 = 1
  ) m GROUP BY ep
),
name_map AS (  -- unique display names only (the count(*)=1 guard)
  SELECT display_name, max(k) AS source_id
  FROM live GROUP BY display_name HAVING count(*) = 1
),
-- per-provenance primary match ------------------------------------------
cx_ids AS (  -- crossref: issn entries ranked eissn < lissn < pissn then id
  SELECT native_id, ns, issn,
         row_number() OVER (PARTITION BY native_id ORDER BY
           CASE ns WHEN 'eissn' THEN 1 WHEN 'lissn' THEN 2 ELSE 3 END, issn) AS ns_rank
  FROM (
    SELECT native_id, 'eissn' AS ns, concat('E', CAST(sk % 50 AS VARCHAR)) AS issn
    FROM locs WHERE provenance = 'crossref' AND sk % 3 <> 0
    UNION ALL
    SELECT native_id, 'pissn', concat('P', CAST(pk % 60 AS VARCHAR))
    FROM locs WHERE provenance = 'crossref'
    UNION ALL
    SELECT native_id, 'lissn', concat('L', CAST(sk % 40 AS VARCHAR))
    FROM locs WHERE provenance = 'crossref' AND pk % 5 = 0
  ) e
),
cx_match AS (  -- best-ranked RESOLVED issn per location
  SELECT native_id, source_id FROM (
    SELECT c.native_id, i.source_id,
           row_number() OVER (PARTITION BY c.native_id ORDER BY c.ns_rank) AS rn
    FROM cx_ids c JOIN issn_map i ON i.issn = c.issn
  ) r WHERE rn = 1
),
dc_match AS (
  SELECT native_id, source_id FROM (
    SELECT l.native_id, m.source_id,
           row_number() OVER (PARTITION BY l.native_id ORDER BY m.source_id) AS rn
    FROM locs l
    JOIN dc_map m ON m.dc = concat('DC', CAST(l.sk % 30 AS VARCHAR))
    WHERE l.provenance = 'datacite' AND l.sk % 4 <> 3   -- rel 'part' ignored
  ) r WHERE rn = 1
),
primary_match AS (
  SELECT l.native_id, l.provenance, l.source_name, l.landing_page_url,
         l.best_doi, l.manual_source_name, l.publisher,
         CASE l.provenance
           WHEN 'pubmed' THEN 4306525036
           WHEN 'repo' THEN ep.source_id
           WHEN 'repo_backfill' THEN ep.source_id
           WHEN 'datacite' THEN dc.source_id
           ELSE cx.source_id END AS source_id
  FROM locs l
  LEFT JOIN ep_map ep ON ep.ep = l.endpoint_id
    AND l.provenance IN ('repo', 'repo_backfill')
  LEFT JOIN dc_match dc ON dc.native_id = l.native_id
  LEFT JOIN cx_match cx ON cx.native_id = l.native_id
),
-- fallback rungs ---------------------------------------------------------
laddered AS (
  SELECT p.native_id, p.provenance,
         p.source_id AS s_primary,
         nm.source_id AS s_name,
         CASE regexp_extract(coalesce(p.landing_page_url, ''),
                             'https?://(www\\.)?([^/]+)', 2)
           WHEN 'europepmc.org' THEN 4306400806
           WHEN 'cyberleninka.ru' THEN 4306401404
           ELSE CASE WHEN contains(coalesce(p.landing_page_url, ''), 'hal.science')
                     THEN 4306402512 END END AS s_url,
         CASE WHEN p.best_doi LIKE '10.2139/ssrn.%' THEN 4210172589
              WHEN p.best_doi LIKE '10.26434/chemrxiv%' THEN 4393918830 END AS s_doi,
         CASE WHEN lower(coalesce(p.manual_source_name, '')) = 'biorxiv' THEN 4306402567
              WHEN lower(coalesce(p.manual_source_name, '')) = 'research square'
              THEN 4306402450 END AS s_msn,
         CASE WHEN lower(coalesce(p.publisher, '')) LIKE '%research square platform%'
              THEN 4306402450 END AS s_pub
  FROM primary_match p
  LEFT JOIN name_map nm ON nm.display_name = p.source_name
)
SELECT native_id, provenance,
       coalesce(s_primary, s_name, s_url, s_doi, s_msn, s_pub) AS source_id,
       CASE WHEN s_primary IS NOT NULL THEN 'primary'
            WHEN s_name IS NOT NULL THEN 'display_name'
            WHEN s_url IS NOT NULL THEN 'url'
            WHEN s_doi IS NOT NULL THEN 'doi_prefix'
            WHEN s_msn IS NOT NULL THEN 'source_name'
            WHEN s_pub IS NOT NULL THEN 'publisher'
            ELSE 'unmatched' END AS match_stage
FROM laddered
ORDER BY native_id
"""


@register(
    "locations_source_match",
    oracle=_ORACLE_LOC_SOURCES,
    tags=("locsources", "domain", "ladder"),
    tables=("lineitem",),
)
def locations_source_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The locations→sources resolution ladder
    (CreateLocationsWithSources.ipynb; see module docstring).

    Every map (issn→source, datacite→source, endpoint→source, unique
    display names) derives from the 80-row sources dim — broadcast. The
    location side is one scan; the issn/datacite rungs explode bounded
    id entries and fold straight back to native_id.
    """
    li = spark.table("lineitem")
    locs = li.selectExpr(
        "concat('L', CAST(l_orderkey AS STRING), '.', CAST(l_linenumber AS STRING),"
        " '.', CAST(l_partkey AS STRING)) AS native_id",
        "CASE CAST(l_partkey % 7 AS INT)"
        " WHEN 0 THEN 'repo' WHEN 1 THEN 'repo_backfill' WHEN 2 THEN 'datacite'"
        " WHEN 3 THEN 'pubmed' ELSE 'crossref' END AS provenance",
        "l_orderkey AS okey", "l_partkey AS pk", "l_suppkey AS sk",
        "concat('ep', CAST(l_suppkey % 25 AS STRING)) AS endpoint_id",
        "CASE WHEN l_partkey % 11 = 0 THEN concat('Src ', CAST((l_suppkey % 80) + 1 AS STRING))"
        " WHEN l_partkey % 11 = 1 THEN 'Dup Name' END AS source_name",
        "CASE WHEN l_orderkey % 31 = 0 AND l_linenumber = 1"
        " THEN concat('https://www.europepmc.org/a/', CAST(l_partkey AS STRING))"
        " WHEN l_orderkey % 31 = 1 AND l_linenumber = 1"
        " THEN concat('http://cyberleninka.ru/x/', CAST(l_partkey AS STRING))"
        " WHEN l_orderkey % 31 = 2 AND l_linenumber = 1"
        " THEN concat('https://hal.science/hal-', CAST(l_partkey AS STRING)) END"
        " AS landing_page_url",
        "CASE WHEN l_orderkey % 37 = 0 AND l_linenumber = 1"
        " THEN concat('10.2139/ssrn.', CAST(l_partkey AS STRING))"
        " WHEN l_orderkey % 37 = 1 AND l_linenumber = 1"
        " THEN concat('10.26434/chemrxiv-', CAST(l_partkey AS STRING))"
        " ELSE concat('10.999/x', CAST(l_partkey AS STRING)) END AS best_doi",
        "CASE WHEN l_orderkey % 41 = 0 AND l_linenumber = 2 THEN 'BioRxiv'"
        " WHEN l_orderkey % 41 = 1 AND l_linenumber = 2 THEN 'Research Square' END"
        " AS manual_source_name",
        "CASE WHEN l_orderkey % 43 = 0 AND l_linenumber = 3"
        " THEN 'The Research Square Platform LLC' END AS publisher",
    )
    live = (
        spark.range(0, 80)
        .selectExpr("id + 1 AS k")
        .where("NOT (k % 17 = 0) AND k NOT IN (13, 26)")
        .selectExpr(
            "k",
            "CASE WHEN k % 10 = 0 THEN 'Dup Name' ELSE concat('Src ', CAST(k AS STRING)) END"
            " AS display_name",
        )
    )
    issn_map = (
        live.where("k % 2 = 0")
        .selectExpr("concat('E', CAST(k % 50 AS STRING)) AS issn", "k")
        .unionByName(
            live.where("k % 2 = 1").selectExpr("concat('P', CAST(k % 60 AS STRING)) AS issn", "k")
        )
        .unionByName(
            live.where("k % 9 = 0").selectExpr("concat('L', CAST(k % 40 AS STRING)) AS issn", "k")
        )
        .groupBy("issn")
        .agg(F.min("k").alias("source_id"))
    )
    dc_map = (
        live.where("k % 3 = 0")
        .selectExpr("concat('DC', CAST(k % 30 AS STRING)) AS dc", "k")
        .groupBy("dc")
        .agg(F.min("k").alias("source_id"))
    )
    ep_map = (
        live.where("k % 2 = 1")
        .selectExpr("concat('ep', CAST(k % 25 AS STRING)) AS ep", "k")
        .groupBy("ep")
        .agg(F.min("k").alias("source_id"))
    )
    name_map = (
        live.groupBy("display_name")
        .agg(F.max("k").alias("source_id"), F.count("*").alias("n"))
        .where("n = 1")
        .drop("n")
    )
    from pyspark.sql import Window

    cx = locs.where("provenance = 'crossref'")
    cx_ids = (
        cx.where("sk % 3 <> 0")
        .selectExpr("native_id", "'eissn' AS ns", "concat('E', CAST(sk % 50 AS STRING)) AS issn")
        .unionByName(
            cx.selectExpr(
                "native_id", "'pissn' AS ns", "concat('P', CAST(pk % 60 AS STRING)) AS issn"
            )
        )
        .unionByName(
            cx.where("pk % 5 = 0").selectExpr(
                "native_id", "'lissn' AS ns", "concat('L', CAST(sk % 40 AS STRING)) AS issn"
            )
        )
        .withColumn(
            "ns_rank",
            F.row_number().over(
                Window.partitionBy("native_id").orderBy(
                    F.expr("CASE ns WHEN 'eissn' THEN 1 WHEN 'lissn' THEN 2 ELSE 3 END"),
                    F.col("issn"),
                )
            ),
        )
    )
    cx_match = (
        cx_ids.join(F.broadcast(issn_map), "issn")
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("native_id").orderBy("ns_rank"))
        )
        .where("rn = 1")
        .select("native_id", F.col("source_id").alias("cx_source_id"))
    )
    dc_match = (
        locs.where("provenance = 'datacite' AND sk % 4 <> 3")
        .selectExpr("native_id", "concat('DC', CAST(sk % 30 AS STRING)) AS dc")
        .join(F.broadcast(dc_map), "dc")
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("native_id").orderBy("source_id"))
        )
        .where("rn = 1")
        .select("native_id", F.col("source_id").alias("dc_source_id"))
    )
    primary = (
        locs.join(
            F.broadcast(ep_map.withColumnRenamed("source_id", "ep_source_id")),
            (F.col("ep") == F.col("endpoint_id"))
            & F.col("provenance").isin("repo", "repo_backfill"),
            "left",
        )
        .join(dc_match, "native_id", "left")
        .join(cx_match, "native_id", "left")
        .selectExpr(
            "native_id", "provenance", "source_name", "landing_page_url", "best_doi",
            "manual_source_name", "publisher",
            "CASE provenance"
            " WHEN 'pubmed' THEN 4306525036"
            " WHEN 'repo' THEN ep_source_id"
            " WHEN 'repo_backfill' THEN ep_source_id"
            " WHEN 'datacite' THEN dc_source_id"
            " ELSE cx_source_id END AS s_primary",
        )
    )
    laddered = primary.join(
        F.broadcast(name_map.withColumnRenamed("source_id", "s_name")),
        F.col("display_name") == F.col("source_name"),
        "left",
    ).selectExpr(
        "native_id",
        "provenance",
        "s_primary",
        "s_name",
        "CASE regexp_extract(coalesce(landing_page_url, ''),"
        " 'https?://(www\\\\.)?([^/]+)', 2)"
        " WHEN 'europepmc.org' THEN 4306400806"
        " WHEN 'cyberleninka.ru' THEN 4306401404"
        " ELSE CASE WHEN contains(coalesce(landing_page_url, ''), 'hal.science')"
        " THEN 4306402512 END END AS s_url",
        "CASE WHEN best_doi LIKE '10.2139/ssrn.%' THEN 4210172589"
        " WHEN best_doi LIKE '10.26434/chemrxiv%' THEN 4393918830 END AS s_doi",
        "CASE WHEN lower(coalesce(manual_source_name, '')) = 'biorxiv' THEN 4306402567"
        " WHEN lower(coalesce(manual_source_name, '')) = 'research square'"
        " THEN 4306402450 END AS s_msn",
        "CASE WHEN lower(coalesce(publisher, '')) LIKE '%research square platform%'"
        " THEN 4306402450 END AS s_pub",
    )
    return laddered.selectExpr(
        "native_id",
        "provenance",
        "coalesce(s_primary, s_name, s_url, s_doi, s_msn, s_pub) AS source_id",
        "CASE WHEN s_primary IS NOT NULL THEN 'primary'"
        " WHEN s_name IS NOT NULL THEN 'display_name'"
        " WHEN s_url IS NOT NULL THEN 'url'"
        " WHEN s_doi IS NOT NULL THEN 'doi_prefix'"
        " WHEN s_msn IS NOT NULL THEN 'source_name'"
        " WHEN s_pub IS NOT NULL THEN 'publisher'"
        " ELSE 'unmatched' END AS match_stage",
    ).orderBy("native_id")
