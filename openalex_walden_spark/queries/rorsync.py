"""ROR registry plane (reference
``notebooks/institutions/CreateRorDerivedTables.ipynb``,
``notebooks/institutions/CreateUpdateInstitutionsFromRor.ipynb``).

``ror_derived_tables`` — the four normalized explodes in one tall
output: relationships (URL prefix stripped on BOTH ends, NULL-id rows
dropped), types, labels (names whose types contain 'label', with the
language code), aliases.

``institutions_from_ror_sync`` — the registry→institutions sync:

* per-record assembly: the ``ror_display`` name pick, the FIRST
  location's geonames projection, link pivots (website/wikipedia),
  external-id pivots (grid/wikidata preferred), acronym and alias
  collections in record order;
* the funder-demoting type rule:
  ``LOWER(COALESCE(MAX(CASE WHEN type != 'funder'), MAX(type)))`` — a
  record that is both funder and education types as education; a
  funder-only record keeps funder;
* withdrawn-status records never sync;
* **insert path**: ROR records with no OpenAlex match mint sequential
  ids ``MAX(id) + ROW_NUMBER() OVER (ORDER BY ror_id)`` — the
  reference's deterministic minting;
* **update path**: matched records refresh ONLY when the registry's
  updated_date passed the institution's watermark, and merged-away
  institutions are never updated.

Output unions both paths with an ``action`` column so one hash pins the
minting arithmetic, the watermark gate, and every pivot.

Scale: all CTEs key on ror_id — one shuffle family over the registry
(~110k records in production: trivially broadcastable, but the plan
stays keyed so a 100× registry behaves identically).  The MAX(id)
scalar is one-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openalex_walden_spark.queries.registry import register

# ---------------------------------------------------------------------------
# Fixture arithmetic (identical in both engines)
# ---------------------------------------------------------------------------
# ror records <- part p: ror '0r<p>'; withdrawn p%19=0; reg updated p%10
# names: ror_display always 'Dn <p%97>'; label (+lang) when p%2=0;
#   acronym 'AC<p%50>' when p%3=0; aliases 'Al<p%60>' (+second when p%8=0)
# relationships: parent '0r<p//3>' when p>=6 (NULL id when p%13=0 ->
#   dropped); related '0r<p//5>' when p%5=2
# locations[0]: country 'C<p%25>', lat p%90-45+0.25, lng p%180-90+0.5,
#   city 'City<p%40>', region NULL when p%6=0, geonames p*7
# links: website when p%5<>0, wikipedia when p%7<3
# external ids: grid 'grid.<p>' when p%6<4, wikidata 'Q<p>' when p%3<2
# types: 'Funder' always + CASE p%4: 1 -> none (funder-only),
#   else 'Education'/'Company'/'Government'
# institutions <- p%3=0: id p*2, watermark p%7, merged when p%21=0

_ROR_DUCK = """
  SELECT p_partkey AS p, concat('0r', CAST(p_partkey AS VARCHAR)) AS ror_id,
         (p_partkey % 19 = 0) AS withdrawn,
         CAST(p_partkey % 10 AS INT) AS reg_updated
  FROM part
"""

_INST_DUCK = """
  SELECT p_partkey AS p, concat('0r', CAST(p_partkey AS VARCHAR)) AS ror_id,
         p_partkey * 2 AS iid,
         CAST(p_partkey % 7 AS INT) AS inst_updated,
         (p_partkey % 21 = 0) AS merged
  FROM part WHERE p_partkey % 3 = 0
"""


@register(
    "ror_derived_tables",
    oracle=f"""
WITH ror AS ({_ROR_DUCK})
SELECT ror_id, 'relationship' AS kind,
       CASE WHEN p % 5 = 2 THEN 'related' ELSE 'parent' END AS k,
       concat('0r', CAST(CASE WHEN p % 5 = 2 THEN p // 5 ELSE p // 3 END AS VARCHAR)) AS v
FROM ror WHERE ((p >= 6 AND p % 13 <> 0) OR p % 5 = 2)
UNION ALL
SELECT ror_id, 'type', 'type',
       CASE WHEN p % 4 = 1 THEN 'funder'
            ELSE (['education','company','government'])[CAST(p % 3 AS INT) + 1] END
FROM ror
UNION ALL
SELECT ror_id, 'label', concat('lang:', (['en','fr','de','ja'])[CAST(p % 4 AS INT) + 1]),
       concat('Lbl ', CAST(p % 83 AS VARCHAR))
FROM ror WHERE p % 2 = 0
UNION ALL
SELECT ror_id, 'alias', 'alias', concat('Al', CAST(p % 60 AS VARCHAR))
FROM ror WHERE p % 4 < 2
ORDER BY ror_id, kind, k, v
""",
    tags=("ror", "explode"),
    tables=("part",),
)
def ror_derived_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four ROR explodes as one tall table
    (CreateRorDerivedTables.ipynb; see module docstring)."""
    ror = spark.table("part").selectExpr(
        "p_partkey AS p", "concat('0r', CAST(p_partkey AS STRING)) AS ror_id"
    )
    rel = ror.where("(p >= 6 AND p % 13 <> 0) OR p % 5 = 2").selectExpr(
        "ror_id", "'relationship' AS kind",
        "CASE WHEN p % 5 = 2 THEN 'related' ELSE 'parent' END AS k",
        "concat('0r', CAST(CASE WHEN p % 5 = 2 THEN p div 5 ELSE p div 3 END AS STRING)) AS v",
    )
    typ = ror.selectExpr(
        "ror_id", "'type' AS kind", "'type' AS k",
        "CASE WHEN p % 4 = 1 THEN 'funder'"
        " ELSE element_at(array('education','company','government'), CAST(p % 3 AS INT) + 1) END AS v",
    )
    lbl = ror.where("p % 2 = 0").selectExpr(
        "ror_id", "'label' AS kind",
        "concat('lang:', element_at(array('en','fr','de','ja'), CAST(p % 4 AS INT) + 1)) AS k",
        "concat('Lbl ', CAST(p % 83 AS STRING)) AS v",
    )
    ali = ror.where("p % 4 < 2").selectExpr(
        "ror_id", "'alias' AS kind", "'alias' AS k",
        "concat('Al', CAST(p % 60 AS STRING)) AS v",
    )
    return rel.unionByName(typ).unionByName(lbl).unionByName(ali).orderBy(
        "ror_id", "kind", "k", "v"
    )


_SYNC_CORE = """
assembled AS (
  SELECT r.p, r.ror_id, r.withdrawn, r.reg_updated,
         concat('Dn ', CAST(r.p % 97 AS {STR})) AS display_name,
         CASE WHEN r.p % 4 = 1 THEN 'funder'
              ELSE ARRPICK3 END AS inst_type,
         concat('C', CAST(r.p % 25 AS {STR})) AS iso3166_code,
         CAST(r.p % 90 - 45 AS DOUBLE) + 0.25 AS latitude,
         CAST(r.p % 180 - 90 AS DOUBLE) + 0.5 AS longitude,
         concat('City', CAST(r.p % 40 AS {STR})) AS city,
         CASE WHEN r.p % 6 = 0 THEN NULL
              ELSE concat('Reg', CAST(r.p % 15 AS {STR})) END AS region,
         r.p * 7 AS geonames_city_id,
         CASE WHEN r.p % 5 <> 0 THEN concat('https://w.test/', CAST(r.p AS {STR})) END AS official_page,
         CASE WHEN r.p % 7 < 3 THEN concat('https://wiki.test/', CAST(r.p AS {STR})) END AS wiki_page,
         CASE WHEN r.p % 6 < 4 THEN concat('grid.', CAST(r.p AS {STR})) END AS grid_id,
         CASE WHEN r.p % 3 < 2 THEN concat('Q', CAST(r.p AS {STR})) END AS wikidata_id,
         CASE WHEN r.p % 3 = 0 THEN concat('AC', CAST(r.p % 50 AS {STR})) ELSE '' END AS acronyms_sig,
         CASE WHEN r.p % 4 < 2 THEN
           concat('Al', CAST(r.p % 60 AS {STR}),
                  CASE WHEN r.p % 8 = 0 THEN concat(',Al', CAST((r.p + 1) % 60 AS {STR})) ELSE '' END)
           ELSE '' END AS aliases_sig
  FROM ror r
),
max_id AS (SELECT max(iid) AS current_max_id FROM inst),
new_ror AS (
  SELECT a.*, row_number() OVER (ORDER BY a.ror_id) AS row_num
  FROM assembled a
  LEFT JOIN inst i ON i.ror_id = a.ror_id
  WHERE i.iid IS NULL AND NOT a.withdrawn
),
inserts AS (
  SELECT 'insert' AS action,
         (SELECT current_max_id FROM max_id) + nr.row_num AS id,
         nr.ror_id, nr.display_name, nr.inst_type, nr.iso3166_code,
         nr.latitude, nr.longitude, nr.city, nr.region, nr.geonames_city_id,
         nr.official_page, nr.wiki_page, nr.grid_id, nr.wikidata_id,
         nr.acronyms_sig, nr.aliases_sig
  FROM new_ror nr
),
updates AS (
  SELECT 'update' AS action, i.iid AS id,
         a.ror_id, a.display_name, a.inst_type, a.iso3166_code,
         a.latitude, a.longitude, a.city, a.region, a.geonames_city_id,
         a.official_page, a.wiki_page, a.grid_id, a.wikidata_id,
         a.acronyms_sig, a.aliases_sig
  FROM assembled a
  JOIN inst i ON i.ror_id = a.ror_id
  WHERE NOT a.withdrawn
    AND a.reg_updated > coalesce(i.inst_updated, -1)
    AND NOT i.merged
)
SELECT * FROM inserts UNION ALL SELECT * FROM updates
ORDER BY action, id
"""


@register(
    "institutions_from_ror_sync",
    oracle=(
        f"WITH ror AS ({_ROR_DUCK}),\ninst AS ({_INST_DUCK}),\n"
        + _SYNC_CORE.replace("{STR}", "VARCHAR").replace(
            "ARRPICK3", "(['education','company','government'])[CAST(r.p % 3 AS INT) + 1]"
        )
    ),
    tags=("ror", "sync", "merge"),
    tables=("part",),
)
def institutions_from_ror_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry→institutions sync with sequential id minting and the
    update watermark (CreateUpdateInstitutionsFromRor.ipynb; see module
    docstring)."""
    spark.table("part").selectExpr(
        "p_partkey AS p", "concat('0r', CAST(p_partkey AS STRING)) AS ror_id",
        "(p_partkey % 19 = 0) AS withdrawn", "CAST(p_partkey % 10 AS INT) AS reg_updated",
    ).createOrReplaceTempView("ror")
    spark.table("part").where("p_partkey % 3 = 0").selectExpr(
        "p_partkey AS p2", "concat('0r', CAST(p_partkey AS STRING)) AS ror_id",
        "p_partkey * 2 AS iid", "CAST(p_partkey % 7 AS INT) AS inst_updated",
        "(p_partkey % 21 = 0) AS merged",
    ).createOrReplaceTempView("inst")
    sql = _SYNC_CORE.replace("{STR}", "STRING").replace(
        "ARRPICK3",
        "element_at(array('education','company','government'), CAST(r.p % 3 AS INT) + 1)",
    )
    return spark.sql("WITH " + sql)
