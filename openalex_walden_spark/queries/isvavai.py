"""IS VaVaI parse: the 4-script Czech national-registry scraper family.

The reference scrapes the Czech national RD&I information system
(isvavai.cz CEP exports) once per provider ministry/agency with the
SAME 367-line template (``scripts/local/{gacr,mpo,mvcr,mze}_to_s3.py``
— byte-identical modulo the provider code and prose; verified by
templated diff).  The shared ``process_*_data`` compute
(``mpo_to_s3.py:157-265``):

* filter BOTH source CSVs (projects, participants) to the provider
  code (``poskytovatel``);
* lead-institution ROR lookup: participants project to
  (kod_projektu, ucastnik, ROR, nazev_ucastnika), ``drop_duplicates``,
  then LEFT-merge onto projects on (kod_projektu,
  hlavni_prijemce = ucastnik).  A lead participant listed with two
  distinct (ROR, name) pairs fans the project out into two rows —
  pandas merge semantics, preserved here (the dedup is over the full
  4-tuple, not the join key);
* keep + rename the 24 project columns to English
  (``mpo_to_s3.py:222-247``);
* ``pd.to_numeric(errors='coerce')`` on the three CZK amounts;
* ``title`` / ``description``: English, falling back to the Czech
  original (pandas ``fillna`` fills only NULL — empty strings pass
  through — so this is COALESCE, not a blank-aware pick).

The four runs differ only by provider code, so the port runs them as
one plan: a 4-row provider registry joins broadcast as the filter (a
row per funder: GACR=GA0, MPO=MPO, MVCR=MV0, MZE=MZE), equivalent to
the union of the four per-provider outputs.  ``meys_to_s3.py`` shares
the source and the lead-participant merge but emits its own schema
(clean_blank normalization, participant amounts, no title fallback) —
adjudicated a variant, not a member, in ``tests/test_funderscrape.py``.

Scale: projects and participants hash-join on the project code (both
sides registry-sized; no corpus window); the provider registry is a
broadcast literal; everything else is per-row column algebra in
whole-stage codegen.  The reference holds both CSVs in pandas on one
box — this shape streams.

Fixture: projects from orders, participants from lineitem.
``hlavni_prijemce`` matches a participant ``ucastnik`` only on
linenumber%3=1 rows, so matched, unmatched (NULL ror), and fan-out
(two RORs for one lead) cases all occur; poskytovatel cycles two
non-member codes (TA0, AZV) that the registry join must drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openalex_walden_spark.queries.registry import register

# funder slug -> IS VaVaI provider code (the only per-script delta).
_PROVIDERS: tuple[tuple[str, str], ...] = (
    ("gacr", "GA0"),
    ("mpo", "MPO"),
    ("mvcr", "MV0"),
    ("mze", "MZE"),
)


def _provider_values() -> str:
    rows = ", ".join(f"('{s}', '{c}')" for s, c in _PROVIDERS)
    return f"(VALUES {rows}) prov(funder, provider_code)"


_PROJECTS_FIXTURE = """
  SELECT concat('P', CAST(o_orderkey AS STRING)) AS kod_projektu,
         element_at(array('GA0','MPO','MV0','MZE','TA0','AZV'),
                    CAST(o_orderkey % 6 AS INT) + 1) AS poskytovatel,
         concat('ico:', CAST(o_orderkey % 500 AS STRING))
           AS hlavni_prijemce,
         concat('https://www.isvavai.cz/cep?ss=detail&s=P',
                CAST(o_orderkey AS STRING)) AS odkaz,
         concat('Projekt ', CAST(o_orderkey AS STRING)) AS nazev_cs,
         CASE WHEN o_orderkey % 7 = 0 THEN CAST(NULL AS STRING)
              ELSE concat('Project ', CAST(o_orderkey AS STRING)) END
           AS nazev_en,
         CAST(year(o_orderdate) AS STRING) AS rok_zahajeni,
         CAST(year(o_orderdate) + CAST(o_orderkey % 4 AS INT) AS STRING)
           AS rok_ukonceni,
         date_format(o_orderdate, 'yyyy-MM-dd') AS datum_zahajeni,
         date_format(date_add(o_orderdate,
             CAST(365 * (o_orderkey % 4) AS INT)), 'yyyy-MM-dd')
           AS datum_ukonceni,
         concat('Cile ', CAST(o_orderkey % 50 AS STRING)) AS cile_cs,
         CASE WHEN o_orderkey % 11 = 0 THEN CAST(NULL AS STRING)
              ELSE concat('Objectives ', CAST(o_orderkey % 50 AS STRING)) END
           AS cile_en,
         concat('keyword', CAST(o_orderkey % 20 AS STRING)) AS klicova,
         concat('1', lpad(CAST(o_orderkey % 9 AS STRING), 4, '0'))
           AS hlavni_obor,
         concat('10', CAST(o_orderkey % 7 AS STRING), '00') AS obor_oecd,
         concat('PRG', CAST(o_orderkey % 12 AS STRING)) AS kod_programu,
         concat('Instituce ', CAST(o_custkey % 300 AS STRING))
           AS nazev_organizace,
         CAST(10000000 + o_custkey % 300 AS STRING) AS ico,
         element_at(array('Praha','Brno','Ostrava','Plzen'),
                    CAST(o_custkey % 4 AS INT) + 1) AS mesto_sidla,
         'CZ' AS zeme_sidla,
         CASE WHEN o_orderkey % 13 = 0 THEN 'N/A'
              ELSE CAST(o_totalprice AS STRING) END AS naklady_txt,
         CASE WHEN o_orderkey % 17 = 0 THEN ''
              ELSE CAST(CAST(o_totalprice * 0.7 AS DECIMAL(18,3)) AS STRING)
              END AS podpora_txt,
         CASE WHEN o_orderkey % 19 = 0
              THEN CAST(CAST(o_totalprice * 0.1 AS DECIMAL(18,3)) AS STRING)
              ELSE CAST(NULL AS STRING) END AS zahranicni_txt,
         o_orderstatus AS posledni_stav,
         concat('EV', CAST(o_orderkey % 5 AS STRING)) AS kod_hodnoceni
  FROM orders
"""

_PARTICIPANTS_FIXTURE = """
  SELECT concat('P', CAST(l_orderkey AS STRING)) AS kod_projektu,
         element_at(array('GA0','MPO','MV0','MZE','TA0','AZV'),
                    CAST(l_orderkey % 6 AS INT) + 1) AS poskytovatel,
         CASE WHEN l_linenumber % 3 = 1
              THEN concat('ico:', CAST(l_orderkey % 500 AS STRING))
              ELSE concat('ico:',
                     CAST((l_orderkey * 7 + l_linenumber) % 500 AS STRING))
              END AS ucastnik,
         CASE WHEN l_partkey % 4 = 0 THEN CAST(NULL AS STRING)
              ELSE concat('https://ror.org/0',
                     lpad(CAST(l_partkey % 97 AS STRING), 6, '0')) END
           AS ROR,
         concat('Org ', CAST(l_partkey % 97 AS STRING)) AS nazev_ucastnika
  FROM lineitem
"""

_PARSE_TEMPLATE = """
WITH projects AS ({projects}),
participants AS ({participants}),
prov AS (SELECT * FROM {prov}),
lookup AS (
  SELECT DISTINCT pa.kod_projektu, pa.ucastnik,
         pa.ROR AS lead_ror, pa.nazev_ucastnika
  FROM participants pa JOIN prov ON prov.provider_code = pa.poskytovatel
),
merged AS (
  SELECT prov.funder, p.*, l.lead_ror
  FROM projects p
  JOIN prov ON prov.provider_code = p.poskytovatel
  LEFT JOIN lookup l
    ON l.kod_projektu = p.kod_projektu AND l.ucastnik = p.hlavni_prijemce
)
SELECT funder,
       kod_projektu AS project_code,
       odkaz AS landing_page_url,
       nazev_cs AS title_cs,
       nazev_en AS title_en,
       rok_zahajeni AS start_year,
       rok_ukonceni AS end_year,
       datum_zahajeni AS start_date,
       datum_ukonceni AS end_date,
       cile_cs AS description_cs,
       cile_en AS description_en,
       klicova AS keywords,
       hlavni_obor AS research_field,
       obor_oecd AS oecd_field,
       kod_programu AS program_code,
       nazev_organizace AS institution_name,
       ico AS institution_id,
       mesto_sidla AS institution_city,
       zeme_sidla AS institution_country,
       lead_ror AS ror_id,
       {num_naklady} AS total_cost,
       {num_podpora} AS funding_amount,
       {num_zahranicni} AS foreign_funding,
       posledni_stav AS status,
       kod_hodnoceni AS evaluation_code,
       coalesce(nazev_en, nazev_cs) AS title,
       coalesce(cile_en, cile_cs) AS description
FROM merged
"""


def _parse_sql(dialect: str) -> str:
    if dialect == "spark":
        return _PARSE_TEMPLATE.format(
            projects=_PROJECTS_FIXTURE,
            participants=_PARTICIPANTS_FIXTURE,
            prov=_provider_values(),
            num_naklady="try_cast(naklady_txt AS DOUBLE)",
            num_podpora="try_cast(podpora_txt AS DOUBLE)",
            num_zahranicni="try_cast(zahranicni_txt AS DOUBLE)",
        )
    duck_projects = (
        _PROJECTS_FIXTURE
        .replace("AS STRING", "AS VARCHAR")
        .replace(
            "element_at(array('GA0','MPO','MV0','MZE','TA0','AZV'),\n"
            "                    CAST(o_orderkey % 6 AS INT) + 1)",
            "list_extract(['GA0','MPO','MV0','MZE','TA0','AZV'], "
            "CAST(o_orderkey % 6 AS INT) + 1)",
        )
        .replace(
            "element_at(array('Praha','Brno','Ostrava','Plzen'),\n"
            "                    CAST(o_custkey % 4 AS INT) + 1)",
            "list_extract(['Praha','Brno','Ostrava','Plzen'], "
            "CAST(o_custkey % 4 AS INT) + 1)",
        )
        .replace(
            "date_format(o_orderdate, 'yyyy-MM-dd')",
            "strftime(o_orderdate, '%Y-%m-%d')",
        )
        .replace(
            "date_format(date_add(o_orderdate,\n"
            "             CAST(365 * (o_orderkey % 4) AS INT)), 'yyyy-MM-dd')",
            "strftime(CAST(o_orderdate AS DATE) + "
            "CAST(365 * (o_orderkey % 4) AS INT), '%Y-%m-%d')",
        )
    )
    duck_participants = (
        _PARTICIPANTS_FIXTURE
        .replace("AS STRING", "AS VARCHAR")
        .replace(
            "element_at(array('GA0','MPO','MV0','MZE','TA0','AZV'),\n"
            "                    CAST(l_orderkey % 6 AS INT) + 1)",
            "list_extract(['GA0','MPO','MV0','MZE','TA0','AZV'], "
            "CAST(l_orderkey % 6 AS INT) + 1)",
        )
    )
    return _PARSE_TEMPLATE.format(
        projects=duck_projects,
        participants=duck_participants,
        prov=_provider_values(),
        num_naklady="try_cast(naklady_txt AS DOUBLE)",
        num_podpora="try_cast(podpora_txt AS DOUBLE)",
        num_zahranicni="try_cast(zahranicni_txt AS DOUBLE)",
    )


@register(
    "isvavai_parse_projects",
    oracle=_parse_sql("duck"),
    tags=("domain", "awards", "scrape"),
    tables=("orders", "lineitem"),
    doc=(
        "IS VaVaI project parse shared by the 4-script Czech scraper "
        "family (scripts/local/mpo_to_s3.py:157-265 et al.)"
    ),
)
def isvavai_parse_projects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provider filter + lead-ROR lookup merge + English rename +
    coerce-to-NULL CZK amounts + title/description fallback — the
    shared ``process_*_data`` of the IS VaVaI family, run for all four
    providers in one plan via the broadcast provider registry (module
    docstring has the full semantics map, including the faithful
    pandas merge fan-out on multi-(ROR, name) leads)."""
    return spark.sql(_parse_sql("spark"))
