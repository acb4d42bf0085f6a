"""SweCRIS parse: the Swedish national-registry scraper family.

The reference pulls per-funder grant histories from SweCRIS (Sweden's
national research-grants registry, CC0) through one API shape
(``swecris-api.vr.se/v1/projects/funders/<org_nr>``) in TWO template
generations:

* **gen A** (``scripts/local/{formas,forte,swedish_research_council}
  _to_s3.py`` — ``forte_to_s3.py:104-207``): PI = FIRST peopleList
  entry with ``roleEn == 'Principal Investigator'``, name split by
  ``rsplit(' ', 1)`` (single token → family only), ``scbs[0]``
  discipline pair, En-or-Sv coalesce ladders for org/award-type names,
  dates coerce-to-NULL → ``YYYY-MM-DD``, ``pd.to_numeric`` amount,
  dedup by project_id KEEPING THE FIRST row in input order.
  → ``swecris_parse_projects``.
* **gen B** (``{ifau,ostersjostiftelsen}_to_s3.py`` and the 5-funder
  sweep ``swecris_to_s3.py:94-210``; ``energimyndigheten_to_s3.py`` is
  the same generation without the PI block but with the funding-window
  dates): suffix-stripping ``split_name`` (the wolf_to_s3 §2.4.1
  canonical helper: trailing PhD/MD/Jr/…-style tokens dropped before
  the last-token family split), ``people_json`` passthrough
  (``json.dumps`` of peopleList), dedup by project_id keeping the
  MAX-amount row (§1.2 #6), and a stringify-all save (§1.2 #5).
  → ``swecris_sweep_parse`` (the sweep form, which supersets the
  single-funder gen-B scripts with its three funder-identity columns).

Both ports run every member in one plan via a broadcast org-nr
registry — equivalent to the union of the per-funder runs.  The
reference's dedup tie order is pandas' unstable quicksort; both ports
make ties deterministic on the ingest sequence (same convention as the
USAspending port).  ``ingested_at`` (utcnow) is a runtime seam, not
emitted.  ``vinnova_to_s3.py`` is NOT SweCRIS (Vinnova's own CSV
portal, ``involved_people`` text parse) — adjudicated a non-member in
``tests/test_funderscrape.py``.

Scale: per-row struct/array algebra over one scan (the peopleList PI
pick is a lambda filter on an in-row array, not a join); the only
shuffle is the per-project dedup, which plans as a rank-limit window
(WindowGroupLimit prunes map-side).  The org registry broadcasts.

Fixture: one SweCRIS project row per orders row — peopleList as an
array of (fullName, roleEn, orcId) structs with the PI at varying
positions (absent on k%9=0), 0-2 scbs entries, En titles/abstracts
NULL on small moduli so the Sv fallbacks fire, amounts/dates with
garbage slots, duplicate project ids via the custkey lattice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openalex_walden_spark.queries.registry import register

# gen-A members: slug -> SweCRIS org nr (forte_to_s3.py:73 etc.)
_GEN_A: tuple[tuple[str, str], ...] = (
    ("formas", "202100-5232"),
    ("forte", "202100-5240"),
    ("swedish_research_council", "202100-5208"),
)

# The sweep's org nr -> (numeric funder id, display name)
# (swecris_to_s3.py:87-93).
_SWEEP: tuple[tuple[str, int, str], ...] = (
    ("202100-2585", 4320321031, "Swedish National Space Agency"),
    ("202100-1975", 4320322579, "Naturvårdsverket"),
    ("802400-4213", 4320321759,
     "Stiftelsen för Kunskaps- och Kompetensutveckling"),
    ("202100-0712", 4320316858, "Statens geotekniska institut"),
    ("802423-4075", 4320325984, "Familjen Kamprads Stiftelse"),
)

# gen-B single-funder scripts (same parse as the sweep minus the
# identity columns; energimyndigheten also omits the PI block).
_GEN_B_SINGLE: tuple[tuple[str, str], ...] = (
    ("ifau", "202100-4946"),
    ("ostersjostiftelsen", "802400-4155"),
    ("energimyndigheten", "202100-5000"),
)

_ALL_ORG_NRS: tuple[str, ...] = tuple(
    [nr for _, nr in _GEN_A]
    + [nr for nr, _, _ in _SWEEP]
    + [nr for _, nr in _GEN_B_SINGLE]
)


def _person(full: str, role: str, orcid: str) -> str:
    return (
        f"named_struct('fullName', {full}, 'roleEn', {role}, "
        f"'orcId', {orcid})"
    )


# One SweCRIS project per orders row.  k = orderkey.  The PI sits at
# position 2 behind a participant (k%3=0), at position 1 (k%3=1), or
# is absent entirely (k%9=0 overrides).  PI names: two tokens
# normally, one token on k%21=0, trailing 'PhD' suffix on k%15=0
# (exercises the gen-B suffix strip; gen A keeps it as the family
# token).  orcId NULL on k%5=0.
_ROWS_SPARK = """
  SELECT o_orderkey AS seq,
         element_at(array({orgs}), CAST(o_orderkey % {n_orgs} AS INT) + 1)
           AS org_nr,
         concat('2021-', CAST(o_custkey % 401 AS STRING)) AS projectId,
         concat('Projekt ', CAST(o_orderkey % 67 AS STRING))
           AS projectTitleSv,
         CASE WHEN o_orderkey % 7 = 0 THEN CAST(NULL AS STRING)
              ELSE concat('Project ', CAST(o_orderkey % 67 AS STRING)) END
           AS projectTitleEn,
         concat('Sammanfattning ', CAST(o_orderkey % 31 AS STRING))
           AS projectAbstractSv,
         CASE WHEN o_orderkey % 11 = 0 THEN CAST(NULL AS STRING)
              ELSE concat('Abstract ', CAST(o_orderkey % 31 AS STRING)) END
           AS projectAbstractEn,
         CASE WHEN o_orderkey % 13 = 0 THEN 'TBD'
              ELSE date_format(o_orderdate, 'yyyy-MM-dd') END
           AS projectStartDate,
         CASE WHEN o_orderkey % 17 = 0 THEN CAST(NULL AS STRING)
              ELSE date_format(date_add(o_orderdate,
                     CAST(365 + o_orderkey % 731 AS INT)), 'yyyy-MM-dd') END
           AS projectEndDate,
         concat('ORG', CAST(o_custkey % 83 AS STRING))
           AS coordinatingOrganisationId,
         CASE WHEN o_orderkey % 6 = 0 THEN CAST(NULL AS STRING)
              ELSE concat('University ', CAST(o_custkey % 29 AS STRING)) END
           AS coordinatingOrganisationNameEn,
         concat('Universitetet ', CAST(o_custkey % 29 AS STRING))
           AS coordinatingOrganisationNameSv,
         'University' AS coordinatingOrganisationTypeOfOrganisationEn,
         element_at(array({orgs}), CAST(o_orderkey % {n_orgs} AS INT) + 1)
           AS fundingOrganisationId,
         CASE WHEN o_orderkey % 8 = 0 THEN CAST(NULL AS STRING)
              ELSE 'Funder EN' END AS fundingOrganisationNameEn,
         'Finansiar SV' AS fundingOrganisationNameSv,
         CAST(o_totalprice AS DOUBLE) AS fundingsSek,
         CAST(year(o_orderdate) AS STRING) AS fundingYear,
         date_format(o_orderdate, 'yyyy-MM-dd') AS fundingStartDate,
         date_format(date_add(o_orderdate, 365), 'yyyy-MM-dd')
           AS fundingEndDate,
         CAST(o_orderkey % 9 AS STRING) AS typeOfAwardId,
         CASE WHEN o_orderkey % 10 = 0 THEN CAST(NULL AS STRING)
              ELSE concat('Award type ', CAST(o_orderkey % 9 AS STRING)) END
           AS typeOfAwardDescrEn,
         concat('Bidragstyp ', CAST(o_orderkey % 9 AS STRING))
           AS typeOfAwardDescrSv,
         CASE
           WHEN o_orderkey % 9 = 0 THEN
             array({participant})
           WHEN o_orderkey % 3 = 0 THEN
             array({participant}, {pi_struct})
           ELSE array({pi_struct}, {participant})
         END AS peopleList,
         CASE WHEN o_orderkey % 4 = 0 THEN array()
              ELSE array(
                named_struct('scb5NameEn',
                  concat('Field ', CAST(o_orderkey % 23 AS STRING)),
                  'scb1NameEn',
                  concat('Area ', CAST(o_orderkey % 6 AS STRING))),
                named_struct('scb5NameEn', 'Other field',
                  'scb1NameEn', 'Other area')) END AS scbs,
         date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') AS updatedDate,
         date_format(date_add(o_orderdate, 1), 'yyyy-MM-dd HH:mm:ss')
           AS loadedDate
  FROM orders
"""


def _pi_full_spark() -> str:
    return (
        "CASE WHEN o_orderkey % 21 = 0 THEN"
        " concat('Mononym', CAST(o_orderkey % 19 AS STRING))"
        " WHEN o_orderkey % 15 = 0 THEN"
        " concat('Anna Maria Larsson', CAST(o_orderkey % 19 AS STRING),"
        " ' PhD')"
        " ELSE concat('Erik Svensson', CAST(o_orderkey % 19 AS STRING)) END"
    )


def _rows_sql(dialect: str) -> str:
    orgs = ", ".join(f"'{nr}'" for nr in _ALL_ORG_NRS)
    pi_full = _pi_full_spark()
    orcid = (
        "CASE WHEN o_orderkey % 5 = 0 THEN CAST(NULL AS STRING) ELSE "
        "concat('0000-0001-', lpad(CAST(o_orderkey % 9999 AS STRING), 4, "
        "'0'), '-000', CAST(o_orderkey % 10 AS STRING)) END"
    )
    pi_struct = _person(pi_full, "'Principal Investigator'", orcid)
    participant = _person(
        "concat('Karin Berg', CAST(o_custkey % 13 AS STRING))",
        "'Participant'", "CAST(NULL AS STRING)"
    )
    sql = _ROWS_SPARK.format(
        orgs=orgs, n_orgs=len(_ALL_ORG_NRS),
        pi_struct=pi_struct, participant=participant,
    )
    if dialect == "spark":
        return sql
    # DuckDB spellings: struct_pack/list syntax, date arithmetic,
    # strftime.  named_struct('k', v, ...) -> struct_pack(k := v, ...).
    duck = (
        sql
        .replace("AS STRING", "AS VARCHAR")
        .replace("named_struct('fullName', ", "struct_pack(fullName := ")
        .replace("named_struct('scb5NameEn',", "struct_pack(scb5NameEn :=")
        .replace(", 'roleEn', ", ", roleEn := ")
        .replace(", 'orcId', ", ", orcId := ")
        .replace("'scb1NameEn',", "scb1NameEn :=")
        .replace("'scb1NameEn', 'Other area'", "scb1NameEn := 'Other area'")
        .replace("array()", "[]")
        .replace("array(", "list_value(")
        .replace(
            "list_value({orgs_literal})", "list_value({orgs_literal})"
        )
        .replace(
            "element_at(list_value(" + orgs + "), "
            f"CAST(o_orderkey % {len(_ALL_ORG_NRS)} AS INT) + 1)",
            "list_extract([" + orgs + "], "
            f"CAST(o_orderkey % {len(_ALL_ORG_NRS)} AS INT) + 1)",
        )
        .replace(
            "date_format(date_add(o_orderdate,\n"
            "                     CAST(365 + o_orderkey % 731 AS INT)), "
            "'yyyy-MM-dd')",
            "strftime(CAST(o_orderdate AS DATE) + "
            "CAST(365 + o_orderkey % 731 AS INT), '%Y-%m-%d')",
        )
        .replace(
            "date_format(date_add(o_orderdate, 365), 'yyyy-MM-dd')",
            "strftime(CAST(o_orderdate AS DATE) + 365, '%Y-%m-%d')",
        )
        .replace(
            "date_format(date_add(o_orderdate, 1), 'yyyy-MM-dd HH:mm:ss')",
            "strftime(CAST(o_orderdate AS DATE) + 1, '%Y-%m-%d %H:%M:%S')",
        )
        .replace(
            "date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss')",
            "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')",
        )
        .replace(
            "date_format(o_orderdate, 'yyyy-MM-dd')",
            "strftime(o_orderdate, '%Y-%m-%d')",
        )
    )
    return duck


# ---------------------------------------------------------------------------
# gen A: formas / forte / swedish_research_council
# ---------------------------------------------------------------------------

_GEN_A_TEMPLATE = """
WITH raw AS ({rows}),
members AS (SELECT * FROM (VALUES {members}) m(funder, org_nr)),
scoped AS (
  SELECT m.funder, r.* FROM raw r JOIN members m ON m.org_nr = r.org_nr
),
parsed AS (
  SELECT seq, funder,
         projectId AS project_id,
         projectTitleSv AS title,
         projectTitleEn AS title_english,
         projectAbstractSv AS abstract,
         projectAbstractEn AS abstract_english,
         {fmt_start} AS start_date,
         {fmt_end} AS end_date,
         coordinatingOrganisationId AS coordinating_organisation_id,
         coalesce(coordinatingOrganisationNameEn,
                  coordinatingOrganisationNameSv)
           AS coordinating_organisation,
         coordinatingOrganisationTypeOfOrganisationEn
           AS coordinating_organisation_type,
         fundingOrganisationId AS funding_organisation_id,
         coalesce(fundingOrganisationNameEn, fundingOrganisationNameSv)
           AS funding_organisation,
         fundingsSek AS amount,
         fundingYear AS funding_year,
         fundingStartDate AS funding_start_date,
         fundingEndDate AS funding_end_date,
         typeOfAwardId AS type_of_award_id,
         coalesce(typeOfAwardDescrEn, typeOfAwardDescrSv) AS type_of_award,
         {pi_given} AS pi_given_name,
         {pi_family} AS pi_family_name,
         {pi_orcid} AS pi_orcid,
         {scb5} AS main_discipline,
         {scb1} AS main_discipline_level1,
         updatedDate AS updated_date,
         loadedDate AS loaded_date
  FROM scoped
),
latest AS (
  SELECT *, row_number() OVER (
           PARTITION BY funder, project_id ORDER BY seq ASC) AS rn
  FROM parsed
)
SELECT funder, project_id, title, title_english, abstract,
       abstract_english, start_date, end_date,
       coordinating_organisation_id, coordinating_organisation,
       coordinating_organisation_type, funding_organisation_id,
       funding_organisation, amount, funding_year, funding_start_date,
       funding_end_date, type_of_award_id, type_of_award, pi_given_name,
       pi_family_name, pi_orcid, main_discipline, main_discipline_level1,
       updated_date, loaded_date
FROM latest WHERE rn = 1
"""


def _gen_a_sql(dialect: str) -> str:
    members = ", ".join(f"('{s}', '{nr}')" for s, nr in _GEN_A)
    if dialect == "spark":
        # get(..., 0) instead of [0]: ANSI Spark throws on indexing an
        # empty array; get() returns NULL like DuckDB's 1-based [1].
        pi = ("get(filter(peopleList, p -> p.roleEn = "
              "'Principal Investigator'), 0)")
        return _GEN_A_TEMPLATE.format(
            rows=_rows_sql("spark"), members=members,
            fmt_start="date_format(try_to_date(projectStartDate), "
                      "'yyyy-MM-dd')",
            fmt_end="date_format(try_to_date(projectEndDate), 'yyyy-MM-dd')",
            pi_given=f"nullif(regexp_extract({pi}.fullName, "
                     "'^(.*) [^ ]+$', 1), '')",
            pi_family=f"CASE WHEN {pi}.fullName LIKE '% %' THEN "
                      f"regexp_extract({pi}.fullName, '([^ ]+)$', 1) "
                      f"ELSE {pi}.fullName END",
            pi_orcid=f"{pi}.orcId",
            scb5="CASE WHEN size(scbs) > 0 THEN scbs[0].scb5NameEn END",
            scb1="CASE WHEN size(scbs) > 0 THEN scbs[0].scb1NameEn END",
        )
    pi = ("list_filter(peopleList, p -> p.roleEn = "
          "'Principal Investigator')[1]")
    return _GEN_A_TEMPLATE.format(
        rows=_rows_sql("duck"), members=members,
        fmt_start="strftime(try_cast(projectStartDate AS DATE), '%Y-%m-%d')",
        fmt_end="strftime(try_cast(projectEndDate AS DATE), '%Y-%m-%d')",
        pi_given=f"nullif(regexp_extract({pi}.fullName, "
                 "'^(.*) [^ ]+$', 1), '')",
        pi_family=f"CASE WHEN {pi}.fullName LIKE '% %' THEN "
                  f"regexp_extract({pi}.fullName, '([^ ]+)$', 1) "
                  f"ELSE {pi}.fullName END",
        pi_orcid=f"{pi}.orcId",
        scb5="CASE WHEN len(scbs) > 0 THEN scbs[1].scb5NameEn END",
        scb1="CASE WHEN len(scbs) > 0 THEN scbs[1].scb1NameEn END",
    )


@register(
    "swecris_parse_projects",
    oracle=_gen_a_sql("duck"),
    tags=("domain", "awards", "scrape"),
    tables=("orders",),
    doc=(
        "SweCRIS gen-A project parse shared by formas/forte/"
        "swedish_research_council (scripts/local/forte_to_s3.py:104-207)"
    ),
)
def swecris_parse_projects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gen-A SweCRIS parse for the three gen-A funders in one plan
    (module docstring has the semantics map: PI pick + rsplit name
    split, scbs[0] discipline, En-or-Sv ladders, coerce-to-NULL dates,
    numeric amount, keep-first dedup)."""
    return spark.sql(_gen_a_sql("spark"))


# ---------------------------------------------------------------------------
# gen B: the 5-funder sweep (swecris_to_s3.py), superset of ifau /
# ostersjostiftelsen (same parse + identity columns; energimyndigheten
# is the no-PI sibling — adjudicated in tests/test_funderscrape.py)
# ---------------------------------------------------------------------------

# wolf_to_s3.py §2.4.1 split_name: drop trailing academic/generational
# suffix tokens (compared lowercase with ',' '.' stripped) before the
# last-token family split.  The fixture carries at most two suffix
# tokens, so two regex passes replicate the reference's while-loop.
_SUFFIX_STRIP = (
    "regexp_replace(regexp_replace({x}, "
    "' +[.,]*(?i:phd|md|dphil|dsc|scd|jr|sr|ii|iii|iv)[.,]*$', ''), "
    "' +[.,]*(?i:phd|md|dphil|dsc|scd|jr|sr|ii|iii|iv)[.,]*$', '')"
)

_GEN_B_TEMPLATE = """
WITH raw AS ({rows}),
members AS (SELECT * FROM (VALUES {members})
            m(swecris_org_nr, openalex_funder_id, funder_display_name)),
scoped AS (
  SELECT m.openalex_funder_id, m.funder_display_name, m.swecris_org_nr,
         r.*
  FROM raw r JOIN members m ON m.swecris_org_nr = r.org_nr
),
parsed AS (
  SELECT seq, openalex_funder_id, funder_display_name, swecris_org_nr,
         projectId AS project_id,
         projectTitleSv AS title,
         projectTitleEn AS title_english,
         projectAbstractSv AS abstract,
         projectAbstractEn AS abstract_english,
         {fmt_start} AS start_date,
         {fmt_end} AS end_date,
         coordinatingOrganisationId AS coordinating_organisation_id,
         coalesce(coordinatingOrganisationNameEn,
                  coordinatingOrganisationNameSv)
           AS coordinating_organisation,
         coordinatingOrganisationTypeOfOrganisationEn
           AS coordinating_organisation_type,
         fundingOrganisationId AS funding_organisation_id,
         coalesce(fundingOrganisationNameEn, fundingOrganisationNameSv)
           AS funding_organisation,
         fundingsSek AS amount_num,
         fundingYear AS funding_year,
         typeOfAwardId AS type_of_award_id,
         coalesce(typeOfAwardDescrEn, typeOfAwardDescrSv) AS type_of_award,
         {pi}.fullName AS pi_full_name,
         nullif(regexp_extract({stripped}, '^(.*) [^ ]+$', 1), '')
           AS pi_given_name,
         CASE WHEN {pi}.fullName IS NULL THEN NULL
              WHEN {stripped} = '' THEN NULL
              WHEN {stripped} LIKE '% %'
                THEN regexp_extract({stripped}, '([^ ]+)$', 1)
              ELSE {stripped} END AS pi_family_name,
         {pi}.orcId AS pi_orcid,
         concat('[', array_join_people, ']') AS people_json,
         {scb5} AS main_discipline,
         {scb1} AS main_discipline_level1,
         updatedDate AS updated_date,
         loadedDate AS loaded_date
  FROM (
    SELECT s.*, {people_json_body} AS array_join_people FROM scoped s
  )
),
latest AS (
  SELECT *, row_number() OVER (
           PARTITION BY swecris_org_nr, project_id
           ORDER BY amount_num DESC NULLS LAST, seq ASC) AS rn
  FROM parsed
)
SELECT CAST(openalex_funder_id AS {str_t}) AS openalex_funder_id,
       funder_display_name, swecris_org_nr, project_id, title,
       title_english, abstract, abstract_english, start_date, end_date,
       coordinating_organisation_id, coordinating_organisation,
       coordinating_organisation_type, funding_organisation_id,
       funding_organisation,
       CAST(amount_num AS {str_t}) AS amount,
       funding_year, type_of_award_id, type_of_award, pi_full_name,
       pi_given_name, pi_family_name, pi_orcid, people_json,
       main_discipline, main_discipline_level1, updated_date, loaded_date
FROM latest WHERE rn = 1
"""


def _people_json(dialect: str) -> str:
    """json.dumps(peopleList, ensure_ascii=False) replicated by concat
    (default separators (', ', ': '); the fixture pins the dict key
    order to fullName/roleEn/orcId and its strings need no escaping).
    The NULL orcId renders as bare ``null`` — via ``||`` (not concat)
    in DuckDB, whose concat() IGNORES NULL args instead of propagating
    them like Spark's."""
    orc = "coalesce('\"' || p.orcId || '\"', 'null')"
    entry = (
        "concat('{\"fullName\": \"', p.fullName, '\", \"roleEn\": \"', "
        f"p.roleEn, '\", \"orcId\": ', {orc}, '}}')"
    )
    if dialect == "spark":
        return f"array_join(transform(peopleList, p -> {entry}), ', ')"
    return (
        f"list_aggregate(list_transform(peopleList, p -> {entry}), "
        "'string_agg', ', ')"
    )


def _gen_b_sql(dialect: str) -> str:
    members = ", ".join(
        f"('{nr}', {fid}, '{name}')" for nr, fid, name in _SWEEP
    )
    if dialect == "spark":
        pi = ("get(filter(peopleList, p -> p.roleEn = "
              "'Principal Investigator'), 0)")
        return _GEN_B_TEMPLATE.format(
            rows=_rows_sql("spark"), members=members,
            fmt_start="date_format(try_to_date(projectStartDate), "
                      "'yyyy-MM-dd')",
            fmt_end="date_format(try_to_date(projectEndDate), 'yyyy-MM-dd')",
            pi=pi, stripped=_SUFFIX_STRIP.format(x=f"{pi}.fullName"),
            people_json_body=_people_json("spark"),
            scb5="CASE WHEN size(scbs) > 0 THEN scbs[0].scb5NameEn END",
            scb1="CASE WHEN size(scbs) > 0 THEN scbs[0].scb1NameEn END",
            str_t="STRING",
        )
    pi = ("list_filter(peopleList, p -> p.roleEn = "
          "'Principal Investigator')[1]")
    return _GEN_B_TEMPLATE.format(
        rows=_rows_sql("duck"), members=members,
        fmt_start="strftime(try_cast(projectStartDate AS DATE), '%Y-%m-%d')",
        fmt_end="strftime(try_cast(projectEndDate AS DATE), '%Y-%m-%d')",
        pi=pi, stripped=_SUFFIX_STRIP.format(x=f"{pi}.fullName"),
        people_json_body=_people_json("duck"),
        scb5="CASE WHEN len(scbs) > 0 THEN scbs[1].scb5NameEn END",
        scb1="CASE WHEN len(scbs) > 0 THEN scbs[1].scb1NameEn END",
        str_t="VARCHAR",
    )


@register(
    "swecris_sweep_parse",
    oracle=_gen_b_sql("duck"),
    tags=("domain", "awards", "scrape"),
    tables=("orders",),
    doc=(
        "SweCRIS gen-B sweep parse (scripts/local/swecris_to_s3.py:"
        "94-210; supersets ifau/ostersjostiftelsen)"
    ),
)
def swecris_sweep_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gen-B SweCRIS parse: the 5-funder sweep with identity columns,
    suffix-stripping split_name, json.dumps people passthrough,
    MAX-amount dedup (§1.2 #6) and the stringify-all save (§1.2 #5) —
    one plan over the broadcast sweep registry."""
    return spark.sql(_gen_b_sql("spark"))
