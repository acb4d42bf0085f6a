"""NIHR awards-API parse stage (``scripts/local/nihr_to_s3.py`` —
the UK National Institute for Health and Care Research, ~908 lines;
the open-data awards API's consolidated view).

Ported semantics (``parse_single_record`` :336-455 +
``process_projects`` :593-684):

* flat field map from the API record (title, acronym, both abstracts,
  funding stream/programme triple, status, org, geo, HRCS/UKCRC
  classifications, landing link);
* ORCID cleanup: lowercase value in {'not provided', 'none', 'null',
  ''} → NULL;
* PI name parse from ``award_holder_name``: strip ONE leading title
  from [Dr, Prof, Professor, Mr, Mrs, Ms, Miss] (first match wins,
  checked in that order with a trailing space, so 'Professor X' is
  NOT mangled by the 'Prof ' prefix — 'Profe' ≠ 'Prof '); then
  'Family, Given' when ', ' is present (split once), else
  ``rsplit(' ', 1)`` with given = head / family = last token; a
  single-token name yields NULL/NULL (neither branch fires — a real
  reference quirk this port preserves);
* **DHSC exclusion** (2026-07-12 rule): drop
  ``programme == 'Policy Research Programme'`` OR
  ``funder == 'NIHR (ODA)'`` rows BEFORE the dedup — they are
  ingested separately under provenance ``nihr_ods_dhsc`` so the same
  grant is not asserted under both NIHR and DHSC.  Filter-then-dedup
  order is load-bearing: a duplicate whose first occurrence is
  DHSC-excluded survives via its second occurrence;
* dates coerce-to-NULL → ``YYYY-MM-DD`` strings; dedup by project_id
  keeping the first record in feed order;
* stringify-all EXCEPT ``institution_country`` / ``ukcrc_value``,
  which the reference keeps as ``array<string>`` (runbook §1.2 item 5
  with the CreateNIHRAwards carve-out: the notebook indexes
  institution_country with size()/[0]).  DEVIATION (round 11): this
  query's OUTPUT renders both arrays as deterministic JSON strings
  (``to_json``) because the driver's pandas canonicalizer sorts raw
  columns and crashes on list values — the array construction and the
  carve-out semantics upstream are unchanged, only the final
  projection stringifies;
* ``ingested_at`` (utcnow) is a runtime seam, not emitted.

Scale: per-row column algebra over one scan; the dedup plans as a
rank-limit window on the project id (map-side WindowGroupLimit).  The
reference pages the API and holds everything in one pandas frame.

Fixture: one API record per orders row — award-holder names cycling
every title/format branch (incl. the mononym NULL/NULL quirk), ORCID
junk values, DHSC-excluded programme/funder slots, duplicate project
ids via the custkey lattice, and list-typed country/UKCRC columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openalex_walden_spark.queries.registry import register

_TITLES = ("Dr ", "Prof ", "Professor ", "Mr ", "Mrs ", "Ms ", "Miss ")


def _rows_sql(dialect: str) -> str:
    sp = dialect == "spark"
    null_s = "CAST(NULL AS STRING)" if sp else "CAST(NULL AS VARCHAR)"
    cs = (lambda e: f"CAST({e} AS STRING)") if sp else (
        lambda e: f"CAST({e} AS VARCHAR)")
    arr = (lambda *xs: "array(" + ", ".join(xs) + ")") if sp else (
        lambda *xs: "[" + ", ".join(xs) + "]")
    empty_arr = "array()" if sp else "[]"
    if sp:
        d0 = "date_format(o_orderdate, 'yyyy-MM-dd')"
        d1 = ("date_format(date_add(o_orderdate, "
              "CAST(180 + o_orderkey % 1500 AS INT)), 'yyyy-MM-dd')")
    else:
        d0 = "strftime(o_orderdate, '%Y-%m-%d')"
        d1 = ("strftime(CAST(o_orderdate AS DATE) + "
              "CAST(180 + o_orderkey % 1500 AS INT), '%Y-%m-%d')")
    k13 = cs("o_orderkey % 13")
    return f"""
  SELECT o_orderkey AS seq,
         concat('NIHR', {cs('o_custkey % 701')}) AS project_id,
         concat('Study of outcome ', {cs('o_orderkey % 61')})
           AS project_title,
         CASE WHEN o_orderkey % 9 = 0 THEN {null_s}
              ELSE concat('ACR', {cs('o_orderkey % 40')}) END AS acronym,
         concat('Plain abstract ', {cs('o_orderkey % 43')})
           AS plain_english_abstract,
         CASE WHEN o_orderkey % 12 = 0 THEN {null_s}
              ELSE concat('Scientific abstract ', {cs('o_orderkey % 43')})
              END AS scientific_abstract,
         CASE CAST(o_orderkey % 11 AS INT)
              WHEN 0 THEN 'NIHR (ODA)'
              ELSE 'NIHR' END AS funder,
         {cs('o_totalprice')} AS award_amount_from_dh,
         {cs('CAST(o_totalprice AS DOUBLE) / 1000000')}
           AS award_amount_m,
         concat('Stream ', {cs('o_orderkey % 5')}) AS funding_stream,
         CASE CAST(o_orderkey % 7 AS INT)
              WHEN 0 THEN 'Policy Research Programme'
              WHEN 1 THEN 'Health Technology Assessment'
              ELSE concat('Programme ', {cs('o_orderkey % 7')}) END
           AS programme,
         'Research' AS programme_type,
         CASE WHEN o_orderkey % 8 = 0 THEN {null_s}
              ELSE 'Primary' END AS programme_stream,
         CASE WHEN o_orderkey % 19 = 0 THEN 'TBC'
              ELSE {d0} END AS start_date,
         CASE WHEN o_orderkey % 23 = 0 THEN {null_s}
              ELSE {d1} END AS end_date,
         CASE WHEN o_orderkey % 6 = 0 THEN 'Completed'
              ELSE 'Active' END AS project_status,
         concat('Trust ', {cs('o_custkey % 57')})
           AS contracted_organisation,
         'NHS' AS organisation_type,
         CASE CAST(o_orderkey % 4 AS INT)
              WHEN 0 THEN {empty_arr}
              WHEN 1 THEN {arr("'England'", "'Wales'")}
              ELSE {arr("'England'")} END AS institutioncountry,
         CASE CAST(o_orderkey % 6 AS INT)
              WHEN 0 THEN {null_s}
              WHEN 1 THEN concat('Smith', {k13}, ', John')
              WHEN 2 THEN concat('Dr John Smith', {k13})
              WHEN 3 THEN concat('Professor Jane van Doe', {k13})
              WHEN 4 THEN concat('Mononym', {k13})
              ELSE concat('Ms Eva Brown', {k13}) END
           AS award_holder_name,
         'Principal Investigator' AS involvement_type,
         CASE CAST(o_orderkey % 5 AS INT)
              WHEN 0 THEN 'Not Provided'
              WHEN 1 THEN 'none'
              WHEN 2 THEN ''
              WHEN 3 THEN {null_s}
              ELSE concat('0000-0002-', lpad({cs('o_orderkey % 9999')},
                          4, '0'), '-0001') END AS orcid,
         concat('SW1A ', {cs('o_orderkey % 9')}, 'AA') AS postcode,
         {cs('CAST(50 + o_custkey % 9 AS DOUBLE) + 0.25')} AS latitude,
         {cs('CAST(0 - CAST(o_custkey % 6 AS DOUBLE) AS DOUBLE) - 0.5')}
           AS longitude,
         concat('HRCS ', {cs('o_orderkey % 8')}) AS hrcs_rac_category,
         CASE WHEN o_orderkey % 5 = 0 THEN {empty_arr}
              ELSE {arr(f"concat('UKCRC ', {cs('o_orderkey % 21')})")} END
           AS ukcrc_value,
         concat('https://fundingawards.nihr.ac.uk/award/NIHR',
                {cs('o_custkey % 701')}) AS funding_and_awards_link
  FROM orders
"""


def _name_exprs(dialect: str) -> tuple[str, str]:
    """(pi_given, pi_family) from the stripped name — the reference's
    exact cascade (title strip is applied upstream as ``stripped``)."""
    given = (
        "CASE WHEN stripped IS NULL THEN NULL "
        "WHEN stripped LIKE '%, %' THEN "
        "trim(substring(stripped, position(', ' IN stripped) + 2)) "
        "WHEN stripped LIKE '% %' THEN "
        "trim(regexp_extract(stripped, '^(.*) [^ ]+$', 1)) "
        "END"
    )
    family = (
        "CASE WHEN stripped IS NULL THEN NULL "
        "WHEN stripped LIKE '%, %' THEN "
        "trim(substring(stripped, 1, position(', ' IN stripped) - 1)) "
        "WHEN stripped LIKE '% %' THEN "
        "trim(regexp_extract(stripped, '([^ ]+)$', 1)) "
        "END"
    )
    if dialect == "duck":
        given = given.replace("position(', ' IN stripped)",
                              "strpos(stripped, ', ')")
        family = family.replace("position(', ' IN stripped)",
                                "strpos(stripped, ', ')")
    return given, family


_PARSE_TEMPLATE = """
WITH raw AS ({rows}),
stripped_names AS (
  SELECT *, {strip_title} AS stripped
  FROM raw
),
parsed AS (
  SELECT seq, project_id,
         project_title AS title,
         acronym, plain_english_abstract, scientific_abstract, funder,
         award_amount_from_dh AS award_amount,
         award_amount_m, funding_stream, programme, programme_type,
         programme_stream,
         {fmt_start} AS start_date,
         {fmt_end} AS end_date,
         project_status, contracted_organisation, organisation_type,
         institutioncountry AS institution_country,
         award_holder_name, involvement_type,
         {pi_given} AS pi_given_name,
         {pi_family} AS pi_family_name,
         CASE WHEN lower(coalesce(orcid, 'x')) IN
                   ('not provided', 'none', 'null', '') THEN NULL
              ELSE orcid END AS orcid,
         postcode, latitude, longitude, hrcs_rac_category, ukcrc_value,
         funding_and_awards_link AS landing_page_url
  FROM stripped_names
  WHERE NOT (programme = 'Policy Research Programme'
             OR funder = 'NIHR (ODA)')
),
latest AS (
  SELECT *, row_number() OVER (
           PARTITION BY project_id ORDER BY seq ASC) AS rn
  FROM parsed
)
SELECT project_id, title, acronym, plain_english_abstract,
       scientific_abstract, funder, award_amount, award_amount_m,
       funding_stream, programme, programme_type, programme_stream,
       start_date, end_date, project_status, contracted_organisation,
       organisation_type,
       {tojson_ic} AS institution_country,
       award_holder_name,
       involvement_type, pi_given_name, pi_family_name, orcid,
       postcode, latitude, longitude, hrcs_rac_category,
       {tojson_uk} AS ukcrc_value,
       landing_page_url
FROM latest WHERE rn = 1
"""


def _strip_title_expr() -> str:
    """Strip ONE leading title (first match in the reference's order)
    from the trimmed award-holder name."""
    expr = "trim(award_holder_name)"
    cases = " ".join(
        f"WHEN trim(award_holder_name) LIKE '{t}%' THEN "
        f"substring(trim(award_holder_name), {len(t) + 1})"
        for t in _TITLES
    )
    return f"CASE {cases} ELSE {expr} END"


def _parse_sql(dialect: str) -> str:
    sp = dialect == "spark"
    given, family = _name_exprs(dialect)
    if sp:
        fmt_s = "date_format(try_to_date(start_date), 'yyyy-MM-dd')"
        fmt_e = "date_format(try_to_date(end_date), 'yyyy-MM-dd')"
    else:
        fmt_s = "strftime(try_cast(start_date AS DATE), '%Y-%m-%d')"
        fmt_e = "strftime(try_cast(end_date AS DATE), '%Y-%m-%d')"
    if sp:
        tj = lambda c: f"to_json({c})"  # noqa: E731
    else:
        tj = lambda c: f"CAST(to_json({c}) AS VARCHAR)"  # noqa: E731
    return _PARSE_TEMPLATE.format(
        rows=_rows_sql(dialect),
        strip_title=_strip_title_expr(),
        fmt_start=fmt_s, fmt_end=fmt_e,
        pi_given=given, pi_family=family,
        tojson_ic=tj("institution_country"),
        tojson_uk=tj("ukcrc_value"),
    )


@register(
    "nihr_parse_awards",
    oracle=_parse_sql("duck"),
    tags=("domain", "awards", "scrape"),
    tables=("orders",),
    doc=(
        "NIHR awards-API parse stage (scripts/local/nihr_to_s3.py:"
        "336-455,593-684)"
    ),
)
def nihr_parse_awards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field map + ORCID cleanup + title-strip/comma-name PI parse +
    the DHSC exclusion rule + keep-first dedup + the mixed
    string/array save contract (module docstring has the semantics
    map, including the preserved mononym NULL/NULL quirk)."""
    return spark.sql(_parse_sql("spark"))
