"""WordPress-REST project-parse pair
(scripts/local/gulbenkian_to_s3.py, scripts/local/velux_stiftung_to_s3.py
— 2 scripts, the method-2 WP-REST skeleton).

Both ingests pull a WP custom-post list (HTTP/pagination = seam) and
normalize the rendered fields.  Ported compute:

* shared ``strip_html`` (gulbenkian:193-200 / velux:208-215): tags to
  spaces, entity unescape, whitespace collapse;
* **gulbenkian** (:203-335): the Portuguese amount grammar — '€'/'EUR'
  stripped, a value with BOTH '.' and ',' drops the dots and promotes
  the comma to the decimal point, a comma-only value promotes the
  comma, a dot-only value keeps the dot as a decimal only when ≤2
  digits trail it (else thousands), sub-1 values refused;
  ``parse_year`` takes an all-digits 1900-2030 value else the first
  19xx/20[0-3]x token; start_year falls back to the post date's year;
  description = excerpt else content[:5000]; content ships cut at
  8000; id 'gulbenkian-{slug}-{project_id}' (the id disambiguates
  repeated slugs); EUR iff amount;
* **velux_stiftung** (:218-317): the detail page's
  'Funding amount: CHF …' capture with the Swiss ``1'500'000`` quote
  separators (quotes and commas stripped, a '.' kept as decimal only
  with ≤2 trailing digits); the '2019 - 2023' period pair;
  projects_type taxonomy names ' / '-joined; description =
  content[:5000]; id 'velux-stiftung-{slug}'; CHF iff amount.

Both stringify every column (amounts render as str(float)).  Plan: 2
scan arms, pure column algebra behind a Generate barrier each, no
shuffle (ids unique by construction).  No Python.

tests/test_template_fidelity.py re-derives both members.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openalex_walden_spark.queries.registry import register


def _helpers(dialect: str):
    if dialect == "spark":
        g, stype = "", "STRING"

        def rl(col: str, pat: str) -> str:
            return f"{col} RLIKE '{pat}'"
    else:
        g, stype = ", 'g'", "VARCHAR"

        def rl(col: str, pat: str) -> str:
            return f"regexp_matches({col}, '{pat}')"

    def rx(src: str, pat: str, grp: int) -> str:
        return f"nullif(regexp_extract({src}, '{pat}', {grp}), '')"

    def strip_html(x: str) -> str:
        c = f"regexp_replace(coalesce({x}, ''), '<[^>]+>', ' '{g})"
        c = (f"replace(replace(replace({c}, '&amp;', '&'), '&#8211;', "
             f"'–'), '&nbsp;', ' ')")
        return (f"nullif(trim(regexp_replace({c}, '\\\\s+', ' '{g})), "
                f"'')")

    return g, stype, rl, rx, strip_html


def _sql(dialect: str) -> str:
    g, S, rl, rx, strip_html = _helpers(dialect)

    def cs(expr: str) -> str:
        return f"CAST({expr} AS {S})"

    def nullcols(*names: str) -> str:
        return ", ".join(f"CAST(NULL AS {S}) AS {n}" for n in names)

    def bar(name: str, prev: str, passthrough: list, cols: list) -> str:
        if dialect == "spark":
            ns = ", ".join(f"'{c}', {e}" for c, e in cols)
            sel = ", ".join(f"_s.{c} AS {c}" for c, _ in cols)
            pt = ", ".join(f"_p.{c}" for c in passthrough)
            return (f"{name} AS (\n  SELECT {pt}, {sel}\n  FROM {prev} _p\n"
                    f"  LATERAL VIEW explode(array(named_struct({ns}))) "
                    f"_bv AS _s\n)")
        sel = ", ".join(f"{e} AS {c}" for c, e in cols)
        pt = ", ".join(passthrough)
        return (f"{name} AS MATERIALIZED (\n  SELECT {pt}, {sel}\n"
                f"  FROM {prev}\n)")

    ks = cs("o_orderkey")

    # gulbenkian parse_amount: the Portuguese grammar
    gu_m = rx("trim(replace(replace(coalesce(gu.budget_raw, ''), '€', "
              "''), 'EUR', ''))", "([0-9.,]+)", 1)
    # dot-only rule: keep the dots only when the final dot segment is
    # <=2 digits (gulbenkian:203-240 splits on '.' and checks the last
    # part) — a kept multi-dot value then fails float() to NULL
    gu_last_seg = rx(gu_m, '[.]([0-9]*)$', 1)
    gu_norm = (
        f"CASE "
        f"WHEN contains({gu_m}, '.') AND contains({gu_m}, ',') "
        f"THEN replace(replace({gu_m}, '.', ''), ',', '.') "
        f"WHEN contains({gu_m}, ',') THEN replace({gu_m}, ',', '.') "
        f"WHEN contains({gu_m}, '.') "
        f"AND length(coalesce({gu_last_seg}, '')) > 2 "
        f"THEN replace({gu_m}, '.', '') "
        f"ELSE {gu_m} END")
    gu_amt = (f"CASE WHEN try_cast({gu_norm} AS DOUBLE) >= 1 "
              f"THEN try_cast({gu_norm} AS DOUBLE) END")

    def gu_year(x: str) -> str:
        allnum = (f"CASE WHEN {rl(f'trim(coalesce({x}, ' + chr(39) + chr(39) + '))', '^[0-9]+$')} "
                  f"AND CAST(trim({x}) AS INT) BETWEEN 1900 AND 2030 "
                  f"THEN CAST(trim({x}) AS INT) END")
        tok = (f"CAST({rx(f'coalesce({x}, ' + chr(39) + chr(39) + ')', chr(92)+chr(92)+'b(19[0-9]{2}|20[0-3][0-9])'+chr(92)+chr(92)+'b', 1)} AS INT)")
        return f"coalesce({allnum}, {tok})"

    # the chr() builds above are unreadable — spell them plainly
    def gu_year(x: str) -> str:  # noqa: F811
        trimmed = f"trim(coalesce({x}, ''))"
        allnum = (f"CASE WHEN {rl(trimmed, '^[0-9]+$')} "
                  f"AND try_cast({trimmed} AS INT) BETWEEN 1900 AND 2030 "
                  f"THEN try_cast({trimmed} AS INT) END")
        tok = (f"try_cast({rx(trimmed, chr(92)*2 + 'b(19[0-9][0-9]|20[0-3][0-9])' + chr(92)*2 + 'b', 1)} AS INT)")
        return f"coalesce({allnum}, {tok})"

    gulbenkian = f"""
gu_raw AS (
  SELECT o_orderkey AS k,
    {cs('o_orderkey + 120000')} AS project_id,
    concat('projeto-', {cs('o_orderkey % 700')}) AS slug,
    concat('<h2>Apoio &amp; inova', 'ção ', {ks}, '</h2>') AS title_raw,
    CASE WHEN o_orderkey % 3 = 0 THEN NULL
      ELSE concat('<p>Resumo  do projeto ', {ks}, '</p>') END
      AS excerpt_raw,
    concat('<div>Conte', 'údo integral do projeto ', {ks},
           ' com detalhes.</div>') AS content_raw,
    concat('201', {cs('o_orderkey % 9')}, '-0',
           {cs('o_orderkey % 9 + 1')}, '-12T10:00:00') AS page_date,
    CASE CAST(o_orderkey % 4 AS INT)
      WHEN 0 THEN NULL WHEN 1 THEN '2021'
      WHEN 2 THEN concat('start of 20', lpad({cs('o_orderkey % 31')},
                         2, '0')) ELSE 'por definir' END AS date_start,
    CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE '2024' END AS date_end,
    CASE CAST(o_orderkey % 6 AS INT)
      WHEN 0 THEN NULL WHEN 1 THEN '€ 12.500,00' WHEN 2 THEN '12500'
      WHEN 3 THEN '12.500' WHEN 4 THEN '0,75' ELSE 'EUR 9.850,5' END
      AS budget_raw,
    CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE 'Lisboa' END AS local_name,
    CASE WHEN o_orderkey % 3 = 0 THEN NULL
      ELSE concat('Partner ', {cs('o_orderkey % 8')}) END AS partners,
    CASE WHEN o_orderkey % 4 = 0 THEN NULL
      ELSE concat({cs('o_orderkey % 36 + 6')}, ' meses') END
      AS duration,
    CASE WHEN o_orderkey % 5 = 0 THEN NULL
      ELSE concat('Beneficiários ', {cs('o_orderkey % 6')}) END
      AS beneficiaries
  FROM orders
),
{bar("gu_parsed", "gu_raw",
     ["k", "project_id", "slug", "page_date", "date_start", "date_end",
      "budget_raw", "local_name", "partners", "duration", "beneficiaries"], [
    ("title", strip_html("title_raw")),
    ("excerpt", strip_html("excerpt_raw")),
    ("content", strip_html("content_raw")),
    ("amount", cs(gu_amt).replace("gu.", "")),
    ("start_year_acf", cs(gu_year("date_start"))),
    ("end_year", cs(gu_year("date_end"))),
])},
gu_out AS (
  SELECT 'gulbenkian' AS member,
    concat('gulbenkian-', slug, '-', project_id) AS funder_award_id,
    project_id, slug, title,
    coalesce(excerpt, substr(content, 1, 5000)) AS description,
    substr(content, 1, 8000) AS content_full,
    amount,
    CASE WHEN amount IS NOT NULL THEN 'EUR' END AS currency,
    coalesce(start_year_acf,
             CASE WHEN {rl("substr(page_date, 1, 4)", '^[0-9][0-9][0-9][0-9]$')}
                  THEN substr(page_date, 1, 4) END) AS start_year,
    end_year, page_date, date_start, date_end,
    local_name, partners, duration, beneficiaries,
    {nullcols('type_names')},
    concat('https://gulbenkian.pt/project/', slug, '/')
      AS landing_page_url
  FROM gu_parsed
)"""

    # velux: Swiss amount + period pair from the detail-page text
    vx_amt_cap = rx("coalesce(vx.page_text, '')",
                    "(?i)Funding amount\\\\s*[:|]?\\\\s*CHF\\\\s*"
                    "([0-9''.,]+)", 1)
    vx_norm = f"replace(replace({vx_amt_cap}, '''', ''), ',', '')"
    # same last-segment rule (velux:218-231): strip dots only when >2
    # digits trail the final dot; a kept multi-dot value NULLs in cast
    vx_last_seg = rx(vx_norm, '[.]([0-9]*)$', 1)
    vx_norm2 = (f"CASE WHEN contains({vx_norm}, '.') "
                f"AND length(coalesce({vx_last_seg}, '')) > 2 "
                f"THEN replace({vx_norm}, '.', '') ELSE {vx_norm} END")
    vx_amt = f"try_cast({vx_norm2} AS DOUBLE)"
    vx_period = ("\\\\b(19[0-9][0-9]|20[0-9][0-9])\\\\s*[-–—]\\\\s*"
                 "(19[0-9][0-9]|20[0-9][0-9])\\\\b")

    velux = f""",
vx_raw AS (
  SELECT o_orderkey AS k,
    {cs('o_orderkey + 50000')} AS project_id,
    concat('projekt-', {ks}) AS slug,
    concat('<h1>Daylight research project ', {ks}, '</h1>') AS title_raw,
    concat('<p>Understanding  circadian light exposure, case ', {ks},
           '.</p>') AS content_raw,
    CASE WHEN o_orderkey % 3 = 0 THEN NULL
      WHEN o_orderkey % 3 = 1 THEN 'Science / Daylight'
      ELSE 'Humus' END AS type_names,
    CASE CAST(o_orderkey % 5 AS INT)
      WHEN 0 THEN 'About the project. No funding line here. 2019'
      WHEN 1 THEN concat('Funding amount: CHF 485,000 Period 20',
                         lpad({cs('o_orderkey % 20')}, 2, '0'), ' - 20',
                         lpad({cs('o_orderkey % 20 + 3')}, 2, '0'))
      WHEN 2 THEN concat('Funding amount | CHF 1', '''', '500',
                         '''', '000 runs 2019 - 2023')
      WHEN 3 THEN 'funding amount: chf 72.50 period 2020 – 2021'
      ELSE 'Funding amount: CHF 9.850.5 (2018 — 2022)' END AS page_text,
    concat('202', {cs('o_orderkey % 4')}, '-03-01T08:00:00')
      AS page_date
  FROM orders
),
{bar("vx_parsed", "vx_raw",
     ["k", "project_id", "slug", "type_names", "page_text",
      "page_date"], [
    ("title", strip_html("title_raw")),
    ("content", strip_html("content_raw")),
    ("amount", cs(vx_amt).replace("vx.", "")),
    ("start_year",
     rx("coalesce(page_text, '')", vx_period, 1)),
    ("end_year",
     rx("coalesce(page_text, '')", vx_period, 2)),
])},
vx_out AS (
  SELECT 'velux_stiftung' AS member,
    concat('velux-stiftung-', slug) AS funder_award_id,
    project_id, slug, title,
    substr(content, 1, 5000) AS description,
    {nullcols('content_full')},
    amount,
    CASE WHEN amount IS NOT NULL THEN 'CHF' END AS currency,
    start_year, end_year, page_date,
    {nullcols('date_start', 'date_end', 'local_name', 'partners',
              'duration', 'beneficiaries')},
    type_names,
    concat('https://veluxstiftung.ch/projects/', slug, '/')
      AS landing_page_url
  FROM vx_parsed
)"""

    cols = ("member, funder_award_id, project_id, slug, title, "
            "description, content_full, amount, currency, start_year, "
            "end_year, page_date, date_start, date_end, local_name, "
            "partners, duration, beneficiaries, type_names, "
            "landing_page_url")

    return f"""
WITH {gulbenkian}{velux}
SELECT {cols} FROM gu_out
UNION ALL SELECT {cols} FROM vx_out
"""


def _build(dialect: str) -> str:
    text = _sql(dialect)
    if dialect == "duck":
        text = text.replace("\\\\", "\\")
        text = text.replace("AS STRING", "AS VARCHAR")
    return text


@register(
    "wprest_parse_projects",
    oracle=_build("duck"),
    tags=("domain", "awards", "scrape"),
    tables=("orders",),
    doc=("WP-REST project-parse pair (scripts/local/gulbenkian_to_s3.py,"
         " scripts/local/velux_stiftung_to_s3.py)"),
)
def wprest_parse_projects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gulbenkian + Velux Stiftung WP-REST normalizes in one union plan
    (module docstring has the semantics map: the Portuguese and Swiss
    amount grammars, the year fallbacks, the taxonomy join-render).
    Two barriered scan arms, zero shuffle, no Python."""
    return spark.sql(_build("spark"))
