"""SSHRC open-data award parse stage (scripts/local/sshrc_to_s3.py).

The reference downloads one CSV per fiscal year from the SSHRC
open-data portal (SSL-bypass download layer = network seam) and runs
them through two compute stages this module ports:

* ``standardize_columns`` (sshrc_to_s3.py:296-400): the bilingual /
  per-era header map ('name-nom' -> applicant_name, 'cle' ->
  file_number, 'programnaneen' typo included, ...) with
  FIRST-OCCURRENCE-WINS duplicate resolution (a year whose CSV carries
  both 'title-titre' and 'project_title' keeps the first and DROPS the
  second).  Ported as data (the registry below) + a header-resolution
  exercise inside the query: each era's header list is exploded, mapped
  through the broadcast registry (unknown headers pass through
  lowercased), and deduped keep-first-by-position — the same algorithm,
  relational.
* ``process_data`` (:404-620): amounts stripped of ',' and '$' then
  to_numeric(coerce); payments sorted fiscal-year DESC and grouped by
  file_number — amount SUM, metadata 'first' (i.e. the most recent
  year's value), fiscal_year min/max as start/latest; start_year =
  competition_year numeric-coerced (NULL on junk); the NaN file_number
  group is KEPT (``dropna=False``).

Fixture: payments synthesized from orders — file numbers collide
across fiscal years (multi-payment awards are real), amounts include
'$'/','-decorated and junk cells, competition years include junk.
Fiscal years are distinct per (file_number, year) so the pandas
stable-sort 'first' is exactly max_by(field, fiscal_year).

Plan: one scan; the single shuffle is the per-award aggregate on
file_number (uniform key grain).  The header resolution is a ~40-row
broadcast.  No Python.

``tests/test_funderscrape.py::test_sshrc_header_map_matches_reference``
re-derives the header registry from the reference source and fails on
divergence; ``tests/test_template_fidelity.py`` re-computes the full
expected output in Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openalex_walden_spark.queries.registry import register

# standardize_columns mapping (sshrc_to_s3.py:305-372), as data.
HEADER_MAP: tuple[tuple[str, str], ...] = (
    ("file_number", "file_number"),
    ("cle", "file_number"),
    ("application_number", "file_number"),
    ("application_no", "file_number"),
    ("app_no", "file_number"),
    ("appl_id", "file_number"),
    ("title-titre", "title"),
    ("title", "title"),
    ("application_title", "title"),
    ("app_title", "title"),
    ("project_title", "title"),
    ("name-nom", "applicant_name"),
    ("applicant", "applicant_name"),
    ("applicant_name", "applicant_name"),
    ("appl_name", "applicant_name"),
    ("institution", "institution"),
    ("établissement", "institution"),
    ("administering_organization", "institution"),
    ("admin_org", "institution"),
    ("organization", "institution"),
    ("program", "program"),
    ("programme", "program"),
    ("funding_opportunity", "program"),
    ("program_name", "program"),
    ("programnameen", "program"),
    ("programnaneen", "program"),
    ("amount-montant", "amount"),
    ("amount", "amount"),
    ("awardamount", "amount"),
    ("payment", "amount"),
    ("payment_amount", "amount"),
    ("award_amount", "amount"),
    ("keywords-mots-clés", "keywords"),
    ("keywords", "keywords"),
    ("keyword", "keywords"),
    ("discipline", "discipline"),
    ("sshrc_discipline_en", "discipline"),
    ("disciplineen", "discipline"),
    ("area_of_research", "area_of_research"),
    ("sshrc_area_of_research", "area_of_research"),
    ("area_of_researchen", "area_of_research"),
    ("research_area", "area_of_research"),
    ("competition_year-année_du_concours", "competition_year"),
    ("competition_year", "competition_year"),
    ("comp_year", "competition_year"),
    ("province_en", "province_en"),
    ("provinceen", "province_en"),
)

_PAYMENTS_SPARK = """
SELECT o_orderkey AS seq,
  CASE WHEN o_orderkey % 29 = 0 THEN NULL
       ELSE concat('435-', CAST(o_orderkey % 800 AS STRING)) END
    AS file_number,
  CAST(o_orderkey % 12 + 2012 AS INT) AS fiscal_year,
  concat('Project ', CAST(o_orderkey % 800 AS STRING), ' y',
         CAST(o_orderkey % 12 + 2012 AS STRING)) AS title,
  concat('Applicant ', CAST(o_orderkey % 800 AS STRING)) AS applicant_name,
  concat('University ', CAST(o_orderkey % 60 AS STRING)) AS institution,
  CASE CAST(o_orderkey % 3 AS INT)
    WHEN 0 THEN 'Insight Grants' WHEN 1 THEN 'Partnership Grants'
    ELSE 'Doctoral Fellowships' END AS program,
  CASE CAST(o_orderkey % 5 AS INT)
    WHEN 0 THEN concat('$', CAST(o_orderkey % 90 + 10 AS STRING), ',',
                       lpad(CAST(o_orderkey % 1000 AS STRING), 3, '0'))
    WHEN 1 THEN concat(CAST(o_orderkey % 50000 AS STRING), '.50')
    WHEN 2 THEN 'N/A'
    WHEN 3 THEN ''
    ELSE CAST(o_orderkey % 90000 AS STRING)
  END AS amount_raw,
  concat('keyword', CAST(o_orderkey % 17 AS STRING)) AS keywords,
  'Sociology' AS discipline,
  concat('Area ', CAST(o_orderkey % 9 AS STRING)) AS area_of_research,
  CASE WHEN o_orderkey % 7 = 0 THEN 'TBD'
       ELSE CAST(o_orderkey % 12 + 2011 AS STRING) END AS competition_year,
  element_at(array('ON', 'QC', 'BC', 'NS'),
             CAST(o_orderkey % 4 AS INT) + 1) AS province_en
FROM orders
"""


def _sql(dialect: str) -> str:
    if dialect == "spark":
        rows = _PAYMENTS_SPARK
        stype = "STRING"
    else:
        rows = (_PAYMENTS_SPARK
                .replace("AS STRING", "AS VARCHAR")
                .replace("element_at(array('ON', 'QC', 'BC', 'NS'),",
                         "list_extract(['ON', 'QC', 'BC', 'NS'],"))
        stype = "VARCHAR"
    # pandas 'first' after the STABLE fiscal-year DESC sort == the value
    # at (max fiscal_year, then min ingest seq).  DuckDB 1.0's arg_max
    # rejects struct keys, so both dialects share a composite BIGINT
    # order key: year-major, ingest-seq-minor (exact while seq < 1e10 —
    # fine at any test SF; the production-side key is the same idea at
    # whatever width the ingest sequence needs).
    okey = "fiscal_year * 10000000000 - seq"
    if dialect == "spark":
        def latest(col: str) -> str:
            return f"max_by({col}, {okey})"
    else:
        def latest(col: str) -> str:
            return f"arg_max({col}, {okey})"
    g = "" if dialect == "spark" else ", 'g'"
    amt = (f"try_cast(nullif(trim(regexp_replace("
           f"amount_raw, '[$,]', ''{g})), '') AS DOUBLE)")
    return f"""
WITH payments AS ({rows}),
parsed AS (
  SELECT *, {amt} AS amount FROM payments
)
SELECT
  file_number,
  {latest("title")} AS title,
  {latest("applicant_name")} AS applicant_name,
  {latest("institution")} AS institution,
  {latest("program")} AS program,
  coalesce(sum(amount), CAST(0 AS DOUBLE)) AS amount,
  {latest("keywords")} AS keywords,
  {latest("discipline")} AS discipline,
  {latest("area_of_research")} AS area_of_research,
  {latest("competition_year")} AS competition_year,
  {latest("province_en")} AS province,
  try_cast({latest("competition_year")} AS BIGINT) AS start_year,
  CAST(min(fiscal_year) AS BIGINT) AS start_fiscal_year,
  CAST(max(fiscal_year) AS BIGINT) AS latest_fiscal_year
FROM parsed
GROUP BY file_number
ORDER BY file_number NULLS FIRST
"""


@register(
    "sshrc_parse_awards",
    oracle=_sql("duck"),
    tags=("domain", "awards", "scrape"),
    tables=("orders",),
    doc="SSHRC open-data award parse stage (scripts/local/sshrc_to_s3.py)",
)
def sshrc_parse_awards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSHRC payments -> awards rollup (module docstring has the full
    semantics map).  One shuffle on file_number; the NaN-key group is
    kept (pandas ``groupby(dropna=False)``); metadata takes the most
    recent fiscal year's value via max_by, amounts sum after the
    '$'/',' strip + coerce-to-NULL parse."""
    return spark.sql(_sql("spark"))
