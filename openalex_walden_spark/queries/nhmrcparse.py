"""NHMRC grants XLSX-stack parse stage (``scripts/local/nhmrc_to_s3.py``
— Australian National Health and Medical Research Council, 712 lines;
one grants XLSX per application-round year).

Ported semantics (``standardize_columns`` :283-394, ``parse_xlsx``
:414-455, ``process_files`` :458-571, ``download_all_files`` :172-193):

* per-year column standardization: regex cleanup (lowercase, ``\\s+``
  and non-word runs to ``_``, squeeze, strip) then the 60-entry rename
  table — shipped here as data (:func:`NHMRC_COLUMN_MAPPING`, fidelity
  gate AST-extracts the reference dict and requires equality);
* per-year title fallback (:390-392): a year frame with NO
  grant_title variant but a ``simplified_title`` copies it COLUMN-wise
  (so both columns ship, equal row-for-row, for that year);
* concat in YEAR-DESCENDING order (:186 ``sorted(..., reverse=True)``)
  with union-of-columns;
* the combined-level ``grant_id <- app_id`` fallback (:489-491) is
  COLUMN-presence only: a row whose grant_id cell is empty is NOT
  back-filled from its app_id — it is DROPPED by the notna/blank
  filter (:494-495, strip()=='' included).  Preserved quirk;
* keep-first dedup by grant_id (:498-501) — year-descending feed
  order means the most recent year's row wins;
* **the dead amount clean** (:507-513): the cleanup targets
  ``grant_value``, but standardize renamed every amount variant to
  ``total``, so the strip-``[$,\\s]``/to_numeric never fires and the
  output ``total`` column ships RAW STRINGS (``$1,234,567``).
  Preserved reference-exactly — do not "fix" it;
* output = the :515-533 column list filtered to existing, then every
  other column appended; ``ingested_at`` (utcnow) is a runtime seam,
  not emitted; XLSX header-row sniffing / duplicate-column suffixing
  (:255-281) are file-shape seams upstream of the ported compute.

Scale: 4 union arms of pure column algebra + one rank-limit dedup
window (map-side WindowGroupLimit); the reference stacks every year
in one pandas frame.

Fixture: one grant per orders row; arm = o_orderkey % 4 models the
2025 / 2021 / 2014 / 2013 column formats (each arm NULLs the fields
its year's XLSX lacks), duplicate grant ids via o_custkey % 500 span
years so the keep-first dedup has real work, and a blank/whitespace/
NULL grant_id lattice exercises the drop filter.

tests/test_template_fidelity.py::test_nhmrc_matches_reference_semantics
re-derives the stack; tests/test_funderscrape.py::
test_nhmrc_column_mapping_matches_reference pins the rename table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openalex_walden_spark.queries.registry import register

# The reference's rename table, verbatim (nhmrc_to_s3.py:306-387).
# Keys are post-cleanup raw headers, values the standardized names.
NHMRC_COLUMN_MAPPING: dict[str, str] = {
    "grant_id": "grant_id",
    "grantid": "grant_id",
    "app_id": "app_id",
    "appid": "app_id",
    "application_id": "app_id",
    "grant_title": "grant_title",
    "title": "grant_title",
    "application_title": "grant_title",
    "project_title": "grant_title",
    "scientific_title": "grant_title",
    "simplified_title": "simplified_title",
    "cia": "cia_name",
    "cia_name": "cia_name",
    "chief_investigator_a": "cia_name",
    "chief_investigator": "cia_name",
    "ci_a": "cia_name",
    "chief_investigator_a_project_lead": "cia_name",
    "cia_orcid_id": "cia_orcid",
    "administering_institution": "administering_institution",
    "admin_institution": "administering_institution",
    "institution": "administering_institution",
    "grant_value": "total",
    "total_budget": "total",
    "amount": "total",
    "funded_amount": "total",
    "total": "total",
    "total_amount_awarded": "total",
    "grant_type": "grant_type",
    "scheme": "grant_type",
    "funding_scheme": "grant_type",
    "funding_type": "grant_type",
    "grant_sub_type": "grant_sub_type",
    "sub_type": "grant_sub_type",
    "category": "grant_sub_type",
    "level_stream_or_sub_type": "grant_sub_type",
    "funding_sub_type": "grant_sub_type",
    "start_date": "start_date",
    "grant_start_date": "start_date",
    "start_year": "start_year",
    "start_yr": "start_year",
    "end_date": "end_date",
    "grant_end_date": "end_date",
    "end_year": "end_year",
    "end_yr": "end_year",
    "date_announced": "date_announced",
    "app_year": "app_year",
    "application_year": "app_year",
    "state_territory": "state_territory",
    "state": "state_territory",
    "state_or_territory": "state_territory",
    "broad_research_area": "broad_research_area",
    "bra": "broad_research_area",
    "for": "fields_of_research",
    "fields_of_research": "fields_of_research",
    "field_of_research": "fields_of_research",
    "field_s_of_research": "fields_of_research",
    "plain_description": "plain_description",
    "sector": "sector",
    "organisation_type": "sector",
}

# process_files:515-533 — output order is this list filtered to the
# columns that exist, then every remaining column appended.  Note
# 'grant_value' is listed but can never exist post-rename (the dead
# clean), and 'ingested_at' is the runtime seam.
NHMRC_OUTPUT_COLUMNS = [
    "grant_id", "app_id", "grant_title", "cia_name",
    "administering_institution", "grant_value", "grant_type",
    "grant_sub_type", "start_date", "start_year", "end_date", "end_year",
    "date_announced", "state_territory", "broad_research_area",
    "fields_of_research", "application_round_year", "ingested_at",
]

# fixture arm -> application-round year (processed year-DESC)
NHMRC_YEARS = (2025, 2021, 2014, 2013)


def _arm_sql(dialect: str, arm: int) -> str:
    """One year-format arm.  Which standard columns a year ships is
    the mapping's work (pinned by the rename-table gate); the arm
    NULLs what its XLSX format lacks:

    * 2025 (arm 0): application_id/application_title/
      chief_investigator_a_project_lead/cia_orcid_id/funding_scheme/
      level_stream_or_sub_type/total_amount_awarded/grant_start_date/
      grant_end_date/state_or_territory/organisation_type/
      application_year.
    * 2021 (arm 1): grant_value/field_s_of_research/date_announced/
      plain_description classic format.
    * 2014 (arm 2): simplified_title ONLY (the per-year grant_title
      copy fires), total_budget, start_yr/end_yr, state, bra, for.
    * 2013 (arm 3): scientific_title + simplified_title, funding_type/
      funding_sub_type, amount, app_year.
    """
    sp = dialect == "spark"
    S = "STRING" if sp else "VARCHAR"
    cs = lambda e: f"CAST({e} AS {S})"  # noqa: E731
    null_s = f"CAST(NULL AS {S})"
    year = NHMRC_YEARS[arm]
    k = "o_orderkey"
    gid = (f"CASE WHEN {k} % 17 = 0 THEN '' "
           f"WHEN {k} % 17 = 1 THEN NULL "
           f"WHEN {k} % 17 = 2 THEN '  ' "
           f"ELSE concat('GNT', lpad({cs(f'o_custkey % 500')}, 6, '0')) "
           f"END")
    title = f"concat('Grant title ', {cs(f'{k} % 97')})"
    simp = f"concat('Simplified title ', {cs(f'{k} % 97')})"
    cia = (f"CASE WHEN {k} % 13 = 0 THEN {null_s} "
           f"ELSE concat('Prof Jane Citizen ', {cs(f'{k} % 61')}) END")
    inst = f"concat('University of ', {cs('o_custkey % 40')})"
    total = {
        0: f"concat('$', {cs(f'{k} % 900 + 100')}, ',', "
           f"lpad({cs(f'{k} % 1000')}, 3, '0'))",
        1: f"concat({cs(f'{k} % 2000000')}, '.00')",
        2: f"concat('$ ', {cs(f'{k} % 999')}, ',500')",
        3: cs(f"{k} % 3000000"),
    }[arm]
    gtype = {
        0: "concat('Investigator Grants L', " + cs(f"{k} % 3") + ")",
        1: "'Ideas Grants'",
        2: "'Project Grants'",
        3: "'Early Career Fellowships'",
    }[arm]
    sub = (f"CASE WHEN {k} % 7 = 0 THEN {null_s} "
           f"ELSE concat('Stream ', {cs(f'{k} % 4')}) END")
    d0 = ("date_format(o_orderdate, 'yyyy-MM-dd')" if sp
          else "strftime(o_orderdate, '%Y-%m-%d')")
    orcid = (f"CASE WHEN {k} % 5 = 0 THEN {null_s} "
             f"ELSE concat('0000-0002-', lpad({cs(f'{k} % 9999')}, 4, "
             f"'0'), '-', {cs(f'{k} % 10')}) END")
    st = (f"CASE CAST({k} % 6 AS INT) WHEN 0 THEN 'NSW' WHEN 1 THEN "
          f"'VIC' WHEN 2 THEN 'QLD' WHEN 3 THEN 'WA' WHEN 4 THEN 'SA' "
          f"ELSE 'ACT' END")
    fields = {
        "grant_id": gid,
        "app_id": f"concat('APP', {cs(f'{k} % 90000 + 1000000')})",
        "grant_title": {0: title, 1: title, 2: simp, 3: title}[arm],
        "simplified_title": simp if arm in (2, 3) else null_s,
        "cia_name": cia,
        "cia_orcid": orcid if arm == 0 else null_s,
        "administering_institution": inst,
        "total": total,
        "grant_type": gtype,
        "grant_sub_type": sub if arm in (0, 1) else null_s,
        "start_date": d0 if arm in (0, 1) else null_s,
        "start_year": cs(f"{year} + {k} % 2") if arm == 2 else null_s,
        "end_date": (f"concat({cs(f'{year} + 4')}, '-12-31')"
                     if arm in (0, 1) else null_s),
        "end_year": cs(f"{year} + 4") if arm == 2 else null_s,
        "date_announced": (f"concat({cs(str(year - 1))}, '-10-', "
                           f"lpad({cs(f'{k} % 28 + 1')}, 2, '0'))"
                           if arm == 1 else null_s),
        "state_territory": st,
        "broad_research_area": (f"concat('Area ', {cs(f'{k} % 5')})"
                                if arm in (1, 2) else null_s),
        "fields_of_research": (f"concat('FoR ', {cs(f'{k} % 22')})"
                               if arm in (1, 2) else null_s),
        "plain_description": (f"concat('Plain description ', "
                              f"{cs(f'{k} % 43')})" if arm == 1
                              else null_s),
        "sector": ("CASE WHEN o_custkey % 3 = 0 THEN 'University' "
                   "ELSE 'MRI' END" if arm == 0 else null_s),
        "app_year": cs(str(year)) if arm in (0, 3) else null_s,
    }
    cols = ",\n         ".join(f"{e} AS {n}" for n, e in fields.items())
    return (f"  SELECT {k} AS seq, {arm} AS arm_rank,\n"
            f"         CAST({year} AS INT) AS application_round_year,\n"
            f"         {cols}\n"
            f"  FROM orders WHERE {k} % 4 = {arm}")


def _sql(dialect: str) -> str:
    arms = "\n  UNION ALL\n".join(
        _arm_sql(dialect, a) for a in range(4))
    return f"""
WITH stacked AS (
{arms}
),
kept AS (
  SELECT * FROM stacked
  WHERE grant_id IS NOT NULL AND trim(grant_id) <> ''
),
deduped AS (
  SELECT *, row_number() OVER (
           PARTITION BY grant_id ORDER BY arm_rank ASC, seq ASC) AS rn
  FROM kept
)
SELECT grant_id, app_id, grant_title, cia_name,
       administering_institution, grant_type, grant_sub_type,
       start_date, start_year, end_date, end_year, date_announced,
       state_territory, broad_research_area, fields_of_research,
       application_round_year, cia_orcid, total, sector, app_year,
       plain_description, simplified_title
FROM deduped WHERE rn = 1
"""


@register(
    "nhmrc_parse_grants",
    oracle=_sql("duck"),
    tags=("domain", "awards", "scrape"),
    tables=("orders",),
    doc=(
        "NHMRC XLSX-stack parse (scripts/local/nhmrc_to_s3.py:"
        "283-394,414-455,458-571)"
    ),
)
def nhmrc_parse_grants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-format standardization (rename table as data) + per-year
    simplified-title copy + year-descending stack + blank-id drop +
    keep-first dedup + the dead amount-clean quirk (module docstring
    has the full semantics map)."""
    return spark.sql(_sql("spark"))
