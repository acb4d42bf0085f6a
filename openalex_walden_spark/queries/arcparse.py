"""ARC grants-API parse stage (``scripts/local/arc_to_s3.py`` — the
Australian Research Council's JSON:API grants feed, ~859 lines).

Ported semantics (``parse_single_grant`` :357-420 +
``process_grants`` :622-660):

* JSON:API shape: ``id`` at top level, everything else under
  ``attributes`` — flat field map (code, title, summary,
  funding-commencement-year, anticipated-end-date, grant-value/status/
  funder, program/scheme names, primary field of research, lead
  investigator + investigators + grantee passthroughs);
* ``scheme-information`` nested dict: a FALSY dict (absent/empty)
  yields NULL scheme fields, but a present dict with a missing or
  blank ``scheme-code`` yields the EMPTY STRING (``.get(..., '')
  .strip()`` — quirk preserved, '' and NULL are distinct outputs);
  scheme-round / submission-year pass through as integers;
* ``grant-priorities``: ``json.dumps(list)`` when non-empty
  (``'["A", "B"]'`` — the ``', '`` separator), else NULL;
* ``end_date``: already ISO from the API; the reference's
  ``astype(str).replace('None', None)`` round-trip is the identity on
  real dates and NULL — preserved as a passthrough;
* numeric columns stay numeric (ARC is NOT a stringify-all script);
* dedup by grant_id keeping the first record in feed order;
* ``ingested_at`` (utcnow) is a runtime seam, not emitted.

Scale: per-row column algebra over one scan; the dedup plans as a
rank-limit window on the grant id.  The reference pages the API into
one pandas frame.

Fixture: one JSON:API record per orders row — scheme-information
absent / blank-code / full, priorities empty and 1-2 entries,
duplicate grant ids via the custkey lattice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openalex_walden_spark.queries.registry import register


def _rows_sql(dialect: str) -> str:
    sp = dialect == "spark"
    null_s = "CAST(NULL AS STRING)" if sp else "CAST(NULL AS VARCHAR)"
    cs = (lambda e: f"CAST({e} AS STRING)") if sp else (
        lambda e: f"CAST({e} AS VARCHAR)")
    if sp:
        scheme_t = ("STRUCT<scheme_code: STRING, scheme_round: BIGINT, "
                    "submission_year: BIGINT>")
        scheme = (lambda c, r, y: "named_struct('scheme_code', " + c +
                  ", 'scheme_round', " + r + ", 'submission_year', " +
                  y + ")")
        arr = lambda *xs: "array(" + ", ".join(xs) + ")"  # noqa: E731
        empty = "array()"
        d1 = ("date_format(date_add(o_orderdate, "
              "CAST(300 + o_orderkey % 1200 AS INT)), 'yyyy-MM-dd')")
    else:
        scheme_t = ("STRUCT(scheme_code VARCHAR, scheme_round BIGINT, "
                    "submission_year BIGINT)")
        scheme = (lambda c, r, y: "struct_pack(scheme_code := " + c +
                  ", scheme_round := " + r + ", submission_year := " +
                  y + ")")
        arr = lambda *xs: "[" + ", ".join(xs) + "]"  # noqa: E731
        empty = "[]"
        d1 = ("strftime(CAST(o_orderdate AS DATE) + "
              "CAST(300 + o_orderkey % 1200 AS INT), '%Y-%m-%d')")
    return f"""
  SELECT o_orderkey AS seq,
         concat('arc/', {cs('o_custkey % 601')}) AS grant_id,
         concat('DP', {cs('1990 + o_orderkey % 36')},
                lpad({cs('o_orderkey % 9999')}, 6, '0')) AS code,
         concat('Discovery of mechanism ', {cs('o_orderkey % 71')})
           AS grant_title,
         CASE WHEN o_orderkey % 11 = 0 THEN {null_s}
              ELSE concat('Summary text ', {cs('o_orderkey % 47')}) END
           AS grant_summary,
         CAST(1990 + o_orderkey % 36 AS BIGINT)
           AS funding_commencement_year,
         CASE WHEN o_orderkey % 17 = 0 THEN {null_s}
              ELSE {d1} END AS anticipated_end_date,
         CAST(o_totalprice AS DOUBLE) AS grant_value,
         CASE WHEN o_orderkey % 5 = 0 THEN 'Closed'
              ELSE 'Active' END AS grant_status,
         'Australian Research Council' AS grant_funder,
         concat('National Competitive Grants Program ',
                {cs('o_orderkey % 3')}) AS program_name,
         concat('Discovery Projects ', {cs('o_orderkey % 6')})
           AS scheme_name,
         CASE CAST(o_orderkey % 5 AS INT)
              WHEN 0 THEN CAST(NULL AS {scheme_t})
              WHEN 1 THEN {scheme("'  '",
                                  "CAST(o_orderkey % 4 AS BIGINT)",
                                  "CAST(1989 + o_orderkey % 36 AS BIGINT)")}
              ELSE {scheme(f"concat(' DP', {cs('o_orderkey % 6')}, ' ')",
                           "CAST(o_orderkey % 4 AS BIGINT)",
                           "CAST(1989 + o_orderkey % 36 AS BIGINT)")}
         END AS scheme_information,
         concat('4', lpad({cs('o_orderkey % 99')}, 3, '0'))
           AS primary_field_of_research,
         concat('Prof A Lee ', {cs('o_custkey % 29')})
           AS lead_investigator,
         concat('Prof A Lee ', {cs('o_custkey % 29')},
                '; Dr B Kim ', {cs('o_orderkey % 29')}) AS investigators,
         concat('University of Region ', {cs('o_custkey % 19')})
           AS grantee,
         CASE CAST(o_orderkey % 4 AS INT)
              WHEN 0 THEN {empty}
              WHEN 1 THEN {arr(f"concat('Priority ', {cs('o_orderkey % 9')})")}
              ELSE {arr(f"concat('Priority ', {cs('o_orderkey % 9')})",
                        "'National Interest'")} END AS grant_priorities
  FROM orders
"""


_PARSE_TEMPLATE = """
WITH raw AS ({rows}),
parsed AS (
  SELECT seq,
         grant_id, code, grant_title AS title, grant_summary AS summary,
         funding_commencement_year AS start_year,
         anticipated_end_date AS end_date,
         grant_value, grant_status, grant_funder, program_name,
         scheme_name,
         CASE WHEN scheme_information IS NULL THEN NULL
              ELSE trim(coalesce(scheme_information.scheme_code, ''))
              END AS scheme_code,
         scheme_information.scheme_round AS scheme_round,
         scheme_information.submission_year AS submission_year,
         primary_field_of_research,
         lead_investigator, investigators, grantee,
         CASE WHEN {prio_size} > 0 THEN
           concat('["', {prio_join}, '"]') END AS grant_priorities_json
  FROM raw
),
latest AS (
  SELECT *, row_number() OVER (
           PARTITION BY grant_id ORDER BY seq ASC) AS rn
  FROM parsed
)
SELECT grant_id, code, title, summary, start_year, end_date,
       grant_value, grant_status, grant_funder, program_name,
       scheme_name, scheme_code, scheme_round, submission_year,
       primary_field_of_research, lead_investigator, investigators,
       grantee, grant_priorities_json
FROM latest WHERE rn = 1
"""


def _parse_sql(dialect: str) -> str:
    sp = dialect == "spark"
    return _PARSE_TEMPLATE.format(
        rows=_rows_sql(dialect),
        prio_size=("size(grant_priorities)" if sp
                   else "len(grant_priorities)"),
        # json.dumps list rendering: '["A", "B"]' — the ', ' separator.
        prio_join=("array_join(grant_priorities, '\", \"')" if sp
                   else "list_aggregate(grant_priorities, 'string_agg', "
                        "'\", \"')"),
    )


@register(
    "arc_parse_grants",
    oracle=_parse_sql("duck"),
    tags=("domain", "awards", "scrape"),
    tables=("orders",),
    doc=(
        "ARC grants-API parse stage (scripts/local/arc_to_s3.py:"
        "357-420,622-660)"
    ),
)
def arc_parse_grants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON:API field map + the falsy scheme-information rule (NULL
    dict → NULL fields, present dict with blank code → empty string),
    json.dumps priorities render, and grant_id keep-first dedup
    (module docstring has the semantics map)."""
    return spark.sql(_parse_sql("spark"))
