"""USAspending bulk-award parse: the 14-script federal scraper family.

The reference drives one scraper per US federal funder against the
USAspending.gov bulk-download API (``scripts/local/{acf,acl,ahrq,cdc,
dod,doe,epa,fda,nasa,nist,noaa,usaid,usda,usgs}_to_s3.py`` — ~10.5k LoC
generated from one template).  Per script the HTTP layer differs only
by the agency filter in the request payload (tier + agency name,
``noaa_to_s3.py:143-177``); the parse/normalize compute is the shared
``process_dataframe``/``save_to_parquet`` pair (``noaa_to_s3.py:
514-616``), identical across the family except for ONE divergence this
port preserves:

* the older 9 scripts (acf acl ahrq cdc dod doe epa fda nasa) MUTATE
  ``total_obligated_amount`` with ``pd.to_numeric(errors='coerce')``
  while printing the funding summary (``acf_to_s3.py``), so garbage
  amounts become NULL and valid ones are re-rendered as floats before
  the stringify-all save;
* the newer 5 (nist noaa usaid usda usgs) compute the summary into a
  separate variable (``noaa_to_s3.py:585``), so the saved column keeps
  the raw CSV text.

Ported semantics (shared template):

* dedup by ``award_id_fain`` keeping the most recent ``action_date``
  (transactions arrive one row per action; the award's current state is
  the latest action).  The reference sorts with pandas' default
  (unstable) quicksort, so its tie order is implementation-defined;
  this port makes ties deterministic on the ingest sequence (first
  loaded wins — pandas ``keep='first'`` under a stable sort);
* the three date columns (action, period-of-performance start/current
  end) parse with coerce-to-NULL semantics and re-render as
  ``YYYY-MM-DD`` strings (CSV exports are ISO; the reference's lenient
  multi-format pandas parser narrows to ISO + NULL here);
* every saved column is a string (``plans/awards/how-to-add-a-funder
  .md``: "all source columns string" — the award-schema casts happen
  downstream with TRY_CAST);
* ``ingested_at`` (utcnow stamp) is a runtime seam, not parse compute —
  deliberately not emitted.

The 14 members' request scopes are pinned as data (_FAMILY) and join
broadcast into the plan so the amount-variant split is exercised per
member, not hard-coded; ``tests/test_funderscrape.py`` enumerates the
family against the reference directory and fails if a USAspending
script appears/disappears (hhs_taggs/cdmrp/doe_sc/hrsa/ies/neh are
adjudicated non-members there: own harvest APIs, the template only in
prose).

Scale: per-row column algebra over one scan; the only shuffle is the
per-(funder, fain) latest-action window — key grain is the award id,
uniform by construction.  The 14-row scope table is a broadcast join.
Fixture: transactions synthesized from orders (fain collides on
o_custkey mod 149, so multi-action awards and the dedup are real).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openalex_walden_spark.queries.registry import register

# slug, tier, awarding-agency name, coerce_amount (the 9-vs-5 variant
# split documented above).  prime_award_types is ["02","03","04","05"]
# (block/formula/project/cooperative grants) for every member, so it is
# not a column.
_FAMILY: tuple[tuple[str, str, str, bool], ...] = (
    ("acf", "subtier", "Administration for Children and Families", True),
    ("acl", "subtier", "Administration for Community Living", True),
    ("ahrq", "subtier", "Agency for Healthcare Research and Quality", True),
    ("cdc", "subtier", "Centers for Disease Control and Prevention", True),
    ("dod", "toptier", "Department of Defense", True),
    ("doe", "toptier", "Department of Energy", True),
    ("epa", "toptier", "Environmental Protection Agency", True),
    ("fda", "subtier", "Food and Drug Administration", True),
    ("nasa", "toptier",
     "National Aeronautics and Space Administration", True),
    ("nist", "subtier",
     "National Institute of Standards and Technology", False),
    ("noaa", "subtier",
     "National Oceanic and Atmospheric Administration", False),
    ("usaid", "toptier", "Agency for International Development", False),
    ("usda", "toptier", "Department of Agriculture", False),
    ("usgs", "subtier", "U.S. Geological Survey", False),
)


def _family_values(dialect: str) -> str:
    """The scope registry as an inline VALUES table (both dialects)."""
    rows = ", ".join(
        f"('{s}', '{t}', '{n}', {str(c).upper()})"
        for s, t, n, c in _FAMILY
    )
    if dialect == "spark":
        return (
            f"SELECT * FROM (VALUES {rows}) "
            "AS fam(funder, tier, agency_name, coerce_amount)"
        )
    return (
        f"SELECT * FROM (VALUES {rows}) "
        "fam(funder, tier, agency_name, coerce_amount)"
    )


# One synthetic bulk-CSV transaction row per orders row.  k = orderkey.
# Garbage/blank lattice: action_date 'TBD' on k%13=0 and '' on k%13=1;
# period start 'PENDING' on k%17=0; period end '' on k%23=0; amount
# 'N/A' on k%19=0 and '' on k%19=1.
_TXN_SPARK = """
  SELECT o_orderkey AS seq,
         element_at(array({slugs}), CAST(o_orderkey % 14 AS INT) + 1)
           AS funder,
         concat('FAIN', CAST(o_custkey % 149 AS STRING)) AS award_id_fain,
         CASE CAST(o_orderkey % 13 AS INT)
              WHEN 0 THEN 'TBD' WHEN 1 THEN ''
              ELSE date_format(date_add(o_orderdate,
                     CAST(o_orderkey % 400 AS INT)), 'yyyy-MM-dd') END
           AS action_date_raw,
         CASE WHEN o_orderkey % 17 = 0 THEN 'PENDING'
              ELSE date_format(o_orderdate, 'yyyy-MM-dd') END
           AS pop_start_raw,
         CASE WHEN o_orderkey % 23 = 0 THEN ''
              ELSE date_format(date_add(o_orderdate,
                     CAST(30 + o_orderkey % 300 AS INT)), 'yyyy-MM-dd') END
           AS pop_end_raw,
         CASE CAST(o_orderkey % 19 AS INT)
              WHEN 0 THEN 'N/A' WHEN 1 THEN ''
              ELSE CAST(o_totalprice AS STRING) END AS amount_raw,
         concat('Recipient ', CAST(o_custkey % 97 AS STRING))
           AS recipient_name,
         concat('Grant action ', o_orderpriority) AS award_description
  FROM orders
""".format(slugs=", ".join(f"'{s}'" for s, _, _, _ in _FAMILY))

_TXN_DUCK = (
    _TXN_SPARK
    .replace(
        "element_at(array({slugs}), CAST(o_orderkey % 14 AS INT) + 1)"
        .format(slugs=", ".join(f"'{s}'" for s, _, _, _ in _FAMILY)),
        "list_extract([{slugs}], CAST(o_orderkey % 14 AS INT) + 1)"
        .format(slugs=", ".join(f"'{s}'" for s, _, _, _ in _FAMILY)),
    )
    .replace("AS STRING", "AS VARCHAR")
    .replace(
        "date_format(date_add(o_orderdate,\n                     "
        "CAST(o_orderkey % 400 AS INT)), 'yyyy-MM-dd')",
        "strftime(CAST(o_orderdate AS DATE) + CAST(o_orderkey % 400 AS INT), '%Y-%m-%d')",
    )
    .replace(
        "date_format(o_orderdate, 'yyyy-MM-dd')",
        "strftime(o_orderdate, '%Y-%m-%d')",
    )
    .replace(
        "date_format(date_add(o_orderdate,\n                     "
        "CAST(30 + o_orderkey % 300 AS INT)), 'yyyy-MM-dd')",
        "strftime(CAST(o_orderdate AS DATE) + CAST(30 + o_orderkey % 300 AS INT), "
        "'%Y-%m-%d')",
    )
)

# The shared parse over the transaction rows; {try_date} / {d2s} absorb
# the dialect spellings of coerce-to-NULL date parse and double render.
_PARSE_TEMPLATE = """
WITH txn AS ({txn}),
fam AS ({fam}),
parsed AS (
  SELECT t.seq, t.funder, f.tier, f.agency_name, t.award_id_fain,
         {try_date_action} AS action_dt,
         {try_date_start} AS pop_start_dt,
         {try_date_end} AS pop_end_dt,
         CASE WHEN f.coerce_amount
              THEN {amt_render}
              ELSE t.amount_raw END
           AS total_obligated_amount,
         t.recipient_name, t.award_description
  FROM txn t JOIN fam f ON f.funder = t.funder
),
latest AS (
  SELECT *, row_number() OVER (
           PARTITION BY funder, award_id_fain
           ORDER BY action_dt DESC NULLS LAST, seq ASC) AS rn
  FROM parsed
)
SELECT funder, tier, agency_name, award_id_fain,
       {fmt_action} AS action_date,
       {fmt_start} AS period_of_performance_start_date,
       {fmt_end} AS period_of_performance_current_end_date,
       total_obligated_amount, recipient_name, award_description
FROM latest WHERE rn = 1
"""


def _parse_sql(dialect: str) -> str:
    if dialect == "spark":
        return _PARSE_TEMPLATE.format(
            txn=_TXN_SPARK,
            fam=_family_values("spark"),
            try_date_action="try_to_date(t.action_date_raw)",
            try_date_start="try_to_date(t.pop_start_raw)",
            try_date_end="try_to_date(t.pop_end_raw)",
            amt_render="CAST(try_cast(t.amount_raw AS DOUBLE) AS STRING)",
            fmt_action="date_format(action_dt, 'yyyy-MM-dd')",
            fmt_start="date_format(pop_start_dt, 'yyyy-MM-dd')",
            fmt_end="date_format(pop_end_dt, 'yyyy-MM-dd')",
        )
    return _PARSE_TEMPLATE.format(
        txn=_TXN_DUCK,
        fam=_family_values("duck"),
        try_date_action="try_cast(t.action_date_raw AS DATE)",
        try_date_start="try_cast(t.pop_start_raw AS DATE)",
        try_date_end="try_cast(t.pop_end_raw AS DATE)",
        amt_render="CAST(try_cast(t.amount_raw AS DOUBLE) AS VARCHAR)",
        fmt_action="strftime(action_dt, '%Y-%m-%d')",
        fmt_start="strftime(pop_start_dt, '%Y-%m-%d')",
        fmt_end="strftime(pop_end_dt, '%Y-%m-%d')",
    )


@register(
    "usaspending_parse_awards",
    oracle=_parse_sql("duck"),
    tags=("domain", "awards", "scrape"),
    tables=("orders",),
    doc=(
        "USAspending bulk-award parse shared by the 14-script federal "
        "scraper family (scripts/local/noaa_to_s3.py:514-616 et al.)"
    ),
)
def usaspending_parse_awards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-action dedup + date/amount normalization + stringify-all —
    the shared ``process_dataframe``/``save_to_parquet`` compute of the
    USAspending family, with the 14 members' request scopes joined in
    as broadcast data (module docstring has the full semantics map,
    including the 9-vs-5 amount-coercion variant split this preserves
    per member)."""
    return spark.sql(_parse_sql("spark"))
