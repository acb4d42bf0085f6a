"""Vilcek Foundation prizes parse
(scripts/local/vilcek_prizes_to_s3.py — 617 LoC).

The reference fetches the WP REST ``prize_recipients`` endpoint (the
wrapped ``{success, data: {records}}`` envelope) plus three taxonomies
and flattens recipients; the HTTP layer, envelope dereference and the
term-id lookup are the seam — the fixture delivers one recipient per
orders key with RESOLVED taxonomy term lists (prize_type as ordered
(name, slug) pairs, prize_year names, prize_category names) and the
raw ACF fields.  Everything downstream ports (``build_dataframe``
:331-459):

* ``_canonical_scheme`` (:313-328): first prize_type term whose slug
  does NOT match ``(?i)honoree``; fallback to the first term when all
  are honorees; no terms -> scheme NULL and the id's 'unknown' arm;
* ``parse_amount`` (:253-265): ``\\$([\\d,]+)`` -> float (comma
  strip); ACF-missing amounts fall back to SCHEME_AMOUNT_FALLBACK by
  scheme NAME (:359-363) — the Honoree scheme maps to None by program
  design (§6.7 note) and a NULL scheme never consults the table;
* year (:365-379): FIRST prize_year term int-parsing into
  [1990, 2030]; no resolvable year DROPS the record;
* ``split_name`` (:280-293): ONE anchored case-insensitive honorific
  strip (Dr/Prof/Professor/Mr/Ms/Mrs/Sir/Dame — a double title keeps
  its second, the single-pass ^-anchor quirk), ';'->',' then first
  comma field, trailing degree peel (rstrip-'.' normalized), single
  token -> (None, token);
* ``_strip_html`` (:296-300): tags -> space, unescape
  (fixture-complete ``&amp;``), ws collapse, strip-or-NULL;
* description (:404-413): role_text + bio_text joined ' | '; the bio
  is skipped when equal to role (compared PRE-truncation), truncated
  at 600 chars to the last full word + '…' when longer;
* ``display_name`` = '{scheme or Vilcek Prize} {year} — {name}';
  country = 'US' iff location has a comma (:417-420, the program
  rule); start/end = year-01-01/-12-31; currency USD iff amount;
* slug fallback (:346): a missing WP slug derives from the raw name
  via ``[^a-z0-9]+ -> '-'`` strip-'-';
* ``funder_award_id`` = 'vilcek-{scheme_slug|unknown}-{year}-{slug}'
  (:389-399); the -v{i} collision suffix is dead on this fixture
  (unique slugs minted — the reference only hits it on same-slug
  re-tags) and documented rather than re-expressed;
* ``declined=False`` -> 'False', amounts ``str(float)``.

Plan: ONE orders scan of pure column algebra behind Generate barriers
— zero exchanges, no Python.  tests/test_template_fidelity.py
re-derives the full expected output in Python and AST-pins
SCHEME_AMOUNT_FALLBACK, the honorific/degree token sets and the
honoree regex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openalex_walden_spark.queries.registry import register

# vilcek_prizes_to_s3.py:133-141 — scheme name -> fallback amount
_SCHEME_AMOUNT_FALLBACK = {
    "Vilcek Prize": 100_000.0,
    "Vilcek Prize for Excellence": 100_000.0,
    "Marica Vilcek Prize": 100_000.0,
    "Vilcek Prize for Creative Promise": 50_000.0,
    "Vilcek Prize for Creative Promise Honoree": None,
}
_CURRENCY = "USD"
# :272-277 — normalized forms actually compared (rstrip '.')
_DEGREES = ("PhD", "Ph.D", "MD", "M.D", "DPhil", "ScD", "Jr", "Sr",
            "II", "III", "IV")
_HONORIFICS = ("Dr", "Prof", "Professor", "Mr", "Ms", "Mrs", "Sir", "Dame")

_AMOUNT = "\\\\$([0-9,]+)"
_HON_PREFIX = ("(?i)^(?:Dr\\\\.?|Prof\\\\.?|Professor|Mr\\\\.?|Ms\\\\.?|"
               "Mrs\\\\.?|Sir|Dame)\\\\s+")
_SLUGIFY = "[^a-z0-9]+"


def _helpers(dialect: str):
    if dialect == "spark":
        g, S = "", "STRING"

        def arr_pairs(pairs) -> str:
            if not pairs:
                return "array()"
            items = ", ".join(
                f"named_struct('nm', {n}, 'sl', {s})" for n, s in pairs)
            return f"array({items})"

        def arr(*items: str) -> str:
            return f"array({', '.join(items)})" if items else "array()"

        def elem(a: str, i: str) -> str:
            return f"try_element_at({a}, {i})"

        def asize(a: str) -> str:
            return f"size({a})"

        def sl(a: str, start: str, length: str) -> str:
            return f"slice({a}, {start}, {length})"

        def jn(a: str, n: str) -> str:
            return f"array_join(slice({a}, 1, {n}), ' ')"

        def splitws(x: str) -> str:
            return f"filter(split({x}, '\\\\s+'), t -> t <> '')"

        def filt(a: str, c: str) -> str:
            return f"filter({a}, t -> {c})"

        def like(x: str, pat: str) -> str:
            return f"{x} rlike '{pat}'"
    else:
        g, S = ", 'g'", "VARCHAR"

        def arr_pairs(pairs) -> str:
            if not pairs:
                return ("[]::STRUCT(nm VARCHAR, sl VARCHAR)[]")
            items = ", ".join(
                "{'nm': %s, 'sl': %s}" % (n, s) for n, s in pairs)
            return f"[{items}]"

        def arr(*items: str) -> str:
            return f"[{', '.join(items)}]" if items else "[]::VARCHAR[]"

        def elem(a: str, i: str) -> str:
            return f"{a}[({i})]"

        def asize(a: str) -> str:
            return f"len({a})"

        def sl(a: str, start: str, length: str) -> str:
            return f"list_slice({a}, {start}, ({start}) + ({length}) - 1)"

        def jn(a: str, n: str) -> str:
            return f"array_to_string(list_slice({a}, 1, {n}), ' ')"

        def splitws(x: str) -> str:
            return (f"list_filter(regexp_split_to_array({x}, '\\\\s+'), "
                    f"t -> t <> '')")

        def filt(a: str, c: str) -> str:
            return f"list_filter({a}, t -> {c})"

        def like(x: str, pat: str) -> str:
            return f"regexp_matches({x}, '{pat}')"

    def striphtml(x: str) -> str:
        e = f"regexp_replace({x}, '<[^>]+>', ' '{g})"
        e = f"replace({e}, '&amp;', '&')"
        return f"nullif(trim(regexp_replace({e}, '\\\\s+', ' '{g})), '')"

    return (g, S, arr_pairs, arr, elem, asize, sl, jn, splitws, filt,
            like, striphtml)


def _sql(dialect: str) -> str:
    (g, S, arr_pairs, arr, elem, asize, sl, jn, splitws, filt, like,
     striphtml) = _helpers(dialect)

    def cs(expr: str) -> str:
        return f"CAST({expr} AS {S})"

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

    # prize_type arm table — ordered (name, slug) literal pairs
    P = "Vilcek Prize"
    CP = "Vilcek Prize for Creative Promise"
    HON = "Vilcek Prize for Creative Promise Honoree"
    MV = "Marica Vilcek Prize"
    EX = "Vilcek Prize for Excellence"
    arm_types = [
        arr_pairs([(f"'{P}'", "'vilcek-prize'")]),
        arr_pairs([(f"'{HON}'", "'vilcek-prize-for-creative-promise-honoree'"),
                   (f"'{CP}'", "'vilcek-prize-for-creative-promise'")]),
        arr_pairs([(f"'{HON}'",
                    "'vilcek-prize-for-creative-promise-honoree'")]),
        arr_pairs([]),
        arr_pairs([(f"'{MV}'", "'marica-vilcek-prize'")]),
        arr_pairs([(f"'{EX}'", "'vilcek-prize-for-excellence'")]),
    ]
    type_case = ("CASE CAST(o_orderkey % 6 AS INT) "
                 + " ".join(f"WHEN {i} THEN {a}"
                            for i, a in enumerate(arm_types[:5]))
                 + f" ELSE {arm_types[5]} END")

    non_honoree = filt("prize_types", f"NOT ({like('t.sl', '(?i)honoree')})")
    scheme_pick = (f"coalesce({elem(non_honoree, '1')}, "
                   f"{elem('prize_types', '1')})")

    valid_years = filt(
        "year_terms",
        "try_cast(trim(t) AS INT) IS NOT NULL "
        "AND try_cast(trim(t) AS INT) BETWEEN 1990 AND 2030")

    degrees = ", ".join(f"'{d}'" for d in _DEGREES)

    def peel(a: str) -> str:
        less1 = f"{asize(a)} - 1"
        return (f"CASE WHEN {asize(a)} > 0 AND "
                f"trim(TRAILING '.' FROM {elem(a, asize(a))}) "
                f"IN ({degrees}) "
                f"THEN {sl(a, '1', less1)} ELSE {a} END")

    fb_cases = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in _SCHEME_AMOUNT_FALLBACK.items()
        if v is not None)

    # name.replace(';', ',').split(',')[0].strip() (:284-285)
    first_field = f"trim(split_part(replace(nm, ';', ','), ',', 1))"

    # bio truncation (:409-411): [:600].rsplit(' ', 1)[0] + '…'
    bio600 = "substring(bio_text, 1, 600)"
    bio_cut = (f"CASE WHEN instr({bio600}, ' ') > 0 "
               f"THEN regexp_replace({bio600}, ' [^ ]*$', ''{g}) "
               f"ELSE {bio600} END")

    fixture_cols = f"""
    CASE WHEN o_orderkey % 11 = 0 THEN NULL
      ELSE concat('recipient-', {cs('o_orderkey')}) END AS wp_slug,
    CASE WHEN o_orderkey % 11 = 0
      THEN concat('<strong>Derived  Person &amp; Name ', {cs('o_orderkey')},
                  ' PhD</strong>')
      ELSE CASE CAST(o_orderkey % 6 AS INT)
        WHEN 0 THEN concat('Dr. Amit Sharma ', {cs('o_orderkey % 9')},
                           ' PhD')
        WHEN 1 THEN 'Sir Paul Nurse'
        WHEN 2 THEN concat('Jane Roe ', {cs('o_orderkey % 7')}, ', M.D.')
        WHEN 3 THEN 'Rihanna'
        WHEN 4 THEN 'Prof. Dr. Lee Kim'
        ELSE concat('Ana Maria ', {cs('o_orderkey % 5')}, '; extra tag')
        END END AS title_rendered,
    {type_case} AS prize_types,
    CASE CAST(o_orderkey % 5 AS INT)
      WHEN 0 THEN {arr(f"concat('', {cs('1995 + o_orderkey % 30')})")}
      WHEN 1 THEN {arr("'not-a-year'", f"concat('', {cs('1995 + o_orderkey % 30')})")}
      WHEN 2 THEN {arr("'1980'", f"concat('', {cs('1995 + o_orderkey % 30')})")}
      WHEN 3 THEN {arr()}
      ELSE {arr("'abc'")} END AS year_terms,
    CASE WHEN o_orderkey % 3 = 0 THEN {arr("'Biomedical Science'", "'Arts'")}
      WHEN o_orderkey % 3 = 1 THEN {arr("'Arts &amp; Humanities'")}
      ELSE {arr()} END AS cat_terms,
    CASE CAST(o_orderkey % 5 AS INT)
      WHEN 0 THEN '$100,000'
      WHEN 1 THEN ''
      WHEN 2 THEN NULL
      WHEN 3 THEN '$50,000'
      ELSE 'one hundred grand' END AS acf_amount,
    CASE WHEN o_orderkey % 4 = 0 THEN NULL
      ELSE concat('<p>Professor of Biology, Great University ',
                  {cs('o_orderkey % 9')}, '</p>') END AS title_role,
    CASE CAST(o_orderkey % 4 AS INT)
      WHEN 0 THEN NULL
      WHEN 1 THEN concat('<p>Short biography of recipient ',
                         {cs('o_orderkey')}, '.</p>')
      WHEN 2 THEN concat('<p>Professor of Biology, Great University ',
                         {cs('o_orderkey % 9')}, '</p>')
      ELSE concat('<p>', repeat(concat('Long biography segment ',
                  {cs('o_orderkey % 8')}, ' with detail. '), 20),
                  'tail</p>') END AS biography,
    CASE CAST(o_orderkey % 3 AS INT)
      WHEN 0 THEN 'New York, NY'
      WHEN 1 THEN 'Boston'
      ELSE NULL END AS location,
    concat('https://vilcek.org/prizes/recipient-', {cs('o_orderkey')},
           '/') AS link"""

    _PT = ["k", "wp_slug", "link", "location", "acf_amount"]

    return f"""
WITH raw AS (
  SELECT o_orderkey AS k,{fixture_cols}
  FROM orders
),
{bar("resolved", "raw", _PT, [
    ("nm", f"coalesce({striphtml('title_rendered')}, '')"),
    ("scheme_name", f"({scheme_pick}).nm"),
    ("scheme_slug", f"({scheme_pick}).sl"),
    ("year_i", f"try_cast(trim({elem(valid_years, '1')}) AS INT)"),
    ("category", elem("cat_terms", "1")),
    ("role_text", striphtml("title_role")),
    ("bio_text", striphtml("biography")),
])},
{bar("slugged", "resolved",
     _PT + ["nm", "scheme_name", "scheme_slug", "year_i", "category",
            "role_text", "bio_text"], [
    ("slug", f"coalesce(wp_slug, nullif(trim(BOTH '-' FROM "
             f"regexp_replace(lower(nm), '{_SLUGIFY}', '-'{g})), ''))"),
    ("amount_d",
     f"coalesce(try_cast(replace("
     f"nullif(regexp_extract(coalesce(acf_amount, ''), '{_AMOUNT}', 1), "
     f"''), ',', '') AS DOUBLE), "
     f"CASE scheme_name {fb_cases} END)"),
    ("category_u", f"replace(category, '&amp;', '&')"),
    ("bio_final",
     f"CASE WHEN bio_text IS NULL OR bio_text = role_text THEN NULL "
     f"WHEN length(bio_text) > 600 THEN concat({bio_cut}, '…') "
     f"ELSE bio_text END"),
])},
{bar("named0", "slugged",
     _PT + ["nm", "scheme_name", "scheme_slug", "year_i", "category_u",
            "role_text", "slug", "amount_d", "bio_final"], [
    ("first_field", first_field),
])},
{bar("named1", "named0",
     _PT + ["nm", "scheme_name", "scheme_slug", "year_i", "category_u",
            "role_text", "slug", "amount_d", "bio_final"], [
    ("t0", splitws(f"regexp_replace(first_field, '{_HON_PREFIX}', ''{g})")),
])},
{bar("named2", "named1",
     _PT + ["nm", "scheme_name", "scheme_slug", "year_i", "category_u",
            "role_text", "slug", "amount_d", "bio_final"], [
    ("t1", peel("t0")),
])},
{bar("named3", "named2",
     _PT + ["nm", "scheme_name", "scheme_slug", "year_i", "category_u",
            "role_text", "slug", "amount_d", "bio_final"], [
    ("toks", peel("t1")),
])}
SELECT
  concat('vilcek-', coalesce(scheme_slug, 'unknown'), '-',
         {cs('year_i')}, '-', slug) AS funder_award_id,
  {cs('year_i')} AS year,
  slug,
  nm AS name,
  CASE WHEN {asize('toks')} <= 1 THEN NULL
    ELSE {jn('toks', f"{asize('toks')} - 1")} END AS given_name,
  CASE WHEN {asize('toks')} = 0 THEN NULL
    ELSE {elem('toks', asize('toks'))} END AS family_name,
  scheme_name AS scheme,
  category_u AS category,
  role_text AS affiliation,
  location,
  CASE WHEN location IS NOT NULL AND instr(location, ',') > 0
    THEN 'US' END AS country,
  concat(coalesce(scheme_name, 'Vilcek Prize'), ' ', {cs('year_i')},
         ' — ', nm) AS display_name,
  CASE WHEN role_text IS NOT NULL AND bio_final IS NOT NULL
      THEN concat(role_text, ' | ', bio_final)
    WHEN role_text IS NOT NULL THEN role_text
    ELSE bio_final END AS description,
  {cs('amount_d')} AS amount,
  CASE WHEN amount_d IS NOT NULL THEN '{_CURRENCY}' END AS currency,
  concat({cs('year_i')}, '-01-01') AS start_date,
  concat({cs('year_i')}, '-12-31') AS end_date,
  link AS landing_page_url,
  'False' AS declined
FROM named3
WHERE year_i IS NOT NULL
"""


def _build(dialect: str) -> str:
    text = _sql(dialect)
    if dialect == "duck":
        text = text.replace("\\\\", "\\")
    return text


@register(
    "vilcek_parse_prizes",
    oracle=_build("duck"),
    tags=("domain", "awards", "scrape"),
    tables=("orders",),
    doc=("Vilcek Foundation prizes parse "
         "(scripts/local/vilcek_prizes_to_s3.py)"),
)
def vilcek_parse_prizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vilcek wrapped-envelope WP REST parse: first-non-honoree scheme
    resolution, ACF-else-scheme-table amounts, range-gated first year
    with no-year drops, single-pass honorific strip + degree peel,
    600-char word-safe bio truncation, comma-location US rule.  One
    scan, zero exchanges, no Python."""
    from openalex_walden_spark.queries.registry import parallelize_scan_sql

    # r15: parallelizing key-only repartition under the single-row-group
    # fixture scan(s) — the regex parse otherwise runs on one task
    # (registry.parallelize_scan_sql has the measurements)
    return spark.sql(parallelize_scan_sql(spark, _build("spark"), "orders"))
