"""Method-5 static-HTML scraper family
(scripts/local/{mott,helmsley,fritz_thyssen,mercator_fellows,
novo_nordisk_fonden,rj_jubileumsfond,wt_grant}_to_s3.py — 7 scripts,
one sitemap-discovery skeleton).

Each reference script enumerates a publisher's detail pages from
sitemaps and parses one record per page.  The sitemap crawl, HTTP
cache, and BeautifulSoup node selection are the seam; the fixture
delivers the selected raw strings (h1 text, og:title content, the
labeled-grid values, the info-box part list, the header-strip
segments, the body paragraphs) one page per orders key.  Ported
compute, per member:

* **mott** (mott_to_s3.py:200-332): ``parse_grant_period`` — the
  anchored '{Month D, YYYY}–{Month D, YYYY}' range with the comma-less
  strptime retry, the single-date fallback, the bare-19xx/20xx-year
  Jan-1 fallback; ``parse_amount`` ``\\$\\s*([0-9,]+(\\.[0-9]+)?)``;
  the OG-title recipient rule (strip ' | Mott Foundation', take the
  first comma segment unless it equals the H1 title); description =
  JSON-LD else og:description; id 'mott-{slug}', currency USD;
* **helmsley** (helmsley_to_s3.py:202-300): ``parse_date`` MM.DD.YYYY
  then M/D/YYYY (zero-filled) then bare-year Jan-1; display_name =
  project title else recipient; native id = trailing digits of the
  slug; id 'helmsley-{slug}', currency USD constant (shipped even
  without an amount — the reference sets the column unconditionally);
* **fritz_thyssen** (fritz_thyssen_to_s3.py:136-291): title = H1 else
  og:title; the info-box part list drops bare 'Institution' labels,
  then parts[0] = PI, parts[1] = affiliation; Bewilligung = first
  \\d{4} of its detail text, Förderbereich = text after the first '|';
  ``split_name`` pops title/degree tokens off BOTH ends (prof/dr in
  the set), mononym keeps family; id 'ft-{slug}';
* **mercator_fellows** (mercator_fellows_to_s3.py:225-320): the
  '{Month} {YYYY} [-–to] [{Month}] [{YYYY}]' period grammar with the
  month-name lookup, month-less end = Dec-31, match-less bare-year =
  Jan-1 start; description = biography else project title;
  ``split_name`` pops the degree tail only (prof/dr NOT in the set);
  id 'mercator-fellow-{slug}';
* **novo_nordisk_fonden** (novo_nordisk_fonden_to_s3.py:226-318): the
  credentials gate (>200 chars or fonden/footer/info substring →
  NULL); the header-strip prize scan — first segment matching
  ``^\\s*([^\\d\\n]+?)\\s*[-–]?\\s*(\\d{4})\\s*$`` whose no-digit head
  is longer than 3 chars and does NOT contain the recipient's name;
  award_year = header year else the slug's trailing '-YYYY';
  name_slug = slug minus that suffix; both-end split; id 'nnf-{slug}';
* **rj_jubileumsfond** (rj_jubileumsfond_to_s3.py:217-370): the PI
  span gate (≤80 chars, not Final report/Slutredovisning/
  Bidragsförvaltare); 'SEK 976,000' / '1 200 000 kr' amounts (comma
  AND space stripped, currency always SEK); award_year = the Year
  field when all-digits else the URL year; description = the >100-char
  body paragraphs minus the request-funds/initiation boilerplate,
  joined and cut at 5000; id 'rj-{slugified reference_number}-{slug}'
  falling back to 'rj-{slug}';
* **wt_grant** (wt_grant_to_s3.py:213-424): title = og:title with the
  ' - William T. Grant Foundation' suffix stripped, else H1; the
  About-This-Grant role items deliver PI/co-PI (person+org),
  grantee-organization, programs/focus/topics, amount, period;
  ``parse_period`` start/end years with the bare-year fallback;
  grantee_org = the PI's org else the org-only grantee; tail-only
  split; currency USD iff an amount; id = slug.

All members stringify every column before shipping
(``df.astype("string")``); amounts render as Python ``str(float)``.
Every member's validate RAISES on slug collisions, so the fixture
keys pages uniquely and the plan needs NO dedup: 7 scan arms of pure
column algebra behind Generate barriers, zero shuffle, no Python.

tests/test_template_fidelity.py re-derives all seven members in
Python from the reference rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openalex_walden_spark.queries.registry import register

# fritz/novo/rj variant: both-end pop, titles in the set
_SUFFIX_A = ("'phd','md','dphil','dsc','scd','jr','sr','ii','iii','iv',"
             "'prof','dr'")
# mercator/wt variant: trailing pop only, no titles
_SUFFIX_B = "'phd','md','dphil','dsc','scd','jr','sr','ii','iii','iv'"

_MONTHS = ("january,february,march,april,may,june,july,august,september,"
           "october,november,december")


def _helpers(dialect: str):
    if dialect == "spark":
        g, stype = "", "STRING"
        asize = "size"

        def rl(col: str, pat: str) -> str:
            return f"{col} RLIKE '{pat}'"

        def elem(a: str, i: str) -> str:
            return f"try_element_at({a}, {i})"

        def arr_filter(a: str, cond: str) -> str:
            return f"filter({a}, t -> {cond})"

        def arr_join(a: str, sep: str) -> str:
            return f"array_join({a}, '{sep}')"

        def month_no(x: str) -> str:
            return (f"array_position(split('{_MONTHS}', ','), lower({x}))")

        def dparse(x: str, fmt_spark: str, fmt_duck: str) -> str:
            return (f"date_format(try_to_timestamp({x}, '{fmt_spark}'), "
                    f"'yyyy-MM-dd')")

        fmt = "format_string"
    else:
        g, stype = ", 'g'", "VARCHAR"
        asize = "len"

        def rl(col: str, pat: str) -> str:
            return f"regexp_matches({col}, '{pat}')"

        def elem(a: str, i: str) -> str:
            return f"{a}[{i}]"

        def arr_filter(a: str, cond: str) -> str:
            return f"list_filter({a}, t -> {cond})"

        def arr_join(a: str, sep: str) -> str:
            return f"list_aggr({a}, 'string_agg', '{sep}')"

        def month_no(x: str) -> str:
            return (f"list_position(str_split('{_MONTHS}', ','), "
                    f"lower({x}))")

        def dparse(x: str, fmt_spark: str, fmt_duck: str) -> str:
            return (f"strftime(try_strptime({x}, '{fmt_duck}'), "
                    f"'%Y-%m-%d')")

        fmt = "printf"

    def rx(src: str, pat: str, grp: int) -> str:
        return f"nullif(regexp_extract({src}, '{pat}', {grp}), '')"

    def split_name(raw: str, suffixes: str, both_ends: bool):
        """(given, family) via the index-transform pop idiom."""
        if dialect == "spark":
            toks = (f"filter(split(coalesce({raw}, ''), '\\\\s+'), "
                    f"x -> x <> '')")

            def idxs(cond: str, agg: str) -> str:
                return (f"{agg}(zip_with(({toks}), sequence(1, "
                        f"size(({toks}))), (t, i) -> CASE WHEN {cond} "
                        f"THEN i END))")
            join_head = "array_join(slice(@T@, @S@, @E@ - @S@), ' ')"
        else:
            toks = (f"list_filter(regexp_split_to_array(coalesce({raw}, "
                    f"''), '\\s+'), x -> x <> '')")

            def idxs(cond: str, agg: str) -> str:
                agg = "list_min" if agg == "min" else "list_max"
                return (f"{agg}(list_transform(({toks}), (t, i) -> "
                        f"CASE WHEN {cond} THEN i END))")
            join_head = "list_aggr(list_slice(@T@, @S@, @E@ - 1), 'string_agg', ' ')"
        tok_norm = "lower(trim(BOTH '.,' FROM t))"
        if dialect == "spark":
            first = (f"coalesce({idxs(f'{tok_norm} NOT IN ({suffixes})', 'array_min')}, "
                     f"size(({toks})) + 1)") if both_ends else "1"
            last = (f"coalesce({idxs(f'{tok_norm} NOT IN ({suffixes})', 'array_max')}, 0)")
        else:
            first = (f"coalesce({idxs(f'{tok_norm} NOT IN ({suffixes})', 'min')}, "
                     f"len(({toks})) + 1)") if both_ends else "1"
            last = (f"coalesce({idxs(f'{tok_norm} NOT IN ({suffixes})', 'max')}, 0)")
        n_kept = f"greatest(({last}) - ({first}) + 1, 0)"
        kept_last = elem(f"({toks})", f"({last})")
        head = (join_head.replace("@T@", f"({toks})")
                .replace("@S@", f"({first})").replace("@E@", f"({last})"))
        given = f"CASE WHEN {n_kept} >= 2 THEN nullif({head}, '') END"
        family = f"CASE WHEN {n_kept} >= 1 THEN {kept_last} END"
        return given, family

    def slugify(x: str) -> str:
        s = (f"regexp_replace(lower(coalesce({x}, '')), '[^a-z0-9]+', "
             f"'-'{g})")
        return f"trim(BOTH '-' FROM {s})"

    return (g, stype, asize, rl, elem, arr_filter, arr_join, month_no,
            dparse, fmt, rx, split_name, slugify)


_COLS = (
    "member, funder_award_id, slug, title, display_name, recipient, "
    "pi_raw, given_name, family_name, credentials, institution, "
    "grantee_org, prize_name, program, initiative, funding_program, "
    "focus_areas, topics, subject, reference_number, "
    "grant_administrator, fellowship_program, amount, amount_raw, "
    "currency, period_raw, date_raw, award_date, start_date, end_date, "
    "start_year, end_year, award_year, term, location, "
    "geographic_focus, project_title, biography, description, "
    "copi_given_name, copi_family_name, copi_org, name_slug, "
    "native_grant_id, landing_page_url"
)


def _sql(dialect: str) -> str:
    (g, S, asize, rl, elem, arr_filter, arr_join, month_no, dparse, fmt,
     rx, split_name, slugify) = _helpers(dialect)

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
    # AMOUNT_NUMBER_RE (mott/helmsley/wt): \$\s*([0-9,]+(\.[0-9]+)?)
    _amt_pat = "\\\\$\\\\s*([0-9,]+(?:\\\\.[0-9]+)?)"

    def amt_usd(x: str) -> str:
        hit = rx(f"coalesce({x}, '')", _amt_pat, 1)
        return f"try_cast(replace({hit}, ',', '') AS DOUBLE)"

    # ---- mott -------------------------------------------------------------
    mott_range = ("^([A-Za-z]+ [0-9]{1,2},?\\\\s*[0-9]{4})\\\\s*[–—-]\\\\s*"
                  "([A-Za-z]+ [0-9]{1,2},?\\\\s*[0-9]{4})$")

    def mott_d(x: str) -> str:
        return (f"coalesce({dparse(x, 'MMMM d, yyyy', '%B %d, %Y')}, "
                f"{dparse(x, 'MMMM d yyyy', '%B %d %Y')})")

    mott_p1 = rx("trim(coalesce(mt.period_raw, ''))", mott_range, 1)
    mott_p2 = rx("trim(coalesce(mt.period_raw, ''))", mott_range, 2)
    mott_bare_year = rx("coalesce(mt.period_raw, '')",
                        "(19[0-9]{2}|20[0-9]{2})", 1)
    mott_start = (
        f"CASE WHEN {mott_p1} IS NOT NULL THEN {mott_d(f'trim({mott_p1})')} "
        f"WHEN {mott_d('trim(coalesce(mt.period_raw, ' + chr(39) + chr(39) + '))')} IS NOT NULL "
        f"THEN {mott_d('trim(coalesce(mt.period_raw, ' + chr(39) + chr(39) + '))')} "
        f"WHEN {mott_bare_year} IS NOT NULL "
        f"THEN concat({mott_bare_year}, '-01-01') END")
    mott_end = (f"CASE WHEN {mott_p2} IS NOT NULL "
                f"THEN {mott_d(f'trim({mott_p2})')} END")
    mott_og = ("regexp_replace(coalesce(mt.og_raw, ''), "
               "'\\\\s*\\\\|\\\\s*Mott Foundation\\\\s*$', ''" + g + ")")
    mott_first_seg = f"trim({elem(f'split({mott_og}, ,COMMA,)', '1')})"
    mott_first_seg = mott_first_seg.replace(",COMMA,", "','")
    mott_amt = amt_usd("mt.amount_raw")

    mott = f"""
mt_raw AS (
  SELECT o_orderkey AS k,
    concat('20', lpad({cs('o_orderkey % 27')}, 2, '0'), '-',
           {cs('o_orderkey + 10000')}) AS slug,
    concat('Bridge programme phase ', {ks}) AS title,
    CASE WHEN o_orderkey % 9 = 0 THEN NULL
      WHEN o_orderkey % 9 = 1
        THEN concat('Bridge programme phase ', {ks},
                    ', Env Watch, 2026-', {ks}, ' | Mott Foundation')
      ELSE concat('Recipient Org ', {cs('o_orderkey % 250')},
                  ', Env Watch, 2026-', {ks}, ' | Mott Foundation') END
      AS og_raw,
    CASE WHEN o_orderkey % 3 = 0 THEN NULL
      ELSE concat('Environment ', {cs('o_orderkey % 4')}) END AS program,
    CASE WHEN o_orderkey % 4 = 0 THEN NULL
      ELSE concat('One Water ', {cs('o_orderkey % 3')}) END AS initiative,
    CASE CAST(o_orderkey % 4 AS INT) WHEN 0 THEN NULL
      WHEN 1 THEN concat('$', {cs('o_orderkey % 800 + 100')}, ',000')
      WHEN 2 THEN '$12,500.50' ELSE 'undisclosed' END AS amount_raw,
    CASE CAST(o_orderkey % 5 AS INT)
      WHEN 0 THEN NULL
      WHEN 1 THEN concat('June 1, 202', {cs('o_orderkey % 4')},
                         '–May 31, 202', {cs('o_orderkey % 4 + 2')})
      WHEN 2 THEN concat('June 1, 202', {cs('o_orderkey % 4')})
      WHEN 3 THEN concat('FY 201', {cs('o_orderkey % 9')})
      ELSE 'TBD' END AS period_raw,
    CASE WHEN o_orderkey % 3 = 0 THEN NULL
      ELSE 'Detroit, MI, United States' END AS location,
    CASE WHEN o_orderkey % 4 = 0 THEN NULL ELSE 'Michigan' END AS geo,
    CASE WHEN o_orderkey % 2 = 0 THEN NULL
      ELSE concat('Supports water infrastructure ', {ks}) END AS desc_ld,
    CASE WHEN o_orderkey % 3 = 0 THEN NULL
      ELSE concat('OG summary of grant ', {ks}) END AS desc_og
  FROM orders
),
{bar("mt_parsed", "mt_raw",
     ["k", "slug", "title", "program", "initiative", "amount_raw",
      "period_raw", "location", "geo", "desc_ld", "desc_og"], [
    ("recipient",
     f"CASE WHEN mt.og_raw IS NOT NULL AND {mott_first_seg} <> '' "
     f"AND {mott_first_seg} <> mt.title THEN {mott_first_seg} END"
     .replace("mt.", "")),
    ("amount", cs(mott_amt).replace("mt.", "")),
    ("start_date", mott_start.replace("mt.", "")),
    ("end_date", mott_end.replace("mt.", "")),
])},
mt_out AS (
  SELECT 'mott' AS member, concat('mott-', slug) AS funder_award_id,
    slug, title, {nullcols('display_name')}, recipient,
    {nullcols('pi_raw', 'given_name', 'family_name', 'credentials',
              'institution', 'grantee_org', 'prize_name')},
    program, initiative,
    {nullcols('funding_program', 'focus_areas', 'topics', 'subject',
              'reference_number', 'grant_administrator',
              'fellowship_program')},
    amount, amount_raw, 'USD' AS currency, period_raw,
    {nullcols('date_raw', 'award_date')},
    start_date, end_date, substr(start_date, 1, 4) AS start_year,
    {nullcols('end_year', 'award_year', 'term')},
    location, geo AS geographic_focus, {nullcols('project_title',
    'biography')},
    coalesce(desc_ld, desc_og) AS description,
    {nullcols('copi_given_name', 'copi_family_name', 'copi_org',
              'name_slug', 'native_grant_id')},
    concat('https://www.mott.org/grants/', slug, '/') AS landing_page_url
  FROM mt_parsed
)"""

    # ---- helmsley ---------------------------------------------------------
    hm_dot = rx("hm.date_raw", "^([0-9]{2})\\\\.([0-9]{2})\\\\.([0-9]{4})$", 0)
    hm_iso = (
        f"CASE WHEN hm.date_raw IS NULL THEN NULL "
        f"WHEN {rl('trim(hm.date_raw)', '^[0-9]{2}[.][0-9]{2}[.][0-9]{4}$')} "
        f"THEN concat(substr(trim(hm.date_raw), 7, 4), '-', "
        f"substr(trim(hm.date_raw), 1, 2), '-', "
        f"substr(trim(hm.date_raw), 4, 2)) "
        f"WHEN {rl('trim(hm.date_raw)', '^[0-9]{1,2}/[0-9]{1,2}/[0-9]{4}$')} "
        f"THEN concat("
        f"{rx('trim(hm.date_raw)', '^[0-9]{1,2}/[0-9]{1,2}/([0-9]{4})$', 1)},"
        f" '-', lpad({rx('trim(hm.date_raw)', '^([0-9]{1,2})/', 1)}, 2, '0'),"
        f" '-', lpad({rx('trim(hm.date_raw)', '^[0-9]{1,2}/([0-9]{1,2})/', 1)}, 2, '0')) "
        f"WHEN {rx('trim(hm.date_raw)', '(19[0-9]{2}|20[0-9]{2})', 1)} "
        f"IS NOT NULL THEN concat("
        f"{rx('trim(hm.date_raw)', '(19[0-9]{2}|20[0-9]{2})', 1)}, "
        f"'-01-01') END")
    hm_amt = amt_usd("hm.amount_raw")

    helmsley = f"""
hm_raw AS (
  SELECT o_orderkey AS k,
    concat('org-', {cs('o_orderkey % 260')}, '-',
           {cs('o_orderkey + 2000')}) AS slug,
    concat('Organisation ', {cs('o_orderkey % 260')}) AS recipient,
    CASE CAST(o_orderkey % 5 AS INT)
      WHEN 0 THEN NULL
      WHEN 1 THEN concat('0', {cs('o_orderkey % 9 + 1')}, '.3',
                         {cs('o_orderkey % 2')}, '.201',
                         {cs('o_orderkey % 9')})
      WHEN 2 THEN concat({cs('o_orderkey % 9 + 1')}, '/',
                         {cs('o_orderkey % 28 + 1')}, '/202',
                         {cs('o_orderkey % 4')})
      WHEN 3 THEN concat('around 201', {cs('o_orderkey % 9')})
      ELSE 'n/a' END AS date_raw,
    CASE WHEN o_orderkey % 3 = 0 THEN NULL
      ELSE concat('Health Sciences ', {cs('o_orderkey % 5')}) END
      AS program,
    CASE CAST(o_orderkey % 4 AS INT) WHEN 0 THEN NULL
      WHEN 1 THEN concat('$', {cs('o_orderkey % 900 + 100')}, ',000.00')
      WHEN 2 THEN '$9,761,000.00' ELSE 'n/a' END AS amount_raw,
    CASE WHEN o_orderkey % 2 = 0 THEN NULL
      ELSE concat({cs('o_orderkey % 48 + 6')}, ' months') END AS term,
    CASE WHEN o_orderkey % 7 = 0 THEN NULL
      ELSE concat('to support project ', {ks}) END AS project_title
  FROM orders
),
{bar("hm_parsed", "hm_raw",
     ["k", "slug", "recipient", "date_raw", "program", "amount_raw",
      "term", "project_title"], [
    ("award_date", hm_iso.replace("hm.", "")),
    ("amount", cs(hm_amt).replace("hm.", "")),
])},
hm_out AS (
  SELECT 'helmsley' AS member, concat('helmsley-', slug)
      AS funder_award_id,
    slug, {nullcols('title')},
    coalesce(project_title, recipient) AS display_name, recipient,
    {nullcols('pi_raw', 'given_name', 'family_name', 'credentials',
              'institution', 'grantee_org', 'prize_name')},
    program, {nullcols('initiative', 'funding_program', 'focus_areas',
                       'topics', 'subject', 'reference_number',
                       'grant_administrator', 'fellowship_program')},
    amount, amount_raw, 'USD' AS currency,
    {nullcols('period_raw')}, date_raw, award_date,
    {nullcols('start_date', 'end_date', 'start_year', 'end_year')},
    substr(award_date, 1, 4) AS award_year, term,
    {nullcols('location', 'geographic_focus')}, project_title,
    {nullcols('biography', 'description', 'copi_given_name',
              'copi_family_name', 'copi_org', 'name_slug')},
    {rx('slug', '-([0-9]+)$', 1)} AS native_grant_id,
    concat('https://helmsleytrust.org/grants/', slug, '/')
      AS landing_page_url
  FROM hm_parsed
)"""

    # ---- fritz_thyssen ------------------------------------------------------
    ft_given, ft_family = split_name("pi_raw", _SUFFIX_A, both_ends=True)
    if dialect == "spark":
        ft_parts = ("filter(ft.parts_raw, x -> x IS NOT NULL "
                    "AND lower(x) <> 'institution')")
    else:
        ft_parts = ("list_filter(ft.parts_raw, x -> x IS NOT NULL "
                    "AND lower(x) <> 'institution')")
    ft_name_pool = (f"CASE CAST(o_orderkey % 4 AS INT) "
                    f"WHEN 0 THEN concat('Prof. Dr. Anna Weber',"
                    f" {cs('o_orderkey % 140')}) "
                    f"WHEN 1 THEN concat('Dr. Hans Mueller-Ludenscheidt',"
                    f" {cs('o_orderkey % 140')}) "
                    f"WHEN 2 THEN concat('Greta', {cs('o_orderkey % 140')}) "
                    f"ELSE concat('Jonas Becker', {cs('o_orderkey % 140')},"
                    f" ' PhD') END")
    if dialect == "spark":
        ft_parts_fixture = (
            f"filter(array(CASE WHEN o_orderkey % 4 = 0 THEN 'Institution' "
            f"END, {ft_name_pool}, CASE WHEN o_orderkey % 3 <> 0 THEN "
            f"concat('Universität ', {cs('o_orderkey % 70')}) END), "
            f"x -> x IS NOT NULL)")
    else:
        ft_parts_fixture = (
            f"list_filter([CASE WHEN o_orderkey % 4 = 0 THEN 'Institution' "
            f"END, {ft_name_pool}, CASE WHEN o_orderkey % 3 <> 0 THEN "
            f"concat('Universität ', {cs('o_orderkey % 70')}) END], "
            f"x -> x IS NOT NULL)")

    fritz = f"""
ft_raw AS (
  SELECT o_orderkey AS k,
    concat('funding-', {ks}) AS slug,
    CASE WHEN o_orderkey % 7 = 0 THEN NULL
      ELSE concat('Projektfoerderung ', {ks}) END AS h1_raw,
    CASE WHEN o_orderkey % 3 = 0 THEN NULL
      ELSE concat('OG Projekt ', {ks}) END AS og_raw,
    {ft_parts_fixture} AS parts_raw,
    CASE WHEN o_orderkey % 4 = 0 THEN NULL
      ELSE concat('Bewilligung | 20', lpad({cs('o_orderkey % 26')}, 2,
                  '0')) END AS bew_raw,
    CASE WHEN o_orderkey % 3 = 0 THEN NULL
      ELSE concat('Foerderbereich | Geschichte, Sprache & Kultur ',
                  {cs('o_orderkey % 6')}) END AS foerder_raw
  FROM orders
),
ft_titled AS (
  SELECT *, coalesce(nullif(trim(coalesce(h1_raw, '')), ''),
                     nullif(trim(coalesce(og_raw, '')), '')) AS title,
    {ft_parts.replace('ft.', '')} AS parts
  FROM ft_raw
),
{bar("ft_parsed", "ft_titled", ["k", "slug", "title", "bew_raw",
                                "foerder_raw"], [
    ("pi_raw", elem("parts", "1")),
    ("institution", elem("parts", "2")),
])},
{bar("ft_named", "ft_parsed",
     ["k", "slug", "title", "bew_raw", "foerder_raw", "pi_raw",
      "institution"], [
    ("given_name", ft_given), ("family_name", ft_family),
])},
ft_out AS (
  SELECT 'fritz_thyssen' AS member, concat('ft-', slug)
      AS funder_award_id,
    slug, title, {nullcols('display_name', 'recipient')},
    pi_raw, given_name, family_name, {nullcols('credentials')},
    institution, {nullcols('grantee_org', 'prize_name', 'program',
                           'initiative')},
    CASE WHEN foerder_raw IS NOT NULL AND instr(foerder_raw, '|') > 0
         THEN nullif(trim(substr(foerder_raw,
                                 instr(foerder_raw, '|') + 1)), '') END
      AS funding_program,
    {nullcols('focus_areas', 'topics', 'subject', 'reference_number',
              'grant_administrator', 'fellowship_program', 'amount',
              'amount_raw', 'currency', 'period_raw', 'date_raw',
              'award_date', 'start_date', 'end_date', 'start_year',
              'end_year')},
    CASE WHEN bew_raw IS NOT NULL
         THEN {rx('bew_raw', '([0-9]{4})', 1)} END AS award_year,
    {nullcols('term', 'location', 'geographic_focus', 'project_title',
              'biography', 'description', 'copi_given_name',
              'copi_family_name', 'copi_org', 'name_slug',
              'native_grant_id')},
    concat('https://www.fritz-thyssen-stiftung.de/fundings/', slug, '/')
      AS landing_page_url
  FROM ft_named WHERE title IS NOT NULL
)"""

    # ---- mercator ------------------------------------------------------------
    me_given, me_family = split_name("fellow_name", _SUFFIX_B,
                                     both_ends=False)
    me_period = ("([A-Za-z]+)\\\\s+([0-9]{4})\\\\s*[-–to]+\\\\s*"
                 "([A-Za-z]+)?\\\\s*([0-9]{4})?")
    me_m1 = month_no(rx("coalesce(me.period_raw, '')", me_period, 1))
    me_y1 = rx("coalesce(me.period_raw, '')", me_period, 2)
    me_m2 = month_no(rx("coalesce(me.period_raw, '')", me_period, 3))
    me_y2 = rx("coalesce(me.period_raw, '')", me_period, 4)
    me_bare = rx("coalesce(me.period_raw, '')",
                 "\\\\b(19[0-9]{2}|20[0-9]{2})\\\\b", 1)
    me_matched = rl("coalesce(me.period_raw, '')", me_period)
    me_start = (
        f"CASE WHEN {me_matched} THEN "
        f"CASE WHEN {me_m1} IS NOT NULL AND {me_m1} > 0 "
        f"AND {me_y1} IS NOT NULL THEN concat({me_y1}, '-', "
        f"lpad({cs(me_m1)}, 2, '0'), '-01') "
        f"WHEN {me_y1} IS NOT NULL THEN concat({me_y1}, '-01-01') END "
        f"WHEN {me_bare} IS NOT NULL THEN concat({me_bare}, '-01-01') END")
    me_end = (
        f"CASE WHEN {me_matched} THEN "
        f"CASE WHEN {me_m2} IS NOT NULL AND {me_m2} > 0 "
        f"AND {me_y2} IS NOT NULL THEN concat({me_y2}, '-', "
        f"lpad({cs(me_m2)}, 2, '0'), '-01') "
        f"WHEN {me_y2} IS NOT NULL THEN concat({me_y2}, '-12-31') END END")
    me_sy = (f"CASE WHEN {me_matched} THEN {me_y1} "
             f"WHEN {me_bare} IS NOT NULL THEN {me_bare} END")
    me_ey = f"CASE WHEN {me_matched} THEN {me_y2} END"

    mercator = f"""
me_raw AS (
  SELECT o_orderkey AS k,
    concat('fellow-', {ks}) AS slug,
    CASE CAST(o_orderkey % 4 AS INT)
      WHEN 0 THEN concat('Ada Lovelace', {cs('o_orderkey % 160')}, ' PhD')
      WHEN 1 THEN concat('Miriam Tal', {cs('o_orderkey % 160')}, ' Jr.')
      WHEN 2 THEN concat('Okonkwo', {cs('o_orderkey % 160')})
      ELSE concat('Leila Haddad', {cs('o_orderkey % 160')}) END
      AS fellow_name,
    CASE WHEN o_orderkey % 5 = 0 THEN NULL
      ELSE concat('Mercator Fellowship ', {cs('o_orderkey % 4')}) END
      AS fellowship_program,
    CASE CAST(o_orderkey % 5 AS INT)
      WHEN 0 THEN NULL
      WHEN 1 THEN concat('October 202', {cs('o_orderkey % 4')},
                         ' - September 202', {cs('o_orderkey % 4 + 1')})
      WHEN 2 THEN concat('January 201', {cs('o_orderkey % 9')},
                         ' - 201', {cs('o_orderkey % 9 + 1')})
      WHEN 3 THEN concat('Spring 202', {cs('o_orderkey % 4')})
      ELSE concat('Octember 202', {cs('o_orderkey % 4')},
                  ' - May 202', {cs('o_orderkey % 4 + 1')}) END
      AS period_raw,
    CASE WHEN o_orderkey % 3 = 0 THEN NULL
      ELSE concat('Transnational governance study ', {ks}) END
      AS project_title,
    CASE WHEN o_orderkey % 2 = 0 THEN NULL
      ELSE concat('Biography of fellow ', {ks}) END AS biography
  FROM orders
),
{bar("me_parsed", "me_raw",
     ["k", "slug", "fellow_name", "fellowship_program", "period_raw",
      "project_title", "biography"], [
    ("start_date", me_start.replace("me.", "")),
    ("end_date", me_end.replace("me.", "")),
    ("start_year", me_sy.replace("me.", "")),
    ("end_year", me_ey.replace("me.", "")),
    ("given_name", me_given), ("family_name", me_family),
])},
me_out AS (
  SELECT 'mercator_fellows' AS member,
    concat('mercator-fellow-', slug) AS funder_award_id,
    slug, {nullcols('title', 'display_name')},
    fellow_name AS recipient, fellow_name AS pi_raw,
    given_name, family_name,
    {nullcols('credentials', 'institution', 'grantee_org',
              'prize_name', 'program', 'initiative', 'funding_program',
              'focus_areas', 'topics', 'subject', 'reference_number',
              'grant_administrator')},
    fellowship_program,
    {nullcols('amount', 'amount_raw', 'currency')}, period_raw,
    {nullcols('date_raw', 'award_date')}, start_date, end_date,
    start_year, end_year, {nullcols('award_year', 'term', 'location',
    'geographic_focus')},
    project_title, biography,
    coalesce(biography, project_title) AS description,
    {nullcols('copi_given_name', 'copi_family_name', 'copi_org',
              'name_slug', 'native_grant_id')},
    concat('https://www.stiftung-mercator.de/en/fellows/', slug, '/')
      AS landing_page_url
  FROM me_parsed
)"""

    # ---- novo_nordisk_fonden ------------------------------------------------
    nv_given, nv_family = split_name("name", _SUFFIX_A, both_ends=True)
    nv_prize_pat = "^\\\\s*([^0-9\\\\n]+?)\\\\s*[-–]?\\\\s*([0-9]{4})\\\\s*$"
    nv_seg_head = rx("t", nv_prize_pat, 1)
    nv_seg_cond = (
        f"{rl('t', nv_prize_pat)} AND length(trim({nv_seg_head})) > 3 "
        f"AND NOT contains(lower({nv_seg_head}), lower(name))"
        if dialect == "spark" else
        f"{rl('t', nv_prize_pat)} AND length(trim({nv_seg_head})) > 3 "
        f"AND NOT contains(lower({nv_seg_head}), lower(name))")
    nv_hits = arr_filter("segs", nv_seg_cond)
    nv_letter1 = "substr('ABCDEFGHIJKLMNOPQRSTUVWXYZ', CAST(o_orderkey % 26 AS INT) + 1, 1)"
    nv_letter2 = ("substr('ABCDEFGHIJKLMNOPQRSTUVWXYZ', "
                  "CAST(CAST(floor(o_orderkey / 26.0) AS INT) % 26 AS INT)"
                  " + 1, 1)")

    if dialect == "spark":
        nv_segs_fixture = (
            f"filter(array(name, cred_raw, CASE CAST(k % 5 AS INT) "
            f"WHEN 0 THEN concat('Novo Nordisk Prisen - 20', "
            f"lpad({cs('k % 26')}, 2, '0')) "
            f"WHEN 1 THEN concat('Marie og August Krogh Prisen 20', "
            f"lpad({cs('k % 26')}, 2, '0')) "
            f"WHEN 2 THEN concat(name, ' 2012') "
            f"WHEN 3 THEN 'NN - 2020' ELSE NULL END), "
            f"x -> x IS NOT NULL)")
    else:
        nv_segs_fixture = (
            f"list_filter([name, cred_raw, CASE CAST(k % 5 AS INT) "
            f"WHEN 0 THEN concat('Novo Nordisk Prisen - 20', "
            f"lpad({cs('k % 26')}, 2, '0')) "
            f"WHEN 1 THEN concat('Marie og August Krogh Prisen 20', "
            f"lpad({cs('k % 26')}, 2, '0')) "
            f"WHEN 2 THEN concat(name, ' 2012') "
            f"WHEN 3 THEN 'NN - 2020' ELSE NULL END], "
            f"x -> x IS NOT NULL)")

    novo = f"""
nv_raw AS (
  SELECT o_orderkey AS k,
    concat('Erik ', {nv_letter1}, '. Richter', {nv_letter2})
      AS name,
    CASE CAST(o_orderkey % 4 AS INT)
      WHEN 0 THEN NULL
      WHEN 1 THEN concat('Professor of Physiology ',
                         {cs('o_orderkey % 9')})
      WHEN 2 THEN 'Novo Nordisk Fonden info desk'
      ELSE concat('Head of Metabolic Research Unit number ',
                  {cs('o_orderkey % 9')}) END AS cred_candidate,
    CASE WHEN o_orderkey % 2 = 0
      THEN concat('erik-richter-', {ks}, '-20',
                  lpad({cs('o_orderkey % 26')}, 2, '0'))
      ELSE concat('erik-richter-', {ks}) END AS slug
  FROM orders
),
nv_gated AS (
  SELECT *, CASE WHEN cred_candidate IS NULL THEN NULL
    WHEN length(cred_candidate) > 200 THEN NULL
    WHEN contains(lower(cred_candidate), 'fonden')
      OR contains(lower(cred_candidate), 'footer')
      OR contains(lower(cred_candidate), 'info') THEN NULL
    ELSE cred_candidate END AS cred_raw
  FROM nv_raw
),
nv_segged AS (
  SELECT *, {nv_segs_fixture} AS segs FROM nv_gated
),
{bar("nv_parsed", "nv_segged", ["k", "name", "cred_raw", "slug"], [
    ("prize_name", f"trim({rx(elem(nv_hits, '1'), nv_prize_pat, 1)})"),
    ("prize_year", rx(elem(nv_hits, "1"), nv_prize_pat, 2)),
    ("slug_year", rx("slug", "-([0-9]{4})$", 1)),
    ("given_name", nv_given), ("family_name", nv_family),
])},
nv_out AS (
  SELECT 'novo_nordisk_fonden' AS member,
    concat('nnf-', slug) AS funder_award_id,
    slug, {nullcols('title', 'display_name')}, name AS recipient,
    name AS pi_raw, given_name, family_name, cred_raw AS credentials,
    {nullcols('institution', 'grantee_org')}, prize_name,
    {nullcols('program', 'initiative', 'funding_program', 'focus_areas',
              'topics', 'subject', 'reference_number',
              'grant_administrator', 'fellowship_program', 'amount',
              'amount_raw', 'currency', 'period_raw', 'date_raw',
              'award_date', 'start_date', 'end_date', 'start_year',
              'end_year')},
    coalesce(prize_year, slug_year) AS award_year,
    {nullcols('term', 'location', 'geographic_focus', 'project_title',
              'biography', 'description', 'copi_given_name',
              'copi_family_name', 'copi_org')},
    regexp_replace(slug, '-[0-9]{{4}}$', ''{g}) AS name_slug,
    {nullcols('native_grant_id')},
    concat('https://novonordiskfonden.dk/prismodtagere/', slug, '/')
      AS landing_page_url
  FROM nv_parsed
)"""

    # ---- rj_jubileumsfond ------------------------------------------------------
    rj_given, rj_family = split_name("pi_raw", _SUFFIX_A, both_ends=True)
    rj_amt_num = rx("coalesce(rj.amount_raw, '')",
                    "([0-9][0-9,\\\\s]*)", 1)
    rj_amt = (f"try_cast(replace(replace({rj_amt_num}, ',', ''), ' ', '') "
              f"AS DOUBLE)")
    rj_paras_cond = ("length(t) > 100 AND NOT contains(lower(t), "
                     "'request funds') AND NOT contains(lower(t), "
                     "'rj research initiation')")

    rj = f"""
rj_raw AS (
  SELECT o_orderkey AS k,
    concat('grant-', {ks}) AS slug,
    {cs('o_orderkey % 10 + 2015')} AS url_year,
    concat('Historiska studier av ', {ks}) AS title,
    CASE CAST(o_orderkey % 4 AS INT)
      WHEN 0 THEN NULL
      WHEN 1 THEN 'Final report'
      WHEN 2 THEN concat('Prof. Ingrid Svensson', {cs('o_orderkey % 170')})
      ELSE concat('Dr. Olof Palme', {cs('o_orderkey % 170')}, ' Berg')
      END AS pi_candidate,
    CASE WHEN o_orderkey % 3 = 0 THEN NULL
      ELSE concat('P2', {cs('o_orderkey % 10')}, '-0',
                  {cs('o_orderkey % 900 + 100')}) END AS reference_number,
    CASE CAST(o_orderkey % 4 AS INT) WHEN 0 THEN NULL
      WHEN 1 THEN concat('SEK ', {cs('o_orderkey % 900 + 100')}, ',000')
      WHEN 2 THEN concat('1 ', {cs('o_orderkey % 900 + 100')}, ' 000 kr')
      ELSE 'ej angivet' END AS amount_raw,
    CASE WHEN o_orderkey % 3 = 0 THEN NULL
      ELSE concat('RJ Projekt ', {cs('o_orderkey % 4')}) END
      AS funding_program,
    CASE WHEN o_orderkey % 2 = 0 THEN NULL
      ELSE concat('Historia ', {cs('o_orderkey % 5')}) END AS subject,
    CASE CAST(o_orderkey % 3 AS INT) WHEN 0 THEN NULL
      WHEN 1 THEN {cs('o_orderkey % 10 + 2014')} ELSE 'MMXXI' END
      AS year_field,
    {("filter(array(" if dialect == "spark" else "list_filter([")}
      concat('This project investigates the long-run institutional ',
             'development of Scandinavian archives and their role in ',
             'public memory, case ', {ks}),
      'Short note',
      concat('Applicants may request funds for networks; this ',
             'boilerplate paragraph about how to request funds from ',
             'the foundation repeats on every grant page verbatim.'),
      CASE WHEN o_orderkey % 2 = 0 THEN
        concat('A second substantive paragraph describing methods and ',
               'the archival corpus assembled for the study, variant ',
               {cs('o_orderkey % 7')},
               ', padded to exceed the length gate easily.') END
    {(" ), x -> x IS NOT NULL)" if dialect == "spark"
      else "], x -> x IS NOT NULL)")} AS paras
  FROM orders
),
rj_gated AS (
  SELECT *, CASE WHEN pi_candidate IS NOT NULL
      AND length(pi_candidate) <= 80
      AND NOT {rl('pi_candidate', '^(Final report|Slutredovisning|Bidragsförvaltare)$')}
    THEN pi_candidate END AS pi_raw
  FROM rj_raw
),
{bar("rj_parsed", "rj_gated",
     ["k", "slug", "url_year", "title", "pi_raw", "reference_number",
      "amount_raw", "funding_program", "subject", "year_field"], [
    ("amount", cs(rj_amt).replace("rj.", "")),
    ("description",
     f"substr({arr_join(arr_filter('paras', rj_paras_cond), ' ')}, "
     f"1, 5000)"),
    ("given_name", rj_given), ("family_name", rj_family),
])},
rj_out AS (
  SELECT 'rj_jubileumsfond' AS member,
    CASE WHEN reference_number IS NOT NULL
         AND trim(reference_number) <> ''
      THEN concat('rj-', {slugify('reference_number')}, '-', slug)
      ELSE concat('rj-', slug) END AS funder_award_id,
    slug, title, {nullcols('display_name', 'recipient')},
    pi_raw, given_name, family_name,
    {nullcols('credentials', 'institution', 'grantee_org',
              'prize_name', 'program', 'initiative')},
    funding_program, {nullcols('focus_areas', 'topics')}, subject,
    reference_number, {nullcols('grant_administrator',
                                'fellowship_program')},
    amount, amount_raw,
    CASE WHEN amount IS NOT NULL THEN 'SEK' END AS currency,
    {nullcols('period_raw', 'date_raw', 'award_date', 'start_date',
              'end_date', 'start_year', 'end_year')},
    CASE WHEN year_field IS NOT NULL
         AND {rl('year_field', '^[0-9]+$')} THEN year_field
         ELSE {cs('url_year')} END AS award_year,
    {nullcols('term', 'location', 'geographic_focus', 'project_title',
              'biography')},
    description,
    {nullcols('copi_given_name', 'copi_family_name', 'copi_org',
              'name_slug', 'native_grant_id')},
    concat('https://www.rj.se/en/grants/', {cs('url_year')}, '/', slug,
           '/') AS landing_page_url
  FROM rj_parsed
)"""

    # ---- wt_grant -----------------------------------------------------------------
    wt_given, wt_family = split_name("pi_name", _SUFFIX_B, both_ends=False)
    wt_cg, wt_cf = split_name("copi_name", _SUFFIX_B, both_ends=False)
    wt_period = ("([A-Za-z]+)\\\\s+([0-9]{4})\\\\s*[–—-]\\\\s*"
                 "([A-Za-z]+)\\\\s+([0-9]{4})")
    wt_sy = rx("coalesce(wt.period_raw, '')", wt_period, 2)
    wt_ey = rx("coalesce(wt.period_raw, '')", wt_period, 4)
    wt_bare = rx("coalesce(wt.period_raw, '')",
                 "\\\\b(19[0-9]{2}|20[0-9]{2})\\\\b", 1)
    wt_amt = amt_usd("wt.amount_raw")
    wt_title = ("nullif(trim(regexp_replace(coalesce(wt.og_title, ''), "
                "'\\\\s*[-–—]\\\\s*William T\\\\. Grant Foundation\\\\s*$',"
                " ''" + g + ")), '')")

    wt = f"""
wt_raw AS (
  SELECT o_orderkey AS k,
    concat('grant-', {ks}) AS slug,
    CASE WHEN o_orderkey % 5 = 0 THEN NULL
      ELSE concat('Reducing inequality study ', {ks},
                  ' - William T. Grant Foundation') END AS og_title,
    CASE WHEN o_orderkey % 7 = 0 THEN NULL
      ELSE concat('H1 fallback title ', {ks}) END AS h1_raw,
    CASE WHEN o_orderkey % 3 = 0 THEN NULL
      ELSE concat('How programs shape outcomes, case ', {ks}) END
      AS og_desc,
    CASE CAST(o_orderkey % 4 AS INT)
      WHEN 0 THEN NULL
      WHEN 1 THEN concat('Vincent Guilamo-Ramos', {cs('o_orderkey % 180')})
      WHEN 2 THEN concat('Mira Chen', {cs('o_orderkey % 180')}, ' PhD')
      ELSE concat('Kofi', {cs('o_orderkey % 180')}) END AS pi_name,
    CASE WHEN o_orderkey % 4 = 0 OR o_orderkey % 5 = 0 THEN NULL
      ELSE concat('University ', {cs('o_orderkey % 75')}) END AS pi_org,
    CASE WHEN o_orderkey % 6 = 0
      THEN concat('Dana Suskind', {cs('o_orderkey % 180')}, ' MD') END
      AS copi_name,
    CASE WHEN o_orderkey % 6 = 0
      THEN concat('Co-Org ', {cs('o_orderkey % 75')}) END AS copi_org,
    CASE WHEN o_orderkey % 4 = 0
      THEN concat('Grantee Org ', {cs('o_orderkey % 75')}) END
      AS grantee_org_only,
    CASE WHEN o_orderkey % 3 = 0 THEN NULL
      ELSE concat('Research Grants on Reducing Inequality ',
                  {cs('o_orderkey % 3')}) END AS program,
    CASE WHEN o_orderkey % 2 = 0 THEN NULL
      ELSE concat('Focus ', {cs('o_orderkey % 4')}) END AS focus_areas,
    CASE WHEN o_orderkey % 3 = 0 THEN NULL
      ELSE concat('Topic ', {cs('o_orderkey % 5')}) END AS topics,
    CASE CAST(o_orderkey % 4 AS INT) WHEN 0 THEN NULL
      WHEN 1 THEN concat('$', {cs('o_orderkey % 500 + 100')}, ',000')
      WHEN 2 THEN '$49,982.25' ELSE 'n/a' END AS amount_raw,
    CASE CAST(o_orderkey % 4 AS INT)
      WHEN 0 THEN NULL
      WHEN 1 THEN concat('January 200', {cs('o_orderkey % 9')},
                         ' – December 200', {cs('o_orderkey % 9')})
      WHEN 2 THEN concat('20', lpad({cs('o_orderkey % 26')}, 2, '0'))
      ELSE 'TBD' END AS period_raw
  FROM orders
),
wt_titled AS (
  SELECT *, coalesce({wt_title.replace('wt.', '')},
                     nullif(trim(coalesce(h1_raw, '')), '')) AS title
  FROM wt_raw
),
{bar("wt_parsed", "wt_titled",
     ["k", "slug", "title", "og_desc", "pi_name", "pi_org", "copi_name",
      "copi_org", "grantee_org_only", "program", "focus_areas", "topics",
      "amount_raw", "period_raw"], [
    ("amount", cs(wt_amt).replace("wt.", "")),
    ("start_year",
     f"coalesce({wt_sy.replace('wt.', '')}, {wt_bare.replace('wt.', '')})"),
    ("end_year", wt_ey.replace("wt.", "")),
    ("given_name",
     f"CASE WHEN pi_name IS NOT NULL THEN {wt_given} END"),
    ("family_name",
     f"CASE WHEN pi_name IS NOT NULL THEN {wt_family} END"),
    ("copi_given_name",
     f"CASE WHEN copi_name IS NOT NULL THEN {wt_cg} END"),
    ("copi_family_name",
     f"CASE WHEN copi_name IS NOT NULL THEN {wt_cf} END"),
])},
wt_out AS (
  SELECT 'wt_grant' AS member, slug AS funder_award_id,
    slug, title, {nullcols('display_name', 'recipient')},
    pi_name AS pi_raw, given_name, family_name,
    {nullcols('credentials', 'institution')},
    coalesce(pi_org, grantee_org_only) AS grantee_org,
    {nullcols('prize_name')}, program, {nullcols('initiative',
    'funding_program')},
    focus_areas, topics, {nullcols('subject', 'reference_number',
    'grant_administrator', 'fellowship_program')},
    amount, amount_raw,
    CASE WHEN amount IS NOT NULL THEN 'USD' END AS currency,
    period_raw, {nullcols('date_raw', 'award_date', 'start_date',
    'end_date')},
    start_year, end_year, {nullcols('award_year', 'term', 'location',
    'geographic_focus', 'project_title', 'biography')},
    og_desc AS description,
    copi_given_name, copi_family_name, copi_org,
    {nullcols('name_slug', 'native_grant_id')},
    concat('https://wtgrantfoundation.org/grants/', slug, '/')
      AS landing_page_url
  FROM wt_parsed WHERE title IS NOT NULL
)"""

    return f"""
WITH {mott},{helmsley},{fritz},{mercator},{novo},{rj},{wt}
SELECT {_COLS} FROM mt_out
UNION ALL SELECT {_COLS} FROM hm_out
UNION ALL SELECT {_COLS} FROM ft_out
UNION ALL SELECT {_COLS} FROM me_out
UNION ALL SELECT {_COLS} FROM nv_out
UNION ALL SELECT {_COLS} FROM rj_out
UNION ALL SELECT {_COLS} FROM wt_out
"""


def _build(dialect: str) -> str:
    text = _sql(dialect)
    if dialect == "duck":
        text = text.replace("\\\\", "\\")
        text = text.replace("AS STRING", "AS VARCHAR")
    return text


@register(
    "method5_parse_awards",
    oracle=_build("duck"),
    tags=("domain", "awards", "scrape"),
    tables=("orders",),
    doc=("Method-5 static-HTML scraper family (scripts/local/{mott,"
         "helmsley,fritz_thyssen,mercator_fellows,novo_nordisk_fonden,"
         "rj_jubileumsfond,wt_grant}_to_s3.py)"),
)
def method5_parse_awards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seven method-5 publishers in one union plan (module docstring
    has the per-member semantics map).  Seven scan arms behind Generate
    barriers; slugs are unique by construction (the references RAISE on
    collision) so there is no dedup and no shuffle at all."""
    return spark.sql(_build("spark"))
