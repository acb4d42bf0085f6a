"""Fellowship-directory parse pair
(scripts/local/guggenheim_to_s3.py, scripts/local/radcliffe_to_s3.py
— 2 scripts, the method-5 fellows-listing skeleton).

Both scrape a fellows directory (pagination/card regexes = seam; the
fixture delivers the extracted slug/name/year card fields) and share
the PARTICLE-AWARE name split (guggenheim_to_s3.py:219-236 /
radcliffe_to_s3.py:248-265): the usual tail suffix pop (phd/md/jr/…,
lowercased and ','/'.'-stripped), then the family start walks LEFT
while the preceding token is one of the 23 name particles (von, van,
der, de, del, della, di, da, dos, das, le, la, du, do, ten, ter, zu,
af, al, bin, ibn, st, st.) and at least one given token remains — so
'Ludwig van der Rohe' splits ('Ludwig', 'van der Rohe').  Ported
compute per member:

* **guggenheim** (:165-262): card fields = slug/name/year, the name
  HTML-unescaped; slug+name required; funder_award_id = slug; year
  int-coerced with a junk-to-NULL try; landing
  'https://www.gf.org/fellows/{slug}/'; directory pages dedup per
  slug (the fixture keys slugs uniquely — validate RAISES on
  collision);
* **radcliffe** (:178-288): per-cohort pagination dedups on
  (slug, cohort year) with keep-first (exercised by the fixture);
  funder_award_id = '{slug}-{year}' when a year exists else the bare
  slug; landing 'https://www.radcliffe.harvard.edu/people/{slug}'.

Both stringify all columns.  Plan: 2 scan arms behind Generate
barriers + the radcliffe (slug, year) keep-first window.  No Python.

tests/test_template_fidelity.py re-derives both members.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openalex_walden_spark.queries.registry import register

_SUFFIXES = "'phd','md','dphil','dsc','scd','jr','sr','ii','iii','iv'"
_PARTICLES = ("'von','van','der','den','de','del','della','di','da',"
              "'dos','das','le','la','du','do','ten','ter','zu','af',"
              "'al','bin','ibn','st','st.'")


def _helpers(dialect: str):
    if dialect == "spark":
        g, stype = "", "STRING"
        asize = "size"

        def elem(a: str, i: str) -> str:
            return f"try_element_at({a}, {i})"

        def idxs(arr: str, cond: str, agg: str) -> str:
            return (f"{agg}(zip_with({arr}, sequence(1, size({arr})), "
                    f"(t, i) -> CASE WHEN {cond} THEN i END))")

        def joinr(a: str, lo: str, hi: str) -> str:
            return f"array_join(slice({a}, {lo}, ({hi}) - ({lo}) + 1), ' ')"
    else:
        g, stype = ", 'g'", "VARCHAR"
        asize = "len"

        def elem(a: str, i: str) -> str:
            return f"{a}[{i}]"

        def idxs(arr: str, cond: str, agg: str) -> str:
            agg = {"array_min": "list_min", "array_max": "list_max"}[agg]
            return (f"{agg}(list_transform({arr}, (t, i) -> "
                    f"CASE WHEN {cond} THEN i END))")

        def joinr(a: str, lo: str, hi: str) -> str:
            return (f"list_aggr(list_slice({a}, {lo}, {hi}), "
                    f"'string_agg', ' ')")

    def particle_split(raw: str):
        """suffix pop + leftward particle walk -> (given, family)."""
        if dialect == "spark":
            toks = (f"filter(split(coalesce({raw}, ''), ' +'), "
                    f"x -> x <> '')")
        else:
            toks = (f"list_filter(regexp_split_to_array(coalesce({raw}, "
                    f"''), ' +'), x -> x <> '')")
        tok_norm = "lower(trim(BOTH '.,' FROM t))"
        last = (f"coalesce({idxs(f'({toks})', f'{tok_norm} NOT IN ({_SUFFIXES})', 'array_max')}, 0)")
        # fam_start: walk left from `last` while the PRECEDING token is
        # a particle and at least one given token remains — i.e. the
        # SMALLEST j in [2, last] such that tokens j..last-1 are all
        # particles (contiguity enforced by taking the largest
        # non-particle boundary below last)
        part_cond = f"lower(t) NOT IN ({_PARTICLES})"
        last_nonparticle_before = idxs(
            f"({toks})",
            f"{part_cond} AND i < ({last}) AND i >= 2", "array_max")
        fam_start = (f"CASE WHEN ({last}) <= 1 THEN ({last}) "
                     f"ELSE greatest(coalesce(({last_nonparticle_before})"
                     f" + 1, 2), 2) END")
        # but if the token directly below `last` is NOT a particle,
        # fam_start stays at `last` (the walk never starts)
        below = elem(f"({toks})", f"({last}) - 1")
        fam_start = (f"CASE WHEN ({last}) <= 1 THEN ({last}) "
                     f"WHEN lower(coalesce({below}, '')) NOT IN "
                     f"({_PARTICLES}) THEN ({last}) "
                     f"ELSE greatest(coalesce(({last_nonparticle_before})"
                     f" + 1, 2), 2) END")
        n_toks = f"{asize}(({toks}))"
        given = (f"CASE WHEN ({last}) >= 2 AND ({fam_start}) >= 2 THEN "
                 f"nullif({joinr(f'({toks})', '1', f'({fam_start}) - 1')},"
                 f" '') END")
        family = (f"CASE WHEN ({last}) >= 1 THEN "
                  f"nullif({joinr(f'({toks})', f'({fam_start})', f'({last})')}, '') END")
        _ = n_toks
        return given, family

    return g, stype, elem, particle_split


def _sql(dialect: str) -> str:
    g, S, elem, particle_split = _helpers(dialect)

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

    ks = cs("o_orderkey")
    gg_given, gg_family = particle_split("name")

    name_pool = f"""CASE CAST(o_orderkey % 6 AS INT)
      WHEN 0 THEN concat('Maya Angelou', {cs('o_orderkey % 190')})
      WHEN 1 THEN concat('Ludwig van der Rohe', {cs('o_orderkey % 190')})
      WHEN 2 THEN concat('Ana de la Cruz', {cs('o_orderkey % 190')},
                         ' PhD')
      WHEN 3 THEN concat('Bj', 'örk', {cs('o_orderkey % 190')})
      WHEN 4 THEN concat('Vincent St. Martin', {cs('o_orderkey % 190')},
                         ' Jr.')
      ELSE concat('Omar al', ' Farsi', {cs('o_orderkey % 190')}) END"""

    return f"""
WITH gg_raw AS (
  SELECT o_orderkey AS k,
    concat('fellow-', {ks}) AS slug,
    {name_pool} AS name,
    CASE WHEN o_orderkey % 9 = 0 THEN NULL
      ELSE CAST(o_orderkey % 90 + 1935 AS INT) END AS year
  FROM orders
),
{bar("gg_named", "gg_raw", ["k", "slug", "name", "year"], [
    ("given_name", gg_given), ("family_name", gg_family),
])},
gg_out AS (
  SELECT 'guggenheim' AS member, slug AS funder_award_id, slug,
    name AS fellow_name, given_name, family_name,
    {cs('year')} AS start_year,
    concat('https://www.gf.org/fellows/', slug, '/')
      AS landing_page_url
  FROM gg_named
),
rc_raw AS (
  SELECT o_orderkey AS k,
    concat('person-', {cs('o_orderkey % 800')}) AS slug,
    {name_pool} AS name,
    CASE WHEN o_orderkey % 7 = 0 THEN NULL
      ELSE CAST(o_orderkey % 25 + 2000 AS INT) END AS year
  FROM orders
),
rc_first AS (
  -- per-cohort (slug, year) keep-first (radcliffe_to_s3.py:206-236)
  SELECT * FROM (
    SELECT *, row_number() OVER (
        PARTITION BY slug, year ORDER BY k) AS rn
    FROM rc_raw
  ) WHERE rn = 1
),
{bar("rc_named", "rc_first", ["k", "slug", "name", "year"], [
    ("given_name", gg_given), ("family_name", gg_family),
])},
rc_out AS (
  SELECT 'radcliffe' AS member,
    CASE WHEN year IS NOT NULL
         THEN concat(slug, '-', {cs('year')}) ELSE slug END
      AS funder_award_id,
    slug, name AS fellow_name, given_name, family_name,
    {cs('year')} AS start_year,
    concat('https://www.radcliffe.harvard.edu/people/', slug)
      AS landing_page_url
  FROM rc_named
)
SELECT member, funder_award_id, slug, fellow_name, given_name,
       family_name, start_year, landing_page_url
FROM gg_out
UNION ALL
SELECT member, funder_award_id, slug, fellow_name, given_name,
       family_name, start_year, landing_page_url
FROM rc_out
"""


def _build(dialect: str) -> str:
    text = _sql(dialect)
    if dialect == "duck":
        text = text.replace("\\\\", "\\")
        text = text.replace("AS STRING", "AS VARCHAR")
    return text


@register(
    "fellowship_directory_parse",
    oracle=_build("duck"),
    tags=("domain", "awards", "scrape"),
    tables=("orders",),
    doc=("Fellowship-directory parse pair (scripts/local/"
         "guggenheim_to_s3.py, scripts/local/radcliffe_to_s3.py)"),
)
def fellowship_directory_parse(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Guggenheim + Radcliffe fellows-directory normalizes with the
    shared particle-aware name split (module docstring has the map).
    Two barriered scan arms + the radcliffe (slug, year) keep-first
    window; no Python."""
    return spark.sql(_build("spark"))
