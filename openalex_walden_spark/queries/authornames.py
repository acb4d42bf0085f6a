"""Author full-name maintenance (reference
``notebooks/authors/UpdateAuthorFullNames.ipynb``): the evidence table
with its cleanliness gate, and the four-reason change machine that
decides which attested name (or curation) replaces an author's
``full_name``.

``author_name_evidence_clean`` ports cell 2: attested raw names with
work counts unioned with curated display names (curated rows carry NULL
n unless also attested — BOOL_OR/SUM merge), inner-joined to the parse
table (a candidate without a parsed last name is unusable), and the
``is_clean`` predicate verbatim:

* no digits or bracket/punct junk anywhere in the raw;
* length 5..80 and at least one space;
* parsed first non-empty;
* NO credential tokens — case-SENSITIVE by design (lowercase ``Md.``
  is a common Bangladeshi name prefix and must survive);
* no doubled name tokens ('Shin Kubo Shin Kubo' — first-run lesson).

``author_full_names_update`` ports cell 4, the decision machine:

* **enrich / enrich_curated** — candidate shares the current name's
  block components (same parsed last, same first initial), and each
  component's change is scored 0 (equal) / 1 (strict refinement) /
  NULL (degradation — disqualifies): first may only go initial→word,
  middle may appear or initial→word with the same initial, suffix may
  only gain a generational marker.  Attested candidates need total
  gain ≥ 1, support n ≥ 2, and no conflicting evidence (two distinct
  well-supported full firsts or middle initials veto); curations
  bypass the support gate and vetoes and may be zero-gain format
  fixes.  The surname-particle preservation guard blocks attested
  variants that DROP a particle the current name has (merged-profile
  cross-person protection); curations bypass it.  Best candidate by
  (total gain, curated, support, length, text).
* **pollution_reset / fill_missing** — when the current name is
  missing/unparseable (fill_missing) or its parsed last matches NO
  attested evidence (pollution_reset: wrong block), adopt the dominant
  clean attested raw — ≥ 3 works and ≥ 50% of the author's attested
  total.  The dominant pick is MAX_BY over (n, length, text).
* final MERGE dedup: one change per author, highest support first.

Deviation: the reference's ``updated_date``/hash tiebreaks and the
RAISE_ERROR preflight wall-clock caps are environment state; the
decision lattice, gates, vetoes, and both reset conditions are ported
exactly.  Current-name parses are fixture arithmetic here — the parse
itself is oracle-checked by ``author_names_parse``.

Scale: evidence aggregates per (author, raw); every window keys on
author_id.  The whole machine is one shuffle family on author_id — at
90M authors this is a single co-partitioned pass, no broadcast needed
because every input is already author-keyed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openalex_walden_spark.queries.authorship import DUCK_PARSE_CHAIN
from openalex_walden_spark.queries.registry import register

# ---------------------------------------------------------------------------
# Evidence + is_clean (cell 2)
# ---------------------------------------------------------------------------
# candidates <- customer x k in 0..2, template m = (a*3+k)%9:
#   0 'First Last' clean          1 'F. Last' clean
#   2 'Dr First Last' credential  3 doubled tokens
#   4 digit junk                  5 single token
#   6 'First Mid Last' clean      7 comma+PhD (punct)
#   8 >80 chars
# attested n = 1+(a+k)%4; k=2 rows are pure curations (NULL n) when a%5=0

_FIRSTS = (
    "'james','maria','wei','olga','john','fatima','hans','ana','pierre','yuki',"
    "'carlos','ingrid','david','chen','laura','ahmed','eva','marco','nina','paul'"
)
_LASTS = (
    "'smith','oliveira','berg','zhang','garcia','muller','rossi','kim','dubois','tanaka',"
    "'silva','jansen','brown','wang','lopez','haddad','novak','ricci','petrov','meyer'"
)
_MIDS = "'lee','ray','kai','jo'"

_EV_RAWS_DUCK = f"""
  SELECT a, k,
         CASE WHEN k = 2 AND a % 5 = 0 THEN TRUE ELSE FALSE END AS is_curated,
         CASE WHEN k = 2 AND a % 5 = 0 THEN NULL
              ELSE CAST(1 + (a + k) % 4 AS BIGINT) END AS n,
         CASE CAST((a * 3 + k) % 9 AS INT)
           WHEN 0 THEN concat(cf, ' ', cl)
           WHEN 1 THEN concat(substr(cf, 1, 1), '. ', cl)
           WHEN 2 THEN concat('Dr ', cf, ' ', cl)
           WHEN 3 THEN concat(cf, ' ', cl, ' ', cf, ' ', cl)
           WHEN 4 THEN concat(cf, ' ', cl, ' 2')
           WHEN 5 THEN cl
           WHEN 6 THEN concat(cf, ' ', cm, ' ', cl)
           WHEN 7 THEN concat(cf, ' ', cl, ', PhD')
           ELSE concat(cf, ' ', repeat('ab', 45))
         END AS raw_name
  FROM (
    SELECT c_custkey AS a, t.k,
           concat(upper(substr(fn, 1, 1)), substr(fn, 2)) AS cf,
           concat(upper(substr(ln, 1, 1)), substr(ln, 2)) AS cl,
           concat(upper(substr(mn, 1, 1)), substr(mn, 2)) AS cm
    FROM (
      SELECT c_custkey,
             ([{_FIRSTS}])[CAST((c_custkey + 1) % 20 AS INT) + 1] AS fn,
             ([{_LASTS}])[CAST((c_custkey * 7) % 20 AS INT) + 1] AS ln,
             ([{_MIDS}])[CAST(c_custkey % 4 AS INT) + 1] AS mn
      FROM customer
    ) p, UNNEST(range(0, 3)) AS t(k)
  ) decorated
"""

_IS_CLEAN_DUCK = """
  (NOT regexp_matches(raw_name, '[0-9,;:()\\[\\]{}<>/@&#%*_=+|"!?]')
   AND length(raw_name) BETWEEN 5 AND 80
   AND contains(raw_name, ' ')
   AND coalesce(first_name, '') <> ''
   AND NOT regexp_matches(raw_name,
     '(^| )(Dr|Dra|Drs|Prof|Ir|Hj|MD|M\\.D|PhD|Ph\\.D|M\\.Si|S\\.T|M\\.Sc|MSc|M\\.Pd|S\\.Pd|DDS|DVM|MPH)\\.?(,| |$)')
   AND len(list_filter(string_split_regex(lower(regexp_replace(raw_name, '[^a-z]', ' ', 'g')), ' +'),
                       t -> length(t) >= 2))
     = len(list_distinct(list_filter(string_split_regex(lower(regexp_replace(raw_name, '[^a-z]', ' ', 'g')), ' +'),
                                     t -> length(t) >= 2)))
  ) AS is_clean
"""

_EV_ORACLE = (
    f"WITH ev0 AS ({_EV_RAWS_DUCK}),\n"
    "agg AS (\n"
    "  SELECT a AS author_id, raw_name, sum(n) AS n, bool_or(is_curated) AS is_curated\n"
    "  FROM ev0 GROUP BY a, raw_name\n"
    "),\n"
    "raws AS (SELECT DISTINCT raw_name FROM agg),\n"
    + DUCK_PARSE_CHAIN
    + """,
parsed AS (
  SELECT raw_name, first_name AS p_first, middle_name AS p_middle,
         last_name AS p_last, suffix0 AS p_suffix
  FROM s13
)
SELECT g.author_id, g.raw_name AS raw, g.n, g.is_curated,
       p.p_first, p.p_middle, p.p_last, p.p_suffix,
"""
    + _IS_CLEAN_DUCK.replace("first_name", "p.p_first").replace("raw_name", "g.raw_name")
    + """
FROM agg g
JOIN parsed p ON p.raw_name = g.raw_name
WHERE p.p_last <> ''
ORDER BY g.author_id, g.raw_name
"""
)


@register(
    "author_name_evidence_clean",
    oracle=_EV_ORACLE,
    tags=("authornames", "text", "gate"),
    tables=("customer",),
)
def author_name_evidence_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-name candidate evidence + the is_clean gate
    (UpdateAuthorFullNames.ipynb cell 2; see module docstring)."""
    from openalex_walden_spark.functions.nameparse import parse_author_name

    cap = lambda x: f"concat(upper(substr({x}, 1, 1)), substr({x}, 2))"  # noqa: E731
    ev0 = (
        spark.table("customer")
        .selectExpr(
            "c_custkey AS a",
            f"{cap(f'element_at(array({_FIRSTS}), CAST((c_custkey + 1) % 20 AS INT) + 1)')} AS cf",
            f"{cap(f'element_at(array({_LASTS}), CAST((c_custkey * 7) % 20 AS INT) + 1)')} AS cl",
            f"{cap(f'element_at(array({_MIDS}), CAST(c_custkey % 4 AS INT) + 1)')} AS cm",
        )
        .select("*", F.explode(F.expr("sequence(0, 2)")).alias("k"))
        .selectExpr(
            "a",
            "k",
            "CASE WHEN k = 2 AND a % 5 = 0 THEN TRUE ELSE FALSE END AS is_curated",
            "CASE WHEN k = 2 AND a % 5 = 0 THEN NULL"
            " ELSE CAST(1 + (a + k) % 4 AS BIGINT) END AS n",
            """CASE CAST((a * 3 + k) % 9 AS INT)
                 WHEN 0 THEN concat(cf, ' ', cl)
                 WHEN 1 THEN concat(substr(cf, 1, 1), '. ', cl)
                 WHEN 2 THEN concat('Dr ', cf, ' ', cl)
                 WHEN 3 THEN concat(cf, ' ', cl, ' ', cf, ' ', cl)
                 WHEN 4 THEN concat(cf, ' ', cl, ' 2')
                 WHEN 5 THEN cl
                 WHEN 6 THEN concat(cf, ' ', cm, ' ', cl)
                 WHEN 7 THEN concat(cf, ' ', cl, ', PhD')
                 ELSE concat(cf, ' ', repeat('ab', 45))
               END AS raw_name""",
        )
    )
    agg = ev0.groupBy(F.col("a").alias("author_id"), "raw_name").agg(
        F.sum("n").alias("n"), F.max("is_curated").alias("is_curated")
    )
    parsed_cols = parse_author_name(F.col("raw_name"))
    # The exchange between the parse projection and the evidence join is
    # deliberate: it stops Catalyst collapsing the (large) parse
    # expression tree into every downstream column that references it —
    # without the barrier the collapsed projection exceeds what codegen
    # can compile.  It also mirrors the reference, where author_names is
    # a separate parse table joined by raw string.
    parsed = (
        agg.select("raw_name")
        .distinct()
        .repartition(8, "raw_name")
        .select(
            "raw_name",
            parsed_cols["first"].alias("p_first"),
            parsed_cols["middle"].alias("p_middle"),
            parsed_cols["last"].alias("p_last"),
            parsed_cols["suffix"].alias("p_suffix"),
        )
        .repartition(8, "raw_name")
    )
    # Lazy checkpoint severs the parse sub-plan from the join job: the
    # parse's (large) codegen unit executes once in its own stage and the
    # join consumes materialized rows — same discipline as the pagerank
    # loop.  Without it the driver re-inlines the parse tree into the
    # join stage and the combined unit exceeds the default heap.
    parsed = parsed.localCheckpoint(eager=False)
    is_clean = (
        "(NOT raw_name RLIKE '[0-9,;:()\\\\[\\\\]{}<>/@&#%*_=+|\"!?]'"
        " AND length(raw_name) BETWEEN 5 AND 80"
        " AND contains(raw_name, ' ')"
        " AND coalesce(p_first, '') <> ''"
        " AND NOT raw_name RLIKE"
        " '(^| )(Dr|Dra|Drs|Prof|Ir|Hj|MD|M\\\\.D|PhD|Ph\\\\.D|M\\\\.Si|S\\\\.T|M\\\\.Sc|MSc|M\\\\.Pd|S\\\\.Pd|DDS|DVM|MPH)\\\\.?(,| |$)'"
        " AND size(filter(split(lower(regexp_replace(raw_name, '[^a-z]', ' ')), ' +'),"
        " t -> length(t) >= 2))"
        " = size(array_distinct(filter(split(lower(regexp_replace(raw_name, '[^a-z]', ' ')), ' +'),"
        " t -> length(t) >= 2)))) AS is_clean"
    )
    return (
        agg.join(parsed, "raw_name")
        .where("p_last <> ''")
        .selectExpr(
            "author_id", "raw_name AS raw", "n", "is_curated",
            "p_first", "p_middle", "p_last", "p_suffix", is_clean,
        )
        .orderBy("author_id", "raw")
    )


# ---------------------------------------------------------------------------
# The change machine (cell 4)
# ---------------------------------------------------------------------------
# current (author c): case c%6 — 0 word-first, 1 initial-first,
#   2 middle-initial, 3 particle name, 4 missing, 5 unparseable
# evidence (c x k in 0..3, exists when (c+k)%5<4):
#   e_last = current last when (c+k)%7<5 else foreign (wrong block)
#   e_first by (c+k)%4: 'g.' / 'gabriel' / 'g' / 'george'
#   e_middle by (c+k)%3: '' / 'k' / 'keith'
#   e_suffix 'jr' when (c+k)%11=0; n = 1+(c+k)%6 (NULL when curated);
#   is_curated (c+k)%13=0; is_clean (c+k)%17<>0;
#   raw gains a 'van ' prefix when (c+k)%9=0 (particle guard passes)

_CUR_DUCK = """
  SELECT c_custkey AS author_id,
         concat('lst', CAST(c_custkey % 20 AS VARCHAR)) AS cl,
         CAST(c_custkey % 6 AS INT) AS ccase
  FROM customer
"""

_DECISION_CORE = """
current AS (
  SELECT author_id,
         CASE ccase WHEN 0 THEN concat('gabriel ', cl)
                    WHEN 1 THEN concat('g. ', cl)
                    WHEN 2 THEN concat('gabriel k. ', cl)
                    WHEN 3 THEN concat('gabriel van ', cl)
                    WHEN 4 THEN ''
                    ELSE '???' END AS full_name,
         CASE WHEN ccase <= 3 THEN CASE WHEN ccase = 1 THEN 'g.' ELSE 'gabriel' END
              ELSE '' END AS c_first,
         CASE WHEN ccase = 2 THEN 'k' ELSE '' END AS c_middle,
         CASE WHEN ccase <= 3 THEN cl ELSE '' END AS c_last,
         '' AS c_suffix
  FROM cur
),
evidence AS (
  SELECT c.author_id,
         CASE WHEN (c.author_id + t.k) % 7 < 5 THEN c.cl
              ELSE concat('x', c.cl) END AS p_last,
         CASE CAST((c.author_id + t.k) % 4 AS INT)
           WHEN 0 THEN 'g.' WHEN 1 THEN 'gabriel' WHEN 2 THEN 'g' ELSE 'george' END AS p_first,
         CASE CAST((c.author_id + t.k) % 3 AS INT)
           WHEN 0 THEN '' WHEN 1 THEN 'k' ELSE 'keith' END AS p_middle,
         CASE WHEN (c.author_id + t.k) % 11 = 0 THEN 'jr' ELSE '' END AS p_suffix,
         CASE WHEN (c.author_id + t.k) % 13 = 0 THEN NULL
              ELSE CAST(1 + (c.author_id + t.k) % 6 AS BIGINT) END AS n,
         ((c.author_id + t.k) % 13 = 0) AS is_curated,
         ((c.author_id + t.k) % 17 <> 0) AS is_clean,
         (c.author_id + t.k) AS seed
  FROM cur c RANGE3
  WHERE (c.author_id + t.k) % 5 < 4
),
ev AS (
  SELECT *,
         concat(CASE WHEN seed % 9 = 0 THEN 'van ' ELSE '' END,
                p_first,
                CASE WHEN p_middle <> '' THEN concat(' ', p_middle) ELSE '' END,
                ' ', p_last,
                CASE WHEN p_suffix <> '' THEN concat(' ', p_suffix) ELSE '' END) AS raw
  FROM evidence
),
evidence_stats AS (
  SELECT author_id,
         sum(n) AS total_n,
         MAXBY_RAW AS top_raw,
         MAXBY_N AS top_n
  FROM ev WHERE n IS NOT NULL
  GROUP BY author_id
),
last_match AS (
  SELECT e.author_id,
         max(CASE WHEN e.p_last = c.c_last THEN 1 ELSE 0 END) AS any_last_match
  FROM ev e JOIN current c ON e.author_id = c.author_id
  WHERE e.n IS NOT NULL
  GROUP BY e.author_id
),
compat AS (
  SELECT e.author_id, e.raw, e.n, e.is_clean, e.is_curated,
         e.p_suffix, c.full_name, c.c_suffix,
         c.c_first AS c_first_raw, e.p_first AS e_first_raw,
         REGEXALPHA(c.c_first) AS c_first_letters,
         REGEXALPHA(e.p_first) AS e_first_letters,
         REGEXALPHA(c.c_middle) AS c_mid_letters,
         REGEXALPHA(e.p_middle) AS e_mid_letters
  FROM ev e
  JOIN current c ON e.author_id = c.author_id
  WHERE c.c_last IS NOT NULL AND c.c_last <> ''
    AND e.p_last = c.c_last
    AND e.p_first IS NOT NULL AND e.p_first <> ''
    AND c.c_first IS NOT NULL AND c.c_first <> ''
    AND substr(e.p_first, 1, 1) = substr(c.c_first, 1, 1)
),
flagged AS (
  SELECT *,
    CASE WHEN e_first_letters = c_first_letters THEN 0
         WHEN length(c_first_letters) <= 1 AND length(e_first_letters) >= 3 THEN 1
         ELSE NULL END AS first_gain,
    CASE WHEN e_mid_letters = c_mid_letters THEN 0
         WHEN c_mid_letters = '' AND e_mid_letters <> '' THEN 1
         WHEN length(c_mid_letters) = 1 AND length(e_mid_letters) >= 3
              AND substr(e_mid_letters, 1, 1) = substr(c_mid_letters, 1, 1) THEN 1
         ELSE NULL END AS middle_gain,
    CASE WHEN coalesce(p_suffix, '') = coalesce(c_suffix, '') THEN 0
         WHEN c_suffix = '' AND p_suffix <> ''
              AND REGEXLOWER(p_suffix) IN ('jr', 'sr', 'ii', 'iii', 'iv', 'junior') THEN 1
         ELSE NULL END AS suffix_gain
  FROM compat
),
conflicts AS (
  SELECT author_id,
    count(DISTINCT CASE WHEN n >= 2 AND e_mid_letters <> ''
                        THEN substr(e_mid_letters, 1, 1) END) AS distinct_mid_initials,
    count(DISTINCT CASE WHEN n >= 2 AND length(e_first_letters) >= 3
                        THEN e_first_letters END) AS distinct_full_firsts
  FROM flagged GROUP BY author_id
),
enrich AS (
  SELECT author_id, old_full_name, new_full_name, reason, support_n
  FROM (
    SELECT f.author_id, f.full_name AS old_full_name, f.raw AS new_full_name,
           CASE WHEN f.is_curated THEN 'enrich_curated' ELSE 'enrich' END AS reason,
           f.n AS support_n,
           row_number() OVER (
             PARTITION BY f.author_id
             ORDER BY (f.first_gain + f.middle_gain + f.suffix_gain) DESC,
                      f.is_curated DESC, f.n DESC, length(f.raw) DESC, f.raw ASC
           ) AS rk
    FROM flagged f
    JOIN conflicts cf ON f.author_id = cf.author_id
    WHERE f.is_clean
      AND (f.n >= 2 OR f.is_curated)
      AND f.first_gain IS NOT NULL AND f.middle_gain IS NOT NULL
      AND f.suffix_gain IS NOT NULL
      AND (f.first_gain + f.middle_gain + f.suffix_gain)
          >= (CASE WHEN f.is_curated THEN 0 ELSE 1 END)
      AND (f.first_gain = 0 OR f.is_curated OR cf.distinct_full_firsts <= 1)
      AND (f.middle_gain = 0 OR f.is_curated OR cf.distinct_mid_initials <= 1)
      AND f.raw <> f.full_name
      AND (f.is_curated OR NOT (
        PARTRLIKE_FULL AND NOT PARTRLIKE_RAW
      ))
  ) ranked WHERE rk = 1
),
resets AS (
  SELECT c.author_id, c.full_name AS old_full_name,
         es.top_raw AS new_full_name,
         CASE WHEN c.full_name IS NULL OR c.full_name = ''
                   OR c.c_last IS NULL OR c.c_last = ''
              THEN 'fill_missing' ELSE 'pollution_reset' END AS reason,
         es.top_n AS support_n
  FROM current c
  JOIN evidence_stats es ON c.author_id = es.author_id
  LEFT JOIN last_match lm ON c.author_id = lm.author_id
  WHERE es.top_raw IS NOT NULL
    AND es.top_n >= 3
    AND es.top_n / es.total_n >= 0.5
    AND (c.full_name IS NULL OR c.full_name = ''
         OR c.c_last IS NULL OR c.c_last = ''
         OR coalesce(lm.any_last_match, 0) = 0)
    AND es.top_raw IS DISTINCT FROM c.full_name
),
unioned AS (SELECT * FROM enrich UNION ALL SELECT * FROM resets)
SELECT author_id, old_full_name, new_full_name, reason, support_n
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY author_id ORDER BY support_n DESC, reason) AS mrk
  FROM unioned
) final WHERE mrk = 1
ORDER BY author_id
"""

_PARTICLE_RE = "(^| )(van|der|von|de|da|del|della|di|dos|das|du|ter|ten)( |$)"

_DEC_ORACLE = (
    f"WITH cur AS ({_CUR_DUCK}),\n"
    + _DECISION_CORE.replace("RANGE3", ", UNNEST(range(0, 4)) AS t(k)")
    .replace(
        "MAXBY_RAW",
        "arg_max(raw, concat(lpad(CAST(n AS VARCHAR), 2, '0'),"
        " lpad(CAST(length(raw) AS VARCHAR), 3, '0'), raw)) FILTER (WHERE is_clean)",
    )
    .replace(
        "MAXBY_N",
        "arg_max(n, concat(lpad(CAST(n AS VARCHAR), 2, '0'),"
        " lpad(CAST(length(raw) AS VARCHAR), 3, '0'), raw)) FILTER (WHERE is_clean)",
    )
    .replace("REGEXALPHA(c.c_first)", "regexp_replace(c.c_first, '[^a-z]', '', 'g')")
    .replace("REGEXALPHA(e.p_first)", "regexp_replace(e.p_first, '[^a-z]', '', 'g')")
    .replace("REGEXALPHA(c.c_middle)", "regexp_replace(c.c_middle, '[^a-z]', '', 'g')")
    .replace("REGEXALPHA(e.p_middle)", "regexp_replace(e.p_middle, '[^a-z]', '', 'g')")
    .replace("REGEXLOWER(p_suffix)", "regexp_replace(lower(p_suffix), '[^a-z]', '', 'g')")
    .replace("PARTRLIKE_FULL", f"regexp_matches(f.full_name, '{_PARTICLE_RE}')")
    .replace("PARTRLIKE_RAW", f"regexp_matches(f.raw, '{_PARTICLE_RE}')")
)


@register(
    "author_full_names_update",
    oracle=_DEC_ORACLE,
    tags=("authornames", "domain", "decision"),
    tables=("customer",),
)
def author_full_names_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four-reason full-name change machine
    (UpdateAuthorFullNames.ipynb cell 4; see module docstring)."""
    cur = spark.table("customer").selectExpr(
        "c_custkey AS author_id",
        "concat('lst', CAST(c_custkey % 20 AS STRING)) AS cl",
        "CAST(c_custkey % 6 AS INT) AS ccase",
    )
    cur.createOrReplaceTempView("cur")
    sql = _DECISION_CORE
    sql = sql.replace("RANGE3", " LATERAL VIEW explode(sequence(0, 3)) t AS k")
    sql = sql.replace(
        "MAXBY_RAW",
        "max_by(raw, concat(lpad(CAST(n AS STRING), 2, '0'),"
        " lpad(CAST(length(raw) AS STRING), 3, '0'), raw)) FILTER (WHERE is_clean)",
    )
    sql = sql.replace(
        "MAXBY_N",
        "max_by(n, concat(lpad(CAST(n AS STRING), 2, '0'),"
        " lpad(CAST(length(raw) AS STRING), 3, '0'), raw)) FILTER (WHERE is_clean)",
    )
    sql = sql.replace("REGEXALPHA(c.c_first)", "regexp_replace(c.c_first, '[^a-z]', '')")
    sql = sql.replace("REGEXALPHA(e.p_first)", "regexp_replace(e.p_first, '[^a-z]', '')")
    sql = sql.replace("REGEXALPHA(c.c_middle)", "regexp_replace(c.c_middle, '[^a-z]', '')")
    sql = sql.replace("REGEXALPHA(e.p_middle)", "regexp_replace(e.p_middle, '[^a-z]', '')")
    sql = sql.replace(
        "REGEXLOWER(p_suffix)", "regexp_replace(lower(p_suffix), '[^a-z]', '')"
    )
    sql = sql.replace("PARTRLIKE_FULL", f"f.full_name RLIKE '{_PARTICLE_RE}'")
    sql = sql.replace("PARTRLIKE_RAW", f"f.raw RLIKE '{_PARTICLE_RE}'")
    return spark.sql("WITH " + sql)
