"""Work→award association build (reference
``notebooks/awards/WorkAwards.ipynb`` cell 1): the normalized-key award
lookup with its two key regimes, collapsed-shell alias recovery, and
the multi-source priority union.

Ported semantics:

* **generic key** (2026-07-31 award-id-audit): punctuation/case-
  insensitive key when the alnum residue is ≥ 4 chars, else the
  lowercased-trimmed exact string — so citation-side spelling variants
  attach to the direct-ingest award without over-merging short ids;
* **sharp key** (oxjob #690): the per-funder normalized key; DEPOSITED
  provenances contribute NO sharp key when the id form is weak (the
  ``award_id_is_weak`` gate), registry records always key;
* **canonical election per key**: generic regime prefers a record with
  a display name then min id; sharp regime elects the newest registry
  record (is_registry DESC, display DESC, end_year DESC NULLS LAST,
  id ASC) — the MERGE_FAMILIES election;
* **collapsed-shell aliases** (oxjob #690): keys of merged-away shells
  resolve to their canonical award in BOTH regimes, so spellings that
  only match a collapsed shell keep their link;
* **regime partitioning** (review F5): a generic entry can never claim
  a sharp key's slot — union dedup is per (funder, key, REGIME) with
  pref generic < sharp < alias;
* **source arms with priorities**: backfill work_funder (1), grobid
  matches (2), funder-reported GTR-style with portable-hash minted ids
  (3), crossref-deposit-style with the weak-gate on its sharp key (4),
  and the oxjob #624 registry-verified wrong-funder re-link layer (4);
  arms not verdict-covered contribute NO sharp join (review F7);
* final dedup: one row per (work, award) at the best priority.

Deviation: the sharp key here is digit-run based rather than the full
per-funder grammar — the grammar itself is already oracle-checked by
the ``udf_award_family_battery`` / ``udf_award_normalize`` queries;
this query pins the LOOKUP LAYERING those keys feed.  GTR minted ids
use the repo's md5-based portable hash (xxhash64 is Spark-only).

Scale: the award lookup (dim) broadcasts to every arm — the fact side
never shuffles until the final (work_id, award_id) dedup, which is one
shuffle on the output key.  Explodes fan out bounded id arrays only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openalex_walden_spark.functions.hashing import (
    stable_hash64_duckdb,
    stable_hash64_sql,
)
from openalex_walden_spark.queries.registry import register


def _gk(x: str, g: str) -> str:
    """Generic key: alnum-strip when >=4 chars else lower-trim."""
    return (
        f"CASE WHEN length(regexp_replace(lower({x}), '[^a-z0-9]', ''{g})) >= 4"
        f" THEN regexp_replace(lower({x}), '[^a-z0-9]', ''{g})"
        f" ELSE lower(trim({x})) END"
    )


def _digits(x: str, g: str) -> str:
    return f"regexp_replace({x}, '[^0-9]', ''{g})"


def _sk(x: str, g: str, deposited: str) -> str:
    """Sharp key with the weak gate on deposited provenances."""
    d = _digits(x, g)
    return (
        f"CASE WHEN {deposited} AND length({d}) < 4 THEN NULL"
        f" WHEN length({d}) >= 1 THEN concat('S', {d}) END"
    )


# ---------------------------------------------------------------------------
# Fixture arithmetic (identical in both engines)
# ---------------------------------------------------------------------------
# awards <- part: id = p_partkey, funder = p%12+1, raw text decorated by
#   p%5 (AW-/aw /GR// bare / suffixed forms — forms 0 and 1 collide on
#   the generic key, exercising the election), digits weak when p%9=0;
#   deposited when p%3=0; display NULL when p%7=0; end_year NULL p%11=0
# aliases <- p%13=0 rows: 'OLD-'-prefixed spelling of the same digits
#   resolves to the canonical award in both regimes
# arms <- lineitem by l_linenumber: 1 backfill (pri 1, no sharp),
#   2 grobid (pri 2, no sharp), 3 GTR-minted (pri 3) when l_partkey%6=0,
#   4 crossref-deposit (pri 4, weak-gated sharp); relink <- orders %41=0

_AW_BASE = """
  SELECT p_partkey AS aid,
         CAST(p_partkey % 12 + 1 AS BIGINT) AS funder_id,
         CASE CAST(p_partkey % 5 AS INT)
           WHEN 0 THEN concat('AW-', DIGTXT)
           WHEN 1 THEN concat('aw ', DIGTXT)
           WHEN 2 THEN concat('GR/', DIGTXT)
           WHEN 3 THEN DIGTXT
           ELSE concat('AW-', DIGTXT, '-X') END AS raw_id,
         (p_partkey % 3 = 0) AS is_deposited,
         CASE WHEN p_partkey % 7 = 0 THEN NULL
              ELSE concat('Award ', CAST(p_partkey AS {STR})) END AS display_name,
         CASE WHEN p_partkey % 11 = 0 THEN NULL
              ELSE CAST(1990 + p_partkey % 30 AS BIGINT) END AS end_year,
         concat('Funder ', CAST(p_partkey % 12 + 1 AS {STR})) AS funder_display
  FROM part
"""

_DIGTXT = (
    "CASE WHEN p_partkey % 9 = 0 THEN CAST(p_partkey % 90 AS {STR})"
    " ELSE CAST(1000 + p_partkey % 9000 AS {STR}) END"
)


def _oracle() -> str:
    g = ", 'g'"
    s = "VARCHAR"
    aw_base = _AW_BASE.replace("DIGTXT", _DIGTXT).replace("{STR}", s)
    gk = _gk("raw_id", g)
    sk = _sk("raw_id", g, "is_deposited")
    arm_tpl = """
{name} AS (
  SELECT e.work_id,
         concat('https://openalex.org/G', CAST(coalesce(a.aid, a2.aid) AS VARCHAR)) AS award_id,
         coalesce(a.display_name, a2.display_name) AS display_name,
         coalesce(a.raw_id, a2.raw_id) AS funder_award_id,
         coalesce(a.funder_id, a2.funder_id) AS funder_id,
         coalesce(a.funder_display, a2.funder_display) AS funder_display,
         {pri} AS priority
  FROM {src} e
  LEFT JOIN (SELECT * FROM awards WHERE regime = 'g') a
    ON e.funder_id = a.funder_id AND e.nk = a.nk
  LEFT JOIN (SELECT * FROM awards WHERE regime = 's') a2
    ON e.funder_id = a2.funder_id AND e.sk = a2.nk
  WHERE coalesce(a.aid, a2.aid) IS NOT NULL
)"""
    return f"""
WITH awards_base0 AS ({aw_base}),
awards_base AS (
  SELECT *, {gk} AS gk, {sk} AS sk FROM awards_base0
),
awards_g AS (
  SELECT aid, display_name, raw_id, funder_id, funder_display, gk AS nk, 'g' AS regime
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY funder_id, gk
      ORDER BY (display_name IS NOT NULL) DESC, aid ASC) AS rn
    FROM awards_base
  ) q WHERE rn = 1
),
awards_s AS (
  SELECT aid, display_name, raw_id, funder_id, funder_display, sk AS nk, 's' AS regime
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY funder_id, sk
      ORDER BY (NOT is_deposited) DESC, (display_name IS NOT NULL) DESC,
               end_year DESC NULLS LAST, aid ASC) AS rn
    FROM awards_base WHERE sk IS NOT NULL
  ) q WHERE rn = 1
),
alias_src AS (
  SELECT b.aid, b.display_name, b.raw_id, b.funder_id, b.funder_display,
         concat('OLD-', {_digits("b.raw_id", g)}) AS old_id
  FROM awards_base b WHERE b.aid % 13 = 0
),
awards_al AS (
  SELECT aid, display_name, raw_id, funder_id, funder_display, nk,
         CASE WHEN nk = k_generic THEN 'g' ELSE 's' END AS regime
  FROM (
    SELECT x.*, t.nk FROM (
      SELECT aid, display_name, raw_id, funder_id, funder_display,
             {_gk("old_id", g)} AS k_generic,
             {_sk("old_id", g, "TRUE")} AS k_sharp
      FROM alias_src
    ) x, UNNEST([x.k_generic, x.k_sharp]) AS t(nk)
    WHERE t.nk IS NOT NULL
  ) y
),
awards AS (
  SELECT aid, display_name, raw_id, funder_id, funder_display, nk, regime FROM (
    SELECT *, row_number() OVER (PARTITION BY funder_id, nk, regime ORDER BY pref) AS rn
    FROM (
      SELECT *, 1 AS pref FROM awards_g
      UNION ALL SELECT *, 2 AS pref FROM awards_s
      UNION ALL SELECT *, 3 AS pref FROM awards_al
    ) u
  ) q WHERE rn = 1
),
backfill_src AS (
  SELECT l_orderkey AS work_id, CAST(l_suppkey % 12 + 1 AS BIGINT) AS funder_id,
         t.award_txt AS raw,
         {_gk("t.award_txt", g)} AS nk, CAST(NULL AS VARCHAR) AS sk
  FROM lineitem, UNNEST(
    CASE WHEN l_partkey % 4 = 0 THEN
      [concat('AW-', CAST(1000 + (l_partkey * 7) % 9000 AS VARCHAR)),
       concat('GR/', CAST(1000 + l_partkey % 9000 AS VARCHAR))]
    ELSE [concat('AW-', CAST(1000 + (l_partkey * 7) % 9000 AS VARCHAR))] END
  ) AS t(award_txt)
  WHERE l_linenumber = 1
),
grobid_src AS (
  SELECT l_orderkey AS work_id, CAST(l_partkey % 12 + 1 AS BIGINT) AS funder_id,
         CAST(1000 + (l_suppkey * 3) % 9000 AS VARCHAR) AS raw,
         {_gk("CAST(1000 + (l_suppkey * 3) % 9000 AS VARCHAR)", g)} AS nk,
         CAST(NULL AS VARCHAR) AS sk
  FROM lineitem WHERE l_linenumber = 2
),
crossref_src AS (
  SELECT l_orderkey AS work_id, CAST(l_suppkey % 12 + 1 AS BIGINT) AS funder_id,
         concat('aw ', CAST(1000 + (l_partkey * 11) % 9000 AS VARCHAR)) AS raw,
         {_gk("concat('aw ', CAST(1000 + (l_partkey * 11) % 9000 AS VARCHAR))", g)} AS nk,
         {_sk("concat('aw ', CAST(1000 + (l_partkey * 11) % 9000 AS VARCHAR))", g, "TRUE")} AS sk
  FROM lineitem WHERE l_linenumber = 4
),
relink_src AS (
  SELECT o_orderkey AS work_id, CAST(o_orderkey % 12 + 1 AS BIGINT) AS funder_id,
         concat('AW-', CAST(1000 + o_orderkey % 9000 AS VARCHAR)) AS raw,
         {_gk("concat('AW-', CAST(1000 + o_orderkey % 9000 AS VARCHAR))", g)} AS nk,
         {_sk("concat('AW-', CAST(1000 + o_orderkey % 9000 AS VARCHAR))", g, "FALSE")} AS sk
  FROM orders WHERE o_orderkey % 41 = 0
),
{arm_tpl.format(name="backfill_awards", src="backfill_src", pri=1)},
{arm_tpl.format(name="grobid_awards", src="grobid_src", pri=2)},
gtr_awards AS (
  SELECT l_orderkey AS work_id,
         concat('https://openalex.org/G', CAST(
           abs({stable_hash64_duckdb("concat('gtr:', CAST(l_orderkey AS VARCHAR), ':', CAST(l_partkey AS VARCHAR))")}) % 9000000000 AS VARCHAR)) AS award_id,
         CAST(NULL AS VARCHAR) AS display_name,
         concat('GTR/', CAST(l_partkey AS VARCHAR)) AS funder_award_id,
         CAST(l_suppkey % 12 + 1 AS BIGINT) AS funder_id,
         concat('Funder ', CAST(l_suppkey % 12 + 1 AS VARCHAR)) AS funder_display,
         3 AS priority
  FROM lineitem WHERE l_linenumber = 3 AND l_partkey % 6 = 0
),
{arm_tpl.format(name="crossref_awards", src="crossref_src", pri=4)},
{arm_tpl.format(name="relink_awards", src="relink_src", pri=4)},
combined AS (
  SELECT * FROM backfill_awards
  UNION ALL SELECT * FROM grobid_awards
  UNION ALL SELECT * FROM gtr_awards
  UNION ALL SELECT * FROM crossref_awards
  UNION ALL SELECT * FROM relink_awards
)
SELECT work_id, award_id, display_name, funder_award_id, funder_id, funder_display
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY work_id, award_id ORDER BY priority ASC) AS rn
  FROM combined
) q WHERE rn = 1
ORDER BY work_id, award_id
"""


@register(
    "work_awards_build",
    oracle=_oracle(),
    tags=("workawards", "domain", "lookup"),
    tables=("part", "lineitem", "orders"),
)
def work_awards_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The work→award association build
    (WorkAwards.ipynb cell 1; see module docstring)."""
    g = ""
    s = "STRING"
    aw_base = _AW_BASE.replace("DIGTXT", _DIGTXT).replace("{STR}", s)
    gk = _gk("raw_id", g)
    sk = _sk("raw_id", g, "is_deposited")

    base = spark.table("part").selectExpr(*_split_select(aw_base))
    base = base.selectExpr("*", f"{gk} AS gk", f"{sk} AS sk")
    from pyspark.sql import Window

    awards_g = (
        base.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("funder_id", "gk").orderBy(
                    F.expr("(display_name IS NOT NULL)").desc(), F.col("aid").asc()
                )
            ),
        )
        .where("rn = 1")
        .selectExpr(
            "aid", "display_name", "raw_id", "funder_id", "funder_display",
            "gk AS nk", "'g' AS regime",
        )
    )
    awards_s = (
        base.where("sk IS NOT NULL")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("funder_id", "sk").orderBy(
                    F.expr("(NOT is_deposited)").desc(),
                    F.expr("(display_name IS NOT NULL)").desc(),
                    F.col("end_year").desc_nulls_last(),
                    F.col("aid").asc(),
                )
            ),
        )
        .where("rn = 1")
        .selectExpr(
            "aid", "display_name", "raw_id", "funder_id", "funder_display",
            "sk AS nk", "'s' AS regime",
        )
    )
    awards_al = (
        base.where("aid % 13 = 0")
        .selectExpr(
            "aid", "display_name", "raw_id", "funder_id", "funder_display",
            f"concat('OLD-', regexp_replace(raw_id, '[^0-9]', '')) AS old_id",
        )
        .selectExpr(
            "aid", "display_name", "raw_id", "funder_id", "funder_display",
            f"{_gk('old_id', g)} AS k_generic",
            f"{_sk('old_id', g, 'TRUE')} AS k_sharp",
        )
        .select(
            "*", F.explode(F.expr("array(k_generic, k_sharp)")).alias("nk")
        )
        .where("nk IS NOT NULL")
        .selectExpr(
            "aid", "display_name", "raw_id", "funder_id", "funder_display", "nk",
            "CASE WHEN nk = k_generic THEN 'g' ELSE 's' END AS regime",
        )
    )
    awards = (
        awards_g.selectExpr("*", "1 AS pref")
        .unionByName(awards_s.selectExpr("*", "2 AS pref"))
        .unionByName(awards_al.selectExpr("*", "3 AS pref"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("funder_id", "nk", "regime").orderBy("pref")
            ),
        )
        .where("rn = 1")
        .drop("rn", "pref")
    )
    ag = F.broadcast(awards.where("regime = 'g'").withColumnRenamed("nk", "g_nk"))
    as_ = F.broadcast(awards.where("regime = 's'").withColumnRenamed("nk", "s_nk"))

    def arm(src: DataFrame, pri: int) -> DataFrame:
        j = (
            src.join(
                ag.selectExpr(
                    "funder_id AS gf", "g_nk", "aid AS g_aid",
                    "display_name AS g_dn", "raw_id AS g_rid", "funder_display AS g_fd",
                ),
                (F.col("funder_id") == F.col("gf")) & (F.col("nk") == F.col("g_nk")),
                "left",
            )
            .join(
                as_.selectExpr(
                    "funder_id AS sf", "s_nk", "aid AS s_aid",
                    "display_name AS s_dn", "raw_id AS s_rid", "funder_display AS s_fd",
                ),
                (F.col("funder_id") == F.col("sf")) & (F.col("sk") == F.col("s_nk")),
                "left",
            )
            .where("coalesce(g_aid, s_aid) IS NOT NULL")
        )
        return j.selectExpr(
            "work_id",
            "concat('https://openalex.org/G', CAST(coalesce(g_aid, s_aid) AS STRING)) AS award_id",
            "coalesce(g_dn, s_dn) AS display_name",
            "coalesce(g_rid, s_rid) AS funder_award_id",
            "coalesce(gf, sf) AS funder_id",
            "coalesce(g_fd, s_fd) AS funder_display",
            f"{pri} AS priority",
        )

    li = spark.table("lineitem")
    backfill_src = (
        li.where("l_linenumber = 1")
        .select(
            F.col("l_orderkey").alias("work_id"),
            F.expr("CAST(l_suppkey % 12 + 1 AS BIGINT)").alias("funder_id"),
            F.explode(
                F.expr(
                    """CASE WHEN l_partkey % 4 = 0 THEN
                         array(concat('AW-', CAST(1000 + (l_partkey * 7) % 9000 AS STRING)),
                               concat('GR/', CAST(1000 + l_partkey % 9000 AS STRING)))
                       ELSE array(concat('AW-', CAST(1000 + (l_partkey * 7) % 9000 AS STRING))) END"""
                )
            ).alias("raw"),
        )
        .selectExpr("work_id", "funder_id", f"{_gk('raw', g)} AS nk", "CAST(NULL AS STRING) AS sk")
    )
    grobid_src = li.where("l_linenumber = 2").selectExpr(
        "l_orderkey AS work_id",
        "CAST(l_partkey % 12 + 1 AS BIGINT) AS funder_id",
        f"{_gk('CAST(1000 + (l_suppkey * 3) % 9000 AS STRING)', g)} AS nk",
        "CAST(NULL AS STRING) AS sk",
    )
    cx_txt = "concat('aw ', CAST(1000 + (l_partkey * 11) % 9000 AS STRING))"
    crossref_src = li.where("l_linenumber = 4").selectExpr(
        "l_orderkey AS work_id",
        "CAST(l_suppkey % 12 + 1 AS BIGINT) AS funder_id",
        f"{_gk(cx_txt, g)} AS nk",
        f"{_sk(cx_txt, g, 'TRUE')} AS sk",
    )
    rl_txt = "concat('AW-', CAST(1000 + o_orderkey % 9000 AS STRING))"
    relink_src = spark.table("orders").where("o_orderkey % 41 = 0").selectExpr(
        "o_orderkey AS work_id",
        "CAST(o_orderkey % 12 + 1 AS BIGINT) AS funder_id",
        f"{_gk(rl_txt, g)} AS nk",
        f"{_sk(rl_txt, g, 'FALSE')} AS sk",
    )
    gtr = li.where("l_linenumber = 3 AND l_partkey % 6 = 0").selectExpr(
        "l_orderkey AS work_id",
        "concat('https://openalex.org/G', CAST(abs("
        + stable_hash64_sql(
            "concat('gtr:', CAST(l_orderkey AS STRING), ':', CAST(l_partkey AS STRING))"
        )
        + ") % 9000000000 AS STRING)) AS award_id",
        "CAST(NULL AS STRING) AS display_name",
        "concat('GTR/', CAST(l_partkey AS STRING)) AS funder_award_id",
        "CAST(l_suppkey % 12 + 1 AS BIGINT) AS funder_id",
        "concat('Funder ', CAST(l_suppkey % 12 + 1 AS STRING)) AS funder_display",
        "3 AS priority",
    )
    combined = (
        arm(backfill_src, 1)
        .unionByName(arm(grobid_src, 2))
        .unionByName(gtr)
        .unionByName(arm(crossref_src, 4))
        .unionByName(arm(relink_src, 4))
    )
    return (
        combined.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("work_id", "award_id").orderBy("priority")
            ),
        )
        .where("rn = 1")
        .select(
            "work_id", "award_id", "display_name", "funder_award_id",
            "funder_id", "funder_display",
        )
        .orderBy("work_id", "award_id")
    )


def _split_select(sql_body: str) -> list[str]:
    """Turn the shared '  SELECT a, b, c FROM part' fixture text into
    selectExpr items (the FROM is supplied by spark.table)."""
    body = sql_body.strip()
    assert body.upper().startswith("SELECT")
    body = body[6:]
    cut = body.upper().rindex("FROM PART")
    body = body[:cut]
    items, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            items.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        items.append("".join(cur).strip())
    return items


# ---------------------------------------------------------------------------
# DataCite award `sizes` money parser (ProbeDataCiteAwardSizes.ipynb /
# the parser inside CreateDataCiteAwards) + the raw-slice refresh
# (InsertCrossrefAwardsToRaw.ipynb / InsertDataCiteAwardsToRaw.ipynb)
# ---------------------------------------------------------------------------
# size strings <- part, format by p_partkey % 6:
#   0 '263,614 USD'-style (comma grouping + trailing ISO code)
#   1 '$<n>.50' (symbol + decimal)
#   2 'EUR <n>' (leading ISO code)
#   3 'grant of <n>,000 GBP total' (ISO embedded mid-text)
#   4 '<n> pages' (non-monetary -> no currency -> amount gated off)
#   5 NULL (no sizes[0] at all)
# The currency ladder: ISO three-letter code anywhere wins (case-folded),
# else the $/EUR/GBP/JPY symbol maps; the amount only parses WHEN a
# currency parsed (the reference's gating — a bare number is not money).

_SIZES_SQL = r"""
WITH probed AS (
  SELECT p_partkey,
         CASE p_partkey % 6
           WHEN 0 THEN format('{:,}', p_partkey * 7 + 100000) || ' USD'
           WHEN 1 THEN '$' || CAST(p_partkey % 9000 AS VARCHAR) || '.50'
           WHEN 2 THEN 'EUR ' || CAST(p_partkey % 5000 AS VARCHAR)
           WHEN 3 THEN 'grant of ' || CAST(p_partkey % 90 AS VARCHAR)
                       || ',000 GBP total'
           WHEN 4 THEN CAST(p_size AS VARCHAR) || ' pages'
         END AS size_str
  FROM part
),
parsed AS (
  SELECT size_str,
         CASE WHEN upper(regexp_extract(size_str, '(?i)\b([A-Za-z]{3})\b', 1)) IN ('USD','EUR','GBP','JPY')
              THEN upper(regexp_extract(size_str, '(?i)\b([A-Za-z]{3})\b', 1))
              WHEN regexp_extract(size_str, '([$€£¥])', 1) = '$' THEN 'USD'
              WHEN regexp_extract(size_str, '([$€£¥])', 1) = '€' THEN 'EUR'
              WHEN regexp_extract(size_str, '([$€£¥])', 1) = '£' THEN 'GBP'
              WHEN regexp_extract(size_str, '([$€£¥])', 1) = '¥' THEN 'JPY'
         END AS currency,
         regexp_extract(size_str, '([0-9][0-9,]*(\.[0-9]+)?)', 1) AS amount_raw
  FROM probed
)
SELECT COALESCE(currency,
                CASE WHEN size_str IS NULL THEN '<no_sizes>'
                     ELSE '<unparsed>' END) AS currency,
       COUNT(*) AS n,
       SUM(CASE WHEN currency IS NOT NULL AND amount_raw <> ''
                THEN CAST(replace(amount_raw, ',', '') AS DOUBLE) END)
         AS total_amount,
       MIN(CASE WHEN currency IS NOT NULL AND amount_raw <> ''
                THEN CAST(replace(amount_raw, ',', '') AS DOUBLE) END)
         AS min_amount,
       MAX(CASE WHEN currency IS NOT NULL AND amount_raw <> ''
                THEN CAST(replace(amount_raw, ',', '') AS DOUBLE) END)
         AS max_amount
FROM parsed
GROUP BY 1
"""


@register(
    "award_size_parse_probe",
    oracle=_SIZES_SQL,
    tags=("domain", "awards", "P4", "A6"),
    tables=("part",),
)
def award_size_parse_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DataCite award money parser + its probe report
    (ProbeDataCiteAwardSizes.ipynb cells 1-5, the parser identical to
    CreateDataCiteAwards): ISO code anywhere in the string wins, else
    the currency symbol maps, and the amount parses ONLY when a
    currency did (a bare number is not money); comma grouping stripped.
    The report rolls coverage and the per-currency distribution into
    one grouped result ('<unparsed>' = has sizes, no parse;
    '<no_sizes>' = no sizes[0]).

    Plan: pure map-side parse (two regexp_extracts, no UDF) + one
    partial-aggregable rollup on the currency.  Amounts in the fixture
    are exactly-representable doubles so the SUM is order-independent.
    """
    k = F.col("p_partkey")
    # format('{:,}', n) comma-grouping, re-expressed portably
    grouped = F.regexp_replace(
        F.format_number(k * 7 + 100000, 0), "[^0-9,]", ""
    )
    size_str = (
        F.when(k % 6 == 0, F.concat(grouped, F.lit(" USD")))
        .when(k % 6 == 1, F.concat(F.lit("$"), (k % 9000).cast("string"), F.lit(".50")))
        .when(k % 6 == 2, F.concat(F.lit("EUR "), (k % 5000).cast("string")))
        .when(
            k % 6 == 3,
            F.concat(
                F.lit("grant of "), (k % 90).cast("string"), F.lit(",000 GBP total")
            ),
        )
        .when(k % 6 == 4, F.concat(F.col("p_size").cast("string"), F.lit(" pages")))
    )
    probed = spark.table("part").select(size_str.alias("size_str"))
    iso = F.upper(F.regexp_extract("size_str", r"(?i)\b([A-Za-z]{3})\b", 1))
    symbol = F.regexp_extract("size_str", r"([$€£¥])", 1)
    currency = (
        F.when(iso.isin("USD", "EUR", "GBP", "JPY"), iso)
        .when(symbol == "$", F.lit("USD"))
        .when(symbol == "€", F.lit("EUR"))
        .when(symbol == "£", F.lit("GBP"))
        .when(symbol == "¥", F.lit("JPY"))
    )
    amount_raw = F.regexp_extract("size_str", r"([0-9][0-9,]*(\.[0-9]+)?)", 1)
    parsed = probed.select(
        "size_str",
        currency.alias("currency"),
        amount_raw.alias("amount_raw"),
    )
    amount = F.when(
        F.col("currency").isNotNull() & (F.col("amount_raw") != ""),
        F.regexp_replace("amount_raw", ",", "").cast("double"),
    )
    return (
        parsed.select(
            F.coalesce(
                "currency",
                F.when(F.col("size_str").isNull(), F.lit("<no_sizes>")).otherwise(
                    F.lit("<unparsed>")
                ),
            ).alias("currency"),
            amount.alias("amount"),
        )
        .groupBy("currency")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("amount").alias("total_amount"),
            F.min("amount").alias("min_amount"),
            F.max("amount").alias("max_amount"),
        )
    )


# ---------------------------------------------------------------------------
# awards_raw slice refresh: DELETE one (provenance, priority) slice,
# INSERT the fresh batch (InsertCrossrefAwardsToRaw.ipynb cell 1)
# ---------------------------------------------------------------------------
# raw state <- orders: provenance by priority bucket ('crossref_work'
#   for urgent, 'datacite' for high, 'pdf' otherwise), batch_tag 'old'
# fresh crossref batch <- urgent orders with the refreshed tag; refresh
#   = (raw MINUS the crossref_work/priority=1 slice) UNION fresh.

_SLICE_SQL = """
WITH raw AS (
  SELECT o_orderkey AS award_id,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 'crossref_work'
              WHEN o_orderpriority = '2-HIGH' THEN 'datacite'
              ELSE 'pdf' END AS provenance,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1
              ELSE 2 END AS priority,
         'old' AS batch_tag
  FROM orders
),
fresh AS (
  SELECT o_orderkey AS award_id, 'crossref_work' AS provenance,
         1 AS priority, 'fresh' AS batch_tag
  FROM orders WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 3 <> 0
)
SELECT award_id, provenance, priority, batch_tag FROM raw
WHERE NOT (provenance = 'crossref_work' AND priority = 1)
UNION ALL
SELECT award_id, provenance, priority, batch_tag FROM fresh
"""


@register(
    "awards_raw_slice_refresh",
    oracle=_SLICE_SQL,
    tags=("domain", "awards", "U4", "D1"),
    tables=("orders",),
)
def awards_raw_slice_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source refresh discipline of the awards raw plane
    (InsertCrossrefAwardsToRaw.ipynb / InsertDataCiteAwardsToRaw.ipynb):
    DELETE exactly one (provenance, priority) slice, INSERT the fresh
    DLT batch — other sources' slices never move, and a source that
    shrank (dropped rows) shrinks in raw too, which a blind MERGE would
    miss.

    Plan: the delete is a partition-predicate filter (at scale the raw
    table partitions by provenance so the slice drop is metadata-only);
    the insert is an append — no shuffle anywhere."""
    o = spark.table("orders")
    raw = o.select(
        F.col("o_orderkey").alias("award_id"),
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit("crossref_work"))
        .when(F.col("o_orderpriority") == "2-HIGH", F.lit("datacite"))
        .otherwise(F.lit("pdf"))
        .alias("provenance"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1)
        )
        .otherwise(F.lit(2))
        .alias("priority"),
        F.lit("old").alias("batch_tag"),
    )
    fresh = (
        o.where(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderkey") % 3 != 0)
        )
        .select(
            F.col("o_orderkey").alias("award_id"),
            F.lit("crossref_work").alias("provenance"),
            F.lit(1).alias("priority"),
            F.lit("fresh").alias("batch_tag"),
        )
    )
    kept = raw.where(
        ~((F.col("provenance") == "crossref_work") & (F.col("priority") == 1))
    )
    return kept.unionByName(fresh)


# ---------------------------------------------------------------------------
# Truncated-tail canonical map (CreateTruncatedTailCanonicalMap.ipynb)
# ---------------------------------------------------------------------------
# The awards canonicalization decision layer: a deposited id that failed
# registry match maps to a registry award iff its flattened form
# (alphanumerics, lowercased) is 6-12 chars, equals the tail of exactly
# ONE DISTINCT registry id spelling at the same funder (the dev
# prototype counted rows, not spellings, and wrongly dropped ~250
# recoveries), the registry id is strictly longer, AND the pair passes
# the blind-grade class gates: letter-bearing tails keep (minus
# prose call names and DFG slash signature codes), NSERC year-serial,
# DFG 8->9 GEPRIS, ISCIII PI-form, NIH serial-year, FAPESP
# process-shape keep; NSF zero-restore is HELD BACK (post-hoc carve),
# KAKEN 7->8 was REFUTED in round 2, NCN legacy registry and all other
# bare-numeric tails drop.  Funder-id constants and class regexes are
# the reference's verbatim (behavioral data).
#
# fixture: deposited + registry derive from orders; the funder cycles
# through the gated classes by o%9 so EVERY class fires, with
# two-registry ambiguity collisions on o%97=0 (dropped by the distinct-
# spelling gate) and cross-funder deposits on o%89=0 (bars the NSF
# zero-restore xfunder carve).

def _ttail_sql(d: str) -> str:
    rl = "regexp_matches" if d == "duckdb" else "rlike"
    str_t = "VARCHAR" if d == "duckdb" else "STRING"
    if d == "duckdb":
        explode_l = "CROSS JOIN (SELECT UNNEST(range(6, 13)) AS L) t"
    else:
        explode_l = "LATERAL VIEW explode(sequence(6, 12)) t AS L"
    # DuckDB regexp_replace is first-match-only without the g flag
    g = ", 'g'" if d == "duckdb" else ""
    yy = f"lpad(CAST(o_orderkey % 100 AS {str_t}), 2, '0')"
    serial = f"lpad(CAST(o_orderkey % 100000 AS {str_t}), 5, '0')"
    return f"""
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(o_orderkey % 9 AS INT) AS arm,
         year(o_orderdate) AS yr,
         {yy} AS yy, {serial} AS ser
  FROM orders WHERE o_orderkey % 7 < 3
),
gen AS (
  SELECT k, arm,
    CASE arm
      WHEN 0 THEN 4320334593  -- NSERC
      WHEN 1 THEN 4320306076  -- NSF
      WHEN 2 THEN 4320320879  -- DFG
      WHEN 3 THEN 4320334923  -- ISCIII
      WHEN 4 THEN 4320332161  -- NIH
      WHEN 5 THEN 4320320997  -- FAPESP
      WHEN 6 THEN 4320334764  -- KAKEN
      WHEN 7 THEN 4320322511  -- NCN
      ELSE 999                -- generic letter-bearing funder
    END AS funder_id,
    CASE arm
      WHEN 0 THEN CAST(yr AS {str_t}) || '-' || ser
      WHEN 1 THEN CASE WHEN k % 5 = 0 THEN '010319'   -- date-like drop
                       ELSE '7' || ser END            -- zero-restore hold
      WHEN 2 THEN CASE WHEN k % 5 = 0 THEN 'GZ 21/12-1'  -- signature drop
                       ELSE '2' || ser || '00' END       -- 8-digit 8->9 keep
      WHEN 3 THEN yy || '/' || ser
      WHEN 4 THEN '4' || ser || '-' || yy
      WHEN 5 THEN yy || '/' || ser || '-3'
      WHEN 6 THEN '1' || ser || '0'                      -- 7-digit refuted
      WHEN 7 THEN 'n' || ser                             -- NCN drop
      ELSE CASE WHEN k % 5 = 0 THEN 'Harmonia ' || CAST(k % 90 AS {str_t})
                WHEN k % 5 = 1 THEN '9' || ser           -- bare numeric drop
                ELSE 'ab' || ser END                     -- letter keep
    END AS variant_id,
    CASE arm
      WHEN 0 THEN 'RGPIN-' || CAST(yr AS {str_t}) || '-' || ser
      WHEN 1 THEN CASE WHEN k % 5 = 0 THEN '0010319'
                       ELSE '07' || ser END
      WHEN 2 THEN CASE WHEN k % 5 = 0 THEN '9GZ2112-1'
                       ELSE '92' || ser || '00' END
      WHEN 3 THEN 'PI' || yy || '/' || ser
      WHEN 4 THEN 'R01-4' || ser || '-' || yy
      WHEN 5 THEN '20' || yy || '/' || ser || '-3'
      WHEN 6 THEN '91' || ser || '0'
      WHEN 7 THEN 'umo-n' || ser
      ELSE 'grant-ab' || ser
    END AS registry_id
  FROM base
),
verdicts AS (
  SELECT funder_id, variant_id AS funder_award_id,
         CASE WHEN k % 11 = 10 THEN 'confirmed' ELSE 'plausible' END AS verdict
  FROM gen
  UNION ALL
  -- cross-funder deposit: the SAME variant string under a second funder
  SELECT 888, variant_id, 'garbage' FROM gen WHERE k % 89 = 0
),
registry AS (
  SELECT funder_id, registry_id AS funder_award_id,
         CASE WHEN k % 13 = 12 THEN 1 ELSE 3 END AS priority
  FROM gen
  UNION ALL
  -- ambiguity collision: a SECOND distinct registry spelling sharing
  -- the same tail at the same funder
  SELECT funder_id, 'x' || registry_id, 3 FROM gen WHERE k % 97 = 0
),
dep AS (
  SELECT DISTINCT funder_id, funder_award_id,
         lower(regexp_replace(funder_award_id, '[^0-9A-Za-z]', ''{g})) AS f
  FROM verdicts
  WHERE verdict IN ('plausible', 'garbage')
),
d2 AS (SELECT * FROM dep WHERE length(f) BETWEEN 6 AND 12),
reg AS (
  SELECT DISTINCT funder_id, funder_award_id AS registry_award_id,
         lower(regexp_replace(funder_award_id, '[^0-9A-Za-z]', ''{g})) AS rf
  FROM registry
  WHERE priority >= 3 AND funder_award_id IS NOT NULL
),
sfx AS (
  SELECT funder_id, registry_award_id,
         substr(rf, length(rf) - L + 1, L) AS tail, L
  FROM reg {explode_l}
  WHERE length(rf) > L
),
pairs AS (
  SELECT DISTINCT d2.funder_id, d2.funder_award_id, d2.f, s.registry_award_id
  FROM d2
  JOIN sfx s ON s.funder_id = d2.funder_id AND s.tail = d2.f
            AND s.L = length(d2.f)
),
uniq AS (
  SELECT funder_id, funder_award_id, f,
         min(registry_award_id) AS registry_award_id
  FROM pairs
  GROUP BY 1, 2, 3
  HAVING count(DISTINCT registry_award_id) = 1
),
xfunder AS (
  SELECT funder_award_id AS xf_variant
  FROM verdicts
  GROUP BY 1
  HAVING count(DISTINCT funder_id) > 1
),
classed AS (
  SELECT uniq.*,
    CASE
      WHEN funder_id = 4320322511 THEN 'drop_ncn_legacy_registry'
      WHEN funder_id = 4320320879 AND funder_award_id LIKE '%/%'
        THEN 'drop_dfg_signature_code'
      WHEN {rl}(funder_award_id, '^[A-Za-z]+ ?[0-9]{{1,3}}$')
        THEN 'drop_prose_call_name'
      WHEN funder_id = 4320334593 AND {rl}(f, '^(19|20)[0-9]{{7}}$')
        THEN 'keep_nserc_year_serial'
      WHEN funder_id = 4320306076
           AND registry_award_id = concat('0', funder_award_id)
           AND ({rl}(f, '^(0[1-9]|1[0-2])(0[1-9]|[12][0-9]|3[01])[0-9]{{2}}$')
             OR {rl}(f, '^(0[1-9]|[12][0-9]|3[01])(0[1-9]|1[0-2])[0-9]{{2}}$')
             OR {rl}(f, '^[0-9]{{2}}(0[1-9]|1[0-2])(0[1-9]|[12][0-9]|3[01])$'))
        THEN 'drop_date_like'
      WHEN funder_id = 4320306076
           AND registry_award_id = concat('0', funder_award_id)
           AND x.xf_variant IS NOT NULL THEN 'drop_xfunder_deposited'
      WHEN funder_id = 4320306076
           AND registry_award_id = concat('0', funder_award_id)
        THEN 'hold_nsf_zero_restore'
      WHEN funder_id = 4320320879 AND {rl}(f, '^[0-9]{{8}}$')
           AND length(regexp_replace(lower(registry_award_id),
                                     '[^0-9a-z]', ''{g})) = 9
        THEN 'keep_dfg_8to9'
      WHEN funder_id = 4320334764 AND {rl}(f, '^[0-9]{{7}}$')
           AND {rl}(registry_award_id, '^[0-9]{{8}}$')
        THEN 'drop_kaken_7to8_refuted'
      WHEN funder_id = 4320334923
           AND {rl}(funder_award_id, '^[0-9]{{2}}/[0-9]{{5}}$')
           AND {rl}(registry_award_id, '^[A-Za-z]{{2}}[0-9]{{2}}/[0-9]{{5}}$')
        THEN 'keep_isciii_pi_form'
      WHEN funder_id = 4320332161
           AND {rl}(funder_award_id, '^[0-9]{{6}}[-‐‒–—][0-9]{{2}}$')
        THEN 'keep_nih_serial_year'
      WHEN funder_id = 4320320997
           AND {rl}(funder_award_id,
                    '^([0-9]{{1,2}}/)?[0-9]{{5}}[-‐‒–—][0-9]$')
        THEN 'keep_fapesp_process_shape'
      WHEN {rl}(f, '[a-z]') THEN 'keep_letter_bearing'
      ELSE 'drop_bare_numeric'
    END AS cls
  FROM uniq
  LEFT JOIN xfunder x ON x.xf_variant = uniq.funder_award_id
)
SELECT funder_id, funder_award_id AS variant_id,
       registry_award_id AS canonical_id, cls
FROM classed
WHERE cls LIKE 'keep%'
"""


@register(
    "award_truncated_tail_canonical",
    oracle=_ttail_sql("duckdb"),
    tags=("sqludf", "awards", "J8", "canonical"),
    tables=("orders",),
)
def award_truncated_tail_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The truncated-tail canonical map
    (CreateTruncatedTailCanonicalMap.ipynb): suffix-explode the registry
    over tail lengths 6-12, match flattened deposited ids to exactly ONE
    distinct registry spelling per funder, then the blind-grade class
    gates — letter-bearing / NSERC year-serial / DFG 8->9 / ISCIII
    PI-form / NIH serial-year / FAPESP process-shape keep; prose call
    names, DFG signature codes, date-likes, the refuted KAKEN 7->8,
    cross-funder zero-restores, NCN legacy, and all other bare-numeric
    tails drop; NSF zero-restore held back.  Ambiguous tails are
    dropped, never guessed.

    Plan: the suffix explode is 7 rows per registry id (bounded fan);
    the tail match is an equi-join on (funder, tail, length); ambiguity
    and cross-funder gates are grouped rollups — no similarity scan,
    no cartesian."""
    return spark.sql(_ttail_sql("spark"))


# ---------------------------------------------------------------------------
# institution_awarded extraction (CreateAwardsAPI.ipynb, oxjob #123.2)
# ---------------------------------------------------------------------------
# The awards-API enrichment that links grants to grantee institutions:
# collect distinct affiliation strings across the lead / co-lead /
# investigators[] slots (KAKEN sourced from its raw projects table
# instead of the messy composite; provenances with no usable
# investigator structure excluded; known junk strings dropped), then
# disambiguate via the affiliation lookup — the rule-parser override
# wins when present and not the [-1] sentinel, else the model response
# is score-filtered with a PER-SOURCE threshold (0.1 for NIH/NSF/KAKEN
# whose strings deviate from the works-author distribution, 0.3
# elsewhere) — then explode, dedupe by institution (multi-site grants
# keep multi-element arrays), hydrate, and collect per award.
#
# fixture: awards <- orders (provenance by o%6 incl. two excluded
# sources), slot strings 'aff<j>' with junk injections, a KAKEN raw
# projects join, a lookup whose override/sentinel/model arms cycle by
# j%5, and an institutions dim keyed by the id arithmetic.

def _ia_sql(d: str) -> str:
    str_t = "VARCHAR" if d == "duckdb" else "STRING"
    arr = "list_value" if d == "duckdb" else "ARRAY"
    if d == "duckdb":
        explode_inv = ("CROSS JOIN (SELECT UNNEST(range(0, 2)) AS slot) t")
        arr_sig = (
            "COALESCE(array_to_string(list_sort(list_transform(ids_h, "
            "x -> x)), '|'), '')"
        )
    else:
        explode_inv = "LATERAL VIEW explode(sequence(0, 1)) t AS slot"
        arr_sig = (
            "COALESCE(array_join(array_sort(transform(ids_h, x -> x)), "
            "'|'), '')"
        )
    return f"""
WITH awards AS (
  SELECT o_orderkey AS id,
         CASE CAST(o_orderkey % 6 AS INT)
           WHEN 0 THEN 'nih_exporter' WHEN 1 THEN 'nsf_award_search'
           WHEN 2 THEN 'other_src' WHEN 3 THEN 'kaken'
           WHEN 4 THEN 'crossref_work_funders' ELSE 'usaspending'
         END AS provenance,
         'k' || CAST(o_orderkey % 500 AS {str_t}) AS funder_award_id,
         CASE CAST(o_orderkey % 7 AS INT)
           WHEN 0 THEN 'grantee'
           WHEN 1 THEN 'Institution abroad (somewhere)'
           ELSE 'aff' || CAST(o_orderkey % 30 AS {str_t}) END AS lead_raw,
         CASE WHEN o_orderkey % 3 = 0
              THEN 'aff' || CAST((o_orderkey + 3) % 30 AS {str_t}) END
           AS colead_raw
  FROM orders
),
inv_slots AS (
  SELECT id, provenance,
         'aff' || CAST((id + slot + 11) % 30 AS {str_t}) AS raw
  FROM awards {explode_inv}
  WHERE id % 4 < 2 + slot  -- 0-2 investigators per award
),
kaken_raw AS (
  SELECT DISTINCT 'k' || CAST(o_orderkey % 500 AS {str_t}) AS project_id,
         'kaff' || CAST(o_orderkey % 20 AS {str_t}) AS institution
  FROM orders WHERE o_orderkey % 12 = 3  -- half the kaken awards match
),
all_strings AS (
  SELECT DISTINCT award_id, provenance, raw,
         CASE WHEN provenance IN ('nih_exporter', 'nsf_award_search', 'kaken')
              THEN 0.1 ELSE 0.3 END AS thresh
  FROM (
    SELECT id AS award_id, provenance, lead_raw AS raw FROM awards
    WHERE provenance NOT IN ('kaken', 'crossref_work_funders', 'usaspending')
      AND lead_raw IS NOT NULL
    UNION ALL
    SELECT id, provenance, colead_raw FROM awards
    WHERE provenance NOT IN ('kaken', 'crossref_work_funders', 'usaspending')
      AND colead_raw IS NOT NULL
    UNION ALL
    SELECT id, provenance, raw FROM inv_slots
    WHERE provenance NOT IN ('kaken', 'crossref_work_funders', 'usaspending')
    UNION ALL
    SELECT a.id, a.provenance, k.institution
    FROM awards a JOIN kaken_raw k ON a.funder_award_id = k.project_id
    WHERE a.provenance = 'kaken'
  )
  WHERE raw IS NOT NULL
    AND raw NOT LIKE 'Institution abroad%'
    AND LOWER(TRIM(raw)) NOT IN ('grantee', 'n/a', 'unknown', 'none', 'other')
),
lookup AS (
  SELECT raw_affiliation_string, override, model_ids, model_scores FROM (
    SELECT 'aff' || CAST(j AS {str_t}) AS raw_affiliation_string,
           CASE WHEN j % 5 = 0 THEN {arr}(CAST(j + 100 AS BIGINT))
                WHEN j % 5 = 1 THEN {arr}(CAST(-1 AS BIGINT))
                ELSE {arr}(CAST(NULL AS BIGINT))
           END AS override,
           {arr}(CAST(j + 200 AS BIGINT), CAST(j + 300 AS BIGINT)) AS model_ids,
           {arr}(CAST(0.05 + (j % 4) * 0.1 AS DOUBLE),
                 CAST(0.25 AS DOUBLE)) AS model_scores
    FROM (SELECT DISTINCT CAST(c_custkey % 30 AS INT) AS j FROM customer)
    UNION ALL
    SELECT 'kaff' || CAST(j AS {str_t}),
           {arr}(CAST(NULL AS BIGINT)), {arr}(CAST(j + 400 AS BIGINT)),
           {arr}(CAST(0.2 AS DOUBLE))
    FROM (SELECT DISTINCT CAST(c_custkey % 20 AS INT) AS j FROM customer)
  )
),
disambiguated AS (
  SELECT s.award_id,
    CASE
      WHEN {("len(list_filter(l.override, x -> x IS NOT NULL)) > 0" if d == "duckdb" else "SIZE(FILTER(l.override, x -> x IS NOT NULL)) > 0")}
           AND NOT {("list_contains(l.override, -1)" if d == "duckdb" else "ARRAY_CONTAINS(l.override, CAST(-1 AS BIGINT))")}
        THEN l.override
      ELSE {("list_transform(list_filter(list_zip(l.model_ids, l.model_scores), x -> x[2] >= s.thresh), x -> x[1])" if d == "duckdb" else "TRANSFORM(FILTER(arrays_zip(l.model_ids, l.model_scores), x -> x.model_scores >= s.thresh), x -> x.model_ids)")}
    END AS ids
  FROM all_strings s
  JOIN lookup l ON s.raw = l.raw_affiliation_string
),
exploded AS (
  SELECT award_id, institution_id
  FROM (
    SELECT award_id, {("UNNEST(ids)" if d == "duckdb" else "EXPLODE(ids)")} AS institution_id
    FROM disambiguated
  ) WHERE institution_id IS NOT NULL
),
deduped AS (SELECT DISTINCT award_id, institution_id FROM exploded),
institutions AS (
  SELECT DISTINCT CAST(c_custkey % 800 AS BIGINT) AS iid,
         'Inst ' || CAST(c_custkey % 800 AS {str_t}) AS display_name,
         'https://ror.org/0' || CAST(c_custkey % 800 AS {str_t}) AS ror
  FROM customer
),
hydrated AS (
  SELECT d.award_id,
         'I' || CAST(i.iid AS {str_t}) || ':' || i.display_name
           || ':' || i.ror AS sig
  FROM deduped d JOIN institutions i ON d.institution_id = i.iid
),
per_award AS (
  SELECT award_id,
         {("list_sort(list(sig))" if d == "duckdb" else "array_sort(collect_list(sig))")} AS ids_h
  FROM hydrated GROUP BY award_id
)
SELECT a.id AS award_id, a.provenance,
       {arr_sig} AS institution_awarded
FROM awards a
LEFT JOIN per_award p ON a.id = p.award_id
"""


@register(
    "award_institution_awarded",
    oracle=_ia_sql("duckdb"),
    tags=("domain", "awards", "P8", "A2"),
    tables=("orders", "customer"),
)
def award_institution_awarded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grants -> grantee-institution enrichment
    (CreateAwardsAPI.ipynb, oxjob #123.2): multi-slot string collection
    with the KAKEN raw-table swap and the excluded-provenance list,
    junk-string filtering, override-beats-model disambiguation with the
    [-1] sentinel carve, PER-SOURCE score thresholds, multi-site
    dedupe, hydrate + per-award collect; awards whose sources carry no
    usable structure surface with empty arrays via the left join.

    Plan: slot collection is a union of projections (one scan family);
    the lookup and institutions dims broadcast; one rollup per award."""
    return spark.sql(_ia_sql("spark"))


# ---------------------------------------------------------------------------
# Crossref grant-record parser (CreateCrossrefAwards.ipynb)
# ---------------------------------------------------------------------------
# Crossref items of type 'grant' (a different record shape from works —
# the works parser DROPS them) become award rows: latest-indexed dedup
# per DOI, funder resolution through the TYPED id (ROR-type ids join
# the funder dim's ror, DOI-type ids its doi; the reference writes one
# OR-join against the broadcast dim — here two equi-joins with the DOI
# arm winning, same answer without the double-match duplication), the
# day-GUARDED make_date (a grant with year-month-only parts keeps
# start_year but a NULL start_date — the works parser's default-to-1
# ladder is deliberately NOT used here), and the minted id
# hash(funder:lower(award)) % 9e9 (reference: xxhash64; the engine's
# portable md5 hash per functions/hashing.py so the oracle can mint the
# same ids).
#
# fixture: grants <- orders (duplicate DOIs on okey%3000 exercise the
# dedup; typed funder id alternates ROR/DOI/absent by okey%3; day part
# NULL on okey%5=0), funder dim <- customer keyed by c%200.

def _cg_sql(d: str) -> str:
    str_t = "VARCHAR" if d == "duckdb" else "STRING"
    if d == "duckdb":
        h = ("(('0x' || substr(md5('{x}'), 1, 15))::BIGINT)")
        rn = "ROW_NUMBER() OVER (PARTITION BY doi ORDER BY indexed_ts DESC, k DESC)"
    else:
        h = "cast(conv(substr(md5('{x}'), 1, 15), 16, 10) as bigint)"
        rn = "ROW_NUMBER() OVER (PARTITION BY doi ORDER BY indexed_ts DESC, k DESC)"
    # the mint expression over a column expression (not a literal)
    mint_d = "(('0x' || substr(md5(mint_key), 1, 15))::BIGINT) % 9000000000"
    mint_s = "cast(conv(substr(md5(mint_key), 1, 15), 16, 10) as bigint) % 9000000000"
    mint = mint_d if d == "duckdb" else mint_s
    return f"""
WITH grants AS (
  SELECT o_orderkey AS k,
         'g/' || CAST(o_orderkey % 3000 AS {str_t}) AS doi,
         o_orderdate AS indexed_ts,
         'AW-' || CAST(o_orderkey % 700 AS {str_t}) AS award,
         'Grant ' || CAST(o_orderkey % 700 AS {str_t}) AS title,
         CASE CAST(o_orderkey % 3 AS INT)
           WHEN 0 THEN 'ROR' WHEN 1 THEN 'DOI' END AS funder_id_type,
         CASE CAST(o_orderkey % 3 AS INT)
           WHEN 0 THEN 'https://ror.org/0' || CAST(o_orderkey % 200 AS {str_t})
           WHEN 1 THEN '10.13039/5' || CAST(o_orderkey % 200 AS {str_t})
         END AS funder_typed_id,
         year(o_orderdate) AS sy,
         CAST(o_orderkey % 12 + 1 AS INT) AS sm,
         CASE WHEN o_orderkey % 5 = 0 THEN NULL
              ELSE CAST(o_orderkey % 28 + 1 AS INT) END AS sd,
         CAST(o_orderkey % 900000 AS INT) AS amount,
         CASE WHEN o_orderkey % 4 = 0 THEN 'EUR' ELSE 'USD' END AS currency
  FROM orders
),
deduped AS (
  SELECT * FROM (
    SELECT *, {rn} AS rn FROM grants
  ) WHERE rn = 1
),
funders AS (
  SELECT DISTINCT CAST(c_custkey % 200 AS BIGINT) AS f_funder_id,
         'Funder ' || CAST(c_custkey % 200 AS {str_t}) AS f_display_name,
         'https://ror.org/0' || CAST(c_custkey % 200 AS {str_t}) AS f_ror_id,
         '10.13039/5' || CAST(c_custkey % 200 AS {str_t}) AS f_doi
  FROM customer
),
resolved AS (
  SELECT g.*,
         COALESCE(fd.f_funder_id, fr.f_funder_id) AS funder_id,
         COALESCE(fd.f_display_name, fr.f_display_name) AS funder_name
  FROM deduped g
  LEFT JOIN funders fd
    ON g.funder_id_type = 'DOI' AND g.funder_typed_id = fd.f_doi
  LEFT JOIN funders fr
    ON g.funder_id_type = 'ROR' AND g.funder_typed_id = fr.f_ror_id
),
minted AS (
  SELECT *,
         CAST(funder_id AS {str_t}) || ':' || lower(award) AS mint_key
  FROM resolved
)
SELECT {mint} AS id,
       title AS display_name,
       funder_id, award AS funder_award_id,
       amount, currency,
       CASE WHEN funder_id IS NOT NULL
            THEN 'https://openalex.org/F' || CAST(funder_id AS {str_t})
                 || '|' || funder_name END AS funder_sig,
       'crossref_work' AS provenance,
       CAST(CASE WHEN sd IS NOT NULL THEN make_date(sy, sm, sd) END
            AS {str_t}) AS start_date,
       CAST(sy AS INT) AS start_year,
       'https://api.openalex.org/works?filter=awards.id:G'
         || CAST({mint} AS {str_t}) AS works_api_url
FROM minted
"""


@register(
    "crossref_grant_awards_build",
    oracle=_cg_sql("duckdb"),
    tags=("domain", "awards", "S1", "J2"),
    tables=("orders", "customer"),
)
def crossref_grant_awards_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Crossref grant-record parser (CreateCrossrefAwards.ipynb):
    latest-indexed dedup per DOI, typed-id funder resolution (ROR-type
    ids against the dim's ror, DOI-type against its doi — two equi-
    joins replacing the reference's OR-join, DOI arm winning), the
    day-GUARDED make_date (year-month-only grants keep start_year with
    a NULL start_date), and the portable hash-minted award id.

    Plan: the funder dim broadcasts; dedup is one window on the DOI;
    everything else is map-side projection."""
    return spark.sql(_cg_sql("spark"))
