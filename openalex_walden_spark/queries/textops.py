"""Scalar-transform operators as oracle queries (SURVEY.md §2.2:
P2 DOI / P3 title / P4 license / P6 inverted index / P7 merge key /
P13 sanitize / P15 boolean).

Inputs are synthesized deterministically from the test tables (the
fixtures carry no DOIs/licenses), with the SAME synthesis expression on
both engines so only the operator under test can differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openalex_walden_spark.functions.normalize import (
    normalize_boolean,
    normalize_doi,
    normalize_license,
    normalize_title,
    normalize_title_nfd,
)
from openalex_walden_spark.queries.registry import register

# --------------------------------------------------------------------------
# P2: DOI normalization
# --------------------------------------------------------------------------
# Synthesized raw DOI: messy case/whitespace + a doi://-ish prefix, NULL
# pattern for every 5th key.
_RAW_DOI_DUCK = (
    "CASE WHEN p_partkey % 5 = 0 THEN 'no doi here' "
    "ELSE ' HTTPS://DOI.ORG/10.' || (1000 + p_partkey % 9000)::VARCHAR "
    "|| '/Part. ' || p_partkey::VARCHAR || ' ' END"
)

_DOI_SQL = f"""
SELECT p_partkey AS partkey,
       CASE WHEN doi = '' THEN NULL ELSE doi END AS doi
FROM (
  SELECT p_partkey,
         regexp_extract(regexp_replace(lower(trim({_RAW_DOI_DUCK})), '[\\s\\x00]+', '', 'g'),
                        '(10\\.[0-9]{{4,9}}/[^\\s]+)', 1) AS doi
  FROM part
)
"""


@register("p2_doi_normalize", oracle=_DOI_SQL, tags=("textops", "P2"), tables=("part",))
def p2_doi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOI normalization (P2): lower/trim/space-strip → regex extract —
    the reference's exact pipeline (normalize.py:226-231) as one pure
    column expression."""
    raw = F.when(F.col("p_partkey") % 5 == 0, F.lit("no doi here")).otherwise(
        F.concat(
            F.lit(" HTTPS://DOI.ORG/10."),
            (F.lit(1000) + F.col("p_partkey") % 9000).cast("string"),
            F.lit("/Part. "),
            F.col("p_partkey").cast("string"),
            F.lit(" "),
        )
    )
    return spark.table("part").select(
        F.col("p_partkey").alias("partkey"), normalize_doi(raw).alias("doi")
    )


# --------------------------------------------------------------------------
# P3: title normalization for merge keys
# --------------------------------------------------------------------------
_STOP = "the|a|an|of|to|in|for|on|by|with|at|from"

# Decorated synthetic title: digits (must be dropped — reference keeps
# isalpha only), an opening+closing HTML tag pair (the reference's
# clean_html strips only the opening tag, normalize.py:143 — '</b>'
# survives to the alpha filter as 'b'), and diacritics OUTSIDE the
# 32-char translate fold (ō, ș, Å fold only under NFD; ł has no NFD
# decomposition and must pass through).  Identical expression on both
# engines so only the operator under test can differ.
_RAW_TITLE_DUCK = (
    "'Étude ' || (doc_id % 100)::VARCHAR || ': <b>ōmega</b> șiret łódź "
    "Ångström No.' || (doc_id % 7)::VARCHAR || ' ' || substr(text, 1, 60)"
)

_TITLE_SQL = f"""
SELECT doc_id,
       CASE WHEN t = '' THEN NULL ELSE t END AS normalized_title
FROM (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               strip_accents(lower(substr({_RAW_TITLE_DUCK}, 1, 120))),
               '<\\w+.*?>', '', 'g'),
             '\\b({_STOP}|\\n)\\b', '', 'g'),
           '[^\\p{{L}}]+', '', 'g') AS t
  FROM documents
)
"""


@register("p3_title_normalize", oracle=_TITLE_SQL, tags=("textops", "P3"), tables=("documents",))
def p3_title(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Title normalization (P3), NFD-exact variant: slice → lower → NFD
    accent strip → HTML strip → stopword removal → keep letters only
    (reference pipeline order, normalize.py:156-179).  DuckDB's
    strip_accents (utf8proc) and unicodedata NFD agree on every
    non-Hangul codepoint, so the oracle checks the fold exactly —
    including ō/ș/Å (outside the JVM translate table) and ł (no
    decomposition, must survive)."""
    raw = F.concat(
        F.lit("Étude "),
        (F.col("doc_id") % 100).cast("string"),
        F.lit(": <b>ōmega</b> șiret łódź Ångström No."),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(" "),
        F.substring("text", 1, 60),
    )
    return spark.table("documents").select(
        "doc_id",
        normalize_title_nfd(raw, max_len=120).alias("normalized_title"),
    )


# --------------------------------------------------------------------------
# P4: license normalization
# --------------------------------------------------------------------------
_RAW_LICENSE_DUCK = """
CASE o_orderkey % 14
  WHEN 0 THEN 'This work is licensed under CC BY 4.0 (creativecommons.org/licenses/by/4.0)'
  WHEN 1 THEN 'cc-by-nc-nd'
  WHEN 2 THEN 'MIT License'
  WHEN 3 THEN 'submitted version, all rights reserved'
  WHEN 4 THEN 'Apache-2.0'
  WHEN 5 THEN 'Public Domain (CC0)'
  WHEN 6 THEN 'GPLv3'
  WHEN 7 THEN 'https://creativecommons.org/licenses/by-nc/2.0'
  WHEN 8 THEN 'permitted for reuse with attribution'
  WHEN 9 THEN 'https://www.elsevier.com/openaccess/userlicense/1.0/'
  WHEN 10 THEN 'arXiv.org perpetual, non-exclusive license'
  WHEN 11 THEN 'Open Access article under publisher terms'
  WHEN 12 THEN 'GPL-3 or later'
  ELSE 'Works not in the public domain notice' END
"""

_LICENSE_SQL = f"""
SELECT CASE WHEN raw IS NULL THEN '<null>' ELSE raw END AS raw_license,
       CASE
         WHEN s LIKE '%elsevier.com/openaccess/userlicense%' THEN NULL
         WHEN s LIKE '%pubs.acs.org/page/policy/authorchoice_termsofuse.html%' THEN 'other-oa'
         WHEN s LIKE '%arxiv.orgperpetual%' THEN 'other-oa'
         WHEN s LIKE '%arxiv.orgnonexclusive%' THEN 'other-oa'
         WHEN s LIKE '%ccbyncnd%' THEN 'cc-by-nc-nd'
         WHEN s LIKE '%ccbyncsa%' THEN 'cc-by-nc-sa'
         WHEN s LIKE '%ccbynd%' THEN 'cc-by-nd'
         WHEN s LIKE '%ccbysa%' THEN 'cc-by-sa'
         WHEN s LIKE '%ccbync%' THEN 'cc-by-nc'
         WHEN s LIKE '%ccby%' THEN 'cc-by'
         WHEN s LIKE '%creativecommons.org/licenses/byncnd%' THEN 'cc-by-nc-nd'
         WHEN s LIKE '%creativecommons.org/licenses/byncsa%' THEN 'cc-by-nc-sa'
         WHEN s LIKE '%creativecommons.org/licenses/bync%' THEN 'cc-by-nc'
         WHEN s LIKE '%creativecommons.org/licenses/bynd%' THEN 'cc-by-nd'
         WHEN s LIKE '%creativecommons.org/licenses/bysa%' THEN 'cc-by-sa'
         WHEN s LIKE '%creativecommons.org/licenses/by%' THEN 'cc-by'
         WHEN s LIKE '%cc0%' THEN 'public-domain'
         WHEN s LIKE '%publicdomain%' AND s NOT LIKE '%worksnotinthepublicdomain%' THEN 'public-domain'
         WHEN s LIKE '%openaccess%' THEN 'other-oa'
         WHEN s LIKE '%gpl3%' THEN 'gpl-3'
         WHEN s LIKE '%gpl2%' THEN 'gpl-2'
         WHEN s LIKE '%gpl%' THEN 'gpl'
         WHEN s LIKE '%apache2%' THEN 'apache-2.0'
         WHEN regexp_matches(lower(trim(raw)), '\\bmit\\b') THEN 'mit'
         ELSE NULL END AS license,
       COUNT(*) AS n
FROM (SELECT raw, replace(replace(lower(trim(raw)), ' ', ''), '-', '') AS s
      FROM (SELECT {_RAW_LICENSE_DUCK} AS raw FROM orders))
GROUP BY raw_license, license
"""


@register("p4_license_normalize", oracle=_LICENSE_SQL, tags=("textops", "P4"), tables=("orders",))
def p4_license(spark: SparkSession, sf_dir: str) -> DataFrame:
    """License normalization (P4): the reference's full stripped-lookup
    table (normalize.py:181-223) — publisher suppressions (the Elsevier
    user-license URL must NOT slug even though it contains 'openaccess'),
    CC word and URL forms, guarded public-domain, other-oa, versioned
    GPL, strict apache2 — plus word-boundary guards for short generic
    names ('MIT License' maps; 'permitted'/'submitted' must not)."""
    raws = [
        "This work is licensed under CC BY 4.0 (creativecommons.org/licenses/by/4.0)",
        "cc-by-nc-nd",
        "MIT License",
        "submitted version, all rights reserved",
        "Apache-2.0",
        "Public Domain (CC0)",
        "GPLv3",
        "https://creativecommons.org/licenses/by-nc/2.0",
        "permitted for reuse with attribution",
        "https://www.elsevier.com/openaccess/userlicense/1.0/",
        "arXiv.org perpetual, non-exclusive license",
        "Open Access article under publisher terms",
        "GPL-3 or later",
        "Works not in the public domain notice",
    ]
    raw = F.lit(None).cast("string")
    for i, v in enumerate(raws):
        raw = F.when(F.col("o_orderkey") % 14 == i, F.lit(v)).otherwise(raw)
    return (
        spark.table("orders")
        .select(raw.alias("raw"))
        .select(
            F.coalesce(F.col("raw"), F.lit("<null>")).alias("raw_license"),
            normalize_license(F.col("raw")).alias("license"),
        )
        .groupBy("raw_license", "license")
        .agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# P6: abstract inverted index, exploded to (word, positions) rows
# --------------------------------------------------------------------------
_INVIDX_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ts
  FROM documents WHERE doc_id < 50
),
pairs AS (
  SELECT doc_id, u.p.t AS word, u.p.i AS pos
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(ts) + 1),
                                 i -> {'t': ts[i], 'i': i - 1})) AS p
    FROM toks
  ) u(doc_id, p)
)
SELECT doc_id, word,
       string_agg(pos::VARCHAR, ',' ORDER BY pos) AS positions
FROM pairs
GROUP BY doc_id, word
"""


@register("p6_inverted_index", oracle=_INVIDX_SQL, tags=("textops", "P6"), tables=("documents",))
def p6_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Abstract inverted index (P6): word → ordered position list
    (transform.py:24-40), exploded to rows so the oracle hash is
    map-order-independent. posexplode keeps everything JVM-side — the
    pure-Spark alternative SURVEY.md §2.2 notes."""
    d = spark.table("documents").where(F.col("doc_id") < 50)
    toks = F.expr("filter(split(lower(text), '\\\\s+'), x -> x != '')")
    pairs = d.select("doc_id", F.posexplode(toks).alias("pos", "word"))
    return (
        pairs.groupBy("doc_id", "word")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("pos")), lambda x: x.cast("string")),
                ",",
            ).alias("positions")
        )
    )


# --------------------------------------------------------------------------
# P7: merge-key construction with fallback cascade
# --------------------------------------------------------------------------
_MERGEKEY_SQL = """
SELECT o_orderkey AS orderkey,
       COALESCE(
         CASE WHEN o_orderkey % 3 = 0 THEN '10.1000/' || o_orderkey::VARCHAR END,
         CASE WHEN o_orderkey % 3 = 1 THEN 'pmid:' || o_orderkey::VARCHAR END,
         'ta:' || lower(o_orderpriority) || ':' || o_custkey::VARCHAR
       ) AS merge_key,
       CASE WHEN o_orderkey % 3 = 0 THEN 'doi'
            WHEN o_orderkey % 3 = 1 THEN 'pmid'
            ELSE 'title_author' END AS key_kind
FROM orders
"""


@register("p7_merge_key", oracle=_MERGEKEY_SQL, tags=("textops", "P7"), tables=("orders",))
def p7_merge_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-key cascade (P7): doi → pmid → title_author fallback, the
    identity backbone of D2 (normalize.py:116-139: STRUCT(doi, pmid,
    arxiv, title_author) with provenance fallbacks)."""
    k = F.col("o_orderkey")
    doi = F.when(k % 3 == 0, F.concat(F.lit("10.1000/"), k.cast("string")))
    pmid = F.when(k % 3 == 1, F.concat(F.lit("pmid:"), k.cast("string")))
    ta = F.concat(
        F.lit("ta:"), F.lower("o_orderpriority"), F.lit(":"), F.col("o_custkey").cast("string")
    )
    return spark.table("orders").select(
        k.alias("orderkey"),
        F.coalesce(doi, pmid, ta).alias("merge_key"),
        F.when(k % 3 == 0, F.lit("doi"))
        .when(k % 3 == 1, F.lit("pmid"))
        .otherwise(F.lit("title_author"))
        .alias("key_kind"),
    )


# --------------------------------------------------------------------------
# P13 + P15: serving sanitize + boolean normalization
# --------------------------------------------------------------------------
_BOOL_SQL = """
SELECT raw_flag, flag, COUNT(*) AS n
FROM (
  SELECT CASE c_custkey % 8
           WHEN 0 THEN 'yes' WHEN 1 THEN ' TRUE ' WHEN 2 THEN 'f'
           WHEN 3 THEN '0'   WHEN 4 THEN 'No'     WHEN 5 THEN 't'
           WHEN 6 THEN 'maybe' ELSE NULL END AS raw_flag,
         CASE WHEN lower(trim(CASE c_custkey % 8
           WHEN 0 THEN 'yes' WHEN 1 THEN ' TRUE ' WHEN 2 THEN 'f'
           WHEN 3 THEN '0'   WHEN 4 THEN 'No'     WHEN 5 THEN 't'
           WHEN 6 THEN 'maybe' ELSE NULL END)) IN ('yes','y','t','true','1') THEN TRUE
           WHEN lower(trim(CASE c_custkey % 8
           WHEN 0 THEN 'yes' WHEN 1 THEN ' TRUE ' WHEN 2 THEN 'f'
           WHEN 3 THEN '0'   WHEN 4 THEN 'No'     WHEN 5 THEN 't'
           WHEN 6 THEN 'maybe' ELSE NULL END)) IN ('no','n','f','false','0') THEN FALSE
           ELSE NULL END AS flag
  FROM customer
)
GROUP BY raw_flag, flag
"""


@register("p15_boolean_normalize", oracle=_BOOL_SQL, tags=("textops", "P15"), tables=("customer",))
def p15_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean normalization (P15): yes/no/t/f/true/false/1/0 → BOOLEAN,
    unknown → NULL (utils/dataframe.py:31-46)."""
    vals = ["yes", " TRUE ", "f", "0", "No", "t", "maybe", None]
    raw = F.lit(None).cast("string")
    for i, v in enumerate(vals[:-1]):
        raw = F.when(F.col("c_custkey") % 8 == i, F.lit(v)).otherwise(raw)
    return (
        spark.table("customer")
        .select(raw.alias("raw_flag"), normalize_boolean(raw).alias("flag"))
        .groupBy("raw_flag", "flag")
        .agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# P7b: merge-key with the bad-title deny-list fallback
# --------------------------------------------------------------------------
_MERGEKEY_BAD_SQL = f"""
WITH norm AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             translate(
               regexp_replace(lower(substr(text, 1, 80)), '<[^>]+>', ' ', 'g'),
               'àáâãäåçèéêëìíîïñòóôõöùúûüýÿšžœæß',
               'aaaaaaceeeeiiiinooooouuuuyyszoas'),
             '\\b({_STOP})\\b', ' ', 'g'),
           '[^\\p{{L}}]+', '', 'g') AS t
  FROM documents
),
bad AS (
  SELECT t FROM norm WHERE t <> '' GROUP BY t HAVING count(*) >= 2
)
SELECT doc_id,
       CASE WHEN t IS NULL OR t = '' OR length(t) < 5
              OR t IN (SELECT t FROM bad)
            THEN 'native:' || doc_id::VARCHAR
            ELSE 'ta:' || t END AS merge_key,
       CASE WHEN t IS NULL OR t = '' OR length(t) < 5
              OR t IN (SELECT t FROM bad)
            THEN 'native' ELSE 'title' END AS key_kind
FROM norm
"""


@register(
    "p7_merge_key_badtitle",
    oracle=_MERGEKEY_BAD_SQL,
    tags=("textops", "P7", "P3", "J4"),
    tables=("documents",),
)
def p7_merge_key_badtitle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 with the reference's bad-title guard (normalize.py:116-139):
    the title_author key falls back to the native id when the normalized
    title is missing, too short, or sits in the ambiguous-title
    deny-list (`openalex.system.bad_titles` — here derived as titles
    shared by >= 2 docs, which is what that table operationally is).
    The deny-list check is the correlated `IN (SELECT …)` shape —
    Catalyst decorrelates it to a broadcast-able semi-join."""
    norm = spark.table("documents").select(
        "doc_id", normalize_title(F.col("text"), max_len=80).alias("t")
    )
    bad = (
        norm.where(F.col("t").isNotNull())
        .groupBy("t")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= 2)
        .select("t")
    )
    flagged = norm.join(
        F.broadcast(bad.withColumn("is_bad", F.lit(True))), "t", "left"
    )
    fallback = (
        F.col("t").isNull()
        | (F.length("t") < 5)
        | F.col("is_bad").isNotNull()
    )
    return flagged.select(
        "doc_id",
        F.when(fallback, F.concat(F.lit("native:"), F.col("doc_id").cast("string")))
        .otherwise(F.concat(F.lit("ta:"), F.col("t")))
        .alias("merge_key"),
        F.when(fallback, F.lit("native")).otherwise(F.lit("title")).alias("key_kind"),
    )
