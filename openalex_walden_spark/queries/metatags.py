"""Landing-page meta-tag harvest + classifier derived view (reference
``notebooks/meta_tags/harvest_meta_tags.py`` and
``classifier_meta_view.py``).

The reference harvests ALL raw ``<meta>`` tag lines + the page
``<title>`` from stored landing-page HTML (refetching is the expensive
part; re-parsing a stored tag is minutes), appends with anti-join
resume, and derives the work-type classifier's 8-family view in a
SEPARATE layer whose filter regex is kept VERBATIM as a Python regex
in a pandas UDF — explicitly NOT an RLIKE translation, because the
classifier's rules were measured against those exact bytes.  This
module keeps both layers: the harvest is pure JVM regexp extraction;
the derived view runs the same verbatim pattern in a real pandas UDF.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from openalex_walden_spark.queries.registry import register

# Deterministic landing-page HTML over the documents fixture: a title,
# a lattice of real meta families, and off-family noise tags.
_HTML_SPARK = """concat(
  '<head><title>Doc ', CAST(doc_id AS STRING), ': ',
  substr(text, 1, 24), '</title>',
  CASE WHEN doc_id % 3 = 0
    THEN concat('<meta name="citation_pdf_url" content="https://x/p',
                CAST(doc_id AS STRING), '.pdf">')
    ELSE '' END,
  CASE WHEN doc_id % 4 = 1
    THEN '<meta name="DC.Type" content="article">' ELSE '' END,
  CASE WHEN doc_id % 5 = 2
    THEN '<meta property="og:type" content="article">' ELSE '' END,
  CASE WHEN doc_id % 7 = 3
    THEN '<meta name="eprints.type" content="thesis">' ELSE '' END,
  '<meta charset="utf-8"><meta name="viewport" content="w">',
  '</head><body>', substr(text, 1, 40), '</body>')"""

_HTML_DUCK = _HTML_SPARK.replace("AS STRING", "AS VARCHAR")

_HARVEST_ORACLE = f"""
WITH pages AS (
  SELECT doc_id, concat('f', CAST(doc_id AS VARCHAR)) AS file_key,
         {_HTML_DUCK} AS html
  FROM documents
),
harvested AS (
  SELECT doc_id, file_key,
         regexp_extract_all(html, '<meta[^>]*>') AS meta_tags,
         regexp_extract(html, '<title>([^<]*)</title>', 1) AS page_title
  FROM pages
),
resumed AS (
  SELECT * FROM harvested h
  WHERE NOT EXISTS (
    SELECT 1 FROM (SELECT concat('f', CAST(doc_id AS VARCHAR)) AS file_key
                   FROM documents WHERE doc_id % 9 = 0) done
    WHERE done.file_key = h.file_key)
)
SELECT len(meta_tags)::BIGINT AS n_tags,
       (page_title IS NOT NULL AND page_title <> '') AS has_title,
       count(*)::BIGINT AS n,
       count(DISTINCT file_key)::BIGINT AS n_files
FROM resumed
GROUP BY n_tags, has_title
ORDER BY n_tags, has_title
"""


@register(
    "metatags_harvest",
    oracle=_HARVEST_ORACLE,
    tags=("metatags", "text", "antijoin"),
    tables=("documents",),
)
def metatags_harvest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Meta-tag harvest (harvest_meta_tags.py): ALL raw <meta> lines
    plus the <title> extracted per page (no family filter at ingest —
    the reference's 'refetch is expensive, re-parse is cheap' design),
    with the append-only resume expressed as a LEFT ANTI join on
    file_key.  Extraction is JVM regexp_extract_all in whole-stage
    codegen; the anti-join shares the file_key shuffle."""
    pages = spark.table("documents").selectExpr(
        "doc_id", "concat('f', CAST(doc_id AS STRING)) AS file_key",
        f"{_HTML_SPARK} AS html",
    )
    harvested = pages.selectExpr(
        "doc_id", "file_key",
        "regexp_extract_all(html, '<meta[^>]*>', 0) AS meta_tags",
        "regexp_extract(html, '<title>([^<]*)</title>', 1) AS page_title",
    )
    done = spark.table("documents").where("doc_id % 9 = 0").selectExpr(
        "concat('f', CAST(doc_id AS STRING)) AS file_key"
    )
    return (
        harvested.join(done, "file_key", "left_anti")
        .groupBy(
            F.size("meta_tags").cast("bigint").alias("n_tags"),
            (F.col("page_title").isNotNull() & (F.col("page_title") != ""))
            .alias("has_title"),
        )
        .agg(F.count(F.lit(1)).alias("n"),
             F.countDistinct("file_key").alias("n_files"))
        .orderBy("n_tags", "has_title")
    )


# KEEP — the byte-compat contract regex, VERBATIM as a Python regex
# (classifier_meta_view.py: 'NOT an RLIKE translation').
_KEEP = re.compile(
    r"""["'](?:citation_[a-z_]+|bepress_citation_[a-z_]+|dc\.type[a-z.]*|dcterms\.type|
        DC\.Type|article-?type|og:type|prism\.contenttype|eprints\.type)["']""",
    re.I | re.X,
)


@F.pandas_udf(ArrayType(StringType()))
def _keep8(meta_tags: pd.Series) -> pd.Series:
    """Filter each row's raw tag array to the 8 classifier families;
    tags pass through byte-unmodified (the derived-layer contract)."""
    return meta_tags.map(
        lambda tags: [t for t in tags if _KEEP.search(t)]
        if tags is not None else []
    )


# RE2 mirror of KEEP for the oracle (same alternation, no lookarounds;
# case-insensitivity via DuckDB's 'i' option).
_KEEP_DUCK = (
    "[\"'](citation_[a-z_]+|bepress_citation_[a-z_]+|dc[.]type[a-z.]*"
    "|dcterms[.]type|DC[.]Type|article-?type|og:type|prism[.]contenttype"
    "|eprints[.]type)[\"']"
)

_KEEP_DUCK_SQL = _KEEP_DUCK.replace("'", "''")

_VIEW_ORACLE = f"""
WITH pages AS (
  SELECT doc_id, {_HTML_DUCK} AS html FROM documents
),
harvested AS (
  SELECT doc_id,
         regexp_extract_all(html, '<meta[^>]*>') AS meta_tags
  FROM pages
),
kept AS (
  SELECT doc_id,
         list_filter(meta_tags,
                     t -> regexp_matches(t, '{_KEEP_DUCK_SQL}', 'i')) AS tx_meta
  FROM harvested
),
fams AS (
  SELECT doc_id,
         lower(regexp_extract(unnest(tx_meta), '{_KEEP_DUCK_SQL}', 1)) AS family
  FROM kept
)
SELECT family, count(*)::BIGINT AS n,
       count(DISTINCT doc_id)::BIGINT AS n_docs
FROM fams
GROUP BY family
ORDER BY family
"""


@register(
    "metatags_classifier_view",
    oracle=_VIEW_ORACLE,
    tags=("metatags", "pandas-udf", "text"),
    tables=("documents",),
)
def metatags_classifier_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier derived view (classifier_meta_view.py): the verbatim
    KEEP Python regex runs in a REAL pandas UDF over the raw tag
    arrays (the byte-compat contract — the one place a pandas UDF is
    the spec, not the fallback), then the family names roll up
    JVM-side.  Arrow-batched; reparse-from-stored is a full overwrite
    by design, so there is no resume machinery here."""
    pages = spark.table("documents").selectExpr(
        "doc_id", f"{_HTML_SPARK} AS html"
    )
    harvested = pages.selectExpr(
        "doc_id", "regexp_extract_all(html, '<meta[^>]*>', 0) AS meta_tags"
    )
    kept = harvested.select("doc_id", _keep8("meta_tags").alias("tx_meta"))
    return (
        kept.select("doc_id", F.explode("tx_meta").alias("tag"))
        .select(
            "doc_id",
            F.lower(F.regexp_extract("tag", _KEEP_DUCK, 1)).alias("family"),
        )
        .groupBy("family")
        .agg(F.count(F.lit(1)).alias("n"),
             F.countDistinct("doc_id").alias("n_docs"))
        .orderBy("family")
    )
