"""D7 reference-breadth type cascade over the rules-as-data corpus.

The cascade table (functions/typecascade.py) ports the decision order and
highest-traffic branches of the reference's generated ~400-WHEN CASE
(``notebooks/end2end/CreateLocationsWithTypes.sql:120-704``). This query
runs the FULL cascade — every rule — over a golden corpus with one
trigger row per rule, so the driver's hash check proves rule-by-rule that
the Spark compilation and the ANSI-SQL compilation of the same table
agree. 100-TB shape: the whole cascade is one codegen'd CASE expression —
classification is map-side only, no shuffle, rule count adds zero plan
nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openalex_walden_spark.functions.typecascade import (
    CASCADE_RULES,
    corpus,
    duck_case,
    spark_case,
)
from openalex_walden_spark.queries.registry import register

_FIELDS = (
    "case_id", "title", "raw", "crtype", "host", "src", "cont",
    "abstract", "doiurl", "genre", "issue", "nrefs", "single", "hasabs",
)


def _values_sql() -> str:
    rows = []
    for r in corpus():
        cells = []
        for f in _FIELDS:
            v = r[f]
            if isinstance(v, bool):
                cells.append("TRUE" if v else "FALSE")
            elif isinstance(v, int):
                cells.append(str(v))
            else:
                cells.append("'" + str(v).replace("'", "''") + "'")
        rows.append("(" + ", ".join(cells) + ")")
    return ",\n".join(rows)


_D7_REF_SQL = f"""
WITH corpus({", ".join(_FIELDS)}) AS (
  VALUES
{_values_sql()}
),
feat AS (
  SELECT *, concat(src, ' ', cont) AS sc FROM corpus
)
SELECT case_id, {duck_case()} AS work_type
FROM feat
"""


@register(
    "d7_reference_cascade",
    oracle=_D7_REF_SQL,
    tags=("domain", "D7", "rules-as-data"),
    tables=(),
)
def d7_reference_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every ported reference rule fired and value-checked row-by-row
    (the corpus has one row per rule plus a fallback row)."""
    rows = [tuple(r[f] for f in _FIELDS) for r in corpus()]
    schema = (
        "case_id int, title string, raw string, crtype string, host string,"
        " src string, cont string, abstract string, doiurl string,"
        " genre string, issue string, nrefs int, single boolean,"
        " hasabs boolean"
    )
    df = spark.createDataFrame(rows, schema).withColumn(
        "sc", F.concat_ws(" ", F.col("src"), F.col("cont"))
    )
    cols = {f: F.col(f) for f in _FIELDS if f != "case_id"}
    cols["sc"] = F.col("sc")
    return df.select(
        "case_id", spark_case(cols).alias("work_type")
    )


# Documented size claim, pinned so the table can only grow.
assert len(CASCADE_RULES) >= 100, len(CASCADE_RULES)


# --------------------------------------------------------------------------
# D7 final flip: dict fallback + preprint-registrant override + reason
# --------------------------------------------------------------------------
from openalex_walden_spark.functions.typecascade import DICT_MAP  # noqa: E402

_FLIP_FIELDS = (
    "case_id", "provenance", "raw_type", "loc_type", "cascade_type",
    "is_default", "preprint_registrant",
)


def _flip_corpus() -> list[tuple]:
    """One row per dict entry (fired through the default path), plus the
    override/pass-through/unmapped edge rows."""
    rows: list[tuple] = []
    cid = 0
    prov_of = {"repo": "repo_backfill", "datacite": "datacite",
               "crossref": "crossref", "pubmed": "pubmed"}
    for fam, k, _t in DICT_MAP:
        rows.append((cid, prov_of[fam], k, "", "article", True, False))
        cid += 1
    rows += [
        # preprint-registrant wins over everything
        (cid, "crossref", "book", "", "book", False, True),
        # non-default cascade verdict passes through untouched
        (cid + 1, "crossref", "journal-article", "", "review", False, False),
        # default + unmapped raw_type: keep the incoming non-empty type
        (cid + 2, "repo", "zzz-unmapped", "report", "article", True, False),
        # default + unmapped + empty incoming type: article
        (cid + 3, "pubmed", "zzz-unmapped", "", "article", True, False),
        # dict key is matched case-insensitively on the raw type
        (cid + 4, "repo", "PhDThesis", "", "article", True, False),
        # family fold: plain 'repo' provenance uses the repo dictionary
        (cid + 5, "repo", "masterthesis", "", "article", True, False),
    ]
    return rows


def _flip_values_sql() -> str:
    out = []
    for r in _flip_corpus():
        cells = []
        for v in r:
            if isinstance(v, bool):
                cells.append("TRUE" if v else "FALSE")
            elif isinstance(v, int):
                cells.append(str(v))
            else:
                cells.append("'" + str(v).replace("'", "''") + "'")
        out.append("(" + ", ".join(cells) + ")")
    return ",\n".join(out)


def _dict_values_sql() -> str:
    return ",\n".join(
        "('" + "', '".join(c.replace("'", "''") for c in row) + "')"
        for row in DICT_MAP
    )


_D7_FLIP_SQL = f"""
WITH corpus({", ".join(_FLIP_FIELDS)}) AS (
  VALUES
{_flip_values_sql()}
),
dict_map(family, k, mapped_type) AS (
  VALUES
{_dict_values_sql()}
)
SELECT c.case_id,
  CASE WHEN c.preprint_registrant THEN 'preprint'
       WHEN c.is_default
         THEN COALESCE(dm.mapped_type, NULLIF(c.loc_type, ''), 'article')
       ELSE c.cascade_type END AS work_type,
  CASE WHEN c.preprint_registrant THEN 'preprint-registrant'
       WHEN c.is_default AND dm.mapped_type IS NOT NULL
         THEN 'dict:' || dm.family
       WHEN c.is_default THEN 'default'
       ELSE 'cascade' END AS reason
FROM corpus c
LEFT JOIN dict_map dm
  ON dm.family = CASE WHEN c.provenance IN ('repo', 'repo_backfill')
                        THEN 'repo' ELSE c.provenance END
 AND dm.k = lower(c.raw_type)
"""


@register(
    "d7_dict_fallback",
    oracle=_D7_FLIP_SQL,
    tags=("domain", "D7", "rules-as-data"),
    tables=(),
)
def d7_dict_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's final type flip
    (CreateLocationsWithTypes.sql:460-695): rows the cascade defaulted
    to 'article' fall back to a per-provenance raw-type dictionary
    (DICT_MAP, all 218 entries fired here row-by-row), a
    preprint-registrant DOI-prefix flag overrides everything, and every
    verdict carries its reason code. 100-TB shape: the dictionary is a
    broadcast dimension (few hundred rows, like the reference's VALUES
    table); the flip itself is one codegen'd CASE — classification adds
    no shuffle."""
    rows = _flip_corpus()
    schema = (
        "case_id int, provenance string, raw_type string, loc_type string,"
        " cascade_type string, is_default boolean, preprint_registrant boolean"
    )
    c = spark.createDataFrame(rows, schema)
    dm = spark.createDataFrame(list(DICT_MAP), "family string, k string, mapped_type string")
    fam = F.when(
        F.col("provenance").isin("repo", "repo_backfill"), F.lit("repo")
    ).otherwise(F.col("provenance"))
    joined = c.withColumn("fam", fam).join(
        F.broadcast(dm),
        (F.col("fam") == F.col("family")) & (F.col("k") == F.lower(F.col("raw_type"))),
        "left",
    )
    work_type = (
        F.when(F.col("preprint_registrant"), F.lit("preprint"))
        .when(
            F.col("is_default"),
            F.coalesce(
                F.col("mapped_type"),
                F.nullif(F.col("loc_type"), F.lit("")),
                F.lit("article"),
            ),
        )
        .otherwise(F.col("cascade_type"))
    )
    reason = (
        F.when(F.col("preprint_registrant"), F.lit("preprint-registrant"))
        .when(
            F.col("is_default") & F.col("mapped_type").isNotNull(),
            F.concat(F.lit("dict:"), F.col("family")),
        )
        .when(F.col("is_default"), F.lit("default"))
        .otherwise(F.lit("cascade"))
    )
    return joined.select(
        "case_id", work_type.alias("work_type"), reason.alias("reason")
    )
