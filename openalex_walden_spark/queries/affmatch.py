"""Affiliation-string institution matcher battery (rules-as-data).

Catalog surface for ``functions/affrules.py``: the reference's
~4,800-line hand-maintained affiliation-string -> institution-id
cascade (``notebooks/institutions/affiliation_string_parsing.py``,
1,174 extracted append rules over 823 institutions, incl. the
state-dependent Hong-Kong/USTH guards and the one removal), compiled
from ONE expression-tree dataset to both engines and evaluated over
the generator's synthesized example corpus.

The example strings are part of the generated dataset (one positive
per synthesizable rule + negatives), so the driver hash pins every
rule's firing behavior in BOTH dialects each round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openalex_walden_spark.functions.affrules import match_sql
from openalex_walden_spark.functions.affrules_data import EXAMPLES
from openalex_walden_spark.queries.registry import register


def _examples_values(dialect: str) -> str:
    rows = []
    for i, s in EXAMPLES:
        if dialect == "spark":
            lit = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
        else:
            lit = "'" + s.replace("'", "''") + "'"
        rows.append(f"({i}, {lit})")
    return ", ".join(rows)


_DUCK_SQL = f"""
SELECT i AS example_id,
       COALESCE(array_to_string(
         list_transform({match_sql("duckdb")}, x -> CAST(x AS VARCHAR)),
         '|'), '') AS matched_ids
FROM (
  SELECT i, aff, lower(aff) AS aff_low
  FROM (VALUES {_examples_values("duckdb")}) AS ex(i, aff)
)
"""


@register(
    "affiliation_rules_match",
    oracle=_DUCK_SQL,
    tags=("domain", "D2", "institutions", "P8"),
    tables=(),
)
def affiliation_rules_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 1,174-rule affiliation matcher
    (affiliation_string_parsing.py) over the generated example corpus:
    per string, the sorted institution-id set, both engines compiling
    the same expression-tree data.

    Plan: ONE map-side projection — the whole cascade is a single
    stateless expression per institution (state guards expanded at
    load), so at 100 TB this runs inside the scan with no shuffle, no
    UDF, no per-rule pass."""
    df = spark.createDataFrame(EXAMPLES, "i INT, aff STRING").withColumn(
        "aff_low", F.lower("aff")
    )
    return df.selectExpr(
        "i AS example_id",
        "array_join(transform("
        + match_sql("spark")
        + ", x -> CAST(x AS STRING)), '|') AS matched_ids",
    ).coalesce(4)
