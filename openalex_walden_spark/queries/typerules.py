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
