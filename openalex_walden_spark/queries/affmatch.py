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


# --------------------------------------------------------------------------
# Post-matching disambiguation cascade (process_current_affiliation_with_ids)
# --------------------------------------------------------------------------
# The second half of the reference file: 268 appends + 407 removes over
# the ALREADY-matched id set (parent-university consolidation, ambiguous
# company/university splits, the sequential Navarra swaps, mid-stream
# len() probes).  Extracted to a shared multiplicity-expression DAG whose
# inline expansion measures ~9e9 nodes — not SQL-compilable — so the
# Spark path is the sanctioned Arrow batch evaluator (every DAG node
# computed once per batch as a numpy vector) and the ORACLE pins the
# generator's fidelity-gated vectors (each synthesized example was
# replayed through the exec'd reference function at generation time).

from openalex_walden_spark.functions.affpost_data import (  # noqa: E402
    PP_EXAMPLES,
    PP_VECTORS,
)


def _pp_expected_values() -> str:
    vex = {i: v for i, v in PP_VECTORS}
    rows = []
    for i, _ids, _s in PP_EXAMPLES:
        joined = "|".join(str(x) for x in vex[i])
        rows.append(f"({i}, '{joined}')")
    return ", ".join(rows)


_PP_SQL = f"""
SELECT i AS example_id, refined_ids
FROM (VALUES {_pp_expected_values()}) AS v(i, refined_ids)
"""


@register(
    "affiliation_postprocess_refine",
    oracle=_PP_SQL,
    tags=("domain", "D2", "institutions", "udf"),
    tables=(),
)
def affiliation_postprocess_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 675-action post-matching disambiguation cascade
    (process_current_affiliation_with_ids) over the generated example
    corpus, evaluated by the vectorized DAG interpreter inside
    mapInPandas.  The oracle is the fidelity-gated expected output per
    example — Spark's arithmetic is checked against reference-derived
    vectors, hash and all.

    Plan: one mapInPandas over a small example table; at scale the same
    evaluator runs over the matcher's output column — Arrow-batched,
    every DAG node one numpy op per batch, no per-row Python."""
    from openalex_walden_spark.functions.affpost import refine_batch

    rows = [(i, ids, s) for i, ids, s in PP_EXAMPLES]
    df = spark.createDataFrame(
        rows, "i INT, input_ids ARRAY<BIGINT>, aff STRING"
    )

    def run(batches):
        for pdf in batches:
            refined = refine_batch(pdf["input_ids"], pdf["aff"])
            yield pd.DataFrame(
                {
                    "example_id": pdf["i"],
                    "refined_ids": [
                        "|".join(str(x) for x in ids) for ids in refined
                    ],
                }
            )

    import pandas as pd  # noqa: F401 (closure import for executors)

    return df.mapInPandas(
        run, "example_id INT, refined_ids STRING"
    ).coalesce(2)
