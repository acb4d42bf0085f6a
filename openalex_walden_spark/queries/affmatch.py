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
    # only the DuckDB oracle embeds the corpus as VALUES; the Spark side
    # ships the same rows through createDataFrame
    rows = []
    for i, s in EXAMPLES:
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
    from openalex_walden_spark.deploy import ensure_shipped
    from openalex_walden_spark.functions.affpost import refine_batch

    ensure_shipped(spark)
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


# --------------------------------------------------------------------------
# Model-score threshold with first-prediction fallback
# (institution_batch_inference.ipynb cell 12)
# --------------------------------------------------------------------------
# The inference post-step: keep predictions with score > 0.1, but when
# the filter empties the list keep the FIRST (highest-ranked) model id
# anyway — an empty assignment is worse than a low-confidence one.
# model_response <- embeddings: vec_id keys a synthetic ranked
# prediction list (3 entries, scores descending from a doc-keyed
# lattice so some rows lose every entry to the threshold).

_SCORE_FALLBACK_SQL = """
WITH model AS (
  SELECT vec_id,
         [struct_pack(id := (vec_id * 7) % 1000,
                      score := CAST((vec_id % 13) AS DOUBLE) / 40),
          struct_pack(id := (vec_id * 11) % 1000,
                      score := CAST((vec_id % 7) AS DOUBLE) / 80),
          struct_pack(id := (vec_id * 13) % 1000,
                      score := CAST((vec_id % 3) AS DOUBLE) / 100)]
           AS model_response
  FROM embeddings
),
inst_ids AS (
  SELECT vec_id,
         list_transform(
           list_filter(model_response, x -> x.score > 0.1), x -> x.id)
           AS scored_ids,
         list_transform(model_response, x -> x.id) AS model_ids
  FROM model
)
SELECT vec_id,
       array_to_string(
         list_transform(
           CASE WHEN len(scored_ids) < 1 THEN model_ids[1:1]
                ELSE scored_ids END,
           x -> CAST(x AS VARCHAR)), '|') AS institution_ids
FROM inst_ids
"""


@register(
    "inference_score_fallback",
    oracle=_SCORE_FALLBACK_SQL,
    tags=("domain", "S8", "institutions", "P11"),
    tables=("embeddings",),
)
def inference_score_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inference post-selection rule
    (institution_batch_inference.ipynb cell 12): score > 0.1 filter
    with the keep-first fallback when the filter empties the ranked
    list.  Pure higher-order functions — no explode, no UDF.

    Plan: map-side transform/filter/slice over the prediction arrays;
    nothing shuffles."""
    model = spark.table("embeddings").select(
        "vec_id",
        F.array(
            F.struct(
                ((F.col("vec_id") * 7) % 1000).alias("id"),
                ((F.col("vec_id") % 13).cast("double") / 40).alias("score"),
            ),
            F.struct(
                ((F.col("vec_id") * 11) % 1000).alias("id"),
                ((F.col("vec_id") % 7).cast("double") / 80).alias("score"),
            ),
            F.struct(
                ((F.col("vec_id") * 13) % 1000).alias("id"),
                ((F.col("vec_id") % 3).cast("double") / 100).alias("score"),
            ),
        ).alias("model_response"),
    )
    scored = F.transform(
        F.filter("model_response", lambda x: x["score"] > 0.1),
        lambda x: x["id"],
    )
    model_ids = F.transform("model_response", lambda x: x["id"])
    picked = F.when(
        F.size(scored) < 1, F.slice(model_ids, 1, 1)
    ).otherwise(scored)
    return model.select(
        "vec_id",
        F.array_join(
            F.transform(picked, lambda x: x.cast("string")), "|"
        ).alias("institution_ids"),
    )
