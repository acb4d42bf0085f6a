"""Judge-apply rollup + stuck-row recrawl (reference
``notebooks/metrics/AuthorshipQualityJudgeApply.sql`` and
``notebooks/scraping/recrawl_linkinghub_elsevier.ipynb``).

* ``judge_apply_rollup`` — the warehouse task that runs the ``ai_query``
  judge over the cost-gated prompt tables and rolls verdicts into the
  tall metrics table.  The model call itself is the documented network
  seam (the repo's deterministic md5-derived stub, same contract as
  ``llm_judge_verdicts``); everything else is real and in-plan: the
  strict-JSON response contract exercised through ``get_json_object``
  (the reference parses ``$.verdict`` / ``$.confidence`` from the
  structured-output payload), the ``tier|verdict`` composite dimension
  for arm A, arm B's ``candidate_* → candidate_pick`` collapse, the
  orcid-mint collision self-join (today's minted authors sharing an
  orcid with any OLDER author id), and the list-price cost-cents formula
  ``(Σ prompt_chars / 4 · $15 + n · 20 · $75) / 1e6 · 100``
  (AuthorshipQualityJudge.py:5-8 pricing constants).  The reference's
  per-arm DELETE-then-INSERT idempotency is a state concern owned by
  ``operators/merge.py``; this query pins the day's computed rollup.

* ``recrawl_stuck_rows`` — the one-shot fix for ~83K Elsevier DOIs whose
  crawler followed no JS redirect and parked on linkinghub: select the
  stuck rows (resolved_url pattern × processed-date window × doi
  namespace), re-crawl, DELETE the old rows and INSERT the fresh ones.
  The query materializes the post-fix final state for the affected
  records — old taxicab ids gone, fresh rows resolving to the real
  article domain — so the delete-and-insert semantics are hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openalex_walden_spark.queries.registry import register

# ---------------------------------------------------------------------------
# Judge apply: verdict parse + tall rollup (AuthorshipQualityJudgeApply.sql)
# ---------------------------------------------------------------------------
# arm-A prompts <- orders %8=1 (tiered), arm-B <- orders %8=3 (lineups);
# authors <- customer (orcid on %3=0 rows, "minted today" on %7=2).
# The stub verdict is md5(prompt)-derived so both engines replay it.

_ARM_A_VERDICTS = "'same_person', 'different_person', 'cannot_determine'"
_ARM_B_VERDICTS = (
    "'candidate_1', 'candidate_2', 'candidate_3', 'candidate_4', "
    "'candidate_5', 'none_correct', 'cannot_determine'"
)
_CONFS = "'high', 'medium', 'low'"

_JUDGE_ORACLE = f"""
WITH prompts_a AS (
  SELECT concat('Judge A work ', CAST(o_orderkey AS VARCHAR), ' name ',
                repeat('x', (o_orderkey % 40)::INT)) AS prompt,
         CASE WHEN o_orderkey % 5 = 4 THEN '(none)'
              WHEN o_orderkey % 3 = 0 THEN 'orcid'
              WHEN o_orderkey % 3 = 1 THEN 'tier1_exact'
              ELSE 'tier2_initials' END AS tier
  FROM orders WHERE o_orderkey % 8 = 1
),
judged_a AS (
  SELECT tier,
         concat('{{"verdict": "',
                ([{_ARM_A_VERDICTS}])[1 + (('0x' || substr(md5(prompt), 1, 8))::BIGINT % 3)::INT],
                '", "confidence": "',
                ([{_CONFS}])[1 + ((('0x' || substr(md5(prompt), 1, 8))::BIGINT // 7) % 3)::INT],
                '"}}') AS out,
         prompt
  FROM prompts_a
),
parsed_a AS (
  SELECT tier, json_extract_string(out, '$.verdict') AS verdict FROM judged_a
),
prompts_b AS (
  SELECT concat('Judge B lineup ', CAST(o_orderkey AS VARCHAR), ' cands ',
                repeat('y', (o_orderkey % 25)::INT)) AS prompt
  FROM orders WHERE o_orderkey % 8 = 3
),
judged_b AS (
  SELECT concat('{{"verdict": "',
                ([{_ARM_B_VERDICTS}])[1 + (('0x' || substr(md5(prompt), 1, 8))::BIGINT % 7)::INT],
                '"}}') AS out,
         prompt
  FROM prompts_b
),
parsed_b AS (
  SELECT json_extract_string(out, '$.verdict') AS verdict FROM judged_b
),
authors AS (
  SELECT c_custkey AS id,
         CASE WHEN c_custkey % 3 = 0
              THEN concat('0000-000', CAST(c_custkey % 311 AS VARCHAR)) END AS orcid,
         (c_custkey % 7 = 2) AS minted_today
  FROM customer
),
collisions AS (
  SELECT DISTINCT minted.id AS minted_id
  FROM authors minted
  JOIN authors older ON minted.orcid = older.orcid AND older.id < minted.id
  WHERE minted.minted_today AND minted.orcid IS NOT NULL
)
SELECT 'judge_arm_a' AS metric, concat(tier, '|', verdict) AS dimension,
       COUNT(*)::BIGINT AS value
FROM parsed_a GROUP BY tier, verdict
UNION ALL
SELECT 'judge_arm_b',
       CASE WHEN verdict LIKE 'candidate%' THEN 'candidate_pick' ELSE verdict END,
       COUNT(*)::BIGINT
FROM parsed_b
GROUP BY CASE WHEN verdict LIKE 'candidate%' THEN 'candidate_pick' ELSE verdict END
UNION ALL
SELECT 'orcid_mint_collisions', '(all)', COUNT(*)::BIGINT FROM collisions
UNION ALL
SELECT 'judge_cost_cents', '(all)',
       CAST(FLOOR((
         ((SELECT COALESCE(SUM(length(prompt)), 0) FROM prompts_a)
          + (SELECT COALESCE(SUM(length(prompt)), 0) FROM prompts_b)) / 4.0 * 15.0
         + ((SELECT COUNT(*) FROM prompts_a)
            + (SELECT COUNT(*) FROM prompts_b)) * 20.0 * 75.0
       ) / 1e6 * 100) AS BIGINT)
ORDER BY metric, dimension
"""


@register(
    "judge_apply_rollup",
    oracle=_JUDGE_ORACLE,
    tags=("judge", "llm-operator", "agg"),
    tables=("orders", "customer"),
)
def judge_apply_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ai_query judge apply + tall metric rollup
    (AuthorshipQualityJudgeApply.sql).

    The judged payload is a strict-JSON document parsed with
    ``get_json_object`` exactly as the reference parses the
    structured-output response; verdict derivation is the md5 stub (the
    network seam).  The four metric arms — tier|verdict composites,
    candidate_pick collapse, the orcid-collision self-join (equi-join on
    orcid, inequality on id — never a cross join), and the scalar
    cost-cents row — union into one tall frame; every arm aggregates
    map-side before its shuffle.
    """
    okey = F.col("o_orderkey")
    prompts_a = (
        spark.table("orders")
        .filter(okey % 8 == 1)
        .select(
            F.expr(
                "concat('Judge A work ', CAST(o_orderkey AS STRING), ' name ', "
                "repeat('x', CAST(o_orderkey % 40 AS INT)))"
            ).alias("prompt"),
            F.when(okey % 5 == 4, F.lit("(none)"))
            .when(okey % 3 == 0, F.lit("orcid"))
            .when(okey % 3 == 1, F.lit("tier1_exact"))
            .otherwise(F.lit("tier2_initials"))
            .alias("tier"),
        )
    )
    h = "conv(substr(md5(prompt), 1, 8), 16, 10)"
    judged_a = prompts_a.withColumn(
        "out",
        F.expr(
            f"""concat('{{"verdict": "',
                 element_at(array({_ARM_A_VERDICTS}), CAST(1 + {h} % 3 AS INT)),
                 '", "confidence": "',
                 element_at(array({_CONFS}), CAST(1 + ({h} div 7) % 3 AS INT)),
                 '"}}')"""
        ),
    )
    parsed_a = judged_a.select(
        "tier", F.get_json_object("out", "$.verdict").alias("verdict")
    )
    arm_a = (
        parsed_a.groupBy("tier", "verdict")
        .count()
        .select(
            F.lit("judge_arm_a").alias("metric"),
            F.concat_ws("|", "tier", "verdict").alias("dimension"),
            F.col("count").cast("long").alias("value"),
        )
    )

    prompts_b = (
        spark.table("orders")
        .filter(okey % 8 == 3)
        .select(
            F.expr(
                "concat('Judge B lineup ', CAST(o_orderkey AS STRING), ' cands ', "
                "repeat('y', CAST(o_orderkey % 25 AS INT)))"
            ).alias("prompt")
        )
    )
    judged_b = prompts_b.withColumn(
        "out",
        F.expr(
            f"""concat('{{"verdict": "',
                 element_at(array({_ARM_B_VERDICTS}), CAST(1 + {h} % 7 AS INT)),
                 '"}}')"""
        ),
    )
    arm_b = (
        judged_b.select(F.get_json_object("out", "$.verdict").alias("verdict"))
        .select(
            F.when(F.col("verdict").like("candidate%"), F.lit("candidate_pick"))
            .otherwise(F.col("verdict"))
            .alias("dimension")
        )
        .groupBy("dimension")
        .count()
        .select(
            F.lit("judge_arm_b").alias("metric"),
            "dimension",
            F.col("count").cast("long").alias("value"),
        )
    )

    authors = spark.table("customer").select(
        F.col("c_custkey").alias("id"),
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(F.lit("0000-000"), (F.col("c_custkey") % 311).cast("string")),
        ).alias("orcid"),
        (F.col("c_custkey") % 7 == 2).alias("minted_today"),
    )
    minted = authors.filter(F.col("minted_today") & F.col("orcid").isNotNull()).select(
        F.col("id").alias("minted_id"), "orcid"
    )
    older = authors.filter(F.col("orcid").isNotNull()).select(
        F.col("id").alias("older_id"), "orcid"
    )
    collisions = (
        minted.join(older, "orcid")
        .filter(F.col("older_id") < F.col("minted_id"))
        .select("minted_id")
        .distinct()
        .agg(F.count(F.lit(1)).alias("value"))
        .select(
            F.lit("orcid_mint_collisions").alias("metric"),
            F.lit("(all)").alias("dimension"),
            F.col("value").cast("long"),
        )
    )

    cost = (
        prompts_a.select(F.length("prompt").alias("n"))
        .unionByName(prompts_b.select(F.length("prompt").alias("n")))
        .agg(
            F.floor(
                (F.sum("n") / 4.0 * 15.0 + F.count(F.lit(1)) * 20.0 * 75.0)
                / 1e6
                * 100
            )
            .cast("long")
            .alias("value")
        )
        .select(
            F.lit("judge_cost_cents").alias("metric"),
            F.lit("(all)").alias("dimension"),
            "value",
        )
    )

    return (
        arm_a.unionByName(arm_b)
        .unionByName(collisions)
        .unionByName(cost)
        .orderBy("metric", "dimension")
    )


# ---------------------------------------------------------------------------
# Stuck-row recrawl (recrawl_linkinghub_elsevier.ipynb)
# ---------------------------------------------------------------------------
# taxicab_results <- orders: %5=0 rows parked on linkinghub; the fix window
# is a processed-date band; only doi-namespace rows qualify.

_RECRAWL_ORACLE = """
WITH results AS (
  SELECT concat('T', CAST(o_orderkey AS VARCHAR)) AS taxicab_id,
         CASE WHEN o_orderkey % 11 = 0 THEN 'pmh' ELSE 'doi' END AS native_id_namespace,
         concat('10.1016/j.x.', CAST(o_orderkey AS VARCHAR)) AS native_id,
         CASE WHEN o_orderkey % 5 = 0
              THEN concat('https://linkinghub.elsevier.com/retrieve/pii/S', CAST(o_orderkey AS VARCHAR))
              ELSE concat('https://journal.x/a', CAST(o_orderkey AS VARCHAR)) END AS resolved_url,
         CASE WHEN o_orderkey % 5 = 0 THEN 302 ELSE 200 END AS status_code,
         o_orderdate AS processed_date
  FROM orders
),
stuck AS (
  SELECT * FROM results
  WHERE resolved_url LIKE '%linkinghub.elsevier%'
    AND processed_date BETWEEN DATE '1995-03-01' AND DATE '1997-05-01'
    AND native_id_namespace = 'doi'
),
recrawled AS (
  SELECT concat('R', CAST(substr(taxicab_id, 2) AS VARCHAR)) AS taxicab_id,
         native_id_namespace, native_id,
         concat('https://www.sciencedirect.com/science/article/pii/S',
                substr(taxicab_id, 2)) AS resolved_url,
         200 AS status_code, processed_date
  FROM stuck
),
final_state AS (
  SELECT r.* FROM results r
  WHERE NOT EXISTS (SELECT 1 FROM stuck s WHERE s.taxicab_id = r.taxicab_id)
  UNION ALL
  SELECT * FROM recrawled
)
SELECT f.taxicab_id, f.native_id, f.resolved_url, f.status_code
FROM final_state f
WHERE f.native_id IN (SELECT native_id FROM stuck)
ORDER BY f.native_id, f.taxicab_id
"""


@register(
    "recrawl_stuck_rows",
    oracle=_RECRAWL_ORACLE,
    tags=("scraping", "delete-insert"),
    tables=("orders",),
)
def recrawl_stuck_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linkinghub stuck-DOI recrawl (recrawl_linkinghub_elsevier.ipynb).

    Selection = resolved-url pattern × processed-date window × doi
    namespace (the reference's exact three-way gate); the fix is
    DELETE-old + INSERT-fresh, materialized here as anti-join ∪ new rows.
    The output restricts to the affected native_ids, so the hash check
    proves BOTH halves: every stale T-id is gone and every fresh R-id
    resolves to the real article domain.  The reference drains the 83K
    driver-side in a ThreadPool (the network seam); the bookkeeping here
    is all plan.
    """
    okey = F.col("o_orderkey")
    results = spark.table("orders").select(
        F.concat(F.lit("T"), okey.cast("string")).alias("taxicab_id"),
        F.when(okey % 11 == 0, F.lit("pmh")).otherwise(F.lit("doi")).alias(
            "native_id_namespace"
        ),
        F.concat(F.lit("10.1016/j.x."), okey.cast("string")).alias("native_id"),
        F.when(
            okey % 5 == 0,
            F.concat(F.lit("https://linkinghub.elsevier.com/retrieve/pii/S"), okey.cast("string")),
        )
        .otherwise(F.concat(F.lit("https://journal.x/a"), okey.cast("string")))
        .alias("resolved_url"),
        F.when(okey % 5 == 0, F.lit(302)).otherwise(F.lit(200)).alias("status_code"),
        F.col("o_orderdate").alias("processed_date"),
    )
    stuck = results.filter(
        F.col("resolved_url").contains("linkinghub.elsevier")
        & F.col("processed_date").between("1995-03-01", "1997-05-01")
        & (F.col("native_id_namespace") == "doi")
    )
    recrawled = stuck.select(
        F.concat(F.lit("R"), F.expr("substr(taxicab_id, 2)")).alias("taxicab_id"),
        "native_id_namespace",
        "native_id",
        F.concat(
            F.lit("https://www.sciencedirect.com/science/article/pii/S"),
            F.expr("substr(taxicab_id, 2)"),
        ).alias("resolved_url"),
        F.lit(200).alias("status_code"),
        "processed_date",
    )
    final_state = results.join(
        stuck.select("taxicab_id"), "taxicab_id", "left_anti"
    ).unionByName(recrawled)
    return (
        final_state.join(stuck.select("native_id").distinct(), "native_id", "left_semi")
        .select("taxicab_id", "native_id", "resolved_url", "status_code")
        .orderBy("native_id", "taxicab_id")
    )
