"""Award-topics inference chain
(``notebooks/topics/award_topics_create_input.ipynb``,
``award_topics_merge_output.ipynb`` — the awards-side parameterization
of the works topics pipeline, oxjob #123.1; the GPU BERT call in
``award_topics_inference.ipynb`` is the model-serving seam, the same
adjudication as the works-side ``topics_inference`` endpoint).

Two queries:

* ``award_topics_create_input`` — the strict eligibility frontier:
  awards with BOTH display_name and description populated, not already
  in ``award_topics`` (LEFT ANTI JOIN), and whose description is
  MAJORITY LATIN — ``length(regexp_replace(description,
  '[^\\u0000-\\u00FF]', '')) >= length(description) * 0.5`` — because
  the BERT model produces catch-all garbage on non-Latin grants where
  English funder boilerplate sneaks past the inference-time filter
  (award_topics_create_input.ipynb cell 2, verbatim rule).

* ``award_topics_merge_state`` — the merge-output state: BERT
  predictions exploded, the majority-Latin gate RE-APPLIED on the
  stored description, per-element ``score >= 0.5`` low-confidence drop,
  hierarchy enrich over the topics/subfields/fields/domains metadata
  join, the reference's exact struct comparator (score DESC, then the
  URL-STRING id ASC — 'T12' < 'T3' lexically), top-3 slice, and the
  FULL merge semantics including ``WHEN NOT MATCHED BY SOURCE THEN
  DELETE`` (award_topics_merge_output.ipynb cell 3): the final state is
  exactly the filtered source — a target row whose award no longer
  qualifies is deleted, a matched row keeps its original
  created_datetime and takes the new updated_datetime, an inserted row
  takes both from the source.  This differs from the works-side
  ``topics_merge_output`` (no DELETE clause there — anti-joined
  survivors persist), which is why the awards chain earns its own
  queries rather than a docstring note.

Scores are exact 1e-4 multiples so ROUND(score, 4) is exact in both
engines (the works-side convention).  Timestamps surface as ISO date
strings (oracle-compared TIMESTAMP columns are session-timezone traps).

Scale: the metadata join broadcasts (the topic hierarchy is tiny); the
anti join and the per-award top-3 aggregate shuffle on award_id — the
natural key, uniform by construction.  At 100 TB the frontier is one
scan + one broadcast-anti pattern per incremental run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openalex_walden_spark.queries.registry import register

# Eligibility fixture: description mixes a Latin stem with a CJK tail
# whose length sweeps the 50% threshold; %6=0 rows lack a description,
# %6=1 rows lack a display_name; %3=0 awards are already in
# award_topics (the anti-join side).
_AWARDS_DUCK = """
  SELECT o_orderkey AS award_id,
         CASE WHEN o_orderkey % 6 <> 1
              THEN concat('Award ', CAST(o_orderkey AS VARCHAR)) END
           AS display_name,
         CASE WHEN o_orderkey % 6 <> 0
              THEN concat('Grant abstract ', CAST(o_orderkey AS VARCHAR),
                          ' ', repeat('研', CAST(o_orderkey % 40 AS INT)))
         END AS description
  FROM orders
"""

_LATIN_OK_DUCK = (
    "length(regexp_replace(description, '[^\\x00-\\xff]', '', 'g'))"
    " >= length(description) * 0.5"
)
_LATIN_OK_SPARK = (
    "length(regexp_replace(description, '[^\\\\u0000-\\\\u00FF]', ''))"
    " >= length(description) * 0.5"
)

_CREATE_INPUT_ORACLE = f"""
WITH awards AS ({_AWARDS_DUCK}),
existing AS (
  SELECT o_orderkey AS award_id FROM orders WHERE o_orderkey % 3 = 0
)
SELECT a.award_id, a.display_name, a.description
FROM awards a
LEFT JOIN existing e ON e.award_id = a.award_id
WHERE e.award_id IS NULL
  AND a.display_name IS NOT NULL
  AND a.description IS NOT NULL
  AND {_LATIN_OK_DUCK.replace("description", "a.description")}
ORDER BY a.award_id
"""


@register(
    "award_topics_create_input",
    oracle=_CREATE_INPUT_ORACLE,
    tags=("topics", "awards", "frontier"),
    tables=("orders",),
    doc=("Award-topics inference frontier "
         "(notebooks/topics/award_topics_create_input.ipynb)"),
)
def award_topics_create_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The award_topics_input build: strict eligibility (both text
    fields present), LEFT ANTI JOIN against the already-classified set,
    and the majority-Latin description rule, verbatim from
    award_topics_create_input.ipynb cell 2.

    Plan: one scan per side, anti join on award_id; the Latin-ratio
    predicate evaluates map-side before the join (only eligible rows
    shuffle)."""
    awards = spark.sql(f"""
        SELECT o_orderkey AS award_id,
               CASE WHEN o_orderkey % 6 <> 1
                    THEN concat('Award ', CAST(o_orderkey AS STRING)) END
                 AS display_name,
               CASE WHEN o_orderkey % 6 <> 0
                    THEN concat('Grant abstract ', CAST(o_orderkey AS STRING),
                                ' ', repeat('研', CAST(o_orderkey % 40 AS INT)))
               END AS description
        FROM orders
    """)
    existing = spark.table("orders").filter(
        F.col("o_orderkey") % 3 == 0
    ).select(F.col("o_orderkey").alias("award_id"))
    return (
        awards
        .filter(F.col("display_name").isNotNull()
                & F.col("description").isNotNull())
        .filter(F.expr(_LATIN_OK_SPARK))
        .join(existing, "award_id", "left_anti")
        .orderBy("award_id")
    )


# Merge fixture: lm output for awards %4=1 (1-4 predictions each, exact
# 4-decimal scores straddling the 0.5 confidence floor); descriptions
# as above (%5=0 of the lm awards turn majority-CJK and must drop);
# target state = awards %3=0 with an old created date.  Metadata reuses
# the works-side part/nation/region hierarchy fixture.

_META_DUCK = """
  SELECT (p_partkey % 40) AS topic_id, p_name AS t_name,
         n_name AS subfield_name, r_name AS field_name,
         concat('D', CAST((p_partkey % 40) % 2 AS VARCHAR)) AS domain_id
  FROM part
  JOIN nation ON n_nationkey = (p_partkey % 40) % 25
  JOIN region ON r_regionkey = (p_partkey % 40) % 5
  WHERE p_partkey <= 40
"""

_MERGE_ORACLE = f"""
WITH meta AS ({_META_DUCK}),
lm AS (
  SELECT o_orderkey AS award_id,
         ((o_orderkey * k) % 40) AS topic_id,
         ((o_orderkey * 7 + k * 13) % 9000 + 1000) / 10000.0 AS score,
         'bert_awards_v1' AS source,
         strftime(o_orderdate, '%Y-%m-%d') AS created_date,
         CASE WHEN o_orderkey % 5 = 0
              THEN concat('x ', repeat('研', 40))
              ELSE concat('Latin abstract ', CAST(o_orderkey AS VARCHAR)) END
           AS description
  FROM orders, UNNEST(range(1, 2 + (o_orderkey % 4)::INT)) AS t(k)
  WHERE o_orderkey % 4 = 1
),
gated AS (
  SELECT * FROM lm
  WHERE description IS NOT NULL AND length(description) > 0
    AND {_LATIN_OK_DUCK}
    AND score >= 0.5
),
target AS (
  SELECT o_orderkey AS award_id,
         strftime(o_orderdate - INTERVAL 400 DAY, '%Y-%m-%d')
           AS old_created
  FROM orders WHERE o_orderkey % 3 = 0
),
ranked AS (
  SELECT award_id, topic_id, t_name, subfield_name, field_name, domain_id,
         round(score, 4) AS score, source, created_date,
         row_number() OVER (
           PARTITION BY award_id
           ORDER BY round(score, 4) DESC,
                    concat('https://openalex.org/T',
                           CAST(topic_id AS VARCHAR)) ASC
         ) AS pos
  FROM gated JOIN meta USING (topic_id)
)
SELECT r.award_id, r.pos, r.topic_id, r.t_name AS display_name, r.score,
       r.subfield_name, r.field_name, r.domain_id, r.source,
       coalesce(t.old_created, r.created_date) AS created_date,
       r.created_date AS updated_date
FROM ranked r LEFT JOIN target t USING (award_id)
WHERE r.pos <= 3
ORDER BY r.award_id, r.pos
"""


@register(
    "award_topics_merge_state",
    oracle=_MERGE_ORACLE,
    tags=("topics", "awards", "merge", "topk"),
    tables=("orders", "part", "nation", "region"),
    doc=("Award-topics merge-output state "
         "(notebooks/topics/award_topics_merge_output.ipynb)"),
)
def award_topics_merge_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The award_topics MERGE, fully applied: majority-Latin re-gate +
    score >= 0.5 element filter + hierarchy enrich (broadcast) + the
    exact comparator top-3 + the WHEN NOT MATCHED BY SOURCE DELETE —
    final state == filtered source, matched rows keeping their original
    created_datetime (LEFT join to the prior state supplies it).

    Plan: metadata broadcast; one shuffle on award_id for the top-3
    aggregate; the prior-state join is a second award_id equi-join
    (same key, no extra skew surface)."""
    meta = (
        spark.table("part")
        .filter(F.col("p_partkey") <= 40)
        .select((F.col("p_partkey") % 40).alias("topic_id"),
                F.col("p_name").alias("t_name"))
        .join(spark.table("nation"), F.expr("n_nationkey = topic_id % 25"))
        .join(spark.table("region"), F.expr("r_regionkey = topic_id % 5"))
        .select(
            "topic_id", "t_name",
            F.col("n_name").alias("subfield_name"),
            F.col("r_name").alias("field_name"),
            F.concat(F.lit("D"), (F.col("topic_id") % 2).cast("string"))
            .alias("domain_id"),
        )
    )
    lm = (
        spark.table("orders")
        .filter(F.col("o_orderkey") % 4 == 1)
        .select(
            F.col("o_orderkey").alias("award_id"),
            F.col("o_orderdate"),
            F.explode(
                F.expr("sequence(1, CAST(1 + o_orderkey % 4 AS INT))")
            ).alias("k"),
        )
        .select(
            "award_id",
            ((F.col("award_id") * F.col("k")) % 40).alias("topic_id"),
            (((F.col("award_id") * 7 + F.col("k") * 13) % 9000 + 1000)
             / 10000.0).alias("score"),
            F.lit("bert_awards_v1").alias("source"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("created_date"),
            F.when(F.col("award_id") % 5 == 0,
                   F.concat(F.lit("x "), F.expr("repeat('研', 40)")))
            .otherwise(F.concat(F.lit("Latin abstract "),
                                F.col("award_id").cast("string")))
            .alias("description"),
        )
    )
    gated = lm.filter(
        F.col("description").isNotNull()
        & (F.length("description") > 0)
        & F.expr(_LATIN_OK_SPARK)
        & (F.col("score") >= 0.5)
    )
    target = (
        spark.table("orders")
        .filter(F.col("o_orderkey") % 3 == 0)
        .select(
            F.col("o_orderkey").alias("award_id"),
            F.date_format(F.expr("o_orderdate - INTERVAL 400 DAY"),
                          "yyyy-MM-dd").alias("old_created"),
        )
    )
    merged = (
        gated.join(F.broadcast(meta), "topic_id")
        .groupBy("award_id")
        .agg(
            F.expr(
                """slice(array_sort(
                     collect_list(named_struct(
                       'id', concat('https://openalex.org/T',
                                    CAST(topic_id AS STRING)),
                       'topic_id', topic_id, 't_name', t_name,
                       'subfield_name', subfield_name,
                       'field_name', field_name,
                       'domain_id', domain_id, 'score', round(score, 4))),
                     (l, r) -> CASE WHEN l.score > r.score THEN -1
                                    WHEN l.score < r.score THEN 1
                                    WHEN l.id < r.id THEN -1
                                    WHEN l.id > r.id THEN 1 ELSE 0 END),
                   1, 3)"""
            ).alias("topics"),
            F.max("source").alias("source"),
            F.max("created_date").alias("created_date"),
        )
    )
    return (
        merged.select(
            "award_id",
            F.posexplode("topics").alias("pos0", "t"),
            "source", "created_date",
        )
        .join(target, "award_id", "left")
        .select(
            "award_id",
            (F.col("pos0") + 1).alias("pos"),
            F.col("t.topic_id").alias("topic_id"),
            F.col("t.t_name").alias("display_name"),
            F.col("t.score").alias("score"),
            F.col("t.subfield_name").alias("subfield_name"),
            F.col("t.field_name").alias("field_name"),
            F.col("t.domain_id").alias("domain_id"),
            "source",
            F.coalesce("old_created", "created_date").alias("created_date"),
            F.col("created_date").alias("updated_date"),
        )
        .orderBy("award_id", "pos")
    )
