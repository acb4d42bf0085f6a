"""Author mean embeddings for AER (reference
``notebooks/vector_search/ComputeAuthorEmbeddings.ipynb``): the
per-author unweighted mean of work embeddings, computed with modulo
batching and checkpoint-resume.

Ported semantics:

* author→work attribution by exploding authorships and joining the
  embeddings table; the URL prefix strip on the author id;
* the elementwise mean via ``aggregate(collect_list(embedding),
  zeros, (acc, x) -> transform(acc, (v, i) -> v + x[i]))`` — the
  reference's HOF fold, then divide by work_count;
* modulo batching (``author_id % N``) with the anti-join resume gate:
  authors already in the output never recompute — the fixture
  pre-completes batch 0 and the query must only emit batches 1..N-1
  plus nothing from the completed set;
* the verification projections (embedding dim, L2 norm) folded into
  the output signature.

Determinism discipline: floating sums depend on fold order, so the
port runs the fold at integer fixed point (components scaled by 1000
and rounded — exact in 64-bit integers, order-independent) and divides
once at the end; both engines produce bit-identical doubles.  The same
discipline as the trained-IVF queries.

Scale: the reference's collect_list holds every vector of an author in
one aggregation buffer — fine for the p95 (≤ tens of works), and the
modulo batches bound any single job; the anti-join prunes completed
authors BEFORE the embeddings join so resume cost is the delta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openalex_walden_spark.queries.registry import register

_DIM = 64
_N_BATCHES = 3

# author seats <- lineitem ln<=3: author = (l_suppkey*7 + ln) % 120;
# the work's embedding row = vec_id (l_orderkey % 500);
# completed set (batch 0 already in the output) <- authors %3=0 with
# author %9 <> 4 (so SOME batch-0 authors are genuinely missing and the
# anti-join must keep them out anyway: completed means completed)

_ORACLE_EMB = f"""
WITH seats AS (
  SELECT CAST((l_suppkey * 7 + l_linenumber) % 120 AS BIGINT) AS author_id,
         l_orderkey % 500 AS vec_id
  FROM lineitem WHERE l_linenumber <= 3
),
completed AS (
  SELECT DISTINCT author_id FROM seats
  WHERE author_id % {_N_BATCHES} = 0 AND author_id % 9 <> 4
),
attributed AS (
  SELECT s.author_id, e.embedding
  FROM seats s
  JOIN embeddings e ON e.vec_id = s.vec_id
  WHERE s.author_id % {_N_BATCHES} IN (0, 1, 2)
    AND s.author_id NOT IN (SELECT author_id FROM completed)
),
fixedpt AS (
  SELECT author_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS emb_int
  FROM attributed
),
counts AS (
  SELECT author_id, CAST(count(*) AS INT) AS work_count FROM fixedpt GROUP BY author_id
),
dimsum AS (
  SELECT author_id, t.i, sum(emb_int[t.i + 1]) AS sv
  FROM fixedpt, UNNEST(range(0, {_DIM})) AS t(i)
  GROUP BY author_id, t.i
),
summed AS (
  SELECT d.author_id, c.work_count, list(d.sv ORDER BY d.i) AS sum_int
  FROM dimsum d JOIN counts c ON c.author_id = d.author_id
  GROUP BY d.author_id, c.work_count
)
SELECT author_id, work_count,
       CAST(list_aggregate(list_transform(sum_int, v -> v * v), 'sum') AS BIGINT) AS l2_sq_fixedpt,
       {_DIM} AS embedding_dim,
       array_to_string(list_transform(sum_int[1:3],
         v -> CAST(v AS VARCHAR)), ',') AS head3_fixedpt
FROM summed
ORDER BY author_id
"""


@register(
    "author_mean_embeddings",
    oracle=_ORACLE_EMB,
    tags=("embeddings", "vector", "resume"),
    tables=("lineitem", "embeddings"),
)
def author_mean_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-author mean work embedding with modulo batching and
    anti-join resume (ComputeAuthorEmbeddings.ipynb; see module
    docstring).  The fold is the reference's aggregate-HOF, run at
    integer fixed point so the mean is order-independent."""
    seats = spark.table("lineitem").where("l_linenumber <= 3").selectExpr(
        "CAST((l_suppkey * 7 + l_linenumber) % 120 AS BIGINT) AS author_id",
        "l_orderkey % 500 AS vec_id",
    )
    completed = (
        seats.where(f"author_id % {_N_BATCHES} = 0 AND author_id % 9 <> 4")
        .select("author_id")
        .distinct()
    )
    attributed = (
        seats.join(completed.withColumnRenamed("author_id", "done_id"),
                   F.col("author_id") == F.col("done_id"), "left_anti")
        .join(spark.table("embeddings").select("vec_id", "embedding"), "vec_id")
        .selectExpr(
            "author_id",
            "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS emb_int",
        )
    )
    summed = attributed.groupBy("author_id").agg(
        F.count("*").cast("int").alias("work_count"),
        F.expr(
            f"""aggregate(collect_list(emb_int),
                 cast(array_repeat(cast(0 AS BIGINT), {_DIM}) AS ARRAY<BIGINT>),
                 (acc, x) -> zip_with(acc, x, (a, b) -> a + b))"""
        ).alias("sum_int"),
    )
    # Outputs stay at the integer fixed point end-to-end: the mean and
    # L2 norm are exact rationals (sum_int / 1000n), so the oracle hash
    # never touches a float-formatting boundary.  Consumers divide once.
    return summed.selectExpr(
        "author_id",
        "work_count",
        "aggregate(transform(sum_int, v -> v * v),"
        " cast(0 AS BIGINT), (acc, v) -> acc + v) AS l2_sq_fixedpt",
        f"{_DIM} AS embedding_dim",
        "array_join(transform(slice(sum_int, 1, 3),"
        " v -> CAST(v AS STRING)), ',') AS head3_fixedpt",
    ).orderBy("author_id")
