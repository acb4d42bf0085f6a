"""Graph analytics operators over the citation-style edge plane.

The reference's citation plane (`CreateWorksEnriched.ipynb` cited-by
rollups; repo analogues d5_*) stops at degree counts.  A 100-TB corpus
pipeline additionally wants global graph signals — PageRank-style
centrality for quality weighting (the classic webgraph signal used in
pretraining-data curation) — computed without any driver-side iteration
state.

**Determinism engineering**: floating-point PageRank is order-dependent
(the per-node sum of neighbor contributions lands in whatever order the
partial aggregates arrive), so the scores here are FIXED-POINT BIGINTs:
1.0 == 10^12, every contribution is an exact integer division, and
integer addition commutes — Spark and the DuckDB oracle produce
bit-identical scores regardless of aggregation order.  Dangling-node
mass is dropped (the standard simplification); damping 0.85 is applied
as (85 * x) // 100.

**Scale shape**: each iteration is one equi-join edges⋈scores on src
(both sides partitioned by the join key) plus one dst-keyed aggregate —
the same two shuffles a Pregel superstep costs.  Iterations are unrolled
into a single declarative plan; on a real cluster you would checkpoint
the score table between iterations to cut lineage, and pre-partition
``edges`` by src once so every superstep reuses the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openalex_walden_spark.queries.registry import register

_PR_NODES = 1024
_PR_ONE = 1_000_000_000_000  # fixed-point 1.0
_PR_BASE = 150_000_000_000  # (1 - 0.85) * ONE
_PR_ITERS = 3


def _pr_iter_sql(prev: str, out: str) -> str:
    return f"""
{out} AS (
  SELECT n.node,
         CAST({_PR_BASE} + (85 * COALESCE(c.inmass, 0)) // 100 AS BIGINT) AS score
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM(p.score // o.d) AS BIGINT) AS inmass
    FROM edges e
    JOIN {prev} p ON p.node = e.src
    JOIN outdeg o ON o.src = e.src
    GROUP BY e.dst
  ) c ON c.node = n.node
)"""


_PR_SQL = (
    f"""
WITH edges AS (
  SELECT DISTINCT l_orderkey % {_PR_NODES} AS src, l_partkey % {_PR_NODES} AS dst
  FROM lineitem
  WHERE l_orderkey % {_PR_NODES} <> l_partkey % {_PR_NODES}
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
outdeg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
s0 AS (SELECT node, CAST({_PR_ONE} AS BIGINT) AS score FROM nodes),"""
    + ",".join(_pr_iter_sql(f"s{i}", f"s{i + 1}") for i in range(_PR_ITERS))
    + f"""
SELECT node, score AS pagerank_fp FROM s{_PR_ITERS}
"""
)


@register(
    "graph_pagerank_fixedpoint",
    oracle=_PR_SQL,
    tags=("graph", "pagerank", "iterative"),
    tables=("lineitem",),
)
def graph_pagerank_fixedpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank over the order→part edge plane (node ids
    folded mod 1024 so the oracle's unrolled CTE chain stays cheap at
    any SF), fixed-point BIGINT scores — see module docstring for the
    determinism and scale rationale."""
    li = spark.table("lineitem")
    src = (F.col("l_orderkey") % _PR_NODES).alias("src")
    dst = (F.col("l_partkey") % _PR_NODES).alias("dst")
    edges = li.select(src, dst).where(F.col("src") != F.col("dst")).distinct()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("d"))

    scores = nodes.select("node", F.lit(_PR_ONE).cast("bigint").alias("score"))
    for _ in range(_PR_ITERS):
        inmass = (
            edges.join(scores.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select("dst", F.expr("score div d").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inmass"))
        )
        scores = (
            nodes.join(inmass.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit(_PR_BASE)
                    + F.expr("(85 * coalesce(inmass, cast(0 as bigint))) div 100")
                )
                .cast("bigint")
                .alias("score"),
            )
        )
    return scores.select("node", F.col("score").alias("pagerank_fp"))
