"""Maintenance operators (reference ``notebooks/maintenance/``).

``MergeFunders.ipynb``: entity merge via ALIAS rows, never deletes —
publishers keep depositing the loser's funder DOI forever, so the
loser row survives with ``merge_into_id`` set and every matcher
resolves ``COALESCE(merge_into_id, funder_id)``; the API layer filters
``merge_into_id IS NULL``.  ``delete_removed_sources_from_elastic.py``:
rows gone from the truth table anti-join into a delete feed for the
search indexes.  (``expunge_elasticsearch_deletes.py``'s safeguard
state machine lives in ``sinks/index_maintenance.py`` — it is an
index-admin orchestration, not a query.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openalex_walden_spark.queries.registry import register

# ---------------------------------------------------------------------------
# Funder alias merge: loser survives as an alias, matchers re-resolve
# ---------------------------------------------------------------------------
# Customer is the funder dim; the alias lattice merges every %19=3
# funder into its %19=4 neighbor.  Orders re-attribute through the
# coalesce, the API arm counts only non-alias rows, and the one-hop
# guard proves no alias chains survive resolution (the reference's
# matcher does exactly one COALESCE hop, so a chain would dangle).

_ALIAS_ORACLE = """
WITH funders AS (
  SELECT c_custkey AS funder_id,
         CASE WHEN c_custkey % 19 = 3 THEN c_custkey + 1 END AS merge_into_id
  FROM customer
),
resolved AS (
  SELECT o.o_orderkey,
         COALESCE(f.merge_into_id, f.funder_id) AS funder_id
  FROM orders o JOIN funders f ON f.funder_id = o.o_custkey
),
api_rows AS (
  SELECT funder_id FROM funders WHERE merge_into_id IS NULL
),
chains AS (
  SELECT count(*)::BIGINT AS n_chained
  FROM funders a JOIN funders b ON a.merge_into_id = b.funder_id
  WHERE b.merge_into_id IS NOT NULL
)
SELECT
  (SELECT count(*)::BIGINT FROM funders WHERE merge_into_id IS NOT NULL)
    AS n_aliases,
  (SELECT count(*)::BIGINT FROM api_rows) AS n_api_rows,
  (SELECT count(DISTINCT funder_id)::BIGINT FROM resolved) AS n_resolved_funders,
  (SELECT count(*)::BIGINT FROM resolved r
    WHERE NOT EXISTS (SELECT 1 FROM api_rows a WHERE a.funder_id = r.funder_id))
    AS n_dangling_attributions,
  (SELECT n_chained FROM chains) AS n_chained_aliases
"""


@register(
    "maint_funder_alias_merge",
    oracle=_ALIAS_ORACLE,
    tags=("maintenance", "alias", "domain"),
    tables=("customer", "orders"),
)
def maint_funder_alias_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funder entity merge via alias rows (MergeFunders.ipynb): the
    loser keeps its row + DOI, gains merge_into_id; attribution
    resolves one COALESCE hop; the API arm filters aliases out; and
    the invariant columns prove zero dangling attributions and zero
    alias chains.  The alias map broadcasts (aliases are a hand-curated
    trickle); resolution is map-side on the works scan."""
    funders = spark.table("customer").selectExpr(
        "c_custkey AS funder_id",
        "CASE WHEN c_custkey % 19 = 3 THEN c_custkey + 1 END AS merge_into_id",
    )
    funders.createOrReplaceTempView("maint_funders")
    return spark.sql("""
        WITH resolved AS (
          SELECT o.o_orderkey,
                 COALESCE(f.merge_into_id, f.funder_id) AS funder_id
          FROM orders o JOIN maint_funders f ON f.funder_id = o.o_custkey
        ),
        api_rows AS (
          SELECT funder_id FROM maint_funders WHERE merge_into_id IS NULL
        ),
        chains AS (
          SELECT count(*) AS n_chained
          FROM maint_funders a
          JOIN maint_funders b ON a.merge_into_id = b.funder_id
          WHERE b.merge_into_id IS NOT NULL
        )
        SELECT
          (SELECT count(*) FROM maint_funders
            WHERE merge_into_id IS NOT NULL) AS n_aliases,
          (SELECT count(*) FROM api_rows) AS n_api_rows,
          (SELECT count(DISTINCT funder_id) FROM resolved)
            AS n_resolved_funders,
          (SELECT count(*) FROM resolved r LEFT ANTI JOIN api_rows a
            ON a.funder_id = r.funder_id) AS n_dangling_attributions,
          (SELECT n_chained FROM chains) AS n_chained_aliases
    """)


# ---------------------------------------------------------------------------
# Removed-docs delete feed: truth-vs-index anti-join
# ---------------------------------------------------------------------------

_DELFEED_ORACLE = """
WITH truth AS (
  SELECT o_orderkey AS doc_id FROM orders WHERE o_orderkey % 13 <> 5
),
indexed AS (
  SELECT o_orderkey AS doc_id, o_orderkey % 6 AS shard FROM orders
)
SELECT shard, count(*)::BIGINT AS n_deletes
FROM indexed i
WHERE NOT EXISTS (SELECT 1 FROM truth t WHERE t.doc_id = i.doc_id)
GROUP BY shard
ORDER BY shard
"""


@register(
    "maint_removed_docs_delete_feed",
    oracle=_DELFEED_ORACLE,
    tags=("maintenance", "antijoin", "sink"),
    tables=("orders",),
)
def maint_removed_docs_delete_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete feed for removed docs (delete_removed_sources_from_
    elastic.py): ids present in the index state but gone from the
    truth table anti-join into per-shard delete batches for the bulk
    sink.  LEFT ANTI never materializes the (huge) surviving side; the
    rollup shuffles only the delete stragglers."""
    return spark.sql("""
        WITH truth AS (
          SELECT o_orderkey AS doc_id FROM orders WHERE o_orderkey % 13 <> 5
        ),
        indexed AS (
          SELECT o_orderkey AS doc_id, o_orderkey % 6 AS shard FROM orders
        )
        SELECT shard, count(*) AS n_deletes
        FROM indexed i LEFT ANTI JOIN truth t ON t.doc_id = i.doc_id
        GROUP BY shard
        ORDER BY shard
    """)
