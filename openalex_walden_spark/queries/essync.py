"""Search-index sync plane: per-entity id rules + stale reconciliation.

Catalog surface for ``sinks/sync_registry.py`` (the 20-script
``notebooks/elastic/sync_*.py`` family re-expressed as a config
registry plus the plan/reconcile/audit operators).  Two oracle-checked
queries:

- ``es_sync_stale_audit`` — the merge-loser reconciliation
  (sync_funders.py cells 5-7) as an anti-join with the mass-delete cap
  evidence in-row.
- ``es_sync_doc_ids`` — every registry entry's ``_id`` rule evaluated
  by BOTH engines from the same shared registry data, so a drifting
  rule or registry edit breaks the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openalex_walden_spark.queries.registry import register
from openalex_walden_spark.sinks.sync_registry import (
    SYNC_REGISTRY,
    doc_id_column,
    stale_audit,
)

# --------------------------------------------------------------------------
# Stale-doc reconciliation (sync_funders.py cells 5-7)
# --------------------------------------------------------------------------
# The index holds every customer from the last full sync; the API table
# has since dropped the merge losers (negative balance plays
# ``merge_into_id IS NOT NULL``).  Stale = index minus table; the row
# carries the total so the cap decision is part of the checked result.

_STALE_SQL = """
WITH table_ids AS (
  SELECT 'https://openalex.org/F' || CAST(c_custkey AS VARCHAR) AS id
  FROM customer WHERE c_acctbal >= 0
),
index_ids AS (
  SELECT 'https://openalex.org/F' || CAST(c_custkey AS VARCHAR) AS id
  FROM customer
),
stale AS (
  SELECT i.id AS stale_id
  FROM index_ids i LEFT JOIN table_ids t ON i.id = t.id
  WHERE t.id IS NULL
)
SELECT stale_id,
       (SELECT COUNT(*) FROM stale) AS total_stale,
       (SELECT COUNT(*) FROM stale) <= 2000 AS within_cap
FROM stale
"""


@register(
    "es_sync_stale_audit",
    oracle=_STALE_SQL,
    tags=("sink", "S5", "essync", "U4"),
    tables=("customer",),
)
def es_sync_stale_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-loser reconciliation (sync_funders.py cells 5-7): index
    docs whose id left the API table, via ``stale_audit``'s anti-join
    (the reference diffs driver-side Python sets — GBs of ids at works
    scale; the anti-join stays distributed), plus the mass-delete cap
    evidence.

    Plan: one left-anti hash join on the id; the total rides along as
    a broadcast scalar, no second scan of the fact table."""
    cust = spark.table("customer")
    fid = F.concat(
        F.lit("https://openalex.org/F"), F.col("c_custkey").cast("string")
    ).alias("id")
    table_ids = cust.where(F.col("c_acctbal") >= 0).select(fid)
    index_ids = cust.select(fid)
    stale = stale_audit(table_ids, index_ids, max_stale=2000).select(
        F.col("id").alias("stale_id")
    )
    total = stale.agg(F.count(F.lit(1)).alias("total_stale"))
    return stale.crossJoin(F.broadcast(total)).select(
        "stale_id",
        "total_stale",
        (F.col("total_stale") <= 2000).alias("within_cap"),
    )


# --------------------------------------------------------------------------
# Registry id rules, computed by both engines from the same spec data
# --------------------------------------------------------------------------
# One row per SYNC_REGISTRY entry with the entity's _id rule applied to a
# fixed sample key.  The oracle's VALUES literal is generated from the
# SAME tuple (single source of truth), but each engine EVALUATES the
# rule itself (concat / sha256 / composite), so a rule-implementation
# drift in either dialect breaks the hash, not just a registry edit.

_SAMPLE_KEY = "42"


def _spec_values() -> str:
    rows = ", ".join(
        f"('{c.entity}', '{c.index_name}', '{c.id_rule}', "
        f"'{c.id_prefix}', '{c.id_arg}')"
        for c in SYNC_REGISTRY.values()
    )
    return (
        "(VALUES "
        + rows
        + ") AS specs(entity, index_name, id_rule, id_prefix, id_arg)"
    )


_DOCID_SQL = f"""
SELECT entity, index_name,
       CASE id_rule
         WHEN 'prefix' THEN id_prefix || '{_SAMPLE_KEY}'
         WHEN 'sha256' THEN sha256('{_SAMPLE_KEY}')
         WHEN 'composite' THEN 'pmid:{_SAMPLE_KEY}'
         ELSE '{_SAMPLE_KEY}'
       END AS sample_doc_id
FROM {_spec_values()}
"""


@register(
    "es_sync_doc_ids",
    oracle=_DOCID_SQL,
    tags=("sink", "S5", "essync", "registry"),
    tables=(),
)
def es_sync_doc_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every sync entity's ``_id`` rule (notebooks/elastic/sync_*.py id
    construction lines), evaluated on a fixed sample key by
    ``doc_id_column`` on the Spark side and by equivalent SQL in
    DuckDB — both fed from the one SYNC_REGISTRY.

    Plan: a registry-sized local relation; entirely driver-trivial by design
    (the registry IS the data under test)."""
    frames = []
    for c in SYNC_REGISTRY.values():
        cols = "entity STRING, index_name STRING"
        row = [c.entity, c.index_name]
        if c.id_rule == "composite":
            first, second = c.id_arg.split(",")
            cols += f", {first} STRING, {second} STRING"
            row += ["pmid", _SAMPLE_KEY]
        elif c.id_rule == "sha256":
            cols += f", {c.id_arg} STRING"
            row += [_SAMPLE_KEY]
        frames.append(
            spark.createDataFrame([tuple(row)], cols).select(
                "entity",
                "index_name",
                doc_id_column(c, F.lit(_SAMPLE_KEY)).alias("sample_doc_id"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.coalesce(1)
