"""Stateful work-identity resolution (D2): the MERGE cascade with
adopt-vs-mint semantics across runs.

The reference's ``CreateLocationsMapped.sql:103-1170`` is the heart of
the system: each nightly run joins incoming location records against the
persistent ``work_id_map`` through a key cascade (doi → pmid → arxiv →
title_author), adopts the mapped id on the first hit, canonicalizes
multi-hit groups to the minimum id, and mints fresh ids above a
high-water mark for records no key resolves (identity column ``START
WITH 6600000001``; open-source replacement: max-id + row_number, the
reference's own author-id pattern — ``MatchAuthors.ipynb`` cell 11).

Subtleties carried over:
- **Two-pass discipline**: within one run, records that share a key with
  a *newly minted* record must receive the same new id (the reference
  needed a second MERGE pass to avoid multi-match). Here the mint pass
  groups unresolved records by their strongest key first, so one id is
  minted per unresolved entity, not per record.
- **Idempotency**: re-running the same batch adopts every id minted by
  the previous run and mints nothing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_ID_FLOOR = 6_600_000_000


def _ranked_keys(keys: DataFrame, key_col: str) -> DataFrame:
    """Distinct keys range-partitioned ascending with a per-partition
    rank — the shuffle shape assign_dense_ids pins (audited by
    tests/test_identity.py against this pre-checkpoint plan)."""
    spark = keys.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        keys.select(key_col)
        .distinct()
        .repartitionByRange(n_parts, F.col(key_col).asc())
        # Materialize the physical partition id BEFORE the window's own
        # shuffle; spark_partition_id() is non-deterministic so Catalyst
        # will not reorder it across the exchange.
        .withColumn("_pid", F.spark_partition_id())
    )
    local_w = Window.partitionBy("_pid").orderBy(F.col(key_col).asc())
    return ranged.withColumn("_local", F.row_number().over(local_w))


def assign_dense_ids(
    keys: DataFrame, key_col: str, start: int
) -> DataFrame:
    """Assign ``start + 1 .. start + K`` to the K distinct ``key_col``
    values in ascending key order — the deterministic equivalent of
    ``dense_rank() OVER (ORDER BY key)`` WITHOUT the single-partition
    global sort that a Window with no PARTITION BY forces (on a cold
    100× run every key is unresolved, and one task sorting them all is
    the scale-killer).

    Two passes, byte-identical output to the global window:
    1. range-partition the distinct keys (ascending partition ids hold
       ascending key ranges), rank *within* each partition;
    2. collect the per-partition counts (one int per partition — bounded
       by ``spark.sql.shuffle.partitions``, not by data) and add each
       partition's exclusive prefix sum as its offset.
    """
    spark = keys.sparkSession
    # localCheckpoint BEFORE the two consumers: the counts collect and
    # the final join are separate jobs, and repartitionByRange samples
    # its boundaries per execution — two executions could place a
    # boundary key in different partitions and mint colliding ids.
    # Pinning the ranked frame makes both jobs read the same placement.
    ranked = _ranked_keys(keys, key_col).localCheckpoint()
    counts = {
        r["_pid"]: r["n"]
        for r in ranked.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    if offsets:
        off_df = spark.createDataFrame(offsets, "_pid int, _off long")
    else:
        off_df = spark.createDataFrame([], "_pid int, _off long")
    return (
        ranked.join(F.broadcast(off_df), "_pid")
        .select(
            key_col,
            (F.lit(start) + F.col("_off") + F.col("_local")).alias("_minted_id"),
        )
    )


def resolve_work_ids(
    spark: SparkSession,
    id_map: DataFrame | None,
    records: DataFrame,
    key_cols: Sequence[str],
    record_key: str = "record_id",
    id_floor: int = DEFAULT_ID_FLOOR,
) -> tuple[DataFrame, DataFrame]:
    """One resolution run.

    ``id_map`` holds (key_kind, key_value, work_id) rows — one per known
    identity key. ``records`` carries ``record_key`` plus the cascade's
    ``key_cols`` (earlier = stronger; NULLs allowed). Returns
    ``(assignments, new_id_map)`` where assignments is
    (record_id, work_id, resolved_via).

    Scale: each cascade tier is one broadcast-able equi-join against the
    map partition for that key kind; minting is one shuffle on the
    strongest unresolved key. No driver-side loops over rows — the only
    driver value is the high-water mark (a 1-row aggregate, exactly what
    the reference's DECLARE VARIABLE does).
    """
    empty_map = id_map is None
    if empty_map:
        from pyspark.sql.types import LongType, StringType, StructType

        schema = (
            StructType()
            .add("key_kind", StringType())
            .add("key_value", StringType())
            .add("work_id", LongType())
        )
        id_map = spark.createDataFrame([], schema)

    # Cascade: left-join each key tier, first non-null mapped id wins.
    out = records
    adopted_cols = []
    for kc in key_cols:
        tier = (
            id_map.where(F.col("key_kind") == kc)
            .select(
                F.col("key_value").alias(f"_k_{kc}"),
                F.col("work_id").alias(f"_id_{kc}"),
            )
        )
        out = out.join(
            F.broadcast(tier), out[kc] == tier[f"_k_{kc}"], "left"
        ).drop(f"_k_{kc}")
        adopted_cols.append(F.col(f"_id_{kc}"))

    resolved_via = F.lit(None).cast("string")
    for kc in reversed(key_cols):
        resolved_via = F.when(
            F.col(f"_id_{kc}").isNotNull(), F.lit(kc)
        ).otherwise(resolved_via)
    out = out.withColumn("_adopted", F.coalesce(*adopted_cols)).withColumn(
        "_via", resolved_via
    )

    # Mint: group unresolved records by their strongest present key so
    # same-key records share one new id (the two-pass multi-match fix).
    # The mint key is namespaced by key KIND — two unresolved records
    # whose strongest keys are of different kinds but equal strings
    # (pmid 'X' vs title_author 'X', or a record_id colliding with a key
    # value) are distinct entities and must not share a minted id.
    strongest = F.coalesce(
        *[F.concat(F.lit(f"{kc}:"), F.col(kc)) for kc in key_cols],
        F.concat(F.lit("rec:"), F.col(record_key).cast("string")),
    )
    unresolved = out.where(F.col("_adopted").isNull()).withColumn("_mint_key", strongest)
    high_water = (id_map.agg(F.max("work_id")).collect()[0][0]) or id_floor
    minted_keys = assign_dense_ids(unresolved, "_mint_key", high_water)
    unresolved = unresolved.join(minted_keys, "_mint_key")

    assignments = (
        out.where(F.col("_adopted").isNotNull())
        .select(
            F.col(record_key),
            F.col("_adopted").alias("work_id"),
            F.col("_via").alias("resolved_via"),
        )
        .unionByName(
            unresolved.select(
                F.col(record_key),
                F.col("_minted_id").cast("long").alias("work_id"),
                F.lit("minted").alias("resolved_via"),
            )
        )
    )

    # New map entries: every (key_kind, key_value) of every record now
    # points at its work_id; min-id canonicalization on conflict.
    keyed = records.join(assignments, record_key)
    new_entries = None
    for kc in key_cols:
        e = keyed.where(F.col(kc).isNotNull()).select(
            F.lit(kc).alias("key_kind"),
            F.col(kc).alias("key_value"),
            F.col("work_id"),
        )
        new_entries = e if new_entries is None else new_entries.unionByName(e)
    merged_map = (
        id_map.unionByName(new_entries)
        .groupBy("key_kind", "key_value")
        .agg(F.min("work_id").alias("work_id"))
    )
    return assignments, merged_map
