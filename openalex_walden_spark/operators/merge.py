"""MERGE / SCD1 upsert emulation on plain parquet (no Delta required).

The reference leans on Delta ``MERGE INTO`` (~40 statements; J9/J10) and
DLT ``apply_changes`` SCD1 (``Crossref.py:594-602``,
``UnionAllWorksIntoLocationsParsed.ipynb`` cell 1). Open-source parity:

- With Delta OSS present, `merge_upsert` could be a real MERGE — the
  semantics here are the portable, dependency-free core.
- SCD1 is a *window-dedup materialization*: union target and source,
  keep the winner per key by (sequence DESC, source-beats-target,
  tie DESC) — the exact sequencing/out-of-order contract of
  ``apply_changes(sequence_by=…)``: a stale source row can never clobber
  a newer target row.

State tables are **versioned directories** (``v_00000001``, …) like
Delta commits: each MERGE writes a new full version and never mutates
the files the incoming plan is reading — no driver-side collect, no
read-under-write hazard, and time travel for free. Scale: the union +
window shuffles once on the key — the same exchange count as a
shuffle-MERGE; for nightly merges at 100 TB, partition each version by a
stable key hash so downstream reads prune.
"""

from __future__ import annotations

import os
import re
import shutil
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_V_RE = re.compile(r"^v_(\d{8})$")


def merge_upsert(
    target: DataFrame | None,
    source: DataFrame,
    keys: Sequence[str],
    sequence_col: str,
    delete_predicate: Column | None = None,
    tie_breaker: str | None = None,
) -> DataFrame:
    """SCD1 MERGE: newest record per key wins; optional delete propagation.

    Semantics (matching DLT ``apply_changes`` with ``stored_as_scd_type=1``):
    - rows are ranked per key by (sequence DESC, source-beats-target,
      tie_breaker DESC); rank 1 is the surviving state (St2);
    - intra-batch duplicates resolve in the same window pass;
    - if ``delete_predicate`` holds on the winner, the key is dropped
      (``apply_as_deletes`` — St4).
    """
    src = source.withColumn("_is_source", F.lit(1))
    if target is None:
        unioned = src
    else:
        unioned = target.withColumn("_is_source", F.lit(0)).unionByName(src)

    order = [F.col(sequence_col).desc(), F.col("_is_source").desc()]
    if tie_breaker:
        order.append(F.col(tie_breaker).desc())
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    winners = (
        unioned.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_is_source")
    )
    if delete_predicate is not None:
        winners = winners.where(~F.coalesce(delete_predicate, F.lit(False)))
    return winners


def _versions(state_path: str) -> list[int]:
    if not os.path.isdir(state_path):
        return []
    out = []
    for name in os.listdir(state_path):
        m = _V_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def current_version(state_path: str) -> int | None:
    vs = _versions(state_path)
    return vs[-1] if vs else None


def read_state(spark: SparkSession, state_path: str, version: int | None = None) -> DataFrame | None:
    """Read a state table at ``version`` (default: latest); None if empty."""
    v = current_version(state_path) if version is None else version
    if v is None:
        return None
    return spark.read.parquet(os.path.join(state_path, f"v_{v:08d}"))


def merge_into_state(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    keys: Sequence[str],
    sequence_col: str,
    delete_predicate: Column | None = None,
    tie_breaker: str | None = None,
    keep_versions: int = 2,
) -> DataFrame:
    """One MERGE round against a versioned parquet state table.

    Writes the merged result as the next version directory, prunes old
    versions beyond ``keep_versions``, and returns the new state.
    """
    target = read_state(spark, state_path)
    merged = merge_upsert(
        target, batch, keys, sequence_col, delete_predicate, tie_breaker
    )
    next_v = (current_version(state_path) or 0) + 1
    out = os.path.join(state_path, f"v_{next_v:08d}")
    merged.write.mode("overwrite").parquet(out)
    for v in _versions(state_path)[:-keep_versions]:
        shutil.rmtree(os.path.join(state_path, f"v_{v:08d}"), ignore_errors=True)
    return spark.read.parquet(out)
