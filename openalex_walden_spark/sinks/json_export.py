"""S6: API-shaped JSON snapshot export with manifest.

The reference's snapshot sink (``export_works.ipynb`` cells 3-5 +
``_utils.py``): rows → ``to_json(struct(...))`` → partitioned text files
+ a manifest listing file sizes/counts. Same shape here on the local
filesystem; on a cluster the path is s3a:// and nothing changes.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openalex_walden_spark.functions.normalize import sanitize_for_serving


def to_json_docs(df: DataFrame, cols: Sequence[str | Column], sanitize: Sequence[str] = ()) -> DataFrame:
    """Project rows into single-column JSON documents (column order =
    field order). ``sanitize`` names string columns passed through the
    serving sanitizer (P13) first."""
    fields = []
    for c in cols:
        col = F.col(c) if isinstance(c, str) else c
        name = c if isinstance(c, str) else col._jc.toString().split(" AS ")[-1]  # noqa: SLF001
        if isinstance(c, str) and c in sanitize:
            col = sanitize_for_serving(col)
        fields.append(col.alias(name))
    return df.select(F.to_json(F.struct(*fields)).alias("doc"))


def export_snapshot(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    sanitize: Sequence[str] = (),
    partitions: int | None = None,
) -> dict:
    """Write the export + manifest; returns the manifest dict.

    Partition-count heuristic mirrors the reference's serving ladder
    (sync_works.ipynb cell 4): explicit override > leave as planned.
    """
    docs = to_json_docs(df, cols, sanitize)
    if partitions is not None:
        docs = docs.repartition(partitions)
    docs.write.mode("overwrite").text(path)
    files = sorted(
        f for f in os.listdir(path) if f.startswith("part-") and not f.endswith(".crc")
    )
    manifest = {
        "entries": [
            {"file": f, "bytes": os.path.getsize(os.path.join(path, f))} for f in files
        ],
        "n_files": len(files),
        "total_bytes": sum(os.path.getsize(os.path.join(path, f)) for f in files),
    }
    with open(os.path.join(path, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    return manifest


def write_clustered(
    df,
    path: str,
    cluster_cols: Sequence[str],
    n_files: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Data-layout write: range-partition by the cluster key, sort within
    partitions — the open equivalent of the reference's `CLUSTER BY` /
    `ZORDER` layout discipline (`CreateLocationsMapped.sql:59-88`,
    `CreateAuthors.ipynb` ZORDER): min/max file statistics become
    selective, so key-ranged scans skip files.
    """
    cols = [F.col(c) for c in cluster_cols]
    out = df.repartitionByRange(*([n_files] if n_files else []), *cols)
    out.sortWithinPartitions(*cols).write.format(fmt).mode("overwrite").save(path)


# Snapshot-scale salting ladder (reference notebooks/snapshot/_utils.py
# ``_apply_salting``): the snapshot export partitions by updated_date,
# and one date can hold 100M+ records (works ~500M total), so the salt
# modulus SCALES with the partition's record count — tiny dates get one
# file, the 100M+ date gets 1400 salts.  The date counts are computed
# ONCE per entity and broadcast back (the reference collects them to
# the driver for the same reason: a handful of rows steering a 500M-row
# write).  The hash is the engine-portable stable_hash64, not Spark's
# Murmur3, so oracle replays and cross-engine consumers agree on file
# assignment.
_SALT_LADDER = (
    (100_000_000, 1400),
    (40_000_000, 160),
    (10_000_000, 50),
    (5_000_000, 25),
    (2_000_000, 10),
    (800_000, 3),
)


def apply_salting(
    df: DataFrame,
    id_col: str = "id",
    date_col: str = "partition_date",
    ladder: tuple[tuple[int, int], ...] = _SALT_LADDER,
) -> DataFrame:
    """Add a ``salt`` column whose modulus scales with the partition
    date's record count, per the reference's ladder.  ``ladder`` is
    (threshold, modulus) pairs, highest threshold first — the battery
    passes small thresholds to exercise every tier at fixture scale;
    production uses the default (the reference's exact ladder)."""
    from openalex_walden_spark.functions.hashing import stable_hash64

    counts = df.groupBy(date_col).agg(F.count(F.lit(1)).alias("date_count"))
    h = stable_hash64(F.col(id_col).cast("string"))
    expr = F.lit(0)
    for threshold, modulus in sorted(ladder):
        expr = F.when(F.col("date_count") > threshold, h % modulus).otherwise(
            expr
        )
    return (
        df.join(F.broadcast(counts), date_col)
        .withColumn("salt", expr.cast("bigint"))
        .drop("date_count")
    )


def finalize_snapshot_meta(
    base_dir: str,
    date_str: str,
    entities: Sequence[str],
    formats: Sequence[str] = ("jsonl", "parquet"),
) -> dict:
    """Snapshot finalizer (reference ``update_meta.ipynb``): merge the
    per-entity ``_meta/{format}/{entity}.json`` files written by the
    export tasks into one combined ``{format}/manifest.json`` per
    format (plus a per-entity manifest beside each entity's files),
    then remove the ``_meta``/``_temp`` working directories.  A missing
    per-entity meta degrades to a zero entry with a warning flag, never
    a failure — the reference logs and continues, because a partial
    manifest that names what IS there beats an aborted finalize.
    Returns ``{format: combined_manifest}``.  Runs on the driver: the
    inputs are one small JSON per entity, by construction."""
    import shutil

    out: dict[str, dict] = {}
    root = os.path.join(base_dir, date_str)
    for fmt in formats:
        combined = []
        for entity in entities:
            meta_path = os.path.join(root, "_meta", fmt, f"{entity}.json")
            missing = not os.path.exists(meta_path)
            if missing:
                meta = {"record_count": 0, "content_length": 0, "files": []}
            else:
                with open(meta_path) as fh:
                    meta = json.load(fh)
            entry = {
                "entity": entity,
                "record_count": meta.get("record_count", 0),
                "content_length": meta.get("content_length", 0),
                "files": meta.get("files", []),
            }
            if missing:
                entry["missing_meta"] = True
            ent_dir = os.path.join(root, fmt, entity)
            os.makedirs(ent_dir, exist_ok=True)
            with open(os.path.join(ent_dir, "manifest.json"), "w") as fh:
                json.dump(
                    {"date": date_str, "format": fmt, **entry},
                    fh, indent=2, sort_keys=True,
                )
            combined.append(entry)
        manifest = {
            "date": date_str,
            "format": fmt,
            "entities": combined,
            "record_count": sum(e["record_count"] for e in combined),
            "content_length": sum(e["content_length"] for e in combined),
        }
        fmt_dir = os.path.join(root, fmt)
        os.makedirs(fmt_dir, exist_ok=True)
        with open(os.path.join(fmt_dir, "manifest.json"), "w") as fh:
            json.dump(manifest, fh, indent=2, sort_keys=True)
        out[fmt] = manifest
    for dirname in ("_meta", "_temp"):
        p = os.path.join(root, dirname)
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
    return out
