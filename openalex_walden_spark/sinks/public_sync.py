"""Quarterly public-snapshot sync (reference
``notebooks/snapshot/sync_to_public.py``).

The reference streams every staging object to the public bucket THROUGH
the cluster (two AWS accounts, no principal that can read staging AND
write public), distributing the copy across executors with
``mapPartitions`` so aggregate throughput scales with worker count, and
orders the run copy-first / delete-stale-LAST so an aborted run never
leaves the public prefix with fewer files than it started with.
Manifest URLs are repointed from the staging layout to the public
layout before publishing.

This engine keeps the exact orchestration — quarterly gate, distributed
copy plan, post-copy verification, manifest repoint, stale deletion
last — over ``pathlib`` IO, which on a cluster is swapped for the
object-store client inside the same ``mapPartitions`` closure (the plan
and ordering are the portable part; the byte mover is not).
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Sequence

from pyspark.sql import SparkSession


def _list_files(root: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out.append(os.path.relpath(p, root))
    return sorted(out)


def sync_snapshot_to_public(
    spark: SparkSession,
    staging_base: str,
    public_base: str,
    *,
    is_quarterly: bool,
    formats: Sequence[str] = ("jsonl", "parquet"),
    partitions: int = 8,
    copy_fn=shutil.copyfile,
) -> dict:
    """Sync ``staging_base`` -> ``public_base``. Returns a report dict.

    ``copy_fn(src, dst)`` is the byte mover shipped to executors —
    the local default is ``shutil.copyfile``; a cluster passes the
    object-store streamer (the reference's boto3 closure).

    Ordering guarantees (the reference's contract):
      1. quarterly gate — monthly runs exit without touching public;
      2. every data file is copied (distributed via mapPartitions) and
         size-verified BEFORE anything is deleted;
      3. manifests are repointed staging->public and written only after
         the verified copy;
      4. stale public objects are deleted LAST; any copy/verify failure
         raises before deletion, so public never shrinks on a failed run.
    """
    if not is_quarterly:
        return {"status": "skipped", "reason": "monthly run, no public sync"}

    rel_files = [
        f
        for f in _list_files(staging_base)
        if not f.endswith("manifest.json")
        and any(f.startswith(fmt + os.sep) for fmt in formats)
    ]
    # Distributed copy: executors stream object->object; locally the
    # closure copies files. The PLAN (file list, partitioning, retry
    # unit) is what ports; swap the byte mover for boto3 on a cluster.
    sc = spark.sparkContext
    src_root, dst_root = staging_base, public_base

    def _copy_partition(it):
        copied = []
        for rel in it:
            src = os.path.join(src_root, rel)
            dst = os.path.join(dst_root, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            copy_fn(src, dst)
            copied.append((rel, os.path.getsize(src), os.path.getsize(dst)))
        return copied

    results = (
        sc.parallelize(rel_files, max(1, min(partitions, len(rel_files) or 1)))
        .mapPartitions(_copy_partition)
        .collect()
    )
    bad = [r for r in results if r[1] != r[2]]
    if bad or len(results) != len(rel_files):
        raise RuntimeError(
            f"copy verification failed: {len(bad)} size mismatches, "
            f"{len(rel_files) - len(results)} missing — stale files NOT deleted"
        )

    # Manifests: repoint every staging URL to the public layout.
    staging_prefix = staging_base.rstrip("/") + "/"
    public_prefix = public_base.rstrip("/") + "/"
    n_manifests = 0
    for rel in _list_files(staging_base):
        if not rel.endswith("manifest.json"):
            continue
        if not any(rel.startswith(fmt + os.sep) for fmt in formats):
            continue
        with open(os.path.join(staging_base, rel)) as fh:
            text = fh.read()
        dst = os.path.join(public_base, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with open(dst, "w") as fh:
            fh.write(text.replace(staging_prefix, public_prefix))
        n_manifests += 1

    # Stale deletion LAST: public objects not in this snapshot.
    wanted = set(rel_files) | {
        f for f in _list_files(staging_base) if f.endswith("manifest.json")
    }
    stale = [
        f
        for f in _list_files(public_base)
        if any(f.startswith(fmt + os.sep) for fmt in formats)
        and f not in wanted
    ]
    for rel in stale:
        os.remove(os.path.join(public_base, rel))

    return {
        "status": "synced",
        "n_files": len(results),
        "n_manifests": n_manifests,
        "n_stale_deleted": len(stale),
        "bytes": sum(r[1] for r in results),
    }
