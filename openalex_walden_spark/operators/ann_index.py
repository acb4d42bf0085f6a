"""Trained-IVF index persistence: build once, search many.

``queries/advanced.py`` trains the coarse quantizer and searches in one
plan — correct for the oracle gate, but a production similarity-search
deployment trains ONCE and serves many query batches against the saved
artifact (the reference materializes its vector-search layout the same
way: precomputed embedding/centroid tables, e.g.
``notebooks/vector_search/ZOrderWorkEmbeddings.ipynb``).  This module is
that artifact path:

- ``save_ivf_index``: writes ``centroids/`` (cell, qc[]) and
  ``assignments/`` (vec_id, cell) as parquet plus a ``manifest.json``
  carrying the training parameters and an integrity fingerprint of the
  centroids.  Assignments are written partitioned by cell, so a probe
  of P cells reads exactly P directories (partition pruning IS the
  index).
- ``load_ivf_index``: validates the manifest (quantization scale and
  k must match what the searcher expects; fingerprint must match the
  stored centroids) and returns the two tables.

Everything stored is integer-exact (the trainer's fixed-point
centroids), so an index written by one cluster and read by another
reproduces bit-identical routing.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "manifest.json"


def _centroid_fingerprint(cents: list[list[int]]) -> str:
    import hashlib

    h = hashlib.md5()
    for qc in cents:
        h.update((",".join(str(v) for v in qc) + ";").encode())
    return h.hexdigest()


def save_ivf_index(
    spark: SparkSession,
    path: str,
    cents: list[list[int]],
    assignments: DataFrame,
    quant_scale: int,
) -> None:
    """Persist a trained IVF index. ``assignments`` must be
    (vec_id, cell); ``cents`` is the trainer's centroid list."""
    cdf = spark.createDataFrame(
        [(i, [int(v) for v in qc]) for i, qc in enumerate(cents)],
        "cell int, qc array<bigint>",
    )
    cdf.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    (
        assignments.select("vec_id", "cell")
        .repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(path, "assignments"))
    )
    manifest = {
        "format": "ivf-fixedpoint-v1",
        "k": len(cents),
        "dim": len(cents[0]) if cents else 0,
        "quant_scale": quant_scale,
        "centroid_md5": _centroid_fingerprint(cents),
    }
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, sort_keys=True, indent=1)


def load_ivf_index(
    spark: SparkSession, path: str, expect_quant_scale: int | None = None
) -> tuple[list[list[int]], DataFrame, dict]:
    """Load and validate a saved index; returns (centroids, assignments,
    manifest). Raises ValueError on a corrupt or mismatched artifact —
    serving against a silently-wrong index is the failure mode this
    guards."""
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    if manifest.get("format") != "ivf-fixedpoint-v1":
        raise ValueError(f"unknown index format: {manifest.get('format')!r}")
    if (
        expect_quant_scale is not None
        and manifest["quant_scale"] != expect_quant_scale
    ):
        raise ValueError(
            f"index quantization {manifest['quant_scale']} != searcher's "
            f"{expect_quant_scale}: routing would be silently wrong"
        )
    cdf = spark.read.parquet(os.path.join(path, "centroids"))
    rows = sorted(cdf.collect(), key=lambda r: r["cell"])
    cents = [[int(v) for v in r["qc"]] for r in rows]
    if len(cents) != manifest["k"]:
        raise ValueError(f"centroid count {len(cents)} != manifest k {manifest['k']}")
    if _centroid_fingerprint(cents) != manifest["centroid_md5"]:
        raise ValueError("centroid fingerprint mismatch: corrupt index")
    assignments = spark.read.parquet(os.path.join(path, "assignments")).select(
        "vec_id", F.col("cell").cast("int").alias("cell")
    )
    return cents, assignments, manifest
