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


def assign_cells(vectors: DataFrame, cents: list[list[int]], quant_scale: int) -> DataFrame:
    """Map-side cell assignment against trained centroids: quantize the
    embedding, fold the literal centroid array to the integer-L2 argmin.
    Works identically on batch AND streaming frames (no shuffle, no
    state) — which is what makes incremental index maintenance a plain
    ``writeStream``: new vectors route to their cell as they arrive and
    append into the cell-partitioned layout.
    """
    cents_col = F.array(
        *[
            F.struct(
                F.lit(i).alias("cl"),
                F.array(*[F.lit(int(v)) for v in qc]).alias("qc"),
            )
            for i, qc in enumerate(cents)
        ]
    )
    d2 = (
        "aggregate(zip_with(__qx, c.qc, (x, y) -> (x - y) * (x - y)), "
        "cast(0 as bigint), (acc, v) -> acc + v)"
    )
    argmin = (
        "aggregate(__cents, named_struct('d2', cast(4611686018427387904 as bigint), 'cl', -1), "
        f"(acc, c) -> CASE WHEN {d2} < acc.d2 "
        f"THEN named_struct('d2', {d2}, 'cl', c.cl) ELSE acc END)"
    )
    return (
        vectors.withColumn(
            "__qx",
            F.expr(
                f"transform(embedding, x -> cast(floor(cast(x as double) * {quant_scale}) as bigint) + {quant_scale})"
            ),
        )
        .withColumn("__cents", cents_col)
        .withColumn("cell", F.expr(argmin)["cl"])
        .drop("__qx", "__cents")
    )


def stream_into_index(
    vectors_stream: DataFrame,
    index_path: str,
    cents: list[list[int]],
    quant_scale: int,
    checkpoint_path: str,
) -> None:
    """Incremental index maintenance: drain a vector stream into the
    saved index's cell-partitioned assignment layout (availableNow —
    the nightly-cadence contract the batch MERGEs use).  Assignment is
    stateless and map-side, so the stream never shuffles; each
    micro-batch appends into ``assignments/cell=<k>/`` directories via
    foreachBatch (a plain batch append — NOT the streaming file sink,
    whose ``_spark_metadata`` log would make later batch reads ignore
    the index's original batch-written files), preserving the
    partition-pruned probe property of ``save_ivf_index``."""
    import os as _os

    target = _os.path.join(index_path, "assignments")

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            assign_cells(batch_df, cents, quant_scale)
            .select("vec_id", "cell")
            .write.mode("append")
            .partitionBy("cell")
            .parquet(target)
        )

    (
        vectors_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
