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
  stored centroids) and returns the two tables, unioning any
  stream-appended assignment batches.
- ``stream_into_index``: incremental maintenance.  Each micro-batch
  lands in its OWN ``assignments_stream/batch_id=<id>/cell=<k>/``
  directory written with overwrite, so a Structured Streaming retry of
  a failed batch REPLACES the partial write instead of appending a
  duplicate — exactly-once at the directory level with no ledger and
  no load-time dedup shuffle.

All small-file IO (the manifest) goes through the Hadoop FileSystem
API resolved from the active session, so index paths may live on any
supported filesystem (local, HDFS, S3A...), same as the parquet halves.

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
_STREAM_DIR = "assignments_stream"


def _fs_and_path(spark: SparkSession, path: str):
    """(Hadoop FileSystem, Path) for ``path`` under the session's conf.
    Classic PySpark only (uses the JVM gateway) — the same boundary the
    rest of the repo's driver-side helpers assume."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _write_small_file(spark: SparkSession, path: str, data: str) -> None:
    fs, hpath = _fs_and_path(spark, path)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(data.encode("utf-8")))
    finally:
        out.close()


def _read_small_file(spark: SparkSession, path: str) -> str:
    fs, hpath = _fs_and_path(spark, path)
    stream = fs.open(hpath)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


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
    _write_small_file(
        spark,
        os.path.join(path, _MANIFEST),
        json.dumps(manifest, sort_keys=True, indent=1),
    )


def load_ivf_index(
    spark: SparkSession, path: str, expect_quant_scale: int | None = None
) -> tuple[list[list[int]], DataFrame, dict]:
    """Load and validate a saved index; returns (centroids, assignments,
    manifest). Raises ValueError on a corrupt or mismatched artifact —
    serving against a silently-wrong index is the failure mode this
    guards.  Assignments = the base build UNION ALL any stream-appended
    batches (both cell-partitioned, so a P-cell probe still reads
    exactly the P matching directories of each layout)."""
    manifest = json.loads(_read_small_file(spark, os.path.join(path, _MANIFEST)))
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
    stream_path = os.path.join(path, _STREAM_DIR)
    fs, spath = _fs_and_path(spark, stream_path)
    if fs.exists(spath):
        # Explicit schema: an empty micro-batch still creates its
        # batch_id=<id>/ dir with only _SUCCESS, and schema INFERENCE
        # over a data-file-less tree fails with "Unable to infer
        # schema" — an index whose stream delivered no rows must still
        # load.  vec_id reuses the BASE layout's type (the stream is
        # written from the same source), and the partition columns
        # (cell, batch_id) take their values from the directory names.
        from pyspark.sql.types import IntegerType, LongType, StructField, StructType

        vec_field = next(f for f in assignments.schema.fields if f.name == "vec_id")
        stream_schema = StructType(
            [
                StructField("vec_id", vec_field.dataType),
                StructField("cell", IntegerType()),
                StructField("batch_id", LongType()),
            ]
        )
        streamed = (
            spark.read.schema(stream_schema)
            .parquet(stream_path)
            .select("vec_id", F.col("cell").cast("int").alias("cell"))
        )
        assignments = assignments.unionByName(streamed)
    return cents, assignments, manifest


def assign_cells(vectors: DataFrame, cents: list[list[int]], quant_scale: int) -> DataFrame:
    """Map-side cell assignment against trained centroids: quantize the
    embedding, fold the literal centroid array to the integer-L2 argmin.
    Works identically on batch AND streaming frames (no shuffle, no
    state) — which is what makes incremental index maintenance a plain
    ``writeStream``: new vectors route to their cell as they arrive and
    append into the cell-partitioned layout.
    """
    # One parsed literal, not k x (dim+2) Column calls (each F.lit is a
    # py4j round trip — ~0.5s of driver time per call at k=10, dim=64;
    # same fix as queries/advanced._tr_cent_array).
    cents_col = F.expr(
        "array(%s)"
        % ",".join(
            "named_struct('cl',%d,'qc',array(%s))"
            % (i, ",".join(str(int(v)) for v in qc))
            for i, qc in enumerate(cents)
        )
    )
    d2 = (
        "aggregate(zip_with(__qx, c.qc, (x, y) -> (x - y) * (x - y)), "
        "cast(0 as bigint), (acc, v) -> acc + v)"
    )
    # array_min over (d2, cl) structs == the old CASE fold's argmin
    # (lexicographic min keeps the smallest cl on d2 ties, exactly like
    # strict < keeping the earliest cell), but evaluates the 64-element
    # distance aggregate ONCE per centroid instead of twice — Catalyst
    # does not CSE inside lambda bodies (same fix as _TR_ARGMIN).
    # Same precondition as _TR_ARGMIN (see queries/advanced.py): vectors
    # must be full-width with non-null elements, or the NULL d2 a
    # zip_with length mismatch produces would sort FIRST in array_min
    # where the old fold skipped it.
    argmin = f"array_min(transform(__cents, c -> named_struct('d2', {d2}, 'cl', c.cl)))"
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


def write_stream_batch(
    batch_df: DataFrame,
    index_path: str,
    cents: list[list[int]],
    quant_scale: int,
    batch_id: int,
) -> None:
    """Idempotent per-micro-batch index append: assign cells map-side
    and OVERWRITE ``assignments_stream/batch_id=<id>/`` (cell-
    partitioned inside).  Structured Streaming re-delivers a failed
    batch under the SAME batch_id, so a retry replaces the partial
    directory instead of duplicating rows — duplicated assignments
    would duplicate probe candidates and let one neighbour occupy two
    top-k slots."""
    target = os.path.join(index_path, _STREAM_DIR, f"batch_id={batch_id}")
    (
        assign_cells(batch_df, cents, quant_scale)
        .select("vec_id", "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(target)
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
    micro-batch lands via ``write_stream_batch`` (foreachBatch — NOT
    the streaming file sink, whose ``_spark_metadata`` log would make
    later batch reads ignore the index's original batch-written files)
    in its own overwrite-on-retry batch directory, preserving both the
    partition-pruned probe property of ``save_ivf_index`` and
    exactly-once delivery under micro-batch retries."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_stream_batch(batch_df, index_path, cents, quant_scale, batch_id)

    (
        vectors_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
