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
