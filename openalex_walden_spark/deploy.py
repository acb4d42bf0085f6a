"""Ship the engine package to Spark Python workers.

Python UDFs (pandas_udf / mapInPandas) are pickled BY REFERENCE to their
defining module, so executors must be able to ``import
openalex_walden_spark`` — true on a cluster only if the package is
distributed. ``ensure_shipped`` zips the package once per session and
registers it via ``sc.addPyFile`` — the standard deployment path for a
library on a real cluster, and equally necessary locally whenever the
driver process wasn't launched from the repo root.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_SESSIONS: set[int] = set()


def ensure_shipped(spark: SparkSession) -> None:
    key = id(spark.sparkContext)
    if key in _SHIPPED_SESSIONS:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_dir)
    zip_path = os.path.join(
        tempfile.gettempdir(), "openalex_walden_spark_pyfiles.zip"
    )
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for name in files:
                # .json rides along for package data (e.g. the LID
                # model), read zip-safely via importlib.resources.
                if name.endswith((".py", ".json")):
                    full = os.path.join(root, name)
                    zf.write(full, os.path.relpath(full, parent))
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED_SESSIONS.add(key)
