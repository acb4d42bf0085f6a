"""Test-table loading + view registration.

The driver provides TPC-H-ish parquet tables (TESTDATA.md):
region nation customer supplier part orders lineitem events documents
embeddings. Loading goes through ``spark.read.parquet`` so Catalyst gets
predicate pushdown + column pruning on the scan for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every test table as a temp view named after the table.

    Views are lazily re-registered per sf_dir; callers can mix the DataFrame
    handles and ``spark.sql`` over the view names.
    """
    dfs: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
