"""Test-table loading + view registration.

The driver provides TPC-H-ish parquet tables (TESTDATA.md):
region nation customer supplier part orders lineitem events documents
embeddings. Loading goes through ``spark.read.parquet`` so Catalyst gets
predicate pushdown + column pruning on the scan for free.

``events.parquet`` needs special handling: its ``ts`` column is physical
INT64 TIMESTAMP(NANOS), which stock Spark 4.x rejects with
``PARQUET_TYPE_ILLEGAL``. We read it with
``spark.sql.legacy.parquet.nanosAsLong=true`` (raw nanos as BIGINT) and
derive two portable columns:

- ``ts_us``  BIGINT      — microseconds since epoch (floor of nanos/1000;
  identical to DuckDB's nanos→TIMESTAMP truncation, so oracle queries can
  compare on ``epoch_us(ts)``).
- ``ts``     TIMESTAMP   — ``timestamp_micros(ts_us)`` for streaming /
  window use. Oracle-compared outputs should use ``ts_us`` arithmetic,
  never raw timestamps, to stay independent of session timezones.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    # The conf is left enabled: it only affects nanosecond-precision parquet
    # columns (which Spark would otherwise refuse to read at all), and the
    # lazy DataFrame must still see it at execution time.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts_us", F.expr("ts div 1000")).withColumn(
            "ts", F.timestamp_micros(F.col("ts_us"))
        )
    else:
        # Fixture ships TIMESTAMP(MICROS) (TIMESTAMP_NTZ in Spark 4):
        # unix_micros() rejects NTZ input, so cast to (session-local)
        # TIMESTAMP first.  The session timezone is pinned to UTC
        # (session.py), making the NTZ→LTZ cast an identity and the result
        # byte-identical to DuckDB's epoch_us(ts).
        # Also normalize ``ts`` itself to TIMESTAMP so downstream consumers
        # (withWatermark rejects NTZ) see the same type the nanos branch
        # produced via timestamp_micros().
        df = df.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
            "ts_us", F.unix_micros(F.col("ts"))
        )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def register_views(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] | None = None,
) -> dict[str, DataFrame]:
    """Register the requested test tables as temp views.

    Registration is per-query (callers pass only the tables they read) so a
    broken/missing fixture can never take down unrelated queries, and no
    needless scan metadata is touched — the catalog equivalent of partition
    pruning.
    """
    dfs: dict[str, DataFrame] = {}
    for name in tables if tables is not None else TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
