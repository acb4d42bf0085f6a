"""QuerySpec registry infrastructure."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from openalex_walden_spark.tables import TABLES, register_views

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    tags: tuple[str, ...] = ()
    doc: str = ""
    tables: tuple[str, ...] = TABLES
    module: str = ""  # defining module — the unit of change for the
    #                   driver-window freshness audit (test_driver_window)


CATALOG: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    tables: tuple[str, ...] = TABLES,
    doc: str = "",
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a (spark_fn, oracle_sql) pair under ``name``.

    ``tables`` lists the test tables the query reads; only those get
    (re-)registered as temp views before the query body runs, so one
    unreadable fixture can never break unrelated queries.
    """

    def wrap(fn: SparkQuery) -> SparkQuery:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            register_views(spark, sf_dir, tables)
            return fn(spark, sf_dir)

        CATALOG[name] = QuerySpec(
            name=name,
            spark=run,
            oracle=oracle,
            tags=tags,
            doc=doc or (fn.__doc__ or ""),
            tables=tables,
            module=fn.__module__,
        )
        return run

    return wrap


def parallelize_scan_sql(
    spark: SparkSession, sql_text: str, table: str | tuple[str, ...] = "orders"
) -> str:
    """Inject a key-only parallelizing REPARTITION under every scan of
    ``table`` in a SQL-text query (r15, guide §2.5 "input skew: one huge
    unsplittable file — repartition immediately after the read").

    The local fixtures are single-row-group parquet files, so a scan is
    ONE task regardless of ``spark.sql.files.maxPartitionBytes`` — and
    the scraper-parse fleet does 10-100 µs/row of regex work ABOVE the
    scan, which therefore ran on one core while the rest idled (measured
    at sf0.1: letten 55-74 s -> 5.6-6.0 s with the hint; every parsed
    string is generated in-plan from the narrow scan columns, so the
    exchange moves bytes-per-row, not documents).  The round-robin value
    follows ``defaultParallelism`` — scale-adaptive, never a constant.
    On splittable production input the hint costs one narrow-column
    shuffle and still guarantees the parse runs at full width.  The
    oracle dialect is untouched (hints are Spark-only syntax).
    """
    import re

    par = spark.sparkContext.defaultParallelism
    for t in (table,) if isinstance(table, str) else table:
        sql_text = re.sub(
            rf"FROM {t}\b",
            f"FROM (SELECT /*+ REPARTITION({par}) */ * FROM {t})",
            sql_text,
        )
    return sql_text
