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
