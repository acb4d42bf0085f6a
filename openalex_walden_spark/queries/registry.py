"""QuerySpec registry infrastructure."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from openalex_walden_spark.tables import register_views

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    tags: tuple[str, ...] = ()
    doc: str = ""


CATALOG: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a (spark_fn, oracle_sql) pair under ``name``.

    The wrapped function receives (spark, sf_dir) with all test tables
    already registered as temp views.
    """

    def wrap(fn: SparkQuery) -> SparkQuery:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            register_views(spark, sf_dir)
            return fn(spark, sf_dir)

        CATALOG[name] = QuerySpec(name=name, spark=run, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return run

    return wrap
