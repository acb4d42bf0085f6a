"""Query catalog: every SURVEY.md §2 operator as an oracle-checked query.

Each entry pairs an idiomatic-Spark implementation (DataFrame API / Spark
SQL over the driver's test tables) with an equivalent ANSI-SQL oracle for
DuckDB. The registry backs ``__spark_entry__.queries()`` /
``oracle_sql()`` and the local parity test-suite.
"""

from openalex_walden_spark.queries.registry import CATALOG, QuerySpec, register  # noqa: F401


def load_all() -> None:
    """Import every catalog module so registrations run."""
    from openalex_walden_spark.queries import relational  # noqa: F401
    from openalex_walden_spark.queries import windows  # noqa: F401
    from openalex_walden_spark.queries import walden  # noqa: F401
    from openalex_walden_spark.queries import llmdata  # noqa: F401
    from openalex_walden_spark.queries import events  # noqa: F401
