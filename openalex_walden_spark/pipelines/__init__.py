"""Pipeline orchestration registry (reference ``jobs/*.yaml``)."""

from openalex_walden_spark.pipelines.registry import (  # noqa: F401
    PIPELINES,
    Pipeline,
    Task,
    execution_waves,
    validate,
)
