"""openalex_walden_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the OpenAlex "Walden" platform (reference studied at
/root/reference, ourresearch/openalex-walden): medallion streaming ingest,
schema conformance, provenance-priority entity fusion, identity resolution,
citation analytics, dedup / similarity / text-quality operators for
LLM-training-data pipelines, and serving-shape exports.

Design stance (SURVEY.md §7.1):
- Engine = library over DataFrames + a thin SQL layer; runs on stock PySpark.
- Declarative plans: let Catalyst do pushdown/pruning/join-selection; add
  broadcast hints for dimensions, AQE for skew.
- Determinism is a contract: every pick/order has an explicit total key so a
  DuckDB oracle can hash-compare results.
"""

__version__ = "0.1.0"

from openalex_walden_spark.session import get_spark  # noqa: F401
