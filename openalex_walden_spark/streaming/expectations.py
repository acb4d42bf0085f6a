"""Data-quality expectations (St5): the engine's @dlt.expect analogue.

The reference gates every ingest table with declarative expectations
(``@dlt.expect("rescued_data_null", "_rescued_data IS NULL")`` —
``Crossref.py:225``; same in ``PubMed.py:113``). Open-source form: a
predicate registry that (a) splits a frame into pass/quarantine and
(b) emits a metrics frame, one row per expectation — single aggregation
pass, no matter how many expectations (all count_ifs fold into one agg).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _safe(pred: Column) -> Column:
    """NULL predicate counts as failure, like DLT expectations."""
    return F.coalesce(pred, F.lit(False))


def split_on_expectations(
    df: DataFrame, expectations: Mapping[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(pass_df, quarantine_df): a row passes only if EVERY expectation
    holds (expect_all semantics). Quarantined rows carry a
    ``_failed_expectations`` array naming the violated gates."""
    failed = F.filter(
        F.array(
            *[
                F.when(~_safe(pred), F.lit(name)).otherwise(F.lit(None))
                for name, pred in expectations.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    tagged = df.withColumn("_failed_expectations", failed)
    ok = tagged.where(F.size("_failed_expectations") == 0).drop("_failed_expectations")
    bad = tagged.where(F.size("_failed_expectations") > 0)
    return ok, bad


def expectation_metrics(df: DataFrame, expectations: Mapping[str, Column]) -> DataFrame:
    """Metrics frame (expectation, n_pass, n_fail) in ONE aggregation pass:
    every count_if folds into a single agg row, then explodes to rows —
    at 100 TB this is one scan regardless of gate count."""
    aggs = []
    for name, pred in expectations.items():
        aggs.append(F.count_if(_safe(pred)).alias(f"__pass_{name}"))
        aggs.append(F.count_if(~_safe(pred)).alias(f"__fail_{name}"))
    row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("expectation"),
                F.col(f"__pass_{name}").alias("n_pass"),
                F.col(f"__fail_{name}").alias("n_fail"),
            )
            for name in expectations
        ]
    )
    return row.select(F.explode(entries).alias("e")).select(
        "e.expectation", "e.n_pass", "e.n_fail"
    )
