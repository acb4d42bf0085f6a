"""Serving-side helpers: UTF-8-safe JSON truncation (P14) and the
column-insert DataFrame helper (P16)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def truncate_inverted_index(index: Column, max_bytes: int) -> Column:
    """P14: truncate an inverted-index MAP<STRING, ARRAY<INT>> to fit a
    byte budget while STAYING VALID JSON — whole entries are dropped from
    the end, never bytes (the reference's
    ``truncate_abstract_index_string``, sync_works.ipynb cell 5, exists
    because naive byte truncation emits unparseable documents).

    Pure column expression: a single aggregate() fold accumulates the
    serialized size (octet_length — UTF-8 bytes, not chars) and keeps the
    prefix of entries that fits. No Python, no shuffle.
    """
    entries = F.map_entries(index)
    init = F.struct(
        F.lit(2).cast("long").alias("used"),  # '{' + '}'
        F.expr("array()").cast("array<struct<key:string,value:array<int>>>").alias("kept"),
    )

    def step(acc, e):
        # '"key":[v1,v2]' + ',' separator when not first
        piece = (
            F.octet_length(F.to_json(F.map_from_entries(F.array(e))))
            - F.lit(2)
            + F.when(F.size(acc.getField("kept")) > 0, F.lit(1)).otherwise(F.lit(0))
        )
        fits = (acc.getField("used") + piece) <= max_bytes
        return F.struct(
            (acc.getField("used") + F.when(fits, piece).otherwise(F.lit(0))).alias("used"),
            F.when(fits, F.concat(acc.getField("kept"), F.array(e)))
            .otherwise(acc.getField("kept"))
            .alias("kept"),
        )

    folded = F.aggregate(entries, init, step)
    return F.when(
        index.isNull(), F.lit(None).cast("string")
    ).otherwise(F.to_json(F.map_from_entries(folded.getField("kept"))))


def with_column_at(df: DataFrame, index: int, name: str, col: Column) -> DataFrame:
    """P16: insert/replace a column at a specific position (the
    reference's ``withColumnAt`` monkey-patch, utils/dataframe.py:10-29,
    as a plain function — no patching)."""
    cols = [c for c in df.columns if c != name]
    out = [F.col(c) for c in cols]
    out.insert(index, col.alias(name))
    return df.select(*out)
