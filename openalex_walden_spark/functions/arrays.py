"""Array / higher-order-function helpers (SURVEY.md §2.8 "the heart").

Includes the inverted-index builder (P6) and the provenance-priority fold
(A3) — both pure column expressions over arrays of structs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def inverted_index(text: Column) -> Column:
    """word → positions map (P6), as MAP<STRING, ARRAY<INT>>.

    The reference builds ``abstract_inverted_index`` in Python
    (``transform.py:24-40``); this is the pure-Spark posexplode-free form:
    zip each token with its position, group via map_from_entries after an
    aggregate fold. Callers needing the JSON form wrap with to_json().
    """
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    pairs = F.transform(toks, lambda t, i: F.struct(t.alias("word"), i.alias("pos")))
    words = F.array_distinct(F.transform(pairs, lambda p: p.getField("word")))
    entries = F.transform(
        words,
        lambda w: F.struct(
            w.alias("key"),
            F.transform(
                F.filter(pairs, lambda p: p.getField("word") == w),
                lambda p: p.getField("pos"),
            ).alias("value"),
        ),
    )
    return F.when(n > 0, F.map_from_entries(entries)).otherwise(
        F.lit(None).cast("map<string,array<int>>")
    )


def priority_pick(values: Column) -> Column:
    """Fold an ARRAY<STRUCT<value, priority>> to the best non-null value (A3).

    Equivalent to the reference's SQL UDF ``get_highest_priority_value``
    (``CreateWorksBase.ipynb`` cell 2 lines 53-70): lowest priority number
    wins; NULL/empty values never win. Expressed with aggregate() so it runs
    as one fold, no shuffle.
    """
    init = F.struct(
        F.lit(None).cast("string").alias("value"),
        F.lit(2147483647).alias("priority"),
    )
    return F.aggregate(
        values,
        init,
        lambda acc, x: F.when(
            x.getField("value").isNotNull()
            & (x.getField("value") != "")
            & (x.getField("priority") < acc.getField("priority")),
            x,
        ).otherwise(acc),
    ).getField("value")


def sorted_collect(col: Column) -> Column:
    """array_sort wrapper documenting the determinism contract.

    Every collect_list consumed for output MUST pass through an explicit
    total ordering (the reference's hard-won rule — SURVEY.md §4
    "Determinism engineering"; production bugs oxjob #608/#649/#660).
    """
    return F.array_sort(col)


def counts_by_year(year_count_pairs: Column, min_year: int = 2012) -> Column:
    """ARRAY<STRUCT<year,int>> time series, filtered + sorted (D5 shape)."""
    return F.array_sort(
        F.filter(year_count_pairs, lambda p: p.getField("year") >= min_year)
    )
