"""Sources registry snapshot (reference
``notebooks/sources/CreateSources.ipynb``, post-cutover oxjob #548).

The notebook materializes the federated registry in the legacy
40-column shape.  Portable semantics ported here:

* JSONB columns parsed to TYPED values via ``from_json`` — apc_prices
  (array<struct<price,currency>>), apc_usd_by_year (map<string,int>),
  societies, alternate_titles; a malformed payload parses to NULL
  (PERMISSIVE), never an error;
* the ``webpage = homepage_url`` legacy alias;
* ``issns`` carried VERBATIM — NULL when the source has none (the
  registry's array_agg never yields ``[]`` and the works content hash
  is []-blind, so NULL is the uniform convention);
* merged sources are INCLUDED as redirect rows (merge_into_id set) —
  consumers wanting active-only filter it themselves.

The Spark side parses REAL JSON strings; the oracle recomputes the
expected values from the same generating arithmetic — so the parse
itself (quoting, nesting, map keys, malformed→NULL) is what the hash
checks.

Scale: a pure per-row projection over the registry snapshot — one scan,
zero shuffles; from_json is JVM-side (Jackson), no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openalex_walden_spark.queries.registry import register


def _src_snapshot_sql(dialect: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    if dialect == "spark":
        parse = """
         array_join(transform(
           from_json(apc_prices_json, 'array<struct<price:int,currency:string>>'),
           x -> concat(CAST(x.price AS STRING), '@', x.currency)), ';') AS apc_prices_sig,
         array_join(array_sort(transform(
           map_entries(from_json(apc_by_year_json, 'map<string,int>')),
           e -> concat(e.key, ':', CAST(e.value AS STRING)))), ';') AS apc_by_year_sig,
         array_join(transform(
           from_json(societies_json, 'array<struct<url:string,organization:string>>'),
           x -> concat(x.organization, '^', x.url)), ';') AS societies_sig,
         array_join(from_json(alt_titles_json, 'array<string>'), ';') AS alt_titles_sig,
"""
    else:
        parse = """
         CASE WHEN k % 13 = 0 THEN NULL
              WHEN k % 3 = 0 THEN concat(CAST(k % 900 + 100 AS VARCHAR), '@USD;',
                                         CAST(k % 700 + 50 AS VARCHAR), '@EUR')
              WHEN k % 3 = 1 THEN concat(CAST(k % 900 + 100 AS VARCHAR), '@USD')
              ELSE '' END AS apc_prices_sig,
         CASE WHEN k % 4 = 0 THEN concat('2021:', CAST(k % 3000 AS VARCHAR),
                                         ';2022:', CAST(k % 3100 AS VARCHAR))
              ELSE '' END AS apc_by_year_sig,
         CASE WHEN k % 5 = 0 THEN concat('Org ', CAST(k % 60 AS VARCHAR),
                                         '^https://soc.test/', CAST(k % 60 AS VARCHAR))
              ELSE '' END AS societies_sig,
         CASE WHEN k % 6 < 2 THEN concat('Alt ', CAST(k % 40 AS VARCHAR), ';Alt2 ',
                                         CAST(k % 41 AS VARCHAR))
              ELSE '' END AS alt_titles_sig,
"""
    fixture = f"""
  SELECT s_suppkey AS k,
         concat('Src ', CAST(s_suppkey % 300 AS {s})) AS display_name,
         concat('https://home.test/', CAST(s_suppkey AS {s})) AS homepage_url,
         CASE WHEN s_suppkey % 13 = 0 THEN 'not json'
              WHEN s_suppkey % 3 = 0 THEN concat('[LB"price":', CAST(s_suppkey % 900 + 100 AS {s}),
                ',"currency":"USD"RB,LB"price":', CAST(s_suppkey % 700 + 50 AS {s}),
                ',"currency":"EUR"RB]')
              WHEN s_suppkey % 3 = 1 THEN concat('[LB"price":', CAST(s_suppkey % 900 + 100 AS {s}),
                ',"currency":"USD"RB]')
              ELSE '[]' END AS apc_prices_json,
         CASE WHEN s_suppkey % 4 = 0 THEN concat('LB"2021":', CAST(s_suppkey % 3000 AS {s}),
                ',"2022":', CAST(s_suppkey % 3100 AS {s}), 'RB')
              ELSE 'LBRB' END AS apc_by_year_json,
         CASE WHEN s_suppkey % 5 = 0 THEN concat('[LB"url":"https://soc.test/',
                CAST(s_suppkey % 60 AS {s}), '","organization":"Org ',
                CAST(s_suppkey % 60 AS {s}), '"RB]')
              ELSE '[]' END AS societies_json,
         CASE WHEN s_suppkey % 6 < 2 THEN concat('["Alt ', CAST(s_suppkey % 40 AS {s}),
                '","Alt2 ', CAST(s_suppkey % 41 AS {s}), '"]')
              ELSE '[]' END AS alt_titles_json,
         CASE WHEN s_suppkey % 7 = 0 THEN NULL
              ELSE concat('["', CAST(1000 + s_suppkey % 9000 AS {s}), '-',
                          CAST(1000 + s_suppkey % 8000 AS {s}), '"]') END AS issns,
         CASE WHEN s_suppkey % 11 = 0 THEN CAST(s_suppkey DIV 2 AS BIGINT) END AS merge_into_id
  FROM supplier
"""
    fixture = fixture.replace("LB", "{").replace("RB", "}")
    if dialect == "duck":
        fixture = fixture.replace(" DIV ", " // ")
    else:
        fixture = fixture.replace(" DIV ", " div ")
    return f"""
WITH reg AS ({fixture})
SELECT k AS id, display_name,
       homepage_url AS webpage,
       {parse}
       issns,
       merge_into_id,
       (merge_into_id IS NULL) AS is_active
FROM reg
ORDER BY k
"""


@register(
    "sources_snapshot_build",
    oracle=_src_snapshot_sql("duck"),
    tags=("sources", "json", "snapshot"),
    tables=("supplier",),
)
def sources_snapshot_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The federated sources snapshot in the legacy shape
    (CreateSources.ipynb; see module docstring)."""
    return spark.sql(_src_snapshot_sql("spark"))
