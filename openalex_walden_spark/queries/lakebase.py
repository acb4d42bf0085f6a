"""Lakebase works-doc SHAPE transform
(``notebooks/lakebase/BuildLakebaseWorksDocs.py:150-230``).

The shard routing, hash-gated MERGE, and external-id map of the
lakebase plane are already engine queries
(``serving_sharded_doc_maintenance``, ``serving_external_id_map``,
paywall.py).  This module ports the remaining compute: the API-doc
field shaping —

* ``truncate_abstract_index_string``: an abstract inverted-index JSON
  over the 32,760-byte synced-column cap is cut back to the last
  COMPLETE word array (the last ``],`` boundary inside the cap minus a
  100-byte guard), re-closed with ``}``, and discarded as ``{}`` when
  no complete array fits or the braces come out unbalanced.  The
  reference implements this as a row UDF; here it is pure column
  algebra (greedy-regex cut + brace counting), so it stays in
  whole-stage codegen.  The fixture's cap is 400 bytes over ASCII
  fixtures (byte == char; the reference's decode-ignore byte slicing
  only diverges mid-multibyte-rune, a boundary the guard bytes absorb).
* ``iso_ts``: Python ``datetime.isoformat()`` parity for the doc's
  timestamps — fractional seconds printed as 6 digits when nonzero and
  OMITTED entirely when zero (the reference's oxjob #576 exact-parity
  fix; a fixed timestampFormat cannot express the conditional).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openalex_walden_spark.queries.registry import register

_CAP = 400          # fixture byte cap (reference default: 32760)
_GUARD = 100        # the reference's safety margin under the cap

# Inverted-index fixture: k%4=0 rows fit under the cap; k%4=1 rows are
# long with many complete arrays (clean cut); k%4=2 rows are long but
# their only ']' boundaries sit past the guard window (forced '{}');
# k%4=3 rows are NULL abstracts.
_ABS_SPARK = f"""
CASE CAST(o_orderkey % 4 AS INT)
  WHEN 0 THEN concat('{{"w', CAST(o_orderkey AS STRING), '":[1,2],"x":[3]}}')
  WHEN 1 THEN concat('{{',
    repeat(concat('"t', CAST(o_orderkey % 97 AS STRING), '":[1,2,3],'), 40),
    '"zz":[9]}}')
  WHEN 2 THEN concat('{{"only":[',
    repeat(concat(CAST(o_orderkey % 1000 AS STRING), ','), 120),
    '1]}}')
  ELSE CAST(NULL AS STRING)
END
"""


def _sql(dialect: str) -> str:
    """One template, two dialects (spark | duck)."""
    if dialect == "spark":
        stype, blen = "STRING", "octet_length"
        abs_fx = _ABS_SPARK
        ts = ("timestampadd(MICROSECOND, CAST(o_orderkey % 1000000 AS INT) "
              "* CAST(CASE WHEN o_orderkey % 5 = 0 THEN 0 ELSE 1 END AS INT), "
              "CAST(o_orderdate AS TIMESTAMP))")
        iso = (
            "CASE WHEN date_format({ts}, 'SSSSSS') <> '000000' "
            "THEN concat(date_format({ts}, \"yyyy-MM-dd'T'HH:mm:ss\"), '.', "
            "date_format({ts}, 'SSSSSS')) "
            "ELSE date_format({ts}, \"yyyy-MM-dd'T'HH:mm:ss\") END"
        )
    else:
        stype, blen = "VARCHAR", "strlen"
        abs_fx = _ABS_SPARK.replace("AS STRING", "AS VARCHAR")
        ts = ("CAST(o_orderdate AS TIMESTAMP) + to_microseconds("
              "CAST(o_orderkey % 1000000 AS BIGINT) "
              "* CASE WHEN o_orderkey % 5 = 0 THEN 0 ELSE 1 END)")
        iso = (
            "CASE WHEN strftime({ts}, '%f') <> '000000' "
            "THEN strftime({ts}, '%Y-%m-%dT%H:%M:%S.%f') "
            "ELSE strftime({ts}, '%Y-%m-%dT%H:%M:%S') END"
        )
    iso = iso.replace("{ts}", ts)
    return f"""
WITH raw AS (
  SELECT o_orderkey AS work_id, {abs_fx} AS abstract_json,
         {iso} AS updated_at_iso
  FROM orders
),
cut AS (
  SELECT work_id, updated_at_iso, abstract_json,
         CASE
           WHEN abstract_json IS NULL THEN NULL
           WHEN {blen}(abstract_json) <= {_CAP} THEN abstract_json
           ELSE concat(nullif(regexp_extract(
                  substr(abstract_json, 1, {_CAP - _GUARD}),
                  '^(.*\\]),', 1), ''), '}}')
         END AS shaped
  FROM raw
),
checked AS (
  SELECT work_id, updated_at_iso,
         CASE
           WHEN shaped IS NULL AND abstract_json IS NOT NULL THEN '{{}}'
           WHEN shaped IS NULL THEN NULL
           WHEN length(shaped) - length(replace(shaped, '{{', ''))
                <> length(shaped) - length(replace(shaped, '}}', ''))
             THEN '{{}}'
           ELSE shaped
         END AS abstract_doc
  FROM cut
)
SELECT work_id, updated_at_iso,
       abstract_doc,
       CAST(CASE WHEN abstract_doc IS NULL THEN -1
                 ELSE length(abstract_doc) END AS BIGINT) AS doc_len
FROM checked
"""


def _register_real() -> None:
    oracle = _sql("duck")

    @register(
        "lakebase_doc_shape",
        oracle=oracle,
        tags=("serving", "lakebase", "scalar"),
        tables=("orders",),
    )
    def lakebase_doc_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The lakebase works-doc shape transform
        (BuildLakebaseWorksDocs.py:150-230): abstract inverted-index
        truncation to the last complete word array under the byte cap
        (guard margin, brace-balance fallback to '{}'), and the
        isoformat() timestamp rule — fractional seconds only when
        nonzero.  The reference runs the truncation as a row UDF over
        every doc; this plan is pure column algebra (greedy-regex cut,
        brace count via replace-length), one scan, zero Python.

        DEVIATION (documented): byte-exact UTF-8 slicing inside a
        multibyte rune is approximated by character slicing over the
        ASCII fixture — the reference's decode(errors='ignore') only
        differs on a rune straddling the cut, which its own 100-byte
        guard exists to absorb."""
        return spark.sql(_sql("spark"))


_register_real()
