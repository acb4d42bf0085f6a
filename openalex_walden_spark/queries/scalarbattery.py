"""Scalar-function battery (SURVEY.md §2.8) + J12 USING-join.

§2.8 lists the scalar vocabulary the reference actually exercises
(grep-verified): string fns (`split_part translate levenshtein instr
lpad left`), date fns (`make_date date_trunc year least/greatest` —
`Crossref.py:450-459` LEAST-of-dates), and the array/map/JSON layer
(`arrays_zip/zip_with aggregate flatten slice sort_array map_from_entries
element_at to_json json-path get` — `CreateWorksBase.ipynb` cell 2,
`MatchAuthors.ipynb` cell 3). These queries exercise that vocabulary
end-to-end against the oracle so the SQL layer's semantics (1-based
substring, null propagation, fold order) are pinned, not assumed.

All pure column expressions — whole-stage codegen, no shuffle beyond the
one groupBy that builds the per-order arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openalex_walden_spark.queries.registry import register

# ---------------------------------------------------------------------------
# J12: USING-join (coalesced join column, deduped in the output).

_J12_ORACLE = """
SELECT nationkey, n_name, r_name
FROM (SELECT n_nationkey AS nationkey, n_regionkey AS regionkey, n_name
      FROM nation)
JOIN (SELECT r_regionkey AS regionkey, r_name FROM region)
USING (regionkey)
"""


@register(
    "j12_using_join",
    oracle=_J12_ORACLE,
    tags=("join", "using"),
    tables=("nation", "region"),
)
def j12_using_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12: SQL USING-join — single deduped join column in the output
    (the reference's `LEFT JOIN priority_table USING (provenance)` shape,
    `CreateWorksBase.ipynb` cell 2). Dimension×dimension: broadcast."""
    return spark.sql("""
        SELECT nationkey, n_name, r_name
        FROM (SELECT n_nationkey AS nationkey, n_regionkey AS regionkey,
                     n_name FROM nation)
        JOIN (SELECT r_regionkey AS regionkey, r_name FROM region)
        USING (regionkey)
    """)


# ---------------------------------------------------------------------------
# String + date battery over orders.

_STRDATE_ORACLE = """
SELECT o_orderkey,
       split_part(o_orderpriority, '-', 2) AS prio_word,
       translate(o_orderstatus, 'OF', 'of') AS status_t,
       levenshtein(o_orderpriority, o_orderstatus) AS lev,
       instr(o_orderpriority, '-')::INTEGER AS dash_pos,
       lpad(CAST(o_orderkey % 100 AS VARCHAR), 4, '0') AS padded,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       make_date(year(o_orderdate)::INTEGER, 1, 1) AS year_start,
       CAST(greatest(o_orderdate, TIMESTAMP '1995-01-01') AS DATE) AS clamped,
       left(o_orderpriority, 1) AS p1,
       substring(o_orderpriority, 3, 3) AS p3
FROM orders WHERE o_orderkey % 10 = 0
"""


@register(
    "f_string_date_battery",
    oracle=_STRDATE_ORACLE,
    tags=("scalar", "string", "date"),
    tables=("orders",),
)
def f_string_date_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 string/date battery: split_part, translate, levenshtein,
    instr, lpad, left, substring, date_trunc, make_date, greatest —
    the exact fns the reference leans on for keying and date discipline
    (`LEAST(issued, created, …)`, `Crossref.py:450-459`)."""
    return spark.sql("""
        SELECT o_orderkey,
               split_part(o_orderpriority, '-', 2) AS prio_word,
               translate(o_orderstatus, 'OF', 'of') AS status_t,
               levenshtein(o_orderpriority, o_orderstatus) AS lev,
               instr(o_orderpriority, '-') AS dash_pos,
               lpad(CAST(o_orderkey % 100 AS STRING), 4, '0') AS padded,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               make_date(year(o_orderdate), 1, 1) AS year_start,
               CAST(greatest(o_orderdate, TIMESTAMP '1995-01-01') AS DATE)
                 AS clamped,
               left(o_orderpriority, 1) AS p1,
               substring(o_orderpriority, 3, 3) AS p3
        FROM orders WHERE o_orderkey % 10 = 0
    """)


# ---------------------------------------------------------------------------
# Array / map / JSON battery over per-order quantity arrays.

_ARR_ORACLE = """
WITH per AS (
  SELECT l_orderkey AS okey,
         list_sort(list(l_quantity::INTEGER)) AS qtys
  FROM lineitem GROUP BY l_orderkey
)
SELECT okey,
       len(list_distinct(qtys))::INTEGER AS n_dq,
       list_sum(qtys)::BIGINT AS qsum,
       to_json(list_slice(list_sort(qtys, 'DESC'), 1, 3)) AS top3,
       list_contains(qtys, 25) AS has25,
       list_aggregate(qtys, 'max') AS mx,
       to_json(flatten([qtys, [0]])) AS padded,
       len(qtys)::INTEGER AS n_via_map,
       CAST(okey AS VARCHAR) AS k_json
FROM per
"""


@register(
    "f_array_map_json_battery",
    oracle=_ARR_ORACLE,
    tags=("scalar", "array", "map", "json"),
    tables=("lineitem",),
)
def f_array_map_json_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 array/map/JSON battery: sort_array, array_distinct, aggregate
    fold, slice-of-reverse (top-k inside an array), array_contains,
    array_max, flatten, map_from_entries + element_at, to_json +
    get_json_object round-trip. The oracle computes the same values
    relationally (maps/JSON are Spark-side vocabulary under test; their
    VALUES are engine-neutral)."""
    return spark.sql("""
        WITH per AS (
          SELECT l_orderkey AS okey,
                 sort_array(collect_list(CAST(l_quantity AS INT))) AS qtys
          FROM lineitem GROUP BY l_orderkey
        )
        SELECT okey,
               size(array_distinct(qtys)) AS n_dq,
               CAST(aggregate(qtys, 0L, (a, x) -> a + x) AS BIGINT) AS qsum,
               to_json(slice(reverse(qtys), 1, 3)) AS top3,
               array_contains(qtys, 25) AS has25,
               array_max(qtys) AS mx,
               to_json(flatten(array(qtys, array(0)))) AS padded,
               element_at(
                 map_from_entries(array(struct('n', size(qtys)))), 'n')
                 AS n_via_map,
               get_json_object(to_json(struct(okey AS k)), '$.k') AS k_json
        FROM per
    """)


# ---------------------------------------------------------------------------
# U3: unionByName(allowMissingColumns=True) — ragged-schema stream union.

_U3_ORACLE = """
SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority,
       'amt' AS src
FROM orders WHERE o_orderkey % 2 = 0
UNION ALL
SELECT o_orderkey, CAST(NULL AS DOUBLE) AS o_totalprice, o_orderpriority,
       'pri' AS src
FROM orders WHERE o_orderkey % 3 = 0
"""


@register(
    "u3_union_missing_columns",
    oracle=_U3_ORACLE,
    tags=("setop", "U3"),
    tables=("orders",),
)
def u3_union_missing_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: ``unionByName(allowMissingColumns=True)`` — the reference's
    7-source streaming union tolerates per-source schema raggedness
    (``UnionAllWorksIntoLocationsParsed.ipynb`` cell 1 line 49); missing
    columns NULL-fill by name, never by position."""
    o = spark.table("orders")
    amt = (
        o.where(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_totalprice", F.lit("amt").alias("src"))
    )
    pri = (
        o.where(F.col("o_orderkey") % 3 == 0)
        .select("o_orderkey", "o_orderpriority", F.lit("pri").alias("src"))
    )
    return amt.unionByName(pri, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# U1: schema-conformed UNION ALL across differently-shaped sources.

_U1_ORACLE = """
SELECT o_orderkey AS record_key, CAST(o_totalprice AS DOUBLE) AS amount,
       'orders' AS provenance
FROM orders WHERE o_orderkey % 5 = 0
UNION ALL
SELECT c_custkey AS record_key, CAST(c_acctbal AS DOUBLE) AS amount,
       'customer' AS provenance
FROM customer
UNION ALL
SELECT s_suppkey AS record_key, CAST(NULL AS DOUBLE) AS amount,
       'supplier' AS provenance
FROM supplier
"""


@register(
    "u1_conform_union",
    oracle=_U1_ORACLE,
    tags=("setop", "U1", "P1"),
    tables=("orders", "customer", "supplier"),
)
def u1_conform_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 through the conformance layer (``conform.py:conform_union``):
    three sources with different column names/orders/shapes (supplier
    lacks the amount entirely) conform to one target schema and UNION
    ALL by NAME — the construction that makes the reference's
    column-order union hazard (``CreateSuperLocations.ipynb`` lines
    770-773, a shipped production bug) impossible by design."""
    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

    from openalex_walden_spark.conform import conform_union

    target = StructType(
        [
            StructField("record_key", LongType()),
            StructField("amount", DoubleType()),
            StructField("provenance", StringType()),
        ]
    )
    o = (
        spark.table("orders")
        .where(F.col("o_orderkey") % 5 == 0)
        .select(
            F.lit("orders").alias("provenance"),  # wrong order on purpose
            F.col("o_orderkey").alias("record_key"),
            F.col("o_totalprice").alias("amount"),
        )
    )
    c = spark.table("customer").select(
        F.col("c_custkey").alias("record_key"),
        F.col("c_acctbal").alias("amount"),
        F.lit("customer").alias("provenance"),
    )
    s = spark.table("supplier").select(  # missing 'amount' entirely
        F.col("s_suppkey").alias("record_key"),
        F.lit("supplier").alias("provenance"),
    )
    return conform_union([o, c, s], target)


# ---------------------------------------------------------------------------
# Map-function battery: map_from_entries/map_filter/map_concat/
# transform_values/element_at (§2.8 "Map" row, the ids-map block shape).

_MAP_ORACLE = """
WITH per AS (
  SELECT l_orderkey AS okey,
         count(*) FILTER (l_returnflag = 'A') AS n_a,
         count(*) FILTER (l_returnflag = 'N') AS n_n,
         count(*) FILTER (l_returnflag = 'R') AS n_r
  FROM lineitem GROUP BY l_orderkey
)
SELECT okey,
       (CASE WHEN n_a > 0 THEN 1 ELSE 0 END + CASE WHEN n_n > 0 THEN 1 ELSE 0 END
        + CASE WHEN n_r > 0 THEN 1 ELSE 0 END)::INTEGER AS n_kinds,
       (n_a * 10)::BIGINT AS a_scaled,
       (n_a + n_n + n_r + 1)::BIGINT AS total_with_base
FROM per
"""


@register(
    "f_map_battery",
    oracle=_MAP_ORACLE,
    tags=("scalar", "map"),
    tables=("lineitem",),
)
def f_map_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 map battery — the reference's ids-map block shape
    (``CreateWorksBase.ipynb`` cell 2): build a map with
    map_from_entries, drop empty entries with map_filter, scale values
    with transform_values, merge a base map with map_concat, read with
    element_at, measure with size. The oracle computes the same VALUES
    relationally — maps are Spark-side vocabulary under test."""
    per = spark.sql("""
        SELECT l_orderkey AS okey,
               count(IF(l_returnflag = 'A', 1, NULL)) AS n_a,
               count(IF(l_returnflag = 'N', 1, NULL)) AS n_n,
               count(IF(l_returnflag = 'R', 1, NULL)) AS n_r
        FROM lineitem GROUP BY l_orderkey
    """)
    per.createOrReplaceTempView("_per_map")
    return spark.sql("""
        WITH maps AS (
          SELECT okey,
                 map_filter(
                   map_from_entries(array(
                     struct('A' AS k, n_a AS v), struct('N' AS k, n_n AS v),
                     struct('R' AS k, n_r AS v))),
                   (k, v) -> v > 0) AS kinds
          FROM _per_map
        )
        SELECT okey,
               size(kinds) AS n_kinds,
               CAST(coalesce(element_at(
                 transform_values(kinds, (k, v) -> v * 10), 'A'), 0) AS BIGINT)
                 AS a_scaled,
               CAST(aggregate(map_values(
                      map_concat(map('base', 1L), kinds)), 0L, (a, x) -> a + x)
                 AS BIGINT) AS total_with_base
        FROM maps
    """)


# ---------------------------------------------------------------------------
# S3 nuances: IDENTIFIER(:param) table binding + SQL session variables.

_S3_PARAM_ORACLE = """
SELECT o_orderstatus AS status, count(*)::BIGINT AS n
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
GROUP BY o_orderstatus
"""


@register(
    "s3_identifier_and_variables",
    oracle=_S3_PARAM_ORACLE,
    tags=("scan", "S3", "sqlvar"),
    tables=("orders",),
)
def s3_identifier_and_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3's parameterization devices, both from the reference:
    ``IDENTIFIER(:tbl)`` binds the table name as a parameter (the
    `'cat' || :env_suffix` pattern), and a SQL session variable carries
    the high-watermark (``DECLARE VARIABLE max_updated_date`` —
    ``MatchAuthors.ipynb`` cell 1). Injection-proof name binding + the
    incremental-scan watermark discipline in one statement."""
    spark.sql("DECLARE OR REPLACE VARIABLE wm TIMESTAMP")
    spark.sql("SET VAR wm = TIMESTAMP '1997-01-01'")
    return spark.sql(
        """
        SELECT o_orderstatus AS status, count(*) AS n
        FROM IDENTIFIER(:tbl)
        WHERE o_orderdate >= wm
        GROUP BY o_orderstatus
        """,
        args={"tbl": "orders"},
    )


# ---------------------------------------------------------------------------
# HOF predicate battery: exists / forall / filter over per-order arrays.

_HOF_ORACLE = """
WITH per AS (
  SELECT l_orderkey AS okey, list(l_quantity::INTEGER) AS qtys
  FROM lineitem GROUP BY l_orderkey
)
SELECT okey,
       len(list_filter(qtys, q -> q >= 25))::INTEGER AS n_large,
       CASE WHEN len(list_filter(qtys, q -> q > 45)) > 0
            THEN TRUE ELSE FALSE END AS has_jumbo,
       CASE WHEN len(list_filter(qtys, q -> q >= 10)) = len(qtys)
            THEN TRUE ELSE FALSE END AS all_at_least_10
FROM per
"""


@register(
    "f_hof_predicate_battery",
    oracle=_HOF_ORACLE,
    tags=("scalar", "array", "hof"),
    tables=("lineitem",),
)
def f_hof_predicate_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 predicate HOFs — exists(), forall(), filter() with lambda
    predicates (the reference leans on `exists(...)`/`filter(...)`
    inside its location ladders). The oracle states the same predicates
    via list_filter counting, so the lambda semantics (null handling,
    empty arrays) are pinned across engines."""
    return spark.sql("""
        WITH per AS (
          SELECT l_orderkey AS okey,
                 collect_list(CAST(l_quantity AS INT)) AS qtys
          FROM lineitem GROUP BY l_orderkey
        )
        SELECT okey,
               size(filter(qtys, q -> q >= 25)) AS n_large,
               exists(qtys, q -> q > 45) AS has_jumbo,
               forall(qtys, q -> q >= 10) AS all_at_least_10
        FROM per
    """)


# ---------------------------------------------------------------------------
# Null-handling + array set-ops battery: nullif/nvl/try_cast/zeroifnull,
# array_intersect/union/except-by-filter/overlap/compact, sequence-by-step.

_NULLSET_ORACLE = """
WITH per AS (
  SELECT o_orderkey AS okey,
         nullif(o_orderstatus, 'P') AS status_or_null,
         coalesce(nullif(o_orderstatus, 'P'), 'unknown') AS status_filled,
         TRY_CAST(o_orderpriority AS BIGINT) AS prio_num,
         coalesce(TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT), 0)
           AS prio_digit
  FROM orders
),
arr AS (
  SELECT okey, status_or_null, status_filled, prio_num, prio_digit,
         range(1, prio_digit + 2, 1) AS seq_to_prio,
         list_distinct(list_intersect([1,2,3,prio_digit], [2,3,4,prio_digit]))
           AS inter,
         len(list_distinct(list_concat([1,2,3], [CASE WHEN prio_digit > 0
                                                 THEN prio_digit END])))::INTEGER
           AS union_len
  FROM per
)
SELECT okey, status_or_null, status_filled, prio_num, prio_digit,
       len(seq_to_prio)::INTEGER AS seq_len,
       to_json(list_sort(inter)) AS inter_sorted,
       union_len
FROM arr
"""


@register(
    "f_null_setops_battery",
    oracle=_NULLSET_ORACLE,
    tags=("scalar", "null", "array"),
    tables=("orders",),
)
def f_null_setops_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 null-handling (nullif/nvl/try_cast semantics incl. the
    failed-cast → NULL path) and array set-ops (array_intersect,
    array_union via distinct-concat, array_compact dropping the NULL,
    sequence with explicit step). DuckDB's list_concat keeps NULL
    elements, so array_compact's semantics are stated there as the
    conditional element — values, not vocabulary, are what the oracle
    pins."""
    return spark.sql("""
        WITH per AS (
          SELECT o_orderkey AS okey,
                 nullif(o_orderstatus, 'P') AS status_or_null,
                 nvl(nullif(o_orderstatus, 'P'), 'unknown') AS status_filled,
                 TRY_CAST(o_orderpriority AS BIGINT) AS prio_num,
                 nvl(TRY_CAST(substring(o_orderpriority, 1, 1) AS BIGINT), 0)
                   AS prio_digit
          FROM orders
        )
        SELECT okey, status_or_null, status_filled, prio_num, prio_digit,
               size(sequence(1L, prio_digit + 1, 1L)) AS seq_len,
               to_json(array_sort(array_distinct(
                 array_intersect(array(1L,2L,3L,prio_digit),
                                 array(2L,3L,4L,prio_digit))))) AS inter_sorted,
               size(array_distinct(array_compact(
                 array(1L, 2L, 3L,
                       CASE WHEN prio_digit > 0 THEN prio_digit END))))
                 AS union_len
        FROM per
    """)
