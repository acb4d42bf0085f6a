"""Relational spine: scans, joins, aggregations (SURVEY.md §2.1/2.3/2.4/2.7).

Float parity with the DuckDB oracle is engineered, not hoped for:
- SUM over doubles is order-dependent → sum DECIMAL(18,2)-cast values
  (double→decimal rounding is tie-free for this data: money values are
  2-decimal, discounts are exact 1/100 multiples) and cast the exact
  decimal total back to DOUBLE.
- AVG = CAST(sum_dec AS DOUBLE) / count — one IEEE division, bit-identical
  in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openalex_walden_spark.queries.registry import register

# Spark and DuckDB share these helper fragments verbatim (ANSI SQL).
_DEC = "CAST({x} AS DECIMAL(18,2))"


def dsum(x: str) -> str:
    return f"CAST(SUM(CAST({x} AS DECIMAL(18,2))) AS DOUBLE)"


def dsum4(x: str) -> str:
    """Decimal sum at scale 4 — for price*(1-discount) products.

    The product of two 2-decimal values is an exact 4-decimal value;
    rounding it to scale 2 lands exactly on .xx50 ties where Spark
    (HALF_UP) and DuckDB disagree. Scale 4 has no tie to round, so the
    cast is exact in both engines and the final DOUBLE is bit-identical.
    """
    return f"CAST(SUM(CAST({x} AS DECIMAL(18,4))) AS DOUBLE)"


def davg(x: str) -> str:
    return f"CAST(SUM(CAST({x} AS DECIMAL(18,2))) AS DOUBLE) / COUNT({x})"


# --------------------------------------------------------------------------
# q1: TPC-H Q1-shaped aggregation battery (A1, A5)
# --------------------------------------------------------------------------
_Q1_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {dsum('l_quantity')}                                 AS sum_qty,
  {dsum('l_extendedprice')}                            AS sum_base_price,
  {dsum4('l_extendedprice * (1 - l_discount)')}         AS sum_disc_price,
  {davg('l_quantity')}                                 AS avg_qty,
  {davg('l_extendedprice')}                            AS avg_price,
  {davg('l_discount')}                                 AS avg_disc,
  COUNT(*)                                             AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_SQL, tags=("agg", "scan", "A1"), tables=("lineitem",))
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary (TPC-H Q1 shape): scan-filter-aggregate battery.

    Plan check: filter pushes to the parquet scan; partial aggregation
    (map-side combine) before the single shuffle on the 2-col group key.
    """
    return spark.sql(_Q1_SQL)


# --------------------------------------------------------------------------
# q3: join + grouped revenue (J1)
# --------------------------------------------------------------------------
_Q3_SQL = f"""
SELECT
  o.o_orderkey                                         AS orderkey,
  CAST(o.o_orderdate AS DATE)                          AS orderdate,
  o.o_orderpriority                                    AS orderpriority,
  {dsum4('l.l_extendedprice * (1 - l.l_discount)')}     AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND CAST(o.o_orderdate AS DATE) < DATE '1998-03-15'
  AND CAST(l.l_shipdate  AS DATE) > DATE '1998-03-15'
GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
"""


@register("q3_shipping_priority", oracle=_Q3_SQL, tags=("join", "agg", "J1"), tables=("customer", "orders", "lineitem"))
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-orders-lineitem join with grouped revenue (TPC-H Q3 shape)."""
    c = spark.table("customer").where(F.col("c_mktsegment") == "BUILDING")
    o = spark.table("orders").where(F.col("o_orderdate").cast("date") < F.lit("1998-03-15").cast("date"))
    l = spark.table("lineitem").where(F.col("l_shipdate").cast("date") > F.lit("1998-03-15").cast("date"))
    dec = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(F.sum(dec).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# q5: star join through region→nation→customer→orders→lineitem→supplier (J1)
# --------------------------------------------------------------------------
_Q5_SQL = f"""
SELECT
  n.n_name                                             AS nation,
  {dsum4('l.l_extendedprice * (1 - l.l_discount)')}     AS revenue
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
"""


@register("q5_local_supplier_volume", oracle=_Q5_SQL, tags=("join", "agg", "broadcast", "J1"), tables=("region", "nation", "customer", "supplier", "orders", "lineitem"))
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-way star join; dimension sides explicitly broadcast.

    At 100 TB the fact side (lineitem) never shuffles for these dims:
    region/nation/customer/supplier are broadcast, so the only exchange is
    the final small group-by.
    """
    r = F.broadcast(spark.table("region").where(F.col("r_name") == "ASIA"))
    n = F.broadcast(spark.table("nation"))
    c = F.broadcast(spark.table("customer"))
    s = F.broadcast(spark.table("supplier"))
    o = spark.table("orders")
    l = spark.table("lineitem")
    dec = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (s.s_nationkey == n.n_nationkey))
        .groupBy(n.n_name.alias("nation"))
        .agg(F.sum(dec).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# anti / semi joins (J3, J4)
# --------------------------------------------------------------------------
_ANTI_SQL = """
SELECT c.c_custkey AS custkey, c.c_name AS name
FROM customer c
LEFT JOIN (SELECT DISTINCT o_custkey FROM orders
           WHERE o_orderpriority = '1-URGENT') o
  ON o.o_custkey = c.c_custkey
WHERE o.o_custkey IS NULL
"""


@register("join_anti_customers_without_orders", oracle=_ANTI_SQL, tags=("join", "J3"), tables=("customer", "orders"))
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join: customers with no urgent order (filtered right
    side keeps the result non-empty at every SF — a 0-row anti-join is
    vacuous correctness evidence)."""
    c = spark.table("customer")
    o = spark.table("orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name")
    )


_SEMI_SQL = """
SELECT c.c_custkey AS custkey, c.c_mktsegment AS mktsegment
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
"""


@register("join_semi_customers_with_urgent", oracle=_SEMI_SQL, tags=("join", "J4"), tables=("customer", "orders"))
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS shape): customers with ≥1 urgent order."""
    c = spark.table("customer")
    o = spark.table("orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("mktsegment")
    )


# --------------------------------------------------------------------------
# full outer join with coalesced key (J5)
# --------------------------------------------------------------------------
_FULL_OUTER_SQL = """
WITH cust AS (
  SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
  FROM customer GROUP BY c_nationkey
),
supp AS (
  SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
  FROM supplier GROUP BY s_nationkey
)
SELECT
  COALESCE(c.nationkey, s.nationkey) AS nationkey,
  COALESCE(c.n_customers, 0)         AS n_customers,
  COALESCE(s.n_suppliers, 0)         AS n_suppliers
FROM cust c
FULL OUTER JOIN supp s ON c.nationkey = s.nationkey
"""


@register("join_full_outer_nation_counts", oracle=_FULL_OUTER_SQL, tags=("join", "J5"), tables=("customer", "supplier"))
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates with coalesced keys."""
    cust = (
        spark.table("customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )
    supp = (
        spark.table("supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return (
        cust.join(supp, "nationkey", "full_outer")
        .select(
            F.col("nationkey"),
            F.coalesce(F.col("n_customers"), F.lit(0)).alias("n_customers"),
            F.coalesce(F.col("n_suppliers"), F.lit(0)).alias("n_suppliers"),
        )
    )


# --------------------------------------------------------------------------
# null-safe join (J2): IS NOT DISTINCT FROM compound key
# --------------------------------------------------------------------------
_NULLSAFE_SQL = """
WITH c AS (
  SELECT c_custkey, NULLIF(c_nationkey % 5, 0) AS band FROM customer
),
s AS (
  SELECT s_suppkey, NULLIF(s_nationkey % 5, 0) AS band FROM supplier
)
SELECT c.band AS band, COUNT(*) AS n_pairs
FROM c JOIN s ON c.band IS NOT DISTINCT FROM s.band
GROUP BY c.band
"""


@register("join_nullsafe_band", oracle=_NULLSAFE_SQL, tags=("join", "J2"), tables=("customer", "supplier"))
def join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=>): NULL keys match each other.

    Mirrors the reference's IS NOT DISTINCT FROM merge keys
    (CreateLocationsMapped.sql:330-349).
    """
    c = spark.table("customer").select(
        "c_custkey", F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("band")
    )
    s = spark.table("supplier").select(
        "s_suppkey", F.nullif(F.col("s_nationkey") % 5, F.lit(0)).alias("band")
    )
    return (
        c.alias("c")
        .join(s.alias("s"), F.col("c.band").eqNullSafe(F.col("s.band")))
        .groupBy(F.col("c.band").alias("band"))
        .agg(F.count("*").alias("n_pairs"))
    )


# --------------------------------------------------------------------------
# correlated scalar subquery → decorrelated join (J4/§4)
# --------------------------------------------------------------------------
_ABOVE_AVG_SQL = """
WITH stats AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
  FROM orders GROUP BY o_custkey
)
SELECT o.o_orderkey AS orderkey, o.o_custkey AS custkey
FROM orders o JOIN stats t ON o.o_custkey = t.o_custkey
WHERE o.o_totalprice > t.avg_price
"""


@register("subquery_orders_above_cust_avg", oracle=_ABOVE_AVG_SQL, tags=("join", "window", "J4"), tables=("orders",))
def subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above their customer's average price.

    Implemented with a window (single shuffle on custkey, no self-join) —
    the plan Catalyst would decorrelate the subquery into anyway.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey")
    o = spark.table("orders").withColumn(
        "avg_price",
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")
         / F.count("*").over(w)),
    )
    return o.where(F.col("o_totalprice") > F.col("avg_price")).select(
        F.col("o_orderkey").alias("orderkey"), F.col("o_custkey").alias("custkey")
    )


# --------------------------------------------------------------------------
# HAVING guard (A9)
# --------------------------------------------------------------------------
_HAVING_SQL = """
SELECT o_custkey AS custkey, COUNT(DISTINCT o_orderpriority) AS n_priorities
FROM orders
GROUP BY o_custkey
HAVING COUNT(DISTINCT o_orderpriority) >= 4
"""


@register("agg_having_priority_spread", oracle=_HAVING_SQL, tags=("agg", "A9"), tables=("orders",))
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING over a distinct count (ambiguity-guard shape,
    CreateLocationsMapped.sql:950-961)."""
    return (
        spark.table("orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.countDistinct("o_orderpriority").alias("n_priorities"))
        .where(F.col("n_priorities") >= 4)
    )


# --------------------------------------------------------------------------
# GROUPING SETS (A10)
# --------------------------------------------------------------------------
_GSETS_SQL = """
SELECT c_mktsegment AS mktsegment, c_nationkey AS nationkey,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey), (c_mktsegment), ())
"""


@register("agg_grouping_sets", oracle=_GSETS_SQL, tags=("agg", "A10"), tables=("customer",))
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS: per-(segment, nation), per-segment, and global totals
    in one pass (author topic-share shape, CreateAuthors.ipynb cell 4)."""
    return spark.sql(_GSETS_SQL)


# --------------------------------------------------------------------------
# exact percentiles (A11)
# --------------------------------------------------------------------------
_PCTL_SQL = """
SELECT c_mktsegment AS mktsegment,
       quantile_cont(c_acctbal, 0.5)  AS p50,
       quantile_cont(c_acctbal, 0.95) AS p95
FROM customer
GROUP BY c_mktsegment
"""


@register("agg_percentiles_by_segment", oracle=_PCTL_SQL, tags=("agg", "A11"), tables=("customer",))
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per segment.

    Spark `percentile` and DuckDB `quantile_cont` share the type-7
    definition; for 100 TB switch to percentile_approx (the reference's
    choice — AuthorshipDailyMetrics.py:482).
    """
    return (
        spark.table("customer")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.expr("percentile(c_acctbal, 0.5)").alias("p50"),
            F.expr("percentile(c_acctbal, 0.95)").alias("p95"),
        )
    )


# --------------------------------------------------------------------------
# min_by / max_by with total tie-break (A4)
# --------------------------------------------------------------------------
# DuckDB 1.0 has no list/struct-keyed arg_max, so the oracle totalizes the
# ordering with row_number windows instead (same semantics as the Spark
# array-keyed max_by: price first, orderkey as tie-break).
_MAXBY_SQL = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice ASC, o_orderkey ASC)  AS rmin
  FROM orders
)
SELECT o_custkey AS custkey,
       MAX(CASE WHEN rmax = 1 THEN o_orderkey END) AS best_orderkey,
       MAX(CASE WHEN rmin = 1 THEN o_orderkey END) AS worst_orderkey
FROM ranked
GROUP BY o_custkey
"""


@register("agg_max_by_order", oracle=_MAXBY_SQL, tags=("agg", "A4"), tables=("orders",))
def agg_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by with an array ordering key whose trailing element makes
    the comparison total (determinism contract — SURVEY.md §4)."""
    key = F.array(F.col("o_totalprice"), F.col("o_orderkey").cast("double"))
    return (
        spark.table("orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.expr(
                "max_by(o_orderkey, array(o_totalprice, cast(o_orderkey as double)))"
            ).alias("best_orderkey"),
            F.expr(
                "min_by(o_orderkey, array(o_totalprice, cast(o_orderkey as double)))"
            ).alias("worst_orderkey"),
        )
    )


# --------------------------------------------------------------------------
# conditional aggregation battery (A5)
# --------------------------------------------------------------------------
_CONDAGG_SQL = """
SELECT o_custkey AS custkey,
       count_if(o_orderstatus = 'F')::BIGINT                    AS n_finished,
       count_if(o_orderstatus = 'O')::BIGINT                    AS n_open,
       count_if(o_orderpriority = '1-URGENT')::BIGINT           AS n_urgent,
       count_if(o_totalprice > 200000)::BIGINT                  AS n_large,
       count_if(EXTRACT(year FROM o_orderdate) >= 1998)::BIGINT AS n_recent
FROM orders
GROUP BY o_custkey
"""


@register("agg_conditional_battery", oracle=_CONDAGG_SQL, tags=("agg", "A5"), tables=("orders",))
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_if battery (match-strategy counting shape, MatchAuthors cell 9)."""
    o = spark.table("orders")
    return o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        F.count_if(F.col("o_orderstatus") == "O").alias("n_open"),
        F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
        F.count_if(F.col("o_totalprice") > 200000).alias("n_large"),
        F.count_if(F.year("o_orderdate") >= 1998).alias("n_recent"),
    )


# --------------------------------------------------------------------------
# sorted collect_list rendered as string (A2 + determinism contract)
# --------------------------------------------------------------------------
_COLLECT_SQL = """
SELECT n_nationkey AS nationkey,
       string_agg(c_name, ',' ORDER BY c_name) AS customer_names,
       COUNT(*) AS n_customers
FROM nation JOIN customer ON c_nationkey = n_nationkey
GROUP BY n_nationkey
"""


@register("agg_sorted_collect", oracle=_COLLECT_SQL, tags=("agg", "A2"), tables=("nation", "customer"))
def agg_sorted_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list roll-up with the mandatory deterministic sort
    (SURVEY.md §4 determinism engineering) rendered as a joined string."""
    n = F.broadcast(spark.table("nation"))
    c = spark.table("customer")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_nationkey").alias("nationkey"))
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("customer_names"),
            F.count("*").alias("n_customers"),
        )
    )


# --------------------------------------------------------------------------
# Pivot (wide crosstab) and unpivot/melt (tall) — the reshape surface
# --------------------------------------------------------------------------
_PIVOT_SQL = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
FROM orders
GROUP BY o_orderpriority
"""


@register(
    "agg_pivot_status",
    oracle=_PIVOT_SQL,
    tags=("agg", "pivot", "reshape"),
    tables=("orders",),
)
def agg_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`groupBy().pivot()` crosstab: order counts per priority, one
    column per status.  The pivot VALUES are pinned explicitly — with
    an explicit list Catalyst plans a single pass (conditional counts,
    no distinct-values pre-query, stable column order); an open-ended
    pivot would first run a distinct scan to discover columns, which at
    100 TB is both a second pass and a schema nondeterminism hazard.
    """
    return (
        spark.table("orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )


_UNPIVOT_SQL = """
SELECT o_orderkey, 'o_custkey' AS metric, o_custkey AS val FROM orders
WHERE o_orderkey % 50 = 0
UNION ALL
SELECT o_orderkey, 'o_year' AS metric,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)
FROM orders WHERE o_orderkey % 50 = 0
"""


@register(
    "f_unpivot_melt",
    oracle=_UNPIVOT_SQL,
    tags=("reshape", "unpivot"),
    tables=("orders",),
)
def f_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`DataFrame.unpivot` (melt): wide metric columns → tall
    (id, metric, value) rows — the inverse reshape of pivot and the
    exact shape the a8 tall-metrics snapshot consumes.  Map-side only:
    unpivot is a Generate (no shuffle, no UNION rescan of the input —
    the hand-written UNION ALL oracle scans the table twice; the
    operator scans once).
    """
    return (
        spark.table("orders")
        .where(F.col("o_orderkey") % 50 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .unpivot(
            ids=["o_orderkey"],
            values=["o_custkey", "o_year"],
            variableColumnName="metric",
            valueColumnName="val",
        )
    )


# --------------------------------------------------------------------------
# Table profiling (the Deequ/dbt-style column-statistics operator)
# --------------------------------------------------------------------------
_PROFILE_SQL = """
SELECT 'o_orderkey' AS col, COUNT(*) AS n_rows,
       SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
       COUNT(DISTINCT o_orderkey) AS n_distinct,
       MIN(o_orderkey)::VARCHAR AS min_val, MAX(o_orderkey)::VARCHAR AS max_val
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*),
       SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)::BIGINT,
       COUNT(DISTINCT o_orderstatus),
       MIN(o_orderstatus), MAX(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*),
       SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)::BIGINT,
       COUNT(DISTINCT o_orderpriority),
       MIN(o_orderpriority), MAX(o_orderpriority)
FROM orders
UNION ALL
SELECT 'o_orderdate', COUNT(*),
       SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)::BIGINT,
       COUNT(DISTINCT o_orderdate),
       strftime(MIN(o_orderdate), '%Y-%m-%d'), strftime(MAX(o_orderdate), '%Y-%m-%d')
FROM orders
"""


@register(
    "profile_table_stats",
    oracle=_PROFILE_SQL,
    tags=("profiling", "quality"),
    tables=("orders",),
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-statistics profile (the Deequ / dbt-test shape the
    reference's Guardrails notebook hand-rolls per metric): one row per
    profiled column with rowcount, null count, exact distinct count,
    and min/max rendered to strings — the payload a data-quality gate
    or a CBO stats collector consumes.

    The oracle's natural form is one scan per column UNION ALL'd; the
    Spark plan computes ALL columns' statistics in a SINGLE pass (one
    aggregate over the scan, no per-column rescans) and unpivots the
    struct — at 100 TB the difference between 1 scan and N scans IS the
    operator.  Exact distincts shuffle once on values per column via
    count(distinct ...)'s Expand; swap in approx_count_distinct (HLL,
    `sketch_hll_distinct`) when exactness isn't required.

    Dates render through an explicit yyyy-MM-dd format so the string
    form is timezone-free and engine-identical.
    """
    o = spark.table("orders")

    def stats(col, render):
        return [
            F.count("*").alias(f"{col}__n_rows"),
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias(f"{col}__n_null"),
            F.countDistinct(col).alias(f"{col}__n_distinct"),
            render(F.min(col)).alias(f"{col}__min_val"),
            render(F.max(col)).alias(f"{col}__max_val"),
        ]

    as_str = lambda c: c.cast("string")  # noqa: E731
    as_date = lambda c: F.date_format(c, "yyyy-MM-dd")  # noqa: E731
    cols = [
        ("o_orderkey", as_str),
        ("o_orderstatus", as_str),
        ("o_orderpriority", as_str),
        ("o_orderdate", as_date),
    ]
    aggs = [a for col, render in cols for a in stats(col, render)]
    wide = o.agg(*aggs)
    profile_rows = [
        F.struct(
            F.lit(col).alias("col"),
            F.col(f"{col}__n_rows").alias("n_rows"),
            F.col(f"{col}__n_null").cast("bigint").alias("n_null"),
            F.col(f"{col}__n_distinct").alias("n_distinct"),
            F.col(f"{col}__min_val").alias("min_val"),
            F.col(f"{col}__max_val").alias("max_val"),
        )
        for col, _ in cols
    ]
    return wide.select(F.explode(F.array(*profile_rows)).alias("p")).select("p.*")


# --------------------------------------------------------------------------
# Snapshot smoke report: the §5-layer-3 health battery as ONE aggregate
# --------------------------------------------------------------------------
# The reference's snapshot smoke tests (notebooks/snapshot/
# smoke_tests.ipynb, 27 cells) fold their scan-shaped checks — id
# format (T1), null checks (T7), duplicate ids (T8), population rates
# (T5/T13), updated-date recency (T12) — into per-table aggregates.
# operators/smoke.py:smoke_aggregate compiles the same battery into a
# single one-row scan; this query runs it over the documents table
# dressed as a works-snapshot plane (openalex W-ids, a synthetic
# updated_date lattice) so the whole battery is hash-checked against
# DuckDB.  The directory- and schema-shaped checks (manifest T9,
# partition paths T10, JSON validity T11, structure T3/T6) have no
# relational form and are covered by tests/test_io.py breach tests.
_SMOKE_AS_OF = "2025-06-01"

_SMOKE_SQL = f"""
WITH plane AS (
  SELECT concat('https://openalex.org/W', CAST(doc_id AS VARCHAR)) AS id,
         text AS title, lang, n_chars,
         DATE '2024-01-01' + INTERVAL ((doc_id % 400)::INT) DAY AS updated_date
  FROM documents
)
SELECT
  count(*)::BIGINT AS n_total,
  count_if(id IS NULL)::BIGINT AS n_null_id,
  count_if(id IS NOT NULL
           AND NOT regexp_matches(id, '^https://openalex[.]org/W[0-9]+$'))::BIGINT
    AS n_bad_id_format,
  (count(id) - count(DISTINCT id))::BIGINT AS n_dup_ids,
  count_if(title IS NULL)::BIGINT AS n_null_title,
  count_if(lang IS NULL)::BIGINT AS n_null_lang,
  count_if(n_chars >= 200)::BIGINT AS n_long_text,
  count_if(lang = 'en')::BIGINT AS n_english,
  datediff('day', max(updated_date), DATE '{_SMOKE_AS_OF}')::BIGINT AS days_stale
FROM plane
"""


@register(
    "snapshot_smoke_report",
    oracle=_SMOKE_SQL,
    tags=("smoke", "quality", "aggregation"),
    tables=("documents",),
)
def snapshot_smoke_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The snapshot health battery (see block comment) as one shuffle-
    free aggregate: at 100 TB the battery costs exactly one pass over
    the serving-shaped table; every counter combines map-side and the
    exchange carries a single row."""
    from openalex_walden_spark.operators.smoke import smoke_aggregate

    plane = spark.table("documents").select(
        F.concat(
            F.lit("https://openalex.org/W"), F.col("doc_id").cast("string")
        ).alias("id"),
        F.col("text").alias("title"),
        "lang",
        "n_chars",
        F.expr("date_add(date'2024-01-01', cast(doc_id % 400 as int))").alias(
            "updated_date"
        ),
    )
    return smoke_aggregate(
        plane,
        id_pattern=r"^https://openalex[.]org/W[0-9]+$",
        required_fields=("title", "lang"),
        populated={
            "long_text": F.col("n_chars") >= 200,
            "english": F.col("lang") == "en",
        },
        updated_col="updated_date",
        as_of=_SMOKE_AS_OF,
    )
