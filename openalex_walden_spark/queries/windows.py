"""Window-function family (SURVEY.md §2.5 W1-W8, §2.6 T4).

The reference's single most-used device: every dedup/top-1 pick is a
``row_number()`` ladder with a fully-totalized ORDER BY
(``CreateSuperLocations.ipynb`` cell 1 lines 16-45; ``CreateWorksBase.ipynb``
cell 2 ``QUALIFY row_num <= 10``), FWCI/percentiles are avg/percent_rank
over cohort partitions (``CreateWorksEnriched.ipynb`` cell 11).

Determinism contract: every ORDER BY carries a unique trailing key so
Spark and the DuckDB oracle rank identically. All integer outputs are cast
BIGINT on both sides so schemas agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from openalex_walden_spark.queries.registry import register

# --------------------------------------------------------------------------
# W1: row_number top-1 pick per group (the dedup ladder)
# --------------------------------------------------------------------------
_W1_SQL = """
SELECT o_custkey AS custkey, o_orderkey AS orderkey, o_totalprice AS totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
"""


@register("w1_top_order_per_customer", oracle=_W1_SQL, tags=("window", "W1"), tables=("orders",))
def w1_top_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-record pick per customer: row_number ladder with hash-free total
    ordering (price desc, orderkey desc tie-break).

    Scale note: one shuffle on the partition key; at 100 TB AQE handles the
    skewed-customer case, and the filter-on-rn prunes before any later join.
    """
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").desc()
    )
    return (
        spark.table("orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


# --------------------------------------------------------------------------
# W2/T4: QUALIFY-style top-k per group
# --------------------------------------------------------------------------
_W2_SQL = """
SELECT o_custkey AS custkey, o_orderkey AS orderkey, CAST(rn AS BIGINT) AS rn
FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
"""


@register("w2_qualify_top3_orders", oracle=_W2_SQL, tags=("window", "W2", "T4"), tables=("orders",))
def w2_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-3-orders-per-customer: the QUALIFY row_num <= k idiom
    (CreateWorksBase.ipynb cell 2 line 278). OSS Spark has no QUALIFY
    keyword, so the engine's canonical form is window + filter — Catalyst
    produces the identical plan."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return (
        spark.table("orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("rn").cast("bigint").alias("rn"),
        )
    )


# --------------------------------------------------------------------------
# W3: percent_rank cohort percentile
# --------------------------------------------------------------------------
_W3_SQL = """
SELECT o_orderkey AS orderkey,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS cohort_year,
       percent_rank() OVER (PARTITION BY EXTRACT(year FROM o_orderdate)
                            ORDER BY o_totalprice) AS price_percentile
FROM orders
"""


@register("w3_percent_rank_cohort", oracle=_W3_SQL, tags=("window", "W3"), tables=("orders",))
def w3_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort percentile (citation-percentile shape, CreateWorksEnriched
    cell 11): percent_rank within publication-year cohort. (rank-1)/(n-1)
    is the same IEEE division in both engines."""
    year = F.year("o_orderdate")
    w = Window.partitionBy(year).orderBy(F.col("o_totalprice"))
    return spark.table("orders").select(
        F.col("o_orderkey").alias("orderkey"),
        year.cast("bigint").alias("cohort_year"),
        F.percent_rank().over(w).alias("price_percentile"),
    )


# --------------------------------------------------------------------------
# W4: avg over partition (FWCI shape)
# --------------------------------------------------------------------------
_W4_SQL = """
SELECT o_orderkey AS orderkey,
       o_totalprice / (CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                            OVER (PARTITION BY o_orderpriority) AS DOUBLE)
                       / COUNT(*) OVER (PARTITION BY o_orderpriority)) AS fwci
FROM orders
"""


@register("w4_fwci_ratio", oracle=_W4_SQL, tags=("window", "W4"), tables=("orders",))
def w4_fwci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FWCI shape: value ÷ cohort mean via avg-over-partition
    (CreateWorksEnriched cell 11 `with_fwci`). The mean is decimal-sum /
    count so both engines divide the same two exact numbers."""
    w = Window.partitionBy("o_orderpriority")
    mean = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast(
        "double"
    ) / F.count("*").over(w)
    return spark.table("orders").select(
        F.col("o_orderkey").alias("orderkey"),
        (F.col("o_totalprice") / mean).alias("fwci"),
    )


# --------------------------------------------------------------------------
# W5: running sum with ROWS frame
# --------------------------------------------------------------------------
_W5_SQL = """
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate ASC, o_orderkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_spend
FROM orders
"""


@register("w5_running_revenue", oracle=_W5_SQL, tags=("window", "W5"), tables=("orders",))
def w5_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer (ROWS UNBOUNDED PRECEDING — the
    cumulative-frequency / seat-cap admission frame, MatchAuthors cell 5).
    Decimal accumulation keeps every prefix exact in both engines."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return spark.table("orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("running_spend"),
    )


# --------------------------------------------------------------------------
# W6: max-over-partition flag propagation
# --------------------------------------------------------------------------
_W6_SQL = """
SELECT o_orderkey AS orderkey, o_custkey AS custkey,
       CAST(MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
            OVER (PARTITION BY o_custkey) AS BIGINT) AS cust_has_urgent
FROM orders
"""


@register("w6_flag_propagation", oracle=_W6_SQL, tags=("window", "W6"), tables=("orders",))
def w6_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level flag lifted to the group and propagated back to every row
    (work_has_corresponding shape, CreateWorksBase cell 2)."""
    w = Window.partitionBy("o_custkey")
    flag = F.max(
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(1)).otherwise(F.lit(0))
    ).over(w)
    return spark.table("orders").select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_custkey").alias("custkey"),
        flag.cast("bigint").alias("cust_has_urgent"),
    )


# --------------------------------------------------------------------------
# W7: count over partition (uniqueness guard)
# --------------------------------------------------------------------------
_W7_SQL = """
SELECT l_orderkey AS orderkey, CAST(l_linenumber AS BIGINT) AS linenumber,
       COUNT(*) OVER (PARTITION BY l_orderkey) AS n_lines,
       COUNT(*) OVER (PARTITION BY l_orderkey, l_suppkey) AS n_lines_same_supp
FROM lineitem
"""


@register("w7_count_over_partition", oracle=_W7_SQL, tags=("window", "W7"), tables=("lineitem",))
def w7_count_over(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniqueness-guard counts (COUNT(*) OVER — the ORCID-reuse /
    normalized-publisher guard shape, MatchAuthors cell 9)."""
    li = spark.table("lineitem")
    return li.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").cast("bigint").alias("linenumber"),
        F.count("*").over(Window.partitionBy("l_orderkey")).alias("n_lines"),
        F.count("*").over(Window.partitionBy("l_orderkey", "l_suppkey")).alias("n_lines_same_supp"),
    )


# --------------------------------------------------------------------------
# W8: ntile bucketing
# --------------------------------------------------------------------------
_W8_SQL = """
SELECT c_custkey AS custkey,
       CAST(ntile(4) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS BIGINT) AS balance_quartile
FROM customer
"""


@register("w8_ntile_quartiles", oracle=_W8_SQL, tags=("window", "W8"), tables=("customer",))
def w8_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bucketing over a totalized ordering (similarity-analysis
    NTILE shape, ComputeAuthorshipSimilarity.ipynb).

    Scale note: a global un-partitioned window is a single-task sort at
    100 TB — acceptable only for diagnostics; production variants should
    partition first."""
    w = Window.orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    return spark.table("customer").select(
        F.col("c_custkey").alias("custkey"),
        F.ntile(4).over(w).cast("bigint").alias("balance_quartile"),
    )


# --------------------------------------------------------------------------
# W1b: the quality CASE-ladder pick with a portable hash tie-break
# --------------------------------------------------------------------------
_W1_LADDER_SQL = """
SELECT custkey, picked_order, status_rank
FROM (
  SELECT o_custkey AS custkey, o_orderkey AS picked_order,
         CASE o_orderstatus WHEN 'F' THEN 0 WHEN 'O' THEN 1 ELSE 2 END
           AS status_rank,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY CASE o_orderstatus WHEN 'F' THEN 0 WHEN 'O' THEN 1
                    ELSE 2 END ASC,
                    CASE WHEN o_orderpriority LIKE '1-%' THEN 0 ELSE 1 END ASC,
                    o_totalprice DESC,
                    ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT ASC,
                    o_orderkey ASC) AS rn
  FROM orders
) WHERE rn = 1
"""


@register(
    "w1_quality_ladder_pick",
    oracle=_W1_LADDER_SQL,
    tags=("window", "W1", "D3"),
    tables=("orders",),
)
def w1_quality_ladder_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 in its production form: the best-record pick whose ORDER BY is
    a CASE quality ladder (status class, priority class, value) with a
    HASH tie-break (``CreateSuperLocations.ipynb`` cell 1 lines 16-45;
    the reference tie-breaks with xxhash64 — here the engine-portable
    md5-derived 60-bit hash so the oracle can replicate bit-for-bit)
    and a final total ordering on the key. Every ordering totalized —
    the determinism discipline the oracle contract depends on."""
    status_rank = (
        F.when(F.col("o_orderstatus") == "F", 0)
        .when(F.col("o_orderstatus") == "O", 1)
        .otherwise(2)
    )
    urgent_rank = F.when(F.col("o_orderpriority").startswith("1-"), 0).otherwise(1)
    tie = F.expr(
        "cast(conv(substr(md5(cast(o_orderkey as string)), 1, 15), 16, 10) as bigint)"
    )
    w = Window.partitionBy("o_custkey").orderBy(
        status_rank.asc(),
        urgent_rank.asc(),
        F.col("o_totalprice").desc(),
        tie.asc(),
        F.col("o_orderkey").asc(),
    )
    return (
        spark.table("orders")
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("picked_order"),
            status_rank.alias("status_rank"),
        )
    )
