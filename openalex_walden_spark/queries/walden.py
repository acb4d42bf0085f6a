"""Domain operators (SURVEY.md §2.11 D1/D2/D5/D9, §2.3 J6-J8/J11/J13,
§2.6 T1-T3, §2.7 U2/U4) re-expressed over the TPC-H-shaped test tables.

The mapping: an *order* plays the role of a work, its *lineitems* are the
work's references/locations, *partkeys* are the cited work ids. The
citation graph device is identical to the reference's
``explode(referenced_works)`` → groupBy → join-back
(``CreateWorksEnriched.ipynb`` cells 5-7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from openalex_walden_spark.queries.registry import register
from openalex_walden_spark.queries.relational import dsum4

# --------------------------------------------------------------------------
# D5 + J11: citation counts via explode of an adjacency array
# --------------------------------------------------------------------------
_D5_SQL = """
SELECT l_partkey AS cited_id, COUNT(*) AS cited_by_count,
       COUNT(DISTINCT l_orderkey) AS citing_works
FROM lineitem
GROUP BY l_partkey
"""


@register("d5_citation_counts", oracle=_D5_SQL, tags=("domain", "explode", "D5", "J11", "A2"), tables=("lineitem",))
def d5_citation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Citation counting through the reference's adjacency-array shape:
    build referenced_works ARRAY per citing work (sorted collect — A2),
    EXPLODE the edges (J11), count per cited id
    (CreateWorksEnriched.ipynb cells 5-7).

    The array round-trip is deliberate: it proves the nested data plane.
    The oracle states the flat equivalent. Scale note: explode is
    map-side; the only shuffle is the final count on cited_id.
    """
    refs = (
        spark.table("lineitem")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_list("l_partkey")).alias("referenced_works"))
    )
    edges = refs.select(
        F.col("l_orderkey"), F.explode("referenced_works").alias("cited_id")
    )
    return edges.groupBy("cited_id").agg(
        F.count("*").alias("cited_by_count"),
        F.countDistinct("l_orderkey").alias("citing_works"),
    )


# --------------------------------------------------------------------------
# D5: counts_by_year time-series array, rendered deterministically
# --------------------------------------------------------------------------
_CBY_SQL = """
SELECT l_partkey AS cited_id,
       string_agg(yr || ':' || cnt, ',' ORDER BY yr) AS counts_by_year
FROM (
  SELECT l_partkey,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         COUNT(*) AS cnt
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE EXTRACT(year FROM o_orderdate) >= 1996
  GROUP BY l_partkey, EXTRACT(year FROM o_orderdate)
)
GROUP BY l_partkey
"""


@register("d5_counts_by_year", oracle=_CBY_SQL, tags=("domain", "D5", "A2"), tables=("lineitem", "orders"))
def d5_counts_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """counts_by_year ARRAY<STRUCT<year,count>> per cited id (≥1996 floor —
    the reference floors at 2012, CreateWorksEnriched cell 7), rendered as
    a sorted 'year:count' string so the oracle hash is array-order-proof."""
    per_year = (
        spark.table("lineitem")
        .join(spark.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("yr", F.year("o_orderdate").cast("bigint"))
        .where(F.col("yr") >= 1996)
        .groupBy("l_partkey", "yr")
        .agg(F.count("*").alias("cnt"))
    )
    series = F.array_sort(F.collect_list(F.struct("yr", "cnt")))
    return (
        per_year.groupBy(F.col("l_partkey").alias("cited_id"))
        .agg(
            F.array_join(
                F.transform(
                    series,
                    lambda p: F.concat_ws(":", p.getField("yr"), p.getField("cnt")),
                ),
                ",",
            ).alias("counts_by_year")
        )
    )


# --------------------------------------------------------------------------
# J13: posexplode (lateral view) — authorship seats shape
# --------------------------------------------------------------------------
_SEATS_SQL = """
SELECT l_orderkey AS orderkey,
       CAST(row_number() OVER (PARTITION BY l_orderkey
                               ORDER BY l_linenumber ASC, l_partkey ASC) - 1 AS BIGINT) AS pos,
       l_partkey AS member_id
FROM lineitem
"""


@register("j13_posexplode_seats", oracle=_SEATS_SQL, tags=("explode", "J13"), tables=("lineitem",))
def j13_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSEXPLODE of a per-work ordered member array → (work, seat, member)
    (authorship-seats shape, MatchAuthors.ipynb cell 3): collect lineitems
    sorted by linenumber, posexplode back out with seat positions."""
    members = (
        spark.table("lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("l_linenumber", "l_partkey"))),
                lambda s: s.getField("l_partkey"),
            ).alias("members")
        )
    )
    return members.select(
        F.col("l_orderkey").alias("orderkey"),
        F.posexplode("members").alias("pos", "member_id"),
    ).select(
        "orderkey", F.col("pos").cast("bigint").alias("pos"), F.col("member_id")
    )


# --------------------------------------------------------------------------
# D1 + A3: provenance-priority field merge
# --------------------------------------------------------------------------
_D1_SQL = """
WITH catalog_src AS (
  SELECT p_partkey AS partkey, CAST(p_retailprice AS VARCHAR) AS value, 1 AS priority
  FROM part WHERE p_partkey % 7 <> 0
),
market_src AS (
  SELECT l_partkey AS partkey, CAST(MIN(l_extendedprice) AS VARCHAR) AS value, 2 AS priority
  FROM lineitem GROUP BY l_partkey
),
unioned AS (
  SELECT * FROM catalog_src UNION ALL SELECT * FROM market_src
)
SELECT partkey,
       MAX(CASE WHEN rn = 1 THEN value END) AS best_price,
       COUNT(*) AS n_sources
FROM (
  SELECT partkey, value, priority,
         row_number() OVER (PARTITION BY partkey ORDER BY priority ASC) AS rn
  FROM unioned
  WHERE value IS NOT NULL AND value <> ''
)
GROUP BY partkey
"""


@register("d1_priority_merge", oracle=_D1_SQL, tags=("domain", "D1", "A3", "U1"), tables=("part", "lineitem"))
def d1_priority_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance-priority field merge (the CreateWorksBase device, D1):
    collect each field's (value, priority) candidates from N sources per
    entity, fold to the best via the aggregate() HOF — the engine's
    equivalent of the reference's SQL UDF ``get_highest_priority_value``
    (CreateWorksBase.ipynb cell 2 lines 53-70).

    Priority 1 = catalog (part table, with simulated gaps), priority 2 =
    market (min observed lineitem price). The fold runs inside the
    per-entity aggregation — no extra shuffle beyond the groupBy.
    """
    from openalex_walden_spark.functions.arrays import priority_pick

    catalog = (
        spark.table("part")
        .where(F.col("p_partkey") % 7 != 0)
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_retailprice").cast("string").alias("value"),
            F.lit(1).alias("priority"),
        )
    )
    market = (
        spark.table("lineitem")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.min("l_extendedprice").cast("string").alias("value"))
        .withColumn("priority", F.lit(2))
    )
    unioned = catalog.unionByName(market)
    collected = unioned.groupBy("partkey").agg(
        F.array_sort(F.collect_list(F.struct("value", "priority"))).alias("candidates"),
        F.count("*").alias("n_sources"),
    )
    return collected.select(
        "partkey",
        priority_pick(F.col("candidates")).alias("best_price"),
        "n_sources",
    )


# --------------------------------------------------------------------------
# J6: range/θ-join as equi-join + conditional window sum
# --------------------------------------------------------------------------
_J6_CASE = (
    "CASE WHEN CAST(l_shipdate AS DATE) BETWEEN CAST(o_orderdate AS DATE) "
    "AND CAST(o_orderdate AS DATE) + INTERVAL 90 DAY "
    "THEN l_extendedprice * (1 - l_discount) ELSE 0 END"
)
_J6_SQL = f"""
SELECT o_custkey AS custkey,
       {dsum4(_J6_CASE)} AS early_revenue,
       COUNT(*) AS n_lineitems
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_custkey
"""


@register("j6_range_window_revenue", oracle=_J6_SQL, tags=("join", "J6"), tables=("orders", "lineitem"))
def j6_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-window citation shape (J6): equi-join on the key, then a
    conditional sum over the date range — the Spark-friendly rewrite the
    reference itself uses (CreateWorksEnriched cell 11 `three_years`),
    never a θ-join."""
    o = spark.table("orders")
    li = spark.table("lineitem")
    in_window = F.col("l_shipdate").cast("date").between(
        F.col("o_orderdate").cast("date"),
        F.date_add(F.col("o_orderdate").cast("date"), 90),
    )
    dec = (
        F.when(in_window, F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .otherwise(F.lit(0))
        .cast("decimal(18,4)")
    )
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.sum(dec).cast("double").alias("early_revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


# --------------------------------------------------------------------------
# J7: interval "alive" join rewritten as cumulative sum over years
# --------------------------------------------------------------------------
_J7_SQL = """
WITH per_year AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr, COUNT(*) AS n_new
  FROM orders GROUP BY EXTRACT(year FROM o_orderdate)
),
years AS (
  SELECT CAST(y AS BIGINT) AS yr FROM generate_series(1992, 1998) t(y)
)
SELECT years.yr AS yr,
       CAST(SUM(COALESCE(per_year.n_new, 0))
            OVER (ORDER BY years.yr ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_alive
FROM years LEFT JOIN per_year ON years.yr = per_year.yr
"""


@register("j7_alive_per_year", oracle=_J7_SQL, tags=("join", "window", "J7", "W5"), tables=("orders",))
def j7_alive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Works-alive-per-year: the reference's non-equi `y.year >= pub_year`
    join (CreateWorksEnriched cell 11 `alive_per_year`) rewritten as
    per-year counts + cumulative window — O(n) instead of a BNLJ, the
    rewrite SURVEY.md §2.3 prescribes for 100 TB."""
    per_year = (
        spark.table("orders")
        .groupBy(F.year("o_orderdate").cast("bigint").alias("yr"))
        .agg(F.count("*").alias("n_new"))
    )
    years = spark.range(1992, 1999).select(F.col("id").alias("yr"))
    w = Window.orderBy(F.col("yr").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        years.join(per_year, "yr", "left")
        .select(
            "yr",
            F.sum(F.coalesce(F.col("n_new"), F.lit(0))).over(w).cast("bigint").alias("n_alive"),
        )
    )


# --------------------------------------------------------------------------
# J8: blocking join + edit-distance fuzzy match
# --------------------------------------------------------------------------
_J8_SQL = """
SELECT c.c_nationkey AS block_key, c.c_custkey AS custkey, s.s_suppkey AS suppkey,
       CAST(levenshtein(c.c_name, s.s_name) AS BIGINT) AS name_dist
FROM customer c JOIN supplier s ON c.c_nationkey = s.s_nationkey
WHERE levenshtein(c.c_name, s.s_name) <= 5
"""


@register("j8_blocking_fuzzy_match", oracle=_J8_SQL, tags=("join", "J8", "fuzzy"), tables=("customer", "supplier"))
def j8_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution blocking join (MatchAuthors cell 9
    `blocked_candidates`): candidates meet only inside a block
    (nationkey here, block_key = initial+surname in the reference), then
    an edit-distance gate prunes. Never an unblocked cross join — the
    block key bounds the candidate set at any scale."""
    c = spark.table("customer").select("c_custkey", "c_name", "c_nationkey")
    s = spark.table("supplier").select("s_suppkey", "s_name", "s_nationkey")
    dist = F.levenshtein(F.col("c_name"), F.col("s_name"))
    return (
        c.join(F.broadcast(s), c.c_nationkey == s.s_nationkey)
        .where(dist <= 5)
        .select(
            F.col("c_nationkey").alias("block_key"),
            F.col("c_custkey").alias("custkey"),
            F.col("s_suppkey").alias("suppkey"),
            dist.cast("bigint").alias("name_dist"),
        )
    )


# --------------------------------------------------------------------------
# D2: identity resolution — adopt existing ids, mint new ones
# --------------------------------------------------------------------------
_D2_SQL = """
WITH id_map AS (
  SELECT c_custkey AS entity_key, c_custkey * 10 AS work_id
  FROM customer WHERE c_custkey % 4 = 0
),
resolved AS (
  SELECT c.c_custkey AS entity_key, m.work_id AS adopted_id
  FROM customer c LEFT JOIN id_map m ON c.c_custkey = m.entity_key
)
SELECT entity_key,
       CAST(COALESCE(adopted_id,
              6600000000 + row_number() OVER (PARTITION BY adopted_id IS NULL
                                              ORDER BY entity_key ASC)) AS BIGINT) AS work_id,
       adopted_id IS NOT NULL AS adopted
FROM resolved
"""


@register("d2_identity_resolution", oracle=_D2_SQL, tags=("domain", "D2", "J9"), tables=("customer",))
def d2_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Work-identity resolution, adopt-vs-mint (D2): entities that hit the
    persistent id_map keep their id; the rest mint fresh ids above a
    high-water mark via row_number — the identity-column replacement the
    reference itself uses for author ids (MatchAuthors.ipynb cell 11
    `max_id + ROW_NUMBER() OVER (...)`).

    The stateful MERGE-cascade variant lives in
    openalex_walden_spark/operators/merge.py; this is the deterministic
    single-pass core the oracle can check.
    """
    c = spark.table("customer")
    id_map = c.where(F.col("c_custkey") % 4 == 0).select(
        F.col("c_custkey").alias("entity_key"),
        (F.col("c_custkey") * 10).alias("work_id"),
    )
    resolved = (
        c.select(F.col("c_custkey").alias("entity_key"))
        .join(F.broadcast(id_map), "entity_key", "left")
        .withColumnRenamed("work_id", "adopted_id")
    )
    mint_w = Window.partitionBy(F.col("adopted_id").isNull()).orderBy(
        F.col("entity_key").asc()
    )
    return resolved.select(
        "entity_key",
        F.coalesce(
            F.col("adopted_id"), F.lit(6600000000) + F.row_number().over(mint_w)
        ).cast("bigint").alias("work_id"),
        F.col("adopted_id").isNotNull().alias("adopted"),
    )


# --------------------------------------------------------------------------
# D9: content-hash change detection between two snapshots
# --------------------------------------------------------------------------
_D9_SQL = """
WITH current AS (
  SELECT o_orderkey,
         md5(o_orderkey || '|' || o_orderstatus || '|' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)) AS content_hash
  FROM orders
),
next_day AS (
  SELECT o_orderkey,
         md5(o_orderkey || '|' ||
             CASE WHEN o_orderkey % 100 = 0 THEN 'X' ELSE o_orderstatus END || '|' ||
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)) AS content_hash
  FROM orders
)
SELECT count_if(c.content_hash <> n.content_hash)::BIGINT AS n_changed,
       count_if(c.content_hash =  n.content_hash)::BIGINT AS n_unchanged
FROM current c JOIN next_day n ON c.o_orderkey = n.o_orderkey
"""


@register("d9_change_detection", oracle=_D9_SQL, tags=("domain", "D9"), tables=("orders",))
def d9_change_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash churn gate (D9): hash the row's business fields, join
    current vs rebuilt snapshot on the key, and only hash-diff rows count
    as changed — the reference's updated_date discipline
    (CreateWorksEnriched.ipynb cells 22-24; md5 here instead of xxhash64
    for oracle portability, hashing.py:content_hash keeps xxhash64 for
    internal tie-breaks)."""
    price_str = F.col("o_totalprice").cast("decimal(18,2)").cast("string")
    current = spark.table("orders").select(
        "o_orderkey",
        F.md5(F.concat_ws("|", F.col("o_orderkey"), F.col("o_orderstatus"), price_str)).alias("h_cur"),
    )
    mutated_status = F.when(F.col("o_orderkey") % 100 == 0, F.lit("X")).otherwise(
        F.col("o_orderstatus")
    )
    next_day = spark.table("orders").select(
        "o_orderkey",
        F.md5(F.concat_ws("|", F.col("o_orderkey"), mutated_status, price_str)).alias("h_new"),
    )
    return (
        current.join(next_day, "o_orderkey")
        .agg(
            F.count_if(F.col("h_cur") != F.col("h_new")).alias("n_changed"),
            F.count_if(F.col("h_cur") == F.col("h_new")).alias("n_unchanged"),
        )
    )


# --------------------------------------------------------------------------
# D9 composition: the Wunpaywall-style changed-rows data feed
# --------------------------------------------------------------------------
# The reference's data feed (notebooks/end2end/WunpaywallDataFeed.py)
# ships ONLY rows whose updated_date passed the last-run watermark; the
# updated_date itself is maintained by the D9 content-hash discipline
# (a rebuild that reproduces identical business fields must NOT touch
# updated_date, or unchanged rows leak into every feed batch).  This
# query pins that composition end-to-end: hash-diff current vs next-day
# snapshot, advance updated_date ONLY on hash change, then export the
# watermark window as serving JSON docs — so the oracle proves that
# exactly the changed rows ship, never the touched-but-identical ones.
# The file/watermark/metadata plumbing around this shape lives in
# sinks/datafeed.py (tested in test_io.py).
_FEED_WATERMARK = "2025-05-17"
_FEED_CHANGE_DAY = "2025-05-20"

_D9_FEED_SQL = f"""
WITH cur AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price,
         DATE '2025-01-01' + INTERVAL ((o_orderkey % 120)::INT) DAY AS updated_old
  FROM orders
),
nxt AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 100 = 0 THEN 'X' ELSE o_orderstatus END AS status,
         price, updated_old
  FROM cur
),
joined AS (
  SELECT c.o_orderkey,
         md5(concat_ws('|', c.o_orderkey, c.o_orderstatus, c.price)) AS h_cur,
         md5(concat_ws('|', n.o_orderkey, n.status, n.price)) AS h_new,
         n.status, n.price, c.updated_old
  FROM cur c JOIN nxt n ON n.o_orderkey = c.o_orderkey
),
feed AS (
  SELECT o_orderkey,
         CASE WHEN h_cur <> h_new THEN DATE '{_FEED_CHANGE_DAY}'
              ELSE updated_old END AS updated,
         status, price
  FROM joined
)
SELECT o_orderkey AS orderkey,
       strftime(updated, '%Y-%m-%d') AS updated_date,
       to_json(struct_pack(orderkey := o_orderkey, status := status,
                           price := price))::VARCHAR AS doc
FROM feed
WHERE updated > DATE '{_FEED_WATERMARK}'
"""


@register(
    "d9_changed_rows_feed",
    oracle=_D9_FEED_SQL,
    tags=("domain", "D9", "feed", "export"),
    tables=("orders",),
)
def d9_changed_rows_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changed-rows feed batch (see block comment): D9 hash-diff decides
    which rows advance updated_date; the watermark filter then ships
    exactly those rows as serving JSON docs.

    Scale shape: the hash-diff is a co-partitioned self-join on the
    key (one shuffle; in production the two sides are the same bucketed
    state so it is shuffle-free), the watermark filter prunes at the
    source when updated_date partitions the table, and the doc
    projection is map-side."""
    price = F.col("o_totalprice").cast("decimal(18,2)").cast("string")
    cur = spark.table("orders").select(
        "o_orderkey", "o_orderstatus", price.alias("price"),
        F.expr("date_add(date'2025-01-01', cast(o_orderkey % 120 as int))").alias(
            "updated_old"
        ),
    )
    nxt = cur.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 100 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("status"),
        "price", "updated_old",
    )
    joined = (
        cur.select(
            "o_orderkey",
            F.md5(F.concat_ws("|", "o_orderkey", "o_orderstatus", "price")).alias("h_cur"),
        )
        .join(
            nxt.select(
                "o_orderkey", "status", "price", "updated_old",
                F.md5(F.concat_ws("|", "o_orderkey", "status", "price")).alias("h_new"),
            ),
            "o_orderkey",
        )
    )
    feed = joined.select(
        "o_orderkey", "status", "price",
        F.when(
            F.col("h_cur") != F.col("h_new"), F.lit(_FEED_CHANGE_DAY).cast("date")
        ).otherwise(F.col("updated_old")).alias("updated"),
    )
    return feed.where(F.col("updated") > F.lit(_FEED_WATERMARK).cast("date")).select(
        F.col("o_orderkey").alias("orderkey"),
        F.date_format("updated", "yyyy-MM-dd").alias("updated_date"),
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("orderkey"),
                F.col("status").alias("status"),
                F.col("price").alias("price"),
            )
        ).alias("doc"),
    )


# --------------------------------------------------------------------------
# T1/T3: deterministic global top-k (ORDER BY + LIMIT)
# --------------------------------------------------------------------------
_T1_SQL = """
SELECT o_orderkey AS orderkey, o_totalprice AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


@register("t1_global_topk_orders", oracle=_T1_SQL, tags=("sort", "T1", "T3"), tables=("orders",))
def t1_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT with totalized ordering. Spark plans this
    as TakeOrderedAndProject — per-partition top-k then a k-row merge on
    the driver, no global sort, which is exactly the 100 TB-safe plan."""
    return (
        spark.table("orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


# --------------------------------------------------------------------------
# T2: array truncation cap (slice after array_sort)
# --------------------------------------------------------------------------
_T2_SQL = """
SELECT o_custkey AS custkey,
       string_agg(o_orderkey::VARCHAR, ',' ORDER BY o_totalprice DESC, o_orderkey ASC) AS top_orders
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 5
GROUP BY o_custkey
"""


@register("t2_array_cap_top5", oracle=_T2_SQL, tags=("sort", "T2", "A2"), tables=("orders",))
def t2_array_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array truncation cap: slice(array_sort(...), 1, k) — the
    references/authorships 5000-cap idiom (CreateWorksEnriched cells 5,
    19), at cap 5. Sorting uses a struct comparator (price desc via
    negation, orderkey asc) — the reference's multi-key ARRAY_SORT
    lambda device."""
    ranked = F.transform(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("o_totalprice")).alias("neg_price"),
                        F.col("o_orderkey").alias("orderkey"),
                    )
                )
            ),
            1,
            5,
        ),
        lambda s: s.getField("orderkey").cast("string"),
    )
    return (
        spark.table("orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.array_join(ranked, ",").alias("top_orders"))
    )


# --------------------------------------------------------------------------
# U2 / U4: set operations
# --------------------------------------------------------------------------
_U2_SQL = """
SELECT nationkey FROM (
  SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
  UNION
  SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
)
"""


@register("u2_union_distinct_nations", oracle=_U2_SQL, tags=("setop", "U2"), tables=("customer", "supplier"))
def u2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets (CreateLocationsWithSources
    `unioned` shape). Distinct is intentional here — audit note per
    SURVEY.md §2.7 about its shuffle cost."""
    c = spark.table("customer").select(F.col("c_nationkey").cast("bigint").alias("nationkey"))
    s = spark.table("supplier").select(F.col("s_nationkey").cast("bigint").alias("nationkey"))
    return c.union(s).distinct()


_U4_SQL = """
SELECT CAST(o_custkey AS BIGINT) AS custkey FROM orders
EXCEPT
SELECT CAST(o_custkey AS BIGINT) AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


@register("u4_except_non_urgent_customers", oracle=_U4_SQL, tags=("setop", "U4"), tables=("orders",))
def u4_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers who ordered but never urgently (the anti-join /
    `* except(...)` family, CreateSuperLocations cell 1 line 967)."""
    all_cust = spark.table("orders").select(F.col("o_custkey").cast("bigint").alias("custkey"))
    urgent = (
        spark.table("orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").cast("bigint").alias("custkey"))
    )
    return all_cust.subtract(urgent)


# --------------------------------------------------------------------------
# D2 cascade run: the stateful resolver (operators/identity.py) one-run shape
# --------------------------------------------------------------------------
_D2_CASCADE_SQL = """
WITH recs AS (
  SELECT CAST(c_custkey AS VARCHAR) AS record_id,
         CASE WHEN c_custkey % 3 = 0
              THEN 'd:' || CAST(c_custkey % 40 AS VARCHAR) END AS doi,
         CASE WHEN c_custkey % 5 = 0
              THEN 'p:' || CAST(c_custkey % 25 AS VARCHAR) END AS pmid,
         'ta:' || CAST(c_custkey % 100 AS VARCHAR) AS ta
  FROM customer
),
map AS (
  SELECT DISTINCT 'doi' AS key_kind,
         'd:' || CAST(c_custkey % 40 AS VARCHAR) AS key_value,
         7000000000 + (c_custkey % 40) AS work_id
  FROM customer WHERE c_custkey % 10 = 0
),
joined AS (
  SELECT r.record_id, r.doi, r.pmid, r.ta, m.work_id AS adopted
  FROM recs r LEFT JOIN map m ON r.doi = m.key_value
),
unres AS (
  -- mint key is namespaced by kind so equal strings of different key
  -- kinds never merge into one minted id (identity.py:strongest)
  SELECT record_id,
         coalesce('doi:' || doi, 'pmid:' || pmid, 'ta:' || ta,
                  'rec:' || record_id) AS mint_key
  FROM joined WHERE adopted IS NULL
),
hw AS (SELECT max(work_id) AS h FROM map)
SELECT record_id, adopted AS work_id, 'doi' AS resolved_via
FROM joined WHERE adopted IS NOT NULL
UNION ALL
SELECT record_id,
       (SELECT h FROM hw) + dense_rank() OVER (ORDER BY mint_key) AS work_id,
       'minted' AS resolved_via
FROM unres
"""


@register(
    "d2_cascade_run",
    oracle=_D2_CASCADE_SQL,
    tags=("domain", "D2", "stateful"),
    tables=("customer",),
)
def d2_cascade_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One run of the stateful identity resolver
    (``operators/identity.py:resolve_work_ids`` — the engine's
    re-expression of ``CreateLocationsMapped.sql:103-1170``): records
    join the persistent (key_kind, key_value → work_id) map through the
    key cascade, adopt on first hit, and mint fresh ids above the map's
    high-water mark grouped by strongest key (one id per unresolved
    entity, the two-pass multi-match fix). Cross-run semantics
    (idempotency, min-id canonicalization on bridge records) are pytest-
    covered in tests/test_identity.py; this entry oracle-checks the
    single-run contract end-to-end.
    """
    from openalex_walden_spark.operators.identity import resolve_work_ids

    c = spark.table("customer")
    records = c.select(
        F.col("c_custkey").cast("string").alias("record_id"),
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(F.lit("d:"), (F.col("c_custkey") % 40).cast("string")),
        ).alias("doi"),
        F.when(
            F.col("c_custkey") % 5 == 0,
            F.concat(F.lit("p:"), (F.col("c_custkey") % 25).cast("string")),
        ).alias("pmid"),
        F.concat(F.lit("ta:"), (F.col("c_custkey") % 100).cast("string")).alias("ta"),
    )
    id_map = (
        c.where(F.col("c_custkey") % 10 == 0)
        .select(
            F.lit("doi").alias("key_kind"),
            F.concat(F.lit("d:"), (F.col("c_custkey") % 40).cast("string")).alias(
                "key_value"
            ),
            (F.lit(7000000000) + (F.col("c_custkey") % 40)).alias("work_id"),
        )
        .distinct()
    )
    assignments, _new_map = resolve_work_ids(
        spark, id_map, records, key_cols=["doi", "pmid", "ta"]
    )
    return assignments


# --------------------------------------------------------------------------
# D10: field-priority authorship fusion (seats, name pick, positional attach)
# --------------------------------------------------------------------------
_D10_SQL = """
WITH seats AS (
  SELECT l_orderkey AS work_id, l_linenumber AS pos,
         CASE WHEN s.s_suppkey % 4 = 0 THEN NULL ELSE s.s_name END
           AS primary_name,
         p.p_name AS fallback_name,
         n.n_name AS affiliation
  FROM lineitem
  JOIN supplier s ON l_suppkey = s.s_suppkey
  JOIN part p ON l_partkey = p.p_partkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE l_linenumber <= 5
)
SELECT work_id,
       count(*)::BIGINT AS n_seats,
       string_agg(pos || ':' || coalesce(primary_name, fallback_name)
                      || '@' || affiliation,
                  '|' ORDER BY pos, coalesce(primary_name, fallback_name),
                   affiliation)
         AS authorships
FROM seats GROUP BY work_id
"""


@register(
    "d10_authorship_fusion",
    oracle=_D10_SQL,
    tags=("domain", "D10", "J13", "A2", "T2"),
    tables=("lineitem", "supplier", "part", "nation"),
)
def d10_authorship_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Authorship fusion (D10, ``CreateCrossrefSuperAuthorships.ipynb``):
    per-work author seats in POSITION order, each seat's display name
    picked by provenance priority (authoritative source first, fallback
    when masked/absent — the field-priority rule), affiliation attached
    positionally via the seat join key, seat list capped (the
    reference's per-provenance caps). Rendered as a deterministic
    ordered signature string so the oracle hash-checks seat order, name
    pick, and attach in one value.

    Scale: dimensions broadcast; the only fact shuffle is the final
    per-work aggregation — same key the seats already carry.
    """
    li = spark.table("lineitem").where(F.col("l_linenumber") <= 5)
    s = F.broadcast(spark.table("supplier"))
    p = F.broadcast(spark.table("part"))
    n = F.broadcast(spark.table("nation"))
    seats = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("l_orderkey").alias("work_id"),
            F.col("l_linenumber").alias("pos"),
            F.coalesce(
                F.when(F.col("s_suppkey") % 4 != 0, F.col("s_name")),
                F.col("p_name"),
            ).alias("author"),
            F.col("n_name").alias("affiliation"),
        )
    )
    seat_str = F.concat_ws(
        "", F.col("pos").cast("string"), F.lit(":"), F.col("author"),
        F.lit("@"), F.col("affiliation"),
    )
    return seats.groupBy("work_id").agg(
        F.count("*").cast("long").alias("n_seats"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("pos"), F.col("author"), seat_str.alias("s"))
                    )
                ),
                lambda x: x.getField("s"),
            ),
            "|",
        ).alias("authorships"),
    )
