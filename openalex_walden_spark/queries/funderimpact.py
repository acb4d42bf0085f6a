"""Funder-impact analytics plane + the funders-API roles device.

The reference ships a complete funder-impact analysis plan
(``plans/awards/examples/tula-hakai-funder-impact/01..13_*.py``): given a
funder's verified corpus, measure specialization (difference-in-differences
on global output shares, 07_field_did.py), collaboration-network change
around a treatment year (08_collaboration.py), co-funder overlap
(11_cofunders.py), downstream citation reach by country and field
(09_downstream_reach.py), and corpus precision/recall against a public
gold list with garbled-id validation (13_precision_recall.py).  The
reference computes these driver-side with pandas over API group-bys; here
each one is a single distributed plan over the test tables.

Also here: the funders-API roles resolution
(``notebooks/funders/CreateFundersAPI.ipynb`` cell 1, ``funder_roles``
CTE) — the one piece of that notebook's compute the export-shape queries
don't cover: a SYMMETRIC entity-link edge table expanded from either
side, role classification by id prefix, best-row-per-role window pick,
and a sorted struct collect.

Relational casting (same conventions as walden.py): orders are works
(year = order year), lineitem rows are citation edges (citing order →
cited part), suppliers play institutions, customers play funders,
o_orderpriority plays the topic/field.

Scale notes: every query is one or two partial-aggregable rollups over
the fact table plus broadcast-sized dimension joins (year spines,
treatment-year seeds, 5-row university lists).  No query shuffles the
fact table more than once on the same key; the pair self-join in
``impact_collab_pairs`` is restricted to the 5-university edge subset
BEFORE the join, so its input is corpus-share-of-5-suppliers, not the
corpus.  Floating point: counts are exact BIGINTs; each share/ratio is
one final double division of the same two exact numbers in both engines
(the w4_fwci_ratio convention), and DiD averages run over exactly two
year values, so FP addition order cannot differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from openalex_walden_spark.queries.registry import register

# --------------------------------------------------------------------------
# 07_field_did.py: difference-in-differences on global shares, with the
# treatment-year sensitivity sweep
# --------------------------------------------------------------------------
# treatment series = nation-5 customers' share of GLOBAL urgent/high
# output per year; baseline series = their share of ALL output.  For each
# candidate treatment year ty: did = (post-avg - pre-avg of the treatment
# share) - (post-avg - pre-avg of the baseline share), pre = [ty-2, ty-1],
# post = [ty+1, ty+2] (the reference uses 4/5-year windows over a 25-year
# span; the test data spans 1995-2001, so 2-year windows keep every
# window inside the data for ty in 1997..1999).

_DID_SQL = """
WITH per_year AS (
  SELECT year(o.o_orderdate) AS yr,
         COUNT(*) AS world_all,
         COUNT(*) FILTER (WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
           AS world_topics,
         COUNT(*) FILTER (WHERE c.c_nationkey = 5) AS grp_all,
         COUNT(*) FILTER (WHERE c.c_nationkey = 5
                            AND o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
           AS grp_topics
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY yr
),
shares AS (
  SELECT yr,
         CAST(grp_topics AS DOUBLE) / world_topics AS share_topics,
         CAST(grp_all AS DOUBLE) / world_all AS share_all
  FROM per_year
),
ty(treatment_year) AS (VALUES (1997), (1998), (1999))
SELECT t.treatment_year,
       AVG(CASE WHEN s.yr BETWEEN t.treatment_year + 1
                             AND t.treatment_year + 2
                THEN s.share_topics END)
         - AVG(CASE WHEN s.yr BETWEEN t.treatment_year - 2
                               AND t.treatment_year - 1
                    THEN s.share_topics END) AS delta_topics,
       AVG(CASE WHEN s.yr BETWEEN t.treatment_year + 1
                             AND t.treatment_year + 2
                THEN s.share_all END)
         - AVG(CASE WHEN s.yr BETWEEN t.treatment_year - 2
                               AND t.treatment_year - 1
                    THEN s.share_all END) AS delta_baseline,
       (AVG(CASE WHEN s.yr BETWEEN t.treatment_year + 1
                              AND t.treatment_year + 2
                 THEN s.share_topics END)
          - AVG(CASE WHEN s.yr BETWEEN t.treatment_year - 2
                                AND t.treatment_year - 1
                     THEN s.share_topics END))
         - (AVG(CASE WHEN s.yr BETWEEN t.treatment_year + 1
                                AND t.treatment_year + 2
                     THEN s.share_all END)
              - AVG(CASE WHEN s.yr BETWEEN t.treatment_year - 2
                                    AND t.treatment_year - 1
                         THEN s.share_all END)) AS did
FROM ty t CROSS JOIN shares s
GROUP BY t.treatment_year
"""


@register(
    "impact_did_specialization",
    oracle=_DID_SQL,
    tags=("analytics", "funder-impact", "A2", "A6"),
    tables=("orders", "customer"),
)
def impact_did_specialization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DiD-on-shares with treatment-year sensitivity
    (plans/awards/examples/tula-hakai-funder-impact/07_field_did.py):
    treatment = group share of global focus-topic output, baseline =
    group share of all output; did = delta(treatment) - delta(baseline)
    over [ty-2,ty-1] vs [ty+1,ty+2] for each candidate ty.

    Plan: ONE pass over orders (conditional aggregation builds all four
    yearly series at once — no four-scan union), then a broadcast cross
    join against the 3-row treatment-year seed.  The year spine is
    ~7 rows, so the sensitivity sweep costs nothing at any scale."""
    topics = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    grp = F.col("c_nationkey") == 5
    per_year = (
        spark.table("orders")
        .join(
            F.broadcast(spark.table("customer").select("c_custkey", "c_nationkey")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            F.count(F.lit(1)).alias("world_all"),
            F.count(F.when(topics, 1)).alias("world_topics"),
            F.count(F.when(grp, 1)).alias("grp_all"),
            F.count(F.when(grp & topics, 1)).alias("grp_topics"),
        )
        .select(
            "yr",
            (F.col("grp_topics").cast("double") / F.col("world_topics")).alias(
                "share_topics"
            ),
            (F.col("grp_all").cast("double") / F.col("world_all")).alias(
                "share_all"
            ),
        )
    )
    ty = spark.range(1997, 2000).select(
        F.col("id").cast("int").alias("treatment_year")
    )
    pre = F.col("yr").between(
        F.col("treatment_year") - 2, F.col("treatment_year") - 1
    )
    post = F.col("yr").between(
        F.col("treatment_year") + 1, F.col("treatment_year") + 2
    )
    dt = F.avg(F.when(post, F.col("share_topics"))) - F.avg(
        F.when(pre, F.col("share_topics"))
    )
    da = F.avg(F.when(post, F.col("share_all"))) - F.avg(
        F.when(pre, F.col("share_all"))
    )
    return (
        per_year.crossJoin(F.broadcast(ty))
        .groupBy("treatment_year")
        .agg(
            dt.alias("delta_topics"),
            da.alias("delta_baseline"),
            (dt - da).alias("did"),
        )
    )


# --------------------------------------------------------------------------
# 08_collaboration.py: co-authorship pairs among 5 institutions, pre vs
# post a treatment year, with collaboration intensity
# --------------------------------------------------------------------------
# The 5 "universities" are the 5 smallest supplier keys; a joint work is
# an order whose lineitems carry BOTH suppliers; the focus-topic filter
# is urgent/high priority; intensity = pair links / total set output in
# the same period (shows the change isn't just "more papers").

_COLLAB_SQL = """
WITH unis AS (
  SELECT s_suppkey FROM supplier ORDER BY s_suppkey LIMIT 5
),
corpus AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey,
         year(o.o_orderdate) AS yr
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN unis u ON u.s_suppkey = l.l_suppkey
  WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
),
pair_links AS (
  SELECT a.l_suppkey AS uni_a, b.l_suppkey AS uni_b,
         COUNT(*) FILTER (WHERE a.yr BETWEEN 1995 AND 1997) AS links_pre,
         COUNT(*) FILTER (WHERE a.yr BETWEEN 1999 AND 2001) AS links_post
  FROM corpus a
  JOIN corpus b ON a.l_orderkey = b.l_orderkey
               AND a.l_suppkey < b.l_suppkey
  GROUP BY uni_a, uni_b
),
output AS (
  SELECT COUNT(DISTINCT l_orderkey)
           FILTER (WHERE yr BETWEEN 1995 AND 1997) AS out_pre,
         COUNT(DISTINCT l_orderkey)
           FILTER (WHERE yr BETWEEN 1999 AND 2001) AS out_post
  FROM corpus
),
spine AS (
  SELECT a.s_suppkey AS uni_a, b.s_suppkey AS uni_b
  FROM unis a JOIN unis b ON a.s_suppkey < b.s_suppkey
)
SELECT s.uni_a, s.uni_b,
       COALESCE(p.links_pre, 0) AS links_pre,
       COALESCE(p.links_post, 0) AS links_post,
       CAST(COALESCE(p.links_pre, 0) AS DOUBLE) / o.out_pre
         AS intensity_pre,
       CAST(COALESCE(p.links_post, 0) AS DOUBLE) / o.out_post
         AS intensity_post
FROM spine s
LEFT JOIN pair_links p ON p.uni_a = s.uni_a AND p.uni_b = s.uni_b
CROSS JOIN output o
"""


@register(
    "impact_collab_pairs",
    oracle=_COLLAB_SQL,
    tags=("analytics", "funder-impact", "J8", "A6"),
    tables=("supplier", "lineitem", "orders"),
)
def impact_collab_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Institution-pair collaboration before/after a treatment year with
    intensity normalization (08_collaboration.py): joint works = orders
    carrying both suppliers, links summed per period, intensity = links
    over the 5-set's total focus-topic output.

    Plan: the corpus is filtered to the 5-university edge subset FIRST
    (a broadcast semi-join), so the pair self-join's input is tiny
    relative to lineitem at any scale; the 10-row pair spine comes from
    a broadcast self-join of the 5-row list.  The reference computes
    each of the 10 pair series as a separate API query; here it is one
    shuffle on l_orderkey."""
    unis = (
        spark.table("supplier")
        .select("s_suppkey")
        .orderBy("s_suppkey")
        .limit(5)
    )
    corpus = (
        spark.table("lineitem")
        .join(
            spark.table("orders").where(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(F.broadcast(unis), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "l_orderkey", "l_suppkey", F.year("o_orderdate").alias("yr")
        )
        .distinct()
    )
    a, b = corpus.alias("a"), corpus.alias("b")
    pre_a = F.col("a.yr").between(1995, 1997)
    post_a = F.col("a.yr").between(1999, 2001)
    pair_links = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("uni_a"),
            F.col("b.l_suppkey").alias("uni_b"),
        )
        .agg(
            F.count(F.when(pre_a, 1)).alias("links_pre"),
            F.count(F.when(post_a, 1)).alias("links_post"),
        )
    )
    output = corpus.agg(
        F.countDistinct(
            F.when(F.col("yr").between(1995, 1997), F.col("l_orderkey"))
        ).alias("out_pre"),
        F.countDistinct(
            F.when(F.col("yr").between(1999, 2001), F.col("l_orderkey"))
        ).alias("out_post"),
    )
    ua = unis.select(F.col("s_suppkey").alias("uni_a"))
    ub = unis.select(F.col("s_suppkey").alias("uni_b"))
    spine = ua.join(ub, F.col("uni_a") < F.col("uni_b"))
    return (
        spine.join(pair_links, ["uni_a", "uni_b"], "left")
        .crossJoin(F.broadcast(output))
        .select(
            "uni_a",
            "uni_b",
            F.coalesce("links_pre", F.lit(0)).alias("links_pre"),
            F.coalesce("links_post", F.lit(0)).alias("links_post"),
            (
                F.coalesce("links_pre", F.lit(0)).cast("double")
                / F.col("out_pre")
            ).alias("intensity_pre"),
            (
                F.coalesce("links_post", F.lit(0)).cast("double")
                / F.col("out_post")
            ).alias("intensity_post"),
        )
    )


# --------------------------------------------------------------------------
# 11_cofunders.py: co-funder overlap with self-strip and marker exclusion
# --------------------------------------------------------------------------
# Corpus = orders carrying the SELF supplier (smallest key).  Co-funders
# = other suppliers on the same orders; suppliers whose name carries a
# "university marker" are excluded (the reference drops internal
# university grants from the co-funder list by display-name markers).

_COFUNDER_SQL = """
WITH self AS (SELECT min(s_suppkey) AS k FROM supplier),
corpus AS (
  SELECT DISTINCT l_orderkey FROM lineitem, self WHERE l_suppkey = self.k
),
cof AS (
  SELECT l.l_suppkey, COUNT(DISTINCT l.l_orderkey) AS joint_works
  FROM lineitem l
  JOIN corpus c ON c.l_orderkey = l.l_orderkey
  CROSS JOIN self
  WHERE l.l_suppkey <> self.k
  GROUP BY l.l_suppkey
)
SELECT c.l_suppkey AS cofunder, s.s_name AS display_name, c.joint_works
FROM cof c
JOIN supplier s ON s.s_suppkey = c.l_suppkey
WHERE NOT (s.s_name LIKE '%00' OR s.s_name LIKE '%5')
ORDER BY c.joint_works DESC, c.l_suppkey ASC
LIMIT 20
"""


@register(
    "impact_cofunders",
    oracle=_COFUNDER_SQL,
    tags=("analytics", "funder-impact", "T1", "A6"),
    tables=("supplier", "lineitem"),
)
def impact_cofunders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-funder overlap list (11_cofunders.py): distinct joint works
    per co-supplier of the SELF supplier's orders, self stripped,
    marker-named entries excluded, deterministic top-20.

    Plan: corpus keys are a filtered projection of lineitem (no
    shuffle), the co-occurrence join shuffles on l_orderkey once, and
    the supplier dimension broadcasts.  The top-20 is a
    TakeOrderedAndProject — no global sort materializes."""
    sup = spark.table("supplier")
    li = spark.table("lineitem")
    self_k = F.broadcast(sup.agg(F.min("s_suppkey").alias("k")))
    corpus = (
        li.join(self_k, F.col("l_suppkey") == F.col("k"))
        .select("l_orderkey")
        .distinct()
    )
    markers = F.col("s_name").like("%00") | F.col("s_name").like("%5")
    return (
        li.join(corpus, "l_orderkey")
        .crossJoin(self_k)
        .where(F.col("l_suppkey") != F.col("k"))
        .groupBy("l_suppkey")
        .agg(F.countDistinct("l_orderkey").alias("joint_works"))
        .join(
            F.broadcast(sup.where(~markers).select("s_suppkey", "s_name")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .select(
            F.col("l_suppkey").alias("cofunder"),
            F.col("s_name").alias("display_name"),
            "joint_works",
        )
        .orderBy(F.col("joint_works").desc(), F.col("cofunder").asc())
        .limit(20)
    )


# --------------------------------------------------------------------------
# 09_downstream_reach.py: citing works by country and by field
# --------------------------------------------------------------------------
# Corpus = one part brand.  Citing works = orders whose lineitems cite a
# corpus part.  Per the reference's note, country/field tallies count
# citation INSTANCES (a citing work citing two corpus works counts
# twice) while the distinct-citing-work counts are exact.

_REACH_SQL = """
WITH corpus AS (
  SELECT p_partkey FROM part WHERE p_brand = 'Brand#12'
),
edges AS (
  SELECT l.l_orderkey, o.o_custkey, o.o_orderpriority
  FROM lineitem l
  JOIN corpus p ON p.p_partkey = l.l_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT 'country' AS dimension, n.n_name AS key,
       COUNT(*) AS citation_instances,
       COUNT(DISTINCT e.l_orderkey) AS distinct_citing_works
FROM edges e
JOIN customer c ON c.c_custkey = e.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
UNION ALL
SELECT 'field' AS dimension, e.o_orderpriority AS key,
       COUNT(*) AS citation_instances,
       COUNT(DISTINCT e.l_orderkey) AS distinct_citing_works
FROM edges e
GROUP BY e.o_orderpriority
"""


@register(
    "impact_downstream_reach",
    oracle=_REACH_SQL,
    tags=("analytics", "funder-impact", "U2", "A6"),
    tables=("part", "lineitem", "orders", "customer", "nation"),
)
def impact_downstream_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downstream citation reach by country and field
    (09_downstream_reach.py): citation instances per dimension key plus
    exact distinct-citing-work counts, as a two-dimension union.

    Plan: the corpus part list broadcasts into the lineitem scan (a
    broadcast semi-join — the fact table never shuffles to build
    edges); the country arm shuffles the edge subset once on custkey
    for the customer→nation lookup (both dims broadcast); each arm is
    one partial-aggregable rollup."""
    corpus = F.broadcast(
        spark.table("part")
        .where(F.col("p_brand") == "Brand#12")
        .select("p_partkey")
    )
    edges = (
        spark.table("lineitem")
        .join(corpus, F.col("p_partkey") == F.col("l_partkey"))
        .join(
            spark.table("orders").select(
                "o_orderkey", "o_custkey", "o_orderpriority"
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select("l_orderkey", "o_custkey", "o_orderpriority")
    )
    by_country = (
        edges.join(
            F.broadcast(
                spark.table("customer").select("c_custkey", "c_nationkey")
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            F.broadcast(spark.table("nation")),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .groupBy(F.col("n_name").alias("key"))
        .agg(
            F.count(F.lit(1)).alias("citation_instances"),
            F.countDistinct("l_orderkey").alias("distinct_citing_works"),
        )
        .select(
            F.lit("country").alias("dimension"),
            "key",
            "citation_instances",
            "distinct_citing_works",
        )
    )
    by_field = (
        edges.groupBy(F.col("o_orderpriority").alias("key"))
        .agg(
            F.count(F.lit(1)).alias("citation_instances"),
            F.countDistinct("l_orderkey").alias("distinct_citing_works"),
        )
        .select(
            F.lit("field").alias("dimension"),
            "key",
            "citation_instances",
            "distinct_citing_works",
        )
    )
    return by_country.unionByName(by_field)


# --------------------------------------------------------------------------
# 13_precision_recall.py: corpus quality vs a public gold list with
# garbled-id validation
# --------------------------------------------------------------------------
# Candidates = parts with p_size >= 40, labeled include/exclude by the
# verification rule.  The gold list = Brand#23 part keys, except every
# 7th key is "garbled" (offset out of the id space — the reference's
# DOIs with glued-on trailing text).  A garbled key fails the existence
# check (the reference's OpenAlex-404 validation) and is dropped from
# the gold denominator as a scraping artifact, NOT counted as a miss.

_PR_SQL = """
WITH candidates AS (
  SELECT p_partkey,
         (p_retailprice > 1400 OR p_type LIKE 'SMALL%') AS genuine
  FROM part WHERE p_size >= 40
),
gold_raw AS (
  SELECT CASE WHEN p_partkey % 7 = 0 THEN p_partkey + 10000000
              ELSE p_partkey END AS gold_key
  FROM part WHERE p_brand = 'Brand#23'
),
gold_checked AS (
  SELECT g.gold_key,
         EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = g.gold_key)
           AS in_catalog,
         EXISTS (SELECT 1 FROM candidates c WHERE c.p_partkey = g.gold_key)
           AS found
  FROM gold_raw g
)
SELECT
  (SELECT COUNT(*) FROM candidates) AS candidates,
  (SELECT COUNT(*) FILTER (WHERE genuine) FROM candidates) AS genuine,
  CAST((SELECT COUNT(*) FILTER (WHERE genuine) FROM candidates) AS DOUBLE)
    / (SELECT COUNT(*) FROM candidates) AS precision,
  COUNT(*) FILTER (WHERE in_catalog) AS gold_clean,
  COUNT(*) FILTER (WHERE NOT in_catalog) AS artifacts_dropped,
  COUNT(*) FILTER (WHERE found) AS found,
  COUNT(*) FILTER (WHERE in_catalog AND NOT found) AS real_misses,
  CAST(COUNT(*) FILTER (WHERE found) AS DOUBLE)
    / COUNT(*) FILTER (WHERE in_catalog) AS recall
FROM gold_checked
"""


@register(
    "impact_precision_recall",
    oracle=_PR_SQL,
    tags=("analytics", "funder-impact", "U3", "A11"),
    tables=("part",),
)
def impact_precision_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus precision/recall vs a gold list with artifact validation
    (13_precision_recall.py): precision over verification labels;
    recall over the gold list AFTER garbled ids (existence-check
    failures) are dropped from the denominator.

    Plan: both the gold list and the candidate set derive from the same
    part scan; the membership checks are left joins of the (small,
    brand-filtered) gold side against broadcast key sets, then one
    global single-row rollup."""
    part = spark.table("part")
    candidates = part.where(F.col("p_size") >= 40).select(
        "p_partkey",
        (
            (F.col("p_retailprice") > 1400)
            | F.col("p_type").like("SMALL%")
        ).alias("genuine"),
    )
    gold_raw = part.where(F.col("p_brand") == "Brand#23").select(
        F.when(
            F.col("p_partkey") % 7 == 0, F.col("p_partkey") + 10000000
        )
        .otherwise(F.col("p_partkey"))
        .alias("gold_key")
    )
    all_keys = part.select(F.col("p_partkey").alias("cat_key"))
    cand_keys = candidates.select(
        F.col("p_partkey").alias("cand_key"), "genuine"
    )
    gold_checked = (
        gold_raw.join(
            all_keys, F.col("cat_key") == F.col("gold_key"), "left"
        )
        .join(cand_keys, F.col("cand_key") == F.col("gold_key"), "left")
        .select(
            F.col("cat_key").isNotNull().alias("in_catalog"),
            F.col("cand_key").isNotNull().alias("found"),
        )
    )
    cand_stats = candidates.agg(
        F.count(F.lit(1)).alias("candidates"),
        F.count(F.when(F.col("genuine"), 1)).alias("genuine"),
    )
    return (
        gold_checked.agg(
            F.count(F.when(F.col("in_catalog"), 1)).alias("gold_clean"),
            F.count(F.when(~F.col("in_catalog"), 1)).alias(
                "artifacts_dropped"
            ),
            F.count(F.when(F.col("found"), 1)).alias("found"),
            F.count(
                F.when(F.col("in_catalog") & ~F.col("found"), 1)
            ).alias("real_misses"),
        )
        .crossJoin(F.broadcast(cand_stats))
        .select(
            "candidates",
            "genuine",
            (F.col("genuine").cast("double") / F.col("candidates")).alias(
                "precision"
            ),
            "gold_clean",
            "artifacts_dropped",
            "found",
            "real_misses",
            (F.col("found").cast("double") / F.col("gold_clean")).alias(
                "recall"
            ),
        )
    )


# --------------------------------------------------------------------------
# CreateFundersAPI.ipynb cell 1 ``funder_roles``: bidirectional
# entity-link role resolution
# --------------------------------------------------------------------------
# The reference keeps entity links as an UNDIRECTED edge table
# (entity_link.id_1 / id_2, each a prefixed id like 'F123' / 'I45' /
# 'P7') and resolves each funder's roles by expanding the edge from
# EITHER side, classifying the other end's role by its prefix, attaching
# that entity's works_count, keeping the best row per role
# (works_count DESC, id ASC), and collecting a sorted role array.  The
# funder's own 'funder' role is always present.  Here the edge table
# derives deterministically from the test data: funder F<custkey> links
# to institution I<suppkey> when an urgent order of that customer
# carries that supplier (sampled), and publisher P<bucket> links store
# the funder on id_2 to exercise the reverse direction.

_ROLES_SQL = """
WITH fi_links AS (
  SELECT DISTINCT 'F' || CAST(o.o_custkey AS VARCHAR) AS id_1,
                  'I' || CAST(l.l_suppkey AS VARCHAR) AS id_2
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderpriority = '1-URGENT' AND o.o_orderkey % 16 = 0
),
fp_links AS (
  SELECT DISTINCT 'P' || CAST(l.l_partkey % 50 AS VARCHAR) AS id_1,
                  'F' || CAST(o.o_custkey AS VARCHAR) AS id_2
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderpriority = '2-HIGH' AND o.o_orderkey % 32 = 0
),
entity_link AS (
  SELECT id_1, id_2 FROM fi_links
  UNION
  SELECT id_1, id_2 FROM fp_links
),
funder_works AS (
  SELECT o_custkey AS funder_id, COUNT(*) AS works_count
  FROM orders GROUP BY o_custkey
),
inst_works AS (
  SELECT l_suppkey AS inst_id, COUNT(*) AS works_count
  FROM lineitem GROUP BY l_suppkey
),
pub_works AS (
  SELECT p_partkey % 50 AS pub_id, COUNT(*) AS works_count
  FROM part GROUP BY pub_id
),
expanded AS (
  SELECT f.funder_id,
         CASE WHEN e.id_1 = 'F' || CAST(f.funder_id AS VARCHAR)
              THEN e.id_2 ELSE e.id_1 END AS entity_id
  FROM funder_works f
  JOIN entity_link e
    ON e.id_1 = 'F' || CAST(f.funder_id AS VARCHAR)
    OR e.id_2 = 'F' || CAST(f.funder_id AS VARCHAR)
),
roles_with_counts AS (
  SELECT funder_id, 'funder' AS role,
         'F' || CAST(funder_id AS VARCHAR) AS id, works_count
  FROM funder_works
  WHERE funder_id IN (SELECT funder_id FROM expanded)
  UNION ALL
  SELECT x.funder_id,
         CASE WHEN x.entity_id LIKE 'I%' THEN 'institution'
              ELSE 'publisher' END AS role,
         x.entity_id AS id,
         COALESCE(i.works_count, p.works_count, 0) AS works_count
  FROM expanded x
  LEFT JOIN inst_works i
    ON x.entity_id = 'I' || CAST(i.inst_id AS VARCHAR)
  LEFT JOIN pub_works p
    ON x.entity_id = 'P' || CAST(p.pub_id AS VARCHAR)
),
dedup AS (
  SELECT funder_id, role, id, works_count,
         ROW_NUMBER() OVER (PARTITION BY funder_id, role
                            ORDER BY works_count DESC, id ASC) AS rn
  FROM roles_with_counts
)
SELECT funder_id,
       array_to_string(
         list_sort(list(role || ':' || id || ':'
                        || CAST(works_count AS VARCHAR))),
         '|') AS roles
FROM dedup WHERE rn = 1
GROUP BY funder_id
"""


@register(
    "funder_roles_entity_links",
    oracle=_ROLES_SQL,
    tags=("domain", "D11", "api", "funders"),
    tables=("orders", "lineitem", "part"),
)
def funder_roles_entity_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional entity-link role resolution
    (notebooks/funders/CreateFundersAPI.ipynb cell 1, ``funder_roles``
    CTE): expand the undirected edge from either side, classify the
    other end by prefix, attach per-role works counts, window-pick the
    best row per (funder, role), collect the sorted role array.  The
    funder's own 'funder' role rides along, as in the reference.

    Plan: the edge table is a sampled distinct projection (bounded —
    1/16 and 1/32 of urgent/high orders); the either-side expansion is
    expressed as an OR-join against the SMALL edge table (broadcast),
    never against the fact tables; role counts are partial-aggregable
    rollups joined back by entity id.  At 100 TB the edge table is the
    entity graph (millions of rows, not works-scale), so the broadcast
    holds."""
    orders = spark.table("orders")
    li = spark.table("lineitem")
    fi = (
        orders.where(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderkey") % 16 == 0)
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("F"), F.col("o_custkey").cast("string")).alias(
                "id_1"
            ),
            F.concat(F.lit("I"), F.col("l_suppkey").cast("string")).alias(
                "id_2"
            ),
        )
    )
    fp = (
        orders.where(
            (F.col("o_orderpriority") == "2-HIGH")
            & (F.col("o_orderkey") % 32 == 0)
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(
                F.lit("P"), (F.col("l_partkey") % 50).cast("string")
            ).alias("id_1"),
            F.concat(F.lit("F"), F.col("o_custkey").cast("string")).alias(
                "id_2"
            ),
        )
    )
    entity_link = fi.union(fp).distinct()
    funder_works = orders.groupBy(
        F.col("o_custkey").alias("funder_id")
    ).agg(F.count(F.lit(1)).alias("works_count"))
    inst_works = li.groupBy(F.col("l_suppkey").alias("inst_id")).agg(
        F.count(F.lit(1)).alias("works_count")
    )
    pub_works = (
        spark.table("part")
        .groupBy((F.col("p_partkey") % 50).alias("pub_id"))
        .agg(F.count(F.lit(1)).alias("works_count"))
    )
    fkey = F.concat(F.lit("F"), F.col("funder_id").cast("string"))
    # The reference expands the undirected edge with an OR-join
    # (``ON el.id_1 = 'F'||id OR el.id_2 = 'F'||id``) — on Spark that
    # plans as a nested-loop over funders × edges, which dies at scale.
    # Two hash equi-joins unioned are result-identical (no edge links F
    # to F, and the rn=1 window downstream dedups anyway) and keep the
    # whole expansion in hash joins.
    expanded = (
        funder_works.join(
            F.broadcast(entity_link), F.col("id_1") == fkey
        ).select("funder_id", F.col("id_2").alias("entity_id"))
    ).unionByName(
        funder_works.join(
            F.broadcast(entity_link), F.col("id_2") == fkey
        ).select("funder_id", F.col("id_1").alias("entity_id"))
    )
    own_role = (
        funder_works.join(
            expanded.select("funder_id").distinct(), "funder_id"
        )
        .select(
            "funder_id",
            F.lit("funder").alias("role"),
            fkey.alias("id"),
            "works_count",
        )
    )
    linked_roles = (
        expanded.join(
            F.broadcast(
                inst_works.select(
                    F.concat(
                        F.lit("I"), F.col("inst_id").cast("string")
                    ).alias("i_id"),
                    F.col("works_count").alias("i_works"),
                )
            ),
            F.col("entity_id") == F.col("i_id"),
            "left",
        )
        .join(
            F.broadcast(
                pub_works.select(
                    F.concat(
                        F.lit("P"), F.col("pub_id").cast("string")
                    ).alias("p_id"),
                    F.col("works_count").alias("p_works"),
                )
            ),
            F.col("entity_id") == F.col("p_id"),
            "left",
        )
        .select(
            "funder_id",
            F.when(F.col("entity_id").like("I%"), F.lit("institution"))
            .otherwise(F.lit("publisher"))
            .alias("role"),
            F.col("entity_id").alias("id"),
            F.coalesce("i_works", "p_works", F.lit(0)).alias(
                "works_count"
            ),
        )
    )
    w = Window.partitionBy("funder_id", "role").orderBy(
        F.col("works_count").desc(), F.col("id").asc()
    )
    return (
        own_role.unionByName(linked_roles)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .groupBy("funder_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(
                        F.concat_ws(
                            ":",
                            F.col("role"),
                            F.col("id"),
                            F.col("works_count").cast("string"),
                        )
                    )
                ),
                "|",
            ).alias("roles")
        )
    )


# --------------------------------------------------------------------------
# 06_citations.py: citation-impact profile vs the world baseline
# --------------------------------------------------------------------------
# Corpus = urgent orders of nation-5 customers (the funded works).
# FWCI plays as price over the cohort mean (the w4 device); top-1%/10%
# flags come from the world percentile ranks; the profile is one row of
# the reference's metrics dict (mean/median citations, mean/median
# FWCI, share above 1, top-percentile counts).

_CITE_PROFILE_SQL = """
WITH world AS (
  SELECT o.o_orderkey, o.o_custkey,
         CAST(l.cnt AS BIGINT) AS cited_by_count,
         o.o_totalprice
           / (CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                   OVER (PARTITION BY o.o_orderpriority) AS DOUBLE)
              / COUNT(*) OVER (PARTITION BY o.o_orderpriority)) AS fwci,
         PERCENT_RANK() OVER (ORDER BY l.cnt) AS cite_pr,
         o.o_orderpriority
  FROM orders o
  JOIN (SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey) l
    ON l.l_orderkey = o.o_orderkey
),
corpus AS (
  SELECT w.* FROM world w
  JOIN customer c ON c.c_custkey = w.o_custkey
  WHERE c.c_nationkey = 5 AND w.o_orderpriority = '1-URGENT'
)
SELECT COUNT(*) AS n_works,
       CAST(SUM(cited_by_count) AS BIGINT) AS total_citations,
       CAST(SUM(cited_by_count) AS DOUBLE) / COUNT(*) AS mean_citations,
       CAST(MEDIAN(cited_by_count) AS DOUBLE) AS median_citations,
       COUNT(CASE WHEN fwci > 1 THEN 1 END) AS n_fwci_above_1,
       COUNT(CASE WHEN cite_pr >= 0.99 THEN 1 END) AS n_top_1pct,
       COUNT(CASE WHEN cite_pr >= 0.90 THEN 1 END) AS n_top_10pct
FROM corpus
"""


@register(
    "impact_citation_profile",
    oracle=_CITE_PROFILE_SQL,
    tags=("analytics", "funder-impact", "W3", "A5"),
    tables=("orders", "lineitem", "customer"),
)
def impact_citation_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus citation-impact profile (06_citations.py): total/mean/
    median citations, FWCI-above-1 count, and top-1%/top-10% counts
    where the percentile is ranked against the WORLD, not the corpus
    (the reference's explicit baseline choice).

    Plan: citation counts are one rollup on the order key; the world
    percentile is one window; the corpus filter applies AFTER ranking
    (a corpus-side rank would inflate every share).  The final profile
    is a single-row aggregate.  MEDIAN over bigint agrees bit-for-bit
    in both engines (both interpolate halves of exact integers)."""
    from pyspark.sql.window import Window

    counts = (
        spark.table("lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wp = Window.partitionBy("o_orderpriority")
    mean = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(wp).cast(
        "double"
    ) / F.count("*").over(wp)
    world = (
        spark.table("orders")
        .join(counts, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_orderkey", "o_custkey", "o_orderpriority",
            F.col("cnt").cast("bigint").alias("cited_by_count"),
            (F.col("o_totalprice") / mean).alias("fwci"),
            F.percent_rank().over(Window.orderBy("cnt")).alias("cite_pr"),
        )
    )
    corpus = world.join(
        F.broadcast(
            spark.table("customer")
            .where(F.col("c_nationkey") == 5)
            .select("c_custkey")
        ),
        F.col("c_custkey") == F.col("o_custkey"),
    ).where(F.col("o_orderpriority") == "1-URGENT")
    return corpus.agg(
        F.count(F.lit(1)).alias("n_works"),
        F.sum("cited_by_count").alias("total_citations"),
        (F.sum("cited_by_count").cast("double") / F.count(F.lit(1))).alias(
            "mean_citations"
        ),
        F.median("cited_by_count").alias("median_citations"),
        F.count(F.when(F.col("fwci") > 1, 1)).alias("n_fwci_above_1"),
        F.count(F.when(F.col("cite_pr") >= 0.99, 1)).alias("n_top_1pct"),
        F.count(F.when(F.col("cite_pr") >= 0.90, 1)).alias("n_top_10pct"),
    )


# --------------------------------------------------------------------------
# 12_top_fwci_stories.py: top works by FWCI with the consortium flag
# --------------------------------------------------------------------------

_TOP_FWCI_SQL = """
WITH world AS (
  SELECT o.o_orderkey AS work_id,
         o.o_totalprice
           / (CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                   OVER (PARTITION BY o.o_orderpriority) AS DOUBLE)
              / COUNT(*) OVER (PARTITION BY o.o_orderpriority)) AS fwci,
         CAST(l.cnt AS BIGINT) AS cited_by_count,
         CAST(l.nsup AS BIGINT) AS n_authors,
         o.o_custkey, o.o_orderpriority
  FROM orders o
  JOIN (SELECT l_orderkey, COUNT(*) AS cnt,
               COUNT(DISTINCT l_suppkey) AS nsup
        FROM lineitem GROUP BY l_orderkey) l
    ON l.l_orderkey = o.o_orderkey
),
corpus AS (
  SELECT w.* FROM world w
  JOIN customer c ON c.c_custkey = w.o_custkey
  WHERE c.c_nationkey = 5 AND w.o_orderpriority = '1-URGENT'
)
SELECT work_id, fwci, cited_by_count, n_authors,
       n_authors >= 5 AS mega_consortium
FROM corpus
ORDER BY fwci DESC, work_id ASC
LIMIT 50
"""


@register(
    "impact_top_fwci_stories",
    oracle=_TOP_FWCI_SQL,
    tags=("analytics", "funder-impact", "T1", "W4"),
    tables=("orders", "lineitem", "customer"),
)
def impact_top_fwci_stories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top corpus works by FWCI with the mega-consortium flag
    (12_top_fwci_stories.py: huge author lists mark works where the
    funder is one of many contributors, separated from funder-central
    breakthroughs before storytelling).

    Plan: FWCI is the cohort-mean window (exact decimal sum / count);
    the top-50 is a TakeOrderedAndProject with a total tiebreak."""
    from pyspark.sql.window import Window

    counts = (
        spark.table("lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("l_suppkey").alias("nsup"),
        )
    )
    wp = Window.partitionBy("o_orderpriority")
    mean = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(wp).cast(
        "double"
    ) / F.count("*").over(wp)
    world = (
        spark.table("orders")
        .join(counts, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_orderkey").alias("work_id"),
            (F.col("o_totalprice") / mean).alias("fwci"),
            F.col("cnt").cast("bigint").alias("cited_by_count"),
            F.col("nsup").cast("bigint").alias("n_authors"),
            "o_custkey", "o_orderpriority",
        )
    )
    return (
        world.join(
            F.broadcast(
                spark.table("customer")
                .where(F.col("c_nationkey") == 5)
                .select("c_custkey")
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(
            "work_id", "fwci", "cited_by_count", "n_authors",
            (F.col("n_authors") >= 5).alias("mega_consortium"),
        )
        .orderBy(F.col("fwci").desc(), F.col("work_id").asc())
        .limit(50)
    )
