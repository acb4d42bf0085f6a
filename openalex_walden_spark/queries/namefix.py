"""Counterfactual validation of a matcher change (qa/ntierfix_validate.py).

Before shipping a name-normalization change to the author matcher, the
reference SIMULATES the proposed logic against the current batch, runs
the SAME cascade under both the old and the new normalization, diffs
the per-seat decisions into change classes, and stratified-samples each
class for LLM judging (qa/ntierfix_validate.py sim/diff/sample stages;
the full cascade itself is ported in d6cascade.py — this plane is the
COUNTERFACTUAL machinery around it).

Normalization under test (ntierfix_validate.nf): strip one trailing dot,
fold empty strings to NULL.  The old logic keeps dotted/empty forms, so
dotted first names and empty middles flip decisions — exactly the
classes the reference tallies:

  unchanged   same id, same tier            tier_only  same id, new tier
  new_tier2   NULL -> initial-tier match    (reference: new_n6)
  new_repair  NULL -> full-tier match
  lost_dotted match lost, first was dotted  lost_unique  other lost match
  id_changed  both match, different author

Both counterfactuals run in ONE candidate join (blocked on the last
name); the stratified sample orders within each class by the
engine-portable md5 hash (the reference's xxhash64 is Spark-only) and
explodes ``id_changed`` into both sides, judging the binding each class
question hinges on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from openalex_walden_spark.functions.hashing import (
    stable_hash64,
    stable_hash64_duckdb,
)
from openalex_walden_spark.queries.registry import register

# seats <- customer: first 'F<c%16>' (+trailing dot when c%5=0), middle
#   NULL when c%17=0, '' when c%7=0, else 'M<c%9>' (+dot when c%11=0),
#   last 'L<c%20>', orcid_bound c%13=0
# candidates <- supplier: first 'F<s%16>' (+trailing dot when s%6=0 —
#   dotted PROFILES, so normalization can merge a dotted candidate into
#   a clean seat's match set and collapse uniqueness), middle NULL when
#   s%4=0 else 'M<s%9>', last 'L<s%20>'
#
# The fixture fires both gain classes (new_tier2/new_repair), both loss
# classes (lost_dotted/lost_unique), and unchanged.  tier_only and
# id_changed are kept in the classifier for parity with the reference
# but are STRUCTURALLY unreachable in this 2-tier projection: with one
# normalization applied to both sides of an equality, every old match
# survives into the new match set (old ⊆ new per candidate) and t2's
# matches contain t1's, so a unique decision can only stay identical or
# dissolve — the reference's 20-tier cascade (ported in d6cascade.py)
# breaks the subset property via per-tier signal predicates.
# cascade (2 tiers, unique-gated): t1 = first+last exact AND middle
#   null-safe-equal; t2 = first+last exact AND seat middle IS NULL.
#   A tier decides only when EXACTLY ONE candidate matched it.

_SEATS = """
  SELECT c_custkey AS seat_id,
         'F' || CAST(c_custkey % 16 AS VARCHAR)
             || CASE WHEN c_custkey % 5 = 0 THEN '.' ELSE '' END AS first_raw,
         CASE WHEN c_custkey % 17 = 0 THEN NULL
              WHEN c_custkey % 7 = 0 THEN ''
              ELSE 'M' || CAST(c_custkey % 9 AS VARCHAR)
                   || CASE WHEN c_custkey % 11 = 0 THEN '.' ELSE '' END
         END AS middle_raw,
         'L' || CAST(c_custkey % 20 AS VARCHAR) AS last_name,
         c_custkey % 13 = 0 AS orcid_bound
  FROM customer
"""

_CANDS = """
  SELECT s_suppkey AS author_id,
         'F' || CAST(s_suppkey % 16 AS VARCHAR)
             || CASE WHEN s_suppkey % 6 = 0 THEN '.' ELSE '' END AS cand_first,
         CASE WHEN s_suppkey % 4 = 0 THEN NULL
              ELSE 'M' || CAST(s_suppkey % 9 AS VARCHAR) END AS cand_middle,
         'L' || CAST(s_suppkey % 20 AS VARCHAR) AS cand_last
  FROM supplier
"""

# one decision pipeline, parameterized by the first/middle expressions
# on BOTH sides (the reference normalizes seat AND candidate:
# nf('pn.parsed_name.first') and nf('alm.first')); {F}/{M} seat-side,
# {CF}/{CM} candidate-side.
_DECIDE = """
  SELECT seat_id,
         CASE WHEN t1_n = 1 THEN t1_id
              WHEN t2_n = 1 THEN t2_id END AS author_id,
         CASE WHEN t1_n = 1 THEN 't1'
              WHEN t2_n = 1 THEN 't2' END AS tier
  FROM (
    SELECT s.seat_id,
           COUNT(CASE WHEN {F} = {CF}
                       AND ({M} IS NOT DISTINCT FROM {CM})
                      THEN 1 END) AS t1_n,
           MAX(CASE WHEN {F} = {CF}
                     AND ({M} IS NOT DISTINCT FROM {CM})
                    THEN c.author_id END) AS t1_id,
           COUNT(CASE WHEN {F} = {CF} AND {M} IS NULL
                      THEN 1 END) AS t2_n,
           MAX(CASE WHEN {F} = {CF} AND {M} IS NULL
                    THEN c.author_id END) AS t2_id
    FROM seats s LEFT JOIN cands c ON c.cand_last = s.last_name
    GROUP BY s.seat_id
  )
"""

_NF = "NULLIF(REGEXP_REPLACE({}, '\\.$', ''), '')"
_OLD = _DECIDE.format(
    F="s.first_raw", M="NULLIF(s.middle_raw, '<never>')",
    CF="c.cand_first", CM="c.cand_middle",
)
_NEW = _DECIDE.format(
    F=_NF.format("s.first_raw"), M=_NF.format("s.middle_raw"),
    CF=_NF.format("c.cand_first"), CM=_NF.format("c.cand_middle"),
)

_DIFF_BODY = f"""
WITH seats AS ({_SEATS}),
cands AS ({_CANDS}),
old_d AS ({_OLD}),
new_d AS ({_NEW}),
diff AS (
  SELECT s.seat_id, s.orcid_bound,
         s.first_raw LIKE '%.' AS dotted_first,
         o.author_id AS old_id, n.author_id AS new_id,
         o.tier AS old_tier, n.tier AS new_tier,
         CASE
           WHEN (o.author_id IS NOT DISTINCT FROM n.author_id)
                AND (o.tier IS NOT DISTINCT FROM n.tier) THEN 'unchanged'
           WHEN o.author_id IS NOT DISTINCT FROM n.author_id
             THEN 'tier_only'
           WHEN o.author_id IS NULL AND n.tier = 't2' THEN 'new_tier2'
           WHEN o.author_id IS NULL THEN 'new_repair'
           WHEN n.author_id IS NULL AND s.first_raw LIKE '%.'
             THEN 'lost_dotted'
           WHEN n.author_id IS NULL THEN 'lost_unique'
           ELSE 'id_changed'
         END AS change_class
  FROM seats s
  JOIN old_d o ON o.seat_id = s.seat_id
  JOIN new_d n ON n.seat_id = s.seat_id
)
"""

_TALLY_SQL = _DIFF_BODY + """
SELECT change_class, orcid_bound, COUNT(*) AS n
FROM diff GROUP BY change_class, orcid_bound
"""

_PER_CLASS = 7

_SAMPLE_SQL = _DIFF_BODY + f"""
, one_sided AS (
  SELECT change_class, seat_id, 'new' AS side_tag,
         new_id AS judged_id, new_tier AS judged_tier,
         ROW_NUMBER() OVER (
           PARTITION BY change_class
           ORDER BY {stable_hash64_duckdb("CAST(seat_id AS VARCHAR)")}
         ) AS rn
  FROM diff WHERE change_class IN ('new_tier2', 'new_repair')
  UNION ALL
  SELECT change_class, seat_id, 'old' AS side_tag,
         old_id AS judged_id, old_tier AS judged_tier,
         ROW_NUMBER() OVER (
           PARTITION BY change_class
           ORDER BY {stable_hash64_duckdb("CAST(seat_id AS VARCHAR)")}
         ) AS rn
  FROM diff WHERE change_class IN ('lost_dotted', 'lost_unique')
),
idch_seats AS (
  SELECT seat_id, old_id, old_tier, new_id, new_tier,
         ROW_NUMBER() OVER (
           ORDER BY {stable_hash64_duckdb("CAST(seat_id AS VARCHAR)")}
         ) AS rn
  FROM diff WHERE change_class = 'id_changed'
),
both_sides AS (
  SELECT 'id_changed' AS change_class, seat_id, 'old' AS side_tag,
         old_id AS judged_id, old_tier AS judged_tier, rn
  FROM idch_seats
  UNION ALL
  SELECT 'id_changed', seat_id, 'new', new_id, new_tier, rn
  FROM idch_seats
)
SELECT change_class, seat_id, side_tag, judged_id, judged_tier
FROM (SELECT * FROM one_sided UNION ALL SELECT * FROM both_sides)
WHERE rn <= {_PER_CLASS}
"""


def _seats(spark: SparkSession) -> DataFrame:
    c = F.col("c_custkey")
    return spark.table("customer").select(
        c.alias("seat_id"),
        F.concat(
            F.lit("F"), (c % 16).cast("string"),
            F.when(c % 5 == 0, F.lit(".")).otherwise(F.lit("")),
        ).alias("first_raw"),
        F.when(c % 17 == 0, F.lit(None).cast("string"))
        .when(c % 7 == 0, F.lit(""))
        .otherwise(
            F.concat(
                F.lit("M"), (c % 9).cast("string"),
                F.when(c % 11 == 0, F.lit(".")).otherwise(F.lit("")),
            )
        ).alias("middle_raw"),
        F.concat(F.lit("L"), (c % 20).cast("string")).alias("last_name"),
        (c % 13 == 0).alias("orcid_bound"),
    )


def _cands(spark: SparkSession) -> DataFrame:
    s = F.col("s_suppkey")
    return spark.table("supplier").select(
        s.alias("author_id"),
        F.concat(
            F.lit("F"), (s % 16).cast("string"),
            F.when(s % 6 == 0, F.lit(".")).otherwise(F.lit("")),
        ).alias("cand_first"),
        F.when(s % 4 != 0, F.concat(F.lit("M"), (s % 9).cast("string"))).alias(
            "cand_middle"
        ),
        F.concat(F.lit("L"), (s % 20).cast("string")).alias("cand_last"),
    )


def _decide(seats: DataFrame, cands: DataFrame, first, middle) -> DataFrame:
    """One unique-gated 2-tier decision pass; ``first``/``middle`` are
    functions Column->Column applying the logic-under-test to BOTH the
    seat and the candidate side (as the reference does)."""
    f, m = first(F.col("first_raw")), middle(F.col("middle_raw"))
    cf, cm = first(F.col("cand_first")), middle(F.col("cand_middle"))
    joined = seats.join(
        F.broadcast(cands), F.col("cand_last") == F.col("last_name"), "left"
    )
    t1 = (f == cf) & m.eqNullSafe(cm)
    t2 = (f == cf) & m.isNull()
    agg = joined.groupBy("seat_id").agg(
        F.count(F.when(t1, 1)).alias("t1_n"),
        F.max(F.when(t1, F.col("author_id"))).alias("t1_id"),
        F.count(F.when(t2, 1)).alias("t2_n"),
        F.max(F.when(t2, F.col("author_id"))).alias("t2_id"),
    )
    return agg.select(
        "seat_id",
        F.when(F.col("t1_n") == 1, F.col("t1_id"))
        .when(F.col("t2_n") == 1, F.col("t2_id"))
        .alias("author_id"),
        F.when(F.col("t1_n") == 1, F.lit("t1"))
        .when(F.col("t2_n") == 1, F.lit("t2"))
        .alias("tier"),
    )


def _diff(spark: SparkSession) -> DataFrame:
    seats = _seats(spark)
    cands = _cands(spark)
    ident = lambda col: col  # noqa: E731
    nf = lambda col: F.nullif(  # noqa: E731
        F.regexp_replace(col, r"\.$", ""), F.lit("")
    )
    old_d = _decide(seats, cands, ident, lambda c: F.nullif(c, F.lit("<never>")))
    new_d = _decide(seats, cands, nf, nf)
    o = old_d.select(
        F.col("seat_id").alias("o_seat"),
        F.col("author_id").alias("old_id"),
        F.col("tier").alias("old_tier"),
    )
    n = new_d.select(
        F.col("seat_id").alias("n_seat"),
        F.col("author_id").alias("new_id"),
        F.col("tier").alias("new_tier"),
    )
    return (
        seats.join(o, F.col("o_seat") == F.col("seat_id"))
        .join(n, F.col("n_seat") == F.col("seat_id"))
        .select(
            "seat_id",
            "orcid_bound",
            F.col("first_raw").like("%.").alias("dotted_first"),
            "old_id", "new_id", "old_tier", "new_tier",
            F.when(
                F.col("old_id").eqNullSafe(F.col("new_id"))
                & F.col("old_tier").eqNullSafe(F.col("new_tier")),
                F.lit("unchanged"),
            )
            .when(
                F.col("old_id").eqNullSafe(F.col("new_id")), F.lit("tier_only")
            )
            .when(
                F.col("old_id").isNull() & (F.col("new_tier") == "t2"),
                F.lit("new_tier2"),
            )
            .when(F.col("old_id").isNull(), F.lit("new_repair"))
            .when(
                F.col("new_id").isNull() & F.col("first_raw").like("%."),
                F.lit("lost_dotted"),
            )
            .when(F.col("new_id").isNull(), F.lit("lost_unique"))
            .otherwise(F.lit("id_changed"))
            .alias("change_class"),
        )
    )


@register(
    "namefix_counterfactual_diff",
    oracle=_TALLY_SQL,
    tags=("domain", "D6", "qa", "A6"),
    tables=("customer", "supplier"),
)
def namefix_counterfactual_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The counterfactual decision diff (qa/ntierfix_validate.py sim +
    diff stages): the 2-tier unique-gated cascade runs under the OLD
    normalization (dots and empty strings kept) and the NEW one
    (trailing-dot strip, empty -> NULL) in one blocked candidate join
    each, per-seat decisions joined and classified, tallied by class ×
    orcid_bound (ORCID-bound seats are unaffected by a name-logic
    change — the reference prints them as a separate column for
    exactly that reason).

    Plan: candidates broadcast (author dim), each counterfactual is a
    partial-aggregable rollup on the seat key, diff is a seat-keyed
    3-way join, tally is a tiny rollup."""
    return (
        _diff(spark)
        .groupBy("change_class", "orcid_bound")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "namefix_stratified_sample",
    oracle=_SAMPLE_SQL,
    tags=("domain", "D6", "qa", "T4"),
    tables=("customer", "supplier"),
)
def namefix_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The judge-sample stage (qa/ntierfix_validate.py sample): K seats
    per change class, hash-ordered so the sample is deterministic and
    unbiased (md5-derived portable hash standing in for the reference's
    Spark-only xxhash64); NEW matches judge the incoming binding, LOST
    matches judge what is given up, and ``id_changed`` explodes BOTH
    sides as separate judge rows.

    Plan: the diff is reused; per-class sampling is one window over the
    class partition — the sample size bounds every downstream row."""
    diff = _diff(spark)
    hkey = stable_hash64(F.col("seat_id").cast("string"))
    w_class = Window.partitionBy("change_class").orderBy(hkey)
    one_sided = (
        diff.where(F.col("change_class").isin("new_tier2", "new_repair"))
        .select(
            "change_class", "seat_id", F.lit("new").alias("side_tag"),
            F.col("new_id").alias("judged_id"),
            F.col("new_tier").alias("judged_tier"),
        )
        .unionByName(
            diff.where(
                F.col("change_class").isin("lost_dotted", "lost_unique")
            ).select(
                "change_class", "seat_id", F.lit("old").alias("side_tag"),
                F.col("old_id").alias("judged_id"),
                F.col("old_tier").alias("judged_tier"),
            )
        )
        .withColumn("rn", F.row_number().over(w_class))
    )
    idch = (
        diff.where(F.col("change_class") == "id_changed")
        .withColumn("rn", F.row_number().over(Window.orderBy(hkey)))
        .select("seat_id", "old_id", "old_tier", "new_id", "new_tier", "rn")
    )
    both = (
        idch.select(
            F.lit("id_changed").alias("change_class"), "seat_id",
            F.lit("old").alias("side_tag"),
            F.col("old_id").alias("judged_id"),
            F.col("old_tier").alias("judged_tier"), "rn",
        )
    ).unionByName(
        idch.select(
            F.lit("id_changed").alias("change_class"), "seat_id",
            F.lit("new").alias("side_tag"),
            F.col("new_id").alias("judged_id"),
            F.col("new_tier").alias("judged_tier"), "rn",
        )
    )
    return (
        one_sided.unionByName(both)
        .where(F.col("rn") <= _PER_CLASS)
        .select(
            "change_class", "seat_id", "side_tag", "judged_id", "judged_tier"
        )
    )
