"""Curation application planes (reference
``notebooks/end2end/ApplyWorkAuthorCurations.ipynb``,
``notebooks/authors/ApplyAuthorNameCurations.ipynb``).

``work_author_curations_apply`` — the apply-every-cycle override design
(2026-05-11 pivot): no apply-once gating, no per-row state; both MERGEs
idempotent.

* **claims** are name-anchored: MERGE on (work_id, raw_author_name),
  deduped latest-wins per slot (created DESC, curation_id DESC) —
  conflicting claims on one slot are real and the most recent wins;
  the no-op churn guard (``MATCHED AND (author_id IS NULL OR <>)``)
  keeps already-curated slots from bumping updated_at every cycle;
* **removes** are sticky disclaims: DISTINCT (work_id, author_id) —
  many users can disclaim the same pair and the UPDATE sets a constant
  so collapsing is safe — then NULL the slot wherever it currently
  holds the disclaimed author.  Naturally idempotent: once NULLed the
  author_id join stops matching until MatchAuthors re-attaches;
* claims apply BEFORE removes (notebook cell order) — a slot claimed
  to a disclaimed author in the same cycle ends NULL.

Output materializes the post-apply state of every slot in a curated
work plus which rule touched it, so the hash pins the dedup, the churn
guard, the NULL-ing, and the ordering at once.

``author_name_curations_diff`` — the display-name re-sync detector:
compare the currently-displayed name against
``COALESCE(curated, organic)`` under a null-safe equality.  One pass
catches new curations, changed curations, AND deletions (displayed
still shows a curated name whose row is gone).  The port adds a
``reason`` column naming which of the three cases fired.

Scale: claims/removals are curation-sized dims (broadcast); the
work_authors side is touched only at curated works (semi-join prune).
The diff is a three-way author-keyed join — one shuffle family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openalex_walden_spark.queries.registry import register

# ---------------------------------------------------------------------------
# work_author_curations_apply
# ---------------------------------------------------------------------------
# work_authors <- lineitem ln<=4: raw 'R<sk%40>', author sk%50 (NULL when
#   sk%6=0)
# claims <- orders o%7=0, k in 0..1: raw 'R<(o+k)%40>' — but o%3=0 makes
#   both rows hit the SAME slot (conflict); created (o+k)%9 with o%5=0
#   forcing the exact-timestamp tie -> curation_id breaks it
# removals <- orders o%11=0: (work, (o*7)%50), emitted twice (DISTINCT)

_WA_DUCK = """
  SELECT l_orderkey AS work_id, l_linenumber AS seat, l_partkey AS pk, l_suppkey AS sk,
         concat('R', CAST(l_suppkey % 40 AS VARCHAR)) AS raw_author_name,
         CASE WHEN l_suppkey % 6 = 0 THEN NULL ELSE CAST(l_suppkey % 50 AS BIGINT) END AS author_id
  FROM lineitem WHERE l_linenumber <= 4
"""

_CLAIMS_DUCK = """
  SELECT o_orderkey AS work_id,
         concat('R', CAST(CASE WHEN o_orderkey % 3 = 0 THEN o_orderkey % 40
                               ELSE (o_orderkey + t.k) % 40 END AS VARCHAR)) AS raw_author_name,
         CAST((o_orderkey * 3 + t.k) % 50 AS BIGINT) AS author_id,
         CASE WHEN o_orderkey % 5 = 0 THEN 7 ELSE CAST((o_orderkey + t.k) % 9 AS INT) END AS created,
         o_orderkey * 10 + t.k AS curation_id
  FROM orders, UNNEST(range(0, 2)) AS t(k)
  WHERE o_orderkey % 7 = 0
"""

_REMOVALS_DUCK = """
  SELECT o_orderkey AS work_id, CAST((o_orderkey * 7) % 50 AS BIGINT) AS author_id
  FROM orders, UNNEST(range(0, 2)) AS dup(d)
  WHERE o_orderkey % 11 = 0
"""

_ORACLE_WA_APPLY = f"""
WITH wa AS ({_WA_DUCK}),
claims0 AS ({_CLAIMS_DUCK}),
claims AS (
  SELECT work_id, raw_author_name, author_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY work_id, raw_author_name
      ORDER BY created DESC, curation_id DESC) AS rn
    FROM claims0
  ) q WHERE rn = 1
),
removals AS (SELECT DISTINCT work_id, author_id FROM ({_REMOVALS_DUCK}) r),
after_claims AS (
  SELECT w.work_id, w.seat, w.pk, w.sk, w.raw_author_name,
         w.author_id AS author_before,
         CASE WHEN c.work_id IS NOT NULL
                   AND (w.author_id IS NULL OR w.author_id <> c.author_id)
              THEN c.author_id ELSE w.author_id END AS author_mid,
         (c.work_id IS NOT NULL
          AND (w.author_id IS NULL OR w.author_id <> c.author_id)) AS claimed
  FROM wa w
  LEFT JOIN claims c ON c.work_id = w.work_id
    AND c.raw_author_name = w.raw_author_name
),
after_removes AS (
  SELECT a.*, (r.work_id IS NOT NULL) AS removed,
         CASE WHEN r.work_id IS NOT NULL THEN NULL ELSE a.author_mid END AS author_after
  FROM after_claims a
  LEFT JOIN removals r ON r.work_id = a.work_id AND r.author_id = a.author_mid
),
curated_works AS (
  SELECT work_id FROM claims UNION SELECT work_id FROM removals
)
SELECT concat(CAST(f.work_id AS VARCHAR), '.', CAST(f.seat AS VARCHAR), '.',
              CAST(f.pk AS VARCHAR), '.', CAST(f.sk AS VARCHAR)) AS slot_id,
       f.work_id, f.raw_author_name,
       f.author_before, f.author_after,
       CASE WHEN f.removed THEN 'removed'
            WHEN f.claimed THEN 'claimed'
            ELSE 'untouched' END AS touched_by
FROM after_removes f
JOIN curated_works cw ON cw.work_id = f.work_id
ORDER BY slot_id
"""


@register(
    "work_author_curations_apply",
    oracle=_ORACLE_WA_APPLY,
    tags=("curations", "merge", "override"),
    tables=("lineitem", "orders"),
)
def work_author_curations_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Work-author claim/disclaim application
    (ApplyWorkAuthorCurations.ipynb; see module docstring)."""
    from pyspark.sql import Window

    wa = spark.table("lineitem").where("l_linenumber <= 4").selectExpr(
        "l_orderkey AS work_id", "l_linenumber AS seat", "l_partkey AS pk",
        "l_suppkey AS sk",
        "concat('R', CAST(l_suppkey % 40 AS STRING)) AS raw_author_name",
        "CASE WHEN l_suppkey % 6 = 0 THEN NULL ELSE CAST(l_suppkey % 50 AS BIGINT) END AS author_id",
    )
    claims0 = (
        spark.table("orders")
        .where("o_orderkey % 7 = 0")
        .select("*", F.explode(F.expr("sequence(0, 1)")).alias("k"))
        .selectExpr(
            "o_orderkey AS work_id",
            "concat('R', CAST(CASE WHEN o_orderkey % 3 = 0 THEN o_orderkey % 40"
            " ELSE (o_orderkey + k) % 40 END AS STRING)) AS raw_author_name",
            "CAST((o_orderkey * 3 + k) % 50 AS BIGINT) AS author_id",
            "CASE WHEN o_orderkey % 5 = 0 THEN 7 ELSE CAST((o_orderkey + k) % 9 AS INT) END AS created",
            "o_orderkey * 10 + k AS curation_id",
        )
    )
    claims = (
        claims0.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("work_id", "raw_author_name").orderBy(
                    F.col("created").desc(), F.col("curation_id").desc()
                )
            ),
        )
        .where("rn = 1")
        .select("work_id", "raw_author_name", "author_id")
    )
    removals = (
        spark.table("orders")
        .where("o_orderkey % 11 = 0")
        .selectExpr(
            "o_orderkey AS work_id", "CAST((o_orderkey * 7) % 50 AS BIGINT) AS author_id"
        )
        .distinct()
    )
    after_claims = wa.join(
        F.broadcast(
            claims.selectExpr(
                "work_id AS c_work", "raw_author_name AS c_raw", "author_id AS c_author"
            )
        ),
        (F.col("work_id") == F.col("c_work"))
        & (F.col("raw_author_name") == F.col("c_raw")),
        "left",
    ).selectExpr(
        "work_id", "seat", "pk", "sk", "raw_author_name",
        "author_id AS author_before",
        "CASE WHEN c_work IS NOT NULL AND (author_id IS NULL OR author_id <> c_author)"
        " THEN c_author ELSE author_id END AS author_mid",
        "(c_work IS NOT NULL AND (author_id IS NULL OR author_id <> c_author)) AS claimed",
    )
    after_removes = after_claims.join(
        F.broadcast(
            removals.selectExpr("work_id AS r_work", "author_id AS r_author")
        ),
        (F.col("work_id") == F.col("r_work")) & (F.col("author_mid") == F.col("r_author")),
        "left",
    ).selectExpr(
        "*",
        "(r_work IS NOT NULL) AS removed",
        "CASE WHEN r_work IS NOT NULL THEN NULL ELSE author_mid END AS author_after",
    )
    curated_works = (
        claims.select("work_id").unionByName(removals.select("work_id")).distinct()
    )
    return (
        after_removes.join(curated_works, "work_id", "semi")
        .selectExpr(
            "concat(CAST(work_id AS STRING), '.', CAST(seat AS STRING), '.',"
            " CAST(pk AS STRING), '.', CAST(sk AS STRING)) AS slot_id",
            "work_id", "raw_author_name", "author_before", "author_after",
            "CASE WHEN removed THEN 'removed'"
            " WHEN claimed THEN 'claimed' ELSE 'untouched' END AS touched_by",
        )
        .orderBy("slot_id")
    )


# ---------------------------------------------------------------------------
# author_name_curations_diff
# ---------------------------------------------------------------------------
# authors (organic) <- customer: 'Org<c%30>'
# displayed (openalex_authors) <- cases by c%5:
#   0 organic; 1 stale curated 'Old<c%20>'; 2 current curated; 3 organic;
#   4 NULL displayed (null-safe compare must fire)
# curations exist when c%4<2: curated 'Cur<c%25>' — but when c%8=1 the
#   curation equals the displayed name already (no-op)

_ORACLE_NAME_DIFF = """
WITH a AS (
  SELECT c_custkey AS author_id,
         concat('Org', CAST(c_custkey % 30 AS VARCHAR)) AS organic
  FROM customer
),
oa AS (
  SELECT c_custkey AS author_id,
         CASE CAST(c_custkey % 5 AS INT)
           WHEN 1 THEN concat('Old', CAST(c_custkey % 20 AS VARCHAR))
           WHEN 2 THEN concat('Cur', CAST(c_custkey % 25 AS VARCHAR))
           WHEN 4 THEN NULL
           ELSE concat('Org', CAST(c_custkey % 30 AS VARCHAR)) END AS displayed
  FROM customer
),
c AS (
  SELECT c_custkey AS author_id,
         CASE WHEN c_custkey % 8 = 1 THEN concat('Old', CAST(c_custkey % 20 AS VARCHAR))
              ELSE concat('Cur', CAST(c_custkey % 25 AS VARCHAR)) END AS curated
  FROM customer WHERE c_custkey % 4 < 2
)
SELECT a.author_id, a.organic, oa.displayed, c.curated,
       CASE WHEN c.author_id IS NOT NULL AND oa.displayed IS NOT DISTINCT FROM a.organic
            THEN 'new_curation'
            WHEN c.author_id IS NOT NULL THEN 'changed_curation'
            ELSE 'deleted_curation' END AS reason
FROM a
JOIN oa ON oa.author_id = a.author_id
LEFT JOIN c ON c.author_id = a.author_id
WHERE (c.author_id IS NOT NULL OR NOT (oa.displayed IS NOT DISTINCT FROM a.organic))
  AND NOT (oa.displayed IS NOT DISTINCT FROM coalesce(c.curated, a.organic))
ORDER BY a.author_id
"""


@register(
    "author_name_curations_diff",
    oracle=_ORACLE_NAME_DIFF,
    tags=("curations", "diff"),
    tables=("customer",),
)
def author_name_curations_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Display-name re-sync detector — one null-safe comparison catches
    new, changed, AND deleted curations
    (ApplyAuthorNameCurations.ipynb cell 2; see module docstring)."""
    c0 = spark.table("customer")
    a = c0.selectExpr(
        "c_custkey AS author_id",
        "concat('Org', CAST(c_custkey % 30 AS STRING)) AS organic",
    )
    oa = c0.selectExpr(
        "c_custkey AS oa_id",
        """CASE CAST(c_custkey % 5 AS INT)
             WHEN 1 THEN concat('Old', CAST(c_custkey % 20 AS STRING))
             WHEN 2 THEN concat('Cur', CAST(c_custkey % 25 AS STRING))
             WHEN 4 THEN NULL
             ELSE concat('Org', CAST(c_custkey % 30 AS STRING)) END AS displayed""",
    )
    cur = (
        c0.where("c_custkey % 4 < 2")
        .selectExpr(
            "c_custkey AS c_id",
            "CASE WHEN c_custkey % 8 = 1 THEN concat('Old', CAST(c_custkey % 20 AS STRING))"
            " ELSE concat('Cur', CAST(c_custkey % 25 AS STRING)) END AS curated",
        )
    )
    return (
        a.join(oa, F.col("author_id") == F.col("oa_id"))
        .join(F.broadcast(cur), F.col("author_id") == F.col("c_id"), "left")
        .where(
            "(c_id IS NOT NULL OR NOT (displayed <=> organic))"
            " AND NOT (displayed <=> coalesce(curated, organic))"
        )
        .selectExpr(
            "author_id", "organic", "displayed", "curated",
            "CASE WHEN c_id IS NOT NULL AND (displayed <=> organic) THEN 'new_curation'"
            " WHEN c_id IS NOT NULL THEN 'changed_curation'"
            " ELSE 'deleted_curation' END AS reason",
        )
        .orderBy("author_id")
    )


# ---------------------------------------------------------------------------
# Author ORCID curations (notebooks/authors/SyncAuthorOrcidCurations.ipynb,
# ApplyAuthorOrcidCurations.ipynb)
# ---------------------------------------------------------------------------
# replace events <- urgent orders: (author o_custkey, new O-<custkey*3%997>,
#   created o_orderdate, tiebreak o_orderkey)
# remove events  <- medium orders: removed O-<custkey> (matches organic)
# authors        <- customer: organic O-<custkey>, NULL when custkey%3=0
# displayed      <- customer: stale 'O-<custkey>-x' when %7=0 (previously
#   applied curation), NULL when %11=0, else organic
#
# The reference's latest-wins windows order by created DESC alone — ties
# between same-day curations would be engine-dependent, so both dialects
# here carry the event-id tiebreak (created DESC, id DESC), the same
# discipline work_author_curations_apply uses.

_ORCID_STATE_SQL = """
WITH latest_replace AS (
  SELECT author_id, curated_orcid FROM (
    SELECT o_custkey AS author_id,
           'O-' || CAST(o_custkey * 3 % 997 AS VARCHAR) AS curated_orcid,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
    FROM orders WHERE o_orderpriority = '1-URGENT'
  ) WHERE rn = 1
),
latest_remove AS (
  SELECT author_id, removed_orcid FROM (
    SELECT o_custkey AS author_id,
           'O-' || CAST(o_custkey AS VARCHAR) AS removed_orcid,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
    FROM orders WHERE o_orderpriority = '3-MEDIUM'
  ) WHERE rn = 1
)
SELECT COALESCE(r.author_id, d.author_id) AS author_id,
       r.curated_orcid, d.removed_orcid
FROM latest_replace r
FULL OUTER JOIN latest_remove d ON r.author_id = d.author_id
"""


def _orcid_state(spark: SparkSession) -> DataFrame:
    from pyspark.sql.window import Window

    orders = spark.table("orders")
    w = Window.partitionBy("author_id").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    rep = (
        orders.where(F.col("o_orderpriority") == "1-URGENT")
        .select(
            F.col("o_custkey").alias("author_id"),
            F.concat(
                F.lit("O-"), ((F.col("o_custkey") * 3) % 997).cast("string")
            ).alias("curated_orcid"),
            "o_orderdate", "o_orderkey",
        )
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("author_id", "curated_orcid")
    )
    rem = (
        orders.where(F.col("o_orderpriority") == "3-MEDIUM")
        .select(
            F.col("o_custkey").alias("author_id"),
            F.concat(F.lit("O-"), F.col("o_custkey").cast("string")).alias(
                "removed_orcid"
            ),
            "o_orderdate", "o_orderkey",
        )
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select(F.col("author_id").alias("d_author_id"), "removed_orcid")
    )
    return rep.join(
        rem, F.col("author_id") == F.col("d_author_id"), "full_outer"
    ).select(
        F.coalesce("author_id", "d_author_id").alias("author_id"),
        "curated_orcid",
        "removed_orcid",
    )


@register(
    "author_orcid_curation_state",
    oracle=_ORCID_STATE_SQL,
    tags=("domain", "D12", "curations", "J2"),
    tables=("orders",),
)
def author_orcid_curation_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-direction ORCID curation state
    (SyncAuthorOrcidCurations.ipynb cell 6): latest-wins per author for
    the replace log and the removal log INDEPENDENTLY, full-outer
    joined so one author can hold both a replace and a remove (the
    MERGE's NOT-MATCHED-BY-SOURCE delete is the j9 family, pinned
    elsewhere).

    Plan: two window dedups over priority-pruned order scans, one
    full-outer hash join on the author key."""
    return _orcid_state(spark)


_ORCID_PENDING_SQL = """
WITH state AS (""" + _ORCID_STATE_SQL + """),
authors AS (
  SELECT c_custkey AS id,
         CASE WHEN c_custkey % 3 = 0 THEN NULL
              ELSE 'O-' || CAST(c_custkey AS VARCHAR) END AS orcid
  FROM customer
),
displayed AS (
  SELECT c_custkey AS id,
         CASE WHEN c_custkey % 11 = 0 THEN NULL
              WHEN c_custkey % 7 = 0
                THEN 'O-' || CAST(c_custkey AS VARCHAR) || '-x'
              WHEN c_custkey % 3 = 0 THEN NULL
              ELSE 'O-' || CAST(c_custkey AS VARCHAR) END AS orcid
  FROM customer
)
SELECT a.id AS author_id, oa.orcid AS displayed_orcid,
       CASE
         WHEN oc.curated_orcid IS NOT NULL AND oc.curated_orcid <> ''
           THEN oc.curated_orcid
         WHEN oc.removed_orcid IS NOT NULL AND a.orcid = oc.removed_orcid
           THEN NULL
         ELSE a.orcid
       END AS resolved_orcid
FROM authors a
JOIN displayed oa ON a.id = oa.id
LEFT JOIN state oc ON a.id = oc.author_id
WHERE (oc.author_id IS NOT NULL OR NOT (oa.orcid IS NOT DISTINCT FROM a.orcid))
  AND NOT (oa.orcid IS NOT DISTINCT FROM CASE
    WHEN oc.curated_orcid IS NOT NULL AND oc.curated_orcid <> ''
      THEN oc.curated_orcid
    WHEN oc.removed_orcid IS NOT NULL AND a.orcid = oc.removed_orcid THEN NULL
    ELSE a.orcid
  END)
"""


@register(
    "author_orcid_pending_changes",
    oracle=_ORCID_PENDING_SQL,
    tags=("domain", "D9", "curations"),
    tables=("orders", "customer"),
)
def author_orcid_pending_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which authors' DISPLAYED ORCID changes under current curations
    (ApplyAuthorOrcidCurations.ipynb cell 2): scoped to authors with an
    active curation OR a displayed/organic drift (the second catches
    curation DELETIONS), minus authors whose display already equals the
    resolution — curated wins when non-empty, a removal matching the
    organic ORCID nulls it, else organic stands.  Null-safe equality
    throughout (``<=>`` / IS NOT DISTINCT FROM).

    Plan: curation state is order-log-sized (broadcastable dim); the
    author/displayed join is one shuffle on the author key."""
    c = F.col("c_custkey")
    organic = F.when(c % 3 != 0, F.concat(F.lit("O-"), c.cast("string")))
    authors = spark.table("customer").select(
        c.alias("id"), organic.alias("orcid")
    )
    displayed = spark.table("customer").select(
        c.alias("oa_id"),
        F.when(c % 11 == 0, F.lit(None).cast("string"))
        .when(c % 7 == 0, F.concat(F.lit("O-"), c.cast("string"), F.lit("-x")))
        .otherwise(organic)
        .alias("displayed"),
    )
    state = _orcid_state(spark).withColumnRenamed("author_id", "oc_id")
    resolved = (
        F.when(
            F.col("curated_orcid").isNotNull()
            & (F.col("curated_orcid") != ""),
            F.col("curated_orcid"),
        )
        .when(
            F.col("removed_orcid").isNotNull()
            & (F.col("orcid") == F.col("removed_orcid")),
            F.lit(None).cast("string"),
        )
        .otherwise(F.col("orcid"))
    )
    return (
        authors.join(displayed, F.col("id") == F.col("oa_id"))
        .join(F.broadcast(state), F.col("id") == F.col("oc_id"), "left")
        .where(
            (F.col("oc_id").isNotNull() | ~F.col("displayed").eqNullSafe(F.col("orcid")))
            & ~F.col("displayed").eqNullSafe(resolved)
        )
        .select(
            F.col("id").alias("author_id"),
            F.col("displayed").alias("displayed_orcid"),
            resolved.alias("resolved_orcid"),
        )
    )


_ORCID_COLLISION_SQL = """
WITH state AS (""" + _ORCID_STATE_SQL + """),
authors AS (
  SELECT c_custkey AS id,
         CASE WHEN c_custkey % 3 = 0 THEN NULL
              ELSE 'O-' || CAST(c_custkey AS VARCHAR) END AS orcid
  FROM customer
)
SELECT c.author_id AS curated_author_id,
       c.curated_orcid,
       a.id AS existing_author_id
FROM state c
JOIN authors a
  ON a.orcid = c.curated_orcid AND a.id <> c.author_id
WHERE c.curated_orcid IS NOT NULL AND c.curated_orcid <> ''
"""


@register(
    "author_orcid_collision_guard",
    oracle=_ORCID_COLLISION_SQL,
    tags=("domain", "D2", "curations", "J3"),
    tables=("orders", "customer"),
)
def author_orcid_collision_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The out-of-scope-merge surfacing query
    (SyncAuthorOrcidCurations.ipynb cell 8): a replace that sets an
    ORCID already held by a DIFFERENT author would make the global
    ORCID match key ambiguous on the next clustering cycle — per the
    #410 design that is a merge, not a curation, so it is surfaced,
    never silently applied.

    Plan: curation state joins the author dim on the ORCID value (one
    shuffle family), inequality on the id keeps self-matches out."""
    state = _orcid_state(spark).where(
        F.col("curated_orcid").isNotNull() & (F.col("curated_orcid") != "")
    )
    c = F.col("c_custkey")
    authors = spark.table("customer").select(
        c.alias("id"),
        F.when(c % 3 != 0, F.concat(F.lit("O-"), c.cast("string"))).alias(
            "orcid"
        ),
    )
    return state.join(
        authors,
        (F.col("orcid") == F.col("curated_orcid"))
        & (F.col("id") != F.col("author_id")),
    ).select(
        F.col("author_id").alias("curated_author_id"),
        "curated_orcid",
        F.col("id").alias("existing_author_id"),
    )
