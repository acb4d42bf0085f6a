"""Repo super-authorships (reference
``notebooks/end2end/CreateRepoSuperAuthorships.ipynb``): fuse, per PMH
record, the best authoritative author list with affiliations and
corresponding flags contributed by OTHER sources of the same record.

Ported semantics (cell 1, CTE by CTE):

* **authoritative base** — author lists only from repo / repo_backfill /
  landing_page (never pdf), best row per pmh_id by provenance priority
  (then a deterministic tiebreak; the reference adds updated_date DESC
  and an xxhash64 content tiebreak — the fixture pins determinism with
  the location key instead, documented);
* **affiliation base** — repo / repo_backfill / pdf / landing_page,
  with the GROBID/scraper noise caps: a pdf author contributes at most
  2 affiliations, a landing-page author at most 5, authoritative
  provenances uncapped;
* the ``get(affiliations.name, 0) IS NOT NULL`` junk gate (an
  affiliation list whose first name is NULL is parser noise);
* **key-based attach** — affiliations RANK-ed per (pmh, author_key) by
  priority, best rank's affiliations collected ARRAY_SORT-ed;
  is_corresponding matched by author_key from rows where the flag
  exists and the author's value is non-NULL;
* **guarded positional fallback** (the CJK/romanized key-mismatch fix):
  a pmh falls back to position-based attach ONLY when key matching
  found ZERO matches across all its authors AND the authoritative
  author count equals the best affiliation source's author count — the
  count guard prevents wrong positional assignment when sources
  disagree on the author list;
* final assembly: authoritative order preserved (the reference's
  COLLECT_SET + original_author_order comparator), TRIM on
  given/family/name, affiliations rendered in sorted order.

Output renders one signature row per pmh (the d10 discipline) so the
hash pins author order, the key/positional coalesce, the caps, and the
fallback gate at once.

Scale: every aggregate and window keys on pmh_id (or pmh_id+key) — one
shuffle family; the fallback set is a pmh-keyed semi-join; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openalex_walden_spark.queries.registry import register

# ---------------------------------------------------------------------------
# Fixture arithmetic (identical in both engines)
# ---------------------------------------------------------------------------
# locations <- lineitem folded to one row per (okey, ln<=4): pk/sk = mins.
#   provenance: ln 1 repo, 2 landing_page, 3 pdf, 4 repo_backfill
#   priority:   repo 1 < repo_backfill 2 < landing_page 3 < pdf 4
#   authors_exist pk%13<>0; affiliations_exist sk%3<>0;
#   is_corresponding_exists: landing_page AND sk%2=0
#   n_auth = 1 + pk%3
# author (loc, i<n_auth):
#   key 'k<(okey+i)%50>' — but landing/pdf rows of okey%19=0 use 'z...'
#   (key mismatch -> positional-fallback candidates; the count guard
#   still decides)
#   given 'G<(okey+i)%9> ' (trailing space: TRIM must fire)
#   family ' F<(okey*2+i)%11>'; name 'N<(okey+i)%13>'
#   orcid when (okey+i)%4=0; is_corr value NULL when (okey+i)%5=4 else
#   (okey+i)%3=0
#   n_affs: pdf (sk+i)%4 (cap 2!), landing (sk+i)%7 (cap 5!), else (sk+i)%3
#   first aff name NULL when (sk+i)%17=0 (junk gate fires)
# aff (author, j<n_affs): name 'Aff<(sk+i+j)%20>', dept 'D<j>' when j%2=0,
#   ror '0r<(i+j)%6>'

_LOCS_DUCK = """
  SELECT l_orderkey AS okey, l_linenumber AS ln,
         min(l_partkey) AS pk, min(l_suppkey) AS sk
  FROM lineitem WHERE l_linenumber <= 4
  GROUP BY l_orderkey, l_linenumber
"""

_LOC_COLS_DUCK = """
  SELECT concat('pmh:', CAST(okey AS VARCHAR)) AS pmh_id, okey, ln, pk, sk,
         CASE ln WHEN 1 THEN 'repo' WHEN 2 THEN 'landing_page'
                 WHEN 3 THEN 'pdf' ELSE 'repo_backfill' END AS provenance,
         CASE ln WHEN 1 THEN 1 WHEN 4 THEN 2 WHEN 2 THEN 3 ELSE 4 END AS priority,
         (pk % 13 <> 0) AS authors_exist,
         (sk % 3 <> 0) AS affiliations_exist,
         (ln = 2 AND sk % 2 = 0) AS corr_exists,
         1 + (pk % 3) AS n_auth
  FROM locs0
"""

_AUTH_DUCK = """
  SELECT l.*, t.i,
         CASE WHEN l.okey % 19 = 0 AND l.provenance IN ('landing_page', 'pdf')
              THEN concat('z', CAST((l.okey + t.i) % 50 AS VARCHAR))
              ELSE concat('k', CAST((l.okey + t.i) % 50 AS VARCHAR)) END AS author_key,
         concat('G', CAST((l.okey + t.i) % 9 AS VARCHAR), ' ') AS given,
         concat(' F', CAST((l.okey * 2 + t.i) % 11 AS VARCHAR)) AS family,
         concat('N', CAST((l.okey + t.i) % 13 AS VARCHAR)) AS name,
         CASE WHEN (l.okey + t.i) % 4 = 0
              THEN concat('0000-', CAST((l.okey + t.i) % 100 AS VARCHAR)) END AS orcid,
         CASE WHEN (l.okey + t.i) % 5 = 4 THEN NULL
              ELSE ((l.okey + t.i) % 3 = 0) END AS is_corr_val,
         CASE l.provenance WHEN 'pdf' THEN (l.sk + t.i) % 4
              WHEN 'landing_page' THEN (l.sk + t.i) % 7
              ELSE (l.sk + t.i) % 3 END AS n_affs,
         ((l.sk + t.i) % 17 = 0) AS first_aff_null
  FROM loccols l, UNNEST(range(0, l.n_auth)) AS t(i)
  WHERE l.authors_exist
"""

_ORACLE_SUPERAUTH = f"""
WITH locs0 AS ({_LOCS_DUCK}),
loccols AS ({_LOC_COLS_DUCK}),
authors AS ({_AUTH_DUCK}),
auth_base AS (  -- authoritative pick: repo/repo_backfill/landing only
  SELECT *, row_number() OVER (PARTITION BY pmh_id ORDER BY priority, ln) AS r
  FROM loccols
  WHERE authors_exist AND provenance IN ('repo', 'repo_backfill', 'landing_page')
),
best_authors AS (
  SELECT a.pmh_id, a.i AS pos, a.author_key, a.given, a.family, a.name, a.orcid,
         b.n_auth AS auth_count
  FROM (SELECT * FROM auth_base WHERE r = 1) b
  JOIN authors a ON a.pmh_id = b.pmh_id AND a.ln = b.ln
),
aff_rows AS (  -- affiliation base with noise caps + junk gate
  SELECT a.pmh_id, a.ln, a.priority, a.i, a.author_key, a.n_affs, a.sk
  FROM authors a
  WHERE a.affiliations_exist AND a.n_affs > 0 AND NOT a.first_aff_null
    AND (a.provenance NOT IN ('pdf', 'landing_page')
         OR (a.provenance = 'pdf' AND a.n_affs <= 2)
         OR (a.provenance = 'landing_page' AND a.n_affs <= 5))
),
aff_exploded AS (
  SELECT r.pmh_id, r.ln, r.priority, r.i, r.author_key,
         concat('Aff', CAST((r.sk + r.i + t.j) % 20 AS VARCHAR)) AS aff_name,
         CASE WHEN t.j % 2 = 0 THEN concat('D', CAST(t.j AS VARCHAR)) END AS dept,
         concat('0r', CAST((r.i + t.j) % 6 AS VARCHAR)) AS ror
  FROM aff_rows r, UNNEST(range(0, r.n_affs)) AS t(j)
),
key_affs AS (
  SELECT pmh_id, author_key,
         array_to_string(list_sort(list(concat(aff_name, '^', coalesce(dept, '~'),
                                               '^', ror))), ';') AS affsig
  FROM (
    SELECT *, rank() OVER (PARTITION BY pmh_id, author_key ORDER BY priority) AS r
    FROM aff_exploded
  ) x WHERE r = 1
  GROUP BY pmh_id, author_key
),
pos_affs AS (
  SELECT pmh_id, i AS pos,
         array_to_string(list_sort(list(concat(aff_name, '^', coalesce(dept, '~'),
                                               '^', ror))), ';') AS affsig
  FROM (
    SELECT *, rank() OVER (PARTITION BY pmh_id, i ORDER BY priority) AS r
    FROM aff_exploded
  ) x WHERE r = 1
  GROUP BY pmh_id, i
),
key_corr AS (
  SELECT pmh_id, author_key, is_corr_val FROM authors
  WHERE corr_exists AND is_corr_val IS NOT NULL
),
pos_corr AS (
  SELECT pmh_id, i AS pos, is_corr_val FROM authors
  WHERE corr_exists AND is_corr_val IS NOT NULL
),
fallback AS (  -- zero key matches AND equal author counts
  SELECT nk.pmh_id FROM (
    SELECT ba.pmh_id
    FROM best_authors ba
    LEFT JOIN key_affs ka ON ka.pmh_id = ba.pmh_id AND ka.author_key = ba.author_key
    GROUP BY ba.pmh_id HAVING count(ka.author_key) = 0
  ) nk
  JOIN (SELECT pmh_id, n_auth FROM auth_base WHERE r = 1) au ON au.pmh_id = nk.pmh_id
  JOIN (
    SELECT pmh_id, n_auth FROM (
      SELECT *, row_number() OVER (PARTITION BY pmh_id ORDER BY priority) AS r2
      FROM loccols WHERE authors_exist AND affiliations_exist
    ) q WHERE r2 = 1
  ) af ON af.pmh_id = nk.pmh_id AND af.n_auth = au.n_auth
),
assembled AS (
  SELECT ba.pmh_id, ba.pos,
         concat(CAST(ba.pos AS VARCHAR), ':', trim(ba.given), '|', trim(ba.family),
                '|', trim(ba.name), '|', coalesce(ba.orcid, '~'), '|',
                coalesce(coalesce(ka.affsig, pa.affsig), ''), '|',
                coalesce(CAST(coalesce(kc.is_corr_val, pc.is_corr_val) AS VARCHAR), '~'),
                '|', ba.author_key) AS sig
  FROM best_authors ba
  LEFT JOIN key_affs ka ON ka.pmh_id = ba.pmh_id AND ka.author_key = ba.author_key
  LEFT JOIN key_corr kc ON kc.pmh_id = ba.pmh_id AND kc.author_key = ba.author_key
  LEFT JOIN fallback fb ON fb.pmh_id = ba.pmh_id
  LEFT JOIN pos_affs pa ON fb.pmh_id IS NOT NULL AND pa.pmh_id = ba.pmh_id
    AND pa.pos = ba.pos
  LEFT JOIN pos_corr pc ON fb.pmh_id IS NOT NULL AND pc.pmh_id = ba.pmh_id
    AND pc.pos = ba.pos
)
SELECT pmh_id, CAST(count(*) AS BIGINT) AS n_authors,
       string_agg(sig, '||' ORDER BY pos) AS authorships_sig
FROM assembled GROUP BY pmh_id
ORDER BY pmh_id
"""


@register(
    "repo_super_authorships",
    oracle=_ORACLE_SUPERAUTH,
    tags=("superauth", "domain", "fusion"),
    tables=("lineitem",),
)
def repo_super_authorships(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMH super-authorship fusion
    (CreateRepoSuperAuthorships.ipynb; see module docstring)."""
    from pyspark.sql import Window

    locs0 = (
        spark.table("lineitem")
        .where("l_linenumber <= 4")
        .groupBy(F.col("l_orderkey").alias("okey"), F.col("l_linenumber").alias("ln"))
        .agg(F.min("l_partkey").alias("pk"), F.min("l_suppkey").alias("sk"))
    )
    loccols = locs0.selectExpr(
        "concat('pmh:', CAST(okey AS STRING)) AS pmh_id", "okey", "ln", "pk", "sk",
        "CASE CAST(ln AS INT) WHEN 1 THEN 'repo' WHEN 2 THEN 'landing_page'"
        " WHEN 3 THEN 'pdf' ELSE 'repo_backfill' END AS provenance",
        "CASE CAST(ln AS INT) WHEN 1 THEN 1 WHEN 4 THEN 2 WHEN 2 THEN 3 ELSE 4 END AS priority",
        "(pk % 13 <> 0) AS authors_exist",
        "(sk % 3 <> 0) AS affiliations_exist",
        "(ln = 2 AND sk % 2 = 0) AS corr_exists",
        "CAST(1 + (pk % 3) AS BIGINT) AS n_auth",
    )
    authors = (
        loccols.where("authors_exist")
        .select("*", F.explode(F.expr("sequence(0, CAST(n_auth AS INT) - 1)")).alias("i"))
        .selectExpr(
            "*",
            "CASE WHEN okey % 19 = 0 AND provenance IN ('landing_page', 'pdf')"
            " THEN concat('z', CAST((okey + i) % 50 AS STRING))"
            " ELSE concat('k', CAST((okey + i) % 50 AS STRING)) END AS author_key",
            "concat('G', CAST((okey + i) % 9 AS STRING), ' ') AS given",
            "concat(' F', CAST((okey * 2 + i) % 11 AS STRING)) AS family",
            "concat('N', CAST((okey + i) % 13 AS STRING)) AS name",
            "CASE WHEN (okey + i) % 4 = 0"
            " THEN concat('0000-', CAST((okey + i) % 100 AS STRING)) END AS orcid",
            "CASE WHEN (okey + i) % 5 = 4 THEN NULL"
            " ELSE ((okey + i) % 3 = 0) END AS is_corr_val",
            "CASE provenance WHEN 'pdf' THEN (sk + i) % 4"
            " WHEN 'landing_page' THEN (sk + i) % 7"
            " ELSE (sk + i) % 3 END AS n_affs",
            "((sk + i) % 17 = 0) AS first_aff_null",
        )
    )
    auth_base = (
        loccols.where(
            "authors_exist AND provenance IN ('repo', 'repo_backfill', 'landing_page')"
        )
        .withColumn(
            "r", F.row_number().over(Window.partitionBy("pmh_id").orderBy("priority", "ln"))
        )
        .where("r = 1")
        .select("pmh_id", F.col("ln").alias("b_ln"), F.col("n_auth").alias("auth_count"))
    )
    best_authors = authors.join(
        auth_base,
        (authors.pmh_id == auth_base.pmh_id) & (authors.ln == auth_base.b_ln),
    ).select(
        authors.pmh_id,
        F.col("i").alias("pos"),
        "author_key",
        "given",
        "family",
        "name",
        "orcid",
        "auth_count",
    )
    aff_rows = authors.where(
        "affiliations_exist AND n_affs > 0 AND NOT first_aff_null"
        " AND (provenance NOT IN ('pdf', 'landing_page')"
        " OR (provenance = 'pdf' AND n_affs <= 2)"
        " OR (provenance = 'landing_page' AND n_affs <= 5))"
    )
    aff_exploded = aff_rows.select(
        "pmh_id", "ln", "priority", "i", "author_key", "sk",
        F.explode(F.expr("sequence(0, CAST(n_affs AS INT) - 1)")).alias("j"),
    ).selectExpr(
        "pmh_id", "ln", "priority", "i", "author_key",
        "concat('Aff', CAST((sk + i + j) % 20 AS STRING)) AS aff_name",
        "CASE WHEN j % 2 = 0 THEN concat('D', CAST(j AS STRING)) END AS dept",
        "concat('0r', CAST((i + j) % 6 AS STRING)) AS ror",
    )
    affsig = F.array_join(
        F.array_sort(
            F.collect_list(
                F.expr("concat(aff_name, '^', coalesce(dept, '~'), '^', ror)")
            )
        ),
        ";",
    )
    key_affs = (
        aff_exploded.withColumn(
            "r", F.rank().over(Window.partitionBy("pmh_id", "author_key").orderBy("priority"))
        )
        .where("r = 1")
        .groupBy("pmh_id", "author_key")
        .agg(affsig.alias("k_affsig"))
    )
    pos_affs = (
        aff_exploded.withColumn(
            "r", F.rank().over(Window.partitionBy("pmh_id", "i").orderBy("priority"))
        )
        .where("r = 1")
        .groupBy("pmh_id", F.col("i").alias("pa_pos"))
        .agg(affsig.alias("p_affsig"))
    )
    key_corr = authors.where("corr_exists AND is_corr_val IS NOT NULL").select(
        "pmh_id", "author_key", F.col("is_corr_val").alias("k_corr")
    )
    pos_corr = authors.where("corr_exists AND is_corr_val IS NOT NULL").select(
        "pmh_id", F.col("i").alias("pc_pos"), F.col("is_corr_val").alias("p_corr")
    )
    no_keys = (
        best_authors.join(
            key_affs.withColumnRenamed("pmh_id", "ka_pmh"),
            (F.col("pmh_id") == F.col("ka_pmh"))
            & (best_authors.author_key == key_affs.author_key),
            "left",
        )
        .groupBy("pmh_id")
        .agg(F.count(F.col("ka_pmh")).alias("nmatch"))
        .where("nmatch = 0")
        .select("pmh_id")
    )
    best_aff_counts = (
        loccols.where("authors_exist AND affiliations_exist")
        .withColumn(
            "r2", F.row_number().over(Window.partitionBy("pmh_id").orderBy("priority"))
        )
        .where("r2 = 1")
        .select("pmh_id", F.col("n_auth").alias("aff_count"))
    )
    fallback = (
        no_keys.join(auth_base.select("pmh_id", "auth_count"), "pmh_id")
        .join(best_aff_counts, "pmh_id")
        .where("auth_count = aff_count")
        .select("pmh_id", F.lit(True).alias("is_fb"))
    )
    assembled = (
        best_authors.join(key_affs, ["pmh_id", "author_key"], "left")
        .join(key_corr, ["pmh_id", "author_key"], "left")
        .join(fallback, "pmh_id", "left")
        .join(
            pos_affs.withColumnRenamed("pmh_id", "pa_pmh"),
            (F.col("pmh_id") == F.col("pa_pmh"))
            & (F.col("pos") == F.col("pa_pos"))
            & F.col("is_fb").isNotNull(),
            "left",
        )
        .join(
            pos_corr.withColumnRenamed("pmh_id", "pc_pmh"),
            (F.col("pmh_id") == F.col("pc_pmh"))
            & (F.col("pos") == F.col("pc_pos"))
            & F.col("is_fb").isNotNull(),
            "left",
        )
        .selectExpr(
            "pmh_id", "pos",
            "concat(CAST(pos AS STRING), ':', trim(given), '|', trim(family),"
            " '|', trim(name), '|', coalesce(orcid, '~'), '|',"
            " coalesce(coalesce(k_affsig, p_affsig), ''), '|',"
            " coalesce(CAST(coalesce(k_corr, p_corr) AS STRING), '~'),"
            " '|', author_key) AS sig",
        )
    )
    return (
        assembled.groupBy("pmh_id")
        .agg(
            F.count("*").cast("long").alias("n_authors"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "sig"))),
                    lambda x: x.getField("sig"),
                ),
                "||",
            ).alias("authorships_sig"),
        )
        .orderBy("pmh_id")
    )
