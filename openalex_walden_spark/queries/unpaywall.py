"""The Wunpaywall plane (reference
``notebooks/end2end/CreateWunpaywall.ipynb``): rebuild the
unpaywall-compatibility record for every crossref-indexed work, render
the response payload, and MERGE it into serving state gated on a
content hash so unchanged works never churn their ``updated`` stamp.

Ported semantics (cell 0, top to bottom):

* ``indexed_in_crossref`` base gate;
* the doi-prefix strip (``REPLACE(doi, 'https://doi.org/', '')``) while
  ``doi_url`` keeps the full URL;
* ``genre = COALESCE(primary_location.raw_type, type)``;
* journal fields off the primary location's source with the
  NULL-source coalesce ladder and ``ARRAY_JOIN(ARRAY_SORT(issn))``;
* the diamond→gold OA-status collapse (unpaywall has no diamond);
* ``oa_locations = FILTER(locations, is_oa)`` in location order, each
  rendered with ``url = COALESCE(pdf_url, landing_page_url)``,
  ``is_best`` true exactly for the FIRST filtered element (the
  reference's ``y = GET(filtered_oa_locations, 0)`` equality — here a
  row-level window rank over the filtered set, same answer without
  materializing the list), ``repository_institution`` only for
  repository-type sources;
* ``has_repository_copy = ARRAY_CONTAINS(oa_locations.host_type,
  'repository')``;
* ``z_authors`` sliced to the first seats (reference slices 1..100);
* the ``oa_manual`` override join: ``response_jsonb = '{}'`` rows force
  ``is_oa = FALSE``, ``oa_status = 'closed'``, NULL locations;
* TWO payload renderings — the response (with z_authors) and the hash
  payload (WITHOUT z_authors) — so author-only changes never trigger a
  serving update;
* the MERGE: matched + hash-changed → UPDATE, unmatched → INSERT,
  matched + same hash → no-op (excluded from the output feed).

Deviations (documented): payloads render as deterministic signature
strings instead of ``TO_JSON`` (cross-engine JSON field-order/null
serialization is engine-defined; the hash-gate semantics — what is in
vs out of the hash — are preserved exactly), and the ``updated`` stamp
is a pinned literal (wall-clock is non-deterministic by design here).

Scale: one pass over works; locations aggregate once on work_id; the
previous-state probe joins on the same doi key. The hash gate is the
100 TB win — at 500M works the UPDATE set is the daily delta, not the
table.  sha-256 of the hash payload computes map-side in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openalex_walden_spark.queries.registry import register

# ---------------------------------------------------------------------------
# Fixture arithmetic (identical in both engines)
# ---------------------------------------------------------------------------
# works       <- orders %6<5 (indexed_in_crossref); doi = '10.<okey>'
# locations   <- lineitem seats 1..5: is_oa = (l_linenumber + l_partkey) % 2 = 0,
#                host repo when l_partkey%3=0, pdf NULL when l_suppkey%4=0,
#                license by %5, version by %3, source NULL when l_partkey%11=0
# z_authors   <- seats 1..2 raw names 'Au <l_suppkey%40>'
# genre       <- raw_type 'rt<o%3>' when o%2=0 else NULL; type 't<o%4>'
# journal     <- display NULL when o%7=0; issns [] when o%4=0
# oa_status   <- ['diamond','gold','hybrid','green'][o%4] when any OA else closed
# oa_manual   <- o%13=0 rows carry the '{}' override
# prev state  <- o%3<>2 exists; hash matches current when o%9<3 (no-op rows)

_WUN_LOCS_DUCK = """
  SELECT l_orderkey AS work_id, l_linenumber AS seat, l_partkey AS pk, l_suppkey AS sk,
         ((l_linenumber + l_partkey) % 2 = 0) AS is_oa,
         CASE WHEN l_partkey % 3 = 0 THEN 'repository' ELSE 'publisher' END AS host_type,
         CASE WHEN l_suppkey % 4 = 0 THEN NULL
              ELSE concat('https://pdf.test/', CAST(l_partkey AS VARCHAR)) END AS pdf_url,
         concat('https://land.test/', CAST(l_partkey AS VARCHAR)) AS landing_page_url,
         CASE l_partkey % 5 WHEN 0 THEN 'cc-by' WHEN 1 THEN 'cc-by-nc' ELSE NULL END AS license,
         CASE l_partkey % 3 WHEN 0 THEN 'publishedVersion' WHEN 1 THEN 'acceptedVersion'
              ELSE NULL END AS version,
         CASE WHEN l_partkey % 6 = 0 THEN concat('pmh:', CAST(l_partkey AS VARCHAR)) END AS pmh_id,
         CASE WHEN l_partkey % 7 = 0 THEN concat('ep:', CAST(l_partkey AS VARCHAR)) END AS endpoint_id,
         (l_partkey % 11 = 0) AS source_is_null,
         CASE WHEN l_partkey % 3 = 0 THEN 'repository' ELSE 'journal' END AS source_type,
         concat('Org ', CAST(l_partkey % 9 AS VARCHAR)) AS host_org,
         concat('Au ', CAST(l_suppkey % 40 AS VARCHAR)) AS raw_author_name
  FROM lineitem
  WHERE l_orderkey % 6 < 5 AND l_linenumber <= 5
"""

# per-OA-location signature; is_best is the window rank over the
# filtered set (reference: equality with GET(filtered, 0))
_LOC_SIG = (
    "concat(coalesce(pdf_url, landing_page_url), '|', coalesce(pdf_url, '~'), '|',"
    " landing_page_url, '|', coalesce(license, '~'), '|', coalesce(version, '~'), '|',"
    " host_type, '|', CAST(oa_rn = 1 AS {BOOLSTR}), '|', coalesce(pmh_id, '~'), '|',"
    " coalesce(endpoint_id, '~'), '|',"
    " coalesce(CASE WHEN source_type = 'repository' AND NOT source_is_null"
    " THEN host_org END, '~'))"
)

_ORACLE_WUNPAYWALL = f"""
WITH locs AS ({_WUN_LOCS_DUCK}),
oa_ranked AS (
  SELECT *, row_number() OVER (PARTITION BY work_id ORDER BY seat, pk, sk) AS oa_rn
  FROM locs WHERE is_oa
),
oa_agg AS (
  SELECT work_id,
         count(*) AS n_oa,
         bool_or(host_type = 'repository') AS has_repository_copy,
         string_agg({_LOC_SIG.format(BOOLSTR="VARCHAR")}, ';' ORDER BY seat, pk, sk) AS oa_sig,
         max(CASE WHEN oa_rn = 1 THEN {_LOC_SIG.format(BOOLSTR="VARCHAR")} END) AS best_sig
  FROM oa_ranked GROUP BY work_id
),
z_agg AS (
  SELECT work_id,
         string_agg(concat(CAST(seat AS VARCHAR), ':', raw_author_name), ';'
                    ORDER BY seat, pk, sk) AS z_sig
  FROM locs WHERE seat <= 2 GROUP BY work_id
),
primary_loc AS (
  SELECT work_id, source_is_null AS p_source_is_null
  FROM (SELECT *, row_number() OVER (PARTITION BY work_id ORDER BY seat, pk, sk) AS prn
        FROM locs) WHERE prn = 1
),
works AS (
  SELECT o_orderkey AS okey,
         concat('10.', CAST(o_orderkey AS VARCHAR)) AS doi,
         concat('https://doi.org/10.', CAST(o_orderkey AS VARCHAR)) AS doi_url,
         concat('Title ', CAST(o_orderkey % 97 AS VARCHAR)) AS title,
         coalesce(CASE WHEN o_orderkey % 2 = 0
                       THEN concat('rt', CAST(o_orderkey % 3 AS VARCHAR)) END,
                  concat('t', CAST(o_orderkey % 4 AS VARCHAR))) AS genre,
         CAST(o_orderdate AS VARCHAR) AS published_date,
         year(o_orderdate) AS pub_year,
         (o_orderkey % 17 = 0) AS is_paratext,
         concat('Pub ', CAST(o_orderkey % 8 AS VARCHAR)) AS publisher,
         (o_orderkey % 13 = 0) AS has_override
  FROM orders WHERE o_orderkey % 6 < 5
),
journal AS (
  SELECT w.okey,
         CASE WHEN w.okey % 7 = 0 OR coalesce(p.p_source_is_null, true)
              THEN concat('raw src ', CAST(w.okey % 5 AS VARCHAR))
              ELSE concat('Journal ', CAST(w.okey % 5 AS VARCHAR)) END AS journal_name,
         CASE WHEN w.okey % 4 = 0 OR coalesce(p.p_source_is_null, true) THEN ''
              ELSE array_to_string(list_sort([
                concat('1234-', CAST(w.okey % 90 + 10 AS VARCHAR)),
                concat('0000-', CAST(w.okey % 70 + 10 AS VARCHAR))]), ',') END AS journal_issns,
         CASE WHEN coalesce(p.p_source_is_null, true) THEN '~'
              ELSE concat('0000-', CAST(w.okey % 70 + 10 AS VARCHAR)) END AS journal_issn_l,
         (NOT coalesce(p.p_source_is_null, true)) AND w.okey % 3 = 0 AS journal_is_oa,
         (NOT coalesce(p.p_source_is_null, true)) AND w.okey % 5 = 0 AS journal_is_in_doaj
  FROM works w LEFT JOIN primary_loc p ON p.work_id = w.okey
),
assembled AS (
  SELECT w.okey, w.doi, w.doi_url, w.title, w.genre, w.published_date, w.pub_year,
         w.is_paratext, w.publisher, j.journal_name, j.journal_issns, j.journal_issn_l,
         j.journal_is_oa, j.journal_is_in_doaj,
         coalesce(o.n_oa, 0) AS n_oa0,
         coalesce(o.has_repository_copy, false) AS has_repo0,
         coalesce(o.oa_sig, '') AS oa_sig0,
         coalesce(o.best_sig, '~') AS best_sig0,
         coalesce(z.z_sig, '') AS z_sig,
         w.has_override
  FROM works w
  JOIN journal j ON j.okey = w.okey
  LEFT JOIN oa_agg o ON o.work_id = w.okey
  LEFT JOIN z_agg z ON z.work_id = w.okey
),
statused AS (
  SELECT *,
         CASE WHEN has_override THEN false ELSE n_oa0 > 0 END AS is_oa,
         CASE WHEN has_override OR n_oa0 = 0 THEN 'closed'
              ELSE CASE (['diamond','gold','hybrid','green'])[CAST(okey % 4 AS INT) + 1]
                   WHEN 'diamond' THEN 'gold'
                   ELSE (['diamond','gold','hybrid','green'])[CAST(okey % 4 AS INT) + 1] END
         END AS oa_status,
         CASE WHEN has_override THEN '~' ELSE best_sig0 END AS best_sig,
         CASE WHEN has_override THEN '' ELSE oa_sig0 END AS oa_sig,
         CASE WHEN has_override THEN 0 ELSE n_oa0 END AS n_oa,
         CASE WHEN has_override THEN false ELSE has_repo0 END AS has_repository_copy
  FROM assembled
),
payloads AS (
  SELECT *,
         concat(doi, '<|>', doi_url, '<|>', title, '<|>', genre, '<|>',
                CAST(is_paratext AS VARCHAR), '<|>', published_date, '<|>',
                CAST(pub_year AS VARCHAR), '<|>', journal_name, '<|>',
                journal_issns, '<|>', journal_issn_l, '<|>',
                CAST(journal_is_oa AS VARCHAR), '<|>',
                CAST(journal_is_in_doaj AS VARCHAR), '<|>', publisher, '<|>',
                CAST(is_oa AS VARCHAR), '<|>', oa_status, '<|>',
                CAST(has_repository_copy AS VARCHAR), '<|>', best_sig, '<|>',
                oa_sig, '<|>2') AS hash_payload
  FROM statused
),
hashed AS (
  SELECT *, sha256(hash_payload) AS content_hash,
         concat(hash_payload, '<|>', z_sig) AS json_response
  FROM payloads
),
prev AS (
  SELECT h.okey, h.content_hash AS prev_hash_base, (h.okey % 9 < 3) AS hash_same
  FROM hashed h WHERE h.okey % 3 <> 2
),
merged AS (
  SELECT h.doi,
         CASE WHEN p.okey IS NULL THEN 'insert'
              WHEN p.hash_same THEN 'noop'
              ELSE 'update' END AS action,
         h.content_hash, h.json_response, h.is_oa, h.oa_status,
         h.has_repository_copy, h.n_oa, h.best_sig, h.genre, h.journal_name
  FROM hashed h LEFT JOIN prev p ON p.okey = h.okey
)
SELECT doi, action, content_hash, json_response, is_oa, oa_status,
       has_repository_copy, CAST(n_oa AS BIGINT) AS n_oa, best_sig, genre, journal_name
FROM merged WHERE action <> 'noop'
ORDER BY doi
"""


@register(
    "wunpaywall_build",
    oracle=_ORACLE_WUNPAYWALL,
    tags=("unpaywall", "merge", "hashgate"),
    tables=("orders", "lineitem"),
)
def wunpaywall_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wunpaywall serving rebuild with the content-hash MERGE gate
    (CreateWunpaywall.ipynb cell 0; see module docstring).

    Plan: the locations aggregate and the z-authors slice fold on
    work_id; journal/override enrichment is arithmetic on the same row;
    sha-256 computes map-side; the previous-state probe is a doi-keyed
    left join.  No UDFs, no collects.
    """
    li = spark.table("lineitem").where(
        (F.col("l_orderkey") % 6 < 5) & (F.col("l_linenumber") <= 5)
    )
    locs = li.selectExpr(
        "l_orderkey AS work_id",
        "l_linenumber AS seat",
        "l_partkey AS pk",
        "l_suppkey AS sk",
        "((l_linenumber + l_partkey) % 2 = 0) AS is_oa",
        "CASE WHEN l_partkey % 3 = 0 THEN 'repository' ELSE 'publisher' END AS host_type",
        "CASE WHEN l_suppkey % 4 = 0 THEN NULL"
        " ELSE concat('https://pdf.test/', CAST(l_partkey AS STRING)) END AS pdf_url",
        "concat('https://land.test/', CAST(l_partkey AS STRING)) AS landing_page_url",
        "CASE CAST(l_partkey % 5 AS INT) WHEN 0 THEN 'cc-by' WHEN 1 THEN 'cc-by-nc'"
        " ELSE NULL END AS license",
        "CASE CAST(l_partkey % 3 AS INT) WHEN 0 THEN 'publishedVersion'"
        " WHEN 1 THEN 'acceptedVersion' ELSE NULL END AS version",
        "CASE WHEN l_partkey % 6 = 0 THEN concat('pmh:', CAST(l_partkey AS STRING)) END AS pmh_id",
        "CASE WHEN l_partkey % 7 = 0 THEN concat('ep:', CAST(l_partkey AS STRING)) END AS endpoint_id",
        "(l_partkey % 11 = 0) AS source_is_null",
        "CASE WHEN l_partkey % 3 = 0 THEN 'repository' ELSE 'journal' END AS source_type",
        "concat('Org ', CAST(l_partkey % 9 AS STRING)) AS host_org",
        "concat('Au ', CAST(l_suppkey % 40 AS STRING)) AS raw_author_name",
    )
    from pyspark.sql import Window

    loc_sig = (
        "concat(coalesce(pdf_url, landing_page_url), '|', coalesce(pdf_url, '~'), '|',"
        " landing_page_url, '|', coalesce(license, '~'), '|', coalesce(version, '~'), '|',"
        " host_type, '|', CAST(oa_rn = 1 AS STRING), '|', coalesce(pmh_id, '~'), '|',"
        " coalesce(endpoint_id, '~'), '|',"
        " coalesce(CASE WHEN source_type = 'repository' AND NOT source_is_null"
        " THEN host_org END, '~'))"
    )
    oa_ranked = (
        locs.where(F.col("is_oa"))
        .withColumn(
            "oa_rn",
            F.row_number().over(Window.partitionBy("work_id").orderBy("seat", "pk", "sk"))
        )
        .withColumn("loc_sig", F.expr(loc_sig))
    )
    oa_agg = oa_ranked.groupBy("work_id").agg(
        F.count("*").alias("n_oa"),
        F.max(F.col("host_type") == "repository").alias("has_repository_copy"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("seat"), F.col("pk"), F.col("sk"), F.col("loc_sig")))
                ),
                lambda x: x.getField("loc_sig"),
            ),
            ";",
        ).alias("oa_sig"),
        F.max(F.when(F.col("oa_rn") == 1, F.col("loc_sig"))).alias("best_sig"),
    )
    z_agg = (
        locs.where(F.col("seat") <= 2)
        .groupBy("work_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("seat"),
                                F.col("pk"),
                                F.col("sk"),
                                F.concat(
                                    F.col("seat").cast("string"),
                                    F.lit(":"),
                                    F.col("raw_author_name"),
                                ).alias("z"),
                            )
                        )
                    ),
                    lambda x: x.getField("z"),
                ),
                ";",
            ).alias("z_sig")
        )
    )
    primary_loc = (
        locs.withColumn(
            "prn",
            F.row_number().over(Window.partitionBy("work_id").orderBy("seat", "pk", "sk")),
        )
        .where(F.col("prn") == 1)
        .select("work_id", F.col("source_is_null").alias("p_source_is_null"))
    )
    works = (
        spark.table("orders")
        .where(F.col("o_orderkey") % 6 < 5)
        .selectExpr(
            "o_orderkey AS okey",
            "concat('10.', CAST(o_orderkey AS STRING)) AS doi",
            "concat('https://doi.org/10.', CAST(o_orderkey AS STRING)) AS doi_url",
            "concat('Title ', CAST(o_orderkey % 97 AS STRING)) AS title",
            "coalesce(CASE WHEN o_orderkey % 2 = 0"
            " THEN concat('rt', CAST(o_orderkey % 3 AS STRING)) END,"
            " concat('t', CAST(o_orderkey % 4 AS STRING))) AS genre",
            "CAST(o_orderdate AS STRING) AS published_date",
            "year(o_orderdate) AS pub_year",
            "(o_orderkey % 17 = 0) AS is_paratext",
            "concat('Pub ', CAST(o_orderkey % 8 AS STRING)) AS publisher",
            "(o_orderkey % 13 = 0) AS has_override",
        )
    )
    journal = works.join(
        primary_loc, works.okey == primary_loc.work_id, "left"
    ).selectExpr(
        "okey",
        "CASE WHEN okey % 7 = 0 OR coalesce(p_source_is_null, true)"
        " THEN concat('raw src ', CAST(okey % 5 AS STRING))"
        " ELSE concat('Journal ', CAST(okey % 5 AS STRING)) END AS journal_name",
        "CASE WHEN okey % 4 = 0 OR coalesce(p_source_is_null, true) THEN ''"
        " ELSE array_join(array_sort(array("
        " concat('1234-', CAST(okey % 90 + 10 AS STRING)),"
        " concat('0000-', CAST(okey % 70 + 10 AS STRING)))), ',') END AS journal_issns",
        "CASE WHEN coalesce(p_source_is_null, true) THEN '~'"
        " ELSE concat('0000-', CAST(okey % 70 + 10 AS STRING)) END AS journal_issn_l",
        "(NOT coalesce(p_source_is_null, true)) AND okey % 3 = 0 AS journal_is_oa",
        "(NOT coalesce(p_source_is_null, true)) AND okey % 5 = 0 AS journal_is_in_doaj",
    )
    assembled = (
        works.join(journal, "okey")
        .join(oa_agg, F.col("okey") == oa_agg["work_id"], "left")
        .drop("work_id")
        .join(z_agg, F.col("okey") == z_agg["work_id"], "left")
        .drop("work_id")
        .selectExpr(
            "okey", "doi", "doi_url", "title", "genre", "published_date", "pub_year",
            "is_paratext", "publisher", "journal_name", "journal_issns",
            "journal_issn_l", "journal_is_oa", "journal_is_in_doaj",
            "coalesce(n_oa, 0) AS n_oa0",
            "coalesce(has_repository_copy, false) AS has_repo0",
            "coalesce(oa_sig, '') AS oa_sig0",
            "coalesce(best_sig, '~') AS best_sig0",
            "coalesce(z_sig, '') AS z_sig",
            "has_override",
        )
    )
    statused = assembled.selectExpr(
        "*",
        "CASE WHEN has_override THEN false ELSE n_oa0 > 0 END AS is_oa",
        "CASE WHEN has_override OR n_oa0 = 0 THEN 'closed'"
        " ELSE CASE element_at(array('diamond','gold','hybrid','green'),"
        " CAST(okey % 4 AS INT) + 1)"
        " WHEN 'diamond' THEN 'gold'"
        " ELSE element_at(array('diamond','gold','hybrid','green'),"
        " CAST(okey % 4 AS INT) + 1) END END AS oa_status",
        "CASE WHEN has_override THEN '~' ELSE best_sig0 END AS best_sig",
        "CASE WHEN has_override THEN '' ELSE oa_sig0 END AS oa_sig",
        "CASE WHEN has_override THEN 0 ELSE n_oa0 END AS n_oa",
        "CASE WHEN has_override THEN false ELSE has_repo0 END AS has_repository_copy",
    )
    payloads = statused.selectExpr(
        "*",
        "concat(doi, '<|>', doi_url, '<|>', title, '<|>', genre, '<|>',"
        " CAST(is_paratext AS STRING), '<|>', published_date, '<|>',"
        " CAST(pub_year AS STRING), '<|>', journal_name, '<|>',"
        " journal_issns, '<|>', journal_issn_l, '<|>',"
        " CAST(journal_is_oa AS STRING), '<|>',"
        " CAST(journal_is_in_doaj AS STRING), '<|>', publisher, '<|>',"
        " CAST(is_oa AS STRING), '<|>', oa_status, '<|>',"
        " CAST(has_repository_copy AS STRING), '<|>', best_sig, '<|>',"
        " oa_sig, '<|>2') AS hash_payload",
    )
    hashed = payloads.selectExpr(
        "*",
        "sha2(hash_payload, 256) AS content_hash",
        "concat(hash_payload, '<|>', z_sig) AS json_response",
    )
    prev = hashed.selectExpr(
        "okey AS p_okey", "(okey % 9 < 3) AS hash_same"
    ).where(F.col("p_okey") % 3 != 2)
    merged = hashed.join(prev, hashed.okey == prev.p_okey, "left").selectExpr(
        "doi",
        "CASE WHEN p_okey IS NULL THEN 'insert'"
        " WHEN hash_same THEN 'noop' ELSE 'update' END AS action",
        "content_hash", "json_response", "is_oa", "oa_status",
        "has_repository_copy", "CAST(n_oa AS BIGINT) AS n_oa", "best_sig",
        "genre", "journal_name",
    )
    return merged.where(F.col("action") != "noop").orderBy("doi")


# ---------------------------------------------------------------------------
# URL-curation migration emit (qa/oxjob747_emit_staging.py)
# ---------------------------------------------------------------------------
# The reference migrates legacy unpaywall URL curations into the
# mechanism's approved_curations shape through a seven-branch decision
# table over (action, matched_field, URL evidence, OA baseline):
#   1/2 update+matched         -> URL override on that location
#   3   nullify via pdf        -> pdf_url NULL AND is_oa 'false' (two rows)
#   4   nullify via landing    -> landing_page_url NULL only
#   5   add+matched            -> is_oa 'true', GUARDED: never against a
#                                 baseline-closed work (OA invariance)
#   6   update+unmatched whose new_url already sits on the location
#                              -> downgraded to mark_oa (same guard)
#   7   rest                   -> create_new location rows: content-
#                                 addressed entity id, pdf-vs-landing
#                                 classification of new_url, type/source
#                                 backfills, and the STRICT resolution
#                                 guard (target work must itself hold
#                                 the curated DOI — stale mag/repo
#                                 locations can claim a DOI their work
#                                 does not have)
# then (entity_id, property) conflicts resolve latest-submitted-wins
# and rows are numbered from ID_BASE in submission order.
#
# fixture: curations <- orders (action by priority; new_url
# 'https://x.org/u<okey%97>' + '.pdf' when %5=0; submitted o_orderdate),
# one resolved location per curation (matched_field by %4: 0 pdf_url,
# 1 landing_page_url, else unmatched; entity 'ns<okey%3>:n<okey%400>' so
# distinct curations can collide on one location and exercise the
# conflict dedup; loc pdf url equals new_norm when %11=0 to fire the
# downgrade), works <- customer (doi 'd<ckey%500>', type NULL when %9=0),
# baseline closed when ckey%6=0, source when ckey%2=0.
#
# Deviations (documented): property_value for create_new renders as a
# deterministic 'k=v|k=v' signature instead of TO_JSON (Spark omits
# null JSON fields, DuckDB keeps them — the field SET and values are
# preserved exactly); the reference's conflict ORDER BY
# (submitted_date DESC, qa_class) is not total, so both dialects add
# qa_doi as a final tiebreak.

_EMIT_TMPL = """
WITH eff AS (
  SELECT 'd' || CAST(o_orderkey % 500 AS {STR}) AS doi,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL
              ELSE 'https://old/u' || CAST(o_orderkey % 89 AS {STR}) END AS prev_url,
         'https://x.org/u' || CAST(o_orderkey % 97 AS {STR})
            || CASE WHEN o_orderkey % 5 = 0 THEN '.pdf' ELSE '' END AS new_url,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 'update'
              WHEN o_orderpriority = '2-HIGH' THEN 'nullify'
              WHEN o_orderpriority = '3-MEDIUM' THEN 'add_or_mark_oa' END AS action,
         'u' || CAST(o_custkey % 20 AS {STR}) || '@x.org' AS email,
         o_orderdate AS submitted_date,
         o_orderkey, o_custkey
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
),
res AS (
  SELECT doi, prev_url, new_url, action, email, submitted_date,
         REGEXP_REPLACE(LOWER(new_url), '^https?://', '') AS new_norm,
         CASE WHEN o_orderkey % 4 = 0 THEN 'pdf_url'
              WHEN o_orderkey % 4 = 1 THEN 'landing_page_url' END AS matched_field,
         'ns' || CAST(o_orderkey % 3 AS {STR}) AS native_id_namespace,
         'n' || CAST(o_orderkey % 400 AS {STR}) AS native_id,
         o_custkey AS work_id,
         CASE WHEN o_orderkey % 11 = 0
              THEN 'http://x.org/u' || CAST(o_orderkey % 97 AS {STR})
                   || CASE WHEN o_orderkey % 5 = 0 THEN '.pdf' ELSE '' END
         END AS loc_pdf_url,
         CAST(NULL AS {STR}) AS loc_landing_page_url
  FROM eff
),
works AS (
  SELECT c_custkey AS id,
         'https://doi.org/d' || CAST(c_custkey % 500 AS {STR}) AS doi,
         CASE WHEN c_custkey % 9 = 0 THEN NULL ELSE 'article' END AS type
  FROM customer
),
baseline AS (
  SELECT c_custkey AS work_id, c_custkey % 6 <> 0 AS is_oa,
         CASE WHEN c_custkey % 6 = 0 THEN 'closed' ELSE 'gold' END AS oa_status
  FROM customer
),
work_sources AS (
  SELECT c_custkey AS work_id, c_custkey % 50 AS source_id
  FROM customer WHERE c_custkey % 2 = 0
),
curation_matched AS (
  SELECT doi, prev_url, action,
         MAX(CASE WHEN matched_field IS NOT NULL THEN 1 ELSE 0 END) AS any_match
  FROM res GROUP BY doi, prev_url, action
),
upd AS (
  SELECT native_id_namespace || ':' || native_id AS entity_id,
         matched_field AS property, new_url AS property_value,
         FALSE AS create_new, email, submitted_date,
         'update' AS qa_class, doi AS qa_doi, work_id AS qa_work_id
  FROM res
  WHERE action = 'update' AND matched_field IN ('pdf_url', 'landing_page_url')
),
nul_pdf AS (
  SELECT native_id_namespace || ':' || native_id AS entity_id,
         p.property,
         CASE WHEN p.property = 'is_oa' THEN 'false'
              ELSE CAST(NULL AS {STR}) END AS property_value,
         FALSE AS create_new, email, submitted_date,
         'nullify_pdf' AS qa_class, doi AS qa_doi, work_id AS qa_work_id
  FROM res {EXPLODE_PROPS}
  WHERE action = 'nullify' AND matched_field = 'pdf_url'
),
nul_landing AS (
  SELECT native_id_namespace || ':' || native_id AS entity_id,
         'landing_page_url' AS property, CAST(NULL AS {STR}) AS property_value,
         FALSE AS create_new, email, submitted_date,
         'nullify_landing' AS qa_class, doi AS qa_doi, work_id AS qa_work_id
  FROM res
  WHERE action = 'nullify' AND matched_field = 'landing_page_url'
),
mark_oa AS (
  SELECT native_id_namespace || ':' || native_id AS entity_id,
         'is_oa' AS property, 'true' AS property_value,
         FALSE AS create_new, email, submitted_date,
         'mark_oa' AS qa_class, doi AS qa_doi, work_id AS qa_work_id
  FROM res r
  WHERE action = 'add_or_mark_oa' AND matched_field IS NOT NULL
    AND NOT EXISTS (SELECT 1 FROM baseline b
                    WHERE b.work_id = r.work_id AND b.is_oa = FALSE)
),
upd_as_mark_oa AS (
  SELECT r.native_id_namespace || ':' || r.native_id AS entity_id,
         'is_oa' AS property, 'true' AS property_value,
         FALSE AS create_new, r.email, r.submitted_date,
         'update_unmatched_mark_oa' AS qa_class, r.doi AS qa_doi,
         r.work_id AS qa_work_id
  FROM res r
  JOIN curation_matched m
    ON m.doi = r.doi AND COALESCE(m.prev_url, '') = COALESCE(r.prev_url, '')
   AND m.action = r.action
  WHERE r.action = 'update' AND m.any_match = 0 AND r.work_id IS NOT NULL
    AND (REGEXP_REPLACE(LOWER(COALESCE(r.loc_pdf_url, '')), '^https?://', '')
           = r.new_norm
      OR REGEXP_REPLACE(LOWER(COALESCE(r.loc_landing_page_url, '')),
                        '^https?://', '') = r.new_norm)
    AND NOT EXISTS (SELECT 1 FROM baseline b
                    WHERE b.work_id = r.work_id AND b.is_oa = FALSE)
),
create_new_pairs AS (
  SELECT r.doi, r.new_url, r.email, r.submitted_date, r.work_id
  FROM res r
  JOIN curation_matched m
    ON m.doi = r.doi AND COALESCE(m.prev_url, '') = COALESCE(r.prev_url, '')
   AND m.action = r.action
  WHERE m.any_match = 0 AND r.work_id IS NOT NULL
    AND (r.action = 'add_or_mark_oa'
         OR (r.action = 'update'
             AND NOT EXISTS (SELECT 1 FROM upd_as_mark_oa u
                             WHERE u.qa_doi = r.doi)))
  GROUP BY r.doi, r.new_url, r.email, r.submitted_date, r.work_id
),
create_new_rows AS (
  SELECT
    'openalex_curation:oxjob747-' || CAST(p.work_id AS {STR}) || '-'
      || SUBSTRING(MD5(p.doi || p.new_url), 1, 12) AS entity_id,
    CAST(NULL AS {STR}) AS property,
    'work=https://openalex.org/W' || CAST(p.work_id AS {STR})
      || '|pdf=' || CASE WHEN LOWER(p.new_url) LIKE '%.pdf%'
                           OR LOWER(p.new_url) LIKE '%/pdf/%'
                         THEN p.new_url ELSE '' END
      || '|landing=' || CASE WHEN NOT (LOWER(p.new_url) LIKE '%.pdf%'
                                        OR LOWER(p.new_url) LIKE '%/pdf/%')
                             THEN p.new_url ELSE '' END
      || '|is_oa=true|version=publishedVersion'
      || '|type=' || COALESCE(w.type, 'article')
      || '|source=' || CASE WHEN ws.source_id IS NOT NULL
                            THEN 'https://openalex.org/S'
                                 || CAST(ws.source_id AS {STR})
                            ELSE '' END AS property_value,
    TRUE AS create_new, p.email, p.submitted_date,
    'create_new' AS qa_class, p.doi AS qa_doi, p.work_id AS qa_work_id
  FROM create_new_pairs p
  JOIN works w
    ON w.id = p.work_id
   AND LOWER(REGEXP_REPLACE(w.doi, '^https?://(dx\\.)?doi\\.org/', '')) = p.doi
  LEFT JOIN baseline b ON b.work_id = p.work_id
  LEFT JOIN work_sources ws ON ws.work_id = p.work_id
  WHERE COALESCE(b.is_oa, TRUE) = TRUE OR b.oa_status IS NULL
),
unioned AS (
  SELECT * FROM upd
  UNION ALL SELECT * FROM nul_pdf
  UNION ALL SELECT * FROM nul_landing
  UNION ALL SELECT * FROM mark_oa
  UNION ALL SELECT * FROM upd_as_mark_oa
  UNION ALL SELECT * FROM create_new_rows
),
deduped AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY entity_id, COALESCE(property, '~create~')
    ORDER BY submitted_date DESC NULLS LAST, qa_class, qa_doi
  ) AS conflict_rn
  FROM unioned
)
SELECT
  CAST(100000 + ROW_NUMBER() OVER (
    ORDER BY submitted_date ASC NULLS FIRST, entity_id,
             COALESCE(property, '~create~')) AS INT) AS id,
  'approved' AS status, 'locations' AS entity,
  entity_id, property, property_value, create_new,
  email AS submitter_email, submitted_date,
  'oxjob747-migration' AS moderator_email,
  qa_class, qa_doi, qa_work_id
FROM deduped WHERE conflict_rn = 1
"""

_EMIT_DUCK = _EMIT_TMPL.format(
    STR="VARCHAR",
    EXPLODE_PROPS="CROSS JOIN (SELECT UNNEST(['pdf_url', 'is_oa']) AS property) p",
)
_EMIT_SPARK = _EMIT_TMPL.format(
    STR="STRING",
    EXPLODE_PROPS="LATERAL VIEW EXPLODE(ARRAY('pdf_url', 'is_oa')) p AS property",
)


@register(
    "unpaywall_curation_emit",
    oracle=_EMIT_DUCK,
    tags=("domain", "D12", "unpaywall", "U2"),
    tables=("orders", "customer"),
)
def unpaywall_curation_emit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The URL-curation migration decision table
    (qa/oxjob747_emit_staging.py): seven action/evidence branches
    (update override, two-property pdf nullify, landing nullify,
    OA-invariance-guarded mark_oa, the unmatched-update downgrade,
    content-addressed create_new with the strict DOI-resolution guard),
    latest-submitted-wins conflict dedup, stable id numbering.

    One SQL template compiles to both dialects (only the explode
    syntax and the string type differ), so the oracle checks the exact
    branch logic, not a reimplementation.

    Plan: the branch CTEs are filtered projections of one resolved
    scan; the guards are broadcast-sized semi/anti joins on the work
    key; the only windows run on the bounded emit set."""
    return spark.sql(_EMIT_SPARK)
