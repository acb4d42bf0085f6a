"""Paywall-signals pipeline (reference ``notebooks/paywall_signals/``).

The reference's oxjob-#695 chain: rebuild the PDF-candidate cohort from
landing pages (HOF id extraction, DOI normalization, newest-first
dedup, anti-joins against everything already harvested/held/attempted)
-> classify candidate HTML with host-fingerprint DOM rules -> route
hosts whose measured free-rate cleared the prior gate to a direct-drain
queue.  The drain queue and drip pool themselves are already covered by
``crawl_drain_queue`` (llmdata.py); these three queries close the rest
of the chain.  Sources: ``rebuild_cohort.sql``,
``classify_candidate_html.sql``, ``build_oa_host_queue.sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openalex_walden_spark.functions.hashing import (
    stable_hash64_duckdb,
    stable_hash64_sql,
)
from openalex_walden_spark.queries.registry import register

# ---------------------------------------------------------------------------
# Cohort rebuild: HOF id extraction + newest-first dedup + anti-joins
# ---------------------------------------------------------------------------
# Events play landing pages: the ids array is built from deterministic
# lattices (pmh / doi / native namespaces), the pdf url appears on a
# subset, and the harvested / attempted anti-join arms are earlier
# lattice slices — so "remaining work" is a real set difference.

_IDS_SPARK = """array(
  named_struct('namespace', 'native', 'id', concat('n:', CAST(event_id AS STRING))),
  named_struct('namespace',
    CASE WHEN user_id % 3 = 0 THEN 'pmh'
         WHEN user_id % 3 = 1 THEN 'doi' ELSE 'other' END,
    'id',
    CASE WHEN user_id % 3 = 0 THEN concat('oai:repo:', CAST(event_id % 1000 AS STRING))
         WHEN user_id % 3 = 1 THEN concat('HTTPS://DOI.ORG/10.1234/X', CAST(event_id % 1000 AS STRING))
         ELSE concat('x:', CAST(event_id AS STRING)) END),
  named_struct('namespace',
    CASE WHEN event_id % 2 = 0 THEN 'html.gz' ELSE 'none' END,
    'id', concat('f', CAST(event_id % 500 AS STRING)))
)"""

_COHORT_ORACLE = f"""
WITH lp AS (
  SELECT event_id, user_id, event_type,
         CASE WHEN user_id % 3 = 0 THEN concat('oai:repo:', CAST(event_id % 1000 AS VARCHAR))
              WHEN user_id % 3 = 1 THEN lower(concat('10.1234/x', CAST(event_id % 1000 AS VARCHAR)))
              ELSE concat('n:', CAST(event_id AS VARCHAR)) END AS work_key,
         CASE WHEN user_id % 3 = 0 THEN 'pmh'
              WHEN user_id % 3 = 1 THEN 'doi' ELSE 'native' END AS work_key_ns,
         CASE WHEN event_id % 2 = 0 THEN concat('f', CAST(event_id % 500 AS VARCHAR), '.html.gz') END AS file_key,
         CASE WHEN event_id % 5 <> 4 THEN concat('https://h', CAST(event_id % 7 AS VARCHAR), '.example.org/p.pdf') END AS pdf_url
  FROM events
),
fresh AS (
  SELECT *, row_number() OVER (PARTITION BY work_key ORDER BY event_id DESC) AS rn
  FROM lp
),
cand AS (
  SELECT * FROM fresh WHERE rn = 1 AND file_key IS NOT NULL AND pdf_url IS NOT NULL
),
harvested AS (
  SELECT DISTINCT work_key FROM lp WHERE event_id % 11 = 0
),
attempted AS (
  SELECT DISTINCT work_key FROM lp WHERE event_type = 'error'
)
SELECT work_key_ns, count(*)::BIGINT AS n,
       count(DISTINCT work_key)::BIGINT AS n_keys
FROM cand c
WHERE NOT EXISTS (SELECT 1 FROM harvested h WHERE h.work_key = c.work_key)
  AND NOT EXISTS (SELECT 1 FROM attempted a WHERE a.work_key = c.work_key)
GROUP BY work_key_ns
ORDER BY work_key_ns
"""


@register(
    "paywall_rebuild_cohort",
    oracle=_COHORT_ORACLE,
    tags=("paywall", "antijoin", "hof"),
    tables=("events",),
)
def paywall_rebuild_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort rebuild (rebuild_cohort.sql): work keys extracted with
    HOF filter/get over the nested ids array (DOI keys lowercased and
    scheme-stripped exactly as the reference), newest-first dedup per
    work, then two LEFT ANTI joins drop everything harvested or
    attempted — a rebuild yields exactly the remaining work.  Anti
    joins never materialize complements; the dedup window and both
    anti joins share the work_key shuffle key."""
    lp = spark.table("events").selectExpr(
        "event_id", "user_id", "event_type", f"{_IDS_SPARK} AS ids",
        "CASE WHEN event_id % 5 <> 4 THEN concat('https://h', CAST(event_id % 7 AS STRING), '.example.org/p.pdf') END AS pdf_url",
    ).selectExpr(
        "event_id", "user_id", "event_type", "pdf_url",
        # file_key: html.gz id gets the suffix (reference l.13-14)
        "CASE WHEN size(filter(ids, x -> x.namespace = 'html.gz')) > 0 "
        " THEN concat(get(filter(ids, x -> x.namespace = 'html.gz'), 0).id, '.html.gz') END AS file_key",
        # work_key: pmh > normalized doi > native (reference l.15-19)
        "coalesce(get(filter(ids, x -> x.namespace = 'pmh'), 0).id,"
        " regexp_replace(lower(get(filter(ids, x -> x.namespace = 'doi'), 0).id),"
        "   '^(doi:|https?://(dx[.])?doi[.]org/)', ''),"
        " get(filter(ids, x -> x.namespace = 'native'), 0).id) AS work_key",
        "CASE WHEN size(filter(ids, x -> x.namespace = 'pmh')) > 0 THEN 'pmh'"
        " WHEN size(filter(ids, x -> x.namespace = 'doi')) > 0 THEN 'doi'"
        " ELSE 'native' END AS work_key_ns",
    )
    lp.createOrReplaceTempView("pw_lp")
    return spark.sql("""
        WITH fresh AS (
          SELECT *, row_number() OVER (
            PARTITION BY work_key ORDER BY event_id DESC) AS rn
          FROM pw_lp
        ),
        cand AS (
          SELECT * FROM fresh
          WHERE rn = 1 AND file_key IS NOT NULL AND pdf_url IS NOT NULL
        ),
        harvested AS (
          SELECT DISTINCT work_key FROM pw_lp WHERE event_id % 11 = 0
        ),
        attempted AS (
          SELECT DISTINCT work_key FROM pw_lp WHERE event_type = 'error'
        )
        SELECT work_key_ns, count(*) AS n,
               count(DISTINCT work_key) AS n_keys
        FROM cand c
        LEFT ANTI JOIN harvested h ON h.work_key = c.work_key
        LEFT ANTI JOIN attempted a ON a.work_key = c.work_key
        GROUP BY work_key_ns
        ORDER BY work_key_ns
    """)


# ---------------------------------------------------------------------------
# HTML classifier: host-fingerprint DOM rules
# ---------------------------------------------------------------------------
# Documents play candidate HTML: the host comes from a doc_id lattice
# and a DOM marker is injected per lattice arm, so every fingerprint
# rule fires on a deterministic slice.  The rule set is the
# reference's v3 classifier re-keyed by host (classify_candidate_html
# .sql l.17-80) with the same class/rule pairing and the same
# bad-candidate-url image-extension guard.

_HOSTS = """CASE CAST(doc_id % 8 AS INT)
  WHEN 0 THEN 'www.sciencedirect.com' WHEN 1 THEN 'link.springer.com'
  WHEN 2 THEN 'www.nature.com' WHEN 3 THEN 'academic.oup.com'
  WHEN 4 THEN 'www.cambridge.org' WHEN 5 THEN 'journals.lww.com'
  WHEN 6 THEN 'www.researchsquare.com' ELSE 'unknown.example.org'
END"""

_MARKER = """CASE CAST(doc_id % 5 AS INT)
  WHEN 0 THEN '<span class="OpenAccessLabel">'
  WHEN 1 THEN '<div class="x PurchasePDF"><span data-test="y">'
  WHEN 2 THEN '<div class="readcube-buybox sprcom-buybox get-access-jumplink">'
  WHEN 3 THEN '<a id="buttonGetAccess"><li class="liPurchase">'
  ELSE '<p>plain article body</p>'
END"""

_PDFURL = """CASE WHEN doc_id % 13 = 6
  THEN concat('https://cdn.example.org/fig', CAST(doc_id AS {t}), '.PNG?x=1')
  ELSE concat('https://host.example.org/doc', CAST(doc_id AS {t}), '.pdf')
END"""

_CLASSIFY_CASE = """CASE
  WHEN lower(pdf_url) {rx} '[.](jpg|jpeg|png|gif|svg)([?#].*)?$'
    THEN 'bad_candidate_url'
  WHEN url_host = 'www.sciencedirect.com' AND html {rx} '(OpenAccessLabel|LicenseInfo)'
    THEN 'likely_free'
  WHEN url_host = 'www.sciencedirect.com' AND html {rx} '(PurchasePDF|RemoteAccessButton)'
    THEN 'paywalled'
  WHEN url_host = 'link.springer.com' AND html {rx} 'data-test="open-access'
    THEN 'likely_free'
  WHEN url_host = 'link.springer.com' AND html {rx} '(sprcom-buybox|c-article-buy-box)'
    THEN 'paywalled'
  WHEN url_host = 'www.nature.com' AND html {rx} 'data-test="open-access'
    THEN 'likely_free'
  WHEN url_host = 'www.nature.com' AND html {rx} 'readcube-buybox'
    THEN 'paywalled'
  WHEN url_host = 'academic.oup.com' AND html {rx} '(get-access-jumplink|no-access-message)'
    THEN 'paywalled'
  WHEN url_host = 'www.researchsquare.com' THEN 'likely_free'
  WHEN url_host = 'www.cambridge.org' AND html {rx} 'buttonGetAccess'
    THEN 'paywalled'
  WHEN url_host = 'www.cambridge.org' THEN 'likely_free'
  WHEN url_host = 'journals.lww.com' AND html {rx} '(liPurchase|ejp-access-options)'
    THEN 'paywalled'
  ELSE 'needs_validation'
END"""

def _classify(rx_spark: bool) -> str:
    """Render the fingerprint CASE for one dialect.  DuckDB's ``~`` is
    regexp_full_match, so the oracle uses regexp_matches(...) (partial,
    like Spark's rlike)."""
    import re

    if rx_spark:
        return _CLASSIFY_CASE.replace("{rx}", "rlike")
    return re.sub(
        r"(lower\(pdf_url\)|html) \{rx\} ('[^']*')",
        r"regexp_matches(\1, \2)",
        _CLASSIFY_CASE,
    )


_CLASSIFY_ORACLE = f"""
WITH cand AS (
  SELECT doc_id, {_HOSTS} AS url_host,
         concat(text, ' ', {_MARKER}) AS html,
         {_PDFURL.format(t="VARCHAR")} AS pdf_url
  FROM documents
)
SELECT url_host, {_classify(False)} AS class, count(*)::BIGINT AS n
FROM cand
GROUP BY url_host, class
ORDER BY url_host, class
"""


@register(
    "paywall_classify_html",
    oracle=_CLASSIFY_ORACLE,
    tags=("paywall", "classifier", "scalar"),
    tables=("documents",),
)
def paywall_classify_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-fingerprint HTML classifier (classify_candidate_html.sql):
    per-host DOM rules decide likely_free / paywalled, image-extension
    pdf_urls are parser artifacts (bad_candidate_url wins first), host
    priors classify researchsquare/cambridge without markers, and
    everything else needs validation.  Pure map-side CASE over the
    candidate scan + one rollup shuffle; at 100 TB the classifier cost
    is the HTML scan itself."""
    return spark.sql(f"""
        WITH cand AS (
          SELECT doc_id, {_HOSTS} AS url_host,
                 concat(text, ' ', {_MARKER}) AS html,
                 {_PDFURL.format(t="STRING")} AS pdf_url
          FROM documents
        )
        SELECT url_host, {_classify(True)} AS class, count(*) AS n
        FROM cand
        GROUP BY url_host, class
        ORDER BY url_host, class
    """)


# ---------------------------------------------------------------------------
# OA host queue: verdict-gated direct drain
# ---------------------------------------------------------------------------

_OAQ_ORACLE = f"""
WITH cohort AS (
  SELECT doc_id, concat('w', CAST(doc_id % 400 AS VARCHAR)) AS work_key,
         {_HOSTS} AS url_host,
         concat('f', CAST(doc_id AS VARCHAR)) AS file_key
  FROM documents
),
verdicts AS (
  SELECT url_host,
         CASE WHEN free_rate > 0.6 THEN 'drain' ELSE 'classify' END AS verdict
  FROM (
    SELECT url_host,
           (length(url_host) % 10) / 10.0 AS free_rate
    FROM (SELECT DISTINCT url_host FROM cohort)
  )
),
deduped AS (
  SELECT c.*, row_number() OVER (
    PARTITION BY c.work_key ORDER BY c.file_key) AS rn
  FROM cohort c
  JOIN verdicts v ON v.url_host = c.url_host AND v.verdict = 'drain'
),
queued AS (
  SELECT work_key, url_host,
         row_number() OVER (PARTITION BY url_host
           ORDER BY {stable_hash64_duckdb("work_key")}, work_key) AS host_rank
  FROM deduped WHERE rn = 1
)
SELECT url_host, count(*)::BIGINT AS n_queued,
       max(host_rank)::BIGINT AS max_rank
FROM queued
GROUP BY url_host
ORDER BY url_host
"""


@register(
    "paywall_oa_host_queue",
    oracle=_OAQ_ORACLE,
    tags=("paywall", "queue", "window"),
    tables=("documents",),
)
def paywall_oa_host_queue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direct-drain OA host queue (build_oa_host_queue.sql): membership
    is DATA-DRIVEN — only hosts whose measured free-rate cleared the
    60% gate in the live prior sweep join the queue (the reference's
    own comment: aggregate historical win rates proved wrong on 5
    checked hosts, so they are never used).  Per-work dedup then a
    per-host drip rank ordered by the portable hash (the reference
    uses XXHASH64; stable_hash64 keeps the oracle replayable).  The
    verdict side is a per-host rollup — broadcast sized by the host
    space, never the cohort."""
    return spark.sql(f"""
        WITH cohort AS (
          SELECT doc_id, concat('w', CAST(doc_id % 400 AS STRING)) AS work_key,
                 {_HOSTS} AS url_host,
                 concat('f', CAST(doc_id AS STRING)) AS file_key
          FROM documents
        ),
        verdicts AS (
          SELECT url_host,
                 CASE WHEN free_rate > 0.6 THEN 'drain'
                      ELSE 'classify' END AS verdict
          FROM (
            SELECT url_host, (length(url_host) % 10) / 10.0 AS free_rate
            FROM (SELECT DISTINCT url_host FROM cohort)
          )
        ),
        deduped AS (
          SELECT c.*, row_number() OVER (
            PARTITION BY c.work_key ORDER BY c.file_key) AS rn
          FROM cohort c
          JOIN verdicts v ON v.url_host = c.url_host AND v.verdict = 'drain'
        ),
        queued AS (
          SELECT work_key, url_host,
                 row_number() OVER (PARTITION BY url_host
                   ORDER BY {stable_hash64_sql("work_key")}, work_key)
                   AS host_rank
          FROM deduped WHERE rn = 1
        )
        SELECT url_host, count(*) AS n_queued, max(host_rank) AS max_rank
        FROM queued
        GROUP BY url_host
        ORDER BY url_host
    """)


# ---------------------------------------------------------------------------
# Lakebase sharded doc maintenance (notebooks/lakebase/BuildLakebaseWorksDocs.py)
# ---------------------------------------------------------------------------
# The reference maintains pmod(work_id, 8)-sharded doc tables for
# single-work serving lookups (synced tables recommend <= 1 TB per
# refreshed table) plus an external-id -> work_id map, both
# hash-gated so the serving sync sees only TRUE churn (the upstream
# works table is CREATE-OR-REPLACE'd daily, so without the gate every
# row would churn).  The doc hash here is the engine-portable
# stable_hash64 over a canonical concat_ws serialization — the
# reference hashes its exact-parity JSON; the GATE semantics (new /
# changed / unchanged per shard, deletes by absence) are what port.

_LB_DOC = """concat_ws('|', CAST({k} AS {t}),
  o_orderstatus, CAST(CAST(o_totalprice AS DOUBLE) AS {t}),
  CAST(o_orderdate AS {t}))"""

_LB_ORACLE = f"""
WITH curr AS (
  SELECT o_orderkey AS work_id,
         o_orderkey % 8 AS shard,
         ('0x' || substr(md5({_LB_DOC.format(k="o_orderkey", t="VARCHAR")}), 1, 15))::BIGINT
           AS doc_hash
  FROM orders
),
prev AS (
  SELECT o_orderkey AS work_id,
         ('0x' || substr(md5(
           concat_ws('|', CAST(o_orderkey AS VARCHAR), o_orderstatus,
             CAST(CASE WHEN o_orderkey % 5 = 2
                  THEN CAST(o_totalprice AS DOUBLE) + 1.0
                  ELSE CAST(o_totalprice AS DOUBLE) END AS VARCHAR),
             CAST(o_orderdate AS VARCHAR))), 1, 15))::BIGINT AS doc_hash
  FROM orders WHERE o_orderkey % 17 <> 0
),
gated AS (
  SELECT c.shard,
         CASE WHEN p.work_id IS NULL THEN 'new'
              WHEN p.doc_hash <> c.doc_hash THEN 'changed'
              ELSE 'unchanged' END AS churn
  FROM curr c LEFT JOIN prev p ON p.work_id = c.work_id
)
SELECT shard, churn, count(*)::BIGINT AS n
FROM gated
GROUP BY shard, churn
ORDER BY shard, churn
"""


@register(
    "serving_sharded_doc_maintenance",
    oracle=_LB_ORACLE,
    tags=("serving", "lakebase", "merge"),
    tables=("orders",),
)
def serving_sharded_doc_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sharded serving-doc maintenance: docs route to pmod(id, 8)
    shards, and the hash gate classifies each as new / changed /
    unchanged against the previous build (the fixture's prev state
    drops the %17 arm and perturbs the %5=2 arm's price, so all three
    churn classes materialize per shard).  At 100 TB: the gate is one
    co-partitioned join on work_id, each shard MERGEs independently
    (operators/merge.py), and only true churn reaches the synced
    tables — the reference's design reason verbatim."""
    from openalex_walden_spark.functions.hashing import stable_hash64_sql

    doc = _LB_DOC.format(k="o_orderkey", t="STRING")
    prev_doc = """concat_ws('|', CAST(o_orderkey AS STRING), o_orderstatus,
      CAST(CASE WHEN o_orderkey % 5 = 2
           THEN CAST(o_totalprice AS DOUBLE) + 1.0D
           ELSE CAST(o_totalprice AS DOUBLE) END AS STRING),
      CAST(o_orderdate AS STRING))"""
    spark.table("orders").selectExpr(
        "o_orderkey AS work_id",
        "o_orderkey % 8 AS shard",
        f"{stable_hash64_sql(doc)} AS doc_hash",
    ).createOrReplaceTempView("lb_curr")
    spark.table("orders").where("o_orderkey % 17 <> 0").selectExpr(
        "o_orderkey AS work_id",
        f"{stable_hash64_sql(prev_doc)} AS doc_hash",
    ).createOrReplaceTempView("lb_prev")
    return spark.sql("""
        SELECT shard,
               CASE WHEN p.work_id IS NULL THEN 'new'
                    WHEN p.doc_hash <> c.doc_hash THEN 'changed'
                    ELSE 'unchanged' END AS churn,
               count(*) AS n
        FROM lb_curr c LEFT JOIN lb_prev p ON p.work_id = c.work_id
        GROUP BY shard, churn
        ORDER BY shard, churn
    """)


_LBID_ORACLE = """
WITH ids AS (
  SELECT o_orderkey AS work_id,
         CASE WHEN o_orderkey % 3 = 0
              THEN concat('https://doi.org/10.1234/w', CAST(o_orderkey AS VARCHAR))
              WHEN o_orderkey % 3 = 1
              THEN concat('https://pubmed.ncbi.nlm.nih.gov/', CAST(o_orderkey % 100000 AS VARCHAR))
         END AS ext_id,
         CASE WHEN o_orderkey % 3 = 0 THEN 'doi'
              WHEN o_orderkey % 3 = 1 THEN 'pmid' END AS ns
  FROM orders
),
dedup AS (
  SELECT ext_id, ns, min(work_id) AS work_id
  FROM ids WHERE ext_id IS NOT NULL
  GROUP BY ext_id, ns
)
SELECT ns, count(*)::BIGINT AS n_ids,
       count(DISTINCT work_id)::BIGINT AS n_works
FROM dedup
GROUP BY ns
ORDER BY ns
"""


@register(
    "serving_external_id_map",
    oracle=_LBID_ORACLE,
    tags=("serving", "lakebase", "idmap"),
    tables=("orders",),
)
def serving_external_id_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External-id -> work_id serving map (lakebase_works_ids): URL-form
    DOI/PMID keys, deduplicated min-id (collisions resolve
    deterministically), namespace rollup.  One partial-aggregable
    shuffle on the external id."""
    return spark.sql("""
        WITH ids AS (
          SELECT o_orderkey AS work_id,
                 CASE WHEN o_orderkey % 3 = 0
                      THEN concat('https://doi.org/10.1234/w',
                                  CAST(o_orderkey AS STRING))
                      WHEN o_orderkey % 3 = 1
                      THEN concat('https://pubmed.ncbi.nlm.nih.gov/',
                                  CAST(o_orderkey % 100000 AS STRING))
                 END AS ext_id,
                 CASE WHEN o_orderkey % 3 = 0 THEN 'doi'
                      WHEN o_orderkey % 3 = 1 THEN 'pmid' END AS ns
          FROM orders
        ),
        dedup AS (
          SELECT ext_id, ns, min(work_id) AS work_id
          FROM ids WHERE ext_id IS NOT NULL
          GROUP BY ext_id, ns
        )
        SELECT ns, count(*) AS n_ids,
               count(DISTINCT work_id) AS n_works
        FROM dedup
        GROUP BY ns
        ORDER BY ns
    """)
