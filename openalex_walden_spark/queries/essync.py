"""Search-index sync plane: per-entity id rules + stale reconciliation.

Catalog surface for ``sinks/sync_registry.py`` (the 20-script
``notebooks/elastic/sync_*.py`` family re-expressed as a config
registry plus the plan/reconcile/audit operators).  Two oracle-checked
queries:

- ``es_sync_stale_audit`` — the merge-loser reconciliation
  (sync_funders.py cells 5-7) as an anti-join with the mass-delete cap
  evidence in-row.
- ``es_sync_doc_ids`` — every registry entry's ``_id`` rule evaluated
  by BOTH engines from the same shared registry data, so a drifting
  rule or registry edit breaks the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openalex_walden_spark.queries.registry import register
from openalex_walden_spark.sinks.sync_registry import (
    SYNC_REGISTRY,
    doc_id_column,
    stale_audit,
)

# --------------------------------------------------------------------------
# Stale-doc reconciliation (sync_funders.py cells 5-7)
# --------------------------------------------------------------------------
# The index holds every customer from the last full sync; the API table
# has since dropped the merge losers (negative balance plays
# ``merge_into_id IS NOT NULL``).  Stale = index minus table; the row
# carries the total so the cap decision is part of the checked result.

_STALE_SQL = """
WITH table_ids AS (
  SELECT 'https://openalex.org/F' || CAST(c_custkey AS VARCHAR) AS id
  FROM customer WHERE c_acctbal >= 0
),
index_ids AS (
  SELECT 'https://openalex.org/F' || CAST(c_custkey AS VARCHAR) AS id
  FROM customer
),
stale AS (
  SELECT i.id AS stale_id
  FROM index_ids i LEFT JOIN table_ids t ON i.id = t.id
  WHERE t.id IS NULL
)
SELECT stale_id,
       (SELECT COUNT(*) FROM stale) AS total_stale,
       (SELECT COUNT(*) FROM stale) <= 2000 AS within_cap
FROM stale
"""


@register(
    "es_sync_stale_audit",
    oracle=_STALE_SQL,
    tags=("sink", "S5", "essync", "U4"),
    tables=("customer",),
)
def es_sync_stale_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-loser reconciliation (sync_funders.py cells 5-7): index
    docs whose id left the API table, via ``stale_audit``'s anti-join
    (the reference diffs driver-side Python sets — GBs of ids at works
    scale; the anti-join stays distributed), plus the mass-delete cap
    evidence.

    Plan: one left-anti hash join on the id; the total rides along as
    a broadcast scalar, no second scan of the fact table."""
    cust = spark.table("customer")
    fid = F.concat(
        F.lit("https://openalex.org/F"), F.col("c_custkey").cast("string")
    ).alias("id")
    table_ids = cust.where(F.col("c_acctbal") >= 0).select(fid)
    index_ids = cust.select(fid)
    stale = stale_audit(table_ids, index_ids, max_stale=2000).select(
        F.col("id").alias("stale_id")
    )
    total = stale.agg(F.count(F.lit(1)).alias("total_stale"))
    return stale.crossJoin(F.broadcast(total)).select(
        "stale_id",
        "total_stale",
        (F.col("total_stale") <= 2000).alias("within_cap"),
    )


# --------------------------------------------------------------------------
# Registry id rules, computed by both engines from the same spec data
# --------------------------------------------------------------------------
# One row per SYNC_REGISTRY entry with the entity's _id rule applied to a
# fixed sample key.  The oracle's VALUES literal is generated from the
# SAME tuple (single source of truth), but each engine EVALUATES the
# rule itself (concat / sha256 / composite), so a rule-implementation
# drift in either dialect breaks the hash, not just a registry edit.

_SAMPLE_KEY = "42"


def _spec_values() -> str:
    rows = ", ".join(
        f"('{c.entity}', '{c.index_name}', '{c.id_rule}', "
        f"'{c.id_prefix}', '{c.id_arg}')"
        for c in SYNC_REGISTRY.values()
    )
    return (
        "(VALUES "
        + rows
        + ") AS specs(entity, index_name, id_rule, id_prefix, id_arg)"
    )


_DOCID_SQL = f"""
SELECT entity, index_name,
       CASE id_rule
         WHEN 'prefix' THEN id_prefix || '{_SAMPLE_KEY}'
         WHEN 'sha256' THEN sha256('{_SAMPLE_KEY}')
         WHEN 'composite' THEN 'pmid:{_SAMPLE_KEY}'
         ELSE '{_SAMPLE_KEY}'
       END AS sample_doc_id
FROM {_spec_values()}
"""


@register(
    "es_sync_doc_ids",
    oracle=_DOCID_SQL,
    tags=("sink", "S5", "essync", "registry"),
    tables=(),
)
def es_sync_doc_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every sync entity's ``_id`` rule (notebooks/elastic/sync_*.py id
    construction lines), evaluated on a fixed sample key by
    ``doc_id_column`` on the Spark side and by equivalent SQL in
    DuckDB — both fed from the one SYNC_REGISTRY.

    Plan: a registry-sized local relation; entirely driver-trivial by design
    (the registry IS the data under test)."""
    frames = []
    for c in SYNC_REGISTRY.values():
        cols = "entity STRING, index_name STRING"
        row = [c.entity, c.index_name]
        if c.id_rule == "composite":
            first, second = c.id_arg.split(",")
            cols += f", {first} STRING, {second} STRING"
            row += ["pmid", _SAMPLE_KEY]
        elif c.id_rule == "sha256":
            cols += f", {c.id_arg} STRING"
            row += [_SAMPLE_KEY]
        frames.append(
            spark.createDataFrame([tuple(row)], cols).select(
                "entity",
                "index_name",
                doc_id_column(c, F.lit(_SAMPLE_KEY)).alias("sample_doc_id"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.coalesce(1)


# --------------------------------------------------------------------------
# Content-index manifest export (export_content_manifest_to_r2.py)
# --------------------------------------------------------------------------
# locations <- lineitem: pdf file on every 3rd seat, grobid xml on every
#   4th, native id per seat.  The reference's deliberate shape: ONE
#   GROUP BY with MIN_BY structs instead of a row_number window ("much
#   faster on single node" — and partial-aggregable on a cluster), with
#   the invariant that native_id comes from the SAME location row as
#   the reported pdf uuid (grobid row as fallback).  The reference's
#   MIN_BY key (the s3 id alone) ties when two locations share a file;
#   both dialects here append native_id so the pick is total.

_MANIFEST_SQL = """
SELECT openalex_id, pdf_uuid, grobid_xml_id,
       src.native_id AS native_id,
       src.native_id_namespace AS native_id_namespace,
       updated_date
FROM (
  SELECT 'W' || CAST(l_orderkey AS VARCHAR) AS openalex_id,
         REPLACE(MIN(pdf_s3_id), '.pdf', '') AS pdf_uuid,
         REPLACE(MIN(grobid_s3_id), '.xml.gz', '') AS grobid_xml_id,
         COALESCE(
           MIN_BY(struct_pack(native_id := native_id,
                              native_id_namespace := native_id_namespace),
                  pdf_s3_id || chr(1) || native_id),
           MIN_BY(struct_pack(native_id := native_id,
                              native_id_namespace := native_id_namespace),
                  grobid_s3_id || chr(1) || native_id)
         ) AS src,
         MAX(updated_date) AS updated_date
  FROM (
    SELECT l_orderkey,
           CASE WHEN l_linenumber % 3 = 0
                THEN 'p' || CAST(l_partkey AS VARCHAR) || '.pdf' END
             AS pdf_s3_id,
           CASE WHEN l_linenumber % 4 = 0
                THEN 'g' || CAST(l_suppkey AS VARCHAR) || '.xml.gz' END
             AS grobid_s3_id,
           'n' || CAST(l_linenumber AS VARCHAR) AS native_id,
           CASE WHEN l_linenumber % 2 = 0 THEN 'doi' ELSE 'pmh' END
             AS native_id_namespace,
           l_shipdate AS updated_date
    FROM lineitem
  )
  WHERE pdf_s3_id IS NOT NULL OR grobid_s3_id IS NOT NULL
  GROUP BY l_orderkey
)
"""


@register(
    "content_manifest_export",
    oracle=_MANIFEST_SQL,
    tags=("sink", "S6", "essync", "A4"),
    tables=("lineitem",),
)
def content_manifest_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partner-facing content manifest
    (export_content_manifest_to_r2.py): work id -> pdf/grobid UUIDs +
    the native id OF THE ROW THAT SUPPLIED THE FILE (min_by struct,
    grobid-row fallback), written as a full-replacement parquet
    directory.  The reference explicitly rewrote this from a
    row_number window to one GROUP BY — the same plan Spark
    partial-aggregates map-side, so the shuffle carries one row per
    work, not one per location.

    Plan: single scan of lineitem, one partial-aggregable rollup, no
    window, no join."""
    ln = F.col("l_linenumber")
    locs = spark.table("lineitem").select(
        "l_orderkey",
        F.when(
            ln % 3 == 0,
            F.concat(F.lit("p"), F.col("l_partkey").cast("string"), F.lit(".pdf")),
        ).alias("pdf_s3_id"),
        F.when(
            ln % 4 == 0,
            F.concat(
                F.lit("g"), F.col("l_suppkey").cast("string"), F.lit(".xml.gz")
            ),
        ).alias("grobid_s3_id"),
        F.concat(F.lit("n"), ln.cast("string")).alias("native_id"),
        F.when(ln % 2 == 0, F.lit("doi")).otherwise(F.lit("pmh")).alias(
            "native_id_namespace"
        ),
        F.col("l_shipdate").alias("updated_date"),
    ).where(F.col("pdf_s3_id").isNotNull() | F.col("grobid_s3_id").isNotNull())
    src = F.struct("native_id", "native_id_namespace")
    agg = locs.groupBy("l_orderkey").agg(
        F.regexp_replace(F.min("pdf_s3_id"), r"\.pdf", "").alias("pdf_uuid"),
        F.regexp_replace(F.min("grobid_s3_id"), r"\.xml\.gz", "").alias(
            "grobid_xml_id"
        ),
        F.coalesce(
            # F.concat propagates NULL (a null s3 id must stay invisible
            # to min_by, matching || in the oracle); concat_ws would not.
            # \x01 separator sorts below every legal s3-id character, so
            # native_id only breaks EXACT s3-id ties — a ':' separator
            # flipped non-tie picks when one id prefixes another
            # ('file12:x' < 'file1:y' though 'file1' < 'file12').
            F.min_by(src, F.concat("pdf_s3_id", F.lit("\x01"), "native_id")),
            F.min_by(
                src, F.concat("grobid_s3_id", F.lit("\x01"), "native_id")
            ),
        ).alias("src"),
        F.max("updated_date").alias("updated_date"),
    )
    return agg.select(
        F.concat(F.lit("W"), F.col("l_orderkey").cast("string")).alias(
            "openalex_id"
        ),
        "pdf_uuid",
        "grobid_xml_id",
        F.col("src.native_id").alias("native_id"),
        F.col("src.native_id_namespace").alias("native_id_namespace"),
        "updated_date",
    )


# --------------------------------------------------------------------------
# Snapshot retention plan (export_wunpaywall.ipynb cell 1)
# --------------------------------------------------------------------------
# After each weekly export the reference lists the snapshot prefix,
# parses the timestamp out of 'unpaywall_snapshot_<ts>.jsonl.gz' names
# (files that do not match the pattern are never deletion candidates),
# keeps the newest 5, and deletes the rest.  Listing <- orders: one
# dated snapshot name per day-bucket plus non-matching manifest noise;
# the plan marks keep/delete per file.

_RETENTION_SQL = """
WITH listing AS (
  SELECT DISTINCT
    CASE WHEN o_orderkey % 9 = 0 THEN 'manifest_' || CAST(o_orderkey AS VARCHAR) || '.json'
         ELSE 'unpaywall_snapshot_' || strftime(o_orderdate, '%Y-%m-%d')
              || 'T' || lpad(CAST(o_orderkey % 240000 AS VARCHAR), 6, '0')
              || '.jsonl.gz'
    END AS file_key
  FROM orders WHERE o_orderkey % 151 = 0
),
parsed AS (
  SELECT file_key,
         regexp_extract(file_key,
           'unpaywall_snapshot_([0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9]{6})\\.jsonl\\.gz$',
           1) AS snap_ts
  FROM listing
),
ranked AS (
  SELECT file_key, snap_ts,
         CASE WHEN snap_ts <> '' THEN
           ROW_NUMBER() OVER (PARTITION BY (snap_ts <> '')
                              ORDER BY snap_ts DESC, file_key)
         END AS recency
  FROM parsed
)
SELECT file_key,
       CASE WHEN snap_ts = '' THEN 'not_a_snapshot'
            WHEN recency <= 5 THEN 'keep'
            ELSE 'delete' END AS action
FROM ranked
"""


@register(
    "snapshot_retention_plan",
    oracle=_RETENTION_SQL,
    tags=("sink", "S6", "essync", "T4"),
    tables=("orders",),
)
def snapshot_retention_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weekly-export retention pass (export_wunpaywall.ipynb):
    parse the timestamp out of conforming snapshot names, keep the
    newest five, schedule the rest for deletion — files that do not
    match the pattern are never candidates (the reference's guard
    against deleting manifests).

    Plan: the listing is object-store-metadata-sized; one window ranks
    conforming names by the embedded timestamp."""
    from pyspark.sql.window import Window

    listing = (
        spark.table("orders")
        .where(F.col("o_orderkey") % 151 == 0)
        .select(
            F.when(
                F.col("o_orderkey") % 9 == 0,
                F.concat(
                    F.lit("manifest_"),
                    F.col("o_orderkey").cast("string"), F.lit(".json"),
                ),
            )
            .otherwise(
                F.concat(
                    F.lit("unpaywall_snapshot_"),
                    F.date_format("o_orderdate", "yyyy-MM-dd"),
                    F.lit("T"),
                    F.lpad((F.col("o_orderkey") % 240000).cast("string"), 6, "0"),
                    F.lit(".jsonl.gz"),
                )
            )
            .alias("file_key")
        )
        .distinct()
    )
    parsed = listing.select(
        "file_key",
        F.regexp_extract(
            "file_key",
            r"unpaywall_snapshot_([0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9]{6})\.jsonl\.gz$",
            1,
        ).alias("snap_ts"),
    )
    w = Window.partitionBy(F.col("snap_ts") != "").orderBy(
        F.col("snap_ts").desc(), F.col("file_key")
    )
    ranked = parsed.withColumn(
        "recency",
        F.when(F.col("snap_ts") != "", F.row_number().over(w)),
    )
    return ranked.select(
        "file_key",
        F.when(F.col("snap_ts") == "", F.lit("not_a_snapshot"))
        .when(F.col("recency") <= 5, F.lit("keep"))
        .otherwise(F.lit("delete"))
        .alias("action"),
    )


# --------------------------------------------------------------------------
# Vector-index sync staging (sync_vector_index.ipynb)
# --------------------------------------------------------------------------
# The reference bulk-loads embeddings + 14 flat filter fields into the
# dedicated kNN index (works-vectors-v1): embeddings JOIN works on the
# work id, a HOF projection flattens authorship arrays into id lists,
# and the staged frame is hash-bucketed into batch_id partitions so an
# interrupted 413M-row full sync resumes per batch from a checkpoint
# table.  DEVIATION (documented): the reference buckets with
# F.abs(F.hash(id)) — Spark's Murmur3, which no oracle engine
# reproduces — so the engine buckets with the Knuth multiplicative
# hash on the numeric work id (same uniformity contract, portable).
# embeddings <- the embeddings fixture; works <- orders; seats <-
# lineitem (author/institution id lists via collect_set, the
# transform/flatten/array_distinct analog).

_VECTOR_BATCHES = 200

_VECTOR_DOCS_SQL = """
WITH works AS (
  SELECT o_orderkey AS work_id,
         CAST(o_orderkey % 30 + 1995 AS INT) AS publication_year,
         CASE WHEN o_orderkey % 3 = 0 THEN 'article' ELSE 'dataset' END AS type,
         o_orderkey % 5 = 0 AS is_oa,
         o_orderkey % 13 = 0 AS is_retracted,
         CAST(o_orderkey % 100 AS BIGINT) AS cited_by_count,
         o_orderkey % 7 > 0 AS has_fulltext
  FROM orders
),
seats AS (
  SELECT l_orderkey AS work_id,
         {sorted_set}concat('A', CAST(l_suppkey AS {stype})){setclose} AS author_ids,
         {sorted_set}concat('I', CAST(l_partkey % 997 AS {stype})){setclose}
           AS institution_ids
  FROM lineitem
  GROUP BY l_orderkey
),
docs AS (
  SELECT concat('https://openalex.org/W', CAST(w.work_id AS {stype})) AS id,
         w.work_id,
         {dims}(e.embedding) AS dims,
         w.publication_year, w.type, w.is_oa, w.is_retracted,
         w.cited_by_count, w.has_fulltext,
         coalesce({asize}(s.author_ids), 0) AS n_authors,
         coalesce({asize}(s.institution_ids), 0) AS n_institutions,
         CAST(((w.work_id % 2147483648) * 2654435761) % 2147483648 AS BIGINT)
           % {batches} AS batch_id
  FROM embeddings e
  JOIN works w ON w.work_id = e.vec_id
  LEFT JOIN seats s ON s.work_id = w.work_id
)
SELECT batch_id,
       count(*) AS n_docs,
       CAST(sum(CAST(dims AS BIGINT)) AS BIGINT) AS sum_dims,
       CAST(sum(cited_by_count) AS BIGINT) AS sum_cited,
       CAST(sum(CAST(n_authors AS BIGINT)) AS BIGINT) AS sum_authors,
       CAST(sum(CAST(n_institutions AS BIGINT)) AS BIGINT) AS sum_institutions,
       count(IF(has_fulltext, 1, NULL)) AS n_fulltext,
       count(IF(is_oa, 1, NULL)) AS n_oa
FROM docs
GROUP BY batch_id
ORDER BY batch_id
"""


@register(
    "es_sync_vector_docs",
    oracle=_VECTOR_DOCS_SQL.format(
        sorted_set="list_sort(list(DISTINCT ",
        setclose="))",
        stype="VARCHAR",
        dims="len",
        asize="len",
        batches=_VECTOR_BATCHES,
    ).replace("IF(has_fulltext, 1, NULL)", "CASE WHEN has_fulltext THEN 1 END")
     .replace("IF(is_oa, 1, NULL)", "CASE WHEN is_oa THEN 1 END"),
    tags=("sink", "serving", "ann"),
    tables=("orders", "lineitem", "embeddings"),
)
def es_sync_vector_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The kNN vector-index staging plan (sync_vector_index.ipynb):
    embeddings JOIN works, flat filter-field projection (year, type,
    OA/retraction flags, authorship id-list sizes), and the
    batch-bucketed staging layout whose per-batch rollup this query
    emits — the resume unit of the reference's checkpointed 413M-row
    full sync.  Bucketing uses the portable Knuth hash instead of
    Spark Murmur3 (documented deviation; same uniformity contract).

    Plan: embeddings side is small (broadcast), the seat rollup is one
    partial-aggregable shuffle, and the batch rollup re-uses the same
    numeric key family — no window, no UDF, no skew."""
    return spark.sql(
        _VECTOR_DOCS_SQL.format(
            sorted_set="sort_array(collect_set(",
            setclose="))",
            stype="STRING",
            dims="size",
            asize="size",
            batches=_VECTOR_BATCHES,
        )
    )


# --------------------------------------------------------------------------
# The "indexes" vocabulary sync (sync_indexes.py)
# --------------------------------------------------------------------------
# The smallest combined entity: a fixed 5-key vocabulary (crossref,
# pubmed, datacite, doaj, arxiv) whose counts come from exploding
# works.indexed_in — CORE-corpus only (is_xpac IS NOT TRUE), because
# expansion works are overwhelmingly datacite-indexed and the doc's
# works_api_url resolves to the core corpus (reference NOTE, oxjob
# #672).  works <- orders: indexed_in gets 1-2 keys by lattice, with
# NULL entries and xpac rows mixed in to exercise both filters.

_INDEXES_VOCAB_SQL = """
WITH works AS (
  SELECT o_orderkey AS id,
         CAST(o_orderkey % 100 AS BIGINT) AS cited_by_count,
         o_orderkey % 13 = 0 AS is_xpac,
         {mkarray} AS indexed_in
  FROM orders
),
exploded AS (
  SELECT DISTINCT w.id, w.cited_by_count, ix.index_key
  FROM works w {explode}
  WHERE ix.index_key IS NOT NULL AND NOT w.is_xpac
),
index_counts AS (
  SELECT index_key, count(*) AS works_count,
         CAST(sum(cited_by_count) AS BIGINT) AS total_citations
  FROM exploded
  GROUP BY index_key
),
vocab AS (
  SELECT * FROM (VALUES
    ('crossref', 'Crossref'), ('pubmed', 'PubMed'),
    ('datacite', 'DataCite'), ('doaj', 'DOAJ'), ('arxiv', 'arXiv')
  ) AS t(vid, display_name)
)
SELECT concat('https://openalex.org/indexes/', v.vid) AS id,
       v.display_name,
       concat('https://api.openalex.org/works?filter=indexed_in:', v.vid)
         AS works_api_url,
       ic.works_count, ic.total_citations AS cited_by_count
FROM vocab v JOIN index_counts ic ON v.vid = ic.index_key
ORDER BY id
"""

_INDEXES_MKARRAY_SPARK = """
array(
  CASE CAST(o_orderkey % 5 AS INT)
    WHEN 0 THEN 'crossref' WHEN 1 THEN 'pubmed' WHEN 2 THEN 'datacite'
    WHEN 3 THEN 'doaj' ELSE 'arxiv' END,
  CASE WHEN o_orderkey % 4 = 0 THEN 'crossref'
       WHEN o_orderkey % 4 = 1 THEN CAST(NULL AS STRING) END)
"""


@register(
    "indexes_api_build",
    oracle=_INDEXES_VOCAB_SQL.format(
        mkarray=_INDEXES_MKARRAY_SPARK.replace("AS STRING", "AS VARCHAR")
                                      .replace("array(", "[", 1)
                                      .replace("END)", "END]"),
        explode=", unnest(w.indexed_in) AS ix(index_key)",
    ),
    tags=("sink", "serving", "aggregate"),
    tables=("orders",),
)
def indexes_api_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The indexes_api table build (sync_indexes.py): explode
    works.indexed_in, DISTINCT (work, key) so multi-listed works count
    once, drop NULL keys and expansion-corpus (is_xpac) rows — the
    core-corpus-only rule the reference pins to the doc's
    works_api_url — then count + sum citations per key and join the
    fixed 5-row vocabulary.  The engine's sync registry carries the
    matching hash-gated 'indexes' row (indexes-v1).

    Plan: explode + DISTINCT collapses map-side before the single
    count shuffle; the vocab join is a 5-row broadcast."""
    return spark.sql(
        _INDEXES_VOCAB_SQL.format(
            mkarray=_INDEXES_MKARRAY_SPARK,
            explode="LATERAL VIEW explode(w.indexed_in) ix AS index_key",
        )
    )


# --------------------------------------------------------------------------
# GPU-endpoint scale plan (serving/rearm_endpoint.py)
# --------------------------------------------------------------------------
# Capacity control for the inference endpoints (oxjob #709): the
# scale-to-zero timer only arms on a capacity-changing redeploy that
# lands on a workload_size config, so the post-run 'rearm' path must
# HOP (min0/max8 first) when the endpoint is already on a
# workload_size, and the pre-run 'up' path is a no-op when the max
# concurrency already matches.  The HTTP PUTs are the network seam;
# what ports is the decision table — evaluated per endpoint over the
# fleet state so the plan is data, not imperative branching.

_REARM_SQL = """
WITH endpoints AS (
  SELECT concat('ep-', CAST(c_custkey AS {t})) AS endpoint,
         CASE WHEN c_custkey % 2 = 0 THEN 'up' ELSE 'rearm' END AS mode,
         CASE CAST(c_custkey % 3 AS INT) WHEN 0 THEN 16 ELSE 4 END
           AS max_concurrency,
         16 AS up_max,
         CASE WHEN c_custkey % 5 = 0 THEN 'Scaled to zero' ELSE 'Ready' END
           AS state_message,
         c_custkey % 3 = 1 AS has_workload_size
  FROM customer
)
SELECT endpoint, mode,
  CASE
    WHEN mode = 'up' AND max_concurrency = up_max THEN 'noop_already_max'
    WHEN mode = 'up' THEN 'scale_up'
    WHEN state_message = 'Scaled to zero' THEN 'noop_already_zero'
    WHEN has_workload_size THEN 'rearm_hop'
    ELSE 'rearm_single'
  END AS action,
  CASE
    WHEN mode = 'up' AND max_concurrency = up_max THEN 0
    WHEN mode = 'up' THEN 1
    WHEN state_message = 'Scaled to zero' THEN 0
    WHEN has_workload_size THEN 2
    ELSE 1
  END AS n_puts
FROM endpoints
"""


@register(
    "serving_rearm_plan",
    oracle=_REARM_SQL.format(t="VARCHAR"),
    tags=("serving", "plan"),
    tables=("customer",),
)
def serving_rearm_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The endpoint scale-management decision table
    (serving/rearm_endpoint.py): 'up' is a no-op at the target max and
    one PUT otherwise; 'rearm' is a no-op when already scaled to zero,
    a two-PUT hop (min0/max8 then workload_size Small) from a
    workload_size config — a single capacity PUT wouldn't re-arm the
    timer — and a single transition otherwise.  Every path must
    produce a plan (the reference's never-fail-the-pipeline rule);
    the PUT execution is the transport seam."""
    return spark.sql(_REARM_SQL.format(t="STRING"))
