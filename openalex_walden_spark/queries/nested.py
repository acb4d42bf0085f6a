"""The nested walden data plane end-to-end (SURVEY.md §7.2 M0's
flagship): two overlapping synthetic "sources" → conform to the nested
works schema (P1/U1/U3) → merge-key (P7) → provenance-priority field
fusion (D1) → authorship pick (D10) → one works row per key.

Plus P12: TEI-XML field extraction through a pandas UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from openalex_walden_spark.queries.registry import register

# --------------------------------------------------------------------------
# D0: works build
# --------------------------------------------------------------------------
# Work universe = orders. Source "crossref" (priority 1) covers every
# work: original-case title, doi for key%3<>0, license, up to 3 authors
# from its lineitems' part names (empty for key%9=0 — forcing D10 to
# fall back). Source "repo" (priority 2) covers even keys only:
# UPPERCASE title (same normalized key!), same doi, a version, exactly
# one author. Fusion must take title/license from crossref, version from
# repo, and authors from the first source that actually has any.
# The merge-key title normalization must match textops/P3 exactly.
_STOP = "the|a|an|of|to|in|for|on|by|with|at|from"


def _duck_norm_title(expr: str) -> str:
    # Keep-class is letters only — the reference's remove_everything_
    # but_alphas (normalize.py:147-150) drops digits, so the synthesized
    # title spells the work key in letters (translate below) to keep
    # per-work title keys distinct.
    return (
        f"regexp_replace(regexp_replace(lower({expr}), "
        f"'\\b({_STOP})\\b', ' ', 'g'), '[^a-z]+', '', 'g')"
    )


_D0_SQL = f"""
WITH names AS (
  SELECT l_orderkey, p_name,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber, l_partkey) AS rn
  FROM lineitem JOIN part ON p_partkey = l_partkey
),
first3 AS (
  SELECT l_orderkey,
         COUNT(*) AS n_names,
         MAX(CASE WHEN rn = 1 THEN p_name END) AS name1
  FROM names WHERE rn <= 3
  GROUP BY l_orderkey
),
works AS (
  SELECT o.o_orderkey AS k,
         CASE WHEN o.o_orderkey % 3 <> 0
              THEN '10.1000/w' || o.o_orderkey::VARCHAR END AS doi,
         'Study of ' || o.o_orderpriority || ' order '
           || translate(o.o_orderkey::VARCHAR, '0123456789', 'abcdefghij') AS title,
         f.n_names, f.name1
  FROM orders o JOIN first3 f ON f.l_orderkey = o.o_orderkey
)
SELECT
  COALESCE(doi, 'ta:' || {_duck_norm_title('title')}) AS merge_key,
  (1 + CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_locations,
  title AS title,
  'cc-by' AS license,
  CASE WHEN k % 2 = 0 THEN 'submittedVersion' END AS version,
  (CASE WHEN k % 9 <> 0 THEN least(n_names, 3)
        WHEN k % 2 = 0 THEN 1
        ELSE 0 END)::BIGINT AS n_authors,
  CASE WHEN k % 9 <> 0 OR k % 2 = 0
       THEN lower(list_extract(string_split(name1, ' '), -1)) END AS first_author_family
FROM works
"""


@register("d0_works_build", oracle=_D0_SQL, tags=("nested", "D0", "D1", "D10", "P1", "P7", "U1"), tables=("orders", "lineitem", "part"))
def d0_works_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The M0 flagship: two sources → conform(WALDEN_WORKS_SCHEMA) →
    unionByName → merge_key → per-key provenance-priority fusion.

    Every device is the real one: the nested authors array rides through
    conform() (P1) with typed NULL-fill, the union is schema-aligned by
    construction (U1/U3), the merge key falls back doi → title_author
    (P7, with the SAME title normalization as textops/P3 so different-
    case titles from different sources still merge), and the per-field
    fold picks the best non-null value by priority (D1) while authors
    take the first NON-EMPTY array (D10) — fields can come from
    different sources in one fused row.

    Scale: one shuffle on merge_key; sources conform/union map-side.
    """
    from openalex_walden_spark.conform import conform_union
    from openalex_walden_spark.functions.normalize import normalize_title
    from openalex_walden_spark.schemas import WALDEN_WORKS_SCHEMA

    li = spark.table("lineitem")
    part = spark.table("part")
    orders = spark.table("orders")

    names = (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_orderkey")
        .agg(
            F.transform(
                F.slice(
                    F.array_sort(
                        F.collect_list(F.struct("l_linenumber", "l_partkey", "p_name"))
                    ),
                    1,
                    3,
                ),
                lambda s: F.struct(
                    F.element_at(F.split(s.getField("p_name"), " "), 1).alias("given"),
                    F.element_at(F.split(s.getField("p_name"), " "), -1).alias("family"),
                    s.getField("p_name").alias("name"),
                ),
            ).alias("authors3")
        )
    )
    base = orders.join(names, F.col("l_orderkey") == F.col("o_orderkey"))
    k = F.col("o_orderkey")
    doi = F.when(k % 3 != 0, F.concat(F.lit("10.1000/w"), k.cast("string")))
    # The key rides in the title as LETTERS (digits are dropped by the
    # reference's alpha-only normalization) so title keys stay distinct.
    title = F.concat(
        F.lit("Study of "),
        F.col("o_orderpriority"),
        F.lit(" order "),
        F.translate(k.cast("string"), "0123456789", "abcdefghij"),
    )

    # Both sources derive from the SAME upstream aggregate (`names`).
    # A plain two-frame union would instantiate that heavy subplan
    # twice (DataFrame DAGs lower to trees; exchange reuse does not
    # bridge union branches with differing downstream filters — the
    # measured plan aggregated lineitem⋈part twice). Exploding a
    # provenance selector computes it ONCE and emits 1-2 source rows
    # per work; per-source field values are CASE on provenance. When
    # sources are genuinely distinct upstreams (the reference's real
    # topology), conform_union of separate frames is the right device —
    # that path is oracle-checked by u1_conform_union.
    prov = F.explode(
        F.when(
            k % 2 == 0, F.array(F.lit("crossref"), F.lit("repo"))
        ).otherwise(F.array(F.lit("crossref")))
    ).alias("provenance")
    rows = base.select(prov, "*")
    is_cr = F.col("provenance") == "crossref"
    empty_authors = F.expr("array()").cast(base.schema["authors3"].dataType)
    source_rows = rows.select(
        "provenance",
        F.when(is_cr, F.concat(F.lit("cr-"), k.cast("string")))
        .otherwise(F.concat(F.lit("oai-"), k.cast("string")))
        .alias("native_id"),
        F.when(is_cr, title).otherwise(F.upper(title)).alias("title"),
        doi.alias("_doi"),
        F.when(is_cr, F.lit("cc-by")).alias("license"),
        F.when(~is_cr, F.lit("submittedVersion")).alias("version"),
        F.when(
            is_cr, F.when(k % 9 != 0, F.col("authors3")).otherwise(empty_authors)
        )
        .otherwise(F.slice(F.col("authors3"), 1, 1))
        .alias("authors"),
    ).withColumn(
        "ids",
        F.array(
            F.struct(
                F.col("_doi").alias("id"),
                F.lit("doi").alias("namespace"),
                F.lit(None).cast("string").alias("relationship"),
            )
        ),
    ).drop("_doi")

    # P1: through the fixed-schema boundary (typed NULL-fill for the
    # fields either source lacks).
    unioned = conform_union([source_rows], WALDEN_WORKS_SCHEMA)

    # P7 merge key: doi (from the ids array, the reference's open-
    # namespace trick) else normalized-title fallback.
    doi_from_ids = F.expr("try_element_at(filter(ids, x -> x.namespace = 'doi'), 1).id")
    keyed = unioned.withColumn(
        "mk",
        F.coalesce(
            doi_from_ids, F.concat(F.lit("ta:"), normalize_title(F.col("title"))),
        ),
    ).withColumn(
        "priority", F.when(F.col("provenance") == "crossref", 1).otherwise(2)
    )

    rows = F.array_sort(
        F.collect_list(
            F.struct("priority", "provenance", "title", "license", "version", "authors")
        )
    )
    fused = keyed.groupBy(F.col("mk").alias("merge_key")).agg(
        F.count("*").alias("n_locations"), rows.alias("rows")
    )
    first_with = lambda field: F.expr(  # noqa: E731
        f"try_element_at(filter(rows, r -> r.{field} is not null), 1).{field}"
    )
    best_authors = F.expr(
        "try_element_at(filter(rows, r -> size(r.authors) > 0), 1).authors"
    )
    return fused.select(
        "merge_key",
        F.col("n_locations").cast("bigint"),
        first_with("title").alias("title"),
        first_with("license").alias("license"),
        first_with("version").alias("version"),
        F.coalesce(F.size(best_authors), F.lit(0)).cast("bigint").alias("n_authors"),
        F.lower(F.try_element_at(best_authors, F.lit(1)).getField("family")).alias("first_author_family"),
    )


# --------------------------------------------------------------------------
# P12: TEI-XML field extraction (pandas UDF)
# --------------------------------------------------------------------------
_P12_SQL = """
WITH tei AS (
  SELECT doc_id,
         '<TEI><titleStmt><title>Doc ' || doc_id::VARCHAR || '</title></titleStmt>'
         || '<author><persName>Author' || (doc_id % 7)::VARCHAR || '</persName></author>'
         || '<abstract>' || substr(text, 1, 40) || '</abstract></TEI>' AS xml
  FROM documents WHERE doc_id < 200
)
SELECT doc_id,
       regexp_extract(xml, '<title>([^<]*)</title>', 1) AS title,
       regexp_extract(xml, '<persName>([^<]*)</persName>', 1) AS author,
       length(regexp_extract(xml, '<abstract>([^<]*)</abstract>', 1))::BIGINT AS abstract_len
FROM tei
"""


@register("p12_tei_extract", oracle=_P12_SQL, tags=("udf", "P12"), tables=("documents",))
def p12_tei_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROBID TEI-XML field extraction (P12): per-row XML parsed in an
    Arrow-batched pandas UDF with a real parser (xml.etree — the
    reference uses lxml, PDF.py:92-334), not regex. The oracle regexes
    the same fields out of the deliberately-simple synthesized TEI.

    Documents whose text contains XML-significant characters would break
    naive regex extraction but not the parser — the synthesis keeps the
    corpus clean so both agree."""
    from openalex_walden_spark.deploy import ensure_shipped
    from openalex_walden_spark.functions.udfs import TEI_SCHEMA, tei_extract_batch

    ensure_shipped(spark)
    d = spark.table("documents").where(F.col("doc_id") < 200)
    xml = F.concat(
        F.lit("<TEI><titleStmt><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title></titleStmt><author><persName>Author"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("</persName></author><abstract>"),
        F.substring("text", 1, 40),
        F.lit("</abstract></TEI>"),
    )
    return d.select("doc_id", xml.alias("xml")).mapInPandas(
        tei_extract_batch, TEI_SCHEMA
    )


# --------------------------------------------------------------------------
# D0-enriched: the CreateWorksEnriched plane end-to-end in one DAG
# --------------------------------------------------------------------------
_ENRICHED_SQL = """
WITH works AS (
  SELECT p_partkey AS work_id,
         1992 + p_partkey % 7 AS pub_year,
         p_type AS cohort
  FROM part
),
edges AS (
  SELECT l_partkey AS work_id,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
counts AS (
  SELECT work_id, count(*) AS cited_by_count FROM edges GROUP BY work_id
),
cby AS (
  SELECT work_id,
         string_agg(yr || ':' || cnt, ',' ORDER BY yr) AS counts_by_year
  FROM (SELECT work_id, yr, count(*) AS cnt FROM edges
        WHERE yr >= 1996 GROUP BY work_id, yr)
  GROUP BY work_id
),
win3 AS (
  SELECT w.work_id,
         sum(CASE WHEN e.yr BETWEEN w.pub_year AND w.pub_year + 3
                  THEN 1 ELSE 0 END)::BIGINT AS cnt_3yr
  FROM works w JOIN edges e ON e.work_id = w.work_id
  GROUP BY w.work_id
),
base AS (
  SELECT w.work_id, w.pub_year, w.cohort,
         coalesce(c.cited_by_count, 0)::BIGINT AS cited_by_count,
         cb.counts_by_year,
         coalesce(t.cnt_3yr, 0)::BIGINT AS cnt_3yr
  FROM works w
  LEFT JOIN counts c ON w.work_id = c.work_id
  LEFT JOIN cby cb ON w.work_id = cb.work_id
  LEFT JOIN win3 t ON w.work_id = t.work_id
)
SELECT work_id, pub_year, cohort, cited_by_count, counts_by_year, cnt_3yr,
       CASE WHEN sum(cnt_3yr) OVER coh > 0
            THEN (cnt_3yr * count(*) OVER coh)::DOUBLE
                   / sum(cnt_3yr) OVER coh::DOUBLE END AS fwci,
       percent_rank() OVER
         (PARTITION BY pub_year, cohort
          ORDER BY cited_by_count ASC, work_id ASC) AS citation_percentile
FROM base
WINDOW coh AS (PARTITION BY pub_year, cohort)
"""


@register(
    "d0_works_enriched",
    oracle=_ENRICHED_SQL,
    tags=("nested", "D5", "J6", "J11", "W3", "W4", "flagship"),
    tables=("part", "lineitem", "orders"),
)
def d0_works_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CreateWorksEnriched plane (cells 5-11) as ONE DAG: citation
    edges (J11 explode shape) → cited_by_count (A1) → counts_by_year
    time series (D5) → 3-year citation window (J6 as equi-join +
    conditional sum) → FWCI vs the (pub_year, cohort) mean (W4, single
    exact division: cnt·n/sum) → cohort percentile with totalized
    ordering (W3).

    Scale: edges shuffle once on work_id and every aggregate reuses that
    key; cohort stats are windows over the already-small per-work frame,
    not a second pass over edges. The reference runs this nightly over
    3.7B reference rows — this is the plan shape that survives it.
    """
    works = spark.table("part").select(
        F.col("p_partkey").alias("work_id"),
        (F.lit(1992) + F.col("p_partkey") % 7).alias("pub_year"),
        F.col("p_type").alias("cohort"),
    )
    edges = (
        spark.table("lineitem")
        .join(spark.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("l_partkey").alias("work_id"),
            F.year("o_orderdate").cast("long").alias("yr"),
        )
    )
    # r14 optimization (guide §2.3/§2.4): the previous shape executed
    # the lineitem⋈orders edge join THREE times (counts / cby / win3
    # branches — a DataFrame DAG lowers to a tree) and then three-way
    # left-joined the three aggregates back onto works.  All three
    # signals are aggregates at work grain over the same (work_id, yr)
    # pre-aggregate, so: reduce edges ONCE to per-(work, year) counts
    # (partial map-side agg shrinks the exchange), attach pub_year with
    # one join, and fold all three signals in ONE aggregate —
    # cited_by_count = sum(cnt); counts_by_year = the >=1996 slice
    # (collect_list skips the NULLs the when() leaves, and nullif
    # restores the NULL the old left join produced for works with no
    # >=1996 citations); cnt_3yr = the conditional sum at year grain.
    e2 = edges.groupBy("work_id", "yr").agg(F.count("*").alias("cnt"))
    per_work = (
        e2.join(works.select("work_id", "pub_year"), "work_id")
        .groupBy("work_id")
        .agg(
            F.sum("cnt").cast("long").alias("cited_by_count"),
            F.nullif(
                F.concat_ws(
                    ",",
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("yr") >= 1996,
                                F.concat_ws(":", F.col("yr"), F.col("cnt")),
                            )
                        )
                    ),
                ),
                F.lit(""),
            ).alias("counts_by_year"),
            F.sum(
                F.when(
                    F.col("yr").between(F.col("pub_year"), F.col("pub_year") + 3),
                    F.col("cnt"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("cnt_3yr"),
        )
    )
    base = (
        works.join(per_work, "work_id", "left")
        .select(
            "work_id",
            "pub_year",
            "cohort",
            F.coalesce("cited_by_count", F.lit(0)).cast("long").alias("cited_by_count"),
            "counts_by_year",
            F.coalesce("cnt_3yr", F.lit(0)).cast("long").alias("cnt_3yr"),
        )
    )
    coh = Window.partitionBy("pub_year", "cohort")
    rank_w = Window.partitionBy("pub_year", "cohort").orderBy(
        F.col("cited_by_count").asc(), F.col("work_id").asc()
    )
    sum3 = F.sum("cnt_3yr").over(coh)
    n_coh = F.count("*").over(coh)
    return base.select(
        "work_id",
        "pub_year",
        "cohort",
        "cited_by_count",
        "counts_by_year",
        "cnt_3yr",
        F.when(
            sum3 > 0,
            (F.col("cnt_3yr") * n_coh).cast("double") / sum3.cast("double"),
        ).alias("fwci"),
        F.percent_rank().over(rank_w).alias("citation_percentile"),
    )


# --------------------------------------------------------------------------
# Work-fulltext plane: key extraction -> longest-raw-wins -> clean -> match
# --------------------------------------------------------------------------
# The reference precomputes work fulltext from crawled PDFs
# (notebooks/end2end/CreateWorkFulltext.ipynb): each PDF contributes one
# KEY (its DOI url when present, else its OAI-PMH id), the longest RAW
# text per key wins, the winner is cleaned (200K-char cap, HTML-tag
# strip, whitespace squash, trim), and works match keys DOI-first with
# raw-length tie-breaks.  The incremental MERGE layers around this are
# the repo's existing operators/merge.py + s4 shapes; this query is the
# semantic core those merges maintain.  The reference breaks raw-length
# ties with XXHASH64(fulltext); here the tie-break is doc_id — same
# "deterministic total order" purpose, engine-portable.
_FULLTEXT_SQL = r"""
WITH pdfs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0
              THEN concat('<p class="body">', text, '</p> <div>end</div>')
              ELSE text END AS fulltext,
         CASE WHEN doc_id % 3 <> 2
              THEN concat('10.1234/d', CAST(doc_id % 40 AS VARCHAR)) END AS doi,
         CASE WHEN doc_id % 3 = 2
              THEN concat('oai:repo:', CAST(doc_id % 30 AS VARCHAR)) END AS pmh
  FROM documents
),
keyed AS (
  SELECT 'doi' AS key_type, concat('https://doi.org/', lower(doi)) AS key,
         fulltext, doc_id
  FROM pdfs WHERE doi IS NOT NULL
  UNION ALL
  SELECT 'pmh', pmh, fulltext, doc_id
  FROM pdfs WHERE pmh IS NOT NULL AND doi IS NULL
),
winners AS (
  SELECT key_type, key, fulltext, length(fulltext) AS raw_length,
         row_number() OVER (PARTITION BY key_type, key
                            ORDER BY length(fulltext) DESC, doc_id ASC) AS rn
  FROM keyed
),
keys_tbl AS (
  SELECT key_type, key, raw_length,
         trim(regexp_replace(regexp_replace(
           substr(fulltext, 1, 200000), '<[^>]+>', ' ', 'g'),
           '\s+', ' ', 'g')) AS fulltext
  FROM winners WHERE rn = 1
),
works AS (
  SELECT o_orderkey AS work_id,
         CASE WHEN o_orderkey % 2 = 0
              THEN concat('https://doi.org/10.1234/D',
                          CAST(o_orderkey % 40 AS VARCHAR)) END AS doi,
         CASE WHEN o_orderkey % 5 IN (1, 3)
              THEN concat('oai:repo:', CAST(o_orderkey % 30 AS VARCHAR)) END AS pmh_id
  FROM orders
),
doi_matches AS (
  SELECT w.work_id, k.key_type, k.key, k.raw_length, 1 AS priority
  FROM works w JOIN keys_tbl k
    ON k.key_type = 'doi' AND k.key = lower(w.doi)
),
pmh_matches AS (
  SELECT w.work_id, k.key_type, k.key, k.raw_length, 2 AS priority
  FROM works w JOIN keys_tbl k
    ON k.key_type = 'pmh' AND k.key = w.pmh_id
),
best AS (
  SELECT work_id, key_type, key, raw_length,
         row_number() OVER (PARTITION BY work_id
                            ORDER BY priority ASC, raw_length DESC, key ASC) AS rn
  FROM (SELECT * FROM doi_matches UNION ALL SELECT * FROM pmh_matches)
)
SELECT b.work_id, b.key_type AS match_type, b.key, b.raw_length,
       length(k.fulltext) AS fulltext_length,
       substr(k.fulltext, 1, 60) AS preview
FROM best b
JOIN keys_tbl k ON k.key_type = b.key_type AND k.key = b.key
WHERE b.rn = 1
"""


@register(
    "fulltext_work_build",
    oracle=_FULLTEXT_SQL,
    tags=("domain", "fulltext", "nested"),
    tables=("documents", "orders"),
)
def fulltext_work_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The work-fulltext plane (CreateWorkFulltext.ipynb cells 5-9):
    DOI-else-PMH key extraction, longest-raw-text-wins per key, the
    200K-cap + HTML-strip + whitespace-squash clean, and DOI-first
    work matching with (priority, raw_length DESC, key) tie-breaks.

    Scale shape: keys aggregate on (key_type, key) — one shuffle of
    (key, length) pairs where only the per-key winner carries its text
    forward; the work match is two equi-joins against the slim key
    table (the reference's 'slim keys first, bytes only for changed
    rows' design), and the bytes join happens once, after the winner
    per work is known."""
    docs = spark.table("documents")
    pdfs = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit('<p class="body">'), F.col("text"), F.lit("</p> <div>end</div>")),
        )
        .otherwise(F.col("text"))
        .alias("fulltext"),
        F.when(
            F.col("doc_id") % 3 != 2,
            F.concat(F.lit("10.1234/d"), (F.col("doc_id") % 40).cast("string")),
        ).alias("doi"),
        F.when(
            F.col("doc_id") % 3 == 2,
            F.concat(F.lit("oai:repo:"), (F.col("doc_id") % 30).cast("string")),
        ).alias("pmh"),
    )
    keyed = (
        pdfs.where(F.col("doi").isNotNull())
        .select(
            F.lit("doi").alias("key_type"),
            F.concat(F.lit("https://doi.org/"), F.lower("doi")).alias("key"),
            "fulltext",
            "doc_id",
        )
        .unionByName(
            pdfs.where(F.col("pmh").isNotNull() & F.col("doi").isNull()).select(
                F.lit("pmh").alias("key_type"),
                F.col("pmh").alias("key"),
                "fulltext",
                "doc_id",
            )
        )
    )
    wk = Window.partitionBy("key_type", "key").orderBy(
        F.length("fulltext").desc(), F.col("doc_id").asc()
    )
    from openalex_walden_spark.operators.guardrails import persist_scalar

    # The key table feeds THREE consumers (doi slim join, pmh slim join,
    # final bytes join) — persist it so the clean+window build runs once
    # (all-scalar columns, so the memory-cliff guard admits it; the same
    # pattern as the BM25 posting list).
    keys_tbl = persist_scalar(
        keyed.withColumn("raw_length", F.length("fulltext").cast("bigint"))
        .withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") == 1)
        .select(
            "key_type",
            "key",
            "raw_length",
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(
                        F.substring("fulltext", 1, 200000), "<[^>]+>", " "
                    ),
                    r"\s+",
                    " ",
                )
            ).alias("fulltext"),
        )
    )
    works = spark.table("orders").select(
        F.col("o_orderkey").alias("work_id"),
        F.when(
            F.col("o_orderkey") % 2 == 0,
            F.concat(
                F.lit("https://doi.org/10.1234/D"),
                (F.col("o_orderkey") % 40).cast("string"),
            ),
        ).alias("doi"),
        F.when(
            (F.col("o_orderkey") % 5).isin(1, 3),
            F.concat(F.lit("oai:repo:"), (F.col("o_orderkey") % 30).cast("string")),
        ).alias("pmh_id"),
    )
    slim = keys_tbl.select("key_type", "key", "raw_length")
    doi_m = works.join(
        F.broadcast(slim.where(F.col("key_type") == "doi")),
        F.col("key") == F.lower("doi"),
    ).select("work_id", "key_type", "key", "raw_length", F.lit(1).alias("priority"))
    pmh_m = works.join(
        F.broadcast(slim.where(F.col("key_type") == "pmh")),
        F.col("key") == F.col("pmh_id"),
    ).select("work_id", "key_type", "key", "raw_length", F.lit(2).alias("priority"))
    wb = Window.partitionBy("work_id").orderBy(
        F.col("priority").asc(), F.col("raw_length").desc(), F.col("key").asc()
    )
    best = (
        doi_m.unionByName(pmh_m)
        .withColumn("rn", F.row_number().over(wb))
        .where(F.col("rn") == 1)
        .select("work_id", F.col("key_type").alias("match_type"), "key", "raw_length")
    )
    return best.join(
        F.broadcast(keys_tbl.select("key_type", "key", "fulltext")),
        (F.col("key_type") == F.col("match_type")) & (keys_tbl.key == best.key),
    ).select(
        "work_id",
        "match_type",
        best.key.alias("key"),
        "raw_length",
        F.length("fulltext").cast("bigint").alias("fulltext_length"),
        F.substring("fulltext", 1, 60).alias("preview"),
    )
