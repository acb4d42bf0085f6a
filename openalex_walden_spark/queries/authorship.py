"""The end2end works-authorship plane (reference
``notebooks/end2end/CreateWorkAuthorships.ipynb``,
``notebooks/end2end/PrepareAffiliationStrings.ipynb``).

``work_authorships_rebuild`` is the reference's nightly full-rebuild
centerpiece (oxjob #660): every work's authorship seats re-enriched from
scratch each run so enrichment staleness self-corrects by construction —
no watermark, no change detection, no per-field bolt-ons.  The port
carries its semantics relationally over seat rows (the fixture's storage
model) instead of the reference's map-of-structs ``element_at`` plumbing
(their HOW on nested Delta storage):

* institution enrich with super-system-filtered lineage
  (``CreateWorkAuthorships.ipynb`` cell 4 ``institution_lineage`` /
  ``author_institutions_with_details``): self+ancestors compacted,
  URL-prefixed, sorted; the institution struct list deduped and sorted
  by the URL id string — the reference's exact comparator;
* the ROR normalization CASE (NULL stays NULL, already-prefixed kept,
  bare id prefixed);
* author enrich coalesce ladder (``author_data_enriched``): curated
  openalex_authors beat profile authors for display name, and the
  ORCID CASE is curation-aware (oxjob #410) — an existing curated
  author contributes its orcid EVEN WHEN NULL (override), only
  newly-minted authors fall back to the profile orcid;
* per-(seat, raw-string) affiliation map with deterministically sorted
  institution-URL lists (the nightly-rebuild determinism requirement:
  unsorted lists churn the enriched content hash of unchanged works);
* seat-level countries precedence: institutions' non-empty country
  codes, else raw parsed countries, else empty;
* corresponding-institution guarded single-institution fallback
  (oxjob #517): organic value (institutions of ``is_corresponding``
  seats) wins when present; else the single distinct institution across
  ALL seats — but only when EVERY seat has a non-empty raw affiliation
  string AND a linked institution.  Author-level ids are never guessed
  (we know WHERE, not WHO);
* the distinct institution / country counts (the former
  CreateWorksEnriched computation; country count uses ARRAY_COMPACT
  semantics — NULL codes dropped but empty-string codes COUNTED, unlike
  the countries field's non-empty filter);
* the empty-row branch (oxjob #582): works whose authorships went empty
  keep an all-empty row IF they existed in the previous state (else the
  downstream MERGE would serve stale authorships forever); works new to
  the snapshot with empty authorships are dropped.

Everything nested is rendered as deterministic signature strings (the
``d10_authorship_fusion`` discipline) so one hash checks seat order,
enrich ladders, affiliation attach, and the corresponding fallback at
once.

``affiliation_strings_prepare`` is PrepareAffiliationStrings.ipynb: the
distinct exploded raw-affiliation-string intake as an anti-join MERGE
(the reference deliberately anti-joins the whole lookup instead of an
incremental date filter, to catch strings missed by earlier runs).

Scale: dimensions (institutions, lineage, author profiles) broadcast;
the fact chain shuffles once on (work_id, seat) then folds to work_id —
the second aggregation reuses the first's partitioning prefix.  The
empty branch is a work_id-keyed semi-join.  No UDFs, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openalex_walden_spark.queries.registry import register

# ---------------------------------------------------------------------------
# Fixture arithmetic (identical in both engines)
# ---------------------------------------------------------------------------
# works base       <- orders  %5<4; authorships empty when %11=0
# previous state   <- orders  %5<4 and %3<>1  (empty-branch survival gate)
# seats            <- lineitem l_linenumber<=4, author = supplier
# raw orcid        <- s_suppkey%3=0
# is_corresponding <- seat 1 unless o_orderkey%4=2  (those works -> fallback)
# ras list         <- empty when s_suppkey%13=0; else ['A-k'] (+ 'B-j' when
#                     l_partkey%3=0) with k=2+(l_suppkey%23), j=2+(l_partkey%19)
# 'A-k' matches institution k unless k%6=0 (then raw countries ['Qk']);
# 'B-j' always matches j
# institutions k   <- iso NULL when k%9=0, '' when k%9=5 (compact-vs-filter!),
#                     ror NULL / prefixed / bare by k%5, type by k%3
# lineage of k     <- [k//2, k//4, k//8] filtered to >=2, <> 3 (super-system)
# author_id        <- (s_suppkey%40)+1 unless s_suppkey%7=0 (NULL)
# openalex_authors <- even ids, orcid curated only when %4=0 (else NULL
#                     override); profile authors <- id%3<>1, orcid when %5=0

_SEATS_DUCK = """
  SELECT l_orderkey AS work_id,
         l_linenumber AS seat,
         s_name AS raw_author_name,
         concat('raw:', CAST(s_suppkey AS VARCHAR)) AS raw_author_id,
         CASE WHEN s_suppkey % 3 = 0
              THEN concat('https://orcid.org/0000-', CAST(s_suppkey AS VARCHAR)) END AS raw_orcid,
         (l_linenumber = 1 AND l_orderkey % 4 <> 2) AS is_corresponding,
         CASE WHEN s_suppkey % 13 = 0 THEN []
              WHEN l_partkey % 3 = 0 THEN
                [concat('A-', CAST(2 + (l_suppkey % 23) AS VARCHAR)),
                 concat('B-', CAST(2 + (l_partkey % 19) AS VARCHAR))]
              ELSE [concat('A-', CAST(2 + (l_suppkey % 23) AS VARCHAR))]
         END AS ras_list,
         CASE WHEN s_suppkey % 7 = 0 THEN NULL ELSE (s_suppkey % 40) + 1 END AS author_id
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
  WHERE l_orderkey % 5 < 4 AND l_orderkey % 11 <> 0 AND l_linenumber <= 4
"""

_INST_DUCK = """
  SELECT k,
         concat('Inst ', CAST(k AS VARCHAR)) AS display_name,
         CASE WHEN k % 9 = 0 THEN NULL
              WHEN k % 9 = 5 THEN ''
              ELSE concat(substr('ABCDEFGHIJKLMNOPQRSTUVWXYZ', (k % 26) + 1, 1),
                          substr('ABCDEFGHIJKLMNOPQRSTUVWXYZ', ((k * 7) % 26) + 1, 1))
         END AS iso3166_code,
         CASE WHEN k % 5 = 0 THEN NULL
              WHEN k % 5 = 1 THEN concat('https://ror.org/0', CAST(k AS VARCHAR))
              ELSE concat('0', CAST(k AS VARCHAR)) END AS ror_id,
         CASE k % 3 WHEN 0 THEN 'education' WHEN 1 THEN 'facility'
              ELSE 'government' END AS inst_type,
         list_sort(list_transform(
           list_filter([k, k // 2, k // 4, k // 8],
                       x -> x = k OR (x >= 2 AND x <> 3 AND x < k)),
           x -> concat('https://openalex.org/I', CAST(x AS VARCHAR)))) AS lineage_urls
  FROM (SELECT DISTINCT 2 + (n % 23) AS k FROM range(0, 46) t(n)
        UNION SELECT DISTINCT 2 + (n % 19) FROM range(0, 38) t(n)) ks
"""

# The lineage filter keeps k itself (self is always in the displayed
# lineage) plus strict ancestors >= 2 excluding super-system id 3 —
# the reference's SUPER_SYSTEM_INSTITUTIONS filter applies to ancestors
# only.  Residual duplicates collapse via list_distinct at use time.

_ORACLE_WORK_AUTHORSHIPS = f"""
WITH seats AS ({_SEATS_DUCK}),
inst AS ({_INST_DUCK}),
mv AS (  -- one row per (work, seat, ras): the work_author_affiliations_mv analog
  SELECT s.work_id, s.seat, s.ras_list[t.ordx] AS ras, t.ordx AS ras_ord,
         CAST(substr(s.ras_list[t.ordx], 3) AS BIGINT) AS matched_k,
         (starts_with(s.ras_list[t.ordx], 'A-')
          AND CAST(substr(s.ras_list[t.ordx], 3) AS BIGINT) % 6 = 0) AS unmatched
  FROM seats s, UNNEST(range(1, len(s.ras_list) + 1)) AS t(ordx)
),
mv_inst AS (  -- institution links per MV row (empty when unmatched)
  SELECT work_id, seat, ras, ras_ord,
         CASE WHEN unmatched THEN NULL ELSE matched_k END AS inst_k,
         CASE WHEN unmatched
              THEN [concat('Q', CAST(matched_k AS VARCHAR))] ELSE [] END AS raw_countries
  FROM mv
),
seat_insts AS (  -- distinct institution structs per seat, reference comparator order
  SELECT work_id, seat,
         list_sort(list_distinct(list(concat(
           'I', CAST(i.k AS VARCHAR),
           '@', coalesce(i.iso3166_code, '~'),
           '#', CASE WHEN i.ror_id IS NULL THEN '~'
                     WHEN starts_with(i.ror_id, 'https://ror.org/') THEN i.ror_id
                     ELSE concat('https://ror.org/', i.ror_id) END,
           '%', i.inst_type,
           '^', array_to_string(list_sort(list_distinct(i.lineage_urls)), ',')
         )))) AS inst_sigs,
         list_sort(list_distinct(list(i.k))) AS inst_ks,
         list_sort(list_distinct(list(i.iso3166_code)
           FILTER (WHERE i.iso3166_code IS NOT NULL))) AS inst_isos_compact,
         list_sort(list_distinct(list(i.iso3166_code)
           FILTER (WHERE i.iso3166_code IS NOT NULL AND i.iso3166_code <> ''))) AS inst_countries
  FROM mv_inst m JOIN inst i ON i.k = m.inst_k
  GROUP BY work_id, seat
),
seat_rawc AS (  -- flatten-distinct-sort of raw parsed countries per seat
  SELECT work_id, seat,
         list_sort(list_distinct(flatten(list(raw_countries)))) AS raw_parsed_countries
  FROM mv_inst GROUP BY work_id, seat
),
aff_map AS (  -- per (seat, ras): sorted institution-URL list, original ras order kept
  SELECT work_id, seat, ras, ras_ord,
         list_sort(list(concat('https://openalex.org/I', CAST(inst_k AS VARCHAR)))
                   FILTER (WHERE inst_k IS NOT NULL)) AS inst_urls
  FROM mv_inst GROUP BY work_id, seat, ras, ras_ord
),
seat_affs AS (
  SELECT work_id, seat,
         array_to_string(list_transform(
           list_sort(list(struct_pack(o := ras_ord,
             s := concat(ras, '=>', coalesce(array_to_string(inst_urls, ','), ''))))),
           x -> x.s), ';') AS aff_sig
  FROM aff_map GROUP BY work_id, seat
),
enriched AS (
  SELECT s.work_id, s.seat, s.is_corresponding, s.ras_list,
         CASE WHEN s.author_id IS NOT NULL
              THEN concat('https://openalex.org/A', CAST(s.author_id AS VARCHAR))
              ELSE s.raw_author_id END AS final_author_id,
         coalesce(
           CASE WHEN s.author_id % 2 = 0 THEN concat('OA ', CAST(s.author_id AS VARCHAR)) END,
           CASE WHEN s.author_id % 3 <> 1 THEN concat('PR ', CAST(s.author_id AS VARCHAR)) END,
           s.raw_author_name) AS final_display_name,
         CASE WHEN s.author_id IS NOT NULL THEN
                CASE WHEN s.author_id % 2 = 0  -- curated author exists: its orcid wins even when NULL
                     THEN CASE WHEN s.author_id % 4 = 0
                               THEN concat('https://orcid.org/C-', CAST(s.author_id AS VARCHAR)) END
                     ELSE CASE WHEN s.author_id % 3 <> 1 AND s.author_id % 5 = 0
                               THEN concat('https://orcid.org/P-', CAST(s.author_id AS VARCHAR)) END
                END
              ELSE s.raw_orcid END AS final_orcid,
         coalesce(si.inst_sigs, []) AS inst_sigs,
         coalesce(si.inst_ks, []) AS inst_ks,
         coalesce(si.inst_isos_compact, []) AS inst_isos_compact,
         CASE WHEN si.inst_countries IS NOT NULL AND len(si.inst_countries) > 0
              THEN si.inst_countries
              WHEN sr.raw_parsed_countries IS NOT NULL THEN sr.raw_parsed_countries
              ELSE [] END AS countries,
         coalesce(sa.aff_sig, '') AS aff_sig,
         len(list_filter(s.ras_list, x -> x IS NOT NULL AND x <> '')) = 0 AS missing_ras,
         coalesce(len(si.inst_ks), 0) = 0 AS missing_inst
  FROM seats s
  LEFT JOIN seat_insts si USING (work_id, seat)
  LEFT JOIN seat_rawc sr USING (work_id, seat)
  LEFT JOIN seat_affs sa USING (work_id, seat)
),
per_work AS (
  SELECT work_id,
         count(*) AS authors_count,
         array_to_string(list_transform(list_sort(list(struct_pack(p := seat, s :=
           concat(CAST(seat AS VARCHAR), ':', final_author_id,
                  '|', final_display_name,
                  '|', coalesce(final_orcid, '~'),
                  '|', array_to_string(countries, ','),
                  '|', array_to_string(inst_sigs, ';'),
                  '|', aff_sig)))), x -> x.s), '||') AS authorships_sig,
         coalesce(array_to_string(list_sort(list_distinct(coalesce(
           list(final_author_id) FILTER (WHERE is_corresponding), []))), ','), '')
           AS corresponding_author_ids,
         list_sort(list_distinct(flatten(coalesce(
           list(inst_ks) FILTER (WHERE is_corresponding), [])))) AS organic_corr_inst,
         list_sort(list_distinct(flatten(list(inst_ks)))) AS all_distinct_inst,
         count(*) FILTER (WHERE missing_ras) AS n_missing_ras,
         count(*) FILTER (WHERE missing_inst) AS n_missing_inst,
         len(list_distinct(flatten(list(inst_ks)))) AS institutions_distinct_count,
         len(list_distinct(flatten(list(inst_isos_compact)))) AS countries_distinct_count
  FROM enriched GROUP BY work_id
),
main_branch AS (
  SELECT work_id, CAST(authors_count AS BIGINT) AS authors_count, authorships_sig,
         corresponding_author_ids,
         coalesce(array_to_string(list_transform(
           CASE WHEN len(organic_corr_inst) > 0 THEN organic_corr_inst
                WHEN n_missing_ras = 0 AND n_missing_inst = 0
                     AND len(all_distinct_inst) = 1 THEN all_distinct_inst
                ELSE organic_corr_inst END,
           x -> concat('https://openalex.org/I', CAST(x AS VARCHAR))), ','), '')
           AS corresponding_institution_ids,
         CAST(institutions_distinct_count AS BIGINT) AS institutions_distinct_count,
         CAST(countries_distinct_count AS BIGINT) AS countries_distinct_count
  FROM per_work
),
empty_branch AS (
  SELECT o_orderkey AS work_id, CAST(0 AS BIGINT) AS authors_count,
         '' AS authorships_sig, '' AS corresponding_author_ids,
         '' AS corresponding_institution_ids,
         CAST(0 AS BIGINT) AS institutions_distinct_count,
         CAST(0 AS BIGINT) AS countries_distinct_count
  FROM orders
  WHERE o_orderkey % 5 < 4 AND o_orderkey % 11 = 0
    AND o_orderkey % 3 <> 1          -- existed in the previous state
)
SELECT * FROM main_branch UNION ALL SELECT * FROM empty_branch
ORDER BY work_id
"""


@register(
    "work_authorships_rebuild",
    oracle=_ORACLE_WORK_AUTHORSHIPS,
    tags=("authorship", "domain", "nested"),
    tables=("orders", "lineitem", "supplier"),
)
def work_authorships_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nightly full rebuild of work_authorships
    (CreateWorkAuthorships.ipynb cell 4; see module docstring).

    Plan: institutions / lineage are in-plan generated dims (broadcast);
    the seat chain aggregates (work, seat) -> work so the second shuffle
    reuses the first's key prefix.  Empty branch joins base-to-previous
    on work_id only.
    """
    # --- fixture seats ----------------------------------------------------
    li = spark.table("lineitem").where(
        (F.col("l_orderkey") % 5 < 4)
        & (F.col("l_orderkey") % 11 != 0)
        & (F.col("l_linenumber") <= 4)
    )
    seats = (
        li.join(F.broadcast(spark.table("supplier")), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            F.col("l_orderkey").alias("work_id"),
            F.col("l_linenumber").alias("seat"),
            F.col("s_name").alias("raw_author_name"),
            F.concat(F.lit("raw:"), F.col("s_suppkey").cast("string")).alias("raw_author_id"),
            F.when(
                F.col("s_suppkey") % 3 == 0,
                F.concat(F.lit("https://orcid.org/0000-"), F.col("s_suppkey").cast("string")),
            ).alias("raw_orcid"),
            ((F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 4 != 2)).alias(
                "is_corresponding"
            ),
            F.expr(
                """CASE WHEN s_suppkey % 13 = 0 THEN array()
                        WHEN l_partkey % 3 = 0 THEN array(
                          concat('A-', CAST(2 + (l_suppkey % 23) AS STRING)),
                          concat('B-', CAST(2 + (l_partkey % 19) AS STRING)))
                        ELSE array(concat('A-', CAST(2 + (l_suppkey % 23) AS STRING)))
                   END"""
            ).alias("ras_list"),
            F.when(F.col("s_suppkey") % 7 != 0, (F.col("s_suppkey") % 40) + 1).alias(
                "author_id"
            ),
        )
    )

    # --- institution dim (in-plan, broadcast) -----------------------------
    inst = (
        spark.range(0, 46)
        .select((2 + (F.col("id") % 23)).alias("k"))
        .unionByName(spark.range(0, 38).select((2 + (F.col("id") % 19)).alias("k")))
        .distinct()
        .select(
            "k",
            F.concat(F.lit("Inst "), F.col("k").cast("string")).alias("display_name"),
            F.expr(
                """CASE WHEN k % 9 = 0 THEN NULL
                        WHEN k % 9 = 5 THEN ''
                        ELSE concat(substr('ABCDEFGHIJKLMNOPQRSTUVWXYZ', CAST(k % 26 AS INT) + 1, 1),
                                    substr('ABCDEFGHIJKLMNOPQRSTUVWXYZ', CAST((k * 7) % 26 AS INT) + 1, 1))
                   END"""
            ).alias("iso3166_code"),
            F.expr(
                """CASE WHEN k % 5 = 0 THEN NULL
                        WHEN k % 5 = 1 THEN concat('https://ror.org/0', CAST(k AS STRING))
                        ELSE concat('0', CAST(k AS STRING)) END"""
            ).alias("ror_id"),
            F.expr(
                "CASE CAST(k % 3 AS INT) WHEN 0 THEN 'education' WHEN 1 THEN 'facility'"
                " ELSE 'government' END"
            ).alias("inst_type"),
            F.expr(
                """array_sort(transform(
                     filter(array(k, k div 2, k div 4, k div 8),
                            x -> x = k OR (x >= 2 AND x <> 3 AND x < k)),
                     x -> concat('https://openalex.org/I', CAST(x AS STRING))))"""
            ).alias("lineage_urls"),
        )
    )

    # --- MV analog: one row per (work, seat, ras) -------------------------
    mv = seats.select(
        "work_id",
        "seat",
        F.posexplode("ras_list").alias("ord0", "ras"),
    ).select(
        "work_id",
        "seat",
        (F.col("ord0") + 1).alias("ord"),
        "ras",
        F.expr("CAST(substr(ras, 3) AS BIGINT)").alias("matched_k0"),
        F.expr("startswith(ras, 'A-') AND CAST(substr(ras, 3) AS BIGINT) % 6 = 0").alias(
            "unmatched"
        ),
    )
    mv_inst = mv.select(
        "work_id",
        "seat",
        "ras",
        "ord",
        F.when(~F.col("unmatched"), F.col("matched_k0")).alias("inst_k"),
        F.when(
            F.col("unmatched"),
            F.array(F.concat(F.lit("Q"), F.col("matched_k0").cast("string"))),
        )
        .otherwise(F.expr("array()"))
        .alias("raw_countries"),
    )

    ror_norm = (
        "CASE WHEN ror_id IS NULL THEN '~' "
        "WHEN startswith(ror_id, 'https://ror.org/') THEN ror_id "
        "ELSE concat('https://ror.org/', ror_id) END"
    )
    inst_sig = F.expr(
        f"""concat('I', CAST(k AS STRING),
                   '@', coalesce(iso3166_code, '~'),
                   '#', {ror_norm},
                   '%', inst_type,
                   '^', array_join(array_sort(array_distinct(lineage_urls)), ','))"""
    )
    seat_insts = (
        mv_inst.join(F.broadcast(inst), F.col("k") == F.col("inst_k"))
        .withColumn("sig", inst_sig)
        .groupBy("work_id", "seat")
        .agg(
            F.array_sort(F.array_distinct(F.collect_list("sig"))).alias("inst_sigs"),
            F.array_sort(F.array_distinct(F.collect_list("k"))).alias("inst_ks"),
            F.array_sort(
                F.array_distinct(
                    F.collect_list(F.when(F.col("iso3166_code").isNotNull(), F.col("iso3166_code")))
                )
            ).alias("inst_isos_compact"),
            F.array_sort(
                F.array_distinct(
                    F.collect_list(
                        F.when(
                            F.col("iso3166_code").isNotNull() & (F.col("iso3166_code") != ""),
                            F.col("iso3166_code"),
                        )
                    )
                )
            ).alias("inst_countries"),
        )
    )
    seat_rawc = mv_inst.groupBy("work_id", "seat").agg(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("raw_countries")))).alias(
            "raw_parsed_countries"
        )
    )
    aff_map = mv_inst.groupBy("work_id", "seat", "ras", "ord").agg(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("inst_k").isNotNull(),
                    F.concat(F.lit("https://openalex.org/I"), F.col("inst_k").cast("string")),
                )
            )
        ).alias("inst_urls")
    )
    seat_affs = (
        aff_map.withColumn(
            "entry",
            F.struct(
                F.col("ord").alias("o"),
                F.concat(
                    F.col("ras"), F.lit("=>"), F.coalesce(F.array_join("inst_urls", ","), F.lit(""))
                ).alias("s"),
            ),
        )
        .groupBy("work_id", "seat")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("entry")), lambda x: x.getField("s")), ";"
            ).alias("aff_sig")
        )
    )

    # --- author enrich ladder (authors dims are arithmetic on author_id) --
    a = F.col("author_id")
    curated_display = F.when(a % 2 == 0, F.concat(F.lit("OA "), a.cast("string")))
    profile_display = F.when(a % 3 != 1, F.concat(F.lit("PR "), a.cast("string")))
    curated_orcid = F.when(a % 4 == 0, F.concat(F.lit("https://orcid.org/C-"), a.cast("string")))
    profile_orcid = F.when(
        (a % 3 != 1) & (a % 5 == 0), F.concat(F.lit("https://orcid.org/P-"), a.cast("string"))
    )
    enriched = (
        seats.join(seat_insts, ["work_id", "seat"], "left")
        .join(seat_rawc, ["work_id", "seat"], "left")
        .join(seat_affs, ["work_id", "seat"], "left")
        .select(
            "work_id",
            "seat",
            "is_corresponding",
            F.when(
                a.isNotNull(),
                F.concat(F.lit("https://openalex.org/A"), a.cast("string")),
            )
            .otherwise(F.col("raw_author_id"))
            .alias("final_author_id"),
            F.coalesce(curated_display, profile_display, F.col("raw_author_name")).alias(
                "final_display_name"
            ),
            F.when(
                a.isNotNull(),
                # curation-aware (oxjob #410): curated author's orcid wins even when NULL
                F.when(a % 2 == 0, curated_orcid).otherwise(profile_orcid),
            )
            .otherwise(F.col("raw_orcid"))
            .alias("final_orcid"),
            F.coalesce(F.col("inst_sigs"), F.expr("array()")).alias("inst_sigs"),
            F.coalesce(F.col("inst_ks"), F.expr("array()")).alias("inst_ks"),
            F.coalesce(F.col("inst_isos_compact"), F.expr("array()")).alias("inst_isos_compact"),
            F.when(
                F.size(F.coalesce(F.col("inst_countries"), F.expr("array()"))) > 0,
                F.col("inst_countries"),
            )
            .otherwise(F.coalesce(F.col("raw_parsed_countries"), F.expr("array()")))
            .alias("countries"),
            F.coalesce(F.col("aff_sig"), F.lit("")).alias("aff_sig"),
            (F.size(F.expr("filter(ras_list, x -> x IS NOT NULL AND x <> '')")) == 0).alias(
                "missing_ras"
            ),
            (F.size(F.coalesce(F.col("inst_ks"), F.expr("array()"))) == 0).alias("missing_inst"),
        )
    )

    seat_sig = F.concat(
        F.col("seat").cast("string"),
        F.lit(":"),
        F.col("final_author_id"),
        F.lit("|"),
        F.col("final_display_name"),
        F.lit("|"),
        F.coalesce(F.col("final_orcid"), F.lit("~")),
        F.lit("|"),
        F.array_join("countries", ","),
        F.lit("|"),
        F.array_join("inst_sigs", ";"),
        F.lit("|"),
        F.col("aff_sig"),
    )
    per_work = (
        enriched.withColumn("entry", F.struct(F.col("seat").alias("p"), seat_sig.alias("s")))
        .groupBy("work_id")
        .agg(
            F.count("*").cast("long").alias("authors_count"),
            F.array_join(
                F.transform(F.array_sort(F.collect_list("entry")), lambda x: x.getField("s")),
                "||",
            ).alias("authorships_sig"),
            F.array_join(
                F.array_sort(
                    F.array_distinct(
                        F.collect_list(F.when(F.col("is_corresponding"), F.col("final_author_id")))
                    )
                ),
                ",",
            ).alias("corresponding_author_ids"),
            F.array_sort(
                F.array_distinct(
                    F.flatten(
                        F.collect_list(
                            F.when(F.col("is_corresponding"), F.col("inst_ks")).otherwise(
                                F.expr("array()")
                            )
                        )
                    )
                )
            ).alias("organic_corr_inst"),
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("inst_ks")))).alias(
                "all_distinct_inst"
            ),
            F.count_if(F.col("missing_ras")).alias("n_missing_ras"),
            F.count_if(F.col("missing_inst")).alias("n_missing_inst"),
            F.size(F.array_distinct(F.flatten(F.collect_list("inst_ks"))))
            .cast("long")
            .alias("institutions_distinct_count"),
            F.size(F.array_distinct(F.flatten(F.collect_list("inst_isos_compact"))))
            .cast("long")
            .alias("countries_distinct_count"),
        )
    )
    main_branch = per_work.select(
        "work_id",
        "authors_count",
        "authorships_sig",
        "corresponding_author_ids",
        F.array_join(
            F.transform(
                F.when(F.size("organic_corr_inst") > 0, F.col("organic_corr_inst"))
                .when(
                    (F.col("n_missing_ras") == 0)
                    & (F.col("n_missing_inst") == 0)
                    & (F.size("all_distinct_inst") == 1),
                    F.col("all_distinct_inst"),
                )
                .otherwise(F.col("organic_corr_inst")),
                lambda x: F.concat(F.lit("https://openalex.org/I"), x.cast("string")),
            ),
            ",",
        ).alias("corresponding_institution_ids"),
        "institutions_distinct_count",
        "countries_distinct_count",
    )
    empty_branch = (
        spark.table("orders")
        .where(
            (F.col("o_orderkey") % 5 < 4)
            & (F.col("o_orderkey") % 11 == 0)
            & (F.col("o_orderkey") % 3 != 1)
        )
        .select(
            F.col("o_orderkey").alias("work_id"),
            F.lit(0).cast("long").alias("authors_count"),
            F.lit("").alias("authorships_sig"),
            F.lit("").alias("corresponding_author_ids"),
            F.lit("").alias("corresponding_institution_ids"),
            F.lit(0).cast("long").alias("institutions_distinct_count"),
            F.lit(0).cast("long").alias("countries_distinct_count"),
        )
    )
    return main_branch.unionByName(empty_branch).orderBy("work_id")


# ---------------------------------------------------------------------------
# PrepareAffiliationStrings.ipynb: anti-join MERGE intake
# ---------------------------------------------------------------------------
# existing lookup <- strings 'A-k' for even k (already known); the intake
# must surface every distinct exploded string not in the lookup — the
# reference's anti-join-not-watermark design decision verbatim.

_ORACLE_AFF_PREPARE = f"""
WITH seats AS ({_SEATS_DUCK}),
exploded AS (
  SELECT DISTINCT r.ras AS raw_affiliation_string
  FROM seats s, UNNEST(s.ras_list) AS r(ras)
  WHERE r.ras IS NOT NULL AND r.ras <> ''
),
lookup AS (
  SELECT concat('A-', CAST(k AS VARCHAR)) AS raw_affiliation_string
  FROM (SELECT DISTINCT 2 + (n % 23) AS k FROM range(0, 46) t(n)) ks WHERE k % 2 = 0
)
SELECT e.raw_affiliation_string
FROM exploded e
LEFT JOIN lookup l ON l.raw_affiliation_string = e.raw_affiliation_string
WHERE l.raw_affiliation_string IS NULL
ORDER BY e.raw_affiliation_string
"""


@register(
    "affiliation_strings_prepare",
    oracle=_ORACLE_AFF_PREPARE,
    tags=("authorship", "antijoin"),
    tables=("lineitem", "supplier"),
)
def affiliation_strings_prepare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-affiliation-string intake (PrepareAffiliationStrings.ipynb).

    DISTINCT exploded strings anti-joined against the lookup — the
    reference deliberately anti-joins the full lookup instead of a
    watermark so strings missed by any earlier run are caught.  The
    distinct collapses the fan-in BEFORE the anti-join (map-side partial
    aggregation), so the join probes unique strings, not seat rows.
    """
    li = spark.table("lineitem").where(
        (F.col("l_orderkey") % 5 < 4)
        & (F.col("l_orderkey") % 11 != 0)
        & (F.col("l_linenumber") <= 4)
    )
    exploded = (
        li.join(F.broadcast(spark.table("supplier")), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            F.explode(
                F.expr(
                    """CASE WHEN s_suppkey % 13 = 0 THEN array()
                            WHEN l_partkey % 3 = 0 THEN array(
                              concat('A-', CAST(2 + (l_suppkey % 23) AS STRING)),
                              concat('B-', CAST(2 + (l_partkey % 19) AS STRING)))
                            ELSE array(concat('A-', CAST(2 + (l_suppkey % 23) AS STRING)))
                       END"""
                )
            ).alias("raw_affiliation_string")
        )
        .where(F.col("raw_affiliation_string").isNotNull() & (F.col("raw_affiliation_string") != ""))
        .distinct()
    )
    lookup = (
        spark.range(0, 46)
        .select((2 + (F.col("id") % 23)).alias("k"))
        .distinct()
        .where(F.col("k") % 2 == 0)
        .select(F.concat(F.lit("A-"), F.col("k").cast("string")).alias("raw_affiliation_string"))
    )
    return exploded.join(
        F.broadcast(lookup), "raw_affiliation_string", "left_anti"
    ).orderBy("raw_affiliation_string")


# ---------------------------------------------------------------------------
# CreateAuthorNames.ipynb: deterministic Latin name parser + match keys
# ---------------------------------------------------------------------------
# The parse pipeline lives in functions/nameparse.py (see its docstring
# for the rule-by-rule reference mapping and deviations).  The fixture
# decorates pooled name pieces with the reference's hard cases: glued
# digits, comma form, titles (dr./dra./prof. dr.), credentials,
# generational suffixes, middle initials, particles (single and
# two-token), id_orcid decorations, parenthesized nicknames, org
# strings, et-al tails, surname-first initials, hyphenated doubles.

# Reusable DuckDB mirror of functions/nameparse.py: a CTE chain that
# expects a CTE named ``raws`` with a ``raw_name`` column (extra columns
# pass through) and ends in ``s13`` carrying first_name/middle_name/
# last_name inputs plus the flags.  Other modules (authornames.py)
# reuse it to parse their own candidate strings.
DUCK_PARSE_CHAIN = r"""
s1 AS (
  SELECT r.*,
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(trim(raw_name), '[''’‘ʼ]', '', 'g'),
                  '(?i);?\s*id_orcid\s+[\d-]+', '', 'g'),
                '(\w)\d+([,\s])', '\1\2', 'g'),
              '(\w)\d+$', '\1', 'g'),
            '-\s+', '-', 'g'),
          '\s+-', '-', 'g'),
        '(^\s*-\s*|\s*-\s*$)', '', 'g'),
      '\s+', ' ', 'g')) AS n1
  FROM raws r
),
s2 AS (
  SELECT s1.*,
    lower(regexp_extract(n1, '[\(\[]([^\)\]]*)[\)\]]', 1)) AS nickname,
    trim(regexp_replace(regexp_replace(n1, '\s*[\(\[][^\)\]]*[\)\]]', ' ', 'g'), '\s+', ' ', 'g')) AS n2
  FROM s1
),
s3 AS (
  SELECT s2.* EXCLUDE (n1),
    regexp_matches(lower(n2), '(?:institute|university|ministry|society|department|academy|foundation|laboratory|council|committee|association|center|centre)') AS is_org,
    trim(regexp_replace(n2, '(?i)\bet\s+al\.?\s*$', '', 'g')) AS n3
  FROM s2
),
s4 AS (
  SELECT *, lower(regexp_extract(n3, '(?i)^(prof\.?\s+dr\.?|prof\.?|dra\.?|dr\.?|ir\.?|ing\.?)\s+', 1)) AS title_raw,
    trim(regexp_replace(n3, '(?i)^(prof\.?\s+dr\.?|prof\.?|dra\.?|dr\.?|ir\.?|ing\.?)\s+', '', 'g')) AS n4
  FROM s3
),
s5 AS (
  SELECT *, CASE WHEN regexp_matches(title_raw, '(?i)^prof\.?\s+dr\.?$') THEN 'prof. dr.'
                 WHEN title_raw = '' THEN ''
                 ELSE concat(regexp_replace(title_raw, '\.', '', 'g'), '.') END AS title0,
    lower(regexp_extract(n4, '(?i),?\s+(jr\.?|junior|sr\.?|iii|iv|ii|esq\.?)\s*$', 1)) AS gen1,
    trim(regexp_replace(n4, '(?i),?\s+(jr\.?|junior|sr\.?|iii|iv|ii|esq\.?)\s*$', '', 'g')) AS n5
  FROM s4
),
s6 AS (
  SELECT *, trim(regexp_replace(regexp_replace(n5,
      '(?i)[,\s]\s*(?:phd|md|msc|mph|dvm|frcp|facs|mbbs|pharmd|jd|llm|rn|facp)\.?\s*$', '', 'g'),
      '(?i)[,\s]\s*(?:phd|md|msc|mph|dvm|frcp|facs|mbbs|pharmd|jd|llm|rn|facp)\.?\s*$', '', 'g')) AS n6
  FROM s5
),
s7 AS (
  SELECT *, lower(regexp_extract(n6, '(?i),?\s+(jr\.?|junior|sr\.?|iii|iv|ii|esq\.?)\s*$', 1)) AS gen2,
    trim(regexp_replace(
      CASE WHEN gen1 = '' THEN trim(regexp_replace(n6, '(?i),?\s+(jr\.?|junior|sr\.?|iii|iv|ii|esq\.?)\s*$', '', 'g')) ELSE n6 END,
      ',\s*$', '', 'g')) AS n7
  FROM s6
),
s8 AS (
  SELECT *, CASE WHEN gen1 <> '' THEN gen1 ELSE gen2 END AS suffix0,
    lower(n7) AS nl,
    contains(n7, ',') AS has_comma,
    regexp_matches(n7, '^[A-Za-z][A-Za-z\-]+\s+[A-Z]{2}$') AS is_sfi,
    NOT contains(n7, ' ') AS one_token
  FROM s7
),
s9 AS (
  SELECT *,
    trim(regexp_extract(nl, '^([^,]*),', 1)) AS c_last,
    trim(regexp_extract(nl, '^[^,]*,\s*(.*)$', 1)) AS c_rest,
    regexp_extract(nl, '^(\S+)\s', 1) AS sfi_last,
    regexp_extract(nl, '\s(\w)\w$', 1) AS sfi_first,
    regexp_extract(nl, '\s\w(\w)$', 1) AS sfi_middle,
    regexp_extract(nl, '^(\S+)', 1) AS g_first,
    trim(regexp_extract(nl, '^\S+\s+(.*)$', 1)) AS g_rest
  FROM s8
),
s10 AS (
  SELECT *,
    regexp_extract(c_rest, '^(\S+)', 1) AS c_first,
    trim(regexp_extract(c_rest, '^\S+\s+(.*)$', 1)) AS c_middle,
    regexp_extract(concat(' ', g_rest), '\s((?:(?:(?i:de|del|della|di|da|das|do|dos|van|von|der|den|het|la|le|les|el|al|bin|ibn|abu)|e|i)\s+){0,3}\S+)$', 1) AS g_last0,
    trim(regexp_replace(concat(' ', g_rest), '\s((?:(?:(?i:de|del|della|di|da|das|do|dos|van|von|der|den|het|la|le|les|el|al|bin|ibn|abu)|e|i)\s+){0,3}\S+)$', '', 'g')) AS g_middle
  FROM s9
),
s11 AS (
  SELECT *,
    CASE WHEN g_rest <> '' AND g_last0 = '' THEN g_rest ELSE g_last0 END AS g_last,
    CASE WHEN is_org OR one_token THEN ''
         WHEN has_comma THEN c_first
         WHEN is_sfi THEN sfi_first
         ELSE g_first END AS first_name,
    CASE WHEN is_org OR one_token THEN ''
         WHEN has_comma THEN c_middle
         WHEN is_sfi THEN sfi_middle
         ELSE g_middle END AS middle_name
  FROM s10
),
s12 AS (
  SELECT *,
    CASE WHEN is_org THEN regexp_replace(nl, '\s*,\s*', ' ', 'g')
         WHEN one_token THEN nl
         WHEN has_comma THEN c_last
         WHEN is_sfi THEN sfi_last
         ELSE g_last END AS last_pre
  FROM s11
),
s13 AS (
  SELECT *,
    CASE WHEN regexp_matches(last_pre, '^(?i:de la|de las|de los|van de|van der|van den)\s+\S')
         THEN regexp_replace(last_pre, '^(?i:de la|de las|de los|van de|van der|van den)\s+', '', 'g')
         WHEN regexp_matches(last_pre, '^(?i:de|da|do|dos|das|del|van|von|zu)\s+\S')
         THEN regexp_replace(last_pre, '^(?i:de|da|do|dos|das|del|van|von|zu)\s+', '', 'g')
         ELSE last_pre END AS last_name
  FROM s12
)
"""

# Final projection producing the parsed/match-key columns from the chain
DUCK_PARSE_FINAL = r"""
final AS (
  SELECT k AS author_key, raw_name,
    CASE WHEN is_org THEN '' ELSE title0 END AS title,
    first_name, middle_name, last_name,
    CASE WHEN is_org THEN '' ELSE suffix0 END AS suffix,
    nickname,
    regexp_replace(last_name, '[^a-z]', '', 'g') AS match_last,
    substr(regexp_replace(first_name, '[^a-z]', '', 'g'), 1, 1) AS match_first,
    concat(regexp_replace(last_name, '[^a-z]', '', 'g'), ';',
           substr(regexp_replace(first_name, '[^a-z]', '', 'g'), 1, 1)) AS match_key
  FROM s13

"""

_NAMES_ORACLE = (
    r"""
WITH sup AS (SELECT DISTINCT s_suppkey AS k FROM supplier),
pieces AS (
  SELECT k, k % 14 AS m,
    (['james','maria','wei','olga','john','fatima','hans','ana','pierre','yuki','carlos','ingrid','david','chen','laura','ahmed','eva','marco','nina','paul'])[(k % 20) + 1] AS fn,
    (['smith','oliveira','berg','zhang','garcia','muller','rossi','kim','dubois','tanaka','silva','jansen','brown','wang','lopez','haddad','novak','ricci','petrov','meyer'])[((k // 3) % 20) + 1] AS ln,
    (['lee','ray','kai','jo'])[((k // 7) % 4) + 1] AS mn
  FROM sup
),
caps AS (
  SELECT k, m,
    concat(upper(substr(fn, 1, 1)), substr(fn, 2)) AS cf,
    concat(upper(substr(ln, 1, 1)), substr(ln, 2)) AS cl,
    concat(upper(substr(mn, 1, 1)), substr(mn, 2)) AS cm
  FROM pieces
),
raws AS (
  SELECT k, CASE m
    WHEN 0 THEN concat(cf, ' ', cl, CASE WHEN k % 2 = 0 THEN '7' ELSE '' END)
    WHEN 1 THEN concat(cl, ', ', cf)
    WHEN 2 THEN concat(CASE WHEN k % 2 = 1 THEN 'Dra. ' ELSE 'Dr. ' END, cf, ' van der ', cl)
    WHEN 3 THEN concat(cf, ' de ', cl, ', PhD')
    WHEN 4 THEN concat('Prof. Dr. ', cf, ' ', cl, ' Jr.')
    WHEN 5 THEN concat(cl, ', ', cf, ' M.')
    WHEN 6 THEN concat(cf, ' ', cm, ' ', cl, ', MD, MSc')
    WHEN 7 THEN concat(cf, ' dos ', cl)
    WHEN 8 THEN concat(cf, ' de la ', cl, ' id_orcid 0000-0001')
    WHEN 9 THEN concat(cf, ' (Jim) ', cl)
    WHEN 10 THEN concat('University of ', cl, ' Department')
    WHEN 11 THEN concat(cf, ' ', cl, ' et al.')
    WHEN 12 THEN concat(cl, ' JA')
    ELSE concat(cf, '-Marie ', cl, '-Sarkar')
  END AS raw_name
  FROM caps
),
"""
    + DUCK_PARSE_CHAIN + "," + DUCK_PARSE_FINAL
    + ") SELECT * FROM final ORDER BY author_key"
)



@register(
    "author_names_parse",
    oracle=_NAMES_ORACLE,
    tags=("authorship", "text", "regex"),
    tables=("supplier",),
)
def author_names_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic author-name parse + oxjob #608 match keys
    (CreateAuthorNames.ipynb cells 4/9 via functions/nameparse.py).

    The whole parse is JVM-side regex column algebra — zero UDFs, so at
    100 TB it rides whole-stage codegen with no Python boundary; the
    reference's Pandas-UDF parser pays an Arrow hop per batch for the
    same deterministic rules.  The oracle replays every step in DuckDB
    (RE2), which forces the patterns to stay lookaround-free and
    engine-portable.
    """
    from openalex_walden_spark.functions.nameparse import parse_author_name

    firsts = (
        "'james','maria','wei','olga','john','fatima','hans','ana','pierre','yuki',"
        "'carlos','ingrid','david','chen','laura','ahmed','eva','marco','nina','paul'"
    )
    lasts = (
        "'smith','oliveira','berg','zhang','garcia','muller','rossi','kim','dubois','tanaka',"
        "'silva','jansen','brown','wang','lopez','haddad','novak','ricci','petrov','meyer'"
    )
    mids = "'lee','ray','kai','jo'"
    cap = lambda x: f"concat(upper(substr({x}, 1, 1)), substr({x}, 2))"  # noqa: E731
    base = (
        spark.table("supplier")
        .select(F.col("s_suppkey").alias("k"))
        .distinct()
        .selectExpr(
            "k",
            "CAST(k % 14 AS INT) AS m",
            f"{cap(f'element_at(array({firsts}), CAST(k % 20 AS INT) + 1)')} AS cf",
            f"{cap(f'element_at(array({lasts}), CAST((k div 3) % 20 AS INT) + 1)')} AS cl",
            f"{cap(f'element_at(array({mids}), CAST((k div 7) % 4 AS INT) + 1)')} AS cm",
        )
        .selectExpr(
            "k",
            """CASE m
                 WHEN 0 THEN concat(cf, ' ', cl, CASE WHEN k % 2 = 0 THEN '7' ELSE '' END)
                 WHEN 1 THEN concat(cl, ', ', cf)
                 WHEN 2 THEN concat(CASE WHEN k % 2 = 1 THEN 'Dra. ' ELSE 'Dr. ' END, cf, ' van der ', cl)
                 WHEN 3 THEN concat(cf, ' de ', cl, ', PhD')
                 WHEN 4 THEN concat('Prof. Dr. ', cf, ' ', cl, ' Jr.')
                 WHEN 5 THEN concat(cl, ', ', cf, ' M.')
                 WHEN 6 THEN concat(cf, ' ', cm, ' ', cl, ', MD, MSc')
                 WHEN 7 THEN concat(cf, ' dos ', cl)
                 WHEN 8 THEN concat(cf, ' de la ', cl, ' id_orcid 0000-0001')
                 WHEN 9 THEN concat(cf, ' (Jim) ', cl)
                 WHEN 10 THEN concat('University of ', cl, ' Department')
                 WHEN 11 THEN concat(cf, ' ', cl, ' et al.')
                 WHEN 12 THEN concat(cl, ' JA')
                 ELSE concat(cf, '-Marie ', cl, '-Sarkar')
               END AS raw_name""",
        )
    )
    parsed = parse_author_name(F.col("raw_name"))
    return base.select(
        F.col("k").alias("author_key"),
        "raw_name",
        parsed["title"].alias("title"),
        parsed["first"].alias("first_name"),
        parsed["middle"].alias("middle_name"),
        parsed["last"].alias("last_name"),
        parsed["suffix"].alias("suffix"),
        parsed["nickname"].alias("nickname"),
        parsed["match_last"].alias("match_last"),
        parsed["match_first"].alias("match_first"),
        parsed["match_key"].alias("match_key"),
    ).orderBy("author_key")
