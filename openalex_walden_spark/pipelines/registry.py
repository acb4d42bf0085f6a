"""The reference's job DAGs as data (``jobs/*.yaml`` — 70 Databricks
job specs).  The orchestration layer is plain metadata in the
reference; here it is a typed registry plus the two pieces of logic an
engine actually needs from it:

* ``validate`` — every dependency names a defined task, and the graph
  is acyclic (Kahn);
* ``execution_waves`` — topological layering: wave N holds every task
  whose dependencies all completed by wave N-1.  This is exactly the
  parallelism the reference's scheduler extracts from ``depends_on``.

Each task carries a ``capability`` pointer into THIS repo — the query
or library module that implements the task's work — so the registry
doubles as the switching map: a reference operator team can read off,
task by task, what replaces each notebook.  ``partial:`` marks tasks
whose core transform is ported but whose deployment shell (DLT plumbing,
external services) is environment-specific.

Ported DAGs: the nightly end-to-end works pipeline
(``jobs/walden_end2end.yaml``, 39 tasks — dependency edges verbatim),
the authors maintenance job (``jobs/authors.yaml``), the topics and
SDG inference jobs (classifier scale-up/re-arm as the documented
deployment seams), and the daily metrics and weekly data-feed jobs.
The remaining YAMLs are single-task or linear wrappers around the same
notebooks.

Scale note: waves are the unit of cluster parallelism — tasks in one
wave share no lineage, so at 1000 executors each wave saturates the
cluster independently.  The end2end DAG's width (wave of 8 after
Works_Base) is the reference's real fan-out.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Task:
    name: str
    deps: tuple[str, ...] = ()
    capability: str = ""


@dataclass(frozen=True)
class Pipeline:
    name: str
    schedule: str  # quartz cron from the job yaml
    tasks: tuple[Task, ...] = field(default_factory=tuple)


def _t(name: str, deps: tuple[str, ...], cap: str) -> Task:
    return Task(name=name, deps=deps, capability=cap)


END2END = Pipeline(
    name="walden_end2end",
    schedule="0 0 4 * * ?",
    tasks=(
        _t("Crossref_Ingest_DLT", (), "query:crossref_parse_ingest"),
        _t("DataCite_Ingest_DLT", (), "partial:query:locations_source_match"),
        _t("Parseland", (), "query:parseland_reparse_resolve"),
        _t("Landing_Page_Ingest_DLT", ("Parseland",), "partial:lib:sources/files.py"),
        _t("PDF_Ingest_DLT", (), "query:p12_tei_extract"),
        _t("PubMed_Ingest_DLT", (), "query:pubmed_parse_ingest"),
        _t("Repos_Ingest_DLT", (), "query:d7_ingest_type_resolution"),
        _t(
            "Union",
            (
                "Crossref_Ingest_DLT", "PubMed_Ingest_DLT", "Repos_Ingest_DLT",
                "PDF_Ingest_DLT", "DataCite_Ingest_DLT", "Landing_Page_Ingest_DLT",
            ),
            "query:u1_conform_union",
        ),
        _t("Crossref_Super_Authorships", ("Union",), "query:d10_authorship_fusion"),
        _t("Repo_Super_Authorships", ("Union",), "query:repo_super_authorships"),
        _t("Sources_Snapshot", (), "query:s6_export_sources_shape"),
        _t(
            "Superlocations",
            ("Repo_Super_Authorships", "Crossref_Super_Authorships", "Sources_Snapshot"),
            "partial:query:d1_priority_merge",
        ),
        _t(
            "Locations_with_Sources",
            ("Superlocations", "Sources_Snapshot"),
            "query:locations_source_match",
        ),
        _t("Locations_with_Types", ("Locations_with_Sources",), "query:d7_reference_cascade"),
        _t("Locations_Mapped", ("Locations_with_Types",), "partial:query:p7_merge_key"),
        _t("Apply_Location_Curations", ("Locations_Mapped",), "query:location_curations_apply"),
        _t("Works_Base", ("Apply_Location_Curations",), "query:d0_works_build"),
        _t("parse_referenced_works", ("Works_Base",), "query:d8_reference_resolution"),
        _t("Works_Fulltext", ("Works_Base",), "query:fulltext_work_build"),
        _t("Parsed_Author_Names", ("Works_Base",), "query:author_names_parse"),
        _t("Prepare_Affiliation_Strings", ("Works_Base",), "query:affiliation_strings_prepare"),
        _t("Sync_RAS_Curations", ("Works_Base",), "lib:sinks/sync_registry.py"),
        _t("Sync_Work_Author_Curations", ("Works_Base",), "lib:sinks/sync_registry.py"),
        _t(
            "Institutions_Frontfill",
            ("Prepare_Affiliation_Strings", "Sync_RAS_Curations"),
            "partial:query:j8_blocking_fuzzy_match",
        ),
        _t("SDG_Frontfill", ("Works_Base",), "partial:query:s8_model_inference"),
        _t("Topics", ("Works_Base",), "query:topics_merge_output"),
        _t("Concepts", ("Works_Base",), "query:concepts_keywords_dynamic"),
        _t(
            "Author_Affiliations",
            ("Parsed_Author_Names", "Institutions_Frontfill", "Sync_Work_Author_Curations"),
            "partial:query:work_authorships_rebuild",
        ),
        _t("Author_Matching", ("Author_Affiliations", "Topics"), "query:d6_and_cascade"),
        _t(
            "Apply_Work_Author_Curations",
            ("Author_Matching", "Sync_Work_Author_Curations"),
            "query:work_author_curations_apply",
        ),
        _t("Authorships", ("Apply_Work_Author_Curations",), "query:work_authorships_rebuild"),
        _t(
            "Works_Enriched",
            (
                "Authorships", "SDG_Frontfill", "Concepts", "Works_Fulltext",
                "parse_referenced_works",
            ),
            "partial:query:j9_merge_scd1_batch",
        ),
        _t("Optimize_Works_Enriched", ("Works_Enriched",), "query:layout_zorder_stats"),
        _t("Guardrails", ("Optimize_Works_Enriched",), "lib:operators/guardrails.py"),
        _t("Full_Snapshot", ("Guardrails",), "query:s6_json_export_shape"),
        _t("Sync_to_Elasticsearch", ("Guardrails",), "lib:sinks/sync_registry.py"),
        _t("Sync_Works_to_Lakebase", ("Guardrails",), "query:serving_sharded_doc_maintenance"),
        _t("Refresh_RAS_Counts", ("Guardrails",), "query:ras_counts_refresh"),
        _t(
            "Sync_RAS_to_Elasticsearch",
            ("Refresh_RAS_Counts", "Sync_to_Elasticsearch"),
            "lib:sinks/sync_registry.py",
        ),
    ),
)

AUTHORS = Pipeline(
    name="authors",
    schedule="36 0 12 * * ?",
    tasks=(
        _t("Sync_Author_Name_Curations", (), "lib:sinks/sync_registry.py"),
        _t(
            "Apply_Author_Name_Curations",
            ("Sync_Author_Name_Curations",),
            "query:author_name_curations_diff",
        ),
        _t(
            "Update_Author_Full_Names",
            ("Sync_Author_Name_Curations",),
            "query:author_full_names_update",
        ),
        _t("Sync_Author_Orcid_Curations", (), "lib:sinks/sync_registry.py"),
        _t(
            "Apply_Author_Orcid_Curations",
            ("Sync_Author_Orcid_Curations",),
            "partial:query:author_name_curations_diff",
        ),
        _t(
            "Create_Authors",
            (
                "Apply_Author_Name_Curations", "Update_Author_Full_Names",
                "Apply_Author_Orcid_Curations",
            ),
            "query:d11_entity_aggregates",
        ),
    ),
)

DAILY_METRICS = Pipeline(
    name="works_daily_metrics",
    schedule="0 30 6 * * ?",
    tasks=(
        _t("Works_Daily_Metrics", (), "query:metrics_works_daily_tall"),
        _t(
            "Authorship_Daily_Metrics",
            (),
            "query:metrics_authorship_change_events",
        ),
    ),
)

WUNPAYWALL_FEED = Pipeline(
    name="wunpaywall_weekly_data_feed",
    schedule="0 0 8 ? * MON",
    tasks=(
        _t("Create_Wunpaywall", (), "query:wunpaywall_build"),
        _t("Data_Feed", ("Create_Wunpaywall",), "query:d9_changed_rows_feed"),
    ),
)

TOPICS = Pipeline(
    name="topics",
    schedule="0 15 2 * * ?",
    tasks=(
        _t("topics_create_input", (), "partial:query:concepts_input_gate"),
        _t("scale_up_topic_classifier", (), "partial:lib:functions/llm.py"),
        _t(
            "topics_inference",
            ("topics_create_input", "scale_up_topic_classifier"),
            "query:s8_model_inference",
        ),
        _t("rearm_topic_classifier", ("topics_inference",), "partial:lib:functions/llm.py"),
        _t("topics_merge_output", ("topics_inference",), "query:topics_merge_output"),
    ),
)

SDG_FRONTFILL = Pipeline(
    name="sdg_frontfill",
    schedule="0 45 3 * * ?",
    tasks=(
        _t("sdg_frontfill_input", (), "query:sdg_input_gate"),
        _t("sdg_inference_frontfill", ("sdg_frontfill_input",), "partial:query:s8_model_inference"),
        _t("rearm_sdg_classifier", ("sdg_inference_frontfill",), "partial:lib:functions/llm.py"),
    ),
)

# The per-funder award-scraper fan-out (jobs/create_funder_sourced_awards
# .yaml): 312 tasks, 308 independent scraper roots feeding the
# Create_Awards consolidation barrier, the Crossref/DataCite insert
# chains, and the Work_Awards tail — generated data, see
# funder_awards_tasks.py.
from openalex_walden_spark.pipelines.funder_awards_tasks import (  # noqa: E402
    FUNDER_AWARD_TASKS,
)

FUNDER_AWARDS = Pipeline(
    name="create_funder_sourced_awards",
    schedule="manual",  # run on demand; the yaml carries no trigger
    tasks=tuple(
        Task(name=n, deps=d, capability=cap)
        for n, d, _nb, cap in FUNDER_AWARD_TASKS
    ),
)

# jobs/snapshot_full.yaml: the 11 entity exports fan out, update_meta
# barriers on ALL of them, smoke_tests gate sync_to_public.
SNAPSHOT_FULL = Pipeline(
    name="snapshot_full",
    schedule="manual",
    tasks=(
        _t("export_works", (), "query:s6_json_export_shape"),
        _t("export_authors", (), "query:s6_export_authors_shape"),
        _t("export_publishers", (), "query:s6_export_publishers_shape"),
        _t("export_institutions", (), "query:s6_export_institutions_shape"),
        _t("export_sources", (), "query:s6_export_sources_shape"),
        _t("export_topic_hierarchy", (), "query:s6_export_topic_hierarchy_shape"),
        _t("export_funders", (), "query:s6_export_funders_shape"),
        _t("export_awards", (), "query:s6_export_awards_shape"),
        _t("export_keywords", (), "query:s6_export_keywords_shape"),
        _t("export_concepts", (), "query:s6_export_concepts_shape"),
        _t("export_common_entities", (), "query:s6_export_common_entities"),
        _t("update_meta", ("export_works", "export_authors",
                           "export_publishers", "export_institutions",
                           "export_sources", "export_topic_hierarchy",
                           "export_funders", "export_awards",
                           "export_keywords", "export_concepts",
                           "export_common_entities"),
           "lib:sinks/json_export.py"),
        _t("smoke_tests", ("update_meta",), "lib:operators/smoke.py"),
        _t("sync_to_public", ("smoke_tests",), "lib:sinks/json_export.py"),
    ),
)

# jobs/institutions.yaml / concepts.yaml / award_topics.yaml: the three
# small chains (ROR sync, concepts inference, award-topics inference).
INSTITUTIONS = Pipeline(
    name="institutions",
    schedule="0 0 2 * * ?",
    tasks=(
        _t("create_update_institutions", (), "query:institutions_from_ror_sync"),
        _t("ror_derived_tables", ("create_update_institutions",),
           "query:ror_derived_tables"),
        _t("institution_ancestors", ("ror_derived_tables",),
           "query:institution_ancestors_lineage"),
    ),
)

CONCEPTS = Pipeline(
    name="concepts",
    schedule="manual",
    tasks=(
        _t("concepts_create_input", (), "query:concepts_input_gate"),
        _t("concepts_inference", ("concepts_create_input",),
           "query:s8_model_inference"),
        _t("concepts_merge_output", ("concepts_inference",),
           "query:topics_merge_output"),
    ),
)

AWARD_TOPICS = Pipeline(
    name="award_topics",
    schedule="manual",
    tasks=(
        _t("award_topics_create_input", (), "query:topics_inference_frontier"),
        _t("award_topics_inference", ("award_topics_create_input",),
           "query:s8_model_inference"),
        _t("award_topics_merge_output", ("award_topics_inference",),
           "query:topics_merge_output"),
    ),
)

PIPELINES: dict[str, Pipeline] = {
    p.name: p
    for p in (END2END, AUTHORS, DAILY_METRICS, WUNPAYWALL_FEED, TOPICS,
              SDG_FRONTFILL, FUNDER_AWARDS, SNAPSHOT_FULL, INSTITUTIONS,
              CONCEPTS, AWARD_TOPICS)
}


def validate(p: Pipeline) -> None:
    """Raise ValueError on an undefined dependency or a cycle."""
    names = {t.name for t in p.tasks}
    if len(names) != len(p.tasks):
        raise ValueError(f"{p.name}: duplicate task names")
    for t in p.tasks:
        missing = [d for d in t.deps if d not in names]
        if missing:
            raise ValueError(f"{p.name}.{t.name}: undefined deps {missing}")
    execution_waves(p)  # raises on cycles


def execution_waves(p: Pipeline) -> list[list[str]]:
    """Kahn layering: wave N = tasks whose deps all finished by N-1."""
    remaining = {t.name: set(t.deps) for t in p.tasks}
    waves: list[list[str]] = []
    while remaining:
        ready = sorted(n for n, d in remaining.items() if not d)
        if not ready:
            raise ValueError(f"{p.name}: dependency cycle among {sorted(remaining)}")
        waves.append(ready)
        for n in ready:
            del remaining[n]
        for d in remaining.values():
            d.difference_update(ready)
    return waves


def critical_path(p: Pipeline) -> list[str]:
    """Longest dependency chain (each task weight 1)."""
    tasks = {t.name: t for t in p.tasks}
    memo: dict[str, list[str]] = {}

    def chain(n: str) -> list[str]:
        if n not in memo:
            best: list[str] = []
            for d in tasks[n].deps:
                c = chain(d)
                if len(c) > len(best):
                    best = c
            memo[n] = best + [n]
        return memo[n]

    return max((chain(t.name) for t in p.tasks), key=len)
