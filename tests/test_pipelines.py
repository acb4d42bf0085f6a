"""Pipeline registry contracts (reference jobs/*.yaml).

The DAGs are data; these tests pin (a) graph hygiene, (b) the wave
layering the scheduler would extract, and (c) that every ``query:``
capability pointer names a REAL catalog query — the registry is the
switching map, so a dangling pointer is a broken promise.
"""

from __future__ import annotations

from openalex_walden_spark.pipelines import PIPELINES, execution_waves, validate
from openalex_walden_spark.pipelines.registry import END2END, critical_path


def test_all_pipelines_validate():
    for p in PIPELINES.values():
        validate(p)


def test_capability_pointers_resolve():
    from openalex_walden_spark import queries as q

    q.load_all()
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for p in PIPELINES.values():
        for t in p.tasks:
            cap = t.capability
            assert cap, f"{p.name}.{t.name} has no capability"
            cap = cap.removeprefix("partial:")
            kind, _, target = cap.partition(":")
            if kind == "query":
                assert target in q.CATALOG, f"{p.name}.{t.name} -> unknown query {target}"
            elif kind == "lib":
                assert os.path.exists(
                    os.path.join(root, "openalex_walden_spark", target)
                ), f"{p.name}.{t.name} -> missing lib {target}"
            else:
                raise AssertionError(f"{p.name}.{t.name}: bad capability kind {kind}")


def test_end2end_waves_match_reference_topology():
    waves = execution_waves(END2END)
    # Wave 0: the independent ingest roots + the sources snapshot.
    assert waves[0] == sorted(
        [
            "Crossref_Ingest_DLT", "DataCite_Ingest_DLT", "PDF_Ingest_DLT",
            "PubMed_Ingest_DLT", "Repos_Ingest_DLT", "Parseland", "Sources_Snapshot",
        ]
    )
    # Landing page waits for parseland; Union waits for every ingest.
    assert "Landing_Page_Ingest_DLT" in waves[1]
    assert "Union" in waves[2]
    # The post-Works_Base fan-out is the DAG's widest wave.
    wb_wave = next(i for i, w in enumerate(waves) if "Works_Base" in w)
    fan = waves[wb_wave + 1]
    assert {
        "Works_Fulltext", "Parsed_Author_Names", "Prepare_Affiliation_Strings",
        "Sync_RAS_Curations", "Sync_Work_Author_Curations", "SDG_Frontfill",
        "Topics", "Concepts", "parse_referenced_works",
    } <= set(fan)
    # Serving syncs are last-but-one / last.
    assert "Sync_RAS_to_Elasticsearch" in waves[-1]


def test_end2end_critical_path_runs_ingest_to_ras_sync():
    cp = critical_path(END2END)
    assert cp[0] == "Parseland"
    assert cp[-1] == "Sync_RAS_to_Elasticsearch"
    for a, b in zip(cp, cp[1:]):
        task = next(t for t in END2END.tasks if t.name == b)
        assert a in task.deps


def test_funder_awards_dag_shape():
    """The per-funder scraper fan-out (jobs/create_funder_sourced_awards
    .yaml): 312 tasks, 308 independent roots in wave 1, the
    Crossref/DataCite inserts chained, Create_Awards barriers on the
    scraper fleet, Work_Awards last."""
    from openalex_walden_spark.pipelines.registry import (
        PIPELINES,
        execution_waves,
    )

    p = PIPELINES["create_funder_sourced_awards"]
    assert len(p.tasks) == 312
    waves = execution_waves(p)
    assert len(waves[0]) == 308
    assert "Create_Awards" not in waves[0]
    assert waves[-1] == ["Work_Awards"]
    ca = next(t for t in p.tasks if t.name == "Create_Awards")
    assert len(ca.deps) > 250  # the consolidation barrier


def test_snapshot_full_dag_gates_public_sync():
    """snapshot_full: 11 exports fan out, update_meta barriers on all,
    smoke_tests gate sync_to_public — publishing is impossible without
    the QA pass."""
    from openalex_walden_spark.pipelines.registry import (
        PIPELINES,
        execution_waves,
    )

    p = PIPELINES["snapshot_full"]
    waves = execution_waves(p)
    assert len(waves[0]) == 11
    assert waves[1] == ["update_meta"]
    assert waves[2] == ["smoke_tests"]
    assert waves[3] == ["sync_to_public"]
