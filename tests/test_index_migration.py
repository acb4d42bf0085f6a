"""Index-migration surgery contracts (BuildAwardsV4.ipynb)."""

from __future__ import annotations

import copy

import pytest

from openalex_walden_spark.sinks.index_migration import (
    build_migrated_mapping,
    plan_index_migration,
    subset_settings,
)

V3_MAPPING = {
    "properties": {
        "id": {"type": "keyword"},
        "display_name": {"type": "text"},
        "amount": {"type": "double"},
        # the auto-mapping debt: object, ids auto-mapped as text
        "primary_topic": {"properties": {"id": {"type": "text"}}},
        "topics": {"properties": {"id": {"type": "text"}}},
        "funder": {"properties": {"id": {"type": "keyword"}}},
    }
}

V3_SETTINGS = {
    "number_of_shards": "4",
    "number_of_replicas": "1",
    "analysis": {"analyzer": {"custom_lower": {"type": "custom"}}},
    "uuid": "abc123",
    "creation_date": "1700000000",
    "version": {"created": "8000099"},
}


def test_untouched_fields_stay_byte_identical():
    before = copy.deepcopy(V3_MAPPING)
    out = build_migrated_mapping(V3_MAPPING)
    # input not mutated
    assert V3_MAPPING == before
    # untouched properties survive verbatim
    for k in ("id", "display_name", "amount", "funder"):
        assert out["properties"][k] == V3_MAPPING["properties"][k]


def test_problem_fields_become_nested_with_keyword_ids():
    out = build_migrated_mapping(V3_MAPPING)
    for k in ("primary_topic", "topics", "institution_awarded"):
        assert out["properties"][k]["type"] == "nested"
        assert out["properties"][k]["properties"]["id"] == {"type": "keyword"}
    # the nested topic shape carries subfield/field/domain keyword ids
    assert out["properties"]["topics"]["properties"]["domain"]["properties"]["id"] == {
        "type": "keyword"
    }


def test_settings_subset_drops_instance_state():
    out = subset_settings(V3_SETTINGS)
    assert set(out) == {"number_of_shards", "number_of_replicas", "analysis"}


def test_safety_asserts():
    with pytest.raises(ValueError, match="not found"):
        plan_index_migration("v3", "v4", {"v4"}, V3_MAPPING, V3_SETTINGS)
    with pytest.raises(ValueError, match="already exists"):
        plan_index_migration("v3", "v4", {"v3", "v4"}, V3_MAPPING, V3_SETTINGS)
    plan = plan_index_migration("v3", "v4", {"v3"}, V3_MAPPING, V3_SETTINGS)
    assert plan.target_index == "v4" and "analysis" in plan.settings
