"""Search-index migration surgery (reference
``notebooks/elastic/BuildAwardsV4.ipynb``, oxjob #123.2): build a new
index's mapping by copying the old mapping VERBATIM and surgically
overriding only the problem fields, copy a defensible subset of index
settings, and plan the cutover with its safety asserts.

The reference fixed the auto-mapping debt of awards-v3 by forcing
``primary_topic`` / ``topics`` / ``institution_awarded`` to ``nested``
with explicit ``keyword`` ids while preserving every other property —
the whole point is that untouched fields stay byte-identical so the
new index behaves like the old one everywhere else.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass

# The shared topic sub-structure (used by primary_topic AND each
# topics[] element) — reference cell 3, verbatim shape.
TOPIC_PROPS: dict = {
    "id": {"type": "keyword"},
    "display_name": {"type": "text", "fields": {"keyword": {"type": "keyword"}}},
    "score": {"type": "float"},
    "subfield": {
        "properties": {
            "id": {"type": "keyword"},
            "display_name": {"type": "text", "fields": {"keyword": {"type": "keyword"}}},
        }
    },
    "field": {
        "properties": {
            "id": {"type": "keyword"},
            "display_name": {"type": "text", "fields": {"keyword": {"type": "keyword"}}},
        }
    },
    "domain": {
        "properties": {
            "id": {"type": "keyword"},
            "display_name": {"type": "text", "fields": {"keyword": {"type": "keyword"}}},
        }
    },
}

INSTITUTION_AWARDED_PROPS: dict = {
    "id": {"type": "keyword"},
    "display_name": {"type": "text", "fields": {"keyword": {"type": "keyword"}}},
    "ror": {"type": "keyword"},
    "country_code": {"type": "keyword"},
}

# Settings keys worth carrying to a new index (shards, replicas, custom
# analyzers); everything else (uuid, creation_date, version) is
# index-instance state that must NOT be copied.
SETTINGS_SUBSET = ("number_of_shards", "number_of_replicas", "analysis")


def build_migrated_mapping(old_mapping: dict) -> dict:
    """Copy the old mapping verbatim, then override the three problem
    fields to nested-with-keyword-ids (reference cell 3)."""
    new_mapping = copy.deepcopy(old_mapping)
    props = new_mapping.setdefault("properties", {})
    props["primary_topic"] = {"type": "nested", "properties": copy.deepcopy(TOPIC_PROPS)}
    props["topics"] = {"type": "nested", "properties": copy.deepcopy(TOPIC_PROPS)}
    props["institution_awarded"] = {
        "type": "nested",
        "properties": copy.deepcopy(INSTITUTION_AWARDED_PROPS),
    }
    return new_mapping


def subset_settings(old_settings: dict) -> dict:
    """The defensible settings subset (reference cell 4)."""
    return {k: old_settings[k] for k in SETTINGS_SUBSET if k in old_settings}


@dataclass(frozen=True)
class MigrationPlan:
    source_index: str
    target_index: str
    mapping: dict
    settings: dict


def plan_index_migration(
    source_index: str,
    target_index: str,
    existing_indices: set[str],
    source_mapping: dict,
    source_settings: dict,
) -> MigrationPlan:
    """Safety-asserted migration plan (reference cell 2's asserts):
    the source must exist and the target must NOT (a partial rebuild
    must never be clobbered silently — delete it first, on purpose)."""
    if source_index not in existing_indices:
        raise ValueError(f"{source_index} not found; aborting")
    if target_index in existing_indices:
        raise ValueError(f"{target_index} already exists; delete it first if rebuilding")
    return MigrationPlan(
        source_index=source_index,
        target_index=target_index,
        mapping=build_migrated_mapping(source_mapping),
        settings=subset_settings(source_settings),
    )
