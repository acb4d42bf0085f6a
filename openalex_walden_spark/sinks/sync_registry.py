"""Per-entity search-index sync registry (the notebooks/elastic fleet).

The reference maintains one sync script PER entity
(``notebooks/elastic/sync_{authors,concepts,continents,countries,
funders,institution_types,institutions,keywords,languages,licenses,
locations,publishers,raw_affiliation_strings,sdgs,source_types,sources,
topic_hierarchy,work_types,works,awards,...}.py``).  Every script is
the same machine with different constants: a CONFIG (table, index
name), an incremental ``updated_date >= now-2d`` filter unless
``is_full_sync``, a URL-prefix id transform, a ``_source`` doc
projection shipped via parallel bulk, and — for the small "combined"
entities (countries, continents, ...) — an xxhash64 content-hash
snapshot so only genuinely changed rows re-sync.

Here the per-script constants are DATA (``SyncConfig`` rows in
``SYNC_REGISTRY``) and the machine is ONE function (``plan_sync``),
composed from the engine's existing parts: ``sinks/bulk_index`` for
delivery, D9-style ``xxhash64(concat_ws(...))`` for the change gate.
``plan_sync`` returns the DataFrame of docs to ship so callers (and
tests) can inspect the plan before handing it to ``bulk_index`` — the
sink stays transport-agnostic exactly like the reference's
``send_partition_to_elastic`` seam.

Scale: the incremental filter prunes on updated_date before anything
else; the change gate is a broadcast-free equi-join on the entity id
against the (id, content_hash) snapshot — both sides hash-partitioned
on the id, no row ever carries its full document through the join.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class SyncConfig:
    entity: str
    index_name: str
    id_prefix: str          # e.g. "https://openalex.org/A"
    id_field: str = "id"
    updated_col: str = "updated_date"
    # small "combined" entities snapshot a content hash and only ship
    # rows whose hash moved (the sync_countries.py device)
    hash_gated: bool = False
    doc_fields: tuple[str, ...] = ()


# One row per reference sync script (notebooks/elastic/sync_*.py).
SYNC_REGISTRY: dict[str, SyncConfig] = {
    "works": SyncConfig("works", "works-v26", "https://openalex.org/W"),
    "authors": SyncConfig("authors", "authors-v19", "https://openalex.org/A"),
    "sources": SyncConfig("sources", "sources-v11", "https://openalex.org/S"),
    "institutions": SyncConfig(
        "institutions", "institutions-v12", "https://openalex.org/I"
    ),
    "publishers": SyncConfig(
        "publishers", "publishers-v6", "https://openalex.org/P"
    ),
    "funders": SyncConfig("funders", "funders-v8", "https://openalex.org/F"),
    "concepts": SyncConfig("concepts", "concepts-v10", "https://openalex.org/C"),
    "topics": SyncConfig("topics", "topics-v4", "https://openalex.org/T"),
    "topic_hierarchy": SyncConfig(
        "topic_hierarchy", "topic-hierarchy-v2", "https://openalex.org/"
    ),
    "keywords": SyncConfig(
        "keywords", "keywords-v3", "https://openalex.org/keywords/"
    ),
    "awards": SyncConfig("awards", "awards-v4", "https://openalex.org/G"),
    "locations": SyncConfig("locations", "locations-v3", "https://openalex.org/"),
    "raw_affiliation_strings": SyncConfig(
        "raw_affiliation_strings", "raw-affiliations-v2", "https://openalex.org/"
    ),
    # the small combined entities: hash-gated, one notebook builds the
    # API table AND syncs it (sync_countries.py's NOTE cell)
    "countries": SyncConfig(
        "countries", "countries-v2", "https://openalex.org/countries/",
        hash_gated=True,
    ),
    "continents": SyncConfig(
        "continents", "continents-v2", "https://openalex.org/continents/",
        hash_gated=True,
    ),
    "languages": SyncConfig(
        "languages", "languages-v2", "https://openalex.org/languages/",
        hash_gated=True,
    ),
    "licenses": SyncConfig(
        "licenses", "licenses-v2", "https://openalex.org/licenses/",
        hash_gated=True,
    ),
    "sdgs": SyncConfig(
        "sdgs", "sdgs-v2", "https://openalex.org/sdgs/", hash_gated=True
    ),
    "source_types": SyncConfig(
        "source_types", "source-types-v2", "https://openalex.org/source-types/",
        hash_gated=True,
    ),
    "work_types": SyncConfig(
        "work_types", "work-types-v2", "https://openalex.org/work-types/",
        hash_gated=True,
    ),
    "institution_types": SyncConfig(
        "institution_types", "institution-types-v2",
        "https://openalex.org/institution-types/", hash_gated=True,
    ),
}


def content_hash(df: DataFrame, fields: tuple[str, ...]) -> DataFrame:
    """(id, content_hash) snapshot — xxhash64 over the '|'-joined,
    NULL-coalesced business fields (sync_countries.py cell 2 / the D9
    discipline).  Internal-only hash, so xxhash64 (not md5) is fine."""
    joined = F.concat_ws(
        "|", *[F.coalesce(F.col(f).cast("string"), F.lit("")) for f in fields]
    )
    return df.select("id", F.xxhash64(joined).alias("content_hash"))


def plan_sync(
    entity_df: DataFrame,
    cfg: SyncConfig,
    full: bool = False,
    since: str | None = None,
    prev_hashes: DataFrame | None = None,
) -> DataFrame:
    """The per-entity sync plan: URL-prefix the id, apply the
    incremental window (``updated_col >= since`` unless ``full``), and
    for hash-gated entities anti-join rows whose content hash equals
    the previous snapshot's.  Returns (id, doc) ready for
    ``bulk_index(plan, "doc", transport)``."""
    df = entity_df
    if not full and since is not None:
        df = df.where(F.col(cfg.updated_col) >= F.lit(since))
    if cfg.hash_gated and prev_hashes is not None:
        cur = content_hash(df, cfg.doc_fields or tuple(df.columns))
        unchanged = cur.alias("c").join(
            prev_hashes.alias("p"),
            (F.col("c.id") == F.col("p.id"))
            & (F.col("c.content_hash") == F.col("p.content_hash")),
            "left_semi",
        )
        df = df.join(unchanged, "id", "left_anti")
    fields = [
        F.concat(F.lit(cfg.id_prefix), F.col(cfg.id_field).cast("string")).alias("id")
    ] + [F.col(c) for c in (cfg.doc_fields or df.columns) if c != cfg.id_field]
    return df.select(
        fields[0],
        F.to_json(F.struct(*fields)).alias("doc"),
    )
