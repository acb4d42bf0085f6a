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
    id_prefix: str          # e.g. "https://openalex.org/A" (prefix rule)
    id_field: str = "id"
    updated_col: str = "updated_date"
    # small "combined" entities snapshot a content hash and only ship
    # rows whose hash moved (the sync_countries.py device)
    hash_gated: bool = False
    doc_fields: tuple[str, ...] = ()
    # _id construction rule: prefix (URL-prefix the id), composite
    # (namespace:native_id, sync_locations.py:127), sha256
    # (content-addressed, sync_raw_affiliation_strings.py:148), raw
    # (table id ships as-is, sync_keywords.py)
    id_rule: str = "prefix"
    id_arg: str = ""


# One row per reference sync script (notebooks/elastic/sync_*.py).
SYNC_REGISTRY: dict[str, SyncConfig] = {
    "works": SyncConfig("works", "works-v26", "https://openalex.org/W"),
    "authors": SyncConfig("authors", "authors-v19", "https://openalex.org/A"),
    "sources": SyncConfig("sources", "sources-v3", "https://openalex.org/S"),
    "institutions": SyncConfig(
        "institutions", "institutions-v8", "https://openalex.org/I"
    ),
    "publishers": SyncConfig(
        "publishers", "publishers-v6", "https://openalex.org/P"
    ),
    "funders": SyncConfig("funders", "funders-v3", "https://openalex.org/F"),
    "concepts": SyncConfig("concepts", "concepts-v9", "https://openalex.org/C"),
    "topics": SyncConfig("topics", "topics-v4", "https://openalex.org/T"),
    # sync_topic_hierarchy.py loops the three upper levels (topics-v4
    # is the "topics" row above)
    "subfields": SyncConfig(
        "subfields", "subfields-v2", "https://openalex.org/subfields/"
    ),
    "fields": SyncConfig(
        "fields", "fields-v2", "https://openalex.org/fields/"
    ),
    "domains": SyncConfig(
        "domains", "domains-v2", "https://openalex.org/domains/"
    ),
    # keywords_api ids are already full URLs — they ship as-is
    "keywords": SyncConfig(
        "keywords", "keywords-v1", "", id_rule="raw"
    ),
    "awards": SyncConfig("awards", "awards-v4", "https://openalex.org/G"),
        "locations": SyncConfig(
        "locations", "locations-v1", "", id_rule="composite",
        id_arg="native_id_namespace,native_id",
    ),
    "raw_affiliation_strings": SyncConfig(
        "raw_affiliation_strings", "raw-affiliation-strings-v3", "",
        id_rule="sha256", id_arg="raw_affiliation_string",
    ),
    # the small combined entities: hash-gated, one notebook builds the
    # API table AND syncs it (sync_countries.py's NOTE cell)
    "countries": SyncConfig(
        "countries", "countries-v2", "https://openalex.org/countries/",
        hash_gated=True,
    ),
    "continents": SyncConfig(
        "continents", "continents-v1", "https://openalex.org/continents/",
        hash_gated=True,
    ),
    "languages": SyncConfig(
        "languages", "languages-v3", "https://openalex.org/languages/",
        hash_gated=True,
    ),
    "licenses": SyncConfig(
        "licenses", "licenses-v1", "https://openalex.org/licenses/",
        hash_gated=True,
    ),
    "sdgs": SyncConfig(
        "sdgs", "sdgs-v2", "https://openalex.org/sdgs/", hash_gated=True
    ),
    "source_types": SyncConfig(
        "source_types", "source-types-v3", "https://openalex.org/source-types/",
        hash_gated=True,
    ),
    "work_types": SyncConfig(
        "work_types", "work-types-v1", "https://openalex.org/types/",
        hash_gated=True,
    ),
    "institution_types": SyncConfig(
        "institution_types", "institution-types-v1",
        "https://openalex.org/institution-types/", hash_gated=True,
    ),
    # sync_vector_index.ipynb: the embedding kNN index shares the W id
    # space (two-phase search: kNN here -> mget full docs from works)
    "vector_index": SyncConfig(
        "vector_index", "works-vectors-v1", "https://openalex.org/W"
    ),
    # sync_indexes.py: the fixed 5-key indexed_in vocabulary (crossref/
    # pubmed/datacite/doaj/arxiv) — smallest combined entity, hash-gated
    # like the other one-notebook build+sync vocabs; its table build is
    # the catalog query ``indexes_api_build``
    "indexes": SyncConfig(
        "indexes", "indexes-v1", "https://openalex.org/indexes/",
        hash_gated=True,
        doc_fields=("display_name", "description", "works_count",
                    "cited_by_count"),
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
        doc_id_column(cfg, F.col(cfg.id_field)).alias("id")
    ] + [F.col(c) for c in (cfg.doc_fields or df.columns) if c != cfg.id_field]
    return df.select(
        fields[0],
        F.to_json(F.struct(*fields)).alias("doc"),
    )


def doc_id_column(cfg: SyncConfig, key) -> "F.Column":
    """The entity's ``_id`` rule as a Column.

    prefix:    cfg.id_prefix || key          (sync_funders.py cell 4)
    composite: 'namespace:native_id'         (sync_locations.py:127)
    sha256:    sha2(id_arg column, 256)      (sync_raw_affiliation_strings.py:148)
    raw:       key as-is                     (sync_keywords.py — table ids
                                              are already full URLs)
    """
    if cfg.id_rule == "prefix":
        return F.concat(F.lit(cfg.id_prefix), key.cast("string"))
    if cfg.id_rule == "composite":
        first, second = cfg.id_arg.split(",")
        return F.concat(F.col(first), F.lit(":"), F.col(second))
    if cfg.id_rule == "sha256":
        return F.sha2(F.col(cfg.id_arg).cast("string"), 256)
    return key.cast("string")


class StaleCapExceeded(RuntimeError):
    """The reconciliation found more stale docs than the safety cap —
    the API table looks wrong; refusing to mass-delete the index."""


def stale_audit(
    table_ids: DataFrame,
    index_ids: DataFrame,
    max_stale: int = 2000,
) -> DataFrame:
    """Index docs whose id is no longer in the API table (merge losers
    to delete), with the reference's mass-delete refusal
    (sync_funders.py cells 5-7: "A broken/empty funders_api must never
    mass-delete the index", cap 2000).

    The reference collects BOTH id sets to the driver and diffs Python
    sets — fine for funders, lethal for works.  Here the diff is a
    LEFT ANTI join (index side minus table side) and the refusal probe
    counts at most ``max_stale + 1`` rows via limit(), however broken
    the table is.  Raises ``StaleCapExceeded`` past the cap.
    """
    icol = index_ids.columns[0]
    tcol = table_ids.columns[0]
    stale = index_ids.join(
        table_ids, index_ids[icol] == table_ids[tcol], "left_anti"
    )
    probe = stale.limit(max_stale + 1).count()
    if probe > max_stale:
        raise StaleCapExceeded(
            f">{max_stale} stale docs — API table looks wrong, refusing "
            "to mass-delete the index"
        )
    return stale


def sync_with_logs(
    df: DataFrame,
    doc_col: str,
    transport_factory,
    batch_size: int = 500,
    rows_per_partition: int = 10_000,
) -> DataFrame:
    """Bulk-post per partition and RETURN the audit-log DataFrame
    (sync_works.ipynb cells 7-9: one log row per partition with
    indexed/skipped counts via mapPartitionsWithIndex, instead of the
    fire-and-forget foreachPartition the smaller entities use).

    ``transport_factory`` runs once per partition (per-executor
    connection, same seam as ``bulk_index``); its callable returns the
    ACCEPTED count per batch, so ``skipped = sent - accepted``
    surfaces per partition.
    """
    from openalex_walden_spark.sinks.bulk_index import partition_count_for

    n = df.count()
    target = partition_count_for(n, rows_per_partition)
    docs = df.select(doc_col)
    if docs.rdd.getNumPartitions() != target:
        docs = docs.repartition(target)

    def send_partition(pid, rows):
        send = transport_factory()
        sent = accepted = 0
        batch = []
        for row in rows:
            batch.append(row[0])
            if len(batch) >= batch_size:
                sent += len(batch)
                accepted += send(batch)
                batch = []
        if batch:
            sent += len(batch)
            accepted += send(batch)
        yield (pid, sent, accepted, sent - accepted)

    logs = docs.rdd.mapPartitionsWithIndex(send_partition)
    return df.sparkSession.createDataFrame(
        logs, "partition_id INT, sent INT, indexed INT, skipped INT"
    )
