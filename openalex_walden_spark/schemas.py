"""Canonical record schemas.

The reference defines one "walden works schema" StructType and coerces every
source into it at the normalization boundary (SURVEY.md §1.2; reference
``libraries/dlt_utils/openalex/dlt/normalize.py:14-52``). We re-declare the
same logical schema here from the survey's field inventory — this engine's
single fixed-schema boundary. Upstream of it, sources may be schema-inferred;
downstream, everything is typed.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _s(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


AFFILIATION = StructType(
    [
        _s("name", StringType()),
        _s("department", StringType()),
        _s("ror_id", StringType()),
    ]
)

AUTHOR = StructType(
    [
        _s("given", StringType()),
        _s("family", StringType()),
        _s("name", StringType()),
        _s("orcid", StringType()),
        _s("affiliations", ArrayType(AFFILIATION)),
        _s("is_corresponding", BooleanType()),
        _s("author_key", StringType()),
    ]
)

ID_ENTRY = StructType(
    [
        _s("id", StringType()),
        _s("namespace", StringType()),
        _s("relationship", StringType()),
    ]
)

FUNDER = StructType(
    [
        _s("doi", StringType()),
        _s("ror", StringType()),
        _s("name", StringType()),
        _s("awards", ArrayType(StringType())),
    ]
)

REFERENCE = StructType(
    [
        _s("doi", StringType()),
        _s("pmid", StringType()),
        _s("arxiv", StringType()),
        _s("title", StringType()),
        _s("authors", StringType()),
        _s("year", StringType()),
        _s("raw", StringType()),
    ]
)

URL_ENTRY = StructType(
    [
        _s("url", StringType()),
        _s("content_type", StringType()),
    ]
)

MERGE_KEY = StructType(
    [
        _s("doi", StringType()),
        _s("pmid", StringType()),
        _s("arxiv", StringType()),
        _s("title_author", StringType()),
    ]
)

LANGUAGE_CLASSIFICATION = StructType(
    [
        _s("language", StringType()),
        _s("score", DoubleType()),
    ]
)

#: The canonical "walden works" record every source is conformed into.
#: Field inventory per SURVEY.md §1.2 / FIXTURES.md F1.
WALDEN_WORKS_SCHEMA = StructType(
    [
        _s("provenance", StringType()),
        _s("native_id", StringType()),
        _s("native_id_namespace", StringType()),
        _s("title", StringType()),
        _s("normalized_title", StringType()),
        _s("authors", ArrayType(AUTHOR)),
        _s("ids", ArrayType(ID_ENTRY)),
        _s("raw_type", StringType()),
        _s("type", StringType()),
        _s("version", StringType()),
        _s("license", StringType()),
        _s("language", StringType()),
        _s("language_classification", LANGUAGE_CLASSIFICATION),
        _s("published_date", DateType()),
        _s("created_date", DateType()),
        _s("updated_date", DateType()),
        _s("issue", StringType()),
        _s("volume", StringType()),
        _s("first_page", StringType()),
        _s("last_page", StringType()),
        _s("is_retracted", BooleanType()),
        _s("abstract", StringType()),
        _s("source_name", StringType()),
        _s("publisher", StringType()),
        _s("funders", ArrayType(FUNDER)),
        _s("references", ArrayType(REFERENCE)),
        _s("urls", ArrayType(URL_ENTRY)),
        _s("mesh", StringType()),
        _s("is_oa", BooleanType()),
        _s("abstract_inverted_index", StringType()),
        _s("merge_key", MERGE_KEY),
        _s("work_id", LongType()),
        _s("ingested_at", TimestampType()),
    ]
)

#: Embedding vector column type used by similarity operators.
EMBEDDING_TYPE = ArrayType(FloatType())
