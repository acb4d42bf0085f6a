"""Domain decision functions (D4 OA status, D7 type rules) as data-driven
column expressions — rule tables compiled to one CASE chain, per
SURVEY.md §7.3 ("treat the 400-rule cascade as data + golden tests, not
code")."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def oa_status(
    host_type: Column,
    license_slug: Column,
    source_is_oa: Column,
    apc_usd: Column,
    is_oa: Column,
) -> Column:
    """OA status decision tree (D4), mirroring the reference ladder
    exactly (CreateWorksBase.ipynb cell 2 lines 197-218):

    - ``composite_is_oa`` = COALESCE(is_oa, FALSE) OR source_is_oa
      (cell 2 lines 101-128) gates the whole tree — a non-OA row is
      ``closed`` regardless of host.
    - publisher host: diamond when APC is zero/null AND the source is
      OA-flagged; gold when the source is OA-flagged; hybrid when a
      license exists and is not 'publisher-specific-oa'; else bronze.
    - null host with any OA evidence → gold; repository host → green.
    """
    composite = F.coalesce(is_oa, F.lit(False)) | source_is_oa
    publisher_ladder = (
        F.when((F.coalesce(apc_usd, F.lit(0)) == 0) & source_is_oa, F.lit("diamond"))
        .when(source_is_oa, F.lit("gold"))
        .when(
            license_slug.isNotNull() & (license_slug != "publisher-specific-oa"),
            F.lit("hybrid"),
        )
        .otherwise(F.lit("bronze"))
    )
    # The reference tests `is_oa OR composite_is_oa` below; composite
    # already subsumes is_oa, so the truth value is identical.
    return (
        F.when(composite & (host_type == "publisher"), publisher_ladder)
        .when(host_type.isNull() & composite, F.lit("gold"))
        .when(composite & (host_type == "repository"), F.lit("green"))
        .otherwise(F.lit("closed"))
    )


# D7 rule table: (priority-ordered) substring pattern over the raw type →
# canonical type. First hit wins, dict fallback last.
TYPE_RULES: list[tuple[str, str]] = [
    ("PROMO", "preprint"),
    ("STANDARD", "article"),
    ("ECONOMY", "report"),
]


def classify_type(raw: Column, fallback: Column | None = None) -> Column:
    """Rule-cascade type classification (D7): the rules live in
    TYPE_RULES (data), compiled here into a single CASE expression —
    whole-stage codegen sees one expression tree regardless of rule
    count (the reference's ~400-rule cascade compiles the same way)."""
    expr = fallback if fallback is not None else F.lit("other")
    for needle, slug in reversed(TYPE_RULES):
        expr = F.when(F.upper(raw).contains(needle), F.lit(slug)).otherwise(expr)
    return expr


# D7 full cascade: later tiers fire only when earlier evidence misses —
# the reference orders raw type > host/container > title keywords >
# ref-count fallback (CreateLocationsWithTypes.sql:120-704). Each tier is
# a priority-ordered (pattern, slug) table; all tiers compile into ONE
# CASE chain.
CONTAINER_RULES: list[tuple[str, str]] = [
    ("#13", "book"),
    ("#24", "reference-entry"),
    ("#5", "dataset"),
]

TITLE_RULES: list[tuple[str, str]] = [
    ("WIDGET", "review"),
    ("ANVIL", "editorial"),
    ("GIZMO", "erratum"),
]


def classify_type_cascade(
    raw: Column, container: Column, title: Column, n_refs: Column
) -> Column:
    """D7 multi-evidence cascade. Tier order is evidence strength:
    deposited raw type, then container/host name, then title keywords,
    then the structural fallback (zero references → paratext, else
    article — the reference's dict default). Rules are data; the
    compiled plan is a single codegen'd CASE regardless of rule count.
    """
    expr = F.when(n_refs == 0, F.lit("paratext")).otherwise(F.lit("article"))
    for needle, slug in reversed(TITLE_RULES):
        expr = F.when(F.upper(title).contains(needle), F.lit(slug)).otherwise(expr)
    for needle, slug in reversed(CONTAINER_RULES):
        expr = F.when(F.upper(container).contains(needle), F.lit(slug)).otherwise(expr)
    for needle, slug in reversed(TYPE_RULES):
        expr = F.when(F.upper(raw).contains(needle), F.lit(slug)).otherwise(expr)
    return expr
