"""Domain decision functions (D4 OA status, D7 type rules) as data-driven
column expressions — rule tables compiled to one CASE chain, per
SURVEY.md §7.3 ("treat the 400-rule cascade as data + golden tests, not
code")."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def oa_status(
    host_type: Column, license_slug: Column, in_doaj: Column, has_apc: Column
) -> Column:
    """OA status decision tree (D4): diamond/gold/hybrid/bronze/green/
    closed, mirroring the reference's ladder over host_type × DOAJ ×
    license × APC (CreateWorksBase.ipynb cell 2 `oa_status` lines
    242-271)."""
    licensed = license_slug.isNotNull()
    return (
        F.when(in_doaj & ~has_apc, F.lit("diamond"))
        .when(in_doaj & has_apc, F.lit("gold"))
        .when((host_type == "journal") & licensed, F.lit("hybrid"))
        .when((host_type == "journal") & ~licensed, F.lit("bronze"))
        .when(host_type == "repository", F.lit("green"))
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
