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
    ("ANODIZED", "article"),
    ("BURNISHED", "book-chapter"),
    ("PLATED", "preprint"),
    ("POLISHED", "dataset"),
    ("BRUSHED", "report"),
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
