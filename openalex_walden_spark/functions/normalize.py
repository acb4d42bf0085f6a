"""Normalization kernel (operators P2-P4, P15) as pure column expressions.

The reference implements DOI normalization as chained regex/string ops
(``normalize.py:226-231``), title normalization partly in a pandas UDF
(``normalize.py:142-179``) and license mapping as a substring-lookup pandas
UDF (``normalize.py:181-223``). Here all are JVM-side column expressions —
vectorized, codegen-friendly, no Python worker — per SURVEY.md §2.2's noted
pure-Spark alternatives.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopwords stripped during title normalization — aligned with the
# reference's set (normalize.py:142-179: the|a|an|of|to|in|for|on|by|
# with|at|from).
_TITLE_STOPWORDS = ("the", "a", "an", "of", "to", "in", "for", "on", "by", "with", "at", "from")


def normalize_doi(col: Column) -> Column:
    """Canonicalize a DOI string (P2).

    lower → trim → strip internal whitespace/NULs → extract ``10.<digits>/...``.
    Returns NULL when no DOI pattern is found.
    """
    cleaned = F.regexp_replace(F.lower(F.trim(col)), r"[\s\x00]+", "")
    extracted = F.regexp_extract(cleaned, r"(10\.\d{4,9}/[^\s]+)", 1)
    return F.when(extracted == "", F.lit(None).cast("string")).otherwise(extracted)


def normalize_title(col: Column, max_len: int = 500) -> Column:
    """Normalize a title for merge-keying (P3).

    First ``max_len`` chars → lowercase → strip HTML tags → fold common
    latin diacritics (translate) → drop stopwords → keep every Unicode
    letter/digit (the reference keeps isalpha() after NFD — stripping to
    ASCII would NULL out CJK/Cyrillic/Greek titles and corrupt their
    merge keys).
    """
    t = F.lower(F.substring(col, 1, max_len))
    t = F.regexp_replace(t, r"<[^>]+>", " ")
    t = F.translate(
        t,
        "àáâãäåçèéêëìíîïñòóôõöùúûüýÿšžœæß",
        "aaaaaaceeeeiiiinooooouuuuyyszoas",
    )
    pattern = r"\b(" + "|".join(_TITLE_STOPWORDS) + r")\b"
    t = F.regexp_replace(t, pattern, " ")
    t = F.regexp_replace(t, r"[^\p{L}\p{N}]+", "")
    return F.when(t == "", F.lit(None).cast("string")).otherwise(t)


# Space/hyphen-stripped substring → canonical slug, checked in order
# (first hit wins) — the reference's lookup architecture
# (normalize.py:181-223): publisher-specific suppressions first (the
# Elsevier user-license URL contains 'openaccess' and must NOT slug),
# then CC forms (stripped, so 'CC BY-NC' and 'ccbync' both hit), CC URL
# forms, public domain (guarded), generic open-access, versioned GPL
# before the bare fallback, and strict apache2.
_LICENSE_STRIPPED_RULES: list[tuple[str, str | None]] = [
    ("elsevier.com/openaccess/userlicense", None),
    ("pubs.acs.org/page/policy/authorchoice_termsofuse.html", "other-oa"),
    ("arxiv.orgperpetual", "other-oa"),
    ("arxiv.orgnonexclusive", "other-oa"),
    ("ccbyncnd", "cc-by-nc-nd"),
    ("ccbyncsa", "cc-by-nc-sa"),
    ("ccbynd", "cc-by-nd"),
    ("ccbysa", "cc-by-sa"),
    ("ccbync", "cc-by-nc"),
    ("ccby", "cc-by"),
    ("creativecommons.org/licenses/byncnd", "cc-by-nc-nd"),
    ("creativecommons.org/licenses/byncsa", "cc-by-nc-sa"),
    ("creativecommons.org/licenses/bync", "cc-by-nc"),
    ("creativecommons.org/licenses/bynd", "cc-by-nd"),
    ("creativecommons.org/licenses/bysa", "cc-by-sa"),
    ("creativecommons.org/licenses/by", "cc-by"),
    ("cc0", "public-domain"),
    ("publicdomain", "public-domain"),  # guarded below
    ("openaccess", "other-oa"),
    ("gpl3", "gpl-3"),
    ("gpl2", "gpl-2"),
    ("gpl", "gpl"),
    ("apache2", "apache-2.0"),
]

# The public-domain hit is suppressed when the text is the publisher's
# "works NOT in the public domain" notice (the reference's guard).
_PD_GUARD = "worksnotinthepublicdomain"

# Short generic names match only on word boundaries ON THE RAW text: a
# bare substring 'mit' would hit 'permitted'/'submitted'/'limited'
# (the reference's stripped-lookup 'mit ' rule is unreachable after its
# own space-strip — the word-boundary form keeps the intent alive).
_LICENSE_WORD_RULES: list[tuple[str, str]] = [
    (r"\bmit\b", "mit"),
]


def normalize_license(col: Column) -> Column:
    """Map a raw license string to a canonical slug (P4); NULL if unknown."""
    c = F.lower(F.trim(col))
    stripped = F.translate(c, " -", "")
    expr = F.lit(None).cast("string")
    for pattern, slug in reversed(_LICENSE_WORD_RULES):
        expr = F.when(c.rlike(pattern), F.lit(slug)).otherwise(expr)
    for needle, slug in reversed(_LICENSE_STRIPPED_RULES):
        cond = stripped.contains(needle)
        if slug == "public-domain":
            cond = cond & ~stripped.contains(_PD_GUARD)
        expr = F.when(cond, F.lit(slug).cast("string")).otherwise(expr)
    return expr


def normalize_boolean(col: Column) -> Column:
    """'yes/no/t/f/true/false/1/0' → BOOLEAN (P15)."""
    c = F.lower(F.trim(col))
    return (
        F.when(c.isin("yes", "y", "t", "true", "1"), F.lit(True))
        .when(c.isin("no", "n", "f", "false", "0"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def sanitize_for_serving(col: Column, max_len: int = 32000) -> Column:
    """Strip control chars, collapse whitespace, truncate (P13)."""
    c = F.regexp_replace(col, r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.substring(F.trim(c), 1, max_len)
