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


# license substring → canonical slug, checked in order (first hit wins).
# Mirrors the semantics of the reference's lookup table (normalize.py:181-223).
_LICENSE_RULES: list[tuple[str, str]] = [
    ("cc-by-nc-nd", "cc-by-nc-nd"),
    ("cc-by-nc-sa", "cc-by-nc-sa"),
    ("cc-by-nc", "cc-by-nc"),
    ("cc-by-nd", "cc-by-nd"),
    ("cc-by-sa", "cc-by-sa"),
    ("cc-by", "cc-by"),
    ("cc0", "public-domain"),
    ("public domain", "public-domain"),
    ("publicdomain", "public-domain"),
    ("creativecommons.org/licenses/by-nc-nd", "cc-by-nc-nd"),
    ("creativecommons.org/licenses/by-nc-sa", "cc-by-nc-sa"),
    ("creativecommons.org/licenses/by-nc", "cc-by-nc"),
    ("creativecommons.org/licenses/by-nd", "cc-by-nd"),
    ("creativecommons.org/licenses/by-sa", "cc-by-sa"),
    ("creativecommons.org/licenses/by", "cc-by"),
    ("apache", "apache-2.0"),
]

# Short generic names match only on word boundaries: a bare substring
# 'mit' would hit 'permitted'/'submitted'/'limited' (the reference's
# space-stripped exact-lookup table avoids this class of false positive
# — normalize.py:181-223).
_LICENSE_WORD_RULES: list[tuple[str, str]] = [
    (r"\bmit\b", "mit"),
    (r"\b[al]?gplv?[23]?\b", "gpl"),
]


def normalize_license(col: Column) -> Column:
    """Map a raw license string to a canonical slug (P4); NULL if unknown."""
    c = F.lower(F.trim(col))
    expr = F.lit(None).cast("string")
    # Build the WHEN-chain back to front so earlier rules take precedence.
    for pattern, slug in reversed(_LICENSE_WORD_RULES):
        expr = F.when(c.rlike(pattern), F.lit(slug)).otherwise(expr)
    for needle, slug in reversed(_LICENSE_RULES):
        expr = F.when(c.contains(needle), F.lit(slug)).otherwise(expr)
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
