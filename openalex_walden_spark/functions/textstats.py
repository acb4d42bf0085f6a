"""Text-analysis column functions for LLM-training-data pipelines.

Beyond-reference operators (BASELINE.json north star): language ID heuristic,
quality scoring, token counting, document fingerprinting. All pure column
expressions — at 100 TB these run inside whole-stage codegen with zero
Python; each is oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword sets for the n-gram/stopword LID heuristic.
LID_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "is", "of", "to", "in", "that", "it", "was", "for"),
    "de": ("der", "die", "das", "und", "ist", "von", "zu", "den", "mit", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "de", "des", "un", "une", "dans"),
    "es": ("el", "la", "los", "las", "es", "de", "que", "un", "una", "por"),
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization of lowercased text → array<string> (no empties)."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    """Whitespace token count (BIGINT)."""
    return F.size(tokens(col)).cast("bigint")


def word_tokens(col: Column) -> Column:
    """BPE-ish word tokenization: letter runs / digit runs / single punct."""
    cleaned = F.regexp_replace(F.lower(col), r"([^a-z0-9\s])", r" $1 ")
    return F.filter(F.split(cleaned, r"\s+"), lambda t: t != "")


def stopword_hits(col: Column, lang: str) -> Column:
    """Count of tokens that are stopwords of ``lang``."""
    sw = F.array(*[F.lit(w) for w in LID_STOPWORDS[lang]])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(sw, t))).cast("bigint")


def lang_scores(col: Column) -> list[tuple[str, Column]]:
    """Per-language stopword-hit scores, for argmax language ID."""
    return [(lang, stopword_hits(col, lang)) for lang in sorted(LID_STOPWORDS)]


def quality_features(col: Column) -> dict[str, Column]:
    """Document quality signals: lengths and character-class ratios.

    Ratios are computed with integer character counts and a single double
    division so the DuckDB oracle matches bit-for-bit.
    """
    n_chars = F.length(col).cast("bigint")
    n_alpha = F.length(F.regexp_replace(F.lower(col), r"[^a-z]", "")).cast("bigint")
    n_digit = F.length(F.regexp_replace(col, r"[^0-9]", "")).cast("bigint")
    n_punct = F.length(F.regexp_replace(col, r"[^.,;:!?'\"()-]", "")).cast("bigint")
    n_space = F.length(F.regexp_replace(col, r"[^ ]", "")).cast("bigint")
    denom = F.greatest(n_chars, F.lit(1)).cast("double")
    return {
        "n_chars": n_chars,
        "n_tokens": token_count(col),
        "alpha_ratio": (n_alpha.cast("double") / denom),
        "digit_ratio": (n_digit.cast("double") / denom),
        "punct_ratio": (n_punct.cast("double") / denom),
        "space_ratio": (n_space.cast("double") / denom),
        "mean_token_len": (
            (n_chars - n_space).cast("double")
            / F.greatest(token_count(col), F.lit(1)).cast("double")
        ),
    }


def fingerprint(col: Column) -> Column:
    """Canonical document fingerprint: sorted distinct tokens → md5 hex.

    Collapses token-order and duplication differences; md5 is portable to
    the DuckDB oracle and Python.
    """
    canon = F.array_join(F.array_sort(F.array_distinct(tokens(col))), " ")
    return F.md5(canon)


def shingles(col: Column, k: int = 3) -> Column:
    """k-token shingles (distinct) of lowercased text → array<string>.

    Built with transform over token indices — stays JVM-side.
    """
    toks = tokens(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx,
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )
    return F.when(n >= k, F.array_distinct(sh)).otherwise(
        F.when(n > 0, F.array(F.array_join(toks, " "))).otherwise(F.array().cast("array<string>"))
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken): single-source
# expression builders — the Spark form and the DuckDB-oracle form are
# generated here so the three consumers (text_fingerprint_winnow,
# dedup_connected_components, decontaminate_eval_overlap) can never
# drift from each other or from their oracles.
# ---------------------------------------------------------------------------
WINNOW_K = 8  # k-gram length (chars)
WINNOW_W = 4  # window width (k-gram positions)


def winnow_hashes_spark(text: str = "lower(text)") -> str:
    """Spark-SQL expr: rolling k-gram 32-bit hashes of ``text``."""
    kgrams = (
        f"transform(sequence(1, greatest(length({text}) - {WINNOW_K - 1}, 1)),"
        f" i -> substring({text}, i, {WINNOW_K}))"
    )
    return f"transform({kgrams}, g -> cast(conv(substr(md5(g), 1, 8), 16, 10) as bigint))"


def winnow_select_spark(hs: str = "hs") -> str:
    """Spark-SQL expr: min-per-window selection over the hash sequence."""
    return (
        f"CASE WHEN size({hs}) >= {WINNOW_W} THEN "
        f"transform(sequence(0, size({hs}) - {WINNOW_W}),"
        f" i -> array_min(slice({hs}, i + 1, {WINNOW_W}))) "
        f"ELSE array(array_min({hs})) END"
    )


def winnow_fps_duck(source_sql: str = "documents") -> str:
    """DuckDB CTE body yielding (doc_id, n_kgrams, fps) per document of
    ``source_sql`` — the oracle mirror of the two exprs above."""
    return f"""
  SELECT doc_id, len(hs) AS n_kgrams,
         list_distinct(
           CASE WHEN len(hs) >= {WINNOW_W}
                THEN list_transform(range(0, len(hs) - {WINNOW_W - 1}),
                                    i -> list_min(hs[i + 1 : i + {WINNOW_W}]))
                ELSE [list_min(hs)] END) AS fps
  FROM (
    SELECT doc_id,
           list_transform(
             list_transform(range(1, greatest(length(lower(text)) - {WINNOW_K - 1}, 1) + 1),
                            i -> substr(lower(text), i, {WINNOW_K})),
             g -> ('0x' || substr(md5(g), 1, 8))::BIGINT) AS hs
    FROM {source_sql})
"""
