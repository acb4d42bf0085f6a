"""Deterministic author-name parser — the Latin-script core of the
reference's ``notebooks/end2end/CreateAuthorNames.ipynb`` cell 4
(aer-python-name-parser v2.2, ``_np_parse_latin``) re-expressed as pure
Spark column expressions, plus the oxjob #608 matching keys from cell 9.

Ported rules (reference cell 4, in its order):

* noise strips: ``id_orcid`` decorations, digits glued to name tokens,
  dash hygiene, whitespace collapse;
* nickname extraction from parentheses;
* organization detection (``_NP_ORG_KEYWORDS`` subset): org strings
  parse as last-only;
* ``et al.`` strip;
* title patterns in priority order (``prof. dr.`` > ``prof.`` >
  ``dra.`` > ``dr.`` > ``ir.`` > ``ing.``);
* generational suffix (jr/junior/sr/ii/iii/iv/esq), re-run once after
  credential stripping (the reference's "Smith Jr., MD" re-check);
* credential drop — trailing whitelisted credentials (two rounds) and
  pure-credential comma segments are REMOVED from the name, mirroring
  the reference's dominant ``_np_drop_credential_segments`` path where
  dropped credentials never reach the suffix;
* comma form ("Last, First Middle") reordering;
* the surname-first-initials flip, narrow form ("Pawar AS" — one lead
  word + one all-caps 2-letter blob; the full blob-kind machine with
  Korean/CJK guards is NOT ported);
* multi-token surname scan: walk back over compound prefixes
  (``_NP_COMPOUND_PREFIXES``) — case-insensitive for multi-letter
  particles, lowercase-only for ``e``/``i`` (a single UPPERCASE letter
  is an initial, the reference's explicit break) — never consuming the
  first token;
* final one-layer particle strip on the parsed last
  (``_strip_surname_particles``: two-token ``de la / de las / de los /
  van de / van der / van den`` first, else single ``de da do dos das
  del van von zu``) so "van der Berg" keys as "berg";
* match keys (cell 9): residual-punctuation strip so
  "cooper-sarkar" == "coopersarkar", ``match_key = last ';' initial``
  with empty initial when no first name.

NOT ported (documented deviations): transliteration (pykakasi /
korean-romanizer / unidecode are external libs; the fixture stays
ASCII), CJK/Hangul/Cyrillic/Arabic script routing, the full
acronym-shape credential anchor machine, and the census-table surname
lists (Databricks catalog state).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whitelisted credentials the fixture and parser agree on (subset of the
# reference's _NP_CREDENTIAL_ACRONYMS; same drop behavior).
CRED_ALT = "phd|md|msc|mph|dvm|frcp|facs|mbbs|pharmd|jd|llm|rn|facp"

# Compound prefixes eligible to join the surname during the walk-back
# (reference _NP_COMPOUND_PREFIXES; 'e'/'i' lowercase-only).
_PREFIX_ALT = (
    "(?:(?i:de|del|della|di|da|das|do|dos|van|von|der|den|het|la|le|les|el|al|bin|ibn|abu)|e|i)"
)

# One-layer strip applied to the final last (_strip_surname_particles).
_STRIP2_ALT = "(?i:de la|de las|de los|van de|van der|van den)"
_STRIP1_ALT = "(?i:de|da|do|dos|das|del|van|von|zu)"

ORG_ALT = (
    "institute|university|ministry|society|department|academy|foundation|"
    "laboratory|council|committee|association|center|centre"
)

_GEN_PAT = r"(?i),?\s+(jr\.?|junior|sr\.?|iii|iv|ii|esq\.?)\s*$"
_TITLE_PAT = r"(?i)^(prof\.?\s+dr\.?|prof\.?|dra\.?|dr\.?|ir\.?|ing\.?)\s+"
_CRED_TAIL_PAT = rf"(?i)[,\s]\s*(?:{CRED_ALT})\.?\s*$"
# last-token pattern: up to three compound prefixes then the final token,
# preceded by whitespace (the first token never joins the surname)
_LAST_PAT = rf"\s((?:{_PREFIX_ALT}\s+){{0,3}}\S+)$"


def cleaned(raw: Column) -> Column:
    """Noise strips + whitespace collapse (reference _np_parse_latin head)."""
    c = F.trim(raw)
    c = F.regexp_replace(c, "['’‘ʼ]", "")
    c = F.regexp_replace(c, r"(?i);?\s*id_orcid\s+[\d-]+", "")
    c = F.regexp_replace(c, r"(\w)\d+([,\s])", r"$1$2")
    c = F.regexp_replace(c, r"(\w)\d+$", r"$1")
    c = F.regexp_replace(c, r"-\s+", "-")
    c = F.regexp_replace(c, r"\s+-", "-")
    c = F.regexp_replace(c, r"(^\s*-\s*|\s*-\s*$)", "")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def parse_author_name(raw: Column) -> dict[str, Column]:
    """Return the parsed-name columns {title, first, middle, last,
    suffix, nickname, match_last, match_first, match_key}.

    Pure column expressions (JVM regex, no UDF); empty string means
    "absent" so both engines canonicalize identically.
    """
    n1 = cleaned(raw)
    nickname = F.lower(F.regexp_extract(n1, r"[\(\[]([^\)\]]*)[\)\]]", 1))
    n2 = F.trim(F.regexp_replace(F.regexp_replace(n1, r"\s*[\(\[][^\)\]]*[\)\]]", " "), r"\s+", " "))
    is_org = F.lower(n2).rlike(f"(?:{ORG_ALT})")
    n3 = F.trim(F.regexp_replace(n2, r"(?i)\bet\s+al\.?\s*$", ""))
    title_raw = F.lower(F.regexp_extract(n3, _TITLE_PAT, 1))
    title = F.when(title_raw == "", "").otherwise(
        F.concat(F.regexp_replace(title_raw, r"\.", ""), F.lit("."))
    )
    title = F.when(
        title_raw.rlike(r"(?i)^prof\.?\s+dr\.?$"), F.lit("prof. dr.")
    ).otherwise(title)
    n4 = F.trim(F.regexp_replace(n3, _TITLE_PAT, ""))
    gen1 = F.lower(F.regexp_extract(n4, _GEN_PAT, 1))
    n5 = F.trim(F.regexp_replace(n4, _GEN_PAT, ""))
    # credential drop: two trailing rounds (handles ', MD, MSc'; RE2 has
    # no lookahead, so mid-list segments are out of scope — deviation)
    n6 = F.trim(F.regexp_replace(F.regexp_replace(n5, _CRED_TAIL_PAT, ""), _CRED_TAIL_PAT, ""))
    # generational re-run (reference: marker may sit between name and creds)
    gen2 = F.lower(F.regexp_extract(n6, _GEN_PAT, 1))
    suffix = F.when(gen1 != "", gen1).otherwise(gen2)
    n7 = F.when(gen1 == "", F.trim(F.regexp_replace(n6, _GEN_PAT, ""))).otherwise(n6)
    n7 = F.trim(F.regexp_replace(n7, r",\s*$", ""))
    nl = F.lower(n7)

    has_comma = nl.contains(",")
    # --- comma form ------------------------------------------------------
    c_last = F.trim(F.regexp_extract(nl, r"^([^,]*),", 1))
    c_rest = F.trim(F.regexp_extract(nl, r"^[^,]*,\s*(.*)$", 1))
    c_first = F.regexp_extract(c_rest, r"^(\S+)", 1)
    c_middle = F.trim(F.regexp_extract(c_rest, r"^\S+\s+(.*)$", 1))
    # --- surname-first initials (narrow: 'Pawar AS') ---------------------
    is_sfi = n7.rlike(r"^[A-Za-z][A-Za-z\-]+\s+[A-Z]{2}$")
    sfi_last = F.regexp_extract(nl, r"^(\S+)\s", 1)
    sfi_first = F.regexp_extract(nl, r"\s(\w)\w$", 1)
    sfi_middle = F.regexp_extract(nl, r"\s\w(\w)$", 1)
    # --- general space form ----------------------------------------------
    g_first = F.regexp_extract(nl, r"^(\S+)", 1)
    g_rest = F.trim(F.regexp_extract(nl, r"^\S+\s+(.*)$", 1))
    g_last = F.regexp_extract(F.concat(F.lit(" "), g_rest), _LAST_PAT, 1)
    g_last = F.when((g_rest != "") & (g_last == ""), g_rest).otherwise(g_last)
    g_middle = F.trim(F.regexp_replace(F.concat(F.lit(" "), g_rest), _LAST_PAT, ""))
    one_token = ~nl.contains(" ")

    first = (
        F.when(is_org | one_token, F.lit(""))
        .when(has_comma, c_first)
        .when(is_sfi, sfi_first)
        .otherwise(g_first)
    )
    middle = (
        F.when(is_org | one_token, F.lit(""))
        .when(has_comma, c_middle)
        .when(is_sfi, sfi_middle)
        .otherwise(g_middle)
    )
    last_pre = (
        F.when(is_org, F.regexp_replace(nl, r"\s*,\s*", " "))
        .when(one_token, nl)
        .when(has_comma, c_last)
        .when(is_sfi, sfi_last)
        .otherwise(g_last)
    )
    # one-layer particle strip (_strip_surname_particles)
    last = F.when(
        last_pre.rlike(rf"^{_STRIP2_ALT}\s+\S"),
        F.regexp_replace(last_pre, rf"^{_STRIP2_ALT}\s+", ""),
    ).otherwise(
        F.when(
            last_pre.rlike(rf"^{_STRIP1_ALT}\s+\S"),
            F.regexp_replace(last_pre, rf"^{_STRIP1_ALT}\s+", ""),
        ).otherwise(last_pre)
    )
    suffix = F.when(is_org, F.lit("")).otherwise(suffix)
    title = F.when(is_org, F.lit("")).otherwise(title)

    match_last = F.regexp_replace(last, r"[^a-z]", "")
    match_first_full = F.regexp_replace(first, r"[^a-z]", "")
    match_first = F.substring(match_first_full, 1, 1)
    match_key = F.concat(match_last, F.lit(";"), match_first)
    return {
        "title": title,
        "first": first,
        "middle": middle,
        "last": last,
        "suffix": suffix,
        "nickname": nickname,
        "match_last": match_last,
        "match_first": match_first,
        "match_key": match_key,
    }
