"""D6 judged-precision harness: a labeled pair corpus for the
names_compatible predicate (the reference gates each disambiguation tier
on an LLM-judged precision bar — MatchAuthors.ipynb cells 2-18; here the
judgment is a fixed labeled corpus and the bar is pinned in CI).

The corpus covers the reference's hard families: comma-reorder
("Smith, John" vs "John Smith"), initial-vs-full given, generational
suffixes, surname particles and containment ("Cruz" vs "de la Cruz"),
accent folding, apostrophe/hyphen surnames — plus negatives designed to
punish over-matching (same family different given initial, short-family
containment, different-person pairs).
"""

from __future__ import annotations

import pytest

from openalex_walden_spark.functions.sql_udfs import create_sql_udfs
from openalex_walden_spark.functions.udfs import _FOLD, parse_human_name

# 40 base identities (distinct families, varied shapes).
_BASES = [
    "John Smith", "Maria de la Cruz", "Conor O'Brien-Lee", "Jose Alvarez",
    "Ludwig van Beethoven", "Wei Zhang", "Fatima Al-Rashid", "Anna Kowalska",
    "Pierre Dubois", "Elena Petrova", "Hiroshi Tanaka", "Priya Sharma",
    "Carlos Mendoza", "Ingrid Johansson", "Ahmed Hassan", "Sofia Rossi",
    "Lars Nielsen", "Yuki Yamamoto", "Olga Ivanova", "Miguel Santos",
    "Claire Fontaine", "David Goldberg", "Aisha Okafor", "Thomas Mueller",
    "Rachel Cohen", "Diego Fernandez", "Mei Lin", "Patrick Murphy",
    "Leila Nasser", "Erik Andersson", "Carmen Vargas", "Jan van der Berg",
    "Grace Kim", "Omar Khalil", "Lucia Moretti", "Peter Novak",
    "Amara Diallo", "Henrik Larsen", "Rosa Delgado", "Samuel Wright",
]


def _fold(s: str) -> str:
    return s.lower().translate(_FOLD)


def _parsed(name: str) -> tuple[str, str, str]:
    """(first, last, raw) folded/lowercased — the pipeline's upstream
    normalization before the predicate runs."""
    first, last = parse_human_name(name)
    return (_fold(first) if first else None, _fold(last) if last else None,
            _fold(name))


def _comma(name: str) -> str:
    first, last = parse_human_name(name)
    return f"{last}, {first}"


def _initial(name: str) -> str:
    first, last = parse_human_name(name)
    return f"{first[0]}. {last}"


def _suffixed(name: str) -> str:
    return name + " Jr."


def _wrong_initial(name: str) -> str:
    first, last = parse_human_name(name)
    new = "x" if first[0].lower() != "x" else "q"
    return f"{new.upper()}{first[1:]} {last}"


def corpus() -> list[tuple[str, str, bool]]:
    """(name_a, name_b, should_match) — 200 labeled pairs."""
    pairs: list[tuple[str, str, bool]] = []
    for b in _BASES:
        pairs.append((b, b, True))                      # identity
        pairs.append((b, _comma(b), True))              # comma reorder
        pairs.append((b, _initial(b), True))            # initial vs full
        pairs.append((b, _suffixed(b), True))           # suffix variant
    # 40 negatives: adjacent distinct identities.
    for i, b in enumerate(_BASES):
        pairs.append((b, _BASES[(i + 1) % len(_BASES)], False))
    # 20 hard negatives: same family, different given initial.
    for b in _BASES[:20]:
        pairs.append((b, _wrong_initial(b), False))
    return pairs


@pytest.fixture(scope="module")
def judged(spark):
    create_sql_udfs(spark)
    rows = []
    for i, (a, b, want) in enumerate(corpus()):
        af, al, ar = _parsed(a)
        bf, bl, br = _parsed(b)
        rows.append((i, af, al, ar, bf, bl, br, want))
    df = spark.createDataFrame(
        rows,
        "pair_id int, a_first string, a_last string, a_raw string,"
        " b_first string, b_last string, b_raw string, want boolean",
    )
    df.createOrReplaceTempView("d6_judge_pairs")
    out = spark.sql("""
        SELECT pair_id, want,
               names_compatible(a_last, a_first, b_last, b_first,
                                a_raw, b_raw) AS got
        FROM d6_judge_pairs
    """).collect()
    return [(r["want"], r["got"]) for r in out]


def test_corpus_size_and_balance():
    pairs = corpus()
    assert len(pairs) == 220
    assert sum(1 for *_, w in pairs if w) == 160


def test_precision_floor(judged):
    tp = sum(1 for w, g in judged if w and g)
    fp = sum(1 for w, g in judged if not w and g)
    precision = tp / max(tp + fp, 1)
    assert precision >= 0.95, f"precision {precision:.3f} (tp={tp}, fp={fp})"


def test_recall_floor(judged):
    tp = sum(1 for w, g in judged if w and g)
    fn = sum(1 for w, g in judged if w and not g)
    recall = tp / max(tp + fn, 1)
    assert recall >= 0.9, f"recall {recall:.3f} (tp={tp}, fn={fn})"


def test_hard_negative_families_rejected(judged):
    """The 20 same-family/different-initial pairs are the reference's
    known over-match trap — none may pass."""
    hard = judged[-20:]
    assert all(not g for _, g in hard)
