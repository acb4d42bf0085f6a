"""Affiliation-string -> institution-id rule battery: compilers.

The reference's hand-maintained matcher
(``notebooks/institutions/affiliation_string_parsing.py``,
``match_affiliation_to_institution_ids`` — ~1,450 appends in ~4,800
lines of nested if/elif heuristics) is extracted to RULES-AS-DATA by
``scripts/gen_affiliation_rules.py`` (AST-driven, with a dev-time
fidelity gate that replays every synthesized example through the
reference function).  This module compiles the expression trees three
ways from the one dataset:

- ``match_column(aff)``           -> Spark Column (array<bigint> of ids)
- ``match_sql_duckdb(aff, low)``  -> DuckDB SQL expression text
- ``match_python(s)``             -> pure-Python evaluation (tests)

State-dependent guards (``inst in affs`` — a rule that only fires when
earlier rules did not) are EXPANDED at load time into pure expressions
over the input string: matched(id) at position r = OR of the expanded
guards of all earlier appends of that id.  The one ``affs.remove``
compiles to AND NOT(removal guard) on that id's membership.  This
makes every compiled form stateless and order-free — one expression
per institution id — which is exactly what lets the whole battery run
as ONE map-side projection at 100 TB instead of a 1,450-step
sequential interpreter.
"""

from __future__ import annotations

import re
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

from openalex_walden_spark.functions.affrules_data import REMOVALS, RULES

# ---------------------------------------------------------------------------
# state expansion: matched(id) -> OR of prior appends' guards
# ---------------------------------------------------------------------------


def _subst(e, by_id):
    k = e[0]
    if k == "matched":
        prior = by_id.get(e[1], [])
        if not prior:
            return ("const", False)
        return prior[0] if len(prior) == 1 else ("or", list(prior))
    if k in ("and", "or"):
        return (k, [_subst(x, by_id) for x in e[1]])
    if k == "not":
        return ("not", _subst(e[1], by_id))
    return e


def _expand():
    by_id: dict[int, list] = {}
    expanded = []
    for iid, g in RULES:
        pg = _subst(g, by_id)
        expanded.append((iid, pg))
        by_id.setdefault(iid, []).append(pg)
    removals = [(iid, _subst(g, by_id)) for iid, g in REMOVALS]
    # membership per id: OR(append guards) AND NOT(OR(removal guards)).
    # vs the reference's sequential list.remove this is exact because a
    # removal guard embeds matched(id) = the guards of the appends that
    # PRECEDE it (state expansion above), so it can only fire where the
    # reference's remove would; the one real case (94518387, the Hanoi
    # USTH/VAST block) additionally removes only when the appending
    # trigger is absent, and its second append lives in the mutually
    # exclusive elif-Vietnam branch.  The generated VECTORS pin this
    # behaviorally (tests/test_functions.py).
    rem_by_id: dict[int, list] = {}
    for iid, g in removals:
        rem_by_id.setdefault(iid, []).append(g)
    members: dict[int, tuple] = {}
    for iid, gs in by_id.items():
        g = gs[0] if len(gs) == 1 else ("or", gs)
        if iid in rem_by_id:
            rg = rem_by_id[iid]
            rexpr = rg[0] if len(rg) == 1 else ("or", rg)
            g = ("and", [g, ("not", rexpr)])
        members[iid] = g
    return members


MEMBERS: dict[int, tuple] = _expand()


# ---------------------------------------------------------------------------
# pure-Python evaluation (test oracle for the compilers)
# ---------------------------------------------------------------------------


def _ev(e, raw, low):
    k = e[0]
    if k == "contains":
        return e[2] in (low if e[1] == "lower" else raw)
    if k == "contains_replaced":
        return e[3] in raw.replace(e[1], e[2])
    if k == "regex":
        return re.search(e[2], low if e[1] == "lower" else raw) is not None
    if k == "const":
        return e[1]
    if k == "and":
        return all(_ev(x, raw, low) for x in e[1])
    if k == "or":
        return any(_ev(x, raw, low) for x in e[1])
    if k == "not":
        return not _ev(e[1], raw, low)
    raise ValueError(k)


def match_python(s: str) -> list[int]:
    raw, low = s, s.lower()
    return sorted(i for i, g in MEMBERS.items() if _ev(g, raw, low))


# ---------------------------------------------------------------------------
# Spark Column compilation
# ---------------------------------------------------------------------------


def _col(e, raw: Column, low: Column) -> Column:
    k = e[0]
    if k == "contains":
        return (low if e[1] == "lower" else raw).contains(F.lit(e[2]))
    if k == "contains_replaced":
        return F.replace(raw, F.lit(e[1]), F.lit(e[2])).contains(F.lit(e[3]))
    if k == "regex":
        return (low if e[1] == "lower" else raw).rlike(e[2])
    if k == "const":
        return F.lit(bool(e[1]))
    if k == "and":
        return reduce(lambda a, b: a & b, (_col(x, raw, low) for x in e[1]))
    if k == "or":
        return reduce(lambda a, b: a | b, (_col(x, raw, low) for x in e[1]))
    if k == "not":
        return ~_col(e[1], raw, low)
    raise ValueError(k)


def match_column(aff: Column, chunk: int = 200) -> Column:
    """array<bigint> of matched institution ids, sorted.

    Built as chunked array concats (``chunk`` CASE branches per array)
    so whole-stage codegen splits cleanly instead of emitting one
    1,200-element array constructor."""
    raw, low = aff, F.lower(aff)
    items = sorted(MEMBERS.items())
    arrays = []
    for i in range(0, len(items), chunk):
        arrays.append(
            F.array(
                *[
                    F.when(_col(g, raw, low), F.lit(iid).cast("bigint"))
                    for iid, g in items[i : i + chunk]
                ]
            )
        )
    out = reduce(lambda a, b: F.concat(a, b), arrays)
    return F.array_sort(
        F.filter(out, lambda x: x.isNotNull())
    )


# ---------------------------------------------------------------------------
# DuckDB SQL compilation
# ---------------------------------------------------------------------------


def _q(s: str, dialect: str) -> str:
    lit = "'" + s.replace("'", "''") + "'"
    if dialect == "spark" and "\\" in s:
        # Spark SQL string literals are backslash-escaped; double them
        lit = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    return lit


def _sql(e, raw: str, low: str, d: str) -> str:
    k = e[0]
    if k == "contains":
        tgt = low if e[1] == "lower" else raw
        return f"contains({tgt}, {_q(e[2], d)})"
    if k == "contains_replaced":
        return (
            f"contains(replace({raw}, {_q(e[1], d)}, {_q(e[2], d)}),"
            f" {_q(e[3], d)})"
        )
    if k == "regex":
        tgt = low if e[1] == "lower" else raw
        fn = "regexp_matches" if d == "duckdb" else "regexp_like"
        return f"{fn}({tgt}, {_q(e[2], d)})"
    if k == "const":
        return "TRUE" if e[1] else "FALSE"
    if k == "and":
        return "(" + " AND ".join(_sql(x, raw, low, d) for x in e[1]) + ")"
    if k == "or":
        return "(" + " OR ".join(_sql(x, raw, low, d) for x in e[1]) + ")"
    if k == "not":
        return f"(NOT {_sql(e[1], raw, low, d)})"
    raise ValueError(k)


def match_sql(dialect: str, raw: str = "aff", low: str = "aff_low") -> str:
    """One expression: sorted BIGINT[] of matched institution ids.
    ``raw``/``low`` name the string column and its lowercased twin.
    Dialects differ only in the regex function name, string-literal
    escaping, and the array constructor/filter spellings."""
    items = sorted(MEMBERS.items())
    cases = ", ".join(
        f"CASE WHEN {_sql(g, raw, low, dialect)} THEN CAST({iid} AS BIGINT) END"
        for iid, g in items
    )
    if dialect == "duckdb":
        return f"list_sort(list_filter([{cases}], x -> x IS NOT NULL))"
    return (
        f"array_sort(filter(array({cases}), x -> x IS NOT NULL))"
    )


def match_sql_duckdb(raw: str = "aff", low: str = "aff_low") -> str:
    return match_sql("duckdb", raw, low)
