#!/usr/bin/env python
"""Dev-time generator #2: extract the reference's post-processing
disambiguation cascade (``process_current_affiliation_with_ids`` +
the ``chinese_medical_university_affs`` helper,
notebooks/institutions/affiliation_string_parsing.py lines ~4850-7190:
268 appends + 407 removes keyed on the ALREADY-matched id set).

The function is stateful: rules read and mutate ``current_affs``
sequentially (Navarra swaps 88155538 <-> 175051016 in order, the
Applied-Materials rules probe ``len(current_affs) > 1`` mid-stream,
``list.remove`` drops ONE occurrence).  The extraction models the exact
semantics symbolically:

- per touched id, an INTEGER MULTIPLICITY expression (``m0`` = 1 if the
  id is in the input, appends +1, removes -1, if/else branches fork the
  state and merge with ``ite``)
- ``len(current_affs)`` = (count of input ids never touched) + sum of
  all touched multiplicities at that point
- final membership = multiplicity > 0; untouched input ids pass through

Output: openalex_walden_spark/functions/affpost_data.py with
  PP_TOUCHED  = sorted touched ids
  PP_FINAL    = [(id, num_expr), ...]  final multiplicity per touched id
  PP_EXAMPLES = [(i, input_ids, aff_string), ...]
  PP_VECTORS  = [(i, expected_sorted_ids), ...]

A fidelity gate replays every synthesized example (plus an extra-id and
a stripped-string variant) through the exec'd reference function and
refuses to emit on any disagreement.

Bool nodes: contains/contains_replaced/regex (as in gen #1), and/or/
not/const, ("gt", num, k).  Num nodes: ("m0", id), ("int", k),
("plus", [nums]), ("ite", bool, num, num), ("rest",) = untouched-input
count.
"""

from __future__ import annotations

import ast
import re
import sys

REF = "/root/reference/notebooks/institutions/affiliation_string_parsing.py"
OUT = "openalex_walden_spark/functions/affpost_data.py"


class Unhandled(Exception):
    pass


def _is_name(n, name):
    return isinstance(n, ast.Name) and n.id == name


def _is_lower_of_raw(n):
    return (
        isinstance(n, ast.Call)
        and isinstance(n.func, ast.Attribute)
        and n.func.attr == "lower"
        and _is_name(n.func.value, "aff_string")
    )


def _resolve_const(node, env):
    if isinstance(node, ast.Constant):
        return node.value
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
        return -_resolve_const(node.operand, env)
    if isinstance(node, ast.Name) and node.id in env:
        return env[node.id]
    if (
        isinstance(node, ast.Call)
        and isinstance(node.func, ast.Attribute)
        and node.func.attr == "lower"
        and isinstance(node.func.value, ast.Constant)
    ):
        return node.func.value.value.lower()
    if isinstance(node, ast.BinOp) and isinstance(node.op, ast.Add):
        return _resolve_const(node.left, env) + _resolve_const(node.right, env)
    raise Unhandled(f"non-literal: {ast.dump(node)[:80]}")


def _resolve_list(node, env, bindings):
    if isinstance(node, (ast.List, ast.Tuple)):
        return [_resolve_const(e, env) for e in node.elts]
    if isinstance(node, ast.Name) and node.id in bindings:
        return bindings[node.id]
    raise Unhandled(f"non-literal list: {ast.dump(node)[:80]}")


class Extractor:
    def __init__(self, touched):
        self.touched = touched  # final touched set (pass-1 result)
        self.bindings = {}

    # ---- numeric state helpers -------------------------------------
    def m(self, state, iid):
        return state.get(iid, ("m0", iid))

    def length_expr(self, state):
        terms = [("rest",)] + [self.m(state, i) for i in sorted(self.touched)]
        return ("plus", terms)

    # ---- condition conversion --------------------------------------
    def conv(self, node, state, env):
        if isinstance(node, ast.BoolOp):
            kids = [self.conv(v, state, env) for v in node.values]
            return ("and" if isinstance(node.op, ast.And) else "or", kids)
        if isinstance(node, ast.BinOp) and isinstance(
            node.op, (ast.BitAnd, ast.BitOr)
        ):
            return (
                "and" if isinstance(node.op, ast.BitAnd) else "or",
                [self.conv(node.left, state, env), self.conv(node.right, state, env)],
            )
        if isinstance(node, ast.UnaryOp) and isinstance(
            node.op, (ast.Not, ast.Invert)
        ):
            return ("not", self.conv(node.operand, state, env))
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            return ("const", bool(node.value))
        # bare `current_affs` truthiness (the `if not current_affs` guard)
        if _is_name(node, "current_affs"):
            return ("gt", self.length_expr(state), 0)
        if isinstance(node, ast.Compare) and len(node.ops) == 1:
            left, op, right = node.left, node.ops[0], node.comparators[0]
            if isinstance(op, ast.Gt):
                # len(current_affs) > k
                if (
                    isinstance(left, ast.Call)
                    and _is_name(left.func, "len")
                    and _is_name(left.args[0], "current_affs")
                ):
                    k = _resolve_const(right, env)
                    return ("gt", self.length_expr(state), k)
                raise Unhandled("Gt not on len()")
            if isinstance(op, (ast.In, ast.NotIn)):
                if _is_name(right, "current_affs"):
                    iid = _resolve_const(left, env)
                    e = ("gt", self.m(state, iid), 0)
                    return ("not", e) if isinstance(op, ast.NotIn) else e
                if (
                    isinstance(right, ast.Call)
                    and isinstance(right.func, ast.Attribute)
                    and right.func.attr == "replace"
                    and _is_name(right.func.value, "aff_string")
                ):
                    needle = _resolve_const(left, env)
                    find = _resolve_const(right.args[0], env)
                    repl = _resolve_const(right.args[1], env)
                    e = ("contains_replaced", find, repl, needle)
                    return ("not", e) if isinstance(op, ast.NotIn) else e
                mode = (
                    "lower"
                    if (_is_name(right, "lower_aff_string") or _is_lower_of_raw(right))
                    else "raw"
                )
                if not (
                    _is_name(right, "aff_string")
                    or mode == "lower"
                ):
                    raise Unhandled(f"In target {ast.dump(right)[:60]}")
                needle = _resolve_const(left, env)
                e = ("contains", mode, needle)
                return ("not", e) if isinstance(op, ast.NotIn) else e
            raise Unhandled(f"cmp {type(op).__name__}")
        if isinstance(node, ast.Call):
            fn = node.func
            if (
                isinstance(fn, ast.Attribute)
                and fn.attr == "search"
                and _is_name(fn.value, "re")
            ):
                pat = _resolve_const(node.args[0], env)
                mode = (
                    "lower"
                    if (_is_name(node.args[1], "lower_aff_string") or _is_lower_of_raw(node.args[1]))
                    else "raw"
                )
                return ("regex", mode, pat)
            if isinstance(fn, ast.Name) and fn.id in ("any", "all"):
                gen = node.args[0]
                g = gen.generators[0]
                if g.ifs:
                    raise Unhandled("guarded generator")
                var = g.target.id
                items = _resolve_list(g.iter, env, self.bindings)
                kids = [
                    self.conv(gen.elt, state, {**env, var: item})
                    for item in items
                ]
                return ("or" if fn.id == "any" else "and", kids)
            raise Unhandled(f"call {ast.dump(fn)[:60]}")
        raise Unhandled(type(node).__name__)

    # ---- statement walking with state forking ----------------------
    def walk(self, stmts, state, scen, actions):
        """``state``: id -> num expr (mutated).  ``scen``: (pos_ids,
        frags) example-synthesis context.  ``actions``: collected
        scenario records for example generation."""
        for st in stmts:
            if isinstance(st, ast.If):
                cond = self.conv(st.test, state, {})
                s_body = dict(state)
                s_else = dict(state)
                scen_body = self._extend_scen(scen, st.test, state)
                self.walk(st.body, s_body, scen_body, actions)
                if st.orelse:
                    self.walk(st.orelse, s_else, scen, actions)
                for iid in set(s_body) | set(s_else):
                    b = s_body.get(iid, ("m0", iid))
                    e = s_else.get(iid, ("m0", iid))
                    if b != e:
                        state[iid] = ("ite", cond, b, e)
                    elif iid in s_body or iid in s_else:
                        state[iid] = b
            elif (
                isinstance(st, ast.Expr)
                and isinstance(st.value, ast.Call)
                and isinstance(st.value.func, ast.Attribute)
                and st.value.func.attr in ("append", "remove")
                and _is_name(st.value.func.value, "current_affs")
            ):
                iid = _resolve_const(st.value.args[0], {})
                cur = self.m(state, iid)
                delta = ("int", 1 if st.value.func.attr == "append" else -1)
                state[iid] = ("plus", [cur, delta])
                actions.append((iid, st.value.func.attr, scen))
            elif isinstance(st, ast.Assign) and (
                isinstance(st.value, ast.Call)
                and _is_name(st.value.func, "chinese_medical_university_affs")
            ):
                self._chinese(st.value, state, scen, actions)
            elif isinstance(st, ast.Assign):
                if isinstance(st.value, (ast.List, ast.Tuple)):
                    try:
                        self.bindings[st.targets[0].id] = [
                            e.value for e in st.value.elts
                        ]
                    except Exception:
                        pass
                continue
            elif isinstance(st, (ast.Return, ast.Pass)):
                continue
            elif isinstance(st, ast.Expr) and isinstance(
                st.value, (ast.List, ast.Constant)
            ):
                continue
            else:
                raise Unhandled(
                    f"stmt {type(st).__name__} line {getattr(st,'lineno','?')}"
                )

    def _extend_scen(self, scen, test, state):
        pos_ids, frags = scen
        pos_ids, frags = list(pos_ids), list(frags)
        # shallow mining of the test for example synthesis
        for n in ast.walk(test):
            if isinstance(n, ast.Compare) and len(n.ops) == 1 and isinstance(n.ops[0], ast.In):
                right = n.comparators[0]
                try:
                    if _is_name(right, "current_affs"):
                        pos_ids.append(_resolve_const(n.left, {}))
                    elif _is_name(right, "aff_string") and isinstance(n.left, ast.Constant):
                        frags.append(n.left.value)
                    elif (_is_name(right, "lower_aff_string") or _is_lower_of_raw(right)) and isinstance(n.left, ast.Constant):
                        frags.append(n.left.value)
                except Unhandled:
                    pass
        return (pos_ids, frags)

    def _chinese(self, call, state, scen, actions):
        """Symbolic inlining of chinese_medical_university_affs (the
        parent-university consolidation + affiliated-hospital swap)."""
        env = {}
        a1 = _resolve_const(call.args[2], env)
        one_offs = _resolve_list(call.args[3], env, self.bindings)
        adds = _resolve_list(call.args[4], env, self.bindings)
        strs = _resolve_list(call.args[5], env, self.bindings)
        all_ids = [a1] + one_offs + adds
        c0 = ("or", [("gt", self.m(state, i), 0) for i in all_ids])
        # append a1 under c0
        state[a1] = ("ite", c0, ("plus", [self.m(state, a1), ("int", 1)]), self.m(state, a1))
        actions.append((a1, "append", ([all_ids[min(1, len(all_ids) - 1)]], [])))
        # hospital swap loops (exact statement order)
        for k, (add_k, _str_k) in enumerate(zip(adds, strs)):
            for j, (add_j, str_j) in enumerate(zip(adds, strs)):
                if j == k:
                    continue
                cond = (
                    "and",
                    [
                        c0,
                        ("gt", self.m(state, add_k), 0),
                        ("contains", "raw", str_j),
                    ],
                )
                # remove add_k (guarded by membership inside cond)
                state[add_k] = (
                    "ite", cond,
                    ("plus", [self.m(state, add_k), ("int", -1)]),
                    self.m(state, add_k),
                )
                # append add_j only if not already present
                cond_add = ("and", [cond, ("not", ("gt", self.m(state, add_j), 0))])
                state[add_j] = (
                    "ite", cond_add,
                    ("plus", [self.m(state, add_j), ("int", 1)]),
                    self.m(state, add_j),
                )
                actions.append((add_k, "swap", ([add_k], [str_j])))


# ---------------------------------------------------------------------------
# evaluation (fidelity gate + vectors)
# ---------------------------------------------------------------------------


def ev_num(e, input_ids, raw, low, rest, cache):
    r = cache.get(id(e))
    if r is not None:
        return r
    k = e[0]
    if k == "m0":
        r = 1 if e[1] in input_ids else 0
    elif k == "int":
        r = e[1]
    elif k == "plus":
        r = sum(ev_num(x, input_ids, raw, low, rest, cache) for x in e[1])
    elif k == "ite":
        r = (
            ev_num(e[2], input_ids, raw, low, rest, cache)
            if ev_bool(e[1], input_ids, raw, low, rest, cache)
            else ev_num(e[3], input_ids, raw, low, rest, cache)
        )
    elif k == "rest":
        r = rest
    else:
        raise ValueError(k)
    cache[id(e)] = r
    return r


def ev_bool(e, input_ids, raw, low, rest, cache):
    r = cache.get(id(e))
    if r is not None:
        return r
    k = e[0]
    if k == "contains":
        r = e[2] in (low if e[1] == "lower" else raw)
    elif k == "contains_replaced":
        r = e[3] in raw.replace(e[1], e[2])
    elif k == "regex":
        r = re.search(e[2], low if e[1] == "lower" else raw) is not None
    elif k == "const":
        r = e[1]
    elif k == "gt":
        r = ev_num(e[1], input_ids, raw, low, rest, cache) > e[2]
    elif k == "and":
        r = all(ev_bool(x, input_ids, raw, low, rest, cache) for x in e[1])
    elif k == "or":
        r = any(ev_bool(x, input_ids, raw, low, rest, cache) for x in e[1])
    elif k == "not":
        r = not ev_bool(e[1], input_ids, raw, low, rest, cache)
    else:
        raise ValueError(k)
    cache[id(e)] = r
    return r


def refine(final, touched, input_ids, s):
    raw, low = s, s.lower()
    inp = set(input_ids)
    rest = len(inp - touched)
    out = set(i for i in inp if i not in touched)
    cache = {True: None}
    cache.clear()
    for iid, expr in final:
        if ev_num(expr, inp, raw, low, rest, cache) > 0:
            out.add(iid)
    return sorted(out)


def main(out_path=None):
    out_path = out_path or (sys.argv[1] if len(sys.argv) > 1 else OUT)
    src = open(REF, encoding="utf-8").read()
    import hashlib
    source_sha = hashlib.sha256(src.encode("utf-8")).hexdigest()
    tree = ast.parse(src)
    fns = {n.name: n for n in tree.body if isinstance(n, ast.FunctionDef)}
    fpp = fns["process_current_affiliation_with_ids"]

    # pass 1: touched ids
    touched = set()
    for n in ast.walk(fpp):
        if (
            isinstance(n, ast.Call)
            and isinstance(n.func, ast.Attribute)
            and n.func.attr in ("append", "remove")
            and _is_name(n.func.value, "current_affs")
            and n.args
        ):
            a = n.args[0]
            if isinstance(a, ast.Constant):
                touched.add(a.value)
            elif isinstance(a, ast.UnaryOp) and isinstance(a.op, ast.USub):
                touched.add(-a.operand.value)
        if isinstance(n, ast.Call) and _is_name(n.func, "chinese_medical_university_affs"):
            for argidx in (2,):
                if isinstance(n.args[argidx], ast.Constant):
                    touched.add(n.args[argidx].value)
            for argidx in (3, 4):
                if isinstance(n.args[argidx], (ast.List, ast.Tuple)):
                    for e in n.args[argidx].elts:
                        if isinstance(e, ast.Constant):
                            touched.add(e.value)

    ex = Extractor(touched)
    state: dict = {}
    actions: list = []
    ex.walk(fpp.body, state, ([], []), actions)
    # every touched id needs a final expression — ids collected in
    # pass 1 but never assigned (the helper's one_off lists) keep their
    # identity multiplicity
    for iid in touched:
        state.setdefault(iid, ("m0", iid))
    final = sorted(state.items())
    print(f"touched: {len(touched)}  final exprs: {len(final)}  actions: {len(actions)}")

    # reference function (dev-time fidelity gate)
    ns = {"re": re}
    mod = ast.Module(
        body=[fns["chinese_medical_university_affs"], fpp], type_ignores=[]
    )
    exec(compile(mod, REF, "exec"), ns)  # noqa: S102
    ref_fn = ns["process_current_affiliation_with_ids"]

    # examples: per action scenario -> (input ids, string); plus variants
    examples = []
    seen = set()
    for iid, kind, (pos_ids, frags) in actions:
        ids_only = [p for p in pos_ids if isinstance(p, int)]
        base_ids = sorted(set(ids_only + [iid])) or [iid]
        s = " ".join(dict.fromkeys(fr.strip() for fr in frags if fr.strip()))
        for ids_v, s_v in (
            (base_ids, s),
            (base_ids + [999999999], s),
            (base_ids, ""),
        ):
            key = (tuple(ids_v), s_v)
            if key in seen:
                continue
            seen.add(key)
            examples.append((list(ids_v), s_v))
    # passthrough-only examples
    examples.append(([999999999, 12345], "Some plain affiliation"))
    examples.append(([], ""))
    print(f"examples: {len(examples)}")

    bad = 0
    tset = set(touched)
    for ids, s in examples:
        mine = refine(final, tset, ids, s)
        theirs = sorted(set(ref_fn(list(ids), s)))
        if mine != theirs:
            bad += 1
            if bad <= 10:
                print(f"MISMATCH ids={ids} s={s!r}\n  mine={mine}\n  ref ={theirs}")
    if bad:
        print(f"FIDELITY GATE FAILED: {bad}/{len(examples)}")
        return 1
    print("fidelity gate: OK")

    vectors = [
        (i, refine(final, tset, ids, s)) for i, (ids, s) in enumerate(examples)
    ]

    # serialize the expression DAG WITH SHARING as a node table — the
    # raw tuples expand to ~9e9 tree nodes through the sequential ite
    # chains (measured), so children are INDEX references.  Node forms:
    #   ("contains", mode, s) ("contains_replaced", f, r, s)
    #   ("regex", mode, p) ("const", b) ("m0", id) ("int", k) ("rest",)
    #   ("and"|"or"|"plus", (child_idx...)) ("not", idx)
    #   ("ite", cond_idx, then_idx, else_idx) ("gt", num_idx, k)
    nodes: list = []
    index: dict = {}

    def enc(e):
        key = id(e)
        if key in index:
            return index[key]
        k = e[0]
        if k in ("and", "or", "plus"):
            row = (k, tuple(enc(x) for x in e[1]))
        elif k == "not":
            row = ("not", enc(e[1]))
        elif k == "ite":
            row = ("ite", enc(e[1]), enc(e[2]), enc(e[3]))
        elif k == "gt":
            row = ("gt", enc(e[1]), e[2])
        else:
            row = e  # leaf
        nodes.append(row)
        index[key] = len(nodes) - 1
        return index[key]

    final_idx = [(iid, enc(expr)) for iid, expr in final]
    print(f"node table: {len(nodes)} rows")
    with open(out_path, "w", encoding="utf-8") as fh:
        fh.write(
            '"""GENERATED by scripts/gen_affiliation_postprocess.py — the\n'
            "reference's post-matching disambiguation cascade\n"
            "(process_current_affiliation_with_ids) as a SHARED expression\n"
            "DAG (node table with index references; the inline expansion\n"
            'is ~9e9 nodes).  Behavioral data port; do not edit."""\n\n'
        )
        fh.write(f"SOURCE_SHA256 = {source_sha!r}\n\n")
        fh.write(f"PP_TOUCHED = {sorted(touched)!r}\n\n")
        fh.write(f"PP_NODES = {nodes!r}\n\n")
        fh.write(f"PP_FINAL = {final_idx!r}\n\n")
        ex_rows = [(i, ids, s) for i, (ids, s) in enumerate(examples)]
        fh.write(f"PP_EXAMPLES = {ex_rows!r}\n\n")
        fh.write(f"PP_VECTORS = {vectors!r}\n")
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
