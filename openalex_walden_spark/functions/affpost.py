"""Post-matching affiliation disambiguation: vectorized DAG evaluator.

``process_current_affiliation_with_ids`` (the reference's second
cascade: 268 appends + 407 removes keyed on the ALREADY-matched id set,
with sequential list semantics — mid-stream ``len() > 1`` probes,
one-occurrence removes, the Navarra swap pairs, the
chinese_medical_university_affs hospital consolidation) is extracted by
``scripts/gen_affiliation_postprocess.py`` into per-institution integer
MULTIPLICITY expressions over (input id set, affiliation string).

Why not SQL here: the expressions form a DAG whose inline expansion
measures ~9e9 tree nodes (the sequential ite chains reference each
other), so no SQL text can express it directly and a CSE rewrite needs
~1,000 chained lateral columns.  This is the catalog's one genuinely
non-expression-compilable operator, so the execution path is the
sanctioned Arrow slow path: a ``mapInPandas`` batch evaluator that
computes every DAG node ONCE PER BATCH as a numpy vector (never per
row), making the cost O(21k nodes x batch) of primitive vector ops.
The correctness pin is the generator's fidelity gate (every synthesized
example replayed through the exec'd reference function) plus the
generated vectors in the driver oracle and pytest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from openalex_walden_spark.functions.affpost_data import (
    PP_FINAL,
    PP_NODES,
    PP_TOUCHED,
)

_TOUCHED = set(PP_TOUCHED)


def _eval_nodes(id_sets: list[frozenset], raw: pd.Series) -> dict[int, np.ndarray]:
    """Evaluate every DAG node as a vector over the batch."""
    n = len(raw)
    low = raw.str.lower()
    rest = np.fromiter(
        (len(s - _TOUCHED) for s in id_sets), dtype=np.int64, count=n
    )
    out: list[np.ndarray] = [None] * len(PP_NODES)  # type: ignore[list-item]
    for idx, node in enumerate(PP_NODES):
        k = node[0]
        if k == "contains":
            tgt = low if node[1] == "lower" else raw
            v = tgt.str.contains(node[2], regex=False).to_numpy()
        elif k == "contains_replaced":
            v = (
                raw.str.replace(node[1], node[2], regex=False)
                .str.contains(node[3], regex=False)
                .to_numpy()
            )
        elif k == "regex":
            tgt = low if node[1] == "lower" else raw
            v = tgt.str.contains(node[2], regex=True).to_numpy()
        elif k == "const":
            v = np.full(n, bool(node[1]))
        elif k == "m0":
            iid = node[1]
            v = np.fromiter(
                (1 if iid in s else 0 for s in id_sets), dtype=np.int64, count=n
            )
        elif k == "int":
            v = np.full(n, node[1], dtype=np.int64)
        elif k == "rest":
            v = rest
        elif k == "and":
            v = np.logical_and.reduce([out[c] for c in node[1]])
        elif k == "or":
            v = np.logical_or.reduce([out[c] for c in node[1]])
        elif k == "not":
            v = ~out[node[1]]
        elif k == "plus":
            v = np.sum([out[c] for c in node[1]], axis=0, dtype=np.int64)
        elif k == "ite":
            v = np.where(out[node[1]], out[node[2]], out[node[3]])
        elif k == "gt":
            v = out[node[1]] > node[2]
        else:  # pragma: no cover
            raise ValueError(k)
        out[idx] = v
    return out  # type: ignore[return-value]


def refine_batch(input_ids: pd.Series, aff: pd.Series) -> pd.Series:
    """Vectorized refinement: per row, the final sorted id list."""
    # Arrow hands array columns over as numpy arrays — no bool coercion
    id_sets = [
        frozenset(x) if x is not None and len(x) else frozenset()
        for x in input_ids
    ]
    raw = aff.fillna("").astype(str)
    node_vals = _eval_nodes(id_sets, raw)
    finals = [(iid, node_vals[idx]) for iid, idx in PP_FINAL]
    results = []
    for r, s in enumerate(id_sets):
        keep = {i for i in s if i not in _TOUCHED}
        for iid, vec in finals:
            if vec[r] > 0:
                keep.add(iid)
        results.append(sorted(keep))
    return pd.Series(results, index=aff.index)


def refine(input_ids: list[int], aff_string: str) -> list[int]:
    """Scalar convenience wrapper (tests)."""
    return list(
        refine_batch(pd.Series([input_ids]), pd.Series([aff_string])).iloc[0]
    )

