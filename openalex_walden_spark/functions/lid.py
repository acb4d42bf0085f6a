"""Character-trigram language ID (P17) — model-file serving seam.

The reference scores language with a fastText model invoked from the
locations plane (``CreateLocationsMapped.sql:26``). The open engine
ships the same *operational* shape — a model artifact on disk, loaded
once per Python worker, applied Arrow-batch-at-a-time through
``mapInPandas`` — with a deterministic trigram-profile model so the
operator stays oracle-checkable (the pattern that made the LLM judge
checkable in ``functions/llm.py``).

Scoring: for each language, sum the integer weights of every 1/2/3-gram
occurrence of the lowercased text that appears in that language's
profile (mixed-order Cavnar-Trenkle profile: unigrams carry script
identity, trigrams carry function-word shape); argmax wins, ties break
alphabetically, no hit at all → 'und'. Integer sums + total ordering ⇒
bit-exact replication in SQL (the oracle joins the same
(lang, ngram, weight) rows relationally).

Swap ``lid_model.json`` for real fastText weights and ``_score_batch``
for the model's predict to productionize; the Spark plumbing is final.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

LID_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("labeled_lang", StringType()),
        StructField("detected_lang", StringType()),
        StructField("best_score", LongType()),
    ]
)


@lru_cache(maxsize=1)
def load_model(path: str | None = None) -> dict[str, dict[str, int]]:
    """Per-worker model load (lru_cache — workers are reused across
    batches, the reference's per-executor model cache pattern).

    Reads via importlib.resources so it works when the package is
    shipped to executors as a zip (spark.submit.pyFiles / addPyFile) —
    a plain ``open(__file__-relative)`` breaks inside the archive.
    """
    if path is not None:
        with open(path, encoding="utf-8") as f:
            return json.load(f)["langs"]
    from importlib.resources import files

    data = files("openalex_walden_spark.functions").joinpath("lid_model.json").read_text(
        encoding="utf-8"
    )
    return json.loads(data)["langs"]


def detect_one(text: str | None, model: dict[str, dict[str, int]]) -> tuple[str, int]:
    """(detected_lang, best_score) for one string; ('und', 0) if no
    profile trigram fires."""
    if not text:
        return "und", 0
    t = text.lower()
    tris = [t[i : i + n] for n in (1, 2, 3) for i in range(len(t) - n + 1)]
    best_lang, best_score = "und", 0
    for lang in sorted(model):  # alphabetical ⇒ deterministic tie-break
        prof = model[lang]
        score = sum(prof.get(tri, 0) for tri in tris)
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang, best_score


def lid_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body over (doc_id, labeled_lang, text)."""
    model = load_model()
    for pdf in batches:
        out = [detect_one(x, model) for x in pdf["text"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "labeled_lang": pdf["labeled_lang"],
                "detected_lang": [o[0] for o in out],
                "best_score": pd.Series([o[1] for o in out], dtype="int64"),
            }
        )


def detect_language(df: DataFrame, text_col: str, id_col: str, label_col: str) -> DataFrame:
    """Classify ``text_col`` per row; returns LID_SCHEMA rows."""
    src = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(label_col).alias("labeled_lang"),
        F.col(text_col).alias("text"),
    )
    return src.mapInPandas(lid_batches, LID_SCHEMA)


def model_values_sql() -> str:
    """The model as a SQL VALUES relation ``(lang, tri, w)`` — generated
    from the SAME data file the classifier loads, so oracle and operator
    can never drift."""
    model = load_model()
    rows = []
    for lang in sorted(model):
        for tri, w in sorted(model[lang].items()):
            esc = tri.replace("'", "''")
            rows.append(f"('{lang}', '{esc}', {int(w)})")
    return "(VALUES " + ", ".join(rows) + ") AS m(lang, tri, w)"
