"""LLM-as-operator surface (SURVEY.md §2.10 "LLM-as-operator").

The reference treats model calls as scalar operators — ``ai_query(model,
prompt)`` for embeddings (``ContinuousEmbeddings.py:40-56``) and judge
verdicts (``AuthorshipQualityJudge.py:1-40``) — behind a cost guard that
meters a small chunk, projects the full-pass price, and demands approval
above a threshold (``utils/ai_query_cost_guard.py:57-97``).

Spark-first re-expression:

- ``llm_judge`` / ``embed_texts`` run over ``mapInPandas`` so the model
  executes once per Arrow batch with a per-executor client — the shape
  that scales to 1000 executors (the per-row-RPC shape does not).
- The model itself is pluggable. No model service exists in this
  environment, so the default ``backend="stub"`` is a DETERMINISTIC fake
  (md5-derived verdicts / hash-bucket embeddings) that keeps schema,
  batching, and plumbing real and oracle-checkable; any other backend
  raises ``NotImplementedError`` at the clearly-marked seam.
- ``guarded_llm_pass`` re-expresses the cost guard: meter a LIMIT-n
  chunk (one small Spark job), project cost to the full row count from
  MEASURED characters, and raise ``CostGuardError`` above the budget —
  never launch the full pass unmetered.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from openalex_walden_spark.deploy import ensure_shipped

_TOKENS_PER_CHAR = 0.25  # the reference's chars→tokens heuristic


class CostGuardError(RuntimeError):
    """Projected model-pass cost exceeds the caller's budget."""


@dataclass(frozen=True)
class CostEstimate:
    model: str
    metered_rows: int
    total_rows: int
    avg_input_chars: float
    avg_output_chars: float
    projected_usd: float


def _judge_one(text: str | None) -> tuple[str, int]:
    """Deterministic stub verdict: md5-derived, so a SQL oracle can
    replicate it exactly (verdict = 'flag' when the first-8-hex-digit
    integer of md5(text) is ≡ 0 mod 5; confidence is that integer mod
    1000)."""
    h = int(hashlib.md5((text or "").encode("utf-8")).hexdigest()[:8], 16)
    return ("flag" if h % 5 == 0 else "ok", h % 1000)


_JUDGE_FIELDS = [
    StructField("verdict", StringType()),
    StructField("conf_milli", IntegerType()),
]


def llm_judge(
    df: DataFrame,
    text_col: str,
    id_col: str,
    model: str = "stub-judge",
    backend: str = "stub",
) -> DataFrame:
    """Judge each row's text, returning (id, verdict, conf_milli).

    Arrow-batched ``mapInPandas``: the model client would be constructed
    once per partition (per-executor cache), each batch is one bulk
    inference call — the reference's ai_query batching contract.
    """
    if backend != "stub":
        # Seam for a real model service (HTTP client per executor).
        raise NotImplementedError(
            "only the deterministic 'stub' backend exists in this environment"
        )
    ensure_shipped(df.sparkSession)
    id_field = df.schema[id_col]
    out_schema = StructType(
        [StructField(id_col, id_field.dataType), *_JUDGE_FIELDS]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # model client init would go here, once per partition
        for pdf in batches:
            judged = [_judge_one(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "verdict": [v for v, _ in judged],
                    "conf_milli": pd.array(
                        [c for _, c in judged], dtype="int32"
                    ),
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, out_schema)


def embed_texts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    dim: int = 16,
    backend: str = "stub",
) -> DataFrame:
    """Embed each row's text into ARRAY<FLOAT> (the ContinuousEmbeddings
    shape). Stub backend: hash-bucket token counts, L1-normalized —
    deterministic across engines and executors."""
    if backend != "stub":
        raise NotImplementedError(
            "only the deterministic 'stub' backend exists in this environment"
        )
    ensure_shipped(df.sparkSession)
    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for t in pdf[text_col]:
                vec = [0.0] * dim
                toks = (t or "").split()
                for tok in toks:
                    b = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16)
                    vec[b % dim] += 1.0
                n = float(len(toks)) or 1.0
                embs.append([v / n for v in vec])
            yield pd.DataFrame({id_col: pdf[id_col], "embedding": embs})

    return df.select(id_col, text_col).mapInPandas(run, out_schema)


def guarded_llm_pass(
    df: DataFrame,
    text_col: str,
    id_col: str,
    model: str = "stub-judge",
    price_in_per_mtok: float = 1.0,
    price_out_per_mtok: float = 5.0,
    budget_usd: float = 10.0,
    chunk_rows: int = 256,
) -> tuple[DataFrame, CostEstimate]:
    """The reference's guard discipline: meter, project, gate, then run.

    One count job + one LIMIT-``chunk_rows`` metered inference job
    project the full-pass cost from measured input/output characters.
    Raises ``CostGuardError`` before any full-scale work when the
    projection exceeds ``budget_usd``. Returns (result_df, estimate) —
    result_df is lazy; the full pass has NOT run at return time.
    """
    total_rows = df.count()
    chunk = llm_judge(df.limit(chunk_rows), text_col, id_col, model=model)
    metered = (
        df.limit(chunk_rows)
        .select(F.length(F.col(text_col)).alias("in_chars"))
        .agg(
            F.count("*").cast(LongType()).alias("n"),
            F.avg("in_chars").alias("avg_in"),
        )
        .collect()[0]
    )
    out_chars = chunk.select(
        F.avg(F.length(F.col("verdict")) + F.lit(4)).alias("avg_out")
    ).collect()[0]["avg_out"]
    n = int(metered["n"] or 0)
    avg_in = float(metered["avg_in"] or 0.0)
    avg_out = float(out_chars or 0.0)
    per_row = (
        avg_in * _TOKENS_PER_CHAR * price_in_per_mtok
        + avg_out * _TOKENS_PER_CHAR * price_out_per_mtok
    ) / 1e6
    est = CostEstimate(
        model=model,
        metered_rows=n,
        total_rows=total_rows,
        avg_input_chars=round(avg_in, 1),
        avg_output_chars=round(avg_out, 1),
        projected_usd=round(per_row * total_rows, 6),
    )
    if est.projected_usd > budget_usd:
        raise CostGuardError(
            f"projected ${est.projected_usd} for {total_rows} rows exceeds "
            f"budget ${budget_usd} (model={model})"
        )
    return llm_judge(df, text_col, id_col, model=model), est
