"""Topic/SDG classifier input preparation (reference
``notebooks/topics/topics_create_input.ipynb``,
``topic_text_cleaning.py``; the SDG frontfill shares the same
frontier shape).

Two operators: the INFERENCE FRONTIER — works that still need a
prediction, expressed as anti-joins against current predictions and
against declines, where a declined work re-enters ONLY when it changed
after the decline (the temporal arm ``updated <= last_declined``
excludes it; an update after the decline is a retry ticket) — and the
SCRIPT-GROUP text cleaning, which drops texts dominated by
non-Latin script groups the BERT model was not trained on and strips
those characters elsewhere, implemented exactly as the reference does:
per-character ``unicodedata`` classification in an Arrow-batched
pandas UDF (the oracle mirrors it with RE2 script classes).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType

from openalex_walden_spark.queries.registry import register

# ---------------------------------------------------------------------------
# Inference frontier
# ---------------------------------------------------------------------------
# Orders play works: updated_date from a lattice; the predicted arm
# covers %3=0; declines cover %5 in {1,2} with a decline date lattice
# such that some declined works HAVE changed since (retry) and some
# have not (stay excluded).  Eligibility: type in the allowed set and
# the min-length gate.

_FRONTIER_ORACLE = """
WITH works AS (
  SELECT o_orderkey AS id,
         concat('Title of work number ', CAST(o_orderkey AS VARCHAR)) AS title,
         CASE WHEN o_orderkey % 7 = 2 THEN 'short'
              ELSE concat('An abstract with enough content for work ',
                          CAST(o_orderkey AS VARCHAR)) END AS abstract,
         CASE CAST(o_orderkey % 6 AS INT)
           WHEN 0 THEN 'article' WHEN 1 THEN 'book' WHEN 2 THEN 'review'
           WHEN 3 THEN 'dataset' WHEN 4 THEN 'book-chapter' ELSE 'paratext'
         END AS type,
         CAST(o_orderkey % 100 AS BIGINT) AS updated_seq
  FROM orders
),
current_topics AS (
  SELECT id AS work_id FROM works WHERE id % 3 = 0
),
declined AS (
  SELECT id AS work_id, CAST(50 AS BIGINT) AS last_declined
  FROM works WHERE id % 5 IN (1, 2)
),
frontier AS (
  SELECT w.* FROM works w
  WHERE NOT EXISTS (SELECT 1 FROM current_topics t WHERE t.work_id = w.id)
    AND NOT EXISTS (SELECT 1 FROM declined d
                    WHERE d.work_id = w.id AND w.updated_seq <= d.last_declined)
    AND (length(w.title) >= 15 OR length(w.abstract) >= 30)
    AND w.type IN ('article', 'book', 'review', 'book-chapter')
)
SELECT type, CAST(count(*) AS BIGINT) AS n,
       CAST(count(CASE WHEN abstract = 'short' THEN 1 END) AS BIGINT)
         AS n_title_only
FROM frontier
GROUP BY type
ORDER BY type
"""


@register(
    "topics_inference_frontier",
    oracle=_FRONTIER_ORACLE,
    tags=("topics", "antijoin", "frontier"),
    tables=("orders",),
)
def topics_inference_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classifier input frontier (topics_create_input.ipynb):
    LEFT ANTI against current predictions, a TEMPORAL anti-join
    against declines — a declined work re-enters only after it changed
    (``updated <= last_declined`` excludes; newer update = retry) —
    then the type + min-content eligibility gate.  Processed rows are
    deleted after each run, so this frontier IS the work queue.  Both
    anti-joins key on the work id; the declines side is an aggregate
    of failures, orders of magnitude smaller than works."""
    return spark.sql("""
        WITH works AS (
          SELECT o_orderkey AS id,
                 concat('Title of work number ',
                        CAST(o_orderkey AS STRING)) AS title,
                 CASE WHEN o_orderkey % 7 = 2 THEN 'short'
                      ELSE concat('An abstract with enough content for work ',
                                  CAST(o_orderkey AS STRING)) END AS abstract,
                 CASE CAST(o_orderkey % 6 AS INT)
                   WHEN 0 THEN 'article' WHEN 1 THEN 'book'
                   WHEN 2 THEN 'review' WHEN 3 THEN 'dataset'
                   WHEN 4 THEN 'book-chapter' ELSE 'paratext'
                 END AS type,
                 CAST(o_orderkey % 100 AS BIGINT) AS updated_seq
          FROM orders
        ),
        current_topics AS (
          SELECT id AS work_id FROM works WHERE id % 3 = 0
        ),
        declined AS (
          SELECT id AS work_id, CAST(50 AS BIGINT) AS last_declined
          FROM works WHERE id % 5 IN (1, 2)
        ),
        frontier AS (
          SELECT w.* FROM works w
          LEFT ANTI JOIN current_topics t ON t.work_id = w.id
          LEFT ANTI JOIN declined d
            ON d.work_id = w.id AND w.updated_seq <= d.last_declined
          WHERE (length(w.title) >= 15 OR length(w.abstract) >= 30)
            AND w.type IN ('article', 'book', 'review', 'book-chapter')
        )
        SELECT type, count(*) AS n,
               count(CASE WHEN abstract = 'short' THEN 1 END) AS n_title_only
        FROM frontier
        GROUP BY type
        ORDER BY type
    """)


# ---------------------------------------------------------------------------
# Script-group text cleaning
# ---------------------------------------------------------------------------

_SKIP_PREFIXES = (
    "HIRAGANA", "CJK", "KATAKANA", "ARABIC", "HANGUL", "THAI",
    "DEVANAGARI", "BENGALI", "THAANA", "GUJARATI", "CYRILLIC",
)


@F.pandas_udf(IntegerType())
def _keep_ind(texts: pd.Series) -> pd.Series:
    """1 if no character belongs to a skip script group (the model was
    not trained on them), else 0 — the reference's name_to_keep_ind
    over unicodedata.name prefixes."""
    import unicodedata

    def one(t):
        if t is None:
            return 1
        for ch in t:
            try:
                if unicodedata.name(ch).split(" ")[0] in _SKIP_PREFIXES:
                    return 0
            except ValueError:
                continue
        return 1

    return texts.map(one)


@F.pandas_udf(StringType())
def _strip_nonlatin(texts: pd.Series) -> pd.Series:
    """Remove skip-script characters (remove_non_latin_characters);
    unnamed characters drop too, exactly as the reference's bare
    except does."""
    import unicodedata

    def one(t):
        if t is None:
            return None
        out = []
        for ch in t:
            try:
                if unicodedata.name(ch).split(" ")[0] not in _SKIP_PREFIXES:
                    out.append(ch)
            except ValueError:
                continue
        return "".join(out)

    return texts.map(one)


# Injected snippets per script group; the oracle's RE2 script classes
# agree with unicodedata's name prefixes for every injected character.
_CLEAN_RAW_SPARK = """CASE CAST(doc_id % 5 AS INT)
  WHEN 0 THEN concat(substr(text, 1, 30), ' \\u91cf\\u5b50\\u529b\\u5b66')
  WHEN 1 THEN concat(substr(text, 1, 30), ' \\u0434\\u0430\\u043d\\u043d\\u044b\\u0445')
  WHEN 2 THEN concat(substr(text, 1, 30), ' \\u0627\\u0644\\u0639\\u0631\\u0628')
  ELSE substr(text, 1, 40)
END"""

_CLEAN_RAW_DUCK = r"""CASE CAST(doc_id % 5 AS INT)
  WHEN 0 THEN concat(substr(text, 1, 30), ' ', chr(37327), chr(23376), chr(21147), chr(23398))
  WHEN 1 THEN concat(substr(text, 1, 30), ' ', chr(1076), chr(1072), chr(1085), chr(1085), chr(1099), chr(1093))
  WHEN 2 THEN concat(substr(text, 1, 30), ' ', chr(1575), chr(1604), chr(1593), chr(1585), chr(1576))
  ELSE substr(text, 1, 40)
END"""

_CLEAN_ORACLE = f"""
WITH raw AS (
  SELECT doc_id, {_CLEAN_RAW_DUCK} AS t FROM documents
),
cleaned AS (
  SELECT doc_id,
    CASE WHEN regexp_matches(t,
      '[\\p{{Han}}\\p{{Hiragana}}\\p{{Katakana}}\\p{{Arabic}}\\p{{Hangul}}\\p{{Thai}}\\p{{Devanagari}}\\p{{Bengali}}\\p{{Thaana}}\\p{{Gujarati}}\\p{{Cyrillic}}]')
      THEN 0 ELSE 1 END AS keep_ind,
    length(regexp_replace(t,
      '[\\p{{Han}}\\p{{Hiragana}}\\p{{Katakana}}\\p{{Arabic}}\\p{{Hangul}}\\p{{Thai}}\\p{{Devanagari}}\\p{{Bengali}}\\p{{Thaana}}\\p{{Gujarati}}\\p{{Cyrillic}}]',
      '', 'g')) AS clean_len
  FROM raw
)
SELECT keep_ind, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(clean_len) AS BIGINT) AS total_clean_len
FROM cleaned
GROUP BY keep_ind
ORDER BY keep_ind
"""


@register(
    "topics_text_cleaning",
    oracle=_CLEAN_ORACLE,
    tags=("topics", "pandas-udf", "text"),
    tables=("documents",),
)
def topics_text_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Script-group text cleaning (topic_text_cleaning.py): the keep
    indicator and the non-Latin strip run as the reference's OWN
    per-character unicodedata classification in Arrow-batched pandas
    UDFs; the oracle replays with RE2 script classes, which agree for
    every injected character.  Map-side only + one rollup."""
    raw = spark.table("documents").selectExpr(
        "doc_id", f"{_CLEAN_RAW_SPARK} AS t"
    )
    return (
        raw.select(
            _keep_ind("t").alias("keep_ind"),
            F.length(_strip_nonlatin("t")).alias("clean_len"),
        )
        .groupBy("keep_ind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("clean_len").alias("total_clean_len"),
        )
        .orderBy("keep_ind")
    )
