"""LLM-training-data pipeline operators over ``documents`` / ``embeddings``.

Beyond-reference operators (first-class per the build brief): exact
dedup, MinHash+LSH near-dup detection, SimHash, n-gram Jaccard, text
quality/language-ID analytics, and similarity search (brute-force +
IVF-style partitioned). The reference's nearest analogue is the
vector-search subsystem (``notebooks/vector_search/``) and the dedup
ladders (D3); these generalize both to a training-data pipeline.

Float-parity engineering: dot products and norms are sequential left
folds (Spark ``aggregate()`` HOF ≡ DuckDB ``list_sum``, verified
bit-exact), so even cosine scores hash-match the oracle.

Scale notes inline — every near-dup path is blocked/banded (no all-pairs
join anywhere), which is what survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from openalex_walden_spark.queries.registry import register

# --------------------------------------------------------------------------
# shared fragments (kept textually parallel between engines)
# --------------------------------------------------------------------------
# Spark-SQL token array of lowercased text, empties removed.
_TOKS_SPARK = "filter(split(lower({c}), '\\\\s+'), x -> x != '')"
# DuckDB equivalent.
_TOKS_DUCK = "list_filter(string_split_regex(lower({c}), '\\s+'), x -> x <> '')"

# 60-bit engine-portable hash (see functions/hashing.py).
_H_SPARK = "cast(conv(substr(md5({x}), 1, 15), 16, 10) as bigint)"
_H_DUCK = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"


def _spark_corpus_neardup(spark: SparkSession) -> DataFrame:
    """documents ∪ synthetic near-duplicates (doc_id+10000, 3 tokens
    appended) — gives LSH a known-positive set to find."""
    d = spark.table("documents").select("doc_id", "text")
    dups = (
        d.where(F.col("doc_id") % 5 == 0)
        .select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz11 zz22 zz33")).alias("text"),
        )
    )
    return d.unionByName(dups)


_DUCK_CORPUS_NEARDUP = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, text || ' zz11 zz22 zz33' AS text
  FROM documents WHERE doc_id % 5 = 0
"""


# --------------------------------------------------------------------------
# token / quality statistics
# --------------------------------------------------------------------------
_QUALITY_SQL = f"""
SELECT doc_id,
       length(text)::BIGINT AS n_chars,
       len({_TOKS_DUCK.format(c='text')})::BIGINT AS n_tokens,
       length(regexp_replace(lower(text), '[^a-z]', '', 'g'))::DOUBLE
         / greatest(length(text), 1)::DOUBLE AS alpha_ratio,
       length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
         / greatest(length(text), 1)::DOUBLE AS digit_ratio,
       length(regexp_replace(text, '[^ ]', '', 'g'))::DOUBLE
         / greatest(length(text), 1)::DOUBLE AS space_ratio,
       (length(text) - length(regexp_replace(text, '[^ ]', '', 'g')))::DOUBLE
         / greatest(len({_TOKS_DUCK.format(c='text')}), 1)::DOUBLE AS mean_token_len
FROM documents
"""


@register("text_quality_features", oracle=_QUALITY_SQL, tags=("llmdata", "text"), tables=("documents",))
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring battery: char/token counts and character-class
    ratios, each a single integer-count division (oracle bit-parity).
    Pure column expressions — whole-stage codegen, no Python."""
    from openalex_walden_spark.functions.textstats import quality_features

    d = spark.table("documents")
    feats = quality_features(F.col("text"))
    return d.select(
        "doc_id",
        feats["n_chars"].alias("n_chars"),
        feats["n_tokens"].alias("n_tokens"),
        feats["alpha_ratio"].alias("alpha_ratio"),
        feats["digit_ratio"].alias("digit_ratio"),
        feats["space_ratio"].alias("space_ratio"),
        feats["mean_token_len"].alias("mean_token_len"),
    )


# --------------------------------------------------------------------------
# language ID (P17): character-trigram model through the serving seam
# --------------------------------------------------------------------------
# The fixture's `lang` column is a LABEL only (every document's text is
# the same synthetic English-ish vocabulary), so the query synthesizes a
# held-out prose snippet in the labeled language — identically on both
# engines — and runs the model over it. Model accuracy on a larger
# held-out fixture (incl. ru/ja) is pinned ≥95 % by
# tests/test_functions.py::test_lid_model_accuracy.
_LID_SNIPPETS = {
    "en": "we evaluate the system on a collection of documents and report"
          " the accuracy of the results for each of the tasks below",
    "de": "wir bewerten das system anhand einer sammlung von dokumenten"
          " und berichten die genauigkeit der ergebnisse für jede aufgabe",
    "es": "evaluamos el sistema sobre una colección de documentos y"
          " presentamos la precisión de los resultados para cada tarea",
    "fr": "nous évaluons le système sur une collection de documents et"
          " présentons la précision des résultats pour chacune des tâches",
    "zh": "我们在一个文档集合上评估该系统并在下表中报告每个任务的结果准确率",
}


def _lid_sql() -> str:
    from openalex_walden_spark.functions.lid import model_values_sql

    snippet_case = " ".join(
        f"WHEN '{lang}' THEN '{_LID_SNIPPETS[lang]}'" for lang in sorted(_LID_SNIPPETS)
    )
    return f"""
WITH src AS (
  SELECT doc_id, lang AS labeled_lang,
         lower(CASE lang {snippet_case} END) AS t
  FROM documents
),
tris AS (
  SELECT doc_id,
         unnest(list_concat(list_concat(
           list_transform(range(1, length(t) + 1), i -> substr(t, i, 1)),
           list_transform(range(1, length(t)),     i -> substr(t, i, 2))),
           list_transform(range(1, length(t) - 1), i -> substr(t, i, 3)))) AS tri
  FROM src
),
scores AS (
  SELECT tris.doc_id, m.lang, sum(m.w) AS s
  FROM tris JOIN {model_values_sql()} ON tris.tri = m.tri
  GROUP BY tris.doc_id, m.lang
),
best AS (
  SELECT doc_id, lang, s,
         row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, lang ASC) AS rn
  FROM scores
)
SELECT src.doc_id, src.labeled_lang,
       COALESCE(b.lang, 'und') AS detected_lang,
       COALESCE(b.s, 0)::BIGINT AS best_score
FROM src LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON src.doc_id = b.doc_id
"""


@register("text_lang_id", oracle=_lid_sql(), tags=("llmdata", "text", "P17"), tables=("documents",))
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-grade language ID (P17): a character-trigram profile model
    (``functions/lid_model.json``, 7 languages incl. non-Latin scripts)
    served through mapInPandas with a per-worker model cache — the
    operational shape of the reference's fastText call
    (CreateLocationsMapped.sql:26). Scores are integer trigram-weight
    sums with alphabetical tie-break, so the DuckDB oracle replays the
    SAME model file relationally (join trigrams to the (lang,tri,w)
    VALUES) bit-for-bit. 'und' when no profile trigram fires."""
    from openalex_walden_spark.deploy import ensure_shipped
    from openalex_walden_spark.functions.lid import detect_language

    ensure_shipped(spark)
    d = spark.table("documents")
    snippet = None
    for lang, txt in sorted(_LID_SNIPPETS.items()):
        cond = F.col("lang") == lang
        snippet = F.when(cond, F.lit(txt)) if snippet is None else snippet.when(cond, F.lit(txt))
    src = d.select("doc_id", F.col("lang"), snippet.alias("synth_text"))
    return detect_language(src, "synth_text", "doc_id", "lang")


# --------------------------------------------------------------------------
# exact dedup via canonical fingerprint
# --------------------------------------------------------------------------
_EXACT_DEDUP_SQL = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 20000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
),
fps AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct({_TOKS_DUCK.format(c='text')})), ' ')) AS fp
  FROM corpus
)
SELECT fp AS fingerprint,
       MIN(doc_id) AS canonical_id,
       COUNT(*) AS n_docs,
       string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS member_ids
FROM fps
GROUP BY fp
HAVING COUNT(*) > 1
"""


@register("dedup_exact_documents", oracle=_EXACT_DEDUP_SQL, tags=("llmdata", "dedup"), tables=("documents",))
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: canonical fingerprint (md5 of sorted distinct tokens)
    → hash groupBy → deterministic canonical pick (min doc_id).

    The corpus unions synthetic exact copies (doc_id+20000) so the dup
    groups are non-empty by construction. Scale: one shuffle on the
    16-byte fingerprint; at 100 TB this is the cheapest dedup pass and
    runs before any fuzzy stage.
    """
    d = spark.table("documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.where(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 20000).alias("doc_id"), "text"
        )
    )
    from openalex_walden_spark.functions.textstats import fingerprint

    corpus = corpus.repartition(spark.sparkContext.defaultParallelism, F.col("doc_id"))
    return (
        corpus.select("doc_id", fingerprint(F.col("text")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count("*").alias("n_docs"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")), lambda x: x.cast("string")
                ),
                ",",
            ).alias("member_ids"),
        )
        .where(F.col("n_docs") > 1)
    )


# --------------------------------------------------------------------------
# MinHash + LSH banding near-dup pairs
# --------------------------------------------------------------------------
_N_HASHES = 16
_N_BANDS = 4
_BAND_W = _N_HASHES // _N_BANDS


def _duck_shingles(c: str) -> str:
    toks = _TOKS_DUCK.format(c=c)
    return (
        f"CASE WHEN len({toks}) >= 3 THEN "
        f"list_distinct(list_transform(range(1, len({toks}) - 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + 2), ' '))) "
        f"WHEN len({toks}) > 0 THEN [array_to_string({toks}, ' ')] "
        f"ELSE [] END"
    )


# Double-hashing permutation family (one md5 per shingle, not one per
# permutation): m = md5(s); h1/h2 = two disjoint 56-bit halves of m;
# perm_i(s) = h1 + i*h2  (classic minhash double hashing; max value
# 15*2^56 + 2^56 = 2^60 — no BIGINT overflow in either engine).
_DUCK_HASHED = (
    "list_transform(list_transform(sh, s -> md5(s)), m -> "
    "{'h1': ('0x' || substr(m, 1, 14))::BIGINT, "
    "'h2': ('0x' || substr(m, 15, 14))::BIGINT})"
)


def _duck_minhash(i: int) -> str:
    return f"list_min(list_transform(hs, p -> p.h1 + {i} * p.h2))"


_LSH_SQL_PARTS = []
for _b in range(_N_BANDS):
    _cols = ", ".join(
        f"sig[{_b * _BAND_W + j + 1}]::VARCHAR" for j in range(_BAND_W)
    )
    _LSH_SQL_PARTS.append(
        f"SELECT doc_id, sh, {_b} AS band_idx, "
        + _H_DUCK.format(x=f"concat_ws(',', {_cols})")
        + " AS band_hash FROM sigs"
    )

_LSH_SQL = f"""
WITH corpus AS ({_DUCK_CORPUS_NEARDUP}),
shingled AS (
  SELECT doc_id, {_duck_shingles('text')} AS sh FROM corpus
),
hashed AS (
  SELECT doc_id, sh, {_DUCK_HASHED} AS hs
  FROM shingled WHERE len(sh) > 0
),
sigs AS (
  SELECT doc_id, sh,
         [{', '.join(_duck_minhash(i) for i in range(_N_HASHES))}] AS sig
  FROM hashed
),
bands AS (
  {' UNION ALL '.join(_LSH_SQL_PARTS)}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
),
scored AS (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(sa.sh, sb.sh))::DOUBLE
           / len(list_distinct(list_concat(sa.sh, sb.sh)))::DOUBLE AS jaccard
  FROM cand c
  JOIN shingled sa ON sa.doc_id = c.doc_a
  JOIN shingled sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, jaccard FROM scored WHERE jaccard >= 0.5
"""


@register("dedup_minhash_lsh_pairs", oracle=_LSH_SQL, tags=("llmdata", "dedup", "lsh"), tables=("documents",))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection: 3-token shingles → 16-perm MinHash → 4-band LSH
    → candidate pairs ONLY within a (band, bucket) — never all-pairs —
    → exact shingle-Jaccard verify ≥ 0.5.

    Implementation is fully relational (shingle ROWS, not arrays):
    tokens posexplode → lead()-window shingling → distinct shingle rows →
    one md5 per shingle → 16 codegen'd MIN aggregates for the signature →
    band-bucket equi-join for candidates → set-similarity join (count of
    shared shingles) for the exact Jaccard. Arrays/HOFs only tokenize;
    everything else is joins + hash aggregates that whole-stage codegen
    vectorizes — and nothing here caches complex types (array-typed cache
    materialization measured pathologically slow).

    Scale design: candidate volume is bounded by bucket occupancy; the
    Jaccard verify touches only candidate pairs; every stage shuffles on
    a key (doc_id / shingle / band) — the shape that survives 100 TB
    where any all-pairs comparison cannot.
    """
    corpus = _spark_corpus_neardup(spark).repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    # Shingles are built per-row with array HOFs — no explode+window
    # shuffle/sort, no global distinct: array_distinct dedups within the
    # doc (the only dedup the signature needs), so the first shuffle in
    # the whole pipeline is the signature groupBy. Docs with >= 3 tokens
    # contribute complete trigrams; shorter docs contribute their whole
    # text as the single shingle (the oracle's CASE fallback).
    shingle_arr = """
        CASE WHEN size(toks) >= 3 THEN array_distinct(transform(
               sequence(0, size(toks) - 3),
               i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
             WHEN size(toks) > 0 THEN array(array_join(toks, ' '))
             ELSE array() END
    """
    # persist_scalar: exploded rows are (long, string) only — the toks
    # array is projected away BEFORE the cache (caching container
    # columns is the measured memory cliff); MEMORY_AND_DISK spills.
    from openalex_walden_spark.operators.guardrails import persist_scalar

    shingle_rows = persist_scalar(
        corpus.withColumn("toks", F.expr(_TOKS_SPARK.format(c="text")))
        .select("doc_id", F.explode(F.expr(shingle_arr)).alias("s"))
    )

    # Signatures via explode + ONE 16-MIN hash aggregate — deliberately
    # NOT per-row array HOFs, although the DuckDB oracle uses that form:
    # Catalyst inlines chained HOF projections (ProjectCollapse) and
    # does not hoist loop-invariant subexpressions out of lambda
    # bodies, so an array-form signature re-evaluates md5 ~32x per
    # shingle (measured 23s vs 3s at sf0.1). The exploded form pays one
    # shuffle but hashes each shingle exactly once and the 16 MINs run
    # in one codegen'd aggregate.
    hashed = shingle_rows.select(
        "doc_id",
        F.expr("cast(conv(substr(md5(s), 1, 14), 16, 10) as bigint)").alias("h1"),
        F.expr("cast(conv(substr(md5(s), 15, 14), 16, 10) as bigint)").alias("h2"),
    )
    sigs = hashed.groupBy("doc_id").agg(
        *[F.min(F.col("h1") + i * F.col("h2")).alias(f"sig_{i}") for i in range(_N_HASHES)]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.expr(
                    _H_SPARK.format(
                        x="concat_ws(',', "
                        + ", ".join(
                            f"cast(sig_{b * _BAND_W + j} as string)"
                            for j in range(_BAND_W)
                        )
                        + ")"
                    )
                ).alias("band_hash"),
            )
            for b in range(_N_BANDS)
        ]
    )
    # bands is consumed by BOTH sides of the self-join and cand by both
    # the intersection and the final score join — persist the small
    # reused frames (one row per doc per band / one row per candidate
    # pair) or the signature aggregation recomputes once per consumer.
    # On a cluster this is the standard persist-the-reused-subplan rule.
    bands = persist_scalar(
        sigs.select("doc_id", F.explode(band_structs).alias("band"))
        .select("doc_id", "band.band_idx", "band.band_hash")
    )

    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    cand = persist_scalar(cand)

    # |A ∩ B| as a set-similarity join over shingle rows restricted to
    # candidates; |A ∪ B| = |A| + |B| - |A ∩ B|.
    sizes = shingle_rows.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sa = shingle_rows.select(F.col("doc_id").alias("doc_a"), "s")
    sb = shingle_rows.select(F.col("doc_id").alias("doc_b"), "s")
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    scored = (
        cand.join(inter, ["doc_a", "doc_b"], "left")
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.coalesce(F.col("n_inter"), F.lit(0)).cast("double")
                / (F.col("n_a") + F.col("n_b") - F.coalesce(F.col("n_inter"), F.lit(0))).cast("double")
            ).alias("jaccard"),
        )
    )
    return scored.where(F.col("jaccard") >= 0.5)


# --------------------------------------------------------------------------
# SimHash signatures (16-bit)
# --------------------------------------------------------------------------
_SIMHASH_SQL = f"""
WITH hashed AS (
  SELECT doc_id,
         list_transform({_TOKS_DUCK.format(c='text')}, t -> {_H_DUCK.format(x='t')}) AS hs
  FROM documents
)
SELECT doc_id,
       list_sum(list_transform(range(0, 16), b ->
         CASE WHEN list_sum(list_transform(hs,
                     h -> ((h // (2::BIGINT ** b)::BIGINT) % 2) * 2 - 1)) > 0
              THEN (2::BIGINT ** b)::BIGINT ELSE 0 END))::BIGINT AS simhash
FROM hashed
"""


@register("dedup_simhash", oracle=_SIMHASH_SQL, tags=("llmdata", "dedup", "simhash"), tables=("documents",))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash: per-bit majority vote over token hashes (with
    multiplicity). Buckets with equal simhash are near-dup candidates at
    hamming distance 0; pure integer arithmetic so the oracle matches
    exactly.

    Shape: explode tokens → one md5 per token → 16 codegen'd SUM
    aggregates per doc (nested HOF folds evaluate interpreted and were
    ~5x slower). One shuffle on doc_id, vectorized the whole way."""
    toks = _TOKS_SPARK.format(c="text")
    d = spark.table("documents").repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    tok_rows = d.select("doc_id", F.explode(F.expr(toks)).alias("t"))
    hashed = tok_rows.select("doc_id", F.expr(_H_SPARK.format(x="t")).alias("h"))
    bit_aggs = [
        F.sum(
            (F.expr(f"(h div cast(pow(2, {b}) as bigint)) % 2") * 2 - 1)
        ).alias(f"s_{b}")
        for b in range(16)
    ]
    per_doc = hashed.groupBy("doc_id").agg(*bit_aggs)
    simhash = sum(
        F.when(F.col(f"s_{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        for b in range(16)
    )
    return per_doc.select("doc_id", simhash.cast("bigint").alias("simhash"))


# --------------------------------------------------------------------------
# brute-force cosine top-k (ANN baseline)
# --------------------------------------------------------------------------
_DOT_DUCK = (
    "list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
)
_NORM_DUCK = "sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE)))"

_ANN_SQL = f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 8),
scored AS (
  SELECT q.q_id, e.vec_id AS neighbor_id,
         {_DOT_DUCK.format(a='q.qe', b='e.embedding')}
           / ({_NORM_DUCK.format(a='q.qe')} * {_NORM_DUCK.format(a='e.embedding')}) AS cosine
  FROM q JOIN embeddings e ON e.vec_id <> q.q_id
)
SELECT q_id, neighbor_id, cosine, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT q_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
  FROM scored
) WHERE rnk <= 3
"""


@register("ann_cosine_topk", oracle=_ANN_SQL, tags=("llmdata", "ann"), tables=("embeddings",))
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the (tiny) query set against the
    corpus, sequential-fold dot/norm (bit-identical to the oracle), pick
    top-3 per query via a row_number ladder.

    Scale: the corpus side never shuffles — queries broadcast, scores are
    map-side, and the only exchange is the per-query top-k (k rows per
    partition after partial ranking under AQE).
    """
    def norm(c):
        return F.sqrt(
            F.aggregate(
                F.transform(F.col(c), lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )

    # Norms are per-ROW, so compute them once per vector before the join
    # — inside the join they would fold once per PAIR (N*Q interpreted
    # HOF evaluations instead of N+Q; measured ~3x on the bench).
    e = spark.table("embeddings").repartition(
        spark.sparkContext.defaultParallelism, F.col("vec_id")
    ).withColumn("nrm", norm("embedding"))
    q = F.broadcast(
        e.where(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("qe"),
            F.col("nrm").alias("qnrm"),
        )
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("qe"), F.col("embedding"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        e.join(q, F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot / (F.col("qnrm") * F.col("nrm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("q_id", "neighbor_id", "cosine", F.col("rnk").cast("bigint").alias("rnk"))
    )


# --------------------------------------------------------------------------
# LLM-as-operator (§2.10): cost-guarded judge pass over documents.
# --------------------------------------------------------------------------

_LLM_JUDGE_ORACLE = """
SELECT doc_id,
       CASE WHEN ('0x' || substr(md5(COALESCE(text, '')), 1, 8))::BIGINT % 5 = 0
            THEN 'flag' ELSE 'ok' END AS verdict,
       (('0x' || substr(md5(COALESCE(text, '')), 1, 8))::BIGINT % 1000)::INTEGER
         AS conf_milli
FROM documents
"""


@register(
    "llm_judge_verdicts",
    oracle=_LLM_JUDGE_ORACLE,
    tags=("llmdata", "llm-operator", "pandas-udf"),
    tables=("documents",),
)
def llm_judge_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-as-operator (§2.10): judge every document through the
    cost-guarded model pass (``functions/llm.py``), re-expressing the
    reference's ai_query + cost-guard discipline
    (``AuthorshipQualityJudge.py``; ``ai_query_cost_guard.py:57-97``).

    The stub backend's verdicts are md5-derived, so this pandas-UDF
    (Arrow/mapInPandas) pipeline is fully oracle-checked — schema,
    batching, and determinism are all verified, only the model weights
    are fake. The guard meters a 256-row chunk first; the full pass only
    launches under budget.
    """
    from openalex_walden_spark.functions.llm import guarded_llm_pass

    docs = spark.table("documents")
    out, _est = guarded_llm_pass(
        docs, text_col="text", id_col="doc_id", budget_usd=10.0
    )
    return out


# --------------------------------------------------------------------------
# token statistics (whitespace + BPE-ish) — the token-counting operator
# --------------------------------------------------------------------------
_TOKSTATS_SQL = """
SELECT doc_id,
       len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))::BIGINT
         AS n_ws,
       len(list_filter(string_split_regex(
             regexp_replace(lower(text), '([^a-z0-9\\s])', ' \\1 ', 'g'),
             '\\s+'), x -> x <> ''))::BIGINT AS n_bpe
FROM documents
"""


@register(
    "text_token_stats",
    oracle=_TOKSTATS_SQL,
    tags=("llmdata", "text", "tokens"),
    tables=("documents",),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting for training-data budgeting: whitespace tokens and
    the BPE-ish regex tokenization (letter/digit runs, punctuation split
    out — ``functions/textstats.py:word_tokens``). Pure column exprs;
    at 100 TB this is a single codegen'd scan with no shuffle."""
    from openalex_walden_spark.functions.textstats import token_count, word_tokens

    return spark.table("documents").select(
        "doc_id",
        token_count(F.col("text")).alias("n_ws"),
        F.size(word_tokens(F.col("text"))).cast("bigint").alias("n_bpe"),
    )


# --------------------------------------------------------------------------
# n-gram Jaccard near-dup (character 4-grams, blocked pairs)
# --------------------------------------------------------------------------
_NGRAM_JACCARD_SQL = """
WITH docs AS (
  SELECT doc_id, lang, CAST(n_chars // 100 AS INT) AS bucket,
         CASE WHEN length(text) >= 4
              THEN list_distinct(list_transform(range(1, length(lower(text)) - 2),
                                                i -> substr(lower(text), i, 4)))
              ELSE [lower(text)] END AS grams
  FROM documents
),
g AS (SELECT doc_id, lang, bucket, unnest(grams) AS gram FROM docs),
block_n AS (
  SELECT lang, bucket, count(DISTINCT doc_id) AS block_n
  FROM g GROUP BY lang, bucket
),
df AS (
  SELECT lang, bucket, gram, count(*) AS df
  FROM g GROUP BY lang, bucket, gram
),
keep AS (
  SELECT d.lang, d.bucket, d.gram
  FROM df d JOIN block_n b USING (lang, bucket)
  WHERE d.df <= 8 OR d.df * 20 <= b.block_n
),
gk AS (SELECT g.* FROM g JOIN keep USING (lang, bucket, gram)),
sizes AS (SELECT doc_id, count(*) AS n_g FROM gk GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_i
  FROM gk a JOIN gk b
    ON a.lang = b.lang AND a.bucket = b.bucket AND a.gram = b.gram
   AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b,
       n_i::DOUBLE / (sa.n_g + sb.n_g - n_i)::DOUBLE AS jacc
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE n_i::DOUBLE / (sa.n_g + sb.n_g - n_i)::DOUBLE >= 0.6
"""


@register(
    "dedup_ngram_jaccard",
    oracle=_NGRAM_JACCARD_SQL,
    tags=("llmdata", "dedup", "ngram"),
    tables=("documents",),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-4-gram Jaccard near-dup detection over blocked pairs:
    docs meet only inside a (lang, length-bucket) block, then exact
    set-Jaccard over distinct grams gates at 0.6.

    The intersection is computed RELATIONALLY — gram rows joined on
    (block, gram), counted per pair — never as a per-pair
    array_intersect: per-pair HOF set ops re-hash every gram for every
    pair (measured 111s at sf0.1; this form is 10s, same 77 pairs), and
    only join+count shapes survive real scale. |A∪B| = |A|+|B|-|A∩B|
    from per-doc sizes.

    **Hot-gram DF cut** (the positional-filter bound): a gram shared by
    d docs in one block generates O(d²) pair fragments in the join, so
    a stopword-ish gram in a large block is quadratic. Grams whose
    within-block document frequency exceeds max(8, 5 % of the block)
    are dropped from BOTH the intersection and the sizes — Jaccard is
    computed over the filtered gram universe, self-consistently and
    identically in the oracle. Hot grams carry no near-dup signal
    (shared by construction); true near-dups keep jacc ≈ 1 on the
    discriminative remainder. This bounds per-gram join fan-out at
    max(8, 0.05·|block|)² regardless of corpus size.

    At 100 TB the candidate arm of choice is MinHash-LSH
    (``dedup_minhash_lsh_pairs``); this operator is the exact-verify
    arm, and the block key + DF cut are the knobs that bound pair
    volume."""
    d = spark.table("documents")
    grams = F.when(
        F.length("text") >= 4,
        F.array_distinct(
            F.expr(
                "transform(sequence(1, length(text) - 3),"
                " i -> substring(lower(text), i, 4))"
            )
        ),
    ).otherwise(F.array(F.lower(F.col("text"))))
    from openalex_walden_spark.operators.guardrails import persist_scalar

    g = (
        d.repartition(spark.sparkContext.defaultParallelism, F.col("doc_id"))
        .select(
            "doc_id",
            "lang",
            F.floor(F.col("n_chars") / 100).cast("int").alias("bucket"),
            F.explode(grams).alias("gram"),
        )
    )
    # DF cut in one pass: the within-block document frequency comes from
    # a window over (lang, bucket, gram) — the SAME key the pair join
    # shuffles on, so the cut rides a shuffle this plan needs anyway and
    # adds no broadcast of an unbounded gram set (a broadcast-anti
    # variant measured slower here: with a small vocabulary nearly every
    # gram is hot, and the "few hot grams" assumption inverts). Block
    # sizes come straight from `documents` (one row per doc — no
    # explode) and broadcast. Integer comparisons only
    # (df <= 8 OR df*20 <= block_n) so Spark and DuckDB agree exactly.
    block_n = F.broadcast(
        d.groupBy("lang", F.floor(F.col("n_chars") / 100).cast("int").alias("bucket"))
        .agg(F.count("*").alias("block_n"))
    )
    wdf = Window.partitionBy("lang", "bucket", "gram")
    gk = persist_scalar(
        g.withColumn("df", F.count("*").over(wdf))
        .join(block_n, ["lang", "bucket"])
        .where((F.col("df") <= 8) | (F.col("df") * 20 <= F.col("block_n")))
        .select("doc_id", "lang", "bucket", "gram")
    )  # feeds sizes + both sides of the pair join
    sizes = gk.groupBy("doc_id").agg(F.count("*").alias("n_g"))
    ga = gk.select(F.col("doc_id").alias("doc_a"), "lang", "bucket", "gram")
    gb = gk.select(F.col("doc_id").alias("doc_b"), "lang", "bucket", "gram")
    inter = (
        ga.join(gb, ["lang", "bucket", "gram"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_i"))
    )
    jacc = F.col("n_i").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_i")
    ).cast("double")
    return (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_g", "n_a"),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_g", "n_b"),
            "doc_b",
        )
        .where(jacc >= 0.6)
        .select("doc_a", "doc_b", jacc.alias("jacc"))
    )


# --------------------------------------------------------------------------
# LLM embedding operator: hash-bucket embeddings, oracle-checked per weight
# --------------------------------------------------------------------------
_EMBED_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
           AS t
  FROM documents
),
n AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
b AS (
  SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT % 8 AS bucket,
         count(*) AS c
  FROM toks GROUP BY doc_id, bucket
)
SELECT b.doc_id, bucket::BIGINT AS bucket,
       (c::DOUBLE / n.n::DOUBLE)::FLOAT AS weight
FROM b JOIN n ON b.doc_id = n.doc_id
"""


@register(
    "llm_embed_vectors",
    oracle=_EMBED_ORACLE,
    tags=("llmdata", "llm-operator", "embeddings", "pandas-udf"),
    tables=("documents",),
)
def llm_embed_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embedding operator (``functions/llm.py:embed_texts`` — the
    ContinuousEmbeddings ai_query shape) through the correctness gate:
    mapInPandas produces ARRAY<FLOAT> per doc; the nonzero bucket
    weights explode to rows and hash-match DuckDB bit-for-bit (the
    float32 cast is the same IEEE round in both engines). Proves the
    Arrow embedding plumbing end-to-end, not just its schema."""
    from openalex_walden_spark.functions.llm import embed_texts

    emb = embed_texts(spark.table("documents"), "text", "doc_id", dim=8)
    return (
        emb.select("doc_id", F.posexplode("embedding").alias("bucket", "weight"))
        .where(F.col("weight") > 0)
        .select("doc_id", F.col("bucket").cast("long").alias("bucket"), "weight")
    )


# --------------------------------------------------------------------------
# Document fingerprinting: winnowing (rolling k-gram hash, min-per-window)
# --------------------------------------------------------------------------
# Winnowing constants + Spark/DuckDB expression builders live in
# functions/textstats.py (single-sourced for all three fingerprint
# consumers and their oracles).
from openalex_walden_spark.functions.textstats import (  # noqa: E402
    winnow_fps_duck,
    winnow_hashes_spark,
    winnow_select_spark,
)

_WINNOW_SQL = f"""
WITH sel AS ({winnow_fps_duck("documents")})
SELECT doc_id, n_kgrams::BIGINT AS n_kgrams,
       len(fps)::BIGINT AS n_fingerprints,
       md5(array_to_string(list_transform(list_sort(fps), x -> x::VARCHAR), ',')) AS fp_checksum
FROM sel
"""


@register(
    "text_fingerprint_winnow",
    oracle=_WINNOW_SQL,
    tags=("llmdata", "text", "fingerprint"),
    tables=("documents",),
)
def text_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting by winnowing (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every k-gram (k=8 chars),
    slide a w=4 window over the hash sequence, select the minimum per
    window; the distinct selected hashes are the document fingerprint.
    Guarantees any shared substring of length >= k+w-1 contributes a
    shared fingerprint hash — the containment-detection primitive for
    training-data decontamination.

    Entirely per-row array HOFs (transform/slice/array_min) — one scan
    plus the r15 parallelizing key repartition, embarrassingly parallel
    at 100 TB.  Output is scalar (count + md5 checksum of the sorted
    fingerprint set) so the oracle hash-compares exactly; downstream
    dedup would explode `fps` and hash-join on fingerprint instead.

    r15 per-task-work fix (guide §1.2 step 2): ``lower(text)`` is
    hoisted into a column BEFORE the k-gram lambda — a lambda body's
    row-level subexpressions are re-evaluated per element, so the old
    inline form lower-cased the whole document once per k-gram (O(L^2)
    chars per doc); the hoisted column is computed once per row and the
    lambda reads an attribute.  The repartition breaks the
    single-row-group fixture scan out of its one task (the same fix as
    the parse fleet; key-only columns move).
    """
    par = spark.sparkContext.defaultParallelism
    return (
        spark.table("documents")
        .repartition(par, F.col("doc_id"))
        .select("doc_id", F.lower("text").alias("lt"))
        .select("doc_id", F.expr(winnow_hashes_spark("lt")).alias("hs"))
        .select(
            "doc_id",
            F.size("hs").cast("bigint").alias("n_kgrams"),
            F.array_distinct(F.expr(winnow_select_spark())).alias("fps"),
        )
        .select(
            "doc_id",
            "n_kgrams",
            F.size("fps").cast("bigint").alias("n_fingerprints"),
            F.md5(
                F.array_join(
                    F.transform(F.array_sort("fps"), lambda x: x.cast("string")), ","
                )
            ).alias("fp_checksum"),
        )
    )


# --------------------------------------------------------------------------
# Dedup clustering: connected components over shared-fingerprint edges
# --------------------------------------------------------------------------
_CC_SQL = f"""
WITH corpus AS ({_DUCK_CORPUS_NEARDUP}),
h AS ({winnow_fps_duck("corpus")}),
fp AS (SELECT doc_id, unnest(fps) AS f FROM h),
rare AS (
  SELECT f FROM fp GROUP BY f HAVING count(*) <= 8
),
fpr AS (SELECT fp.doc_id, fp.f FROM fp JOIN rare USING (f)),
edges AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM fpr a JOIN fpr b ON a.f = b.f AND a.doc_id < b.doc_id
  GROUP BY src, dst
  HAVING count(*) >= 3
),
sym AS (
  SELECT src, dst FROM edges
  UNION ALL
  SELECT dst AS src, src AS dst FROM edges
),
nodes AS (SELECT DISTINCT doc_id FROM fp),
reach AS (
  WITH RECURSIVE r(id, label) AS (
    SELECT doc_id, doc_id FROM nodes
    UNION
    SELECT s.dst, r.label FROM r JOIN sym s ON s.src = r.id
  )
  SELECT id, min(label) AS component_id FROM r GROUP BY id
)
SELECT component_id,
       count(*)::BIGINT AS n_members,
       string_agg(id::VARCHAR, ',' ORDER BY id) AS member_ids
FROM reach
GROUP BY component_id
HAVING count(*) > 1
"""


@register(
    "dedup_connected_components",
    oracle=_CC_SQL,
    tags=("llmdata", "dedup", "iterative"),
    tables=("documents",),
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup CLUSTERING — the step after pair detection: connected
    components over the similarity graph, so each duplicate group gets
    one canonical id (the minimum member id) before canonical-pick.

    Edges: docs sharing >= 3 rare winnowing fingerprints (df <= 8 cut
    bounds the fp join exactly like the ngram DF cut). Components:
    alternating large-star/small-star (operators/components.py) — O(log^2
    n) shuffle rounds regardless of component diameter, so the operator
    survives long dup chains that would starve per-round min-label
    propagation. The DuckDB oracle computes the same fixpoint with a
    recursive CTE, so this ITERATIVE operator is still exactly
    value-checked. Isolated docs (no edges) form their own singleton
    components and are filtered by the n_members > 1 gate either way, so
    only edge endpoints need labeling.
    """
    from openalex_walden_spark.operators.components import connected_components
    from openalex_walden_spark.operators.guardrails import persist_scalar

    # r15: hoisted lower(text) + parallelizing key repartition (see
    # text_fingerprint_winnow — the same O(L^2) lambda and single-task
    # scan fixes; the corpus generator reads the single-row-group
    # documents fixture).
    par = spark.sparkContext.defaultParallelism
    corpus = _spark_corpus_neardup(spark).repartition(par, F.col("doc_id"))
    fp = persist_scalar(
        corpus.select("doc_id", F.lower("text").alias("lt"))
        .select("doc_id", F.expr(winnow_hashes_spark("lt")).alias("hs"))
        .select(
            "doc_id",
            F.explode(F.array_distinct(F.expr(winnow_select_spark()))).alias("f"),
        )
    )
    rare = fp.groupBy("f").agg(F.count("*").alias("df")).where(F.col("df") <= 8)
    fpr = fp.join(rare.select("f"), "f")
    fa = fpr.select(F.col("doc_id").alias("src"), "f")
    fb = fpr.select(F.col("doc_id").alias("dst"), "f")
    edges = (
        fa.join(fb, "f")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= 3)
        .select("src", "dst")
    )
    labels = connected_components(edges).withColumnRenamed("id", "doc_id")
    # Docs with no qualifying edges are singletons; the oracle's reach CTE
    # labels them with their own id before the >1 filter drops them — so
    # attach them the same way to keep intermediate semantics identical.
    singles = (
        fp.select("doc_id")
        .distinct()
        .join(labels.select("doc_id"), "doc_id", "left_anti")
        .withColumn("label", F.col("doc_id"))
    )
    labels = labels.unionByName(singles)
    return (
        labels.groupBy(F.col("label").alias("component_id"))
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("member_ids"),
        )
        .where(F.col("n_members") > 1)
    )


# --------------------------------------------------------------------------
# Deterministic stratified sampling (training-mixture construction)
# --------------------------------------------------------------------------
_SAMPLE_SQL = """
WITH pol AS (
  SELECT * FROM (VALUES ('en', 35), ('de', 80), ('es', 80), ('fr', 80), ('zh', 100))
    AS pol(lang, pct)
),
strat AS (
  SELECT doc_id, d.lang, CAST(n_chars // 200 AS INT) AS size_bucket,
         ('0x' || substr(md5(doc_id::VARCHAR || ':' || d.lang), 1, 8))::BIGINT % 100 AS die,
         pct
  FROM documents d JOIN pol ON d.lang = pol.lang
)
SELECT doc_id, lang, size_bucket
FROM strat WHERE die < pct
"""


@register(
    "sample_stratified_hash",
    oracle=_SAMPLE_SQL,
    tags=("llmdata", "sampling"),
    tables=("documents",),
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for training-mixture
    construction: per-language keep rates (the mixture policy, a
    broadcast-joined VALUES table — rates are data, not code) applied
    via a content-derived die: md5(doc_id:lang) % 100 < pct. No rand()
    anywhere, so the sample is reproducible run-over-run, stable under
    repartitioning, and auditable — the property a 100 TB mixture
    rebuild needs (re-running the pipeline yields the same corpus).
    Map-side only: scan → broadcast join → filter; zero shuffles.
    """
    policy = spark.createDataFrame(
        [("en", 35), ("de", 80), ("es", 80), ("fr", 80), ("zh", 100)],
        "lang string, pct int",
    )
    d = spark.table("documents")
    die = F.expr(
        "cast(conv(substr(md5(concat(cast(doc_id as string), ':', lang)), 1, 8), 16, 10) as bigint) % 100"
    )
    return (
        d.join(F.broadcast(policy), "lang")
        .where(die < F.col("pct"))
        .select("doc_id", "lang", F.floor(F.col("n_chars") / 200).cast("int").alias("size_bucket"))
    )


# --------------------------------------------------------------------------
# Benchmark decontamination: fingerprint containment against an eval set
# --------------------------------------------------------------------------
_DECON_SQL = f"""
WITH fpdoc AS ({winnow_fps_duck("documents")}),
evalset AS (
  SELECT doc_id AS eval_id, fps AS eval_fps FROM fpdoc WHERE doc_id % 25 = 0
),
train AS (
  SELECT doc_id, fps FROM fpdoc WHERE doc_id % 25 <> 0
),
tf AS (SELECT doc_id, unnest(fps) AS f FROM train),
ef AS (SELECT eval_id, unnest(eval_fps) AS f FROM evalset),
hits AS (
  SELECT tf.doc_id, ef.eval_id, count(*) AS shared
  FROM tf JOIN ef ON tf.f = ef.f
  GROUP BY tf.doc_id, ef.eval_id
),
sizes AS (SELECT eval_id, len(eval_fps) AS n_eval FROM evalset)
SELECT h.doc_id, h.eval_id, h.shared::BIGINT AS shared,
       (h.shared::DOUBLE / s.n_eval::DOUBLE) AS containment
FROM hits h JOIN sizes s ON h.eval_id = s.eval_id
WHERE h.shared * 5 >= s.n_eval
"""


@register(
    "decontaminate_eval_overlap",
    oracle=_DECON_SQL,
    tags=("llmdata", "decontamination", "fingerprint"),
    tables=("documents",),
)
def decontaminate_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents whose
    winnowing-fingerprint CONTAINMENT of an eval document is >= 20 %
    (shared·5 >= |eval fps| — integer gate, exact on both engines).
    Winnowing guarantees any shared substring of length >= k+w-1 yields
    a shared fingerprint, so verbatim eval leakage cannot hide from
    this join. Containment (|A∩B| / |eval|), not Jaccard — a long
    training doc EMBEDDING a short eval item is exactly the case that
    must fire.

    Scale: the fingerprint corpus is hashed ONCE into a persisted
    scalar (doc_id, is_eval, f) frame serving all three consumers
    (eval rows, eval sizes, training rows) — the hashing subplan is the
    dominant cost and must not replay per consumer. One equi-join on
    the fingerprint value, one count; eval sets are small, so at 100 TB
    the eval side broadcasts and the train side never shuffles.
    """
    from openalex_walden_spark.operators.guardrails import persist_scalar

    # r15: hoisted lower(text) + parallelizing key repartition — same
    # O(L^2)-per-doc lambda fix and single-task-scan fix as
    # text_fingerprint_winnow (this query ground >18 min single-core at
    # sf0.1 before it; the hashing subplan is the dominant cost).
    par = spark.sparkContext.defaultParallelism
    fpall = persist_scalar(
        spark.table("documents")
        .repartition(par, F.col("doc_id"))
        .select("doc_id", F.lower("text").alias("lt"))
        .select("doc_id", F.expr(winnow_hashes_spark("lt")).alias("hs"))
        .select("doc_id", F.array_distinct(F.expr(winnow_select_spark())).alias("fps"))
        .select(
            "doc_id",
            (F.col("doc_id") % 25 == 0).alias("is_eval"),
            F.explode("fps").alias("f"),
        )
    )
    ef = fpall.where("is_eval").select(F.col("doc_id").alias("eval_id"), "f")
    # fps are distinct per doc, so the exploded row count IS |fps|
    sizes = (
        fpall.where("is_eval")
        .groupBy(F.col("doc_id").alias("eval_id"))
        .agg(F.count("*").alias("n_eval"))
    )
    tf = fpall.where(~F.col("is_eval")).select("doc_id", "f")
    hits = (
        tf.join(F.broadcast(ef), "f")
        .groupBy("doc_id", "eval_id")
        .agg(F.count("*").alias("shared"))
    )
    return (
        hits.join(F.broadcast(sizes), "eval_id")
        .where(F.col("shared") * 5 >= F.col("n_eval"))
        .select(
            "doc_id",
            "eval_id",
            F.col("shared").cast("bigint").alias("shared"),
            (F.col("shared").cast("double") / F.col("n_eval").cast("double")).alias(
                "containment"
            ),
        )
    )


# --------------------------------------------------------------------------
# Quality-filter gate: policy thresholds over the quality features
# --------------------------------------------------------------------------
_QFILTER_SQL = """
WITH feats AS (
  SELECT doc_id, lang,
         length(text) AS n_chars_m,
         len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS n_tokens,
         length(regexp_replace(lower(text), '[^a-z]', '', 'g'))::DOUBLE
           / greatest(length(text), 1)::DOUBLE AS alpha_ratio,
         length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
           / greatest(length(text), 1)::DOUBLE AS digit_ratio
  FROM documents
),
gated AS (
  SELECT doc_id, lang,
         CASE WHEN n_tokens < 20 THEN 'too_short'
              WHEN n_chars_m > 2000 THEN 'too_long'
              WHEN alpha_ratio < 0.6 THEN 'low_alpha'
              WHEN digit_ratio > 0.2 THEN 'digit_heavy'
              ELSE 'keep' END AS verdict
  FROM feats
)
SELECT lang, verdict, count(*)::BIGINT AS n
FROM gated GROUP BY lang, verdict
"""


@register(
    "quality_filter_gate",
    oracle=_QFILTER_SQL,
    tags=("llmdata", "text", "quality", "St5"),
    tables=("documents",),
)
def quality_filter_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality filtering with reason codes — the document-corpus
    analog of the expectations gate (St5): a first-match-wins threshold
    ladder over the quality features (too_short / too_long / low_alpha /
    digit_heavy / keep), reported as per-(lang, verdict) counts. Reason
    codes, not a boolean, because a 100 TB curation loop needs to see
    WHY mass is being dropped per language before shipping a mixture.
    Single codegen'd scan + one small aggregate."""
    from openalex_walden_spark.functions.textstats import quality_features

    d = spark.table("documents")
    feats = quality_features(F.col("text"))
    verdict = (
        F.when(feats["n_tokens"] < 20, F.lit("too_short"))
        .when(feats["n_chars"] > 2000, F.lit("too_long"))
        .when(feats["alpha_ratio"] < 0.6, F.lit("low_alpha"))
        .when(feats["digit_ratio"] > 0.2, F.lit("digit_heavy"))
        .otherwise(F.lit("keep"))
    )
    return (
        d.select("lang", verdict.alias("verdict"))
        .groupBy("lang", "verdict")
        .agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# Gopher-style repetition quality filters (public training-data rules:
# Rae et al. 2021 "Scaling Language Models" App. A1.1; RefinedWeb §3).
# Integer-only outputs: fractions gate via cross-multiplied integer
# predicates so Spark and DuckDB hash identically with no float rounding.
# --------------------------------------------------------------------------
_GOPHER_SQL = f"""
WITH t AS (
  SELECT doc_id, {_TOKS_DUCK.format(c='text')} AS toks FROM documents
),
base AS (
  SELECT doc_id, len(toks)::BIGINT AS n_tokens,
         len(list_distinct(toks))::BIGINT AS n_distinct, toks
  FROM t
),
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i+1])) AS g
  FROM base WHERE len(toks) >= 2
),
bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
bga AS (
  SELECT doc_id, max(c)::BIGINT AS max_bigram, sum(c)::BIGINT AS n_bigrams
  FROM bgc GROUP BY doc_id
),
fg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 3),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                             || ' ' || toks[i+3] || ' ' || toks[i+4])) AS g
  FROM base WHERE len(toks) >= 5
),
fgc AS (SELECT doc_id, g, count(*) AS c FROM fg GROUP BY doc_id, g),
fga AS (
  SELECT doc_id, sum(c)::BIGINT AS n_5grams,
         count(*)::BIGINT AS n_distinct_5grams
  FROM fgc GROUP BY doc_id
)
SELECT b.doc_id, b.n_tokens, b.n_distinct,
       COALESCE(bga.max_bigram, 0) AS max_bigram,
       COALESCE(bga.n_bigrams, 0) AS n_bigrams,
       COALESCE(fga.n_5grams, 0) AS n_5grams,
       COALESCE(fga.n_distinct_5grams, 0) AS n_distinct_5grams,
       (COALESCE(bga.max_bigram, 0) * 5 <= COALESCE(bga.n_bigrams, 0)
        AND b.n_distinct * 10 >= b.n_tokens * 3
        AND (COALESCE(fga.n_5grams, 0) = 0
             OR (COALESCE(fga.n_5grams, 0) - COALESCE(fga.n_distinct_5grams, 0)) * 10
                <= COALESCE(fga.n_5grams, 0) * 3)) AS keep
FROM base b
LEFT JOIN bga ON b.doc_id = bga.doc_id
LEFT JOIN fga ON b.doc_id = fga.doc_id
"""


@register(
    "quality_gopher_repetition",
    oracle=_GOPHER_SQL,
    tags=("llmdata", "quality"),
    tables=("documents",),
)
def quality_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality gates from the public Gopher/RefinedWeb
    rulebooks: top-bigram token fraction <= 0.2, distinct-token ratio >=
    0.3, duplicated-5-gram fraction <= 0.3 — the standard pre-training
    corpus filters the simple length/punct features (text_quality_features)
    don't capture.

    Scale: per-doc n-gram counting is explode -> two-level groupBy keyed
    by doc_id — per-doc cardinality is bounded by doc length, the shuffle
    key is the doc, and no cross-doc state exists, so the operator is
    embarrassingly scalable. Gates compare cross-multiplied integers; no
    float thresholds to drift between engines.
    """
    d = spark.table("documents").repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    toks = d.select("doc_id", F.expr(_TOKS_SPARK.format(c="text")).alias("toks"))
    base = toks.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("bigint").alias("n_distinct"),
        "toks",
    )
    bg = base.where(F.size("toks") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks) - 2),"
                " i -> concat_ws(' ', toks[i], toks[i+1]))"
            )
        ).alias("g"),
    )
    bga = (
        bg.groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").cast("bigint").alias("max_bigram"),
            F.sum("c").cast("bigint").alias("n_bigrams"),
        )
    )
    fg = base.where(F.size("toks") >= 5).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks) - 5),"
                " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2],"
                " toks[i+3], toks[i+4]))"
            )
        ).alias("g"),
    )
    fga = (
        fg.groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_5grams"),
            F.count("*").cast("bigint").alias("n_distinct_5grams"),
        )
    )
    out = (
        base.select("doc_id", "n_tokens", "n_distinct")
        .join(bga, "doc_id", "left")
        .join(fga, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            F.coalesce("max_bigram", F.lit(0)).alias("max_bigram"),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("n_5grams", F.lit(0)).alias("n_5grams"),
            F.coalesce("n_distinct_5grams", F.lit(0)).alias("n_distinct_5grams"),
        )
    )
    keep = (
        (F.col("max_bigram") * 5 <= F.col("n_bigrams"))
        & (F.col("n_distinct") * 10 >= F.col("n_tokens") * 3)
        & (
            (F.col("n_5grams") == 0)
            | (
                (F.col("n_5grams") - F.col("n_distinct_5grams")) * 10
                <= F.col("n_5grams") * 3
            )
        )
    )
    return out.withColumn("keep", keep)


# --------------------------------------------------------------------------
# PII scrub/redact (standard pre-training hygiene: emails, phone numbers,
# IPs replaced with typed placeholder tokens; counts logged per doc).
# Patterns avoid backslash escapes ([.] for literal dot) so the same
# text works in Java regex and RE2 without dialect escaping.
# --------------------------------------------------------------------------
_PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}"
_PII_PHONE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
_PII_IP = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"

# Deterministic PII injection (the fixture corpus is clean): ~60% of
# docs gain one synthetic PII item so the scrubber has real work and the
# zero-PII path stays covered.
_PII_AUG_SPARK = """
concat(text, CASE CAST(doc_id % 5 AS INT)
  WHEN 0 THEN concat(' contact user', CAST(doc_id AS STRING), '@example.com now')
  WHEN 1 THEN concat(' call 555-', lpad(CAST(doc_id % 1000 AS STRING), 3, '0'), '-1234')
  WHEN 2 THEN concat(' host 10.0.', CAST(doc_id % 256 AS STRING), '.7 up')
  ELSE '' END)
"""
_PII_AUG_DUCK = _PII_AUG_SPARK.replace("AS STRING", "AS VARCHAR")

_PII_SQL = f"""
WITH aug AS (
  SELECT doc_id, {_PII_AUG_DUCK} AS text2 FROM documents
),
counted AS (
  SELECT doc_id, text2,
         len(regexp_extract_all(text2, '{_PII_EMAIL}'))::BIGINT AS n_emails,
         len(regexp_extract_all(text2, '{_PII_PHONE}'))::BIGINT AS n_phones,
         len(regexp_extract_all(text2, '{_PII_IP}'))::BIGINT AS n_ips
  FROM aug
)
SELECT doc_id, n_emails, n_phones, n_ips,
       md5(regexp_replace(regexp_replace(regexp_replace(text2,
            '{_PII_EMAIL}', '<EMAIL>', 'g'),
            '{_PII_PHONE}', '<PHONE>', 'g'),
            '{_PII_IP}', '<IP>', 'g')) AS scrubbed_md5
FROM counted
"""


@register(
    "pii_scrub_redact",
    oracle=_PII_SQL,
    tags=("llmdata", "quality", "pii"),
    tables=("documents",),
)
def pii_scrub_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the corpus: emails / phone numbers / IPv4
    addresses replaced by typed placeholders, with per-doc counts for the
    compliance log — pure column expressions (regexp_count +
    regexp_replace chain), map-side only, no shuffle, whole plan inside
    codegen. The scrubbed text is md5'd for the oracle check so the full
    redacted string is value-verified without hauling it around."""
    d = spark.table("documents").repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    aug = d.select("doc_id", F.expr(_PII_AUG_SPARK).alias("text2"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text2"), _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE,
            "<PHONE>",
        ),
        _PII_IP,
        "<IP>",
    )
    return aug.select(
        "doc_id",
        F.expr(f"size(regexp_extract_all(text2, '{_PII_EMAIL}', 0))")
        .cast("bigint")
        .alias("n_emails"),
        F.expr(f"size(regexp_extract_all(text2, '{_PII_PHONE}', 0))")
        .cast("bigint")
        .alias("n_phones"),
        F.expr(f"size(regexp_extract_all(text2, '{_PII_IP}', 0))")
        .cast("bigint")
        .alias("n_ips"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


# --------------------------------------------------------------------------
# Boolean retrieval over the token inverted index (the query-side
# complement of P6): conjunctive term match, integer tf scoring, top-k
# per query. Integer-only scores keep both engines hash-identical.
# --------------------------------------------------------------------------
_RETRIEVAL_QUERIES = (
    (0, ("table", "scan")),
    (1, ("fast", "merge")),
    (2, ("window", "sort", "key")),
    (3, ("customer", "query")),
    (4, ("vector",)),
)


def _retrieval_values() -> str:
    rows = []
    for qid, terms in _RETRIEVAL_QUERIES:
        for t in terms:
            rows.append(f"({qid}, '{t}')")
    return ", ".join(rows)


_RETRIEVAL_SQL = f"""
WITH q(query_id, term) AS (VALUES {_retrieval_values()}),
qsize AS (SELECT query_id, count(*) AS n_terms FROM q GROUP BY query_id),
tok AS (
  SELECT doc_id, unnest({_TOKS_DUCK.format(c='text')}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term),
hits AS (
  SELECT q.query_id, tf.doc_id,
         count(*)::BIGINT AS n_matched, sum(tf.tf)::BIGINT AS score
  FROM q JOIN tf ON tf.term = q.term
  GROUP BY q.query_id, tf.doc_id
),
conj AS (
  SELECT h.query_id, h.doc_id, h.score
  FROM hits h JOIN qsize s ON h.query_id = s.query_id
  WHERE h.n_matched = s.n_terms
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM conj
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, score
FROM ranked WHERE rank <= 10
"""


@register(
    "search_boolean_retrieval",
    oracle=_RETRIEVAL_SQL,
    tags=("llmdata", "search", "P6"),
    tables=("documents",),
)
def search_boolean_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive (AND) retrieval: every query term must appear in the
    doc; rank by summed term frequency, doc_id tie-break, top-10 per
    query. The query set broadcasts; the posting-list build shuffles once
    on (doc, term); ranking is a per-query window over only the matched
    docs — at 100 TB this is the standard distributed-retrieval shape
    (never a scan per query)."""
    d = spark.table("documents").repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    q_rows = [
        (qid, t) for qid, terms in _RETRIEVAL_QUERIES for t in terms
    ]
    q = spark.createDataFrame(q_rows, "query_id int, term string")
    qsize = q.groupBy("query_id").agg(F.count("*").alias("n_terms"))
    tf = (
        d.select("doc_id", F.explode(F.expr(_TOKS_SPARK.format(c="text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    hits = (
        tf.join(F.broadcast(q), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_matched"),
            F.sum("tf").cast("bigint").alias("score"),
        )
    )
    conj = hits.join(F.broadcast(qsize), "query_id").where(
        F.col("n_matched") == F.col("n_terms")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        conj.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= 10)
        .select("query_id", "rank", "doc_id", "score")
    )


# --------------------------------------------------------------------------
# Segment-level exact dedup (the line/paragraph-dedup shape at token level)
# --------------------------------------------------------------------------
_SEG_DEDUP_SQL = f"""
WITH docs AS (
  SELECT doc_id, {_TOKS_DUCK.format(c='text')} AS toks FROM documents
),
seg AS (
  SELECT doc_id,
         unnest(list_transform(range(0, CAST((len(toks) + 9) // 10 AS INT)),
                i -> {_H_DUCK.format(x="array_to_string(toks[i*10+1 : i*10+10], ' ')")}
               )) AS seg_h
  FROM docs WHERE len(toks) >= 1
),
freq AS (SELECT seg_h, COUNT(*) AS freq FROM seg GROUP BY seg_h)
SELECT s.doc_id,
       COUNT(*) AS n_seg,
       CAST(SUM(CASE WHEN f.freq > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       (SUM(CASE WHEN f.freq > 1 THEN 1 ELSE 0 END) * 5 <= COUNT(*)) AS keep
FROM seg s JOIN freq f USING (seg_h)
GROUP BY s.doc_id
"""


@register(
    "dedup_segments_exact",
    oracle=_SEG_DEDUP_SQL,
    tags=("llmdata", "dedup", "segments"),
    tables=("documents",),
)
def dedup_segments_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level exact dedup — the paragraph/line-dedup stage of a
    web-corpus pipeline (CCNet drops duplicated paragraphs; RefinedWeb
    drops documents dominated by boilerplate lines), expressed over
    non-overlapping 10-token segments since the fixture's text has no
    line structure.

    Each segment is hashed to a portable 60-bit md5-prefix BIGINT (a
    32-byte hex string would double the shuffle width for nothing), its
    corpus-wide occurrence count computed with one hash aggregation,
    and each document rolled up to (n_seg, n_dup, keep) where ``keep``
    is the integer-exact gate dup_fraction <= 20 % (5*n_dup <= n_seg).
    Two shuffles total, both on the compact hash — no document text
    crosses an exchange, which is the property that matters when the
    corpus is 100 TB but the segment-hash table is ~1 % of it."""
    d = spark.table("documents")
    toks = F.expr(_TOKS_SPARK.format(c="text"))
    seg_list = F.expr(
        "transform(sequence(0, cast((size(toks) + 9) div 10 as int) - 1), "
        "i -> cast(conv(substr(md5(array_join(slice(toks, i*10+1, 10), ' ')), "
        "1, 15), 16, 10) as bigint))"
    )
    seg = (
        d.select("doc_id", toks.alias("toks"))
        .where(F.size("toks") >= 1)
        .select("doc_id", F.explode(seg_list).alias("seg_h"))
    )
    freq = seg.groupBy("seg_h").agg(F.count("*").alias("freq"))
    dup = F.sum(F.when(F.col("freq") > 1, 1).otherwise(0))
    return (
        seg.join(freq, "seg_h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_seg"),
            dup.alias("n_dup"),
            (dup * 5 <= F.count("*")).alias("keep"),
        )
    )

# --------------------------------------------------------------------------
# BM25-shaped ranked retrieval (disjunctive), integer-exact arithmetic
# --------------------------------------------------------------------------
# True BM25 with k1=1.2, b=0.75 rewritten over integers only: with
# S = sum of doc lengths and N = doc count,
#   tf_sat = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
# multiplies out (by 20*S) to  44*S*tf / (20*S*tf + 6*S + 18*dl*N),
# and idf(t) = ln-free scaled surrogate ((N-df)*2000 + 1000)/(2*df + 1)
# ~ 1000*(N-df+0.5)/(df+0.5).  One integer division per (term, doc) at
# the very end keeps Spark `div` and DuckDB `//` bit-identical
# (both truncate; every operand is positive).
_BM25_SQL = f"""
WITH q(query_id, term) AS (VALUES {_retrieval_values()}),
qterms AS (SELECT DISTINCT term FROM q),
tok AS (
  SELECT doc_id, unnest({_TOKS_DUCK.format(c='text')}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
scal AS (SELECT CAST(SUM(dl) AS BIGINT) AS s, COUNT(*)::BIGINT AS n FROM dl),
dft AS (
  SELECT tf.term, count(*)::BIGINT AS df
  FROM tf JOIN qterms USING (term) GROUP BY tf.term
),
scored AS (
  SELECT q.query_id, tf.doc_id,
         (((scal.n - dft.df) * 2000 + 1000) // (2 * dft.df + 1))
         * ((44 * scal.s * tf.tf * 1000)
            // (20 * scal.s * tf.tf + 6 * scal.s + 18 * dl.dl * scal.n))
           AS part
  FROM tf
  JOIN q ON q.term = tf.term
  JOIN dft ON dft.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN scal
),
agg AS (
  SELECT query_id, doc_id, CAST(SUM(part) AS BIGINT) AS score
  FROM scored GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM agg
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, score
FROM ranked WHERE rank <= 10
"""


@register(
    "search_bm25_topk",
    oracle=_BM25_SQL,
    tags=("llmdata", "search", "bm25"),
    tables=("documents",),
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive BM25 ranking (k1=1.2, b=0.75), top-10 per query, on
    integer-exact arithmetic — the float BM25 formula is multiplied out
    so the only division is one truncating integer div per (term, doc),
    identical in Spark (`div`) and DuckDB (`//`).

    Shape for 100 TB: the posting list (tf) is built once and persisted
    — it feeds document lengths, query-term document frequencies AND
    the scoring join, so the corpus-sized explode runs exactly once.
    The query set, per-term df and the (S, N) corpus scalars all
    broadcast; the only non-broadcast joins key on doc_id.  Integer
    magnitudes: parts are bounded by ~2*idf_scale*S*tf, so at
    web-corpus N the idf/sat scale constants must shrink — noted here
    rather than silently overflowed."""
    from openalex_walden_spark.operators.guardrails import persist_scalar

    d = spark.table("documents").repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    q_rows = [(qid, t) for qid, terms in _RETRIEVAL_QUERIES for t in terms]
    q = spark.createDataFrame(q_rows, "query_id int, term string")
    qterms = q.select("term").distinct()
    tf = persist_scalar(
        d.select(
            "doc_id", F.explode(F.expr(_TOKS_SPARK.format(c="text"))).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("dl"))
    scal = dl.agg(
        F.sum("dl").cast("bigint").alias("s"), F.count("*").cast("bigint").alias("n")
    )
    dft = (
        tf.join(F.broadcast(qterms), "term")
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("df"))
    )
    part = F.expr(
        "(((n - df) * 2000 + 1000) div (2 * df + 1))"
        " * ((44 * s * tf * 1000)"
        "    div (20 * s * tf + 6 * s + 18 * dl * n))"
    )
    scored = (
        tf.join(F.broadcast(q), "term")
        .join(F.broadcast(dft), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(scal))
        .select("query_id", "doc_id", part.alias("part"))
    )
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.sum("part").cast("bigint").alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= 10)
        .select("query_id", "rank", "doc_id", "score")
    )

# --------------------------------------------------------------------------
# SQ8 scalar-quantized ANN: int8 vectors, integer dot-product ranking
# --------------------------------------------------------------------------
_SQ8_QZ_DUCK = """
  SELECT vec_id,
         list_transform(embedding,
           v -> CAST(floor(v::DOUBLE * 127.0 / mx + 0.5) AS BIGINT)) AS qv
  FROM (SELECT vec_id, embedding,
               list_max(list_transform(embedding, v -> abs(v::DOUBLE))) AS mx
        FROM embeddings)
  WHERE mx > 0
"""

_SQ8_SQL = f"""
WITH qz AS ({_SQ8_QZ_DUCK}),
q AS (SELECT vec_id AS q_id, qv AS qa FROM qz WHERE vec_id < 8),
scored AS (
  SELECT q.q_id, e.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, len(q.qa) + 1),
                                      i -> q.qa[i] * e.qv[i])) AS BIGINT) AS score
  FROM q JOIN qz e ON e.vec_id <> q.q_id
)
SELECT q_id, neighbor_id, score, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT q_id, neighbor_id, score,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY score DESC, neighbor_id ASC) AS rnk
  FROM scored
) WHERE rnk <= 3
"""


@register(
    "ann_sq8_topk",
    oracle=_SQ8_SQL,
    tags=("llmdata", "ann", "quantization"),
    tables=("embeddings",),
)
def ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized (SQ8) nearest neighbours: each vector maps to
    int8 codes q_i = round(127 * x_i / max|x|), candidates rank by the
    INTEGER dot product — the memory-bound regime's standard trade
    (4x smaller vectors, exact integer arithmetic) and the third member
    of the similarity family next to the float brute force
    (``ann_cosine_topk``) and the IVF scale path (``ann_ivf_topk``).

    Quantization keeps both engines bit-identical: one double multiply/
    divide chain per element (IEEE-deterministic, identical order) into
    floor(x + 0.5), then ALL ranking math is int64. At 100 TB the code
    table rides the same IVF partitioning as the float path; probes
    broadcast."""
    e = spark.table("embeddings")
    mx = F.expr("array_max(transform(embedding, v -> abs(cast(v as double))))")
    qz = (
        e.withColumn("mx", mx)
        .where(F.col("mx") > 0)
        .select(
            "vec_id",
            F.expr(
                "transform(embedding,"
                " v -> cast(floor(cast(v as double) * 127.0 / mx + 0.5) as bigint))"
            ).alias("qv"),
        )
    )
    q = qz.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("qv").alias("qa")
    )
    scored = (
        qz.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(
                "aggregate(zip_with(qa, qv, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"
            ).alias("score"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .select("q_id", "neighbor_id", "score", "rnk")
    )


# --------------------------------------------------------------------------
# Mixture rebalancing: hash-sample each source down to an equal token share
# --------------------------------------------------------------------------
_MIX_SCALE = 1_000_000

_MIXTURE_SQL = f"""
WITH toks AS (
  SELECT doc_id, source,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))::BIGINT
           AS n_tokens
  FROM documents
),
per_source AS (
  SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens,
         COUNT(*) AS n_docs
  FROM toks GROUP BY source
),
totals AS (
  SELECT CAST(SUM(src_tokens) AS BIGINT) AS total_tokens,
         COUNT(*) AS n_sources
  FROM per_source
),
rates AS (
  SELECT p.source, p.src_tokens, p.n_docs,
         LEAST({_MIX_SCALE}::BIGINT,
               ({_MIX_SCALE} * t.total_tokens) // (t.n_sources * p.src_tokens))
           AS keep_threshold
  FROM per_source p CROSS JOIN totals t
),
sampled AS (
  SELECT k.source, k.n_tokens
  FROM toks k JOIN rates r ON k.source = r.source
  WHERE {_H_DUCK.format(x="'mix:' || k.doc_id::VARCHAR")} % {_MIX_SCALE}
        < r.keep_threshold
)
SELECT r.source, r.n_docs AS n_docs_before, r.src_tokens AS tokens_before,
       CAST(r.keep_threshold AS BIGINT) AS keep_threshold,
       COUNT(s.n_tokens) AS n_docs_after,
       CAST(COALESCE(SUM(s.n_tokens), 0) AS BIGINT) AS tokens_after
FROM rates r LEFT JOIN sampled s ON r.source = s.source
GROUP BY r.source, r.n_docs, r.src_tokens, r.keep_threshold
"""


@register(
    "mixture_rebalance_sample",
    oracle=_MIXTURE_SQL,
    tags=("llmdata", "sampling", "mixture"),
    tables=("documents",),
)
def mixture_rebalance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing (the DoReMi/Pile-style curation step):
    compute each source's token mass, derive a per-source acceptance
    rate that caps every source at an equal share of the total token
    budget (rate = min(1, fair_share / src_tokens)), then hash-sample
    deterministically — keep a doc when
    stable_hash64('mix:'||doc_id) % 1e6 < rate*1e6.  The threshold is
    computed in exact integer arithmetic so both engines sample the
    identical doc set; re-running the pipeline reproduces the mixture
    bit-for-bit (no RNG state anywhere).

    Scale shape: one map-side token count + a source-sized aggregate
    (tiny), the rate table broadcasts back onto the corpus scan, and
    the sample is a stateless filter — the 100-TB path never shuffles
    the documents themselves.
    """
    d = spark.table("documents")
    n_tokens = F.size(
        F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
    ).cast("bigint")
    toks = d.select("doc_id", "source", n_tokens.alias("n_tokens"))
    per_source = toks.groupBy("source").agg(
        F.sum("n_tokens").alias("src_tokens"), F.count("*").alias("n_docs")
    )
    totals = per_source.agg(
        F.sum("src_tokens").alias("total_tokens"), F.count("*").alias("n_sources")
    )
    rates = per_source.crossJoin(F.broadcast(totals)).select(
        "source",
        "src_tokens",
        "n_docs",
        F.least(
            F.lit(_MIX_SCALE).cast("bigint"),
            F.expr(f"({_MIX_SCALE} * total_tokens) div (n_sources * src_tokens)"),
        ).alias("keep_threshold"),
    )
    h = F.expr(_H_SPARK.format(x="concat('mix:', cast(doc_id as string))"))
    sampled = toks.join(F.broadcast(rates.select("source", "keep_threshold")), "source").where(
        (h % _MIX_SCALE) < F.col("keep_threshold")
    )
    # Aggregate the sampled side to source grain FIRST, then join the two
    # source-sized tables: a left join could not broadcast its preserved
    # side, so joining pre-aggregation would sort-merge the full corpus.
    sampled_agg = sampled.groupBy("source").agg(
        F.count("*").alias("n_docs_after"),
        F.sum("n_tokens").alias("tokens_after"),
    )
    return rates.join(F.broadcast(sampled_agg), "source", "left").select(
        "source",
        F.col("n_docs").alias("n_docs_before"),
        F.col("src_tokens").alias("tokens_before"),
        F.col("keep_threshold").cast("bigint").alias("keep_threshold"),
        F.coalesce("n_docs_after", F.lit(0)).alias("n_docs_after"),
        F.coalesce("tokens_after", F.lit(0)).cast("bigint").alias("tokens_after"),
    )


# --------------------------------------------------------------------------
# Sequence packing: concat-and-chunk documents into fixed token-budget bins
# --------------------------------------------------------------------------
_PACK_B = 256  # tokens per packed training sequence
_PACK_BUCKET = 64  # doc_ids per offset bucket (scale knob, not semantics)

_PACK_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))::BIGINT AS n
  FROM documents
),
pos AS (
  SELECT doc_id, n,
         COALESCE(SUM(n) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS s
  FROM toks WHERE n > 0
),
frag AS (
  SELECT doc_id, n, s, s + n AS e,
         UNNEST(generate_series(s // {_PACK_B}, (s + n - 1) // {_PACK_B})) AS bin_id
  FROM pos
)
SELECT bin_id, doc_id,
       (LEAST(e, (bin_id + 1) * {_PACK_B})
          - GREATEST(s, bin_id * {_PACK_B}))::BIGINT AS frag_tokens,
       ((e - 1) // {_PACK_B} > s // {_PACK_B}) AS is_split
FROM frag
"""


@register(
    "pack_sequences_chunked",
    oracle=_PACK_SQL,
    tags=("llmdata", "packing"),
    tables=("documents",),
)
def pack_sequences_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, concat-and-chunk flavor (the T5/GPT pretraining
    batcher): lay all documents end-to-end in doc_id order and slice the
    token stream into fixed {B}-token bins; a document crossing a bin
    boundary is split, emitting one fragment row per bin it touches.
    Output: (bin_id, doc_id, frag_tokens, is_split) — the packing
    manifest a loader needs to assemble training sequences.

    The global token offset is the crux: a naive
    ``SUM() OVER (ORDER BY doc_id)`` funnels the whole corpus through
    one task.  Here it is two-pass (the same scheme as the id minter,
    operators/identity.py): docs bucket by ``doc_id div {K}``, bucket
    token sums aggregate map-side to a bucket-count-sized table, an
    exclusive running total over THAT table (bucket-sized, trivially one
    task) broadcasts back, and each doc's offset = bucket offset +
    in-bucket exclusive cumsum (window partitioned by bucket).  Output
    is byte-identical to the naive global window at any partitioning.
    Fragments then come from sequence()+explode — map-side, no driver
    loop, no shuffle after the one window exchange.
    """
    d = spark.table("documents")
    n = F.size(
        F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
    ).cast("bigint")
    toks = (
        d.select("doc_id", n.alias("n"))
        .where(F.col("n") > 0)
        .withColumn("bk", F.expr(f"doc_id div {_PACK_BUCKET}"))
    )
    bsum = toks.groupBy("bk").agg(F.sum("n").alias("btok"))
    wb = Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, -1)
    boff = bsum.select(
        "bk", F.coalesce(F.sum("btok").over(wb), F.lit(0)).cast("bigint").alias("boff")
    )
    wd = (
        Window.partitionBy("bk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = (
        toks.join(F.broadcast(boff), "bk")
        .withColumn(
            "s",
            (F.coalesce(F.sum("n").over(wd), F.lit(0)) + F.col("boff")).cast("bigint"),
        )
        .withColumn("e", F.col("s") + F.col("n"))
    )
    return placed.select(
        F.explode(
            F.expr(f"sequence(s div {_PACK_B}, (e - 1) div {_PACK_B})")
        ).alias("bin_id"),
        "doc_id",
        "s",
        "e",
    ).select(
        "bin_id",
        "doc_id",
        (
            F.least(F.col("e"), (F.col("bin_id") + 1) * _PACK_B)
            - F.greatest(F.col("s"), F.col("bin_id") * _PACK_B)
        ).cast("bigint").alias("frag_tokens"),
        F.expr(f"(e - 1) div {_PACK_B} > s div {_PACK_B}").alias("is_split"),
    )


# --------------------------------------------------------------------------
# Importance-weighted resampling toward a target domain (DSIR-style)
# --------------------------------------------------------------------------
_DSIR_V = 512  # hashed feature vocabulary
_DSIR_S = 1_000_000  # fixed-point 1.0 for per-feature ratios
_DSIR_S2 = 1_000  # fixed-point 1.0 for the totals-ratio factor

_DSIR_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang,
         UNNEST(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS t
  FROM documents
),
feat AS (
  SELECT doc_id, lang, {_H_DUCK.format(x="t")} % {_DSIR_V} AS f FROM tok
),
counts AS (
  SELECT f, COUNT(*)::BIGINT AS raw_cnt,
         (COUNT(*) FILTER (WHERE lang = 'en'))::BIGINT AS tgt_cnt
  FROM feat GROUP BY f
),
tot AS (
  SELECT SUM(raw_cnt)::BIGINT AS raw_tot, SUM(tgt_cnt)::BIGINT AS tgt_tot
  FROM counts
),
wt AS (
  SELECT c.f,
         (({_DSIR_S} * (c.tgt_cnt + 1)) // (c.raw_cnt + 1))
           * (({_DSIR_S2} * (t.raw_tot + {_DSIR_V})) // (t.tgt_tot + {_DSIR_V}))
           // {_DSIR_S2} AS w
  FROM counts c CROSS JOIN tot t
),
scored AS (
  SELECT fe.doc_id, (SUM(w.w) // COUNT(*))::BIGINT AS score_fp
  FROM feat fe JOIN wt w ON w.f = fe.f
  GROUP BY fe.doc_id
)
SELECT d.doc_id, d.lang, s.score_fp
FROM scored s JOIN documents d ON d.doc_id = s.doc_id
WHERE {_H_DUCK.format(x="'dsir:' || d.doc_id::VARCHAR")} % {_DSIR_S}
      < LEAST({_DSIR_S}, s.score_fp)
"""


@register(
    "sample_importance_weighted",
    oracle=_DSIR_SQL,
    tags=("llmdata", "sampling", "dsir"),
    tables=("documents",),
)
def sample_importance_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023),
    integer-arithmetic variant: score every document by how target-like
    its hashed-unigram distribution is (target = the ``lang='en'``
    slice), then keep it with probability proportional to that score via
    a deterministic hash draw — no RNG state, rerunning reproduces the
    selected set bit-for-bit.

    Per-feature weight = smoothed likelihood ratio
    p_target(f)/p_corpus(f) in two bounded fixed-point factors (each
    capped near 1e6/1e3, so the product stays far from BIGINT overflow
    at any corpus size); doc score = mean feature weight; accept when
    ``hash('dsir:'||doc_id) % 1e6 < min(1e6, score)``.  Truncating
    integer division is mirrored exactly in the oracle.

    Scale shape: one token explode feeding a {V}-row feature-count
    aggregate (map-side partials do the heavy lifting), the weight
    table broadcasts back onto the exploded scan, per-doc scores are
    the only real shuffle (keyed on doc_id), and selection is a
    stateless filter — documents themselves never shuffle.
    """
    from openalex_walden_spark.operators.guardrails import persist_scalar

    d = spark.table("documents")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
    # persist_scalar (r14 optimization): `feat` feeds BOTH the feature-
    # count aggregate and the per-doc scoring join, and a DataFrame DAG
    # lowers to a tree — without the persist the corpus tokenize +
    # explode + hash (the dominant compute) executed twice per run.
    # Rows are (bigint, string, bigint) — scalar-only, spillable.
    feat = persist_scalar(
        d.select(
            "doc_id", "lang", F.explode(toks).alias("t")
        ).select(
            "doc_id",
            "lang",
            (F.expr(_H_SPARK.format(x="t")) % _DSIR_V).alias("f"),
        )
    )
    counts = feat.groupBy("f").agg(
        F.count("*").cast("bigint").alias("raw_cnt"),
        F.count(F.when(F.col("lang") == "en", 1)).cast("bigint").alias("tgt_cnt"),
    )
    tot = counts.agg(
        F.sum("raw_cnt").cast("bigint").alias("raw_tot"),
        F.sum("tgt_cnt").cast("bigint").alias("tgt_tot"),
    )
    wt = counts.crossJoin(F.broadcast(tot)).select(
        "f",
        F.expr(
            f"(({_DSIR_S} * (tgt_cnt + 1)) div (raw_cnt + 1))"
            f" * (({_DSIR_S2} * (raw_tot + {_DSIR_V})) div (tgt_tot + {_DSIR_V}))"
            f" div {_DSIR_S2}"
        ).alias("w"),
    )
    scored = (
        feat.join(F.broadcast(wt), "f")
        .groupBy("doc_id")
        .agg(F.expr("sum(w) div count(*)").cast("bigint").alias("score_fp"))
    )
    keep_hash = F.expr(_H_SPARK.format(x="concat('dsir:', cast(doc_id as string))"))
    return (
        scored.join(d.select("doc_id", "lang"), "doc_id")
        .where((keep_hash % _DSIR_S) < F.least(F.lit(_DSIR_S), F.col("score_fp")))
        .select("doc_id", "lang", "score_fp")
    )


# --------------------------------------------------------------------------
# LM-surprisal quality scoring (the CCNet/KenLM perplexity-filter shape)
# --------------------------------------------------------------------------
_SURP_SCALE = 1_000  # fixed-point 1.0 for mean per-bigram surprisal


_LM_SURPRISAL_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_DUCK.format(c='text')} AS ts FROM documents
),
bigrams AS (
  SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS bg
  FROM toks, UNNEST(range(1, len(ts))) AS r(i)
  WHERE len(ts) >= 2
),
counts AS (
  SELECT bg, COUNT(*)::BIGINT AS c FROM bigrams GROUP BY bg
),
maxbits AS (
  SELECT MAX(length(bin(c)))::BIGINT AS mb FROM counts
),
scored AS (
  SELECT b.doc_id,
         COUNT(*)::BIGINT AS n_bigrams,
         SUM(m.mb - length(bin(c.c)))::BIGINT AS surp
  FROM bigrams b JOIN counts c ON c.bg = b.bg CROSS JOIN maxbits m
  GROUP BY b.doc_id
)
SELECT doc_id, n_bigrams,
       (surp * {_SURP_SCALE} // n_bigrams)::BIGINT AS surprisal_fp
FROM scored
"""


@register(
    "quality_lm_surprisal",
    oracle=_LM_SURPRISAL_SQL,
    tags=("llmdata", "quality", "lm"),
    tables=("documents",),
)
def quality_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model quality signal, the CCNet/KenLM perplexity-filter
    shape: train a unigram-of-bigrams model on the corpus itself, score
    each document by its mean per-bigram surprisal, and emit the
    fixed-point score a curation gate thresholds on (high surprisal =
    rare constructions = boilerplate/garbled candidates at the tails).

    Real perplexity needs log-probabilities — floats whose summation
    order is nondeterministic.  Here surprisal is quantized to WHOLE
    BITS: ``length(bin(count))`` is floor(log2)+1 computed exactly as a
    string length in both engines, so a bigram's surprisal is
    (max_bits - bits(count)) — an integer, summed exactly, scaled to
    fixed point.  The ranking this induces is log2-perplexity at 1-bit
    resolution: deterministic under retries and hash-verifiable.

    Scale shape: bigrams explode map-side (adjacent-pair transform, no
    self-join); the count table aggregates with map-side partials; the
    score join shuffles on the bigram key (same discipline as the
    n-gram Jaccard gram join); per-doc sums shuffle on doc_id.  At
    100 TB the exact bigram vocabulary outgrows memory but never needs
    to be IN memory — it stays a shuffled aggregate; a count-min sketch
    (see ``sketch_countmin_estimates``) is the constant-memory variant
    when the model table itself must ship somewhere.
    """
    from openalex_walden_spark.operators.guardrails import persist_scalar

    d = spark.table("documents")
    toks = F.expr(_TOKS_SPARK.format(c="text"))
    # persist_scalar (r14 optimization): `bigrams` feeds BOTH the count
    # model and the scoring join; without the persist the tokenize +
    # bigram explode executed twice per run.  Rows are (bigint, string).
    bigrams = persist_scalar(
        d.select("doc_id", toks.alias("ts"))
        .where(F.size("ts") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ts) - 2),"
                    " i -> concat(ts[i], ' ', ts[i + 1]))"
                )
            ).alias("bg"),
        )
    )
    counts = bigrams.groupBy("bg").agg(F.count("*").cast("bigint").alias("c"))
    maxbits = counts.agg(
        F.max(F.length(F.bin(F.col("c")))).cast("bigint").alias("mb")
    )
    return (
        bigrams.join(counts, "bg")
        .crossJoin(F.broadcast(maxbits))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("mb") - F.length(F.bin(F.col("c"))))
            .cast("bigint")
            .alias("surp"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.expr(f"surp * {_SURP_SCALE} div n_bigrams")
            .cast("bigint")
            .alias("surprisal_fp"),
        )
    )


# --------------------------------------------------------------------------
# Prefix-filter set-similarity join (AllPairs/PPJoin family) — EXACT
# threshold-Jaccard pairs, no LSH false negatives
# --------------------------------------------------------------------------
# θ = 4/5 kept as exact integer arithmetic throughout.  High thresholds
# are the operating point of dedup joins AND of the filter itself: the
# prefix is n - ceil(θn) + 1 tokens, so θ=0.8 indexes only the rarest
# ~20% of each doc; at θ=0.5 half of every doc lands in the index and
# candidate buckets degenerate toward all-pairs on a small vocabulary.

_PREFIX_SQL = f"""
WITH corpus AS ({_DUCK_CORPUS_NEARDUP}),
toks AS (
  SELECT doc_id, UNNEST({_duck_shingles('text')}) AS tok
  FROM corpus
),
sizes AS (SELECT doc_id, COUNT(*)::BIGINT AS n FROM toks GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*)::BIGINT AS n_inter
  FROM toks a JOIN toks b ON b.tok = a.tok AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.doc_a, i.doc_b, i.n_inter,
       (sa.n + sb.n - i.n_inter)::BIGINT AS n_union,
       i.n_inter::DOUBLE / (sa.n + sb.n - i.n_inter)::DOUBLE AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE 5 * i.n_inter >= 4 * (sa.n + sb.n - i.n_inter)
"""


@register(
    "dedup_prefix_filter_pairs",
    oracle=_PREFIX_SQL,
    tags=("llmdata", "dedup", "prefix-filter"),
    tables=("documents",),
)
def dedup_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity join at Jaccard >= 4/5 via prefix filtering
    (the AllPairs/PPJoin family, Bayardo et al. 2007 / Xiao et al.
    2008) — the lossless counterpart to MinHash LSH: LSH banding can
    MISS true pairs; prefix filtering provably cannot.

    The SET SPACE is the LSH query's own 3-token shingles — so this
    query is the exact ground truth for what ``dedup_minhash_lsh_pairs``
    approximates (unigram sets degenerate on a small shared vocabulary:
    most docs become genuinely similar and the true output itself goes
    quadratic; shingle sets are discriminative).

    The filter: order each doc's distinct shingles globally by (document
    frequency asc, shingle asc) and keep only the first
    n - ceil(θ·n) + 1 of them as the doc's PREFIX.  Two sets with
    Jaccard >= θ MUST share a prefix token (pigeonhole on the rarest
    tokens), so the candidate join runs on exploded prefix tokens only
    — and because prefixes lead with the RAREST tokens, candidate
    buckets are the emptiest ones the vocabulary has.  Candidates are
    then verified with the same exact intersection join the LSH path
    uses; the threshold test ``5·inter >= 4·union`` stays in integers.

    The ORACLE deliberately does NOT prefix-filter: it computes every
    sharing-a-token pair exactly — so the parity check itself proves
    the filter is lossless on the corpus (a dropped true pair would
    hash-mismatch).

    Scale shape: one vocab-sized df aggregate, one (doc-keyed)
    window to rank tokens within each doc, a candidate equi-join on
    prefix tokens (fan-out bounded by rare-token bucket sizes; the
    hottest tokens never enter any prefix of a large doc), and a
    map-side array-intersection verify over per-doc sorted shingle
    arrays (bounded by tokens-per-doc) — no all-pairs stage and no
    candidate x tokens row blowup anywhere.
    """
    from openalex_walden_spark.operators.guardrails import persist_scalar

    corpus = _spark_corpus_neardup(spark).repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    shingle_arr = """
        CASE WHEN size(toks) >= 3 THEN array_distinct(transform(
               sequence(0, size(toks) - 3),
               i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
             WHEN size(toks) > 0 THEN array(array_join(toks, ' '))
             ELSE array() END
    """
    toks = persist_scalar(
        corpus.withColumn("toks", F.expr(_TOKS_SPARK.format(c="text")))
        .select("doc_id", F.explode(F.expr(shingle_arr)).alias("tok"))
    )
    df_tbl = toks.groupBy("tok").agg(F.count("*").cast("bigint").alias("dfreq"))
    wd = Window.partitionBy("doc_id")
    ranked = (
        toks.join(df_tbl, "tok")
        .withColumn("n", F.count("*").over(wd))
        .withColumn(
            "rn",
            F.row_number().over(wd.orderBy(F.col("dfreq").asc(), F.col("tok").asc())),
        )
    )
    # θ = 4/5: prefix length = n - ceil(4n/5) + 1 = n - (4n+4) div 5 + 1.
    prefix = ranked.where(
        F.col("rn") <= F.col("n") - F.expr("(4 * n + 4) div 5") + 1
    ).select("doc_id", "tok")
    a = prefix.select(F.col("doc_id").alias("doc_a"), "tok")
    b = prefix.select(F.col("doc_id").alias("doc_b"), "tok")
    cand = (
        a.join(b, "tok")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # r15 verify rewrite (guide §2.3 "shuffle fewer bytes"): the old
    # verify exploded every candidate against BOTH docs' full token
    # lists (cand ⋈ toks_a ⋈ toks_b on (doc, tok) — a |cand| x
    # tokens-per-doc row blowup, ~9M intermediate rows at sf0.1 —
    # followed by a (doc_a, doc_b) count aggregate over that blowup).
    # Each doc's DISTINCT shingle set instead rolls up ONCE into a
    # sorted array (bounded by tokens-per-doc, the same per-row bound
    # the exploded path carried per group; computed from the persisted
    # token rows, NOT persisted itself — the persist guards refuse
    # string arrays by design), and the intersection count is map-side
    # ``size(array_intersect(...))`` after two equi-joins that move
    # only the candidate rows and each participating doc's array.  The
    # exploded join, its (doc,tok) exchange, and the 9M-row aggregate
    # disappear; n_inter is the same distinct-token intersection count,
    # so n_union and the double-division jaccard are bit-identical.
    # Interleaved A/B at sf0.1 (min-of-4): 5.37 -> 3.69 s; the
    # candidate-side persist went with the exploded verify (cand now
    # has a single consumer).
    docarr = toks.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("tok")).alias("arr"),
        F.count("*").cast("bigint").alias("n"),
    )
    return (
        cand.join(
            docarr.select(
                F.col("doc_id").alias("doc_a"),
                F.col("arr").alias("arr_a"),
                F.col("n").alias("na"),
            ),
            "doc_a",
        )
        .join(
            docarr.select(
                F.col("doc_id").alias("doc_b"),
                F.col("arr").alias("arr_b"),
                F.col("n").alias("nb"),
            ),
            "doc_b",
        )
        .withColumn("n_inter", F.size(F.array_intersect("arr_a", "arr_b")).cast("bigint"))
        .where(
            5 * F.col("n_inter")
            >= 4 * (F.col("na") + F.col("nb") - F.col("n_inter"))
        )
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            (F.col("na") + F.col("nb") - F.col("n_inter")).cast("bigint").alias("n_union"),
            (
                F.col("n_inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------
# Overlapping-window document chunking (context-window preparation)
# --------------------------------------------------------------------------
_CHUNK_W = 200   # window chars
_CHUNK_S = 150   # stride (W - S = 50 chars of overlap)

_CHUNK_SQL = f"""
WITH sized AS (
  SELECT doc_id, text, length(text) AS n,
         CASE WHEN length(text) > {_CHUNK_W}
              THEN (length(text) - {_CHUNK_W} + {_CHUNK_S} - 1) // {_CHUNK_S} + 1
              ELSE 1 END AS n_chunks
  FROM documents
  WHERE text IS NOT NULL AND length(text) > 0
)
SELECT doc_id, CAST(r.k AS BIGINT) AS chunk_id, n_chunks::BIGINT AS n_chunks,
       substr(text, CAST(r.k * {_CHUNK_S} + 1 AS BIGINT), {_CHUNK_W}) AS chunk,
       length(substr(text, CAST(r.k * {_CHUNK_S} + 1 AS BIGINT), {_CHUNK_W}))::BIGINT AS chunk_len
FROM sized, UNNEST(range(0, n_chunks)) AS r(k)
"""


@register(
    "chunk_documents_overlap",
    oracle=_CHUNK_SQL,
    tags=("llmdata", "chunking"),
    tables=("documents",),
)
def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window document chunking — the context-window
    preparation step of a training/RAG pipeline: fixed {W}-char windows
    every {S} chars (W-S chars of overlap so no boundary content is
    lost), the final window keeps its natural short tail, and documents
    shorter than one window yield exactly one chunk.

    The chunk count is pure non-negative integer arithmetic
    ((n - W + S - 1) div S + 1), so Spark and the oracle agree exactly.

    Scale shape: one map-side sequence+explode per document — ZERO
    shuffles at any corpus size; output order is irrelevant (chunk_id
    is explicit) so downstream repartitioning is free."""
    d = spark.table("documents").where(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    n_chunks = F.when(
        F.length("text") > _CHUNK_W,
        F.expr(
            f"(length(text) - {_CHUNK_W} + {_CHUNK_S} - 1) div {_CHUNK_S} + 1"
        ),
    ).otherwise(F.lit(1))
    chunk = F.expr(f"substring(text, k * {_CHUNK_S} + 1, {_CHUNK_W})")
    return (
        d.withColumn("n_chunks", n_chunks.cast("bigint"))
        .select(
            "doc_id",
            "text",
            "n_chunks",
            F.explode(F.expr("sequence(0, n_chunks - 1)")).alias("k"),
        )
        .select(
            "doc_id",
            F.col("k").cast("bigint").alias("chunk_id"),
            "n_chunks",
            chunk.alias("chunk"),
            F.length(chunk).cast("bigint").alias("chunk_len"),
        )
    )


# --------------------------------------------------------------------------
# BPE merge induction: the training side of tokenization
# --------------------------------------------------------------------------
# ``text_token_stats`` APPLIES a tokenization; this is how one gets
# TRAINED: count adjacent-symbol pairs across the word-frequency table
# and rank merge candidates (Sennrich et al., "Neural Machine
# Translation of Rare Words with Subword Units", ACL 2016 — one
# iteration of the greedy merge loop, the same expose-the-step shape as
# ``kmeans_lloyd_step``).  Counts weight by word frequency (the corpus
# is first collapsed to distinct words), ranking is total-ordered
# (count DESC, pair ASC) so the verdict is engine-exact.
_BPE_TOPK = 20

_BPE_SQL = f"""
WITH words AS MATERIALIZED (
  SELECT w, COUNT(*)::BIGINT AS freq FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
  ) WHERE w <> '' GROUP BY w
),
pairs AS (
  SELECT substr(w, r.i, 1) AS sym_a, substr(w, r.i + 1, 1) AS sym_b, freq
  FROM words, UNNEST(range(1, length(w))) AS r(i)
),
agg AS (
  SELECT sym_a, sym_b, SUM(freq)::BIGINT AS pair_count
  FROM pairs GROUP BY sym_a, sym_b
)
SELECT sym_a, sym_b, pair_count,
       CAST(row_number() OVER (ORDER BY pair_count DESC, sym_a ASC, sym_b ASC) AS BIGINT) AS rk
FROM agg
QUALIFY rk <= {_BPE_TOPK}
"""


@register(
    "bpe_top_merges",
    oracle=_BPE_SQL,
    tags=("llmdata", "tokenizer"),
    tables=("documents",),
)
def bpe_top_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} BPE merge candidates: adjacent character-pair counts over
    the word-frequency table, totally ordered.  See the SQL block
    comment for the algorithmic lineage.

    Scale shape: the corpus collapses to DISTINCT words first (the
    classic BPE trick — pair counting is per unique word times its
    frequency, so a trillion-token corpus costs its vocabulary, not its
    token count); pair extraction is a map-side transform over the word
    table; one (sym_a, sym_b) partial aggregate ranks globally over at
    most |alphabet|^2 rows."""
    d = spark.table("documents")
    words = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    pairs = words.where(F.length("w") > 1).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1), "
                "i -> struct(substring(w, i, 1) AS sym_a, substring(w, i + 1, 1) AS sym_b))"
            )
        ).alias("p"),
        "freq",
    ).select("p.sym_a", "p.sym_b", "freq")
    counts = pairs.groupBy("sym_a", "sym_b").agg(
        F.sum("freq").cast("bigint").alias("pair_count")
    )
    wr = Window.orderBy(
        F.col("pair_count").desc(), F.col("sym_a").asc(), F.col("sym_b").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(wr).cast("bigint"))
        .where(F.col("rk") <= _BPE_TOPK)
        .select("sym_a", "sym_b", "pair_count", "rk")
    )


# --------------------------------------------------------------------------
# Per-host budgeted crawl queue (acquisition-side scheduling)
# --------------------------------------------------------------------------
# The reference schedules paywall-candidate fetches with two disciplines
# (notebooks/paywall_signals/build_drain_queue.sql, build_drip_pool.sql):
# dedupe to ONE best candidate per work (yield DESC, stable tie-break),
# then rank within each url_host so a politeness-capped drain is just
# WHERE host_rank <= cap — per-host fairness without a scheduler
# process; a hash rand_key gives the slow-drip pool its randomized
# stable order.  Yields here are deterministic integer scores derived
# from the engine-portable 60-bit hash, so ranks are engine-exact.
_CRAWL_HOST_CAP = 40

_CRAWL_SQL = f"""
WITH cand AS (
  SELECT doc_id, doc_id % 200 AS work_key, source AS url_host,
         ('0x' || substr(md5('y:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 AS yield_fp,
         ('0x' || substr(md5('r:' || CAST(doc_id % 200 AS VARCHAR)), 1, 15))::BIGINT AS rand_key
  FROM documents
),
deduped AS (
  SELECT *, row_number() OVER (
    PARTITION BY work_key ORDER BY yield_fp DESC, doc_id ASC) AS rn
  FROM cand
)
SELECT work_key, doc_id, url_host, yield_fp, rand_key,
       CAST(host_rank AS BIGINT) AS host_rank
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY url_host ORDER BY yield_fp DESC, doc_id ASC) AS host_rank
  FROM deduped WHERE rn = 1
)
WHERE host_rank <= {_CRAWL_HOST_CAP}
"""


@register(
    "crawl_drain_queue",
    oracle=_CRAWL_SQL,
    tags=("llmdata", "acquisition", "queue"),
    tables=("documents",),
)
def crawl_drain_queue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host budgeted fetch queue: best candidate per work, ranked
    within each host, capped at {CAP} per host — per-host politeness
    enforced by a WHERE clause instead of a scheduler (see the SQL
    block comment for the reference lineage).  The rand_key column is
    the slow-drip pool's randomized stable order (retry passes anti-join
    prior winners — the J3 shape — and walk it again).

    Scale shape: two windows, each partitioned by a bounded key (work,
    host); the host window is exactly the top-k-per-group pattern — at
    100 TB the rank never materializes beyond each host's partition,
    and AQE handles the hot-host skew the cap exists to throttle."""
    d = spark.table("documents")
    h = "cast(conv(substr(md5({x}), 1, 15), 16, 10) as bigint)"
    cand = d.select(
        "doc_id",
        (F.col("doc_id") % 200).alias("work_key"),
        F.col("source").alias("url_host"),
        (F.expr(h.format(x="concat('y:', cast(doc_id as string))")) % 10000).alias("yield_fp"),
        F.expr(h.format(x="concat('r:', cast(doc_id % 200 as string))")).alias("rand_key"),
    )
    wd = Window.partitionBy("work_key").orderBy(
        F.col("yield_fp").desc(), F.col("doc_id").asc()
    )
    wh = Window.partitionBy("url_host").orderBy(
        F.col("yield_fp").desc(), F.col("doc_id").asc()
    )
    return (
        cand.withColumn("rn", F.row_number().over(wd))
        .where(F.col("rn") == 1)
        .drop("rn")
        .withColumn("host_rank", F.row_number().over(wh).cast("bigint"))
        .where(F.col("host_rank") <= _CRAWL_HOST_CAP)
    )


# --------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 and embedding ANN
# --------------------------------------------------------------------------
# The modern retrieval stack runs a lexical arm and a semantic arm and
# fuses their rank lists with RRF (Cormack/Clarke/Buettcher, SIGIR'09:
# score(d) = sum over systems of 1/(k + rank_d), k=60).  Scores here
# are integer fixed-point (10^9 div (60 + rank)) so fusion and the
# final ordering are engine-exact; each probe vector is the embedding
# whose vec_id is query_id*100+7 (the corpus convention the ANN
# queries sample).
#
# The semantic arm routes through the TRAINED IVF quantizer
# (advanced.py's fixed-point Lloyd loop) instead of brute-forcing the
# corpus: each query probes its top-{_TR_P} trained cells and
# exact-ranks only those cells' members.  Round-7 verdict: the old
# brute arm put the ENTIRE corpus in one window partition per query —
# a single-task corpus sort at scale.  With IVF routing the per-query
# partition is P*N/k rows (P, k grow with the corpus), and the oracle
# replays the identical probe relationally (same unrolled training
# chain the trained-IVF oracles use), so fusion stays hash-exact.
from openalex_walden_spark.queries.advanced import (  # noqa: E402
    _TR_AF_CTE,
    _TR_P,
    _TR_T,
    _tr_iter_ctes,
)

_RRF_K = 60
_RRF_ONE = 1_000_000_000

_HYBRID_SQL = f"""
WITH {_tr_iter_ctes()},
{_TR_AF_CTE},
q(query_id, term) AS (VALUES {_retrieval_values()}),
qterms AS (SELECT DISTINCT term FROM q),
tok AS (
  SELECT doc_id, unnest({_TOKS_DUCK.format(c='text')}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
scal AS (SELECT CAST(SUM(dl) AS BIGINT) AS s, COUNT(*)::BIGINT AS n FROM dl),
dft AS (
  SELECT tf.term, count(*)::BIGINT AS df
  FROM tf JOIN qterms USING (term) GROUP BY tf.term
),
scored AS (
  SELECT q.query_id, tf.doc_id,
         (((scal.n - dft.df) * 2000 + 1000) // (2 * dft.df + 1))
         * ((44 * scal.s * tf.tf * 1000)
            // (20 * scal.s * tf.tf + 6 * scal.s + 18 * dl.dl * scal.n))
           AS part
  FROM tf
  JOIN q ON q.term = tf.term
  JOIN dft ON dft.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN scal
),
lex AS (
  SELECT query_id, doc_id, rank_lex FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY SUM(part) DESC, doc_id ASC) AS rank_lex
    FROM scored GROUP BY query_id, doc_id
  ) WHERE rank_lex <= 10
),
probes AS (
  SELECT DISTINCT query_id, query_id * 100 + 7 AS pvec FROM q
),
pq AS (
  SELECT p.query_id, e.embedding AS qe, pt.qx AS qqx
  FROM probes p
  JOIN embeddings e ON e.vec_id = p.pvec
  JOIN pts pt ON pt.vec_id = p.pvec
),
hrouted AS (
  SELECT query_id, qe, cluster AS probe_cell FROM (
    SELECT query_id, qe, cluster,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY d2 ASC, cluster ASC) AS rc
    FROM (
      SELECT pq.query_id, pq.qe, c.cluster,
             list_sum(list_transform(range(1, len(pq.qqx) + 1),
               i -> (pq.qqx[i] - c.qc[i]) * (pq.qqx[i] - c.qc[i])))::BIGINT AS d2
      FROM pq CROSS JOIN c{_TR_T} c
    )
  ) WHERE rc <= {_TR_P}
),
sem AS (
  SELECT query_id, doc_id, rank_sem FROM (
    SELECT r.query_id, e.vec_id AS doc_id,
           row_number() OVER (PARTITION BY r.query_id ORDER BY
             list_sum(list_transform(range(1, len(e.embedding) + 1),
               i -> r.qe[i]::DOUBLE * e.embedding[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(r.qe, x -> x::DOUBLE * x::DOUBLE)))
                * sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))) DESC,
             e.vec_id ASC) AS rank_sem
    FROM hrouted r
    JOIN af ON af.cluster = r.probe_cell
    JOIN embeddings e ON e.vec_id = af.vec_id
  ) WHERE rank_sem <= 10
),
fused AS (
  SELECT COALESCE(l.query_id, s.query_id) AS query_id,
         COALESCE(l.doc_id, s.doc_id) AS doc_id,
         COALESCE({_RRF_ONE} // ({_RRF_K} + l.rank_lex), 0)
         + COALESCE({_RRF_ONE} // ({_RRF_K} + s.rank_sem), 0) AS rrf_fp
  FROM lex l FULL OUTER JOIN sem s
    ON s.query_id = l.query_id AND s.doc_id = l.doc_id
)
SELECT query_id, doc_id, CAST(rrf_fp AS BIGINT) AS rrf_fp,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_fp DESC, doc_id ASC) AS BIGINT) AS rank
FROM fused
QUALIFY rank <= 10
"""


def _hybrid_semantic_arm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hybrid query's semantic rank list, routed through the
    trained IVF quantizer: assign every corpus vector to its trained
    cell map-side (zero shuffle), route each probe vector to its
    top-P cells against the broadcast centroid literals (also
    map-side), then exact-rank cosine ONLY inside the probed cells via
    a broadcast-hash equi-join on the cell label.  The per-query
    window partition holds P cells' members, never the corpus — the
    round-7 scale fix.  Factored out so the plan test can pin that
    shape independent of the lexical arm."""
    from openalex_walden_spark.queries.advanced import (
        _KM_Q,
        _TR_ARGMIN,
        _TR_D2,
        _tr_cent_array,
        train_ivf_centroids,
    )

    cents = train_ivf_centroids(spark, sf_dir)
    e = spark.table("embeddings").withColumn(
        "qx",
        F.expr(
            f"transform(embedding, x -> cast(floor(cast(x as double) * {_KM_Q}) as bigint) + {_KM_Q})"
        ),
    )
    assigned = e.withColumn("cents", _tr_cent_array(cents)).select(
        "vec_id", "embedding", F.expr(_TR_ARGMIN)["cl"].alias("cell")
    )
    probe_arr = F.expr(
        "slice(array_sort(transform(cents, c -> "
        f"named_struct('d2', {_TR_D2}, 'cl', c.cl))), 1, {_TR_P})"
    )
    probes = F.broadcast(
        spark.createDataFrame(
            [(qid, qid * 100 + 7) for qid, _ in _RETRIEVAL_QUERIES],
            "query_id int, pvec long",
        )
    )
    routed = F.broadcast(
        probes.join(e, probes.pvec == e.vec_id)
        .withColumn("cents", _tr_cent_array(cents))
        .select(
            "query_id",
            F.col("embedding").alias("qe"),
            F.explode(probe_arr).alias("pc"),
        )
        .select("query_id", "qe", F.col("pc.cl").alias("probe_cell"))
    )
    dot = F.aggregate(
        F.zip_with(F.col("qe"), F.col("embedding"),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)

    def norm(c):
        return F.sqrt(F.aggregate(
            F.transform(F.col(c), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0), lambda acc, x: acc + x))

    wsem = Window.partitionBy("query_id").orderBy(
        (dot / (norm("qe") * norm("embedding"))).desc(), F.col("vec_id").asc()
    )
    return (
        assigned.join(routed, F.col("cell") == routed.probe_cell)
        .withColumn("rank_sem", F.row_number().over(wsem))
        .where(F.col("rank_sem") <= 10)
        .select("query_id", F.col("vec_id").alias("doc_id"), "rank_sem")
    )


@register(
    "search_hybrid_rrf",
    oracle=_HYBRID_SQL,
    tags=("llmdata", "search", "hybrid"),
    tables=("documents", "embeddings"),
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-10 fused with IVF-routed embedding
    top-10 by integer reciprocal-rank fusion (see the SQL block
    comment).  Reuses the persisted-posting-list BM25 arm as-is; the
    semantic arm is ``_hybrid_semantic_arm`` — trained-quantizer cell
    routing, NOT a corpus-wide window; the fusion is a full outer join
    of two <=10-row-per-query rank lists — at 100 TB the fusion cost
    is the query count, never the corpus."""
    lex = (
        search_bm25_topk(spark, sf_dir)
        .select("query_id", "doc_id", F.col("rank").alias("rank_lex"))
    )
    sem = _hybrid_semantic_arm(spark, sf_dir)
    fused = (
        lex.alias("l")
        .join(
            sem.alias("s"),
            (F.col("s.query_id") == F.col("l.query_id"))
            & (F.col("s.doc_id") == F.col("l.doc_id")),
            "full_outer",
        )
        .select(
            F.coalesce("l.query_id", "s.query_id").alias("query_id"),
            F.coalesce("l.doc_id", "s.doc_id").alias("doc_id"),
            (
                F.coalesce(
                    F.expr(f"{_RRF_ONE} div ({_RRF_K} + rank_lex)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"{_RRF_ONE} div ({_RRF_K} + rank_sem)"), F.lit(0)
                )
            ).cast("bigint").alias("rrf_fp"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("rrf_fp").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(wf).cast("bigint"))
        .where(F.col("rank") <= 10)
    )
