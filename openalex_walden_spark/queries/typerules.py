"""D7 reference-breadth type cascade over the rules-as-data corpus.

The cascade table (functions/typecascade.py) ports the decision order and
highest-traffic branches of the reference's generated ~400-WHEN CASE
(``notebooks/end2end/CreateLocationsWithTypes.sql:120-704``). This query
runs the FULL cascade — every rule — over a golden corpus with one
trigger row per rule, so the driver's hash check proves rule-by-rule that
the Spark compilation and the ANSI-SQL compilation of the same table
agree. 100-TB shape: the whole cascade is one codegen'd CASE expression —
classification is map-side only, no shuffle, rule count adds zero plan
nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from openalex_walden_spark.functions.typecascade import (
    CASCADE_RULES,
    corpus,
    duck_case,
    spark_case,
)
from openalex_walden_spark.queries.registry import register

_FIELDS = (
    "case_id", "title", "raw", "crtype", "host", "src", "cont",
    "abstract", "doiurl", "genre", "issue", "fp", "oatype", "ptl",
    "srctype", "nrefs", "single", "hasabs", "retr", "confabs",
    "confpap", "hasjournal",
)


def _values_sql() -> str:
    rows = []
    for r in corpus():
        cells = []
        for f in _FIELDS:
            v = r[f]
            if isinstance(v, bool):
                cells.append("TRUE" if v else "FALSE")
            elif isinstance(v, int):
                cells.append(str(v))
            else:
                cells.append("'" + str(v).replace("'", "''") + "'")
        rows.append("(" + ", ".join(cells) + ")")
    return ",\n".join(rows)


_D7_REF_SQL = f"""
WITH corpus({", ".join(_FIELDS)}) AS (
  VALUES
{_values_sql()}
),
feat AS (
  SELECT *, concat(src, ' ', cont) AS sc, rtrim(title, ' .') AS titlert
  FROM corpus
)
SELECT case_id, {duck_case()} AS work_type
FROM feat
"""


@register(
    "d7_reference_cascade",
    oracle=_D7_REF_SQL,
    tags=("domain", "D7", "rules-as-data"),
    tables=(),
)
def d7_reference_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every ported reference rule fired and value-checked row-by-row
    (the corpus has one row per rule plus a fallback row)."""
    rows = [tuple(r[f] for f in _FIELDS) for r in corpus()]
    schema = (
        "case_id int, title string, raw string, crtype string, host string,"
        " src string, cont string, abstract string, doiurl string,"
        " genre string, issue string, fp string, oatype string,"
        " ptl string, srctype string, nrefs int, single boolean,"
        " hasabs boolean, retr boolean, confabs boolean, confpap boolean,"
        " hasjournal boolean"
    )
    df = (
        spark.createDataFrame(rows, schema)
        .withColumn("sc", F.concat_ws(" ", F.col("src"), F.col("cont")))
        .withColumn("titlert", F.expr("trim(TRAILING ' .' FROM title)"))
    )
    cols = {f: F.col(f) for f in _FIELDS if f != "case_id"}
    cols["sc"] = F.col("sc")
    cols["titlert"] = F.col("titlert")
    return df.select(
        "case_id", spark_case(cols).alias("work_type")
    )


# Documented size claim, pinned so the table can only grow.
assert len(CASCADE_RULES) >= 100, len(CASCADE_RULES)


# --------------------------------------------------------------------------
# D7 final flip: dict fallback + preprint-registrant override + reason
# --------------------------------------------------------------------------
from openalex_walden_spark.functions.typecascade import DICT_MAP  # noqa: E402

_FLIP_FIELDS = (
    "case_id", "provenance", "raw_type", "loc_type", "cascade_type",
    "is_default", "preprint_registrant",
)


def _flip_corpus() -> list[tuple]:
    """One row per dict entry (fired through the default path), plus the
    override/pass-through/unmapped edge rows."""
    rows: list[tuple] = []
    cid = 0
    prov_of = {"repo": "repo_backfill", "datacite": "datacite",
               "crossref": "crossref", "pubmed": "pubmed"}
    for fam, k, _t in DICT_MAP:
        rows.append((cid, prov_of[fam], k, "", "article", True, False))
        cid += 1
    rows += [
        # preprint-registrant wins over everything
        (cid, "crossref", "book", "", "book", False, True),
        # non-default cascade verdict passes through untouched
        (cid + 1, "crossref", "journal-article", "", "review", False, False),
        # default + unmapped raw_type: keep the incoming non-empty type
        (cid + 2, "repo", "zzz-unmapped", "report", "article", True, False),
        # default + unmapped + empty incoming type: article
        (cid + 3, "pubmed", "zzz-unmapped", "", "article", True, False),
        # dict key is matched case-insensitively on the raw type
        (cid + 4, "repo", "PhDThesis", "", "article", True, False),
        # family fold: plain 'repo' provenance uses the repo dictionary
        (cid + 5, "repo", "masterthesis", "", "article", True, False),
    ]
    return rows


def _flip_values_sql() -> str:
    out = []
    for r in _flip_corpus():
        cells = []
        for v in r:
            if isinstance(v, bool):
                cells.append("TRUE" if v else "FALSE")
            elif isinstance(v, int):
                cells.append(str(v))
            else:
                cells.append("'" + str(v).replace("'", "''") + "'")
        out.append("(" + ", ".join(cells) + ")")
    return ",\n".join(out)


def _dict_values_sql() -> str:
    return ",\n".join(
        "('" + "', '".join(c.replace("'", "''") for c in row) + "')"
        for row in DICT_MAP
    )


_D7_FLIP_SQL = f"""
WITH corpus({", ".join(_FLIP_FIELDS)}) AS (
  VALUES
{_flip_values_sql()}
),
dict_map(family, k, mapped_type) AS (
  VALUES
{_dict_values_sql()}
)
SELECT c.case_id,
  CASE WHEN c.preprint_registrant THEN 'preprint'
       WHEN c.is_default
         THEN COALESCE(dm.mapped_type, NULLIF(c.loc_type, ''), 'article')
       ELSE c.cascade_type END AS work_type,
  CASE WHEN c.preprint_registrant THEN 'preprint-registrant'
       WHEN c.is_default AND dm.mapped_type IS NOT NULL
         THEN 'dict:' || dm.family
       WHEN c.is_default THEN 'default'
       ELSE 'cascade' END AS reason
FROM corpus c
LEFT JOIN dict_map dm
  ON dm.family = CASE WHEN c.provenance IN ('repo', 'repo_backfill')
                        THEN 'repo' ELSE c.provenance END
 AND dm.k = lower(c.raw_type)
"""


@register(
    "d7_dict_fallback",
    oracle=_D7_FLIP_SQL,
    tags=("domain", "D7", "rules-as-data"),
    tables=(),
)
def d7_dict_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's final type flip
    (CreateLocationsWithTypes.sql:460-695): rows the cascade defaulted
    to 'article' fall back to a per-provenance raw-type dictionary
    (DICT_MAP, all 221 entries fired here row-by-row), a
    preprint-registrant DOI-prefix flag overrides everything, and every
    verdict carries its reason code. 100-TB shape: the dictionary is a
    broadcast dimension (few hundred rows, like the reference's VALUES
    table); the flip itself is one codegen'd CASE — classification adds
    no shuffle."""
    rows = _flip_corpus()
    schema = (
        "case_id int, provenance string, raw_type string, loc_type string,"
        " cascade_type string, is_default boolean, preprint_registrant boolean"
    )
    c = spark.createDataFrame(rows, schema)
    dm = spark.createDataFrame(list(DICT_MAP), "family string, k string, mapped_type string")
    fam = F.when(
        F.col("provenance").isin("repo", "repo_backfill"), F.lit("repo")
    ).otherwise(F.col("provenance"))
    joined = c.withColumn("fam", fam).join(
        F.broadcast(dm),
        (F.col("fam") == F.col("family")) & (F.col("k") == F.lower(F.col("raw_type"))),
        "left",
    )
    work_type = (
        F.when(F.col("preprint_registrant"), F.lit("preprint"))
        .when(
            F.col("is_default"),
            F.coalesce(
                F.col("mapped_type"),
                F.nullif(F.col("loc_type"), F.lit("")),
                F.lit("article"),
            ),
        )
        .otherwise(F.col("cascade_type"))
    )
    reason = (
        F.when(F.col("preprint_registrant"), F.lit("preprint-registrant"))
        .when(
            F.col("is_default") & F.col("mapped_type").isNotNull(),
            F.concat(F.lit("dict:"), F.col("family")),
        )
        .when(F.col("is_default"), F.lit("default"))
        .otherwise(F.lit("cascade"))
    )
    return joined.select(
        "case_id", work_type.alias("work_type"), reason.alias("reason")
    )


# --------------------------------------------------------------------------
# D7 ingest-side dc:type resolution (the raw-type long tail)
# --------------------------------------------------------------------------
from openalex_walden_spark.functions.ingest_typemap import (  # noqa: E402
    COAR_RESOURCE_TYPE_MAP,
    RAW_TYPE_RANKING_MAP,
    TYPE_PRIORITY,
)

_EU = "info:eu-repo/semantics/"
_COAR_RX = r"(c_[0-9a-z]+|r60j-j5bd)"
_COAR_MARK = r"coar/resource_type/|coar-repositories\.org/resource_types/"


def _ingest_corpus() -> list[tuple[int, list[str | None] | None]]:
    """One row per text-map key (fires the primary path), plus the
    eu-repo / COAR / version / priority-selection edge rows."""
    rows: list[tuple[int, list[str | None] | None]] = []
    cid = 0
    for k in sorted(RAW_TYPE_RANKING_MAP):
        rows.append((cid, [k])); cid += 1
    for code in sorted(COAR_RESOURCE_TYPE_MAP):
        rows.append((cid, [f"http://purl.org/coar/resource_type/{code}"])); cid += 1
    rows += [
        # eu-repo-stripped retry (full string absent from the text map)
        (cid, ["zz info:eu-repo/semantics/book"]),
        # COAR version marker -> article
        (cid + 1, ["http://purl.org/coar/version/c_970fb48d"]),
        # COAR marker, unmapped code -> other
        (cid + 2, ["http://purl.org/coar/resource_type/c_zzzz9"]),
        # COAR marker, no code at all -> other
        (cid + 3, ["http://purl.org/coar/resource_type/"]),
        # unmapped free text -> other
        (cid + 4, ["zzz never a type"]),
        # empty / blank-only arrays -> (null, other)
        (cid + 5, []),
        (cid + 6, [None, "   "]),
        # priority: dissertation (rank 1) beats report (rank 10)
        (cid + 7, ["working paper", "doctoral thesis"]),
        # same type, structured (eu-repo) raw wins over plain text
        (cid + 8, ["book", "zz info:eu-repo/semantics/book"]),
        # same type + same structuredness: array order wins
        (cid + 9, ["book", "books"]),
        # 'article' (rank 18) loses to 'letter' (rank 14)
        (cid + 10, ["article", "letter to the editor"]),
    ]
    return rows


def _ingest_values_sql() -> str:
    out = []
    for cid, arr in _ingest_corpus():
        if arr is None:
            out.append(f"({cid}, NULL)")
            continue
        cells = []
        for v in arr:
            cells.append("NULL" if v is None else "'" + v.replace("'", "''") + "'")
        out.append(f"({cid}, [{', '.join(cells)}])")
    return ",\n".join(out)


def _map_values_sql(pairs) -> str:
    return ",\n".join(
        "('" + k.replace("'", "''") + "', '" + v.replace("'", "''") + "')"
        for k, v in pairs
    )


_D7_INGEST_SQL = f"""
WITH corpus(case_id, dc_types) AS (
  VALUES
{_ingest_values_sql()}
),
tmap(k, t) AS (
  VALUES
{_map_values_sql(sorted(RAW_TYPE_RANKING_MAP.items()))}
),
coar(code, t) AS (
  VALUES
{_map_values_sql(sorted(COAR_RESOURCE_TYPE_MAP.items()))}
),
prio(t, rk) AS (
  VALUES
{", ".join(f"('{t}', {i})" for i, t in enumerate(TYPE_PRIORITY))}
),
ex AS (
  SELECT c.case_id, r.i AS idx, c.dc_types[r.i] AS raw,
         lower(trim(c.dc_types[r.i])) AS low
  FROM corpus c, UNNEST(range(1, len(c.dc_types) + 1)) AS r(i)
  WHERE c.dc_types[r.i] IS NOT NULL AND trim(c.dc_types[r.i]) <> ''
),
scored AS (
  SELECT e.case_id, e.idx, e.raw,
         COALESCE(
           t1.t,
           t2.t,
           CASE WHEN regexp_matches(e.low, '{_COAR_MARK}')
                THEN COALESCE(c3.t, 'other') END,
           CASE WHEN e.low LIKE '%purl.org/coar/version/%' THEN 'article' END,
           'other') AS typ,
         CASE WHEN regexp_matches(e.low, '{_COAR_MARK}') THEN 2
              WHEN e.low LIKE '%{_EU}%' THEN 1 ELSE 0 END AS srcq
  FROM ex e
  LEFT JOIN tmap t1 ON t1.k = e.low
  LEFT JOIN tmap t2
    ON e.low LIKE '%{_EU}%'
   AND t2.k = trim(str_split(e.low, '{_EU}')[-1])
  LEFT JOIN coar c3
    ON regexp_matches(e.low, '{_COAR_MARK}')
   AND c3.code = nullif(regexp_extract(e.low, '{_COAR_RX}', 1), '')
),
best AS (
  SELECT case_id, raw, typ FROM (
    SELECT s.*, row_number() OVER (
      PARTITION BY s.case_id
      ORDER BY COALESCE(p.rk, 999) ASC, s.srcq DESC, s.idx ASC) AS rn
    FROM scored s LEFT JOIN prio p ON p.t = s.typ
  ) WHERE rn = 1
)
SELECT c.case_id, b.raw AS raw_native_type, COALESCE(b.typ, 'other') AS work_type
FROM corpus c LEFT JOIN best b ON b.case_id = c.case_id
"""


@register(
    "d7_ingest_type_resolution",
    oracle=_D7_INGEST_SQL,
    tags=("domain", "D7", "rules-as-data", "ingest"),
    tables=(),
)
def d7_ingest_type_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's repo-ingest dc:type resolution — the scraper-found
    raw-type long tail (notebooks/ingest/Repo.py:37-1260): a 1,116-key
    text dictionary is primary, an eu-repo-stripped retry second, COAR
    resource-type codes third, the COAR version marker fourth, else
    'other'; the winning dc:type array element is chosen by type
    priority, then raw structuredness (COAR > eu-repo > text), then
    array order.  Every dictionary key and every fallback path fires in
    this corpus.

    The reference implements this as a per-row Python UDF over the
    array; here it is fully relational — posexplode, two broadcast map
    joins, one priority window — so at 100 TB the resolution is
    codegen + broadcast joins with a single per-work window, no Python
    workers anywhere."""
    rows = _ingest_corpus()
    c = spark.createDataFrame(rows, "case_id int, dc_types array<string>")
    tmap = F.broadcast(
        spark.createDataFrame(
            sorted(RAW_TYPE_RANKING_MAP.items()), "k string, t string"
        )
    )
    coar = F.broadcast(
        spark.createDataFrame(
            sorted(COAR_RESOURCE_TYPE_MAP.items()), "code string, t string"
        )
    )
    prio = F.broadcast(
        spark.createDataFrame(
            [(t, i) for i, t in enumerate(TYPE_PRIORITY)], "t string, rk int"
        )
    )
    ex = (
        c.select("case_id", F.posexplode_outer("dc_types").alias("idx", "raw"))
        .where(F.col("raw").isNotNull() & (F.trim("raw") != ""))
        .withColumn("low", F.lower(F.trim("raw")))
    )
    has_coar = F.col("low").rlike(_COAR_MARK)
    stripped = F.trim(F.substring_index(F.col("low"), _EU, -1))
    scored = (
        ex.join(tmap.alias("t1"), F.col("low") == F.col("t1.k"), "left")
        .join(
            coar.alias("c3"),
            has_coar
            & (F.col("c3.code") == F.nullif(F.regexp_extract("low", _COAR_RX, 1), F.lit(""))),
            "left",
        )
        .join(
            tmap.alias("t2"),
            F.col("low").contains(_EU) & (F.col("t2.k") == stripped),
            "left",
        )
        .select(
            "case_id",
            "idx",
            "raw",
            F.coalesce(
                F.col("t1.t"),
                F.col("t2.t"),
                F.when(has_coar, F.coalesce(F.col("c3.t"), F.lit("other"))),
                F.when(F.col("low").contains("purl.org/coar/version/"), F.lit("article")),
                F.lit("other"),
            ).alias("typ"),
            F.when(has_coar, F.lit(2))
            .when(F.col("low").contains(_EU), F.lit(1))
            .otherwise(F.lit(0))
            .alias("srcq"),
        )
    )
    w = Window.partitionBy("case_id").orderBy(
        F.coalesce(F.col("rk"), F.lit(999)).asc(), F.col("srcq").desc(), F.col("idx").asc()
    )
    best = (
        scored.join(prio, scored.typ == prio.t, "left")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("case_id", "raw", "typ")
    )
    return c.join(best, "case_id", "left").select(
        "case_id",
        F.col("raw").alias("raw_native_type"),
        F.coalesce("typ", F.lit("other")).alias("work_type"),
    )
