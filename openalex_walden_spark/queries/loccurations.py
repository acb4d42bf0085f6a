"""Location curations + the particle-parse cleanup (reference
``notebooks/end2end/ApplyLocationCurations.sql``,
``notebooks/end2end/ReparseParticleContaminatedNames.ipynb``).

``location_curations_apply`` — approved location curations parsed out
of the JSON property blob and MERGEd onto locations_mapped:

* URL→numeric id conversions (``SUBSTRING(..., 23)`` after the
  ``https://openalex.org/W``/``S`` prefix check — malformed URLs yield
  NULL, never a junk id);
* ``native_id`` = the entity_id after its namespace colon;
* version defaults to ``submittedVersion`` when the curation omits it;
* the MERGE's field-level override contract: an UPDATE fires only when
  at least one curated field is non-NULL AND differs from the target
  (IS DISTINCT FROM — NULL-safe), and each field updates as
  ``COALESCE(source, target)`` so a curation that doesn't mention a
  field can never blank it; unmatched create_new rows insert.

``particle_contaminated_select`` — the one-off backfill selector: rows
whose parsed last STILL starts with a surname particle (the exact
class regexes: iberian single, germanic single, iberian compound,
dutch compound, plus the bare-compound equality forms) are the delete
set that forces a re-parse; per-class counts pin the classification.

Scale: curations are a tiny dim (broadcast); the target side is
touched only at curated keys.  The particle selector is one scan with
literal regexes — map-side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openalex_walden_spark.queries.registry import register

# ---------------------------------------------------------------------------
# location_curations_apply
# ---------------------------------------------------------------------------
# target <- lineitem ln=1 rows folded per work: native_id 'cur:<okey>'
#   exists for okey%2=0 (others are create_new inserts); fields by mods
# curations <- orders okey%3=0: property_value JSON built inline; work
#   URL malformed when okey%17=0 (-> NULL work_id); version omitted when
#   okey%4=0; title/pdf/license/is_oa/source-id subsets; is_oa flips vs
#   target for okey%5=0 (update fires); okey%7=0 curations mirror the
#   target exactly (no-op guard)

_JX_SPARK = "get_json_object({x}, '$.{p}')"
_JX_DUCK = "json_extract_string({x}, '$.{p}')"


def _jx(dialect: str, x: str, p: str) -> str:
    t = _JX_SPARK if dialect == "spark" else _JX_DUCK
    return t.format(x=x, p=p)


def _pv(dialect: str) -> str:
    """The curation JSON blob, built identically in both engines."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""concat('{{"work_id":"',
      CASE WHEN o_orderkey % 17 = 0 THEN 'https://example.org/X'
           ELSE concat('https://openalex.org/W', CAST(o_orderkey AS {s})) END,
      '","title":"T-', CAST(o_orderkey % 89 AS {s}), '"',
      CASE WHEN o_orderkey % 4 <> 0 THEN ',"version":"acceptedVersion"' ELSE '' END,
      CASE WHEN o_orderkey % 5 = 0 THEN ',"is_oa":true' ELSE '' END,
      CASE WHEN o_orderkey % 6 = 0 THEN concat(',"pdf_url":"https://p.test/',
           CAST(o_orderkey % 50 AS {s}), '"') ELSE '' END,
      CASE WHEN o_orderkey % 9 = 0 THEN concat(',"source_id":"https://openalex.org/S',
           CAST(o_orderkey % 300 + 1 AS {s}), '"') ELSE '' END,
      CASE WHEN o_orderkey % 7 = 0 THEN concat(',"license":"cc-by"') ELSE '' END,
      '}}')"""


def _apply_sql(dialect: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    jx = lambda x, p: _jx(dialect, x, p)  # noqa: E731
    pv = _pv(dialect)
    return f"""
WITH target AS (
  SELECT concat('cur:', CAST(o_orderkey AS {s})) AS native_id,
         'openalex_curation' AS native_id_namespace,
         concat('T-', CAST(CASE WHEN o_orderkey % 7 = 0 THEN o_orderkey % 89
                                ELSE o_orderkey % 97 END AS {s})) AS title,
         CASE WHEN o_orderkey % 6 = 0 AND o_orderkey % 7 = 0
              THEN concat('https://p.test/', CAST(o_orderkey % 50 AS {s})) END AS pdf_url,
         CASE WHEN o_orderkey % 7 = 0 THEN 'cc-by' ELSE 'cc0' END AS license,
         (o_orderkey % 5 <> 0) AS is_oa,
         CAST(o_orderkey % 200 + 1 AS BIGINT) AS source_id
  FROM orders WHERE o_orderkey % 2 = 0
),
cur0 AS (
  SELECT o_orderkey AS okey, concat('cur:', CAST(o_orderkey AS {s})) AS native_id,
         {pv} AS pv
  FROM orders WHERE o_orderkey % 3 = 0
),
cur AS (
  SELECT okey, native_id,
         CASE WHEN {jx("pv", "work_id")} LIKE 'https://openalex.org/W%'
              THEN CAST(substr({jx("pv", "work_id")}, 23) AS BIGINT) END AS work_id,
         {jx("pv", "title")} AS title,
         coalesce({jx("pv", "version")}, 'submittedVersion') AS version,
         {jx("pv", "pdf_url")} AS pdf_url,
         {jx("pv", "license")} AS license,
         CAST({jx("pv", "is_oa")} AS BOOLEAN) AS is_oa,
         CASE WHEN {jx("pv", "source_id")} LIKE 'https://openalex.org/S%'
              THEN CAST(substr({jx("pv", "source_id")}, 23) AS BIGINT) END AS source_id
  FROM cur0
),
merged AS (
  SELECT c.native_id, c.work_id, c.version,
         CASE WHEN t.native_id IS NULL THEN 'insert'
              WHEN (c.title IS NOT NULL AND c.title IS DISTINCT FROM t.title)
                OR (c.pdf_url IS NOT NULL AND c.pdf_url IS DISTINCT FROM t.pdf_url)
                OR (c.license IS NOT NULL AND c.license IS DISTINCT FROM t.license)
                OR (c.is_oa IS NOT NULL AND c.is_oa IS DISTINCT FROM t.is_oa)
                OR (c.source_id IS NOT NULL AND c.source_id IS DISTINCT FROM t.source_id)
              THEN 'update' ELSE 'noop' END AS action,
         coalesce(c.title, t.title) AS title,
         coalesce(c.pdf_url, t.pdf_url) AS pdf_url,
         coalesce(c.license, t.license) AS license,
         coalesce(c.is_oa, t.is_oa) AS is_oa,
         coalesce(c.source_id, t.source_id) AS source_id
  FROM cur c LEFT JOIN target t ON t.native_id = c.native_id
)
SELECT native_id, action, work_id, title, version, pdf_url, license, is_oa, source_id
FROM merged WHERE action <> 'noop'
ORDER BY native_id
"""


@register(
    "location_curations_apply",
    oracle=_apply_sql("duck"),
    tags=("curations", "json", "merge"),
    tables=("orders",),
)
def location_curations_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approved location curations → locations_mapped MERGE
    (ApplyLocationCurations.sql; see module docstring)."""
    return spark.sql(_apply_sql("spark"))


# ---------------------------------------------------------------------------
# particle_contaminated_select
# ---------------------------------------------------------------------------
# parsed-names rows <- customer x k: last by (c+k)%10 classes — clean,
#   iberian single, germanic single, iberian compound, dutch compound,
#   bare-compound ('de la' exactly), look-alikes that must NOT match
#   ('delacroix', 'vandenberg', 'davis')

_PART_CLASSES = """
  CASE CAST((c_custkey + t.k) % 10 AS INT)
    WHEN 0 THEN concat('smith', CAST(c_custkey % 9 AS {STR}))
    WHEN 1 THEN concat('de oliveira', CAST(c_custkey % 9 AS {STR}))
    WHEN 2 THEN concat('van berg', CAST(c_custkey % 9 AS {STR}))
    WHEN 3 THEN concat('de la cruz', CAST(c_custkey % 9 AS {STR}))
    WHEN 4 THEN concat('van der meer', CAST(c_custkey % 9 AS {STR}))
    WHEN 5 THEN 'de la'
    WHEN 6 THEN 'van den'
    WHEN 7 THEN 'delacroix'
    WHEN 8 THEN 'vandenberg'
    ELSE 'davis'
  END
"""

_IBER1 = "^(de |da |do |dos |das |del )"
_GERM1 = "^(van |von |zu )"
_IBER2 = "^(de la |de las |de los )"
_DUTCH2 = "^(van de |van der |van den )"
_ANY1 = "^(de |da |do |dos |das |del |van |von |zu )"


def _part_sql(dialect: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    rx = (
        (lambda x, p: f"({x} RLIKE '{p}')")
        if dialect == "spark"
        else (lambda x, p: f"regexp_matches({x}, '{p}')")
    )
    lastexpr = _PART_CLASSES.replace("{STR}", s)
    lateral = (
        " LATERAL VIEW explode(sequence(0, 1)) t AS k"
        if dialect == "spark"
        else ", UNNEST(range(0, 2)) AS t(k)"
    )
    in2 = "('de la','de las','de los','van de','van der','van den')"
    return f"""
WITH names AS (
  SELECT concat('raw', CAST(c_custkey AS {s}), '.', CAST(t.k AS {s})) AS raw_author_name,
         {lastexpr} AS last_name
  FROM customer{lateral}
),
classified AS (
  SELECT raw_author_name, last_name,
         {rx("last_name", _IBER1)} AS iberian_single,
         {rx("last_name", _GERM1)} AS germanic_single,
         (last_name IN ('de la','de las','de los') OR {rx("last_name", _IBER2)}) AS iberian_compound,
         (last_name IN ('van de','van der','van den') OR {rx("last_name", _DUTCH2)}) AS dutch_compound,
         ({rx("last_name", _ANY1)} OR last_name IN {in2}) AS to_delete
  FROM names
)
SELECT raw_author_name, last_name,
       iberian_single, germanic_single, iberian_compound, dutch_compound, to_delete
FROM classified WHERE to_delete
ORDER BY raw_author_name
"""


@register(
    "particle_contaminated_select",
    oracle=_part_sql("duck"),
    tags=("curations", "backfill", "regex"),
    tables=("customer",),
)
def particle_contaminated_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The particle-contaminated delete set with per-class flags
    (ReparseParticleContaminatedNames.ipynb cells 1-4).  Look-alike
    surnames (delacroix, vandenberg, davis) must NOT select — the
    space-anchored prefixes and the bare-compound equality list are
    the whole contract."""
    return spark.sql(_part_sql("spark"))


# ---------------------------------------------------------------------------
# Inference input gates (concepts/concepts_create_input.ipynb,
# sdg/sdg_create_frontfill_input.ipynb)
# ---------------------------------------------------------------------------
# Two anti-join input builders feeding ML inference, each with its own
# text-quality gate:
#
# * concepts: ((len(title) > 20 AND len(abstract) > 50) OR len(title) >
#   50 OR len(abstract) > 150) — any leg qualifies;
# * sdg: type whitelist + the id watermark (recent works only) + BOTH
#   a 25-char combined-length floor AND a 5-word floor over
#   title+abstract (split on single spaces, the reference's exact
#   tokenization — double spaces produce empty tokens that COUNT).
#
# Both exclude already-processed works via LEFT ANTI JOIN on work_id —
# the incremental frontier discipline.

_GATE_FIXTURE = """
  SELECT o_orderkey AS work_id,
         CASE CAST(o_orderkey % 7 AS INT)
           WHEN 0 THEN 'article' WHEN 1 THEN 'book' WHEN 2 THEN 'review'
           WHEN 3 THEN 'dataset' WHEN 4 THEN 'preprint' WHEN 5 THEN 'paratext'
           ELSE 'dissertation' END AS wtype,
         CASE WHEN o_orderkey % 11 = 0 THEN NULL
              WHEN o_orderkey % 5 = 0 THEN 'Tiny title'
              ELSE concat('A title about topic ', CAST(o_orderkey % 163 AS {STR}),
                          ' with sufficient descriptive length') END AS title,
         CASE WHEN o_orderkey % 4 = 0 THEN NULL
              WHEN o_orderkey % 6 = 0 THEN 'Short abstract.'
              ELSE concat('This abstract describes the study of subject ',
                          CAST(o_orderkey % 211 AS {STR}),
                          ' in considerable detail across methods results and conclusions'
                          ' sufficient for classification purposes and beyond') END AS abstract
  FROM orders
"""


def _gates_sql(dialect: str, which: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    fx = _GATE_FIXTURE.replace("{STR}", s)
    if dialect == "spark":
        nwords = (
            "size(split(concat(coalesce(title, ''), ' ', coalesce(abstract, '')), ' '))"
        )
    else:
        nwords = (
            "len(string_split(concat(coalesce(title, ''), ' ', coalesce(abstract, '')), ' '))"
        )
    done = "o_orderkey % 3 = 1" if which == "concepts" else "o_orderkey % 4 = 2"
    if which == "concepts":
        gate = (
            "((length(title) > 20 AND length(abstract) > 50)"
            " OR length(title) > 50 OR length(abstract) > 150)"
        )
        extra = ""
    else:
        gate = (
            "(length(title) + coalesce(length(abstract), 0)) >= 25"
            f" AND {nwords} >= 5"
        )
        extra = (
            "AND w.wtype IN ('article', 'book', 'review', 'book-chapter',"
            " 'preprint', 'dissertation') AND w.work_id > 100"
        )
    return f"""
WITH works AS ({fx}),
done AS (SELECT o_orderkey AS work_id FROM orders WHERE {done})
SELECT w.work_id, w.title, w.abstract
FROM works w
LEFT JOIN done d ON d.work_id = w.work_id
WHERE d.work_id IS NULL
  AND w.work_id IS NOT NULL
  AND w.title IS NOT NULL
  {extra}
  AND {gate}
ORDER BY w.work_id
"""


@register(
    "concepts_input_gate",
    oracle=_gates_sql("duck", "concepts"),
    tags=("inference", "gate", "antijoin"),
    tables=("orders",),
)
def concepts_input_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concept-inference input frontier
    (concepts_create_input.ipynb; see the section comment)."""
    return spark.sql(_gates_sql("spark", "concepts"))


@register(
    "sdg_input_gate",
    oracle=_gates_sql("duck", "sdg"),
    tags=("inference", "gate", "antijoin"),
    tables=("orders",),
)
def sdg_input_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SDG-inference frontfill frontier — type whitelist, id watermark,
    combined-length AND word-count floors
    (sdg_create_frontfill_input.ipynb; see the section comment)."""
    return spark.sql(_gates_sql("spark", "sdg"))
