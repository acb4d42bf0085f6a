"""AER (author-entity-resolution audit) operators — reference
``notebooks/aer/``.

``EstimateNameConflictOvermerges.ipynb``: provable overmerge detection
from incompatible name evidence alone — an 8-argument
``names_compatible`` with EN-BLOC middle-initial matching ("rr"
matches "rr", never "r" or "ra"), hyphen-stripped first names,
length<=2 firsts treated as initials, then a two-pass sweep: a fast
aggregate (no self-join) flags conflicted authors, and only flagged
authors get the core-identity / outlier-works pass.

``CreatePopulationWeightedNameFrequency.ipynb``: "how many living
humans have this name" — multi-source priority union with the
Mandarin/Cantonese romanization split (93%/7%) applied as weight
arithmetic, first source wins per name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openalex_walden_spark.queries.registry import register

# The 8-arg compatibility CASE, one text for both dialects (pure
# scalar SQL, no regex): reference cell 2, vectors in cell 3.
_AER_COMPAT_BODY = """(
  (last1 IS NOT NULL AND last2 IS NOT NULL AND last1 = last2)
  AND CASE
    WHEN first1 IS NULL OR first2 IS NULL OR first1 = '' OR first2 = ''
      THEN TRUE
    WHEN LENGTH(REPLACE(first1, '-', '')) <= 2
      OR LENGTH(REPLACE(first2, '-', '')) <= 2
      THEN SUBSTRING(REPLACE(first1, '-', ''), 1, 1)
         = SUBSTRING(REPLACE(first2, '-', ''), 1, 1)
    ELSE REPLACE(first1, '-', '') = REPLACE(first2, '-', '')
  END
  AND CASE
    WHEN COALESCE(mc1, 0) = 0 OR COALESCE(mc2, 0) = 0 THEN TRUE
    ELSE mid1 = mid2 AND mc1 = mc2
  END
)"""

_AER_COMPAT_DDL = (
    "CREATE OR REPLACE TEMPORARY FUNCTION aer_names_compatible(\n"
    "  first1 STRING, mid1 STRING, mc1 INT, last1 STRING,\n"
    "  first2 STRING, mid2 STRING, mc2 INT, last2 STRING)\n"
    "RETURNS BOOLEAN\nRETURN " + _AER_COMPAT_BODY
)


def _compat_duck(a: str, b: str) -> str:
    """Inline the compatibility CASE for the oracle with columns from
    row-alias ``a`` vs ``b`` (first, mid, mc, last each side)."""
    e = _AER_COMPAT_BODY
    for col, repl in (
        ("first1", f"{a}first"), ("mid1", f"{a}mid"), ("mc1", f"{a}mc"),
        ("last1", f"{a}last"), ("first2", f"{b}first"), ("mid2", f"{b}mid"),
        ("mc2", f"{b}mc"), ("last2", f"{b}last"),
    ):
        e = e.replace(col, repl)
    return e


# Fixture: lineitem rows are authorships; l_suppkey is the author.
# Name lattices inject: a second FULL first name on the %23=7 arm
# (a provable conflict), a middle-initials flip on the %29=11 arm,
# initials-only forms, and hyphenated spellings — so pass 1 flags a
# deterministic subset and pass 2 finds real outliers.
_NAMES_SRC = """
  SELECT l_suppkey AS author_id, l_orderkey AS work_id,
    CASE WHEN l_orderkey % 23 = 7 THEN 'joseph'
         WHEN l_orderkey % 5 = 0 THEN 'j'
         WHEN l_orderkey % 7 = 3 THEN 'ja-son'
         ELSE 'jason' END AS normalized_first,
    CASE WHEN l_orderkey % 29 = 11 THEN 'm'
         WHEN l_orderkey % 3 = 0 THEN 'r' ELSE NULL END AS middle_initials,
    CASE WHEN l_orderkey % 29 = 11 THEN 1
         WHEN l_orderkey % 3 = 0 THEN 1 ELSE 0 END AS middle_initial_count,
    concat('last', CAST(l_suppkey % 97 AS {t})) AS normalized_last
  FROM lineitem
"""

_CONFLICT_BODY = """
WITH awn AS ({src}),
author_common_last AS (
  SELECT author_id, normalized_last AS common_last FROM (
    SELECT author_id, normalized_last,
      ROW_NUMBER() OVER (PARTITION BY author_id
        ORDER BY COUNT(*) DESC, normalized_last) AS rn
    FROM awn WHERE normalized_last IS NOT NULL
    GROUP BY author_id, normalized_last
  ) t WHERE rn = 1
),
conflicted AS (
  SELECT awn.author_id,
    COUNT(DISTINCT CASE
      WHEN LENGTH(REPLACE(awn.normalized_first, '-', '')) > 2
       AND REPLACE(awn.normalized_first, '-', '') <> acl.common_last
      THEN REPLACE(awn.normalized_first, '-', '') END) AS distinct_full_firsts,
    COUNT(DISTINCT CASE WHEN awn.middle_initial_count > 0
      THEN awn.middle_initials END) AS distinct_middles,
    COUNT(*) AS total_works
  FROM awn
  LEFT JOIN author_common_last acl ON awn.author_id = acl.author_id
  GROUP BY awn.author_id
  HAVING distinct_full_firsts >= 2 OR distinct_middles >= 2
),
core_first AS (
  SELECT author_id, clean_first AS core_first FROM (
    SELECT author_id, REPLACE(normalized_first, '-', '') AS clean_first,
      ROW_NUMBER() OVER (PARTITION BY author_id
        ORDER BY COUNT(*) DESC, REPLACE(normalized_first, '-', '')) AS rn
    FROM awn WHERE LENGTH(REPLACE(normalized_first, '-', '')) > 2
    GROUP BY author_id, REPLACE(normalized_first, '-', '')
  ) t WHERE rn = 1
),
core_middle AS (
  SELECT author_id, middle_initials AS core_mid,
         middle_initial_count AS core_mc FROM (
    SELECT author_id, middle_initials, middle_initial_count,
      ROW_NUMBER() OVER (PARTITION BY author_id
        ORDER BY COUNT(*) DESC, middle_initials) AS rn
    FROM awn WHERE middle_initial_count > 0
    GROUP BY author_id, middle_initials, middle_initial_count
  ) t WHERE rn = 1
),
core_last AS (
  SELECT author_id, normalized_last AS core_last FROM (
    SELECT author_id, normalized_last,
      ROW_NUMBER() OVER (PARTITION BY author_id
        ORDER BY COUNT(*) DESC, normalized_last) AS rn
    FROM awn GROUP BY author_id, normalized_last
  ) t WHERE rn = 1
),
outliers AS (
  SELECT awn.author_id, awn.work_id,
    {compat} AS compatible
  FROM awn
  JOIN conflicted c ON c.author_id = awn.author_id
  LEFT JOIN core_first cf ON cf.author_id = awn.author_id
  LEFT JOIN core_middle cm ON cm.author_id = awn.author_id
  LEFT JOIN core_last cl ON cl.author_id = awn.author_id
)
SELECT
  (SELECT COUNT(*) FROM conflicted) AS n_flagged_authors,
  CAST(COUNT(CASE WHEN NOT compatible THEN 1 END) AS BIGINT)
    AS n_outlier_works,
  CAST(COUNT(*) AS BIGINT) AS n_flagged_works,
  CAST(COUNT(DISTINCT author_id) AS BIGINT) AS n_authors_checked
FROM outliers
"""

_CONFLICT_ORACLE = _CONFLICT_BODY.format(
    src=_NAMES_SRC.format(t="VARCHAR"),
    compat=_compat_duck("awn.normalized_", "cf_cm_cl_").replace(
        "cf_cm_cl_first", "cf.core_first"
    ).replace("cf_cm_cl_mid", "cm.core_mid")
    .replace("cf_cm_cl_mc", "cm.core_mc")
    .replace("cf_cm_cl_last", "cl.core_last")
    .replace("awn.normalized_first", "REPLACE(awn.normalized_first, '-', '')")
    .replace("awn.normalized_mid", "awn.middle_initials")
    .replace("awn.normalized_mc", "awn.middle_initial_count")
    .replace("awn.normalized_last", "awn.normalized_last"),
)


@register(
    "aer_name_conflict_overmerge",
    oracle=_CONFLICT_ORACLE,
    tags=("aer", "domain", "overmerge"),
    tables=("lineitem",),
)
def aer_name_conflict_overmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass name-conflict overmerge estimate (see module doc):
    pass 1 is a pure aggregate — NO self-join — flagging authors with
    2+ full first names (hyphen-stripped, surname-as-first excluded)
    or 2+ middle patterns; pass 2 computes the core identity (three
    top-1 windows) for FLAGGED authors only and marks works whose name
    is incompatible with the core.  Every stage keys on author_id —
    one partitioning end to end; the conflicted set is a small
    fraction, so the pass-2 joins broadcast."""
    spark.sql(_AER_COMPAT_DDL)
    compat = (
        "aer_names_compatible(REPLACE(awn.normalized_first, '-', ''), "
        "awn.middle_initials, awn.middle_initial_count, awn.normalized_last, "
        "cf.core_first, cm.core_mid, cm.core_mc, cl.core_last)"
    )
    return spark.sql(
        _CONFLICT_BODY.format(src=_NAMES_SRC.format(t="STRING"), compat=compat)
    )


# ---------------------------------------------------------------------------
# Population-weighted name frequency
# ---------------------------------------------------------------------------
# Nation/customer names play the name pool; the source lattice mirrors
# the reference's priority order and the Mandarin/Cantonese 93/7 split
# applies to the 'cn_surname' arm: one logical name contributes two
# romanized rows whose weights sum to the full population.

_POP_BODY = """
WITH pool AS (
  SELECT lower(c_name) AS name, c_custkey,
    CASE CAST(c_custkey % 5 AS INT)
      WHEN 0 THEN 'cn_surname' WHEN 1 THEN 'jp_surname'
      WHEN 2 THEN 'kr_surname' WHEN 3 THEN 'census' ELSE 'cn_given'
    END AS source,
    CAST(c_custkey % 1000000 + 50000 AS DOUBLE) AS population
  FROM customer
),
split AS (
  SELECT concat(name, '_m') AS name, source, 1 AS priority,
         population * 0.93 AS weighted_pop
  FROM pool WHERE source = 'cn_surname'
  UNION ALL
  SELECT concat(name, '_c'), source, 1, population * 0.07
  FROM pool WHERE source = 'cn_surname'
  UNION ALL
  SELECT name, source,
    CASE source WHEN 'jp_surname' THEN 2 WHEN 'kr_surname' THEN 3
                WHEN 'census' THEN 4 ELSE 5 END,
    population
  FROM pool WHERE source <> 'cn_surname'
),
dedup AS (
  SELECT name, source, weighted_pop FROM (
    SELECT name, source, weighted_pop,
      ROW_NUMBER() OVER (PARTITION BY name
        ORDER BY priority, weighted_pop DESC) AS rn
    FROM split
  ) t WHERE rn = 1
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_names,
       CAST(ROUND(SUM(weighted_pop)) AS BIGINT) AS total_pop
FROM dedup
GROUP BY source
ORDER BY source
"""


@register(
    "aer_pop_name_frequency",
    oracle=_POP_BODY,
    tags=("aer", "aggregation", "union"),
    tables=("customer",),
)
def aer_pop_name_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-weighted name frequency (see module doc): priority
    union of romanized sources, the 93/7 Mandarin/Cantonese split as
    weight arithmetic (the two split rows of one surname sum to its
    full population), first-priority source wins per name.  One window
    dedup on the name + one rollup; all sources are map-side unions of
    the same scan."""
    return spark.sql(_POP_BODY)
