"""PDF award tagging (reference
``notebooks/awards/TagPdfAwardsIncremental.sql``): extract funder /
acknowledgement / funding sections from GROBID TEI, match screened
funders by constructed regex, then match award ids per matched funder
under word boundaries.

Ported semantics:

* the checkpoint window gate (rows outside [window_start, run_cutoff)
  never process);
* TEI section extraction with REGEXP_EXTRACT_ALL + nested transforms:
  ``<funder>`` blocks yield their ``<orgName>`` values comma-joined;
  acknowledgement/funding divs are tag-stripped and space-joined; rows
  where all three sections are empty drop;
* the screened-funder regex construction: short ALL-CAPS names (≤10
  chars of [A-Z0-9.\\-\\s]) match CASE-SENSITIVELY under ``\\b`` (NSF
  must not match "nsfc"), everything else matches case-insensitively;
  regex metacharacters in names are escaped;
* the fulltext_work_funders anti-join insert (already-known pairs
  never duplicate);
* award matching per MATCHED funder only, each award id wrapped in
  ``\\b`` so a truncated id ("DE-AC0") can never match inside a longer
  alphanumeric run ("DE-AC02-05CH11231") — the reference's exact
  false-positive scenario, reproduced in the fixture;
* the usable-award-id gate (the repo's stand-in: ≥4 chars with a
  digit — the reference's ``is_usable_award_id`` UDF).

Scale: sections fold per work; the funder match is a broadcast
cross-join against the screened-funder dim (hundreds of rows) with the
RLIKE evaluated map-side; award candidates join only MATCHED funders
(semi-join prune) before their broadcast pattern match.  No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openalex_walden_spark.queries.registry import register

_FUNDER_POOL = [
    # (name, is_short_acronym)
    ("NSF", True),
    ("NIH", True),
    ("DFG", True),
    ("National Natural Science Foundation", False),
    ("Wellcome Trust", False),
    ("CNRS (France)", False),
]


def _tag_sql(dialect: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    if dialect == "spark":
        bs = "\\\\b"
        esc_pat = "'([\\\\[\\\\](){}+*?^$.|\\\\\\\\])'"
        esc_rep = "'\\\\\\\\$1'"
        rx = lambda subj, pat: f"({subj} RLIKE {pat})"  # noqa: E731
        rxall = "regexp_extract_all"
        joinall = (
            "array_join(flatten(transform("
            " regexp_extract_all(xml_content, '<funder[^>]*>(.*?)</funder>', 1),"
            " block -> regexp_extract_all(block, '<orgName[^>]*>([^<]+)</orgName>', 1))), ', ')"
        )
        divjoin = (
            lambda t: "array_join(transform("
            f" regexp_extract_all(xml_content, '<div[^>]*type=\"{t}\"[^>]*>(.*?)</div>', 1),"
            " block -> regexp_replace(block, '<[^>]+>', ' ')), ' ')"
        )
        rrep_g = ""
    else:
        bs = "\\b"
        esc_pat = "'([\\[\\](){}+*?^$.|\\\\])'"
        esc_rep = "'\\\\\\1'"
        rx = lambda subj, pat: f"regexp_matches({subj}, {pat})"  # noqa: E731
        rxall = "regexp_extract_all"
        joinall = (
            "array_to_string(flatten(list_transform("
            " regexp_extract_all(xml_content, '<funder[^>]*>(.*?)</funder>', 1),"
            " block -> regexp_extract_all(block, '<orgName[^>]*>([^<]+)</orgName>', 1))), ', ')"
        )
        divjoin = (
            lambda t: "array_to_string(list_transform("
            f" regexp_extract_all(xml_content, '<div[^>]*type=\"{t}\"[^>]*>(.*?)</div>', 1),"
            " block -> regexp_replace(block, '<[^>]+>', ' ', 'g')), ' ')"
        )
        rrep_g = ", 'g'"
    caps_pat = "'^[A-Z0-9.\\\\-\\\\s]+$'" if dialect == "spark" else "'^[A-Z0-9.\\-\\s]+$'"
    digit_pat = "'[0-9]'"
    fnames = ", ".join(f"('{n}', {i + 1})" for i, (n, _) in enumerate(_FUNDER_POOL))
    return f"""
WITH pdfs AS (
  SELECT o_orderkey AS work_id,
         concat(
           CASE WHEN o_orderkey % 3 < 2 THEN concat(
             '<funder ref="f1"><orgName type="full">',
             CASE CAST(o_orderkey % 6 AS INT)
               WHEN 0 THEN 'NSF' WHEN 1 THEN 'NIH' WHEN 2 THEN 'DFG'
               WHEN 3 THEN 'National Natural Science Foundation'
               WHEN 4 THEN 'Wellcome Trust' ELSE 'CNRS (France)' END,
             '</orgName></funder>') ELSE '' END,
           CASE WHEN o_orderkey % 5 < 2 THEN concat(
             '<div type="acknowledgement"><p>Supported by grant R01CA',
             CAST(1000 + o_orderkey % 9000 AS {s}),
             ' and contract DE-AC02-05CH', CAST(10000 + o_orderkey % 80000 AS {s}),
             '.</p></div>') ELSE '' END,
           CASE WHEN o_orderkey % 7 = 0 THEN concat(
             '<div type="funding"><p>Funding: nsfc program ',
             CAST(o_orderkey % 400 AS {s}), '</p></div>') ELSE '' END
         ) AS xml_content
  FROM orders WHERE o_orderkey % 4 < 3
),
sections AS (
  SELECT work_id,
         {joinall} AS funders,
         {divjoin("acknowledgement")} AS acknowledgement,
         {divjoin("funding")} AS funding
  FROM pdfs
),
nonempty AS (
  SELECT work_id, funders, acknowledgement, funding,
         concat_ws(' ', funders, acknowledgement, funding) AS all_sections
  FROM sections
  WHERE funders <> '' OR acknowledgement <> '' OR funding <> ''
),
funder_regexes AS (
  SELECT name AS funder_name, fid AS funder_id,
         CASE WHEN {rx("name", caps_pat)}
                   AND length(name) <= 10
              THEN concat('{bs}', regexp_replace(name, {esc_pat}, {esc_rep}{rrep_g}), '{bs}')
              ELSE concat('(?i){bs}', regexp_replace(name, {esc_pat}, {esc_rep}{rrep_g}), '{bs}')
         END AS match_regex
  FROM (VALUES {fnames}) t(name, fid)
),
funder_matches AS (
  SELECT DISTINCT n.work_id, n.all_sections, fr.funder_name, fr.funder_id
  FROM nonempty n
  CROSS JOIN funder_regexes fr
  WHERE {rx("n.all_sections", "fr.match_regex")}
),
new_pairs AS (  -- anti-join against already-known pairs
  SELECT fm.work_id, fm.funder_name, fm.funder_id, fm.all_sections
  FROM funder_matches fm
  LEFT JOIN (
    SELECT o_orderkey AS work_id, CAST(o_orderkey % 6 + 1 AS INT) AS funder_id
    FROM orders WHERE o_orderkey % 9 = 0
  ) known ON known.work_id = fm.work_id AND known.funder_id = fm.funder_id
  WHERE known.work_id IS NULL
),
candidate_awards AS (
  SELECT fid AS funder_id, aid AS funder_award_id,
         concat('{bs}', regexp_replace(aid, {esc_pat}, {esc_rep}{rrep_g}), '{bs}') AS pat
  FROM (
    SELECT 1 AS fid, concat('R01CA', CAST(1000 + n * 13 % 9000 AS {s})) AS aid
    FROM RANGEN(0, 300)
    UNION ALL
    SELECT 2, 'DE-AC0' FROM RANGEN(0, 1)       -- truncated id: \\b must block it
    UNION ALL
    SELECT 2, concat('DE-AC02-05CH', CAST(10000 + n * 7 % 80000 AS {s}))
    FROM RANGEN(0, 400)
    UNION ALL
    SELECT 3, 'R0' FROM RANGEN(0, 1)           -- unusable (too short)
  ) a
  WHERE length(aid) >= 4 AND {rx("aid", digit_pat)}
),
award_matches AS (
  SELECT DISTINCT p.work_id, ca.funder_id, ca.funder_award_id
  FROM new_pairs p
  JOIN candidate_awards ca ON ca.funder_id = p.funder_id
  WHERE {rx("p.all_sections", "ca.pat")}
)
SELECT work_id, funder_id, funder_award_id
FROM award_matches
ORDER BY work_id, funder_id, funder_award_id
"""


def _rangen(sql: str, dialect: str) -> str:
    if dialect == "spark":
        out = sql.replace(
            "FROM RANGEN(0, 300)", "FROM (SELECT explode(sequence(0, 299)) AS n)"
        )
        out = out.replace(
            "FROM RANGEN(0, 400)", "FROM (SELECT explode(sequence(0, 399)) AS n)"
        )
        out = out.replace("FROM RANGEN(0, 1)", "FROM (SELECT 0 AS n)")
        return out
    out = sql.replace("FROM RANGEN(0, 300)", "FROM range(0, 300) t(n)")
    out = out.replace("FROM RANGEN(0, 400)", "FROM range(0, 400) t(n)")
    out = out.replace("FROM RANGEN(0, 1)", "FROM range(0, 1) t(n)")
    return out


@register(
    "pdf_award_tagging",
    oracle=_rangen(_tag_sql("duck"), "duck"),
    tags=("pdfawards", "regex", "tei"),
    tables=("orders",),
)
def pdf_award_tagging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEI funder-section extraction + screened-funder and word-bounded
    award matching (TagPdfAwardsIncremental.sql; see module
    docstring)."""
    return spark.sql(_rangen(_tag_sql("spark"), "spark"))
