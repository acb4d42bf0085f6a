"""SQL UDF surface (SURVEY.md §2.10 "SQL UDF (CREATE FUNCTION)").

The reference declares reusable scalar logic as catalog-level SQL UDFs:
``get_highest_priority_value`` (fold over a value/priority array —
``CreateWorksBase.ipynb`` cell 2 lines 53-70), ``names_compatible``
(name-identity predicate — ``UpdateWorkAuthors.ipynb`` cell 3), and the
award-id pair ``award_id_is_weak`` / ``award_norm_key``
(``notebooks/awards/AwardNormKey.sql:11-16,18+``).

Spark 4 supports the same declaration style natively
(``CREATE OR REPLACE TEMPORARY FUNCTION … RETURNS … RETURN <expr>``), so
these are session-scoped SQL functions, usable from any ``spark.sql``
query — the engine's SQL layer gains the reference's vocabulary without
any Python-UDF serialization cost: the bodies inline into Catalyst plans
and stay inside whole-stage codegen.

Scale note: SQL UDFs are macro-expanded at analysis time; at 100 TB they
cost exactly what their body expression costs — no per-row interpreter,
no Arrow transfer, no executor-side Python.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# A3 as a SQL UDF: first element with a strictly lower priority wins, so
# ties break toward the earliest candidate — same contract as
# functions.arrays.priority_pick (and the reference's fold).
_PRIORITY_BEST = """
CREATE OR REPLACE TEMPORARY FUNCTION priority_best(
  vals ARRAY<STRUCT<value STRING, priority INT>>)
RETURNS STRING
RETURN aggregate(
  vals,
  CAST(STRUCT(CAST(NULL AS STRING) AS value, 2147483647 AS priority)
       AS STRUCT<value STRING, priority INT>),
  (acc, x) -> CASE WHEN x.value IS NOT NULL AND x.value != ''
                    AND x.priority < acc.priority
                   THEN x ELSE acc END
).value
"""

# Name-identity predicate, same behavioral contract as the reference's
# names_compatible: unparsed side (NULL surname) falls back to raw
# equality; same surname needs only initial-or-missing given-name
# agreement; first/last order swap is compatible; surname containment
# (prefix/suffix, min length 4) with initial agreement is compatible.
_NAMES_COMPATIBLE = """
CREATE OR REPLACE TEMPORARY FUNCTION names_compatible(
  a_last STRING, a_first STRING, b_last STRING, b_first STRING,
  a_raw STRING, b_raw STRING)
RETURNS BOOLEAN
RETURN COALESCE(
  CASE
    WHEN a_last IS NULL OR b_last IS NULL
      THEN lower(trim(a_raw)) = lower(trim(b_raw))
    WHEN a_last = b_last
     AND (left(a_first, 1) = left(b_first, 1)
          OR a_first IS NULL OR b_first IS NULL)
      THEN TRUE
    WHEN a_last = b_first AND a_first = b_last
      THEN TRUE
    WHEN (startswith(a_last, b_last) OR endswith(a_last, b_last)
          OR startswith(b_last, a_last) OR endswith(b_last, a_last))
     AND least(length(a_last), length(b_last)) >= 4
     AND (left(a_first, 1) = left(b_first, 1)
          OR a_first IS NULL OR b_first IS NULL)
      THEN TRUE
    ELSE FALSE
  END, FALSE)
"""

# Generic award-id normalization key: uppercase/trim, collapse runs of
# whitespace, drop spaces and hyphens, then canonicalize the trailing
# digit run by stripping leading zeros (the generic layer under the
# reference's per-funder table; the per-funder regexes are data, not
# engine capability).
_AWARD_STRIP = """
CREATE OR REPLACE TEMPORARY FUNCTION award_strip(award STRING)
RETURNS STRING
RETURN regexp_replace(
  regexp_replace(upper(trim(award)), '\\\\s+', ' '), '[ -]', '')
"""

# NOTE: the body is a flat expression on purpose — a scalar subquery /
# CTE inside a SQL UDF body plans as a correlated subquery PER ROW
# (measured 18s vs ~1s on 1.5M rows). Flat bodies macro-expand into the
# enclosing plan and stay in whole-stage codegen.
_AWARD_KEY = """
CREATE OR REPLACE TEMPORARY FUNCTION award_key(award STRING)
RETURNS STRING
RETURN CASE
  WHEN award IS NULL OR trim(award) = '' THEN NULL
  WHEN award_strip(award) rlike '[0-9]$'
    THEN concat(regexp_extract(award_strip(award), '^(.*?)([0-9]+)$', 1),
                CAST(CAST(regexp_extract(award_strip(award), '^(.*?)([0-9]+)$', 2)
                          AS BIGINT) AS STRING))
  ELSE nullif(award_strip(award), '')
END
"""

# Weakness predicate: a normalized form that is a bare 4-7 digit number
# deposited at a dense numeric registry is never sufficient evidence for
# an automatic merge (the reference's WEAK_BARE rule, generalized: the
# caller supplies the registry-density fact instead of a funder-id list).
_AWARD_IS_WEAK = """
CREATE OR REPLACE TEMPORARY FUNCTION award_is_weak(
  dense_registry BOOLEAN, award STRING)
RETURNS BOOLEAN
RETURN COALESCE(
  dense_registry AND award_key(award) rlike '^[0-9]{4,7}$', FALSE)
"""

# Per-family award normalizers, ported from the reference's generated
# per-funder table (``notebooks/awards/AwardNormKey.sql``, deposited
# side):
#   nih      l.78:  institute letters + serial LPAD 6 ("1 R01 GM 48123-02"
#                   -> "GM048123")
#   nsf      l.79:  the standalone 7-digit award number
#   erc      l.88:  trailing 5-6 digit grant agreement, leading zeros
#                   dropped; 12-digit CORDIS ids keep the last 6
#   ukri     l.110-115: council code / alphanum / version ("EP/N000000/1"),
#                   separators squashed; prefix-labelled fallback
#   wellcome l.37:  5-6 digit core id LPAD 6 (incl. 360G-WELLCOME- forms)
#   dod      l.118: contract-number families (W81XWH/DAMD/N00014/FA/HR0011)
# Round-6 additions (next-largest funders by the same file's key order):
#   kakenhi  l.80:  JP/KAKENHI prefix stripped, yyXnnnnn or 8-digit form
#   anr      l.36:  ANR-yy-CODE-nnnn canonicalized to yy-CODE-nnnn
#   fapesp   l.31:  xx/xxxxx-x process numbers (space-squashed)
#   doe      l.52:  DE- prefix + office code (SC/FG/...) contract forms
#   cdmrp    l.118: W81XWH/DAMD/HT/W911/CDMRPL award numbers
#   aei      l.56:  PID/PGC/RYC/... yyyy-nnnnnn Spanish state grants
#   most_tw  l.29:  MOST/NSC/NSTC prefix stripped, separators squashed
#   capes    l.44:  8888x.nnnnnn/yyyy-nn process numbers
#   ncn      l.45:  yyyy/nn/L/LLn/nnnnn Polish grant paths
#   gacr     l.63:  GA/GP prefixed Czech grant ids (two generations)
# Round-7 additions — the NEXT 20 funders in the reference's works-count
# order (scripts/award_translation_rules.py FUNDERS table) not already
# covered above, deposited-side rules from AwardNormKey.sql l.78-125:
#   nsfc       U+7-digit or 8-digit project number anywhere in the string
#   dfg        9-digit project number
#   fct        space-squashed identity (PTDC/... path ids)
#   nserc      merge onto "year-number" (RGPIN-2019-05634 -> 2019-5634)
#   snsf       trailing 5-6 digit grant no (12-digit forms keep last 6)
#   cihr       programme-prefix stripped, bare number, zeros dropped
#   aha        space-squashed identity
#   shandong   ZR-prefixed provincial ids, two generations
#   bmbf       [+ /-]-squashed identity
#   fwf        single-letter+digits core id, DOI-prefix + suffix tolerated
#   isciii     PInn/nnnnn canonicalized with LPAD-5 serial
#   vr         DNR/VR prefix stripped, yyyy-nnnnn LPAD-5
#   nasa       [ -]-squashed identity (80NSSC...-style contract ids)
#   amed       JP prefix + trailing fiscal H-suffix stripped
#   dhhs       embedded contract/grant grammars, separators squashed
#   nhmrc      APP/GNT-prefixed or bare 6-7 digit application id
#   hunan      yyyyJJnnnnn provincial ids; 2-digit years promoted to 20yy
#   zhejiang   L-series provincial ids; missing L prefix restored
#   innovate_uk  5-8 digit or KTP-prefixed application number
#   nihr       programme nn/nnn/nn paths + PROG-yyyy-nnnnn award forms
# Round-8 additions — the REMAINING funders of the reference's scored
# set (AwardNormKey.sql l.288 lists 51 funder ids; these close the
# deposited-side normalizer to full breadth), same sources:
#   ec         CORDIS 101-prefixed 9-digit or bare 6-digit grant no
#   epsrc      space-squashed identity (EP/... council paths)
#   nstc_tw    MOST/NSC/NSTC prefix stripped (same rule, separate funder)
#   mrc        MR/-path embedded extract, else council-prefix strip
#   bbsrc      BB(S)/-path embedded extract (ids may nest '/'), else strip
#   nerc       NE/-path embedded extract, else strip
#   stfc       ST|PP/-path embedded extract, else strip
#   esrc       ES/-path embedded extract, else strip
#   ahrc       AH/-path embedded extract, else strip
#   aro        W911NF contract grammar, separators squashed
#   onr        N00014-style contract grammar
#   afosr      FA-series/F49620 contract grammar
#   darpa      HR0011/D..A[CP]/N66001/W31P4Q/FA86xx/FA87xx grammars
#   dtra       HDTRA contract grammar
#   usamrmc/usamrdc/usamraa  W81XWH/DAMD/HT award grammar (shared format,
#              three funder identities — kept as separate families so the
#              fid->family map stays 1:1 with the reference's table)
# The reference's boundary lookarounds ((?<!\\d) etc.) are deliberately
# replaced lookaround-free so the Java-regex (Spark) and RE2 (DuckDB
# oracle) compilations agree verbatim: either anchors/prefix-strips
# where the reference itself anchors, or a consuming boundary group —
# '(^|[^0-9])(<id>)([^0-9]|$)' extracting the middle group — where the
# reference extracts an id embedded in longer text (nsfc, dfg, nhmrc,
# dhhs second form, nihr second form).  The consuming emulation scans
# the same leftmost-first order as the lookaround original; the one
# residual divergence is dhhs, where the reference's single alternation
# is split into a COALESCE of its two arms, so a string containing BOTH
# shapes keys on the contract-number arm even when the grant-number arm
# occurs earlier — vanishingly rare in award strings and noted here
# deliberately.  Literal dots use [.] so neither engine's string-escape
# rules are in play.
_AWARD_NORM0 = """
CREATE OR REPLACE TEMPORARY FUNCTION award_norm0(award STRING)
RETURNS STRING
RETURN regexp_replace(upper(trim(award)), '  +', ' ')
"""

_AWARD_FAMILY_KEY = """
CREATE OR REPLACE TEMPORARY FUNCTION award_family_key(
  family STRING, award STRING)
RETURNS STRING
RETURN CASE
  WHEN award IS NULL OR trim(award) = '' THEN NULL
  WHEN family = 'nih' THEN
    CASE WHEN nullif(regexp_extract(award_norm0(award),
           '([A-Z]{2}) ?-?([0-9]{5,6})', 1), '') IS NOT NULL
         THEN concat(
           regexp_extract(award_norm0(award),
                          '([A-Z]{2}) ?-?([0-9]{5,6})', 1),
           lpad(regexp_extract(award_norm0(award),
                               '([A-Z]{2}) ?-?([0-9]{5,6})', 2), 6, '0'))
    END
  WHEN family = 'nsf' THEN
    nullif(regexp_extract(
      regexp_replace(award_norm0(award), '[ -]', ''), '([0-9]{7})', 1), '')
  WHEN family = 'erc' THEN
    CAST(CAST(nullif(CASE
      WHEN regexp_replace(award_norm0(award), '[ -]', '') rlike '^[0-9]{12}$'
        THEN substr(regexp_replace(award_norm0(award), '[ -]', ''), 7)
      ELSE regexp_extract(
        regexp_replace(award_norm0(award), '[ -]', ''), '([0-9]{5,6})$', 1)
    END, '') AS BIGINT) AS STRING)
  WHEN family = 'ukri' THEN
    coalesce(
      regexp_replace(nullif(regexp_extract(award_norm0(award),
        '((EP|BBS|BB|NE|ES|AH|MR|ST)/ ?[A-Z0-9]{6,7}(/[0-9]{1,2})?)', 1),
        ''), '[ /]', ''),
      nullif(regexp_replace(regexp_replace(award_norm0(award),
        '^(EPSRC|BBSRC|NERC|ESRC|AHRC|MRC|STFC|UKRI|GRANT|NO)[ .:#-]*', ''),
        '[ _/.-]', ''), ''))
  WHEN family = 'wellcome' THEN
    lpad(coalesce(
      nullif(regexp_extract(award_norm0(award),
                            '360G-WELLCOME-([0-9]{5,6})', 1), ''),
      nullif(regexp_extract(award_norm0(award), '^([0-9]{5,6})', 1), '')),
      6, '0')
  WHEN family = 'dod' THEN
    nullif(regexp_extract(
      regexp_replace(award_norm0(award), '[-_ ]', ''),
      '((W81XWH|DAMD[0-9]{2}|HT[0-9]{4}|W911NF|N00014|FA[0-9]{4}|HR0011)[0-9]{2}[A-Z0-9]{3,9})',
      1), '')
  WHEN family = 'kakenhi' THEN
    nullif(regexp_extract(
      regexp_replace(award_norm0(award), '^(KAKENHI|JP|GRANT|NO[.]?)[ -]*', ''),
      '^([0-9]{2}[A-Z][0-9]{5}|[0-9]{8})$', 1), '')
  WHEN family = 'anr' THEN
    CASE WHEN nullif(regexp_extract(award_norm0(award),
           '^ANR-([0-9]{2})-([A-Z0-9]{2,6})-([0-9]{4})', 1), '') IS NOT NULL
         THEN concat(
           regexp_extract(award_norm0(award), '^ANR-([0-9]{2})-([A-Z0-9]{2,6})-([0-9]{4})', 1), '-',
           regexp_extract(award_norm0(award), '^ANR-([0-9]{2})-([A-Z0-9]{2,6})-([0-9]{4})', 2), '-',
           regexp_extract(award_norm0(award), '^ANR-([0-9]{2})-([A-Z0-9]{2,6})-([0-9]{4})', 3))
    END
  WHEN family = 'fapesp' THEN
    nullif(regexp_extract(regexp_replace(award_norm0(award), ' ', ''),
      '^([0-9]{2}/[0-9]{5}-[0-9])$', 1), '')
  WHEN family = 'doe' THEN
    nullif(regexp_extract(regexp_replace(award_norm0(award), '[ -]', ''),
      '^(?:DE)?((SC|EE|FE|AR|NE|NA|EM|OE|IA|PI|BI|CF|ET|SF|HS|DP|EW)[0-9]{7}|(FG|FC|AC|AI|GO|PS|EV|ER|AA)[0-9]{2}[A-Z]{1,2}[0-9]{4,6})$',
      1), '')
  WHEN family = 'cdmrp' THEN
    nullif(regexp_extract(regexp_replace(award_norm0(award), '[-_ ]', ''),
      '^((W81XWH|DAMD[0-9]{2}|HT[0-9]{4}|W911[A-Z0-9]{2}|CDMRPL)[0-9A-Z]{5,14})$',
      1), '')
  WHEN family = 'aei' THEN
    nullif(regexp_extract(regexp_replace(award_norm0(award), ' ', ''),
      '^((PID|PGC|RYC|RTI|CEX|TED|SEV|BES|FPU|FJC|IJC|CNS|EUR|EQC|PLEC|PDC)[0-9]{4}-[0-9]{5,6}[A-Z0-9-]{0,8})$',
      1), '')
  WHEN family = 'most_tw' THEN
    nullif(regexp_replace(
      regexp_replace(award_norm0(award), '^(MOST|NSC|NSTC)[ -]*', ''),
      '[ -]', ''), '')
  WHEN family = 'capes' THEN
    nullif(regexp_extract(regexp_replace(award_norm0(award), ' ', ''),
      '^((8888[0-9]|99999)[.][0-9]{6}/[0-9]{4}-[0-9]{2})$', 1), '')
  WHEN family = 'ncn' THEN
    nullif(regexp_extract(regexp_replace(award_norm0(award), ' ', ''),
      '^(20[0-9]{2}/[0-9]{2}/[A-Z]{1,2}/[A-Z]{2,3}[0-9]{1,2}/[0-9]{5})$', 1), '')
  WHEN family = 'gacr' THEN
    coalesce(
      nullif(regexp_extract(award_norm0(award), '^G[A-Z]([0-9]{2}-[0-9]{5}[A-Z])$', 1), ''),
      nullif(regexp_extract(award_norm0(award), '^G[A-Z](P?[0-9]{3}/[0-9]{2}/[A-Z]?[0-9]{3,4})$', 1), ''))
  WHEN family = 'nsfc' THEN
    coalesce(
      nullif(regexp_extract(award_norm0(award),
        '(^|[^A-Z0-9])(U[0-9]{7})([^0-9]|$)', 2), ''),
      nullif(regexp_extract(award_norm0(award),
        '(^|[^0-9])([0-9]{8})([^0-9]|$)', 2), ''),
      nullif(regexp_extract(regexp_replace(award_norm0(award), ' ', ''),
        '(^|[^0-9])([0-9]{8})([^0-9]|$)', 2), ''))
  WHEN family = 'dfg' THEN
    nullif(regexp_extract(award_norm0(award),
      '(^|[^0-9])([0-9]{9})([^0-9]|$)', 2), '')
  WHEN family = 'fct' THEN
    nullif(regexp_replace(award_norm0(award), ' ', ''), '')
  WHEN family = 'nserc' THEN
    CASE
      WHEN regexp_replace(award_norm0(award), ' ', '')
             rlike '[A-Z]{3,7}/?-?[0-9]{4}-?[0-9]{4,6}$'
        THEN concat(
          regexp_extract(regexp_replace(award_norm0(award), ' ', ''),
                         '([0-9]{4})-?[0-9]{4,6}$', 1), '-',
          CAST(CAST(regexp_extract(regexp_replace(award_norm0(award), ' ', ''),
                                   '([0-9]{4,6})$', 1) AS BIGINT) AS STRING))
      WHEN award_norm0(award) rlike '^[0-9]{5,6}[ -][0-9]{4}$'
        THEN concat(
          regexp_extract(award_norm0(award), '([0-9]{4})$', 1), '-',
          CAST(CAST(regexp_extract(award_norm0(award), '^([0-9]{5,6})', 1)
                    AS BIGINT) AS STRING))
    END
  WHEN family = 'snsf' THEN
    CAST(CAST(nullif(CASE
      WHEN award_norm0(award) rlike '^[0-9]{12}$'
        THEN substr(award_norm0(award), 7)
      ELSE regexp_extract(award_norm0(award), '([0-9]{5,6})$', 1)
    END, '') AS BIGINT) AS STRING)
  WHEN family = 'cihr' THEN
    CAST(CAST(nullif(regexp_extract(
      regexp_replace(regexp_replace(award_norm0(award), '^#+ ?', ''),
                     '^(950[- ]|[A-Z]{2,4}[0-9]?[- ]?)', ''),
      '^([0-9]{4,6})([-_][0-9]+)?$', 1), '') AS BIGINT) AS STRING)
  WHEN family = 'aha' THEN
    nullif(regexp_replace(award_norm0(award), ' ', ''), '')
  WHEN family = 'shandong' THEN
    nullif(regexp_extract(regexp_replace(award_norm0(award), '[ -]', ''),
      '(ZR(19|20)[0-9]{2}[A-Z]{1,3}[0-9]{2,4}|[0-9]{4}ZR[A-Z][0-9A-Z]{5})',
      1), '')
  WHEN family = 'bmbf' THEN
    nullif(regexp_replace(award_norm0(award), '[+ /-]', ''), '')
  WHEN family = 'fwf' THEN
    nullif(regexp_extract(regexp_replace(award_norm0(award), ' ', ''),
      '^(?:10[.]55776/|HTTPS?://(?:DX[.])?DOI[.]ORG/10[.]55776/)?([A-Z]{1,3}[0-9]{3,7})(?:-[A-Z][0-9]{1,3})?$',
      1), '')
  WHEN family = 'isciii' THEN
    CASE WHEN regexp_replace(award_norm0(award), ' ', '')
              rlike '^[A-Z]{2,4}[0-9]{2}(CIII)?[/-][0-9]{1,5}$'
         THEN concat(
           regexp_extract(regexp_replace(award_norm0(award), ' ', ''),
                          '^([A-Z]{2,4}[0-9]{2}(CIII)?)[/-]', 1), '/',
           lpad(regexp_extract(regexp_replace(award_norm0(award), ' ', ''),
                               '[/-]([0-9]{1,5})$', 1), 5, '0'))
    END
  WHEN family = 'vr' THEN
    CASE WHEN regexp_replace(award_norm0(award), '^(VR|DNR|GRANT)[ .:#-]*', '')
              rlike '^(19|20)[0-9]{2}[- ][0-9]{4,5}$'
         THEN concat(
           regexp_extract(
             regexp_replace(award_norm0(award), '^(VR|DNR|GRANT)[ .:#-]*', ''),
             '^((19|20)[0-9]{2})', 1), '-',
           lpad(regexp_extract(
             regexp_replace(award_norm0(award), '^(VR|DNR|GRANT)[ .:#-]*', ''),
             '[- ]([0-9]{4,5})$', 1), 5, '0'))
    END
  WHEN family = 'nasa' THEN
    nullif(regexp_replace(award_norm0(award), '[ -]', ''), '')
  WHEN family = 'amed' THEN
    nullif(regexp_extract(award_norm0(award),
      '^(?:JP)?([0-9]{2}[A-Z]{2}[0-9]{7})(?:H[0-9]{4})?$', 1), '')
  WHEN family = 'dhhs' THEN
    coalesce(
      nullif(regexp_extract(regexp_replace(award_norm0(award), '[ -]', ''),
        '([A-Z][A-Z0-9]{4}[0-9]{6})', 1), ''),
      nullif(regexp_extract(regexp_replace(award_norm0(award), '[ -]', ''),
        '(^|[^0-9])([0-9]{2}[A-Z][A-Z0-9][0-9]{4,5})([^0-9]|$)', 2), ''))
  WHEN family = 'nhmrc' THEN
    coalesce(
      nullif(regexp_extract(award_norm0(award),
        '(^|[^A-Z0-9])(APP|GNT) ?-?([0-9]{6,7})([^0-9]|$)', 3), ''),
      nullif(regexp_extract(regexp_replace(award_norm0(award), ' ', ''),
                            '^(?:ID|NHMRC)?[.:#-]*([0-9]{6,7})$', 1), ''))
  WHEN family = 'hunan' THEN
    coalesce(
      nullif(regexp_extract(
        regexp_replace(regexp_replace(award_norm0(award),
                                      '^(NO|GRANT)[ .:#-]*', ''), ' ', ''),
        '^((19|20)[0-9]{2}JJ[0-9]{4,5})$', 1), ''),
      CASE WHEN regexp_replace(regexp_replace(award_norm0(award),
                               '^(NO|GRANT)[ .:#-]*', ''), ' ', '')
                rlike '^[0-9]{2}JJ[0-9]{4,5}$'
           THEN concat('20', regexp_replace(regexp_replace(award_norm0(award),
                            '^(NO|GRANT)[ .:#-]*', ''), ' ', ''))
      END)
  WHEN family = 'zhejiang' THEN
    coalesce(
      nullif(regexp_extract(
        regexp_replace(regexp_replace(award_norm0(award),
                                      '^(NO|GRANT)[ .:#-]*', ''), ' ', ''),
        '^(L[A-Z]{0,4}[0-9]{2}[A-Z][0-9]{6})$', 1), ''),
      CASE WHEN regexp_replace(regexp_replace(award_norm0(award),
                               '^(NO|GRANT)[ .:#-]*', ''), ' ', '')
                rlike '^[A-Z]{1,4}[0-9]{2}[A-Z][0-9]{6}$'
            AND NOT regexp_replace(regexp_replace(award_norm0(award),
                                   '^(NO|GRANT)[ .:#-]*', ''), ' ', '')
                    rlike '^L'
           THEN concat('L', regexp_replace(regexp_replace(award_norm0(award),
                            '^(NO|GRANT)[ .:#-]*', ''), ' ', ''))
      END)
  WHEN family = 'innovate_uk' THEN
    nullif(regexp_extract(regexp_replace(award_norm0(award), ' ', ''),
      '^(?:PROJECT|GRANT|APP|NO)?[.:#-]*([0-9]{5,8}|KTP[0-9]{6})$', 1), '')
  WHEN family = 'nihr' THEN
    coalesce(
      nullif(regexp_extract(
        regexp_replace(regexp_replace(award_norm0(award), '^NIHR[- ]', ''),
                       ' ', ''),
        '^(?:[A-Z]{2,6})?([0-9]{2}/[0-9]{2,4}/[0-9]{2,4})$', 1), ''),
      nullif(regexp_extract(
        regexp_replace(award_norm0(award), '^NIHR[- ]', ''),
        '(^|[^A-Z0-9-])([A-Z]{1,5}(-[A-Z0-9]{1,4}){0,3}-(19|20)[0-9]{2}-[0-9]{2,6}(-[A-Z0-9]{1,6}){0,2})([^A-Z0-9-]|$)',
        2), ''),
      nullif(regexp_replace(
        regexp_replace(award_norm0(award), '^NIHR[- ]', ''), ' ', ''), ''))
  WHEN family = 'ec' THEN
    coalesce(
      nullif(regexp_extract(award_norm0(award),
        '(^|[^0-9])(101[0-9]{6})([^0-9]|$)', 2), ''),
      nullif(regexp_extract(award_norm0(award),
        '(^|[^0-9])([0-9]{6})([^0-9]|$)', 2), ''))
  WHEN family = 'epsrc' THEN
    nullif(regexp_replace(award_norm0(award), ' ', ''), '')
  WHEN family = 'nstc_tw' THEN
    nullif(regexp_replace(
      regexp_replace(award_norm0(award), '^(MOST|NSC|NSTC)[ -]*', ''),
      '[ -]', ''), '')
  WHEN family = 'mrc' THEN
    coalesce(
      regexp_replace(nullif(regexp_extract(award_norm0(award),
        '(^|[^A-Z0-9])(MR/ ?[A-Z0-9]{6,7}(/[0-9]{1,2})?)([^A-Z0-9]|$)', 2),
        ''), '[ /]', ''),
      nullif(regexp_replace(regexp_replace(award_norm0(award),
        '^(MRC|UKRI|GRANT|NO)[ .:#-]*', ''), '[ _/.-]', ''), ''))
  WHEN family = 'bbsrc' THEN
    coalesce(
      regexp_replace(nullif(regexp_extract(award_norm0(award),
        '(^|[^A-Z0-9])(BBS?/ ?[A-Z0-9/]{6,14}?(/[0-9]{1,2})?)([^A-Z0-9]|$)', 2),
        ''), '[ /]', ''),
      nullif(regexp_replace(regexp_replace(award_norm0(award),
        '^(BBSRC|UKRI|GRANT|NO)[ .:#-]*', ''), '[ _/.-]', ''), ''))
  WHEN family = 'nerc' THEN
    coalesce(
      regexp_replace(nullif(regexp_extract(award_norm0(award),
        '(^|[^A-Z0-9])(NE/ ?[A-Z0-9]{6,7}(/[0-9]{1,2})?)([^A-Z0-9]|$)', 2),
        ''), '[ /]', ''),
      nullif(regexp_replace(regexp_replace(award_norm0(award),
        '^(NERC|UKRI|GRANT|NO)[ .:#-]*', ''), '[ _/.-]', ''), ''))
  WHEN family = 'stfc' THEN
    coalesce(
      regexp_replace(nullif(regexp_extract(award_norm0(award),
        '(^|[^A-Z0-9])((ST|PP)/ ?[A-Z0-9/]{6,9}?(/[0-9]{1,2})?)([^A-Z0-9]|$)', 2),
        ''), '[ /]', ''),
      nullif(regexp_replace(regexp_replace(award_norm0(award),
        '^(STFC|UKRI|GRANT|NO)[ .:#-]*', ''), '[ _/.-]', ''), ''))
  WHEN family = 'esrc' THEN
    coalesce(
      regexp_replace(nullif(regexp_extract(award_norm0(award),
        '(^|[^A-Z0-9])(ES/ ?[A-Z0-9]{6,7}(/[0-9]{1,2})?)([^A-Z0-9]|$)', 2),
        ''), '[ /]', ''),
      nullif(regexp_replace(regexp_replace(award_norm0(award),
        '^(ESRC|UKRI[ .:#-]|GRANT|NO)[ .:#-]*', ''), '[ _/.-]', ''), ''))
  WHEN family = 'ahrc' THEN
    coalesce(
      regexp_replace(nullif(regexp_extract(award_norm0(award),
        '(^|[^A-Z0-9])(AH/ ?[A-Z0-9]{6,7}(/[0-9]{1,2})?)([^A-Z0-9]|$)', 2),
        ''), '[ /]', ''),
      nullif(regexp_replace(regexp_replace(award_norm0(award),
        '^(AHRC|UKRI[ .:#-]|GRANT|NO)[ .:#-]*', ''), '[ _/.-]', ''), ''))
  WHEN family = 'aro' THEN
    nullif(regexp_extract(regexp_replace(award_norm0(award), '[-_ ]', ''),
      '^(W911NF[0-9]{2}[A-Z0-9]{3,9})$', 1), '')
  WHEN family = 'onr' THEN
    nullif(regexp_extract(regexp_replace(award_norm0(award), '[-_ ]', ''),
      '^(N[0-9]{7}[A-Z0-9]{3,9})$', 1), '')
  WHEN family = 'afosr' THEN
    nullif(regexp_extract(regexp_replace(award_norm0(award), '[-_ ]', ''),
      '^((FA[0-9]{4}|F49620)[0-9]{2}[A-Z0-9]{3,9})$', 1), '')
  WHEN family = 'darpa' THEN
    nullif(regexp_extract(regexp_replace(award_norm0(award), '[-_ ]', ''),
      '^((HR0011|D[0-9]{2}A[CP]|N66001|W31P4Q|FA86[0-9]{2}|FA87[0-9]{2})[0-9A-Z]{5,12})$',
      1), '')
  WHEN family = 'dtra' THEN
    nullif(regexp_extract(regexp_replace(award_norm0(award), '[-_ ]', ''),
      '^(HDTRA[0-9]{3}[A-Z0-9]{3,9})$', 1), '')
  WHEN family = 'usamrmc' THEN
    nullif(regexp_extract(regexp_replace(award_norm0(award), '[-_ ]', ''),
      '^((W81XWH|DAMD[0-9]{2}|HT[0-9]{4})[0-9]{2}[A-Z0-9]{3,9})$', 1), '')
  WHEN family = 'usamrdc' THEN
    nullif(regexp_extract(regexp_replace(award_norm0(award), '[-_ ]', ''),
      '^((W81XWH|DAMD[0-9]{2}|HT[0-9]{4})[0-9]{2}[A-Z0-9]{3,9})$', 1), '')
  WHEN family = 'usamraa' THEN
    nullif(regexp_extract(regexp_replace(award_norm0(award), '[-_ ]', ''),
      '^((W81XWH|DAMD[0-9]{2}|HT[0-9]{4})[0-9]{2}[A-Z0-9]{3,9})$', 1), '')
  ELSE award_key(award)
END
"""

_ALL = (
    _PRIORITY_BEST,
    _NAMES_COMPATIBLE,
    _AWARD_STRIP,
    _AWARD_KEY,
    _AWARD_IS_WEAK,
    _AWARD_NORM0,
    _AWARD_FAMILY_KEY,
)


from weakref import WeakSet

_INSTALLED: WeakSet = WeakSet()


def create_sql_udfs(spark: SparkSession) -> None:
    """Install the engine's SQL-UDF vocabulary into the session.

    Temporary functions live for the session, so re-declaring them on
    every query invocation only burns driver round-trips (~0.4s for the
    7 DDLs) — declare once per live session object. A WeakSet (not an
    id() set) so a recycled address can only cause a harmless re-declare
    (CREATE OR REPLACE), never a silent skip on a fresh session.
    """
    if spark in _INSTALLED:
        return
    for ddl in _ALL:
        spark.sql(ddl)
    _INSTALLED.add(spark)
