"""NSF awards JSON-flatten stage (``scripts/local/nsf_awards_to_s3.py``
— US National Science Foundation, 660 lines; one JSON file per award
inside one zip per year).

Ported semantics (``flatten_award`` :222-337, ``process_all_zips``
:337-425, ``save_to_parquet`` :425-465):

* 26 simple fields copied verbatim (incl. the ``_source_file`` debug
  column the zip loop injects, :212-214);
* **perf_inst polymorphism** (:252-287): a dict ships its 6 fields
  with count=1; a non-empty LIST ships the FIRST entry's fields,
  count=len, and ``perf_inst_all`` = ``json.dumps`` of the whole list
  only when len>1; missing/empty ships all-None with count=0 (these
  8 keys are always initialized, so the columns always exist);
* pi (:289-305): same first-entry + count + ``pi_all``-when->1 shape
  over ``pi[0]``'s 4 fields, always-initialized;
* pgm_ele / pgm_ref (:307-319): ``','``-joined codes, ``'; '``-joined
  texts, ``json.dumps`` of the full list — but these keys are only
  set when the list is non-empty, so a missing list is a NaN cell,
  not an initialized None (same for ``app_fund_all`` :321-324);
* por (:326-331): ``award.get('por', {})`` is a dict even when
  absent, so por_email/por_name always exist (None when missing);
* **stringify-object-columns** (:399-404 per-chunk, :441-448 final):
  every object column renders non-null cells as ``str(x)`` — the
  fixture makes the amount fields genuinely mixed-typed across files
  (int / str / float in the JSON), so they ship as strings with
  Python renderings (``str(1234.5)`` = ``'1234.5'``); oblg_fy and the
  two counts are uniformly int and stay integer columns;
* NO dedup and NO row filter — every award JSON becomes exactly one
  output row (the zip loop's checkpointing is a resume seam).

Scale: one scan, pure column algebra, zero shuffle, zero Python.
The reference holds all ~500k award dicts in one pandas frame.

Fixture: one award JSON per orders row; modulus lattices cycle the
dict/list/missing perf_inst forms, the 0/1/n pi list sizes, and the
present/absent program-tag lists.  json.dumps renders are rebuilt
with the exact ``", "`` / ``": "`` separators.

tests/test_template_fidelity.py::test_nsf_matches_reference_semantics
re-derives the flatten in Python over real dicts (json.dumps and
str() called natively, not re-spelled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openalex_walden_spark.queries.registry import register

# flatten_award:237-247 — the verbatim passthrough list (minus
# _source_file, which the fixture injects like the zip loop does).
NSF_SIMPLE_FIELDS = [
    "awd_id", "agcy_id", "tran_type", "awd_istr_txt", "awd_titl_txt",
    "cfda_num", "org_code", "po_phone", "po_email",
    "po_sign_block_name", "awd_eff_date", "awd_exp_date",
    "tot_intn_awd_amt", "awd_amount", "awd_min_amd_letter_date",
    "awd_max_amd_letter_date", "awd_abstract_narration",
    "awd_arra_amount", "awd_agcy_code", "fund_agcy_code", "dir_abbr",
    "div_abbr", "org_dir_long_name", "org_div_long_name", "oblg_fy",
    "_source_file",
]


def _sql(dialect: str) -> str:
    sp = dialect == "spark"
    S = "STRING" if sp else "VARCHAR"
    cs = lambda e: f"CAST({e} AS {S})"  # noqa: E731
    null_s = f"CAST(NULL AS {S})"
    qi = (lambda n: f"`{n}`") if sp else (lambda n: f'"{n}"')  # noqa: E731
    k = "o_orderkey"

    # --- the award-JSON fixture, one award per orders row ------------
    year = f"CAST(1976 + {k} % 50 AS INT)"
    awd_id = f"lpad({cs(f'{k} % 10000000')}, 7, '0')"
    eff = ("date_format(o_orderdate, 'MM/dd/yyyy')" if sp
           else "strftime(o_orderdate, '%m/%d/%Y')")
    exp = (("date_format(date_add(o_orderdate, CAST(365 + o_orderkey % "
            "1000 AS INT)), 'MM/dd/yyyy')") if sp else
           ("strftime(CAST(o_orderdate AS DATE) + CAST(365 + o_orderkey "
            "% 1000 AS INT), '%m/%d/%Y')"))
    # mixed-typed JSON amounts -> str(x) renderings (module docstring)
    amount = (f"CASE CAST({k} % 3 AS INT) "
              f"WHEN 0 THEN {cs(f'{k} % 2000000')} "
              f"WHEN 1 THEN {cs(f'{k} % 900000')} "
              f"ELSE concat({cs(f'{k} % 50000')}, '.5') END")
    arra = (f"CASE WHEN {k} % 9 = 0 THEN {cs(f'{k} % 70000')} "
            f"ELSE '0' END")

    # perf_inst entry j as a json.dumps object string (dict key order
    # = the fixture JSON's construction order)
    def perf_obj(j: str) -> str:
        return (
            f"concat('{{'"
            f", '\"perf_inst_name\": \"University ', {cs(f'({j}) % 80')}, '\"'"
            f", ', \"perf_city_name\": \"City ', {cs(f'({j}) % 31')}, '\"'"
            f", ', \"perf_st_code\": \"S', {cs(f'({j}) % 10')}, '\"'"
            f", ', \"perf_zip_code\": \"', lpad({cs(f'({j}) % 99999')}, 5, '0'), '\"'"
            f", ', \"perf_ctry_code\": \"US\"'"
            f", ', \"perf_ctry_name\": \"United States\"'"
            f", '}}')"
        )

    def pi_obj(j: str) -> str:
        return (
            f"concat('{{'"
            f", '\"pi_full_name\": \"Alex Researcher ', {cs(f'({j}) % 200')}, '\"'"
            f", ', \"pi_first_name\": \"Alex\"'"
            f", ', \"pi_last_name\": \"Researcher ', {cs(f'({j}) % 200')}, '\"'"
            f", ', \"pi_email\": \"pi', {cs(f'({j}) % 200')}, '@univ.edu\"'"
            f", '}}')"
        )

    def ele_obj(j: str) -> str:
        return (
            f"concat('{{'"
            f", '\"pgm_ele_code\": \"', lpad({cs(f'({j}) % 9000')}, 4, '0'), '\"'"
            f", ', \"pgm_ele_txt\": \"Program ', {cs(f'({j}) % 40')}, '\"'"
            f", '}}')"
        )

    def ref_obj(j: str) -> str:
        return (
            f"concat('{{'"
            f", '\"pgm_ref_code\": \"', lpad({cs(f'({j}) % 9000')}, 4, '0'), '\"'"
            f", ', \"pgm_ref_txt\": \"Reference ', {cs(f'({j}) % 40')}, '\"'"
            f", '}}')"
        )

    # perf_inst form lattice: 0 missing, 1/4 dict, 2 list[1], 3 list[2]
    pform = f"CAST({k} % 5 AS INT)"
    p0, p1 = f"{k} * 7", f"{k} * 7 + 3"
    inst_name = (f"CASE WHEN {pform} = 0 THEN {null_s} "
                 f"ELSE concat('University ', {cs(f'({p0}) % 80')}) END")
    inst_city = (f"CASE WHEN {pform} = 0 THEN {null_s} "
                 f"ELSE concat('City ', {cs(f'({p0}) % 31')}) END")
    inst_st = (f"CASE WHEN {pform} = 0 THEN {null_s} "
               f"ELSE concat('S', {cs(f'({p0}) % 10')}) END")
    inst_zip = (f"CASE WHEN {pform} = 0 THEN {null_s} "
                f"ELSE lpad({cs(f'({p0}) % 99999')}, 5, '0') END")
    inst_cc = f"CASE WHEN {pform} = 0 THEN {null_s} ELSE 'US' END"
    inst_cn = (f"CASE WHEN {pform} = 0 THEN {null_s} "
               f"ELSE 'United States' END")
    perf_count = (f"CASE WHEN {pform} = 0 THEN 0 "
                  f"WHEN {pform} = 3 THEN 2 ELSE 1 END")
    perf_all = (f"CASE WHEN {pform} = 3 THEN concat('[', {perf_obj(p0)}, "
                f"', ', {perf_obj(p1)}, ']') ELSE {null_s} END")

    # pi list size: 0 when k%4=0, 2 when k%4=2, else 1
    nsize = f"CAST({k} % 4 AS INT)"
    q0, q1 = f"{k} * 11", f"{k} * 11 + 5"
    pi_full = (f"CASE WHEN {nsize} = 0 THEN {null_s} "
               f"ELSE concat('Alex Researcher ', {cs(f'({q0}) % 200')}) END")
    pi_first = f"CASE WHEN {nsize} = 0 THEN {null_s} ELSE 'Alex' END"
    pi_last = (f"CASE WHEN {nsize} = 0 THEN {null_s} "
               f"ELSE concat('Researcher ', {cs(f'({q0}) % 200')}) END")
    pi_email = (f"CASE WHEN {nsize} = 0 THEN {null_s} "
                f"ELSE concat('pi', {cs(f'({q0}) % 200')}, '@univ.edu') END")
    pi_count = (f"CASE WHEN {nsize} = 0 THEN 0 "
                f"WHEN {nsize} = 2 THEN 2 ELSE 1 END")
    pi_all = (f"CASE WHEN {nsize} = 2 THEN concat('[', {pi_obj(q0)}, "
              f"', ', {pi_obj(q1)}, ']') ELSE {null_s} END")

    # pgm_ele: missing when k%3=0; 2 entries when k%3=2
    eform = f"CAST({k} % 3 AS INT)"
    e0, e1 = f"{k} * 13", f"{k} * 13 + 7"
    code = lambda j: f"lpad({cs(f'({j}) % 9000')}, 4, '0')"  # noqa: E731
    ele_codes = (f"CASE WHEN {eform} = 0 THEN {null_s} "
                 f"WHEN {eform} = 2 THEN concat({code(e0)}, ',', "
                 f"{code(e1)}) ELSE {code(e0)} END")
    ele_text = (f"CASE WHEN {eform} = 0 THEN {null_s} "
                f"WHEN {eform} = 2 THEN concat('Program ', "
                f"{cs(f'({e0}) % 40')}, '; Program ', {cs(f'({e1}) % 40')}) "
                f"ELSE concat('Program ', {cs(f'({e0}) % 40')}) END")
    ele_all = (f"CASE WHEN {eform} = 0 THEN {null_s} "
               f"WHEN {eform} = 2 THEN concat('[', {ele_obj(e0)}, ', ', "
               f"{ele_obj(e1)}, ']') "
               f"ELSE concat('[', {ele_obj(e0)}, ']') END")

    # pgm_ref: missing when k%6 in (0,1); else 1 entry
    rform = f"CAST({k} % 6 AS INT)"
    r0 = f"{k} * 17"
    ref_codes = (f"CASE WHEN {rform} <= 1 THEN {null_s} "
                 f"ELSE {code(r0)} END")
    ref_text = (f"CASE WHEN {rform} <= 1 THEN {null_s} "
                f"ELSE concat('Reference ', {cs(f'({r0}) % 40')}) END")
    ref_all = (f"CASE WHEN {rform} <= 1 THEN {null_s} "
               f"ELSE concat('[', {ref_obj(r0)}, ']') END")

    app_fund = (
        f"CASE WHEN {k} % 2 = 0 THEN {null_s} "
        f"ELSE concat('[{{', '\"app_code\": \"0100\", "
        f"\"app_name\": \"NSF RESEARCH & RELATED ACTIVIT\", "
        f"\"fund_code\": \"', lpad({cs(f'{k} % 99')}, 2, '0'), "
        f"'\"', '}}]') END")

    por_email = (f"CASE WHEN {k} % 7 = 0 THEN {null_s} "
                 f"ELSE concat('po', {cs(f'{k} % 150')}, '@nsf.gov') END")
    por_name = (f"CASE WHEN {k} % 7 = 0 THEN {null_s} "
                f"ELSE concat('Officer ', {cs(f'{k} % 150')}) END")

    return f"""
SELECT
  {awd_id} AS awd_id,
  'NSF' AS agcy_id,
  CASE WHEN {k} % 8 = 0 THEN 'CoopAgrmnt' ELSE 'Grant' END AS tran_type,
  'Standard Grant' AS awd_istr_txt,
  concat('Award title ', {cs(f'{k} % 503')}) AS awd_titl_txt,
  '47.049' AS cfda_num,
  lpad({cs(f'{k} % 9999')}, 8, '0') AS org_code,
  CASE WHEN {k} % 11 = 0 THEN {null_s}
       ELSE concat('703292', lpad({cs(f'{k} % 9999')}, 4, '0')) END
    AS po_phone,
  {por_email} AS po_email,
  {por_name} AS po_sign_block_name,
  {eff} AS awd_eff_date,
  {exp} AS awd_exp_date,
  {amount} AS tot_intn_awd_amt,
  {amount} AS awd_amount,
  {eff} AS awd_min_amd_letter_date,
  {exp} AS awd_max_amd_letter_date,
  CASE WHEN {k} % 10 = 0 THEN {null_s}
       ELSE concat('Abstract narration ', {cs(f'{k} % 211')}) END
    AS awd_abstract_narration,
  {arra} AS awd_arra_amount,
  '4900' AS awd_agcy_code,
  '4900' AS fund_agcy_code,
  CASE CAST({k} % 7 AS INT) WHEN 0 THEN 'MPS' WHEN 1 THEN 'BIO'
       WHEN 2 THEN 'CSE' WHEN 3 THEN 'ENG' WHEN 4 THEN 'GEO'
       WHEN 5 THEN 'SBE' ELSE 'EDU' END AS dir_abbr,
  concat('DIV', {cs(f'{k} % 20')}) AS div_abbr,
  concat('Directorate ', {cs(f'{k} % 7')}) AS org_dir_long_name,
  concat('Division ', {cs(f'{k} % 20')}) AS org_div_long_name,
  {year} AS oblg_fy,
  concat({cs(f'1976 + {k} % 50')}, '.zip') AS {qi('_source_file')},
  {inst_name} AS inst_name,
  {inst_city} AS inst_city,
  {inst_st} AS inst_state_code,
  {inst_zip} AS inst_zip,
  {inst_cc} AS inst_country_code,
  {inst_cn} AS inst_country_name,
  CAST({perf_count} AS INT) AS perf_inst_count,
  {perf_all} AS perf_inst_all,
  {pi_full} AS pi_full_name,
  {pi_first} AS pi_first_name,
  {pi_last} AS pi_last_name,
  {pi_email} AS pi_email,
  CAST({pi_count} AS INT) AS pi_count,
  {pi_all} AS pi_all,
  {ele_codes} AS pgm_ele_codes,
  {ele_text} AS pgm_ele_text,
  {ele_all} AS pgm_ele_all,
  {ref_codes} AS pgm_ref_codes,
  {ref_text} AS pgm_ref_text,
  {ref_all} AS pgm_ref_all,
  {app_fund} AS app_fund_all,
  {por_email} AS por_email,
  {por_name} AS por_name
FROM orders
"""


@register(
    "nsf_parse_awards",
    oracle=_sql("duck"),
    tags=("domain", "awards", "scrape"),
    tables=("orders",),
    doc=(
        "NSF award JSON flatten (scripts/local/nsf_awards_to_s3.py:"
        "222-337,337-425,425-465)"
    ),
)
def nsf_parse_awards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flatten_award re-expressed as one scan of pure column algebra:
    the dict-vs-list perf_inst polymorphism, first-PI + counts +
    json.dumps tails, ','/'; ' program-tag joins, and the mixed-type
    stringify quirk (module docstring has the semantics map)."""
    return spark.sql(_sql("spark"))
