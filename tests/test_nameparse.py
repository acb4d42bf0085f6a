"""Pin the deterministic name parser to the reference's own test cases
(CreateAuthorNames.ipynb cell 5) — the subset the Spark port covers.

The oracle gate (author_names_parse) proves Spark==DuckDB on the
fixture; these tests prove the SEMANTICS match the reference's
_PARTICLE_TEST_CASES / v2.4 expectations on the reference's inputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openalex_walden_spark.functions.nameparse import parse_author_name

# (raw, expected last) — reference _PARTICLE_TEST_CASES, minus the
# accented rows (transliteration is a documented non-port: the Latin
# pipeline does not fold diacritics).
PARTICLE_CASES = [
    ("Evelyn Farias de Oliveira", "oliveira"),
    ("Evelyn Farias Oliveira", "oliveira"),
    ("Oliveira, Evelyn Farias de", "oliveira"),
    ("Denison Melo De Aguiar", "aguiar"),
    ("Aguiar, Denison Melo De", "aguiar"),
    ("Jan van der Berg", "berg"),
    ("Berg, Jan van der", "berg"),
    ("Jan van de Berg", "berg"),
    ("Jan van den Berg", "berg"),
    ("Juan de los Santos", "santos"),
    ("Loan Le", "le"),
    ("d'Angelo, Maria", "dangelo"),
]

# (raw, expected last, expected first) — the v2.4 rows the narrow
# surname-first-initials form covers (one lead word + all-caps 2-blob).
V24_CASES = [
    ("Pawar AS", "pawar", "a"),
    ("Waghmare DH", "waghmare", "d"),
]

# Pipeline-level expectations: titles, suffixes, credentials, nicknames.
SHAPE_CASES = [
    # raw, title, first, middle, last, suffix, nickname
    ("Prof. Dr. John Smith Jr.", "prof. dr.", "john", "", "smith", "jr.", ""),
    ("Dr. Jane Roberts", "dr.", "jane", "", "roberts", "", ""),
    ("Dra. Ana Costa", "dra.", "ana", "", "costa", "", ""),
    ("Derek Banyard, MD, MSC", "", "derek", "", "banyard", "", ""),
    ("James (Jim) Brown", "", "james", "", "brown", "", "jim"),
    ("Mary Smith et al.", "", "mary", "", "smith", "", ""),
    ("Wilson2, Amy", "", "amy", "", "wilson", "", ""),
]


def _parse_all(spark, raws):
    df = spark.createDataFrame([(r,) for r in raws], ["raw_name"])
    parsed = parse_author_name(F.col("raw_name"))
    out = df.select(
        "raw_name", *(parsed[k].alias(k) for k in ("title", "first", "middle", "last", "suffix", "nickname"))
    )
    return {r["raw_name"]: r.asDict() for r in out.collect()}


def test_particle_cases_match_reference(spark):
    got = _parse_all(spark, [r for r, _ in PARTICLE_CASES])
    for raw, want_last in PARTICLE_CASES:
        assert got[raw]["last"] == want_last, (raw, got[raw])


def test_surname_first_initials_flip(spark):
    got = _parse_all(spark, [r for r, _, _ in V24_CASES])
    for raw, want_last, want_first in V24_CASES:
        assert got[raw]["last"] == want_last, (raw, got[raw])
        assert got[raw]["first"] == want_first, (raw, got[raw])


def test_title_suffix_credential_nickname_shapes(spark):
    got = _parse_all(spark, [c[0] for c in SHAPE_CASES])
    for raw, title, first, middle, last, suffix, nickname in SHAPE_CASES:
        row = got[raw]
        assert row["title"] == title, (raw, row)
        assert row["first"] == first, (raw, row)
        assert row["middle"] == middle, (raw, row)
        assert row["last"] == last, (raw, row)
        assert row["suffix"] == suffix, (raw, row)
        assert row["nickname"] == nickname, (raw, row)


def test_match_keys_strip_residual_punctuation(spark):
    df = spark.createDataFrame(
        [("Amanda Cooper-Sarkar",), ("Smith, J. D.",)], ["raw_name"]
    )
    parsed = parse_author_name(F.col("raw_name"))
    rows = {
        r["raw_name"]: r.asDict()
        for r in df.select(
            "raw_name",
            parsed["match_last"].alias("ml"),
            parsed["match_first"].alias("mf"),
            parsed["match_key"].alias("mk"),
        ).collect()
    }
    assert rows["Amanda Cooper-Sarkar"]["ml"] == "coopersarkar"
    assert rows["Amanda Cooper-Sarkar"]["mk"] == "coopersarkar;a"
    # "d." initials key as "d"; empty-first names key as 'last;'
    assert rows["Smith, J. D."]["mk"] == "smith;j"
