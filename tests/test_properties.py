"""Property-based tests (hypothesis) for the scalar contracts the oracle
can't sweep: arbitrary-unicode inputs, idempotency, and output invariants
that must hold for EVERY input, not just fixture rows.

These pin the engine's determinism discipline (SURVEY.md §4) at the
function level: normalization must be idempotent (re-normalizing output
is a no-op) and truncation must never emit invalid JSON — the two bug
classes the reference hit operationally (oxjob #608/#649 flapping; the
truncated-abstract JSON-validity smoke test in smoke_tests.ipynb).
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from openalex_walden_spark.functions.llm import _judge_one
from openalex_walden_spark.functions.udfs import _author_key_one

_SETTINGS = dict(
    max_examples=200,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(name=st.text(max_size=60))
@settings(**_SETTINGS)
def test_author_key_total_and_idempotent(name):
    """author_key never raises on any unicode input, and keying an
    already-keyed form keeps the same surname token."""
    key = _author_key_one(name)
    if key is not None:
        assert ";" in key
        last = key.split(";", 1)[0]
        assert last == last.lower()


@given(text=st.text(max_size=80))
@settings(**_SETTINGS)
def test_llm_judge_stub_total(text):
    """The stub judge is total and deterministic: same input, same
    verdict, confidence in [0, 1000)."""
    v1, c1 = _judge_one(text)
    v2, c2 = _judge_one(text)
    assert (v1, c1) == (v2, c2)
    assert v1 in ("ok", "flag") and 0 <= c1 < 1000


# Spark-side properties run one session-bound sweep instead of
# per-example Spark jobs (a Spark job per hypothesis example would be
# minutes of overhead): generate the corpus first, run ONE DataFrame
# pass, assert on all rows.


def test_truncate_json_always_valid_on_generated_corpus(spark):
    from pyspark.sql import functions as F

    from openalex_walden_spark.functions.arrays import inverted_index
    from openalex_walden_spark.functions.serving import truncate_inverted_index

    corpus = st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
        ),
        min_size=1,
        max_size=30,
    )
    samples = [corpus.example() for _ in range(25)]
    rows = [(" ".join(words),) for words in samples]
    df = spark.createDataFrame(rows, "t string").select(
        inverted_index(F.col("t")).alias("idx")
    )
    for budget in (16, 64, 256):
        out = df.select(
            truncate_inverted_index(F.col("idx"), budget).alias("j")
        ).collect()
        for r in out:
            if r["j"] is not None:
                json.loads(r["j"])  # must always parse
                assert len(r["j"].encode("utf-8")) <= max(budget, 2)


def test_normalize_doi_idempotent_on_generated_corpus(spark):
    from pyspark.sql import functions as F

    from openalex_walden_spark.functions.normalize import normalize_doi

    gen = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60
    )
    rows = [(gen.example(),) for _ in range(40)] + [
        ("https://doi.org/10.1234/ABC.def",),
        ("DOI:10.5555/x",),
    ]
    df = spark.createDataFrame(rows, "raw string")
    once = df.select(normalize_doi(F.col("raw")).alias("d1"))
    twice = once.select(
        F.col("d1"), normalize_doi(F.col("d1")).alias("d2")
    ).collect()
    for r in twice:
        assert r["d2"] == r["d1"]  # normalizing a normal form is a no-op


def test_award_key_idempotent_on_generated_corpus(spark):
    """award_key(award_key(x)) == award_key(x): the normal form is a
    fixed point (re-keying an already-normal key changes nothing)."""
    from openalex_walden_spark.functions.sql_udfs import create_sql_udfs

    create_sql_udfs(spark)
    # Seeded corpus (NOT hypothesis .example(), whose unseeded sampling
    # makes the suite nondeterministic): wide unicode incl. astral
    # planes, plus the structured edge cases.
    import random

    rng = random.Random(20260813)

    def rand_char() -> str:
        while True:
            c = rng.randint(32, 0x2FFFF)
            if not 0xD800 <= c <= 0xDFFF:  # skip surrogates
                return chr(c)

    rows = [
        ("".join(rand_char() for _ in range(rng.randint(0, 20))),)
        for _ in range(60)
    ] + [
        (" AWD - 0012345 ",), ("R01-GM000123",), ("abc",), ("",), (None,),
    ]
    df = spark.createDataFrame(rows, "raw string")
    df.createOrReplaceTempView("_award_prop")
    out = spark.sql(
        "SELECT raw, award_key(raw) AS k1, award_key(award_key(raw)) AS k2 "
        "FROM _award_prop"
    ).collect()
    for r in out:
        assert r["k2"] == r["k1"], repr(r["raw"])


@given(st.text(max_size=80))
@settings(max_examples=300, deadline=None)
def test_parse_human_name_total(name):
    """parse_human_name never raises and always returns two strings; the
    returned parts contain no comma and come from the input's tokens."""
    from openalex_walden_spark.functions.udfs import parse_human_name

    first, last = parse_human_name(name)
    assert isinstance(first, str) and isinstance(last, str)
    assert "," not in first and "," not in last
    toks = set((name or "").replace(",", " ").split())
    for part in (first, *last.split()):
        if part:
            assert part in toks


@given(st.sampled_from(["nih", "nsf", "erc", "ukri", "wellcome", "dod",
                        "nsfc", "dfg", "nserc", "snsf", "cihr", "fwf",
                        "isciii", "vr", "amed", "dhhs", "nhmrc", "hunan",
                        "zhejiang", "innovate_uk", "nihr", "generic"]),
       st.text(max_size=60))
@settings(max_examples=150, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_award_family_key_total_on_spark(spark_udfs, family, award):
    """award_family_key is total: any (family, string) yields NULL or a
    non-empty string, never an error."""
    out = spark_udfs.sql(
        "SELECT award_family_key(?, ?) AS k", args=[family, award]
    ).collect()[0]["k"]
    assert out is None or (isinstance(out, str) and out != "")


def test_award_key_totality_regressions(spark_udfs):
    """The two hypothesis-found award_key totality bugs, pinned as
    deterministic cases: a digit run longer than int64 must key (the
    BIGINT-cast zero strip overflowed), and a U+2028 line separator —
    kept by the ASCII-only whitespace strip, yet honored by Java's '$'
    — must not desynchronize the guard from the extraction (the old
    form cast '').  Plus the zero-run boundary semantics."""
    cases = {
        "99999999999999999999": "99999999999999999999",
        "a0012345678901234567890": "A12345678901234567890",
        "x5\u2028": "X5\u2028",
        "x\u20285": "X\u20285",
        "000": "0",
        "AWARD 000": "AWARD0",
        "awd - 0012345": "AWD12345",
    }
    for raw, want in cases.items():
        got = spark_udfs.sql(
            "SELECT award_key(?) AS k, award_family_key('generic', ?) AS f",
            args=[raw, raw],
        ).collect()[0]
        assert got["k"] == want, (raw, got["k"])
        assert got["f"] == want, (raw, got["f"])
