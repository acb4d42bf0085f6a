"""Rule-by-rule audit of the D7 reference cascade port.

Parity (Spark CASE == DuckDB CASE) is the driver's job; these tests pin
the stronger claim that the golden corpus actually EXERCISES every rule:
trigger row i must fire rule i, not an earlier shadowing rule.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openalex_walden_spark.functions.typecascade import (
    CASCADE_RULES,
    FALLBACK,
    corpus,
    duck_case,
    spark_case,
)
from openalex_walden_spark.queries.typerules import _FIELDS


def _corpus_df(spark):
    rows = [tuple(r[f] for f in _FIELDS) for r in corpus()]
    schema = (
        "case_id int, title string, raw string, crtype string, host string,"
        " src string, cont string, abstract string, doiurl string,"
        " genre string, issue string, fp string, oatype string,"
        " ptl string, srctype string, nrefs int, single boolean,"
        " hasabs boolean, retr boolean, confabs boolean, confpap boolean,"
        " hasjournal boolean"
    )
    return (
        spark.createDataFrame(rows, schema)
        .withColumn("sc", F.concat_ws(" ", F.col("src"), F.col("cont")))
        .withColumn("titlert", F.expr("trim(TRAILING ' .' FROM title)"))
    )


def test_rule_count_meets_breadth_bar():
    # round-6 bar: the full reference cascade breadth (330 atomic rules)
    assert len(CASCADE_RULES) >= 330


def test_every_rule_fires_on_its_trigger_row(spark):
    df = _corpus_df(spark)
    cols = {f: F.col(f) for f in _FIELDS if f != "case_id"}
    cols["sc"] = F.col("sc")
    cols["titlert"] = F.col("titlert")
    fired = {
        r["case_id"]: r["rule"]
        for r in df.select(
            "case_id", spark_case(cols, emit_index=True).alias("rule")
        ).collect()
    }
    mismatches = {
        i: fired[i] for i in range(len(CASCADE_RULES)) if fired[i] != i
    }
    assert not mismatches, f"shadowed trigger rows (row->fired): {mismatches}"
    # The extra corpus row must fall through to the fallback.
    assert fired[len(CASCADE_RULES)] == -1


def test_duckdb_rule_indices_agree(duck):
    import duckdb  # noqa: F401

    from openalex_walden_spark.queries.typerules import _values_sql

    sql = f"""
    WITH corpus({", ".join(_FIELDS)}) AS (VALUES {_values_sql()}),
    feat AS (SELECT *, concat(src, ' ', cont) AS sc,
             rtrim(title, ' .') AS titlert FROM corpus)
    SELECT case_id, {duck_case(emit_index=True)} AS rule FROM feat
    """
    fired = {int(r[0]): int(r[1]) for r in duck.sql(sql).fetchall()}
    mismatches = {
        i: fired[i] for i in range(len(CASCADE_RULES)) if fired[i] != i
    }
    assert not mismatches, f"duckdb shadowed rows: {mismatches}"
    assert fired[len(CASCADE_RULES)] == -1


def test_known_classifications(spark):
    """Spot-check semantic outputs on hand-written rows (not triggers)."""
    cases = [
        ("retraction: luck and the making of x", "", "", 3, "retraction"),
        ("erratum to: deep learning", "", "", 10, "erratum"),
        ("letter to the editor regarding y", "", "", 2, "letter"),
        ("supplementary table 4 from z", "", "", 0, "supplementary-materials"),
        ("a study of cats", "journal-article", "", 12, FALLBACK),
        ("a study of dogs", "info:eu-repo/semantics/doctoralthesis", "", 0, "dissertation"),
        ("profound results", "dataset", "", 0, "dataset"),
    ]
    df = spark.createDataFrame(
        [(i, t, r, c, n) for i, (t, r, c, n, _) in enumerate(cases)],
        "case_id int, title string, raw string, crtype string, nrefs int",
    )
    cols = {
        "title": F.col("title"), "raw": F.col("raw"),
        "crtype": F.col("crtype"), "nrefs": F.col("nrefs"),
        "titlert": F.expr("trim(TRAILING ' .' FROM title)"),
        "host": F.lit(""), "src": F.lit(""), "cont": F.lit(""),
        "sc": F.lit(""), "abstract": F.lit(""), "doiurl": F.lit(""),
        "genre": F.lit(""), "issue": F.lit(""), "fp": F.lit(""),
        "oatype": F.lit(""), "ptl": F.lit(""), "srctype": F.lit(""),
        "single": F.lit(False), "hasabs": F.lit(True),
        "retr": F.lit(False), "confabs": F.lit(False),
        "confpap": F.lit(False), "hasjournal": F.lit(False),
    }
    got = {
        r["case_id"]: r["work_type"]
        for r in df.select("case_id", spark_case(cols).alias("work_type")).collect()
    }
    for i, (_, _, _, _, want) in enumerate(cases):
        assert got[i] == want, f"case {i}: got {got[i]}, want {want}"
