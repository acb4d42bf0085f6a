"""Catalog-wide DuckDB parity: the local mirror of the driver's gate.

Every CATALOG entry with an oracle must match DuckDB exactly (row count,
column names, canonical values) at sf0.001. Entries without an oracle must
at least execute and return a stable schema.
"""

from __future__ import annotations

import pytest

from openalex_walden_spark import queries as q
from openalex_walden_spark.oracle import compare

q.load_all()

_WITH_ORACLE = sorted(name for name, s in q.CATALOG.items() if s.oracle)
_ROWS_ONLY = sorted(name for name, s in q.CATALOG.items() if not s.oracle)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(name, spark, sf_dir, duck):
    spec = q.CATALOG[name]
    res = compare(name, spec.spark(spark, sf_dir), duck, spec.oracle)
    assert res.match, res.summary


def test_rows_only_bucket_stays_empty():
    """Every catalog query has a DuckDB oracle (the PAVA fit was the
    last rows-only entry, upgraded in round 7 via its minimax
    characterization).  Enforce the invariant so a future oracle-less
    entry is an explicit decision, not a silent downgrade."""
    assert _ROWS_ONLY == [], (
        f"queries without oracles appeared: {_ROWS_ONLY}"
    )


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    names = set(e.queries())
    oracles = e.oracle_sql()
    assert names, "queries() is empty"
    assert set(oracles) <= names
