"""DuckDB oracle harness: run CATALOG queries against DuckDB and compare.

This replicates the driver's correctness gate locally (row count + column
names + order-insensitive canonical value comparison) so blockers surface
in `pytest` instead of in the round report.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from dataclasses import dataclass, field

import duckdb

from openalex_walden_spark.tables import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh in-memory DuckDB with every test table registered as a view."""
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.sql(
                f"CREATE OR REPLACE VIEW {name} AS "
                f"SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon_value(v) -> str:
    """Canonical string for one cell, exact for floats (hex form)."""
    if v is None:
        return "NULL"
    # pandas NaN/NaT
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return float(v).hex()
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, _dt.datetime):
        s = v.isoformat(sep=" ")
        return s[:-9] if s.endswith(" 00:00:00") else s
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    # numpy arrays (DuckDB list columns) → python lists
    if getattr(v, "ndim", 0):
        return _canon_value(v.tolist())
    if isinstance(v, dict):
        items = sorted((str(k), _canon_value(x)) for k, x in v.items())
        return "{" + ",".join(f"{k}:{x}" for k, x in items) + "}"
    # numpy scalars → python
    item = getattr(v, "item", None)
    if item is not None:
        try:
            return _canon_value(item())
        except Exception:  # pragma: no cover
            pass
    if hasattr(v, "isoformat"):
        s = v.isoformat(sep=" ") if isinstance(v, _dt.datetime) else v.isoformat()
        return s
    return str(v)


def canonical_rows(df_pandas) -> list[tuple[str, ...]]:
    """Column-name-sorted, row-sorted canonical form of a pandas frame."""
    cols = sorted(df_pandas.columns)
    ordered = df_pandas[cols]
    rows = [
        tuple(_canon_value(v) for v in row)
        for row in ordered.itertuples(index=False, name=None)
    ]
    return sorted(rows)


def golden_hash(df_pandas, spark_schema=None) -> dict:
    """Order-insensitive content fingerprint of a result frame.

    The committed goldens file (``tests/goldens_sf0001.json``) pins one of
    these per catalog query; ``test_oracle_parity`` recomputes it on every
    run, so any output change — even one where the Spark query and its
    DuckDB oracle move together — fails loudly and must be acknowledged by
    regenerating the golden (``scripts/gen_goldens.py``), which in turn
    forces the query into ``_CHANGED_THIS_ROUND`` via the boundary-diff
    audit in ``tests/test_driver_window.py``.

    ``spark_schema`` (the DataFrame's ``.schema``) is hashed alongside the
    values: canonical value strings mask type drift (int 5 and string
    ``'5'`` both canonicalize to ``'5'``), so the Spark-side column types
    are pinned explicitly.
    """
    import hashlib

    cols = sorted(str(c) for c in df_pandas.columns)
    schema = (
        ",".join(
            sorted(f"{f.name}:{f.dataType.simpleString()}"
                   for f in spark_schema.fields)
        )
        if spark_schema is not None
        else ""
    )
    rows = canonical_rows(df_pandas)
    payload = "\x1d".join(
        [schema, "\x1f".join(cols)] + ["\x1f".join(r) for r in rows]
    )
    return {
        "rows": len(rows),
        "hash": hashlib.sha256(payload.encode("utf-8")).hexdigest(),
    }


@dataclass
class CompareResult:
    name: str
    rows_spark: int
    rows_oracle: int
    cols_spark: list[str]
    cols_oracle: list[str]
    match: bool
    mismatches: list[str] = field(default_factory=list)
    spark_golden: dict | None = None

    @property
    def summary(self) -> str:
        status = "OK " if self.match else "FAIL"
        return f"[{status}] {self.name}: {self.rows_spark} rows" + (
            "" if self.match else f" — {'; '.join(self.mismatches[:3])}"
        )


def compare(name: str, spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> CompareResult:
    spark_pd = spark_df.toPandas()
    duck_pd = con.sql(sql).df()
    res = CompareResult(
        name=name,
        rows_spark=len(spark_pd),
        rows_oracle=len(duck_pd),
        cols_spark=sorted(spark_pd.columns),
        cols_oracle=sorted(duck_pd.columns),
        match=True,
        spark_golden=golden_hash(spark_pd, spark_df.schema),
    )
    if res.rows_spark != res.rows_oracle:
        res.match = False
        res.mismatches.append(f"row count {res.rows_spark} != {res.rows_oracle}")
    if res.cols_spark != res.cols_oracle:
        res.match = False
        res.mismatches.append(f"columns {res.cols_spark} != {res.cols_oracle}")
        return res
    a = canonical_rows(spark_pd)
    b = canonical_rows(duck_pd)
    if a != b:
        res.match = False
        diffs = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
        for i in diffs[:3]:
            res.mismatches.append(f"row {i}: spark={a[i]} oracle={b[i]}")
        if len(a) != len(b):  # pragma: no cover - caught above normally
            res.mismatches.append("row multiset size diff")
    return res
