"""Data-layout operators: multi-dimensional clustering for data skipping.

The reference leans hard on Delta layout tuning — ``ZORDER BY`` /
``CLUSTER BY`` / ``CLUSTER BY AUTO`` plus ``dataSkippingNumIndexedCols``
(reference ``notebooks/end2end/CreateWorksBase.ipynb`` cell 2 lines
76-81, ``CreateLocationsMapped.sql:59-66,79-88``,
``notebooks/authors/CreateAuthors.ipynb`` cell 2) — because at ~500M
works the difference between a pruned and an unpruned scan is the whole
job. Stock Spark has no ZORDER statement, but the mechanism is plain
arithmetic: interleave the bits of the clustering dimensions into one
z-value, range-cluster on it, and the per-file min/max stats that parquet
readers already keep become tight on BOTH dimensions at once — which is
exactly what a skipping planner prunes with.

The operator below computes z-values with pure integer column
expressions (24 bit-interleave terms, whole-stage codegen'd), buckets
them, and emits the per-bucket min/max manifest — the artifact whose
tightness IS the measure of clustering quality. On a real cluster the
write path is ``df.repartitionByRange(n, "z").sortWithinPartitions("z")
.write.parquet(...)``; the manifest shape here is what that layout buys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openalex_walden_spark.queries.registry import register

_Z_BITS = 12
_Z_BUCKET_SHIFT = 14  # z in [0, 2^24); 2^14-wide buckets → ≤ 1024 buckets


def _interleave_expr(x: str, y: str, div: str) -> str:
    """Bit-interleave expression, identical arithmetic in both engines:
    ``div`` is the integer-division operator ('div' Spark, '//' DuckDB).
    z = Σ_i ((x >> i) & 1) · 4^i  +  ((y >> i) & 1) · 2·4^i
    written with div/% so no engine-specific bit operators appear."""
    terms = []
    for i in range(_Z_BITS):
        p, q = 1 << i, 1 << (2 * i)
        terms.append(f"(({x} {div} {p}) % 2) * {q}")
        terms.append(f"(({y} {div} {p}) % 2) * {2 * q}")
    return " + ".join(terms)


_ZX = "o_custkey % 4096"
_ZY_SPARK = "(year(o_orderdate) - 1992) * 366 + dayofyear(o_orderdate)"
_ZY_DUCK = "(EXTRACT(year FROM o_orderdate) - 1992) * 366 + EXTRACT(doy FROM o_orderdate)"

_ZORDER_SQL = f"""
WITH dims AS (
  SELECT o_orderkey, ({_ZX})::BIGINT AS x, ({_ZY_DUCK})::BIGINT AS y
  FROM orders
),
z AS (
  SELECT o_orderkey, x, y,
         ({_interleave_expr('x', 'y', '//')})::BIGINT AS zval
  FROM dims
)
SELECT (zval // {1 << _Z_BUCKET_SHIFT})::BIGINT AS bucket,
       COUNT(*)::BIGINT AS n_rows,
       MIN(x)::BIGINT AS x_min, MAX(x)::BIGINT AS x_max,
       MIN(y)::BIGINT AS y_min, MAX(y)::BIGINT AS y_max
FROM z GROUP BY zval // {1 << _Z_BUCKET_SHIFT}
"""


@register(
    "layout_zorder_stats",
    oracle=_ZORDER_SQL,
    tags=("layout", "zorder", "skipping"),
    tables=("orders",),
)
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering manifest over orders(custkey, orderdate):
    interleave 12 bits of each dimension into a z-value, bucket by
    z-range (a value-based bucket — deterministic with no global sort),
    and emit each bucket's (n_rows, min/max per dimension) — the
    data-skipping stats a pruned scan consults.  Because z-order is
    locality-preserving in BOTH dimensions, every bucket's min/max box
    is small on custkey AND date simultaneously; a single-column sort
    would make one box tight and leave the other spanning the full
    domain.

    Scale shape: the z-value is 24 codegen'd integer terms per row
    (map-side), and the manifest is one hash aggregate on the bucket id
    — map-side partials shrink it to bucket-count rows before the only
    shuffle.  The real write path at scale swaps the value-bucket for
    ``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` (one range
    exchange) and lets parquet row-group stats carry the manifest.
    """
    dims = spark.table("orders").select(
        "o_orderkey",
        F.expr(_ZX).cast("bigint").alias("x"),
        F.expr(_ZY_SPARK).cast("bigint").alias("y"),
    )
    z = dims.select(
        "o_orderkey",
        "x",
        "y",
        F.expr(_interleave_expr("x", "y", "div")).cast("bigint").alias("zval"),
    )
    return (
        z.groupBy(
            F.expr(f"zval div {1 << _Z_BUCKET_SHIFT}").cast("bigint").alias("bucket")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("x").cast("bigint").alias("x_min"),
            F.max("x").cast("bigint").alias("x_max"),
            F.min("y").cast("bigint").alias("y_min"),
            F.max("y").cast("bigint").alias("y_max"),
        )
    )
