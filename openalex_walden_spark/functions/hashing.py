"""Deterministic hashing primitives.

The reference uses ``xxhash64`` for content hashes and ordering tie-breaks
(SURVEY.md §2.8, §4 "Determinism engineering"). For oracle-verifiable
determinism this engine standardizes on an md5-derived 60-bit hash, because
md5 is bit-identical across Spark, DuckDB, and Python — xxhash64 is Spark-only.
``xxhash64`` remains available for internal-only tie-breaks where no oracle
comparison is needed (it is ~3x faster).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_hash64(col: Column) -> Column:
    """60-bit non-negative BIGINT hash, engine-portable.

    Spark:  cast(conv(substr(md5(x),1,15),16,10) as bigint)
    DuckDB: ('0x' || substr(md5(x),1,15))::BIGINT
    Both yield the same integer for the same UTF-8 input.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def stable_hash64_sql(expr: str) -> str:
    """Spark-SQL text form of stable_hash64 for use inside SQL strings."""
    return f"cast(conv(substr(md5({expr}), 1, 15), 16, 10) as bigint)"


def stable_hash64_duckdb(expr: str) -> str:
    """DuckDB text form of stable_hash64 (for oracle queries)."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def content_hash(*cols: Column) -> Column:
    """Row content hash for change detection (D9).

    The reference gates ``updated_date`` churn on
    ``xxhash64(concat_ws('|', <fields>))`` (``CreateWorksEnriched.ipynb``
    cells 22-24). Same shape; NULLs are folded to a sentinel so that
    NULL→'x' transitions change the hash.
    """
    sentinel = F.lit("null")
    parts = [F.coalesce(c.cast("string"), sentinel) for c in cols]
    return F.xxhash64(F.concat_ws("|", *parts))


def minhash_signature(tokens: Column, num_hashes: int = 16) -> Column:
    """MinHash signature (array<bigint>) over a token array.

    Permutation family: h_i(t) = stable_hash64(concat(i, ':', t)) — portable
    to the DuckDB oracle. Input should be a distinct token array.
    """
    sigs = []
    for i in range(num_hashes):
        hashed = F.transform(
            tokens, lambda t, i=i: stable_hash64(F.concat(F.lit(f"{i}:"), t))
        )
        sigs.append(F.array_min(hashed))
    return F.array(*sigs)
