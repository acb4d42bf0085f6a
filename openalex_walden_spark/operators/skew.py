"""Skew-mitigation operators: salted aggregation and salted joins.

The reference hits skew in exactly two shapes — hot group keys (citation
counts: a handful of mega-cited works; author blocks: "j smith") and hot
join keys (blocking joins, `MatchAuthors.ipynb` cell 9). Its platform
hides the fix (Photon/AQE); an open engine needs the discipline
explicit, composable, and semantics-preserving:

- ``salted_agg``: two-stage aggregation — partial aggregate on
  (keys + salt), final on keys. The hot key's rows spread over
  ``salt_buckets`` reducers in stage 1; stage 2 combines
  ``salt_buckets`` partials per key, which is O(buckets), never O(rows).
- ``salted_join``: fact side salts deterministically on a high-entropy
  column; the dimension side replicates each row to every salt bucket
  (explode over ``sequence``). A hot fact key now lands on
  ``salt_buckets`` tasks instead of one. Dimension cost: ×buckets rows —
  use only when the dimension is too big to broadcast but small enough
  to replicate.

Both are deterministic (salt = xxhash64 of caller-chosen columns, never
rand()) so results stay oracle-checkable — the same discipline the
reference applies to every ordering (SURVEY.md §4 determinism).

AQE (`spark.sql.adaptive.skewJoin`) remains the first line of defense;
these operators are for the cases AQE can't see — skewed AGGREGATION
keys, and skew under a deterministic-plan requirement.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_cols: Sequence[str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {"count", "sum", "min", "max"} — the decomposable aggregates
    (partial and final combine are the same operator; count combines
    via sum). Non-decomposable aggregates don't belong here.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt_buckets))
    partial_exprs: list[Column] = []
    final_exprs: list[Column] = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(col).alias(out))
            final_exprs.append(F.sum(out).alias(out))
        elif fn in ("sum", "min", "max"):
            partial_exprs.append(getattr(F, fn)(col).alias(out))
            final_exprs.append(getattr(F, fn)(out).alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate: {fn}")
    partial = df.withColumn(_SALT, salt).groupBy(*keys, _SALT).agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_cols: Sequence[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the fact side, replicate the dimension.

    ``salt_cols`` must be fact columns with per-row entropy (a line
    number, a unique id) so a hot ``on`` key spreads evenly. The join
    key becomes (on, salt); the dimension explodes to all buckets.

    Only ``inner`` and ``left`` (fact-preserving) joins are correct
    under dimension replication: every unmatched dim row appears once
    per salt bucket, so right/full would emit it ``salt_buckets`` times
    and semi/anti from the fact side would still work but invert if the
    caller swaps sides. Anything else raises.
    """
    if how.lower().replace("_", "") not in ("inner", "left", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only (got {how!r}): "
            "the replicated dimension side would duplicate unmatched dim "
            "rows or invert semi/anti semantics"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt_buckets))
    f = fact.withColumn(_SALT, salt)
    d = dim.withColumn(
        _SALT,
        F.explode(
            F.sequence(
                F.lit(0).cast("long"), F.lit(salt_buckets - 1).cast("long")
            )
        ),
    )
    return f.join(d, [on, _SALT], how).drop(_SALT)
