"""Distributed probabilistic-sketch operators: HyperLogLog and Bloom filter.

Together with the count-min sketch (timeseries.py) these form the sketch
family a 100-TB pipeline needs for cheap cardinality / membership answers
without a full shuffle of the raw keys.  The reference's analogue is its
Guardrails metric rollups and dedup-rate dashboards
(`notebooks/end2end/Guardrails.ipynb` distinct-count cells) — recomputed
there with exact COUNT(DISTINCT); at 100 TB the sketch is the only shape
that keeps those dashboards incremental.

Both sketches are built RELATIONALLY from the engine-portable 60-bit
md5-prefix hash (functions/hashing.py) so the DuckDB oracle replays them
bit-for-bit:

- **HyperLogLog** (Flajolet et al. 2007): register index = h mod m,
  rank = leading-zero count of the remaining 51 bits.  The 2^-M register
  sum is folded in FIXED POINT (numerator over 2^52, exact BIGINT adds,
  order-independent) so the estimate is deterministic under Spark's
  nondeterministic partial-agg order.  Cost at scale: one map-side
  partial agg into (group, 512) registers, then a group-sized agg —
  the raw keys never shuffle.
- **Bloom filter** (Bloom 1970): k=4 positions per key, 62-bit words
  (bit 63 would overflow signed BIGINT in the oracle), built with a
  bit_or aggregate into a 256-row word table, probed via a broadcast
  join.  Zero false negatives by construction; the query surfaces the
  (bloom_maybe × truly_present) confusion matrix so the false-positive
  rate is observable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openalex_walden_spark.queries.llmdata import _H_DUCK, _H_SPARK
from openalex_walden_spark.queries.registry import register

# --------------------------------------------------------------------------
# HyperLogLog distinct l_partkey per (l_returnflag, l_linestatus)
# --------------------------------------------------------------------------
_HLL_P = 9
_HLL_M = 1 << _HLL_P  # 512 registers
# stable_hash64 yields 60 bits; after the 9 index bits, 51 remain.
_HLL_WBITS = 60 - _HLL_P
_HLL_FIX = 1 << (_HLL_WBITS + 1)  # fixed-point denominator 2^52
# alpha_m * m^2 * 2^52 — one shared Python-formatted literal so both
# engines parse the identical double.
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)
_HLL_NUM = repr(_HLL_ALPHA * _HLL_M * _HLL_M * _HLL_FIX)

_HLL_SQL = f"""
WITH hashed AS (
  SELECT l_returnflag, l_linestatus,
         {_H_DUCK.format(x="'pk:' || l_partkey::VARCHAR")} AS h
  FROM lineitem
),
rho AS (
  SELECT l_returnflag, l_linestatus, h % {_HLL_M} AS idx,
         CASE WHEN h // {_HLL_M} = 0 THEN {_HLL_WBITS + 1}
              ELSE {_HLL_WBITS + 1} - length(bin(h // {_HLL_M})) END AS r
  FROM hashed
),
regs AS (
  SELECT l_returnflag, l_linestatus, idx, MAX(r) AS m
  FROM rho GROUP BY l_returnflag, l_linestatus, idx
),
folded AS (
  SELECT l_returnflag, l_linestatus,
         COUNT(*) AS n_filled,
         SUM(1::BIGINT << ({_HLL_WBITS + 1} - m)) AS filled_num
  FROM regs GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus, CAST(n_filled AS BIGINT) AS n_filled,
       ROUND(
         CASE WHEN {_HLL_M} - n_filled > 0
                   AND {_HLL_NUM} / (filled_num + ({_HLL_M} - n_filled) * {_HLL_FIX})::DOUBLE
                       <= 2.5 * {_HLL_M}
              THEN {_HLL_M}.0 * ln({_HLL_M}.0 / ({_HLL_M} - n_filled))
              ELSE {_HLL_NUM} / (filled_num + ({_HLL_M} - n_filled) * {_HLL_FIX})::DOUBLE
         END, 2) AS hll_estimate
FROM folded
"""


@register(
    "sketch_hll_distinct",
    oracle=_HLL_SQL,
    tags=("sketch", "hll", "agg"),
    tables=("lineitem",),
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count of l_partkey per (returnflag, linestatus).

    Scale shape: rho is computed map-side, the first groupBy collapses to
    at most groups x 512 register rows (partial agg makes the shuffle
    register-sized, not key-sized), the second is group-sized.  The
    linear-counting small-range correction applies exactly when empty
    registers exist AND the raw estimate is under 2.5m (Flajolet's rule);
    the 2^-M sum is exact fixed-point so both branches of the CASE see
    bit-identical inputs in Spark and DuckDB.
    """
    li = spark.table("lineitem")
    h = F.expr(_H_SPARK.format(x="concat('pk:', cast(l_partkey as string))"))
    hashed = li.select("l_returnflag", "l_linestatus", h.alias("h"))
    rho = hashed.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("h") % _HLL_M).alias("idx"),
        F.when(F.expr(f"h div {_HLL_M}") == 0, F.lit(_HLL_WBITS + 1))
        .otherwise(
            F.lit(_HLL_WBITS + 1) - F.length(F.expr(f"bin(h div {_HLL_M})"))
        )
        .alias("r"),
    )
    regs = rho.groupBy("l_returnflag", "l_linestatus", "idx").agg(
        F.max("r").alias("m")
    )
    folded = regs.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_filled"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_HLL_WBITS + 1} - m)")).alias(
            "filled_num"
        ),
    )
    raw = F.lit(float(_HLL_NUM)) / (
        F.col("filled_num") + (F.lit(_HLL_M) - F.col("n_filled")) * F.lit(_HLL_FIX)
    ).cast("double")
    est = F.when(
        ((F.lit(_HLL_M) - F.col("n_filled")) > 0) & (raw <= 2.5 * _HLL_M),
        F.lit(float(_HLL_M))
        * F.log(F.lit(float(_HLL_M)) / (F.lit(_HLL_M) - F.col("n_filled"))),
    ).otherwise(raw)
    return folded.select(
        "l_returnflag",
        "l_linestatus",
        F.col("n_filled").cast("bigint").alias("n_filled"),
        F.round(est, 2).alias("hll_estimate"),
    )


# --------------------------------------------------------------------------
# Bloom filter over orders.o_custkey, probed with every customer
# --------------------------------------------------------------------------
_BLOOM_K = 4
_BLOOM_WORD = 62  # bits per word; bit 62/63 would overflow signed BIGINT
_BLOOM_WORDS = 256
_BLOOM_M = _BLOOM_WORD * _BLOOM_WORDS  # 15872 bits

_BLOOM_POS_DUCK = ", ".join(
    "({h}) % {m}".format(h=_H_DUCK.format(x=f"'b{i}:' || k::VARCHAR"), m=_BLOOM_M)
    for i in range(_BLOOM_K)
)

_BLOOM_SQL = f"""
WITH build_keys AS (
  SELECT o_custkey AS k FROM orders
  WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
),
build_pos AS (
  SELECT u.pos // {_BLOOM_WORD} AS word, u.pos % {_BLOOM_WORD} AS bit
  FROM build_keys b, UNNEST([{_BLOOM_POS_DUCK}]) AS u(pos)
),
words AS (
  SELECT word, bit_or(1::BIGINT << bit) AS val
  FROM build_pos GROUP BY word
),
probe_pos AS (
  SELECT c.c_custkey, u.pos // {_BLOOM_WORD} AS word, u.pos % {_BLOOM_WORD} AS bit
  FROM (SELECT c_custkey, c_custkey AS k FROM customer) c,
       UNNEST([{_BLOOM_POS_DUCK}]) AS u(pos)
),
probed AS (
  SELECT p.c_custkey,
         MIN((COALESCE(w.val, 0) >> p.bit) & 1) AS all_set
  FROM probe_pos p LEFT JOIN words w ON p.word = w.word
  GROUP BY p.c_custkey
),
truth AS (
  SELECT c_custkey,
         EXISTS (SELECT 1 FROM build_keys b WHERE b.k = c.c_custkey)
           AS truly_present
  FROM customer c
)
SELECT pr.all_set = 1 AS bloom_maybe, t.truly_present,
       COUNT(*) AS n_customers
FROM probed pr JOIN truth t ON pr.c_custkey = t.c_custkey
GROUP BY 1, 2
"""


def _bloom_positions(key_expr: str) -> list[F.Column]:
    """The k portable hash positions of a key (Spark side)."""
    return [
        F.expr(_H_SPARK.format(x=f"concat('b{i}:', cast({key_expr} as string))"))
        % _BLOOM_M
        for i in range(_BLOOM_K)
    ]


@register(
    "sketch_bloom_probe",
    oracle=_BLOOM_SQL,
    tags=("sketch", "bloom", "join"),
    tables=("orders", "customer"),
)
def sketch_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership: build over the custkeys of urgent
    finished orders (a selective subset, so the truth column is not
    degenerate), probe with every customer, report the
    (bloom_maybe x truly_present) confusion matrix.  The true-negative quadrant with bloom_maybe=true is the
    false-positive mass; (bloom_maybe=false, truly_present=true) is
    structurally empty — no false negatives.

    Scale shape: the filter itself is a 256-row word table (one bit_or
    aggregate over a map-side explode of k=4 positions — the raw key
    stream shuffles into at most 256 groups), then the probe is a
    broadcast join against that table.  This is exactly how a runtime
    bloom-join prunes a 100-TB probe side with a filter built from the
    small side.
    """
    build = (
        spark.table("orders")
        .where(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderstatus") == "F")
        )
        .select(F.col("o_custkey").alias("k"))
    )
    pos = F.explode(F.array(*_bloom_positions("k"))).alias("pos")
    build_pos = build.select(pos).select(
        (F.col("pos") / _BLOOM_WORD).cast("bigint").alias("word"),
        (F.col("pos") % _BLOOM_WORD).alias("bit"),
    )
    words = build_pos.groupBy("word").agg(
        F.expr("bit_or(shiftleft(cast(1 as bigint), cast(bit as int)))").alias("val")
    )

    cust = spark.table("customer").select("c_custkey", F.col("c_custkey").alias("k"))
    probe_pos = cust.select("c_custkey", pos).select(
        "c_custkey",
        (F.col("pos") / _BLOOM_WORD).cast("bigint").alias("word"),
        (F.col("pos") % _BLOOM_WORD).alias("bit"),
    )
    probed = (
        probe_pos.join(F.broadcast(words), "word", "left")
        .select(
            "c_custkey",
            F.expr(
                "(shiftright(coalesce(val, cast(0 as bigint)), cast(bit as int))) & 1"
            ).alias("set_bit"),
        )
        .groupBy("c_custkey")
        .agg(F.min("set_bit").alias("all_set"))
    )
    ordered_custs = (
        build.select(F.col("k").alias("c_custkey"))
        .distinct()
        .withColumn("has_order", F.lit(True))
    )
    flagged = (
        spark.table("customer")
        .select("c_custkey")
        .join(ordered_custs, "c_custkey", "left")
        .withColumn("truly_present", F.coalesce("has_order", F.lit(False)))
        .select("c_custkey", "truly_present")
    )
    return (
        probed.join(flagged, "c_custkey")
        .groupBy(
            (F.col("all_set") == 1).alias("bloom_maybe"),
            "truly_present",
        )
        .agg(F.count("*").alias("n_customers"))
    )


# --------------------------------------------------------------------------
# HLL register MERGE rollup: coarser grains from stored sketches alone
# --------------------------------------------------------------------------
_HLL_MERGE_SQL = f"""
WITH hashed AS (
  SELECT l_returnflag, l_linestatus,
         {_H_DUCK.format(x="'pk:' || l_partkey::VARCHAR")} AS h
  FROM lineitem
),
rho AS (
  SELECT l_returnflag, l_linestatus, h % {_HLL_M} AS idx,
         CASE WHEN h // {_HLL_M} = 0 THEN {_HLL_WBITS + 1}
              ELSE {_HLL_WBITS + 1} - length(bin(h // {_HLL_M})) END AS r
  FROM hashed
),
regs AS (
  SELECT l_returnflag, l_linestatus, idx, MAX(r) AS m
  FROM rho GROUP BY l_returnflag, l_linestatus, idx
),
merged AS (
  SELECT l_returnflag AS flag, idx, MAX(m) AS m
  FROM regs GROUP BY l_returnflag, idx
  UNION ALL
  SELECT '*' AS flag, idx, MAX(m) AS m
  FROM regs GROUP BY idx
),
folded AS (
  SELECT flag, COUNT(*) AS n_filled,
         SUM(1::BIGINT << ({_HLL_WBITS + 1} - m)) AS filled_num
  FROM merged GROUP BY flag
)
SELECT flag, CAST(n_filled AS BIGINT) AS n_filled,
       ROUND(
         CASE WHEN {_HLL_M} - n_filled > 0
                   AND {_HLL_NUM} / (filled_num + ({_HLL_M} - n_filled) * {_HLL_FIX})::DOUBLE
                       <= 2.5 * {_HLL_M}
              THEN {_HLL_M}.0 * ln({_HLL_M}.0 / ({_HLL_M} - n_filled))
              ELSE {_HLL_NUM} / (filled_num + ({_HLL_M} - n_filled) * {_HLL_FIX})::DOUBLE
         END, 2) AS hll_estimate
FROM folded
"""


@register(
    "sketch_hll_merge_rollup",
    oracle=_HLL_MERGE_SQL,
    tags=("sketch", "hll", "merge"),
    tables=("lineitem",),
)
def sketch_hll_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The property that makes sketches worth storing: MERGEABILITY.
    Build the fine-grain (returnflag, linestatus) register tables once,
    then roll them up to per-flag and global distinct estimates by
    MAX-merging REGISTERS — the raw keys are never touched again.  This
    is how a 100-TB deployment serves distinct-count dashboards at any
    grain: persist the fine-grain register table (groups x 512 rows,
    kilobytes), answer every coarser grain from it incrementally;
    re-scanning the fact table per grain (the exact-COUNT(DISTINCT)
    shape) is the thing this operator deletes.

    Estimates are the same fixed-point fold as ``sketch_hll_distinct``
    — merged registers feed bit-identical arithmetic in both engines.
    """
    li = spark.table("lineitem")
    h = F.expr(_H_SPARK.format(x="concat('pk:', cast(l_partkey as string))"))
    hashed = li.select("l_returnflag", "l_linestatus", h.alias("h"))
    rho = hashed.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("h") % _HLL_M).alias("idx"),
        F.when(F.expr(f"h div {_HLL_M}") == 0, F.lit(_HLL_WBITS + 1))
        .otherwise(
            F.lit(_HLL_WBITS + 1) - F.length(F.expr(f"bin(h div {_HLL_M})"))
        )
        .alias("r"),
    )
    # Deliberately NOT persist_scalar'd: Spark's cache manager matches
    # logically-identical subplans session-wide, so caching this regs
    # frame would silently substitute into sketch_hll_distinct's
    # identical build and change ITS pinned plan. The union below pays
    # one extra scan instead; the real deployment persists the register
    # table to STORAGE (that's the operator's whole premise), not to
    # executor cache.
    regs = rho.groupBy("l_returnflag", "l_linestatus", "idx").agg(
        F.max("r").alias("m")
    )
    merged = (
        regs.groupBy(F.col("l_returnflag").alias("flag"), "idx")
        .agg(F.max("m").alias("m"))
        .unionByName(
            regs.groupBy("idx")
            .agg(F.max("m").alias("m"))
            .select(F.lit("*").alias("flag"), "idx", "m")
        )
    )
    folded = merged.groupBy("flag").agg(
        F.count("*").alias("n_filled"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_HLL_WBITS + 1} - m)")).alias(
            "filled_num"
        ),
    )
    raw = F.lit(float(_HLL_NUM)) / (
        F.col("filled_num") + (F.lit(_HLL_M) - F.col("n_filled")) * F.lit(_HLL_FIX)
    ).cast("double")
    est = F.when(
        ((F.lit(_HLL_M) - F.col("n_filled")) > 0) & (raw <= 2.5 * _HLL_M),
        F.lit(float(_HLL_M))
        * F.log(F.lit(float(_HLL_M)) / (F.lit(_HLL_M) - F.col("n_filled"))),
    ).otherwise(raw)
    return folded.select(
        "flag",
        F.col("n_filled").cast("bigint").alias("n_filled"),
        F.round(est, 2).alias("hll_estimate"),
    )


# --------------------------------------------------------------------------
# Bloom-filter JOIN PRUNING (the runtime-filter / semi-join reduction)
# --------------------------------------------------------------------------
_BLOOM_POS_DUCK_L = ", ".join(
    "({h}) % {m}".format(h=_H_DUCK.format(x=f"'b{i}:' || k::VARCHAR"), m=_BLOOM_M)
    for i in range(_BLOOM_K)
)

_BLOOM_PRUNE_SQL = f"""
WITH build_keys AS (
  SELECT DISTINCT o_orderkey AS k FROM orders
  WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
),
build_pos AS (
  SELECT u.pos // {_BLOOM_WORD} AS word, u.pos % {_BLOOM_WORD} AS bit
  FROM build_keys b, UNNEST([{_BLOOM_POS_DUCK_L}]) AS u(pos)
),
words AS (
  SELECT word, bit_or(1::BIGINT << bit) AS val
  FROM build_pos GROUP BY word
),
probe AS (
  SELECT l.l_orderkey, l.l_quantity FROM (
    SELECT l_orderkey, l_quantity,
           MIN((COALESCE(w.val, 0) >> (u.pos % {_BLOOM_WORD})) & 1) AS all_set
    FROM (SELECT l_orderkey, l_orderkey AS k, l_quantity FROM lineitem) l,
         UNNEST([{_BLOOM_POS_DUCK_L}]) AS u(pos)
    LEFT JOIN words w ON w.word = u.pos // {_BLOOM_WORD}
    GROUP BY l_orderkey, l_quantity
  ) l WHERE all_set = 1
),
joined AS (
  SELECT p.l_orderkey, p.l_quantity
  FROM probe p JOIN build_keys b ON b.k = p.l_orderkey
)
SELECT (SELECT COUNT(*) FROM lineitem)::BIGINT AS n_probe_rows,
       (SELECT COUNT(*) FROM probe)::BIGINT AS n_after_bloom,
       (SELECT COUNT(*) FROM joined)::BIGINT AS n_joined,
       (SELECT CAST(SUM(l_quantity) AS BIGINT) FROM joined) AS sum_qty
"""


@register(
    "sketch_bloom_join_prune",
    oracle=_BLOOM_PRUNE_SQL,
    tags=("sketch", "bloom", "join", "runtime-filter"),
    tables=("orders", "lineitem"),
)
def sketch_bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter join pruning: build a Bloom filter on the small
    (filtered-orders) side's join keys, probe it MAP-SIDE on the fact
    scan, and only ship survivors into the exact join — the semi-join
    reduction every modern engine applies automatically (Spark's
    runtime row-level filtering, Trino's dynamic filtering) expressed
    as an explicit, portable operator.  The output quantifies the
    prune: probe rows → after-bloom rows → exactly-joined rows (the
    gap between the last two is the false-positive traffic the exact
    join absorbs).

    Scale shape: the word table is 256 rows (broadcast); the probe is
    k=4 hashes per fact row evaluated in the scan stage, so the fact
    table's shuffle volume drops to the filter's selectivity BEFORE
    the join exchange — at 100 TB that pre-shuffle drop, not the join
    algorithm, is the win.
    """
    o = spark.table("orders")
    build_keys = (
        o.where(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderstatus") == "F")
        )
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    build_pos = build_keys.select(
        F.explode(F.array(*_bloom_positions("k"))).alias("pos")
    ).select(
        (F.col("pos") / _BLOOM_WORD).cast("bigint").alias("word"),
        (F.col("pos") % _BLOOM_WORD).alias("bit"),
    )
    words = F.broadcast(
        build_pos.groupBy("word").agg(
            F.expr("bit_or(shiftleft(cast(1 as bigint), cast(bit as int)))").alias(
                "val"
            )
        )
    )
    li = spark.table("lineitem").select("l_orderkey", "l_quantity")
    n_probe = li.agg(F.count("*").cast("bigint").alias("n_probe_rows"))
    probe_pos = li.select(
        "l_orderkey",
        "l_quantity",
        F.explode(F.array(*_bloom_positions("l_orderkey"))).alias("pos"),
    )
    probed = (
        probe_pos.join(
            words, words.word == (F.col("pos") / _BLOOM_WORD).cast("bigint"), "left"
        )
        .select(
            "l_orderkey",
            "l_quantity",
            F.expr(
                f"(coalesce(val, cast(0 as bigint)) >> cast(pos % {_BLOOM_WORD} as int)) & 1"
            ).alias("bit_set"),
        )
        .groupBy("l_orderkey", "l_quantity")
        .agg(F.min("bit_set").alias("all_set"))
        .where(F.col("all_set") == 1)
        .select("l_orderkey", "l_quantity")
    )
    from openalex_walden_spark.operators.guardrails import persist_scalar

    probed = persist_scalar(probed)
    joined = probed.join(
        F.broadcast(build_keys), probed.l_orderkey == build_keys.k
    ).select("l_orderkey", "l_quantity")
    stats = (
        n_probe.crossJoin(
            F.broadcast(probed.agg(F.count("*").cast("bigint").alias("n_after_bloom")))
        )
        .crossJoin(
            F.broadcast(
                joined.agg(
                    F.count("*").cast("bigint").alias("n_joined"),
                    F.sum("l_quantity").cast("bigint").alias("sum_qty"),
                )
            )
        )
    )
    return stats.select("n_probe_rows", "n_after_bloom", "n_joined", "sum_qty")
