"""Density-based cluster splitting (HDBSCAN-style overmerge detection).

The reference detects multi-person author profiles by running HDBSCAN on
each author's work embeddings and flagging profiles that fall apart into
2+ density clusters (notebooks/vector_search/HdbscanOvermergeDetection
.ipynb: per-author n_clusters / noise_frac / largest_cluster_frac, with
"n_clusters >= 2 predicts overmerge" as the calibrated signal).  The
reference implementation is a driver-side batch loop over sklearn — a
shape that cannot scale past its pre-staged gold set.  This operator is
the Spark-first replacement: ALL groups cluster in one distributed plan,
and the per-group math is the deterministic core of HDBSCAN:

1. **Core distance**: each point's distance to its k-th nearest
   neighbour within the group (density estimate).
2. **Mutual reachability**: d_mr(a,b) = max(d(a,b), core(a), core(b)) —
   the smoothing that makes single-linkage robust to noise (Campello
   et al., "Density-Based Clustering Based on Hierarchical Density
   Estimates", PAKDD 2013).
3. **Threshold linkage**: connect pairs with d_mr <= eps; connected
   components of that graph are the density clusters (= cutting the
   HDBSCAN hierarchy at one level — the deterministic, oracle-checkable
   fragment of the full hierarchy).
4. **Cluster stats**: components with >= min_cluster_size members are
   clusters; everything else is noise.

Determinism engineering: coordinates are integer-quantized by the
caller (floor(x * 2^16) — same convention as the IVF trainer), so every
pairwise distance, core distance, and mutual-reachability value is an
exact BIGINT and the component labels (min member key) are engine- and
retry-stable.

Scale shape: pairwise distances are blocked per group (an equi-join on
the group key — never an all-pairs across groups; the group is an
author profile, bounded by works-per-author); the k-NN is one window
over the per-group pair list; components reuse the O(log^2 n)
alternating-star operator.  At 100 TB the only heavy shuffle keys on
the group id — the same key the input is naturally clustered by.

Hot-key guard: the per-group stage is quadratic, so one pathological
100k-member profile would put 5e9 pairs in a single task.
``max_group_size`` bounds that: groups above the cap are down-sampled
to a deterministic, engine-portable subset (ordered by a Knuth
multiplicative hash of the point id — exact BIGINT arithmetic, so
DuckDB replays the identical sample) before the pairwise join, which
bounds pair fan-out per group at cap*(cap-1)/2 regardless of input
skew.  For capped groups every output stat (n_points included)
describes the sampled subset — the operator's contract is "density
stats over at most max_group_size representative members".  The O(n)
centroid-fit screen (queries/overmerge.py) composes IN FRONT of this
operator for the production path — see overmerge_screened_density.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from openalex_walden_spark.operators.components import connected_components

# Composite node key: group * _KEY_BASE + point id keeps the component
# search a single flat graph while edges never cross groups.
_KEY_BASE = 10_000_000

# Knuth multiplicative hash for the deterministic oversized-group
# sample: identical in every engine (no engine-native hash functions
# involved).  The id is reduced mod 2^31 BEFORE the multiply so the
# product stays <= (2^31-1) * A < 2^63 — exact BIGINT arithmetic for
# ANY non-negative id (a raw i*A overflows for i >= ~3.47e9: non-ANSI
# Spark wraps silently, ANSI Spark and DuckDB throw).
_HASH_A = 2_654_435_761
_HASH_M = 4_294_967_296  # 2^32
_HASH_R = 2_147_483_648  # 2^31 pre-reduction keeps i*A inside BIGINT


def sample_order_key(i: Column) -> Column:
    """Portable pseudo-random order key for down-sampling:
    ((i % 2^31) * A) % 2^32.  Requires i >= 0 (asserted in-plan by
    density_split_stats).  Ids >= 2^31 alias mod 2^31 for ORDERING
    only — the caller's explicit id tie-break keeps the sampled subset
    deterministic regardless."""
    return ((i % F.lit(_HASH_R)) * F.lit(_HASH_A)) % F.lit(_HASH_M)


def density_split_stats(
    pts: DataFrame,
    eps2: int,
    k_core: int = 4,
    min_cluster_size: int = 3,
    grp: str = "grp",
    pid: str = "id",
    qx: str = "qx",
    max_group_size: int | None = 1024,
) -> DataFrame:
    """Per-group density-cluster statistics over integer-quantized
    vectors.

    ``pts``: one row per point — (grp, id, qx: array<bigint>), id <
    _KEY_BASE and unique within its group.  ``eps2``: squared linkage
    threshold (same fixed-point scale as the quantized coordinates).
    ``max_group_size``: hot-key guard — groups larger than this are
    deterministically down-sampled before the quadratic stage (see
    module docstring); None disables the guard.

    Returns one row per group: (grp, n_points, n_clusters, n_noise,
    largest_sz, second_sz) — integer-exact, so the output hashes
    identically in any engine.  The reference's noise_frac /
    largest_cluster_frac are these counts over n_points.

    The composite-key precondition (grp >= 0; and, when the sampling
    window is disabled, 0 <= id < _KEY_BASE) is enforced in-plan via
    assert_true — a violating row fails the job instead of silently
    merging two groups' components (no extra scan: the check rides the
    projection the pipeline already does).  With the guard window ON
    (the default), point ids are remapped to their dense per-group
    sample rank, so the composite key is collision-free for ANY input
    id magnitude; every output stat is invariant to that relabeling
    (cluster sizes and k-th-neighbour distances depend only on the
    distance multiset, never on id values).
    """
    if max_group_size is not None:
        guard = F.assert_true(
            (F.col(grp) >= 0) & (F.col(pid) >= 0),
            F.lit(
                f"density_split_stats: requires {grp} >= 0 and {pid} >= 0 "
                "(sample_order_key is defined for non-negative ids)"
            ),
        )
    else:
        guard = F.assert_true(
            (F.col(pid) >= 0) & (F.col(pid) < _KEY_BASE) & (F.col(grp) >= 0),
            F.lit(
                f"density_split_stats: requires 0 <= {pid} < {_KEY_BASE} and "
                f"{grp} >= 0 (composite component key would collide)"
            ),
        )
    p = pts.select(
        # assert_true returns NULL after checking (or fails the task),
        # so the when() always takes the checked branch; wrapping the
        # group keeps the guard in the plan (an unused column would be
        # pruned by Catalyst).
        F.when(guard.isNull(), F.col(grp)).alias("g"),
        F.col(pid).alias("i"),
        F.col(qx).alias("x"),
    )
    if max_group_size is not None:
        wsamp = Window.partitionBy("g").orderBy(
            sample_order_key(F.col("i")).asc(), F.col("i").asc()
        )
        p = (
            p.withColumn("srn", F.row_number().over(wsamp))
            .where(F.col("srn") <= max_group_size)
            .select("g", F.col("srn").alias("i"), "x")
        )
    d2 = F.aggregate(
        F.zip_with(F.col("a.x"), F.col("b.x"), lambda u, v: (u - v) * (u - v)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    pairs = (
        p.alias("a")
        .join(
            p.alias("b"),
            (F.col("a.g") == F.col("b.g")) & (F.col("a.i") < F.col("b.i")),
        )
        .select(
            F.col("a.g").alias("g"),
            F.col("a.i").alias("ia"),
            F.col("b.i").alias("ib"),
            d2.alias("d2"),
        )
    )
    # The quadratic stage is computed EXACTLY ONCE (r14 optimization,
    # guide §2.4/§7.2): the old shape (sym = pairs UNION mirror(pairs);
    # edges = pairs ⋈ core ⋈ core) instantiated the pair join — and its
    # 64-element distance fold, the dominant compute — three times in
    # the physical plan (ReuseExchange dedupes the pre-join exchanges,
    # never the join + fold themselves).  Instead: mirror each pair
    # with a 2-element inline explode (map-side, no second join), then
    # derive core distances from ONE full-frame nth_value window — the
    # k-th smallest d2 per (g, src) IS that point's core distance.
    #
    # r15 (the one-window landing the r14 round prototyped): the second
    # full-frame window over (g, dst) is gone.  Because `sym` is
    # symmetric, the dst endpoint's core distance is the SAME per-point
    # value the (g, src) window already produced — so a (g, pt, c2)
    # core table grouped out of the window output (partition-local:
    # the g-hash partitioning satisfies the (g, pt) clustering) joins
    # it onto the eps-PRE-FILTERED candidate set.  What this deletes at
    # any scale is the full partition-local re-Sort of the mirrored
    # pair plane by (g, dst, d2, src) plus the second window pass (the
    # r14 plan had NO exchange between the windows — g-partitioning
    # satisfies both — so the cost was the sort+window, not a shuffle);
    # what it adds is a spillable scalar cache of the ranked pair plane
    # (persist_scalar: 5 bigint columns, MEMORY_AND_DISK — the cache is
    # WHY the window executes once: core and candidates are two
    # consumers of one subplan, and without materialization Catalyst
    # re-instantiates the pair join + fold per consumer) and a join
    # whose left side is only the pairs that already passed d2 <= eps2
    # AND ca <= eps2.  Interleaved A/B at sf0.1 (full query, min-of-4):
    # 8.07 s two-window vs 6.43 s one-window, bit-identical outputs.
    #
    # NULL semantics (unchanged from the hardened r14 filter): nth_value
    # is NULL for points with < k_core neighbours; candidates keep the
    # explicit ca isNotNull guard, and the dst side's isNotNull+greatest
    # guard becomes the INNER join against the NULL-filtered core table
    # — exactly the inner-join drop the old shape (and the DuckDB
    # oracle's `WHERE rn = k_core` CTE) applied.  With all three values
    # non-null, greatest(d2, ca, cb) <= eps2 decomposes into the three
    # per-value <= eps2 filters applied below.
    sym = pairs.select(
        "g",
        F.explode(
            F.array(
                F.struct(F.col("ia").alias("src"), F.col("ib").alias("dst")),
                F.struct(F.col("ib").alias("src"), F.col("ia").alias("dst")),
            )
        ).alias("e"),
        "d2",
    ).select("g", F.col("e.src").alias("src"), F.col("e.dst").alias("dst"), "d2")
    w_src = (
        Window.partitionBy("g", "src")
        .orderBy(F.col("d2").asc(), F.col("dst").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    from openalex_walden_spark.operators.guardrails import persist_scalar

    # session-owner release contract (see persist_scalar): the returned
    # plan reads this cache; bench/driver sweeps clearCache between runs
    ranked = persist_scalar(
        sym.withColumn("ca", F.nth_value("d2", k_core).over(w_src))
    )
    core = (
        ranked.groupBy("g", F.col("src").alias("pt"))
        .agg(F.min("ca").alias("c2"))
        .where(F.col("c2").isNotNull() & (F.col("c2") <= F.lit(eps2)))
    )
    cand = ranked.where(
        (F.col("src") < F.col("dst"))
        & (F.col("d2") <= F.lit(eps2))
        & F.col("ca").isNotNull()
        & (F.col("ca") <= F.lit(eps2))
    )
    edges = (
        cand.alias("cand")
        .join(
            core.alias("core"),
            (F.col("cand.g") == F.col("core.g"))
            & (F.col("cand.dst") == F.col("core.pt")),
        )
        .select(
            (F.col("cand.g") * _KEY_BASE + F.col("cand.src")).alias("src"),
            (F.col("cand.g") * _KEY_BASE + F.col("cand.dst")).alias("dst"),
        )
    )
    comp = connected_components(edges)  # (id, label): min member key
    sizes = (
        comp.groupBy(
            F.expr(f"id div {_KEY_BASE}").alias("g"), F.col("label")
        )
        .agg(F.count("*").cast("bigint").alias("sz"))
    )
    clusters = sizes.where(F.col("sz") >= min_cluster_size)
    wsz = Window.partitionBy("g").orderBy(F.col("sz").desc(), F.col("label").asc())
    per_grp = (
        clusters.withColumn("rk", F.row_number().over(wsz))
        .groupBy("g")
        .agg(
            F.count("*").cast("bigint").alias("n_clusters"),
            F.sum("sz").cast("bigint").alias("clustered"),
            F.max(F.when(F.col("rk") == 1, F.col("sz"))).alias("largest_sz"),
            F.max(F.when(F.col("rk") == 2, F.col("sz"))).alias("second_sz"),
        )
    )
    npts = p.groupBy(F.col("g")).agg(F.count("*").cast("bigint").alias("n_points"))
    return (
        npts.join(per_grp, "g", "left")
        .select(
            F.col("g").alias("grp"),
            "n_points",
            F.coalesce("n_clusters", F.lit(0)).cast("bigint").alias("n_clusters"),
            (F.col("n_points") - F.coalesce("clustered", F.lit(0)))
            .cast("bigint")
            .alias("n_noise"),
            F.coalesce("largest_sz", F.lit(0)).cast("bigint").alias("largest_sz"),
            F.coalesce("second_sz", F.lit(0)).cast("bigint").alias("second_sz"),
        )
    )
