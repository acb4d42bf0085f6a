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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from openalex_walden_spark.operators.components import connected_components

# Composite node key: group * _KEY_BASE + point id keeps the component
# search a single flat graph while edges never cross groups.
_KEY_BASE = 10_000_000


def density_split_stats(
    pts: DataFrame,
    eps2: int,
    k_core: int = 4,
    min_cluster_size: int = 3,
    grp: str = "grp",
    pid: str = "id",
    qx: str = "qx",
) -> DataFrame:
    """Per-group density-cluster statistics over integer-quantized
    vectors.

    ``pts``: one row per point — (grp, id, qx: array<bigint>), id <
    _KEY_BASE and unique within its group.  ``eps2``: squared linkage
    threshold (same fixed-point scale as the quantized coordinates).

    Returns one row per group: (grp, n_points, n_clusters, n_noise,
    largest_sz, second_sz) — integer-exact, so the output hashes
    identically in any engine.  The reference's noise_frac /
    largest_cluster_frac are these counts over n_points.
    """
    p = pts.select(
        F.col(grp).alias("g"), F.col(pid).alias("i"), F.col(qx).alias("x")
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
    sym = pairs.select("g", F.col("ia").alias("src"), F.col("ib").alias("dst"), "d2").unionByName(
        pairs.select("g", F.col("ib").alias("src"), F.col("ia").alias("dst"), "d2")
    )
    wk = Window.partitionBy("g", "src").orderBy(F.col("d2").asc(), F.col("dst").asc())
    core = (
        sym.withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") == k_core)
        .select("g", F.col("src").alias("i"), F.col("d2").alias("core2"))
    )
    edges = (
        pairs.join(
            core.select(F.col("g").alias("g"), F.col("i").alias("ia"), F.col("core2").alias("ca")),
            ["g", "ia"],
        )
        .join(
            core.select(F.col("g").alias("g"), F.col("i").alias("ib"), F.col("core2").alias("cb")),
            ["g", "ib"],
        )
        .where(F.greatest("d2", "ca", "cb") <= F.lit(eps2))
        .select(
            (F.col("g") * _KEY_BASE + F.col("ia")).alias("src"),
            (F.col("g") * _KEY_BASE + F.col("ib")).alias("dst"),
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
