"""Semantic contracts for the round-5 pipeline operators.

Oracle parity proves Spark == DuckDB; these tests prove both == the
*intended semantics*, using hand-built inputs with known answers
(the reference's own test style: tiny fixtures, exact expectations —
SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openalex_walden_spark import queries as q

q.load_all()


# --------------------------------------------------------------------------
# Sequence packing
# --------------------------------------------------------------------------
def test_pack_sequences_conserves_tokens_and_respects_budget(spark, sf_dir):
    from openalex_walden_spark.queries.llmdata import _PACK_B

    out = q.CATALOG["pack_sequences_chunked"].spark(spark, sf_dir).cache()
    try:
        # Every bin except the last holds exactly B tokens (concat-and-
        # chunk leaves no slack), and no bin ever exceeds the budget.
        per_bin = (
            out.groupBy("bin_id").agg(F.sum("frag_tokens").alias("t")).collect()
        )
        last_bin = max(r["bin_id"] for r in per_bin)
        for r in per_bin:
            assert r["t"] <= _PACK_B
            if r["bin_id"] != last_bin:
                assert r["t"] == _PACK_B, f"bin {r['bin_id']} underfilled"

        # Token conservation: per-doc fragment sums equal the doc's
        # whitespace token count (no token lost or duplicated by splits).
        from openalex_walden_spark.tables import register_views

        register_views(spark, sf_dir, ("documents",))
        expected = (
            spark.table("documents")
            .select(
                "doc_id",
                F.size(
                    F.filter(
                        F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != ""
                    )
                ).cast("bigint").alias("n"),
            )
            .where(F.col("n") > 0)
        )
        got = out.groupBy("doc_id").agg(F.sum("frag_tokens").alias("n2"))
        bad = (
            expected.join(got, "doc_id", "full")
            .where(
                F.col("n").isNull()
                | F.col("n2").isNull()
                | (F.col("n") != F.col("n2"))
            )
            .count()
        )
        assert bad == 0

        # is_split marks exactly the docs appearing in >1 bin.
        multi = (
            out.groupBy("doc_id")
            .agg(
                F.countDistinct("bin_id").alias("nb"),
                F.max(F.col("is_split").cast("int")).alias("split"),
            )
            .where(
                ((F.col("nb") > 1) & (F.col("split") == 0))
                | ((F.col("nb") == 1) & (F.col("split") == 1))
            )
            .count()
        )
        assert multi == 0
    finally:
        out.unpersist()


# --------------------------------------------------------------------------
# Triangle counting on a hand-built graph
# --------------------------------------------------------------------------
def test_triangle_count_known_graph(spark):
    """K4 plus a pendant edge: K4 has exactly 4 triangles; the pendant
    adds wedges but no triangle. Checked against the same oriented
    wedge-join the operator uses, applied to an exact edge list."""
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)]
    df = spark.createDataFrame(edges, "u long, v long")
    deg = (
        df.select(F.col("u").alias("node"))
        .unionAll(df.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    okey = deg.select("node", (F.col("d") * 100 + F.col("node")).alias("k"))
    o = (
        df.join(okey.select(F.col("node").alias("u"), F.col("k").alias("ku")), "u")
        .join(okey.select(F.col("node").alias("v"), F.col("k").alias("kv")), "v")
        .select(
            F.when(F.col("ku") < F.col("kv"), F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(F.col("ku") < F.col("kv"), F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.greatest("ku", "kv").alias("dst_k"),
        )
    )
    w1 = o.select(F.col("src").alias("s"), F.col("dst").alias("b1"), F.col("dst_k").alias("k1"))
    w2 = o.select(F.col("src").alias("s"), F.col("dst").alias("b2"), F.col("dst_k").alias("k2"))
    closer = o.select(F.col("src").alias("b1"), F.col("dst").alias("b2"))
    tri = (
        w1.join(w2, "s")
        .where(F.col("k1") < F.col("k2"))
        .join(closer, ["b1", "b2"], "left_semi")
        .count()
    )
    assert tri == 4


# --------------------------------------------------------------------------
# k-means step sanity
# --------------------------------------------------------------------------
def test_kmeans_step_partitions_all_vectors(spark, sf_dir):
    out = q.CATALOG["kmeans_lloyd_step"].spark(spark, sf_dir).collect()
    from openalex_walden_spark.tables import register_views

    register_views(spark, sf_dir, ("embeddings",))
    n_vec = spark.table("embeddings").count()
    assert sum(r["n_members"] for r in out) == n_vec  # exhaustive partition
    assert all(r["inertia"] >= 0 and r["shift_l1_fp"] >= 0 for r in out)
    # Seeds are real vectors, so each seed's own cluster contains at
    # least the seed itself (distance 0 beats every tie-break).
    assert all(r["n_members"] >= 1 for r in out)


# --------------------------------------------------------------------------
# DSIR scoring sanity
# --------------------------------------------------------------------------
def test_dsir_scores_favor_target_marker_docs(spark, sf_dir):
    """Inject a token that exists only in the target slice: target-slice
    docs must then out-score the corpus median (their features include a
    maximally target-likely one)."""
    from openalex_walden_spark.queries.llmdata import (
        _DSIR_S,
        _DSIR_S2,
        _DSIR_V,
        _H_SPARK,
    )
    from openalex_walden_spark.tables import register_views

    register_views(spark, sf_dir, ("documents",))
    d = spark.table("documents").select(
        "doc_id",
        F.when(F.col("lang") == "en", F.concat(F.col("text"), F.lit(" tgtmarker")))
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
    )
    # The registered query would re-register the parquet view over this
    # doctored frame, so score it inline with the operator's exact
    # arithmetic instead.
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
    feat = d.select("doc_id", "lang", F.explode(toks).alias("t")).select(
        "doc_id", "lang", (F.expr(_H_SPARK.format(x="t")) % _DSIR_V).alias("f")
    )
    counts = feat.groupBy("f").agg(
        F.count("*").cast("bigint").alias("raw_cnt"),
        F.count(F.when(F.col("lang") == "en", 1)).cast("bigint").alias("tgt_cnt"),
    )
    tot = counts.agg(
        F.sum("raw_cnt").cast("bigint").alias("raw_tot"),
        F.sum("tgt_cnt").cast("bigint").alias("tgt_tot"),
    )
    wt = counts.crossJoin(F.broadcast(tot)).select(
        "f",
        F.expr(
            f"(({_DSIR_S} * (tgt_cnt + 1)) div (raw_cnt + 1))"
            f" * (({_DSIR_S2} * (raw_tot + {_DSIR_V})) div (tgt_tot + {_DSIR_V}))"
            f" div {_DSIR_S2}"
        ).alias("w"),
    )
    scored = (
        feat.join(F.broadcast(wt), "f")
        .groupBy("doc_id")
        .agg(F.expr("sum(w) div count(*)").cast("bigint").alias("score_fp"))
        .join(d.select("doc_id", "lang"), "doc_id")
        .collect()
    )
    en = sorted(r["score_fp"] for r in scored if r["lang"] == "en")
    rest = sorted(r["score_fp"] for r in scored if r["lang"] != "en")
    assert en and rest
    assert en[len(en) // 2] > rest[len(rest) // 2]  # median en > median rest
    # Restore the pristine view for any later test sharing this session.
    register_views(spark, sf_dir, ("documents",))


# --------------------------------------------------------------------------
# Isotonic PAVA contracts — supplementary to the hash-checked DuckDB
# minimax oracle (fit_isotonic_pava, round 7): structural invariants the
# hash alone doesn't name.
# --------------------------------------------------------------------------
def test_pava_monotone_mass_conserving_and_matches_reference(spark, sf_dir):
    out = (
        q.CATALOG["fit_isotonic_pava"].spark(spark, sf_dir)
        .toPandas()
        .sort_values(["user_id", "ts_us"])
    )
    assert len(out) > 0
    for uid, g in out.groupby("user_id"):
        fit = g["y_fit"].to_numpy()
        # 1. Non-decreasing within each key.
        assert (fit[1:] >= fit[:-1] - 1e-12).all(), f"user {uid} not monotone"
        # 2. Mass conservation: PAVA pools preserve the mean exactly.
        assert abs(fit.mean() - g["y"].to_numpy().mean()) < 1e-9
    # 3. Matches an independent reference implementation on one key.
    uid = out["user_id"].iloc[0]
    g = out[out["user_id"] == uid]
    y = g["y"].tolist()
    ref, stack = [], []
    for v in y:
        lv, w = float(v), 1.0
        while stack and stack[-1][0] > lv:
            pl, pw = stack.pop()
            lv = (pl * pw + lv * w) / (pw + w)
            w += pw
        stack.append((lv, w))
    for lv, w in stack:
        ref.extend([lv] * int(w))
    assert max(abs(a - b) for a, b in zip(g["y_fit"].tolist(), ref)) < 1e-9


# --------------------------------------------------------------------------
# Trained-IVF contracts: the quantizer must actually earn its recall
# --------------------------------------------------------------------------
def test_trained_ivf_recall_floor(spark, sf_dir):
    """The round-5 audit measured ~0.07 recall@3 for label-routed
    1-probe IVF; the trained quantizer + multi-probe routing exists to
    fix that. Pin the floor the verdict demands: recall@3 >= 0.9."""
    out = q.CATALOG["ann_recall_audit"].spark(spark, sf_dir).toPandas()
    assert len(out) > 0
    recall = out["n_hits_at_3"].sum() / (3.0 * len(out))
    assert recall >= 0.9, f"trained-IVF audited recall@3 {recall:.3f} < 0.9"


def test_trained_centroids_are_a_fixed_point(spark, sf_dir):
    """Convergence contract: one more integer Lloyd step from the
    trained centroids must reproduce them exactly (sum div n of each
    cell's members equals the stored centroid) — i.e. training really
    ran to its fixed point, not just T arbitrary rounds."""
    from pyspark.sql import functions as F

    from openalex_walden_spark.queries.advanced import (
        _TR_ARGMIN,
        _TR_CACHE,
        _tr_cent_array,
        _tr_quantized,
        train_ivf_centroids,
    )
    from openalex_walden_spark.tables import register_views

    register_views(spark, sf_dir, ("embeddings",))
    _TR_CACHE.clear()
    cents = train_ivf_centroids(spark, sf_dir)
    pts = _tr_quantized(spark)
    sums = (
        pts.withColumn("cents", _tr_cent_array(cents))
        .select(F.expr(_TR_ARGMIN)["cl"].alias("cell"), "qx")
        .select("cell", F.posexplode("qx").alias("dim0", "qv"))
        .groupBy("cell", "dim0")
        .agg(F.sum("qv").alias("sq"), F.count("*").alias("n"))
        .collect()
    )
    stepped = [list(c) for c in cents]
    for r in sums:
        stepped[r["cell"]][r["dim0"]] = int(r["sq"]) // int(r["n"])
    assert stepped == cents, "one more Lloyd step moved the centroids"


# --------------------------------------------------------------------------
# Density overmerge detection: known-overmerged fixture
# --------------------------------------------------------------------------
def test_density_split_flags_known_overmerge(spark):
    """Hand-built profiles with known answers (the reference's gold-set
    calibration shape, HdbscanOvermergeDetection.ipynb): a clean
    profile = 1 density cluster, an overmerged (two-person) profile =
    2 clusters, an incoherent profile = all noise."""
    from openalex_walden_spark.operators.density import density_split_stats

    def blob(center, n, spread):
        # deterministic jitter: point j offsets dim d by ((j*7+d) % spread)
        return [
            [center[d] + ((j * 7 + d) % spread) for d in range(len(center))]
            for j in range(n)
        ]

    rows = []
    pid = 0
    # grp 1: one tight blob of 10 -> 1 cluster
    for x in blob([0, 0, 0, 0], 10, 3):
        rows.append((1, pid, x)); pid += 1
    # grp 2: two tight blobs of 6, far apart -> 2 clusters
    for x in blob([0, 0, 0, 0], 6, 3) + blob([1000, 1000, 1000, 1000], 6, 3):
        rows.append((2, pid, x)); pid += 1
    # grp 3: 5 mutually distant points -> all noise
    for j in range(5):
        rows.append((3, pid, [j * 5000, j * 3000, 0, 0])); pid += 1
    pts = spark.createDataFrame(rows, "grp int, id int, qx array<bigint>")
    out = {
        r["grp"]: r
        for r in density_split_stats(
            pts, eps2=100, k_core=3, min_cluster_size=3
        ).collect()
    }
    assert out[1]["n_clusters"] == 1 and out[1]["largest_sz"] == 10
    assert out[1]["n_noise"] == 0
    assert out[2]["n_clusters"] == 2
    assert out[2]["largest_sz"] == 6 and out[2]["second_sz"] == 6
    assert out[3]["n_clusters"] == 0 and out[3]["n_noise"] == 5


def test_density_split_small_group_has_no_core_pairs(spark):
    """A group with <= k_core points (every point has < k_core
    neighbours) must produce ZERO clusters even when all its pairwise
    distances are inside eps — the k-th-neighbour core distance is
    undefined there, and both the pre-r14 inner joins and the DuckDB
    oracle's `WHERE rn = k_core` CTE drop such pairs.  Regression pin
    for the r14 window rewrite: `greatest` SKIPS null arguments in
    Spark, so without the explicit isNotNull guards a tight 3-point
    group would wrongly form a cluster (reachable shape even though no
    committed fixture currently produces a group that small)."""
    from openalex_walden_spark.operators.density import density_split_stats

    rows = [
        # grp 1: three coincident points — all pair d2 = 0 <= eps2,
        # but only 2 neighbours each < k_core=3 -> no core -> no edges
        (1, 0, [0, 0, 0, 0]),
        (1, 1, [0, 0, 0, 0]),
        (1, 2, [0, 0, 0, 0]),
        # grp 2: four tight points (3 neighbours each = k_core) -> the
        # core distance exists and the cluster forms — the boundary case
        (2, 3, [0, 0, 0, 0]),
        (2, 4, [1, 0, 0, 0]),
        (2, 5, [0, 1, 0, 0]),
        (2, 6, [1, 1, 0, 0]),
    ]
    pts = spark.createDataFrame(rows, "grp int, id int, qx array<bigint>")
    out = {
        r["grp"]: r
        for r in density_split_stats(
            pts, eps2=100, k_core=3, min_cluster_size=3
        ).collect()
    }
    assert out[1]["n_clusters"] == 0 and out[1]["n_noise"] == 3
    assert out[2]["n_clusters"] == 1 and out[2]["largest_sz"] == 4


def test_density_split_caps_oversized_profile_pair_fanout(spark):
    """Hot-key guard contract (round-6 review): a profile far above
    ``max_group_size`` must be down-sampled BEFORE the quadratic stage,
    so pair fan-out per group is bounded at cap*(cap-1)/2 no matter how
    skewed the input — one 100k-member profile must never put 5e9 pairs
    in a single task.  The sample is deterministic and engine-portable
    (Knuth multiplicative hash of the id), so repeated runs agree."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from openalex_walden_spark.operators.density import (
        density_split_stats,
        sample_order_key,
    )

    cap = 64
    n_big = 2000
    # one oversized profile (two far-apart blobs so clusters survive the
    # sample) + one small control profile
    rows = [
        (7, j, [((j % 2) * 100000) + (j % 5), (j * 3) % 7, 0, 0])
        for j in range(n_big)
    ] + [(8, 10_000 + j, [j, j, 0, 0]) for j in range(5)]
    pts = spark.createDataFrame(rows, "grp int, id int, qx array<bigint>")

    # The sampled point set the operator works on is bounded per group.
    sampled = (
        pts.withColumn(
            "srn",
            F.row_number().over(
                Window.partitionBy("grp").orderBy(
                    sample_order_key(F.col("id")).asc(), F.col("id").asc()
                )
            ),
        )
        .where(F.col("srn") <= cap)
        .groupBy("grp")
        .count()
        .collect()
    )
    assert all(r["count"] <= cap for r in sampled)

    out = {
        r["grp"]: r
        for r in density_split_stats(
            pts, eps2=200, k_core=3, min_cluster_size=3, max_group_size=cap
        ).collect()
    }
    # capped group: stats describe exactly cap sampled members, and the
    # pair stage saw at most cap*(cap-1)/2 pairs (n_points bounds it)
    assert out[7]["n_points"] == cap
    assert out[7]["n_clusters"] == 2  # both blobs survive the sample
    assert out[8]["n_points"] == 5  # under the cap: untouched
    # deterministic: a second run returns the identical stats
    out2 = {
        r["grp"]: r
        for r in density_split_stats(
            pts, eps2=200, k_core=3, min_cluster_size=3, max_group_size=cap
        ).collect()
    }
    assert out == out2


def test_density_split_key_guard_and_big_id_safety(spark):
    """Composite-key safety (round-6 advice): with the sampling window
    ON (default), ids are remapped to dense per-group ranks, so point
    ids >= the 1e7 key base are handled correctly (stats are invariant
    to relabeling); with the window OFF, the in-plan assert fails the
    job loudly instead of silently merging two groups' components."""
    import pytest

    from openalex_walden_spark.operators.density import (
        _KEY_BASE,
        density_split_stats,
    )

    small = [(1, j, [j % 3, 0, 0, 0]) for j in range(6)]
    big_ids = [(1, _KEY_BASE * 5 + j, [j % 3, 0, 0, 0]) for j in range(6)]
    pts_small = spark.createDataFrame(small, "grp int, id long, qx array<bigint>")
    pts_big = spark.createDataFrame(big_ids, "grp int, id long, qx array<bigint>")

    ref = density_split_stats(
        pts_small, eps2=10, k_core=3, min_cluster_size=3
    ).collect()
    got = density_split_stats(
        pts_big, eps2=10, k_core=3, min_cluster_size=3
    ).collect()
    assert [r.asDict() for r in ref] == [r.asDict() for r in got]

    with pytest.raises(Exception, match="density_split_stats"):
        density_split_stats(
            pts_big, eps2=10, k_core=3, min_cluster_size=3, max_group_size=None
        ).collect()


# --------------------------------------------------------------------------
# Chunking: overlap consistency and lossless reconstruction
# --------------------------------------------------------------------------
def test_chunking_is_lossless_and_overlap_consistent(spark, sf_dir):
    """Every document must be exactly reconstructible from its chunks
    (drop the first W-S overlap chars of every chunk after the first),
    and consecutive chunks must agree on their shared overlap."""
    from openalex_walden_spark.queries.llmdata import _CHUNK_S, _CHUNK_W

    out = (
        q.CATALOG["chunk_documents_overlap"].spark(spark, sf_dir)
        .toPandas()
        .sort_values(["doc_id", "chunk_id"])
    )
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.table("documents").select("doc_id", "text").collect()
        if r["text"]
    }
    overlap = _CHUNK_W - _CHUNK_S
    assert set(out.doc_id) == set(docs)
    for doc_id, g in out.groupby("doc_id"):
        chunks = g.sort_values("chunk_id")["chunk"].tolist()
        stitched = chunks[0] + "".join(c[overlap:] for c in chunks[1:])
        assert stitched == docs[doc_id], f"doc {doc_id} not reconstructible"
        for prev, cur in zip(chunks, chunks[1:]):
            assert prev[_CHUNK_S:] == cur[: len(prev) - _CHUNK_S], (
                f"doc {doc_id}: chunk overlap mismatch"
            )


def test_sample_order_key_is_overflow_safe_for_huge_ids(spark):
    """Round-7 ADVICE: a raw id*A overflows BIGINT for ids >= ~3.47e9
    (real OpenAlex-scale ids exceed this) — ANSI Spark and DuckDB would
    throw, non-ANSI Spark would wrap to negative keys.  The mod-2^31
    pre-reduction must keep the arithmetic exact and engine-portable at
    any id magnitude."""
    import duckdb

    from pyspark.sql import functions as F

    from openalex_walden_spark.operators.density import (
        _HASH_A,
        _HASH_M,
        _HASH_R,
        sample_order_key,
    )

    ids = [0, 1, 5, 2**31 - 1, 2**31, 3_470_000_000, 2**33 + 5, 10**15 + 7]
    df = spark.createDataFrame([(i,) for i in ids], "id bigint")
    got = dict(
        df.withColumn("k", sample_order_key(F.col("id")))
        .withColumn(
            # ANSI-mode evaluation of the same expression: throws on
            # overflow instead of wrapping, so a wrap cannot hide.
            "k_ansi",
            F.expr(f"((id % {_HASH_R}) * {_HASH_A}L) % {_HASH_M}L"),
        )
        .select("id", "k", "k_ansi")
        .rdd.map(lambda r: (r["id"], (r["k"], r["k_ansi"])))
        .collect()
    )
    con = duckdb.connect()
    for i in ids:
        duck = con.sql(
            f"SELECT ((({i}::BIGINT % {_HASH_R}) * {_HASH_A}) % {_HASH_M})::BIGINT"
        ).fetchone()[0]
        k, k_ansi = got[i]
        assert k == k_ansi == duck >= 0, (i, k, k_ansi, duck)
