"""Fixed-point PageRank run to exact convergence.

The round-5 query unrolled 3 supersteps — a demo of the plan shape, not
the operator (a real centrality signal is the converged vector).  This
module is the real loop, with the same discipline as
``operators/components.py``:

- **Integer state.** Scores are BIGINT fixed-point (1.0 == 10^12);
  contributions are exact integer divisions and integer sums commute, so
  every engine, partitioning, and retry produces bit-identical scores —
  which is what makes "exact convergence" a well-defined stop condition
  AND lets a SQL oracle replay the whole loop as unrolled CTEs (extra
  iterations past the fixed point are no-ops).
- **Bounded lineage.** The edge⋈degree plane is localCheckpoint'ed
  once; the score table is localCheckpoint'ed every ``check_every``
  rounds, so the live plan never exceeds a constant number of joins no
  matter how many rounds run.  check_every also bounds the
  re-execution that broadcasting an un-materialized score chain costs
  (a broadcast runs its child plan independently), measured fastest at
  2 on the bench fixture.
- **O(1) driver state.** Convergence is detected from a one-row score
  fingerprint (sum of per-row hashes), never by collecting scores.
- **Cycle-safe early stop.** The loop checks every ``check_every``
  rounds and caps at ``max_rounds`` — a multiple of ``check_every`` —
  so even if the integer dynamics fell into a short cycle instead of a
  fixed point, the early-stopped state equals the state after exactly
  ``max_rounds`` rounds (period divides the check interval, and the cap
  is congruent to every checkpointed round).  The unrolled oracle runs
  ``max_rounds`` iterations unconditionally; both sides agree in every
  case.

Scale shape per superstep: one equi-join edges ⋈ scores on src (scores
is |V| rows — broadcast when small, shuffle-partitioned by src when
not) plus one dst-keyed partial aggregate.  Dangling-node mass is
dropped (standard simplification); damping d is applied as
(num * x) // den.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .checkpoints import SESSION_SCOPE_LOCK, CheckpointJanitor

PR_ONE = 1_000_000_000_000  # fixed-point 1.0


def _score_fingerprint(scores: DataFrame) -> int:
    """Order-insensitive one-row fingerprint of the score table (same
    pattern as components._edge_fingerprint: decimal sum of xxhash64,
    because the session's ANSI mode raises on BIGINT sum overflow)."""
    row = scores.select(
        F.coalesce(
            F.sum(F.xxhash64(F.col("node"), F.col("score")).cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
        F.count("*").alias("n"),
    ).first()
    return hash((str(row["h"]), row["n"]))


def pagerank_fixedpoint(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping_num: int = 85,
    damping_den: int = 100,
    max_rounds: int = 44,
    check_every: int = 2,
    broadcast_scores: bool = False,
    adaptive: bool = False,
    superstep_partitions: int | None = None,
) -> DataFrame:
    """Run integer PageRank to its exact fixed point (capped at
    ``max_rounds``).  Returns ``(node, score)`` with BIGINT fixed-point
    scores (PR_ONE == 1.0).

    Plan choice (r13, the graph_pagerank_fixedpoint perf-weak fix):
    the default is SHUFFLE-JOIN supersteps over edges hash-partitioned
    on src ONCE at setup (LogicalRDD preserves the partitioning across
    the localCheckpoint), so per round only the |V|-row score table and
    the partial-aggregated inmass move — the classic Pregel plan, and
    the right one at every scale: the edge plane never re-shuffles, and
    unlike a broadcast the scores are not re-shipped to every executor
    each round.  ``broadcast_scores=True`` keeps the old plan (scores
    broadcast into the edge join) for node tables small enough that the
    per-round broadcast beats a |V|-row exchange on a real cluster.

    ``adaptive``/``superstep_partitions`` scope two session configs to
    the loop (restored in a finally):  AQE materializes EVERY exchange
    of every superstep as its own job, and with the cardinalities known
    and constant (|V| rows per round) its runtime re-planning buys
    nothing while multiplying scheduling latency — the r13 job-count
    A/B measured 82 jobs / 10.8s (AQE on, broadcast) vs 32 jobs / 6.5s
    (AQE off, shuffle, 8 partitions) on identical output
    (scripts/ab_pagerank_jobs.py, fingerprints bit-identical).  Pass
    ``superstep_partitions`` sized so |V| / partitions rows fit a task
    comfortably; None leaves the session value untouched.  The scoped
    value also governs the ONE-TIME edge setup (distinct/degree/
    repartition), so for a huge edge plane either leave it None or
    pre-shape the edges upstream before calling this.
    """
    if max_rounds % check_every:
        raise ValueError("max_rounds must be a multiple of check_every")
    spark = edges.sparkSession
    saved: dict[str, str] = {}

    def _scope(key: str, value: str) -> None:
        saved[key] = spark.conf.get(key)
        spark.conf.set(key, value)

    # Session confs are session-GLOBAL: the scope/restore below is only
    # sound while no concurrent query shares this SparkSession, so the
    # whole call serializes on SESSION_SCOPE_LOCK (which the checkpoint
    # janitor's id attribution also relies on).  The repo's driver and
    # bench are sequential; concurrent callers queue here instead of
    # racing the conf mutation.
    SESSION_SCOPE_LOCK.acquire()
    jan = CheckpointJanitor(spark)
    keep: set[str] = set()
    try:
        if not adaptive:
            _scope("spark.sql.adaptive.enabled", "false")
        if superstep_partitions is not None:
            _scope("spark.sql.shuffle.partitions", str(superstep_partitions))

        e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        # One materialization of the (possibly expensive) edge lineage;
        # every superstep reuses it.
        e = e.localCheckpoint()
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
            .localCheckpoint()
        )
        outdeg = e.groupBy("src").agg(F.count("*").alias("d"))
        # The per-edge contribution denominator is static: join it ONCE
        # and checkpoint, so no superstep repeats the degree join.  In
        # the shuffle-join plan (broadcast_scores=False) the checkpoint
        # is taken AFTER hash-partitioning on src: LogicalRDD preserves
        # the output partitioning, so every superstep's edges-side
        # shuffle is elided — only the |V|-row score table moves per
        # round.
        ed = e.join(outdeg, "src")
        if not broadcast_scores:
            ed = ed.repartition(F.col("src"))
        ed = ed.localCheckpoint()
        jan.mark("setup")

        base = (PR_ONE * (damping_den - damping_num)) // damping_den
        scores = nodes.select(
            "node", F.lit(PR_ONE).cast("bigint").alias("score")
        )
        prev_fp = None
        round_tag = "setup"
        for rnd in range(max_rounds // check_every):
            for _ in range(check_every):
                scores = _superstep(
                    ed, nodes, scores, base, damping_num, damping_den,
                    broadcast_scores,
                )
            # Lazy checkpoint: the fingerprint action materializes it —
            # one job per check instead of two.
            scores = scores.localCheckpoint(eager=False)
            fp = _score_fingerprint(scores)
            round_tag = f"round-{rnd}"
            jan.mark(round_tag)
            if fp == prev_fp:
                break
            prev_fp = fp
        # The returned DataFrame is the final (already-materialized)
        # checkpoint: its lineage is truncated to its own blocks, so the
        # setup plane and every earlier round can be released now.
        keep = {round_tag}
        return scores
    finally:
        jan.release(keep=keep)
        for key, value in saved.items():
            spark.conf.set(key, value)
        SESSION_SCOPE_LOCK.release()


def _superstep(
    ed: DataFrame,
    nodes: DataFrame,
    scores: DataFrame,
    base: int,
    damping_num: int,
    damping_den: int,
    broadcast_scores: bool = True,
) -> DataFrame:
    """One Pregel superstep: equi-join (edges⋈degree) ⋈ scores on src,
    dst-keyed partial aggregate, damped rebase over the node universe."""
    s = scores.withColumnRenamed("node", "src")
    if broadcast_scores:
        s = F.broadcast(s)
    inmass = (
        ed.join(s, "src")
        .select("dst", F.expr("score div d").alias("contrib"))
        .groupBy("dst")
        .agg(F.sum("contrib").alias("inmass"))
    )
    im = inmass.withColumnRenamed("dst", "node")
    if broadcast_scores:
        # inmass is |V| rows — broadcast it onto the node universe too,
        # so the rebase left join is also shuffle-free.
        im = F.broadcast(im)
    return nodes.join(im, "node", "left").select(
        "node",
        (
            F.lit(base)
            + F.expr(
                f"({damping_num} * coalesce(inmass, cast(0 as bigint)))"
                f" div {damping_den}"
            )
        )
        .cast("bigint")
        .alias("score"),
    )
