"""D2 stateful identity resolution across runs: adopt, mint, converge."""

from __future__ import annotations

from openalex_walden_spark.operators.identity import DEFAULT_ID_FLOOR, resolve_work_ids


def _records(spark, rows):
    return spark.createDataFrame(
        rows, "record_id string, doi string, pmid string, title_author string"
    )


KEYS = ["doi", "pmid", "title_author"]


def test_first_run_mints_one_id_per_entity(spark):
    recs = _records(
        spark,
        [
            ("r1", "10.1/a", None, "ta:alpha"),
            ("r2", "10.1/a", "p1", None),  # same doi as r1 → same new id
            ("r3", None, None, "ta:beta"),
        ],
    )
    asg, new_map = resolve_work_ids(spark, None, recs, KEYS)
    ids = {r["record_id"]: (r["work_id"], r["resolved_via"]) for r in asg.collect()}
    assert all(v == "minted" for _, v in ids.values())
    assert ids["r1"][0] == ids["r2"][0]  # shared strongest key → one mint
    assert ids["r3"][0] != ids["r1"][0]
    assert all(wid > DEFAULT_ID_FLOOR for wid, _ in ids.values())
    # The map now knows every key of every record, including r2's pmid.
    m = {(r["key_kind"], r["key_value"]): r["work_id"] for r in new_map.collect()}
    assert m[("pmid", "p1")] == ids["r2"][0]
    assert m[("title_author", "ta:alpha")] == ids["r1"][0]


def test_second_run_adopts_and_cascades(spark):
    run1 = _records(spark, [("r1", "10.1/a", "p1", "ta:alpha")])
    _, id_map = resolve_work_ids(spark, None, run1, KEYS)
    wid = id_map.collect()[0]["work_id"]

    run2 = _records(
        spark,
        [
            ("s1", "10.1/a", None, None),        # adopt via doi
            ("s2", None, "p1", None),            # adopt via pmid tier
            ("s3", None, None, "ta:alpha"),      # adopt via title_author tier
            ("s4", None, None, "ta:gamma"),      # genuinely new → mint
        ],
    )
    asg, new_map = resolve_work_ids(spark, id_map, run2, KEYS)
    got = {r["record_id"]: (r["work_id"], r["resolved_via"]) for r in asg.collect()}
    assert got["s1"] == (wid, "doi")
    assert got["s2"] == (wid, "pmid")
    assert got["s3"] == (wid, "title_author")
    assert got["s4"][1] == "minted" and got["s4"][0] > wid


def test_rerun_is_idempotent(spark):
    run1 = _records(
        spark, [("r1", "10.1/a", None, None), ("r2", None, "p2", None)]
    )
    asg1, map1 = resolve_work_ids(spark, None, run1, KEYS)
    asg2, map2 = resolve_work_ids(spark, map1, run1, KEYS)
    a1 = {r["record_id"]: r["work_id"] for r in asg1.collect()}
    a2 = {r["record_id"]: r["work_id"] for r in asg2.collect()}
    assert a1 == a2
    assert all(r["resolved_via"] != "minted" for r in asg2.collect())
    assert sorted(map1.collect()) == sorted(map2.collect())


def test_min_id_canonicalization_on_key_conflict(spark):
    """Two previously-separate identities joined by a bridging record
    canonicalize to the smaller id in the map (the reference's min-id
    rule for merge conflicts)."""
    run1 = _records(
        spark, [("r1", "10.1/a", None, None), ("r2", None, "p9", None)]
    )
    _, map1 = resolve_work_ids(spark, None, run1, KEYS)
    ids = {r["key_kind"]: r["work_id"] for r in map1.collect()}
    bridging = _records(spark, [("b1", "10.1/a", "p9", None)])
    _, map2 = resolve_work_ids(spark, map1, bridging, KEYS)
    m = {(r["key_kind"], r["key_value"]): r["work_id"] for r in map2.collect()}
    assert m[("doi", "10.1/a")] == m[("pmid", "p9")] == min(ids.values())


def test_mint_ids_dense_and_deterministic(spark):
    """assign_dense_ids == dense_rank over the global order, without the
    global window (ids are start+1..start+K in ascending key order)."""
    from openalex_walden_spark.operators.identity import assign_dense_ids

    keys = [f"k{i:04d}" for i in range(500)]
    df = spark.createDataFrame([(k,) for k in keys], "_mint_key string")
    out = assign_dense_ids(df, "_mint_key", 1000).collect()
    got = {r["_mint_key"]: r["_minted_id"] for r in out}
    want = {k: 1001 + i for i, k in enumerate(sorted(keys))}
    assert got == want


def test_mint_ids_plan_has_no_single_partition_sort(spark):
    """The scale claim: minting must never funnel all keys through one
    task — the ranking plan carries a range exchange, never Exchange
    SinglePartition (audited pre-checkpoint: assign_dense_ids pins the
    frame with localCheckpoint, which truncates the visible lineage)."""
    from openalex_walden_spark.operators.identity import (
        _ranked_keys,
        assign_dense_ids,
    )

    df = spark.createDataFrame([(f"k{i}",) for i in range(100)], "_mint_key string")
    plan = (
        _ranked_keys(df, "_mint_key")
        ._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    )
    assert "SinglePartition" not in plan
    assert "rangepartitioning" in plan.lower()
    out_plan = (
        assign_dense_ids(df, "_mint_key", 0)
        ._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    )
    assert "SinglePartition" not in out_plan


def test_mint_ids_empty_input(spark):
    from openalex_walden_spark.operators.identity import assign_dense_ids

    df = spark.createDataFrame([], "_mint_key string")
    assert assign_dense_ids(df, "_mint_key", 0).count() == 0
