"""Round-11 verdict fixes (VERDICT r10 "Next round" #1, #2, #5).

1. ``large_dim`` closure is built AS A DATAFRAME (iterative edges
   self-join, ``engine._distributed_closure_df``) — ``commit()`` stays
   O(members + edges) on the driver, and a >=1M-member dimension commits
   within a bounded wall.  A differential pins DataFrame-closure ==
   driver-closure (exact, bit-for-bit) on multi-parent weighted DAGs.
2. ALL member-frame joins route through ``engine._members_side``: a View
   / labeled Area / by-name load over a ``large_dim`` dimension contains
   no broadcast of the members frame.
5. The driver closure/level/cycle walks are iterative — a ~5000-deep
   chain (legal inside the member envelope) commits without
   RecursionError.
"""

import random
import sys
import time

import pytest
from pyspark.sql import functions as F

from tinyolap_spark import engine
from tinyolap_spark.metadata import Dimension, DimensionEditError


# ------------------------------------------------ 1. distributed closure
def _random_dag_dimension(seed, large):
    """Multi-parent weighted DAG (same generator family as
    test_closure_fuzz): members only parent members with a smaller
    index, so acyclic by construction; weights include negatives and
    fractions so the weight-merge semantics are actually exercised."""
    rng = random.Random(seed)
    n = rng.randint(6, 24)
    d = Dimension(f"r11fuzz{seed}_{int(large)}", large_dim=large).edit()
    names = [f"m{i}" for i in range(n)]
    for name in names:
        d.add_many(name)
    weights_pool = [1.0, 1.0, 0.5, -1.0, 0.25, 2.0, 1.5]
    for i in range(1, n):
        for p in rng.sample(range(i), k=min(i, rng.randint(1, 3))):
            d.add_many(names[p], [names[i]], [rng.choice(weights_pool)])
    d.commit()
    return d


@pytest.mark.parametrize("seed", range(8))
def test_distributed_closure_matches_driver_closure(spark, seed):
    """The DataFrame closure build must equal the driver walk EXACTLY —
    same rows, bit-for-bit weights (the build multiplies leaf-up in the
    driver walk's association order, and last-DFS-path-wins is encoded
    as max_by over the child-position path key)."""
    big = _random_dag_dimension(seed, large=True)
    ref = _random_dag_dimension(seed, large=False)
    assert big._closure == []  # commit deferred the driver walk
    got = {
        (r["member_id"], r["ancestor_id"]): r["weight"]
        for r in engine.closure_df(spark, big).collect()
    }
    want = {(m, a): w for (m, a, w) in ref.closure_rows}
    assert got == want, seed  # exact — no approx


def test_large_dim_commit_defers_closure_and_lazy_fallback():
    d = Dimension("defer", large_dim=True).edit()
    d.add_many("all", ["a", "b", "c"], [1.0, 2.0, -1.0])
    d.commit()
    assert d._closure == []
    # the driver fallback (rule interference checks need Python rows)
    rows = {(m, a): w for (m, a, w) in d.closure_rows}
    top = d.member("all").index
    a, b, c = (d.member(x).index for x in "abc")
    assert rows[(a, top)] == 1.0
    assert rows[(b, top)] == 2.0
    assert rows[(c, top)] == -1.0
    # trivial-top elision stays OFF even after the lazy build, so the
    # engine's plan shape cannot flip mid-session
    assert d._trivial_tops == set()


def test_closure_checkpoint_blocks_freed_on_clear(spark):
    """The checkpointed large_dim closure must be reclaimable
    deterministically (unpersist is a no-op for checkpoint blocks — the
    backing JVM RDD is tracked and freed on clear_caches)."""

    def blocks():
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    engine.clear_caches()
    n0 = blocks()
    d = _random_dag_dimension(99, large=True)
    engine.closure_df(spark, d).count()
    assert blocks() > n0
    engine.clear_caches()
    assert blocks() == n0


@pytest.mark.slow
def test_million_member_large_dim_commits_bounded_and_rolls_up(spark):
    """VERDICT r10 #1 'done' bar: a >=1M-member synthetic dimension
    commits within a bounded wall (the closure walk is deferred — commit
    is cycle check + levels, both O(V+E) iterative), and a rollup
    through the DataFrame-built closure is numerically right."""
    from tinyolap_spark import Database

    d = Dimension("ids1m", large_dim=True).edit()
    per_group, ngroups = 1000, 1000
    t0 = time.time()
    for g in range(ngroups):
        d.add_many(
            f"g{g}", [f"k{g * per_group + i}" for i in range(per_group)]
        )
    d.add_many("All", [f"g{g}" for g in range(ngroups)])
    d.commit()
    commit_wall = time.time() - t0
    assert len(d) == ngroups * per_group + ngroups + 1
    assert d._closure == []  # the multiplicative walk did NOT run
    assert commit_wall < 120.0, commit_wall
    db = Database("m1", spark=spark)
    # build a 2-dim cube over it with a small fact written by member id
    meas = db.add_dimension("meas").edit()
    meas.add_many("value")
    meas.commit()
    cube = db.add_cube("c", [d, meas])
    vidx = meas.member("value").index
    fact = spark.createDataFrame(
        [(d.member(f"k{i}").index, vidx, float(i)) for i in range(2000)],
        schema="ids1m int, meas int, v double",
    )
    cube.load_dataframe(fact, value_col="v")
    assert cube.get(("All", "value")) == pytest.approx(
        sum(float(i) for i in range(2000))
    )
    assert cube.get(("g1", "value")) == pytest.approx(
        sum(float(i) for i in range(1000, 2000))
    )
    # VERDICT r11 #6: the invariant must hold AFTER the aggregated reads
    # too — r11's probe showed cube.get routing through _cond_agg_cells,
    # whose closure_rows read lazily re-ran the deferred driver walk
    assert d._closure == []
    engine.clear_caches()


# ------------------------------------ 2. members-frame join strategy
def _large_star(spark, name="ld11"):
    from tinyolap_spark import Database

    db = Database(name, spark=spark)
    keys = db.add_dimension("keys", large_dim=True).edit()
    for g in range(4):
        keys.add_many(f"g{g}", [f"k{g * 50 + i}" for i in range(50)])
    keys.add_many("All", [f"g{g}" for g in range(4)])
    keys.commit()
    meas = db.add_dimension("meas", large_dim=True).edit()
    meas.add_many("value")
    meas.commit()
    cube = db.add_cube("c", [keys, meas])
    cube.write_rows(
        [(f"k{i}", "value", float(i % 7) + 0.5) for i in range(200)]
    )
    return db, cube


def _assert_no_members_broadcast(plan: str):
    """No BroadcastHashJoin may touch a members-frame join key (the
    __id_/__k_ label-join aliases).  Tiny request frames elsewhere in
    the plan are free to broadcast — they scale with the QUERY, not the
    dimension."""
    for line in plan.splitlines():
        if "BroadcastHashJoin" in line:
            assert "__id_" not in line and "__k_" not in line, line


def test_view_over_large_dim_has_no_members_broadcast(spark):
    from tinyolap_spark.view import View

    db, cube = _large_star(spark, "ld11v")
    view = View(
        cube,
        rows=[("keys", ["g0", "g1", "All"])],
        columns=[("meas", ["value"])],
    )
    grid = view.to_df()
    grid.collect()
    plan = grid._jdf.queryExecution().executedPlan().toString()
    _assert_no_members_broadcast(plan)
    assert "ShuffledHashJoin" in plan
    # and the label join produced the right labels
    names = {r["keys_name"] for r in grid.collect()}
    assert "g0" in names or "All" in names


def test_area_to_df_over_large_dim_has_no_members_broadcast(spark):
    db, cube = _large_star(spark, "ld11a")
    df = cube.area("keys:g0").to_df(names=True)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    _assert_no_members_broadcast(plan)
    assert {r["keys"] for r in df.collect()} <= {f"k{i}" for i in range(50)}


def test_by_name_load_over_large_dim(spark):
    """cube.load_dataframe(by_name=True) routes name resolution through
    the members-side strategy and still resolves correctly."""
    db, cube = _large_star(spark, "ld11n")
    extra = spark.createDataFrame(
        [("k10", "value", 100.0), ("k11", "value", 200.0)],
        schema="keys string, meas string, v double",
    )
    before = cube.get(("g0", "value"))
    cube.load_dataframe(extra, value_col="v", by_name=True)
    got10 = cube.get(("k10", "value"))
    assert got10 == pytest.approx(100.0)
    assert cube.get(("g0", "value")) != before


def test_tinypandas_spark_df_over_large_dim_no_members_broadcast(spark):
    from tinyolap_spark.tinypandas import TinyPandas

    db, cube = _large_star(spark, "ld11p")
    df = TinyPandas.to_spark_df(cube)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    _assert_no_members_broadcast(plan)


# --------------------------------------- 5. iterative driver walks
def test_deep_chain_commits_without_recursion_error():
    """A ~5000-deep chain is legal inside the member envelope; the
    recursive cycle/level/closure walks RecursionError'd on it."""
    depth = 5000
    assert depth > sys.getrecursionlimit()
    d = Dimension("chain").edit()
    for i in range(depth - 1):
        d.add_many(f"n{i}", [f"n{i + 1}"])
    d.commit()
    assert d.member("n0").level == depth - 1
    rows = {(m, a): w for (m, a, w) in d.closure_rows}
    leaf = d.member(f"n{depth - 1}").index
    top = d.member("n0").index
    assert rows[(leaf, top)] == 1.0
    # closure: identity per member + one (leaf, ancestor) per ancestor
    assert len(rows) == depth + (depth - 1)


def test_deep_chain_cycle_detected_iteratively():
    d = Dimension("chaincycle").edit()
    depth = 3000
    for i in range(depth - 1):
        d.add_many(f"n{i}", [f"n{i + 1}"])
    d.add_many(f"n{depth - 1}", ["n0"])  # close the loop
    with pytest.raises(DimensionEditError, match="circular"):
        d.commit()


def test_deep_chain_large_dim_uses_driver_fallback(spark):
    """Depth beyond the join-round bound (height > 64) must not build an
    unanalyzable 1000-join plan — the engine falls back to the driver
    walk for the closure rows while keeping the shuffle-hash join-side
    strategy."""
    d = Dimension("deepld", large_dim=True).edit()
    depth = 200
    for i in range(depth - 1):
        d.add_many(f"n{i}", [f"n{i + 1}"])
    d.commit()
    rows = {
        (r["member_id"], r["ancestor_id"]): r["weight"]
        for r in engine.closure_df(spark, d).collect()
    }
    leaf = d.member(f"n{depth - 1}").index
    assert rows[(leaf, d.member("n0").index)] == 1.0
    assert len(rows) == depth + (depth - 1)


def test_from_dict_cyclic_input_raises_not_recurses():
    d = Dimension("ok").edit()
    d.add_many("p", ["c"])
    d.commit()
    doc = d.to_dict()
    # corrupt: make p a child of c as well
    by_name = {m["name"]: m for m in doc["members"]}
    pid, cid = by_name["p"]["id"], by_name["c"]["id"]
    by_name["p"]["parents"][str(cid)] = 1.0
    by_name["c"]["children"] = [pid]
    with pytest.raises(DimensionEditError, match="circular"):
        Dimension.from_dict(doc)


# ------------------------------------- 6. ANN quality contract (r10 #2)
def test_recall_curve_monotone_and_exact_at_ncells(spark):
    """The measured recall@k-vs-nprobe curve must be monotone
    nondecreasing and reach exactly 1.0 at nprobe == ncells (probing
    every cell IS brute force) — the quality contract the bench record
    publishes instead of a bare recall number."""
    import numpy as np

    from tinyolap_spark.pipeline import similarity

    rng = np.random.default_rng(7)
    rows, vid = [], 0
    centers = [(-10.0, 0.0), (10.0, 0.0), (0.0, 10.0), (0.0, -10.0)]
    for cx, cy in centers:
        for _ in range(200):
            v = rng.standard_normal(8) * 0.2
            v[0] += cx
            v[1] += cy
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = similarity.IVFIndex(df, ncells=4, sample=400, iters=4, seed=3)
    queries = [rows[0][1], rows[250][1], rows[450][1], rows[650][1]]
    curve = idx.recall_curve(queries, k=5)
    probes = sorted(curve)
    assert probes[-1] == 4  # always anchored at ncells
    vals = [curve[p] for p in probes]
    assert vals == sorted(vals), curve  # monotone nondecreasing
    assert vals[-1] == 1.0, curve  # exact at full probe
    # clustered data: the query's own cell already holds its neighbors
    assert curve[probes[0]] >= 0.8, curve
    nprobe, curve2 = idx.nprobe_for_recall(queries, target=1.0, k=5)
    assert curve2[nprobe] == 1.0
    assert nprobe == min(p for p in curve2 if curve2[p] >= 1.0)
    idx.assigned.unpersist()


# ------------------------- 4. size-aware gram-join strategy (sf10 probe)
def test_gram_join_strategy_flips_at_partition_budget(spark):
    """The shuffle_hash pin's build side cannot spill: past the
    per-partition row budget the strategy must flip to spillable
    sort-merge (the r11 sf10 probe OOM'd the pinned hash build at ~9M
    posting rows/partition), and re-engage hash on a well-partitioned
    cluster (the criterion is rows PER PARTITION)."""
    from tinyolap_spark.pipeline.dedup import (
        SHUFFLE_HASH_BUILD_ROWS_PER_PARTITION,
        gram_join_strategy,
    )

    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    budget = parts * SHUFFLE_HASH_BUILD_ROWS_PER_PARTITION
    assert gram_join_strategy(budget, spark) == "shuffle_hash"
    assert gram_join_strategy(budget + parts, spark) == "merge"
    # a cluster with 100x the partitions takes the same row count back
    # to the hash path
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts * 100))
        assert gram_join_strategy(budget + parts, spark) == "shuffle_hash"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_containment_small_scale_still_shuffle_hash(spark):
    """In-budget corpora keep the measured-faster hash plan."""
    from tinyolap_spark.pipeline import dedup

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta " + "x" * (i % 3))
         for i in range(30)],
        "doc_id long, text string",
    )
    # share_posts=False keeps the plan lazy (the default checkpoints the
    # result to a Scan ExistingRDD, hiding the join); the lazy path pins
    # shuffle_hash, and the persisted path's selection is covered by
    # test_gram_join_strategy_flips_at_partition_budget
    out = dedup.containment_pairs(docs, threshold=0.9, share_posts=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    # the doc-keyed result join may legitimately sort-merge; the GRAM-
    # keyed joins must not
    for line in plan.splitlines():
        if "SortMergeJoin" in line:
            assert "[g#" not in line, line
