"""Round-13 regression tests: the r12 ADVICE findings (from_dataframe
key normalization/trim, unknown-parent drift guard, pinned id bucket
count, ``is_under`` guided errors, corpus-gate compression headroom),
the size-aware engine join strategy (VERDICT r12 #3), and
``from_dataframe`` persistence through ``save()``/``open()`` (VERDICT
r12 #1/#2)."""

import pytest
from pyspark.sql import functions as F

from tinyolap_spark import Database, engine
from tinyolap_spark.metadata import (
    Dimension,
    DimensionScaleError,
    InvalidAddressError,
)


# ---------------------------------------------------------------------------
# ADVICE r12 (medium): _key parity — trim + lower on both sides
# ---------------------------------------------------------------------------


def test_from_dataframe_trims_names_and_parent_keys(spark):
    """A padded parent value (' g1 ') must resolve to the same stripped
    driver group as 'g1' (driver ``_key`` is strip().lower()), and the
    leaf NAME stores trimmed like the driver's ``_add_or_get``.  Before
    the fix the left join missed and the leaf silently vanished from
    every rollup."""
    src = spark.createDataFrame(
        [("a", " g1 "), ("b", "g1"), (" c ", "G1 ")],
        "leaf string, grp string",
    )
    d = Dimension.from_dataframe("trimdim", src, "leaf", parent_col="grp")
    # the three padded/case spellings collapse to ONE driver group
    assert len(d._defs) == 2  # top + g1
    leaves = {
        r["name"]: r["parent_id"]
        for r in engine._from_df_leaf_frame(spark, d).collect()
    }
    g1 = d.member("g1").index
    # every leaf resolved to g1 — no NULL parent_id, no silent drop
    assert leaves == {"a": g1, "b": g1, "c": g1}
    rows = {
        (r["member_id"], r["ancestor_id"])
        for r in engine.closure_df(spark, d).collect()
    }
    top = d.member("All").index
    mdf = {
        r["name"]: r["member_id"]
        for r in engine.members_df(spark, d).collect()
    }
    for n in ("a", "b", "c"):
        assert (mdf[n], top) in rows and (mdf[n], g1) in rows
    engine.clear_caches()


def test_from_dataframe_padded_leaf_hits_clash_guard(spark):
    """' All ' must not escape the leaf/upper name-clash guard (the
    guard compares driver keys, which are stripped)."""
    with pytest.raises(InvalidAddressError, match="collide"):
        Dimension.from_dataframe(
            "clash13",
            spark.createDataFrame([(" All ",)], "leaf string"),
            "leaf",
        )


def test_from_dataframe_unknown_parent_drift_raises(spark):
    """A parent name the upper hierarchy does not know leaves parent_id
    NULL after the join — the silent-drop failure mode.  Reachable only
    when the source frame drifts between the groups collect and the
    leaf build (non-deterministic source); simulate by swapping the
    source after construction and forcing a rebuild."""
    src = spark.createDataFrame(
        [("a", "g1"), ("b", "g2")], "leaf string, grp string"
    )
    d = Dimension.from_dataframe("drift", src, "leaf", parent_col="grp")
    engine.clear_caches()
    d._src["df"] = spark.createDataFrame(
        [("a", "g1"), ("b", "g999")], "leaf string, grp string"
    )
    with pytest.raises(InvalidAddressError, match="not in the upper"):
        engine._from_df_leaf_frame(spark, d)
    engine.clear_caches()


# ---------------------------------------------------------------------------
# ADVICE r12 (low): leaf-id bucket count pinned at construction
# ---------------------------------------------------------------------------


def test_from_dataframe_ids_stable_across_conf_change(spark):
    """clear_caches() + rebuild under a changed
    spark.sql.shuffle.partitions must reproduce the SAME leaf ids —
    fact frames loaded against the old ids keep them."""
    src = spark.range(300).select(
        F.concat(F.lit("k"), "id").alias("leaf"),
        F.concat(F.lit("g"), (F.col("id") % 5)).alias("grp"),
    )
    d = Dimension.from_dataframe("pin", src, "leaf", parent_col="grp")
    assert d._src["nparts"] == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    ids1 = {
        r["name"]: r["member_id"]
        for r in engine._from_df_leaf_frame(spark, d).collect()
    }
    engine.clear_caches()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(int(prev) * 4 + 1))
    try:
        ids2 = {
            r["name"]: r["member_id"]
            for r in engine._from_df_leaf_frame(spark, d).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        engine.clear_caches()
    assert ids1 == ids2


# ---------------------------------------------------------------------------
# ADVICE r12 (low): is_under guided error
# ---------------------------------------------------------------------------


def test_is_under_unknown_member_guided_error(spark):
    d = Dimension("plain").edit()
    d.add_many("All", ["a", "b"])
    d.commit()
    with pytest.raises(InvalidAddressError, match="driver graph"):
        d.is_under(10_000, d.member("All").index)
    src = spark.createDataFrame([("x", "g")], "leaf string, grp string")
    fd = Dimension.from_dataframe("fdf_iu", src, "leaf", parent_col="grp")
    leaf_id = engine._from_df_leaf_frame(spark, fd).collect()[0]["member_id"]
    with pytest.raises(InvalidAddressError, match="closure frame"):
        fd.is_under(leaf_id, fd.member("All").index)
    # identity short-circuit stays valid even for leaf ids
    assert fd.is_under(leaf_id, leaf_id)
    engine.clear_caches()


# ---------------------------------------------------------------------------
# ADVICE r12 (low): corpus gate carries compression headroom
# ---------------------------------------------------------------------------


def test_corpus_gate_mid_size_file_not_small(spark, tmp_path):
    """A parquet corpus between 2 and 8 MB on disk could decompress past
    the non-spillable hash budget (zstd text runs 3-5x) — it must NOT
    pass the small-corpus gate; a genuinely tiny corpus still does."""
    from tinyolap_spark.pipeline.dedup import corpus_is_small

    big = tmp_path / "mid.parquet"
    # incompressible payload so the on-disk size is predictable (~3.5MB)
    spark.range(7000).select(
        F.col("id").alias("doc_id"),
        F.sha2(F.concat(F.lit("x"), F.col("id").cast("string")), 512)
        .alias("h"),
    ).withColumn(
        "text",
        F.concat_ws(
            " ", *[F.sha2(F.concat(F.lit(i), F.col("h")), 512)
                   for i in range(4)]
        ),
    ).drop("h").coalesce(1).write.mode("overwrite").parquet(str(big))
    df = spark.read.parquet(str(big))
    sz = int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    assert sz > (2 << 20), f"fixture too small to exercise the gate: {sz}"
    assert not corpus_is_small(df)
    small = tmp_path / "small.parquet"
    spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.lit("tiny text").alias("text"),
    ).coalesce(1).write.mode("overwrite").parquet(str(small))
    assert corpus_is_small(spark.read.parquet(str(small)))


# ---------------------------------------------------------------------------
# VERDICT r12 #3: engine closure/members joins are size-aware
# ---------------------------------------------------------------------------


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _fdf_cube(spark, name, n=240, groups=4):
    """A from_dataframe large_dim cube with value = leaf ordinal."""
    src = spark.range(n).select(
        F.concat(F.lit("k"), "id").alias("leaf"),
        F.concat(F.lit("g"), (F.col("id") % groups)).alias("grp"),
    )
    db = Database(name, spark=spark)
    d = db.add_dimension_from_dataframe(
        "cust", src, "leaf", parent_col="grp", top="AllCust"
    )
    meas = db.add_dimension("meas").edit()
    meas.add_many("value")
    meas.commit()
    cube = db.add_cube("c", [d, meas])
    name_to_id = engine.members_df(spark, d).select(
        F.col("name").alias("__nm"),
        F.col("member_id").alias(cube._cols[0]),
    )
    fact = (
        src.select("leaf")
        .withColumn(
            "value",
            F.regexp_extract("leaf", r"k(\d+)", 1).cast("double"),
        )
        .join(name_to_id, F.col("leaf") == F.col("__nm"))
        .select(
            cube._cols[0],
            F.lit(meas.member("value").index).alias(cube._cols[1]),
            "value",
        )
        # cut the one-time load lineage: the by-name id resolution join
        # would otherwise appear inside the cached fact's
        # InMemoryRelation text and trip the no-broadcast plan asserts
        # (which are about QUERY plans, not the load)
        .localCheckpoint(eager=True)
    )
    cube.load_dataframe(fact, assume_unique=True)
    return db, d, cube


def _rollup_grid(spark, d, cube):
    anc = [m.index for m in d.members_by_level(1)] + [
        d.member("AllCust").index
    ]
    axes = {
        cube._cols[0]: anc,
        cube._cols[1]: [cube.dimensions[1].member("value").index],
    }
    return engine.aggregate_grid(
        cube.fact, spark, cube._dims_spec(), axes, [cube._cols[0]]
    )


def test_engine_closure_strategy_both_regimes(spark, monkeypatch):
    """The last unconditioned shuffle_hash pins (engine._closure_side /
    _members_side) now consult the size-aware strategy: in-budget keeps
    the hash join; past the int-triple budget the closure join flips to
    spillable sort-merge — identical values, never a broadcast."""
    n, groups = 240, 4
    db, d, cube = _fdf_cube(spark, "strat13", n, groups)
    grid = _rollup_grid(spark, d, cube)
    p = _plan(grid)
    assert "ShuffledHashJoin" in p and "BroadcastHashJoin" not in p
    want = {
        r[cube._cols[0]]: r["value"] for r in grid.collect()
    }
    top = d.member("AllCust").index
    assert want[top] == pytest.approx(sum(range(n)))
    # the build recorded the exact closure count once — zero-job reads
    key = (id(spark), d.uid, d.version)
    exp_rows = (groups + 1) * 2 - 1 + n + 2 * n  # upper ∪ id ∪ leaf-up
    assert engine._closure_counts[key] == exp_rows
    monkeypatch.setattr(engine, "CLOSURE_BUILD_ROWS_PER_PARTITION", 0)
    grid2 = _rollup_grid(spark, d, cube)
    p2 = _plan(grid2)
    assert "SortMergeJoin" in p2 and "BroadcastHashJoin" not in p2
    got = {r[cube._cols[0]]: r["value"] for r in grid2.collect()}
    assert got == want
    engine.clear_caches()


# ---------------------------------------------------------------------------
# VERDICT r12 #4: multi_parent from_dataframe (edge-list input)
# ---------------------------------------------------------------------------


def test_from_dataframe_multi_parent_matches_driver_walk(spark):
    """Bit-exact differential: a multi_parent from_dataframe closure
    equals the editable-API driver walk on the same DAG — direct-parent
    rows per edge, shared-ancestor weights merged last-DFS-path-wins
    (the path through the greatest-position group wins)."""
    rows = []
    for i in range(60):
        rows.append((f"k{i}", f"g{i % 4}", 1.0 + (i % 3)))
        rows.append((f"k{i}", f"g{(i + 2) % 4}", 0.5))
    rows.append(("k0", "g1", 2.5))  # third parent for k0
    rows.append(("k0", "g1", 1.5))  # duplicate edge -> dedupes to max
    src = spark.createDataFrame(rows, "leaf string, grp string, w double")
    fd = Dimension.from_dataframe(
        "mp13", src, "leaf", parent_col="grp", weight_col="w",
        multi_parent=True,
    )
    assert fd._n_leaves == 60
    names = {
        r["member_id"]: r["name"]
        for r in engine.members_df(spark, fd).collect()
    }
    assert len(names) == 65  # 60 leaves + 4 groups + top, no dup rows
    got = {
        (names[r["member_id"]], names[r["ancestor_id"]]): r["weight"]
        for r in engine.closure_df(spark, fd).collect()
    }
    # driver twin: same DAG through the editable API (groups in sorted
    # order, duplicate edges collapsed to max weight up front — the
    # documented from_dataframe dedup rule)
    dedup: dict = {}
    for leaf, g, w in rows:
        dedup[(leaf, g)] = max(w, dedup.get((leaf, g), float("-inf")))
    d = Dimension("mp13drv").edit()
    d.add_member("All", sorted({g for _, g, _ in rows}))
    for (leaf, g), w in dedup.items():
        d.add_member(g, [leaf], [w])
    d.commit()
    want = {
        (d._defs[m].name, d._defs[a].name): w
        for m, a, w in d.closure_rows
    }
    # the from_dataframe closure also carries upper->ancestor rows
    # (g, All) the driver closure omits — same shape difference as the
    # single-parent path (pinned by the r12 count test); compare the
    # leaf rows + identities bit-exact and check the upper rows apart
    upper_names = {"All", "g0", "g1", "g2", "g3"}
    got_leaf = {
        k: v
        for k, v in got.items()
        if not (k[0] in upper_names and k[0] != k[1])
    }
    assert got_leaf == want
    for g in ("g0", "g1", "g2", "g3"):
        assert got[(g, "All")] == 1.0
    # the merge is real: k0 sits under g0 (pos 0, w 1.0), g1 (pos 1,
    # w 2.5) and g2 (pos 2, w 0.5) — toward All the g2 path wins
    assert got[("k0", "All")] == 0.5
    assert got[("k0", "g1")] == 2.5  # direct-parent rows keep their edge
    engine.clear_caches()


def test_from_dataframe_multi_parent_rollup_and_roundtrip(spark, tmp_path):
    """A leaf under two groups contributes to BOTH group rollups (and
    once, via the winning path, to the top); the whole thing survives
    save()/open() — the persisted parquet holds the EDGE rows and the
    leaf/members frames re-derive from it."""
    rows = [(f"k{i}", f"g{i % 3}", 1.0) for i in range(30)]
    rows += [(f"k{i}", "gx", 1.0) for i in range(0, 30, 5)]  # 6 dual
    src = spark.createDataFrame(rows, "leaf string, grp string, w double")
    db = Database("mprt13", spark=spark)
    d = db.add_dimension_from_dataframe(
        "keys", src, "leaf", parent_col="grp", weight_col="w",
        top="All", multi_parent=True,
    )
    meas = db.add_dimension("meas").edit()
    meas.add_many("value")
    meas.commit()
    cube = db.add_cube("c", [d, meas])
    fact = (
        engine._from_df_leaf_frame(spark, d)
        .select(
            F.col("member_id").alias(cube._cols[0]),
            F.lit(meas.member("value").index).alias(cube._cols[1]),
            F.regexp_extract("name", r"k(\d+)", 1)
            .cast("double")
            .alias("value"),
        )
        .localCheckpoint(eager=True)
    )
    cube.load_dataframe(fact, assume_unique=True)
    want_g0 = sum(float(i) for i in range(30) if i % 3 == 0)
    want_gx = sum(float(i) for i in range(0, 30, 5))
    want_all = sum(float(i) for i in range(30))  # each leaf ONCE
    assert cube.get(("g0", "value")) == pytest.approx(want_g0)
    assert cube.get(("gx", "value")) == pytest.approx(want_gx)
    assert cube.get(("All", "value")) == pytest.approx(want_all)
    path = str(tmp_path / "mpdb")
    db.save(path)
    engine.clear_caches()
    db2 = Database.open(path, spark=spark)
    d2 = db2.dimension("keys")
    assert d2._src.get("multi_parent") is True
    cube2 = db2.cube("c")
    assert cube2.get(("g0", "value")) == pytest.approx(want_g0)
    assert cube2.get(("gx", "value")) == pytest.approx(want_gx)
    assert cube2.get(("All", "value")) == pytest.approx(want_all)
    assert d2._closure == []
    # leaf frame re-derives one row per member from the edge parquet
    leaves2 = engine._from_df_leaf_frame(spark, d2)
    assert leaves2.count() == 30
    assert d2._n_leaves == 30
    # the dual-membership edges survived the round trip
    edges2 = engine._from_df_edge_frame(spark, d2)
    assert edges2.count() == 36
    engine.clear_caches()


def test_purge_orphans_refuses_from_dataframe_dim(spark):
    """r13 probe finding: purge_orphans built its valid-id set from the
    DRIVER member list — for a from_dataframe dimension that is the
    upper hierarchy only, so every DataFrame-resident leaf fact would
    be silently deleted.  It must refuse instead (the dimension is
    immutable — nothing can orphan a member), and the facts must
    survive the attempt."""
    from tinyolap_spark.metadata import TinyOlapError

    db, d, cube = _fdf_cube(spark, "purge13", 120)
    before = cube.get(("AllCust", "value"))
    with pytest.raises(TinyOlapError, match="immutable"):
        db.purge_orphans(d)
    assert cube.get(("AllCust", "value")) == pytest.approx(before)
    engine.clear_caches()


def test_star_surfaces_named_member_contract(spark):
    """The "*" / default-axis member surface of a from_dataframe
    dimension is the UPPER hierarchy (groups + top) — leaves live in a
    DataFrame; pinned so the semantics stay deliberate, not
    accidental.  api.py's members_count, by contrast, counts leaves."""
    from tinyolap_spark.view import View

    db, d, cube = _fdf_cube(spark, "star13", 120, groups=4)
    view = View(
        cube,
        rows=[(d.name, None)],  # default axis = named-member surface
        columns=[(cube.dimensions[1].name, ["value"])],
    )
    grid = view.to_df()
    label = f"{cube._cols[0]}_name"
    names = sorted(r[label] for r in grid.collect())
    assert names == sorted(
        ["AllCust"] + [f"g{i}" for i in range(4)]
    )  # upper only, never the 120 leaves
    # len(d) counts Spark-side leaves; d.members is the driver surface
    assert len(d) == 120 + 5
    assert len(d.members) == 5
    engine.clear_caches()


def test_from_dataframe_multi_parent_requires_parent_col(spark):
    with pytest.raises(InvalidAddressError, match="parent_col"):
        Dimension.from_dataframe(
            "mpbad",
            spark.createDataFrame([("a",)], "leaf string"),
            "leaf",
            multi_parent=True,
        )


# ---------------------------------------------------------------------------
# VERDICT r12 #1: from_dataframe dimensions persist through save()/open()
# ---------------------------------------------------------------------------


def test_from_dataframe_save_open_roundtrip(spark, tmp_path):
    """The flagship persistence contract for the 100x construction path
    (reference storage/sqlite.py:391-489 analogue): save() writes the
    leaf frame as parquet next to the fact tables (baking the leaf
    ids), open() reloads it lazily, and the same aggregated reads
    return identical values with the driver closure deferred
    throughout."""
    n = 240
    db, d, cube = _fdf_cube(spark, "perst13", n)
    want_all = cube.get(("AllCust", "value"))
    want_g2 = cube.get(("g2", "value"))
    ids0 = {
        r["name"]: r["member_id"]
        for r in engine._from_df_leaf_frame(spark, d).collect()
    }
    path = str(tmp_path / "db")
    db.save(path)
    assert (tmp_path / "db" / "dims" / "cust.parquet").exists()
    engine.clear_caches()

    db2 = Database.open(path, spark=spark)
    d2 = db2.dimension("cust")
    assert getattr(d2, "_from_dataframe", False)
    assert d2._n_leaves == n  # from the document, no count job
    assert d2.member("AllCust").level == 2  # upper levels re-lifted
    cube2 = db2.cube("c")
    assert cube2.get(("AllCust", "value")) == pytest.approx(want_all)
    assert cube2.get(("g2", "value")) == pytest.approx(want_g2)
    assert d2._closure == []  # deferred walk never ran
    # leaf ids are DURABLE: baked into the parquet, identical by name
    ids2 = {
        r["name"]: r["member_id"]
        for r in engine._from_df_leaf_frame(spark, d2).collect()
    }
    assert ids2 == ids0
    # immutability and driver-side guards survive the round trip
    from tinyolap_spark.metadata import DimensionEditError

    with pytest.raises(DimensionEditError, match="immutable"):
        d2.edit()
    with pytest.raises(DimensionScaleError, match="from_dataframe"):
        d2.closure_rows
    # open -> save back to the SAME path (the reference's routine
    # workflow): the checkpointed leaf frame must not scan the
    # destination during the overwrite
    db2.save(path)
    engine.clear_caches()
    db3 = Database.open(path, spark=spark)
    assert db3.cube("c").get(("AllCust", "value"))== pytest.approx(want_all)
    assert {
        r["name"]: r["member_id"]
        for r in engine._from_df_leaf_frame(
            spark, db3.dimension("cust")
        ).collect()
    } == ids0
    engine.clear_caches()


def test_from_dataframe_save_open_encrypted(spark, tmp_path):
    """password= encrypts fact values; leaf NAMES are metadata and stay
    cleartext like every member name in database.json — the round trip
    must still be exact."""
    db, d, cube = _fdf_cube(spark, "perstenc13", 120)
    want = cube.get(("AllCust", "value"))
    path = str(tmp_path / "edb")
    db.save(path, password="s3cret")
    engine.clear_caches()
    from tinyolap_spark.metadata import TinyOlapError

    with pytest.raises(TinyOlapError, match="encrypted"):
        Database.open(path, spark=spark)
    db2 = Database.open(path, spark=spark, password="s3cret")
    assert db2.cube("c").get(("AllCust", "value")) == pytest.approx(want)
    engine.clear_caches()


@pytest.mark.endurance
@pytest.mark.slow
def test_million_leaf_from_dataframe_save_open_fresh_session(
    spark, tmp_path
):
    """VERDICT r12 #1 'done' bar, verbatim: build a 10^6-leaf dimension
    with from_dataframe, write facts, save(), then a FRESH SESSION
    (subprocess with its own SparkSession/JVM) open()s the database and
    the same aggregated reads return identical values with
    ``_closure == []`` throughout."""
    import json
    import os
    import subprocess
    import sys
    import textwrap

    n, groups = 1_000_000, 1000
    src = spark.range(n).select(
        F.concat(F.lit("k"), "id").alias("leaf"),
        F.concat(F.lit("g"), (F.col("id") % groups)).alias("grp"),
    )
    db = Database("m13", spark=spark)
    d = db.add_dimension_from_dataframe(
        "cust", src, "leaf", parent_col="grp", top="AllCust"
    )
    meas = db.add_dimension("meas").edit()
    meas.add_many("value")
    meas.commit()
    cube = db.add_cube("c", [d, meas])
    leaves = engine._from_df_leaf_frame(spark, d)
    fact = leaves.select(
        F.col("member_id").alias(cube._cols[0]),
        F.lit(meas.member("value").index).alias(cube._cols[1]),
        F.regexp_extract("name", r"k(\d+)", 1)
        .cast("double")
        .alias("value"),
    )
    cube.load_dataframe(fact, assume_unique=True)
    want_all = cube.get(("AllCust", "value"))
    want_g7 = cube.get(("g7", "value"))
    assert want_all == pytest.approx(float(n) * (n - 1) / 2)
    assert want_g7 == pytest.approx(
        sum(float(i) for i in range(7, n, groups))
    )
    assert d._closure == []
    path = str(tmp_path / "m13db")
    db.save(path)
    script = textwrap.dedent(
        f"""
        import json
        from pyspark.sql import SparkSession
        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.driver.memory", "4g")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        from tinyolap_spark import Database
        db = Database.open({path!r}, spark=spark)
        d = db.dimension("cust")
        c = db.cube("c")
        va = c.get(("AllCust", "value"))
        vg = c.get(("g7", "value"))
        assert d._closure == [], "driver walk ran in the fresh session"
        assert d._n_leaves == {n}
        print(json.dumps({{"all": va, "g7": vg}}))
        """
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    got = json.loads(out.stdout.strip().splitlines()[-1])
    assert got["all"] == pytest.approx(want_all)
    assert got["g7"] == pytest.approx(want_g7)
    # free the 1M-row persisted fact + checkpointed frames: later
    # endurance tests in the same session time their per-batch walls
    cube._fact.unpersist(blocking=True)
    engine.clear_caches()


def test_from_dataframe_clone(spark):
    """clone() rides the save/open round trip — it must now work for a
    database containing a from_dataframe dimension."""
    db, d, cube = _fdf_cube(spark, "clone13", 120)
    want = cube.get(("g1", "value"))
    out = db.clone()
    assert out.cube("c").get(("g1", "value")) == pytest.approx(want)
    engine.clear_caches()


def test_engine_members_strategy_both_regimes(spark, monkeypatch):
    """View label join over a large_dim members frame: hash in budget,
    sort-merge past the string-row budget; values identical."""
    from tinyolap_spark.pipeline import dedup
    from tinyolap_spark.view import View

    db, d, cube = _fdf_cube(spark, "strat13m")

    def grid_df():
        names = sorted(m.name for m in d.members_by_level(1)) + [
            "AllCust"
        ]
        return View(
            cube,
            rows=[(d.name, names)],
            columns=[(cube.dimensions[1].name, ["value"])],
        ).to_df()

    # assertions are keyed on the large_dim column: the tiny 'meas'
    # label join legitimately broadcasts
    g1 = grid_df()
    p1 = _plan(g1)
    assert "ShuffledHashJoin [cust" in p1
    assert "BroadcastHashJoin [cust" not in p1
    want = sorted(
        (r[f"{cube._cols[0]}_name"], r["value"]) for r in g1.collect()
    )
    monkeypatch.setattr(dedup, "SHUFFLE_HASH_BUILD_ROWS_PER_PARTITION", 0)
    g2 = grid_df()
    p2 = _plan(g2)
    assert "SortMergeJoin [cust" in p2
    assert "BroadcastHashJoin [cust" not in p2
    got = sorted(
        (r[f"{cube._cols[0]}_name"], r["value"]) for r in g2.collect()
    )
    assert got == want
    engine.clear_caches()
