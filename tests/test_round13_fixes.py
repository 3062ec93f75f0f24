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
