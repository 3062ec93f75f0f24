"""Public plan-linter surface (`tinyolap_spark.plans`): the same plan
contract the engine's own tests enforce, exposed for user pipelines."""

import pytest
from pyspark.sql import functions as F

from tinyolap_spark import plans


def test_clean_broadcast_join_plan_passes(spark):
    fact = spark.range(1000).select(
        (F.col("id") % 10).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(10).select(
        F.col("id").alias("k"), F.concat(F.lit("m"), "id").alias("name")
    )
    df = (
        fact.join(F.broadcast(dim), on="k")
        .groupBy("name")
        .agg(F.sum("v").alias("total"))
    )
    findings = plans.assert_scale_safe(df, execute=True)
    assert all(f.severity != "error" for f in findings)
    codes = {f.code for f in findings}
    assert "python_row_udf" not in codes


def test_keyless_join_is_blocked(spark):
    a = spark.range(50).select(F.col("id").alias("x"))
    b = spark.range(50).select(F.col("id").alias("y"))
    # non-equi condition: CartesianProduct or BroadcastNestedLoopJoin
    df = a.join(b, a.x < b.y)
    with pytest.raises(plans.PlanHazard) as exc:
        plans.assert_scale_safe(df)
    codes = {f.code for f in exc.value.findings}
    assert codes & {"cartesian_product", "broadcast_nested_loop"}
    # and the same plan passes when explicitly allowed
    plans.assert_scale_safe(
        df, allow=("cartesian_product", "broadcast_nested_loop")
    )


def test_row_python_udf_is_blocked(spark):
    bump = F.udf(lambda x: x + 1, "bigint")
    df = spark.range(10).select(bump("id").alias("b"))
    with pytest.raises(plans.PlanHazard) as exc:
        plans.assert_scale_safe(df)
    assert any(f.code == "python_row_udf" for f in exc.value.findings)


def test_arrow_udf_is_info_not_error(spark):
    import pandas as pd

    def add_one(it):
        for pdf in it:
            yield pdf.assign(id=pdf["id"] + 1)

    df = spark.range(10).mapInPandas(add_one, "id long")
    findings = plans.assert_scale_safe(df)  # must NOT raise
    assert any(f.code == "python_arrow_udf" for f in findings)


def test_lint_accepts_plan_strings():
    findings = plans.lint(
        "*(1) Project\n+- BatchEvalPython [f(x)]\n+- CartesianProduct"
    )
    codes = [f.code for f in findings]
    assert "python_row_udf" in codes and "cartesian_product" in codes
    # errors sort first
    assert findings[0].severity == "error"


def test_engine_rollup_plan_is_scale_safe(spark):
    """The engine's own flagship grid passes its own public linter."""
    from tinyolap_spark import engine
    from tinyolap_spark.sources.starschema import StarCube

    sc = StarCube(spark, "/root/testdata/sf0.001")
    cube = sc.cube
    axes = {
        "geo": [sc.geo.member("All Geographies").index],
        "calendar": [sc.cal.member(str(sc.years[0])).index],
        "brand": [m.index for m in sc.brand.leaf_members],
        "measures": [sc.measures.member("revenue").index],
    }
    grid = engine.aggregate_grid(
        cube.fact, cube.spark, cube._dims_spec(), axes, ["brand"]
    )
    findings = plans.assert_scale_safe(grid, execute=True)
    # dimension joins must not even warrant the sort-merge info note
    assert "sort_merge_join" not in {f.code for f in findings}


def test_exchange_count_excludes_broadcast_and_reuse():
    plan = "\n".join(
        [
            "*(5) Project",
            "+- Exchange hashpartitioning(k#1L, 4), ENSURE_REQUIREMENTS",
            "   +- BroadcastExchange HashedRelationBroadcastMode(...)",
            "      +- ReusedExchange [k#11L], Exchange hashpartitioning(k#1L, 4)",
            ":- Exchange rangepartitioning(k#1L ASC, 4)",
        ]
    )
    findings = plans.lint(plan, max_exchanges=1)
    note = [f for f in findings if f.code == "many_exchanges"]
    assert note and note[0].message.startswith("2 shuffle Exchange")
    # under the limit: 2 real shuffles, broadcast/reuse not counted
    assert not [
        f for f in plans.lint(plan, max_exchanges=2)
        if f.code == "many_exchanges"
    ]


def test_filter_pushdown_detection(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(100).selectExpr("id", "cast(id as string) s").write.parquet(p)
    pushed = spark.read.parquet(p).where(F.col("id") > 50)
    assert "filter_not_pushed" not in {
        f.code for f in plans.lint(pushed)
    }, plans.plan_text(pushed)
    # predicate on a computed expression cannot push into the reader
    unpushed = spark.read.parquet(p).where(F.length(F.upper("s")) > 1)
    codes = {f.code for f in plans.lint(unpushed)}
    assert "filter_not_pushed" in codes, plans.plan_text(unpushed)


# ---------------------------------------------------------------------------
# VERDICT r7 #2: the engine eats its own cooking — EVERY active registry
# query's executed plan must pass assert_scale_safe.  A future regression
# (e.g. a broadcast demoted to SortMergeJoin by a stats change, or a
# Python row UDF sneaking into a hot path) fails here before the driver
# sees it.  Allow-listed error codes are documented per query; warnings
# and infos never block (they are the linter's advice channel).
# ---------------------------------------------------------------------------

import os as _os

import __spark_entry__ as _entry

_LINT_SF_DIR = _os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

# error-severity codes tolerated per query, with the reason they are
# acceptable AT SCALE (the linter is pattern-based and cannot see intent)
_LINT_ALLOW: "dict[str, tuple[str, ...]]" = {}


@pytest.mark.parametrize("name", sorted(_entry.all_queries()))
def test_registry_plan_scale_safe(spark, name):
    """Active (driver-gated) AND retired registry queries both sweep —
    a retired row reactivated later must not smuggle a hazard back."""
    df = _entry.all_queries()[name](spark, _LINT_SF_DIR)
    findings = plans.assert_scale_safe(
        df, execute=True, allow=_LINT_ALLOW.get(name, ())
    )
    # surface the advice channel in -v output without failing on it
    for f in findings:
        if f.severity != "info":
            print(f"{name}: {f}")
