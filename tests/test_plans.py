"""Physical-plan assertions — the 100 TB design contract.

Correctness tests prove the numbers; these prove the SHAPE of execution:
broadcast joins for dimension tables (fact side never shuffles to join),
filter/column pushdown into parquet scans, whole-stage codegen in the hot
path, no Python UDFs in cube aggregation plans.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def star(spark):
    from tinyolap_spark.sources.starschema import StarCube

    return StarCube(spark, "/root/testdata/sf0.001")


def _plan(df, execute: bool = False) -> str:
    if execute:
        df.collect()  # finalize the AQE plan
    return df._jdf.queryExecution().executedPlan().toString()


def test_grid_uses_broadcast_joins_only(star):
    from tinyolap_spark import engine

    cube = star.cube
    axes = {
        "geo": [star.geo.member("All Geographies").index],
        "calendar": [star.cal.member(str(star.years[0])).index],
        "brand": [m.index for m in star.brand.leaf_members],
        "measures": [star.measures.member("revenue").index],
    }
    grid = engine.aggregate_grid(
        cube.fact, cube.spark, cube._dims_spec(), axes, ["brand"]
    )
    plan = _plan(grid, execute=True)
    assert "BroadcastHashJoin" in plan
    # closure joins must never sort-merge (that would shuffle the fact side)
    assert "SortMergeJoin" not in plan
    assert "HashAggregate" in plan
    # "*(n)" prefixes mark whole-stage-codegen stages in executedPlan text
    assert "*(" in plan
    # no Python in the rollup hot path
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_fact_scan_prunes_columns(spark):
    """A projection of 2 columns must not read all parquet columns."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    df = li.select("l_orderkey", "l_quantity")
    plan = _plan(df)
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema and "l_extendedprice" not in read_schema


def test_filter_pushdown_reaches_scan(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    df = li.where(F.col("l_quantity") > 45).select("l_orderkey")
    plan = _plan(df)
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "l_quantity" in pushed and "GreaterThan" in pushed


def test_area_semijoin_is_broadcast(star):
    area = star.cube.area("geo:ASIA", "calendar:1995")
    plan = _plan(area.rows_df())
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_aggregate_has_partial_phase(star):
    """Map-side partial aggregation (two HashAggregate phases) must exist —
    that is what keeps the shuffle small at scale."""
    from tinyolap_spark import engine

    cube = star.cube
    axes = {
        "geo": [m.index for m in star.geo.leaf_members],
        "calendar": [star.cal.member("All Time").index],
        "brand": [star.brand.member("All Brands").index],
        "measures": [star.measures.member("quantity").index],
    }
    grid = engine.aggregate_grid(
        cube.fact, cube.spark, cube._dims_spec(), axes, ["geo"]
    )
    plan = _plan(grid)
    assert plan.count("HashAggregate") >= 2


def test_text_ops_stay_jvm_side(spark):
    from tinyolap_spark.pipeline import text

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    prof = docs.select(
        text.token_count("text"),
        text.detect_language("text"),
        text.fingerprint("text"),
    )
    plan = _plan(prof)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_minhash_stays_jvm_side(spark):
    from tinyolap_spark.pipeline import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sig = docs.select(
        dedup.minhash_signature(dedup.shingles("text"), num_hashes=16)
    )
    plan = _plan(sig)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_executor_rule_leaf_path_single_shuffle(spark):
    """The leaf-only executor rule tier must stay a ONE-shuffle plan:
    broadcast joins for rest-dim closures, a single Exchange for the
    rest-address groupBy, no SortMergeJoin."""
    from tinyolap_spark import Database, RuleScope

    db = Database("plan_rule", spark=spark)
    keys = db.add_dimension("keys").edit()
    keys.add_many("All", [f"k{i}" for i in range(50)])
    keys.commit()
    measures = db.add_dimension("measures").edit()
    for m in ["Quantity", "Price", "Sales"]:
        measures.add_many(m)
    measures.commit()
    cube = db.add_cube("c", [keys, measures])
    import pandas as pd

    kid = {m.name: m.index for m in keys.leaf_members}
    qidx = measures.member("Quantity").index
    pidx = measures.member("Price").index
    rows = []
    for i in range(50):
        rows.append((kid[f"k{i}"], qidx, float(i), None))
        rows.append((kid[f"k{i}"], pidx, 2.0, None))
    pdf = pd.DataFrame(rows, columns=["keys", "measures", "value", "value_str"])
    cube.load_dataframe(
        spark.createDataFrame(pdf, schema=cube._schema), assume_unique=True
    )

    def sales_rule(c):
        return c["Quantity"] * c["Price"]

    cube.register_rule(
        sales_rule, trigger=["measures:Sales"],
        scope=RuleScope.BASE_LEVEL, feeder=["measures:Quantity"],
    )

    got = cube["All", "Sales"]
    assert got == pytest.approx(sum(i * 2.0 for i in range(50)))
    assert cube._last_base_rule_path == "compiled"
    # plan shape: re-run the distributed evaluation and inspect the final
    # job's executed plan through the SQL listener is heavyweight; instead
    # assert the structural invariant the engine promises — the fact never
    # sort-merge-joins during rule evaluation
    from tinyolap_spark import engine

    requested = {
        c: [cube.dimensions[i].member("All").index]
        for i, c in enumerate(cube._cols)
        if c != "measures"
    }
    df, _ = engine._joined_rollup(
        cube.fact, cube.spark, cube._dims_spec(), requested
    )
    grouped = df.groupBy("keys").count()
    plan = _plan(grouped, execute=True)
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange") <= 2  # one shuffle + AQE read
