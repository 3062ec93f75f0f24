"""Full Spark SQL over registered cube views (the superset surface,
SURVEY.md §2.11 Q3) + partitioned persistence."""

import os

import pytest


def test_register_views_and_spark_sql(spark):
    from conftest import build_tiny

    from tinyolap_spark.sqlq import register_views

    db, cube, rows = build_tiny(spark, seed=55)
    names = register_views(db)
    assert "sales_fact" in names and "months_members" in names
    # arbitrary Spark SQL: closure-join rollup written by hand
    got = spark.sql(
        """
        SELECT mm.name AS month, SUM(f.value * c.weight) AS sales
          FROM sales_fact f
          JOIN months_closure c ON f.months = c.member_id
          JOIN months_members mm ON c.ancestor_id = mm.member_id
          JOIN measures_members me ON f.measures = me.member_id
         WHERE mm.level = 1 AND me.name = 'Sales'
         GROUP BY mm.name
        """
    ).collect()
    by_month = {r["month"]: r["sales"] for r in got}
    q1 = cube["All years", "Q1", "Total", "Total", "Sales"]
    assert by_month["Q1"] == pytest.approx(q1)
    assert set(by_month) == {"Q1", "Q2", "Q3", "Q4"}


def test_partitioned_save_prunes(spark, tmp_path):
    from conftest import build_tiny

    from tinyolap_spark import Database

    db, cube, rows = build_tiny(spark, seed=56)
    path = str(tmp_path / "partdb")
    db.save(path, partition_by={"sales": "years"})
    # hive layout exists
    fact_dir = os.path.join(path, "cubes", "sales.parquet")
    assert any(d.startswith("years=") for d in os.listdir(fact_dir))
    # re-open and check partition pruning shows in the plan
    db2 = Database.open(path, spark=spark)
    cube2 = db2.cube("sales")
    yid = db2.dimension("years").member("2021").index
    pruned = cube2.fact.where(cube2.fact["years"] == yid)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # value survives the partitioned round-trip
    assert cube2["2021", "Q1", "Total", "Total", "Sales"] == pytest.approx(
        cube["2021", "Q1", "Total", "Total", "Sales"]
    )
