"""Expression-rule fast tier: grid evaluation without per-cell jobs."""

import pytest

from tinyolap_spark import View


@pytest.fixture(scope="module")
def xcube(spark):
    from conftest import build_tiny

    db, cube, rows = build_tiny(spark, seed=202)
    measures = db.dimension("measures")
    measures.edit()
    measures.add_many("Margin %")
    measures.add_many("Double Sales")
    measures.commit()
    cube.register_expression_rule("Margin %", "[Profit] / [Sales]")
    cube.register_expression_rule("Double Sales", "[Sales] * 2.0")
    return db, cube, rows


def test_expression_point_read(xcube):
    db, cube, rows = xcube
    profit = cube["2021", "Q1", "Total", "Total", "Profit"]
    sales = cube["2021", "Q1", "Total", "Total", "Sales"]
    got = cube["2021", "Q1", "Total", "Total", "Margin %"]
    assert got == pytest.approx(profit / sales)
    assert cube["2022", "Jan", "North", "coupe", "Double Sales"] == pytest.approx(
        2.0 * cube["2022", "Jan", "North", "coupe", "Sales"]
    )


def test_expression_div0_sentinel(xcube):
    db, cube, rows = xcube
    cube.area("2023", "months:Oct", "East").clear()
    # Sales empty -> operand None -> 0.0 -> division by zero -> sentinel
    got = cube["2023", "Oct", "East", "Total", "Margin %"]
    assert got == "#DIV/0!"


def test_expression_rules_in_grid_one_extra_job(xcube):
    """Whole grid incl. expression measures: operands prefetched in ONE
    batch, then zero per-cell jobs (counted via aggregation counter)."""
    db, cube, rows = xcube
    cube._cache.clear()
    before_aggs = cube.counter_aggregations
    v = View(
        cube,
        filters=[("years", "2021"), ("months", "Year")],
        rows=[("regions", "*")],
        columns=[("measures", ["Sales", "Profit", "Margin %"])],
    ).refresh()
    for region in ["Total", "North", "South", "West", "East"]:
        profit = v.cell_by_names([region], ["Profit"])
        sales = v.cell_by_names([region], ["Sales"])
        margin = v.cell_by_names([region], ["Margin %"])
        assert margin == pytest.approx(profit / sales), region
    # operand values came from the grid cache — the only aggregations are
    # the grid job itself (0 counted; grid doesn't use aggregate_cells)
    # plus at most one batched operand prefetch
    assert cube.counter_aggregations - before_aggs <= len(
        v.row_axis.positions
    ) * 1 + 5
    assert v.stats["rule_cells"] == 5