"""Odds-and-ends semantics: formats, aliases, caching, view windows,
navigation, data-space enumeration."""

import pytest

from tinyolap_spark import Database, View


@pytest.fixture(scope="module")
def tiny3(spark):
    from conftest import build_tiny

    return build_tiny(spark, seed=101)


def test_member_formats_render(tiny3):
    db, cube, rows = tiny3
    v = View(
        cube,
        filters=[("years", "2021"), ("months", "Year")],
        rows=[("regions", ["North"])],
        columns=[("measures", ["Sales", "Profit"])],
    ).refresh()
    text = v.to_console()
    profit = cube["2021", "Year", "North", "Total", "Profit"]
    formatted = "{:+,.0f}".format(profit)  # Profit has format "{:+,.0f}"
    assert formatted in text


def test_member_aliases(tiny3):
    db, cube, rows = tiny3
    months = db.dimension("months")
    months.add_alias("Jan", "January")
    assert months.member("January").name == "Jan"
    assert months.member("jANUary").name == "Jan"  # case-insensitive
    # aliases resolve in addresses
    assert cube["2021", "January", "North", "coupe", "Sales"] == cube[
        "2021", "Jan", "North", "coupe", "Sales"
    ]


def test_cell_cache_and_invalidation(tiny3):
    db, cube, rows = tiny3
    cube._cache.clear()
    addr = ("2021", "Q1", "Total", "Total", "Sales")
    v1 = cube[addr]
    hits_before = cube.counter_cache_hits
    v2 = cube[addr]
    assert v2 == v1 and cube.counter_cache_hits == hits_before + 1
    # write invalidates (reference cube.py:510-511)
    cube["2021", "Jan", "North", "coupe", "Sales"] = 1.0
    assert addr not in [a for a in cube._cache]  # cleared
    v3 = cube[addr]
    assert v3 != v1  # value actually changed


def test_caching_disabled(tiny3):
    db, cube, rows = tiny3
    cube.caching = False
    cube._cache.clear()
    addr = ("2022", "Q2", "Total", "Total", "Cost")
    _ = cube[addr]
    assert addr not in {tuple(k) for k in cube._cache}
    cube.caching = True


def test_view_window_pagination(tiny3):
    db, cube, rows = tiny3
    v = View(
        cube,
        filters=[("years", "2021"), ("months", "Year")],
        rows=[("regions", "*")],
        columns=[("measures", ["Sales"])],
    ).refresh()
    full = v.to_dict()
    assert len(full["rows"]) == 5
    page = v.to_dict(window=(1, 2))
    assert len(page["rows"]) == 2
    assert page["rows"][0]["row"] == full["rows"][1]["row"]


def test_navigation_ordinals(tiny3):
    db, cube, rows = tiny3
    months = db.dimension("months")
    jan = months.member("Jan")
    assert jan.next.name == "Feb"
    assert months.member("Feb").previous.name == "Jan"
    assert jan.first.name == "Q1"  # definition order: Q1 added first
    assert jan.last.name == "Year"
    assert [m.name for m in months.members_by_level(1)] == [
        "Q1", "Q2", "Q3", "Q4",
    ]


def test_area_enumerate_data_space(tiny3):
    db, cube, rows = tiny3
    area = cube.area("2021", "months:Q1", "regions:North", "best sellers")
    dense = area.addresses(enumerate_data_space=True)
    # Q1 -> 3 months; best sellers -> sports, motorcycles; measures free -> 2
    # leaf measures (Sales, Cost); years pinned 1; regions 1
    assert len(dense) == 1 * 3 * 1 * 2 * 2
    assert ("2021", "Jan", "North", "sports", "Sales") in dense


def test_weight_on_non_leaf_paths(spark):
    """Weights multiply along multi-level paths (mid-level weight applies
    to all leaves below)."""
    db = Database("wpath", spark=spark)
    d = db.add_dimension("d").edit()
    d.add_many("Mid", ["A", "B"])           # weight 1 each
    d.add_many("Top", ["Mid"], [0.5])        # Mid contributes half
    d.commit()
    cube = db.add_cube("c", [d])
    cube.write_rows([("A", 10.0), ("B", 30.0)])
    assert cube["Mid"] == pytest.approx(40.0)
    assert cube["Top"] == pytest.approx(20.0)
