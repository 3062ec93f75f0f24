"""API-parity odds and ends: Slice, Server, cell cursors, callable
set_value, rule persistence, mini-SQL dialect surface."""

import pytest

from tinyolap_spark import Database, Server, Slice, rule


@pytest.fixture(scope="module")
def tiny2(spark):
    from conftest import build_tiny

    return build_tiny(spark, seed=77)


def test_slice_facade(tiny2):
    db, cube, rows = tiny2
    s = Slice(
        cube,
        {
            "title": "Sales 2021",
            "header": [
                {"dimension": "years", "member": "2021"},
                {"dimension": "months", "member": "Year"},
            ],
            "rows": [{"dimension": "regions"}],
            "columns": [
                {"dimension": "measures", "members": ["Sales", "Cost", "Profit"]}
            ],
        },
    )
    text = str(s)
    assert "Sales 2021" in text and "North" in text
    csv = s.as_csv()
    assert csv.splitlines()[0] == ",Sales,Cost,Profit"
    got = s.view.cell_by_names(["North"], ["Profit"])
    assert got == pytest.approx(cube["2021", "Year", "North", "Total", "Profit"])


def test_server_registry(spark, tmp_path):
    from conftest import build_tiny

    srv = Server(spark=spark)
    db, cube, rows = build_tiny(spark, seed=5)
    srv.add_database(db)
    assert "tiny" in srv and len(srv) == 1
    db.save(str(tmp_path / "t"))
    srv2 = Server(spark=spark)
    opened = srv2.open_database(str(tmp_path / "t"), name="reopened")
    assert srv2["reopened"] is opened
    srv2.delete_database("reopened")
    assert len(srv2) == 0


def test_cell_cursor(tiny2):
    db, cube, rows = tiny2
    c = cube.cell("2021", "Jan", "North", "coupe", "Sales")
    assert c.value == cube["2021", "Jan", "North", "coupe", "Sales"]
    assert c.member("months").name == "Jan"
    assert float(c) == c.value
    # modifier shift
    assert c["Cost"] == cube["2021", "Jan", "North", "coupe", "Cost"]
    assert c["months:Feb"] == cube["2021", "Feb", "North", "coupe", "Sales"]
    assert c["1:Feb"] == cube["2021", "Feb", "North", "coupe", "Sales"]


def test_area_set_value_callable(tiny2):
    """F7: cell-value callables evaluated per cell (deterministic fn)."""
    db, cube, rows = tiny2
    area = cube.area("2023", "months:Jul", "measures:Cost")

    def gen(address):
        # deterministic per-address value: length of the region name
        return float(len(address[2]))

    area.set_value(gen)
    assert cube["2023", "Jul", "North", "coupe", "Cost"] == 5.0
    assert cube["2023", "Jul", "East", "van", "Cost"] == 4.0


def test_rule_persistence_roundtrip(spark, tmp_path):
    from conftest import build_tiny

    db, cube, rows = build_tiny(spark, seed=31)
    measures = db.dimension("measures")
    measures.edit()
    measures.add_many("Margin pct")
    measures.commit()

    @rule("sales", trigger=["Margin pct"])
    def margin_pct(c):
        return c["Profit"] / c["Sales"]

    cube.register_rule(margin_pct)
    want = cube["2021", "Year", "Total", "Total", "Margin pct"]
    assert isinstance(want, float)

    path = str(tmp_path / "ruled")
    db.save(path)
    db2 = Database.open(path, spark=spark)
    cube2 = db2.cube("sales")
    assert len(cube2.rules) == 1
    got = cube2["2021", "Year", "Total", "Total", "Margin pct"]
    assert got == pytest.approx(want)


def test_mini_sql_surface(tiny2):
    """Reference tests/test_query.py: statements must parse and run."""
    from tinyolap_spark.sqlq import Query

    db, cube, rows = tiny2
    stmts = [
        "SELECT months, value FROM sales WHERE 2021, North, Total, Sales",
        "SELECT months, regions, value FROM sales "
        "WHERE months=(Jan, Feb), regions=(North, South), measures=Sales",
        "SELECT regions, regions.manager, value FROM sales "
        "WHERE regions=*, measures=Sales",
        "SELECT months, value FROM sales WHERE summer, measures=Cost",
    ]
    for s in stmts:
        q = Query(db, s).execute()
        assert q.records, s
    # attribute projection resolves
    q = Query(
        db,
        "SELECT regions, regions.manager, value FROM sales "
        "WHERE regions=(North, South), measures=Sales",
    ).execute()
    by_region = {r[0]: r[1] for r in q.records}
    assert by_region["North"] == "Peter Parker"
    # subset slicer expands to 4 months
    q2 = Query(db, "SELECT months, value FROM sales WHERE summer, measures=Cost")
    assert len(q2.execute().records) == 4


def test_sql_dense_product_includes_empty_cells(tiny2):
    from tinyolap_spark.sqlq import Query

    db, cube, rows = tiny2
    cube.area("2022", "months:Mar", "West").clear()
    q = Query(
        db,
        "SELECT regions, value FROM sales "
        "WHERE years=2022, months=Mar, regions=(West, East), "
        "products=Total, measures=Sales",
    ).execute()
    vals = {r[0]: r[1] for r in q.records}
    assert vals["West"] is None  # dense output keeps the empty cell
    assert vals["East"] is not None
