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


def test_cell_full_arithmetic_surface(spark):
    """Reference cell.py:336-448: every numeric operator works on a Cell,
    returns plain numbers, and in-place ops rebind to a number — exercised
    inside a rule as reference models do (e.g. c["x"] ** 2)."""
    from tinyolap_spark import Database

    db = Database("cellmath", spark=spark)
    d = db.add_dimension("d").edit()
    d.add_many("All", ["a", "b"])
    d.commit()
    m = db.add_dimension("m").edit()
    for name in ["x", "y", "sq"]:
        m.add_many(name)
    m.commit()
    cube = db.add_cube("c", [d, m])
    cube[("a", "x")] = 7.0
    cube[("a", "y")] = 2.0

    c = cube.cell("a", "x")
    assert float(c) == 7.0
    assert c.__index__() == 7
    assert -c == -7.0 and +c == 7.0 and abs(-c + 0.0) == 7.0
    assert c + 3 == 10.0 and 3 + c == 10.0
    assert c - 2 == 5.0 and 10 - c == 3.0
    assert c * 2 == 14.0 and 2 * c == 14.0
    assert c / 2 == 3.5 and 14 / c == 2.0
    assert c // 2 == 3.0 and 15 // c == 2.0
    assert c % 4 == 3.0 and 15 % c == 1.0
    assert divmod(c, 4) == (1.0, 3.0)
    assert divmod(15, c) == (2.0, 1.0)
    assert c ** 2 == 49.0 and 2 ** c == 128.0
    assert (c and 5) == 5 and (c or 5) == 7.0
    # Cell (+) Cell via __float__
    cy = cube.cell("a", "y")
    assert c + cy == 9.0 and c ** cy == 49.0
    # in-place rebinding to a number (reference behaviour)
    acc = cube.cell("a", "x")
    acc += 1
    assert isinstance(acc, float) and acc == 8.0

    # and all of it inside a rule: sq = x ** 2 + x // y - x % y
    def sq_rule(cell):
        return cell["x"] ** 2 + cell["x"] // cell["y"] - cell["x"] % cell["y"]

    cube.register_rule(sq_rule, trigger=["m:sq"])
    assert cube[("a", "sq")] == 49.0 + 3.0 - 1.0


def test_mini_sql_dense_product_guard(spark):
    """SURVEY §7.4: an unbounded dense product (d1=*, d2=* over big dims)
    raises QueryError instead of materializing on the driver."""
    from tinyolap_spark import Database
    from tinyolap_spark.sqlq import Query, QueryError

    db = Database("guard", spark=spark)
    d1 = db.add_dimension("d1").edit()
    d1.add_many("All1", [f"a{i}" for i in range(1500)])
    d1.commit()
    d2 = db.add_dimension("d2").edit()
    d2.add_many("All2", [f"b{i}" for i in range(1500)])
    d2.commit()
    db.add_cube("c", [d1, d2])
    with pytest.raises(QueryError, match="max_cells"):
        Query(db, 'SELECT value FROM c WHERE d1=*, d2=*').execute()
    # a raised budget permits it (and a narrow query is always fine)
    Query(db, 'SELECT value FROM c WHERE d1=All1, d2=(b0, b1)').execute()
    q = Query(db, 'SELECT value FROM c WHERE d1=*, d2=*',
              max_cells=3_000_000)
    assert q.max_cells == 3_000_000


def test_rest_api_surface(spark):
    """Q6 (reference api/rest): catalog, cell read/write, batched reads,
    mini-SQL and views over HTTP — stdlib server, JSON in/out."""
    import json
    import urllib.request

    from tinyolap_spark import Database
    from tinyolap_spark.api import RestServer

    db = Database("restdb", spark=spark)
    d1 = db.add_dimension("d1").edit()
    d1.add_many("All", ["a", "b"])
    d1.commit()
    d2 = db.add_dimension("d2").edit()
    d2.add_many("Total", ["x", "y"])
    d2.commit()
    cube = db.add_cube("c", [d1, d2])
    cube.write_rows([("a", "x", 1.0), ("b", "y", 2.0)])

    srv = RestServer(db).start()
    base = f"http://127.0.0.1:{srv.port}"

    def call(method, path, body=None):
        req = urllib.request.Request(
            base + path,
            data=json.dumps(body).encode() if body is not None else None,
            method=method,
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    try:
        st, cat = call("GET", "/catalog")
        assert st == 200
        assert cat["database"]["cubes"][0]["id"] == "c"
        assert cat["database"]["cubes"][0]["cells_count"] == 2
        st, out = call("POST", "/cells/get", {
            "database": "restdb", "cube": "c", "members": ["All", "Total"]})
        assert (st, out["value"]) == (200, 3.0)
        st, out = call("PUT", "/cells", {
            "database": "restdb", "cube": "c",
            "members": ["a", "y"], "value": 5.0})
        assert st == 200
        st, out = call("POST", "/cells/batch", {
            "database": "restdb", "cube": "c",
            "addresses": [["All", "Total"], ["a", "y"], ["b", "x"]]})
        assert (st, out["values"]) == (200, [8.0, 5.0, None])
        st, out = call("POST", "/query", {
            "database": "restdb",
            "sql": "SELECT d1, value FROM c WHERE d1=(a, b), d2=Total"})
        assert st == 200 and len(out["records"]) == 2
        st, out = call("GET", "/views?database=restdb&cube=c&rows=d1&columns=d2")
        assert st == 200
        grid = {tuple(r["row"]): r["cells"] for r in out["rows"]}
        assert grid[("All",)][0] == 8.0  # (All, Total) after the PUT above
        # errors: unknown cube -> 4xx with a detail message
        st, out = call("POST", "/cells/get", {
            "database": "restdb", "cube": "nope", "members": ["a", "x"]})
        assert st in (400, 404) and "detail" in out
        # aggregate write rejected through the API too
        st, out = call("PUT", "/cells", {
            "database": "restdb", "cube": "c",
            "members": ["All", "Total"], "value": 1.0})
        assert st in (400, 404) and "detail" in out
    finally:
        srv.shutdown()


def test_reference_convenience_surface(tiny2):
    """Round-2 parity sweep: the reference's procedural get_*/member_*
    APIs, Member navigation extras, Cube/Database/Area/Cell conveniences."""
    db, cube, _ = tiny2

    months = db.dimension("months")
    # Dimension procedural family (names, like the reference)
    assert "Jan" in months.get_members()
    assert set(months.get_leaves()) >= {"Jan", "Dec"}
    assert "Q1" in months.get_aggregated_members()
    assert months.get_root_members() == ["Year"]
    assert months.get_members_by_level(1) == ["Q1", "Q2", "Q3", "Q4"]
    assert months.get_top_level() == 2 and months.top_level == 2
    assert months.member_exists("jan") and not months.member_exists("nope")
    assert months.member_get_children("Q1") == ["Jan", "Feb", "Mar"]
    assert months.member_get_parents("Jan") == ["Q1"]
    assert len(months.member_get_leaves("Year")) == 12
    assert months.member_get_level("Q1") == 1
    assert months.member_is_leave("Jan") and months.member_is_root("Year")
    measures = db.dimension("measures")
    assert measures.is_weighted  # Profit has a -1 weight
    assert not months.is_weighted

    # aliases
    months.member_add_alias("Jan", "January")
    assert months.member_has_alias("January")
    assert months.member_aliases_count("Jan") == 1
    assert months.get_member_by_alias("January") == "Jan"
    months.remove_alias("Jan", "January")
    assert not months.member_has_alias("January")

    # Member navigation extras
    jan = months.member("Jan")
    assert jan.qualified_name == "months:Jan"
    assert jan.parent().name == "Q1" and jan.up().name == "Q1"
    assert months.member("Q1").child(1).name == "Feb"
    assert months.member("Q1").down().name == "Jan"
    assert jan.root().name == "Year"
    assert jan.has_parents and not months.member("Year").has_parents
    assert months.member("Q1").has_children and not jan.has_children
    assert months.member("Q1").children_count == 3
    assert jan.parents_count == 1
    assert months.member("Q1").is_parent_of("Jan")
    assert jan.has_next and not months.member("Year").has_next

    # Cube conveniences
    assert cube.get_dimension_by_index(0).name == "years"
    assert cube.get_dimension("months") is months
    assert cube.get_dimension_ordinal("months") == 1
    assert cube.get_dimension_ordinal("nope") == -1
    assert cube.dimension_contained("measures")
    assert cube.dimensions_count == 5
    assert "months" in cube.dimension_names
    cube.reset_counters()
    assert cube.counter_cell_requests == 0
    ok, report = cube.validate_rules()
    assert isinstance(ok, bool) and isinstance(report, str)
    assert '"name"' in cube.to_json()

    # Database conveniences
    assert db.cube_exists("sales") and not db.cube_exists("nope")
    assert db.dimension_exists("months")
    v = db.get(("sales", "2021", "Jan", "North", "coupe", "Sales"))
    db.set(("sales", "2021", "Jan", "North", "coupe", "Sales"), 42.0)
    assert db.get(("sales", "2021", "Jan", "North", "coupe", "Sales")) == 42.0
    db.set(("sales", "2021", "Jan", "North", "coupe", "Sales"), v)  # restore

    # Area conveniences
    area = cube.area("2021")
    c2 = area.clone()
    assert c2.filters == area.filters and c2 is not area
    assert area.refresh() is area
    assert next(iter(area.enumerate()))  # yields addresses
    area.alter("2022")
    assert area.filters != c2.filters

    # Cell conveniences
    cell = cube.cell("2021", "Jan", "North", "coupe", "Sales")
    assert cell.cube is cube
    assert isinstance(cell.numeric_value, float)
    shifted = cell.alter("Feb")
    assert shifted.address[1] == "Feb" and cell.address[1] == "Jan"


def test_graphql_surface(spark):
    """Q6 (reference api/graphql/graphql_schema.py): the reference schema —
    read/Cell, write mutation — executed by the stdlib GraphQL-subset
    executor, both directly and over HTTP POST /graphql."""
    import json
    import urllib.request

    from tinyolap_spark import Database
    from tinyolap_spark.api import RestServer
    from tinyolap_spark.graphql import GraphQLExecutor

    db = Database("gqldb", spark=spark)
    d1 = db.add_dimension("d1").edit()
    d1.add_many("All", ["a", "b"])
    d1.commit()
    d2 = db.add_dimension("d2").edit()
    d2.add_many("Total", ["x", "y"])
    d2.commit()
    cube = db.add_cube("c", [d1, d2])
    cube.write_rows([("a", "x", 1.0), ("b", "y", 2.0)])

    gx = GraphQLExecutor(db)
    # read with alias, sub-selection, inline args
    out = gx.execute(
        'query { top: read(cube: "c", address: ["All", "Total"]) '
        "{ cube address value } }"
    )
    assert out == {
        "data": {
            "top": {
                "cube": "c",
                "address": ["All", "Total"],
                "value": 3.0,
            }
        }
    }
    # mutation with $variables, then read back
    out = gx.execute(
        "mutation W($v: Float!) { write(cube: \"c\", "
        'address: ["a", "y"], value: $v) }',
        variables={"v": 5.0},
    )
    assert out == {"data": {"write": True}}
    out = gx.execute('{ read(cube: "c", address: ["All", "Total"]) { value } }')
    assert out["data"]["read"]["value"] == 8.0
    # catalog + databases root fields
    out = gx.execute("{ databases catalog { id cubes { id } } }")
    assert out["data"]["databases"] == ["gqldb"]
    assert out["data"]["catalog"]["cubes"][0]["id"] == "c"
    # random_read returns a well-formed Cell off a leaf address
    out = gx.execute("{ random_read { cube address } }")
    assert out["data"]["random_read"]["cube"] == "c"
    assert len(out["data"]["random_read"]["address"]) == 2
    # errors -> spec envelope
    out = gx.execute('{ read(cube: "nope", address: ["a", "x"]) { value } }')
    assert "errors" in out and "nope" in out["errors"][0]["message"]
    out = gx.execute("query {{{")
    assert "errors" in out

    # over HTTP
    srv = RestServer(db).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/graphql",
            data=json.dumps(
                {
                    "query": 'query Q($a: [String!]) { read(cube: "c", '
                    "address: $a) { value } }",
                    "variables": {"a": ["b", "Total"]},
                }
            ).encode(),
            method="POST",
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert out == {"data": {"read": {"value": 2.0}}}
    finally:
        srv.shutdown()
