"""Differential port of the reference 'enterprise' sales cube.

`tests/fixtures/enterprise_model.json` was captured by RUNNING the
reference engine (`samples/enterprise_model/model.py:26-84`,
`create_database(num_legal_entities=5, num_products=10)` under a fixed
seed): dimension structures (member insertion order + weighted
parent-child edges), the 2,684 base fact rows of the `sales` cube, and 12
golden cell values — additive aggregates at several levels plus the
`Price = Sales / Quantity` ALL_LEVELS rule
(`samples/enterprise_model/model.py:678-681`) and empty-cell None
semantics.  The test rebuilds the same model here and must reproduce
every golden."""

import gzip
import json
import os

import pytest

from tinyolap_spark import Database, RuleScope, rule

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "enterprise_model.json.gz"
)


@pytest.fixture(scope="module")
def enterprise(spark):
    with gzip.open(FIXTURE, "rt") as f:
        fx = json.load(f)
    db = Database("enterprise_port", spark=spark)
    dims = []
    for d in fx["dims"]:
        dim = db.add_dimension(d["name"]).edit()
        for m in d["order"]:
            dim.add_many(m)
        for parent, child, w in d["edges"]:
            dim.add_member(parent, [child], [w])
        dim.commit()
        dims.append(dim)
    cube = db.add_cube("sales", dims)

    @rule("sales", trigger=["salesfig:Price"], scope=RuleScope.ALL_LEVELS)
    def price(c):
        quantity = c["salesfig:Quantity"]
        if quantity:
            return c["salesfig:Sales"] / quantity

    cube.register_rule(price)
    cube.write_rows(
        [tuple(addr) + (value,) for addr, value in fx["facts"]]
    )
    return cube, fx


def test_enterprise_fixture_shape(enterprise):
    cube, fx = enterprise
    assert cube.cells_count == len(fx["facts"])
    # weighted edges survived the rebuild
    periods = cube.dimensions[1]
    assert [m.name for m in periods.member("Q2").children] == [
        "Apr", "Mai", "Jun",
    ]


def test_enterprise_reference_goldens(enterprise):
    cube, fx = enterprise
    for addr, want in fx["goldens"]:
        got = cube[tuple(addr)]
        if want is None:
            assert got is None, (addr, got)
        else:
            assert got == pytest.approx(want, rel=1e-9), (
                f"{addr}: spark={got!r} reference={want!r}"
            )


@pytest.fixture(scope="module")
def enterprise_pnl(spark):
    """The enterprise `pnl` cube: weighted variance members (ACTvsPL =
    Actual - Plan via +1/-1 edges) and the reference's seven datatype
    variance rules incl. YEAR-SHIFT reads (`c.member("years").previous`,
    `samples/enterprise_model/model.py:686-749`)."""
    with gzip.open(FIXTURE, "rt") as f:
        fx = json.load(f)["pnl"]
    db = Database("enterprise_pnl_port", spark=spark)
    dims = []
    for d in fx["dims"]:
        dim = db.add_dimension(d["name"]).edit()
        for m in d["order"]:
            dim.add_many(m)
        for parent, child, w in d["edges"]:
            dim.add_member(parent, [child], [w])
        dim.commit()
        dims.append(dim)
    cube = db.add_cube("pnl", dims)

    @rule("pnl", trigger=["ACTvsPL%"], scope=RuleScope.ALL_LEVELS)
    def actvspl_pct(c):
        plan = c["datatype:Plan"]
        if plan:
            return (c["datatype:Actual"] - plan) / plan
        return None

    @rule("pnl", trigger=["ACTvsFC%"], scope=RuleScope.ALL_LEVELS)
    def actvsfc_pct(c):
        fc = c["datatype:Forecast"]
        if fc:
            return (c["datatype:Actual"] - fc) / fc
        return None

    @rule("pnl", trigger=["FCvsPL%"], scope=RuleScope.ALL_LEVELS)
    def fcvspl_pct(c):
        plan = c["datatype:Plan"]
        if plan:
            return (c["datatype:Forecast"] - plan) / plan
        return None

    @rule("pnl", trigger=["FCvsACTpy"], scope=RuleScope.ALL_LEVELS)
    def fcvsactpy(c):
        prev_year = c.member("years").previous
        if prev_year:
            return c["datatype:Forecast"] - c[
                "years:" + str(prev_year), "datatype:Actual"
            ]
        return None

    @rule("pnl", trigger=["FCvsACTpy%"], scope=RuleScope.ALL_LEVELS)
    def fcvsactpy_pct(c):
        prev_year = c.member("years").previous
        if prev_year:
            actual = c["years:" + str(prev_year), "datatype:Actual"]
            if actual:
                return (c["datatype:Forecast"] - actual) / actual
        return None

    @rule("pnl", trigger=["ACTvsACTpy"], scope=RuleScope.ALL_LEVELS)
    def actvactpy(c):
        prev_year = c.member("years").previous
        if prev_year:
            return c["datatype:Actual"] - c[
                "years:" + str(prev_year), "datatype:Actual"
            ]
        return None

    @rule("pnl", trigger=["ACTvsACTpy%"], scope=RuleScope.ALL_LEVELS)
    def actvactpy_pct(c):
        prev_year = c.member("years").previous
        if prev_year:
            actual = c["years:" + str(prev_year), "datatype:Actual"]
            if actual:
                return (c["datatype:Actual"] - actual) / actual
        return None

    for fn in [actvspl_pct, actvsfc_pct, fcvspl_pct, fcvsactpy,
               fcvsactpy_pct, actvactpy, actvactpy_pct]:
        cube.register_rule(fn)
    cube.write_rows(
        [tuple(addr) + (value,) for addr, value in fx["facts"]]
    )
    return cube, fx


def test_enterprise_pnl_reference_goldens(enterprise_pnl):
    cube, fx = enterprise_pnl
    assert cube.cells_count == len(fx["facts"])
    for addr, want in fx["goldens"]:
        got = cube[tuple(addr)]
        if want is None:
            assert got is None, (addr, got)
        else:
            assert got == pytest.approx(want, rel=1e-9), (
                f"{addr}: spark={got!r} reference={want!r}"
            )
