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

import json
import os

import pytest

from tinyolap_spark import Database, RuleScope, rule

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "enterprise_model.json"
)


@pytest.fixture(scope="module")
def enterprise(spark):
    with open(FIXTURE) as f:
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
