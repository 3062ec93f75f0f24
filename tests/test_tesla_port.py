"""Differential port of the reference 'tesla' sample
(/root/reference/samples/tesla.py:23-86): the full end-to-end workflow a
reference user runs — 5-dim cube, weighted Delta member, Delta % rule,
partial-address Area indexing (`cube["Plan"]`), existing-cell mass write,
dense-space fill, cross-slice transform copy, aggregated rule reads.

The sample's random Actual data is replaced with a constant so every
value is arithmetically determined and asserted exactly."""

import pytest

from tinyolap_spark import Area, Database


@pytest.fixture(scope="module")
def tesla(spark):
    db = Database("tesla", spark=spark)
    dt = db.add_dimension("datatypes").edit()
    dt.add_many(["Actual", "Plan"])
    dt.add_many("Delta", ["Actual", "Plan"], [1.0, -1.0])
    dt.add_many("Delta %")
    dt.commit()
    yrs = db.add_dimension("years").edit()
    yrs.add_many(["2021", "2022", "2023"])
    yrs.commit()
    per = db.add_dimension("periods").edit()
    per.add_many("Year", ["Q1", "Q2", "Q3", "Q4"])
    per.commit()
    reg = db.add_dimension("regions").edit()
    reg.add_many("Total", ["North", "South", "West", "East"])
    reg.commit()
    prod = db.add_dimension("products").edit()
    prod.add_many("Total", ["Model S", "Model 3", "Model X", "Model Y"])
    prod.commit()
    cube = db.add_cube("sales", [dt, yrs, per, reg, prod])

    def delta_percent(c):
        if c.Plan:  # prevent division by zero (reference tesla.py:13-17)
            return c.Delta / c.Plan
        return None

    cube.register_rule(delta_percent, trigger=["datatypes:Delta %"])
    db.dimensions["datatypes"].member_set_format("Delta", "{:+,.0f}")
    db.dimensions["datatypes"].member_set_format("Delta %", "{:+.2%}")
    return db, cube


def test_partial_address_returns_area(tesla):
    db, cube = tesla
    assert isinstance(cube["Plan"], Area)
    assert isinstance(cube["Plan", "2023"], Area)


def test_tesla_workflow_golden(tesla):
    db, cube = tesla
    # single writes (tesla.py:50-51)
    cube["Plan", "2021", "Q1", "North", "Model S"] = 400.0
    cube["Plan", "2021", "Q1", "North", "Model X"] = 200.0
    # mass write over EXISTING cells only (tesla.py:59)
    cube["Plan"] = 500.0
    assert cube["Plan", "2021", "Q1", "North", "Model S"] == 500.0
    assert cube["Plan", "2021", "Q1", "North", "Model X"] == 500.0
    assert cube["Plan"].count() == 2  # only the 2 stored cells changed
    # dense fill over the whole Plan space (tesla.py:65):
    # 3 years x 4 quarters x 4 regions x 4 products = 192 cells
    cube["Plan"].set_value(500.0, True)
    assert cube["Plan"].count() == 192
    # 2023 plan = 2022 plan * 1.5 (tesla.py:67)
    cube["Plan", "2023"] = cube["Plan", "2022"] * 1.50
    assert cube["Plan", "2023", "Q1", "North", "Model S"] == 750.0
    assert cube["Plan", "2023", "Year", "Total", "Total"] == pytest.approx(
        750.0 * 64
    )
    # Actual: the sample uses a random generator; a constant keeps every
    # downstream value exact (tesla.py:72)
    cube["Actual"].set_value(600.0, True)
    # weighted Delta rollup (Actual - Plan)
    assert cube["Delta", "2021", "Q1", "North", "Model S"] == pytest.approx(
        100.0
    )
    assert cube["Delta", "2023", "Q1", "North", "Model S"] == pytest.approx(
        -150.0
    )
    # Delta % rule at base and aggregated addresses (tesla.py:81-82)
    assert cube["Delta %", "2021", "Q1", "North", "Model S"] == pytest.approx(
        0.2
    )
    dev = cube["Delta %", "2023", "Year", "Total", "Total"]
    assert dev == pytest.approx((600.0 - 750.0) / 750.0)  # -20% above plan
    # formats survived (tesla.py:46-48)
    dt = db.dimensions["datatypes"]
    assert dt.member_get_format("Delta %") == "{:+.2%}"
    assert f"{dev:+.2%}" == "-20.00%"
    # partial-address delete clears a slice (reference cube.py:296-301)
    del cube["Actual", "2021"]
    assert cube["Actual", "2021", "Q1", "North", "Model S"] is None
    assert cube["Actual", "2022", "Q1", "North", "Model S"] == 600.0
