"""Deterministic 1:1 port of the reference 'planespotter' sample
(/root/reference/samples/planespotter.py:23-175 and the distance math in
/root/reference/samples/planespotter_model/flight_data.py:32-127).

The reference sample pulls LIVE opensky-network data, so it cannot run
reproducibly; this port replays a canned snapshot fixture
(tests/fixtures/opensky_snapshot.csv — two snapshots of plane states
around Berlin) through the IDENTICAL model/rule flow:

- 10x10 km-raster horz/vert dimensions (-300..+250 km in 50 km steps);
- a planes dimension REBUILT per update (country hierarchy, iterable
  ``remove_member`` of vanished planes, re-entrant edit/commit);
- the ``count``/``altitude`` data dimension with a number format;
- the AGGREGATION_LEVEL average-altitude rule using ``BYPASS_RULES``
  (planespotter.py:60-70);
- ``cube.clear()`` + per-plane ``set`` with raster rounding/clamping
  (planespotter.py:97-122);
- the two Slice reports (planespotter.py:145-161).

Golden cells are computed by an independent pure-Python replay of the
same snapshot (dict arithmetic, no Spark).
"""

import csv
import math
import os
from math import asin, atan2, cos, degrees, radians, sin, sqrt

import pytest

from tinyolap_spark import Database, Slice
from tinyolap_spark.rules import RuleScope

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "opensky_snapshot.csv")
BERLIN = (52.5200, 13.4050)
RADIUS = 250
RASTER = 50


# ---------------------------------------------------------------- distance
# Haversine / displacement math as in flight_data.py:40-68 (public
# movable-type formulas).
def _distance_km(lat1, lon1, lat2, lon2) -> float:
    r = 6373.0
    la1, lo1, la2, lo2 = map(radians, (lat1, lon1, lat2, lon2))
    a = sin((la2 - la1) / 2) ** 2 + cos(la1) * cos(la2) * sin((lo2 - lo1) / 2) ** 2
    return r * 2 * atan2(sqrt(a), sqrt(1 - a))


def _flight_rows(snapshot: int):
    """The FlightData.update() twin (flight_data.py:100-127) over the
    canned fixture: (callsign, country, distance, vert_km, horz_km,
    baro_altitude) per plane state."""
    clat, clon = BERLIN
    sign = lambda x: math.copysign(1, x)  # noqa: E731
    out = []
    with open(FIXTURE) as f:
        for row in csv.DictReader(f):
            if int(row["snapshot"]) != snapshot:
                continue
            lat, lon = float(row["lat"]), float(row["long"])
            dist = _distance_km(lat, lon, clat, clon)
            vert = -sign(clon - lon) * _distance_km(clat, lon, clat, clon)
            horz = -sign(clat - lat) * _distance_km(lat, clon, clat, clon)
            alt = float(row["baro_altitude"]) if row["baro_altitude"] else None
            out.append((row["callsign"], row["origin_country"], dist, vert, horz, alt))
    return out


def _raster(km: float) -> str:
    """Raster rounding + clamping (planespotter.py:100-113)."""
    v = round(km / RASTER, 0) * RASTER
    v = max(-RADIUS, min(RADIUS, v))
    return f"{int(v):+} km"


# ----------------------------------------------------------------- model
def _rule_average_altitude(c):
    """planespotter.py:60-70 — average altitude on aggregated cells."""
    altitude = c["altitude", c.BYPASS_RULES]
    count = c["count"]
    if count != 0.0 and count is not None:
        if altitude is None:
            return None
        return altitude / count
    return None


def create_database(spark) -> Database:
    """planespotter.py:23-58 1:1."""
    db = Database("planespotter", spark=spark)
    dim_horz = db.add_dimension("horz").edit()
    dim_vert = db.add_dimension("vert").edit()
    for i in range(-RADIUS - RASTER, RADIUS + RASTER, RASTER):
        dim_horz.add_many("Total", f"{i:+} km")
        dim_vert.add_many("Total", f"{i:+} km")
    dim_horz.commit()
    dim_vert.commit()

    dim_plane = db.add_dimension("planes").edit()
    dim_plane.add_many("some plane")
    dim_plane.add_many("All", "some plane")
    dim_plane.commit()

    dim_data = db.add_dimension("data").edit()
    dim_data.add_many(["count", "altitude"])
    dim_data.commit()
    dim_data.member_set_format("altitude", "{:,.0f} ft")

    cube = db.add_cube("planes", [dim_horz, dim_vert, dim_plane, dim_data])
    cube.register_rule(
        _rule_average_altitude,
        trigger=["data:altitude"],
        scope=RuleScope.AGGREGATION_LEVEL,
    )
    return db


def update_database(db: Database, snapshot: int):
    """planespotter.py:72-125 1:1 against the canned snapshot."""
    dim_planes = db.dimensions["planes"]
    cube = db.cubes["planes"]
    data = _flight_rows(snapshot)

    dim_planes.edit()
    new_planes = [p[0] for p in data]
    countries = [p[1] for p in data]
    planes_to_remove = set(dim_planes.get_leaves()).difference(set(new_planes))
    if planes_to_remove:
        dim_planes.remove_member(list(planes_to_remove))
    for idx, plane in enumerate(new_planes):
        if plane:  # unnamed (military) planes are skipped
            dim_planes.add_many("All", countries[idx])
            dim_planes.add_many(countries[idx], plane)
    dim_planes.commit()

    cube.clear()
    for name, country, distance, vert_km, horz_km, altitude in data:
        if name:
            horz, vert = _raster(horz_km), _raster(vert_km)
            cube.set((horz, vert, name, "count"), 1)
            cube.set((horz, vert, name, "altitude"), float(altitude or 0.0))
    return cube


def _expected(snapshot: int):
    """Independent pure-dict replay: per-(horz,vert) named-plane count
    and altitude sum, plus per-country rollups."""
    cells, by_country = {}, {}
    for name, country, _d, vert_km, horz_km, alt in _flight_rows(snapshot):
        if not name:
            continue
        key = (_raster(horz_km), _raster(vert_km))
        c, a = cells.get(key, (0, 0.0))
        cells[key] = (c + 1, a + (alt or 0.0))
        cc, ca = by_country.get(country, (0, 0.0))
        by_country[country] = (cc + 1, ca + (alt or 0.0))
    return cells, by_country


@pytest.fixture(scope="module")
def spotter(spark):
    db = create_database(spark)
    cube = update_database(db, snapshot=1)
    return db, cube


def test_snapshot1_raster_counts_and_total(spotter):
    db, cube = spotter
    cells, by_country = _expected(1)
    n_named = sum(c for c, _ in cells.values())
    assert n_named == 10  # 12 states, 2 unnamed
    # every populated raster cell holds its exact count at the All level
    for (horz, vert), (cnt, _asum) in cells.items():
        assert cube[horz, vert, "All", "count"] == pytest.approx(cnt)
    assert cube["Total", "Total", "All", "count"] == pytest.approx(n_named)
    # per-country rollup through the rebuilt hierarchy
    for country, (cnt, _asum) in by_country.items():
        assert cube["Total", "Total", country, "count"] == pytest.approx(cnt)


def test_average_altitude_rule(spotter):
    """The AGGREGATION_LEVEL rule divides BYPASS_RULES altitude sums by
    counts on every aggregated cell (planespotter.py:60-70)."""
    db, cube = spotter
    cells, by_country = _expected(1)
    n_named = sum(c for c, _ in cells.values())
    alt_sum = sum(a for _, a in cells.values())
    assert cube["Total", "Total", "All", "altitude"] == pytest.approx(
        alt_sum / n_named
    )
    for country, (cnt, asum) in by_country.items():
        assert cube["Total", "Total", country, "altitude"] == pytest.approx(
            asum / cnt
        )
    # base cells stay raw stored altitude (rule is aggregation-scope only)
    (horz, vert) = next(iter(cells))
    some = [
        (n, a)
        for n, _c, _d, v, h, a in _flight_rows(1)
        if n and (_raster(h), _raster(v)) == (horz, vert)
    ]
    name, alt = some[0]
    assert cube[horz, vert, name, "altitude"] == pytest.approx(alt or 0.0)


def test_update_to_snapshot2_rebuilds_planes(spotter):
    """Second update: vanished planes removed (iterable remove_member),
    new plane/country added, cube cleared and reloaded
    (planespotter.py:72-125)."""
    db, cube = spotter
    cube2 = update_database(db, snapshot=2)
    leaves = set(db.dimensions["planes"].get_leaves())
    assert "BEL404" in leaves  # new in snapshot 2
    assert "DLH456" not in leaves and "UAL900" not in leaves  # vanished
    assert "some plane" not in leaves  # the seed member was rebuilt away
    cells, by_country = _expected(2)
    n_named = sum(c for c, _ in cells.values())
    assert n_named == 7  # 8 states, 1 unnamed
    assert cube2["Total", "Total", "All", "count"] == pytest.approx(n_named)
    assert "Belgium" in {m.name for m in db.dimensions["planes"].members}
    alt_sum = sum(a for _, a in cells.values())
    assert cube2["Total", "Total", "All", "altitude"] == pytest.approx(
        alt_sum / n_named
    )
    # re-run snapshot 1 so the module fixture's other tests stay valid
    update_database(db, snapshot=1)


def test_slice_reports_render(spotter):
    """The two report definitions (planespotter.py:145-161) render."""
    db, cube = spotter
    dim_planes = db.dimensions["planes"]
    plane_list = (
        ["All"]
        + sorted(m.name for m in dim_planes.members_by_level(1))
        + sorted(dim_planes.get_leaves())
    )
    r1 = Slice(
        cube,
        {
            "title": f"Planes {RADIUS:,} km around Berlin...",
            "header": [
                {"dimension": "planes", "member": "All"},
                {"dimension": "data", "member": "count"},
            ],
            "columns": [{"dimension": "vert"}],
            "rows": [{"dimension": "horz"}],
        },
    )
    out1 = str(r1)
    assert "Planes 250 km around Berlin" in out1
    r2 = Slice(
        cube,
        {
            "title": f"First 10 planes (out of {len(list(dim_planes.members))})...",
            "header": [
                {"dimension": "vert", "member": "Total"},
                {"dimension": "horz", "member": "Total"},
            ],
            "rows": [{"dimension": "data"}],
            "columns": [{"dimension": "planes", "members": plane_list}],
        },
    )
    out2 = str(r2)
    assert "DLH123" in out2
    # altitude format applies in the rendered grid ("{:,.0f} ft")
    assert " ft" in out2
