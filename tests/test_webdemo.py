"""Web-demo port (reference ``samples/tesla_web_demo.py``): deterministic
tesla model, seeded random report rendering, and the live route surface
(``/``, ``/report``, ``/nextreport``, ``/info``) over the stdlib server."""

import json
import urllib.request

import pytest

from tinyolap_spark.webdemo import (
    WebDemoServer,
    play_tesla,
    random_report_def,
    render_report,
)


@pytest.fixture(scope="module")
def tesla_db(spark):
    db = play_tesla(spark)
    yield db
    db.cube("sales")._fact.unpersist()


@pytest.mark.slow
def test_play_tesla_golden_values(tesla_db):
    """The deterministic model reproduces the reference sample's
    arithmetic (tesla.py:50-82 with constant Actuals)."""
    cube = tesla_db.cube("sales")
    assert cube["Plan", "2021", "Q1", "North", "Model S"] == 500.0
    assert cube["Plan", "2023", "Q1", "North", "Model S"] == 750.0
    assert cube["Actual", "2022", "Q1", "North", "Model S"] == 600.0
    dev = cube["Delta %", "2023", "Year", "Total", "Total"]
    assert dev == pytest.approx((600.0 - 750.0) / 750.0)
    assert f"{dev:+.2%}" == "-20.00%"


def test_render_report_seeded_golden(tesla_db):
    """Same seed -> same layout -> same HTML; the table carries real
    cube values and the footer carries the counters."""
    import random

    cube = tesla_db.cube("sales")
    html1, rdef = render_report(cube, rng=random.Random(7))
    html2, _ = render_report(cube, rdef)  # refresh of the SAME report
    # layout is pinned by the definition, so the table body is identical
    assert html1.split("<footer>")[0] == html2.split("<footer>")[0]
    assert "<table" in html1 and "Random report on cube" in html1
    # a fresh seed rolls the same layout deterministically
    rdef2 = random_report_def(cube, random.Random(7))
    assert rdef2 == rdef


def test_webdemo_routes_live(tesla_db):
    demo = WebDemoServer(tesla_db, seed=7).start()
    try:
        base = demo.url

        def get(path):
            with urllib.request.urlopen(f"{base}{path}", timeout=120) as r:
                return r.status, r.read().decode()

        st, first = get("/")
        assert st == 200 and "<table" in first
        st, again = get("/report")  # same report re-rendered
        assert st == 200
        assert again.split("<footer>")[0] == first.split("<footer>")[0]
        st, rolled = get("/nextreport")  # new random layout
        assert st == 200 and "<table" in rolled
        st, info = get("/info")
        info = json.loads(info)
        assert info["service"] == "tinyolap_spark"
        assert {"name": "tesla"} in info["databases"]
        st = urllib.request.urlopen(f"{base}/info", timeout=120).status
        assert st == 200
    finally:
        demo.stop()


# ---------------- enterprise + tutor variants (reference parity, r9)
@pytest.fixture(scope="module")
def enterprise_db(spark):
    from tinyolap_spark.webdemo import play_enterprise

    db = play_enterprise(spark)
    yield db
    for name in ("sales", "pnl"):
        db.cube(name)._fact.unpersist()


@pytest.mark.slow
def test_enterprise_webdemo_routes_live(enterprise_db):
    """The enterprise shell (samples/enterprise_web_demo.py): several
    cubes in one database, a RANDOM one per new report, db name in the
    title."""
    demo = WebDemoServer(
        enterprise_db, ["sales", "pnl"], seed=11, show_db_in_title=True
    ).start()
    try:
        base = demo.url

        def get(path):
            with urllib.request.urlopen(f"{base}{path}", timeout=240) as r:
                return r.status, r.read().decode()

        st, first = get("/")
        assert st == 200 and "<table" in first
        assert "from database <strong>enterprise</strong>" in first
        # rolling enough new reports hits BOTH cubes (seeded rng)
        seen = set()
        for _ in range(6):
            st, rolled = get("/nextreport")
            assert st == 200 and "<table" in rolled
            for cname in ("sales", "pnl"):
                if f"cube <strong>{cname}</strong>" in rolled:
                    seen.add(cname)
            if len(seen) == 2:
                break
        assert seen == {"sales", "pnl"}, seen
        st, info = get("/info")
        info = json.loads(info)
        assert {"name": "enterprise"} in info["databases"]
    finally:
        demo.stop()


@pytest.fixture(scope="module")
def tutor_db(spark):
    import os

    from tinyolap_spark.webdemo import _default_tutor_dir, play_tutor

    tdir = _default_tutor_dir()
    if tdir is None or not os.path.isdir(tdir):
        pytest.skip("reference tutor_model TXT files not available")
    db = play_tutor(spark)
    yield db
    db.cube("verkauf")._fact.unpersist()


def test_tutor_webdemo_routes_live(tutor_db):
    """The tutor shell (samples/tutor_web_demo.py): the German Verkauf
    cube served with the same route surface."""
    demo = WebDemoServer(
        tutor_db, "verkauf", seed=3, show_db_in_title=True
    ).start()
    try:
        base = demo.url

        def get(path):
            with urllib.request.urlopen(f"{base}{path}", timeout=240) as r:
                return r.status, r.read().decode()

        st, first = get("/")
        assert st == 200 and "<table" in first
        assert "cube <strong>verkauf</strong>" in first
        assert "from database <strong>tutor</strong>" in first
        st, again = get("/report")
        assert again.split("<footer>")[0] == first.split("<footer>")[0]
        st, rolled = get("/nextreport")
        assert st == 200 and "<table" in rolled
        st, info = get("/info")
        assert {"name": "tutor"} in json.loads(info)["databases"]
    finally:
        demo.stop()


def test_demo_server_variant_dispatch(spark):
    from tinyolap_spark.webdemo import demo_server

    with pytest.raises(ValueError):
        demo_server(spark, "nope")
