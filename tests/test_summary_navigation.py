"""Aggregate navigation (Cube.add_summary): materialized summary tables
transparently answer eligible rollups — differential-tested against an
identical cube with no summaries (same seed, same writes).

Eligibility contract: a query routes to a summary iff every DROPPED
dimension is requested only at trivial tops (weight-1, all-covering).
Kept dims stay at leaf grain in the summary, so weighted closure rollups
(Profit = Sales - Cost; multi-parent products) must be bit-identical.
"""

import pytest
from pyspark.sql import functions as F

from tinyolap_spark import View


@pytest.fixture()
def pair(spark):
    from conftest import build_tiny

    _, plain, _ = build_tiny(spark, seed=7)
    _, summ, _ = build_tiny(spark, seed=7)
    # drop regions + products: dashboards over time x measures route
    summ.add_summary(["years", "months", "measures"])
    yield plain, summ
    summ.drop_summaries()
    plain._fact.unpersist()
    summ._fact.unpersist()


MONTH_ROWS = ["Year", "Q1", "Q2", "Jan", "Jun"]
MEASURE_COLS = ["Sales", "Cost", "Profit"]


def _grid(cube):
    v = View(
        cube,
        filters=[
            ("years", "All years"),
            ("regions", "Total"),
            ("products", "Total"),
        ],
        rows=[("months", MONTH_ROWS)],
        columns=[("measures", MEASURE_COLS)],
    ).refresh()
    return {
        (m, msr): v.cell_by_names([m], [msr])
        for m in MONTH_ROWS
        for msr in MEASURE_COLS
    }


def test_summary_routed_grid_matches_fact_path(pair):
    plain, summ = pair
    want = _grid(plain)
    hits0 = summ.counter_summary_hits
    got = _grid(summ)
    assert got == want
    assert summ.counter_summary_hits > hits0, "grid did not route"
    s = summ._summaries[0]
    assert s["rows"] < summ.fact.count(), "summary is not smaller"


def test_summary_routed_point_reads_match(pair):
    plain, summ = pair
    addrs = [
        ("All years", "Year", "Total", "Total", "Profit"),
        ("2022", "Q3", "Total", "Total", "Sales"),
        ("2021", "Jan", "Total", "Total", "Cost"),
    ]
    want = plain.get_many(addrs)
    hits0 = summ.counter_summary_hits
    got = summ.get_many(addrs)
    assert got == pytest.approx(want)
    assert summ.counter_summary_hits > hits0


def test_dropped_dim_drilldown_stays_on_fact(pair):
    plain, summ = pair
    # regions="North" and products="best sellers" are NOT trivial tops of
    # the dropped dims -> ineligible, must fall back to the fact and agree
    addrs = [
        ("All years", "Year", "North", "Total", "Sales"),
        ("2021", "Q2", "Total", "best sellers", "Profit"),
    ]
    want = plain.get_many(addrs)
    hits0 = summ.counter_summary_hits
    got = summ.get_many(addrs)
    assert got == pytest.approx(want)
    assert summ.counter_summary_hits == hits0, "ineligible query routed"


def test_write_invalidates_summary(pair):
    plain, summ = pair
    addr = ("All years", "Year", "Total", "Total", "Sales")
    before = summ.get_many([addr])[0]
    for cube in (plain, summ):
        cube["2021", "Jan", "North", "coupe", "Sales"] = 100_000.0
        cube._cache.clear()
    # interactive writes buffer until the next read flushes them — the
    # flush replaces the fact, which must mark the summary stale
    summ._flush()
    assert summ._summaries[0]["df"] is None, "write did not mark stale"
    got = summ.get_many([addr])[0]
    want = plain.get_many([addr])[0]
    assert got == pytest.approx(want)
    assert got != pytest.approx(before)
    assert summ._summaries[0]["df"] is not None, "summary did not rebuild"


def test_add_summary_validation(pair):
    _, summ = pair
    with pytest.raises(ValueError):
        summ.add_summary(["nope"])
    with pytest.raises(ValueError):
        summ.add_summary(
            ["years", "months", "regions", "products", "measures"]
        )


def test_additive_load_folds_into_summary(pair, spark):
    """Streaming-shaped additive loads fold the BATCH into built
    summaries (batch-sized work) instead of marking them stale for a
    full-fact rebuild; values equal the no-summary cube afterwards."""
    plain, summ = pair
    addr = ("All years", "Year", "Total", "Total", "Sales")
    warm = summ.get_many([addr])[0]  # ensure the summary frame is built
    assert summ._summaries[0]["df"] is not None
    frame_before = summ._summaries[0]["df"]

    cols = summ._cols
    y = summ.dimensions[0].member("2022").index
    mth = summ.dimensions[1].member("Feb").index
    reg = summ.dimensions[2].member("South").index
    prod = summ.dimensions[3].member("sedan").index
    msr = summ.dimensions[4].member("Sales").index
    batch = spark.createDataFrame(
        [(y, mth, reg, prod, msr, 5_000.0)],
        schema=f"{cols[0]} int, {cols[1]} int, {cols[2]} int, "
        f"{cols[3]} int, {cols[4]} int, value double",
    )
    for cube in (plain, summ):
        cube.load_dataframe(batch, additive=True)
        cube._cache.clear()
    # the summary frame was REPLACED by a fold, not nulled stale
    assert summ._summaries[0]["df"] is not None
    assert summ._summaries[0]["df"] is not frame_before
    got = summ.get_many([addr])[0]
    want = plain.get_many([addr])[0]
    assert got == pytest.approx(want)
    assert got == pytest.approx(warm + 5_000.0)


def test_summary_specs_survive_save_open(spark, tmp_path):
    """Database.save persists summary SPECS (frames are derived state);
    open re-registers them and the frame rebuilds lazily on the first
    eligible query, answering identically."""
    from conftest import build_tiny
    from tinyolap_spark import Database

    db, cube, _ = build_tiny(spark, seed=11)
    cube.add_summary(["years", "months", "measures"])
    addr = ("All years", "Year", "Total", "Total", "Profit")
    want = cube.get_many([addr])[0]
    p = str(tmp_path / "db")
    db.save(p)
    cube.drop_summaries()
    cube._fact.unpersist()

    db2 = Database.open(p, spark)
    cube2 = db2.cube("sales")
    assert [s["kept"] for s in cube2._summaries] == [
        ("years", "months", "measures")
    ]
    assert cube2._summaries[0]["df"] is None  # lazy until first use
    hits0 = cube2.counter_summary_hits
    got = cube2.get_many([addr])[0]
    assert got == pytest.approx(want)
    assert cube2.counter_summary_hits > hits0
    assert cube2._summaries[0]["df"] is not None
    cube2.drop_summaries()
    cube2._fact.unpersist()


def test_suggest_summaries_mines_workload_and_applies(spark):
    """The advisor recommends the keep-set a recurring dashboard needs,
    estimates its grain from metadata, and apply=True makes the next
    identical query route to the built summary."""
    from conftest import build_tiny

    from tinyolap_spark import View

    _, cube, _ = build_tiny(spark, seed=11)
    try:
        assert cube.suggest_summaries() == []  # no workload logged yet

        def dashboard():
            v = View(
                cube,
                filters=[("regions", "Total"), ("products", "Total")],
                rows=[("months", ["Q1", "Q2", "Q3", "Q4"])],
                columns=[
                    ("years", ["2021", "2022"]),
                    ("measures", ["Sales", "Cost", "Profit"]),
                ],
            ).refresh()
            return {
                (q, y, m): v.cell_by_names([q], [y, m])
                for q in ["Q1", "Q2", "Q3", "Q4"]
                for y in ["2021", "2022"]
                for m in ["Sales", "Cost", "Profit"]
            }

        fact_path = None
        for _ in range(3):
            fact_path = dashboard()
        sugg = cube.suggest_summaries(max_summaries=1)
        assert sugg, "recurring dashboard must produce a suggestion"
        top = sugg[0]
        assert set(top["keep_dims"]) == {"months", "years", "measures"}
        assert top["requests_covered"] >= 3
        assert 0 < top["fraction"] <= 0.5
        assert top["est_rows"] < cube.cells_count

        # apply and prove the router uses it
        cube.suggest_summaries(max_summaries=1, apply=True)
        assert cube._summaries
        hits0 = cube.counter_summary_hits
        routed = dashboard()
        assert cube.counter_summary_hits > hits0, "summary not routed"
        assert routed == fact_path, "summary path changed values"
    finally:
        cube.drop_summaries()
        cube._fact.unpersist()


def test_suggest_summaries_skips_fact_sized_keeps(spark):
    """A workload that drills into EVERY dimension yields no suggestion —
    the only serving summary would be the fact itself."""
    from conftest import build_tiny

    _, cube, _ = build_tiny(spark, seed=12)
    try:
        cube._request_sigs.clear()
        cube._request_sigs[frozenset(cube.dim_cols)] += 5
        assert cube.suggest_summaries() == []
    finally:
        cube._fact.unpersist()


def test_suggest_summaries_refines_sparse_grain(spark):
    """VERDICT r7 #8: a sparse cube whose Π-leaf-count estimate exceeds
    max_fraction must still get its keep-set recommended — the advisor
    refines metadata-rejected candidates with ONE batched
    approx_count_distinct pass over the fact."""
    from tinyolap_spark import Database

    db = Database("sparse", spark=spark)
    d1 = db.add_dimension("d1").edit()
    d1.add_many("All1", [f"a{i}" for i in range(200)])
    d1.commit()
    d2 = db.add_dimension("d2").edit()
    d2.add_many("All2", [f"b{i}" for i in range(200)])
    d2.commit()
    d3 = db.add_dimension("d3").edit()
    d3.add_many("All3", [f"c{i}" for i in range(20)])
    d3.commit()
    cube = db.add_cube("f", [d1, d2, d3])
    try:
        # 50 distinct (d1, d2) combos x 20 d3 members = 1000 rows:
        # metadata screen sees 200*200 = 40k >> fact -> frac 1.0 ->
        # rejected; the true grain is 50 rows -> frac 0.05 -> keep
        rows = [
            (f"a{i % 50}", f"b{(i * 7) % 50}", f"c{j}", 1.0)
            for i in range(50)
            for j in range(20)
        ]
        df = spark.createDataFrame(
            rows, "d1 string, d2 string, d3 string, v double"
        )
        cube.load_dataframe(df, value_col="v", by_name=True)
        c1, c2 = cube._cols[0], cube._cols[1]
        cube._request_sigs.clear()
        cube._request_sigs[frozenset({c1, c2})] += 5
        sugg = cube.suggest_summaries(max_summaries=1, max_fraction=0.5)
        assert sugg, "sparse keep-set must survive via the refined grain"
        assert set(sugg[0]["keep_dims"]) == {"d1", "d2"}
        assert sugg[0]["fraction"] <= 0.2  # approx distinct, not Π leaves
    finally:
        cube._fact.unpersist()


def test_suggest_summaries_is_deterministic(spark):
    """ADVICE r8: the refine pass measures candidate grains with
    approx_count_distinct (~2% rsd), so borderline candidates could flip
    in/out across runs; the rsd safety margin makes the advisor's output
    a pure function of cube state — identical across repeated calls."""
    from conftest import build_tiny

    from tinyolap_spark import View

    _, cube, _ = build_tiny(spark, seed=13)
    try:
        for _ in range(3):
            View(
                cube,
                filters=[("regions", "Total"), ("products", "Total")],
                rows=[("months", ["Q1", "Q2", "Q3", "Q4"])],
                columns=[("years", ["2021", "2022"]),
                         ("measures", ["Sales", "Cost"])],
            ).refresh()
        # low max_fraction pushes candidates through the measured-grain
        # refine pass (the nondeterminism ADVICE targeted)
        runs = [
            cube.suggest_summaries(max_summaries=2, max_fraction=0.1)
            for _ in range(3)
        ]
        assert runs[0] == runs[1] == runs[2], runs
    finally:
        cube._fact.unpersist()
