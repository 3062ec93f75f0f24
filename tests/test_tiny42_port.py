"""Differential port of the reference 'tiny42' sample
(/root/reference/samples/tiny42.py:23-124): template database cloning,
per-machine dimension growth through re-entered edit sessions,
consolidation (member union, template-member removal, area-records copy),
and an AGGREGATION_LEVEL average rule using the BYPASS_RULES modifier.

Deterministic twin: 3 machines with fixed sensors/timestamps/values so
every consolidated cell is asserted exactly (the sample uses random data
and wall-clock timestamps)."""

import pytest

from tinyolap_spark import Database, RuleScope


def _template(spark, name="tiny42_template"):
    db = Database(name, spark=spark)
    t = db.add_dimension("time").edit()
    t.add_many("Total")
    t.commit()
    s = db.add_dimension("sensors").edit()
    s.add_many("machine", "sensor")  # scalar child, as the sample writes it
    s.commit()
    v = db.add_dimension("values").edit()
    v.add_many(["count", "temperature"])
    v.commit()
    db.add_cube("sensors", [s, t, v])
    return db


# machine -> sensor -> {timestamp: temperature}
MACHINES = {
    "m_0001": {
        "m_0001_s_00": {"t1": 10.0, "t2": 20.0},
        "m_0001_s_01": {"t1": 30.0, "t2": 40.0},
    },
    "m_0002": {"m_0002_s_00": {"t1": 50.0}},
}


def test_tiny42_consolidation_workflow(spark):
    template = _template(spark)

    # one clone per machine; each grows its own dimensions and writes data
    machine_dbs = []
    for mname, sensors in MACHINES.items():
        mdb = template.clone()
        mdb.rename(mname)
        assert mdb.name == mname
        dim_s = mdb.dimensions["sensors"]
        dim_t = mdb.dimensions["time"]
        cube = mdb.cube("sensors")
        e = dim_s.edit()
        e.add_many(mname, list(sensors))
        e.commit()
        for sname, series in sensors.items():
            for ts, temp in series.items():
                if not dim_t.member_exists(ts):
                    te = dim_t.edit()
                    te.add_many(ts)
                    te.commit()
                cube.set((sname, ts, "count"), 1.0)
                cube.set((sname, ts, "temperature"), temp)
        machine_dbs.append(mdb)

    # ---- consolidate (sample lines 86-124) ----
    consolidated = template.clone()
    consolidated.rename("TinyMarmaladeFactory")
    timestamps = sorted(
        {m for db in machine_dbs for m in db.dimensions["time"].get_members()}
        - {"Total"}
    )
    te = consolidated.dimensions["time"].edit()
    te.add_many("Total", timestamps)
    te.commit()
    dim_sensors = consolidated.dimensions["sensors"].edit()
    for mdb in machine_dbs:
        mname = mdb.dimensions["sensors"].get_root_members()[1]
        dim_sensors.add_many("Total", mname)
        dim_sensors.add_many(
            mname, mdb.dimensions["sensors"].member_get_children(mname)
        )
    dim_sensors.remove_member(["sensor", "machine"])  # template leftovers
    dim_sensors.commit()
    assert not consolidated.dimensions["sensors"].member_exists("machine")

    target = consolidated.cube("sensors")
    for value in consolidated.dimensions["values"].get_members():
        for mdb in machine_dbs:
            for record in mdb.cube("sensors").area(str(value)).records():
                target.set(record[:3], record[3])

    def rule_average_temperature(c):
        count = c["count"]
        temperature = c["temperature", c.BYPASS_RULES]
        if count:  # reference guards `count != 0.0` (missing reads are 0.0
            # there, None here — same branch either way)
            return temperature / count
        return "n.a."

    target.register_rule(
        rule_average_temperature,
        trigger=["values:temperature"],
        scope=RuleScope.AGGREGATION_LEVEL,
    )

    # ---- exact assertions ----
    # base cells: raw values, rule does not fire at base level
    assert target["m_0001_s_00", "t1", "temperature"] == 10.0
    assert target["m_0002_s_00", "t1", "count"] == 1.0
    # aggregated: average via the rule (BYPASS_RULES raw sum / count)
    assert target["m_0001", "Total", "temperature"] == pytest.approx(25.0)
    assert target["m_0002", "Total", "temperature"] == pytest.approx(50.0)
    assert target["Total", "Total", "temperature"] == pytest.approx(30.0)
    # count aggregates additively (no rule on count)
    assert target["Total", "Total", "count"] == 5.0
    # per-timestamp machine aggregate (sensors aggregated, time leaf)
    assert target["m_0001", "t2", "temperature"] == pytest.approx(30.0)


def test_bypass_rules_never_aliases_cell_cache(spark):
    """Review regression: the cell cache stores RULE values for
    rule-matched addresses — a BYPASS_RULES read must neither consume
    nor poison it, in either read order."""
    from tinyolap_spark.cube import BYPASS_RULES

    db = Database("bypass_cache", spark=spark)
    d = db.add_dimension("d").edit()
    d.add_many("All", ["a", "b"])
    d.commit()
    m = db.add_dimension("m").edit()
    m.add_many("Qty")
    m.add_many("Sales")
    m.commit()
    cube = db.add_cube("c", [d, m])
    cube.write_rows([
        ("a", "Qty", 2.0), ("b", "Qty", 3.0),
        ("a", "Sales", 999.0), ("b", "Sales", 999.0),  # raw stored values
    ])

    def sales(c):
        return c["Qty"] * 10.0

    cube.register_rule(
        sales, trigger=["m:Sales"], scope=RuleScope.BASE_LEVEL,
        feeder=["m:Qty"],
    )
    # rule first, then bypass: raw aggregate, not the cached rule value
    assert cube["All", "Sales"] == pytest.approx(50.0)
    raw = cube.cell("All", "Sales")[BYPASS_RULES]
    assert raw == pytest.approx(1998.0)
    # bypass first, then rule: rule value, not the raw read
    cube._cache.clear()
    assert cube.cell("All", "Sales")[BYPASS_RULES] == pytest.approx(1998.0)
    assert cube["All", "Sales"] == pytest.approx(50.0)


def test_remove_member_accepts_member_object(spark):
    db = Database("rm_member", spark=spark)
    d = db.add_dimension("d").edit()
    d.add_many("All", ["a", "b"])
    m = d.member("a")
    d.remove_member(m)  # Member object, not a name
    d.commit()
    assert not d.member_exists("a") and d.member_exists("b")


def test_server_registry_follows_rename(spark):
    from tinyolap_spark import Server, TinyOlapError

    srv = Server(spark=spark)
    db = srv.create_database("olddb")
    srv.create_database("taken")
    db.rename("newdb")
    assert "newdb" in srv and "olddb" not in srv
    assert srv["newdb"] is db
    with pytest.raises(TinyOlapError, match="already exists"):
        db.rename("taken")
    assert db.name == "newdb"  # rolled back on collision
    with pytest.raises(TinyOlapError, match="invalid"):
        db.rename("")
    srv.delete_database("newdb")
    assert "newdb" not in srv


def test_add_many_set_is_deterministic(spark):
    db = Database("set_det", spark=spark)
    d = db.add_dimension("d").edit()
    d.add_many({"zeta", "alpha", "mid"})  # set input -> sorted order
    d.commit()
    assert [m.name for m in d.members] == ["alpha", "mid", "zeta"]
