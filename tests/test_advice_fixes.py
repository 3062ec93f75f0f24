"""Regression tests for the round-1 ADVICE findings:

1. writes through a Cell cursor to an aggregated address raise
   (reference ``cube.py:540`` raises TinyOlapInvalidOperationError);
2. ``Database.save()`` back to the path the db was opened from works
   (lineage must not scan the destination during the overwrite);
3. ON_ENTRY push rules are called with ``(cell, value)`` like the
   reference (``cube.py:536``), one-arg rules still accepted;
4. ``write_rows`` with a None value deletes the cell instead of
   inserting a (None, None) tombstone;
5. ``rename_member`` to an existing name raises.
"""

import pytest

from tinyolap_spark import Database, DimensionEditError, InvalidCellWriteError
from tinyolap_spark.rules import RuleScope


def _small_db(spark, name="advice"):
    db = Database(name, spark=spark)
    d1 = db.add_dimension("d1").edit()
    d1.add_many("All", ["a", "b"])
    d1.commit()
    d2 = db.add_dimension("d2").edit()
    d2.add_many("Total", ["x", "y"])
    d2.commit()
    cube = db.add_cube("c", [d1, d2])
    return db, cube


def test_cell_cursor_write_to_aggregate_raises(spark):
    db, cube = _small_db(spark, "advice1")
    cube[("a", "x")] = 1.0
    cell = cube.cell("a", "x")
    with pytest.raises(InvalidCellWriteError):
        cell["All"] = 5.0
    with pytest.raises(InvalidCellWriteError):
        cell["d2:Total"] = 5.0
    # base-level shifted write still fine
    cell["b"] = 2.0
    assert cube[("b", "x")] == 2.0
    # aggregate unaffected by the rejected writes
    assert cube[("All", "x")] == 3.0


def test_save_over_opened_path(spark, tmp_path):
    path = str(tmp_path / "db")
    db, cube = _small_db(spark, "advice2")
    cube.write_rows([("a", "x", 1.0), ("b", "y", 2.0)])
    db.save(path)
    db2 = Database.open(path, spark=spark)
    c2 = db2.cube("c")
    c2[("a", "y")] = 3.0
    db2.save(path)  # must not fail with overwrite-while-reading
    db3 = Database.open(path, spark=spark)
    assert db3.cube("c")[("a", "y")] == 3.0
    assert db3.cube("c")[("All", "Total")] == 6.0


def test_on_entry_rule_two_arg(spark):
    db, cube = _small_db(spark, "advice3")
    seen = []

    def push(c, value):
        seen.append((c.address, value))
        c["b"] = value * 2

    cube.register_rule(push, trigger=["d1:a"], scope=RuleScope.ON_ENTRY)
    cube[("a", "x")] = 10.0
    assert seen == [((("a", "x")), 10.0)] or seen[0][1] == 10.0
    assert cube[("b", "x")] == 20.0


def test_on_entry_rule_one_arg_still_accepted(spark):
    db, cube = _small_db(spark, "advice3b")
    seen = []

    def push(c):
        seen.append(c.address)

    cube.register_rule(push, trigger=["d1:a"], scope=RuleScope.ON_ENTRY)
    cube[("a", "x")] = 1.0
    assert seen and seen[0] == ("a", "x")


def test_write_rows_none_deletes(spark):
    db, cube = _small_db(spark, "advice4")
    cube.write_rows([("a", "x", 1.0), ("b", "x", 2.0)])
    assert cube.cells_count == 2
    cube.write_rows([("a", "x", None)])
    assert cube.cells_count == 1
    assert cube[("a", "x")] is None
    # rollup over the deleted cell reports remaining value, not 0-inflated
    assert cube[("All", "x")] == 2.0


def test_rename_member_collision_raises(spark):
    db, cube = _small_db(spark, "advice5")
    d1 = db.dimension("d1").edit()
    with pytest.raises(DimensionEditError):
        d1.rename_member("a", "b")
    with pytest.raises(DimensionEditError):
        d1.rename_member("a", "B")  # case-insensitive
    d1.rename_member("a", "a2")  # legal rename still works
    d1.commit()
    assert db.dimension("d1").member("a2").name == "a2"
