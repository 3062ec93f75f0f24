"""Config constants (reference ``config.py:1-23``) and the snapshot
manager (reference ``package.py:1-150`` — here fully functional:
create / inventory / delete-by-date / restore-with-restore-point)."""

from datetime import datetime

from tinyolap_spark import Database
from tinyolap_spark.config import Config
from tinyolap_spark.package import SnapshotManager


def test_config_constants():
    assert Config.VERSION
    assert Config.LOWEST_COMPATIBLE_VERSION <= Config.VERSION
    assert Config.BUILTIN_VALUE_TYPES["float"] is float
    assert set(Config.BUILTIN_VALUE_TYPES) == {
        "str", "int", "float", "bool", "complex", "list", "tuple",
        "range", "dict", "set", "bytes", "bytearray",
    }
    assert Config.ContentTypes.DIMENSION.endswith(".Dimension")
    assert Config.ContentTypes.RULES.endswith(".Rules")


def _db(spark, name):
    db = Database(name, spark=spark)
    d = db.add_dimension("d").edit()
    d.add_many("All", ["a", "b"])
    d.commit()
    cube = db.add_cube("c", [d])
    cube[("a",)] = 1.0
    cube[("b",)] = 2.0
    return db, cube


def test_snapshot_create_restore_delete(spark, tmp_path):
    db, cube = _db(spark, "snapdb")
    mgr = SnapshotManager(db, folder=str(tmp_path))
    assert len(mgr) == 0

    snap = mgr.create()
    assert len(mgr) == 1
    assert snap.database_name == "snapdb"
    assert snap.name.endswith(".snapshot")
    assert mgr[0] == mgr[snap.name]

    # mutate AFTER the snapshot; restore must see the old value
    cube[("a",)] = 99.0
    restored = mgr.restore(snap, create_restore_point=False)
    assert restored.cubes["c"][("a",)] == 1.0
    assert restored.cubes["c"][("All",)] == 3.0

    # restore point is written when requested
    db2 = mgr.restore(snap.name, create_restore_point=True)
    assert db2.cubes["c"][("b",)] == 2.0
    import os

    assert any(
        e.endswith(".restore") for e in os.listdir(str(tmp_path / "snapshots"))
    )

    # crash leftovers (snapshot dir without the _SNAPSHOT_OK marker,
    # i.e. save() died mid-write) are swept on refresh
    leftover = (
        tmp_path / "snapshots" / "snapdb.2020-01-01-00-00-00-000000.snapshot"
    )
    leftover.mkdir()
    mgr.refresh()
    assert not leftover.exists()
    assert len(mgr) == 1

    assert mgr.delete(before_date=datetime.max) == 1
    assert len(mgr) == 0


def test_database_snapshots_property_anchors_to_save_path(spark, tmp_path):
    import os

    db, cube = _db(spark, "snapdb2")
    primary = str(tmp_path / "primary")
    db.save(primary)
    mgr = db.snapshots          # anchored to the last save() location
    assert db.snapshots is mgr  # cached
    s1 = mgr.create()
    assert s1.path.startswith(os.path.join(primary, "snapshots"))
    # snapshot + restore-point writes must NOT re-anchor the default
    # folder: a second snapshot lands beside the first, not inside it
    db.snapshots.restore(s1, create_restore_point=True)
    s2 = mgr.create()
    assert os.path.dirname(s2.path) == os.path.dirname(s1.path)
    # and a later primary save re-anchors cleanly for a NEW manager
    db.save(primary)
    assert db._storage_path == primary
    # side copies (clone / export) keep the primary anchor too
    db.clone("c2")
    db.export(str(tmp_path / "exported"))
    assert db._storage_path == primary
