"""Persistence round-trip (Parquet + JSON metadata), CSV/tutor import,
dimension edit lifecycle with fact cleanup."""

import os

import pytest

from tinyolap_spark import Database


def test_database_save_open_roundtrip(spark, tmp_path):
    from conftest import build_tiny

    db, cube, rows = build_tiny(spark, seed=21)
    path = str(tmp_path / "tinydb")
    want_cell = cube["2021", "Q1", "Total", "Total", "Profit"]
    want_count = cube.cells_count
    db.save(path)

    db2 = Database.open(path, spark=spark)
    cube2 = db2.cube("sales")
    assert cube2.cells_count == want_count
    assert cube2["2021", "Q1", "Total", "Total", "Profit"] == pytest.approx(
        want_cell
    )
    # hierarchy survived: weighted member + multi-parent + subset + attribute
    measures = db2.dimension("measures")
    assert measures.member("Profit").level == 1
    assert db2.dimension("products").member("sports").parents[0].name in (
        "cars", "best sellers",
    )
    assert [m.name for m in db2.dimension("months").subset("summer").members] == [
        "Jun", "Jul", "Aug", "Sep",
    ]
    assert db2.dimension("regions").get_attribute("manager", "North") == "Peter Parker"
    # formats survived
    assert measures.member("Profit").format == "{:+,.0f}"


def test_export_clone(spark, tmp_path):
    from conftest import build_tiny

    db, cube, rows = build_tiny(spark, seed=22)
    p1 = str(tmp_path / "exported")
    db.export(p1)
    db3 = Database.open(p1, spark=spark)
    assert db3.cube("sales").cells_count == cube.cells_count


def test_history_persists_through_save_open(spark, tmp_path):
    """VERDICT r3 #10: undo depth survives save/open (reference
    HistoryMode.PERSIST) — a pre-save write can be undone after reopen."""
    db = Database("hist_db", spark=spark)
    d = db.add_dimension("d").edit()
    d.add_many("All", ["a", "b"])
    d.commit()
    cube = db.add_cube("c", [d])
    cube["a"] = 1.0
    cube["b"] = 2.0
    cube["a"] = 10.0  # the write to undo after reopen
    assert cube["All"] == pytest.approx(12.0)
    p = str(tmp_path / "hist_saved")
    db.save(p)
    # in-session undo still correct after save-to-path (entries were
    # re-pointed at the written version files)
    assert db.history.can_undo

    db2 = Database.open(p, spark=spark)
    cube2 = db2.cube("c")
    assert cube2["All"] == pytest.approx(12.0)
    assert db2.history.can_undo
    db2.history.undo()
    assert cube2["a"] == pytest.approx(1.0)
    assert cube2["All"] == pytest.approx(3.0)
    db2.history.undo()
    assert cube2["All"] == pytest.approx(1.0)
    # redo returns to the saved state
    db2.history.redo(2)
    assert cube2["All"] == pytest.approx(12.0)


def test_tutor_level_file_import(spark, tmp_path):
    """FIXTURES A5: unbalanced hierarchy from C/N marker rows incl.
    non-ASCII member names."""
    from tinyolap_spark.sources.csvimport import (
        dimension_from_level_file,
        facts_from_csv,
    )

    lines = [
        ("C", "Deutschland"),
        ("N", "Bayern"),
        ("N", "Baden-Württemberg"),
        ("C", "Österreich"),
        ("N", "Wien"),
        ("N", "Kärnten"),
    ]
    regionen = dimension_from_level_file("regionen", lines)
    assert regionen.member("Deutschland").level == 1
    assert [m.name for m in regionen.member("Österreich").children] == [
        "Wien", "Kärnten",
    ]

    jahre = regionen.__class__("jahre")
    jahre.edit()
    jahre.add_many("Alle Jahre", ["2022", "2023"])
    jahre.commit()

    db = Database("tutor", spark=spark)
    db.dimensions["regionen"] = regionen
    db.dimensions["jahre"] = jahre
    cube = db.add_cube("umsatz", [regionen, jahre])

    csv_path = str(tmp_path / "facts.csv")
    with open(csv_path, "w", encoding="utf-8") as f:
        f.write("region,jahr,betrag\n")
        f.write("Bayern,2022,100.5\n")
        f.write("Wien,2022,50.25\n")
        f.write("Kärnten,2023,10.0\n")
        f.write("Baden-Württemberg,2023,39.75\n")
    facts_from_csv(
        spark, cube, csv_path,
        dim_columns={"region": "regionen", "jahr": "jahre"},
        value_column="betrag",
    )
    assert cube["Deutschland", "Alle Jahre"] == pytest.approx(140.25)
    assert cube["Österreich", "2022"] == pytest.approx(50.25)
    assert cube["Österreich", "Alle Jahre"] == pytest.approx(60.25)


def test_dimension_edit_purges_orphan_facts(spark):
    """Reference database.py:634-645: committing a dimension edit that
    removes members must purge orphaned fact rows."""
    db = Database("edit_db", spark=spark)
    d = db.add_dimension("d").edit()
    d.add_many("Total", ["A", "B", "C"])
    d.commit()
    cube = db.add_cube("c", [d])
    cube.write_rows([("A", 1.0), ("B", 2.0), ("C", 4.0)])
    assert cube["Total"] == pytest.approx(7.0)

    removed_idx = d.member("C").index
    d.edit()
    d.remove_member("C")
    d.commit()
    db.purge_orphans(d)
    assert cube["Total"] == pytest.approx(3.0)
    assert cube.cells_count == 2
    # removed member unknown now
    with pytest.raises(Exception):
        cube["C"]


def test_dimension_rollback(spark):
    db = Database("rb_db", spark=spark)
    d = db.add_dimension("d").edit()
    d.add_many("Total", ["A", "B"])
    d.commit()
    d.edit()
    d.add_many("Total", ["X"])
    d.rollback()
    assert "X" not in d
    assert len(d) == 3


def test_history_undo_redo_cell_writes(spark):
    """S7 parity (reference history.py:329-417): one undo step per cell
    write; undo reverts, redo re-applies, a new write clears redo."""
    from tinyolap_spark import Database

    db = Database("hist", spark=spark)
    d = db.add_dimension("d").edit()
    d.add_many("All", ["a", "b"])
    d.commit()
    cube = db.add_cube("c", [d])
    cube[("a",)] = 1.0
    cube[("b",)] = 2.0
    cube[("a",)] = 5.0
    assert cube[("All",)] == 7.0
    assert db.history.can_undo
    db.history.undo()                      # revert a=5 -> a=1
    assert cube[("a",)] == 1.0 and cube[("All",)] == 3.0
    db.history.undo(2)                     # revert both writes
    assert cube[("a",)] is None and cube[("All",)] is None
    assert db.history.redo(3) == 3         # replay all
    assert cube[("a",)] == 5.0 and cube[("All",)] == 7.0
    db.history.undo()
    cube[("b",)] = 9.0                     # new write clears redo
    assert not db.history.can_redo
    assert cube[("All",)] == 10.0


def test_history_bulk_and_area_ops(spark):
    from tinyolap_spark import Database

    db = Database("hist2", spark=spark)
    d = db.add_dimension("d").edit()
    d.add_many("All", ["a", "b"])
    d.commit()
    m = db.add_dimension("m").edit()
    m.add_many("x")
    m.add_many("y")
    m.commit()
    cube = db.add_cube("c", [d, m])
    cube.write_rows([("a", "x", 1.0), ("b", "x", 2.0)])
    cube.area("All", ("x",)).set_value(10.0)   # area transform
    assert cube[("All", "x")] == 20.0
    db.history.undo()                          # undo area fill
    assert cube[("All", "x")] == 3.0
    db.history.undo()                          # undo bulk write
    assert cube[("All", "x")] is None
    assert db.history.redo() == 1
    assert cube[("All", "x")] == 3.0


def test_history_disabled(spark):
    from tinyolap_spark import Database

    db = Database("hist3", spark=spark)
    d = db.add_dimension("d").edit()
    d.add_many("All", ["a"])
    d.commit()
    cube = db.add_cube("c", [d])
    db.history.enabled = False
    cube[("a",)] = 1.0
    assert not db.history.can_undo


def test_encrypted_save_open_roundtrip(spark, tmp_path):
    """S9 (reference encryption.py): values AES-GCM-encrypted on disk,
    decrypted on open with the password; wrong password raises; the
    parquet files hold no plaintext value column."""
    from tinyolap_spark import Database, TinyOlapError

    path = str(tmp_path / "enc")
    db = Database("encdb", spark=spark)
    d = db.add_dimension("d").edit()
    d.add_many("All", ["a", "b"])
    d.commit()
    cube = db.add_cube("c", [d])
    cube.write_rows([("a", 1.5), ("b", "note")])  # numeric + string cell
    db.save(path, password="s3cret")

    raw = spark.read.parquet(f"{path}/cubes/c.parquet")
    assert "value" not in raw.columns and "value_enc" in raw.columns
    assert dict(raw.dtypes)["value_enc"] == "binary"

    db2 = Database.open(path, spark=spark, password="s3cret")
    assert db2.cube("c")[("a",)] == 1.5
    assert db2.cube("c")[("b",)] == "note"
    assert db2.cube("c")[("All",)] == 1.5  # strings do not aggregate

    import pytest as _pytest

    with _pytest.raises(TinyOlapError, match="password"):
        Database.open(path, spark=spark)
    with _pytest.raises(TinyOlapError, match="password"):
        Database.open(path, spark=spark, password="wrong")
