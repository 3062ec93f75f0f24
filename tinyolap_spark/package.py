"""Database snapshot inventory & restore — the "package" surface.

Parity target: reference ``tinyolap/package.py:1-150`` (``Package`` /
``PackageManager``/``SnapshotManager``: timestamped ``*.snapshot``
exports of a database plus inventory, delete-by-date and restore).  The
reference leaves ``delete``/``refresh``/``restore`` unimplemented
(``package.py:125-139`` raise/pass); here every operation is functional
on top of :meth:`tinyolap_spark.database.Database.save` / ``open`` —
a snapshot is just a normal persisted database directory whose name
carries the creation timestamp, so "restore" is an ordinary ``open()``
and snapshots survive process crashes (a ``_SNAPSHOT_OK`` marker is
written LAST, so a partially-written snapshot lacks it and is swept by
:meth:`SnapshotManager.refresh` — a rename-based commit would invalidate
the live database's just-truncated parquet lineage, so marker-commit is
the Spark-safe variant of the reference's ``.snapshot~`` temp protocol).
"""

from __future__ import annotations

import os
import re
import shutil
from dataclasses import dataclass, field
from datetime import datetime
from typing import Iterator, List, Optional

_TS_FMT = "%Y-%m-%d-%H-%M-%S-%f"
_OK_MARKER = "_SNAPSHOT_OK"
_SNAP_RE = re.compile(
    r"^(?P<db>.+)\.(?P<ts>\d{4}-\d{2}-\d{2}-\d{2}-\d{2}-\d{2}-\d{6})"
    r"\.snapshot$"
)


@dataclass(frozen=True)
class Snapshot:
    """One timestamped snapshot directory (reference ``Package``:
    name / description-by-convention / created)."""

    path: str
    database_name: str
    created: datetime

    @property
    def name(self) -> str:
        return os.path.basename(self.path)


class SnapshotManager:
    """Inventory + lifecycle of a database's snapshots.

    Snapshots live under ``<folder>/snapshots/`` as
    ``<db>.<YYYY-mm-dd-HH-MM-SS-ffffff>.snapshot`` directories — normal
    persisted databases with a timestamped name, exactly the reference's
    file-naming contract (``package.py:146-150``).
    """

    def __init__(self, database, folder: Optional[str] = None):
        self._database = database
        base = folder or getattr(database, "path", None) or "."
        self.folder = base  # anchor; Database.snapshots rebuilds on move
        self._folder = os.path.join(base, "snapshots")
        self._snapshots: List[Snapshot] = []
        self.refresh()

    # -- inventory ----------------------------------------------------
    def __iter__(self) -> Iterator[Snapshot]:
        return iter(self._snapshots)

    def __len__(self) -> int:
        return len(self._snapshots)

    def __getitem__(self, item) -> Snapshot:
        if isinstance(item, int):
            return self._snapshots[item]
        for s in self._snapshots:
            if s.name == item:
                return s
        raise KeyError(item)

    def refresh(self) -> None:
        """Re-read the snapshot inventory from the filesystem; sweep
        incomplete snapshot directories (no ``_SNAPSHOT_OK`` marker —
        crash leftovers; the reference warns against concurrent
        multi-process access to the same folder, ``package.py:83-87``,
        so an in-progress create by another process is out of scope)."""
        self._snapshots = []
        if not os.path.isdir(self._folder):
            return
        for entry in sorted(os.listdir(self._folder)):
            full = os.path.join(self._folder, entry)
            m = _SNAP_RE.match(entry)
            if m and not os.path.exists(os.path.join(full, _OK_MARKER)):
                shutil.rmtree(full, ignore_errors=True)
                continue
            if m and os.path.isdir(full):
                self._snapshots.append(
                    Snapshot(
                        path=full,
                        database_name=m.group("db"),
                        created=datetime.strptime(m.group("ts"), _TS_FMT),
                    )
                )

    # -- lifecycle ----------------------------------------------------
    def _save_without_reanchor(self, path: str) -> None:
        """Save to ``path`` without re-pointing the database's storage
        anchor at it: snapshot/restore-point writes are side copies, and
        ``Database.snapshots``'s default folder must keep following the
        PRIMARY save location (a snapshot re-anchoring would nest the
        next snapshot inside the previous one)."""
        db = self._database
        prev = getattr(db, "_storage_path", None)
        try:
            db.save(path)
        finally:
            if hasattr(db, "_storage_path"):
                db._storage_path = prev

    def create(self) -> Snapshot:
        """Write a new snapshot; the ``_SNAPSHOT_OK`` marker is written
        LAST, so a crash mid-write never leaves a valid-looking one."""
        os.makedirs(self._folder, exist_ok=True)
        stamp = datetime.now().strftime(_TS_FMT)
        final = os.path.join(
            self._folder, f"{self._database.name}.{stamp}.snapshot"
        )
        if os.path.exists(final):
            shutil.rmtree(final)
        self._save_without_reanchor(final)
        with open(os.path.join(final, _OK_MARKER), "w") as f:
            f.write(stamp)
        self.refresh()
        return self[os.path.basename(final)]

    def delete(self, before_date=None, after_date=None) -> int:
        """Delete snapshots; both bounds ``None`` deletes all
        (reference ``package.py:125-131`` contract). Returns count."""
        doomed = [
            s
            for s in self._snapshots
            if (before_date is None or s.created < before_date)
            and (after_date is None or s.created > after_date)
        ]
        for s in doomed:
            shutil.rmtree(s.path, ignore_errors=True)
        self.refresh()
        return len(doomed)

    def restore(self, snapshot, create_restore_point: bool = True):
        """Open a database from ``snapshot`` (a :class:`Snapshot` or its
        name).  With ``create_restore_point`` (default, reference
        ``package.py:31-47``) the CURRENT database state is first saved
        as a ``*.restore`` sibling so the pre-restore state is
        recoverable. Returns the restored :class:`Database`."""
        if not isinstance(snapshot, Snapshot):
            snapshot = self[snapshot]
        if create_restore_point:
            os.makedirs(self._folder, exist_ok=True)
            stamp = datetime.now().strftime(_TS_FMT)
            rp = os.path.join(
                self._folder, f"{self._database.name}.{stamp}.restore"
            )
            self._save_without_reanchor(rp)
        from .database import Database

        return Database.open(snapshot.path, spark=self._database.spark)
