"""Server — multi-database container (reference ``tinyolap/server.py:13-150``):
a session-level registry of named databases."""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import SparkSession

from .database import Database
from .metadata import TinyOlapError


class Server:
    def __init__(self, spark: Optional[SparkSession] = None):
        self.spark = spark or SparkSession.getActiveSession()
        self._databases: dict[str, Database] = {}

    def create_database(self, name: str) -> Database:
        key = name.lower()
        if key in self._databases:
            raise TinyOlapError(f"database '{name}' already exists")
        db = Database(name, spark=self.spark)
        self._databases[key] = db
        db._server = self
        return db

    def add_database(self, db: Database) -> Database:
        key = db.name.lower()
        if key in self._databases:
            raise TinyOlapError(f"database '{db.name}' already exists")
        self._databases[key] = db
        db._server = self  # rename() re-keys the registry through this
        return db

    def _rekey(self, old_name: str, db: Database) -> None:
        """Called by Database.rename so the registry key follows the name
        (otherwise lookups/"in"/delete desync after a rename)."""
        new_key = db.name.lower()
        if new_key in self._databases and self._databases[new_key] is not db:
            raise TinyOlapError(f"database '{db.name}' already exists")
        self._databases.pop(old_name.lower(), None)
        self._databases[new_key] = db

    def open_database(self, path: str, name: Optional[str] = None) -> Database:
        db = Database.open(path, spark=self.spark)
        if name:
            db.name = name
        return self.add_database(db)

    def delete_database(self, name: str) -> None:
        db = self._databases.pop(name.lower())
        db.close()

    def __getitem__(self, name: str) -> Database:
        return self._databases[name.lower()]

    def __contains__(self, name: str) -> bool:
        return name.lower() in self._databases

    def __iter__(self) -> Iterator[Database]:
        return iter(self._databases.values())

    def __len__(self) -> int:
        return len(self._databases)

    @property
    def databases(self) -> list[str]:
        return [db.name for db in self._databases.values()]
