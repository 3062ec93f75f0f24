"""Delimited-file import (reference sample idiom: ``samples/tutor.py:63-131``
builds dimensions from TXT files with C/N level markers and facts from a
delimited value file).

Two surfaces:

- :func:`dimension_from_level_file` — parse a (marker, name) file into a
  parent-child hierarchy: ``C`` rows open a consolidated (parent) node,
  ``N`` rows are leaves attached to the most recent ``C`` node at the
  previous level.  This mirrors the tutor TXT format.
- :func:`facts_from_csv` — ``spark.read.csv`` with schema -> cube bulk load
  by member NAMES (executor-side name->id mapping via broadcast join, see
  ``Cube.load_dataframe(by_name=True)``) — the 100 TB-safe path: the CSV
  scan never funnels through the driver.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from ..cube import Cube
from ..metadata import Dimension


def dimension_from_level_file(
    name: str,
    lines: "Sequence[tuple[str, ...]]",
    description: str = "",
    style: str = "auto",
) -> Dimension:
    """Build a dimension from (marker, member_name[, weight]) rows.

    Two dialects of the C/N marker format (reference
    ``samples/tutor.py:78-105``):

    - ``tutor`` — the real tutor TXT shape: ``C`` opens a consolidated
      member, ``N`` declares a standalone member, and rows with an EMPTY
      marker attach ``member`` to the most recent ``C`` with an optional
      weight (``("", "Ist", "1")`` / ``("", "Plan", "-1")``).
    - ``simple`` — the compact shape used by earlier fixtures: ``C`` opens
      a parent and following ``N`` rows are its children.

    ``style="auto"`` picks ``tutor`` when any empty-marker row is present.
    """
    rows = [tuple(str(x) for x in r) for r in lines]
    if style == "auto":
        style = (
            "tutor"
            if any(not r[0].strip() for r in rows if len(r) >= 2)
            else "simple"
        )
    dim = Dimension(name, description)
    dim.edit()
    current_parent: Optional[str] = None
    for row in rows:
        marker = row[0].strip().upper()
        member = row[1].strip() if len(row) > 1 else ""
        if not member:
            continue
        weight = float(row[2]) if len(row) > 2 and row[2].strip() else 1.0
        if marker == "C":
            dim.add_member(member)
            current_parent = member
        elif marker == "N":
            if style == "tutor" or current_parent is None:
                dim.add_member(member)
            else:
                dim.add_member(current_parent, [member])
        elif marker == "":
            if current_parent is None:
                raise ValueError(
                    f"child row {member!r} before any 'C' parent row"
                )
            dim.add_member(current_parent, [member], [weight])
        else:
            raise ValueError(f"unknown level marker {marker!r}")
    dim.commit()
    return dim


def dimension_from_tutor_file(
    name: str, path: str, encoding: str = "latin-1", description: str = ""
) -> Dimension:
    """Parse a tutor-style TXT dimension file (tab-separated C/N/child-
    weight rows, classically latin-1 encoded) from local disk — metadata
    files are driver-sized by definition."""
    rows: list[tuple[str, ...]] = []
    with open(path, encoding=encoding) as fh:
        for raw in fh:
            parts = [t.strip() for t in raw.rstrip("\n").split("\t")]
            if len(parts) >= 2 and any(parts):
                rows.append(tuple(parts))
    return dimension_from_level_file(name, rows, description)


def dimension_from_csv(
    spark: SparkSession,
    name: str,
    path: str,
    sep: str = "\t",
    encoding: str = "utf-8",
) -> Dimension:
    """Read a 2-column (marker, member) delimited file into a dimension."""
    df = spark.read.csv(path, sep=sep, encoding=encoding)
    rows = [(r[0], r[1]) for r in df.collect()]
    return dimension_from_level_file(name, rows)


def facts_from_csv(
    spark: SparkSession,
    cube: Cube,
    path: str,
    dim_columns: dict[str, str],
    value_column: str,
    sep: str = ",",
    header: bool = True,
    additive: bool = False,
) -> None:
    """Load a delimited fact file into a cube by member names.

    ``dim_columns``: csv column -> cube fact column.  The name->id mapping
    happens executor-side (broadcast join per dimension).
    """
    df = spark.read.csv(path, sep=sep, header=header, inferSchema=True)
    cube.load_dataframe(
        df,
        mapping={**dim_columns, value_column: "value"},
        by_name=True,
        additive=additive,
    )
