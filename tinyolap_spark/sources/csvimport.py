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
    lines: Sequence[tuple[str, str]],
    description: str = "",
) -> Dimension:
    """Build a dimension from (marker, member_name) rows.

    Markers: ``C`` = consolidated member at depth d (depth = number of
    leading level digits if present, else nesting by order), ``N`` = leaf
    under the most recent ``C``.  The simplified format here matches the
    tutor sample's effective shape: a ``C`` opens a new parent; following
    ``N`` rows are its children until the next ``C``.
    """
    dim = Dimension(name, description)
    dim.edit()
    current_parent: Optional[str] = None
    for marker, member in lines:
        marker = marker.strip().upper()
        member = member.strip()
        if not member:
            continue
        if marker == "C":
            dim.add_member(member)
            current_parent = member
        elif marker == "N":
            if current_parent is None:
                dim.add_member(member)
            else:
                dim.add_member(current_parent, [member])
        else:
            raise ValueError(f"unknown level marker {marker!r}")
    dim.commit()
    return dim


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
