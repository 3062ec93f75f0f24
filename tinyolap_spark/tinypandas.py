"""Pandas <-> cube conversion (reference ``tools/tinypandas.py:8-61``).

The reference declares this surface but leaves ``to_tiny_database`` /
``to_df`` / ``database_add_df`` as ``NotImplementedError`` stubs; here
they work.  Semantics: every non-numeric column becomes a dimension
(distinct values under an ``All`` root), numeric columns become the
value — one numeric column loads directly, several become members of a
``measures`` dimension via an unpivot (``stack``), the classic
wide-to-long melt.

Scale notes: accepts a pandas OR a Spark DataFrame.  Dimension member
sets are collected to the driver (dimensions are small by definition —
guarded by ``max_members``); the FACT rows never leave the cluster —
the load path is ``Cube.load_dataframe(by_name=True)``, a broadcast
name->id join per dimension, so a 100 TB Spark input works unchanged.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .database import Database
from .metadata import TinyOlapError

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

    from .cube import Cube

_NUMERIC_TYPES = {
    "byte", "short", "integer", "long", "float", "double", "decimal",
}


def _as_spark(df, spark: Optional[SparkSession]) -> DataFrame:
    if isinstance(df, DataFrame):
        return df
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise TinyOlapError("no active SparkSession; pass spark=")
    return spark.createDataFrame(df)


def _split_columns(sdf: DataFrame) -> tuple[list[str], list[str]]:
    """(dimension columns, value columns) by dtype."""
    dims, values = [], []
    for field in sdf.schema.fields:
        tname = field.dataType.typeName()
        if tname in _NUMERIC_TYPES or tname.startswith("decimal"):
            values.append(field.name)
        else:
            dims.append(field.name)
    if not values:
        raise TinyOlapError("DataFrame has no numeric value column")
    if not dims:
        raise TinyOlapError("DataFrame has no dimension (non-numeric) column")
    return dims, values


class TinyPandas:
    """Reference ``tools/tinypandas.py`` surface, implemented."""

    @staticmethod
    def to_tiny_cube(
        df,
        database_name: str = "tiny",
        cube_name: str = "data",
        spark: Optional[SparkSession] = None,
    ) -> "Cube":
        """DataFrame -> Cube in a fresh database (reference
        ``tinypandas.py:13-23``)."""
        return TinyPandas.to_tiny_database(
            df, database_name, cube_name, spark
        ).cube(cube_name)

    @staticmethod
    def to_tiny_database(
        df,
        database_name: str = "tiny",
        cube_name: str = "data",
        spark: Optional[SparkSession] = None,
    ) -> Database:
        """DataFrame -> Database with one cube (reference
        ``tinypandas.py:25-34``, a stub there).  Dimensions are named
        after the DataFrame columns."""
        sdf = _as_spark(df, spark)
        db = Database(database_name, spark=sdf.sparkSession)
        TinyPandas._add(db, sdf, cube_name, prefix_dims=False)
        return db

    @staticmethod
    def database_add_df(
        database: Database, df, cube_name: str
    ) -> "Cube":
        """Add a DataFrame as a new cube to an EXISTING database
        (reference ``tinypandas.py:46-56``, a stub there).  Per the
        reference docstring, new dimensions are named
        ``[cube_name]_[df_col_name]`` so they cannot collide with the
        database's existing dimensions."""
        sdf = _as_spark(df, database.spark)
        return TinyPandas._add(database, sdf, cube_name, prefix_dims=True)

    @staticmethod
    def to_df(cube: "Cube") -> "pd.DataFrame":
        """Cube -> pandas DataFrame of base rows with member NAMES
        (reference ``tinypandas.py:36-44``, a stub there).  Collects to
        the driver — meant for interactive/toy use; at scale call
        :meth:`to_spark_df` and keep the result distributed."""
        return TinyPandas.to_spark_df(cube).toPandas()

    @staticmethod
    def to_spark_df(cube: "Cube") -> DataFrame:
        """Distributed variant of :meth:`to_df`: base fact rows with
        member names resolved through broadcast joins (shuffle-hash for
        ``large_dim`` dimensions) — no collect."""
        from . import engine

        df = cube.fact
        for col, dim in cube._dims_spec():
            mdf = engine.members_df(cube.spark, dim).select(
                F.col("member_id").alias(f"__id_{col}"),
                F.col("name").alias(f"__n_{col}"),
            )
            df = (
                df.join(
                    engine._members_side(mdf, dim),
                    df[col] == F.col(f"__id_{col}"),
                )
                .drop(col, f"__id_{col}")
                .withColumnRenamed(f"__n_{col}", col)
            )
        return df.select(*cube._cols, "value", "value_str")

    # ----------------------------------------------------------- internals
    _MAX_MEMBERS_PER_DIM = 65_535

    @staticmethod
    def _add(
        db: Database, sdf: DataFrame, cube_name: str, prefix_dims: bool
    ) -> "Cube":
        dim_cols, value_cols = _split_columns(sdf)
        for c in dim_cols:
            sdf = sdf.withColumn(c, F.col(c).cast("string"))
        # ONE job collects every dimension's member set (dims are small;
        # the fact stays distributed)
        sets_row = sdf.agg(
            *[F.collect_set(c).alias(c) for c in dim_cols]
        ).collect()[0]
        dims = []
        for c in dim_cols:
            members = sorted(v for v in sets_row[c] if v is not None)
            if len(members) > TinyPandas._MAX_MEMBERS_PER_DIM:
                raise TinyOlapError(
                    f"column '{c}' has {len(members)} distinct values — "
                    f"too many for a dimension (cap "
                    f"{TinyPandas._MAX_MEMBERS_PER_DIM}); treat it as a "
                    "fact attribute instead"
                )
            dname = f"{cube_name}_{c}" if prefix_dims else c
            d = db.add_dimension(dname).edit()
            d.add_many("All", members)
            d.commit()
            dims.append(d)
        mapping = {
            c: (f"{cube_name}_{c}" if prefix_dims else c) for c in dim_cols
        }
        if len(value_cols) == 1:
            load = sdf.select(
                *[F.col(c).alias(mapping[c]) for c in dim_cols],
                F.col(value_cols[0]).cast("double").alias("value"),
            )
        else:
            # several numeric columns -> a measures dimension + unpivot
            mname = f"{cube_name}_measures" if prefix_dims else "measures"
            md = db.add_dimension(mname).edit()
            md.add_many("All", list(value_cols))
            md.commit()
            dims.append(md)
            stack = ", ".join(
                f"'{v}', cast(`{v}` as double)" for v in value_cols
            )
            load = sdf.select(
                *[F.col(c).alias(mapping[c]) for c in dim_cols],
                F.expr(
                    f"stack({len(value_cols)}, {stack}) as "
                    f"(`{mname}`, value)"
                ),
            )
        cube = db.add_cube(cube_name, dims)
        cube.load_dataframe(load, by_name=True, additive=True)
        return cube


def from_pandas(
    df,
    database_name: str = "tiny",
    cube_name: str = "data",
    spark: Optional[SparkSession] = None,
) -> Database:
    """Module-level convenience: ``from_pandas(df).cube("data")``."""
    return TinyPandas.to_tiny_database(df, database_name, cube_name, spark)
