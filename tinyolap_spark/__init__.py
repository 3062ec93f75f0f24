"""tinyolap_spark — a PySpark-native MOLAP engine.

A ground-up, Spark-first rebuild of the query & data-processing surface of
Zeutschler/tinyolap (model-first OLAP: dimensions with weighted multi-parent
hierarchies, cubes over leaf-level facts, on-demand weighted rollups, rules,
areas, views, a mini SQL dialect) plus large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).

Everything user-visible executes as declarative DataFrame plans —
broadcast-hash-joins against tiny dimension closure tables + hash
aggregates — so the same code that answers a 60k-row test cube would run a
1000-executor cluster over 100 TB of facts.
"""

from .metadata import (
    Dimension,
    Member,
    Subset,
    AttributeField,
    TinyOlapError,
    DimensionEditError,
    DimensionScaleError,
    InvalidAddressError,
    InvalidCellWriteError,
)
from .cube import Cube, Cell, Area, MAX_DIMS_PER_CUBE
from .database import Database
from .rules import rule, RuleScope, RuleError, CONTINUE, NOT_PROCESSED
from .view import View
from .slice import Slice
from .server import Server
from .history import History
from .users import User, UserCollection, UserRole, NotAuthorizedError
from .comments import CellCommentPost, CellComments, CubeComments
from .tinypandas import TinyPandas, from_pandas
from .config import Config
from .package import Snapshot, SnapshotManager
from . import plans

__version__ = "0.1.0"

__all__ = [
    "Database",
    "Dimension",
    "Member",
    "Subset",
    "AttributeField",
    "Cube",
    "Cell",
    "Area",
    "View",
    "Slice",
    "Server",
    "History",
    "User",
    "UserCollection",
    "UserRole",
    "NotAuthorizedError",
    "CellCommentPost",
    "CellComments",
    "CubeComments",
    "TinyPandas",
    "from_pandas",
    "Config",
    "Snapshot",
    "SnapshotManager",
    "plans",
    "rule",
    "RuleScope",
    "RuleError",
    "CONTINUE",
    "NOT_PROCESSED",
    "TinyOlapError",
    "DimensionEditError",
    "DimensionScaleError",
    "InvalidAddressError",
    "InvalidCellWriteError",
    "MAX_DIMS_PER_CUBE",
]
