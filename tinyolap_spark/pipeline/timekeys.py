"""Timezone-independent epoch arithmetic over BOTH Spark timestamp
flavors.

Event timestamps arrive as either ``TIMESTAMP`` (an instant; epoch math
via ``unix_micros`` never consults the session timezone) or
``TIMESTAMP_NTZ`` (a wall clock; this engine's convention, set by
``streaming.ingest.normalize_events``, is that the wall clock IS UTC).
The traps these helpers exist to avoid:

- ``CAST(ntz AS LONG)`` / ``unix_micros(ntz)`` are analysis errors;
- ``CAST(ntz AS TIMESTAMP)`` silently reads
  ``spark.sql.session.timeZone`` — the resulting instant (and any
  epoch value derived from it) changes with session configuration,
  which is exactly the session-state coupling VERDICT r7 #4 bans.

For NTZ the epoch value is computed with PURE WALL-CLOCK arithmetic —
``timestamp_diff`` against the NTZ epoch literal — which touches no
timezone at all and agrees bit-for-bit with ``unix_micros`` /
``CAST(.. AS LONG)`` on the equivalent UTC instant (truncation
semantics verified in ``tests/test_round8_fixes.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NTZ_EPOCH = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"

#: dtype strings these helpers treat as timestamps
TS_DTYPES = ("timestamp", "timestamp_ntz")


def _as_col(c: "Column | str") -> Column:
    return F.col(c) if isinstance(c, str) else c


def epoch_micros(c: "Column | str", dtype: str) -> Column:
    """Exact integer epoch-microseconds (LONG) for a timestamp column of
    the given dtype — session-timezone-free for both flavors."""
    col = _as_col(c)
    if dtype.startswith("timestamp_ntz"):
        return F.timestamp_diff("MICROSECOND", F.expr(_NTZ_EPOCH), col)
    return F.unix_micros(col.cast("timestamp"))


def epoch_seconds(c: "Column | str", dtype: str) -> Column:
    """Whole epoch-seconds (LONG), truncated exactly like
    ``CAST(timestamp AS LONG)`` does for instants."""
    col = _as_col(c)
    if dtype.startswith("timestamp_ntz"):
        return F.timestamp_diff("SECOND", F.expr(_NTZ_EPOCH), col)
    return col.cast("long")


def seconds_double(c: "Column | str", dtype: str) -> Column:
    """Fractional epoch seconds (DOUBLE) for timestamps; plain
    ``CAST(.. AS DOUBLE)`` for numeric columns — the dispatch the
    range/interval-join bucketers need for mixed point-column types."""
    col = _as_col(c)
    if dtype.startswith("timestamp_ntz"):
        return (
            F.timestamp_diff("MICROSECOND", F.expr(_NTZ_EPOCH), col)
            .cast("double")
            / F.lit(1_000_000.0)
        )
    return col.cast("double")


def col_dtype(df: DataFrame, name: str) -> str:
    """The dtype string of ``name`` in ``df`` (struct-field-free lookup
    for the dispatchers above)."""
    return dict(df.dtypes)[name]
