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
  epoch value derived from it) changes with session configuration;
- **``timestampdiff`` on NTZ is NOT pure wall arithmetic either**:
  measured (Spark 4.1), a wall time that does not exist in the session
  timezone (inside its spring-forward gap, e.g. 02:30 on a US DST
  switch date under ``America/New_York``) is normalized +1h before
  differencing — ``timestampdiff(SECOND, gap_ts, gap_ts + INTERVAL 1
  HOUR)`` returns 0.  One hour per year of event data would silently
  shift under a DST session zone.

So the NTZ epoch value is assembled from pure CALENDAR FIELD
extraction, which touches no timezone at all: ``unix_date(CAST(ts AS
DATE))`` days since epoch, plus hour/minute and the exact decimal
seconds field scaled to integer microseconds.  This agrees bit-for-bit
with ``unix_micros`` / ``CAST(.. AS LONG)`` on the equivalent UTC
instant for every wall clock — including DST-gap/overlap wall times and
pre-1970 values (the day/field split floors exactly like the casts) —
verified across session timezones in ``tests/test_round8_fixes.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: dtype strings these helpers treat as timestamps
TS_DTYPES = ("timestamp", "timestamp_ntz")

_US_PER_DAY = 86_400_000_000


def _as_col(c: "Column | str") -> Column:
    return F.col(c) if isinstance(c, str) else c


def _ntz_micros(col: Column) -> Column:
    """Epoch micros of an NTZ wall clock read AS UTC — calendar-field
    assembly, no timezone anywhere in the expression tree."""
    days = F.unix_date(col.cast("date")).cast("long")
    # extract(SECOND) carries the fraction as an exact DECIMAL(8,6):
    # *1e6 is an exact integer, so the cast is lossless
    tod = (
        F.hour(col).cast("long") * F.lit(3_600_000_000)
        + F.minute(col).cast("long") * F.lit(60_000_000)
        + (F.date_part(F.lit("SECOND"), col) * F.lit(1_000_000))
        .cast("long")
    )
    return days * F.lit(_US_PER_DAY) + tod


def epoch_micros(c: "Column | str", dtype: str) -> Column:
    """Exact integer epoch-microseconds (LONG) for a timestamp column of
    the given dtype — session-timezone-free for both flavors."""
    col = _as_col(c)
    if dtype.startswith("timestamp_ntz"):
        return _ntz_micros(col)
    return F.unix_micros(col.cast("timestamp"))


def epoch_seconds(c: "Column | str", dtype: str) -> Column:
    """Whole epoch-seconds (LONG), floored exactly like
    ``CAST(timestamp AS LONG)`` does for instants (pre-1970 fractional
    seconds floor on both paths: the day/field assembly splits a
    negative epoch into negative whole days plus a positive
    time-of-day)."""
    col = _as_col(c)
    if dtype.startswith("timestamp_ntz"):
        # Exact integer floor-division via DECIMAL: `long / int` in Spark
        # is DOUBLE division, exact only for |micros| < 2^53 (~year
        # 2255 / before ~-2255); decimal(20,0)/1e6 → decimal(28,8) is
        # exact over the full LONG range, so floor never drifts from
        # what CAST(instant AS LONG) would produce.
        m = _ntz_micros(col)
        return F.floor(m.cast("decimal(20,0)") / F.lit(1_000_000)).cast("long")
    return col.cast("long")


def seconds_double(c: "Column | str", dtype: str) -> Column:
    """Fractional epoch seconds (DOUBLE) for timestamps; plain
    ``CAST(.. AS DOUBLE)`` for numeric columns — the dispatch the
    range/interval-join bucketers need for mixed point-column types."""
    col = _as_col(c)
    if dtype.startswith("timestamp_ntz"):
        return _ntz_micros(col).cast("double") / F.lit(1_000_000.0)
    return col.cast("double")


def col_dtype(df: DataFrame, name: str) -> str:
    """The dtype string of ``name`` in ``df`` (struct-field-free lookup
    for the dispatchers above)."""
    return dict(df.dtypes)[name]
