"""Z-order (Morton-curve) clustering for multi-dimension data skipping.

Parquet scans prune files and row groups with min/max column statistics,
but a table sorted on ONE column only skips for predicates on that
column.  Interleaving the bits of several columns' range-buckets into a
single Morton code and range-sorting by it makes EVERY participating
column's values locally clustered — per-file min/max ranges shrink for
all of them at once, so multi-dimensional point/range predicates prune
at 100 TB (the technique behind Delta/Iceberg ``ZORDER BY``).

Shape:

- per-column min/max come from ONE tiny aggregate (driver-sized:
  2 numbers per column);
- the Morton code is a pure JVM bit-interleave expression (shifts/ors,
  whole-stage codegen, no UDF);
- the layout pass is ``repartitionByRange(morton)`` +
  ``sortWithinPartitions(morton)`` — one range shuffle, the same cost
  class as any single-column sort-for-skipping write.

Verification is MEASURED, not asserted by fiat: the layout test writes
the same data unsorted and z-ordered, reads parquet row-group statistics
back, and checks the per-file normalized min/max span collapses on every
clustered column (``tests/test_scale_utils.py``).

No reference counterpart (single-process engine, no storage layout);
public technique per the Delta/Iceberg docs and the classic Morton
curve.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_expr(col: str, lo: float, hi: float, bits: int) -> Column:
    """Integer range-bucket of ``col`` in ``[0, 2^bits)`` from the
    driver-collected min/max; constant columns collapse to bucket 0 and
    NULLs sort first (bucket 0)."""
    n = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = (
        (F.col(col).cast("double") - F.lit(float(lo)))
        / F.lit(float(hi - lo))
        * F.lit(float(n))
    )
    return F.coalesce(
        F.least(F.greatest(scaled.cast("long"), F.lit(0)), F.lit(n)),
        F.lit(0),
    )


def morton_code(
    df: DataFrame, cols: Sequence[str], bits: int = 8
) -> Column:
    """Morton (Z-curve) code interleaving ``bits`` bucket-bits of every
    column in ``cols`` — bit j of column i lands at position
    ``j * ncols + i``.  ``bits * len(cols)`` must fit a long (<= 63)."""
    cols = list(cols)
    if bits * len(cols) > 63:
        raise ValueError(
            f"bits*ncols = {bits * len(cols)} exceeds a 63-bit code; "
            f"lower bits or cluster fewer columns"
        )
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__lo_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"__hi_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    code = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        lo = stats[f"__lo_{i}"]
        hi = stats[f"__hi_{i}"]
        b = _bucket_expr(
            c,
            float(lo) if lo is not None else 0.0,
            float(hi) if hi is not None else 0.0,
            bits,
        )
        for j in range(bits):
            bit = F.shiftright(b, j).bitwiseAND(F.lit(1))
            code = code + F.shiftleft(bit, j * len(cols) + i)
    return code


def zorder(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    partitions: Optional[int] = None,
) -> DataFrame:
    """The clustered layout: range-partitioned and sorted by the Morton
    code (code column dropped — it is a layout device, not data).
    Write the result with ``.write.parquet(...)`` and multi-dimensional
    predicates on ``cols`` prune files/row-groups by min/max stats."""
    code = morton_code(df, cols, bits).alias("__z")
    out = df.withColumn("__z", code)
    out = (
        out.repartitionByRange(partitions, "__z")
        if partitions
        else out.repartitionByRange("__z")
    )
    return out.sortWithinPartitions("__z").drop("__z")
