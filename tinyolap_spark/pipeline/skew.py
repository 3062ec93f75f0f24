"""Skew-mitigation utilities for hot aggregation/join keys.

At 100 TB a handful of hot keys (a dominant member, boilerplate documents)
can stall a stage on one reducer.  AQE's skew-join split handles the join
case at runtime; these helpers handle the *aggregation* case and the
explicit-salt join pattern:

- :func:`salted_agg` — two-phase aggregation: salt the key with a random
  shard, partially aggregate (key, salt), then finish per key.  The first
  shuffle spreads a hot key over ``salt`` reducers; the second shuffle
  carries at most ``salt`` rows per key.  Works for any algebraic
  aggregate (sum/count/min/max; avg via sum+count).
- :func:`salted_broadcast_left` — replicate-broadcast join for a skewed
  LEFT side against a small right side: explode the right side ``salt``
  ways so a pre-salted left key still matches.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: output column -> (function, input column); functions:
    ``sum`` / ``count`` / ``min`` / ``max``.

    >>> salted_agg(fact, ["geo"], {"total": ("sum", "value")}, salt=32)
    """
    fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    merge_fns = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for name, (fn, _col) in aggs.items():
        if fn not in fns:
            raise ValueError(f"unsupported aggregate {fn!r} for {name!r}")
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[fns[fn](c).alias(name) for name, (fn, c) in aggs.items()]
    )
    phase2 = phase1.groupBy(*keys).agg(
        *[
            merge_fns[fn](name).alias(name)
            for name, (fn, _c) in aggs.items()
        ]
    )
    return phase2


def salted_broadcast_left(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
) -> DataFrame:
    """Join a skewed big LEFT side to a small RIGHT side with explicit
    salting: the left adds a random shard, the right is exploded ``salt``
    ways, and the join key becomes (key, shard) — a hot left key spreads
    over ``salt`` tasks even without AQE.

    (With a broadcastable right side Spark needs no salt at all — this
    pattern matters when the right side is just over the broadcast limit
    or the engine must avoid broadcast for memory reasons.)
    """
    lsalted = left.withColumn(
        "__salt", (F.rand(seed=7) * salt).cast("int")
    )
    rexploded = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = lsalted.join(rexploded, on=[on, "__salt"], how="inner")
    return out.drop("__salt")
