"""General-purpose temporal joins Spark lacks as built-ins: AS-OF join
and bucketed range (point-in-interval) join.

Beyond-reference operators (the reference engine has no join surface at
all — `/root/reference/tinyolap/cube.py` resolves addresses against one
fact table; see SURVEY.md §2 "theta/range/as-of joins" gap note).  Both
are the standard large-scale compositions, not nested-loop fallbacks:

- **asof_join** — for each left row, the nearest right row of the same
  key at-or-before (backward) / at-or-after (forward) its timestamp.
  Spark's naive spelling is an inequality join (``l.ts >= r.ts``) which
  plans as BroadcastNestedLoopJoin — quadratic and undistributable.  The
  scalable composition is UNION + last(ignorenulls) over one
  key-partitioned time-ordered window: ONE shuffle on the key, state of
  one payload struct per scan position, no range explosion.  This is the
  generalization of the attribution operator in
  :mod:`tinyolap_spark.pipeline.events` to two arbitrary frames.
- **range_join** — all (point, interval) containment pairs.  The naive
  spelling (``p BETWEEN start AND end``) is again a nested-loop plan.
  Bucketing chops the domain into fixed-width buckets, explodes each
  interval into the buckets it overlaps, and equi-joins points on
  (key, bucket) — a plain shuffled hash/sort-merge join whose fan-out is
  bounded by interval_span/bucket_width.  Each matching pair joins
  EXACTLY once (a point lives in exactly one bucket), so no dedup pass.
- **interval_join** — interval×interval overlap pairs; same bucketing,
  with each pair emitted only in the canonical bucket holding the
  overlap's start point, so exactly-once needs no ``distinct``.

100 TB notes: asof_join's window is skew-bounded by the busiest single
key (salt upstream if one key dominates); range_join's explode factor is
``ceil(span/width)+1`` per interval — pick ``bucket_width`` near the
median interval span and the blow-up stays ~2×.  ``max_buckets`` fails
fast (``raise_error``) on pathological intervals instead of silently
materializing a million-row explode.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .timekeys import epoch_micros, seconds_double


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Optional[Sequence[str]] = None,
    suffix: str = "_r",
    direction: str = "backward",
    tolerance_sec: Optional[float] = None,
    allow_exact_match: bool = True,
    tiebreak: Optional[str] = None,
    how: str = "left",
) -> DataFrame:
    """AS-OF join: every ``left`` row annotated with the nearest ``right``
    row of the same ``on`` key — at-or-before ``left_ts`` when
    ``direction='backward'``, at-or-after when ``'forward'``.

    Output = all left columns, plus the matched right timestamp as
    ``{right_ts}{suffix}`` and each payload column ``c`` (default: every
    right column not in ``on``/``right_ts``) as ``{c}{suffix}`` — all
    NULL when no right row qualifies.  ``how='inner'`` drops unmatched
    left rows instead.

    Semantics mirror pandas ``merge_asof``: ``allow_exact_match``
    controls whether ``right_ts == left_ts`` counts; ``tolerance_sec``
    NULLs the match (or drops the row under ``'inner'``) when the time
    gap exceeds it.  For timestamp columns the gap is computed on
    ``unix_micros`` INTEGERS against ``round(tolerance_sec * 1e6)``
    microseconds, so the boundary is exact (gap == tolerance matches,
    gap == tolerance + 1µs does not); numeric ts columns keep the
    ``double`` comparison.  A left row whose timestamp is NULL never
    matches (pandas ``merge_asof`` raises on NULL keys; here the row
    survives with a NULL match under ``'left'``).  Ties
    among right rows at the same timestamp break by ``tiebreak``
    (backward: highest wins; forward: lowest wins); without one, ties
    are nondeterministic — pass it whenever right timestamps can repeat.

    Plan shape: unionByName -> Window(partitionBy=on, orderBy=ts) ->
    filter — exactly one Exchange (asserted in
    ``tests/test_pipeline_joins.py``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    keys = list(on)
    if not keys:
        raise ValueError("asof_join requires at least one key column")
    payload = list(
        right_cols
        if right_cols is not None
        else [c for c in right.columns if c not in keys and c != right_ts]
    )
    reserved = {"__t", "__pay", "__tb", "__is_left", "__ord", "__m"}
    bad = reserved & set(left.columns)
    if bad:
        raise ValueError(
            f"left frame uses reserved column names {sorted(bad)}"
        )
    out_names = {f"{right_ts}{suffix}"} | {f"{c}{suffix}" for c in payload}
    clash = out_names & set(left.columns)
    if clash:
        raise ValueError(
            f"output column(s) {sorted(clash)} collide with left frame "
            f"columns; pass a different suffix or rename"
        )
    for c in (left_ts, *keys):
        if c not in left.columns:
            raise ValueError(f"left frame lacks column {c!r}")
    for c in (right_ts, *keys, *payload):
        if c not in right.columns:
            raise ValueError(f"right frame lacks column {c!r}")

    pay_fields = [F.col(right_ts).alias("__rts")] + [
        F.col(c).alias(c) for c in payload
    ]
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__t"),
        F.struct(*pay_fields).alias("__pay"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__tb"),
        F.lit(False).alias("__is_left"),
        # at equal __t the RIGHT row must scan first iff exact matches
        # count, so last() has (or hasn't) seen it at the left row
        F.lit(0 if allow_exact_match else 1).alias("__ord"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__t"),
        F.lit(None).cast(r.schema["__pay"].dataType).alias("__pay"),
        F.lit(None).cast(r.schema["__tb"].dataType).alias("__tb"),
        F.lit(True).alias("__is_left"),
        F.lit(1 if allow_exact_match else 0).alias("__ord"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        order = [
            F.col("__t").asc_nulls_first(),
            F.col("__ord").asc(),
            F.col("__tb").asc_nulls_first(),
        ]
    else:
        order = [
            F.col("__t").desc_nulls_last(),
            F.col("__ord").asc(),
            F.col("__tb").desc_nulls_last(),
        ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "__m", F.last("__pay", ignorenulls=True).over(w)
    ).where(F.col("__is_left"))

    # a NULL left timestamp must never match: under 'forward' it sorts
    # after every right row (desc_nulls_last), so last(ignorenulls) would
    # otherwise hand it the smallest-timestamp right payload
    matched = matched.withColumn(
        "__m", F.when(F.col("__t").isNotNull(), F.col("__m"))
    )

    if tolerance_sec is not None:
        ts_types = ("timestamp", "timestamp_ntz")
        l_type = dict(unioned.dtypes)["__t"]
        r_type = r.schema["__pay"].dataType["__rts"].dataType.simpleString()
        if l_type in ts_types and r_type in ts_types:
            # exact integer microseconds — the storage resolution — so the
            # boundary (gap == tolerance) is bit-exact, not double-rounded;
            # timekeys dispatches per flavor (an NTZ->LTZ cast here would
            # silently read the session timezone)
            gap = F.abs(
                epoch_micros(F.col("__t"), l_type)
                - epoch_micros(F.col("__m.__rts"), r_type)
            )
            limit = F.lit(int(round(float(tolerance_sec) * 1_000_000)))
        else:
            gap = F.abs(
                F.col("__t").cast("double")
                - F.col("__m.__rts").cast("double")
            )
            limit = F.lit(float(tolerance_sec))
        matched = matched.withColumn(
            "__m", F.when(gap <= limit, F.col("__m"))
        )
    if how == "inner":
        matched = matched.where(F.col("__m").isNotNull())

    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col("__m.__rts").alias(f"{right_ts}{suffix}"))
    out_cols.extend(F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in payload)
    return matched.select(*out_cols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str] = (),
    point_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_width: float = 3600.0,
    bounds: str = "closed",
    max_buckets: int = 10_000,
) -> DataFrame:
    """All (point, interval) pairs where the point falls inside the
    interval of the same ``on`` key — inner-join semantics, each matching
    pair emitted exactly once.

    ``bounds='closed'`` means ``start <= p <= end``; ``'half_open'``
    means ``start <= p < end``.  The containment filter compares the
    ORIGINAL columns (exact timestamp/numeric comparison) — bucketing
    only generates candidates, and since ``CAST(.. AS double)`` and
    ``floor`` are monotone, a contained point's bucket always lies in
    the interval's bucket range: no candidate is ever missed.

    Output = all point columns + all interval columns (shared ``on``
    keys appear once; any other name collision raises).  Intervals
    spanning more than ``max_buckets`` buckets fail the job fast via
    ``raise_error`` — at 100 TB a silent million-bucket explode from one
    corrupt interval is worse than an error.
    """
    if bounds not in ("closed", "half_open"):
        raise ValueError("bounds must be 'closed' or 'half_open'")
    keys = list(on)
    clash = (
        (set(points.columns) - set(keys))
        & (set(intervals.columns) - set(keys))
    )
    if clash:
        raise ValueError(
            f"column name collision between points and intervals: "
            f"{sorted(clash)} — rename before joining"
        )

    def _bkt(col, df):
        # timekeys: timestamps (either flavor) -> epoch seconds double,
        # numerics -> plain double; floor is monotone either way
        sec = seconds_double(col, dict(df.dtypes)[col])
        return F.floor(sec / float(bucket_width))

    p = points.withColumn("__bkt", _bkt(point_col, points))
    lo, hi = _bkt(start_col, intervals), _bkt(end_col, intervals)
    n_bkts = hi - lo + 1
    guarded = F.when(
        n_bkts > max_buckets,
        F.raise_error(
            F.concat(
                F.lit(
                    f"range_join: interval spans more than {max_buckets} "
                    f"buckets of width {bucket_width} ("
                ),
                n_bkts.cast("string"),
                F.lit(") — raise bucket_width or max_buckets"),
            )
        ).cast("long"),
    ).otherwise(hi)
    # rows with end < start match nothing by definition; drop them BEFORE
    # the explode — sequence(hi, lo) would otherwise run DESCENDING and
    # generate wrong-bucket candidates (harmless to correctness, the
    # exact filter kills them, but wasted rows at scale)
    iv = intervals.where(
        F.col(start_col) <= F.col(end_col)
    ).withColumn("__bkt", F.explode(F.sequence(lo, guarded)))
    joined = p.join(iv, on=keys + ["__bkt"], how="inner")
    inside = F.col(start_col) <= F.col(point_col)
    if bounds == "closed":
        inside = inside & (F.col(point_col) <= F.col(end_col))
    else:
        inside = inside & (F.col(point_col) < F.col(end_col))
    out = [c for c in points.columns] + [
        c for c in intervals.columns if c not in keys
    ]
    return joined.where(inside).select(*out)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] = (),
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start",
    right_end: str = "end",
    bucket_width: float = 3600.0,
    bounds: str = "closed",
    max_buckets: int = 10_000,
) -> DataFrame:
    """All (left interval, right interval) OVERLAP pairs of the same
    ``on`` key — the interval×interval generalization of
    :func:`range_join`.  ``bounds='closed'`` treats intervals as
    ``[s, e]`` (touching endpoints overlap); ``'half_open'`` as
    ``[s, e)`` (touching endpoints do NOT).

    Exactly-once without a dedup pass: both sides explode into the
    buckets their span covers, but a pair is emitted only in its
    CANONICAL bucket — ``floor(greatest(l.start, r.start) / width)``,
    the bucket holding the overlap's start point.  That point lies in
    both intervals (intervals are closed at the start under either
    convention), so both exploded sides are guaranteed present there,
    and no other bucket passes the equality — no ``distinct`` shuffle.

    100 TB notes identical to :func:`range_join`: explode factor
    ``ceil(span/width)+1`` per row on BOTH sides, so pick
    ``bucket_width`` near the median span; ``max_buckets`` fails fast on
    corrupt spans; the join itself is a plain equi-join on
    (key, bucket) — no BroadcastNestedLoopJoin.
    """
    if bounds not in ("closed", "half_open"):
        raise ValueError("bounds must be 'closed' or 'half_open'")
    keys = list(on)
    clash = (
        (set(left.columns) - set(keys)) & (set(right.columns) - set(keys))
    )
    if clash:
        raise ValueError(
            f"column name collision between left and right: "
            f"{sorted(clash)} — rename before joining"
        )

    def _bkt(col, df):
        sec = seconds_double(col, dict(df.dtypes)[col])
        return F.floor(sec / float(bucket_width))

    def _explode(df, s, e, side):
        lo, hi = _bkt(s, df), _bkt(e, df)
        n = hi - lo + 1
        guarded = F.when(
            n > max_buckets,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"interval_join: {side} interval spans more than "
                        f"{max_buckets} buckets of width {bucket_width} ("
                    ),
                    n.cast("string"),
                    F.lit(") — raise bucket_width or max_buckets"),
                )
            ).cast("long"),
        ).otherwise(hi)
        # invalid (end < start) rows match nothing; dropped before the
        # explode so sequence() never runs descending
        return df.where(F.col(s) <= F.col(e)).withColumn(
            "__bkt", F.explode(F.sequence(lo, guarded))
        )

    joined = _explode(left, left_start, left_end, "left").join(
        _explode(right, right_start, right_end, "right"),
        on=keys + ["__bkt"],
        how="inner",
    )
    if bounds == "closed":
        overlap = (F.col(left_start) <= F.col(right_end)) & (
            F.col(right_start) <= F.col(left_end)
        )
    else:
        overlap = (F.col(left_start) < F.col(right_end)) & (
            F.col(right_start) < F.col(left_end)
        )
    canonical = F.col("__bkt") == F.floor(
        F.greatest(
            seconds_double(left_start, dict(left.dtypes)[left_start]),
            seconds_double(right_start, dict(right.dtypes)[right_start]),
        )
        / float(bucket_width)
    )
    out = [c for c in left.columns] + [
        c for c in right.columns if c not in keys
    ]
    return joined.where(overlap & canonical).select(*out)
