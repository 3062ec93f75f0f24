"""Event-stream batch operators: as-of attribution and semi-structured
property extraction.

Beyond-reference pipeline operators (the reference has no event-log
surface; the brief's training-data mandate does).  Both are pure
DataFrame/window compositions — no UDFs, whole-stage codegen end to end:

- **Last-touch attribution** is the classic AS-OF JOIN shape: for each
  target event, the most recent PRIOR source event of the same user.
  Spark has no ASOF JOIN operator; the scalable composition is a running
  conditional ``max`` over a user-partitioned time-ordered window — one
  shuffle on ``user_id``, no self-join, no range explosion.  At 100 TB
  the window state is one timestamp per partition row — constant memory,
  skew-bounded by the busiest single user (salt the window's partition
  key if one user dominates).
- **JSON prop extraction** uses ``get_json_object`` (JVM, codegen) —
  the 100 TB answer to "my props column is a JSON string": extract and
  aggregate without ever materializing a parsed struct column.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .timekeys import col_dtype, epoch_micros, epoch_seconds

_log = logging.getLogger(__name__)


def with_last_touch(
    events: DataFrame,
    target_type: str = "purchase",
    source_type: str = "click",
) -> DataFrame:
    """Target events annotated with ``last_source_ts`` — the most recent
    preceding ``source_type`` timestamp of the same user (NULL when the
    user never produced one before the target).

    The frame includes the current row, which is safe BECAUSE the current
    row is a target, never a source — so identical types would self-match
    and are rejected.  Ties on ``ts`` break deterministically by
    ``event_id``.
    """
    if target_type == source_type:
        raise ValueError(
            "target_type and source_type must differ (identical types "
            "would self-attribute every event)"
        )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    src_ts = F.max(
        F.when(F.col("event_type") == source_type, F.col("ts"))
    ).over(w)
    return events.withColumn("last_source_ts", src_ts).where(
        F.col("event_type") == target_type
    )


def last_touch_attribution(
    events: DataFrame,
    target_type: str = "purchase",
    source_type: str = "click",
    max_gap_sec: int = 1800,
) -> DataFrame:
    """Per-user attribution summary: how many ``target_type`` events were
    preceded by a ``source_type`` event within ``max_gap_sec``, and the
    attributed value (cents-exact sum).

    Columns: ``user_id, n_target, n_attributed, attributed_value``.
    """
    t = with_last_touch(events, target_type, source_type)
    dt = col_dtype(events, "ts")
    gap = epoch_seconds("ts", dt) - epoch_seconds("last_source_ts", dt)
    attributed = F.col("last_source_ts").isNotNull() & (gap <= max_gap_sec)
    return (
        t.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_target"),
            F.sum(attributed.cast("long")).alias("n_attributed"),
            (
                F.sum(
                    F.when(
                        attributed, F.round(F.col("value") * 100, 0)
                    ).otherwise(F.lit(0.0))
                )
                / 100
            ).alias("attributed_value"),
        )
        .orderBy("user_id")
    )


def json_prop_rollup(
    events: DataFrame,
    json_path: str = "$.k",
    bucket_size: int = 10,
) -> DataFrame:
    """Extract an integer JSON property from the ``props`` string column
    and roll it up into fixed-width buckets: event count + cents-exact
    value sum per bucket.

    Columns: ``bucket, n_events, total_value``.
    """
    prop = F.get_json_object(F.col("props"), json_path).cast("long")
    bucket = F.floor(prop / bucket_size) * bucket_size
    return (
        events.withColumn("bucket", bucket)
        .where(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100, 0)) / 100).alias(
                "total_value"
            ),
        )
        .orderBy("bucket")
    )


def funnel_stages(
    events: DataFrame,
    steps: "list[str]",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_gap_sec: "int | None" = None,
    ordered: bool = True,
    max_events_per_user: "int | None" = None,
    capped_stats: "dict | None" = None,
) -> DataFrame:
    """Funnel stage per user; three modes, all ONE groupBy shuffle:

    - **strict-ordered** (default): the furthest prefix of ``steps``
      completed in strict timestamp order (step k+1 must occur STRICTLY
      after the matched step-k event — the first qualifying occurrence
      of each step is the one matched);
    - **windowed** (``max_gap_sec``): additionally, step k+1 must occur
      within ``max_gap_sec`` seconds of the MATCHED step-k event (the
      standard conversion-window funnel; greedy first-match, comparisons
      are microsecond-exact);
    - **any-order** (``ordered=False``): stage = number of DISTINCT
      steps the user performed, regardless of order (no window — pass
      ``max_gap_sec=None``; combining both is ill-defined and raises).

    Ordered modes collect each user's (ts, type) pairs and run a single
    JVM ``aggregate`` higher-order scan over the sorted array — no UDF,
    no k-way self-join (the naive funnel is k chained range joins; this
    is one pass).  Any-order is a plain ``count_distinct``.

    Per-user state: events whose type is not a funnel step (or whose
    timestamp is NULL) can never advance the scan, so the collect is
    CONDITIONAL — ``collect_list(when(is_step, ...))`` skips NULLs, so
    the aggregation buffer holds step events only while stage-0 users
    (no step events at all) still get a group and a row.  A bot user
    spamming step events is still unbounded; pass
    ``max_events_per_user`` to keep only each user's EARLIEST N step
    events — a conditional running count over a window on the SAME key,
    so the window sort spills to disk instead of the aggregation buffer
    OOMing, the planner reuses the hash partitioning for the groupBy,
    and the plan stays one Exchange with no join (test-asserted).  A
    user truncated at the cap under-reports their stage iff the
    completing events lie beyond their first N step events — quantified
    via ``capped_stats`` (opt-in dict, mirrors the dedup skew-cap
    reporting: keys ``truncated_users`` / ``dropped_events``, costs one
    extra job, and a non-zero drop is logged at WARNING).

    Returns ``(user_col, stage)`` with stage in ``0..len(steps)``.
    """
    if not ordered and max_gap_sec is not None:
        raise ValueError(
            "max_gap_sec requires ordered=True (a conversion window "
            "between steps is meaningless without step order)"
        )
    # run the scan on exact integer epoch-micros (timekeys dispatches
    # per timestamp flavor, session-timezone-free) — the struct
    # comparisons and the conversion window are then plain long math
    us = epoch_micros(ts_col, col_dtype(events, ts_col))
    is_step = F.col(type_col).isin(list(steps)) & F.col("__us").isNotNull()
    ev = events.select(user_col, us.alias("__us"), type_col)
    if max_events_per_user is not None:
        if max_events_per_user < 1:
            raise ValueError("max_events_per_user must be >= 1")
        # rank of each STEP event within its user (non-step rows pass
        # through untouched — they keep stage-0 users alive downstream)
        w = (
            Window.partitionBy(user_col)
            .orderBy(F.col("__us").asc_nulls_last(), F.col(type_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        rank = F.sum(F.when(is_step, 1).otherwise(0)).over(w)
        ev = ev.withColumn("__over", is_step & (rank > max_events_per_user))
        if capped_stats is not None:
            row = (
                ev.where(F.col("__over"))
                .agg(
                    F.count(F.lit(1)).alias("e"),
                    F.count_distinct(F.col(user_col)).alias("u"),
                )
                .collect()[0]
            )
            capped_stats["truncated_users"] = int(row["u"])
            capped_stats["dropped_events"] = int(row["e"])
            if row["u"]:
                _log.warning(
                    "funnel_stages: max_events_per_user=%d truncated %d "
                    "user(s), dropping %d step event(s) — stages for "
                    "those users are computed from their first %d step "
                    "events only",
                    max_events_per_user, row["u"], row["e"],
                    max_events_per_user,
                )
        ev = ev.where(~F.col("__over")).drop("__over")
    if not ordered:
        # count_distinct skips the NULL the when() leaves for non-steps
        return ev.groupBy(user_col).agg(
            F.count_distinct(F.when(is_step, F.col(type_col)))
            .cast("int")
            .alias("stage")
        )
    steps_lit = F.array(*[F.lit(s) for s in steps])
    arr = F.sort_array(
        F.collect_list(
            F.when(
                is_step,
                F.struct(F.col("__us").alias("us"),
                         F.col(type_col).alias("tp")),
            )
        )
    )
    init = F.struct(
        F.lit(0).alias("stage"),
        F.lit(None).cast("long").alias("last_us"),
    )

    def in_window(acc, x):
        if max_gap_sec is None:
            return F.lit(True)
        # microsecond-exact: second-truncated gaps would disagree with
        # an epoch_us-based oracle on sub-second gaps
        return x["us"] <= acc["last_us"] + F.lit(
            int(max_gap_sec) * 1_000_000
        )

    scan = F.aggregate(
        arr,
        init,
        lambda acc, x: F.when(
            (acc["stage"] < F.lit(len(steps)))
            # null-timestamp events can never match a step: admitting
            # one would leave last_us NULL and make the strict-ordering
            # check vacuous for every later step
            & x["us"].isNotNull()
            & (x["tp"] == F.element_at(steps_lit, acc["stage"] + 1))
            & (acc["last_us"].isNull() | ((x["us"] > acc["last_us"]) & in_window(acc, x))),
            F.struct(
                (acc["stage"] + 1).alias("stage"),
                x["us"].alias("last_us"),
            ),
        ).otherwise(acc),
    )
    return ev.groupBy(user_col).agg(scan["stage"].alias("stage"))


def funnel_summary(
    events: DataFrame,
    steps: "list[str]",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_gap_sec: "int | None" = None,
    ordered: bool = True,
) -> DataFrame:
    """Per-stage user counts (stage = furthest step reached), the
    conversion report: ``(stage, n_users)`` for stage 0..len(steps).
    ``max_gap_sec``/``ordered`` as in :func:`funnel_stages`."""
    return (
        funnel_stages(
            events, steps, user_col, ts_col, type_col, max_gap_sec, ordered
        )
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("stage")
    )
