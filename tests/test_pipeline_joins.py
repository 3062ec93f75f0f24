"""asof_join / range_join: equivalence against naive inequality-join
oracles on synthetic frames, semantics flags, and plan-shape assertions
(one Exchange for asof; no nested-loop join for range)."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tinyolap_spark.pipeline.joins import asof_join, interval_join, range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    # quotes: per-symbol price ticks (right side), incl. a same-ts tie
    quotes = spark.createDataFrame(
        [
            Row(sym="A", ts=_ts("2024-01-01 10:00:00"), px=10.0, qid=1),
            Row(sym="A", ts=_ts("2024-01-01 10:00:05"), px=11.0, qid=2),
            Row(sym="A", ts=_ts("2024-01-01 10:00:05"), px=12.0, qid=3),
            Row(sym="A", ts=_ts("2024-01-01 10:01:00"), px=13.0, qid=4),
            Row(sym="B", ts=_ts("2024-01-01 10:00:30"), px=50.0, qid=5),
            Row(sym="C", ts=_ts("2024-01-01 09:00:00"), px=7.0, qid=6),
        ]
    )
    # trades: the left side — before-any-quote, exact-ts, between, after
    trades = spark.createDataFrame(
        [
            Row(sym="A", ts=_ts("2024-01-01 09:59:59"), qty=1, tid=100),
            Row(sym="A", ts=_ts("2024-01-01 10:00:05"), qty=2, tid=101),
            Row(sym="A", ts=_ts("2024-01-01 10:00:30"), qty=3, tid=102),
            Row(sym="A", ts=_ts("2024-01-01 10:05:00"), qty=4, tid=103),
            Row(sym="B", ts=_ts("2024-01-01 10:00:00"), qty=5, tid=104),
            Row(sym="D", ts=_ts("2024-01-01 12:00:00"), qty=6, tid=105),
        ]
    )
    return trades, quotes


def _naive_asof(spark, trades, quotes, direction, exact, tol=None):
    """Reference semantics via inequality join + row_number — the plan
    we refuse to run at scale but trust for 6 rows."""
    trades.createOrReplaceTempView("t")
    quotes.createOrReplaceTempView("q")
    cmp = {
        ("backward", True): "q.ts <= t.ts",
        ("backward", False): "q.ts < t.ts",
        ("forward", True): "q.ts >= t.ts",
        ("forward", False): "q.ts > t.ts",
    }[(direction, exact)]
    order = (
        "q.ts DESC, q.qid DESC" if direction == "backward" else "q.ts ASC, q.qid ASC"
    )
    tolf = (
        f"AND abs(cast(t.ts AS double) - cast(q.ts AS double)) <= {tol}"
        if tol is not None
        else ""
    )
    return spark.sql(
        f"""
        SELECT tid, sym, qty, ts_r, px_r, qid_r FROM (
          SELECT t.tid, t.sym, t.qty, q.ts AS ts_r, q.px AS px_r,
                 q.qid AS qid_r,
                 row_number() OVER (PARTITION BY t.tid ORDER BY {order}) rn
          FROM t LEFT JOIN q ON q.sym = t.sym AND {cmp} {tolf}
        ) WHERE rn = 1 ORDER BY tid
        """
    )


@pytest.mark.parametrize(
    "direction,exact",
    [("backward", True), ("backward", False), ("forward", True), ("forward", False)],
)
def test_asof_matches_naive(spark, frames, direction, exact):
    trades, quotes = frames
    got = (
        asof_join(
            trades,
            quotes,
            on=["sym"],
            direction=direction,
            allow_exact_match=exact,
            tiebreak="qid",
        )
        .select("tid", "sym", "qty", "ts_r", "px_r", "qid_r")
        .orderBy("tid")
    )
    want = _naive_asof(spark, trades, quotes, direction, exact)
    assert [r.asDict() for r in got.collect()] == [
        r.asDict() for r in want.collect()
    ]


def test_asof_tolerance_and_inner(spark, frames):
    trades, quotes = frames
    got = asof_join(
        trades,
        quotes,
        on=["sym"],
        tolerance_sec=30.0,
        tiebreak="qid",
    )
    rows = {r.tid: r for r in got.collect()}
    # tid=103 (10:05:00): nearest quote is 4 min away -> tolerance nulls it
    assert rows[103].px_r is None and rows[103].ts_r is None
    # tid=102 (10:00:30): quote at 10:00:05 is 25s away -> kept
    assert rows[102].px_r == 12.0
    inner = asof_join(
        trades, quotes, on=["sym"], tolerance_sec=30.0, tiebreak="qid", how="inner"
    )
    # 104 (B @10:00:00) has no quote at-or-before it — B's only quote is
    # 30s later — so backward+inner drops it
    assert {r.tid for r in inner.collect()} == {101, 102}


def test_asof_numeric_ts_and_payload_subset(spark):
    left = spark.createDataFrame([Row(k=1, pos=10), Row(k=1, pos=3)])
    right = spark.createDataFrame(
        [Row(k=1, pos=2, a="x", b=1), Row(k=1, pos=9, a="y", b=2)]
    )
    got = asof_join(
        left, right, on=["k"], left_ts="pos", right_ts="pos", right_cols=["a"]
    )
    assert set(got.columns) == {"k", "pos", "pos_r", "a_r"}
    rows = {r.pos: r for r in got.collect()}
    assert rows[10].a_r == "y" and rows[3].a_r == "x"


def test_asof_single_exchange_plan(spark, frames):
    trades, quotes = frames
    plan = asof_join(
        trades, quotes, on=["sym"], tiebreak="qid"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "NestedLoop" not in plan and "Cartesian" not in plan


@pytest.fixture(scope="module")
def interval_frames(spark):
    pts = spark.createDataFrame(
        [Row(k="u", p=float(x), pid=i) for i, x in enumerate(
            [0.0, 5.0, 10.0, 99.9, 100.0, 250.0, 1000.0]
        )]
        + [Row(k="v", p=50.0, pid=90)]
    )
    ivs = spark.createDataFrame(
        [
            Row(k="u", s=0.0, e=10.0, iid=1),       # closed hits 0,5,10
            Row(k="u", s=90.0, e=100.0, iid=2),     # bucket-boundary spans
            Row(k="u", s=240.0, e=260.0, iid=3),
            Row(k="u", s=2000.0, e=2100.0, iid=4),  # matches nothing
            Row(k="v", s=0.0, e=100.0, iid=5),      # other key
        ]
    )
    return pts, ivs


@pytest.mark.parametrize("bounds", ["closed", "half_open"])
@pytest.mark.parametrize("width", [7.0, 100.0, 1000.0])
def test_range_join_matches_naive(spark, interval_frames, bounds, width):
    pts, ivs = interval_frames
    got = (
        range_join(
            pts,
            ivs,
            on=["k"],
            point_col="p",
            start_col="s",
            end_col="e",
            bucket_width=width,
            bounds=bounds,
        )
        .select("pid", "iid")
        .orderBy("pid", "iid")
        .collect()
    )
    op = "<=" if bounds == "closed" else "<"
    want = (
        pts.alias("p")
        .join(
            ivs.alias("i"),
            (F.col("p.k") == F.col("i.k"))
            & (F.col("i.s") <= F.col("p.p"))
            & F.expr(f"p.p {op} i.e"),
        )
        .select("pid", "iid")
        .orderBy("pid", "iid")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) > 0


def test_range_join_timestamps_exact_once(spark):
    base = _ts("2024-03-01 00:00:00")
    pts = spark.createDataFrame(
        [Row(p=base + dt.timedelta(seconds=s), pid=i) for i, s in enumerate(
            [0, 899, 900, 901, 5000]
        )]
    )
    ivs = spark.createDataFrame(
        [Row(s=base, e=base + dt.timedelta(seconds=900), iid=1)]
    )
    got = range_join(
        pts, ivs, on=[], point_col="p", start_col="s", end_col="e",
        bucket_width=900.0,
    )
    # each matching pair exactly once, boundary inclusive both ends
    assert sorted(r.pid for r in got.collect()) == [0, 1, 2]


def test_range_join_guards(spark, interval_frames):
    pts, ivs = interval_frames
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception)) as ei:
        range_join(
            pts, ivs, on=["k"], point_col="p", start_col="s", end_col="e",
            bucket_width=0.001, max_buckets=100,
        ).collect()
    assert "range_join" in str(ei.value)
    with pytest.raises(ValueError, match="collision"):
        range_join(
            pts.withColumnRenamed("pid", "iid"), ivs, on=["k"],
            point_col="p", start_col="s", end_col="e",
        )


@pytest.fixture(scope="module")
def overlap_frames(spark):
    # long spans crossing many buckets — the exactly-once canonical
    # bucket rule is what keeps these from double-counting
    left = spark.createDataFrame(
        [
            Row(k="u", ls=0.0, le=100.0, lid=1),
            Row(k="u", ls=100.0, le=150.0, lid=2),   # touches rid=10 at 100
            Row(k="u", ls=500.0, le=2000.0, lid=3),  # long
            Row(k="u", ls=3000.0, le=3001.0, lid=4), # matches nothing
            Row(k="v", ls=0.0, le=10.0, lid=5),
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="u", rs=50.0, re=100.0, rid=10),
            Row(k="u", rs=90.0, re=600.0, rid=11),
            Row(k="u", rs=1999.0, re=2500.0, rid=12),
            Row(k="v", rs=10.0, re=20.0, rid=13),    # touches lid=5 at 10
            Row(k="v", rs=11.0, re=20.0, rid=14),    # does not
        ]
    )
    return left, right


@pytest.mark.parametrize("bounds", ["closed", "half_open"])
@pytest.mark.parametrize("width", [7.0, 100.0, 5000.0])
def test_interval_join_matches_naive(spark, overlap_frames, bounds, width):
    left, right = overlap_frames
    got = (
        interval_join(
            left,
            right,
            on=["k"],
            left_start="ls",
            left_end="le",
            right_start="rs",
            right_end="re",
            bucket_width=width,
            bounds=bounds,
        )
        .select("lid", "rid")
        .orderBy("lid", "rid")
        .collect()
    )
    op = "<=" if bounds == "closed" else "<"
    want = (
        left.alias("l")
        .join(
            right.alias("r"),
            (F.col("l.k") == F.col("r.k"))
            & F.expr(f"l.ls {op} r.re AND r.rs {op} l.le"),
        )
        .select("lid", "rid")
        .orderBy("lid", "rid")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) > 0
    # exactly-once: no pair may appear twice even at tiny widths
    assert len(got) == len(set(map(tuple, got)))


def test_interval_join_bounds_semantics(spark, overlap_frames):
    left, right = overlap_frames
    kw = dict(
        on=["k"], left_start="ls", left_end="le",
        right_start="rs", right_end="re", bucket_width=50.0,
    )
    closed = {
        (r.lid, r.rid)
        for r in interval_join(left, right, bounds="closed", **kw).collect()
    }
    half = {
        (r.lid, r.rid)
        for r in interval_join(left, right, bounds="half_open", **kw).collect()
    }
    # endpoint-touching pairs exist only under closed bounds
    assert (2, 10) in closed and (2, 10) not in half
    assert (5, 13) in closed and (5, 13) not in half
    assert (3, 12) in closed and (3, 12) in half  # real overlap survives


def test_interval_join_guards_and_plan(spark, overlap_frames):
    left, right = overlap_frames
    with pytest.raises(ValueError, match="collision"):
        interval_join(
            left.withColumnRenamed("lid", "rid"), right, on=["k"],
            left_start="ls", left_end="le",
            right_start="rs", right_end="re",
        )
    plan = interval_join(
        left, right, on=["k"], left_start="ls", left_end="le",
        right_start="rs", right_end="re", bucket_width=100.0,
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_range_join_no_nested_loop_plan(spark, interval_frames):
    pts, ivs = interval_frames
    plan = range_join(
        pts, ivs, on=["k"], point_col="p", start_col="s", end_col="e",
        bucket_width=100.0,
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_asof_enrich_stream_matches_batch(spark, frames, tmp_path):
    """Streaming twin: two micro-batches of trades enriched against the
    static quotes frame produce exactly the batch asof_join rows."""
    from tinyolap_spark.streaming.ingest import asof_enrich_stream

    trades, quotes = frames
    src = str(tmp_path / "asof_src")
    b0 = trades.where(F.col("tid") <= 101)
    b1 = trades.where(F.col("tid") > 101)
    b0.coalesce(1).write.mode("overwrite").parquet(src)
    b1.coalesce(1).write.mode("append").parquet(src)

    got: dict[int, list] = {}

    def sink(enriched, batch_id):
        got[batch_id] = sorted(
            (r.tid, r.px_r, r.qid_r) for r in enriched.collect()
        )

    stream = (
        spark.readStream.schema("sym string, ts timestamp, qty long, tid long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = asof_enrich_stream(
        stream,
        quotes,
        str(tmp_path / "asof_ckpt"),
        sink,
        on=["sym"],
        tiebreak="qid",
        tolerance_sec=120.0,
    )
    q.awaitTermination(180)
    assert len(got) == 2, f"expected 2 micro-batches, got {got.keys()}"
    stream_rows = sorted(r for rows in got.values() for r in rows)
    batch_rows = sorted(
        (r.tid, r.px_r, r.qid_r)
        for r in asof_join(
            trades, quotes, on=["sym"], tiebreak="qid", tolerance_sec=120.0
        ).collect()
    )
    assert stream_rows == batch_rows


def test_invalid_intervals_skipped_and_reserved_names_guarded(spark):
    pts = spark.createDataFrame([Row(p=5.0, pid=1)])
    ivs = spark.createDataFrame(
        [Row(s=10.0, e=0.0, iid=1), Row(s=0.0, e=10.0, iid=2)]
    )
    got = range_join(
        pts, ivs, on=[], point_col="p", start_col="s", end_col="e",
        bucket_width=5.0,
    ).collect()
    assert [(r.pid, r.iid) for r in got] == [(1, 2)]
    left = spark.createDataFrame([Row(k=1, ts=1.0, __pay="boom")])
    right = spark.createDataFrame([Row(k=1, ts=0.0, v=1)])
    with pytest.raises(ValueError, match="reserved"):
        asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts")
