"""Regression tests for the round-6 ADVICE findings and VERDICT r6 items:

1. ``semantic_dup_pairs`` forwards ``vec_col`` to the assignment kernel
   (ADVICE r6 #1 — non-default vec_col used to KeyError inside Arrow);
2. ``asof_join`` forward mode never matches a NULL left timestamp
   (ADVICE r6 #2 — desc_nulls_last used to hand it the smallest quote);
3. ``asof_join`` raises on output-name collisions with left columns
   (ADVICE r6 #3 — used to emit duplicate column names silently);
4. ``asof_join`` timestamp tolerance is exact at the boundary in integer
   microseconds (VERDICT r6 #3 — double cast was approximate);
5. ``funnel_stages(max_events_per_user=N)`` bounds per-user state and
   reports truncation via ``capped_stats`` (VERDICT r6 #2);
6. ``normalize_events`` warns when it changes a non-UTC session
   timezone (ADVICE r6 #4).
"""

import datetime as dt

import pytest

from tinyolap_spark.pipeline.events import funnel_stages, funnel_summary
from tinyolap_spark.pipeline.joins import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


# ------------------------------------------------------------ 1. vec_col
def test_semantic_dup_pairs_respects_vec_col(spark):
    from tinyolap_spark.pipeline.similarity import semantic_dup_pairs

    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9999, 0.01]),  # near-dup of 1
        (3, [0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, vec array<float>")
    centroids = [[1.0, 0.0], [0.0, 1.0]]
    got = semantic_dup_pairs(
        emb, centroids, threshold=0.99, vec_col="vec"
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(1, 2)]
    # default-named column still works (no regression)
    emb2 = emb.withColumnRenamed("vec", "embedding")
    got2 = semantic_dup_pairs(emb2, centroids, threshold=0.99).collect()
    assert [(r["id_a"], r["id_b"]) for r in got2] == [(1, 2)]


# --------------------------------------------------- 2. NULL left ts asof
def test_asof_forward_null_left_ts_never_matches(spark):
    left = spark.createDataFrame(
        [("A", None), ("A", _ts("2024-01-01 10:00:00"))],
        "sym string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("A", _ts("2024-01-01 10:30:00"), 7.0)],
        "sym string, ts timestamp, px double",
    )
    # no tolerance: this is exactly the case where the bogus match survived
    out = asof_join(left, right, on=["sym"], direction="forward")
    by_ts = {r["ts"]: r for r in out.collect()}
    assert by_ts[None]["px_r"] is None
    assert by_ts[None]["ts_r"] is None
    assert by_ts[_ts("2024-01-01 10:00:00")]["px_r"] == 7.0
    # backward unchanged
    out_b = asof_join(left, right, on=["sym"], direction="backward")
    assert {r["px_r"] for r in out_b.collect()} == {None}


# ------------------------------------------------- 3. suffix collision
def test_asof_output_collision_raises(spark):
    left = spark.createDataFrame(
        [("A", _ts("2024-01-01 10:00:00"), 1.0)],
        "sym string, ts timestamp, px_r double",
    )
    right = spark.createDataFrame(
        [("A", _ts("2024-01-01 09:00:00"), 2.0)],
        "sym string, ts timestamp, px double",
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on=["sym"])  # px -> px_r clashes
    # ts_r collision via the matched-timestamp output column
    left2 = left.withColumnRenamed("px_r", "ts_r")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left2, right, on=["sym"], right_cols=[])
    # a different suffix resolves it
    ok = asof_join(left, right, on=["sym"], suffix="_q")
    assert ok.collect()[0]["px_q"] == 2.0


# ---------------------------------------------- 4. exact boundary tolerance
def test_asof_tolerance_exact_integer_boundary(spark):
    t0 = _ts("2024-01-01 10:00:00")
    gap_exact = t0 + dt.timedelta(seconds=30)
    gap_over = t0 + dt.timedelta(seconds=30, microseconds=1)
    left = spark.createDataFrame(
        [("A", gap_exact), ("B", gap_over)], "sym string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("A", t0, 1.0), ("B", t0, 2.0)],
        "sym string, ts timestamp, px double",
    )
    out = {
        r["sym"]: r["px_r"]
        for r in asof_join(
            left, right, on=["sym"], tolerance_sec=30.0
        ).collect()
    }
    assert out["A"] == 1.0  # gap == tolerance: matches, bit-exact
    assert out["B"] is None  # gap == tolerance + 1 microsecond: nulled

    # numeric ts columns keep the double path
    nleft = spark.createDataFrame([("A", 30.0)], "sym string, ts double")
    nright = spark.createDataFrame(
        [("A", 0.0, 9.0)], "sym string, ts double, px double"
    )
    nout = asof_join(nleft, nright, on=["sym"], tolerance_sec=30.0).collect()
    assert nout[0]["px_r"] == 9.0


# ------------------------------------------------- 5. funnel per-user cap
def _funnel_events(spark, bot_events=1000):
    rows = []
    base = _ts("2024-01-01 00:00:00")
    # user 1: clean full funnel
    for i, tp in enumerate(["view", "click", "purchase"]):
        rows.append((1, base + dt.timedelta(minutes=i), tp))
    # user 2: no step events at all -> stage 0, must survive the filter
    rows.append((2, base, "noise"))
    # user 9 (bot): bot_events views first, then the full funnel at the end
    for i in range(bot_events):
        rows.append((9, base + dt.timedelta(seconds=i), "view"))
    rows.append((9, base + dt.timedelta(days=1), "click"))
    rows.append((9, base + dt.timedelta(days=2), "purchase"))
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def test_funnel_cap_bounds_state_and_reports(spark):
    ev = _funnel_events(spark, bot_events=1000)
    steps = ["view", "click", "purchase"]
    # uncapped: bot completes the funnel
    uncapped = {
        r["user_id"]: r["stage"] for r in funnel_stages(ev, steps).collect()
    }
    assert uncapped == {1: 3, 2: 0, 9: 3}
    stats = {}
    capped = {
        r["user_id"]: r["stage"]
        for r in funnel_stages(
            ev, steps, max_events_per_user=100, capped_stats=stats
        ).collect()
    }
    # bot truncated to its first 100 views -> stage 1; others unaffected
    assert capped == {1: 3, 2: 0, 9: 1}
    assert stats["truncated_users"] == 1
    assert stats["dropped_events"] == 1000 + 2 - 100
    # summary keeps the stage-0 row
    summary = {
        r["stage"]: r["n_users"]
        for r in funnel_summary(ev, steps).collect()
    }
    assert summary == {0: 1, 3: 2}


def test_funnel_cap_anyorder_and_windowed(spark):
    ev = _funnel_events(spark, bot_events=50)
    steps = ["view", "click", "purchase"]
    stats = {}
    anyorder = {
        r["user_id"]: r["stage"]
        for r in funnel_stages(
            ev,
            steps,
            ordered=False,
            max_events_per_user=10,
            capped_stats=stats,
        ).collect()
    }
    assert anyorder == {1: 3, 2: 0, 9: 1}
    assert stats["truncated_users"] == 1
    # windowed mode composes with the cap (cap keeps earliest events)
    windowed = {
        r["user_id"]: r["stage"]
        for r in funnel_stages(
            ev, steps, max_gap_sec=3600, max_events_per_user=10
        ).collect()
    }
    assert windowed[1] == 3
    assert windowed[9] == 1  # truncation dropped click/purchase
    with pytest.raises(ValueError, match="max_events_per_user"):
        funnel_stages(ev, steps, max_events_per_user=0)


def test_funnel_cap_single_exchange_no_join(spark):
    """The cap's window must reuse the funnel's hash partitioning: even
    capped, the plan stays ONE Exchange with no join and no Python."""
    ev = _funnel_events(spark, bot_events=10)
    plan = funnel_stages(
        ev, ["view", "click", "purchase"], max_events_per_user=5
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1, plan
    assert "Join" not in plan and "BatchEvalPython" not in plan


# --------------------------------------------------- 6. normalize_events tz
def test_normalize_events_is_session_tz_free(spark):
    """VERDICT r7 #4 closed the r6-advice warning path for good: the
    helper must neither read nor write the session timezone — the same
    input yields the same NTZ wall clock under any session tz."""
    import datetime as dt

    from tinyolap_spark.streaming.ingest import normalize_events

    prior = spark.conf.get("spark.sql.session.timeZone")
    want = dt.datetime(2024, 6, 1, 12, 0, 30)
    try:
        for tz in ("UTC", "America/New_York", "Asia/Kolkata"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            assert (
                spark.conf.get("spark.sql.session.timeZone") == tz
            )
            # bigint epoch-nanos input
            ns = spark.createDataFrame(
                [(int(want.replace(tzinfo=dt.timezone.utc).timestamp())
                  * 1_000_000_000,)],
                "ts long",
            )
            got = normalize_events(ns)
            assert dict(got.dtypes)["ts"] == "timestamp_ntz"
            assert got.collect()[0]["ts"] == want, tz
            # NTZ input passes through untouched
            ntz = spark.sql(
                "SELECT TIMESTAMP_NTZ'2024-06-01 12:00:30' AS ts"
            )
            assert normalize_events(ntz).collect()[0]["ts"] == want, tz
            # the session timezone was not mutated
            assert spark.conf.get("spark.sql.session.timeZone") == tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)


# ------------------------------------- 7. decontam gram-scan restructure
def test_exploded_grams_matches_hof_formulation(spark):
    """The codegen'd position-explode gram scan must emit exactly the
    rows the higher-order-function formulation emits (duplicates
    included) — short docs, empty/whitespace text, and runs of
    separators are where an off-by-one in the position range would
    show."""
    from pyspark.sql import functions as F

    from tinyolap_spark.pipeline.decontam import (
        _exploded_grams,
        _tokens,
        word_ngrams,
    )

    docs = spark.createDataFrame(
        [
            (1, "only three tokens"),
            (2, ""),
            (3, None),
            (4, "a  b   c d e f g h i j"),  # separator runs
            (5, "x " * 20),                 # repeated gram (dups kept)
            (6, "exactly eight tokens one two three four five"),
        ],
        "doc_id long, text string",
    )
    for n in (2, 8):
        hof = docs.select(
            "doc_id", F.explode(word_ngrams("text", n)).alias("gram")
        )
        pos = _exploded_grams(
            docs.select("doc_id", _tokens("text").alias("__toks")),
            n,
            "doc_id",
        )
        assert hof.exceptAll(pos).count() == 0, f"n={n}: missing rows"
        assert pos.exceptAll(hof).count() == 0, f"n={n}: extra rows"
    # n=8 sanity: only doc 4 (10 tokens), doc 5 (20), doc 6 (8) produce grams
    counts = dict(
        _exploded_grams(
            docs.select("doc_id", _tokens("text").alias("__toks")), 8, "doc_id"
        )
        .groupBy("doc_id")
        .count()
        .collect()
    )
    assert counts == {4: 3, 5: 13, 6: 1}


# --------------------------------- 8. containment posting-frame sharing
def test_containment_share_posts_identical(spark):
    from tinyolap_spark.pipeline import dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "intro words alpha beta gamma delta epsilon zeta eta "
                "theta trailing content"),
            (3, "unrelated text entirely different tokens here now"),
        ],
        "doc_id long, text string",
    )
    shared = {
        tuple(r)
        for r in dedup.containment_pairs(docs, threshold=0.9).collect()
    }
    lazy = {
        tuple(r)
        for r in dedup.containment_pairs(
            docs, threshold=0.9, share_posts=False
        ).collect()
    }
    assert shared == lazy
    assert (1, 2) in {(a, b) for a, b, *_ in shared}


# --------------------------------- 9. shared codegen posting builder
def test_shingle_posts_matches_shingle_array_explode(spark):
    """dedup.shingle_posts (position explode + codegen gram + distinct
    groupBy) must emit exactly the posting rows that exploding the
    HOF-built shingles() array emits — including the short-doc
    single-shingle and NULL-text empty-shingle quirks."""
    from pyspark.sql import functions as F

    from tinyolap_spark.pipeline.dedup import shingle_posts, shingles

    docs = spark.createDataFrame(
        [
            (1, ""),
            (2, None),
            (3, "one two"),                      # shorter than n
            (4, "a  b\tc   d"),                  # separator runs
            (5, "x x x x x x x"),                # in-doc duplicates
            (6, "alpha beta gamma delta epsilon zeta"),
        ],
        "doc_id long, text string",
    )
    for n in (3, 5):
        hof = docs.select(
            "doc_id", F.explode(shingles("text", n)).alias("g")
        )
        new = shingle_posts(docs, "text", "doc_id", n)
        assert hof.exceptAll(new).count() == 0, f"n={n}: missing"
        assert new.exceptAll(hof).count() == 0, f"n={n}: extra"
    # hash_keys: same postings, hashed
    hashed = {
        tuple(r) for r in shingle_posts(
            docs, "text", "doc_id", 3, hash_keys=True
        ).collect()
    }
    plain = {
        (d, g)
        for d, g in [
            tuple(r) for r in shingle_posts(docs, "text", "doc_id", 3).collect()
        ]
    }
    import pyspark.sql.functions as FF

    want = {
        (d, spark.range(1).select(FF.xxhash64(FF.lit(g))).collect()[0][0])
        for d, g in plain
    }
    assert hashed == want
