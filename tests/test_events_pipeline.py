"""Event-stream batch operators (`pipeline/events.py`) and PII scrubbing
(`pipeline/text.py`): correctness on hand-built fixtures + plan shape
(single shuffle, no Python in the hot path)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from tinyolap_spark.pipeline.events import (
    json_prop_rollup,
    last_touch_attribution,
    with_last_touch,
)
from tinyolap_spark.pipeline.text import PII_PATTERNS, pii_counts, scrub_pii


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )


def test_last_touch_attribution_semantics(spark):
    T = datetime
    rows = [
        # user 1: click -> purchase 10 min later (attributed)
        (1, T(2024, 1, 1, 10, 0), 1, "click", 0.0, "{}"),
        (2, T(2024, 1, 1, 10, 10), 1, "purchase", 50.0, "{}"),
        # user 1: second purchase 40 min after the click (NOT attributed)
        (3, T(2024, 1, 1, 10, 40, 1), 1, "purchase", 30.0, "{}"),
        # user 2: purchase with no prior click (NOT attributed; a later
        # click must not attribute retroactively)
        (4, T(2024, 1, 1, 9, 0), 2, "purchase", 20.0, "{}"),
        (5, T(2024, 1, 1, 9, 30), 2, "click", 0.0, "{}"),
        # user 3: click after purchase same ts, higher event_id -> excluded
        (6, T(2024, 1, 1, 8, 0), 3, "purchase", 10.0, "{}"),
        (7, T(2024, 1, 1, 8, 0), 3, "click", 0.0, "{}"),
    ]
    out = last_touch_attribution(
        _events(spark, rows), "purchase", "click", 1800
    ).collect()
    got = {r["user_id"]: (r["n_target"], r["n_attributed"],
                          r["attributed_value"]) for r in out}
    assert got[1] == (2, 1, 50.0)
    assert got[2] == (1, 0, 0.0)
    assert got[3] == (1, 0, 0.0)


def test_with_last_touch_never_self_matches(spark):
    T = datetime
    # identical types would self-match (frame includes the current row) —
    # rejected up front since the hardening pass
    rows = [(1, T(2024, 1, 1), 1, "purchase", 5.0, "{}")]
    with pytest.raises(ValueError, match="must differ"):
        with_last_touch(_events(spark, rows), "purchase", "purchase")
    # distinct types: a lone target has no source to match
    out2 = with_last_touch(_events(spark, rows), "purchase", "click")
    assert out2.collect()[0]["last_source_ts"] is None


def test_attribution_plan_single_shuffle_no_python(spark):
    ev = _events(
        spark, [(1, datetime(2024, 1, 1), 1, "click", 0.0, "{}")]
    )
    plan = (
        last_touch_attribution(ev)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # one exchange for the user window; the groupBy on user_id reuses it
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_json_prop_rollup(spark):
    rows = [
        (1, datetime(2024, 1, 1), 1, "view", 1.0, '{"k": 5}'),
        (2, datetime(2024, 1, 1), 1, "view", 2.0, '{"k": 14}'),
        (3, datetime(2024, 1, 1), 2, "view", 3.0, '{"k": 15}'),
        (4, datetime(2024, 1, 1), 2, "view", 4.0, '{"nope": 1}'),
    ]
    out = {r["bucket"]: (r["n_events"], r["total_value"])
           for r in json_prop_rollup(_events(spark, rows)).collect()}
    assert out == {0: (1, 1.0), 10: (2, 5.0)}


def test_scrub_pii_replaces_each_type(spark):
    text = (
        "mail a.user+tag@sub.example.co.uk, ssn 123-45-6789, "
        "card 4111 1111 1111 1111, ip 192.168.0.254, tel +1 415-555-0134."
    )
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(
        scrub_pii("text").alias("s"),
        *[c.alias(f"n_{k}") for k, c in pii_counts("text").items()],
    ).collect()[0]
    s = row["s"]
    for name, _ in PII_PATTERNS:
        assert f"<{name.upper()}>" in s, (name, s)
    assert "example.co.uk" not in s and "6789" not in s
    assert "4111" not in s and "192.168" not in s and "555-0134" not in s
    assert (row["n_email"], row["n_ssn"], row["n_credit_card"],
            row["n_ipv4"], row["n_phone"]) == (1, 1, 1, 1, 1)


def test_scrub_pii_clean_text_untouched(spark):
    clean = "a perfectly ordinary sentence with numbers like 42 and 2024."
    df = spark.createDataFrame([(clean,)], "text string")
    assert df.select(scrub_pii("text").alias("s")).collect()[0]["s"] == clean


def test_same_source_target_rejected(spark):
    """Code-review regression: identical source/target types would
    self-attribute every event (window frame includes the current row)."""
    from tinyolap_spark.streaming.ingest import attribution_stream

    ev = _events(spark, [(1, datetime(2024, 1, 1), 1, "click", 0.0, "{}")])
    with pytest.raises(ValueError, match="must differ"):
        last_touch_attribution(ev, "click", "click")
    with pytest.raises(ValueError, match="must differ"):
        attribution_stream(ev, "click", "click")


def test_remove_boilerplate_semantics(spark):
    """Lines in >= min_docs distinct docs drop everywhere; survivors keep
    original order; a doc left with no lines disappears (fully
    boilerplate); duplicate lines WITHIN one doc don't count twice."""
    from tinyolap_spark.pipeline.text import remove_boilerplate

    docs = spark.createDataFrame(
        [
            (1, "HEAD\nalpha\nbeta\nHEAD\nFOOT"),  # HEAD twice in one doc
            (2, "HEAD\ngamma\nFOOT"),
            (3, "HEAD\ndelta\nFOOT"),
            (4, "HEAD\nFOOT"),                      # only boilerplate
            (5, "alpha\nepsilon"),                  # alpha in 2 docs only
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"]
           for r in remove_boilerplate(docs, min_docs=3).collect()}
    assert out[1] == "alpha\nbeta"      # order kept, HEAD/FOOT dropped
    assert out[2] == "gamma"
    assert out[3] == "delta"
    assert 4 not in out                 # fully-boilerplate doc vanishes
    assert out[5] == "alpha\nepsilon"   # 2 < min_docs: alpha survives


def test_attribution_matches_bruteforce_random(spark):
    """Randomized differential check (seeded): last_touch_attribution over
    2000 random events must equal a brute-force per-user Python replay —
    ties, gap edges, missing sources and interleavings included."""
    import random
    from datetime import timedelta

    rng = random.Random(42)
    base = datetime(2024, 1, 1)
    rows = []
    for eid in range(2000):
        rows.append((
            eid,
            base + timedelta(seconds=rng.randrange(0, 7200)),
            rng.randrange(1, 40),
            rng.choice(["click", "purchase", "view"]),
            round(rng.uniform(0, 100), 2),
            "{}",
        ))
    ev = _events(spark, rows)
    got = {r["user_id"]: (r["n_target"], r["n_attributed"],
                          r["attributed_value"])
           for r in last_touch_attribution(ev, "purchase", "click", 600)
           .collect()}

    # brute force: replay per user in (ts, event_id) order
    expected = {}
    by_user = {}
    for eid, ts, uid, et, val, _ in rows:
        by_user.setdefault(uid, []).append((ts, eid, et, val))
    for uid, events in by_user.items():
        last_click = None
        n_t = n_a = 0
        cents = 0
        for ts, eid, et, val in sorted(events):
            if et == "click":
                last_click = ts if last_click is None else max(last_click, ts)
            elif et == "purchase":
                n_t += 1
                if last_click is not None and (
                    int(ts.timestamp()) - int(last_click.timestamp()) <= 600
                ):
                    n_a += 1
                    cents += round(val * 100)
        if n_t:
            expected[uid] = (n_t, n_a, pytest.approx(cents / 100))
    assert got == expected


def test_remove_boilerplate_literal_separator(spark):
    """Review regression: a separator with regex metacharacters ('|')
    must be treated literally in BOTH split and rejoin."""
    from tinyolap_spark.pipeline.text import remove_boilerplate

    docs = spark.createDataFrame(
        [(1, "HEAD|alpha|beta"), (2, "HEAD|gamma"), (3, "HEAD|delta")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"]
           for r in remove_boilerplate(docs, min_docs=3, line_sep="|")
           .collect()}
    assert out == {1: "alpha|beta", 2: "gamma", 3: "delta"}


# ------------------------------------------------- ordered funnel


def test_funnel_stages_known_sequences(spark):
    from datetime import datetime

    from tinyolap_spark.pipeline.events import funnel_stages, funnel_summary

    def t(s):
        return datetime(2026, 1, 1, 0, 0, s)

    rows = [
        # user 1: full funnel in order -> stage 3
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # user 2: click BEFORE view, never after -> stage 1
        (2, t(1), "click"), (2, t(2), "view"),
        # user 3: view then purchase (skips click) -> stage 1
        (3, t(1), "view"), (3, t(5), "purchase"),
        # user 4: no funnel events at all -> stage 0
        (4, t(1), "error"),
        # user 5: click at the SAME ts as view -> strict order rejects it
        (5, t(1), "view"), (5, t(1), "click"), (5, t(2), "purchase"),
        # user 6: out-of-order noise, full funnel later -> stage 3
        (6, t(1), "purchase"), (6, t(2), "view"), (6, t(3), "click"),
        (6, t(4), "purchase"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        r.user_id: r.stage
        for r in funnel_stages(ev, ["view", "click", "purchase"]).collect()
    }
    assert got == {1: 3, 2: 1, 3: 1, 4: 0, 5: 1, 6: 3}
    summ = {
        r.stage: r.n_users
        for r in funnel_summary(ev, ["view", "click", "purchase"]).collect()
    }
    assert summ == {0: 1, 1: 3, 3: 2}


def test_funnel_windowed_and_anyorder(spark):
    from datetime import datetime, timedelta

    import pytest as _pytest

    from tinyolap_spark.pipeline.events import funnel_stages

    def t(s):
        return datetime(2026, 1, 1, 0, 0, 0) + timedelta(seconds=s)

    rows = [
        # user 1: view -> click(+5s) -> purchase(+5s): inside any window
        (1, t(0), "view"), (1, t(5), "click"), (1, t(10), "purchase"),
        # user 2: click arrives 100s after view -> outside a 60s window
        (2, t(0), "view"), (2, t(100), "click"), (2, t(110), "purchase"),
        # user 3: GREEDY matters — first view at t0, click at t90 is out
        # of window of it; a SECOND view at t80 would admit the click,
        # but greedy already matched t0 -> stage 1 windowed
        (3, t(0), "view"), (3, t(80), "view"), (3, t(90), "click"),
        # user 4: purchase then click then view -> any-order sees all 3
        (4, t(0), "purchase"), (4, t(1), "click"), (4, t(2), "view"),
        # user 5: sub-second boundary — click at +60.000001s of view is
        # OUTSIDE a 60s window (microsecond-exact comparison)
        (5, t(0), "view"),
        (5, t(0) + timedelta(seconds=60, microseconds=1), "click"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    steps = ["view", "click", "purchase"]

    plain = {r.user_id: r.stage for r in funnel_stages(ev, steps).collect()}
    assert plain == {1: 3, 2: 3, 3: 2, 4: 1, 5: 2}

    win = {
        r.user_id: r.stage
        for r in funnel_stages(ev, steps, max_gap_sec=60).collect()
    }
    assert win == {1: 3, 2: 1, 3: 1, 4: 1, 5: 1}

    anyo = {
        r.user_id: r.stage
        for r in funnel_stages(ev, steps, ordered=False).collect()
    }
    assert anyo == {1: 3, 2: 3, 3: 2, 4: 3, 5: 2}

    with _pytest.raises(ValueError):
        funnel_stages(ev, steps, max_gap_sec=60, ordered=False)


def test_funnel_single_shuffle_plan(spark):
    from datetime import datetime

    from tinyolap_spark.pipeline.events import funnel_stages

    ev = spark.createDataFrame(
        [(1, datetime(2026, 1, 1), "view")], ["user_id", "ts", "event_type"]
    )
    plan = (
        funnel_stages(ev, ["view", "click", "purchase"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one hash-partitioning exchange on user_id, no joins, no Python
    assert plan.count("Exchange") <= 1
    assert "Join" not in plan and "BatchEvalPython" not in plan
