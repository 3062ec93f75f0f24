"""Structured-Streaming extension tests (events fixture)."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def event_files(spark, tmp_path_factory):
    """Re-emit the events fixture as a directory of parquet files with a
    normalized TIMESTAMP ts (streaming source needs a standard schema;
    normalize_events handles both fixture schemas the driver has shipped)."""
    from tinyolap_spark.streaming.ingest import normalize_events

    out = str(tmp_path_factory.mktemp("events_src"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = normalize_events(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    )
    ev.repartition(3).write.mode("overwrite").parquet(out)
    return out


def test_windowed_rollup_stream(spark, event_files, tmp_path):
    from tinyolap_spark.streaming import ingest

    stream = ingest.events_stream(spark, event_files, max_files_per_trigger=10)
    assert stream.isStreaming
    agg = ingest.windowed_rollup_stream(stream, window="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_rollup")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT event_type, sum(n_events) AS n FROM win_rollup GROUP BY 1"
    ).collect()
    want = (
        spark.read.parquet(event_files)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert {(r["event_type"], r["n"]) for r in got} == {
        (r["event_type"], r["n"]) for r in want
    }


def test_stream_fact_ingestion_into_cube(spark, event_files, tmp_path):
    """Events stream continuously into a cube; final rollup equals batch."""
    from tinyolap_spark import Database
    from tinyolap_spark.streaming import ingest

    db = Database("stream_db", spark=spark)
    etypes = [
        r["event_type"]
        for r in spark.read.parquet(event_files)
        .select("event_type").distinct().orderBy("event_type").collect()
    ]
    d_type = db.add_dimension("etype").edit()
    d_type.add_many("All Types", etypes)
    d_type.commit()
    d_bucket = db.add_dimension("bucket").edit()
    d_bucket.add_many("All Users", [f"u{b}" for b in range(4)])
    d_bucket.commit()
    cube = db.add_cube("events_cube", [d_type, d_bucket])

    type_ids = {m.name: m.index for m in d_type.leaf_members}
    bucket_ids = {m.name: m.index for m in d_bucket.leaf_members}

    def mapper(batch_df):
        tmap = F.create_map(
            *[x for k, v in type_ids.items() for x in (F.lit(k), F.lit(v))]
        )
        bmap = F.create_map(
            *[x for k, v in bucket_ids.items() for x in (F.lit(k), F.lit(v))]
        )
        return batch_df.select(
            tmap[F.col("event_type")].alias("etype"),
            bmap[F.concat(F.lit("u"), F.col("user_id") % 4)].alias("bucket"),
            F.col("value").alias("value"),
        )

    stream = ingest.events_stream(spark, event_files, max_files_per_trigger=1)
    q = ingest.stream_fact_writes(stream, cube, mapper, str(tmp_path / "ck2"))
    q.awaitTermination(180)

    got = cube["All Types", "All Users"]
    want = spark.read.parquet(event_files).agg(F.sum("value")).collect()[0][0]
    assert got == pytest.approx(want)
    # per-type cell matches too
    t0 = etypes[0]
    want0 = (
        spark.read.parquet(event_files)
        .where(F.col("event_type") == t0)
        .agg(F.sum("value"))
        .collect()[0][0]
    )
    assert cube[t0, "All Users"] == pytest.approx(want0)


def test_sessionize_stream(spark, event_files, tmp_path):
    from tinyolap_spark.streaming import ingest

    stream = ingest.events_stream(spark, event_files, max_files_per_trigger=20)
    sess = ingest.sessionize_stream(stream, gap="30 minutes")
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT count(*) AS n, sum(n_events) AS e FROM sessions").collect()
    assert rows[0]["n"] > 0
    assert rows[0]["e"] == spark.read.parquet(event_files).count()


def test_dedup_stream_bounded_state(spark, tmp_path):
    """Planted duplicate events are dropped across micro-batches; the
    surviving count equals batch-mode dropDuplicates on the same keys."""
    from tinyolap_spark.streaming import ingest

    from tinyolap_spark.streaming.ingest import normalize_events

    src = str(tmp_path / "dup_src")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = normalize_events(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ).limit(500)
    # plant duplicates: every event re-emitted once with the same id+ts
    ev.unionByName(ev).repartition(4).write.mode("overwrite").parquet(src)

    stream = ingest.events_stream(spark, src, max_files_per_trigger=1)
    # watermark must cover the fixture's full 14-day event-time span:
    # with unordered files a shorter horizon drops out-of-order rows as
    # LATE (correct streaming semantics, but not what this test checks)
    dd = ingest.dedup_stream(stream, ["event_id"], watermark="30 days")
    q = (
        dd.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_dd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_out").count()
    want = spark.read.parquet(src).dropDuplicates(["event_id"]).count()
    assert got == want == 500


def test_attribution_stream_stateful(spark, tmp_path):
    """Streaming last-touch attribution (applyInPandasWithState): per-user
    last-click state carries ACROSS micro-batches; purchases attribute iff
    a click preceded them within the gap; state is one long per user."""
    import time
    from datetime import datetime as T

    from tinyolap_spark.streaming import ingest

    src = str(tmp_path / "attr_src")
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    batch1 = [
        (1, T(2024, 1, 1, 10, 0), 1, "click", 0.0, "{}"),
        (2, T(2024, 1, 1, 10, 5), 2, "purchase", 20.0, "{}"),  # no click
        (3, T(2024, 1, 1, 10, 6), 1, "view", 0.0, "{}"),  # filtered out
    ]
    batch2 = [
        # user 1's click came in the PREVIOUS batch -> state carry-over
        (4, T(2024, 1, 1, 10, 20), 1, "purchase", 50.0, "{}"),
        # 40 min after the click -> outside the 30-min gap
        (5, T(2024, 1, 1, 10, 41), 1, "purchase", 30.0, "{}"),
    ]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/b1")
    time.sleep(1.1)  # file-source orders by modification time
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/b2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = ingest.attribution_stream(stream, "purchase", "click", 1800)
    q = (
        out.writeStream.format("memory")
        .queryName("attr_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_attr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r["event_id"]: (r["user_id"], r["value"], r["attributed"])
        for r in spark.sql("SELECT * FROM attr_stream").collect()
    }
    assert rows == {
        2: (2, 20.0, False),   # never clicked
        4: (1, 50.0, True),    # click state survived the batch boundary
        5: (1, 30.0, False),   # gap exceeded
    }


@pytest.mark.slow
def test_funnel_stream_matches_batch(spark, tmp_path):
    """Streaming funnel (applyInPandasWithState): stage state carries
    across micro-batches; a TIME-ORDERED feed reproduces the batch
    funnel_stages exactly, windowed and unwindowed."""
    import time
    from datetime import datetime as T

    from tinyolap_spark.pipeline.events import funnel_stages
    from tinyolap_spark.streaming import ingest

    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    # user 1: full funnel split ACROSS batches (view|click in b1,
    # purchase in b2); user 2: click-before-view; user 3: view then a
    # click 40 min later (fails the 30-min window, passes unwindowed);
    # user 4: noise only; user 5: duplicate views then click+purchase
    batch1 = [
        (1, T(2024, 1, 1, 10, 0), 1, "view", 0.0, "{}"),
        (2, T(2024, 1, 1, 10, 5), 1, "click", 0.0, "{}"),
        (3, T(2024, 1, 1, 10, 0), 2, "click", 0.0, "{}"),
        (4, T(2024, 1, 1, 10, 1), 2, "view", 0.0, "{}"),
        (5, T(2024, 1, 1, 10, 0), 3, "view", 0.0, "{}"),
        (6, T(2024, 1, 1, 10, 2), 4, "error", 0.0, "{}"),
        (7, T(2024, 1, 1, 10, 0), 5, "view", 0.0, "{}"),
        (8, T(2024, 1, 1, 10, 1), 5, "view", 0.0, "{}"),
    ]
    batch2 = [
        (9, T(2024, 1, 1, 10, 20), 1, "purchase", 9.0, "{}"),
        (10, T(2024, 1, 1, 10, 40), 3, "click", 0.0, "{}"),
        (11, T(2024, 1, 1, 10, 41), 3, "purchase", 5.0, "{}"),
        (12, T(2024, 1, 1, 10, 30), 5, "click", 0.0, "{}"),
        (13, T(2024, 1, 1, 10, 31), 5, "purchase", 7.0, "{}"),
    ]
    all_events = spark.createDataFrame(batch1 + batch2, schema)

    for gap, qname in [(None, "funnel_stream_plain"), (1800, "funnel_stream_win")]:
        src = str(tmp_path / f"fsrc_{qname}")
        spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/b1")
        time.sleep(1.1)  # file-source orders by modification time
        spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/b2")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        out = ingest.funnel_stream(
            stream, ["view", "click", "purchase"], max_gap_sec=gap
        )
        q = (
            out.writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ck_{qname}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        emitted = spark.sql(
            f"SELECT user_id, MAX(stage) AS stage FROM {qname} GROUP BY 1"
        ).collect()
        stream_stages = {r.user_id: r.stage for r in emitted}
        batch = {
            r.user_id: r.stage
            for r in funnel_stages(
                all_events, ["view", "click", "purchase"], max_gap_sec=gap
            ).collect()
        }
        # stage >= 1 users match exactly; stage-0 users never emit
        assert stream_stages == {u: s for u, s in batch.items() if s > 0}, (
            qname, stream_stages, batch,
        )
    # sanity on the fixture itself: the window actually changes user 3
    assert {r.user_id: r.stage for r in funnel_stages(
        all_events, ["view", "click", "purchase"], max_gap_sec=1800
    ).collect()}[3] == 1


def test_interval_join_stream_matches_batch_range_join(spark, tmp_path):
    """Native watermarked stream-stream interval join == the batch
    bucketed range_join pair set (watermark >> fixture span, so nothing
    is ever late-dropped)."""
    from tinyolap_spark.pipeline.joins import range_join
    from tinyolap_spark.streaming.ingest import (
        interval_join_stream,
        normalize_events,
    )

    ev = normalize_events(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    csrc, psrc = str(tmp_path / "c"), str(tmp_path / "p")
    clicks.coalesce(2).write.parquet(csrc)
    purchases.coalesce(2).write.parquet(psrc)

    cs = spark.readStream.schema(
        "click_id long, user_id long, click_ts timestamp"
    ).parquet(csrc)
    ps = spark.readStream.schema(
        "purchase_id long, user_id long, purchase_ts timestamp"
    ).parquet(psrc)
    # clicks within the 4h window BEFORE each purchase:
    # purchase_ts - 4h <= click_ts <= purchase_ts
    joined = interval_join_stream(
        ps,
        cs,
        on=["user_id"],
        left_ts="purchase_ts",
        right_ts="click_ts",
        lower_sec=14400,
        upper_sec=0,
        watermark="3650 days",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssij")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.sql("SELECT purchase_id, click_id FROM ssij").collect()
    }
    windows = purchases.select(
        "purchase_id",
        "user_id",
        (F.col("purchase_ts") - F.expr("INTERVAL 4 HOURS")).alias("ws"),
        F.col("purchase_ts").alias("we"),
    )
    want = {
        (r.purchase_id, r.click_id)
        for r in range_join(
            clicks,
            windows,
            on=["user_id"],
            point_col="click_ts",
            start_col="ws",
            end_col="we",
            bucket_width=14400.0,
        ).collect()
    }
    assert got == want and len(got) > 0
    with pytest.raises(ValueError, match="must differ"):
        interval_join_stream(ps, cs, on=["user_id"], left_ts="t", right_ts="t")


def test_events_stream_tz_independent(spark, event_files):
    """The LTZ streaming read of NTZ-written parquet takes the stored
    UTC wall micros as epoch micros VERBATIM — the session timezone
    never shifts event time (locks the events_stream docstring claim;
    watermarks force the LTZ flavor, so this is the seam where a tz
    dependency would sneak in)."""
    from tinyolap_spark.streaming import ingest

    prior = spark.conf.get("spark.sql.session.timeZone")
    got = {}
    try:
        for tz in ("UTC", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            # batch read with the stream's schema — same code path as the
            # file-source stream, without the trigger machinery
            df = spark.read.schema(
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string"
            ).parquet(event_files)
            got[tz] = sorted(
                (r["event_id"], r["us"])
                for r in df.select(
                    "event_id", F.unix_micros("ts").alias("us")
                ).limit(500).collect()
            )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)
    assert got["UTC"] == got["America/New_York"]
