"""Skew utilities + stateful streaming operator."""

import pytest
from pyspark.sql import functions as F


def test_salted_agg_matches_plain(spark):
    from tinyolap_spark.pipeline.skew import salted_agg

    df = spark.range(0, 20000).select(
        (F.when(F.col("id") % 100 < 90, F.lit("HOT")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 7).cast("string"))
        )).alias("k"),
        (F.col("id") % 13).cast("double").alias("v"),
    )
    got = {
        (r["k"]): (r["total"], r["cnt"], r["mx"])
        for r in salted_agg(
            df, ["k"],
            {"total": ("sum", "v"), "cnt": ("count", "v"), "mx": ("max", "v")},
            salt=8,
        ).collect()
    }
    want = {
        (r["k"]): (r["total"], r["cnt"], r["mx"])
        for r in df.groupBy("k").agg(
            F.sum("v").alias("total"),
            F.count("v").alias("cnt"),
            F.max("v").alias("mx"),
        ).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == pytest.approx(want[k][0])
        assert got[k][1:] == want[k][1:]


def test_salted_broadcast_left(spark):
    from tinyolap_spark.pipeline.skew import salted_broadcast_left

    left = spark.range(0, 5000).select(
        (F.col("id") % 10).alias("k"), F.col("id").alias("v")
    )
    right = spark.createDataFrame(
        [(i, f"name{i}") for i in range(10)], ["k", "name"]
    )
    out = salted_broadcast_left(left, right, on="k", salt=4)
    assert out.count() == 5000
    row = out.where(F.col("v") == 42).collect()[0]
    assert row["name"] == f"name{42 % 10}"


def test_running_totals_stream(spark, tmp_path):
    from tinyolap_spark.streaming import ingest

    from tinyolap_spark.streaming.ingest import normalize_events

    src = str(tmp_path / "src")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = normalize_events(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    )
    ev = ev.where(F.col("user_id") < 40)  # bound state-store keys for speed
    ev.repartition(2).write.mode("overwrite").parquet(src)

    stream = ingest.events_stream(spark, src, max_files_per_trigger=10)
    totals = ingest.running_totals_stream(stream, key_col="user_id")
    q = (
        totals.writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # last emitted state per user == batch totals
    got = spark.sql(
        """
        SELECT user_id, n_events, value_sum FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY n_events DESC) rn
          FROM running_totals) WHERE rn = 1
        """
    ).collect()
    want = {
        r["user_id"]: (r["n"], r["s"])
        for r in spark.read.parquet(src)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert len(got) == len(want)
    for r in got:
        wn, ws = want[r["user_id"]]
        assert r["n_events"] == wn
        assert r["value_sum"] == pytest.approx(ws)


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """lineitem and orders co-bucketed on the order key: the join plan
    must contain NO Exchange on either side (the shuffle was paid once at
    write time), while the naive parquet join shuffles both sides."""
    from tinyolap_spark.sources import bucketed

    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{tmp_path}/wh'"
    )
    try:
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        od = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        bucketed.save_bucketed(li, "bkt.lineitem_b", "l_orderkey", 8)
        bucketed.save_bucketed(od, "bkt.orders_b", "o_orderkey", 8)

        # disable broadcast: at the sf this test runs the planner would
        # rather broadcast tiny orders — at real scale neither side fits,
        # which is exactly the regime bucketing exists for
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bucketed.bucketed_join(
                spark,
                "bkt.lineitem_b",
                "bkt.orders_b",
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, f"bucketed join shuffled:\n{plan}"
            assert "SortMergeJoin" in plan

            # the same join over plain parquet DOES shuffle both sides
            naive = li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
            nplan = naive._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" in nplan
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

        # correctness: row counts agree with the naive join
        assert joined.count() == li.join(
            od, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()

        # grouped agg on the bucket key is Exchange-free too
        agg = (
            spark.table("bkt.lineitem_b")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        aplan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in aplan
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt.lineitem_b")
        spark.sql("DROP TABLE IF EXISTS bkt.orders_b")
        spark.sql("DROP DATABASE IF EXISTS bkt")


def test_compose_mixture_plan_is_narrow(spark):
    """The assembled mixture (before any report aggregate) must be a
    narrow plan: filters + explodes + union, NO Exchange — membership
    and epoch replication are per-row decisions."""
    from pyspark.sql import functions as F

    from tinyolap_spark.pipeline.mixture import compose_mixture

    docs = spark.createDataFrame(
        [(i, "tok " * 10) for i in range(50)], ["doc_id", "text"]
    ).withColumn("text", F.trim("text"))
    mix = compose_mixture(
        {"a": docs.where(F.col("doc_id") % 2 == 0),
         "b": docs.where(F.col("doc_id") % 2 == 1)},
        {"a": 2.0, "b": 1.0},
        1500,
    )
    plan = mix._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_save_clustered_prunes_files_and_skips_exchange(spark, tmp_path):
    """VERDICT r6 #8: the COMBINED layout — bucketed on the rollup key,
    Z-ordered within buckets — measured end to end: an equality filter
    on the bucket key reads fewer FILES than the plain layout (bucket
    pruning, read from scan metrics, not asserted by fiat), the rollup
    on the bucket key carries no Exchange, and the answers match the
    plain-parquet plan exactly."""
    from tinyolap_spark.sources import bucketed

    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS clw LOCATION '{tmp_path}/wh'"
    )
    try:
        li = spark.read.parquet(
            "/root/testdata/sf0.01/lineitem.parquet"
        ).select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
        plain_p = str(tmp_path / "plain")
        li.repartition(8).write.parquet(plain_p)
        clustered = bucketed.save_clustered(
            li,
            "clw.li_c",
            bucket_cols="l_orderkey",
            zorder_cols=["l_partkey", "l_suppkey"],
            num_buckets=8,
        )
        assert "__z" not in clustered.columns

        key = li.select("l_orderkey").first()[0]

        def rollup(df):
            return (
                df.where(F.col("l_orderkey") == key)
                .groupBy("l_orderkey")
                .agg(F.sum("l_quantity").alias("q"))
            )

        plain_q = rollup(spark.read.parquet(plain_p))
        clus_q = rollup(spark.table("clw.li_c"))
        assert plain_q.collect() == clus_q.collect()

        m_plain = bucketed.scan_file_metrics(plain_q)
        m_clus = bucketed.scan_file_metrics(clus_q)
        # plain layout: the key can live anywhere -> every file read and
        # every row scanned; bucketed: one bucket survives pruning and
        # only its rows are scanned
        assert m_plain["files"] == 8, m_plain
        assert "selected_buckets" not in m_plain
        assert m_clus["selected_buckets"] == 1, m_clus
        assert m_clus["total_buckets"] == 8, m_clus
        assert m_clus["rows"] < m_plain["rows"] / 2, (m_clus, m_plain)
        # rollup on the bucket key: shuffle paid at write time, not here
        plan = clus_q._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS clw.li_c")
        spark.sql("DROP DATABASE IF EXISTS clw")


def test_zorder_tightens_minmax_stats_on_all_columns(spark, tmp_path):
    """Z-order layout MEASURED via parquet row-group statistics: after
    clustering on (l_orderkey, l_partkey), the per-row-group normalized
    min/max span collapses on BOTH columns at once (a single-column
    sort can only do one), so multi-dimensional predicates prune."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from tinyolap_spark.sources.zorder import zorder

    li = spark.read.parquet(
        "/root/testdata/sf0.001/lineitem.parquet"
    ).select("l_orderkey", "l_partkey", "l_quantity")
    plain_p = str(tmp_path / "plain")
    z_p = str(tmp_path / "z")
    li.repartition(32).write.parquet(plain_p)
    zorder(li, ["l_orderkey", "l_partkey"], partitions=32).write.parquet(z_p)

    def avg_span(path, col):
        spans = []
        gmin = gmax = None
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = [
                md.schema.column(i).name for i in range(md.num_columns)
            ]
            ci = names.index(col)
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(ci).statistics
                spans.append((s.min, s.max))
                gmin = s.min if gmin is None else min(gmin, s.min)
                gmax = s.max if gmax is None else max(gmax, s.max)
        width = max(1, gmax - gmin)
        return sum((b - a) / width for a, b in spans) / len(spans)

    for col in ["l_orderkey", "l_partkey"]:
        p, z = avg_span(plain_p, col), avg_span(z_p, col)
        assert p > 0.9, (col, p)  # unsorted: every file spans ~everything
        assert z < 0.5 * p, (col, p, z)

    # layout only — the row multiset is unchanged
    a = li.agg(F.sum("l_quantity"), F.count("*")).collect()
    b = (
        spark.read.parquet(z_p)
        .agg(F.sum("l_quantity"), F.count("*"))
        .collect()
    )
    assert a == b

    # guard: too many bits*cols for one long
    import pytest as _pytest

    from tinyolap_spark.sources.zorder import morton_code

    with _pytest.raises(ValueError):
        morton_code(li, ["l_orderkey"] * 8, bits=8)
