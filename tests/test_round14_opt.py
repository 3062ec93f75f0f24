"""Round-14 OPTIMIZATION guards: every restructured operator must be
result-identical to the shape it replaced.

1. ``_cluster_by_bucket`` moved from ``repartitionByRange`` (range
   SAMPLING pass = one extra full evaluation of the input per write) to
   a hash ``repartition`` on a precomputed TOKEN column whose Spark
   hash lands each bucket id in exactly its own partition — requires
   the pure-Python Murmur3 mirror to match ``F.hash`` bit-for-bit.
2. ``_spread`` no longer blindly repartitions derived (file-less)
   frames: only a Catalyst-stats-small frame, or one the caller
   declares micro-batch-bounded (``derived_small=True``), is spread
   (VERDICT r13 #6 — a 100 TB derived input must never pay a blind
   full shuffle).
3. ``containment_pairs`` hashes gram keys on the OVER-gate (at-scale)
   path even for string-gram calls (VERDICT r13 #4) — rows must match
   the string path on real corpora (identical up to 2^-64 xxhash64
   collisions, which the fixtures cannot produce).
4. ``batch_small=True`` (the streaming trigger contract) turns the
   batch-vs-corpus band join, the verify joins and the anti join into
   broadcast builds — pair set, jaccard values and kept set must be
   identical to the default plan, and the executed plans must carry no
   shuffle of corpus-sized data.
5. ADVICE r13: pin ``minhash_signature``'s input-boundary behavior
   (empty array -> MAXL lanes, NULL array -> NULL) so external callers
   can't silently depend on the old NULL-lane semantics.
"""

import pytest
from pyspark.sql import functions as F

from tinyolap_spark.pipeline import dedup
from tinyolap_spark.sources import bucketed as bkt


# ---------------------------------------------------------------------------
# 1. Murmur3 mirror + token placement
# ---------------------------------------------------------------------------


def test_murmur3_int_matches_spark_hash(spark):
    vals = list(range(-50, 200)) + [2**31 - 1, -(2**31), 123456789]
    df = spark.createDataFrame([(v,) for v in vals], "x int").select(
        "x", F.hash("x").alias("h")
    )
    got = {r["x"]: r["h"] for r in df.collect()}
    assert all(got[v] == bkt._murmur3_int(v) for v in vals)


@pytest.mark.parametrize("n", [1, 2, 8, 32, 64])
def test_bucket_tokens_are_a_bijection(n):
    toks = bkt._bucket_tokens(n)
    assert len(toks) == n
    assert [bkt._murmur3_int(t) % n for t in toks] == list(range(n))


def test_cluster_by_bucket_places_each_bucket_in_one_partition(spark):
    from pyspark.sql.functions import spark_partition_id

    n = 8
    df = spark.range(0, 4000).select(
        (F.col("id") % 97).cast("int").alias("k"),
        F.col("id").alias("v"),
    )
    out = bkt._cluster_by_bucket(df, ["k"], n).withColumn(
        "p", spark_partition_id()
    ).withColumn("b", F.pmod(F.hash("k"), F.lit(n)))
    per_bucket = (
        out.groupBy("b")
        .agg(F.countDistinct("p").alias("nparts"), F.first("p").alias("p"))
        .collect()
    )
    # each bucket lives in exactly one partition, and no partition
    # holds two buckets (the token mapping is the identity placement)
    assert all(r["nparts"] == 1 for r in per_bucket)
    assert len({r["p"] for r in per_bucket}) == len(per_bucket)
    # no sampling pass: the plan must not contain a range partitioning
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()
    # contents unchanged
    assert (
        sorted(r["v"] for r in out.select("v").collect())
        == list(range(4000))
    )


# ---------------------------------------------------------------------------
# 2. _spread derived-frame guard
# ---------------------------------------------------------------------------


def _n_exchanges(df):
    return df._jdf.queryExecution().executedPlan().toString().count(
        "Exchange"
    )


def test_spread_skips_large_derived_frame(spark):
    # spark.range carries an accurate 8-bytes/row stats estimate: 2B
    # rows estimate ~16 GB >> the derived bound -> MUST be a no-op
    big = spark.range(2_000_000_000).toDF("x")
    assert dedup._spread(big) is big


def test_spread_spreads_small_checkpointed_frame_by_stats(spark):
    # a localCheckpoint LogicalRDD carries its true materialized size
    # as stats -> a tiny one is spread with no declaration needed
    ck = (
        spark.range(10)
        .toDF("x")
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    spread = dedup._spread(ck)
    assert spread is not ck
    assert spread.rdd.getNumPartitions() == (
        spark.sparkContext.defaultParallelism
    )


def test_spread_skips_derived_frame_past_stats_bound(spark, monkeypatch):
    # past the stats bound the SAME frame must be a no-op unless the
    # caller declares it micro-batch-bounded
    ck = (
        spark.range(10)
        .toDF("x")
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    monkeypatch.setattr(dedup, "SPREAD_DERIVED_STATS_BYTES", 1)
    assert dedup._spread(ck) is ck
    assert dedup._spread(ck, derived_small=True) is not ck


def test_spread_skips_rdd_backed_fixture_with_unknown_stats(spark):
    # PySpark createDataFrame frames are LogicalRDDs with a Long.Max
    # stats estimate AND no input files: not provably small, so they
    # are left alone — parallelize() already distributed their rows
    # over defaultParallelism partitions, so nothing is lost
    small = spark.createDataFrame(
        [(i, "t" * 10) for i in range(50)], "doc_id long, text string"
    )
    assert dedup._spread(small) is small


# ---------------------------------------------------------------------------
# 3. containment over-gate internal gram hashing
# ---------------------------------------------------------------------------


def _containment_fixture(spark):
    rows = []
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    for i in range(40):
        rows.append((i, f"{base} variant {i % 7} tail {i}"))
    # plant a true containment: doc 100 verbatim inside doc 101
    rows.append((100, base))
    rows.append((101, base + " plus a long suffix of extra tokens " * 3))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_containment_hashed_overgate_matches_string_path(spark, monkeypatch):
    docs = _containment_fixture(spark)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    # reference: the under-gate lazy STRING path (exact-oracle shape)
    ref = rows(
        dedup.containment_pairs(
            docs, threshold=0.5, max_shingle_df=10, share_posts=False
        )
    )
    assert ref, "fixture must produce at least one containment pair"
    # force the over-gate path: every corpus is "large", so the sized
    # share_posts machinery AND the internal gram hashing engage
    monkeypatch.setattr(dedup, "SMALL_CORPUS_STATS_BYTES", -1)
    got = rows(
        dedup.containment_pairs(
            docs, threshold=0.5, max_shingle_df=10, share_posts=True
        )
    )
    assert got == ref


# ---------------------------------------------------------------------------
# 4. batch_small broadcast plans are result-identical and exchange-lean
# ---------------------------------------------------------------------------


def _stream_fixture(spark):
    corpus = spark.createDataFrame(
        [
            (i, f"corpus document number {i} with shared words {i % 5} "
                f"and some more text to shingle over {i}")
            for i in range(60)
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        # exact copies (must be dropped) + fresh docs (must survive)
        [(1000 + i,
          f"corpus document number {i} with shared words {i % 5} "
          f"and some more text to shingle over {i}")
         for i in range(0, 20, 2)]
        + [(2000 + i, f"a completely different fresh text body {i} "
                      f"with its own vocabulary entirely {i}")
           for i in range(10)],
        "doc_id long, text string",
    )
    return corpus, batch


def test_batch_small_pairs_identical(spark):
    corpus, batch = _stream_fixture(spark)
    idx = dedup.CorpusDedupIndex(corpus)
    try:
        idx.banded_capped(200)

        def rows(df):
            return sorted(map(tuple, df.collect()))

        ref = rows(
            dedup.near_duplicates_against(
                batch, idx, threshold=0.8, max_bucket=200
            )
        )
        got = rows(
            dedup.near_duplicates_against(
                batch, idx, threshold=0.8, max_bucket=200,
                batch_small=True,
            )
        )
        assert ref, "fixture must produce at least one cross pair"
        assert got == ref
    finally:
        idx.release()


def test_batch_small_kept_identical_and_anti_join_broadcast(spark):
    corpus, batch = _stream_fixture(spark)
    idx = dedup.CorpusDedupIndex(corpus)
    try:
        idx.banded_capped(200)
        ref = sorted(
            r["doc_id"]
            for r in dedup.dedup_batch_against(
                batch, idx, threshold=0.8, max_bucket=200
            ).collect()
        )
        kept = dedup.dedup_batch_against(
            batch, idx, threshold=0.8, max_bucket=200, batch_small=True
        )
        got = sorted(r["doc_id"] for r in kept.collect())
        assert got == ref
        assert len(got) < batch.count()  # something was dropped
        # the survivor plan must carry NO shuffle at all: every build
        # side is broadcast under the micro-batch contract
        plan = kept._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
    finally:
        idx.release()


# ---------------------------------------------------------------------------
# 5. minhash_signature input-boundary pin (ADVICE r13)
# ---------------------------------------------------------------------------


def test_minhash_signature_empty_and_null_array_semantics(spark):
    df = spark.createDataFrame(
        [(1, ["a b c d e"]), (2, []), (3, None)],
        "doc long, sh array<string>",
    )
    out = {
        r["doc"]: r["sig"]
        for r in df.select(
            "doc", dedup.minhash_signature(F.col("sh"), 4).alias("sig")
        ).collect()
    }
    # non-empty: real minima
    assert len(out[1]) == 4 and all(isinstance(v, int) for v in out[1])
    # empty array: the fold identity (MAXL) in every lane — callers must
    # feed shingles() output, which never emits an empty array
    assert out[2] == [dedup._SIG_MAX_LONG] * 4
    # NULL array: NULL signature
    assert out[3] is None
