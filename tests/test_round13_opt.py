"""Round-13 OPTIMIZATION guards: the restructured operators must be
bit-equivalent to the shapes they replaced.

1. ``minhash_signature`` moved from 64 independent
   ``array_min(transform(...))`` lanes to ONE ``aggregate`` pass with a
   64-wide ``zip_with(acc, hashes, least)`` accumulator — the band keys
   must match the original HOF formula exactly (the old formulation is
   kept below as the reference spec).
2. ``minhash_lsh_candidates`` pair generation moved from a bucket
   self-join to in-bucket sorted pair explosion — pair set AND
   n_shared_bands must match a reference self-join.
3. ``duplicate_clusters`` gained a driver-small regime (bounded
   min-label rounds on a collected edge list) — labels must match the
   distributed propagation round-for-round, including ``max_iter``
   truncation.
"""

import pytest
from pyspark.sql import functions as F

from tinyolap_spark.pipeline import dedup


def _hof_banded(sh_df, num_hashes, bands):
    """The pre-r13 HOF formulation, kept here as the reference spec."""
    rows_per_band = num_hashes // bands
    # NB the closure factory: a `lambda s, i=i:` default arg would make
    # Spark treat the lambda as 2-ary and bind the ARRAY INDEX to i
    # (the _seeded_hash trap documented in dedup.py)
    sig = F.array(
        *[
            F.array_min(F.transform("sh", dedup._seeded_hash(i)))
            for i in range(num_hashes)
        ]
    )
    with_sig = sh_df.select(F.col("doc"), sig.alias("sig"))
    return with_sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                F.transform(
                                    F.slice(
                                        "sig",
                                        b * rows_per_band + 1,
                                        rows_per_band,
                                    ),
                                    lambda x: x.cast("string"),
                                ),
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(
        "doc", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket")
    )


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "a completely different document about spark optimization"),
        (4, "the quick brown fox jumps over the lazy dog once more now"),
        (5, None),
        (6, "   "),
        (7, "short doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_banded_frame_matches_hof_spec(spark, corpus):
    sh = dedup.shingle_frame(corpus)
    try:
        got = sorted(
            map(tuple, dedup._banded_frame(sh, 32, 8, checkpoint=False).collect())
        )
        want = sorted(map(tuple, _hof_banded(sh, 32, 8).collect()))
        assert got == want
        # NULL/whitespace docs survive the explode (one empty shingle)
        assert {t[0] for t in got} == {1, 2, 3, 4, 5, 6, 7}
    finally:
        sh.unpersist()


def test_lsh_candidates_match_selfjoin_reference(spark, corpus):
    sh = dedup.shingle_frame(corpus)
    try:
        banded = dedup._banded_frame(sh, 32, 8, checkpoint=True)
        sizes = banded.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("sz")
        )
        kept = banded.join(
            sizes.where(F.col("sz") <= 200).select("band", "bucket"),
            on=["band", "bucket"],
            how="leftsemi",
        )
        a, b = kept.alias("a"), kept.alias("b")
        want = sorted(
            map(
                tuple,
                a.join(
                    b,
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.bucket") == F.col("b.bucket"))
                    & (F.col("a.doc") < F.col("b.doc")),
                )
                .groupBy(
                    F.col("a.doc").alias("doc_a"),
                    F.col("b.doc").alias("doc_b"),
                )
                .agg(F.count(F.lit(1)).alias("n_shared_bands"))
                .collect(),
            )
        )
        got = sorted(
            map(
                tuple,
                dedup.minhash_lsh_candidates(
                    corpus, shingle_df=sh, num_hashes=32, bands=8
                ).collect(),
            )
        )
        assert got == want and len(got) >= 1  # the planted dup pair pairs up
    finally:
        sh.unpersist()


def test_duplicate_clusters_driver_vs_distributed_differential(spark):
    import random

    rng = random.Random(13)
    edges = set()
    for base in (0, 500):
        ids = [base + i for i in range(30)]
        rng.shuffle(ids)
        edges |= {
            (min(a, b), max(a, b)) for a, b in zip(ids, ids[1:])
        }
        edges |= {
            tuple(sorted(rng.sample(ids, 2))) for _ in range(20)
        }
    pairs = spark.createDataFrame(sorted(edges), "doc_a long, doc_b long")
    s_drv, s_dst = {}, {}
    drv = {
        r.doc: r.cluster
        for r in dedup.duplicate_clusters(pairs, stats=s_drv).collect()
    }
    assert s_drv["path"] == "driver"
    old = dedup.DRIVER_CC_MAX_EDGES
    dedup.DRIVER_CC_MAX_EDGES = 0
    try:
        dst = {
            r.doc: r.cluster
            for r in dedup.duplicate_clusters(pairs, stats=s_dst).collect()
        }
    finally:
        dedup.DRIVER_CC_MAX_EDGES = old
    assert s_dst["path"] == "distributed"
    assert drv == dst
    # round counts agree (same bounded-propagation semantics)
    assert s_drv["rounds"] == s_dst["rounds"]


def test_duplicate_clusters_driver_max_iter_truncation_matches(spark):
    # a 12-node path planted high-to-low: labels travel one hop per round
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 112)], "doc_a long, doc_b long"
    )
    for mi in (1, 3):
        drv = {
            r.doc: r.cluster
            for r in dedup.duplicate_clusters(pairs, max_iter=mi).collect()
        }
        old = dedup.DRIVER_CC_MAX_EDGES
        dedup.DRIVER_CC_MAX_EDGES = 0
        try:
            dst = {
                r.doc: r.cluster
                for r in dedup.duplicate_clusters(
                    pairs, max_iter=mi
                ).collect()
            }
        finally:
            dedup.DRIVER_CC_MAX_EDGES = old
        assert drv == dst, mi


def test_driver_small_edges_over_cap_falls_back(spark):
    old = dedup.DRIVER_CC_MAX_EDGES
    dedup.DRIVER_CC_MAX_EDGES = 5
    try:
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(10)], "doc_a long, doc_b long"
        )
        assert dedup._driver_small_edges(pairs, "doc_a", "doc_b") is None
        stats = {}
        got = {
            r.doc: r.cluster
            for r in dedup.duplicate_clusters(pairs, stats=stats).collect()
        }
        assert stats["path"] == "distributed"
        assert set(got.values()) == {0}
    finally:
        dedup.DRIVER_CC_MAX_EDGES = old


def test_driver_small_edges_null_ids_fall_back(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (None, 3)], "doc_a long, doc_b long"
    )
    assert dedup._driver_small_edges(pairs, "doc_a", "doc_b") is None
