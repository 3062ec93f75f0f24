#!/usr/bin/env python
"""Capture .explain("formatted") for the non-registry plan shapes round
14 touched, into plans/r14/aux_<name>_<tag>.txt:

- containment_sf1: containment_pairs on the bench's 10x corpus — the
  OVER-gate sized path where r14 hashes the gram keys (the sf0.1
  registry plan is the under-gate path and is unchanged by design).
- stream_batch_kept: the warm streaming micro-batch survivor plan
  (dedup_batch_against under the foreachBatch batch_small contract;
  tag `before` passes no flag — the r13 code has none).
- clustered_write: the child plan of the clustered bucketed write
  (range-sampling shuffle in r13, token hash shuffle in r14).

Usage: python scripts/capture_aux_plans.py <tag>   # before|after
Run with REPO/PYTHONPATH pointing at the code the tag describes; the
output dir is always THIS checkout's plans/r14.
"""
import os
import sys

sys.path.insert(0, os.environ.get("REPO", os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

TAG = sys.argv[1] if len(sys.argv) > 1 else "after"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans", "r14",
)


def fmt(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main():
    from pyspark.sql import SparkSession, functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("capture-aux-plans")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.maxPlanStringLength", "5000000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    from tinyolap_spark.pipeline import dedup
    from tinyolap_spark.sources import bucketed as bkt

    plans = {}

    # 1. containment over-gate (sf1 corpus; falls back to forcing the
    # gate off over sf0.1 if the sf1 scale-up dir is absent)
    if os.path.isdir("/tmp/spark_graft_sf1"):
        docs1 = spark.read.parquet(
            "/tmp/spark_graft_sf1/documents.parquet"
        ).select("doc_id", "text")
    else:
        docs1 = spark.read.parquet(
            "/root/testdata/sf0.1/documents.parquet"
        ).select("doc_id", "text")
    # share_posts=False keeps the whole lineage in ONE lazy plan so the
    # posting/aggregate shuffles are visible (the sized path's eager
    # localCheckpoint would hide everything behind a LogicalRDD stub);
    # the gram-key schema (string vs hashed long) is identical on both.
    saved = dedup.SMALL_CORPUS_STATS_BYTES
    try:
        dedup.SMALL_CORPUS_STATS_BYTES = -1  # over-gate on this corpus
        lazy = dedup.containment_pairs(
            docs1, threshold=0.9, share_posts=False
        )
        # shingle_posts is where the r14 internal hashing decision
        # lives for the SIZED path; mirror it on the lazy plan so the
        # shuffle schema is inspectable.  The after-code hashes; the
        # before-code does not — call through the public surface that
        # each checkout provides.
        sized = dedup.containment_pairs(
            docs1, threshold=0.9, share_posts=True
        )
        plans["containment_sf1_lazy"] = fmt(lazy)
        plans["containment_sf1_sized_result"] = fmt(sized)
        # the sized plan above is post-checkpoint; also dump the
        # POSTING frame schema the sized path shuffles
        internal_hash = hasattr(dedup, "HASHED_GRAM_BUILD_ROWS_PER_PARTITION")
        posts = dedup.shingle_posts(
            docs1, "text", "doc_id", 5, hash_keys=internal_hash
        )
        plans["containment_sf1_postings"] = fmt(posts)
    finally:
        dedup.SMALL_CORPUS_STATS_BYTES = saved

    # 2. warm streaming micro-batch survivor plan
    docs = spark.read.parquet(
        "/root/testdata/sf0.1/documents.parquet"
    ).select("doc_id", "text")
    idx = dedup.CorpusDedupIndex(docs)
    idx.banded_capped(200)
    batch = docs.where(F.col("doc_id") < 500).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    try:  # the before-code has no batch_small parameter
        kept = dedup.dedup_batch_against(
            batch, idx, max_bucket=200, batch_small=True
        )
    except TypeError:
        kept = dedup.dedup_batch_against(batch, idx, max_bucket=200)
    kept.count()  # executed plan (AQE-final)
    plans["stream_batch_kept"] = kept._jdf.queryExecution().executedPlan().toString()
    idx.release()

    # 3. clustered write child plan (the distribution shuffle)
    fact = spark.range(1_000_000).select(
        *[
            ((F.xxhash64("id", F.lit(i)) % 100 + 100) % 100)
            .cast("int")
            .alias(f"d{i}")
            for i in range(8)
        ],
        (F.rand(seed=1) * 100).alias("value"),
    )
    from tinyolap_spark.sources.zorder import morton_code

    out = fact.withColumn("__z", morton_code(fact, ["d1", "d2"], 8))
    clustered = bkt._cluster_by_bucket(out, ["d0"], 32)
    plans["clustered_write"] = fmt(clustered)

    for name, plan in plans.items():
        with open(os.path.join(OUT, f"aux_{name}_{TAG}.txt"), "w") as f:
            f.write(plan)
        print(f"aux_{name}_{TAG}: {len(plan)} chars")
    spark.stop()


if __name__ == "__main__":
    main()
