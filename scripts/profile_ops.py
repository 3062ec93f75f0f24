#!/usr/bin/env python
"""Stage-level decomposition of the top bench entries (guide §1: measure
first, isolate with the noop sink).  Each probe times the pieces of one
operator so the optimization targets the real wall, not a guess.

Usage: python scripts/profile_ops.py [probe ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ONLY = set(sys.argv[1:])


def t(label, fn, reps=2):
    runs = []
    out = None
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        runs.append(round(time.time() - t0, 3))
    print(f"  {label:48s} {min(runs):7.3f}s  runs={runs}")
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile-ops")
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
    sc = spark.sparkContext
    import __spark_entry__ as entry
    from tinyolap_spark.pipeline import dedup

    # warmup
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(2_000_000).selectExpr("sum(id * 2)").collect()

    def probe_bulk_load():
        print("== cube_bulk_load decomposition ==")
        from tinyolap_spark.sources import starschema as ss

        def full():
            entry._star_cache.pop(sf_dir.rstrip("/"), None)
            s = entry._star(spark, sf_dir)
            n = s.cube.fact.count()
            s.cube._fact.unpersist(blocking=True)
            return n

        t("full build+count", full, reps=3)
        tables = ss.load_tables(spark, sf_dir)
        meta = t("_collect_dim_metadata (1 job)",
                 lambda: ss._collect_dim_metadata(tables), reps=3)
        geo_pairs, brand_names, years = meta[:3]
        from tinyolap_spark import Database

        def dims_only():
            db = Database("p_star", spark=spark)
            geo = ss.build_geo_dimension_from_pairs(db, geo_pairs)
            cal = ss.build_calendar_dimension(db, years)
            brand = ss.build_brand_dimension_from_names(db, brand_names)
            meas = ss.build_measures_dimension(db)
            return db, geo, cal, brand, meas

        db, geo, cal, brand, meas = t("driver dim builds", dims_only, reps=3)
        fact = ss.fact_frame(spark, tables, geo, cal, brand, meas)
        t("fact_frame noop (no load_dataframe)", lambda: noop(fact), reps=3)
        cube = db.add_cube("p_sales", [geo, cal, brand, meas])
        def load():
            cube.load_dataframe(fact, assume_unique=True)
            n = cube.fact.count()
            cube._fact.unpersist(blocking=True)
            return n
        t("load_dataframe + count", load, reps=3)

    def probe_dup_clusters():
        print("== docs_dup_clusters decomposition ==")
        corpus = entry._docs_with_chain(spark, sf_dir)
        t("corpus noop", lambda: noop(corpus))
        sh = dedup.shingle_frame(corpus)
        t("shingle_frame count (persist)", sh.count)
        banded = t(
            "banded_frame ckpt (64h/32b sig stage)",
            lambda: dedup._banded_frame(sh, 64, 32, checkpoint=True),
        )
        t("bucket sizes+semijoin+pairjoin collect",
          lambda: dedup.minhash_lsh_candidates(
              corpus, shingle_df=sh, num_hashes=64, bands=32
          ).count())
        cands = dedup.minhash_lsh_candidates(
            corpus, shingle_df=sh, num_hashes=64, bands=32
        ).localCheckpoint(eager=True)
        print(f"  n_cands = {cands.count()}")
        t("jaccard verify (given cands+sh)",
          lambda: dedup.ngram_jaccard_pairs(
              corpus, cands, threshold=0.5, shingle_df=sh
          ).count())
        pairs = dedup.ngram_jaccard_pairs(
            corpus, cands, threshold=0.5, shingle_df=sh
        ).localCheckpoint(eager=True)
        print(f"  n_pairs = {pairs.count()}")
        stats = {}
        t("duplicate_clusters (CC rounds)",
          lambda: dedup.duplicate_clusters(pairs, stats=stats).count())
        print(f"  rounds = {stats}")
        t("full _q_docs_dup_clusters",
          lambda: entry._q_docs_dup_clusters(spark, sf_dir).collect())
        sh.unpersist()

    def probe_minhash():
        print("== docs_minhash_pairs decomposition ==")
        corpus = entry._docs_with_dups(spark, sf_dir)
        sh = dedup.shingle_frame(corpus)
        t("shingle_frame count (persist)", sh.count)
        t("banded_frame ckpt (32h/8b)",
          lambda: dedup._banded_frame(sh, 32, 8, checkpoint=True))
        t("lsh candidates count",
          lambda: dedup.minhash_lsh_candidates(
              corpus, shingle_df=sh, num_hashes=32, bands=8
          ).count())
        t("full near_duplicates",
          lambda: dedup.near_duplicates(
              corpus, threshold=0.999, num_hashes=32, bands=8
          ).count())
        t("full query collect",
          lambda: entry._q_docs_minhash_pairs(spark, sf_dir).collect())
        sh.unpersist()

    def probe_containment():
        print("== docs_containment_pairs decomposition ==")
        corpus = entry._docs_with_trunc(spark, sf_dir)
        posts = dedup.shingle_posts(corpus).select(
            F.col("doc_id").alias("doc"), "g"
        ).persist()
        n = t("posts persist+count", posts.count)
        print(f"  n_posts = {n}")
        dfreq = posts.groupBy("g").agg(F.count(F.lit(1)).alias("sz"))
        t("dfreq agg collect-side noop", lambda: noop(dfreq))
        t("full containment_pairs",
          lambda: dedup.containment_pairs(
              corpus, threshold=0.9, max_shingle_df=1000
          ).count())
        t("full query collect",
          lambda: entry._q_docs_containment_pairs(spark, sf_dir).collect())
        posts.unpersist()

    def probe_stream_batch():
        print("== stream dedup per-batch decomposition ==")
        from tinyolap_spark.pipeline.dedup import (
            CorpusDedupIndex, dedup_batch_against,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        idx = t("CorpusDedupIndex build", lambda: CorpusDedupIndex(docs), reps=1)
        t("banded_capped(200) warm", lambda: idx.banded_capped(200).count(),
          reps=1)
        batch = docs.where(F.col("doc_id") < 500).select("doc_id", "text")
        t("dedup_batch_against (warm, 500 docs)",
          lambda: dedup_batch_against(batch, idx, max_bucket=200).count(),
          reps=3)
        idx.release()

    probes = {
        "bulk_load": probe_bulk_load,
        "dup_clusters": probe_dup_clusters,
        "minhash": probe_minhash,
        "containment": probe_containment,
        "stream_batch": probe_stream_batch,
    }
    for name, fn in probes.items():
        if ONLY and name not in ONLY:
            continue
        sc.setJobDescription(f"profile: {name}")
        t0 = time.time()
        fn()
        print(f"== {name} total {time.time() - t0:.1f}s ==\n")
        sc.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
