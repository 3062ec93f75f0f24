"""100x scale evidence (VERDICT r9 #2): one-off sf10 probe.

The per-round bench's scale pairs stop at sf1 (10x the sf0.1 base), and
several 10x wall ratios ~2 are defended as "fixed overhead over linear
work".  This probe settles that claim with a 100x point: it derives a
10x-of-sf1 documents corpus (~6M docs) and runs the disputed kernels —
minhash LSH pair generation, duplicate clustering, the ingestion-index
build + steady-state batch dedup, and (r11, VERDICT r10 #4) the two
hand-pinned shuffle_hash plans, containment pairs and hashed-gram
novelty — at sf1 and sf10 back-to-back (interleaved reps, same
JVM/ambient), printing one JSON line with walls and sf10/sf1 ratios.

If the floor story is right, wall(sf10)/wall(sf1) approaches the data
ratio (10) from BELOW as the linear term swamps the fixed overhead —
a ratio well ABOVE 10 would expose superlinear work (bucket skew,
quadratic pair blowup) that the sf1 pairs were too small to show.

Run manually (not part of the per-round bench: ~10 min):
    python bench_sf10.py
Results for round 10 are committed in BENCH_SF10_r10.json and discussed
in BENCH_NOTES_r10.md.

sf10 derivation: 10 copies of the sf1 documents table; each copy's text
is remapped through a DISTINCT pseudo-random alphabet permutation
(seeded per copy).  The sf1 rotate-alphabet trick cannot extend to 100
copies (rotations collide mod 26, turning copies into exact duplicates
of each other and blowing up the pair workload); random permutations
keep cross-copy shingles decorrelated, so the corpus-wide duplicate
RATE stays ~constant with scale — the realistic growth axis.
"""

import json
import os
import random
import time
from functools import reduce

from pyspark.sql import DataFrame as _DF
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
SF10_DIR = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/spark_graft_sf10")
_PREP_VERSION = "v1"
AZ = "abcdefghijklmnopqrstuvwxyz"


def prepare_sf10(spark):
    marker = os.path.join(SF10_DIR, "_DONE")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == _PREP_VERSION:
                return
    docs = spark.read.parquet(f"{SF1_DIR}/documents.parquet")
    did_span = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    copies = []
    for i in range(10):
        perm = list(AZ)
        random.Random(1000 + i).shuffle(perm)
        copies.append(
            docs.withColumn(
                "doc_id", F.col("doc_id") + F.lit(i * did_span)
            ).withColumn("text", F.translate(F.col("text"), AZ, "".join(perm)))
        )
    reduce(_DF.unionByName, copies).write.mode("overwrite").parquet(
        f"{SF10_DIR}/documents.parquet"
    )
    with open(marker, "w") as f:
        f.write(_PREP_VERSION)


def main():
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.maxPlanStringLength", "5000000")
        .appName("spark-graft-sf10-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(SF1_DIR):
        raise SystemExit(
            f"{SF1_DIR} missing — run `python bench.py` once to derive sf1"
        )
    timings, extra = {}, {}
    t0 = time.time()
    prepare_sf10(spark)
    timings["sf10_prepare"] = round(time.time() - t0, 2)

    import __spark_entry__ as entry
    from tinyolap_spark.pipeline import dedup as dd

    q = entry.all_queries()

    def reclaim():
        spark.sparkContext._jvm.System.gc()
        time.sleep(1)

    # the exact registry callables the per-round bench pairs time (same
    # collect sink), pointed at the derived dirs
    def minhash_pairs(sf_dir):
        return len(q["docs_minhash_pairs"](spark, sf_dir).collect()), {}

    def dup_clusters(sf_dir):
        return len(q["docs_dup_clusters"](spark, sf_dir).collect()), {}

    # VERDICT r10 #4: the two HAND-PINNED shuffle_hash plans — exactly
    # where AQE's break-even could invert at scale — get their own 100x
    # points (their 10x ratios were fine: containment 1.37, novelty 1.42)
    def containment_pairs(sf_dir):
        return len(q["docs_containment_pairs"](spark, sf_dir).collect()), {}

    def novelty_hashed(sf_dir):
        from tinyolap_spark.pipeline import text as text_ops

        return (
            len(
                text_ops.rare_gram_stats(
                    spark.read.parquet(f"{sf_dir}/documents.parquet"),
                    ngram=3,
                    max_df=2,
                    hash_keys=True,
                ).collect()
            ),
            {},
        )

    # VERDICT r11 #2: 100x points for the three pin sites converted to
    # the size-aware strategy this round whose builds grow with the
    # corpus — salient-terms dfreq (vocabulary), chunk frequency
    # (~linear in corpus chunks), and the star-CC min-label joins.
    # Sink is .count(): salient/chunk results are eagerly materialized
    # inside the call (containment_pairs pattern), so the timing is the
    # operator, not a multi-million-row driver collect.
    def salient_terms(sf_dir):
        from tinyolap_spark.pipeline import text as text_ops

        return (
            text_ops.salient_terms(
                spark.read.parquet(f"{sf_dir}/documents.parquet"), k=5
            ).count(),
            {},
        )

    def chunk_dedup(sf_dir):
        from tinyolap_spark.pipeline import text as text_ops

        return (
            text_ops.boilerplate_chunk_stats(
                spark.read.parquet(f"{sf_dir}/documents.parquet"),
                chunk_tokens=8,
                min_count=2,
            ).count(),
            {},
        )

    def dup_clusters_star(sf_dir):
        return (
            q["docs_dup_clusters_star"](spark, sf_dir).count(),
            {},
        )

    def stream_kernel(sf_dir, label):
        """Index build (pure construction) + steady-state 500-doc batch
        dedup against the warm index — the bench's per-batch headline
        kernel without the streaming harness."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        # TWO builds, publish the min (the warm one): the r13 stage
        # decomposition showed the index build's replicate spread
        # (ratios 4.09-8.27 across sessions) lives entirely in the sf1
        # DENOMINATOR's cold-vs-warm scan variance (sf1 build 4.3-10.8s
        # by page-cache state; sf10 stage walls are stable ~31s =
        # shingle ~19s + signature ~12s, both linear scans) — a single
        # cold sf1 build understated the denominator and inflated the
        # ratio.  The first build's wall is kept in extra.
        builds = []
        for _rep in range(2):
            t0 = time.time()
            idx = dd.CorpusDedupIndex(docs)
            builds.append(round(time.time() - t0, 2))
            if _rep == 0:
                idx.release()
        timings[f"{label}_index_build"] = min(builds)
        extra[f"{label}_index_build_runs"] = builds
        # warm off-clock (service-lifetime cost, same as bench.py)
        idx.banded_capped(200)
        warm = docs.where(F.col("doc_id") < 50).select("doc_id", "text")
        dd.dedup_batch_against(warm, idx, max_bucket=200).count()
        batch = (
            docs.where((F.col("doc_id") % 5 != 0) & (F.col("doc_id") < 2500))
            .withColumn(
                "text", F.translate(F.col("text"), AZ, AZ[11:] + AZ[:11])
            )
            .withColumn("doc_id", F.col("doc_id") + 50_000_000)
            .limit(500)
        )
        t0 = time.time()
        kept = dd.dedup_batch_against(batch, idx, max_bucket=200).count()
        timings[f"{label}_batch_500"] = round(time.time() - t0, 2)
        extra[f"{label}_batch_kept"] = kept
        idx.release()

    # interleaved pairs: sf1, sf10, sf1, sf10 — min of 2 each side
    for name, fn in [("minhash_pairs", minhash_pairs),
                     ("dup_clusters", dup_clusters),
                     ("containment_pairs", containment_pairs),
                     ("novelty_hashed", novelty_hashed),
                     ("salient_terms", salient_terms),
                     ("chunk_dedup", chunk_dedup),
                     ("dup_clusters_star", dup_clusters_star)]:
        runs = {SF1_DIR: [], SF10_DIR: []}
        for _rep in range(2):
            for d in (SF1_DIR, SF10_DIR):
                reclaim()
                t0 = time.time()
                n, stats = fn(d)
                runs[d].append(round(time.time() - t0, 2))
                tag = "sf1" if d == SF1_DIR else "sf10"
                extra[f"{tag}_{name}_rows"] = n
                for k, v in stats.items():
                    extra[f"{tag}_{name}_{k}"] = v
        timings[f"sf1_{name}"] = min(runs[SF1_DIR])
        timings[f"sf10_{name}"] = min(runs[SF10_DIR])
        extra[f"sf1_{name}_runs"] = runs[SF1_DIR]
        extra[f"sf10_{name}_runs"] = runs[SF10_DIR]

    reclaim()
    stream_kernel(SF1_DIR, "sf1_stream")
    reclaim()
    stream_kernel(SF10_DIR, "sf10_stream")

    ratios = {}
    for base, scaled in [
        ("sf1_minhash_pairs", "sf10_minhash_pairs"),
        ("sf1_dup_clusters", "sf10_dup_clusters"),
        ("sf1_containment_pairs", "sf10_containment_pairs"),
        ("sf1_novelty_hashed", "sf10_novelty_hashed"),
        ("sf1_salient_terms", "sf10_salient_terms"),
        ("sf1_chunk_dedup", "sf10_chunk_dedup"),
        ("sf1_dup_clusters_star", "sf10_dup_clusters_star"),
        ("sf1_stream_index_build", "sf10_stream_index_build"),
        ("sf1_stream_batch_500", "sf10_stream_batch_500"),
    ]:
        if timings.get(base) and scaled in timings:
            ratios[f"{scaled}_over_{base}"] = round(
                timings[scaled] / timings[base], 2
            )
    print(json.dumps({"timings": timings, "ratios": ratios, "extra": extra}))
    spark.stop()


if __name__ == "__main__":
    main()
