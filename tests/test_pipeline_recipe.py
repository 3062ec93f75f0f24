"""End-to-end training-data pipeline recipe: the composition story.

One flow over the documents corpus chaining every preprocessing stage a
real pretraining pipeline runs — dedup, quality/language filtering, PII
scrub, boilerplate removal, deterministic split, sampling — asserting
the invariants that matter (determinism, monotone shrinkage, disjoint
splits).  Each stage is the library operator, not a reimplementation."""

import pytest
from pyspark.sql import functions as F

from tinyolap_spark.pipeline import dedup, sampling, text


import os

RECIPE_SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def corpus(spark):
    path = f"{RECIPE_SF_DIR}/documents.parquet"
    if not os.path.exists(path):
        pytest.skip(f"no documents fixture at {path}")
    return spark.read.parquet(path)


def test_full_preprocessing_recipe(spark, corpus):
    n0 = corpus.count()

    # 1. exact dedup — keep one survivor per content hash
    deduped = dedup.exact_dedup(corpus, text_col="text")
    n1 = deduped.count()
    assert 0 < n1 <= n0

    # 2. quality + language gate (JVM-side feature columns)
    profiled = text.profile(deduped)
    filtered = profiled.where(
        (F.col("quality") > 0.3) & (F.col("detected_lang") == "en")
    )
    n2 = filtered.count()
    assert 0 < n2 <= n1

    # 3. PII scrub + boilerplate removal (text transforms, row-preserving
    #    up to fully-boilerplate docs)
    scrubbed = filtered.withColumn("text", text.scrub_pii("text"))
    cleaned = text.remove_boilerplate(
        scrubbed.select("doc_id", "text"), min_docs=30
    )
    n3 = cleaned.count()
    assert 0 < n3 <= n2

    # 4. deterministic split + train-side sample
    final = sampling.split(
        cleaned, [0.9, 0.05, 0.05], names=["train", "val", "test"]
    )
    splits = {r["__split"]: r["n"] for r in
              final.groupBy("__split").agg(F.count("*").alias("n")).collect()}
    assert sum(splits.values()) == n3  # exhaustive + disjoint
    train = final.where("__split = 'train'")
    sampled = sampling.deterministic_sample(train, 0.5)
    n5 = sampled.count()
    assert 0 < n5 < splits["train"]

    # determinism: the ENTIRE recipe re-run selects identical doc_ids
    def run_ids():
        d = dedup.exact_dedup(corpus, text_col="text")
        p = text.profile(d).where(
            (F.col("quality") > 0.3) & (F.col("detected_lang") == "en")
        ).withColumn("text", text.scrub_pii("text"))
        c = text.remove_boilerplate(p.select("doc_id", "text"), min_docs=30)
        s = sampling.split(c, [0.9, 0.05, 0.05],
                           names=["train", "val", "test"])
        return {r["doc_id"] for r in
                sampling.deterministic_sample(
                    s.where("__split = 'train'"), 0.5
                ).select("doc_id").collect()}

    ids_a, ids_b = run_ids(), run_ids()
    assert ids_a == ids_b and len(ids_a) == n5

    # the whole recipe is one lazy plan: no Python rows in the hot path
    plan = sampled._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_recipe_with_decontamination_and_repetition(spark, corpus):
    """Round-5 stages compose into the same flow: repetition-quality
    gate -> benchmark decontamination -> k-means bucketing of the
    surviving docs' embeddings."""
    from tinyolap_spark.pipeline import clustering, decontam

    # repetition gate first (narrow, no shuffle)
    gated = corpus.where(text.repetition_filter())
    n1 = gated.count()
    assert 0 < n1 <= corpus.count()

    # decontaminate against a benchmark lifted from held-out docs
    bench = corpus.where(F.col("doc_id") % 113 == 7).select("text")
    clean = decontam.decontaminate(gated, bench, n=8)
    n2 = clean.count()
    flagged = decontam.contamination(gated, bench, n=8).where(
        "contaminated"
    ).count()
    assert n2 == n1 - flagged
    assert flagged > 0  # held-out docs that passed the gate must flag

    # cluster surviving docs' embeddings (doc_id == vec_id in fixtures)
    emb_path = f"{RECIPE_SF_DIR}/embeddings.parquet"
    emb = spark.read.parquet(emb_path).join(
        clean.select(F.col("doc_id").alias("vec_id")), on="vec_id"
    ).cache()
    if emb.count() > 16:
        res = clustering.kmeans(emb, k=4, max_iter=3, seed=2)
        prof = {r.cluster: r.n_vectors
                for r in clustering.cluster_profile(res).collect()}
        assert sum(prof.values()) == emb.count()
