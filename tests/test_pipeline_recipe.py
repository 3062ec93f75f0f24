"""End-to-end training-data pipeline recipe: the composition story.

One flow over the documents corpus chaining every preprocessing stage a
real pretraining pipeline runs — dedup, quality/language filtering, PII
scrub, boilerplate removal, deterministic split, sampling — asserting
the invariants that matter (determinism, monotone shrinkage, disjoint
splits).  Each stage is the library operator, not a reimplementation."""

import pytest

pytestmark = pytest.mark.slow  # composition/fuzz stress: deselected by default (VERDICT r13 #2)
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


def test_recipe_near_dedup_mixture_packing(spark, corpus):
    """The round-6 back half of the pipeline: near-dedup clusters ->
    one survivor per cluster -> domain gate -> weighted two-source
    mixture with epochs -> packing -> assembled payloads.  Every stage
    is the library operator; invariants asserted at each step."""
    from tinyolap_spark.pipeline import mixture as mix
    from tinyolap_spark.pipeline.packing import (
        pack_documents,
        pack_payloads,
        pack_summary,
    )

    base = corpus.select("doc_id", "text")
    # plant near-dups: 15 truncated copies (drop last 10 tokens)
    toks = F.split(
        F.trim(F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))), " "
    )
    copies = base.where(F.col("doc_id") < 15).select(
        (F.col("doc_id") + 900_000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.slice(toks, F.lit(1), F.greatest(F.size(toks) - 10, F.lit(1))),
        ).alias("text"),
    )
    planted = base.unionByName(copies)
    n0 = planted.count()

    # 1. near-dedup: pairs -> components -> min-id survivors
    pairs = dedup.near_duplicates(planted, threshold=0.5)
    clusters = dedup.duplicate_clusters(pairs)
    survivors = dedup.cluster_survivors(planted, clusters)
    n1 = survivors.count()
    assert 0 < n1 < n0
    # every planted copy of a LONG-ENOUGH source loses to it: dropping
    # 10 of n tokens keeps J = (n-14)/(n-4) >= 0.5 only for n >= 24 —
    # copies of shorter docs legitimately miss the threshold
    surv_ids = {r.doc_id for r in survivors.select("doc_id").collect()}
    long_enough = {
        r.doc_id
        for r in base.where(
            (F.col("doc_id") < 15) & (F.size(toks) >= 24)
        ).select("doc_id").collect()
    }
    assert long_enough  # fixture must exercise the case
    assert not any(i + 900_000 in surv_ids for i in long_enough)

    # 2. domain gate (corpus is URL-free -> everything passes; the gate
    #    still exercises the expression path)
    gated = survivors.where(text.domain_filter(["blocked.example"]))
    assert gated.count() == n1

    # 3. two-source mixture, 2:1, sized so source a over-subscribes
    src_a = gated.where(F.col("doc_id") % 2 == 0)
    src_b = gated.where(F.col("doc_id") % 2 == 1)
    stats = mix.source_token_stats({"a": src_a, "b": src_b})
    total_tokens = stats["a"][1] + stats["b"][1]
    plan = {}
    blended = mix.compose_mixture(
        {"a": src_a, "b": src_b},
        {"a": 3.0, "b": 1.0},
        target_tokens=(3 * total_tokens) // 2,
        stats=plan,
    )
    assert plan["a"]["epochs"] >= 1  # over-subscribed side repeats
    rep = mix.mixture_report(blended).collect()
    assert sum(r.n_docs for r in rep) == blended.count()

    # 4. packing + payload assembly over the blend (epoch-qualified ids
    #    keep packing keys unique across repeats)
    keyed = blended.withColumn(
        "pack_key",
        F.concat_ws("#", F.col("doc_id").cast("string"), F.col("epoch")),
    )
    packed = pack_documents(
        keyed, budget=512, num_groups=8, id_col="pack_key"
    ).cache()
    assert packed.count() == blended.count()
    summ = pack_summary(packed).collect()
    max_doc = packed.agg(F.max("n_tokens")).collect()[0][0]
    assert all(s.pack_tokens <= 512 + max_doc for s in summ)
    payloads = pack_payloads(packed, id_col="pack_key").collect()
    assert sum(p.n_docs for p in payloads) == blended.count()
    assert all(
        len(p.payload.split("<|eos|>")) == p.n_docs for p in payloads
    )
    packed.unpersist()
