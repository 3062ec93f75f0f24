"""Deterministic sampling / splits (`pipeline/sampling.py`): same rows on
every run, disjoint+exhaustive splits, per-stratum rates, no shuffle."""

import pytest
from pyspark.sql import functions as F

from tinyolap_spark.pipeline.sampling import (
    deterministic_sample,
    portable_lcg_bucket,
    split,
    stratified_sample,
)
from tinyolap_spark.pipeline.text import vocab_topk


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 8, "en").otherwise("de").alias("lang"),
    )


def test_sample_is_deterministic_and_sized(docs):
    a = deterministic_sample(docs, 0.1, "doc_id")
    b = deterministic_sample(docs, 0.1, "doc_id")
    ids_a = {r["doc_id"] for r in a.collect()}
    ids_b = {r["doc_id"] for r in b.collect()}
    assert ids_a == ids_b  # same rows every run — no RNG state
    assert 0.07 * 10_000 < len(ids_a) < 0.13 * 10_000
    # nested: a 20% sample contains the 10% sample (prefix property)
    ids_20 = {r["doc_id"] for r in
              deterministic_sample(docs, 0.2, "doc_id").collect()}
    assert ids_a <= ids_20


def test_split_disjoint_exhaustive_stable(docs):
    out = split(docs, [0.8, 0.1, 0.1], names=["train", "val", "test"])
    counts = {r["__split"]: r["n"] for r in
              out.groupBy("__split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 10_000  # exhaustive
    assert 0.75 < counts["train"] / 10_000 < 0.85
    assert 0.07 < counts["val"] / 10_000 < 0.13
    # a key never migrates when more rows are added (prefix stability)
    first = dict(
        split(docs.where("doc_id < 5000"), [0.8, 0.1, 0.1],
              names=["train", "val", "test"])
        .select("doc_id", "__split").collect()
    )
    full = dict(out.select("doc_id", "__split").collect())
    assert all(full[k] == v for k, v in first.items())
    with pytest.raises(ValueError, match="sum to 1"):
        split(docs, [0.5, 0.1])


def test_stratified_rates(docs):
    out = stratified_sample(
        docs, {"en": 0.05, "de": 1.0}, strata_col="lang"
    )
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got["de"] == 2000  # rare stratum kept whole
    assert 0.02 * 8000 < got["en"] < 0.08 * 8000


def test_sampling_plan_is_narrow(docs):
    plan = (
        deterministic_sample(docs, 0.1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure filter: no shuffle
    assert "BatchEvalPython" not in plan


def test_portable_bucket_matches_duckdb(spark):
    import duckdb

    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    got = {r["doc_id"]: r["b"] for r in
           df.select("doc_id", portable_lcg_bucket().alias("b")).collect()}
    want = dict(duckdb.connect().execute(
        "SELECT i, ((((i % 1000003) * 1103515245 + 12345) % 2147483648) "
        "% 1000000) FROM range(1000) t(i)"
    ).fetchall())
    assert got == want


def test_vocab_topk_counts(spark):
    docs = spark.createDataFrame(
        [(1, "the cat the hat"), (2, "THE cat  runs")], "doc_id long, text string"
    )
    rows = vocab_topk(docs, "text", 3).collect()
    assert [(r["token"], r["n"]) for r in rows] == [
        ("the", 3), ("cat", 2), ("hat", 1),
    ]


def test_negative_keys_bucket_in_range(spark):
    """Code-review regression: sign-preserving % would emit negative
    buckets for negative keys, silently breaking rates and splits."""
    df = spark.range(-500, 0).select(F.col("id").alias("doc_id"))
    rows = df.select(portable_lcg_bucket().alias("b")).collect()
    assert all(0 <= r["b"] < 1_000_000 for r in rows)
    n = deterministic_sample(df, 0.01, hash_col=portable_lcg_bucket()).count()
    assert n < 100  # a 1% sample must not keep ~all negative-key rows


# ------------------------------------------------- sequence packing


def test_pack_documents_invariants(spark):
    from tinyolap_spark.pipeline.packing import pack_documents, pack_summary

    rows = [(i, " ".join(["tok"] * (10 + (i * 7) % 50))) for i in range(200)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    packed = pack_documents(docs, budget=100, num_groups=4).cache()

    # every document appears exactly once with its true token count
    got = {r.doc_id: r for r in packed.collect()}
    assert len(got) == 200
    assert all(got[i].n_tokens == 10 + (i * 7) % 50 for i in range(200))
    # group is a real hash bucket (ADVICE r5: not an id stride) — in
    # range, and no group starves on sequential ids
    assert all(0 <= got[i].group < 4 for i in range(200))
    sizes = [sum(1 for r in got.values() if r.group == g) for g in range(4)]
    assert min(sizes) > 0

    # pack token sums never exceed budget + the straddling document
    summ = pack_summary(packed).collect()
    max_doc = max(r.n_tokens for r in got.values())
    assert all(s.pack_tokens <= 100 + max_doc for s in summ)
    # packs are dense per group: 0..max with no holes
    by_group = {}
    for s in summ:
        by_group.setdefault(s.group, []).append(s.pack_id)
    for g, pids in by_group.items():
        assert sorted(pids) == list(range(max(pids) + 1))

    # deterministic: same input -> identical assignment
    again = {
        r.doc_id: (r.group, r.pack_id)
        for r in pack_documents(docs, budget=100, num_groups=4).collect()
    }
    assert again == {i: (got[i].group, got[i].pack_id) for i in range(200)}

    # tokens_before is the offset of the doc inside its (chopped) pack
    for r in got.values():
        assert 0 <= r.tokens_before < 100


def test_compose_mixture_epochs_and_rates(spark):
    """Mixture composition: over-subscribed source repeats in full
    epochs + a deterministic partial; under-subscribed source
    down-samples; delivered tokens track the weighted shares; stats
    report the plan; invalid inputs fail loudly."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from tinyolap_spark.pipeline.mixture import (
        compose_mixture,
        mixture_report,
        source_token_stats,
    )

    a = spark.createDataFrame(
        [(i, "tok " * 10) for i in range(40)], ["doc_id", "text"]
    ).withColumn("text", F.trim("text"))
    b = spark.createDataFrame(
        [(i, "tok " * 10) for i in range(100, 300)], ["doc_id", "text"]
    ).withColumn("text", F.trim("text"))
    stats = source_token_stats({"a": a, "b": b})
    assert stats == {"a": (40, 400), "b": (200, 2000)}

    plan = {}
    # total budget 3000, weights 2:1 -> a gets 2000 (5 epochs of 400),
    # b gets 1000 (rate 0.5 of 2000)
    mix = compose_mixture(
        {"a": a, "b": b}, {"a": 2.0, "b": 1.0}, 3000, stats=plan
    )
    assert plan["a"]["epochs"] == 5 and plan["a"]["partial_rate"] == 0.0
    assert plan["b"]["epochs"] == 0
    assert abs(plan["b"]["partial_rate"] - 0.5) < 1e-12
    rep = {
        (r.source, r.epoch): (r.n_docs, r.n_tokens)
        for r in mixture_report(mix).collect()
    }
    # a: exactly 5 full epochs, each complete
    for ep in range(5):
        assert rep[("a", ep)] == (40, 400)
    assert ("a", 5) not in rep
    # b: one partial epoch, tokens within 20% of the 1000 share (hash
    # buckets approximate the rate)
    (nb, tb) = rep[("b", 0)]
    assert 800 <= tb <= 1200 and nb == tb // 10
    # deterministic: identical on re-run
    rep2 = {
        (r.source, r.epoch): (r.n_docs, r.n_tokens)
        for r in mixture_report(
            compose_mixture({"a": a, "b": b}, {"a": 2.0, "b": 1.0}, 3000)
        ).collect()
    }
    assert rep2 == rep

    with _pytest.raises(ValueError):
        compose_mixture({"a": a}, {}, 100)  # missing weight
    with _pytest.raises(ValueError):
        compose_mixture({"a": a}, {"a": 0.0}, 100)  # zero total weight
    empty = a.where(F.lit(False))
    with _pytest.raises(ValueError):
        compose_mixture({"e": empty}, {"e": 1.0}, 100)  # empty mixture


def test_pack_payloads_order_and_separator(spark):
    """Payload assembly: docs concatenated in id order with the
    separator, per pack; counts/token sums match pack_summary."""
    from tinyolap_spark.pipeline.packing import (
        pack_documents,
        pack_payloads,
        pack_summary,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"d{i} " * 40) for i in range(12)], ["doc_id", "text"]
    ).withColumn("text", F.trim("text"))
    packed = pack_documents(
        docs, budget=100, num_groups=1, group_expr=F.lit(0)
    ).cache()
    payloads = pack_payloads(packed, sep="<EOS>").collect()
    summ = {(r.group, r.pack_id): r for r in pack_summary(packed).collect()}
    assert len(payloads) == len(summ)
    for r in payloads:
        s = summ[(r.group, r.pack_id)]
        assert (r.n_docs, r.pack_tokens) == (s.n_docs, s.pack_tokens)
        parts = r.payload.split("<EOS>")
        assert len(parts) == r.n_docs
        ids = [int(p.split()[0][1:]) for p in parts]
        assert ids == sorted(ids)  # doc order inside the pack
    # every doc appears exactly once across all payloads
    all_ids = [
        int(p.split()[0][1:])
        for r in payloads
        for p in r.payload.split("<EOS>")
    ]
    assert sorted(all_ids) == list(range(12))
    packed.unpersist()


def test_pack_documents_string_ids(spark):
    """String doc ids must work (ADVICE r5: the old `% num_groups`
    stride needed numeric ids and threw under ANSI mode)."""
    from tinyolap_spark.pipeline.packing import pack_documents

    docs = spark.createDataFrame(
        [(f"doc-{i}", " ".join(["tok"] * 30)) for i in range(50)],
        ["doc_id", "text"],
    )
    packed = pack_documents(docs, budget=100, num_groups=4).collect()
    assert len(packed) == 50
    assert all(0 <= r.group < 4 and r.pack_id >= 0 for r in packed)


def test_pack_documents_custom_token_col(spark):
    from tinyolap_spark.pipeline.packing import pack_documents

    docs = spark.createDataFrame(
        [(1, "ignored", 60), (2, "ignored", 60), (3, "ignored", 60)],
        ["doc_id", "text", "bpe_count"],
    )
    packed = {
        r.doc_id: r
        for r in pack_documents(
            docs, budget=100, num_groups=1, token_col="bpe_count"
        ).collect()
    }
    # 60+60 straddles at 100: doc2 stays in pack 0, doc3 starts pack 1
    assert packed[1].pack_id == 0 and packed[2].pack_id == 0
    assert packed[3].pack_id == 1


def test_deterministic_top_k(spark):
    """Exactly-k semantics: k rows per stratum (or globally), stable
    under repartitioning, boundary-stable under corpus growth."""
    from pyspark.sql import functions as F

    from tinyolap_spark.pipeline.sampling import deterministic_top_k

    df = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 4).alias("s")
    )
    per = deterministic_top_k(df, 7, strata_col="s")
    rows = per.collect()
    assert len(rows) == 28
    by_s = {}
    for r in rows:
        by_s.setdefault(r.s, set()).add(r.doc_id)
    assert all(len(v) == 7 for v in by_s.values())
    # repartition-stable
    again = {
        (r.s, r.doc_id)
        for r in deterministic_top_k(
            df.repartition(13), 7, strata_col="s"
        ).collect()
    }
    assert again == {(r.s, r.doc_id) for r in rows}
    # growth only displaces at the boundary: the k selected from a
    # SUBSET are a superset-rank prefix — every survivor of the grown
    # corpus that existed before was already selected or ranked deeper
    small = deterministic_top_k(df.where("doc_id < 250"), 7, strata_col="s")
    small_ids = {(r.s, r.doc_id) for r in small.collect()}
    # selected-from-small that still rank in top-7 of the full corpus
    # must be exactly the full-corpus selections below 250
    assert {(s, d) for s, d in again if d < 250} <= small_ids


class TestQuantileFilter:
    """Per-group quantile curation: exact window path vs the
    approx_percentile scale path."""

    @pytest.fixture(scope="class")
    def scored_docs(self, spark):
        import numpy as np

        rng = np.random.RandomState(7)
        rows = [
            (int(i), f"g{i % 4}", float(rng.rand()))
            for i in range(2000)
        ]
        return spark.createDataFrame(rows, "doc_id long, source string, s double")

    def test_exact_keeps_ceil_fraction_per_group(self, spark, scored_docs):
        from tinyolap_spark.pipeline.text import quantile_filter

        kept = quantile_filter(scored_docs, "s", "source", 0.3, exact=True)
        sizes = {r.source: r.n for r in kept.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        totals = {r.source: r.n for r in scored_docs.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        for g, n in totals.items():
            assert sizes[g] == -(-n * 3 // 10)  # ceil(0.3*n)
        # and they really are the top-scored rows: min kept > max dropped
        kept_ids = {r.doc_id for r in kept.collect()}
        by_g = {}
        for r in scored_docs.collect():
            by_g.setdefault(r.source, []).append(r)
        for g, rows in by_g.items():
            ks = [r.s for r in rows if r.doc_id in kept_ids]
            ds = [r.s for r in rows if r.doc_id not in kept_ids]
            assert min(ks) >= max(ds)

    def test_approx_within_sketch_tolerance(self, spark, scored_docs):
        from tinyolap_spark.pipeline.text import quantile_filter

        exact = quantile_filter(scored_docs, "s", "source", 0.3, exact=True)
        approx = quantile_filter(
            scored_docs, "s", "source", 0.3, exact=False, accuracy=10_000
        )
        ne, na = exact.count(), approx.count()
        # rank error ~ n/accuracy per group (n=500) -> tiny; allow 2%
        assert abs(na - ne) <= max(4, int(0.02 * ne))
        # approx plan must stay window-free (no per-group sort)
        plan = approx._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "BroadcastHashJoin" in plan

    def test_keep_frac_one_keeps_everything(self, spark, scored_docs):
        from tinyolap_spark.pipeline.text import quantile_filter

        kept = quantile_filter(scored_docs, "s", "source", 1.0, exact=True)
        assert kept.count() == scored_docs.count()
        with pytest.raises(ValueError):
            quantile_filter(scored_docs, "s", "source", 0.0)


def test_clip_outliers_exact_and_approx(spark):
    """Winsorization clamps exactly at the group quantiles; the approx
    path lands within sketch tolerance; pass-through columns survive."""
    import numpy as np

    from tinyolap_spark.pipeline.text import clip_outliers

    rng = np.random.RandomState(5)
    rows = [
        (int(i), "g" + str(i % 2), float(v), "x")
        for i, v in enumerate(rng.normal(100, 10, 1000))
    ]
    rows.append((5000, "g0", 1e9, "x"))   # the corrupt outlier
    rows.append((5001, "g1", -1e9, "x"))
    df = spark.createDataFrame(rows, "rid long, source string, v double, tag string")
    out = clip_outliers(df, "v", "source", 0.01, 0.99, exact=True)
    got = {r.rid: r for r in out.collect()}
    assert set(out.columns) == {"rid", "source", "v", "tag", "v_clipped"}
    # outliers clamped into the group's bulk; originals untouched
    assert got[5000].v == 1e9 and got[5000].v_clipped < 200
    assert got[5001].v == -1e9 and got[5001].v_clipped > 0
    # interior values pass through unclipped
    import numpy as np
    vs = sorted(r.v for r in out.collect() if r.source == "g0")
    mid = vs[len(vs) // 2]
    interior = [r for r in got.values() if abs(r.v - mid) < 1][0]
    assert interior.v_clipped == interior.v
    approx = clip_outliers(df, "v", "source", 0.01, 0.99, exact=False)
    ga = {r.rid: r.v_clipped for r in approx.collect()}
    assert abs(ga[5000] - got[5000].v_clipped) < 5.0
    with pytest.raises(ValueError):
        clip_outliers(df, "v", "source", 0.9, 0.1)


def test_weighted_sample_without_replacement(spark):
    """Efraimidis-Spirakis: inclusion tracks weight (a 1000x-weight item
    appears in almost every group's sample), results are deterministic,
    non-positive weights never sampled, exactly k per group."""
    from tinyolap_spark.pipeline.sampling import weighted_sample

    rows = []
    for g in range(200):
        rows.append((g * 100, f"g{g}", 1000.0))      # heavy item
        for j in range(1, 10):
            rows.append((g * 100 + j, f"g{g}", 1.0))  # light items
        rows.append((g * 100 + 50, f"g{g}", 0.0))     # never sampled
        rows.append((g * 100 + 51, f"g{g}", None))    # never sampled
    df = spark.createDataFrame(rows, "doc_id long, source string, w double")

    out = weighted_sample(df, 2, "w", group_col="source")
    got = {}
    for r in out.collect():
        got.setdefault(r.source, set()).add(r.doc_id)
    assert all(len(v) == 2 for v in got.values()) and len(got) == 200
    heavy_hits = sum(1 for g in range(200) if g * 100 in got[f"g{g}"])
    assert heavy_hits > 180  # weight-1000 item ~always drawn
    assert not any(
        d % 100 in (50, 51) for v in got.values() for d in v
    )
    # deterministic across invocations
    again = {}
    for r in weighted_sample(df, 2, "w", group_col="source").collect():
        again.setdefault(r.source, set()).add(r.doc_id)
    assert again == got
    # global top-k plan avoids a global sort
    plan = weighted_sample(df, 5, "w")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    with pytest.raises(ValueError):
        weighted_sample(df, 0, "w")
