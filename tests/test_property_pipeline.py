"""Randomized differential tests for the round-6 pipeline operators:
random inputs, results compared against independent pure-Python
reference implementations (the dict-oracle strategy of
test_property.py applied to funnels and connected components)."""

import random
from datetime import datetime, timedelta

from pyspark.sql import functions as F


# ------------------------------------------------------------------ funnel


def _py_funnel(events, steps, max_gap_sec=None):
    """Greedy strict-order scan over (ts, tp)-sorted events — the
    pure-Python reference for funnel_stages (ties sort by type string,
    matching the Spark sort_array struct ordering)."""
    out = {}
    by_user = {}
    for u, ts, tp in events:
        by_user.setdefault(u, []).append((ts, tp))
    for u, evs in by_user.items():
        stage, last = 0, None
        for ts, tp in sorted(evs):
            if stage >= len(steps) or ts is None:
                continue
            if tp != steps[stage]:
                continue
            if last is not None:
                if not ts > last:
                    continue
                if max_gap_sec is not None and (
                    (ts - last).total_seconds() > max_gap_sec
                ):
                    continue
            stage += 1
            last = ts
        out[u] = stage
    return out


def test_funnel_random_differential(spark):
    """300 random users x random event sequences, three modes, exact
    agreement with the pure-Python greedy reference."""
    steps = ["a", "b", "c", "d"]
    base = datetime(2026, 1, 1)
    for seed in (7, 21):
        rng = random.Random(seed)
        rows = []
        for u in range(100):
            n = rng.randint(0, 15)
            for _ in range(n):
                ts = base + timedelta(
                    seconds=rng.randint(0, 3600),
                    microseconds=rng.choice([0, 1, 999_999]),
                )
                tp = rng.choice(steps + ["noise", "x"])
                rows.append((u, ts, tp))
        # every user must appear (stage-0 users included)
        rows += [(u, base, "noise") for u in range(100)]
        ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])

        from tinyolap_spark.pipeline.events import funnel_stages

        for gap in (None, 600):
            got = {
                r.user_id: r.stage
                for r in funnel_stages(ev, steps, max_gap_sec=gap).collect()
            }
            assert got == _py_funnel(rows, steps, gap), (seed, gap)
        got_any = {
            r.user_id: r.stage
            for r in funnel_stages(ev, steps, ordered=False).collect()
        }
        ref_any = {}
        for u, ts, tp in rows:
            ref_any.setdefault(u, set())
            if tp in steps and ts is not None:
                ref_any[u].add(tp)
        assert got_any == {u: len(s) for u, s in ref_any.items()}, seed


# ------------------------------------------------- connected components


def _py_components(pairs):
    """Union-find reference: node -> min id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_duplicate_clusters_random_differential(spark):
    """Random graphs (sparse, dense, long chains) vs union-find."""
    from tinyolap_spark.pipeline import dedup

    for seed, n_nodes, n_edges in [(3, 60, 30), (4, 40, 80), (5, 50, 25)]:
        rng = random.Random(seed)
        pairs = set()
        while len(pairs) < n_edges:
            a, b = rng.sample(range(n_nodes), 2)
            pairs.add((min(a, b), max(a, b)))
        # plant one long chain to force multi-round propagation
        chain = rng.sample(range(1000, 1020), 12)
        pairs |= {
            (min(x, y), max(x, y)) for x, y in zip(chain, chain[1:])
        }
        df = spark.createDataFrame(
            sorted(pairs), "doc_a long, doc_b long"
        )
        got = {
            r.doc: r.cluster for r in dedup.duplicate_clusters(df).collect()
        }
        assert got == _py_components(pairs), seed


def test_cluster_survivors_random(spark):
    """Survivors = exactly one min-id representative per component plus
    all unpaired docs."""
    from tinyolap_spark.pipeline import dedup

    rng = random.Random(11)
    pairs = set()
    while len(pairs) < 40:
        a, b = rng.sample(range(50), 2)
        pairs.add((min(a, b), max(a, b)))
    ref = _py_components(pairs)
    docs = spark.range(80).select(
        F.col("id").alias("doc_id"), F.lit("t").alias("text")
    )
    clusters = dedup.duplicate_clusters(
        spark.createDataFrame(sorted(pairs), "doc_a long, doc_b long")
    )
    kept = {
        r.doc_id
        for r in dedup.cluster_survivors(docs, clusters).collect()
    }
    expected = {i for i in range(80) if ref.get(i, i) == i}
    assert kept == expected


# ----------------------------------------------------------------- asof


def _py_asof(lefts, rights, direction, exact, tol):
    """Pure-Python merge_asof reference: per left row, the nearest right
    (ts, tb, val) of the same key at-or-before/after; ties on ts break
    to max tb (backward) / min tb (forward); tolerance nulls the match."""
    out = {}
    for k, lts, lid in lefts:
        best = None
        for rk, rts, tb, val in rights:
            if rk != k:
                continue
            if direction == "backward":
                ok = rts <= lts if exact else rts < lts
            else:
                ok = rts >= lts if exact else rts > lts
            if not ok:
                continue
            cand = (rts, tb, val)
            if best is None:
                best = cand
            elif direction == "backward" and (cand[0], cand[1]) > (
                best[0],
                best[1],
            ):
                best = cand  # nearest-before: max ts, then max tiebreak
            elif direction == "forward" and (cand[0], cand[1]) < (
                best[0],
                best[1],
            ):
                best = cand  # nearest-after: min ts, then min tiebreak
        if best is not None and tol is not None and abs(lts - best[0]) > tol:
            best = None
        out[lid] = best
    return out


def test_asof_join_randomized_differential(spark):
    """Random keys/timestamps (with deliberate exact-tie collisions)
    across all 4 direction/exact combos and a tolerance — Spark asof_join
    equals the pure-Python nearest-scan reference row for row."""
    from tinyolap_spark.pipeline.joins import asof_join

    rng = random.Random(1234)
    for trial in range(3):
        keys = ["a", "b", "c"]
        # coarse integer timestamps force plenty of exact ties
        lefts = [
            (rng.choice(keys), rng.randrange(0, 40), i)
            for i in range(60)
        ]
        rights = [
            (rng.choice(keys), rng.randrange(0, 40), j, float(j))
            for j in range(50)
        ]
        ldf = spark.createDataFrame(lefts, "k string, ts long, lid long")
        rdf = spark.createDataFrame(
            rights, "k string, ts long, tb long, val double"
        )
        for direction in ("backward", "forward"):
            for exact in (True, False):
                tol = 7.0 if trial == 2 else None
                got = {
                    r.lid: (r.ts_r, r.tb_r, r.val_r)
                    if r.ts_r is not None
                    else None
                    for r in asof_join(
                        ldf,
                        rdf,
                        on=["k"],
                        direction=direction,
                        allow_exact_match=exact,
                        tiebreak="tb",
                        tolerance_sec=tol,
                    ).collect()
                }
                want = _py_asof(lefts, rights, direction, exact, tol)
                assert got == want, (trial, direction, exact)
