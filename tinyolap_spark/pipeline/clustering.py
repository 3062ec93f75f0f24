"""Distributed k-means (Lloyd's) over an embedding column.

Complements :class:`tinyolap_spark.pipeline.similarity.IVFIndex`, whose
centroids come from a driver-side SAMPLE: here every Lloyd iteration
runs over the FULL corpus, so centroid quality does not depend on the
sample being representative.  Use this to train centroids for very
large / skewed corpora, then hand them to ``IVFIndex(centroids=...)``.

Scale design per iteration (the whole loop is O(max_iter) Spark jobs,
each one pass over the data):

- **assignment** — one Arrow-batched ``mapInPandas`` pass; the centroid
  matrix (k x dim, driver-sized: 4096 x 1024 floats = 32 MB worst case)
  ships in the task closure, distances are a single BLAS matmul per
  batch, no shuffle;
- **update** — ``posexplode`` the vector and aggregate
  ``(cluster, position) -> (sum, count)``: map-side partial aggregation
  reduces each partition to at most k x dim rows before the ONE shuffle,
  and the k x dim result is driver-sized by construction;
- **inertia** — folded into the same aggregate (sum of squared
  distances), so convergence checks add no extra job.

Determinism: init picks the k lowest ``xxhash64(id)`` rows (a seeded,
order-independent pseudo-random draw — stable across partitioning and
row order, unlike ``limit``/``takeSample``).  Ties in ``argmin`` break
to the lowest cluster index, matching ``numpy.argmin``.  Float sums are
tree-aggregated in nondeterministic order, so exact bit-equality across
runs is NOT guaranteed — tests compare with tolerances.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class KMeansResult:
    centroids: "object"  # np.ndarray (k, dim)
    assigned: DataFrame  # input columns + `cluster` int
    inertia: float  # final sum of squared distances
    iterations: int
    history: list[float] = field(default_factory=list)  # inertia per iter


def _assign(emb: DataFrame, vec_col: str, cents) -> DataFrame:
    """One Arrow pass: nearest-centroid id (+ squared distance) per row."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    cent_list = [[float(x) for x in c] for c in cents]

    def batches(it):
        import numpy as np
        import pandas as pd

        C = np.asarray(cent_list, dtype=np.float64)
        Cn = (C * C).sum(1)
        for pdf in it:
            pdf = pdf.copy()
            if len(pdf):
                M = np.vstack(
                    pdf[vec_col].map(lambda a: np.asarray(a, dtype=np.float64))
                )
                d2 = (
                    (M * M).sum(1)[:, None] - 2.0 * (M @ C.T) + Cn[None, :]
                )
                pdf["cluster"] = d2.argmin(1).astype("int32")
                # clamp: float cancellation can produce tiny negatives
                pdf["__d2"] = np.maximum(d2.min(1), 0.0)
            else:
                pdf["cluster"] = pd.Series([], dtype="int32")
                pdf["__d2"] = pd.Series([], dtype="float64")
            yield pdf

    schema = StructType(
        list(emb.schema.fields)
        + [StructField("cluster", IntegerType()), StructField("__d2", DoubleType())]
    )
    return emb.mapInPandas(batches, schema)


def kmeans(
    emb: DataFrame,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_iter: int = 10,
    tol: float = 1e-6,
    seed: int = 42,
) -> KMeansResult:
    """Full-corpus Lloyd's algorithm; returns centroids, an assignment
    DataFrame (input columns + ``cluster``), and the inertia history.

    ``tol``: stop when relative inertia improvement falls below it.
    Empty clusters keep their previous centroid (standard Lloyd's
    fallback; deterministic).

    The input is NOT cached here: each iteration re-reads the source —
    the scale-correct default for corpora that don't fit memory; pass a
    ``.cache()``-ed DataFrame to trade memory for iteration speed."""
    import numpy as np

    # deterministic seeded init: k smallest xxhash64(seed, id) --- a
    # reproducible pseudo-random draw independent of row/partition order
    init_rows = (
        emb.select(vec_col, id_col)
        .withColumn("__r", F.xxhash64(F.lit(seed), F.col(id_col)))
        .orderBy("__r")
        .limit(k)
        .collect()
    )
    if len(init_rows) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(init_rows)}")
    cents = np.vstack(
        [np.asarray(r[vec_col], dtype=np.float64) for r in init_rows]
    )

    history: list[float] = []
    it = 0
    for it in range(1, max_iter + 1):
        assigned = _assign(emb, vec_col, cents)
        # ONE shuffle: per-(cluster, dim-position) partial sums, plus the
        # per-cluster count and inertia folded into the same aggregate
        stats = (
            assigned.select(
                "cluster",
                "__d2",
                F.posexplode(vec_col).alias("__pos", "__x"),
            )
            .groupBy("cluster", "__pos")
            .agg(
                F.sum("__x").alias("__sum"),
                F.count(F.lit(1)).alias("__n"),
                # __d2 repeats once per dim inside a row's exploded
                # block; inertia is read from the __pos == 0 group only
                # (below), where each row contributes its __d2 exactly once
                F.sum("__d2").alias("__d2sum"),
            )
            .collect()
        )
        dim = cents.shape[1]
        new_cents = cents.copy()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.float64)
        inertia = 0.0
        for row in stats:
            c, p = int(row["cluster"]), int(row["__pos"])
            sums[c, p] = float(row["__sum"])
            counts[c] = int(row["__n"])
            if p == 0:
                inertia += float(row["__d2sum"])
        for c in range(k):
            if counts[c] > 0:
                new_cents[c] = sums[c] / counts[c]
        history.append(inertia)
        cents = new_cents
        if len(history) >= 2 and history[-2] > 0:
            if (history[-2] - history[-1]) / history[-2] < tol:
                break

    # final assignment against the POST-update centroids; fold the true
    # final inertia into the same pass (history entries are measured
    # against each iteration's PRE-update centroids, so history[-1]
    # would be one update stale relative to `centroids`/`assigned`)
    final_all = _assign(emb, vec_col, cents)
    final_inertia = float(
        final_all.agg(F.sum("__d2").alias("s")).collect()[0]["s"] or 0.0
    )
    final = final_all.drop("__d2")
    return KMeansResult(
        centroids=cents,
        assigned=final,
        inertia=final_inertia,
        iterations=it,
        history=history,
    )


def assign(
    emb: DataFrame, centroids, vec_col: str = "embedding"
) -> DataFrame:
    """Nearest-centroid assignment against a FIXED centroid list (any
    sequence of float sequences): one Arrow pass, no shuffle — the
    non-iterative half of k-means, usable on its own (score a corpus
    against pretrained centroids, seed an :class:`IVFIndex`, or give the
    assignment kernel a plain-SQL oracle: argmin over a literal centroid
    table, which an ANSI engine replicates exactly).

    Returns the input columns plus ``cluster`` (int, lowest-index
    tie-break matching ``numpy.argmin``)."""
    return _assign(emb, vec_col, centroids).drop("__d2")


def cluster_profile(result: KMeansResult) -> DataFrame:
    """Per-cluster size summary (driver-sized: k rows) — the audit/
    reporting companion; one count shuffle with map-side combine."""
    return (
        result.assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("cluster")
    )
