"""Similarity search over embedding columns (``array<float>``).

Two tiers:

- :func:`brute_force_topk` — exact cosine top-k.  One pass over the corpus
  per query batch; queries broadcast as literal arrays (or a broadcast-join
  for query DataFrames).  At 100 TB this is the *verification* path and the
  fallback for small corpora/partitions.
- :func:`ivf_topk` — IVF-style approximate search: k-means-ish coarse
  centroids (sampled + Lloyd iterations on the driver over a small sample),
  each vector assigned to its nearest centroid (one narrow pass), queries
  probe only ``nprobe`` cells → the scan is cut by ~ncells/nprobe.  The
  assignment column doubles as a partition key so each query touches few
  partitions (partition pruning on disk when written partitioned-by-cell).

Dot products use JVM higher-order functions (``zip_with``/``aggregate``) —
vectorized enough at 64-256 dims; for very wide vectors swap in the
pandas-UDF variant :func:`cosine_topk_pandas` (Arrow-batched NumPy matmul).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot_lit(vec_col, qvec: Sequence[float]):
    arr = "array({})".format(", ".join(f"cast({float(v)!r} as double)" for v in qvec))
    return F.expr(
        f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> cast(x as double) * y), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _norm(vec_col):
    return F.expr(
        f"sqrt(aggregate(transform({vec_col}, x -> cast(x as double) * x), "
        f"cast(0.0 as double), (acc, v) -> acc + v))"
    )


def brute_force_topk(
    emb: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k neighbors of one query vector: (id, score)."""
    qnorm = sum(float(x) * float(x) for x in qvec) ** 0.5
    dot = _dot_lit(vec_col, qvec)
    if metric == "cosine":
        score = dot / (_norm(vec_col) * F.lit(qnorm))
    elif metric == "dot":
        score = dot
    else:
        raise ValueError(f"unknown metric {metric!r}")
    return (
        emb.select(F.col(id_col), score.alias("score"))
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def cosine_topk_pandas(
    emb: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-batched NumPy variant: per-partition top-k then global top-k.

    mapInPandas computes only k rows per batch → the shuffle to the final
    top-k is k x npartitions rows, independent of corpus size.
    """
    import numpy as np  # noqa: F401 (executor-side import below)

    q = [float(x) for x in qvec]

    def scorer(batches):
        import numpy as np
        import pandas as pd

        qv = np.asarray(q, dtype=np.float64)
        qn = np.linalg.norm(qv)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf[vec_col].map(
                lambda a: np.asarray(a, dtype=np.float64)
            ))
            scores = mat @ qv / (np.linalg.norm(mat, axis=1) * qn)
            top = np.argsort(-scores)[:k]
            yield pd.DataFrame(
                {id_col: pdf[id_col].values[top], "score": scores[top]}
            )

    partial = emb.select(id_col, vec_col).mapInPandas(
        scorer, schema=f"{id_col} long, score double"
    )
    return partial.orderBy(F.desc("score"), id_col).limit(k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate search
# ---------------------------------------------------------------------------


class IVFIndex:
    """Coarse-quantized corpus: centroids on the driver, assignments as a
    column.  ``ncells`` ~ sqrt(corpus); built from a driver-side sample."""

    def __init__(
        self,
        emb: DataFrame,
        ncells: int = 16,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        sample: int = 2048,
        iters: int = 5,
        seed: int = 42,
    ):
        import numpy as np

        self.id_col, self.vec_col = id_col, vec_col
        self.ncells = ncells
        rows = (
            emb.select(vec_col)
            .limit(sample)
            .collect()
        )
        X = np.vstack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
        rng = np.random.default_rng(seed)
        cents = X[rng.choice(len(X), size=min(ncells, len(X)), replace=False)]
        for _ in range(iters):  # Lloyd iterations on the sample (driver)
            d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            assign = d.argmin(1)
            for c in range(len(cents)):
                m = X[assign == c]
                if len(m):
                    cents[c] = m.mean(0)
        self.centroids = cents
        # assignment pass: nearest centroid per vector (JVM expression)
        scored = emb
        best = None
        for ci, c in enumerate(cents):
            dist = self._sqdist_expr(vec_col, c)
            s = F.struct(dist.alias("d"), F.lit(ci).alias("cell"))
            best = s if best is None else F.least(best, s)
        self.assigned = scored.withColumn("cell", best["cell"]).persist()

    @staticmethod
    def _sqdist_expr(vec_col: str, centroid) -> F.Column:
        arr = "array({})".format(
            ", ".join(f"cast({float(v)!r} as double)" for v in centroid)
        )
        return F.expr(
            f"aggregate(zip_with({vec_col}, {arr}, "
            f"(x, y) -> (cast(x as double) - y) * (cast(x as double) - y)), "
            f"cast(0.0 as double), (acc, v) -> acc + v)"
        )

    def search(
        self, qvec: Sequence[float], k: int = 10, nprobe: int = 4
    ) -> DataFrame:
        import numpy as np

        q = np.asarray([float(x) for x in qvec])
        d = ((self.centroids - q[None, :]) ** 2).sum(1)
        probe_cells = [int(i) for i in np.argsort(d)[:nprobe]]
        subset = self.assigned.where(F.col("cell").isin(probe_cells))
        return brute_force_topk(
            subset, qvec, k=k, id_col=self.id_col, vec_col=self.vec_col
        )


def lsh_bucket_topk(
    emb: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    nplanes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    max_flip: int = 1,
) -> DataFrame:
    """Random-hyperplane LSH: vectors bucketed by sign pattern; the query
    probes its bucket plus all buckets within ``max_flip`` bit flips."""
    import itertools
    import numpy as np

    rows0 = emb.select(vec_col).limit(1).collect()
    dim = len(rows0[0][vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((nplanes, dim))
    bucket = None
    for i, p in enumerate(planes):
        bit = (_dot_lit(vec_col, list(p)) > 0).cast("long") * F.lit(1 << i).cast("long")
        bucket = bit if bucket is None else bucket + bit
    bucketed = emb.withColumn("bucket", bucket)
    q = np.asarray([float(x) for x in qvec])
    qb = 0
    for i, p in enumerate(planes):
        if float(q @ p) > 0:
            qb |= 1 << i
    probes = {qb}
    if max_flip >= 1:
        for i in range(nplanes):
            probes.add(qb ^ (1 << i))
    if max_flip >= 2:
        for i, j in itertools.combinations(range(nplanes), 2):
            probes.add(qb ^ (1 << i) ^ (1 << j))
    subset = bucketed.where(F.col("bucket").isin([int(b) for b in probes]))
    return brute_force_topk(subset, qvec, k=k, id_col=id_col, vec_col=vec_col)
