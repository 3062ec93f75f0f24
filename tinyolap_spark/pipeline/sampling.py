"""Deterministic sampling and dataset splits for training pipelines.

Random sampling is the wrong tool for training data: re-runs must select
the SAME rows (resumable pipelines, reproducible ablations), membership
must be decidable per-row without global state, and train/val/test must
stay disjoint under re-partitioning.  The standard answer is HASH
BUCKETING: ``bucket = hash(key) % D``, a row is sampled iff its bucket
falls below the rate.  Narrow (no shuffle), deterministic, and stable
under any re-ordering of the input — exactly what a 100 TB corpus scan
needs.

The default hash is Spark's ``xxhash64`` (JVM, codegen).  A
``hash_col`` override lets callers substitute any integer expression —
the oracle queries use a portable LCG so DuckDB computes the identical
buckets; production keeps xxhash64.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def hash_bucket(
    key_col: str = "doc_id", hash_col: Optional[Column] = None
) -> Column:
    """Stable bucket in ``[0, 1e6)`` for a key column."""
    h = F.xxhash64(F.col(key_col)) if hash_col is None else hash_col
    return F.pmod(h, F.lit(_BUCKETS))


def portable_lcg_bucket(key_col: str = "doc_id") -> Column:
    """Engine-portable bucket: a 31-bit LCG over the key, expressible in
    any SQL dialect with 64-bit integer arithmetic (used by the DuckDB
    oracle twin; ``hash(key)`` differs between engines, plain arithmetic
    does not).  The key is reduced mod a prime first so the multiply
    never overflows 64-bit for any BIGINT key.  Uses ``pmod`` so NEGATIVE
    keys still land in ``[0, 1e6)`` (sign-preserving ``%`` would emit
    negative buckets and break rate/split semantics); a SQL twin for
    negative keys must spell ``((x % m) + m) % m``."""
    k = F.pmod(F.col(key_col), F.lit(1_000_003))
    return F.pmod(
        F.pmod(k * F.lit(1_103_515_245) + F.lit(12_345), F.lit(2_147_483_648)),
        F.lit(_BUCKETS),
    )


def deterministic_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    hash_col: Optional[Column] = None,
) -> DataFrame:
    """Keep ~``rate`` of rows, decided per-row by hash bucket — same rows
    on every run, no RNG state, no shuffle."""
    return df.where(hash_bucket(key_col, hash_col) < int(rate * _BUCKETS))


def split(
    df: DataFrame,
    fractions: Sequence[float],
    key_col: str = "doc_id",
    names: Optional[Sequence[str]] = None,
    hash_col: Optional[Column] = None,
) -> DataFrame:
    """Disjoint train/val/test split as a ``__split`` label column.

    ``fractions`` must sum to 1.  Buckets partition the hash space into
    contiguous ranges, so the splits are exactly disjoint and exhaustive,
    and stay stable when rows are added (a key never migrates)."""
    if abs(sum(fractions) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {sum(fractions)}")
    names = list(names or [f"split_{i}" for i in range(len(fractions))])
    if len(names) != len(fractions):
        raise ValueError("names/fractions length mismatch")
    b = hash_bucket(key_col, hash_col)
    hi = 0.0
    expr = F.lit(names[-1])  # last split takes the remainder range
    cases = []
    for name, frac in zip(names[:-1], fractions[:-1]):
        hi += frac
        cases.append((int(hi * _BUCKETS), name))
    for bound, name in reversed(cases):
        expr = F.when(b < bound, F.lit(name)).otherwise(expr)
    return df.withColumn("__split", expr)


def deterministic_top_k(
    df: DataFrame,
    k: int,
    key_col: str = "doc_id",
    strata_col: Optional[str] = None,
    hash_col: Optional[Column] = None,
) -> DataFrame:
    """EXACTLY ``k`` rows (per stratum), chosen deterministically: the k
    smallest hash buckets (ties by key) — the "give me a reproducible
    10k-doc ablation subset" primitive that rate-based sampling can't
    deliver exactly.

    Scale shape: the GLOBAL variant compiles to per-partition top-k +
    merge (``TakeOrderedAndProject``) — no full sort, driver holds
    nothing; the per-stratum variant is one window over a
    stratum-hash shuffle.  Stable: a row's (bucket, key) rank never
    changes, so growing the corpus only ever displaces rows at the
    boundary."""
    h = hash_bucket(key_col, hash_col)
    if strata_col is None:
        return df.orderBy(h, key_col).limit(int(k))
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(h, key_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= int(k))
        .drop("__rn")
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    hash_col: Optional[Column] = None,
) -> DataFrame:
    """Per-stratum deterministic sampling — e.g. keep 100% of rare
    languages and 5% of English.  One narrow scan: the rate lookup is a
    CASE expression, membership is the same hash-bucket test."""
    b = hash_bucket(key_col, hash_col)
    rate = F.lit(default_rate)
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(r)).otherwise(rate)
    return df.where(b < (rate * _BUCKETS).cast("long"))


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    group_col: Optional[str] = None,
    hash_col: Optional[Column] = None,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis 2006):
    each row draws the key ``u^(1/w)`` from a deterministic per-row
    uniform ``u``; the ``k`` largest keys are an exact weighted sample
    without replacement (inclusion probability proportional to weight,
    no rejection loop, one pass).

    Deterministic and engine-portable like every sampler here: ``u``
    comes from the key's hash bucket (``xxhash64`` by default; pass
    ``hash_col=portable_lcg_bucket(...)`` for the DuckDB-twin
    arithmetic), so the same rows are drawn on every run and on every
    engine — identical-u collisions and equal weights tie-break by key.
    Rows with NULL or non-positive weight are excluded (never sampled).

    Scale shape: global sampling compiles to TakeOrderedAndProject
    (per-partition top-k + driver merge of k rows — no global sort);
    ``group_col`` switches to one row_number window per group.  Returns
    the sampled rows with original columns.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    u = (hash_bucket(key_col, hash_col) + F.lit(0.5)) / F.lit(
        float(_BUCKETS)
    )
    key = F.pow(u, F.lit(1.0) / F.col(weight_col))
    sampled = df.where(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("__esk", key)
    if group_col is None:
        out = sampled.orderBy(
            F.col("__esk").desc(), F.col(key_col)
        ).limit(k)
    else:
        from pyspark.sql import Window

        w = Window.partitionBy(group_col).orderBy(
            F.col("__esk").desc(), F.col(key_col)
        )
        out = sampled.withColumn(
            "__rn", F.row_number().over(w)
        ).where(F.col("__rn") <= k)
    return out.select(*df.columns)
