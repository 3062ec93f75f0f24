"""Training-mixture composition: assemble a pretraining data mix from
multiple curated sources at target token-budget shares.

The standard final step of a training-data pipeline (after cleaning,
dedup, decontamination): each source s gets ``target_tokens *
weight_s / Σweights`` tokens.  A source with more tokens than its share
is DOWN-SAMPLED; a source with fewer is REPEATED — whole epochs plus a
deterministically-sampled partial epoch (the "small high-quality
sources run multiple epochs" recipe).

Scale design:

- per-source token totals are ONE aggregate each (map-side combined,
  driver-sized result);
- membership in the partial epoch is the same deterministic hash-bucket
  test as :mod:`sampling` — per-row, no shuffle, reproducible across
  runs and stable under repartitioning;
- epoch replication is a narrow ``explode(sequence(...))`` — no shuffle,
  no driver loop;
- the result is a lazy union: nothing materializes until the caller
  writes it.

Determinism: the partial epoch reuses the doc's bucket regardless of
epoch number (the final epoch repeats a fixed prefix-subset of the
source).  All rates derive from the driver-collected token totals with
plain IEEE double arithmetic, so an external oracle recomputing the
same expressions reproduces membership exactly.

No reference counterpart: beyond-reference training-data operator
(brief mandate).
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import _BUCKETS, hash_bucket


def source_token_stats(
    sources: Mapping[str, DataFrame],
    text_col: str = "text",
    token_col: Optional[str] = None,
) -> dict:
    """Per-source ``{name: (n_docs, n_tokens)}`` — one aggregate per
    source, driver-sized."""
    out = {}
    for name, df in sources.items():
        if token_col is None:
            n_tokens = F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0)
            )
        else:
            n_tokens = F.col(token_col)
        row = df.agg(
            F.count(F.lit(1)).alias("d"),
            F.coalesce(F.sum(n_tokens.cast("long")), F.lit(0)).alias("t"),
        ).collect()[0]
        out[name] = (int(row["d"]), int(row["t"]))
    return out


def compose_mixture(
    sources: Mapping[str, DataFrame],
    weights: Mapping[str, float],
    target_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_col: Optional[str] = None,
    hash_col: Optional[Column] = None,
    source_col: str = "source",
    epoch_col: str = "epoch",
    stats: Optional[dict] = None,
) -> DataFrame:
    """The assembled mix: every source's rows with ``source`` and
    ``epoch`` columns, sized to ``target_tokens * weight / Σweights``
    tokens per source (approximately — membership is per-document).

    Epoch numbering: full passes are epochs ``0..k-1``; the partial
    pass (if any) is epoch ``k`` and keeps a document iff its hash
    bucket falls below the fractional rate.  ``hash_col`` overrides the
    bucket hash (e.g. ``sampling.portable_lcg_bucket`` for an
    engine-portable oracle twin); production default is xxhash64.

    Pass a dict as ``stats`` to receive the per-source plan:
    ``{name: {"epochs", "partial_rate", "share_tokens",
    "available_tokens"}}``.
    """
    missing = set(sources) - set(weights)
    if missing:
        raise ValueError(f"sources without a weight: {sorted(missing)}")
    total_w = float(sum(weights[name] for name in sources))
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    totals = source_token_stats(sources, text_col, token_col)

    parts = []
    for name, df in sources.items():
        n_docs, avail = totals[name]
        share = target_tokens * float(weights[name]) / total_w
        if avail == 0:
            if stats is not None:
                stats[name] = {
                    "epochs": 0, "partial_rate": 0.0,
                    "share_tokens": share, "available_tokens": 0,
                }
            continue
        epochs = int(share // avail)
        frac = share / avail - epochs
        if stats is not None:
            stats[name] = {
                "epochs": epochs, "partial_rate": frac,
                "share_tokens": share, "available_tokens": avail,
            }
        tagged = df.withColumn(source_col, F.lit(name))
        if epochs > 0:
            parts.append(
                tagged.withColumn(
                    epoch_col,
                    F.explode(
                        F.sequence(
                            F.lit(0).cast("int"),
                            F.lit(epochs - 1).cast("int"),
                        )
                    ),
                )
            )
        cutoff = int(frac * _BUCKETS)
        if cutoff > 0:
            parts.append(
                tagged.where(hash_bucket(id_col, hash_col) < cutoff)
                .withColumn(epoch_col, F.lit(epochs).cast("int"))
            )
    if not parts:
        raise ValueError("mixture is empty (no positive share)")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def mixture_report(
    mix: DataFrame,
    text_col: str = "text",
    token_col: Optional[str] = None,
    source_col: str = "source",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Audit of an assembled mix: docs + tokens per (source, epoch) —
    one map-side-combined aggregate."""
    if token_col is None:
        n_tokens = F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0)
        )
    else:
        n_tokens = F.col(token_col)
    return (
        mix.groupBy(source_col, epoch_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tokens.cast("long")).alias("n_tokens"),
        )
        .orderBy(source_col, epoch_col)
    )
