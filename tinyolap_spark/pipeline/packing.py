"""Sequence packing: bin documents into fixed token-budget packs — the
standard pretraining batch-prep step (concatenate documents up to a
context-length budget per training sequence).

Exact greedy packing is inherently sequential; the distributed
formulation is the standard two-level approximation:

1. **group** — documents hash into ``num_groups`` independent streams
   (deterministic: ``pmod(xxhash64(doc_id), num_groups)`` — a real
   hash, so ids of ANY type work and sequential ids correlated with
   document length cannot imbalance groups), so no global order exists
   and no global sort is needed;
2. **pack within group** — one window per group (running token sum in a
   deterministic order) assigns ``pack_id = floor((cumsum - n) /
   budget)``; a pack may overshoot the budget by at most one document
   (the straddling document stays in its pack — the usual "pack then
   truncate/pad downstream" contract).

Scale: the only wide operation is the per-group window — state is one
running sum per group, groups are hash-balanced, and ``num_groups``
scales with the cluster (default: Spark's shuffle partitioning).  No
collect, no global sort, no Python.

All outputs are integers and the order within groups is deterministic
(``doc_id``), so a SQL twin reproduces packing decisions bit-for-bit —
see ``docs_pack_sequences`` in ``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_documents(
    docs: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_groups: int = 32,
    token_col: str | None = None,
    group_expr: "Column | None" = None,
) -> DataFrame:
    """Assign every document to ``(group, pack_id)`` with per-pack token
    sums bounded by ``budget`` (+ one straddling document).

    ``token_col``: use an existing token-count column instead of the
    default whitespace count (e.g. a real tokenizer's counts).

    ``group_expr``: override the group key (any integer Column in
    ``[0, num_groups)``).  The default ``pmod(xxhash64(id), num_groups)``
    works for ids of any type (ADVICE r5: a ``% num_groups`` stride
    fails on string ids and lets id/length correlation imbalance
    groups); the DuckDB oracle twin passes a portable-LCG override
    because ``xxhash64`` has no cross-engine twin.

    Returns the input columns plus ``n_tokens``, ``group``, ``pack_id``
    and ``tokens_before`` (the running sum before this document within
    its pack-stream — downstream writers use it for offsets).
    """
    if token_col is None:
        n_tokens = F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0)
        )
    else:
        n_tokens = F.col(token_col).cast("int")
    if group_expr is None:
        group_expr = F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_groups))
    out = docs.withColumn("n_tokens", n_tokens).withColumn(
        "group", group_expr.cast("int")
    )
    w = (
        Window.partitionBy("group")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return (
        out.withColumn("__cum", cum)
        .withColumn(
            "pack_id",
            F.floor(
                (F.col("__cum") - F.col("n_tokens")) / F.lit(int(budget))
            ).cast("int"),
        )
        .withColumn(
            "tokens_before",
            (F.col("__cum") - F.col("n_tokens"))
            - F.col("pack_id") * F.lit(int(budget)),
        )
        .drop("__cum")
    )


def pack_payloads(
    packed: DataFrame,
    sep: str = "<|eos|>",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assemble each pack's training sequence: documents concatenated in
    deterministic ``id_col`` order with ``sep`` between them — the
    writer step after :func:`pack_documents`.

    One shuffle on ``(group, pack_id)``; per-group state is one pack's
    documents (bounded by ``budget`` tokens + one straddling document by
    construction, NOT by the corpus), so the collect_list here is safe
    at any corpus size.  Ordering inside the pack comes from
    ``array_sort`` over (id, text) structs — shuffle-order independent.

    Returns ``(group, pack_id, n_docs, pack_tokens, payload)``.
    """
    doc_structs = F.collect_list(
        F.struct(F.col(id_col).alias("i"), F.col(text_col).alias("t"))
    )
    payload = F.array_join(
        F.transform(F.array_sort(doc_structs), lambda x: x["t"]), sep
    )
    return (
        packed.groupBy("group", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            payload.alias("payload"),
        )
        .orderBy("group", "pack_id")
    )


def pack_summary(packed: DataFrame) -> DataFrame:
    """Per-pack audit: document count and token sum (one shuffle with
    map-side combine) — the fill-rate report for a packing run."""
    return (
        packed.groupBy("group", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
        )
        .orderBy("group", "pack_id")
    )
