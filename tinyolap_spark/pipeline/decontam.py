"""Benchmark decontamination: flag/drop training documents that contain
n-grams from an evaluation benchmark.

The standard pre-training hygiene pass (GPT-3 App. C / Gopher §A.5
style): tokenize both corpus and benchmark, build word ``n``-grams, and
mark any document sharing at least ``threshold`` distinct n-grams with
the benchmark as contaminated.

Scale design (100 TB corpus, benchmark ~10⁴–10⁶ grams):

- the corpus side stays NARROW — tokenize is a JVM split/filter, gram
  START POSITIONS are exploded, and each gram string is built by a
  per-row whole-stage-codegen projection (see :func:`_exploded_grams`),
  all in the same stage; no pre-shuffle, no distinct before the join;
- the benchmark gram set is tiny by comparison → ``broadcast()`` by
  default, so the only shuffle in the whole plan is the final
  ``groupBy(doc_id)`` over MATCHING rows (usually ≪ corpus size), with
  map-side partial aggregation;
- the join key is ``xxhash64(gram)`` (8 bytes instead of ~50-byte gram
  strings); an exact string-equality post-filter removes hash-collision
  false positives, so results are exact — the hash is purely a
  join-key compression (same verify-after-hash pattern as
  ``dedup.minhash_near_duplicates`` and ``text.fingerprint``).

No reference-counterpart: this is a beyond-reference training-data
operator (brief mandate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text_col) -> Column:
    """Lowercased whitespace tokens of ``text_col`` (empties dropped)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(
        F.split(F.lower(col), r"\s+"), lambda x: F.length(x) > 0
    )


def _grams_from_tokens(toks_col, n: int) -> Column:
    """n-grams over an ALREADY-MATERIALIZED token-array column.

    The split between this and :func:`_tokens` matters for throughput:
    inlining the tokenizer into the gram ``transform`` makes codegen
    re-evaluate split+filter for every reference (the lambda body, the
    ``sequence`` bound, and the ``when`` guard each carry their own
    copy — measured 1.7x slower on the sf1 gram scan).  Projecting the
    token array first makes it a single local in the generated code.
    """
    toks = F.col(toks_col) if isinstance(toks_col, str) else toks_col
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def word_ngrams(text_col, n: int) -> Column:
    """Array of space-joined lowercase word ``n``-grams.

    Pure higher-order functions — evaluates inside whole-stage codegen,
    no Python, no shuffle.  Documents shorter than ``n`` tokens yield an
    empty array (``sequence`` would count DOWN for a negative range, so
    the short case is guarded explicitly).

    Single-expression form for per-row use (:func:`contamination_filter`
    streams on it).  The corpus gram SCAN in :func:`_gram_hits` instead
    projects :func:`_tokens` first and builds grams with
    :func:`_grams_from_tokens` — see there for why.
    """
    return _grams_from_tokens(_tokens(text_col), n)


def _exploded_grams(frame: DataFrame, n: int, *keep: str) -> DataFrame:
    """``(*keep, gram)`` — one row per n-gram POSITION (duplicates kept).

    Explodes gram START POSITIONS first and builds each gram string as a
    plain per-row ``array_join(slice(...))`` projection.  The obvious
    alternative — building the whole gram array with ``transform`` and
    exploding it — evaluates the gram constructor inside an interpreted
    higher-order-function lambda, OUTSIDE whole-stage codegen; moving it
    to a row expression after the position explode keeps it codegen'd
    (measured 0.86s -> 0.52s on the sf1 corpus gram scan, same output).

    ``frame`` must already carry a ``__toks`` token-array column
    (project :func:`_tokens` first — see :func:`_grams_from_tokens` for
    why the token array must be materialized before gram references).
    """
    positions = F.when(
        F.size("__toks") >= n,
        F.sequence(F.lit(1), F.size("__toks") - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    return frame.select(
        *keep, F.col("__toks"), F.explode(positions).alias("__i")
    ).select(
        *keep,
        F.array_join(F.slice("__toks", F.col("__i"), n), " ").alias("gram"),
    )


def benchmark_grams(
    benchmark: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """Distinct benchmark n-grams with their join hash:
    ``(gram, __h)``.  Distinct on the (small) benchmark side only."""
    toks = benchmark.select(_tokens(text_col).alias("__toks"))
    return (
        _exploded_grams(toks, n)
        .distinct()
        .withColumn("__h", F.xxhash64("gram"))
    )


def _gram_hits(
    docs: DataFrame,
    benchmark: "DataFrame | None",
    n: int,
    text_col: str,
    bench_text_col: str | None,
    id_col: str,
    broadcast: bool,
    grams_df: "DataFrame | None" = None,
) -> DataFrame:
    """``(id_col, n_contaminated)`` for documents with >=1 benchmark-gram
    match — ONE corpus gram scan, broadcast join, one tiny shuffle of
    matching rows only.  ``grams_df`` (a persisted
    :func:`benchmark_grams` result) skips rebuilding the benchmark side
    — the per-batch ingestion path builds it once and reuses it."""
    from .dedup import _spread

    if grams_df is not None:
        bg = grams_df.withColumnRenamed("gram", "__bgram")
    else:
        bench_text_col = bench_text_col or text_col
        bg = benchmark_grams(
            benchmark, bench_text_col, n
        ).withColumnRenamed("gram", "__bgram")
    if broadcast:
        bg = F.broadcast(bg)
    # CPU-bound gram expressions must actually parallelize: a small local
    # parquet arrives as one split; _spread repartitions ONLY then (no-op
    # at real scale where input splits >= cores)
    # token array projected FIRST so codegen evaluates split+filter once
    # per document, not once per gram reference (1.7x on the sf1 scan);
    # grams then built per POSITION row, inside codegen (_exploded_grams)
    doc_toks = _spread(docs).select(
        F.col(id_col), _tokens(text_col).alias("__toks")
    )
    doc_grams = _exploded_grams(doc_toks, n, id_col).withColumn(
        "__h", F.xxhash64("gram")
    )
    return (
        doc_grams.join(bg, on="__h")
        # exact-equality verify: xxhash64 collisions cannot create a
        # false positive; the hash is only join-key compression
        .where(F.col("gram") == F.col("__bgram"))
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("n_contaminated"))
    )


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    bench_text_col: str | None = None,
    id_col: str = "doc_id",
    threshold: int = 1,
    broadcast: bool = True,
    broadcast_hits: "bool | None" = None,
) -> DataFrame:
    """Per-document contamination report:
    ``(id_col, n_contaminated, contaminated)``.

    ``n_contaminated`` = number of DISTINCT document n-grams that appear
    anywhere in the benchmark; ``contaminated`` = that count >=
    ``threshold``.  Every input document appears in the output (zero
    counts included) so the result can drive either a filter
    (``decontaminate``) or an audit report.

    ``broadcast=False`` falls back to a shuffle hash join for benchmark
    gram sets too large to broadcast (both sides are hash-partitioned
    on the 8-byte ``__h``).

    ``broadcast_hits`` controls the ZERO-FILL join separately (ADVICE
    r5): the hit set is usually sparse, but it is bounded only by how
    many documents match — a benchmark containing one ubiquitous n-gram
    makes it corpus-sized, and a forced broadcast would then OOM the
    driver.  Default ``None`` emits no hint and lets AQE pick broadcast
    from RUNTIME size, degrading to a shuffle join for pathological
    benchmarks; ``True`` forces the hint when the caller knows the hit
    set is small.
    """
    hits = _gram_hits(
        docs, benchmark, n, text_col, bench_text_col, id_col, broadcast
    )
    if broadcast_hits:
        hits = F.broadcast(hits)
    return (
        docs.select(id_col)
        .join(hits, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            (F.coalesce("n_contaminated", F.lit(0)) >= threshold).alias(
                "contaminated"
            ),
        )
    )


def collect_benchmark_grams(
    benchmark: DataFrame, text_col: str = "text", n: int = 8
) -> list:
    """Driver-side list of distinct benchmark n-grams — for the
    join-free :func:`contamination_filter`.  Benchmarks are eval sets:
    driver-small by definition (guard anyway: fail loudly past 200k
    grams rather than silently building an enormous literal)."""
    rows = benchmark_grams(benchmark, text_col, n).select("gram").collect()
    if len(rows) > 200_000:
        raise ValueError(
            f"benchmark gram set too large for the literal-array filter "
            f"({len(rows)} grams) — use contamination()/decontaminate() "
            f"(broadcast join) instead"
        )
    return sorted(r.gram for r in rows)


def contamination_filter(
    bench_grams: "list[str]",
    n: int = 8,
    text_col: str = "text",
    threshold: int = 1,
) -> Column:
    """Join-free keep-mask: True when the document shares fewer than
    ``threshold`` distinct n-grams with the benchmark gram list.

    Pure per-row expression (``array_intersect`` against a literal
    array): zero shuffle, zero joins, exact string matching — and
    therefore STREAMING-SAFE (stateless): the same column filters a
    ``readStream`` corpus identically to batch.  Right for the common
    case of a driver-small benchmark; use :func:`decontaminate` when
    the gram set is too large to ship as a literal."""
    grams = word_ngrams(text_col, n)
    overlap = F.size(
        F.array_intersect(
            F.array_distinct(grams),
            F.lit([str(g) for g in bench_grams]).cast("array<string>"),
        )
    )
    return overlap < threshold


def decontaminate(
    docs: DataFrame,
    benchmark: "DataFrame | None",
    n: int = 8,
    text_col: str = "text",
    bench_text_col: str | None = None,
    id_col: str = "doc_id",
    threshold: int = 1,
    broadcast: bool = True,
    broadcast_hits: "bool | None" = None,
    grams_df: "DataFrame | None" = None,
) -> DataFrame:
    """Drop contaminated documents; all original columns survive.

    Anti-join against the contaminated id set (small: only documents
    that actually matched, no zero-count fill), so beyond the gram scan
    the corpus passes through exactly once.  ``broadcast_hits`` as in
    :func:`contamination`: default lets AQE size the anti-join at
    runtime instead of forcing a broadcast of a set that a pathological
    benchmark can make corpus-sized.  ``grams_df`` (a persisted
    :func:`benchmark_grams` result) skips rebuilding the benchmark
    side; ``benchmark`` may then be ``None``."""
    bad = _gram_hits(
        docs, benchmark, n, text_col, bench_text_col, id_col, broadcast,
        grams_df=grams_df,
    ).where(F.col("n_contaminated") >= threshold)
    bad_ids = bad.select(id_col)
    return docs.join(
        F.broadcast(bad_ids) if broadcast_hits else bad_ids,
        on=id_col,
        how="left_anti",
    )
