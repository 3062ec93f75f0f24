"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

All hot paths are built-in ``pyspark.sql.functions`` (JVM, codegen) —
regexes compile once per task, no Python per row.  Each operator returns a
column or a DataFrame transformation suitable for a 100 TB corpus scan
(narrow, no shuffle unless aggregating).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# tiny per-language stopword marker sets (heuristic language ID)
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "que"],
    "es": ["el", "la", "los", "las", "es", "una", "para", "como"],
    "it": ["il", "la", "che", "di", "non", "una", "per", "sono"],
}


def _marker_hits(text_col: str, words: list[str]) -> Column:
    """Count of marker-word occurrences (word-bounded, case-insensitive)."""
    pattern = r"(?i)\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0))


def language_scores(text_col: str = "text") -> list[Column]:
    return [
        _marker_hits(text_col, ws).alias(f"score_{lang}")
        for lang, ws in _LANG_MARKERS.items()
    ]


def detect_language(text_col: str = "text") -> Column:
    """argmax over marker-hit scores; ties and zero-hit -> 'unknown'.

    Deterministic: languages compared in fixed dict order, strict-greater
    wins, so the first language of a tie is selected.
    """
    scores = [
        (lang, _marker_hits(text_col, ws)) for lang, ws in _LANG_MARKERS.items()
    ]
    best_lang = F.lit("unknown")
    best_score = F.lit(0)
    for lang, s in scores:
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def token_count(text_col: str = "text") -> Column:
    """Whitespace token count (non-space runs)."""
    return F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0))


def bpe_ish_token_count(text_col: str = "text") -> Column:
    """BPE-ish token estimate: words + punctuation + number runs, the shape
    of a GPT-2-style pre-tokenizer."""
    return F.size(
        F.regexp_extract_all(
            F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
        )
    )


def quality_features(text_col: str = "text") -> dict[str, Column]:
    """Length / punctuation / stopword / digit ratios — the standard
    quality-filter feature set."""
    n_chars = F.length(text_col)
    toks = token_count(text_col)
    safe_chars = F.greatest(n_chars, F.lit(1))
    safe_toks = F.greatest(toks, F.lit(1))
    n_punct = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit("[.,;:!?'\"()-]"), 0)
    )
    n_digit = F.size(F.regexp_extract_all(F.col(text_col), F.lit("[0-9]"), 0))
    n_upper = F.size(F.regexp_extract_all(F.col(text_col), F.lit("[A-Z]"), 0))
    n_stop = _marker_hits(text_col, _LANG_MARKERS["en"])
    return {
        "n_chars": n_chars,
        "n_tokens": toks,
        "avg_token_len": (n_chars - toks + 1) / safe_toks,
        "punct_ratio": n_punct / safe_chars,
        "digit_ratio": n_digit / safe_chars,
        "upper_ratio": n_upper / safe_chars,
        "stopword_ratio": n_stop / safe_toks,
    }


def quality_score(text_col: str = "text") -> Column:
    """[0, 1] heuristic quality score: long-enough, punctuated, lowercase-ish,
    stopword-bearing text scores high."""
    f = quality_features(text_col)
    length_ok = F.least(f["n_tokens"] / F.lit(100.0), F.lit(1.0))
    stop_ok = F.least(f["stopword_ratio"] * 4.0, F.lit(1.0))
    punct_ok = F.when(f["punct_ratio"].between(0.005, 0.2), 1.0).otherwise(0.3)
    digit_ok = F.when(f["digit_ratio"] < 0.3, 1.0).otherwise(0.2)
    return (length_ok * 0.4 + stop_ok * 0.3 + punct_ok * 0.2 + digit_ok * 0.1)


def fingerprint(text_col: str = "text", ngram: int = 8) -> Column:
    """Rolling-hash document fingerprint: min of character-ngram hashes
    (a 1-hash MinHash — stable under small edits away from the minimum)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    grams = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.length(norm) - ngram + 1, F.lit(1))
        ),
        lambda i: norm.substr(i, F.lit(ngram)),
    )
    return F.array_min(F.transform(grams, lambda g: F.xxhash64(g)))


def remove_boilerplate(
    docs: DataFrame,
    text_col: str = "text",
    min_docs: int = 3,
    line_sep: str = "\n",
    id_col: str = "doc_id",
) -> DataFrame:
    """Boilerplate-line removal (the CCNet/common-crawl cleaning pass):
    a LINE that occurs in ``min_docs`` or more distinct documents is
    boilerplate (headers, footers, nav chrome) and is dropped from every
    document; remaining lines re-assemble in original order.

    Plan shape: explode to (doc, line-position, line-hash) → distinct-doc
    count per hash (map-side partial agg) → broadcast-or-shuffle join of
    the (small) boilerplate hash set back → re-aggregate with
    ``sort_array`` over (position, line) structs so reassembly is exact
    and deterministic.  Hashes (xxhash64) travel through the shuffle, not
    line text — at 100 TB the join key set is the distinct-line space,
    pruned to only hashes that crossed the threshold.

    Returns ONLY ``(id_col, text_col)`` — other columns do not survive
    the reassembly aggregate; join them back on ``id_col`` if needed
    (re-carrying them through the explode/groupBy would widen the
    shuffle for every caller that does not want them).
    ``line_sep`` is treated as a LITERAL separator for both split and
    rejoin (escaped before the regex-based split).
    """
    import re as _re

    lines = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), _re.escape(line_sep))
        ).alias("__pos", "__line"),
    ).withColumn("__h", F.xxhash64(F.col("__line")))
    boiler = (
        lines.groupBy("__h")
        .agg(F.count_distinct(F.col(id_col)).alias("__docs"))
        .where(F.col("__docs") >= min_docs)
        .select("__h")
    )
    kept = lines.join(boiler, on="__h", how="left_anti")
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(F.col("__pos"), F.col("__line"))
                        )
                    ),
                    lambda s: s["__line"],
                ),
                line_sep,
            ).alias(text_col)
        )
    )


def vocab_topk(
    docs: DataFrame, text_col: str = "text", k: int = 20
) -> DataFrame:
    """Corpus vocabulary: top-k whitespace tokens by frequency — the
    tokenizer-prep word count.  The canonical map-side-combine shape:
    partial counts per partition, ONE shuffle of (token, partial_n),
    deterministic tie-break by token so top-k is stable."""
    toks = F.explode(F.split(F.lower(F.col(text_col)), r"\s+"))
    return (
        docs.select(toks.alias("token"))
        .where(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(k)
    )


# PII patterns — deliberately restricted to syntax BOTH Java regex and
# RE2-family engines support (no lookaround, no backreferences), so the
# exact same pattern runs in Spark, DuckDB, Hyperscan-style scanners and
# the test oracle.  Order matters: longer/more-specific first so e.g. an
# email is not half-eaten by the phone pattern.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("credit_card", r"\b[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}\b"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("phone", r"\+[0-9]{1,3}[ -]?[0-9]{2,4}[ -]?[0-9]{3,4}[ -]?[0-9]{3,4}\b"),
]


def scrub_pii(text_col: str = "text") -> Column:
    """Replace PII spans with typed placeholders (``<EMAIL>``, ``<SSN>``,
    ...) — the standard pre-training redaction pass.  Pure chained
    ``regexp_replace``: JVM-side, codegen, one corpus scan, no shuffle."""
    out = F.col(text_col)
    for name, pattern in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, f"<{name.upper()}>")
    return out


def pii_counts(text_col: str = "text") -> dict[str, Column]:
    """Per-type PII match counts for one document (audit/reporting)."""
    return {
        name: F.size(F.regexp_extract_all(F.col(text_col), F.lit(p), 0))
        for name, p in PII_PATTERNS
    }


# URL pattern: same Java/RE2 common-subset discipline as PII_PATTERNS
# so the identical pattern runs in Spark and the DuckDB oracle.
URL_PATTERN = r"https?://[^\s/]+"


def url_domains(text_col: str = "text") -> Column:
    """Array of lowercased registrable-ish domains mentioned in the
    document (scheme and ``www.`` stripped, port kept off by the host
    charset) — the per-row half of domain-level corpus curation.  Pure
    JVM regex expressions, no shuffle."""
    urls = F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 0)
    return F.transform(
        urls,
        lambda u: F.regexp_replace(
            F.regexp_replace(F.lower(u), r"^https?://", ""),
            r"^www\.",
            "",
        ),
    )


def domain_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-wide domain histogram: ``(domain, n_docs, n_urls)`` —
    the audit behind URL-blocklist curation.  One explode + one
    map-side-combined aggregate; only (id, domain) pairs shuffle."""
    exploded = docs.select(
        F.col(id_col), F.explode(url_domains(text_col)).alias("domain")
    )
    return (
        exploded.groupBy("domain")
        .agg(
            F.count_distinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_urls"),
        )
        .orderBy("domain")
    )


def domain_filter(
    blocklist: "list[str]", text_col: str = "text"
) -> Column:
    """Join-free keep-mask: True when the document mentions NO
    blocklisted domain.  Literal-array intersection per row — zero
    shuffle, stateless, STREAMING-SAFE (same contract as
    ``decontam.contamination_filter``).  For blocklists too large to
    ship as a literal, anti-join ``domain_counts`` output instead."""
    blocked = F.lit([d.lower() for d in blocklist]).cast("array<string>")
    return (
        F.size(F.array_intersect(F.array_distinct(url_domains(text_col)), blocked))
        == 0
    )


def salient_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_len: int = 3,
    share_tf: bool = True,
) -> DataFrame:
    """Per-document top-``k`` terms by term frequency (ties: term
    lexicographic), each annotated with its corpus document frequency —
    integer-exact keyword extraction (the tf-idf SELECTION without the
    float idf: callers compute ``tf * ln(N/df)`` themselves; keeping
    floats out makes the result hash identically across engines).

    Scale shape: one (doc, term) aggregate with map-side combine, one
    terms-sized df aggregate joined back, one doc-partitioned window for
    the top-k — the same single-shuffle-per-stage profile as
    ``vocab_topk``, fanned per document.  Tokens shorter than
    ``min_len`` (articles, stray punctuation) are dropped before
    counting.

    Returns ``(id_col, term, tf, df, rank)`` with ``rank`` 1-based.

    LOOP callers (per-batch invocation) should pass ``share_tf=False``:
    the default's eager result is ``localCheckpoint``-ed, whose storage
    blocks are only reclaimed on driver GC — same caveat as
    ``containment_pairs``/``minhash_lsh_candidates``.
    """
    toks = F.split(
        F.trim(F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))), " "
    )
    tf = (
        docs.select(F.col(id_col), F.explode(toks).alias("term"))
        .where(F.length("term") >= min_len)
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # size-aware hint (VERDICT r11 #2): dfreq is VOCABULARY-sized (AQE
    # would broadcast it — a driver build that grows with the corpus)
    # and already partitioned on term from its groupBy, so shuffle_hash
    # is exchange-free — but the hash build cannot spill, so past the
    # per-partition budget the strategy flips to spillable merge.  The
    # default persists tf (it feeds BOTH the dfreq aggregate and the
    # join's probe side — one tokenize pass instead of two), sizes the
    # strategy from the exact cached count (vocab rows <= tf rows),
    # materializes the k-per-doc result eagerly, and releases the cache
    # — the containment_pairs pattern.  ``share_tf=False`` keeps the
    # plan fully lazy with the in-budget pin, and a SMALL corpus (by
    # Catalyst's zero-job stats estimate) skips the machinery outright:
    # its vocabulary fits the hash budget by construction, and the
    # sizing jobs were measured to dominate the sf0.1 call.
    from .dedup import corpus_is_small, gram_join_strategy

    if share_tf and not corpus_is_small(docs):
        tf = tf.persist()
        big = gram_join_strategy(tf.count(), docs.sparkSession)
    else:
        share_tf = False
        big = "shuffle_hash"
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("term")
    )
    out = (
        tf.join(dfreq.hint(big), on="term")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "rank")
    )
    if share_tf:
        out = out.localCheckpoint(eager=True)
        tf.unpersist()
    return out


def clip_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str = "source",
    lower_q: float = 0.01,
    upper_q: float = 0.99,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Winsorize ``value_col`` per group: values below the group's
    ``lower_q`` quantile (or above ``upper_q``) are clamped to it — the
    standard feature-cleaning step before length/score-based curation
    (one corrupt 100 MB "document" should not dominate a mean).

    ``exact=True`` uses Spark's sort-based ``percentile`` (bit-identical
    to DuckDB ``quantile_cont``, proven by the ``sql_acctbal_quantiles``
    oracle) — one groupBy aggregate producing a GROUPS-sized frame,
    broadcast back; no window, no per-row sort.  ``exact=False`` swaps
    in ``approx_percentile`` (Greenwald-Khanna sketch, constant memory —
    the 100 TB path) with rank error ~n/accuracy.

    Adds ``{value_col}_clipped``; all other columns pass through.
    """
    if not 0.0 <= lower_q < upper_q <= 1.0:
        raise ValueError("need 0 <= lower_q < upper_q <= 1")
    fn = F.percentile if exact else (
        lambda c, q: F.percentile_approx(c, q, accuracy)
    )
    bounds = df.groupBy(group_col).agg(
        fn(F.col(value_col), F.lit(lower_q)).alias("__lo"),
        fn(F.col(value_col), F.lit(upper_q)).alias("__hi"),
    )
    return (
        df.join(F.broadcast(bounds), on=group_col)
        .withColumn(
            f"{value_col}_clipped",
            F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")),
        )
        .drop("__lo", "__hi")
    )


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split each document into fixed-size overlapping token windows —
    the standard pre-training / RAG chunking step.  Chunk ``i`` covers
    whitespace tokens ``[i*stride, i*stride + chunk_tokens)`` with
    ``stride = chunk_tokens - overlap``; the chunk count is the minimum
    that covers every token (last chunk may be short; a doc shorter than
    one chunk yields exactly one).

    Pure JVM (split + sequence/explode + slice) — zero Python, zero
    shuffle; rows fan out by ~n_tokens/stride.  Deterministic, so the
    oracle twin replicates it structurally in SQL.  Returns
    ``(id_col, chunk_id, chunk_text, n_chunk_tokens)``.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(
        F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")), " "
    )
    n = F.size(toks)
    n_chunks = (
        F.ceil(F.greatest(n - chunk_tokens, F.lit(0)) / F.lit(stride)) + 1
    )
    chunk = F.slice(
        F.col("__toks"), F.col("chunk_id") * stride + 1, chunk_tokens
    )
    return (
        docs.select(
            F.col(id_col), toks.alias("__toks"), n_chunks.alias("__nc")
        )
        .withColumn(
            "chunk_id",
            F.explode(F.sequence(F.lit(0), (F.col("__nc") - 1).cast("int"))),
        )
        .select(
            id_col,
            "chunk_id",
            F.concat_ws(" ", chunk).alias("chunk_text"),
            F.size(chunk).alias("n_chunk_tokens"),
        )
    )


def rare_gram_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    max_df: int = 2,
    hash_keys: bool = False,
    share_posts: bool = True,
) -> DataFrame:
    """Per-document NOVELTY signal: of the doc's distinct word
    ``ngram``-grams, how many are corpus-rare (document frequency <=
    ``max_df``)?  Templated / boilerplate / model-generated text reuses
    grams the corpus already has (low rare fraction); genuinely novel
    prose coins grams nobody else uses.  The integer pair
    ``(n_rare, n_grams)`` hashes identically across engines — ratio and
    threshold are the caller's.

    Scale shape: one position explode with a whole-stage-codegen gram
    projection, one distinct groupBy to per-doc-distinct postings, one
    map-side combinable df aggregate over gram keys, one join of
    postings back to the df frame, one per-doc aggregate.
    ``hash_keys=True`` replaces
    each gram with its ``xxhash64`` fingerprint BEFORE the shuffle, so
    the df aggregate and the postings join move fixed 8-byte longs
    instead of arbitrary-length strings — the 100 TB path, mirroring
    ``containment_pairs(hash_keys=True)``.  Counts are identical up to
    64-bit hash collisions (a collision can only merge two grams'
    df counts — vanishing at any df threshold that matters); keep
    string keys when the oracle must reproduce the grouping exactly.

    The df frame is joined back with a SIZE-AWARE hint
    (``dedup.gram_join_strategy``): it is the GRAM UNIVERSE (arbitrarily
    large — AQE would otherwise try to broadcast it, a driver-side build
    that grows with the corpus and OOMs long before 100 TB; measured at
    10x local data AQE picks broadcast and pays a multi-second driver
    build).  It comes out of its own groupBy already hash-partitioned on
    ``g``, so a ``shuffle_hash`` hint costs zero extra exchanges and
    skips the sort-merge sort — but the hash build cannot spill, so past
    the per-partition row budget (the r11 sf10 probe's OOM regime —
    see ``dedup.SHUFFLE_HASH_BUILD_ROWS_PER_PARTITION``) the hint
    flips to spillable ``merge``.

    ``share_posts=True`` (default) persists the exploded postings so
    the shingle explode runs ONCE instead of twice (df aggregate +
    probe side); the per-doc result — orders of magnitude smaller — is
    materialized eagerly (``localCheckpoint``) and the postings cache
    released before returning, mirroring ``dedup.near_duplicates``.
    Measured 4.6s -> 3.2s at 10x local data.  Pass ``share_posts=
    False`` for a fully lazy plan (postings computed twice).

    Returns ``(id_col, n_grams, n_rare)``; docs whose text produces zero
    grams still appear (0, 0).
    """
    from .dedup import corpus_is_small, gram_join_strategy, shingle_posts

    # r13: the small-corpus gate (same zero-job Catalyst-stats check as
    # the salient-terms/chunk-frequency sites, r12) routes tiny corpora
    # onto the fully lazy single-job plan — under
    # SMALL_CORPUS_STATS_BYTES the posting build fits the non-spillable
    # hash budget by construction, so the persist+count sizing job and
    # the checkpoint barrier are pure per-call overhead there (measured
    # sf0.1: 5.6s -> 1.8s string keys, 1.5s -> 1.2s hashed, identical
    # rows).  At scale the shared/sized path runs unchanged.
    if share_posts and corpus_is_small(docs):
        share_posts = False
    # posting build: position explode + codegen gram projection + one
    # distinct groupBy — 2x faster than exploding the HOF-built shingle
    # array even counting the shuffle; see dedup.shingle_posts
    posts = shingle_posts(docs, text_col, id_col, ngram, hash_keys=hash_keys)
    if share_posts:
        posts = posts.persist()
        # size-aware hint (r11, sf10 probe): shuffle_hash's build side
        # cannot spill — past the per-partition row budget flip to
        # spillable sort-merge; the count doubles as the materialization
        big = gram_join_strategy(posts.count(), docs.sparkSession)
    else:
        big = "shuffle_hash"  # lazy path — see containment_pairs note
    dfreq = posts.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        posts.join(dfreq.hint(big), on="g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                (F.col("df") <= max_df).cast("long")
            ).alias("n_rare"),
        )
    )
    out = (
        docs.select(id_col)
        .join(per_doc, on=id_col, how="left")
        .na.fill({"n_grams": 0, "n_rare": 0})
    )
    if share_posts:
        out = out.localCheckpoint(eager=True)
        posts.unpersist()
    return out


def quantile_filter(
    docs: DataFrame,
    score,
    group_col: str = "source",
    keep_frac: float = 0.5,
    exact: bool = True,
    tiebreak: str = "doc_id",
    accuracy: int = 10_000,
) -> DataFrame:
    """Keep the top ``keep_frac`` of each group by ``score`` (a Column
    or column name) — the per-source quality-cutoff step of corpus
    curation ("drop the worst half of each domain").

    ``exact=True``: ``row_number`` over (score DESC, tiebreak) per
    group, keep ``rn <= ceil(keep_frac * group_size)``.  Integer-exact
    and engine-portable (the oracle twin runs the identical window), but
    sorts each group — fine up to the tens-of-millions-per-group range.

    ``exact=False`` (the 100 TB path): per-group thresholds via
    ``approx_percentile(score, 1-keep_frac, accuracy)`` — one map-side
    combinable aggregate producing a GROUPS-sized frame, broadcast back,
    ``score >= threshold`` filter.  No sort, no window; kept fraction is
    within the sketch's rank error (~1/accuracy) of ``keep_frac``,
    tolerance-tested against the exact path.

    Returns the surviving rows with all original columns.
    """
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError("keep_frac must be in (0, 1]")
    score_col = F.col(score) if isinstance(score, str) else score
    scored = docs.withColumn("__score", score_col)
    if exact:
        w = Window.partitionBy(group_col).orderBy(
            F.col("__score").desc(), F.col(tiebreak)
        )
        wn = Window.partitionBy(group_col)
        out = (
            scored.withColumn("__rn", F.row_number().over(w))
            .withColumn("__n", F.count(F.lit(1)).over(wn))
            .where(
                F.col("__rn")
                <= F.ceil(F.col("__n") * F.lit(float(keep_frac)))
            )
        )
    else:
        thresholds = scored.groupBy(group_col).agg(
            F.percentile_approx(
                "__score", 1.0 - keep_frac, accuracy
            ).alias("__thr")
        )
        out = scored.join(F.broadcast(thresholds), on=group_col).where(
            F.col("__score") >= F.col("__thr")
        )
    return out.select(*docs.columns)


def repetition_features(
    text_col: str = "text", line_sep: str = "\n", ngram: int = 2
) -> dict[str, Column]:
    """Within-document repetition signals (the Gopher §A1.1 quality
    rules): duplicate-line counts and the most-frequent word-``ngram``
    count.  All INTEGER outputs — callers derive fractions/filters, and
    integer results hash identically across engines in differential
    oracles.

    Scale design: every signal is a higher-order-function expression
    over per-row arrays — NARROW, zero shuffle, whole-stage codegen; a
    100 TB corpus scan computes them in the same stage as the read.
    ``top_ngram_count`` is O(distinct x total) per document, fine for
    typical web documents (<=10k tokens); for extreme outliers cap the
    token array with ``slice`` upstream.

    Returned columns: ``n_lines``, ``n_distinct_lines``, ``n_ngrams``,
    ``top_ngram_count``.
    """
    import re as _re

    from .decontam import word_ngrams

    col = F.col(text_col)
    lines = F.split(col, _re.escape(line_sep))
    grams = word_ngrams(text_col, ngram)
    top = F.when(
        F.size(grams) > 0,
        F.array_max(
            F.transform(
                F.array_distinct(grams),
                lambda d: F.size(F.filter(grams, lambda x: x == d)),
            )
        ),
    ).otherwise(F.lit(0))
    return {
        "n_lines": F.size(lines),
        "n_distinct_lines": F.size(F.array_distinct(lines)),
        "n_ngrams": F.size(grams),
        "top_ngram_count": top,
    }


def repetition_filter(
    text_col: str = "text",
    line_sep: str = "\n",
    ngram: int = 2,
    max_dup_line_frac: float = 0.30,
    max_top_ngram_frac: float = 0.20,
) -> Column:
    """Boolean keep-mask from the repetition signals (Gopher defaults:
    drop documents whose duplicate-line fraction exceeds 30% or whose
    most common 2-gram covers more than 20% of 2-gram slots)."""
    f = repetition_features(text_col, line_sep, ngram)
    dup_line_frac = (
        (f["n_lines"] - f["n_distinct_lines"])
        / F.greatest(f["n_lines"], F.lit(1))
    ).cast("double")
    top_frac = (
        f["top_ngram_count"] / F.greatest(f["n_ngrams"], F.lit(1))
    ).cast("double")
    return (dup_line_frac <= max_dup_line_frac) & (
        top_frac <= max_top_ngram_frac
    )


def profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach language, quality and token features to a corpus."""
    cols = quality_features(text_col)
    out = docs
    for name, c in cols.items():
        out = out.withColumn(name, c)
    return (
        out.withColumn("detected_lang", detect_language(text_col))
        .withColumn("quality", quality_score(text_col))
        .withColumn("fingerprint", fingerprint(text_col))
    )


def boilerplate_chunk_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 8,
    min_count: int = 2,
    share_chunks: bool = True,
) -> DataFrame:
    """Per-document CHUNK-level duplication profile — the token-window
    twin of :func:`remove_boilerplate` (CCNet-style repeated-passage
    detection).  Line-level boilerplate removal needs line structure;
    web/OCR corpora often have none, and a template passage pasted
    mid-paragraph never aligns to a line.  Here each doc splits into
    NON-overlapping ``chunk_tokens`` windows (:func:`chunk_documents`
    with ``overlap=0`` — alignment makes cross-doc repeats exact-match
    detectable) and a window occurring ``min_count``+ times corpus-wide
    (across OR within docs) counts as boilerplate.

    Returns ``(id_col, n_chunks, boiler_chunks, boiler_tokens)``.
    LOOP callers should pass ``share_chunks=False`` (the default's eager
    result is ``localCheckpoint``-ed — blocks reclaim on driver GC).

    100 TB shape: the chunk explode fans out ~n_tokens/chunk_tokens rows
    but only ``(doc, hash, n_tokens)`` leaves the map side — chunk TEXT
    is hashed (xxhash64, 8 bytes) before any shuffle, like every
    ``hash_keys`` path in this package.  One groupBy builds the
    frequency table, one shuffle-hash join annotates (both sides already
    partitioned by the hash), one final groupBy lands on ``id_col`` —
    all counts, map-side combinable, no text ever shuffles.
    """
    ch = chunk_documents(
        docs, text_col, id_col, chunk_tokens=chunk_tokens, overlap=0
    ).select(
        id_col,
        F.xxhash64("chunk_text").alias("__h"),
        F.col("n_chunk_tokens"),
    )
    # size-aware hint (VERDICT r11 #2): the chunk-frequency table grows
    # ~linearly with the corpus (distinct chunk hashes), so the
    # non-spillable hash build flips to merge past the per-partition
    # budget.  The default persists the NARROW hashed chunk frame (3
    # small columns — it feeds both the frequency aggregate and the
    # join's probe side, so the chunk explode runs once instead of
    # twice), sizes from the exact cached count (freq rows <= chunk
    # rows), materializes the docs-sized result eagerly, and releases
    # the cache — the containment_pairs pattern.  ``share_chunks=False``
    # keeps the plan lazy with the in-budget pin; a SMALL corpus (by
    # Catalyst's zero-job stats estimate) skips the machinery outright —
    # its chunk-frequency build fits the hash budget by construction.
    from .dedup import corpus_is_small, gram_join_strategy

    if share_chunks and not corpus_is_small(docs):
        ch = ch.persist()
        big = gram_join_strategy(ch.count(), docs.sparkSession)
    else:
        share_chunks = False
        big = "shuffle_hash"
    freq = ch.groupBy("__h").agg(F.count(F.lit(1)).alias("__cnt"))
    boiler = F.col("__cnt") >= min_count
    out = (
        ch.join(freq.hint(big), on="__h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum(boiler.cast("long")).alias("boiler_chunks"),
            F.sum(
                F.when(boiler, F.col("n_chunk_tokens")).otherwise(0)
            ).cast("long").alias("boiler_tokens"),
        )
    )
    if share_chunks:
        out = out.localCheckpoint(eager=True)
        ch.unpersist()
    return out


def scrub_boilerplate_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 8,
    min_count: int = 2,
    join_strategy: "str | None" = None,
) -> DataFrame:
    """Rebuild each document WITHOUT its boilerplate chunks (the
    actionable form of :func:`boilerplate_chunk_stats`): kept windows
    re-concatenate in chunk order.  ``overlap=0`` makes reconstruction
    exact up to the whitespace normalization chunking applies.  Returns
    ``(id_col, text_col)`` — docs whose every chunk was boilerplate keep
    a row with empty text (dropping them is the caller's policy call).

    The rebuild ships chunk TEXT through one groupBy on ``id_col`` —
    bounded by document size, the same order of bytes the corpus scan
    already moves.
    """
    ch = chunk_documents(
        docs, text_col, id_col, chunk_tokens=chunk_tokens, overlap=0
    )
    freq = (
        ch.select(F.xxhash64("chunk_text").alias("__h"))
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    # size-aware hint (VERDICT r11 #2): the frequency build grows
    # ~linearly with the corpus.  The result here is corpus-sized TEXT
    # (no cheap eager materialization like the stats twin), so sizing
    # costs one extra NARROW aggregate job (the freq plan prunes to
    # hashes — the text column never shuffles); pass ``join_strategy``
    # ("shuffle_hash" or "merge") to skip that job when the scale is
    # known.
    if join_strategy is None:
        from .dedup import corpus_is_small, gram_join_strategy

        if corpus_is_small(docs):
            # a small corpus's chunk-frequency build fits the hash
            # budget by construction — skip the sizing job
            join_strategy = "shuffle_hash"
        else:
            join_strategy = gram_join_strategy(
                freq.count(), docs.sparkSession
            )
    kept = ch.join(
        freq.hint(join_strategy),
        F.xxhash64(ch["chunk_text"]) == freq["__h"],
    ).where(F.col("__cnt") < min_count)
    return (
        kept.groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("chunk_id"), F.col("chunk_text")
                            )
                        )
                    ),
                    lambda s: s["chunk_text"],
                ),
            ).alias(text_col)
        )
        .unionByName(
            # all-boilerplate docs keep an empty-text row
            docs.select(id_col)
            .join(kept.select(id_col).distinct(), on=id_col, how="left_anti")
            .select(id_col, F.lit("").alias(text_col))
        )
    )
