"""Corpus-level statistics: duplicated-span detection, corpus-derived
unigram language-model scoring, and URL/domain aggregation.

These differ from ``operators/text.py`` (pure per-row features) in
that each needs a *corpus pass* to build shared state — the span
frequency table, the unigram vocabulary, the domain roll-up — and a
second pass (or join) to apply it. All are expressed with built-in
``pyspark.sql.functions`` only: the hot path stays inside
WholeStageCodegen and every shuffle carries fixed-width hashes/ids,
never document text.

Scale notes (100 TB):
- ``span_dedup_stats``: the exploded span table is reduced FIRST by
  ``groupBy(doc_id, span)`` (map-side partial combine absorbs
  within-document repeats), then ``localCheckpoint``-ed so the
  frequency branch and the join-back branch do not re-scan and
  re-shingle the corpus text twice (the repo convention for reused
  mid-plans, cf. ``operators/linking.py``). Hot spans (boilerplate)
  skew the span-keyed join; AQE skew-join splits them.
- ``unigram_logprob``: two corpus passes are inherent (pass 1 builds
  the model, pass 2 scores). The vocabulary is capped at ``vocab_size``
  via ``orderBy().limit()`` — TakeOrderedAndProject, distributed, no
  single-partition window — and broadcast to the scoring join, so the
  scoring pass is shuffle-free up to the final per-document aggregate.
- ``domain_stats``: one hash aggregate keyed by host (bounded keyspace,
  heavy map-side combine); no text is shuffled, only (host, counters).

Determinism: xxhash64 span keys (the oracle keys on raw gram text —
see ``span_hashes``), fixed tie-breaks (count DESC, word ASC) for the
vocab cut, and per-row float math rounded to integer micros before
any cross-row sum — all independently replayable by the DuckDB
oracles in ``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _norm(col: Column) -> Column:
    # same normalization as text.fingerprint: case/whitespace-folded
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def _min_parallelism(docs: DataFrame) -> DataFrame:
    """Widen an under-split input to the cluster's default parallelism
    before a compute-heavy corpus pass (tokenize/shingle/explode).

    A small-but-compute-dense table can arrive as ONE input split (a
    5 MB parquet under the default 128 MB maxPartitionBytes, or one
    row group), serializing the whole shingle stage on a single core —
    measured 4.7 s single-task vs 0.7 s at 32 for q_span_dedup at
    sf0.1. The guard only fires when input partitions < cores, so at
    100 TB (thousands of splits) it is a no-op and never adds a
    full-text shuffle; when it does fire, the data is by construction
    small enough that the round-robin shuffle is negligible."""
    sc = docs.sparkSession.sparkContext
    target = sc.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        return docs.repartition(target)
    return docs


def span_hashes(col: Column, k: int = 10) -> Column:
    """xxhash64 of every k-token window of the normalized text (1 span
    per window, multiset). A document shorter than k tokens contributes
    its whole normalized text as its single span — so every document
    has >= 1 span and short exact-dups still collide.

    64-bit keys, not md5: the span-frequency shuffle and join then
    carry 8-byte bigints instead of 32-char hex strings (~4x less
    shuffle payload at cluster scale). The hash runs over the token
    ARRAY slice directly — no per-window gram string is ever built
    (measured: concat_ws+hash 7.06 s vs array-hash 6.66 s min-of-3 at
    sf0.1 local[32]; equality semantics identical since normalized
    tokens cannot contain the joiner). Collision cost at 100 TB
    (~1e13 spans): expected ~(1e13)^2/2^65 ≈ 3e6 false-dup span
    marks, a ~3e-7 relative error in dup_frac — noise for a filtering
    signal (and zero at oracle scale, so the DuckDB mirror, which
    keys on the raw gram text, stays exact)."""
    norm = _norm(col)
    toks = F.split(norm, " ")
    n = F.size(toks)
    return F.when(n < k, F.array(F.xxhash64(norm))).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.xxhash64(F.slice(toks, i, k)),
        )
    )


def span_dedup_stats(
    docs: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicated-span statistics — the MassiveText /
    RefinedWeb-style exact-substring dedup signal, shaped for Spark:
    corpus-duplicated k-token windows are found by a frequency count
    over xxhash64 span hashes, and each document reports how much of it is
    made of spans that occur elsewhere (or more than once).

    Returns (id_col, n_spans, n_dup_spans, dup_frac) where a span is
    "dup" iff its corpus-wide occurrence count (multiset, including
    within-document repeats) is > 1. ``dup_frac`` is rounded to 6 dp.
    A downstream filter like ``dup_frac <= 0.3`` is the usual gate.
    """
    docs = _min_parallelism(docs)
    spans = docs.select(
        F.col(id_col), F.explode(span_hashes(F.col(text_col), k)).alias("span")
    )
    # reduce to (doc, span, multiplicity) before anything else: the
    # partial aggregate collapses within-doc repeats map-side. Both
    # consumers below sit on this SAME aggregate, so its shuffle is
    # written once and read twice (ReusedExchange — verified in plan;
    # an explicit localCheckpoint measured ~1 s SLOWER at sf0.1: the
    # RDD materialization barrier buys nothing the shuffle files
    # don't already provide).
    doc_spans = spans.groupBy(id_col, "span").agg(F.count(F.lit(1)).alias("m"))
    # join back ONLY the duplicated spans (tot > 1): in a web corpus
    # most spans are unique, so the join side shrinks by the unique
    # fraction — small enough for AQE to broadcast at bench scale,
    # and far less shuffle at 100 TB where it stays a sort-merge.
    dup_spans = (
        doc_spans.groupBy("span")
        .agg(F.sum("m").alias("tot"))
        .filter(F.col("tot") > 1)
        .select("span", F.lit(1).alias("_dup"))
    )
    per_doc = (
        doc_spans.join(dup_spans, "span", "left")
        .groupBy(id_col)
        .agg(
            F.sum("m").cast("long").alias("n_spans"),
            F.sum(F.when(F.col("_dup") == 1, F.col("m")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_dup_spans"),
        )
        .withColumn(
            "dup_frac",
            F.round(F.col("n_dup_spans") / F.col("n_spans"), 6),
        )
    )
    return per_doc


def winnow_fingerprints(col: Column, k: int = 10, w: int = 4) -> Column:
    """MOSS-style winnowing (Schleimer/Wilkerson/Aiken, SIGMOD 2003)
    over the k-token span hashes: the distinct set of per-w-window
    MINIMUM hashes. Guarantee: any exact match of length >= k + w - 1
    tokens shares at least one fingerprint between the two documents,
    while only ~2/(w+1) of the spans are stored — the standard way to
    shrink an exact-substring index by an order of magnitude with a
    bounded detection gap (vs dropping random spans, which has no
    guarantee at all).

    Ties inside a window need no positional rule here because the
    fingerprint is the VALUE: equal minima contribute one distinct
    value either way. Entirely row-local JVM expression (transform
    over a sequence + array_min over slices) — embarrassingly
    parallel, nothing shuffles until the caller explodes the
    fingerprints. Documents with <= w spans yield their single global
    minimum.

    IMPORTANT for callers: ``col`` here must be a BOUND column (a
    projected spans array via ``span_hashes(...).alias(...)`` in a
    prior select, then ``winnow_from_spans``) when used over real
    data — passing the raw text through this convenience wrapper
    duplicates the span-hash expression TREE at every reference
    inside the interpreted HOF (Column objects splice trees, and
    CollapseProject cannot de-duplicate what the API already
    multiplied): MEASURED 34 s vs 6.7 s for 500 docs single-core at
    k=3. ``winnow_stats``/q_winnow_pairs project first."""
    return winnow_from_spans(span_hashes(col, k), w)


def winnow_from_spans(spans: Column, w: int = 4) -> Column:
    """Winnowing over an already-computed span-hash array column —
    the form every real caller should use (see winnow_fingerprints'
    note on expression-tree duplication)."""
    n = F.size(spans)
    return F.when(n <= w, F.array(F.array_min(spans))).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - (w - 1)),
                lambda i: F.array_min(F.slice(spans, i, w)),
            )
        )
    )


def winnow_stats(
    docs: DataFrame,
    k: int = 10,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document winnowing summary: span count, fingerprint count
    (the ~2/(w+1) compression is directly visible), and the XOR of
    the distinct fingerprints — an order-independent value pin, so an
    oracle replaying the winnow over the same span hashes must
    reproduce the exact fingerprint SET, not just its size.

    Returns (id_col, n_spans, n_fp, fp_xor)."""
    docs = _min_parallelism(docs)
    # project spans THEN fingerprints as bound columns — each HOF
    # stage evaluates its input once (see winnow_fingerprints' note)
    staged = docs.select(
        F.col(id_col), span_hashes(F.col(text_col), k).alias("_spans")
    ).select(
        F.col(id_col),
        F.size("_spans").cast("long").alias("n_spans"),
        winnow_from_spans(F.col("_spans"), w).alias("_fps"),
    )
    return staged.select(
        F.col(id_col),
        F.col("n_spans"),
        F.size("_fps").cast("long").alias("n_fp"),
        F.aggregate(
            F.col("_fps"),
            F.lit(0).cast("long"),
            lambda acc, v: acc.bitwiseXOR(v),
        ).alias("fp_xor"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-decontamination signal: per training document, how
    many of its k-token spans also appear in an evaluation benchmark
    (the GPT-3 appendix-C / RefinedWeb 13-gram overlap rule). The
    usual gate drops documents with ``hit_frac`` above a threshold
    (or any hit at all for strict eval hygiene).

    Scale shape: a benchmark is MBs while the corpus is TBs, so the
    benchmark's distinct span-hash set is broadcast and the corpus
    side never shuffles — the only wide exchange is the final per-doc
    aggregate of (id, counters), which partial-combines map-side.
    Spans are keyed by ``span_hashes`` (xxhash64 over the token-array
    window, multiset per doc; see that docstring for the collision
    budget — false hits at 100 TB are ~1e-7 relative, and zero at
    oracle scale where the DuckDB mirror re-keys by raw gram text).

    Returns (id_col, n_spans, n_hit, hit_frac) with multiset
    semantics: a span repeated in the document counts each time, so
    ``hit_frac`` is the contaminated fraction of the document's span
    stream. ``hit_frac`` is rounded to 6 dp.
    """
    docs = _min_parallelism(docs)
    # NULL text → coalesce to '' so every document keeps its >=1-span
    # guarantee (explode of a NULL array would silently DROP the row,
    # breaking the semi-join pattern curate_documents builds on this)
    t = F.coalesce(F.col(text_col), F.lit(""))
    bench_spans = (
        benchmark.select(F.explode(span_hashes(t, k)).alias("span"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    spans = docs.select(
        F.col(id_col), F.explode(span_hashes(t, k)).alias("span")
    )
    return (
        spans.join(F.broadcast(bench_spans), "span", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_hit"),
        )
        .withColumn("hit_frac", F.round(F.col("n_hit") / F.col("n_spans"), 6))
    )


def unigram_logprob(
    docs: DataFrame,
    vocab_size: int = 65536,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-derived unigram LM quality score (the cheap, fully
    deterministic stand-in for KenLM perplexity filtering): pass 1
    counts case-folded word frequencies and keeps the top
    ``vocab_size`` words (tie-break: count DESC, word ASC — a
    TakeOrderedAndProject, not a global window sort); pass 2 scores
    every document as the sum of per-token log-probabilities, with
    out-of-vocabulary tokens priced at ln(0.5 / total_tokens).

    Per-token log-probs are fixed to integer MICROS (round(ln(p)*1e6))
    before summation so the cross-engine compare is order-insensitive
    and float-associativity-proof. Returns
    (id_col, n_toks, lp_sum_micros, lp_mean_micros)."""
    docs = _min_parallelism(docs)
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(_norm(F.col(text_col)), " ")).alias("w"),
    ).filter(F.col("w") != "")
    counts = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    total_df = counts.agg(F.sum("cnt").cast("double").alias("total"))
    vocab = (
        counts.orderBy(F.desc("cnt"), F.asc("w"))
        .limit(vocab_size)
        .join(F.broadcast(total_df))
        .select(
            "w",
            F.round(F.log(F.col("cnt") / F.col("total")) * 1e6)
            .cast("long")
            .alias("lp_micros"),
        )
    )
    oov = total_df.select(
        F.round(F.log(F.lit(0.5) / F.col("total")) * 1e6)
        .cast("long")
        .alias("oov_micros")
    )
    scored = (
        words.join(F.broadcast(vocab), "w", "left")
        .join(F.broadcast(oov))
        .select(
            id_col,
            F.coalesce(F.col("lp_micros"), F.col("oov_micros")).alias("lp"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_toks"),
            F.sum("lp").cast("long").alias("lp_sum_micros"),
        )
        .withColumn(
            "lp_mean_micros",
            # integer mean (floor division) — exact on both engines
            F.floor(F.col("lp_sum_micros") / F.col("n_toks")).cast("long"),
        )
    )
    return scored


def bigram_logprob(
    docs: DataFrame,
    vocab_size: int = 65536,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-derived BIGRAM LM quality score — the KenLM-shaped
    upgrade of ``unigram_logprob`` (CCNet-style pipelines filter on
    n-gram LM perplexity; a bigram CONDITIONAL catches fluent-word
    salad that unigram frequency cannot, because every word is common
    but the transitions are not).

    Model: lp(prev, w) = ln(c(prev, w) / c(prev)) for the top
    ``vocab_size`` bigrams (tie-break count DESC, then pair ASC — a
    TakeOrderedAndProject); c(prev) is the context total over ALL
    observed bigrams, so kept entries are true conditionals. Any
    other adjacent pair prices at ln(0.5 / total_bigrams), the same
    OOV rule as the unigram op. Per-pair log-probs are fixed to
    integer MICROS (round(ln(p) * 1e6)) before summation —
    order-insensitive, float-associativity-proof, replayable by any
    engine.

    Scale shape (100 TB): adjacent pairs are formed JVM-side per
    document from the token array (a transform over the 1-shifted
    array — never a positional self-join over an exploded token
    table); the model is two hash aggs with map-side combine; scoring
    broadcasts the pair vocabulary at this ``vocab_size`` — when the
    pair model outgrows a broadcast at web scale, the identical plan
    becomes a shuffle join keyed by (prev, w) by dropping the
    broadcast hint, not a different algorithm.

    Returns (id_col, n_bigrams, lp_sum_micros, lp_mean_micros), one
    row per document with at least one bigram (single-token and empty
    documents have none)."""
    docs = _min_parallelism(docs)
    toks = F.filter(
        F.split(_norm(F.col(text_col)), " "), lambda x: x != ""
    )
    d = docs.select(F.col(id_col), toks.alias("toks")).filter(
        F.size("toks") >= 2
    )
    pairs = d.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(slice(toks, 1, size(toks) - 1),"
                " (x, i) -> struct(x AS prev, toks[i + 1] AS w))"
            )
        ).alias("pr"),
    ).select(id_col, F.col("pr.prev").alias("prev"), F.col("pr.w").alias("w"))

    pc = pairs.groupBy("prev", "w").agg(F.count(F.lit(1)).alias("cnt"))
    ctx = pc.groupBy("prev").agg(F.sum("cnt").alias("ctx_cnt"))
    total_df = pc.agg(F.sum("cnt").cast("double").alias("total"))
    vocab = (
        pc.orderBy(F.desc("cnt"), F.asc("prev"), F.asc("w"))
        .limit(vocab_size)
        .join(ctx, "prev")
        .select(
            "prev",
            "w",
            F.round(F.log(F.col("cnt") / F.col("ctx_cnt")) * 1e6)
            .cast("long")
            .alias("lp_micros"),
        )
    )
    oov = total_df.select(
        F.round(F.log(F.lit(0.5) / F.col("total")) * 1e6)
        .cast("long")
        .alias("oov_micros")
    )
    return (
        pairs.join(F.broadcast(vocab), ["prev", "w"], "left")
        .join(F.broadcast(oov))
        .select(
            id_col,
            F.coalesce(F.col("lp_micros"), F.col("oov_micros")).alias("lp"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("lp").cast("long").alias("lp_sum_micros"),
        )
        .withColumn(
            "lp_mean_micros",
            F.floor(F.col("lp_sum_micros") / F.col("n_bigrams")).cast("long"),
        )
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic hash-threshold sampling with per-stratum rates —
    the 100 TB downsampling primitive (cap a language's share, thin a
    crawl, build a dev slice) that needs NO shuffle, NO count pass and
    NO RNG: a row is kept iff the first 8 hex chars of
    md5(id) compare below the stratum's threshold, so membership is a
    pure function of the row (retry/partition/layout-invariant), any
    engine can reproduce it, and supersampling is monotone (a 10%
    sample is a subset of a 20% sample of the same corpus).

    ``rates`` maps stratum value → keep-probability. The comparison is
    done on fixed-width lowercase hex STRINGS, which orders exactly
    like the 32-bit integer it spells — so the DuckDB mirror is a
    byte-identical expression."""
    thresholds = {s: _rate_hex(r) for s, r in rates.items()}
    bucket = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    thr = F.lit(_rate_hex(default_rate))
    for s, t in sorted(thresholds.items()):
        thr = F.when(F.col(stratum_col) == s, F.lit(t)).otherwise(thr)
    return docs.filter(bucket < thr)


def priority_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    stratum_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic WEIGHT-BIASED top-k sample — the quality-aware
    sibling of ``stratified_sample`` (which is rate-based and
    weight-blind): keep the k rows per stratum (or globally) with the
    smallest priority ``p = H(id) div w``, where H is a 60-bit
    md5-derived integer. A row with twice the weight halves its
    priority, so selection probability rises with weight, yet
    membership stays a pure function of the row: retry-invariant,
    layout-invariant, engine-reproducible, and STABLE under corpus
    growth (adding rows can only displace, never reshuffle, the
    chosen set — the property hash-priority sampling is used for in
    bottom-k sketches).

    This is deliberately integer priority-order sampling, not an
    exact Efraimidis–Spirakis draw: E-S needs u^(1/w) floats whose
    cross-engine determinism this repo's discipline forbids; the
    div-by-weight rank preserves the monotone weight bias with
    arithmetic both engines replay bit-for-bit (documented
    approximation).

    Plan shape: global mode compiles to TakeOrderedAndProject
    (distributed top-k, no global sort); per-stratum mode is one
    window shuffle keyed by stratum. Rows with null/non-positive
    weight are excluded. Ties broken by id.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    base = (
        docs.filter(
            F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
        )
        .withColumn("_ph", h)
        .withColumn(
            "_prio", F.expr(f"_ph div CAST({weight_col} AS BIGINT)")
        )
    )
    if stratum_col is None:
        return base.orderBy("_prio", id_col).limit(k).drop("_ph", "_prio")
    w = Window.partitionBy(stratum_col).orderBy("_prio", id_col)
    return (
        base.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_ph", "_prio", "_rn")
    )


def _rate_hex(rate: float) -> str:
    """keep-probability → 8-hex-char threshold (cut at rate * 2^32).
    rate >= 1.0 returns 'g': 'g' > 'f' in the first character, so
    every hex bucket compares below it — a true keep-everything, not
    a 1-in-2^32 silent drop of the 'ffffffff' bucket."""
    if rate >= 1.0:
        return "g"
    v = min(max(int(round(rate * (1 << 32))), 0), (1 << 32) - 1)
    return format(v, "08x")


def tfidf_top_terms(
    docs: DataFrame,
    top_k: int = 3,
    max_vocab: int = 1 << 18,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k TF-IDF terms. Pass 1 computes document
    frequencies and keeps the ``max_vocab`` most document-frequent
    terms (TakeOrderedAndProject; broadcastable); pass 2 scores every
    (doc, term) as tf * idf_micros where idf_micros =
    round(ln(N/df) * 1e6) — an INTEGER product, so scoring and the
    (score DESC, term ASC) top-k tie-break are exactly reproducible
    by any engine with no float associativity anywhere.

    Returns (id_col, term, tf, score_micros), <= top_k rows per doc."""
    from pyspark.sql import Window

    docs = _min_parallelism(docs)
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(_norm(F.col(text_col)), " ")).alias("w"),
    ).filter(F.col("w") != "")
    tf = words.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    idf = (
        tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("w"))
        .limit(max_vocab)
        .join(F.broadcast(n_docs))
        .select(
            "w",
            F.round(F.log(F.col("n_docs") / F.col("df")) * 1e6)
            .cast("long")
            .alias("idf_micros"),
        )
    )
    scored = tf.join(F.broadcast(idf), "w").select(
        id_col,
        F.col("w").alias("term"),
        F.col("tf").cast("long").alias("tf"),
        (F.col("tf") * F.col("idf_micros")).alias("score_micros"),
    )
    win = Window.partitionBy(id_col).orderBy(
        F.desc("score_micros"), F.asc("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= top_k)
        .drop("rn")
    )


def keyword_search(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Conjunctive keyword retrieval via the posting-list shape:
    explode to (doc, term) postings, keep only the query terms
    (pushed into the scan as an IN filter BEFORE the explode output is
    shuffled), and keep documents matching ALL terms. At 100 TB the
    shuffle carries only postings of the queried terms — microscopic
    next to the corpus — instead of scanning text per query term.

    Returns (id_col, n_hits) where n_hits is total occurrences of all
    query terms in the document."""
    want = [t.lower() for t in terms]
    docs = _min_parallelism(docs)
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(_norm(F.col(text_col)), " ")).alias("w"),
    ).filter(F.col("w").isin(want))
    return (
        words.groupBy(id_col)
        .agg(
            F.countDistinct("w").alias("n_terms"),
            F.count(F.lit(1)).cast("long").alias("n_hits"),
        )
        .filter(F.col("n_terms") == len(set(want)))
        .select(id_col, "n_hits")
    )


def phrase_search(
    docs: DataFrame,
    phrase: list[str] | str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """POSITIONAL phrase matching — consecutive-token occurrences, the
    query shape bag-of-words retrieval (keyword_search/bm25_search)
    cannot express.

    Shape: entirely row-local. The token array never leaves its row —
    match positions come from a JVM higher-order filter over candidate
    start offsets (k comparisons per offset, k = phrase length), so
    the corpus-side plan is scan → project with NO explode, NO join
    and NO shuffle until the final (tiny) per-hit result. At 100 TB
    this is the right phrase plan for a scan-time query: a positional
    inverted index would pay k posting shuffles to save a text scan,
    which only wins when the index is reused across many queries —
    the posting-list machinery already exists in keyword_search for
    that regime. HOFs are interpreted per element (CLAUDE.md), but
    the work here is bounded equality checks on short strings; the
    pandas-UDF alternative would add a Python crossing for less.

    Returns (id_col, n_matches, first_pos) for matching documents,
    positions 1-based over the whitespace-normalized token sequence.
    """
    terms = _phrase_terms(phrase)
    arr = F.split(_norm(F.col(text_col)), " ")
    positions = _phrase_positions(arr, terms)
    return (
        docs.select(F.col(id_col), positions.alias("_pos"))
        .filter(F.size("_pos") > 0)
        .select(
            id_col,
            F.size("_pos").cast("long").alias("n_matches"),
            F.element_at("_pos", 1).cast("long").alias("first_pos"),
        )
    )


def _phrase_terms(phrase: list[str] | str) -> list[str]:
    terms = phrase.split() if isinstance(phrase, str) else list(phrase)
    terms = [t.lower() for t in terms if t]
    if not terms:
        raise ValueError("empty phrase")
    return terms


def _phrase_positions(arr: Column, terms: list[str]) -> Column:
    """1-based start offsets where ``terms`` occur consecutively in
    the token array — shared by phrase_search and phrase_snippets."""
    k = len(terms)

    def _hit(i):
        cond = None
        for j, t in enumerate(terms):
            c = F.element_at(arr, (i + F.lit(j)).cast("int")) == t
            cond = c if cond is None else cond & c
        return cond

    return F.when(
        F.size(arr) >= k,
        F.filter(
            # sequence() DESCENDS when start > stop — the size guard
            # above keeps the bound ≥ 1 so this can never flip
            F.sequence(F.lit(1), F.size(arr) - k + 1),
            _hit,
        ),
    ).otherwise(F.array().cast("array<int>"))


def phrase_snippets(
    docs: DataFrame,
    phrase: list[str] | str,
    window: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """KWIC (keyword-in-context) snippets: for each matching document
    the ``window`` tokens either side of the FIRST phrase occurrence,
    joined with single spaces — what a search result page shows.
    Same row-local shape as phrase_search (no corpus-side shuffle);
    the snippet is a bounded slice, so output rows stay tiny however
    large the documents are. Returns (id_col, first_pos, snippet)."""
    if window < 0:
        raise ValueError("window must be >= 0")
    terms = _phrase_terms(phrase)
    k = len(terms)
    arr = F.split(_norm(F.col(text_col)), " ")
    positions = _phrase_positions(arr, terms)
    first = F.element_at("_pos", 1)
    start = F.greatest(first - window, F.lit(1))
    # slice length runs from the clamped start through match end +
    # window, clamped to the array end by slice() itself
    length = (first + F.lit(k - 1 + window)) - start + 1
    return (
        docs.select(F.col(id_col), arr.alias("_arr"), positions.alias("_pos"))
        .filter(F.size("_pos") > 0)
        .select(
            id_col,
            first.cast("long").alias("first_pos"),
            F.array_join(
                F.slice("_arr", start, length), " "
            ).alias("snippet"),
        )
    )


def url_template(col: Column) -> Column:
    """Collapse a URL to its path TEMPLATE — the pattern crawl
    systems mine to spot parameterized duplicate spaces (pagination,
    session ids, content hashes) before fetching them: segment-level
    classification, so `/user/1234/post/deadbeef01` →
    `/user/{n}/post/{hex}`.

    Per path segment (split on '/'): all-digits → ``{n}``; UUID shape
    → ``{uuid}``; hex run ≥ 8 chars containing both a letter and a
    digit → ``{hex}``; else kept verbatim. The query string keeps
    only its sorted parameter NAMES (values are the variability being
    mined). All rules are anchored full-segment regexes in the
    Java∩RE2 subset — no lookaround, so the same patterns run in the
    DuckDB mirror — evaluated by a JVM higher-order transform over
    the split array (no Python, no shuffle). Non-absolute URLs
    yield NULL.

    Returns ``host/templated-path[?name&name…]`` as one string.
    """
    host = F.regexp_extract(col, _HOST_RE, 1)
    path = F.regexp_extract(
        col, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1
    )
    segs = F.split(path, "/")

    def classify(s: Column) -> Column:
        is_uuid = s.rlike(
            r"(?i)^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-"
            r"[0-9a-f]{4}-[0-9a-f]{12}$"
        )
        is_num = s.rlike(r"^[0-9]+$")
        is_hex = (
            s.rlike(r"(?i)^[0-9a-f]{8,}$")
            & s.rlike(r"(?i)[a-f]")
            & s.rlike(r"[0-9]")
        )
        return (
            F.when(is_uuid, F.lit("{uuid}"))
            .when(is_num, F.lit("{n}"))
            .when(is_hex, F.lit("{hex}"))
            .otherwise(s)
        )

    tpath = F.array_join(F.transform(segs, classify), "/")
    qnames = F.array_join(
        F.array_sort(
            F.regexp_extract_all(
                F.regexp_extract(col, r"\?([^#]*)", 1),
                F.lit(r"(?:^|&)([^&=]+)="),
                F.lit(1),
            )
        ),
        "&",
    )
    tpl = F.concat(
        host,
        tpath,
        F.when(qnames != "", F.concat(F.lit("?"), qnames)).otherwise(
            F.lit("")
        ),
    )
    return F.when(host != "", tpl).otherwise(F.lit(None).cast("string"))


def url_template_stats(
    urls: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Per-template roll-up: (template, n_urls, n_distinct, example)
    — example pinned to the MIN url for determinism. One map-only
    template projection + one hash aggregate (map-side combined);
    bounded output (templates, not URLs) like domain_stats."""
    t = urls.select(
        url_template(F.col(url_col)).alias("template"),
        F.col(url_col).alias("_u"),
    ).filter(F.col("template").isNotNull())
    return t.groupBy("template").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.count_distinct("_u").alias("n_distinct"),
        F.min("_u").alias("example"),
    )


_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)"


def url_host(col: Column) -> Column:
    """Lower-cased authority host of an absolute URL ('' if the value
    is not an absolute URL). The pattern is shared verbatim with the
    DuckDB oracle (RE2-compatible: no backrefs, no lookaround)."""
    return F.lower(F.regexp_extract(col, _HOST_RE, 1))


def domain_stats(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-domain corpus roll-up — the domain-filtering/blocklist
    primitive of a web-scale curation pipeline: page count, distinct
    URLs, total raw bytes, per-host mean page size. One hash aggregate
    keyed by host; the keyspace is bounded by the number of registered
    domains, so map-side combine does nearly all the work and the
    shuffle carries (host, counters) only.

    Returns (host, tld, n_pages, n_urls, sum_bytes, mean_bytes)."""
    host = url_host(F.col(url_col)).alias("host")
    out = (
        pages.select(
            host,
            F.col(url_col).alias("_u"),
            F.length("html").cast("long").alias("_b"),
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pages"),
            F.countDistinct("_u").cast("long").alias("n_urls"),
            F.sum("_b").cast("long").alias("sum_bytes"),
        )
        .withColumn("tld", F.regexp_extract("host", r"([^.]+)$", 1))
        .withColumn(
            "mean_bytes",
            F.floor(F.col("sum_bytes") / F.col("n_pages")).cast("long"),
        )
        .select("host", "tld", "n_pages", "n_urls", "sum_bytes", "mean_bytes")
    )
    return out


def bm25_search(
    docs: DataFrame,
    terms: list[str],
    top_k: int = 20,
    k1_pct: int = 120,
    b_pct: int = 75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Disjunctive BM25 ranked retrieval (Robertson/Okapi; the Lucene
    non-negative idf variant) — the ranking sibling of
    ``keyword_search``'s boolean retrieval.

    score(d) = sum over matched query terms of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    with idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)).

    Cross-engine exactness: ``k1``/``b`` are integer percents and the
    saturation fraction is evaluated entirely in INTEGER MICROS with
    truncating division (`DIV`) at three pinned points — ratio, norm,
    saturation — so the per-(doc, term) score is one integer and the
    document score an integer sum (associative; any engine replaying
    the same pinned arithmetic matches bit-for-bit). The single float
    op, ln() for idf, is rounded to micros once per TERM (|terms|
    values total), the same discipline as ``tfidf_top_terms``.

    Scale shape (100 TB): the corpus pass computes ONE per-document
    token count (hash agg on the already-scanned text — no shuffle of
    text, only (doc, dl)); avgdl is a single-row aggregate broadcast
    by crossJoin; query-term postings are IN-filtered BEFORE the
    (doc, term) shuffle so the shuffle carries only postings of the
    |terms| queried terms; idf is a |terms|-row broadcast. The final
    top-k is an orderBy().limit() — TakeOrderedAndProject, no global
    sort. Returns (id_col, n_terms, score_micros), ties broken by id.
    """
    want = sorted({t.lower() for t in terms})
    docs = _min_parallelism(docs)
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(_norm(F.col(text_col)), " ")).alias("w"),
    ).filter(F.col("w") != "")
    # one scan feeds both the doc-length branch and the posting
    # branch (repo convention for reused mid-plans)
    words = words.localCheckpoint(eager=False)

    dl = words.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
    ).select(
        "n_docs",
        # greatest(,1) guards: an empty/blank corpus must yield zero
        # rows, not an ANSI division-by-zero (Spark 4 default)
        F.expr(
            "greatest(total_tokens * 1000000 DIV greatest(n_docs, 1), 1)"
        ).alias("avgdl_micros"),
    )

    tf = (
        words.filter(F.col("w").isin(want))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    idf = (
        tf.groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .join(F.broadcast(stats.select("n_docs")))
        .select(
            "w",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * 1e6
            )
            .cast("long")
            .alias("idf_micros"),
        )
    )

    scored = (
        tf.join(F.broadcast(idf), "w")
        .join(dl, id_col)
        .join(F.broadcast(stats.select("avgdl_micros")))
        .select(
            F.col(id_col),
            F.col("w"),
            F.expr(
                f"""
                idf_micros * (
                  tf * {k1_pct + 100} * 10000000000 DIV (
                    tf * 1000000 + {k1_pct} * (
                      {(100 - b_pct) * 10_000}
                      + {b_pct} * (dl * 1000000000000 DIV avgdl_micros)
                        DIV 100
                    ) DIV 100
                  )
                ) DIV 1000000
                """
            ).alias("s_micros"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("s_micros").cast("long").alias("score_micros"),
        )
        .orderBy(F.desc("score_micros"), F.asc(id_col))
        .limit(top_k)
    )


def line_dedup_stats(
    pages: DataFrame,
    max_docs: int = 2,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """CCNet/RefinedWeb-style line-level boilerplate removal: a line
    is DROPPED from every document of a host when it occurs in more
    than ``max_docs`` distinct documents of that host (nav bars,
    cookie banners, footers — the per-host repeated furniture that
    survives document-level dedup). Order-free semantics — a line is
    judged by its (host, content) frequency, not by which document
    was seen "first" — so the result is layout/retry-invariant and
    independently replayable.

    Scale shape (100 TB): lines explode once and the exploded table
    is localCheckpointed (reused by the frequency branch and the
    rebuild branch — one text scan, the repo's one-scan convention).
    The frequency aggregate keys on (host, xxhash64(line)) — heavy
    map-side combine since boilerplate is exactly the high-repeat
    mass — and only the HOT set (tiny: each host's furniture
    vocabulary) flows to the flag join, AQE broadcasting it when it
    fits. The corpus-side shuffle is the final per-url aggregate.

    Returns (url, n_lines, n_kept, kept_md5) where kept_md5 is the
    md5 of the surviving lines re-joined in original order — pinning
    exact content and order of the cleaned document, not just counts.
    """
    host = url_host(F.col(url_col)).alias("host")
    lines = (
        _min_parallelism(pages)
        .select(
            F.col(url_col).alias("url"),
            host,
            F.posexplode(F.split(F.col(text_col), "\n")).alias(
                "pos", "line"
            ),
        )
        .localCheckpoint(eager=False)
    )
    hot = (
        lines.groupBy("host", F.xxhash64("line").alias("lh"))
        .agg(F.countDistinct("url").alias("n_docs"))
        .filter(F.col("n_docs") > max_docs)
        .select("host", "lh", F.lit(True).alias("is_hot"))
    )
    flagged = lines.withColumn("lh", F.xxhash64("line")).join(
        hot, ["host", "lh"], "left"
    )
    keep = F.col("is_hot").isNull()
    return flagged.groupBy("url").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(keep, F.struct("pos", "line"))
                        )
                    ),
                    lambda x: x["line"],
                ),
                "\n",
            )
        ).alias("kept_md5"),
    )


def cap_per_domain(
    docs: DataFrame,
    cap: int = 10,
    group_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain quota (RefinedWeb-style source capping): keep at
    most ``cap`` documents per ``group_col``, best-first by
    (``order_col`` DESC, ``id_col`` ASC) — a total order, so the kept
    set is exact and engine-independent.

    Scale shape (100 TB): the mega-host worry — "a rank window
    shuffles EVERY row of the host into one task" — is already solved
    by Catalyst's rank-limit pushdown (InferWindowGroupLimit,
    SPARK-37099): the plan for this exact ``row_number() <= cap``
    pattern is Sort → WindowGroupLimit(Partial) → Exchange →
    WindowGroupLimit(Final) → Window, i.e. each MAP task keeps only
    its local top-``cap`` per group before the shuffle, so the
    exchange carries ≤ cap rows per (group, map task) and the reduce
    side sorts ≤ cap × n_map_tasks rows per group, never the host's
    full row count. A hand-rolled two-level decomposition (level-1
    window keyed by (group, spark_partition_id())) was built and
    plan-audited first: it produces the SAME partial pruning but TWO
    exchanges — strictly worse. Declare the plain window; the
    optimizer already does the two-level trick.

    Returns the kept rows of ``docs`` with a ``rank`` column
    (1-based, best first).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.desc(order_col), F.asc(id_col)
    )
    return (
        docs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= cap)
    )


def canonical_url(col: Column) -> Column:
    """Crawl-side URL canonicalization — the dedup key for re-crawled
    variants of one resource (tracking params, casing, default ports,
    fragments). Entirely JVM regex (no UDF), every pattern in the
    Java-regex∩RE2 subset so the DuckDB oracle can replay the exact
    semantics (each engine writes its own replacement syntax: $1 vs
    \\1 — CLAUDE.md):

    - scheme and host lowercased (RFC 3986 §6.2.2.1 case
      normalization); path/query case is significant and kept;
    - fragment dropped (never sent to the server);
    - default ports stripped (http:80, https:443);
    - tracking query params removed (utm_*, fbclid, gclid), with
      separator cleanup so the query never keeps a dangling ?/&;
    - non-absolute inputs pass through trimmed and unchanged.

    Dot-segment resolution is deliberately NOT here — that is the RFC
    3986 parser's job (rdf/uri.py does it in full); this operator is
    the cheap bulk normalizer that runs over every crawled URL.
    Composes with ``url_host``/``domain_stats`` and the per-url
    ingest dedup (latest_crawl)."""
    u = F.trim(col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    hostport = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, r":80$", ""),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, r":443$", ""),
    ).otherwise(hostport)
    # path+query, fragment already excluded by the [^#]* capture
    rest = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1
    )
    # single global pass keeping the captured separator: tracking
    # matches are disjoint, so no rescan is needed; then separator
    # cleanup (doubled &, ?& from a removed first param, trailing)
    rest = F.regexp_replace(
        rest, r"([?&])(utm_[^=&#]*|fbclid|gclid)=[^&#]*", "$1"
    )
    rest = F.regexp_replace(rest, r"&{2,}", "&")   # a=1&&b=2 -> &
    rest = F.regexp_replace(rest, r"\?&", "?")     # ?&b=2    -> ?b=2
    rest = F.regexp_replace(rest, r"[?&]$", "")    # trailing ? or &
    return F.when(
        scheme == "", u
    ).otherwise(F.concat(scheme, F.lit("://"), hostport, rest))


def surt_key(col: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key — the web
    archive index key (Heritrix / OpenWayback / pywb convention):
    ``https://www.example.com/p?b=2&a=1`` →
    ``com,example)/p?a=1&b=2``. Reversing the host puts every
    subdomain of a site adjacent under a range scan, which is what
    makes CDX lookups and per-site partition pruning work at archive
    scale.

    Rules (the pywb default canon subset, documented where options
    diverge): scheme dropped; host lowercased, a leading ``www`` /
    ``www2``-style label stripped, labels reversed and joined with
    commas; a non-default port kept as ``:port`` before the ``)``
    (default :80/:443 dropped); path kept case-sensitive, empty path
    → ``/``; query parameters sorted bytewise and re-joined (order
    never survives proxies, so the key must not depend on it);
    fragment dropped. Non-absolute inputs → NULL (garbage must not
    fabricate an archive key).

    Entirely JVM built-ins (regexp/split/reverse/array_sort) in the
    Java∩RE2 regex subset — the DuckDB mirror replays every rule with
    its own string/list functions."""
    u = F.trim(col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    host = F.regexp_extract(hostport, r"^([^:]*)", 1)
    host = F.regexp_replace(host, r"^www[0-9]*\.", "")
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    port = F.when(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(port)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qry = F.regexp_extract(u, r"\?([^#]*)", 1)
    qry = F.when(qry == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), F.array_join(F.array_sort(F.split(qry, "&")), "&"))
    )
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(
        F.concat(
            rev,
            F.when(port == "", F.lit("")).otherwise(F.concat(F.lit(":"), port)),
            F.lit(")"),
            path,
            qry,
        )
    )


def cdx_index(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
) -> DataFrame:
    """CDX capture index over a crawled-pages table — the (SURT key,
    timestamp)-ordered lookup index every web archive pairs with its
    WARC shards (CDX/CDXJ convention). One row per capture:
    (surt, ts, url, digest, length) with ts as yyyyMMddHHmmss (the
    CDX 14-digit form — formatted STRING, never a raw timestamp, per
    the cross-engine determinism discipline), digest = md5 of the
    payload bytes, length = payload OCTET length (bytes, not chars).
    Rows whose URL yields no SURT key (non-absolute) are dropped —
    they have no archive identity.

    Scale shape (100 TB): the projection is one codegen map pass;
    the global (surt, ts) order ships as repartitionByRange +
    sortWithinPartitions — range-partitioned sorted shards, each an
    independently binary-searchable CDX file, exactly how archives
    shard their indexes. No global single-task sort anywhere."""
    rows = (
        pages.select(
            surt_key(F.col(url_col)).alias("surt"),
            F.date_format(F.col(ts_col), "yyyyMMddHHmmss").alias("ts"),
            F.col(url_col).alias("url"),
            F.md5(F.col(html_col)).alias("digest"),
            F.octet_length(F.col(html_col)).cast("long").alias("length"),
        )
        .where(F.col("surt").isNotNull())
    )
    return rows.repartitionByRange("surt", "ts").sortWithinPartitions(
        "surt", "ts"
    )


def host_graph(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Host-level web link graph from anchor hrefs — the web-graph
    construction step that feeds host centrality (``graph.pagerank``),
    spam/hub analysis, and crawl frontier scoring.

    Scale shape (100 TB): href extraction is one codegen'd
    ``regexp_extract_all`` over the page bytes (no Python), explode
    emits one row per anchor, and the aggregate is keyed by
    (src_host, dst_host) — a keyspace bounded by registered-domain
    pairs actually linked, orders of magnitude smaller than the link
    count, so map-side combine collapses almost everything before the
    shuffle (same argument as ``domain_stats``). Relative and
    non-absolute hrefs resolve to '' and are dropped; self-loops
    (intra-site links) are kept — they are real signal for
    link-farm / boilerplate-nav detection.

    Returns (src_host, dst_host, n_links), one row per linked host
    pair."""
    hrefs = F.regexp_extract_all(
        F.col(html_col).cast("string"), F.lit(r'href="([^"]*)"'), 1
    )
    return (
        pages.select(
            url_host(F.col(url_col)).alias("src_host"),
            F.explode(hrefs).alias("_href"),
        )
        .select("src_host", url_host(F.col("_href")).alias("dst_host"))
        .filter((F.col("src_host") != "") & (F.col("dst_host") != ""))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).cast("long").alias("n_links"))
    )


def dsir_weights(
    docs: DataFrame,
    target_pred: Column,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al.,
    "Data Selection via Importance Resampling", NeurIPS 2023 — the
    hashed-n-gram importance estimator used to pick pretraining data
    that looks like a target domain).

    Features are word BIGRAMS hashed into ``n_buckets`` buckets (the
    paper's hashed bag-of-ngrams); the target distribution p and raw
    distribution q are add-1-smoothed bucket frequencies over the
    documents matching / not-restricted-to ``target_pred``; a
    document's importance weight is

        log w(d) = sum over bigram occurrences of ln p[b] - ln q[b].

    Determinism + cross-engine replay: the bucket hash is
    ``conv(substr(md5(prev ‖ ' ' ‖ w), 1, 8), 16, 10) % n_buckets``
    (DuckDB mirrors it as ``CAST('0x' || substr(md5(..), 1, 8) AS
    BIGINT)``), and each bucket's ln-ratio is fixed to integer MICROS
    **per ln() term** (round(ln(p)*1e6) - round(ln(q)*1e6)) so the
    cross-bucket sum is integer arithmetic — order-insensitive and
    float-associativity-proof, the repo's standard oracle discipline.

    Scale shape (100 TB): bigrams are formed JVM-side per document
    from the token array (shifted-array transform, cf.
    ``bigram_logprob``); both distributions are ONE hash aggregate
    over the bucket id (map-side combine collapses to ≤ n_buckets
    rows; the target side is a conditional count in the same agg, not
    a second corpus pass); scoring broadcasts the n_buckets-row ratio
    table, so the scoring pass is shuffle-free up to the final
    per-document aggregate. Nothing but fixed-width ids crosses a
    shuffle.

    The deterministic stand-in for the paper's Gumbel-top-k resample
    is the ``selected`` flag: logw > 0 ⇔ the document is more
    target-like than raw-like (threshold selection; a top-k over
    logw_micros is a TakeOrderedAndProject away).

    Returns (id_col, n_feats, logw_micros, selected), one row per
    document with at least one bigram.
    """
    docs = _min_parallelism(docs)
    toks = F.filter(F.split(_norm(F.col(text_col)), " "), lambda x: x != "")
    d = docs.select(
        F.col(id_col), target_pred.alias("_is_t"), toks.alias("toks")
    ).filter(F.size("toks") >= 2)
    feats = d.select(
        F.col(id_col),
        "_is_t",
        F.explode(
            F.expr(
                "transform(slice(toks, 1, size(toks) - 1),"
                " (x, i) -> concat(x, ' ', toks[i + 1]))"
            )
        ).alias("_g"),
    ).select(
        id_col,
        "_is_t",
        (
            F.conv(F.substring(F.md5(F.col("_g")), 1, 8), 16, 10)
            .cast("long") % n_buckets
        ).alias("b"),
    )
    # one aggregate builds BOTH distributions: raw count + conditional
    # target count per bucket
    bc = feats.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.when(F.col("_is_t"), 1).otherwise(0)).alias("ct"),
    )
    totals = bc.agg(
        F.sum("cr").cast("double").alias("tr"),
        F.sum("ct").cast("double").alias("tt"),
    )
    ratios = bc.join(F.broadcast(totals)).select(
        "b",
        (
            F.round(
                F.log((F.col("ct") + 1.0) / (F.col("tt") + n_buckets)) * 1e6
            ).cast("long")
            - F.round(
                F.log((F.col("cr") + 1.0) / (F.col("tr") + n_buckets)) * 1e6
            ).cast("long")
        ).alias("lr_micros"),
    )
    return (
        feats.join(F.broadcast(ratios), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("lr_micros").cast("long").alias("logw_micros"),
        )
        .withColumn("selected", F.col("logw_micros") > 0)
    )


def span_grams(col: Column, k: int = 13) -> Column:
    """Raw k-token gram STRINGS of the normalized text (the text-keyed
    sibling of ``span_hashes`` — same windowing, same short-document
    whole-text fallback, but emitting the gram itself for operators
    whose hash family must be replayable by any engine with md5).
    Prefer ``span_hashes`` when the key only needs to be compared
    Spark-side: 8-byte bigints beat 32-char strings across a shuffle.
    """
    norm = _norm(col)
    toks = F.split(norm, " ")
    n = F.size(toks)
    return F.when(n < k, F.array(norm)).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )


def _bloom_pos(gram: Column, j: int, m_bits: int) -> Column:
    # md5-derived bit position: hex→int on 8 hex chars, mod the bit-
    # space — DuckDB mirrors with CAST('0x'||substr(md5(..),1,8))
    return (
        F.conv(
            F.substring(F.md5(F.concat(gram, F.lit(f"#{j}"))), 1, 8), 16, 10
        ).cast("long")
        % m_bits
    )


def bloom_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 13,
    m_bits: int = 65536,
    n_hashes: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination through a BLOOM FILTER (Bloom 1970)
    instead of the exact span set: the benchmark's k-gram spans set
    ``n_hashes`` md5-derived bit positions in an ``m_bits``-bit
    filter; a corpus span counts as a (possible) hit iff ALL its
    positions are set. One-sided error by construction — every true
    overlap is flagged (no false negatives), plus a deterministic
    false-positive rate ≈ (1 - e^(-kn/m))^k.

    Why this exists beside ``decontaminate``: the exact path
    broadcasts the benchmark's DISTINCT SPAN SET, which grows with
    the benchmark; the Bloom filter is FIXED SIZE (m bits) no matter
    how many benchmarks are unioned in — the right broadcast object
    when the contamination blocklist outgrows a hash-set broadcast
    but the corpus side still must never shuffle. Here the filter is
    carried as a distinct set-bit table (≤ m rows of longs) feeding
    ``n_hashes`` broadcast left joins — all map-side, codegen'd; the
    only wide exchange is the final per-doc aggregate, exactly as in
    the exact path. At real scale the same bit table compiles into
    Spark's own BloomFilterAggregate / a bitset broadcast variable;
    the relational form is chosen because every engine can replay it
    — false positives INCLUDED (md5 is the hash on both sides), so
    the oracle match is bit-exact, not approximate.

    Returns (id_col, n_spans, n_hits, hit_frac) with multiset
    semantics (a repeated span counts each occurrence), hit_frac
    rounded to 6 dp.
    """
    if n_hashes < 1 or m_bits < 2:
        raise ValueError("need n_hashes >= 1 and m_bits >= 2")
    docs = _min_parallelism(docs)
    t = F.coalesce(F.col(text_col), F.lit(""))
    bits = (
        benchmark.select(F.explode(span_grams(t, k)).alias("g"))
        .select(
            F.explode(
                F.array(
                    *[_bloom_pos(F.col("g"), j, m_bits) for j in range(n_hashes)]
                )
            ).alias("pos")
        )
        .distinct()
    )
    probed = docs.select(F.col(id_col), F.explode(span_grams(t, k)).alias("g")).select(
        id_col,
        *[_bloom_pos(F.col("g"), j, m_bits).alias(f"_p{j}") for j in range(n_hashes)],
    )
    for j in range(n_hashes):
        probed = probed.join(
            F.broadcast(
                bits.select(
                    F.col("pos").alias(f"_p{j}"), F.lit(1).alias(f"_s{j}")
                )
            ),
            f"_p{j}",
            "left",
        )
    hit = F.lit(True)
    for j in range(n_hashes):
        hit = hit & F.col(f"_s{j}").isNotNull()
    return (
        probed.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("n_hits"),
        )
        .withColumn("hit_frac", F.round(F.col("n_hits") / F.col("n_spans"), 6))
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k_const: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR'09)
    of N retrieval rankings — the standard hybrid-search combiner
    (BM25 ⊕ embedding cosine ⊕ ...) for training-data curation
    queries, where each ranker sees a different signal and the fused
    list is more robust than any one of them.

    Each input DataFrame carries (id_col, rank) with 1-based ranks;
    a document's fused score is the sum over the lists containing it
    of 1e6 div (k_const + rank) — INTEGER arithmetic throughout
    (truncating div), so the fused scores replay bit-for-bit in any
    engine; k=60 is the paper's constant.

    Scale shape: a union of the (already small, top-k) ranked lists
    followed by one hash aggregate keyed by id. The expensive parts
    are the upstream rankers; fusion itself never touches the corpus.

    Returns (id_col, n_lists, rrf_micros).
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    from functools import reduce

    contribs = [
        r.select(
            F.col(id_col),
            F.expr(f"1000000 div ({int(k_const)} + rank)")
            .cast("long")
            .alias("_c"),
        )
        for r in rankings
    ]
    u = reduce(DataFrame.unionAll, contribs)
    return u.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_lists"),
        F.sum("_c").cast("long").alias("rrf_micros"),
    )


def shard_corpus(
    docs: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic shuffle-and-shard for training-data preparation:
    every document gets a pseudo-random but REPRODUCIBLE (shard, pos)
    — shard from an md5-derived hash of the id, position from the
    md5-hex order within the shard (tie-break id). This is the
    "globally shuffle the corpus, then write N shard files" step
    every pretraining run needs, without RNG: re-running on the same
    ids yields the identical permutation regardless of partition
    layout, task retries, or cluster size (same argument as
    ``stratified_sample``), and any engine can replay it.

    Scale shape (100 TB): the shard assignment is a map-side
    expression; materializing shards is
    ``repartition(n_shards, 'shard') + sortWithinPartitions('key')``
    — one shuffle, per-shard local sorts, no global order. The
    explicit ``pos`` column (a rank window per shard) is the
    CONTRACT'S value pin for the permutation; a production writer
    drops it and lets the file order carry it.

    Returns (id_col, shard, pos) with pos 1-based within shard.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    from pyspark.sql import Window

    key = F.md5(F.col(id_col).cast("string"))
    shard = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n_shards
    ).alias("shard")
    w = Window.partitionBy("shard").orderBy(F.col("_key"), F.col(id_col))
    return (
        docs.select(F.col(id_col), shard, key.alias("_key"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "shard", "pos")
    )


def mix_domains(
    docs: DataFrame,
    weights_milli: dict[str, int],
    budget_num: int = 4,
    budget_den: int = 5,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Domain-mixture resampling: given per-domain TARGET shares (in
    per-mille, the DoReMi/Pile-style mixture spec) and a token budget
    (a fraction of the corpus total), derive each domain's keep-rate
    from the data and sample deterministically to hit the mixture.
    This is the step between "measured corpus composition" and
    "training mixture the paper specifies" — `stratified_sample`
    takes rates as constants; this computes them.

    rate_d = min(1, budget * w_d / tokens_d), carried in ppm as an
    EXACT integer via two-step long division
    ``(n div d) * 1000 + ((n mod d) * 1000) div d`` with
    n = budget * w_milli — floor((n*1000)/d) without ever forming
    n*1000 (at 100 TB, budget ~ 1e13 tokens × w ≤ 1000 is 1e16;
    multiplying by 1000 again would overflow int64, the remainder
    path cannot). Membership is the repo's standard md5 threshold —
    u_ppm = (u32 * 1e6) >> 32 compared below rate_ppm — a pure
    function of the row: retry/layout-invariant, engine-replayable,
    monotone in the rate.

    Scale shape: two domain-keyed hash aggregates (map-side combined,
    bounded keys), one single-row total, a broadcast of the per-domain
    rate table, and a map-side filter. The corpus shuffles ONCE (the
    per-domain token aggregate); the sample itself never shuffles.

    Returns per domain: (stratum, w_milli, total_docs, total_toks,
    rate_ppm, kept_docs, kept_toks).
    """
    if budget_num < 0 or budget_den <= 0 or budget_num > budget_den:
        raise ValueError("budget fraction must satisfy 0 <= num <= den")
    if any(w < 0 for w in weights_milli.values()):
        raise ValueError("weights must be non-negative")
    from serd_spark.operators.text import token_count

    toks = docs.select(
        F.col(stratum_col).alias("stratum"),
        F.col(id_col).alias("_id"),
        token_count(F.col(text_col)).cast("long").alias("n_toks"),
    )
    dom = toks.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("long").alias("total_docs"),
        F.sum("n_toks").cast("long").alias("total_toks"),
    )
    total = dom.agg(
        F.sum("total_toks").cast("long").alias("_corpus_toks")
    )
    w_expr = F.lit(0).cast("long")
    for s, w in sorted(weights_milli.items()):
        w_expr = F.when(F.col("stratum") == s, F.lit(int(w))).otherwise(
            w_expr
        )
    # budget = floor(corpus_toks * num / den); n = budget * w_milli;
    # rate_ppm = min(1e6, floor(n * 1000 / total_toks)) via the
    # overflow-safe two-step division described above
    n = (
        F.expr(f"(_corpus_toks * {int(budget_num)}) div {int(budget_den)}")
        * F.col("w_milli")
    ).cast("long")
    rates = (
        dom.join(F.broadcast(total))
        .withColumn("w_milli", w_expr.cast("long"))
        .withColumn("_n", n)
        .withColumn(
            "rate_ppm",
            # total_toks = 0 (a domain of empty texts) has nothing to
            # sample — pin rate 0 BEFORE the division so ANSI mode
            # never sees a div-by-zero
            F.when(F.col("total_toks") == 0, F.lit(0).cast("long")).otherwise(
                F.least(
                    F.lit(1_000_000).cast("long"),
                    (
                        F.expr("(_n div greatest(total_toks, 1L)) * 1000")
                        + F.expr(
                            "((_n % greatest(total_toks, 1L)) * 1000)"
                            " div greatest(total_toks, 1L)"
                        )
                    ).cast("long"),
                )
            ),
        )
        .select("stratum", "w_milli", "total_docs", "total_toks", "rate_ppm")
    )
    u32 = F.conv(
        F.substring(F.md5(F.col("_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    u_ppm = F.shiftright(u32 * F.lit(1_000_000), 32)
    kept = (
        toks.join(F.broadcast(rates.select("stratum", "rate_ppm")), "stratum")
        .filter(u_ppm < F.col("rate_ppm"))
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).cast("long").alias("kept_docs"),
            F.sum("n_toks").cast("long").alias("kept_toks"),
        )
    )
    return (
        rates.join(kept, "stratum", "left")
        .select(
            "stratum",
            "w_milli",
            "total_docs",
            "total_toks",
            "rate_ppm",
            F.coalesce(F.col("kept_docs"), F.lit(0).cast("long")).alias(
                "kept_docs"
            ),
            F.coalesce(F.col("kept_toks"), F.lit(0).cast("long")).alias(
                "kept_toks"
            ),
        )
    )


def pmi_collocations(
    docs: DataFrame,
    top_k: int = 50,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """PMI collocation mining — the phrase-discovery pass (Mikolov
    et al.'s word2vec phrase step, Church & Hanks' original PMI) that
    turns a corpus into a multiword-expression vocabulary for
    tokenizer curricula and gazetteer seeding:

        pmi(a, b) = ln( p(ab) / (p(a) * p(b)) )

    with p(ab) = c(ab)/N_pairs over adjacent token pairs and
    p(a) = c(a)/N_toks over unigrams. Pairs with c(ab) < ``min_count``
    are dropped first (the classic low-count PMI blowup guard), and
    the result is the top ``top_k`` by (pmi DESC, a ASC, b ASC) — a
    TakeOrderedAndProject, never a global sort.

    Cross-engine exactness: the PMI argument is evaluated as DOUBLE in
    a pinned parenthesization —
    ``((c_ab * N_toks) / N_pairs) * (N_toks / (c_a * c_b))`` — then
    ln'd and rounded to integer MICROS; identical IEEE ops on
    identical integers agree bit-for-bit in both engines (integer
    products are NOT formed in int64, where ``c_ab * N_toks^2`` would
    overflow at web scale).

    Scale shape (100 TB): pairs come from the shifted token array
    (JVM-side, never a positional self-join); both count tables are
    hash aggregates with map-side combine; the unigram joins key the
    (already min_count-pruned) pair table by word — sort-merge at
    scale, AQE-broadcast when small. N_pairs/N_toks are single-row
    broadcasts.

    Returns (a, b, n_pair, pmi_micros)."""
    docs = _min_parallelism(docs)
    toks = F.filter(F.split(_norm(F.col(text_col)), " "), lambda x: x != "")
    d = docs.select(toks.alias("toks"))
    words = d.select(F.explode("toks").alias("w"))
    # both count tables feed MULTIPLE consumers (totals + the two
    # unigram join sides / totals + the top-k input); checkpointing
    # the vocabulary-sized aggregates keeps the corpus tokenization
    # at ONE pass per stream instead of one per consumer (the repo
    # convention for reused mid-plans, cf. span_dedup_stats)
    uc = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c_w"))
        .localCheckpoint(eager=False)
    )
    pairs = d.filter(F.size("toks") >= 2).select(
        F.explode(
            F.expr(
                "transform(slice(toks, 1, size(toks) - 1),"
                " (x, i) -> struct(x AS a, toks[i + 1] AS b))"
            )
        ).alias("pr")
    ).select(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
    pc = pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("n_pair")
    ).localCheckpoint(eager=False)
    totals = uc.agg(F.sum("c_w").cast("long").alias("n_toks")).crossJoin(
        pc.agg(F.sum("n_pair").cast("long").alias("n_pairs"))
    )
    ca = uc.select(F.col("w").alias("a"), F.col("c_w").alias("c_a"))
    cb = uc.select(F.col("w").alias("b"), F.col("c_w").alias("c_b"))
    arg = (
        F.col("n_pair").cast("double")
        * F.col("n_toks").cast("double")
        / F.col("n_pairs").cast("double")
    ) * (
        F.col("n_toks").cast("double")
        / (F.col("c_a").cast("double") * F.col("c_b").cast("double"))
    )
    return (
        pc.filter(F.col("n_pair") >= min_count)
        .join(ca, "a")
        .join(cb, "b")
        .crossJoin(F.broadcast(totals))
        .select(
            "a",
            "b",
            "n_pair",
            F.round(F.log(arg) * 1e6).cast("long").alias("pmi_micros"),
        )
        .orderBy(F.desc("pmi_micros"), F.asc("a"), F.asc("b"))
        .limit(top_k)
    )


def ccnet_buckets(
    docs: DataFrame,
    vocab_size: int = 65536,
    cuts_permille: tuple[int, int] = (333, 667),
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style perplexity bucketing: split each language's
    documents into head / middle / tail thirds by LM score — the
    step CCNet (and the LLaMA data pipeline after it) uses to keep
    "head" (most Wikipedia-like) text and drop or downweight the
    tail, applied PER LANGUAGE so high-resource languages don't set
    the bar for low-resource ones.

    The score is ``bigram_logprob``'s lp_mean_micros (mean token
    log-prob; perplexity = exp(-lp_mean), so DESCENDING lp_mean is
    ASCENDING perplexity). Cuts are exact per-language quantiles at
    ``cuts_permille`` via ``stats.exact_quantiles``' rank rule
    (smallest value with cumcount >= ceil(q*n/1000) over the
    distinct-value table): head = lp_mean >= the 667-permille cut,
    middle = >= the 333 cut, tail otherwise — ties promote to the
    better bucket, deterministically.

    Scale shape (100 TB): the score table is one row per document;
    cuts come from the distinct-value cumsum window per language
    (never a sort of the data). When even the per-language
    distinct-score table gets large, swap ``stats.hdr_sketch``
    quantile estimates in for the cut values — the bucket CASE and
    everything downstream is unchanged. The two-column cut table is
    broadcast back onto the scores.

    Returns (id_col, lang, lp_mean_micros, bucket)."""
    from serd_spark.operators.stats import exact_quantiles

    lo, hi = cuts_permille
    scores = bigram_logprob(
        docs.select(id_col, text_col),
        vocab_size=vocab_size,
        text_col=text_col,
        id_col=id_col,
    ).join(docs.select(id_col, lang_col), id_col)
    cuts = exact_quantiles(
        scores, "lp_mean_micros", [lo, hi], by=[lang_col]
    )
    wide = (
        cuts.filter(F.col("q_permille") == lo)
        .select(lang_col, F.col("value").alias("_c_lo"))
        .join(
            cuts.filter(F.col("q_permille") == hi).select(
                lang_col, F.col("value").alias("_c_hi")
            ),
            lang_col,
        )
    )
    return scores.join(F.broadcast(wide), lang_col).select(
        id_col,
        lang_col,
        "lp_mean_micros",
        F.when(F.col("lp_mean_micros") >= F.col("_c_hi"), F.lit("head"))
        .when(F.col("lp_mean_micros") >= F.col("_c_lo"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def crawl_stats(
    pages: DataFrame, url_col: str = "url", ts_col: str = "warc_ts"
) -> DataFrame:
    """Crawl-freshness roll-up — the recrawl-scheduling input of a
    crawler: per host, how many URLs exist, how often they were
    fetched, how many were fetched MORE than once, and the total
    first-to-last fetch span — the table a frontier scheduler reads
    to decide which hosts deserve recrawl budget.

    Two hash aggregates, both map-side-combined: (url) collapses the
    fetch log to one row per URL (the same shuffle shape as
    ``latest_crawl``'s ingest dedup — counters, never page bytes),
    then (host) rolls up a bounded keyspace. Timestamps are compared
    as epoch SECONDS in int64 (``cast(timestamp as long)`` — no
    timezone or float ambiguity for any engine).

    Returns (host, n_urls, n_fetches, n_refetched, sum_gap_sec)."""
    per_url = (
        pages.select(
            F.col(url_col).alias("_u"),
            F.col(ts_col).cast("long").alias("_t"),
        )
        .groupBy("_u")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.min("_t").alias("_t0"),
            F.max("_t").alias("_t1"),
        )
    )
    return (
        per_url.select(
            url_host(F.col("_u")).alias("host"), "_n", "_t0", "_t1"
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.sum("_n").cast("long").alias("n_fetches"),
            F.sum(F.when(F.col("_n") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_refetched"),
            F.sum(F.col("_t1") - F.col("_t0")).cast("long").alias(
                "sum_gap_sec"
            ),
        )
    )


def mask_rare_tokens(
    docs: DataFrame,
    min_count: int = 2,
    unk: str = "<unk>",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rare-token scrubbing — the memorization-mitigation rewrite
    (mask every token occurring fewer than ``min_count`` times in the
    corpus): unique strings are where verbatim memorization and
    residual PII live, so pretraining pipelines replace them with an
    UNK sentinel while keeping sentence structure.

    Plan: one token-count aggregate builds the KEEP vocabulary
    (tokens with count >= min_count — the bounded side: Zipf means
    the frequent vocabulary is tiny next to the token stream), then
    the token stream left-joins it (broadcast at vocabulary scale,
    (w)-keyed shuffle join past it) and each document reassembles
    with an order-pinned string_agg by token position. The rewrite
    inherently shuffles (doc, pos, token) rows once — that is the
    op's floor, not an artifact.

    Returns (id_col, n_toks, n_masked, masked_md5) — the md5 pins the
    full rewritten text (content AND order) without hauling it
    through the compare."""
    docs = _min_parallelism(docs)
    toks = F.filter(F.split(_norm(F.col(text_col)), " "), lambda x: x != "")
    pos = docs.select(
        F.col(id_col), F.posexplode(toks).alias("pos", "w")
    )
    keep = (
        pos.groupBy("w")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("w", F.lit(1).alias("_keep"))
    )
    masked = pos.join(F.broadcast(keep), "w", "left").select(
        id_col,
        "pos",
        F.when(F.col("_keep").isNotNull(), F.col("w"))
        .otherwise(F.lit(unk))
        .alias("mw"),
        F.col("_keep").isNull().cast("long").alias("is_masked"),
    )
    return masked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_toks"),
        F.sum("is_masked").cast("long").alias("n_masked"),
        F.md5(
            F.concat_ws(
                " ", F.array_sort(
                    F.collect_list(F.struct("pos", "mw"))
                ).getField("mw")
            ).cast("binary")
        ).alias("masked_md5"),
    )


def token_entropy(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document token-distribution Shannon entropy — the
    vocabulary-diversity quality signal (near-zero entropy = the same
    token repeated, i.e. keyboard mash / padding / SEO stuffing;
    entropy near ln(n) = every token distinct), complementing
    ``text.repetition_features``\' type-token ratio with a
    frequency-weighted measure.

    entropy_micros = ( SUM_w round(c_w * ln(n / c_w) * 1e6) ) div n

    — each (doc, token) term is micro-rounded BEFORE the per-doc sum
    (the repo-wide float rule); every term is non-negative (c <= n),
    so the integer div IS the floor and any engine reproduces the
    result exactly.

    Shape: one (doc, token) hash aggregate (map-side combine absorbs
    within-partition repeats), a per-doc totals aggregate over that
    (already distinct-token-sized) table, and a join back — no
    corpus-sized join, no model, no broadcast beyond AQE\'s choice.
    Returns (id_col, n_toks, n_types, entropy_micros) for every
    document with >= 1 token."""
    docs = _min_parallelism(docs)
    toks = F.filter(F.split(_norm(F.col(text_col)), " "), lambda x: x != "")
    counts = (
        docs.select(F.col(id_col), F.explode(toks).alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    totals = counts.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_toks"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    terms = counts.join(totals, id_col).select(
        id_col,
        "n_toks",
        "n_types",
        F.round(
            F.col("c").cast("double")
            * F.log(
                F.col("n_toks").cast("double") / F.col("c").cast("double")
            )
            * 1e6
        )
        .cast("long")
        .alias("t"),
    )
    return (
        terms.groupBy(id_col, "n_toks", "n_types")
        .agg(F.sum("t").cast("long").alias("_s"))
        .select(
            id_col,
            "n_toks",
            "n_types",
            F.expr("_s div n_toks").cast("long").alias("entropy_micros"),
        )
    )


def _norm_tokens(col: Column) -> Column:
    """Whitespace-normalize-then-split tokenization shared by
    chunking and boilerplate (and mirrored verbatim in their SQL
    oracles). The class is EXPLICIT — Java's \\s matches \\x0B
    (vertical tab) but RE2's does not, so \\s would silently
    tokenize differently across engines (CLAUDE.md blesses only
    \\p{L}/\\p{N}; this is the same discipline for spaces)."""
    return F.split(
        F.trim(F.regexp_replace(col, "[ \\t\\n\\r\\f\\x0B]+", " ")), " "
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping token-window chunking — the RAG / embedding-prep
    primitive (split every document into ``chunk_tokens``-word windows
    advancing by ``chunk_tokens - overlap``, so consecutive chunks
    share ``overlap`` words and no sentence straddles a hard cut
    unwitnessed).

    Determinism + cross-engine replay: tokenization is
    whitespace-normalize-then-split-on-single-space (identical in
    Spark and DuckDB regex engines); chunk identity is (doc_id,
    chunk_idx) with chunk_idx dense from 0 in word order — no hashes,
    no RNG. Whitespace-only documents produce zero chunks (not one
    empty chunk).

    Scale shape (100 TB): fully JVM-side — one codegen'd
    regexp_replace + split, a ``sequence``/``posexplode`` fan-out
    (output rows ∝ input tokens / stride, the same asymptotics as the
    downstream embedding pass it feeds), and ``slice``/``array_join``
    per chunk. No shuffle at all: chunking is embarrassingly
    row-parallel and stays in the scan stage."""
    if not (0 <= overlap < chunk_tokens):
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = _norm_tokens(F.col(text_col))
    d = docs.select(
        F.col(id_col),
        toks.alias("_toks"),
    ).withColumn("_n", F.size("_toks"))
    d = d.filter((F.col("_n") > 0) & (F.element_at("_toks", 1) != ""))
    starts = F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
    return (
        d.select(
            id_col,
            "_toks",
            "_n",
            F.posexplode(starts).alias("chunk_idx", "_start"),
        )
        # drop a trailing window fully contained in its predecessor
        # (start + overlap >= n ⇔ the previous chunk already covers
        # the tail) — only ever the LAST start, so chunk_idx stays
        # dense
        .filter((F.col("_start") == 0)
                | (F.col("_start") + overlap < F.col("_n")))
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("int"),
            F.array_join(
                F.slice("_toks", F.col("_start") + 1, chunk_tokens), " "
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_tokens), F.col("_n") - F.col("_start")
            ).cast("int").alias("n_tokens"),
        )
    )


def split_by_key(
    docs: DataFrame,
    train: float = 0.9,
    valid: float = 0.05,
    key_col: str = "source",
) -> DataFrame:
    """Leakage-safe deterministic train/valid/test split: every row
    with the same ``key_col`` (site, source, registered domain) lands
    in the SAME split, so near-duplicates within a site can never
    straddle the train/eval boundary — the document-level random
    split's classic leak. Membership is a pure function of the key
    (md5-hex threshold, the ``stratified_sample`` discipline): no RNG,
    no count pass, retry/partition-invariant, and any engine
    reproduces it byte-for-byte.

    Scale shape (100 TB): adds one codegen'd md5 + two string
    compares per row — no shuffle, no broadcast, no state. Returns
    the input plus a ``split`` column ('train' | 'valid' | 'test')."""
    if not (0 < train < 1 and 0 <= valid < 1 and train + valid <= 1):
        raise ValueError("need 0 < train < 1, 0 <= valid, train+valid <= 1")
    bucket = F.substring(F.md5(F.col(key_col).cast("string")), 1, 8)
    t_train = _rate_hex(train)
    t_valid = _rate_hex(train + valid)
    return docs.withColumn(
        "split",
        F.when(bucket < F.lit(t_train), F.lit("train"))
        .when(bucket < F.lit(t_valid), F.lit("valid"))
        .otherwise(F.lit("test")),
    )


def host_boilerplate(
    docs: DataFrame,
    host_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_share_permille: int = 400,
    min_count: int = 2,
) -> DataFrame:
    """Shared-prefix boilerplate detection — the crawl-curation step
    that finds cookie banners / nav headers repeated across one
    site's pages so they can be stripped before training (repeated
    boilerplate dominates n-gram counts and poisons dedup).

    A document's candidate prefix is its first ``k`` normalized
    tokens; a prefix is boilerplate for a host when at least
    ``min_count`` documents share it AND it covers at least
    ``min_share_permille``/1000 of the host's documents (integer
    permille — no float thresholds, cross-engine exact).

    Scale shape (100 TB): groupBy (host, prefix) with map-side
    combine (distinct prefixes ≤ documents, and sharing collapses the
    hot ones), a per-host total via one more bounded hash agg, and a
    broadcast-sized output (hosts × few banners). Returns
    (host, prefix, n_docs, host_docs, share_permille)."""
    toks = _norm_tokens(F.col(text_col))
    d = docs.select(
        F.col(host_col).alias("host"),
        F.array_join(F.slice(toks, 1, k), " ").alias("prefix"),
    ).filter(F.col("prefix") != "")
    per_prefix = d.groupBy("host", "prefix").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    # host totals derive from the per-prefix table (sum of n_docs),
    # NOT a second corpus scan: one aggregation touches the text,
    # the roll-up runs over the already-collapsed prefix keyspace
    per_host = per_prefix.groupBy("host").agg(
        F.sum("n_docs").cast("long").alias("host_docs")
    )
    return (
        per_prefix.join(per_host, "host")
        .withColumn(
            "share_permille",
            F.expr("n_docs * 1000 div host_docs").cast("long"),
        )
        .filter(
            (F.col("n_docs") >= min_count)
            & (F.col("share_permille") >= min_share_permille)
        )
    )


def strip_boilerplate(
    docs: DataFrame,
    boilerplate: DataFrame,
    host_col: str = "source",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Remove detected boilerplate prefixes: a document whose first
    ``k`` normalized tokens equal one of its host's boilerplate
    prefixes loses them. The join key is (host, own-k-prefix) —
    EXACT equality, so each document matches at most one banner and
    rows never inflate. Broadcast join against the banner table
    (hosts × few prefixes — always tiny next to the corpus), so the
    corpus never shuffles; adds ``stripped`` (0/1) and rewrites
    ``text_col`` normalized."""
    norm = F.array_join(_norm_tokens(F.col(text_col)), " ")
    own = F.array_join(F.slice(_norm_tokens(F.col(text_col)), 1, k), " ")
    bp = boilerplate.select(
        F.col("host").alias(host_col),
        F.col("prefix").alias("_bp_prefix"),
    )
    joined = (
        docs.withColumn("_norm", norm)
        .withColumn("_own", own)
        .join(
            F.broadcast(bp),
            on=[
                docs[host_col] == bp[host_col],
                F.col("_own") == F.col("_bp_prefix"),
            ],
            how="left",
        )
        .drop(bp[host_col])
    )
    hit = F.col("_bp_prefix").isNotNull()
    out_text = F.when(
        hit, F.ltrim(F.expr("substring(_norm, length(_bp_prefix) + 1)"))
    ).otherwise(F.col("_norm"))
    return (
        joined.withColumn("stripped", hit.cast("int"))
        .withColumn(text_col, out_text)
        .drop("_norm", "_own", "_bp_prefix")
    )


def crawl_delta(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    payload_col: str = "html",
) -> DataFrame:
    """Snapshot diff between two crawls — the incremental-ingest
    planner's input (recrawl scheduling, delta-only reprocessing:
    at 100 TB you re-extract the CHANGED slice, not the corpus).
    Classifies every url as 'added' | 'removed' | 'changed' |
    'unchanged' via a FULL OUTER join on url with md5 content
    comparison (md5 over the payload bytes — cheap, engine-portable,
    and collision-irrelevant for change detection).

    PRECONDITION: each side must be url-UNIQUE — a crawl *snapshot*,
    i.e. one (latest) payload per url. Compose with
    ``sources.pages.latest_crawl`` (the map-side ``max_by`` ingest
    dedup) first; feeding a raw fetch log fans the full-outer join
    out N×M per re-crawled url and can classify one url two ways.

    Scale shape: one shuffle keyed by url on each side (or zero with
    url-bucketed crawl tables — materialize.write_bucketed_table);
    the hash is computed scan-side so the join carries (url, 32-byte
    hash), never payloads. Returns (url, status, old_hash,
    new_hash)."""
    o = old.select(
        F.col(url_col).alias("url"),
        F.md5(F.col(payload_col)).alias("old_hash"),
    )
    n = new.select(
        F.col(url_col).alias("url"),
        F.md5(F.col(payload_col)).alias("new_hash"),
    )
    j = o.join(n, "url", "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") == F.col("new_hash"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select("url", status.alias("status"), "old_hash", "new_hash")


def anchor_text(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    top_k: int = 3,
    max_text: int = 200,
) -> DataFrame:
    """Anchor-text aggregation per link target — the classic web
    relevance signal (what OTHER pages call a URL describes it better
    than the URL itself; search engines and crawl prioritizers both
    key on it).

    Extraction is one codegen'd ``regexp_extract_all`` over the page
    bytes (whole ``<a …href…>text</a>`` snippets), then per-snippet
    href/text captures — all JVM regex, zero Python. Anchor text is
    trimmed, lowercased, and length-capped at extraction.

    Scale shape (100 TB): two shuffles, both small — the
    (dst, anchor) count aggregate (map-side combine collapses
    repeated boilerplate anchors, by far the common case), then the
    per-dst top-``top_k`` rank, which Catalyst compiles to
    WindowGroupLimit (map-side top-cap before the exchange — the
    ``cap_per_domain`` plan finding). No full-text column crosses
    either shuffle: only (dst, anchor≤``max_text`` chars, count).

    Returns (dst, anchor, n, rank) with rank ≤ ``top_k`` per dst,
    ties broken by anchor text for determinism."""
    from pyspark.sql import Window

    pat = r'<a\s[^>]*href="([^"]*)"[^>]*>([^<]{1,%d})</a>' % max_text
    snips = F.regexp_extract_all(
        F.col(html_col).cast("string"), F.lit(pat), 0
    )
    ex = pages.select(F.explode(snips).alias("snip"))
    pairs = ex.select(
        F.regexp_extract("snip", pat, 1).alias("dst"),
        F.lower(F.trim(F.regexp_extract("snip", pat, 2))).alias("anchor"),
    ).filter((F.col("dst") != "") & (F.col("anchor") != ""))
    counts = pairs.groupBy("dst", "anchor").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("dst").orderBy(F.desc("n"), "anchor")
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )


def strip_duplicated_spans(
    docs: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring REMOVAL (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better") — the rewrite pass
    behind ``span_dedup_stats``'s signal: every corpus-duplicated
    k-token span keeps exactly ONE occurrence (the globally smallest
    (doc_id, position) — a total order both engines can replay) and
    every other occurrence's k tokens are removed, with overlapping
    removals unioned.

    Shape at 100 TB: positioned span hashes explode map-side; one
    hash aggregate per span computes (count, argmin winner) with
    map-side combine; only DUPLICATED spans join back (web corpora
    are mostly unique spans); removal start positions collapse to a
    small per-doc array; the rebuild is ONE numpy mapInPandas
    crossing using an O(n) diff/cumsum interval-union — never a
    per-(token, interval) membership test.  Output text is the
    NORMALIZED form (the span identity is defined over it).

    Returns (id_col, n_tokens, n_removed, kept_text).
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    docs = _min_parallelism(docs)
    norm = _norm(F.col(text_col))
    toks = F.split(norm, " ")
    n = F.size(toks)
    spans_pos = F.when(
        n < k,
        F.array(
            F.struct(F.lit(1).alias("pos"), F.xxhash64(norm).alias("span"))
        ),
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.struct(
                i.alias("pos"), F.xxhash64(F.slice(toks, i, k)).alias("span")
            ),
        )
    )
    occ = docs.select(
        F.col(id_col), F.explode(spans_pos).alias("ps")
    ).select(id_col, F.col("ps.pos").alias("pos"), F.col("ps.span").alias("span"))
    per_span = occ.groupBy("span").agg(
        F.count(F.lit(1)).alias("tot"),
        F.min(F.struct(id_col, "pos")).alias("winner"),
    )
    removal = (
        occ.join(per_span.filter(F.col("tot") > 1), "span")
        .filter(
            ~(
                (F.col(id_col) == F.col("winner." + id_col))
                & (F.col("pos") == F.col("winner.pos"))
            )
        )
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("starts"))
    )
    joined = docs.select(
        F.col(id_col), norm.alias("_norm")
    ).join(removal, id_col, "left")

    def rebuild(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, n_toks, n_rm, kept = [], [], [], []
            for did, t, starts in zip(
                pdf[id_col], pdf["_norm"], pdf["starts"]
            ):
                # ''.split(' ') == [''] matches the JVM/SQL
                # string_split semantics (an empty doc is ONE empty
                # token — the span layer already hashes it that way)
                words = ("" if t is None else t).split(" ")
                nw = len(words)
                ids.append(did)
                n_toks.append(nw)
                if starts is None or len(starts) == 0:
                    n_rm.append(0)
                    kept.append("" if t is None else t)
                    continue
                # interval union via diff/cumsum: O(n + |starts|)
                diff = np.zeros(nw + 1, dtype=np.int64)
                s0 = np.asarray(starts, dtype=np.int64) - 1  # 0-based
                np.add.at(diff, s0, 1)
                ends = np.minimum(s0 + k, nw)
                np.add.at(diff, ends, -1)
                covered = np.cumsum(diff[:nw]) > 0
                n_rm.append(int(covered.sum()))
                kept.append(
                    " ".join(
                        w for w, c in zip(words, covered) if not c
                    )
                )
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_tokens": n_toks,
                    "n_removed": n_rm,
                    "kept_text": kept,
                }
            )

    return joined.mapInPandas(
        rebuild,
        schema=f"{id_col} long, n_tokens long, n_removed long, "
        "kept_text string",
    )


def c4_line_filters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 3,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2) — the
    rule set the original "Colossal Clean Crawled Corpus" applied to
    every Common-Crawl page before document-level filtering:

    - keep only lines ending in terminal punctuation (. ! ? or a
      closing double quote),
    - drop lines with fewer than ``min_words`` whitespace words,
    - drop lines containing a curly brace (code markup),
    - drop lines whose lowercase contains "lorem ipsum".

    Entirely row-local: one ``split`` on newline + a HOF ``filter``
    with pure predicates + ``array_join`` back — no explode, no
    shuffle, WholeStageCodegen end to end (the line table never
    materializes, unlike the explode+filter+re-group formulation
    which pays two shuffles for the same answer). At 100 TB this is
    a scan-speed map pass, and every predicate is in the Java∩RE2
    regex subset so the DuckDB mirror replays it with list_filter.

    Returns ``(id_col, n_lines, n_kept, kept_text)`` — kept lines
    re-joined with newline; no-surviving-line documents keep ''.
    """
    lines = F.split(F.col(text_col), "\n")

    def keep(line: Column) -> Column:
        t = F.trim(line)
        words = F.size(F.split(t, r"\s+"))
        return (
            t.rlike('[.!?"]$')
            & (F.length(t) > 0)
            & (words >= min_words)
            & ~t.contains("{")
            & ~t.contains("}")
            & ~F.lower(t).contains("lorem ipsum")
        )

    kept = F.filter(lines, keep)
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        # explicit unary lambda: F.transform would otherwise feed the
        # element INDEX into trim's two-parameter (str, trimStr) form
        F.array_join(
            F.transform(kept, lambda x: F.trim(x)), "\n"
        ).alias("kept_text"),
    )
