"""Weak-label document classification and dictionary tagging.

Two corpus-pass operators that the big LLM-data pipelines run right
after the cheap per-row filters (``operators/text.py``) and before
sampling:

- ``nb_quality``: the GPT-3 / PaLM-style *quality classifier* —
  train a text classifier on weak labels (a trusted source set vs the
  rest of the crawl) and score EVERY document with it, keeping docs
  the classifier finds reference-like. Here it is a multinomial Naive
  Bayes with add-1 smoothing: the one classifier family whose training
  *is* a hash aggregate and whose scoring *is* a broadcast join — no
  gradient loop, no float accumulation order, so the whole thing is
  exactly replayable by a SQL oracle.
- ``gazetteer_mentions``: dictionary-based entity-mention extraction
  (the FlashText/Aho-Corasick use case) — match a broadcast gazetteer
  of 1- and 2-token surface forms against every document and emit the
  mention table that seeds KG entity linking (``operators/linking.py``
  consumes exactly such (doc, surface-form) tables).

Scale notes (100 TB):
- ``nb_quality`` training is ONE hash aggregate over the token stream
  keyed by word (map-side combine absorbs within-partition repeats; the
  conditional class split rides along as a SUM(y), the same
  one-pass-two-distributions trick as ``corpus.dsir_weights``); the
  class/prior totals are one tiny agg over the model table. Scoring
  re-derives the token stream (recomputing beats materializing a
  token table larger than the corpus) and joins the broadcast model;
  past broadcast scale the identical plan becomes a shuffle join keyed
  by word — same escape hatch as ``corpus.bigram_logprob``.
- ``gazetteer_mentions`` never shuffles text: unigram and bigram
  streams are formed JVM-side from the per-document token array (the
  shifted-array ``transform``, never a positional self-join), each is
  inner-joined against its broadcast dictionary arity, and only
  (doc_id, entity, counters) rows survive to the aggregate.

Determinism: all log terms are rounded to integer MICROS per model
row before any cross-row sum (the repo-wide rule — float associativity
can never matter); gazetteer matching compares normalized token
strings byte-for-byte. Both operators are independently replayed by
DuckDB oracles in ``__spark_entry__.py`` (q_nb_quality, q_gazetteer).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from serd_spark.operators.corpus import _min_parallelism, _norm


def _toks(text_col: str) -> Column:
    """Normalized non-empty token array — the corpus.py tokenizer,
    shared so classifier and gazetteer see identical tokens."""
    return F.filter(F.split(_norm(F.col(text_col)), " "), lambda x: x != "")


def nb_quality(
    docs: DataFrame,
    pos_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Multinomial Naive Bayes quality scoring on weak labels.

    ``pos_pred`` is the weak positive-label predicate evaluated per
    document (e.g. "source is in the trusted set" — how GPT-3's
    WebText-vs-crawl classifier and PaLM's quality filter were
    trained). The model is fit on the WHOLE corpus in one aggregate,
    then every document is scored:

        llr(w)  = lp_pos(w) - lp_neg(w)
        lp_c(w) = round(ln((c_c(w) + 1) / (T_c + V)) * 1e6)   [micros]
        score(d) = prior + sum over d's tokens of llr(w)
        prior    = round(ln((n_pos + 1) / (n_neg + 1)) * 1e6)

    with c_c(w) the class token counts, T_c the class totals, V the
    corpus vocabulary size (add-1 smoothing over the shared
    vocabulary), n_c the class document counts. Scoring the training
    corpus means every token is in-vocabulary by construction — there
    is no OOV path to price.

    Returns (id_col, n_toks, llr_sum_micros, score_micros, pred) for
    every document with >= 1 token; ``pred`` = 1 iff score > 0 (the
    keep decision).
    """
    docs = _min_parallelism(docs)
    words = docs.select(
        F.col(id_col),
        pos_pred.cast("int").alias("y"),
        F.explode(_toks(text_col)).alias("w"),
    )
    # one pass, both class distributions: count(*) and the conditional
    # sum(y) ride the same map-side-combined aggregate; checkpointed
    # because BOTH the totals agg and the model projection read it —
    # without the cut each consumer would re-tokenize the corpus
    counts = (
        words.groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("c_pos"),
        )
        .localCheckpoint(eager=False)
    )
    totals = counts.agg(
        F.sum("c_pos").cast("long").alias("t_pos"),
        F.sum(F.col("n") - F.col("c_pos")).cast("long").alias("t_neg"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    model = counts.crossJoin(F.broadcast(totals)).select(
        "w",
        (
            F.round(
                F.log(
                    (F.col("c_pos") + 1)
                    / (F.col("t_pos") + F.col("v")).cast("double")
                )
                * 1e6
            ).cast("long")
            - F.round(
                F.log(
                    (F.col("n") - F.col("c_pos") + 1)
                    / (F.col("t_neg") + F.col("v")).cast("double")
                )
                * 1e6
            ).cast("long")
        ).alias("llr_micros"),
    )
    prior = docs.agg(
        F.round(
            F.log(
                (F.sum(pos_pred.cast("int")) + 1)
                / (F.sum(1 - pos_pred.cast("int")) + 1).cast("double")
            )
            * 1e6
        )
        .cast("long")
        .alias("prior_micros")
    )
    return (
        words.join(F.broadcast(model), "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_toks"),
            F.sum("llr_micros").cast("long").alias("llr_sum_micros"),
        )
        .crossJoin(F.broadcast(prior))
        .select(
            id_col,
            "n_toks",
            "llr_sum_micros",
            (F.col("llr_sum_micros") + F.col("prior_micros"))
            .cast("long")
            .alias("score_micros"),
        )
        .withColumn(
            "pred",
            (F.col("score_micros") > 0).cast("int"),
        )
    )


def gazetteer_mentions(
    docs: DataFrame,
    entities: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dictionary-based entity-mention extraction over a broadcast
    gazetteer of 1- and 2-token surface forms.

    Each entity string is normalized with the shared tokenizer rule;
    unigram entities match single tokens, bigram entities match
    adjacent token pairs (formed from the shifted token array — the
    ``corpus.bigram_logprob`` derivation, never a positional
    self-join). Longer surface forms are rejected loudly rather than
    silently partially matched.

    Returns (id_col, entity, n_mentions) — the mention table that
    seeds entity linking. A gazetteer is KBs-to-MBs vs a TB corpus,
    so both dictionary sides are broadcast; only matched
    (doc, entity, count) rows ever reach the aggregate's shuffle.
    """
    norm_ents = []
    for e in entities:
        parts = [p for p in e.strip().lower().split() if p]
        if not 1 <= len(parts) <= 2:
            raise ValueError(
                f"gazetteer entry {e!r} has {len(parts)} tokens; "
                "only 1- and 2-token surface forms are supported"
            )
        norm_ents.append((" ".join(parts), len(parts)))
    if len(set(e for e, _ in norm_ents)) != len(norm_ents):
        raise ValueError("gazetteer entries collide after normalization")
    spark = docs.sparkSession
    dict_df = spark.createDataFrame(norm_ents, "entity string, arity int")
    uni_dict = dict_df.filter(F.col("arity") == 1).select(
        F.col("entity").alias("w"), "entity"
    )
    bi_dict = dict_df.filter(F.col("arity") == 2).select(
        F.col("entity").alias("pair"), "entity"
    )

    docs = _min_parallelism(docs)
    d = docs.select(F.col(id_col), _toks(text_col).alias("toks"))
    uni = d.select(id_col, F.explode("toks").alias("w")).join(
        F.broadcast(uni_dict), "w"
    )
    bi = (
        d.filter(F.size("toks") >= 2)
        .select(
            id_col,
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, size(toks) - 1),"
                    " (x, i) -> concat(x, ' ', toks[i + 1]))"
                )
            ).alias("pair"),
        )
        .join(F.broadcast(bi_dict), "pair")
    )
    return (
        uni.select(id_col, "entity")
        .unionByName(bi.select(id_col, "entity"))
        .groupBy(id_col, "entity")
        .agg(F.count(F.lit(1)).cast("long").alias("n_mentions"))
    )


def blocklist_stats(
    docs: DataFrame,
    terms: list[str],
    max_hits_ppm: int = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Word-blocklist filtering (the C4/FineWeb "bad words" pass):
    per document, how many tokens/adjacent pairs hit a broadcast
    blocklist of 1- and 2-token phrases, the hit DENSITY in parts per
    million of the token count, and the drop decision
    (density > ``max_hits_ppm``). Density, not a raw count — a single
    incidental hit must not kill a long document (the documented C4
    false-positive failure), while hit-saturated spam must die at any
    length.

    Matching reuses ``gazetteer_mentions`` (same tokenizer, same
    shifted-array bigrams, same broadcast dictionaries); the density
    is exact integer arithmetic: hits_ppm = (n_hits * 1e6) div n_toks.

    Returns (id_col, n_toks, n_hits, hits_ppm, dropped) for every
    document with >= 1 token; dropped is an int 0/1 flag so the keep
    filter is one predicate."""
    mentions = gazetteer_mentions(
        docs, terms, text_col=text_col, id_col=id_col
    )
    hits = mentions.groupBy(id_col).agg(
        F.sum("n_mentions").cast("long").alias("n_hits")
    )
    ntok = docs.select(
        F.col(id_col), F.size(_toks(text_col)).cast("long").alias("n_toks")
    ).filter(F.col("n_toks") >= 1)
    return (
        ntok.join(hits, id_col, "left")
        .select(
            id_col,
            "n_toks",
            F.coalesce(F.col("n_hits"), F.lit(0).cast("long")).alias(
                "n_hits"
            ),
        )
        .withColumn(
            "hits_ppm",
            F.expr("(n_hits * 1000000) div n_toks").cast("long"),
        )
        .withColumn(
            "dropped",
            (F.col("hits_ppm") > F.lit(int(max_hits_ppm))).cast("int"),
        )
    )
