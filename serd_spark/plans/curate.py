"""Training-corpus curation pipeline — the end-to-end composition of
the training-data operators (OPERATORS.md "Training-data pipeline
ops") that a 100 TB pre-training corpus build runs after extraction:

    documents → language filter → quality filter → [unigram-LM floor]
    → exact dedup → [duplicated-span cap] → MinHash near-dup removal
    → [benchmark decontamination] → curated corpus + per-stage
    survival metrics   (bracketed stages optional, default-off)

Scale posture:
- language + quality filters are pure WholeStageCodegen expressions —
  they run at scan speed and Catalyst pushes projections down;
- exact dedup shuffles only (fingerprint, id) pairs, never text;
- near-dup removal reuses the banded-LSH machinery (cost ∝ duplicate
  mass, bucket-capped) and keeps the MIN id of each near-dup pair
  group (deterministic survivor selection);
- every stage emits its survivor count into a metrics row, so the
  curation yield is one tiny DataFrame, not a log grep.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from serd_spark.operators.dedup import drop_exact_dups, minhash_near_dups
from serd_spark.operators.text import lang_id, quality_features


@dataclass
class CurationResult:
    curated: DataFrame
    metrics: list[tuple[str, int]] = field(default_factory=list)
    # the near-dup ids dropped in stage 4 (one column named id_col) —
    # exposed so external oracles can replay the final subtraction
    losers: DataFrame | None = None


def curate_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_langs: tuple[str, ...] = ("en",),
    min_tokens: int = 5,
    max_mean_word_len: float = 20.0,
    max_punct_ratio: float = 0.3,
    near_dup_threshold: float = 0.8,
    min_lp_mean_micros: int | None = None,
    max_dup_span_frac: float | None = None,
    benchmark: DataFrame | None = None,
    max_hit_frac: float = 0.0,
    decontam_k: int = 13,
    collect_metrics: bool = True,
) -> CurationResult:
    """Filter-and-dedup chain with per-stage survivor metrics.

    Optional stages (both default-off, preserving the classic
    5-stage funnel):
    - ``min_lp_mean_micros``: after the quality filter, drop documents
      whose mean unigram log-probability (model fit on the surviving
      corpus itself, integer micros — see corpus.unigram_logprob) is
      below the floor: the cheap deterministic stand-in for
      perplexity filtering of gibberish.
    - ``max_dup_span_frac``: after exact dedup, drop documents whose
      corpus-duplicated k-token span fraction exceeds the cap
      (boilerplate / template-heavy pages).

    ``collect_metrics=False`` skips the per-stage counts (each is an
    action) for production runs that only want the final frame.
    """
    metrics: list[tuple[str, int]] = []

    def note(stage: str, df: DataFrame) -> DataFrame:
        if collect_metrics:
            # checkpoint so each stage is computed once (the count
            # would otherwise re-run every upstream stage per action)
            df = df.localCheckpoint(eager=True)
            metrics.append((stage, df.count()))
        return df

    docs = note("input", docs)

    # 1. language filter (heuristic lang-ID, not the metadata column)
    by_lang = note(
        "lang_filter",
        docs.filter(lang_id(F.col(text_col)).isin(*keep_langs)),
    )

    # 2. quality filter
    q = quality_features(by_lang, text_col)
    good = note(
        "quality_filter",
        q.filter(
            (F.col("q_tokens") >= min_tokens)
            & (F.col("q_mean_word_len") <= max_mean_word_len)
            & (F.col("q_punct_ratio") <= max_punct_ratio)
        ).select(*docs.columns),
    )

    # 2.5 (optional) unigram-LM score floor
    if min_lp_mean_micros is not None:
        from serd_spark.operators.corpus import unigram_logprob

        lm = unigram_logprob(good, text_col=text_col, id_col=id_col)
        keep = lm.filter(
            F.col("lp_mean_micros") >= min_lp_mean_micros
        ).select(id_col)
        good = note("lm_filter", good.join(keep, id_col, "left_semi"))

    # 3. exact dedup (normalized-content fingerprint, min-id survivor)
    exact = note("exact_dedup", drop_exact_dups(good, id_col, text_col))

    # 3.5 (optional) duplicated-span fraction cap
    if max_dup_span_frac is not None:
        from serd_spark.operators.corpus import span_dedup_stats

        spans = span_dedup_stats(exact, text_col=text_col, id_col=id_col)
        keep = spans.filter(
            F.col("dup_frac") <= max_dup_span_frac
        ).select(id_col)
        exact = note("span_filter", exact.join(keep, id_col, "left_semi"))

    # 4. near-dup removal: from each MinHash-verified pair, drop the
    # larger id (transitively: keeping ids that are never the larger
    # member removes every near-dup cluster down to its min id when
    # the cluster is LSH-connected pairwise; stragglers are bounded
    # by LSH recall, the standard trade-off)
    pairs = minhash_near_dups(
        exact, id_col, text_col, threshold=near_dup_threshold
    )
    # LSH machinery compares ids as STRINGS ('10' < '9'), so re-derive
    # the loser on the original numeric id: the NUMERICALLY larger
    # member of each pair is dropped, keeping the min-id survivor
    # consistent with exact_dedup's contract.
    idt = dict(exact.dtypes)[id_col]
    losers = pairs.select(
        F.greatest(
            F.col("entity_a").cast(idt), F.col("entity_b").cast(idt)
        ).alias(id_col)
    ).distinct()
    curated = note(
        "near_dup_removal", exact.join(losers, id_col, "left_anti")
    )

    # 5. (optional) benchmark decontamination — LAST, on the smallest
    # candidate set (the RefinedWeb ordering): drop documents whose
    # k-gram overlap with the evaluation benchmark exceeds the cap
    # (0.0 = any hit drops the document). Safe as a semi-join because
    # span_hashes guarantees >= 1 span per document.
    if benchmark is not None:
        from serd_spark.operators.corpus import decontaminate

        hits = decontaminate(
            curated, benchmark, k=decontam_k, text_col=text_col, id_col=id_col
        )
        # compare UNROUNDED: hit_frac is rounded to 6 dp, so a huge
        # document with one hit would round to 0.0 and slip a strict
        # max_hit_frac=0.0 gate; n_hit <= frac * n_spans is exact at
        # 0.0 (requires n_hit == 0) and unrounded elsewhere
        keep = hits.filter(
            F.col("n_hit") <= F.lit(max_hit_frac) * F.col("n_spans")
        ).select(id_col)
        curated = note(
            "decontaminate", curated.join(keep, id_col, "left_semi")
        )

    return CurationResult(curated=curated, metrics=metrics, losers=losers)


def metrics_df(spark, result: CurationResult) -> DataFrame:
    return spark.createDataFrame(
        result.metrics, "stage string, n_docs long"
    )
