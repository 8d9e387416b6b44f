"""Distributed BPE (byte-pair-encoding) tokenizer training — the
subword-vocabulary step of a training-data pipeline (Sennrich et al.
2016), re-expressed for Spark.

The corpus-scale insight: BPE statistics depend only on the corpus's
WORD-FREQUENCY table, not the corpus. A 100 TB text corpus collapses
to a distinct-word table (GBs — Heaps' law) after one
groupBy(word).count() with heavy map-side combine; every training
iteration then runs over that small-but-still-distributed table.
Nothing after the first pass ever touches document text.

Each iteration is:
  1. weighted adjacent-pair counts over the current symbolization —
     an explode + hash aggregate (map-side partial combine),
     counting every adjacency like the reference implementation's
     `get_stats` (overlaps included: "aaa" counts (a,a) twice);
  2. the argmax pair with total tie-break (count DESC, left ASC,
     right ASC) — TakeOrderedAndProject(1): per-partition top-1 heap,
     one-row merge on the driver (the per-iteration `.collect()` is a
     1-row scalar, same justified pattern as
     `similarity.train_centroids`);
  3. greedy left-to-right merge of that pair in every word's symbol
     array — a JVM-side `aggregate` fold (no Python crossing), with
     lineage cut per iteration so the plan stays flat.

Determinism: the tie-break totally orders candidate merges; the fold
is a pure function of the symbol array. The DuckDB oracle replays
step 1+2 for EVERY iteration over per-iteration symbolization tables
materialized at oracle scale; the fold itself is pinned by unit +
Hypothesis tests against an independent pure-Python reference
(`tests/test_bpe.py`).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Merge(NamedTuple):
    rank: int
    left: str
    right: str
    pair_count: int


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the whitespace-split, case-folded corpus —
    the ONE pass that reads text; everything downstream is
    distinct-word-sized."""
    from serd_spark.operators.corpus import _norm

    w = F.explode(F.split(_norm(F.col(text_col)), " ")).alias("word")
    return (
        docs.select(w)
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def char_symbols(col: Column) -> Column:
    """Initial symbolization: one symbol per character (codepoint).
    Empty string → empty array (split('') would yield [''])."""
    return F.when(
        F.length(col) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(col, ""))


def adjacent_pairs(syms: Column) -> Column:
    """Array of (l, r) structs for every adjacent symbol pair
    (overlapping, like the reference `get_stats`); empty below two
    symbols — guarded because `sequence(1, 0)` DESCENDS in Spark."""
    n = F.size(syms)
    return F.when(n < 2, F.array().cast("array<struct<l:string,r:string>>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("l"),
                F.element_at(syms, i + 1).alias("r"),
            ),
        )
    )


def apply_merge(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) →
    left+right, as a JVM-side fold. After a merge the NEW token is
    what the next symbol compares against, so runs resolve exactly
    like the sequential reference: (a,a) over "aaa" → [aa, a]."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def pair_counts(syms_df: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts (l, r, cnt) over a
    (word, freq, syms) table. The explode carries only (pair, freq);
    the aggregate partial-combines map-side."""
    return (
        syms_df.select(
            F.explode(adjacent_pairs(F.col("syms"))).alias("p"), F.col("freq")
        )
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    min_pair_count: int = 2,
    on_iteration: Callable[[int, DataFrame], None] | None = None,
) -> list[Merge]:
    """Learn ``n_merges`` BPE merges from the corpus; returns them in
    rank order. Stops early when no pair reaches ``min_pair_count``.

    ``on_iteration(rank, syms_df)`` is called with the symbolization
    table BEFORE merge ``rank`` is chosen — the hook the oracle
    harness uses to materialize per-iteration state that DuckDB
    independently replays (pair counts + argmax per iteration).
    """
    syms_df = (
        word_freqs(docs, text_col)
        .select("word", "freq", char_symbols(F.col("word")).alias("syms"))
        .localCheckpoint(eager=False)
    )
    merges: list[Merge] = []
    for rank in range(n_merges):
        if on_iteration is not None:
            on_iteration(rank, syms_df)
        top = (
            pair_counts(syms_df)
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_count:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append(Merge(rank, left, right, cnt))
        syms_df = syms_df.withColumn(
            "syms", apply_merge(F.col("syms"), left, right)
        ).localCheckpoint(eager=False)
    return merges


def apply_merges_py(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Pure-Python merge application (the tokenizer side): each merge
    in rank order, greedy left-to-right — the reference the JVM fold
    is tested against, and the per-word kernel of `tokenize_bpe`."""
    syms = list(word)
    for left, right in merges:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        syms = out
    return syms


def tokenize_bpe(
    docs: DataFrame,
    merges: list[Merge] | list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Tokenize documents with a learned merge list; adds
    ``bpe_tokens`` (count after merging) and ``bpe_words``. Arrow-
    batched pandas UDF with a per-worker word→length memo (Zipf makes
    the hit rate high); the merge list is tiny and ships in the
    closure."""
    pairs: list[tuple[str, str]] = [
        (m.left, m.right) if isinstance(m, Merge) else (m[0], m[1])
        for m in merges
    ]

    import re

    # EXACTLY the tokenization word_freqs trains on (_norm: lower +
    # Java \s collapse): Python str.split() splits on Unicode spaces
    # (NBSP, U+2028, …) that Java's ASCII \s does not, which would
    # tokenize against a vocabulary the merges never saw
    _java_ws = re.compile("[ \\t\\n\\x0b\\f\\r]+")

    @F.pandas_udf("struct<bpe_tokens:long,bpe_words:long>")
    def _tok(texts: pd.Series) -> pd.DataFrame:
        memo: dict[str, int] = {}

        def count(text: str) -> tuple[int, int]:
            if not text:
                return 0, 0
            words = [
                w for w in _java_ws.split(text.strip(" \t\n\x0b\f\r").lower())
                if w
            ]
            total = 0
            for w in words:
                n = memo.get(w)
                if n is None:
                    n = len(apply_merges_py(w, pairs))
                    memo[w] = n
                total += n
            return total, len(words)

        res = [count(t if t is not None else "") for t in texts]
        return pd.DataFrame(
            {"bpe_tokens": [r[0] for r in res], "bpe_words": [r[1] for r in res]}
        )

    out = docs.withColumn("_t", _tok(F.col(text_col)))
    return out.select(
        *docs.columns,
        F.col("_t.bpe_tokens").alias("bpe_tokens"),
        F.col("_t.bpe_words").alias("bpe_words"),
    )
