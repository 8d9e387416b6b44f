"""Text analysis for training-data pipelines: token counting,
language-ID, quality scoring, document fingerprinting.

All four are expressed with built-in ``pyspark.sql.functions`` only —
they stay inside WholeStageCodegen (no Python in the hot path), so at
100 TB they run at columnar scan speed and Catalyst pushes the
``documents`` projection down to the Parquet scan.

Determinism: every output is a pure function of the input row —
safe under task retries, and independently checkable by an ANSI-SQL
oracle (see ``__spark_entry__.py``).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language marker lexicons for the n-gram/stopword heuristic
# language-ID. Deliberately small + fixed: the point is a cheap,
# deterministic, SQL-mirrorable heuristic, not a trained model.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "de", "que", "los", "una"],
    "de": ["der", "die", "und", "das", "ist"],
}

_STOPWORDS = LANG_MARKERS["en"]


def tokens(col: Column) -> Column:
    """Whitespace tokenization of trimmed text. ``split`` on ``\\s+``
    after trim never yields empty edge tokens, so token counts agree
    with any sane oracle."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(tokens(col))
    )


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND
    letter/digit/punctuation boundaries (a cheap stand-in for a BPE
    tokenizer's fragment count — monotone with real BPE counts on
    natural text)."""
    pieces = F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"), 0)
    return F.size(pieces)


def _count_matches(col: Column, pattern: str) -> Column:
    # codegen-friendly match count: length delta under regexp removal
    return F.length(col) - F.length(F.regexp_replace(col, pattern, ""))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features (lengths, punctuation ratio,
    stopword ratio, mean word length) — the standard cheap filters a
    Common-Crawl-style corpus pipeline applies before training."""
    c = F.col(text_col)
    ntok = token_count(c)
    stop_pat = "(?i)\\b(" + "|".join(_STOPWORDS) + ")\\b"
    nstop = F.size(F.regexp_extract_all(c, F.lit(stop_pat), 0))
    # \p{L}\p{N}: non-ASCII letters/digits are NOT punctuation —
    # the ASCII class scored accented French or CJK text as ~100%
    # punctuation and the quality filter silently dropped it
    npunct = _count_matches(c, r"[^\s\p{L}\p{N}]")
    return df.select(
        "*",
        F.length(c).alias("q_chars"),
        ntok.alias("q_tokens"),
        F.round(npunct / F.greatest(F.length(c), F.lit(1)), 6).alias(
            "q_punct_ratio"
        ),
        F.round(nstop / F.greatest(ntok, F.lit(1)), 6).alias(
            "q_stopword_ratio"
        ),
        F.round(
            (F.length(F.regexp_replace(c, r"\s+", "")) / F.greatest(ntok, F.lit(1))),
            6,
        ).alias("q_mean_word_len"),
    )


def lang_scores(col: Column) -> list[tuple[str, Column]]:
    out = []
    for lang, words in LANG_MARKERS.items():
        pat = "(?i)\\b(" + "|".join(words) + ")\\b"
        out.append((lang, F.size(F.regexp_extract_all(col, F.lit(pat), 0))))
    return out


def lang_id(col: Column) -> Column:
    """Heuristic language ID: argmax marker-word count, ties broken
    by fixed language order, 'und' when nothing matches."""
    scores = lang_scores(col)
    best = F.lit("und")
    best_score = F.lit(0)
    # iterate in fixed order; strict > keeps the earlier language on ties
    for lang, s in scores:
        is_better = s > best_score
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of whitespace/case-normalized text.
    Identical for trivially re-formatted duplicates; the exact-dedup
    key for content-level dedup."""
    norm = F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))
    return F.md5(norm)


def shingle_fingerprints(col: Column, k: int = 5) -> Column:
    """Rolling k-token shingle fingerprints: array of xxhash64 of
    each k-token window — the content-defined chunking primitive for
    fuzzy containment checks. JVM-side: transform over a sequence of
    window starts."""
    toks = tokens(col)
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n < k, F.array().cast("array<bigint>")).otherwise(
        F.transform(
            starts,
            lambda i: F.xxhash64(
                F.concat_ws(" ", F.slice(toks, i + 1, k))
            ),
        )
    )


def analyze_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text-analysis view over a documents table."""
    c = F.col(text_col)
    return quality_features(docs, text_col).select(
        "*",
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fp_md5"),
    )


def _word_grams(toks: Column, n_toks: Column, k: int) -> Column:
    """Array of space-joined k-token shingles (empty below k tokens)."""
    starts = F.sequence(F.lit(0), F.greatest(n_toks - k, F.lit(0)))
    return F.when(n_toks < k, F.array().cast("array<string>")).otherwise(
        F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )


def _max_multiplicity(arr: Column) -> Column:
    """Count of the most frequent element: longest equal-run over the
    sorted array, folded with ``aggregate`` — stays JVM-side, no
    explode + groupBy shuffle. '' never collides (shingles contain a
    space; lines compare against a sentinel no line can equal)."""
    sg = F.sort_array(arr)
    return F.aggregate(
        sg,
        F.struct(
            F.lit("\0").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, "Scaling
    Language Models", table A1 — the standard repetitious-text filters
    a Common-Crawl-scale corpus applies before training):

    - ``r_ttr``            type-token ratio (distinct / total tokens)
    - ``r_top2gram_frac``  occurrences of the most frequent 2-gram
                           over total 2-grams
    - ``r_dup3gram_frac``  fraction of 3-gram occurrences that are
                           duplicates (1 - distinct/total)
    - ``r_dup_line_frac``  fraction of lines that repeat an earlier
                           line (split on '\\n')

    Pure built-in columns — WholeStageCodegen end to end, no Python,
    no shuffle (the per-doc mode is a fold over the sorted shingle
    array, not an explode + groupBy). At 100 TB this runs at scan
    speed with the ``text`` projection pushed to parquet."""
    c = F.col(text_col)
    toks = tokens(c)
    n = token_count(c)
    g2, g3 = _word_grams(toks, n, 2), _word_grams(toks, n, 3)
    lines = F.split(c, "\n")
    n_lines = F.size(lines)
    r6 = lambda x: F.round(x, 6)
    return df.select(
        "*",
        n.cast("long").alias("r_tokens"),
        # n==0 guard: split('') yields [''] (size 1), which would read
        # as ttr=1.0 for empty text — define empty docs as ttr 0.
        F.when(n == 0, F.lit(0.0))
        .otherwise(r6(F.size(F.array_distinct(toks)) / n))
        .alias("r_ttr"),
        r6(
            _max_multiplicity(g2) / F.greatest(F.size(g2), F.lit(1))
        ).alias("r_top2gram_frac"),
        r6(
            (F.size(g3) - F.size(F.array_distinct(g3)))
            / F.greatest(F.size(g3), F.lit(1))
        ).alias("r_dup3gram_frac"),
        r6(
            (n_lines - F.size(F.array_distinct(lines)))
            / F.greatest(n_lines, F.lit(1))
        ).alias("r_dup_line_frac"),
    )


# Conservative PII span patterns, written to the common subset of Java
# regex (Spark) and RE2 (DuckDB) so the engine and its oracle agree
# byte-for-byte: literal classes, \d, \b only — no lookaround, no
# backrefs. Deliberately high-precision / modest-recall: the job of
# the corpus pass is cheap flagging + redaction, not NER.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def pii_counts(col: Column) -> list[tuple[str, Column]]:
    """Per-kind PII span counts, codegen-side regexp_extract_all."""
    return [
        (kind, F.size(F.regexp_extract_all(col, F.lit(pat), 0)))
        for kind, (pat, _) in PII_PATTERNS.items()
    ]


def redact_pii(col: Column) -> Column:
    """Replace every PII span with its placeholder. Email runs first
    so an address is consumed whole before the ipv4 pattern could
    claim a numeric domain fragment (same fixed order as any SQL
    mirror must use)."""
    out = col
    for pat, repl in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII counts + redacted text — the standard
    pre-training scrub pass."""
    c = F.col(text_col)
    return df.select(
        "*",
        *[cnt.cast("long").alias(f"pii_{kind}") for kind, cnt in pii_counts(c)],
        redact_pii(c).alias("text_redacted"),
    )


# ------------------------------------------------- encoding hygiene
def _as_mojibake(s: str) -> str:
    """What ``s`` becomes when its UTF-8 bytes are re-decoded as
    Latin-1 — the classic double-encoding corruption in web crawls
    (e.g. 'e-acute' -> 'A-tilde, copyright'). Built at runtime so no
    C1 control codepoints live in source files."""
    return s.encode("utf-8").decode("latin-1")


# signature alternation shared VERBATIM by Spark (Java regex) and the
# DuckDB oracle (RE2): pure literal codepoints, no metacharacters,
# no engine-specific escapes.
MOJIBAKE_MARKS = [
    "é", "è", "ü", "ö", "ä", "ñ",
    "ç", "à",                       # accented letters
    "«", "»", "°", " ",   # punctuation / NBSP
    "’", "“", "”", "—", "–", "…",
    "﻿",                                 # BOM decoded as text
]
MOJIBAKE_PATTERN = "|".join(_as_mojibake(m) for m in MOJIBAKE_MARKS)


def mojibake_hits(col: Column) -> Column:
    """Count of mojibake signature sequences in a string column —
    the drop/repair signal for encoding-corrupted crawl text. Pure
    codegen'd regexp_count; the pattern literal is shared verbatim
    with the SQL oracle."""
    return F.regexp_count(col, F.lit(MOJIBAKE_PATTERN)).cast("long")


def encoding_features(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Per-document encoding-hygiene features: mojibake signature
    count, replacement-character count (U+FFFD — a decoder already
    gave up upstream), and the non-ASCII character count that
    contextualizes both (a clean French page has many non-ASCII
    chars and zero signatures; a corrupted one has both).

    Scale shape (100 TB): three codegen'd regexp counts per row, no
    Python, no shuffle — runs at scan speed next to the other
    quality filters and prunes to (id, text) at the parquet scan."""
    c = F.col(text_col)
    return docs.select(
        F.col(id_col),
        mojibake_hits(c).alias("mojibake_hits"),
        F.regexp_count(c, F.lit("�")).cast("long").alias(
            "replacement_chars"),
        F.regexp_count(c, F.lit("[^\\x00-\\x7f]")).cast("long").alias(
            "non_ascii_chars"),
        (mojibake_hits(c) > 0).cast("int").alias("flagged"),
    )


def nfc_normalize(
    docs: DataFrame, text_col: str = "text", out_col: str = "text_nfc"
) -> DataFrame:
    """Unicode NFC normalization (UAX #15 canonical composition) —
    the text-hygiene step next to mojibake repair: decomposed
    sequences (e + combining acute, Hangul jamo pairs) fold to their
    precomposed forms so downstream dedup/fingerprint/token keys
    treat canonically-equal text as equal bytes.

    One Arrow-batched pandas_udf crossing (Python's unicodedata is
    the reference UAX #15 implementation; Spark has no built-in);
    row-local, no shuffle, the 100 TB shape of any per-document text
    map. The q_nfc oracle cross-checks against DuckDB's independent
    ``nfc_normalize`` implementation — two engines, one Unicode
    answer."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        return pd.Series(
            [None if v is None else unicodedata.normalize("NFC", v)
             for v in s]
        )

    return docs.withColumn(out_col, _nfc(F.col(text_col)))


def readability(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch reading ease + Flesch–Kincaid grade level per document
    — the classic corpus-quality signals, as EXACT integer micros so
    the DuckDB mirror reproduces every row bit-for-bit.

    Pinned heuristic (identical on both engines, documented rather
    than dictionary-perfect): words = whitespace tokens; sentences =
    ``[.!?]+`` runs, floored at 1; syllables = ``[aeiouy]+`` runs of
    the lowercased text, floored at the word count (every word
    counts at least one syllable in aggregate — vowel-free tokens
    like numerals are compensated globally, not per word). All
    divisions are integer ``div`` on micro-scaled constants:
    flesch_u = 206.835e6 - 1.015e6·W/S - 84.6e6·Syl/W. Map-only,
    pure JVM, no shuffle."""
    t = F.col(text_col)
    words = token_count(t).cast("long")
    sentences = F.greatest(
        F.lit(1).cast("long"),
        F.size(F.regexp_extract_all(t, F.lit(r"[.!?]+"), 0)).cast(
            "long"
        ),
    )
    vruns = F.size(
        F.regexp_extract_all(F.lower(t), F.lit(r"[aeiouy]+"), 0)
    ).cast("long")
    d = df.select(
        F.col(id_col),
        words.alias("words"),
        sentences.alias("sentences"),
        F.greatest(words, vruns).alias("syllables"),
    )
    return d.select(
        id_col,
        "words",
        "sentences",
        "syllables",
        (
            F.lit(206835000).cast("long")
            - F.expr("(1015000 * words) div sentences")
            - F.expr("(84600000 * syllables) div greatest(words, 1L)")
        ).alias("flesch_u"),
        (
            F.expr("(390000 * words) div sentences")
            + F.expr("(11800000 * syllables) div greatest(words, 1L)")
            - F.lit(15590000).cast("long")
        ).alias("grade_u"),
    )
