"""Edit-distance similarity join via deletion-neighborhood blocking.

Entity-resolution surfaces need typo-tolerant matching that minhash
misses: a one-character slip ("Jon Smith" / "John Smith") barely moves
a 3-shingle Jaccard, but it IS edit distance 1. The classic exact
formulation is a θ-join `levenshtein(a, b) <= 1`, which Catalyst can
only plan as a cartesian product — the canonical 100 TB scale-killer.

This module uses SymSpell-style deletion-neighborhood blocking
(Garbe's symmetric-delete idea, also the pigeonhole behind PassJoin,
Li et al. VLDB'11): every name emits itself plus each single-character
deletion. Two strings at edit distance ≤ 1 ALWAYS share a variant —

  substitution at i : both sides' delete-at-i collapse to the same key
  insert / delete   : the longer side's deletion of the edited char
                      equals the shorter side verbatim

so an equi-join on the variant key has EXACT recall at k=1, with a
per-name fanout of length+1 (bounded by ``max_len``), never O(n²).
Precision comes from a cheap JVM `levenshtein` verify on the candidate
pairs. The variant generator is a pure-JVM higher-order function
(sequence → transform → explode): interpreted per element rather than
codegen'd (CLAUDE.md), but it keeps the stage Python-free and the
per-row work is ~64 short substrings — measured fine for name-scale
strings, and the alternative (a pandas UDF) would add the exact Python
crossing this repo's fusion discipline exists to avoid.

Skew: stop-word-ish variants (deleting from very common short names)
produce hot buckets; ``bucket_cap`` drops oversized variant buckets
with the same documented recall trade as linking.py's LSH
``max_bucket`` — at k=1 every true pair shares MULTIPLE variants
(length+1 of them), so dropping one hot key rarely severs a pair.
Default None keeps recall exact for the certificate.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["deletion_variants", "fuzzy_join"]


def deletion_variants(name: Column) -> Column:
    """array<string>: the name itself (i = 0) plus each single-char
    deletion (i = 1..len). Pure JVM — mirrors 1:1 to DuckDB's
    ``list_transform(range(0, length(s)+1), …)``."""
    return F.transform(
        F.sequence(F.lit(0), F.length(name)),
        lambda i: F.when(i == F.lit(0), name).otherwise(
            F.concat(
                F.substring(name, F.lit(1), i - 1),
                F.substring(name, i + 1, F.length(name)),
            )
        ),
    )


def fuzzy_join(
    names: DataFrame,
    id_col: str = "id",
    name_col: str = "name",
    max_len: int = 64,
    bucket_cap: int | None = None,
) -> DataFrame:
    """All id pairs whose names are within edit distance 1.

    Returns (id_a, id_b, name_a, name_b, dist) with id_a < id_b,
    deduplicated (a pair sharing several variants appears once).
    Names longer than ``max_len`` are excluded from the fuzzy path
    (fanout bound; route long strings through minhash linking
    instead). ``bucket_cap`` drops variant buckets larger than the
    cap — see module docstring for the recall argument.
    """
    base = names.select(
        F.col(id_col).alias("_fid"), F.col(name_col).alias("_fname")
    ).filter(
        F.col("_fname").isNotNull()
        & F.length("_fname").between(1, max_len)
    )
    var = base.select(
        "_fid",
        "_fname",
        F.explode(deletion_variants(F.col("_fname"))).alias("_v"),
    )
    if bucket_cap is not None:
        hot = var.groupBy("_v").agg(F.count(F.lit(1)).alias("_m"))
        var = var.join(
            F.broadcast(hot.filter(F.col("_m") > bucket_cap)),
            "_v",
            "left_anti",
        )
    a = var.select(
        "_v", F.col("_fid").alias("id_a"), F.col("_fname").alias("name_a")
    )
    b = var.select(
        "_v", F.col("_fid").alias("id_b"), F.col("_fname").alias("name_b")
    )
    pairs = (
        a.join(b, "_v")
        .filter(F.col("id_a") < F.col("id_b"))
        # shared-variant multiplicity collapses here; the groupBy IS
        # the pair dedup (no separate distinct shuffle — CLAUDE.md)
        .groupBy("id_a", "id_b")
        .agg(F.min("name_a").alias("name_a"), F.min("name_b").alias("name_b"))
    )
    return (
        pairs.withColumn(
            "dist", F.levenshtein("name_a", "name_b").cast("int")
        )
        .filter(F.col("dist") <= 1)
        .select("id_a", "id_b", "name_a", "name_b", "dist")
    )
