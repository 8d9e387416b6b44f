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

__all__ = ["deletion_variants", "fuzzy_join", "set_similarity_join"]


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


def set_similarity_join(
    sets: DataFrame,
    id_col: str = "id",
    set_col: str = "toks",
    t_permille: int = 800,
    max_posting: int | None = None,
) -> DataFrame:
    """EXACT Jaccard-threshold self-join via prefix filtering — every
    pair with jaccard ≥ t, no LSH false negatives, no cartesian
    product (AllPairs/PPJoin family: Bayardo et al. WWW'07, Xiao et
    al. WWW'08).

    The theorem: order every set by one global total order (rarest
    token first — frequency ascending minimizes candidates, but ANY
    total order is correct) and take each set's prefix of length
    |s| − ⌈t·|s|⌉ + 1. Two sets with jaccard ≥ t MUST share a prefix
    token — if they shared none, even matching everything outside
    both prefixes leaves the overlap below t. So an equi-join on
    prefix tokens has exact recall, candidates are pruned by the size
    bound 1000·min(|a|,|b|) ≥ t·max(|a|,|b|) (jaccard ≥ t forces size
    ratio ≥ t), and an exact `array_intersect` verify keeps precision.

    Where this sits vs the repo's other near-dup paths: minhash LSH
    (linking.py) trades recall for a signature-sized shuffle and wins
    when sets are huge; THIS join shuffles prefix postings — at
    t = 0.8 that is ~20% of each set — and guarantees the exact
    answer, the right tool for dedup certification and moderate-size
    sets (names, shingle sets, tag sets). All arithmetic is integer
    permille; the only division is the final reported
    ``jac_permille = floor(1000·|∩| / |∪|)``.

    Input rows: (id, array<string>). Arrays are treated as SETS
    (deduplicated here). Returns (id_a, id_b, inter, uni,
    jac_permille), id_a < id_b, each qualifying pair exactly once.

    ``max_posting`` is the stated bound for low-entropy corpora (the
    LSH-bucket-cap discipline): when set, each prefix token's posting
    list is capped at the ``max_posting`` smallest set ids
    (deterministic), bounding the join at
    O(Σ_tok min(|posting|, cap)²) regardless of how hot the hottest
    token gets. The trade is exactness: a pair whose EVERY shared
    prefix token is capped away is missed — identical semantics to
    ``linking.candidate_pairs``'s ``max_bucket``. ``None`` (default)
    keeps the exact-recall guarantee; the positional filter alone
    already prunes most hot-token candidates.
    """
    if not 0 < t_permille <= 1000:
        raise ValueError("t_permille must be in (0, 1000]")
    if max_posting is not None and max_posting < 1:
        raise ValueError("max_posting must be >= 1 when set")
    t = F.lit(int(t_permille)).cast("long")
    base = sets.select(
        F.col(id_col).alias("_sid"),
        F.array_distinct(F.col(set_col)).alias("_st"),
    ).filter(F.size("_st") >= 1)
    tok = base.select("_sid", F.explode("_st").alias("_tok"))
    freq = tok.groupBy("_tok").agg(F.count(F.lit(1)).alias("_c"))
    # canonical per-set order: (global df asc, token asc) — struct
    # array_sort gives the lexicographic (c, tok) order on both
    # engines; collect_list's nondeterministic order is erased by it
    ordered = (
        tok.join(freq, "_tok")
        .groupBy("_sid")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_c"), F.col("_tok")))
                ),
                lambda s: s["_tok"],
            ).alias("_arr")
        )
        .withColumn("_n", F.size("_arr").cast("long"))
        # three consumers (prefix postings + both verify sides) would
        # otherwise re-run the explode+freq-join+collect chain — and
        # any interpreted-HOF lineage feeding `sets` — once each; the
        # canonical-order table is one row per set, so pinning it is
        # cheap at any scale (the checkpoint-reused-tables discipline)
        .localCheckpoint()
    )
    # prefix length |s| - ceil(t|s|/1000) + 1, all-integer ceil
    p = (
        F.col("_n")
        - F.floor((t * F.col("_n") + 999) / F.lit(1000)).cast("long")
        + 1
    )
    pref = ordered.select(
        "_sid",
        "_n",
        F.posexplode(F.slice("_arr", F.lit(1), p)).alias("_p", "_tok"),
    )
    if max_posting is not None:
        from pyspark.sql import Window as _W

        # deterministic cap: keep the max_posting smallest set ids per
        # token. row_number ≤ k compiles to WindowGroupLimit — a
        # map-side partial top-k per shuffle partition before the full
        # sort, so a hot token never accumulates an unbounded posting
        # list on one task (the anchor_text/cap_per_domain pattern).
        pref = (
            pref.withColumn(
                "_rk",
                F.row_number().over(
                    _W.partitionBy("_tok").orderBy("_sid")
                ),
            )
            .filter(F.col("_rk") <= max_posting)
            .drop("_rk")
        )
    a = pref.select(
        F.col("_tok"),
        F.col("_sid").alias("id_a"),
        F.col("_n").alias("_na"),
        F.col("_p").alias("_pa"),
    )
    b = pref.select(
        F.col("_tok"),
        F.col("_sid").alias("id_b"),
        F.col("_n").alias("_nb"),
        F.col("_p").alias("_pb"),
    )
    # PPJoin positional filter (Xiao et al. WWW'08): a token shared at
    # 0-based prefix positions (pa, pb) caps the overlap at
    # min(na-pa, nb-pb) when it is the pair's FIRST shared token, and
    # jaccard ≥ t needs overlap ≥ α = ceil(t(na+nb)/(1000+t)).
    # Keeping pairs where ANY shared token passes is exact: the first
    # shared token's bound is ≥ the true overlap, so a qualifying
    # pair always survives — while hot-token candidates that share
    # only a LATE prefix slot die here instead of reaching the
    # verify join (this filter is what keeps low-entropy corpora,
    # where every posting list is hot, from going quadratic).
    alpha = F.floor(
        (t * (F.col("_na") + F.col("_nb")) + F.lit(1000) + t - 1)
        / (F.lit(1000) + t)
    ).cast("long")
    cand = (
        a.join(b, "_tok")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            # size bound: jaccard ≥ t ⇒ 1000·min ≥ t·max
            & (
                F.lit(1000) * F.least("_na", "_nb")
                >= t * F.greatest("_na", "_nb")
            )
            & (
                F.least(
                    F.col("_na") - F.col("_pa"),
                    F.col("_nb") - F.col("_pb"),
                )
                >= alpha
            )
        )
        # multi-shared-prefix collapse — the groupBy IS the dedup
        .groupBy("id_a", "id_b")
        .agg(F.min("_na").alias("_na"), F.min("_nb").alias("_nb"))
    )
    arr_a = ordered.select(
        F.col("_sid").alias("id_a"), F.col("_arr").alias("_arr_a")
    )
    arr_b = ordered.select(
        F.col("_sid").alias("id_b"), F.col("_arr").alias("_arr_b")
    )
    inter = F.size(F.array_intersect("_arr_a", "_arr_b")).cast("long")
    return (
        cand.join(arr_a, "id_a")
        .join(arr_b, "id_b")
        .withColumn("inter", inter)
        .withColumn("uni", F.col("_na") + F.col("_nb") - F.col("inter"))
        .filter(F.lit(1000) * F.col("inter") >= t * F.col("uni"))
        .withColumn(
            "jac_permille",
            F.floor(F.lit(1000) * F.col("inter") / F.col("uni")).cast(
                "long"
            ),
        )
        .select("id_a", "id_b", "inter", "uni", "jac_permille")
    )
