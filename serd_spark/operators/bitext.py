"""Bitext mining — margin-based cross-lingual sentence/document
pair extraction over an embedding column (the LASER/CCMatrix recipe,
Artetxe & Schwenk 2019): a pair (a, b) across two languages is a
translation candidate when its cosine stands OUT against each side's
neighborhood, not merely when it is high:

    margin(a, b) = cos(a, b) / ((avg_k(a) + avg_k(b)) / 2)

where ``avg_k(x)`` is the mean cosine of x's k nearest neighbors on
the other side. The ratio cancels hubness — dense regions where
every cosine is high — which plain-threshold cosine mining cannot.

Scale shape (the ann_ivf discipline, never all-pairs): a coarse
k-means quantizer (deterministic driver-side sample) assigns the
INDEX side to one cell each; the QUERY side probes its ``n_probe``
nearest cells; candidates are the cell-equi-join of the two — at
100 TB a read of n_probe/C of the cross product, partition-pruned
when the index is stored partitioned by cell. Both directions'
neighborhoods are computed over the SAME candidate set (the standard
practical approximation — candidates outside the probed cells can't
win anyway). All scoring is exact integer micros after one pinned
6-dp cosine rounding, so DuckDB replays rankings and margins
bit-for-bit from the materialized assignment tables.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from serd_spark.operators.dedup import cosine

__all__ = ["probe_assignments", "margin_pairs", "bitext_mine"]


def probe_assignments(
    emb: DataFrame,
    centroids: np.ndarray,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, centroid) — one row per (vector, probed cell), the
    vector's ``n_probe`` nearest centroids by cosine. numpy matmul
    per Arrow batch, shuffle-free (``similarity.assign_centroids``
    widened to top-p)."""
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    p = min(n_probe, len(centroids))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {id_col: [], vec_col: [], "centroid": []}
                )
                continue
            m = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            mn = m / np.maximum(
                np.linalg.norm(m, axis=1, keepdims=True), 1e-12
            )
            sims = mn @ cn.T
            # stable top-p: argsort descending is deterministic for
            # distinct sims; ties broken by centroid id via argsort's
            # stability over the already-id-ordered axis
            top = np.argsort(-sims, axis=1, kind="stable")[:, :p]
            n = len(pdf)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(
                        pdf[id_col].to_numpy(), p
                    ),
                    vec_col: [
                        v
                        for v in pdf[vec_col]
                        for _ in range(p)
                    ],
                    "centroid": top.reshape(-1).astype(np.int32),
                }
            )

    schema = f"{id_col} long, {vec_col} array<float>, centroid int"
    return emb.select(id_col, vec_col).mapInPandas(run, schema=schema)


def margin_pairs(
    a_probed: DataFrame,
    b_assigned: DataFrame,
    k: int = 4,
    margin_threshold_micros: int = 1_000_000,
) -> DataFrame:
    """Margin scoring over the cell-joined candidate set.

    Inputs: ``a_probed`` (a_id, a_vec, centroid — multi-probed) and
    ``b_assigned`` (b_id, b_vec, centroid — single cell). Returns
    the forward-best pair per ``a_id`` whose margin clears the
    threshold: (a_id, b_id, cos_u, margin_u), cosines and margins in
    integer micros.

    Integer discipline: cos_u = round(cos·1e6) once; neighborhood
    sums stay integer; margin_u = (2·cos_u·1e6·na·nb) div
    (da·nb + db·na) — exact in int64/double-53 range (cos_u ≤ 1e6,
    na,nb ≤ k)."""
    cand = (
        a_probed.join(b_assigned, "centroid")
        .select(
            "a_id",
            "b_id",
            F.round(cosine(F.col("a_vec"), F.col("b_vec")) * 1e6)
            .cast("long")
            .alias("cos_u"),
        )
        # anti-correlated candidates are never translations, and the
        # positivity guarantee keeps the neighborhood sums (the
        # margin denominator) strictly positive for ANSI div
        .filter(F.col("cos_u") > 0)
    )
    wa = Window.partitionBy("a_id").orderBy(
        F.desc("cos_u"), F.col("b_id")
    )
    wb = Window.partitionBy("b_id").orderBy(
        F.desc("cos_u"), F.col("a_id")
    )
    ranked = cand.select(
        "a_id",
        "b_id",
        "cos_u",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wb).alias("rb"),
    )
    na = (
        ranked.filter(F.col("ra") <= k)
        .groupBy("a_id")
        .agg(
            F.sum("cos_u").cast("long").alias("da"),
            F.count(F.lit(1)).cast("long").alias("na"),
        )
    )
    nb = (
        ranked.filter(F.col("rb") <= k)
        .groupBy("b_id")
        .agg(
            F.sum("cos_u").cast("long").alias("db"),
            F.count(F.lit(1)).cast("long").alias("nb"),
        )
    )
    scored = (
        ranked.join(na, "a_id")
        .join(nb, "b_id")
        .withColumn(
            "margin_u",
            F.expr(
                "(2 * cos_u * 1000000 * na * nb)"
                " div (da * nb + db * na)"
            ),
        )
    )
    best = Window.partitionBy("a_id").orderBy(
        F.desc("margin_u"), F.desc("cos_u"), F.col("b_id")
    )
    return (
        scored.withColumn("rbest", F.row_number().over(best))
        .filter(
            (F.col("rbest") == 1)
            & (F.col("margin_u") >= margin_threshold_micros)
        )
        .select("a_id", "b_id", "cos_u", "margin_u")
    )


def bitext_mine(
    a: DataFrame,
    b: DataFrame,
    n_centroids: int = 16,
    n_probe: int = 3,
    k: int = 4,
    margin_threshold_micros: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """End-to-end: returns (pairs, a_probed, b_assigned) — the probe
    and assignment tables are exposed so callers can materialize them
    for independent replay (the ann_ivf oracle pattern). Centroids
    are trained on the union so both sides share one quantizer."""
    from serd_spark.operators.similarity import (
        assign_centroids,
        train_centroids,
    )

    cents = train_centroids(
        a.unionByName(b), n_centroids=n_centroids,
        id_col=id_col, vec_col=vec_col,
    )
    a_probed = probe_assignments(
        a, cents, n_probe=n_probe, id_col=id_col, vec_col=vec_col
    ).select(
        F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("a_vec"),
        "centroid",
    )
    b_assigned = assign_centroids(
        b, cents, id_col=id_col, vec_col=vec_col
    ).select(
        F.col(id_col).alias("b_id"),
        F.col(vec_col).alias("b_vec"),
        "centroid",
    )
    pairs = margin_pairs(
        a_probed,
        b_assigned,
        k=k,
        margin_threshold_micros=margin_threshold_micros,
    )
    return pairs, a_probed, b_assigned
