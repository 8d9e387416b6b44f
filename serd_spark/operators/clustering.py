"""Exact distributed k-means (Lloyd) over an embedding column — the
document-clustering primitive of a training-data pipeline (topic
bucketing, per-cluster sampling quotas, coverage audits).

Unlike the IVF coarse quantizer in ``operators/similarity.py`` (which
k-means a 4096-row driver-side SAMPLE in float and only needs a
*reasonable* partition of space), this operator clusters the FULL
table and is bit-exact across engines, so a DuckDB oracle can replay
every iteration:

- Quantization: each float32 dimension is widened to double (exact)
  and scaled by 2^20 — a POWER OF TWO, so the multiply is exact in
  IEEE double and ``floor`` has nothing ambiguous to round. No
  round-half-anything disagreement can exist (numpy rounds half to
  even, Spark HALF_UP, DuckDB half away — floor(x * 2^20) sidesteps
  all three).
- Seeding: the k vectors with the smallest (md5(id), id) — the repo's
  standard layout/retry-invariant deterministic choice, computable by
  any engine (cf. ``corpus.stratified_sample``).
- Assignment: argmin of the exact int64 squared distance, ties by
  centroid id. Update: per-dimension TRUNCATING integer division
  sign(s) * (|s| // n) — matching DuckDB's ``//``; empty clusters
  keep their previous centroid.

Scale shape (100 TB): per iteration ONE vectorized numpy crossing
(iterator ``mapInPandas``) assigns each Arrow batch against the
k × dim broadcast centroid matrix and emits per-(batch, cluster)
partial sums — the map-side combine — so the shuffle carries
``batches × k`` rows of (cluster, count, dim-sums), never vectors.
The per-iteration driver materialization is exactly k × dim longs
(the new centroids), independent of table size. The final pass emits
(vec_id, cluster, dist) with no shuffle at all.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 1 << 20  # power-of-two scale: exact in double, engine-neutral


def _quantize(mat: np.ndarray) -> np.ndarray:
    return np.floor(mat.astype(np.float64) * QUANT).astype(np.int64)


def _trunc_div(s: np.ndarray, n: int) -> np.ndarray:
    # DuckDB's // truncates toward zero; numpy's floors — align on
    # truncation via sign * (abs // n), identical in every engine
    return np.sign(s) * (np.abs(s) // n)


def seed_centroids(
    emb: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> np.ndarray:
    """The k quantized vectors with smallest (md5(id), id) — one
    TakeOrderedAndProject (per-partition top-k heap + k-row driver
    merge), layout- and retry-invariant at any table size."""
    rows = (
        emb.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .collect()
    )
    if not rows:
        raise ValueError("kmeans: embedding table is empty")
    return _quantize(np.array([list(r[1]) for r in rows], dtype=np.float64))


def _assign_partials(cents: np.ndarray, vec_col: str):
    k = len(cents)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vm = _quantize(np.stack([np.asarray(v) for v in pdf[vec_col]]))
            # exact int64 squared distances: (n, k)
            d = ((vm[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)  # numpy argmin takes the FIRST
            # minimum — exactly the (dist, cid) tie-break
            out_cid, out_cnt, out_sums = [], [], []
            for c in range(k):
                m = assign == c
                if m.any():
                    out_cid.append(c)
                    out_cnt.append(int(m.sum()))
                    out_sums.append(vm[m].sum(axis=0).tolist())
            yield pd.DataFrame(
                {"cid": out_cid, "cnt": out_cnt, "sums": out_sums}
            )

    return run


def _assign_final(cents: np.ndarray, id_col: str, vec_col: str):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vm = _quantize(np.stack([np.asarray(v) for v in pdf[vec_col]]))
            d = ((vm[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cluster": assign.astype(np.int32),
                    "dist": d[np.arange(len(vm)), assign],
                }
            )

    return run


def kmeans(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Full-table exact Lloyd k-means; returns (id_col, cluster,
    dist) where dist is the exact int64 squared distance in quantized
    units to the final centroid. ``n_iter`` update rounds, then one
    final assignment pass against the converged centroids."""
    cents = seed_centroids(emb, k, id_col=id_col, vec_col=vec_col)
    k = len(cents)  # table smaller than k: every row seeds
    dim = cents.shape[1]
    src = emb.select(id_col, vec_col)

    for _ in range(n_iter):
        partials = src.mapInPandas(
            _assign_partials(cents, vec_col),
            schema="cid int, cnt long, sums array<long>",
        )
        # reduce the (batches × k) partials to k × dim in Spark —
        # posexplode + hash agg, so the driver only ever sees the
        # k × dim result (one small collect per iteration, the same
        # bounded-scalar budget as pagerank's node count)
        red = (
            partials.select(
                "cid", "cnt", F.posexplode("sums").alias("d", "s")
            )
            .groupBy("cid", "d")
            .agg(F.sum("s").alias("s"), F.sum(
                F.when(F.col("d") == 0, F.col("cnt")).otherwise(0)
            ).alias("cnt0"))
            .collect()
        )
        cnts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.int64)
        for r in red:
            sums[r["cid"], r["d"]] = r["s"]
            if r["d"] == 0:
                cnts[r["cid"]] = r["cnt0"]
        new = cents.copy()  # empty clusters keep their centroid
        for c in np.where(cnts > 0)[0]:
            new[c] = _trunc_div(sums[c], int(cnts[c]))
        cents = new

    return src.mapInPandas(
        _assign_final(cents, id_col, vec_col),
        schema=f"{id_col} long, cluster int, dist long",
    )


def semdedup(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assignments: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means partition the embedding space, then
    within each cluster drop every vector that has a semantic
    duplicate — cosine >= ``threshold`` (rounded to 6 dp, the repo's
    cross-engine float rule, cf. ``dedup.embedding_near_dups``) —
    with a SMALLER id, so exactly the smallest id of each in-cluster
    duplicate group survives.  Deterministic: the winner rule is an
    id argmin, never a float argmax, so cosine ties cannot flip it.

    Scale shape (100 TB): pairwise similarity only ever forms WITHIN
    a cluster (equi self-join on the cluster id).  k is chosen so
    clusters average ~10³ rows (the paper runs 50k clusters over
    LAION), turning the global n² into Σ|c|² ≈ n²/k; a fat cluster is
    an AQE skew split, and the verdict per row is a min-aggregation
    of its smaller-id matches, which partial-combines map-side before
    the shuffle.  Differs from ``embedding_near_dups`` (hyperplane
    LSH) in recall geometry: k-means cells follow the data density,
    so SemDeDup finds duplicates that straddle hyperplane sign
    boundaries — the two are complementary scale paths over the same
    exact-cosine verify.

    Returns (id_col, cluster, kept, dup_of); ``dup_of`` is the
    smallest smaller-id in-cluster duplicate, or -1 when kept (a
    sentinel, not NULL, so downstream sorts/compares never meet a
    NULL).  Pass ``assignments`` (id_col, cluster) to reuse an
    existing clustering instead of re-running Lloyd."""
    asg = assignments if assignments is not None else kmeans(
        emb, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col
    ).select(id_col, "cluster")
    withvec = asg.join(emb.select(id_col, vec_col), id_col)

    from serd_spark.operators.dedup import cosine

    a = withvec.select(
        "cluster", F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a")
    )
    b = withvec.select(
        "cluster", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b")
    )
    dups = (
        a.join(b, "cluster")
        .filter(F.col("id_b") < F.col("id_a"))
        .withColumn("cos", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6))
        .filter(F.col("cos") >= threshold)
        .groupBy(F.col("id_a").alias(id_col))
        .agg(F.min("id_b").alias("dup_of"))
    )
    return (
        asg.join(dups, id_col, "left")
        .withColumn("kept", F.col("dup_of").isNull())
        .withColumn(
            "dup_of", F.coalesce(F.col("dup_of"), F.lit(-1).cast("long"))
        )
        .select(id_col, "cluster", "kept", "dup_of")
    )
