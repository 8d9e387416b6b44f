"""Exact-integer PCA (top principal component) over an embedding
table — the whitening/compression primitive for embedding columns
(rank docs along the dominant semantic axis, drop it to de-bias, or
seed a split direction for spill trees / balanced partitioning).

Float PCA is order-nondeterministic (covariance sums change with
partition order) and un-mirrorable; here every quantity is an
integer, every division truncates toward zero (``tdiv`` — the same
``sign*(abs//n)`` convention as clustering.py, which is exactly
DuckDB's ``//`` and Spark's ``div``), so the DuckDB oracle replays
quantization → means → covariance → every power-iteration round →
projections bit-for-bit.

Scale shape: two Arrow passes over the table (partial per-dimension
sums for the mean; centered outer-product partials for the
covariance — each task emits at most dim and dim² rows regardless of
row count, the textbook tree-aggregate), one dim²-cell collect
(4096 ints at dim 64 — driver-side like k-means centroids), the
power iteration entirely on those cells, then one projection pass.
Nothing shuffles except two tiny (d)- and (i,j)-keyed aggregates.

Overflow budget (int64): |v| ≤ Q=2^20 after quantization, centered
|c| ≤ 2^21, covariance cell ≤ 2^42·n — safe to n ≈ 2^21 vectors at
this Q; for larger corpora lower Q (the parameter exists) or
pre-aggregate per shard. Iteration terms are rescaled to ≤ ~Q per
round, so matvec terms stay ≤ 2^48.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q = 1 << 20  # quantization: floor(v * 2^20) is exact in IEEE double


def tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division — DuckDB ``//`` / Spark
    ``div`` semantics (Python's ``//`` floors, which differs on
    negatives)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _quantize(pdf_col, dim: int):
    import numpy as np

    m = np.empty((len(pdf_col), dim), dtype=np.int64)
    for r, emb in enumerate(pdf_col):
        m[r, :] = np.floor(np.asarray(emb, dtype=np.float64) * Q).astype(
            np.int64
        )
    return m


def pca_power_iteration(
    emb: DataFrame,
    n_iter: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[int]]:
    """Returns ``(projections, w)``: per-vector integer coordinates
    along the dominant principal axis — (vec_id, proj) — and the
    quantized eigenvector itself (64 ints, |w| ≤ Q)."""
    import numpy as np

    spark = emb.sparkSession
    src = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col))

    def mean_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        s = np.zeros(dim, dtype=np.int64)
        n = 0
        for pdf in batches:
            v = _quantize(pdf[vec_col], dim)
            s += v.sum(axis=0)
            n += v.shape[0]
        yield pd.DataFrame(
            {"d": list(range(dim)), "s": list(s), "cnt": [n] * dim}
        )

    tot = (
        src.mapInPandas(mean_partials, schema="d int, s long, cnt long")
        .groupBy("d")
        .agg(F.sum("s").alias("s"), F.sum("cnt").alias("n"))
        .collect()
    )
    n_vecs = tot[0].n
    mean = np.zeros(dim, dtype=np.int64)
    for r in tot:
        mean[r.d] = tdiv(int(r.s), int(n_vecs))

    mean_b = mean  # closure-captured (64 ints — no broadcast needed)

    def cov_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((dim, dim), dtype=np.int64)
        for pdf in batches:
            c = _quantize(pdf[vec_col], dim) - mean_b
            acc += c.T @ c
        i, j = np.meshgrid(range(dim), range(dim), indexing="ij")
        yield pd.DataFrame(
            {"i": i.ravel(), "j": j.ravel(), "s": acc.ravel()}
        )

    cells = (
        src.mapInPandas(cov_partials, schema="i int, j int, s long")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        .collect()
    )
    C = np.zeros((dim, dim), dtype=object)  # python ints: no silent wrap
    for r in cells:
        C[r.i, r.j] = int(r.s)
    cmax = max(1, int(abs(C).max()))
    d0 = max(1, tdiv(cmax, Q))
    Cn = np.array(
        [[tdiv(int(C[i, j]), d0) for j in range(dim)] for i in range(dim)],
        dtype=object,
    )

    w = [Q] * dim
    for _ in range(n_iter):
        u = [
            sum(int(Cn[i, j]) * w[j] for j in range(dim)) for i in range(dim)
        ]
        umax = max(1, max(abs(x) for x in u))
        du = max(1, tdiv(umax, Q))
        w = [tdiv(x, du) for x in u]

    w_arr = np.array(w, dtype=np.int64)

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            c = _quantize(pdf[vec_col], dim) - mean_b
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "proj": (c @ w_arr)}
            )

    proj = src.mapInPandas(project, schema="vec_id long, proj long")
    return proj, [int(x) for x in w]
