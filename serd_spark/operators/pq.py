"""Product quantization — the memory-bound half of a billion-vector
ANN index (FAISS's IVF-PQ family): each vector is split into ``m``
subspaces, each subspace k-means'd into a tiny codebook, and a vector
is stored as ``m`` small codes. A query is answered by ADC
(asymmetric distance computation): one ``m × k`` lookup table built
from the query, then every candidate's distance is ``m`` table
lookups — no float vector math per candidate, and the encoded table
is ~dim/ m / 4 bytes-per-code smaller than the raw embeddings.

Exactness contract (same discipline as ``operators/clustering.py``,
whose quantization/seeding/update rules this reuses verbatim):
power-of-two quantization floor(v * 2^20), md5-ordered seeding,
argmin (dist, code) assignment, truncating-division centroid update
with empty-cluster carry. Every quantity is int64, so the DuckDB
oracle replays the ENTIRE pipeline — all m codebook trainings,
iteration by iteration, the encoding, and the ADC search — and
matches bit-for-bit.

Scale shape (100 TB):
- training: per iteration ONE vectorized numpy crossing emits
  per-(batch, subspace, code) partial sums — all m subspaces in the
  same pass, map-side combined; the driver materializes only the
  m × k × dsub codebook.
- encoding: one numpy crossing, shuffle-free; write the (id, codes)
  table and the corpus never needs rescanning per query.
- search: pure JVM — the ADC table is m literal arrays folded into
  whole-stage codegen (``element_at`` per subspace), one scan of the
  codes table + TakeOrderedAndProject. No Python, no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from serd_spark.operators.clustering import QUANT, _quantize, _trunc_div


def _seed_rows(
    emb: DataFrame, k: int, id_col: str, vec_col: str
) -> np.ndarray:
    rows = (
        emb.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .collect()
    )
    if not rows:
        raise ValueError("pq_train: embedding table is empty")
    return _quantize(np.array([list(r[1]) for r in rows], dtype=np.float64))


def pq_train(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train the ``m`` per-subspace codebooks; returns int64
    (m, k, dsub). All subspaces train in the SAME per-iteration pass:
    one crossing, one partial-sum shuffle, one k*m*dsub-row collect."""
    seeds = _seed_rows(emb, k, id_col, vec_col)
    k = len(seeds)  # tiny tables: every row seeds (cf. kmeans)
    dim = seeds.shape[1]
    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m {m}")
    dsub = dim // m
    books = seeds.reshape(k, m, dsub).transpose(1, 0, 2).copy()  # (m,k,dsub)
    src = emb.select(id_col, vec_col)

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vm = _quantize(np.stack([np.asarray(v) for v in pdf[vec_col]]))
            sub_v = vm.reshape(len(vm), m, dsub)
            subs, cids, cnts, sums = [], [], [], []
            for j in range(m):
                d = (
                    (sub_v[:, j, None, :] - books[j][None, :, :]) ** 2
                ).sum(axis=2)
                assign = d.argmin(axis=1)  # first min == (dist, code)
                for c in range(k):
                    msk = assign == c
                    if msk.any():
                        subs.append(j)
                        cids.append(c)
                        cnts.append(int(msk.sum()))
                        sums.append(sub_v[msk, j].sum(axis=0).tolist())
            yield pd.DataFrame(
                {"sub": subs, "cid": cids, "cnt": cnts, "sums": sums}
            )

    for _ in range(n_iter):
        red = (
            src.mapInPandas(
                partials, schema="sub int, cid int, cnt long, sums array<long>"
            )
            .select("sub", "cid", "cnt", F.posexplode("sums").alias("d", "s"))
            .groupBy("sub", "cid", "d")
            .agg(
                F.sum("s").alias("s"),
                F.sum(
                    F.when(F.col("d") == 0, F.col("cnt")).otherwise(0)
                ).alias("cnt0"),
            )
            .collect()
        )
        cnts = np.zeros((m, k), dtype=np.int64)
        sums = np.zeros((m, k, dsub), dtype=np.int64)
        for r in red:
            sums[r["sub"], r["cid"], r["d"]] = r["s"]
            if r["d"] == 0:
                cnts[r["sub"], r["cid"]] = r["cnt0"]
        new = books.copy()  # empty codes keep their centroid
        for j in range(m):
            for c in np.where(cnts[j] > 0)[0]:
                new[j, c] = _trunc_div(sums[j, c], int(cnts[j, c]))
        books = new
    return books


def pq_encode(
    emb: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>[m]) — one shuffle-free numpy crossing."""
    m, k, dsub = books.shape

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vm = _quantize(np.stack([np.asarray(v) for v in pdf[vec_col]]))
            sub_v = vm.reshape(len(vm), m, dsub)
            codes = np.empty((len(vm), m), dtype=np.int32)
            for j in range(m):
                d = (
                    (sub_v[:, j, None, :] - books[j][None, :, :]) ** 2
                ).sum(axis=2)
                codes[:, j] = d.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    return emb.select(id_col, vec_col).mapInPandas(
        run, schema=f"{id_col} long, codes array<int>"
    )


def pq_topk(
    encoded: DataFrame,
    books: np.ndarray,
    query_vec: list[float],
    top_k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k: the m × k distance table is built driver-side from
    the query (tiny), then folded into the plan as m LITERAL arrays —
    per row, m ``element_at`` lookups summed entirely inside
    whole-stage codegen. Returns (id, adc), ties broken by id."""
    m, k, dsub = books.shape
    qv = _quantize(
        np.asarray(query_vec, dtype=np.float64).reshape(1, -1)
    ).reshape(m, dsub)
    table = ((books - qv[:, None, :]) ** 2).sum(axis=2)  # (m, k) int64
    adc = None
    for j in range(m):
        lut = F.array(*[F.lit(int(v)) for v in table[j]])
        term = F.element_at(lut, F.col("codes")[j] + 1)
        adc = term if adc is None else adc + term
    return (
        encoded.select(F.col(id_col), adc.cast("long").alias("adc"))
        .orderBy(F.asc("adc"), F.asc(id_col))
        .limit(top_k)
    )
