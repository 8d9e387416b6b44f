"""Exact k-means (operators/clustering.py): cross-checks against a
pure-Python Lloyd reference, layout invariance, and the empty-cluster
carry rule."""

import numpy as np
import pytest

from serd_spark.operators.clustering import QUANT, _trunc_div, kmeans


def _py_kmeans(vecs, ids, k, n_iter):
    """Independent Lloyd reference: same quantization, seeding, and
    truncating-division update as the operator contract."""
    import hashlib

    vm = {
        i: np.floor(np.asarray(v, dtype=np.float64) * QUANT).astype(np.int64)
        for i, v in zip(ids, vecs)
    }
    seeds = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:k]
    cents = [vm[s].copy() for s in seeds]

    def assign_all():
        out = {}
        for i in ids:
            dists = [int(((vm[i] - c) ** 2).sum()) for c in cents]
            out[i] = min(range(len(cents)), key=lambda c: (dists[c], c))
        return out

    for _ in range(n_iter):
        a = assign_all()
        for c in range(len(cents)):
            members = [vm[i] for i in ids if a[i] == c]
            if members:
                s = np.sum(members, axis=0)
                cents[c] = np.sign(s) * (np.abs(s) // len(members))
    a = assign_all()
    return {
        i: (a[i], int(((vm[i] - cents[a[i]]) ** 2).sum())) for i in ids
    }


def test_trunc_div_matches_duckdb_semantics():
    s = np.array([-7, 7, -8, 9, 0], dtype=np.int64)
    assert _trunc_div(s, 2).tolist() == [-3, 3, -4, 4, 0]


def test_kmeans_matches_python_reference(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 6)).astype(np.float32)
    # two planted clusters so the result is meaningful, not arbitrary
    vecs[:20] += 3.0
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r.vec_id: (r.cluster, r.dist)
        for r in kmeans(df, k=3, n_iter=4).collect()
    }
    ref = _py_kmeans([r[1] for r in rows], [r[0] for r in rows], 3, 4)
    assert got == ref
    # the two planted clusters must separate
    top = {got[i][0] for i in range(20)}
    bot = {got[i][0] for i in range(20, 40)}
    assert top.isdisjoint(bot)


def test_kmeans_layout_invariant(spark):
    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.normal(size=8).astype(np.float32)])
        for i in range(30)
    ]
    df1 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    df8 = df1.repartition(8)
    a = sorted((r.vec_id, r.cluster, r.dist) for r in kmeans(df1, k=4, n_iter=3).collect())
    b = sorted((r.vec_id, r.cluster, r.dist) for r in kmeans(df8, k=4, n_iter=3).collect())
    assert a == b


def test_kmeans_fewer_rows_than_k(spark):
    rows = [(i, [float(i), 0.0]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans(df, k=8, n_iter=2).collect()
    # every row seeds its own cluster → dist 0 everywhere
    assert sorted(r.dist for r in out) == [0, 0, 0]
    assert len({r.cluster for r in out}) == 3


def test_kmeans_empty_table_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        kmeans(df, k=2, n_iter=1)


def test_pq_roundtrip_recovers_nearest(spark):
    from serd_spark.operators.pq import pq_encode, pq_topk, pq_train

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(60, 16)).astype(np.float32)
    vecs[7] = vecs[0] + 0.01 * rng.normal(size=16).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = pq_train(df, m=4, k=8, n_iter=3)
    assert books.shape == (4, 8, 4) and books.dtype == np.int64
    enc = pq_encode(df, books)
    got = {r.vec_id: list(r.codes) for r in enc.collect()}
    assert len(got) == 60 and all(len(c) == 4 for c in got.values())
    # vec 7 is a near-copy of vec 0: same codes, and both lead the
    # ADC ranking for vec 0's query
    assert got[7] == got[0]
    top = [r.vec_id for r in
           pq_topk(enc, books, [float(x) for x in vecs[0]], top_k=3).collect()]
    assert set(top[:2]) == {0, 7}


def test_pq_encode_layout_invariant(spark):
    from serd_spark.operators.pq import pq_encode, pq_train

    rng = np.random.default_rng(5)
    rows = [
        (i, [float(x) for x in rng.normal(size=8).astype(np.float32)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    b1 = pq_train(df, m=2, k=4, n_iter=2)
    b2 = pq_train(df.repartition(8), m=2, k=4, n_iter=2)
    assert (b1 == b2).all()
    e1 = sorted((r.vec_id, tuple(r.codes)) for r in pq_encode(df, b1).collect())
    e2 = sorted((r.vec_id, tuple(r.codes))
                for r in pq_encode(df.repartition(8), b1).collect())
    assert e1 == e2


def test_pq_rejects_indivisible_dim(spark):
    rows = [(0, [0.0, 1.0, 2.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from serd_spark.operators.pq import pq_train

    with pytest.raises(ValueError):
        pq_train(df, m=2, k=2, n_iter=1)


def test_semdedup_matches_python_reference(spark):
    from serd_spark.operators.clustering import semdedup

    rng = np.random.default_rng(11)
    base = rng.normal(size=(12, 6)).astype(np.float64)
    vecs, parent = [], []
    for i in range(12):
        vecs.append(base[i]); parent.append(i)
    # planted near-duplicates: small perturbations of existing rows
    for j, src in enumerate([0, 0, 3, 7, 7, 7]):
        vecs.append(base[src] + rng.normal(scale=0.01, size=6))
        parent.append(src)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in semdedup(df, k=3, n_iter=3,
                                         threshold=0.9).collect()}
    assert set(out) == set(range(len(rows)))

    # independent reference: same assignment contract as _py_kmeans,
    # cosine on float32-widened doubles rounded to 6 dp
    asg = _py_kmeans([np.asarray(v, dtype=np.float32) for _, v in rows],
                     [i for i, _ in rows], 3, 3)
    def cos(a, b):
        a = np.asarray(a, dtype=np.float32).astype(np.float64)
        b = np.asarray(b, dtype=np.float32).astype(np.float64)
        return round(float(a @ b) / (np.sqrt(a @ a) * np.sqrt(b @ b)), 6)
    for i, vi in rows:
        matches = [j for j, vj in rows
                   if j < i and asg[j][0] == asg[i][0]
                   and cos(vi, vj) >= 0.9]
        want = min(matches) if matches else -1
        assert out[i].dup_of == want, (i, want, out[i])
        assert out[i].kept == (want == -1)
        assert out[i].cluster == asg[i][0]
    # ids perturbed by a duplicate must actually be dropped when the
    # source shares the cluster (sanity that the test isn't vacuous)
    assert sum(not r.kept for r in out.values()) >= 3

    # layout invariance: 1 partition vs 13
    a = sorted((r.vec_id, r.cluster, r.kept, r.dup_of)
               for r in semdedup(df.coalesce(1), k=3, n_iter=3,
                                 threshold=0.9).collect())
    b = sorted((r.vec_id, r.cluster, r.kept, r.dup_of)
               for r in semdedup(df.repartition(13), k=3, n_iter=3,
                                 threshold=0.9).collect())
    assert a == b


# ------------------------------------------------------------ sq8 quantization


def test_sq8_codes_span_and_roundtrip_bound(spark):
    from serd_spark.operators.clustering import _quantize
    from serd_spark.operators.quant import sq_encode, sq_stats

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(80, 8)).astype(np.float32)
    vecs[:, 3] = 0.5  # constant dimension: span 0 must encode as 0
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    lo, hi = sq_stats(df)
    assert lo.shape == (8,) and (hi >= lo).all()
    got = {r.vec_id: np.array(r.codes) for r in sq_encode(df, lo, hi).collect()}
    allc = np.stack([got[i] for i in range(80)])
    assert allc.min() >= 0 and allc.max() <= 255
    assert (allc[:, 3] == 0).all()  # constant dim
    # per-dim extremes hit the code range ends (except the constant dim)
    for d in [0, 1, 2, 4, 5, 6, 7]:
        assert allc[:, d].min() == 0 and allc[:, d].max() == 255
    # reconstruction error bounded by one quantization step per dim
    q = _quantize(vecs.astype(np.float64))
    span = (hi - lo).astype(np.int64)
    decoded = lo + (allc.astype(np.int64) * np.where(span == 0, 1, span)) // 255
    assert (np.abs(decoded - q) <= np.maximum(span // 255 + 1, 1)).all()


def test_sq8_topk_matches_numpy_reference(spark):
    from serd_spark.operators.clustering import _quantize
    from serd_spark.operators.quant import sq_encode, sq_stats, sq_topk

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(50, 6)).astype(np.float32)
    vecs[9] = vecs[2]  # exact duplicate: identical codes, dist 0
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    lo, hi = sq_stats(df)
    enc = sq_encode(df, lo, hi)
    got = sq_topk(enc, lo, hi, [float(x) for x in vecs[2]], top_k=5).collect()
    # numpy replay of the exact integer rule
    q = _quantize(vecs.astype(np.float64))
    span = (hi - lo).astype(np.int64)
    safe = np.where(span == 0, 1, span)
    codes = np.where(span == 0, 0, ((q - lo) * 255) // safe)
    qc = codes[2]
    d = ((np.abs(codes - qc) * span) // 255) ** 2
    dist = d.sum(axis=1)
    order = sorted(range(50), key=lambda i: (dist[i], i))[:5]
    assert [r.vec_id for r in got] == order
    assert got[0].sq_dist == 0 and got[1].sq_dist == 0
    assert {got[0].vec_id, got[1].vec_id} == {2, 9}


def test_sq8_stats_empty_raises(spark):
    import pytest as _pytest

    from serd_spark.operators.quant import sq_stats

    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError):
        sq_stats(df)
