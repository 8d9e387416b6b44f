"""pca_power_iteration — integer power iteration recovers the
dominant axis, deterministically, with tdiv semantics pinned."""

import math
import random

from serd_spark.operators.pca import Q, pca_power_iteration, tdiv


def test_tdiv_truncates_toward_zero():
    assert tdiv(7, 2) == 3
    assert tdiv(-7, 2) == -3
    assert tdiv(7, -2) == -3
    assert tdiv(-7, -2) == 3
    assert tdiv(0, 5) == 0


def _spread(rng, direction, n, dim, noise):
    rows = []
    for i in range(n):
        t = rng.uniform(-1, 1)
        v = [
            t * direction[d] + rng.uniform(-noise, noise) for d in range(dim)
        ]
        rows.append((i, v))
    return rows


def test_recovers_dominant_direction(spark):
    dim = 64
    rng = random.Random(7)
    direction = [math.sin(0.3 * d) for d in range(dim)]
    nrm = math.sqrt(sum(x * x for x in direction))
    direction = [x / nrm for x in direction]
    rows = _spread(rng, direction, 300, dim, noise=0.02)
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    proj, w = pca_power_iteration(emb, n_iter=8, dim=dim)
    # cosine between the integer eigenvector and the true axis
    dot = sum(w[d] * direction[d] for d in range(dim))
    wn = math.sqrt(sum(x * x for x in w))
    assert abs(dot) / wn > 0.99
    # projections order vectors by their coordinate along the axis
    got = {r.vec_id: r.proj for r in proj.collect()}
    assert len(got) == 300
    sign = 1 if dot > 0 else -1
    true_t = {
        i: sum(v[d] * direction[d] for d in range(dim))
        for i, v in rows
    }
    by_proj = sorted(got, key=lambda i: sign * got[i])
    by_true = sorted(true_t, key=true_t.get)
    # rank agreement within noise: endpoints must coincide
    assert by_proj[0] == by_true[0] and by_proj[-1] == by_true[-1]


def test_deterministic_across_partitionings(spark):
    dim = 64
    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-0.5, 0.5) for _ in range(dim)]) for i in range(120)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    p1, w1 = pca_power_iteration(emb.repartition(2), n_iter=5, dim=dim)
    p2, w2 = pca_power_iteration(emb.repartition(17), n_iter=5, dim=dim)
    assert w1 == w2
    assert sorted(map(tuple, p1.collect())) == sorted(map(tuple, p2.collect()))
