"""Margin-based bitext mining (operators/bitext.py) — checked
against a brute-force margin replay in Python over the same
candidate set."""

import numpy as np
from pyspark.sql import functions as F

from serd_spark.operators.bitext import bitext_mine, margin_pairs


def _cos_u(x, y):
    d = float(np.dot(x, y) / (np.linalg.norm(x) * np.linalg.norm(y)))
    return int(round(d * 1e6))


def _brute_margin(a_vecs, b_vecs, cand, k, thr):
    """cand: set of (a_id, b_id). Replays ranking + margin + the
    forward-best rule."""
    cos = {
        (ai, bi): _cos_u(a_vecs[ai], b_vecs[bi])
        for (ai, bi) in cand
        if _cos_u(a_vecs[ai], b_vecs[bi]) > 0
    }
    per_a, per_b = {}, {}
    for (ai, bi), c in cos.items():
        per_a.setdefault(ai, []).append((c, bi))
        per_b.setdefault(bi, []).append((c, ai))
    sums_a = {
        ai: [sum(c for c, _ in sorted(v, key=lambda t: (-t[0], t[1]))[:k]),
             min(len(v), k)]
        for ai, v in per_a.items()
    }
    sums_b = {
        bi: [sum(c for c, _ in sorted(v, key=lambda t: (-t[0], t[1]))[:k]),
             min(len(v), k)]
        for bi, v in per_b.items()
    }
    out = {}
    for ai, v in per_a.items():
        scored = []
        for c, bi in v:
            da, na = sums_a[ai]
            db, nb = sums_b[bi]
            m = (2 * c * 1_000_000 * na * nb) // (da * nb + db * na)
            scored.append((m, c, bi))
        m, c, bi = sorted(scored, key=lambda t: (-t[0], -t[1], t[2]))[0]
        if m >= thr:
            out[ai] = (bi, c, m)
    return out


def test_bitext_mine_matches_brute_force(spark):
    rng = np.random.default_rng(5)
    dim = 8
    # 3 well-separated direction clusters; a/b sides split evenly.
    # Within a cluster, paired vectors are near-duplicates (the
    # "translations"); cluster 2 is a hub (everything fairly close).
    base = rng.standard_normal((3, dim)) * 3
    rows = []
    for i in range(60):
        c = i % 3
        v = base[c] + rng.standard_normal(dim) * (0.9 if c == 2 else 0.2)
        rows.append((i, [float(x) for x in v]))
    a_rows = [(i, v) for i, v in rows if i % 2 == 0]
    b_rows = [(i, v) for i, v in rows if i % 2 == 1]
    a = spark.createDataFrame(a_rows, "vec_id long, embedding array<float>")
    b = spark.createDataFrame(b_rows, "vec_id long, embedding array<float>")

    pairs, a_probed, b_assigned = bitext_mine(
        a, b, n_centroids=4, n_probe=2, k=3,
        margin_threshold_micros=900_000,
    )
    got = {
        r["a_id"]: (r["b_id"], r["cos_u"], r["margin_u"])
        for r in pairs.collect()
    }

    # rebuild the candidate set the operator used (float32 storage:
    # recompute cosines from the values Spark actually stored)
    av = {r["a_id"]: np.array(r["a_vec"], dtype=np.float64)
          for r in a_probed.collect()}
    bv = {r["b_id"]: np.array(r["b_vec"], dtype=np.float64)
          for r in b_assigned.collect()}
    probes = {}
    for r in a_probed.collect():
        probes.setdefault(r["a_id"], set()).add(r["centroid"])
    assign = {r["b_id"]: r["centroid"] for r in b_assigned.collect()}
    cand = {
        (ai, bi)
        for ai, cells in probes.items()
        for bi, cell in assign.items()
        if cell in cells
    }
    want = _brute_margin(av, bv, cand, k=3, thr=900_000)
    assert got == want
    # sanity: mining found most same-cluster partners
    same_cluster = sum(
        1 for ai, (bi, _, _) in got.items() if ai % 3 == bi % 3
    )
    assert same_cluster >= len(got) * 0.8 and len(got) >= 15


def test_margin_denominator_never_zero(spark):
    # orthogonal-ish vectors: negative/zero cosines must be dropped
    # before ranking, never reach the integer division
    a = spark.createDataFrame(
        [(0, [1.0, 0.0]), (2, [-1.0, 0.0])],
        "a_id long, a_vec array<float>",
    ).withColumn("centroid", F.lit(0))
    b = spark.createDataFrame(
        [(1, [-1.0, 0.001]), (3, [1.0, 0.001])],
        "b_id long, b_vec array<float>",
    ).withColumn("centroid", F.lit(0))
    # must complete without an ANSI div-by-zero from the dropped
    # negative-cosine candidates
    out = margin_pairs(a, b, k=2, margin_threshold_micros=0).collect()
    assert len(out) == 2
    for r in out:
        assert r["cos_u"] > 0 and r["margin_u"] > 0
