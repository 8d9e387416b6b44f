"""Funnel (operators/funnel.py) and 2-D skyline
(operators/skyline.py) — each checked against a brute-force
reference computed in Python over the same rows."""

from datetime import datetime, timedelta

from serd_spark.operators.funnel import funnel
from serd_spark.operators.skyline import skyline2d


def _brute_funnel(rows, steps):
    """Chained-earliest replay per user in plain Python."""
    by_user = {}
    for u, ts, typ in rows:
        by_user.setdefault(u, []).append((ts, typ))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        times = []
        prev = None
        for k, step in enumerate(steps):
            cands = [
                t
                for (t, typ) in evs
                if typ == step and (prev is None or t > prev)
            ]
            if not cands:
                break
            prev = min(cands)
            times.append(prev)
        out[u] = times
    return out


def test_funnel_matches_brute_force(spark):
    base = datetime(2024, 5, 1)
    rows = []
    # user 1: clean completion
    rows += [
        (1, base + timedelta(minutes=m), t)
        for m, t in [(0, "view"), (5, "click"), (9, "purchase")]
    ]
    # user 2: purchase BEFORE click — chain reaches click but the
    # purchase is earlier, so step 3 never fires
    rows += [
        (2, base + timedelta(minutes=m), t)
        for m, t in [(0, "view"), (9, "purchase"), (12, "click")]
    ]
    # user 3: click only — never entered
    rows += [(3, base, "click")]
    # user 4: repeated steps; earliest-chain must pick the mins
    rows += [
        (4, base + timedelta(minutes=m), t)
        for m, t in [
            (0, "view"),
            (1, "view"),
            (2, "click"),
            (3, "click"),
            (4, "purchase"),
        ]
    ]
    # user 5: simultaneous view+click — strict > must NOT advance
    rows += [(5, base, "view"), (5, base, "click"), (5, base + timedelta(1), "click"), (5, base + timedelta(2), "purchase")]
    # noise types everywhere
    rows += [(u, base + timedelta(minutes=30), "error") for u in (1, 2, 3)]

    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    steps = ["view", "click", "purchase"]
    got = {
        r["user_id"]: (
            r["steps_completed"],
            [t for t in (r["t_1"], r["t_2"], r["t_3"]) if t is not None],
        )
        for r in funnel(df, steps).collect()
    }
    want = _brute_funnel(
        [(u, ts, t) for (u, ts, t) in rows], steps
    )
    # user 3's only event is a mid-funnel step: still grouped (it
    # passes the type filter) but completes 0 steps
    assert set(got) == {1, 2, 3, 4, 5}
    for u, times in want.items():
        assert got[u] == (len(times), times), u
    assert got[1][0] == 3 and got[2][0] == 2 and got[5][0] == 3


def _brute_skyline(points):
    out = []
    for i, (pk, price, size) in enumerate(points):
        dominated = any(
            p2 <= price
            and s2 >= size
            and (p2 < price or s2 > size)
            for j, (_, p2, s2) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append(pk)
    return sorted(out)


def test_skyline_matches_brute_force(spark):
    # prices span several buckets at width 100; include exact ties
    pts = [
        (1, 100, 5),
        (2, 100, 5),   # duplicate point — both survive
        (3, 100, 4),   # same price, smaller size — dominated
        (4, 150, 5),   # same size as cheaper row — dominated
        (5, 150, 9),
        (6, 240, 9),   # other bucket, size tie with 5 — dominated
        (7, 260, 12),
        (8, 900, 13),
        (9, 905, 1),   # dominated by everything cheaper+bigger? no:
        #              size 1 < all, price higher than 1-8 — dominated
        (10, 95, 2),   # cheapest overall — survives (price strict)
    ]
    df = spark.createDataFrame(pts, "pk long, price long, size long")
    for width in (100, 7, 10000):
        got = sorted(
            r["pk"]
            for r in skyline2d(
                df, "price", "size", bucket_width=width
            ).collect()
        )
        assert got == _brute_skyline(pts), width


def test_skyline_single_point_and_empty(spark):
    df = spark.createDataFrame([(1, 10, 10)], "pk long, price long, size long")
    assert skyline2d(df, "price", "size", 5).count() == 1
    empty = df.filter("pk < 0")
    assert skyline2d(empty, "price", "size", 5).count() == 0
