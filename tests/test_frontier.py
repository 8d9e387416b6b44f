"""recrawl_schedule — adaptive intervals and the exact per-host
politeness queue, checked against the sequential recurrence."""

from serd_spark.operators.frontier import recrawl_schedule


def _fetches(spark, rows):
    return spark.createDataFrame(
        rows, "url string, host string, ts long, version string"
    )


def test_interval_estimator_clamps(spark):
    rows = [
        # seen once → min_interval
        ("u1", "h", 1000, "a"),
        # 3 fetches, never changed → 2 gaps / 1 change floor → 2*min
        ("u2", "h", 1000, "a"), ("u2", "h", 2000, "a"),
        ("u2", "h", 3000, "a"),
        # 3 fetches, changed every time → min
        ("u3", "h", 1000, "a"), ("u3", "h", 2000, "b"),
        ("u3", "h", 3000, "c"),
    ]
    out = {
        r.url: (r.n_fetches, r.n_versions, r.interval_s, r.next_due)
        for r in recrawl_schedule(
            _fetches(spark, rows), min_interval=100, max_interval=150,
        ).collect()
    }
    assert out["u1"] == (1, 1, 100, 1100)
    # estimator 100*2//1 = 200, clamped to max 150
    assert out["u2"] == (3, 1, 150, 3150)
    assert out["u3"] == (3, 3, 100, 3100)


def test_politeness_queue_matches_recurrence(spark):
    # one host, due times chosen so the queue both waits on due times
    # and backs up behind the delay
    rows = [(f"u{i}", "h", t, "a") for i, t in
            enumerate([0, 1, 2, 50, 51, 52])]
    out = recrawl_schedule(
        _fetches(spark, rows), min_interval=10, max_interval=10,
        politeness_delay=7,
    )
    got = sorted((r.slot, r.next_due, r.sched_ts) for r in out.collect())
    # replay the sequential recurrence t_i = max(due_i, t_{i-1}+delay)
    dues = sorted(r.next_due for r in out.collect())
    t, expect = None, []
    for d in dues:
        t = d if t is None else max(d, t + 7)
        expect.append(t)
    assert [s for _, _, s in got] == expect
    # and the queue really backed up: 3rd fetch waits on the delay
    assert expect[2] > dues[2]


def test_queues_are_per_host(spark):
    rows = [("a", "h1", 0, "x"), ("b", "h2", 0, "x")]
    out = recrawl_schedule(
        _fetches(spark, rows), min_interval=5, max_interval=5,
        politeness_delay=60,
    )
    # different hosts do not serialize against each other
    assert {r.sched_ts for r in out.collect()} == {5}
    assert {r.slot for r in out.collect()} == {0}


def _redirects(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def test_redirect_chain_resolves_with_hops(spark):
    from serd_spark.operators.frontier import resolve_redirects

    rows = [("a", "b"), ("b", "c"), ("c", "d")]  # d is terminal
    got = {
        r.src: (r.final, r.hops, r.status)
        for r in resolve_redirects(_redirects(spark, rows)).collect()
    }
    assert got == {
        "a": ("d", 3, "ok"),
        "b": ("d", 2, "ok"),
        "c": ("d", 1, "ok"),
    }


def test_redirect_loop_unresolved(spark):
    from serd_spark.operators.frontier import resolve_redirects

    rows = [("a", "b"), ("b", "a"), ("c", "a"), ("s", "s"), ("x", "y")]
    got = {
        r.src: (r.final, r.hops, r.status)
        for r in resolve_redirects(_redirects(spark, rows)).collect()
    }
    # the 2-cycle, everything feeding it, and the self-loop all fail;
    # the independent chain still resolves
    assert got["a"] == (None, None, "unresolved")
    assert got["b"] == (None, None, "unresolved")
    assert got["c"] == (None, None, "unresolved")
    assert got["s"] == (None, None, "unresolved")
    assert got["x"] == ("y", 1, "ok")


def test_redirect_hop_cap(spark):
    from serd_spark.operators.frontier import resolve_redirects

    # chain of length 6: head resolves at max_hops=6, not at 5
    rows = [(f"u{i}", f"u{i+1}") for i in range(6)]
    r5 = {
        r.src: r.status
        for r in resolve_redirects(_redirects(spark, rows), max_hops=5).collect()
    }
    r6 = {
        r.src: (r.final, r.hops, r.status)
        for r in resolve_redirects(_redirects(spark, rows), max_hops=6).collect()
    }
    assert r5["u0"] == "unresolved"
    assert r5["u1"] == "ok"
    assert r6["u0"] == ("u6", 6, "ok")


def test_redirect_conflicting_locations_pin(spark):
    from serd_spark.operators.frontier import resolve_redirects

    # two Locations for one src: lexicographically smallest dst wins
    rows = [("a", "z"), ("a", "m")]
    got = {
        r.src: (r.final, r.hops)
        for r in resolve_redirects(_redirects(spark, rows)).collect()
    }
    assert got == {"a": ("m", 1)}


def test_apportion_exact_sum_and_shares(spark):
    from serd_spark.operators.frontier import apportion_budget

    df = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 2), ("d", 0), ("e", None)],
        "host string, w int",
    )
    out = {r.host: r.alloc for r in apportion_budget(df, 100).collect()}
    # W=10: exact shares 50/30/20, no remainders
    assert out == {"a": 50, "b": 30, "c": 20, "d": 0, "e": 0}


def test_apportion_largest_remainder_and_ties(spark):
    from serd_spark.operators.frontier import apportion_budget

    # W=7, total=10: base = floor(10w/7), rem = 10w mod 7
    # a: w=3 -> base 4 rem 2; b: w=2 -> base 2 rem 6; c: w=2 -> 2 rem 6
    # r = 10-8 = 2 -> both b and c (rem 6) get +1 before a (rem 2)
    df = spark.createDataFrame(
        [("a", 3), ("b", 2), ("c", 2)], "host string, w int"
    )
    out = {r.host: r.alloc for r in apportion_budget(df, 10).collect()}
    assert out == {"a": 4, "b": 3, "c": 3}
    assert sum(out.values()) == 10


def test_apportion_tie_break_by_key(spark):
    from serd_spark.operators.frontier import apportion_budget

    # equal weights, total not divisible: extras go to smallest keys
    df = spark.createDataFrame(
        [("d", 1), ("b", 1), ("c", 1), ("a", 1)], "host string, w int"
    )
    out = {r.host: r.alloc for r in apportion_budget(df, 6).collect()}
    assert out == {"a": 2, "b": 2, "c": 1, "d": 1}


def test_apportion_matches_reference_hamilton(spark):
    from serd_spark.operators.frontier import apportion_budget

    rows = [(f"h{i:02d}", (i * 17) % 23 + 1) for i in range(40)]
    total = 997
    df = spark.createDataFrame(rows, "host string, w int")
    got = {r.host: r.alloc for r in apportion_budget(df, total).collect()}
    # reference implementation
    W = sum(w for _, w in rows)
    base = {h: total * w // W for h, w in rows}
    rem = {h: (total * w) % W for h, w in rows}
    r = total - sum(base.values())
    order = sorted(rows, key=lambda x: (-rem[x[0]], x[0]))
    want = dict(base)
    for h, _ in order[:r]:
        want[h] += 1
    assert got == want
    assert sum(got.values()) == total


def test_apportion_zero_weights_zero_total(spark):
    from serd_spark.operators.frontier import apportion_budget

    df = spark.createDataFrame(
        [("a", 0), ("b", 0)], "host string, w int"
    )
    assert {
        r.host: r.alloc for r in apportion_budget(df, 50).collect()
    } == {"a": 0, "b": 0}
    df2 = spark.createDataFrame([("a", 4)], "host string, w int")
    assert {
        r.host: r.alloc for r in apportion_budget(df2, 0).collect()
    } == {"a": 0}
