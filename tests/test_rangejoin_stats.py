"""Range join (operators/rangejoin.py) and exact distributed
quantiles (operators/stats.py) — each checked against a brute-force
reference computed in Python over the same rows."""

from datetime import datetime, timedelta

import pytest

from serd_spark.operators.rangejoin import range_join
from serd_spark.operators.stats import exact_quantiles


def _ts(s):
    return datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(rows, "k long, ts timestamp, eid long")


def test_range_join_matches_brute_force(spark):
    # dense cluster around minute boundaries to exercise bucket edges
    base = _ts("2024-03-01 12:00:00")
    lrows = [(1, base + timedelta(seconds=s), 100 + s) for s in range(0, 120, 7)]
    rrows = [(1, base + timedelta(seconds=s), 200 + s) for s in range(0, 120, 5)]
    rrows += [(2, base, 300)]  # other key never matches key 1
    left = _events(spark, lrows)
    right = _events(spark, rrows).withColumnRenamed("eid", "rid")

    out = range_join(
        left, right, on="k", before_s=10, after_s=3
    )
    got = {(r["eid"], r["rid"]) for r in out.collect()}
    want = {
        (le, re)
        for (lk, lt, le) in lrows
        for (rk, rt, re) in rrows
        if lk == rk and lt - timedelta(seconds=10) <= rt <= lt + timedelta(seconds=3)
    }
    assert got == want and len(want) > 20


def test_range_join_boundary_inclusive_exact(spark):
    # rows EXACTLY on the window edges and on bucket boundaries
    base = _ts("2024-03-01 00:00:00")
    left = _events(spark, [(1, base + timedelta(seconds=60), 1)])
    right = _events(
        spark,
        [
            (1, base + timedelta(seconds=50), 10),  # == ts - before
            (1, base + timedelta(seconds=65), 11),  # == ts + after
            (1, base + timedelta(seconds=49, microseconds=999999), 12),  # out
            (1, base + timedelta(seconds=65, microseconds=1), 13),  # out
        ],
    ).withColumnRenamed("eid", "rid")
    got = sorted(
        r["rid"] for r in range_join(left, right, on="k", before_s=10, after_s=5).collect()
    )
    assert got == [10, 11]


def test_range_join_left_outer_keeps_unmatched_once(spark):
    base = _ts("2024-03-01 00:00:00")
    left = _events(spark, [(1, base, 1), (2, base, 2)])
    right = _events(spark, [(1, base, 10)]).withColumnRenamed("eid", "rid")
    out = range_join(left, right, on="k", before_s=1, after_s=1, how="left").collect()
    by_eid = {}
    for r in out:
        by_eid.setdefault(r["eid"], []).append(r)
    assert len(by_eid[1]) == 1 and by_eid[1][0]["rid"] == 10
    assert len(by_eid[2]) == 1 and by_eid[2][0]["rid"] is None


def test_range_join_rejects_bad_args(spark):
    df = _events(spark, [(1, _ts("2024-01-01 00:00:00"), 1)])
    with pytest.raises(ValueError):
        range_join(df, df, on="k", before_s=0, after_s=0)
    with pytest.raises(ValueError):
        range_join(df, df, on="k", before_s=1, after_s=1, how="full")


def _pdisc(values, q_permille):
    s = sorted(values)
    rank = -(-q_permille * len(s) // 1000)  # ceil
    return s[rank - 1]


def test_exact_quantiles_global(spark):
    vals = [7, 1, 3, 3, 9, 2, 8, 3, 5, 4, 6, 3]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {
        r["q_permille"]: r["value"]
        for r in exact_quantiles(df, "x", [1, 250, 500, 750, 1000]).collect()
    }
    assert got == {q: _pdisc(vals, q) for q in (1, 250, 500, 750, 1000)}


def test_exact_quantiles_grouped(spark):
    rows = [("a", v) for v in range(1, 11)] + [("b", v) for v in (5, 5, 5, 9)]
    df = spark.createDataFrame(rows, "g string, x long")
    got = {
        (r["g"], r["q_permille"]): r["value"]
        for r in exact_quantiles(df, "x", [500, 900], by=["g"]).collect()
    }
    assert got[("a", 500)] == _pdisc(range(1, 11), 500)
    assert got[("a", 900)] == _pdisc(range(1, 11), 900)
    assert got[("b", 500)] == 5 and got[("b", 900)] == 9


def test_exact_quantiles_validates(spark):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError):
        exact_quantiles(df, "x", [])
    with pytest.raises(ValueError):
        exact_quantiles(df, "x", [0])


def test_exact_quantiles_ignores_nulls(spark):
    rows = [(1,), (None,), (3,), (None,), (2,)]
    df = spark.createDataFrame(rows, "x long")
    got = {
        r["q_permille"]: r["value"]
        for r in exact_quantiles(df, "x", [1, 1000]).collect()
    }
    assert got == {1: 1, 1000: 3}


def test_range_join_left_outer_null_payload_not_duplicated(spark):
    # review finding: null-unsafe anti-join re-emitted matched rows
    # carrying a NULL payload column as spurious unmatched rows
    base = _ts("2024-03-01 00:00:00")
    left = spark.createDataFrame(
        [(1, base, 1, None), (1, base, 2, "x")],
        "k long, ts timestamp, eid long, note string",
    )
    right = spark.createDataFrame(
        [(1, base, 10)], "k long, ts timestamp, rid long"
    )
    out = range_join(left, right, on="k", before_s=1, after_s=1, how="left").collect()
    assert len(out) == 2
    assert all(r["rid"] == 10 for r in out)


def test_sketch_distinct_estimates_within_tolerance(spark):
    from serd_spark.operators.stats import sketch_distinct

    # 40k distinct values, each duplicated 3x: the estimate must track
    # the DISTINCT count (the sample decision is per value, not per
    # row), within binomial noise of the ~156 expected survivors
    n = 40_000
    df = (
        spark.range(n)
        .selectExpr("concat('value-', id) AS v")
        .union(spark.range(n).selectExpr("concat('value-', id) AS v"))
        .union(spark.range(n).selectExpr("concat('value-', id) AS v"))
    )
    row = sketch_distinct(df, "v", prefix_zeros=2).collect()[0]
    assert row.distinct_est == row.n_kept * 256
    assert abs(row.distinct_est - n) / n < 0.25  # ~3 sigma of 1/sqrt(156)
    # deterministic: same input -> identical estimate
    again = sketch_distinct(df, "v", prefix_zeros=2).collect()[0]
    assert (row.n_kept, row.distinct_est) == (again.n_kept, again.distinct_est)


def test_sketch_distinct_grouped_and_validates(spark):
    import pytest as _pytest

    from serd_spark.operators.stats import sketch_distinct

    df = spark.createDataFrame(
        [("a", f"x{i}") for i in range(5000)]
        + [("b", f"x{i}") for i in range(100)]
        + [("b", None)],
        ["g", "v"],
    )
    rows = {r.g: r for r in sketch_distinct(df, "v", by=["g"]).collect()}
    # group b keeps so few values it may vanish entirely; group a must
    # be present and scaled
    assert rows["a"].distinct_est == rows["a"].n_kept * 256
    assert rows["a"].n_kept > 0
    with _pytest.raises(ValueError):
        sketch_distinct(df, "v", prefix_zeros=0)


# ---------------------------------------------------------------- hdr sketch


def _hdr_ref_bucket(v, sb=4):
    e = v.bit_length() - 1
    lo = 1 << e
    sub = ((v - lo) << sb) >> e if e >= sb else (v - lo) << (sb - e)
    return e * (1 << sb) + sub


def test_hdr_bucket_matches_bit_twiddling_reference(spark):
    from pyspark.sql import functions as F

    from serd_spark.operators.stats import hdr_bucket

    # powers of two ±1 (the float-log2 danger zone), sub-bucket edges,
    # and the extremes of the int64 domain
    vals = sorted(
        {1, 2, 3, (1 << 63) - 1, (1 << 62), (1 << 62) + 5}
        | {(1 << e) + d for e in (1, 2, 3, 4, 5, 20, 40, 52, 61)
           for d in (-1, 0, 1)}
        | {v for v in range(1, 200)}
        | {10**k for k in range(1, 18)}
    )
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r["v"]: r["b"]
        for r in df.select(
            "v", hdr_bucket(F.col("v"), 4).alias("b")
        ).collect()
    }
    for v in vals:
        assert got[v] == _hdr_ref_bucket(v), v


def test_hdr_quantiles_error_bound_and_merge(spark):
    import math

    from serd_spark.operators.stats import hdr_quantiles, hdr_sketch

    data = [("g%d" % (i % 2), (i * 37 % 997) + 1) for i in range(2000)]
    df = spark.createDataFrame(data, "grp string, v long")
    sk = hdr_sketch(df, "v", by=["grp"], sub_bits=4)
    out = {
        (r["grp"], r["q_permille"]): (r["est"], r["n"])
        for r in hdr_quantiles(
            sk, [500, 900, 990], by=["grp"], sub_bits=4
        ).collect()
    }
    for grp in ("g0", "g1"):
        vs = sorted(v for g, v in data if g == grp)
        n = len(vs)
        for q in (500, 900, 990):
            est, got_n = out[(grp, q)]
            exact = vs[math.ceil(q * n / 1000) - 1]
            assert got_n == n
            # lower-bound estimate within the 2^-sub_bits relative bound
            assert est <= exact
            assert (exact - est) / exact <= 1 / 16 + 1e-12

    # MERGEABILITY — the property that makes it the 100 TB path:
    # sketching two halves separately and adding counts equals
    # sketching the whole
    half1 = spark.createDataFrame(data[:1000], "grp string, v long")
    half2 = spark.createDataFrame(data[1000:], "grp string, v long")
    merged = (
        hdr_sketch(half1, "v", by=["grp"])
        .unionAll(hdr_sketch(half2, "v", by=["grp"]))
        .groupBy("grp", "bucket")
        .sum("cnt")
    )
    whole = {
        (r["grp"], r["bucket"]): r["cnt"]
        for r in hdr_sketch(df, "v", by=["grp"]).collect()
    }
    got = {
        (r["grp"], r["bucket"]): r["sum(cnt)"] for r in merged.collect()
    }
    assert got == whole


def test_hdr_sketch_drops_nonpositive_and_validates(spark):
    import pytest as _pytest

    from serd_spark.operators.stats import hdr_bucket, hdr_quantiles, hdr_sketch

    df = spark.createDataFrame(
        [(0,), (-5,), (1,), (2,)], "v long"
    )
    rows = hdr_sketch(df, "v").collect()
    assert sum(r["cnt"] for r in rows) == 2
    with _pytest.raises(ValueError):
        hdr_bucket(None, sub_bits=9)
    with _pytest.raises(ValueError):
        hdr_quantiles(hdr_sketch(df, "v"), [])
    with _pytest.raises(ValueError):
        hdr_quantiles(hdr_sketch(df, "v"), [0])


# ---------------------------------------------------------------- count-min


def test_countmin_never_underestimates_and_merges(spark):
    from pyspark.sql import functions as F

    from serd_spark.operators.stats import countmin_estimate, countmin_sketch

    # zipf-ish multiset over a vocab larger than width=8 so real
    # collisions happen
    vals = []
    for i in range(30):
        vals += [f"tok{i}"] * (30 - i)
    df = spark.createDataFrame([(v,) for v in vals], "w string")
    sk = countmin_sketch(df, "w", depth=4, width=8)
    probes = df.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("exact_cnt")
    )
    out = {
        r["w"]: (r["exact_cnt"], r["cms_est"])
        for r in countmin_estimate(sk, probes, "w", depth=4, width=8).collect()
    }
    assert len(out) == 30
    assert all(est >= exact for exact, est in out.values())
    # with width >= vocab and distinct buckets the estimate is exact
    sk_wide = countmin_sketch(df, "w", depth=4, width=4096)
    wide = countmin_estimate(sk_wide, probes, "w", depth=4, width=4096)
    assert all(r["cms_est"] == r["exact_cnt"] for r in wide.collect())

    # MERGE: cells of two halves add up to the whole corpus's cells
    h1 = spark.createDataFrame([(v,) for v in vals[:500]], "w string")
    h2 = spark.createDataFrame([(v,) for v in vals[500:]], "w string")
    merged = (
        countmin_sketch(h1, "w", depth=4, width=8)
        .unionAll(countmin_sketch(h2, "w", depth=4, width=8))
        .groupBy("row", "col")
        .sum("cnt")
    )
    whole = {
        (r["row"], r["col"]): r["cnt"] for r in sk.collect()
    }
    got = {
        (r["row"], r["col"]): r["sum(cnt)"] for r in merged.collect()
    }
    assert got == whole


def test_countmin_validates(spark):
    import pytest as _pytest

    from serd_spark.operators.stats import countmin_sketch

    df = spark.createDataFrame([("a",)], "w string")
    with _pytest.raises(ValueError):
        countmin_sketch(df, "w", depth=0)
    with _pytest.raises(ValueError):
        countmin_sketch(df, "w", width=1)


# ---------------------------------------------------------------- hyperloglog


def _hll_ref_register(value: str, p: int = 8):
    # independent pure-Python reference: 60-bit md5 prefix, top-p
    # bucket, leading-zero rank of the remaining bits
    import hashlib

    h = int(hashlib.md5(value.encode()).hexdigest()[:15], 16)
    wbits = 60 - p
    bucket = h >> wbits
    w = h & ((1 << wbits) - 1)
    rho = (wbits + 1) if w == 0 else (wbits + 1 - w.bit_length())
    return bucket, rho


def test_hll_registers_match_python_reference(spark):
    from serd_spark.operators.stats import hll_sketch

    vals = [f"tok-{i}" for i in range(500)] + ["", "a", "élève"]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = {r.bucket: r.rho for r in hll_sketch(df, "v").collect()}
    want: dict = {}
    for v in vals:
        b, r = _hll_ref_register(v)
        want[b] = max(want.get(b, 0), r)
    assert got == want


def test_hll_estimate_tracks_distinct_not_rows(spark):
    from serd_spark.operators.stats import hll_estimate, hll_sketch

    n = 40_000
    df = (
        spark.range(n)
        .selectExpr("concat('value-', id) AS v")
        .union(spark.range(n).selectExpr("concat('value-', id) AS v"))
    )
    row = hll_estimate(hll_sketch(df, "v", p=8), p=8).collect()[0]
    # standard error ~1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert abs(row.hll_est - n) / n < 0.20
    assert row.m == 256 and row.n_regs + row.zero_regs == 256
    again = hll_estimate(hll_sketch(df, "v", p=8), p=8).collect()[0]
    assert row.asDict() == again.asDict()


def test_hll_small_range_linear_counting(spark):
    from serd_spark.operators.stats import hll_estimate, hll_sketch

    df = spark.createDataFrame([(f"x{i}",) for i in range(5)], ["v"])
    row = hll_estimate(hll_sketch(df, "v"), p=8).collect()[0]
    assert row.zero_regs > 0
    assert 3 <= row.hll_est <= 8  # m*ln(m/V) near the true 5


def test_hll_sketches_merge_by_register_max(spark):
    from pyspark.sql import functions as F

    from serd_spark.operators.stats import hll_estimate, hll_sketch

    a = spark.createDataFrame([(f"t{i}",) for i in range(0, 600)], ["v"])
    b = spark.createDataFrame([(f"t{i}",) for i in range(300, 900)], ["v"])
    merged = (
        hll_sketch(a, "v")
        .union(hll_sketch(b, "v"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    whole = hll_sketch(a.union(b), "v")
    est_m = hll_estimate(merged).collect()[0]
    est_w = hll_estimate(whole).collect()[0]
    assert est_m.asDict() == est_w.asDict()


def test_hll_validates_p(spark):
    import pytest as _pytest

    from serd_spark.operators.stats import hll_sketch

    df = spark.createDataFrame([("x",)], ["v"])
    with _pytest.raises(ValueError):
        hll_sketch(df, "v", p=2)


def test_heavy_hitters_exact_and_ordered(spark):
    from serd_spark.operators.stats import heavy_hitters

    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 3 + [("d",)] * 1
    df = spark.createDataFrame(rows, "w string")
    out = [(r["w"], r["n"]) for r in heavy_hitters(df, "w", 3).collect()]
    assert out == [("a", 5), ("b", 3), ("c", 3)]


def test_heavy_hitters_collisions_filtered_by_exact_pass(spark):
    from serd_spark.operators.stats import heavy_hitters

    # width=2: values collide into two cells per depth → the candidate
    # filter passes (nearly) everything; the exact pass must still
    # produce only the true heavy hitters
    rows = [("x",)] * 4 + [(f"u{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, "w string")
    out = [(r["w"], r["n"])
           for r in heavy_hitters(df, "w", 4, width=2).collect()]
    assert out == [("x", 4)]


def test_heavy_hitters_empty_and_validation(spark):
    import pytest

    from serd_spark.operators.stats import heavy_hitters

    df = spark.createDataFrame([("a",), ("b",)], "w string")
    assert heavy_hitters(df, "w", 5).count() == 0
    with pytest.raises(ValueError):
        heavy_hitters(df, "w", 0)


def test_transition_counts_sessions_and_start(spark):
    from pyspark.sql import functions as F

    from serd_spark.operators.stats import transition_counts

    rows = [
        # user 1: one session A->B->C, then a >30min gap, new session C
        (1, 1, "2024-01-01 10:00:00", "A"),
        (2, 1, "2024-01-01 10:05:00", "B"),
        (3, 1, "2024-01-01 10:10:00", "C"),
        (4, 1, "2024-01-01 11:00:00", "C"),
        # user 2: single event
        (5, 2, "2024-01-01 09:00:00", "A"),
        # user 2... tie timestamps break on event_id: 6 then 7
        (6, 2, "2024-01-01 09:01:00", "B"),
        (7, 2, "2024-01-01 09:01:00", "A"),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (r.prev_state, r.next_state): r.n
        for r in transition_counts(e).collect()
    }
    assert got[("__start__", "A")] == 2   # both users' first sessions
    assert got[("__start__", "C")] == 1   # user 1's second session
    assert got[("A", "B")] == 2
    assert got[("B", "C")] == 1
    assert got[("B", "A")] == 1           # the event_id tie-break
    assert sum(got.values()) == len(rows)


def test_profile_table_normalization_and_nulls(spark):
    from pyspark.sql import functions as F

    from serd_spark.operators.stats import profile_table

    rows = [
        (1, "a", 1.5, "2024-03-01 10:00:00"),
        (2, None, -0.25, "2024-03-02 11:30:00"),
        (3, "b", None, None),
        (4, "a", 2.0, "2024-03-01 09:00:00"),
    ]
    df = (
        spark.createDataFrame(
            rows, "id long, s string, v double, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
    )
    got = {r.column: r for r in profile_table(df).collect()}
    assert got["id"].n_total == 4 and got["id"].n_nonnull == 4
    assert got["id"].n_distinct == 4
    assert (got["id"].min_norm, got["id"].max_norm) == ("1", "4")
    assert got["s"].n_nonnull == 3 and got["s"].n_distinct == 2
    assert (got["s"].min_norm, got["s"].max_norm) == ("a", "b")
    # doubles normalized to integer micros, NATIVE ordering kept
    assert (got["v"].min_norm, got["v"].max_norm) == ("-250000", "2000000")
    # timestamps normalized to formatted strings
    assert got["ts"].min_norm == "2024-03-01 09:00:00"
    assert got["ts"].max_norm == "2024-03-02 11:30:00"
    assert got["ts"].n_nonnull == 3


def test_rollup_cascade_equals_direct(spark):
    """Cascade (day from hour, week from day) must equal aggregating
    raw events directly at every grain — the partial-merge law."""
    from datetime import datetime

    import pyspark.sql.functions as F

    from serd_spark.operators.stats import rollup_cascade

    rows = []
    for i in range(200):
        rows.append(
            (
                datetime(2026, 1, 1 + i % 20, i % 24, (i * 7) % 60),
                "a" if i % 3 else "b",
                (i * 13) % 1000,
            )
        )
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value_cents long")
    out = rollup_cascade(df)
    got = {
        (r.grain, r.bucket_start, r.event_type): (r.n_events, r.value)
        for r in out.collect()
    }
    for grain in ("hour", "day", "week"):
        direct = (
            df.groupBy(
                F.date_format(
                    F.date_trunc(grain, "ts"), "yyyy-MM-dd HH:mm:ss"
                ).alias("b"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("value_cents").alias("v"),
            )
            .collect()
        )
        for r in direct:
            assert got[(grain, r.b, r.event_type)] == (r.n, r.v), (
                grain, r.b, r.event_type
            )
    # row counts match too (no phantom buckets)
    n_direct = sum(
        df.select(
            F.date_trunc(g, "ts").alias("b"), "event_type"
        ).distinct().count()
        for g in ("hour", "day", "week")
    )
    assert out.count() == n_direct
