"""Fact fusion / truth discovery (operators/fusion.py)."""

from serd_spark.operators.fusion import (
    INIT_TRUST,
    TRUST_UNIT,
    fact_fusion,
    source_trust,
)


def _claims(spark, rows):
    return spark.createDataFrame(
        rows, "source string, subj string, pred string, obj string"
    )


def test_majority_wins(spark):
    # 3 sources say paris, 1 says berlin; all sources otherwise alike
    rows = [
        ("s1", "fr", "capital", "paris"),
        ("s2", "fr", "capital", "paris"),
        ("s3", "fr", "capital", "paris"),
        ("s4", "fr", "capital", "berlin"),
    ]
    out = {(r["subj"], r["pred"]): r for r in fact_fusion(_claims(spark, rows)).collect()}
    w = out[("fr", "capital")]
    assert w["obj"] == "paris"
    assert w["n_src"] == 3
    assert w["conf_micros"] > TRUST_UNIT // 2


def test_reliable_source_outvotes_two_noisy(spark):
    # s_good sides with a 5-source consensus on 8 facts, so its
    # trust grows toward 1; s_n1/s_n2 contradict the consensus every
    # time, so theirs decays toward 0 (~112k micros after 3 rounds).
    # On the contested fact the single reliable source (888k) then
    # outvotes the two decayed ones combined (2 × 112k).
    rows = []
    for i in range(8):
        for w in ("s_good", "s_w1", "s_w2", "s_w3", "s_w4"):
            rows.append((w, f"e{i}", "p", "right"))
        rows += [
            ("s_n1", f"e{i}", "p", f"wrong{i}"),
            ("s_n2", f"e{i}", "p", f"wrong{i}"),
        ]
    rows += [
        ("s_good", "x", "p", "gold"),
        ("s_n1", "x", "p", "junk"),
        ("s_n2", "x", "p", "junk"),
    ]
    out = {(r["subj"], r["pred"]): r for r in fact_fusion(_claims(spark, rows), n_iter=3).collect()}
    assert out[("x", "p")]["obj"] == "gold"
    tr = {r["src"]: r["trust_micros"] for r in source_trust(_claims(spark, rows), n_iter=3).collect()}
    assert tr["s_good"] > tr["s_n1"]
    assert tr["s_n1"] == tr["s_n2"]  # symmetric sources stay equal


def test_tie_breaks_by_min_obj(spark):
    rows = [
        ("a", "s", "p", "bbb"),
        ("b", "s", "p", "aaa"),
    ]
    out = fact_fusion(_claims(spark, rows)).collect()
    assert len(out) == 1 and out[0]["obj"] == "aaa"


def test_duplicate_assertions_count_once(spark):
    rows = [
        ("a", "s", "p", "x"),
        ("a", "s", "p", "x"),  # same source repeats itself
        ("b", "s", "p", "y"),
        ("c", "s", "p", "y"),
    ]
    out = fact_fusion(_claims(spark, rows)).collect()
    assert out[0]["obj"] == "y" and out[0]["n_src"] == 2


def test_single_round_matches_hand_arithmetic(spark):
    # one round, uniform trust: conf = vote*1e6 DIV tot with
    # vote = n_sources * INIT_TRUST
    rows = [
        ("a", "s", "p", "x"),
        ("b", "s", "p", "x"),
        ("c", "s", "p", "y"),
    ]
    out = {r["obj"]: r for r in fact_fusion(_claims(spark, rows), n_iter=1).collect()}
    tot = 3 * INIT_TRUST
    assert out["x"]["conf_micros"] == (2 * INIT_TRUST * TRUST_UNIT) // tot


def test_null_components_dropped(spark):
    rows = [
        ("a", "s", "p", "x"),
        (None, "s", "p", "zzz"),
        ("b", "s", None, "zzz"),
    ]
    out = fact_fusion(_claims(spark, rows)).collect()
    assert len(out) == 1 and out[0]["obj"] == "x"
