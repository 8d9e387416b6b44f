"""Weak-label NB quality classifier + gazetteer mention extraction
(operators/classify.py)."""

import math

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _llr(c_pos, n, t_pos, t_neg, v):
    return round(math.log((c_pos + 1) / (t_pos + v)) * 1e6) - round(
        math.log((n - c_pos + 1) / (t_neg + v)) * 1e6
    )


def test_nb_quality_matches_hand_model(spark):
    from serd_spark.operators.classify import nb_quality

    d = _docs(spark, [(1, "good fine good"), (2, "bad awful"), (3, "good bad")])
    out = {
        r["doc_id"]: r
        for r in nb_quality(d, F.col("doc_id") == 1).collect()
    }
    # counts: good n=3 c_pos=2, fine n=1 c_pos=1, bad n=2 c_pos=0,
    # awful n=1 c_pos=0 → t_pos=3, t_neg=4, v=4
    llr = {
        "good": _llr(2, 3, 3, 4, 4),
        "fine": _llr(1, 1, 3, 4, 4),
        "bad": _llr(0, 2, 3, 4, 4),
        "awful": _llr(0, 1, 3, 4, 4),
    }
    prior = round(math.log(2 / 3) * 1e6)
    assert out[1]["n_toks"] == 3
    assert out[1]["llr_sum_micros"] == 2 * llr["good"] + llr["fine"]
    assert out[1]["score_micros"] == out[1]["llr_sum_micros"] + prior
    assert out[2]["llr_sum_micros"] == llr["bad"] + llr["awful"]
    assert out[3]["llr_sum_micros"] == llr["good"] + llr["bad"]
    # separation: the all-positive-words doc scores above the
    # all-negative-words doc, and the signs give the keep decision
    assert out[1]["score_micros"] > out[2]["score_micros"]
    assert out[1]["pred"] == 1 and out[2]["pred"] == 0


def test_nb_quality_empty_and_all_positive(spark):
    from serd_spark.operators.classify import nb_quality

    d = _docs(spark, [(1, "w w"), (2, ""), (3, "   ")])
    rows = nb_quality(d, F.lit(True)).collect()
    # token-less docs drop out; all-positive corpus still well-defined
    assert sorted(r["doc_id"] for r in rows) == [1]
    r = rows[0]
    # llr(w) = ln(3/3) - ln(1/1) = 0; prior = ln(4/1)
    assert r["llr_sum_micros"] == 0
    assert r["score_micros"] == round(math.log(4.0) * 1e6)


def test_gazetteer_uni_and_bigram_mentions(spark):
    from serd_spark.operators.classify import gazetteer_mentions

    d = _docs(
        spark,
        [
            (1, "the hash join beats a sort merge join on spark"),
            (2, "Hash  Join and HASH JOIN again; spark spark"),
            (3, "nothing relevant here"),
        ],
    )
    out = gazetteer_mentions(d, ["spark", "hash join", "sort merge"]).collect()
    got = {(r["doc_id"], r["entity"]): r["n_mentions"] for r in out}
    assert got == {
        (1, "spark"): 1,
        (1, "hash join"): 1,
        (1, "sort merge"): 1,
        # normalization folds case/whitespace; "again;" is not "again"
        (2, "hash join"): 2,
        (2, "spark"): 2,
    }


def test_gazetteer_overlapping_bigrams_count_per_window(spark):
    from serd_spark.operators.classify import gazetteer_mentions

    d = _docs(spark, [(1, "a a a")])
    (row,) = gazetteer_mentions(d, ["a a"]).collect()
    # adjacent-pair windows overlap: positions (1,2) and (2,3)
    assert row["n_mentions"] == 2


def test_gazetteer_rejects_bad_entries(spark):
    from serd_spark.operators.classify import gazetteer_mentions

    d = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError, match="3 tokens"):
        gazetteer_mentions(d, ["one two three"])
    with pytest.raises(ValueError, match="collide"):
        gazetteer_mentions(d, ["Hash Join", "hash  join"])


def test_blocklist_stats_density_and_flag(spark):
    from serd_spark.operators.classify import blocklist_stats

    d = _docs(
        spark,
        [
            (1, "bad words bad words bad words bad words"),  # saturated
            (2, "one bad words mention in a long clean document " + 
                "with many extra tokens " * 5),
            (3, "totally clean text here"),
            (4, ""),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in blocklist_stats(
            d, ["bad words"], max_hits_ppm=200_000
        ).collect()
    }
    # doc 1: 8 tokens, 4 hits → 500000 ppm → dropped
    assert out[1]["n_toks"] == 8 and out[1]["n_hits"] == 4
    assert out[1]["hits_ppm"] == 500_000 and out[1]["dropped"] == 1
    # doc 2: 1 hit over 28 tokens → 35714 ppm → kept
    assert out[2]["n_hits"] == 1
    assert out[2]["hits_ppm"] == (1_000_000 // out[2]["n_toks"])
    assert out[2]["dropped"] == 0
    # doc 3: zero hits, kept; doc 4: token-less, absent
    assert out[3]["n_hits"] == 0 and out[3]["dropped"] == 0
    assert 4 not in out
