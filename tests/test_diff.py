"""triple_diff (operators/diff.py) — set semantics, multiplicity
collapse, and both change directions."""

from serd_spark.operators.diff import triple_diff

COLS = "g string, s string, p string, o string, o_kind int, o_dt string, o_lang string"


def _t(spark, rows):
    return spark.createDataFrame(rows, COLS)


def test_diff_directions_and_multiplicity(spark):
    base = [
        (None, "s1", "p1", "o1", 0, None, None),
        (None, "s2", "p1", "o2", 0, None, None),
        # duplicated statement (two source docs) — multiplicity must
        # not show up in the diff
        (None, "s2", "p1", "o2", 0, None, None),
        ("g1", "s3", "p2", "lit", 1, None, "en"),
    ]
    old = _t(spark, base)
    new = _t(
        spark,
        [
            (None, "s1", "p1", "o1", 0, None, None),  # unchanged
            # s2 now appears ONCE — still unchanged (set semantics)
            (None, "s2", "p1", "o2", 0, None, None),
            # language tag changed — remove+add pair
            ("g1", "s3", "p2", "lit", 1, None, "fr"),
            # brand new statement
            (None, "s4", "p1", "o9", 0, None, None),
        ],
    )
    got = {
        (r["s"], r["o_lang"], r["change"])
        for r in triple_diff(old, new).collect()
    }
    assert got == {
        ("s3", "en", "removed"),
        ("s3", "fr", "added"),
        ("s4", None, "added"),
    }


def test_diff_identical_sets_is_empty(spark):
    rows = [(None, "s", "p", "o", 0, None, None)] * 3
    df = _t(spark, rows)
    assert triple_diff(df, df).count() == 0
