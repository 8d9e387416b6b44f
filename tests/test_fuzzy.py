"""Edit-distance similarity join: exact recall at k=1 (brute-force
cross-check), precision verify, blocking bounds, bucket cap."""

import pyspark.sql.functions as F
import pytest

from serd_spark.operators.fuzzy import deletion_variants, fuzzy_join


def _names(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


def _pairs(df):
    return sorted(
        (r.id_a, r.id_b, r.dist) for r in df.collect()
    )


def test_variants_shape(spark):
    out = (
        spark.createDataFrame([("abc",)], "s string")
        .select(deletion_variants(F.col("s")).alias("v"))
        .collect()[0]
        .v
    )
    assert out == ["abc", "bc", "ac", "ab"]


def test_substitution_insertion_deletion(spark):
    df = _names(
        spark,
        [
            (1, "john smith"),
            (2, "jon smith"),    # deletion of 'h'     -> dist 1 to 1
            (3, "john smyth"),   # substitution 'i->y' -> dist 1 to 1
            (4, "johnn smith"),  # insertion           -> dist 1 to 1
            (5, "completely different"),
        ],
    )
    got = _pairs(fuzzy_join(df))
    assert (1, 2, 1) in got and (1, 3, 1) in got and (1, 4, 1) in got
    assert all(p[0] != 5 and p[1] != 5 for p in got)


def test_distance_two_rejected(spark):
    # shares no deletion variant AND would fail the verify anyway
    df = _names(spark, [(1, "abcdef"), (2, "abxxef")])
    assert _pairs(fuzzy_join(df)) == []


def test_exact_duplicates_pair_at_zero(spark):
    df = _names(spark, [(1, "acme corp"), (2, "acme corp")])
    assert _pairs(fuzzy_join(df)) == [(1, 2, 0)]


def test_recall_matches_bruteforce(spark):
    """Pigeonhole recall proof on a mutation cloud: blocking + verify
    must equal the brute-force levenshtein θ-join exactly."""
    base = "entity resolution"
    rows, rid = [(0, base)], 1
    # one substitution, one deletion, one insertion at several offsets
    for i in (0, 3, 8, len(base) - 1):
        rows.append((rid, base[:i] + "Z" + base[i + 1:])); rid += 1
        rows.append((rid, base[:i] + base[i + 1:])); rid += 1
        rows.append((rid, base[:i] + "Q" + base[i:])); rid += 1
    # far-away noise
    rows += [(rid, "zzzz"), (rid + 1, "entity resolutionXXXX")]
    df = _names(spark, rows)
    got = _pairs(fuzzy_join(df))
    brute = (
        df.alias("a")
        .crossJoin(df.alias("b"))
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn(
            "dist", F.levenshtein(F.col("a.name"), F.col("b.name"))
        )
        .filter(F.col("dist") <= 1)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            "dist",
        )
    )
    assert got == _pairs(brute)


def test_max_len_excludes_long_names(spark):
    long = "x" * 80
    df = _names(spark, [(1, long), (2, long)])
    assert _pairs(fuzzy_join(df, max_len=64)) == []
    assert _pairs(fuzzy_join(df, max_len=100)) == [(1, 2, 0)]


def test_bucket_cap_drops_hot_variant_only(spark):
    # 30 copies of a 1-char name: variant "" and "a" are hot. A pair
    # of longer names still links through its many other variants.
    rows = [(i, "a") for i in range(30)]
    rows += [(100, "stable name"), (101, "stable nam")]
    df = _names(spark, rows)
    got = _pairs(fuzzy_join(df, bucket_cap=8))
    assert (100, 101, 1) in got
    assert not any(p[0] < 30 and p[1] < 30 for p in got)


def test_no_python_stages(spark):
    df = _names(spark, [(1, "a name"), (2, "a nam")])
    plan = (
        fuzzy_join(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "PythonUDF" not in plan and "ArrowEval" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in (
        plan
    )


def _sets(spark, rows):
    return spark.createDataFrame(rows, "id long, toks array<string>")


def _spairs(df):
    return sorted(
        (r.id_a, r.id_b, r.inter, r.uni, r.jac_permille)
        for r in df.collect()
    )


def test_setsim_basic(spark):
    from serd_spark.operators.fuzzy import set_similarity_join

    df = _sets(
        spark,
        [
            (1, ["a", "b", "c", "d", "e"]),
            (2, ["a", "b", "c", "d", "x"]),   # jac 4/6 = 666
            (3, ["a", "b", "c", "d", "e"]),   # jac 1000 with 1
            (4, ["q", "r", "s"]),
        ],
    )
    got = _spairs(set_similarity_join(df, t_permille=600))
    assert (1, 2, 4, 6, 666) in got
    assert (1, 3, 5, 5, 1000) in got
    assert (2, 3, 4, 6, 666) in got
    assert all(4 not in (p[0], p[1]) for p in got)
    # tighter threshold drops the 666 pairs
    tight = _spairs(set_similarity_join(df, t_permille=700))
    assert tight == [(1, 3, 5, 5, 1000)]


def test_setsim_duplicates_in_array_are_set_semantics(spark):
    from serd_spark.operators.fuzzy import set_similarity_join

    df = _sets(spark, [(1, ["a", "a", "b"]), (2, ["b", "a"])])
    assert _spairs(set_similarity_join(df, t_permille=900)) == [
        (1, 2, 2, 2, 1000)
    ]


def test_setsim_recall_matches_bruteforce(spark):
    """Exact-recall proof: prefix-filter join == brute-force
    threshold join on a mutation cloud, at two thresholds."""
    from serd_spark.operators.fuzzy import set_similarity_join

    base = [f"t{i}" for i in range(20)]
    rows = []
    for i in range(12):
        s = list(base)
        for j in range(i % 4):          # drop up to 3
            s.remove(f"t{(i * 3 + j) % 20}")
        s += [f"x{i % 5}"] * (i % 3)    # add up to 2
        rows.append((i, s))
    df = _sets(spark, rows)
    for t in (500, 800):
        got = _spairs(set_similarity_join(df, t_permille=t))
        brute = []
        for i, a in rows:
            for j, b in rows:
                if i < j:
                    sa, sb = set(a), set(b)
                    inter = len(sa & sb)
                    uni = len(sa | sb)
                    if 1000 * inter >= t * uni:
                        brute.append(
                            (i, j, inter, uni, 1000 * inter // uni)
                        )
        assert got == sorted(brute), f"t={t}"


def test_setsim_threshold_validation(spark):
    from serd_spark.operators.fuzzy import set_similarity_join

    df = _sets(spark, [(1, ["a"])])
    with pytest.raises(ValueError):
        set_similarity_join(df, t_permille=0)
    with pytest.raises(ValueError):
        set_similarity_join(df, t_permille=1001)


def test_setsim_no_cartesian_no_python(spark):
    from serd_spark.operators.fuzzy import set_similarity_join

    df = _sets(spark, [(1, ["a", "b"]), (2, ["a", "c"])])
    plan = (
        set_similarity_join(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "PythonUDF" not in plan and "ArrowEval" not in plan


def test_setsim_posting_cap_subset_and_loose_cap_exact(spark):
    """max_posting (the stated low-entropy bound): a cap larger than
    every posting list changes nothing; a tight cap yields a SUBSET
    of the exact pairs (never a wrong pair), and a pair sharing any
    uncapped prefix token survives."""
    from serd_spark.operators.fuzzy import set_similarity_join

    rows = [
        (1, ["a", "b", "c", "d", "e"]),
        (2, ["a", "b", "c", "d", "x"]),
        (3, ["a", "b", "c", "d", "e"]),
        (4, ["q", "r", "s"]),
    ]
    df = _sets(spark, rows)
    exact = _spairs(set_similarity_join(df, t_permille=600))
    loose = _spairs(
        set_similarity_join(df, t_permille=600, max_posting=100)
    )
    assert loose == exact
    capped = _spairs(
        set_similarity_join(df, t_permille=600, max_posting=1)
    )
    assert set(capped) <= set(exact)
    # every surviving pair is verified-exact (values identical)
    for p in capped:
        assert p in exact


def test_setsim_posting_cap_validation(spark):
    import pytest as _pytest

    from serd_spark.operators.fuzzy import set_similarity_join

    df = _sets(spark, [(1, ["a"])])
    with _pytest.raises(ValueError, match="max_posting"):
        set_similarity_join(df, max_posting=0)
