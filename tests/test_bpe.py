"""BPE training (operators/bpe.py): the JVM merge fold against the
pure-Python reference, end-to-end training against an independent
in-memory BPE trainer, and the tokenizer UDF."""

from hypothesis import given, settings
from hypothesis import strategies as st

from serd_spark.operators.bpe import (
    Merge,
    apply_merge,
    apply_merges_py,
    char_symbols,
    tokenize_bpe,
    train_bpe,
)


def _simple_ref_train(word_freqs: dict[str, int], n_merges: int, min_count: int = 2):
    """Independent reference BPE trainer (Sennrich get_stats shape):
    overlapping adjacent-pair counting, greedy left-to-right merge,
    ties broken (count DESC, left ASC, right ASC)."""
    syms = {w: list(w) for w in word_freqs}
    merges = []
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (a, b), c = best
        merges.append((rank, a, b, c))
        for w in syms:
            out = []
            for x in syms[w]:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out
    return merges


def test_apply_merge_fold_matches_python_reference(spark):
    words = ["aaa", "aaaa", "banana", "abab", "bb", "a", "", "ababab"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    from pyspark.sql import functions as F

    for left, right in [("a", "a"), ("a", "b"), ("b", "a"), ("an", "a")]:
        got = {
            r["word"]: r["m"]
            for r in df.select(
                "word",
                apply_merge(char_symbols(F.col("word")), left, right).alias("m"),
            ).collect()
        }
        for w in words:
            assert got[w] == apply_merges_py(w, [(left, right)]), (w, left, right)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=8), min_size=1, max_size=8
    ),
    st.sampled_from([("a", "a"), ("a", "b"), ("c", "a"), ("b", "c")]),
)
def test_apply_merge_fold_hypothesis(spark, words, pair):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(w,) for w in set(words)], "word string")
    got2 = {
        r["word"]: r["m"]
        for r in df.select(
            "word", apply_merge(char_symbols(F.col("word")), *pair).alias("m")
        ).collect()
    }
    for w in set(words):
        assert got2[w] == apply_merges_py(w, [pair])


def test_train_bpe_matches_reference_trainer(spark):
    docs = spark.createDataFrame(
        [
            (1, "the theme the thesis"),
            (2, "then the theory"),
            (3, "banana bandana the"),
        ],
        "doc_id long, text string",
    )
    merges = train_bpe(docs, n_merges=6)
    wf: dict[str, int] = {}
    for t in ["the theme the thesis", "then the theory", "banana bandana the"]:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    want = _simple_ref_train(wf, 6)
    assert [(m.rank, m.left, m.right, m.pair_count) for m in merges] == want
    # (h,e) and (t,h) tie at 8; the total tie-break (left ASC) picks he
    assert (merges[0].left, merges[0].right) == ("h", "e")
    # 6 asked, 5 learned: the 6th-best pair falls under min_pair_count
    assert len(merges) == 5


def test_train_bpe_early_stop(spark):
    docs = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    merges = train_bpe(docs, n_merges=5, min_pair_count=2)
    assert merges == []  # every pair occurs once


def test_tokenize_bpe_counts(spark):
    docs = spark.createDataFrame(
        [(1, "the theme"), (2, ""), (3, None)], "doc_id long, text string"
    )
    merges = [Merge(0, "t", "h", 3), Merge(1, "th", "e", 3)]
    out = {r["doc_id"]: r for r in tokenize_bpe(docs, merges).collect()}
    # 'the' -> [the] (1), 'theme' -> [the, m, e] (3)
    assert out[1]["bpe_tokens"] == 4 and out[1]["bpe_words"] == 2
    assert out[2]["bpe_tokens"] == 0 and out[3]["bpe_tokens"] == 0


def test_tokenize_bpe_java_whitespace_parity(spark):
    # NBSP is NOT a separator for Java \s (training) — the tokenizer
    # must agree, or counts drift from the trained vocabulary
    docs = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    out = tokenize_bpe(docs, []).collect()[0]
    assert out["bpe_words"] == 2  # ['a\xa0b', 'c'], not 3
