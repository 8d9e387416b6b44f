"""Sequence packing (operators/packing.py) against a sequential
Python reference, including sparse ids, empty/null docs, and docs
longer than the budget."""

import pytest

from serd_spark.operators.packing import pack_sequences


def _ref(rows, budget):
    out, off = {}, 0
    for doc_id, text in sorted(rows):
        n = len(text.split()) if text else 0
        first = off // budget
        last = max(off, off + n - 1) // budget
        out[doc_id] = (n, off, first, last)
        off += n
    return out


def test_pack_sequences_matches_reference(spark):
    rows = [
        (1, "a b c"),
        (2, "d e f g h"),
        (7, ""),            # zero tokens
        (10, None),          # null text
        (4097, "x " * 12),   # different coarse block (block=4096)
        (9000, "one two"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["tok_offset"], r["seq_first"], r["seq_last"])
        for r in pack_sequences(df, budget_tokens=4).collect()
    }
    want = _ref([(i, t or "") for i, t in rows], 4)
    assert got == want
    # doc 2 (5 tokens, offset 3, budget 4) straddles sequences 0..1
    assert got[2][2] == 0 and got[2][3] == 1


def test_pack_sequences_long_doc_spans_many(spark):
    df = spark.createDataFrame(
        [(1, "w " * 25), (2, "a b")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in pack_sequences(df, budget_tokens=4).collect()}
    assert got[1]["seq_first"] == 0 and got[1]["seq_last"] == 6  # 25 tokens
    assert got[2]["tok_offset"] == 25
    assert got[2]["seq_first"] == 6 and got[2]["seq_last"] == 6


def test_pack_sequences_block_boundaries(spark):
    # tiny block size forces many blocks; result must be identical
    rows = [(i, "t " * (i % 5)) for i in range(1, 40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {
        r["doc_id"]: tuple(r)
        for r in pack_sequences(df, budget_tokens=7, block=3).collect()
    }
    b = {
        r["doc_id"]: tuple(r)
        for r in pack_sequences(df, budget_tokens=7, block=4096).collect()
    }
    assert a == b == {
        k: (k, *v) for k, v in _ref([(i, t) for i, t in rows], 7).items()
    }


def test_pack_sequences_validates(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pack_sequences(df, budget_tokens=0)
    with pytest.raises(ValueError):
        pack_sequences(df, budget_tokens=4, block=0)


def test_length_batches_brute_force(spark):
    from serd_spark.operators.packing import length_batches

    rows = [(i, "w " * ((i * 37) % 100 + 1)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["bucket"], r["batch_idx"], r["pos"])
        for r in length_batches(df, batch_size=4, bucket_width=10).collect()
    }
    # python replay: bucket then rank by (n_tokens, id)
    toks = {i: (i * 37) % 100 + 1 for i, _ in rows}
    by_bucket = {}
    for i, n in toks.items():
        by_bucket.setdefault(n // 10, []).append((n, i))
    want = {}
    for b, docs in by_bucket.items():
        for r, (n, i) in enumerate(sorted(docs)):
            want[i] = (n, b, r // 4, r % 4)
    assert got == want
    # padding waste within a full batch is bounded by bucket width
    for b, docs in by_bucket.items():
        docs = sorted(docs)
        for k in range(0, len(docs) - 3, 4):
            batch = docs[k : k + 4]
            assert batch[-1][0] - batch[0][0] < 10


def test_length_batches_validation(spark):
    import pytest

    from serd_spark.operators.packing import length_batches

    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        length_batches(df, batch_size=0)
    with pytest.raises(ValueError):
        length_batches(df, batch_size=4, bucket_width=0)
