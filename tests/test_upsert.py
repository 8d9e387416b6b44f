"""upsert_keyed_table — merge semantics (update/insert/delete,
update-beats-delete) and the delta-sized guarantee: untouched bucket
partitions must come out byte-identical."""

import os

from serd_spark.operators.materialize import (
    upsert_keyed_table,
    write_keyed_table,
)


def _snapshot(path):
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[p] = open(p, "rb").read()
    return out


def _table(spark, rows):
    return spark.createDataFrame(rows, "k long, v long")


def test_upsert_update_insert_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    write_keyed_table(
        _table(spark, [(i, i * 10) for i in range(100)]), path, "k",
        n_buckets=8,
    )
    stats = upsert_keyed_table(
        spark,
        path,
        _table(spark, [(3, 999), (50, 888), (1000, 1), (1001, 2)]),
        "k",
        n_buckets=8,
        deletes=spark.createDataFrame([(7,), (1000,)], "k long"),
    )
    got = {
        r.k: r.v for r in spark.read.parquet(path).select("k", "v").collect()
    }
    want = {i: i * 10 for i in range(100)}
    want.update({3: 999, 50: 888, 1000: 1, 1001: 2})  # update beats delete
    del want[7]
    assert got == want
    affected = {_bucket(k, 8) for k in (3, 50, 7, 1000, 1001)}
    assert stats["buckets_touched"] == len(affected)
    # exactly the affected buckets' final rows were rewritten
    assert stats["rows_written"] == sum(
        1 for k in want if _bucket(k, 8) in affected
    )


def _bucket(k, n):
    import hashlib

    return int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % n


def test_untouched_buckets_byte_identical(spark, tmp_path):
    path = str(tmp_path / "t")
    write_keyed_table(
        _table(spark, [(i, i) for i in range(200)]), path, "k", n_buckets=8
    )
    before = _snapshot(path)
    upsert_keyed_table(
        spark, path, _table(spark, [(5, -5)]), "k", n_buckets=8
    )
    after = _snapshot(path)
    touched = _bucket(5, 8)
    untouched_before = {
        p: b for p, b in before.items() if f"kbucket={touched}/" not in p
    }
    untouched_after = {
        p: b for p, b in after.items() if f"kbucket={touched}/" not in p
    }
    # every file of every untouched bucket survives byte-identically
    assert untouched_before == untouched_after
    assert len(untouched_before) > 0
    # and the touched bucket now carries the new value
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got[5] == -5 and got[6] == 6 and len(got) == 200


def test_update_only_key_in_both_updates_and_deletes(spark, tmp_path):
    path = str(tmp_path / "t")
    write_keyed_table(_table(spark, [(1, 1), (2, 2)]), path, "k", n_buckets=4)
    upsert_keyed_table(
        spark,
        path,
        _table(spark, [(1, 100)]),
        "k",
        n_buckets=4,
        deletes=spark.createDataFrame([(1,), (2,)], "k long"),
    )
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: 100}
