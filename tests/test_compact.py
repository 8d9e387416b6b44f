"""append_keyed_table / compact_keyed_table — fragmentation repair
preserves content exactly and never rewrites healthy buckets."""

import hashlib
import os

from serd_spark.operators.materialize import (
    append_keyed_table,
    compact_keyed_table,
    write_keyed_table,
)


def _bucket(k, n):
    return int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % n


def _files_per_bucket(path):
    out = {}
    for d in os.listdir(path):
        if d.startswith("kbucket="):
            out[int(d.split("=")[1])] = sum(
                1 for f in os.listdir(os.path.join(path, d))
                if f.endswith(".parquet")
            )
    return out


def test_compact_merges_fragments_and_preserves_content(spark, tmp_path):
    path = str(tmp_path / "t")
    mk = lambda rows: spark.createDataFrame(rows, "k long, v long")
    write_keyed_table(mk([(i, i) for i in range(50)]), path, "k",
                      n_buckets=4)
    append_keyed_table(mk([(i, i) for i in range(50, 80)]), path, "k",
                       n_buckets=4)
    append_keyed_table(mk([(i, i) for i in range(80, 100)]), path, "k",
                       n_buckets=4)
    assert max(_files_per_bucket(path).values()) >= 3
    before = {
        (r.k, r.v) for r in spark.read.parquet(path).select("k", "v").collect()
    }
    stats = compact_keyed_table(spark, path, "k", max_files=1)
    assert stats["buckets_compacted"] == 4
    assert _files_per_bucket(path) == {0: 1, 1: 1, 2: 1, 3: 1}
    after = {
        (r.k, r.v) for r in spark.read.parquet(path).select("k", "v").collect()
    }
    assert after == before and len(after) == 100


def test_compact_skips_healthy_buckets(spark, tmp_path):
    path = str(tmp_path / "t")
    mk = lambda rows: spark.createDataFrame(rows, "k long, v long")
    write_keyed_table(mk([(i, i) for i in range(40)]), path, "k",
                      n_buckets=4)
    # fragment exactly one bucket: append keys that all hash to it
    target = 2
    extra = [k for k in range(1000, 3000) if _bucket(k, 4) == target][:10]
    append_keyed_table(mk([(k, k) for k in extra]), path, "k", n_buckets=4)

    def snap(skip):
        out = {}
        for root, _d, files in os.walk(path):
            if f"kbucket={skip}" in root:
                continue
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = open(p, "rb").read()
        return out

    healthy_before = snap(target)
    stats = compact_keyed_table(spark, path, "k", max_files=1)
    assert stats["buckets_compacted"] == 1
    assert snap(target) == healthy_before  # healthy buckets untouched
    assert _files_per_bucket(path)[target] == 1


def test_compact_noop_when_all_healthy(spark, tmp_path):
    path = str(tmp_path / "t")
    write_keyed_table(
        spark.createDataFrame([(i, i) for i in range(20)], "k long, v long"),
        path, "k", n_buckets=4,
    )
    stats = compact_keyed_table(spark, path, "k", max_files=1)
    assert stats == {
        "buckets_compacted": 0, "files_before": 0, "rows_rewritten": 0
    }
