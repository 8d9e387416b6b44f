"""Two-parallelism scaling-efficiency protocol (north rule: ≥0.8
throughput scaling efficiency between N and 4N executors).

No real cluster exists in this sandbox, so cluster size is emulated
by CPU affinity: the N-core run is pinned to N cores (taskset), the
4N-core run to 4N — otherwise the small run's JVM helper threads
spill onto the idle cores and flatter the baseline. Each
configuration repeats the SAME job (scan pages parquet → fused
extract+canonicalize+dedup → count) R times in one session; the MIN
wall time is used (the host is a shared VM with ±20% interference
noise; min is the least-contended estimate).

Usage:
  python tools/scaling_bench.py            # orchestrates both runs
  python tools/scaling_bench.py --worker N # internal (pinned child)

Writes JSON to BENCH/scaling.json and a readable section to stdout.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PAGES = int(os.environ.get("SPARK_GRAFT_SCALE_PAGES", "300000"))
RICHNESS = int(os.environ.get("SPARK_GRAFT_SCALE_RICHNESS", "8"))
REPEATS = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "3"))
SMALL = int(os.environ.get("SPARK_GRAFT_SCALE_N", "8"))
BIG = 4 * SMALL


def _default_corpus() -> str:
    """Corpus path keyed by (pages, richness, generator-code hash) —
    the same self-invalidation bench.py uses, so editing the page
    generator can never silently re-measure stale input."""
    import hashlib

    import serd_spark.sources.pages as _pages_mod

    with open(_pages_mod.__file__, "rb") as fh:
        gen_hash = hashlib.blake2b(fh.read(), digest_size=6).hexdigest()
    return f"/tmp/serd_spark_scale_corpus_{N_PAGES}_r{RICHNESS}_{gen_hash}"


CORPUS = os.environ.get("SPARK_GRAFT_SCALE_CORPUS") or _default_corpus()


def ensure_corpus() -> None:
    if os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        return
    from serd_spark.session import get_spark
    from serd_spark.sources.pages import latest_crawl, synthesize_pages

    spark = get_spark(app_name="scale-corpus", master=f"local[{BIG}]")
    spark.sparkContext.setLogLevel("ERROR")
    latest_crawl(
        synthesize_pages(spark, N_PAGES, seed=42, richness=RICHNESS)
    ).repartition(3 * BIG).write.mode("overwrite").parquet(CORPUS)
    spark.stop()


def worker(cores: int) -> None:
    from serd_spark.session import get_spark
    from serd_spark.operators.extract import extract_triples, triples_only

    spark = get_spark(
        app_name=f"scale-{cores}",
        master=f"local[{cores}]",
        extra_conf={
            "spark.local.dir": "/dev/shm/spark-local",
            # pages parquet compresses ~15x (binary html): size splits
            # for the DECODED batch, not the file bytes
            "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": "0",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "1024",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def warm(batches):
        yield from batches

    spark.range(0, 10000, 1, cores).mapInPandas(warm, schema="id long").count()
    pages = spark.read.parquet(CORPUS)
    times = []
    n = 0
    for _ in range(REPEATS):
        t0 = time.time()
        n = triples_only(
            extract_triples(pages, canonicalize=True, dedup=True)
        ).count()
        times.append(round(time.time() - t0, 2))
    print(json.dumps({"cores": cores, "times": times, "n_triples": n}))
    spark.stop()


def main() -> None:
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
        return
    ensure_corpus()
    # the host is a shared VM with epoch-scale interference (±30%
    # observed): INTERLEAVE the two configurations so drift hits both
    # equally, and take the min across all sessions per config
    results = {SMALL: {"times": [], "n_triples": 0},
               BIG: {"times": [], "n_triples": 0}}
    for _round in range(2):
        for cores in (SMALL, BIG):
            aff = ["taskset", "-c", f"0-{cores - 1}"]
            cmd = aff + [
                sys.executable, os.path.abspath(__file__), "--worker", str(cores)
            ]
            out = subprocess.run(
                cmd, capture_output=True, text=True, cwd=REPO,
                env={**os.environ, "SPARK_DRIVER_MEM": "24g"},
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            results[cores]["times"].extend(r["times"])
            results[cores]["n_triples"] = r["n_triples"]
            print(line)
    # merge with any previous invocation of the SAME configuration AND
    # the same engine code (pkg content hash): the host has
    # epoch-scale external interference (±30%, sometimes 5×), so the
    # least-contended estimate is the min across ALL repeats of all
    # epochs — but mins from different code versions must never mix
    # (an efficiency number describing no single version of the code)
    from __spark_entry__ import _pkg_hash

    pkg_hash = _pkg_hash()
    out_path = os.path.join(REPO, "BENCH", "scaling.json")
    if os.path.exists(out_path):
        try:
            prev = json.load(open(out_path))
            if (
                prev.get("n_pages") == N_PAGES
                and prev.get("richness") == RICHNESS
                and prev.get("pkg_hash") == pkg_hash
                and set(prev.get("all_times", {})) == {str(SMALL), str(BIG)}
            ):
                results[SMALL]["times"].extend(prev["all_times"][str(SMALL)])
                results[BIG]["times"].extend(prev["all_times"][str(BIG)])
        except Exception:
            pass
    t_small = min(results[SMALL]["times"])
    t_big = min(results[BIG]["times"])
    eff = (t_small / t_big) / (BIG / SMALL)
    summary = {
        "protocol": f"pinned local[{SMALL}] (taskset 0-{SMALL-1}) vs "
        f"pinned local[{BIG}] (taskset 0-{BIG-1}), same job+input, "
        f"interleaved, min of {REPEATS} repeats per session merged "
        "across sessions/epochs",
        "n_pages": N_PAGES,
        "richness": RICHNESS,
        "pkg_hash": pkg_hash,
        "n_triples": results[BIG]["n_triples"],
        "wall_small_s": t_small,
        "wall_big_s": t_big,
        "pages_per_sec_small": round(N_PAGES / t_small, 1),
        "pages_per_sec_big": round(N_PAGES / t_big, 1),
        "speedup": round(t_small / t_big, 3),
        "scaling_efficiency": round(eff, 3),
        "all_times": {str(k): v["times"] for k, v in results.items()},
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
