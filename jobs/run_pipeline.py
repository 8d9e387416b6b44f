"""KG-construction pipeline job — the serdi-equivalent end-to-end
entry point (ref: src/serdi.c#main; SURVEY.md §2A op-16), launched as

    spark-submit --py-files <zip of serd_spark> jobs/run_pipeline.py \
        --rows 200000 --warehouse /data/kg --run-id r1

(``BASELINE.json:north_rule`` launch requirement). On this sandbox it
also runs directly with ``python jobs/run_pipeline.py`` (local[N]).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# allow `python jobs/run_pipeline.py` without an installed package;
# under spark-submit the package arrives via --py-files instead
try:
    import serd_spark  # noqa: F401
except ModuleNotFoundError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20000,
                    help="synthetic corpus size (used when --input absent)")
    ap.add_argument("--input", default=None,
                    help="parquet path of a pages table (url, warc_ts, html, text, lang)")
    ap.add_argument("--input-format", default="parquet",
                    choices=["parquet", "warc"],
                    help="warc: --input is a binaryFile glob of ISO-28500 "
                         "archives (e.g. /data/crawl/*.warc) parsed by "
                         "sources/warc.py — Common-Crawl-native ingestion")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--master", default=None, help="e.g. local[8]")
    ap.add_argument("--strict", action="store_true")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--no-link", action="store_true",
                    help="skip the entity-linking stage")
    args = ap.parse_args()

    from serd_spark.plans.pipeline import run_pipeline
    from serd_spark.session import get_spark
    from serd_spark.sources.pages import read_pages, synthesize_pages
    from serd_spark.sources.warc import read_warc

    spark = get_spark(app_name="kg-pipeline", master=args.master)
    run_id = args.run_id or f"run-{int(time.time())}"

    if args.input and args.input_format == "warc":
        # by-file parallelism (WARC has no intra-file split points);
        # the pipeline only needs (url, warc_ts, html)
        pages = read_warc(spark, args.input)
    elif args.input:
        # decoded-size-aware split sizing (pages parquet compresses
        # ~15×; the 128 MB default under-splits the extraction stage)
        pages = read_pages(spark, args.input)
    else:
        pages = synthesize_pages(spark, args.rows, seed=args.seed)

    res = run_pipeline(
        spark,
        pages,
        args.warehouse,
        run_id,
        lax=not args.strict,
        n_buckets=args.buckets,
        link=not args.no_link,
    )
    print(
        json.dumps(
            {
                "run_id": res.run_id,
                "pages_in": res.pages_in,
                "triples_out": res.triples_out,
                "bad_docs": res.bad_docs,
                "wall_s": round(res.wall_s, 2),
                "resumed_skipped": res.resumed_skipped,
                "triples_per_sec": round(res.triples_out / max(res.wall_s, 1e-9)),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
