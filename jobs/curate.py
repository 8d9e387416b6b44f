"""Corpus-curation job: documents parquet → curated parquet +
per-stage survival metrics (see serd_spark/plans/curate.py).

    spark-submit --py-files dist/serd_spark.zip jobs/curate.py \\
        --input /data/documents --out /data/curated
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--langs", default="en")
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--near-dup-threshold", type=float, default=0.8)
    ap.add_argument(
        "--min-lp-mean-micros", type=int, default=None,
        help="unigram-LM mean log-prob floor in micros (e.g. -3500000);"
             " omit to skip the LM filter stage",
    )
    ap.add_argument(
        "--max-dup-span-frac", type=float, default=None,
        help="cap on the corpus-duplicated 10-token span fraction "
             "(e.g. 0.5); omit to skip the span-dedup stage",
    )
    ap.add_argument(
        "--benchmark", default=None,
        help="parquet of evaluation-benchmark documents (text column); "
             "when given, a final 13-gram decontamination stage drops "
             "documents overlapping the benchmark",
    )
    ap.add_argument(
        "--max-hit-frac", type=float, default=0.0,
        help="max tolerated benchmark-overlap span fraction "
             "(0.0 = any hit drops the document)",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from serd_spark.plans.curate import curate_documents
    from serd_spark.session import get_spark

    spark = get_spark(app_name="curate", master=args.master)
    docs = spark.read.parquet(args.input)
    res = curate_documents(
        docs,
        keep_langs=tuple(args.langs.split(",")),
        min_tokens=args.min_tokens,
        near_dup_threshold=args.near_dup_threshold,
        min_lp_mean_micros=args.min_lp_mean_micros,
        max_dup_span_frac=args.max_dup_span_frac,
        benchmark=(
            spark.read.parquet(args.benchmark) if args.benchmark else None
        ),
        max_hit_frac=args.max_hit_frac,
    )
    res.curated.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"stages": res.metrics}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
