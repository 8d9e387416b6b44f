"""Corpus-scale syntax conversion job — the cluster equivalent of the
reference's `serdi` CLI (read syntax A → write syntax B; ref:
src/serdi.c#main, SURVEY.md §2A op-16).

serdi converts ONE document per invocation; the Spark job converts a
whole corpus: every RDF document (either embedded in a `pages` table
or standalone .ttl/.trig/.nt/.nq files read with wholetext) is
parsed with the same strict/lax semantics (-l ≙ --lax) and re-emitted
in the requested output syntax with stable blank-node labels.

Examples:
  spark-submit --py-files dist/serd_spark.zip jobs/convert.py \\
      --input /data/pages --from pages --to ntriples --out /data/nt
  python jobs/convert.py --input docs_dir --from files \\
      --to turtle --out /tmp/out --lax
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="pages parquet dir or raw RDF file dir")
    ap.add_argument(
        "--from", dest="in_format", choices=["pages", "files"], default="pages"
    )
    ap.add_argument(
        "--to",
        dest="out_syntax",
        choices=["ntriples", "nquads", "turtle", "trig"],
        default="ntriples",
    )
    ap.add_argument("--out", required=True, help="output parquet dir")
    ap.add_argument("--lax", action="store_true", help="skip bad statements (serdi -l)")
    ap.add_argument("--base", default="", help="base IRI for raw files (serdi BASE_URI)")
    ap.add_argument("--master", default=None)
    return ap


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)

    from pyspark.sql import functions as F

    from serd_spark.operators.extract import extract_triples, triples_only
    from serd_spark.operators.serialize import (
        serialize_documents,
        serialize_turtle_documents,
    )
    from serd_spark.session import get_spark

    spark = get_spark(app_name="serd-convert", master=args.master)

    if args.in_format == "pages":
        from serd_spark.sources.pages import read_pages

        pages = read_pages(spark, args.input)
        triples = triples_only(extract_triples(pages, lax=args.lax))
    else:
        # one document per file, parsed DIRECTLY as its
        # extension-detected syntax (no HTML wrapping — a document
        # containing literal '</script>' text parses intact)
        from serd_spark.operators.extract import extract_raw

        raw = spark.read.format("text").option("wholetext", "true").load(
            args.input + "/*"
        )
        raw = raw.withColumn(
            "url", F.concat(F.lit(args.base), F.input_file_name())
        )
        ext = F.element_at(F.split(F.col("url"), r"\."), -1)
        syntax_col = (
            F.when(ext == "trig", "trig")
            .when(ext == "nt", "ntriples")
            .when(ext == "nq", "nquads")
            .when(ext == "jsonld", "jsonld")
            .when(ext.isin("rdf", "rdfxml", "owl"), "rdfxml")
            .otherwise("turtle")
        )
        docs = raw.select(
            "url", F.col("value").alias("text"), syntax_col.alias("syntax")
        )
        triples = triples_only(extract_raw(docs, lax=args.lax))
    if args.out_syntax in ("ntriples", "nquads"):
        out = serialize_documents(triples, quads=args.out_syntax == "nquads")
    else:
        out = serialize_turtle_documents(
            triples, trig=args.out_syntax == "trig"
        )
    out.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(f"converted {n} documents → {args.out} ({args.out_syntax})")


if __name__ == "__main__":
    main()
