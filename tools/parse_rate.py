"""Raw parser throughput: single-thread and whole-node (N processes)
statements/sec for Turtle and N-Triples — the vs-single-node-reference
comparison basis (serd is single-threaded), reproducibly.

Usage: python tools/parse_rate.py [--procs N] [--seconds S]
Prints one JSON line; BENCH/BASELINE.md cites these numbers.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_docs() -> tuple[str, str]:
    """One richness-8-ish synthetic Turtle doc + its NT serialization."""
    from serd_spark.rdf.ntriples import write_ntriples
    from serd_spark.rdf.turtle import parse_turtle

    lines = ["@prefix s: <http://schema.org/> .",
             "@prefix ex: <http://example.org/> ."]
    for i in range(400):
        lines.append(
            f'ex:item{i} a s:Product ; s:name "Item {i}"@en ; '
            f"s:price {i}.99 ; s:related ex:item{(i + 1) % 400} ; "
            f's:sku "SKU-{i:06d}" .'
        )
    turtle = "\n".join(lines)
    stmts, errs = parse_turtle(turtle, "http://example.org/")
    assert not errs
    nt = write_ntriples(stmts, relabel=False)
    return turtle, nt


def rate(kind: str, doc: str, seconds: float) -> float:
    from serd_spark.rdf.ntriples import parse_ntriples
    from serd_spark.rdf.turtle import parse_turtle

    fn = (
        (lambda: parse_turtle(doc, "http://example.org/"))
        if kind == "turtle"
        else (lambda: parse_ntriples(doc))
    )
    n_stmts = len(fn()[0])
    end = time.time() + seconds
    done = 0
    while time.time() < end:
        fn()
        done += 1
    return done * n_stmts / seconds


def worker(kind: str, doc: str, seconds: float, q) -> None:
    q.put(rate(kind, doc, seconds))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=os.cpu_count())
    ap.add_argument("--seconds", type=float, default=5.0)
    args = ap.parse_args()

    turtle, nt = make_docs()
    out = {}
    for kind, doc in (("turtle", turtle), ("ntriples", nt)):
        out[f"{kind}_single_stmt_s"] = round(rate(kind, doc, args.seconds), 0)
        q = mp.Queue()
        procs = [
            mp.Process(target=worker, args=(kind, doc, args.seconds, q))
            for _ in range(args.procs)
        ]
        for p in procs:
            p.start()
        total = sum(q.get() for _ in procs)
        for p in procs:
            p.join()
        out[f"{kind}_node_stmt_s_{args.procs}p"] = round(total, 0)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
