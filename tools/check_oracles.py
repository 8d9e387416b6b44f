"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark at sf0.01 and, where an ``oracle_sql()``
entry exists, the same SQL in DuckDB — compare row count, column
names, and order-insensitive values (exact equality after sorting).

Usage: python tools/check_oracles.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    import datetime
    import decimal
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def to_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(norm_cell(r[i]) for i in order) for r in rows
    ), [cols[i] for i in order]


def main() -> int:
    import __spark_entry__ as entrymod
    from serd_spark.session import get_spark

    spark = get_spark(app_name="check-oracles", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[1:])
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL] {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(
                f"[rows-only] {name}: {len(srows)} rows, cols={scols} "
                f"({time.time()-t0:.1f}s)"
            )
            continue
        try:
            rel = con.sql(oracles[name])
            drows = rel.fetchall()
            dcols = rel.columns
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL] {name}: duckdb error: {e}")
            continue
        s_sorted, s_cols = to_rows([c for c in scols], [tuple(r) for r in srows])
        d_sorted, d_cols = to_rows(list(dcols), drows)
        ok = True
        if s_cols != d_cols:
            failures.append((name, f"cols {s_cols} != {d_cols}"))
            ok = False
        elif len(s_sorted) != len(d_sorted):
            failures.append((name, f"rows {len(s_sorted)} != {len(d_sorted)}"))
            ok = False
        elif s_sorted != d_sorted:
            diff = [
                (a, b) for a, b in zip(s_sorted, d_sorted) if a != b
            ][:3]
            failures.append((name, f"values differ, first: {diff}"))
            ok = False
        print(
            f"[{'OK  ' if ok else 'FAIL'}] {name}: {len(s_sorted)} rows "
            f"({time.time()-t0:.1f}s)"
        )
    print()
    if failures:
        for n, msg in failures:
            print(f"FAIL {n}: {msg[:500]}")
        return 1
    print("all oracled queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
