"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark at sf0.01 and, where an ``oracle_sql()``
entry exists, the same SQL in DuckDB — compare row count, column
names, **Arrow-level column types**, and order-insensitive values.

The type compare is the important part: round 1 shipped 6 queries whose
values matched but whose driver value-hash failed because DuckDB
promotes SUM(BIGINT) to HUGEINT (Arrow decimal128(38,0)) while Spark
emits LONG (int64).  Comparing Python values via ``fetchall()`` hides
that — DuckDB converts hugeint to Python int — so this tool now pulls
both results as Arrow tables and fails on any dtype divergence.

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


def norm_type(t) -> str:
    """Canonical Arrow type string so cosmetic engine differences don't
    trip the gate while genuine width/kind differences (int64 vs
    decimal128) still do."""
    import pyarrow as pa

    if pa.types.is_large_string(t):
        return "string"
    if pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        # tz label differs (Spark attaches the session tz); unit matters.
        return f"timestamp[{t.unit}]"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{norm_type(t.value_type)}>"
    return str(t)


def typed_table(tbl):
    """pyarrow.Table -> (name->type signature, row-sorted tuples),
    columns sorted by name to mirror the driver's compare."""
    names = sorted(tbl.column_names)
    tbl = tbl.select(names)
    sig = [(n, norm_type(tbl.schema.field(n).type)) for n in names]
    cols = [tbl.column(n).to_pylist() for n in names]
    rows = sorted(tuple(norm_cell(c) for c in row) for row in zip(*cols))
    return sig, rows


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
            stbl = sdf.toArrow()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL] {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(
                f"[rows-only] {name}: {stbl.num_rows} rows, "
                f"cols={stbl.column_names} ({time.time()-t0:.1f}s)"
            )
            continue
        try:
            dtbl = con.sql(oracles[name]).arrow()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL] {name}: duckdb error: {e}")
            continue
        s_sig, s_rows = typed_table(stbl)
        d_sig, d_rows = typed_table(dtbl)
        ok = True
        if s_sig != d_sig:
            failures.append((name, f"schema {s_sig} != {d_sig}"))
            ok = False
        elif len(s_rows) != len(d_rows):
            failures.append((name, f"rows {len(s_rows)} != {len(d_rows)}"))
            ok = False
        elif s_rows != d_rows:
            diff = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
            failures.append((name, f"values differ, first: {diff}"))
            ok = False
        print(
            f"[{'OK  ' if ok else 'FAIL'}] {name}: {len(s_rows)} rows "
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
