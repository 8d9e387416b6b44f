"""Mini-SPARQL: compile a SPARQL basic-graph-pattern SELECT into a
DataFrame plan over the (s, p, o) triple table — the query surface a
serd user pairs with the parser (serd itself feeds SPARQL stores;
here the store IS the Spark triple table).

Supported subset (grammar below): PREFIX declarations, SELECT with an
explicit variable list or *, a WHERE block of dot-separated triple
patterns (terms: ?var, <iri>, prefixed:name, "literal"), FILTER
(?v = term / ?v != term), ORDER BY, LIMIT. No OPTIONAL / UNION /
property paths — each of those is a DataFrame outer-join / union /
iteration the caller can compose manually.

Compilation is RELATIONAL, the classic BGP→join mapping every SPARQL
engine uses: each triple pattern becomes one scan of the triple table
with its constant positions pushed down as equality filters (Catalyst
pushes them into the parquet scan), renamed to its variable names;
patterns then natural-join on shared variables, in WRITTEN order,
with Catalyst/AQE free to reorder and to broadcast small pattern
scans (a pattern with two constants is usually tiny — exactly the
build side you want). Repeated variables inside one pattern become
intra-scan equality filters. At 100 TB the triple table is
subject-bucketed (materialize.py), so s-s joins between patterns are
co-partitioned.

Everything is plain string equality on the canonical triple encoding
(URIs resolved, literals in canonical lexical form — extraction
already guarantees this), so the DuckDB oracle can replay any
compiled query as an equivalent SQL join.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class SparqlError(ValueError):
    pass


_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>\#[^\n]*)
  | (?P<iri><[^<>\s]*>)
  | (?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
  | (?P<lit>"(?:[^"\\]|\\.)*")
  | (?P<pname>[A-Za-z_][A-Za-z0-9_.-]*:[A-Za-z0-9_.-]*)
  | (?P<kw>PREFIX|SELECT|WHERE|FILTER|ORDER|BY|LIMIT|ASC|DESC|A\b)
  | (?P<num>-?[0-9]+(?:\.[0-9]+)?)
  | (?P<punct>[{}().=*]|!=|\.)
    """,
    re.VERBOSE | re.IGNORECASE,
)


def _tokenize(q: str) -> list[str]:
    out, pos = [], 0
    while pos < len(q):
        m = _TOKEN.match(q, pos)
        if not m:
            raise SparqlError(f"unexpected character at {pos}: {q[pos:pos+20]!r}")
        pos = m.end()
        if m.lastgroup in ("ws", "comment"):
            continue
        out.append(m.group())
    return out


@dataclass
class _Term:
    kind: str  # 'var' | 'const'
    value: str  # var name without '?', or the constant string


class _Parser:
    def __init__(self, q: str):
        self.toks = _tokenize(q)
        self.i = 0
        self.prefixes: dict[str, str] = {}

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            raise SparqlError("unexpected end of query")
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, want: str) -> None:
        t = self.next()
        if t.upper() != want.upper():
            raise SparqlError(f"expected {want!r}, got {t!r}")

    def term(self) -> _Term:
        t = self.next()
        if t.startswith("?"):
            return _Term("var", t[1:])
        if t.startswith("<") and t.endswith(">"):
            return _Term("const", t[1:-1])
        if t.startswith('"'):
            body = t[1:-1]
            body = re.sub(r'\\(.)', lambda m: {"n": "\n", "t": "\t"}.get(
                m.group(1), m.group(1)), body)
            return _Term("const", body)
        if t.lower() == "a":  # rdf:type shorthand
            return _Term(
                "const", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
            )
        if ":" in t:
            pfx, _, local = t.partition(":")
            if pfx not in self.prefixes:
                raise SparqlError(f"undeclared prefix {pfx!r}")
            return _Term("const", self.prefixes[pfx] + local)
        if re.fullmatch(r"-?[0-9]+(\.[0-9]+)?", t):
            return _Term("const", t)
        raise SparqlError(f"cannot parse term {t!r}")


def parse_sparql(q: str) -> dict:
    """Parse into {vars, patterns, filters, order, limit} —
    patterns are (s, p, o) _Term triples."""
    p = _Parser(q)
    while p.peek() and p.peek().upper() == "PREFIX":
        p.next()
        pname = p.next()
        if not pname.endswith(":"):
            raise SparqlError(f"bad prefix declaration {pname!r}")
        iri = p.next()
        if not (iri.startswith("<") and iri.endswith(">")):
            raise SparqlError("prefix must map to an <iri>")
        p.prefixes[pname[:-1]] = iri[1:-1]
    p.expect("SELECT")
    sel: list[str] = []
    star = False
    while p.peek() and p.peek().upper() != "WHERE":
        t = p.next()
        if t == "*":
            star = True
        elif t.startswith("?"):
            sel.append(t[1:])
        else:
            raise SparqlError(f"bad SELECT item {t!r}")
    p.expect("WHERE")
    p.expect("{")
    patterns: list[tuple[_Term, _Term, _Term]] = []
    filters: list[tuple[str, str, _Term]] = []  # (var, op, term)
    while p.peek() and p.peek() != "}":
        if p.peek().upper() == "FILTER":
            p.next()
            p.expect("(")
            v = p.term()
            if v.kind != "var":
                raise SparqlError("FILTER must start with a variable")
            op = p.next()
            if op not in ("=", "!="):
                raise SparqlError(f"unsupported FILTER op {op!r}")
            rhs = p.term()
            p.expect(")")
            filters.append((v.value, op, rhs))
        else:
            s, pr, o = p.term(), p.term(), p.term()
            patterns.append((s, pr, o))
        if p.peek() == ".":
            p.next()
    p.expect("}")
    order: list[tuple[str, bool]] = []
    limit: int | None = None
    while p.peek() is not None:
        t = p.next().upper()
        if t == "ORDER":
            p.expect("BY")
            while p.peek() and p.peek().upper() not in ("LIMIT",):
                nt = p.peek()
                if nt.upper() in ("ASC", "DESC"):
                    p.next()
                    p.expect("(")
                    v = p.term()
                    p.expect(")")
                    order.append((v.value, nt.upper() == "ASC"))
                elif nt.startswith("?"):
                    order.append((p.term().value, True))
                else:
                    break
        elif t == "LIMIT":
            limit = int(p.next())
        else:
            raise SparqlError(f"unexpected trailing token {t!r}")
    if not patterns:
        raise SparqlError("empty WHERE block")
    all_vars: list[str] = []
    for s, pr, o in patterns:
        for t in (s, pr, o):
            if t.kind == "var" and t.value not in all_vars:
                all_vars.append(t.value)
    if star:
        sel = all_vars
    if not sel:
        raise SparqlError("SELECT list is empty")
    for v in sel + [v for v, _, _ in filters] + [v for v, _ in order]:
        if v not in all_vars:
            raise SparqlError(f"variable ?{v} not bound in WHERE")
    return {
        "vars": sel, "patterns": patterns, "filters": filters,
        "order": order, "limit": limit,
    }


def sparql_query(triples: DataFrame, q: str) -> DataFrame:
    """Compile + run ``q`` against a (s, p, o) triple DataFrame.
    Output columns are the SELECT variables, in order."""
    ast = parse_sparql(q)
    plan: DataFrame | None = None
    for n, (s, pr, o) in enumerate(ast["patterns"]):
        scan = triples.select("s", "p", "o")
        cols: dict[str, str] = {}  # var -> position column
        for pos, t in (("s", s), ("p", pr), ("o", o)):
            if t.kind == "const":
                scan = scan.filter(F.col(pos) == t.value)
            elif t.value in cols:  # repeated var inside one pattern
                scan = scan.filter(F.col(pos) == F.col(cols[t.value]))
            else:
                cols[t.value] = pos
        scan = scan.select(
            *[F.col(pos).alias(var) for var, pos in cols.items()]
        )
        if plan is None:
            plan = scan
        else:
            shared = [c for c in scan.columns if c in plan.columns]
            plan = (
                plan.join(scan, shared) if shared else plan.crossJoin(scan)
            )
    assert plan is not None
    for var, op, rhs in ast["filters"]:
        rv = F.lit(rhs.value) if rhs.kind == "const" else F.col(rhs.value)
        plan = plan.filter(
            F.col(var) == rv if op == "=" else F.col(var) != rv
        )
    plan = plan.select(*ast["vars"])
    if ast["order"]:
        plan = plan.orderBy(
            *[F.col(v) if asc else F.desc(v) for v, asc in ast["order"]]
        )
    if ast["limit"] is not None:
        plan = plan.limit(ast["limit"])
    return plan
