"""Mini-SPARQL: compile a SPARQL basic-graph-pattern SELECT into a
DataFrame plan over the (s, p, o) triple table — the query surface a
serd user pairs with the parser (serd itself feeds SPARQL stores;
here the store IS the Spark triple table).

Supported subset (grammar below): PREFIX declarations, SELECT
[DISTINCT] with an explicit variable list, *, or aggregate items
(COUNT/COUNT DISTINCT/COUNT(*)/MIN/MAX/SUM/AVG/SAMPLE/GROUP_CONCAT
... AS ?alias) paired with GROUP BY (→ groupBy().agg()) and HAVING
(constraints over aliases/keys, applied post-aggregate). Numeric
aggregates follow the repo's cross-engine determinism discipline:
SUM/AVG operands are quantized to INTEGER MICROS row-side
(floor(try_cast(v as double) * 1e6) — non-numeric values become NULL
and are skipped, the lax-engine behavior, documented divergence from
SPARQL's whole-aggregate type error), summed exactly as integers, and
scaled back by one final division; AVG floor-divides the micros sum
by the non-null count before scaling, so both engines emit identical
doubles. GROUP_CONCAT(?v; SEPARATOR="…") sorts values
lexicographically before joining (SPARQL leaves concatenation order
undefined — a distributed engine must pin it; documented) and SAMPLE
is the deterministic MIN. CONSTRUCT { template } WHERE (template
instantiation per solution, distinct-unioned — an RDF graph is a set
— yielding a triple DataFrame the Turtle/NT writers can serialize
directly), a WHERE block of
dot-separated triple patterns (terms: ?var, <iri>, prefixed:name,
"literal"), FILTER (?v op term) with op ∈ {=, !=, <, >, <=, >=}
(a numeric right-hand side compiles to a double cast: SPARQL's
type-error-drops-the-row and Spark's failed-cast-NULL agree) and
FILTER (regex(?v, "pat")) (Java∩RE2 pattern subset), VALUES ?v
{ consts } (single-variable inline data over a bound variable — a
map-side IN filter), OPTIONAL { patterns }, { patterns } UNION
{ patterns }, MINUS { patterns } (→ LEFT ANTI join on the shared
variables, exact under the same static scope rules as OPTIONAL: at
least one shared hard-bound variable required, OPTIONAL-introduced
variables rejected), FILTER EXISTS { patterns } / FILTER NOT EXISTS
{ patterns } (→ LEFT SEMI / LEFT ANTI join at the written position,
under the same scope rules as MINUS — ≥1 shared hard-bound variable,
no OPTIONAL-introduced variables — so Spark's equi-join and SPARQL's
compatible-mapping test coincide; under these rules NOT EXISTS and
MINUS agree, as they do in SPARQL whenever domains overlap on
non-null bindings), BIND (expr AS ?v) (→ withColumn at its written
position: arithmetic +,-,*,/ over try_cast('double') operands — so
SPARQL's type-error-unbinds and Spark's failed-cast NULL agree — and
CONCAT/STR/STRLEN/UCASE/LCASE over the lexical encodings; the target
must be fresh and expression variables bound by written order), ASK
(→ limit(1) + count>0, a short-circuiting
EXISTS), DESCRIBE ?v WHERE {…} / DESCRIBE <iri> (→ distinct solution
projection joined back as SUBJECT against the triple table — the
concise subject-description form), ORDER BY, LIMIT, OFFSET (ORDER BY
required — a
distributed engine has no stable unordered sequence), and property
paths
in the predicate position: sequence (p1/p2 → join chain),
alternation (p1|p2 → bag union), inverse (^p → column swap),
parenthesized grouping, OneOrMorePath (p+ → transitive closure
by iterated squaring, O(log diameter) shuffle rounds — see
_compile_path), and ZeroOrMorePath / ZeroOrOnePath (p* / p? → the
closure resp. base unioned with the identity relation over the
graph nodes, SPARQL 1.1 zero-length-path semantics — linear in node
count, and a constant endpoint prunes the identity branch through
union filter pushdown). No nested groups.

OPTIONAL compiles to a LEFT OUTER join on the shared variables and
UNION to a bag union (unionByName) — both exact under two statically
enforced scope rules that keep Spark's null-join semantics identical
to SPARQL's compatible-mapping semantics: an OPTIONAL block must
share at least one already-bound variable and may only bind new
variables that no LATER pattern mentions (a later top-level FILTER
on an optional variable is fine: SPARQL's unbound-comparison
type-error→false and Spark's null-comparison→null both drop the
row); UNION branches must bind identical variable sets. Queries
outside these rules raise SparqlError instead of silently computing
something subtly different.

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
  | (?P<kw>(?:PREFIX|SELECT|CONSTRUCT|DISTINCT|WHERE|FILTER|OPTIONAL
          |UNION|GROUP|ORDER|BY|LIMIT|ASC|DESC|COUNT|MIN|MAX|AS|A)\b)
  | (?P<num>-?[0-9]+(?:\.[0-9]+)?)
  | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<punct>!=|<=|>=|[{}().=*/|^+<>,;?!-])
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

    def pred(self):
        """Predicate position: a plain ?var, or a property path."""
        nt = self.peek()
        if nt is not None and nt.startswith("?"):
            return self.term()
        return self.path()

    def path(self):
        parts = [self._path_seq()]
        while self.peek() == "|":
            self.next()
            parts.append(self._path_seq())
        return parts[0] if len(parts) == 1 else ("alt", parts)

    def _path_seq(self):
        parts = [self._path_unary()]
        while self.peek() == "/":
            self.next()
            parts.append(self._path_unary())
        return parts[0] if len(parts) == 1 else ("seq", parts)

    def _path_unary(self):
        if self.peek() == "^":
            self.next()
            return ("inv", self._path_unary())
        node = self._path_primary()
        while self.peek() in ("+", "*", "?"):
            node = (
                {"+": "plus", "*": "star", "?": "opt"}[self.next()],
                node,
            )
        return node

    def _path_primary(self):
        if self.peek() == "(":
            self.next()
            inner = self.path()
            self.expect(")")
            return inner
        if self.peek() == "!":
            # negated property set: !iri, !^iri, or !( a | ^b | … )
            self.next()
            members = []
            if self.peek() == "(":
                self.next()
                members.append(self._nps_member())
                while self.peek() == "|":
                    self.next()
                    members.append(self._nps_member())
                self.expect(")")
            else:
                members.append(self._nps_member())
            return ("nps", members)
        return ("pred", self._path_iri())

    def _nps_member(self):
        """One member of a negated property set: iri or ^iri."""
        if self.peek() == "^":
            self.next()
            return ("rev", self._path_iri())
        return ("fwd", self._path_iri())

    def _path_iri(self) -> str:
        t = self.next()
        if t.startswith("<") and t.endswith(">"):
            return t[1:-1]
        if t.lower() == "a":
            return "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
        if ":" in t and not t.startswith(("?", '"')):
            pfx, _, local = t.partition(":")
            if pfx not in self.prefixes:
                raise SparqlError(f"undeclared prefix {pfx!r}")
            return self.prefixes[pfx] + local
        raise SparqlError(f"cannot parse path element {t!r}")

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


_FILTER_OPS = ("=", "!=", "<", ">", "<=", ">=")
_NUM_LIT = re.compile(r"-?[0-9]+(\.[0-9]+)?")

# BIND expression functions: name → arity (None = variadic, 2+)
_EXPR_FNS = {"CONCAT": None, "STR": 1, "STRLEN": 1, "UCASE": 1,
             "LCASE": 1}


def _parse_expr(p: "_Parser"):
    """BIND expression grammar: additive over multiplicative over
    primary (var | number | "literal" | fn(...) | parenthesized).
    AST nodes: ('var', name) | ('num', text) | ('str', text) |
    ('op', op, lhs, rhs) | ('fn', NAME, [args]).

    Binary minus: the tokenizer folds '-' into a following numeric
    literal (the sign belongs to the number token), so ``?x - 2``
    arrives as ``?x``, ``-2`` — the additive loop accepts a leading-
    minus numeric literal as an implicit '+ (-n)' step."""
    node = _parse_mul(p)
    while True:
        nt = p.peek()
        if nt in ("+", "-"):
            op = p.next()
            node = ("op", op, node, _parse_mul(p))
        elif (
            nt is not None
            and nt.startswith("-")
            and _NUM_LIT.fullmatch(nt)
        ):
            node = ("op", "+", node, _parse_mul(p))
        else:
            return node


def _parse_mul(p: "_Parser"):
    node = _parse_primary(p)
    while p.peek() in ("*", "/"):
        op = p.next()
        node = ("op", op, node, _parse_primary(p))
    return node


def _parse_primary(p: "_Parser"):
    t = p.peek()
    if t is None:
        raise SparqlError("unterminated BIND expression")
    if t == "(":
        p.next()
        node = _parse_expr(p)
        p.expect(")")
        return node
    if t.upper() in _EXPR_FNS:
        name = p.next().upper()
        p.expect("(")
        args = [_parse_expr(p)]
        while p.peek() == ",":
            p.next()
            args.append(_parse_expr(p))
        p.expect(")")
        arity = _EXPR_FNS[name]
        if arity is not None and len(args) != arity:
            raise SparqlError(f"{name}() takes {arity} argument(s)")
        if name == "CONCAT" and len(args) < 2:
            raise SparqlError("CONCAT() takes 2+ arguments")
        return ("fn", name, args)
    if t.startswith("?"):
        return ("var", p.next()[1:])
    if t.startswith('"'):
        return ("str", p.term().value)
    if _NUM_LIT.fullmatch(t):
        return ("num", p.next())
    raise SparqlError(f"cannot parse expression token {t!r}")


def _expr_vars(e) -> list[str]:
    k = e[0]
    if k == "var":
        return [e[1]]
    if k == "op":
        return _expr_vars(e[2]) + _expr_vars(e[3])
    if k == "fn":
        return [v for a in e[2] for v in _expr_vars(a)]
    return []


def _compile_expr(e):
    """Expression AST → Column. Arithmetic coerces operands with
    try_cast('double') — SPARQL's type-error-makes-the-var-unbound
    and Spark's failed-cast NULL agree (the FILTER discipline);
    string functions operate on the canonical lexical encodings
    directly, so STR() is the identity on this table."""
    k = e[0]
    if k == "var":
        return F.col(e[1])
    if k == "num":
        return F.lit(float(e[1]))
    if k == "str":
        return F.lit(e[1])
    if k == "op":
        lc = _compile_expr(e[2]).try_cast("double")
        rc = _compile_expr(e[3]).try_cast("double")
        return {
            "+": lc + rc, "-": lc - rc, "*": lc * rc, "/": lc / rc,
        }[e[1]]
    name, args = e[1], [_compile_expr(a) for a in e[2]]
    if name == "CONCAT":
        return F.concat(*[a.cast("string") for a in args])
    if name == "STR":
        return args[0].cast("string")
    if name == "STRLEN":
        return F.length(args[0].cast("string")).cast("long")
    if name == "UCASE":
        return F.upper(args[0].cast("string"))
    return F.lower(args[0].cast("string"))


def _parse_filter(p: "_Parser") -> tuple[str, str, _Term]:
    """FILTER (?v op term) with op in =/!=/</>/<=/>=, or
    FILTER (regex(?v, "pattern")). Numeric comparisons (a number on
    the right) compile to a double cast — SPARQL's type-error-drops-
    the-row semantics and Spark's failed-cast NULL agree; restrict
    regex patterns to the Java∩RE2 subset so the DuckDB mirror
    matches (the repo-wide regex discipline)."""
    p.next()  # FILTER
    return _parse_constraint(p)


def _parse_constraint(p: "_Parser") -> tuple[str, str, _Term]:
    """A parenthesized comparison/regex constraint — the shared body
    of FILTER (…) and HAVING (…)."""
    p.expect("(")
    nt = p.peek()
    if nt is not None and nt.upper() == "REGEX":
        p.next()
        p.expect("(")
        v = p.term()
        if v.kind != "var":
            raise SparqlError("regex() first argument must be a ?var")
        p.expect(",")
        pat = p.term()
        if pat.kind != "const":
            raise SparqlError("regex() pattern must be a literal")
        p.expect(")")
        p.expect(")")
        return (v.value, "regex", pat)
    v = p.term()
    if v.kind != "var":
        raise SparqlError("FILTER must start with a variable")
    op = p.next()
    if op not in _FILTER_OPS:
        raise SparqlError(f"unsupported FILTER op {op!r}")
    raw = p.peek()
    rhs = p.term()
    if (
        rhs.kind == "const"
        and raw is not None
        and not raw.startswith(('"', "<"))
        and _NUM_LIT.fullmatch(raw)
    ):
        # a BARE number token is a numeric literal; "5" stays a string
        rhs = _Term("num", rhs.value)
    p.expect(")")
    return (v.value, op, rhs)


def _parse_group(p: "_Parser", compound: bool) -> list[tuple]:
    """Parse a { ... } block into a list of elements:
    ('pat', (s,p,o)) | ('filter', (var,op,rhs)) |
    ('optional', [elements]) | ('union', elemsA, elemsB).
    OPTIONAL/UNION only at the top level (compound=True)."""
    p.expect("{")
    elems: list[tuple] = []
    while p.peek() and p.peek() != "}":
        nt = p.peek()
        if nt.upper() == "FILTER":
            nxt = (
                p.toks[p.i + 1].upper() if p.i + 1 < len(p.toks) else ""
            )
            if nxt in ("EXISTS", "NOT"):
                # FILTER [NOT] EXISTS { patterns } — a correlated
                # semi/anti join at the written position (top level
                # only; inside OPTIONAL/UNION the null story changes
                # and we reject rather than approximate)
                if not compound:
                    raise SparqlError(
                        "FILTER EXISTS inside OPTIONAL/UNION "
                        "is not supported"
                    )
                p.next()  # FILTER
                positive = True
                if p.peek() and p.peek().upper() == "NOT":
                    p.next()
                    positive = False
                p.expect("EXISTS")
                elems.append(
                    ("exists", _parse_group(p, compound=False), positive)
                )
            else:
                elems.append(("filter", _parse_filter(p)))
        elif nt.upper() == "VALUES":
            # single-variable inline-data form: VALUES ?v { c1 c2 … }
            # — compiles to a map-side IN filter over an already-bound
            # variable (a join against inline data degenerates to
            # exactly that when the variable is pattern-bound)
            if not compound:
                raise SparqlError(
                    "VALUES inside OPTIONAL/UNION is not supported"
                )
            p.next()
            v = p.term()
            if v.kind != "var":
                raise SparqlError("VALUES needs a ?var")
            p.expect("{")
            vals: list[str] = []
            while p.peek() and p.peek() != "}":
                c = p.term()
                if c.kind != "const":
                    raise SparqlError("VALUES entries must be constants")
                vals.append(c.value)
            p.expect("}")
            if not vals:
                raise SparqlError("empty VALUES block")
            elems.append(("values", (v.value, vals)))
        elif nt.upper() == "BIND":
            # BIND(expr AS ?v): a computed column at this position in
            # the written pattern order. Top level only — inside an
            # OPTIONAL/UNION branch the null/compatibility story
            # changes and we reject rather than approximate.
            if not compound:
                raise SparqlError(
                    "BIND inside OPTIONAL/UNION is not supported"
                )
            p.next()
            p.expect("(")
            expr = _parse_expr(p)
            p.expect("AS")
            v = p.term()
            if v.kind != "var":
                raise SparqlError("BIND target must be a ?var")
            p.expect(")")
            elems.append(("bind", (v.value, expr)))
        elif nt.upper() == "OPTIONAL":
            if not compound:
                raise SparqlError("nested OPTIONAL/UNION is not supported")
            p.next()
            elems.append(("optional", _parse_group(p, compound=False)))
        elif nt.upper() == "MINUS":
            if not compound:
                raise SparqlError("nested OPTIONAL/UNION/MINUS "
                                  "is not supported")
            p.next()
            elems.append(("minus", _parse_group(p, compound=False)))
        elif nt == "{":
            if not compound:
                raise SparqlError("nested OPTIONAL/UNION is not supported")
            if (
                p.i + 1 < len(p.toks)
                and p.toks[p.i + 1].upper() == "SELECT"
            ):
                # subselect { SELECT … }: capture the balanced token
                # slice and keep its TEXT — compiled by a recursive
                # sparql_query call (aggregates/GROUP BY/ORDER/LIMIT
                # inside come for free), then natural-joined into the
                # enclosing group on its projected variables. Outer
                # prefixes are re-declared into the inner text so
                # CURIEs resolve identically.
                depth = 0
                j = p.i
                while j < len(p.toks):
                    if p.toks[j] == "{":
                        depth += 1
                    elif p.toks[j] == "}":
                        depth -= 1
                        if depth == 0:
                            break
                    j += 1
                if j >= len(p.toks):
                    raise SparqlError("unterminated subselect")
                inner = " ".join(p.toks[p.i + 1 : j])
                decls = "".join(
                    f"PREFIX {k}: <{v}> " for k, v in p.prefixes.items()
                )
                text = decls + inner
                sub_vars = parse_sparql(text)["vars"]  # validates too
                if not sub_vars:
                    raise SparqlError(
                        "subselect must project at least one variable"
                    )
                p.i = j + 1
                elems.append(("subselect", (text, sub_vars)))
            else:
                a = _parse_group(p, compound=False)
                p.expect("UNION")
                b = _parse_group(p, compound=False)
                elems.append(("union", a, b))
        else:
            elems.append(("pat", (p.term(), p.pred(), p.term())))
        if p.peek() == ".":
            p.next()
    p.expect("}")
    return elems


def _pattern_vars(elems: list[tuple]) -> list[str]:
    """Variables bound by patterns in ``elems`` (recursively),
    in first-seen order. FILTER does not bind."""
    out: list[str] = []

    def walk(es):
        for e in es:
            if e[0] == "pat":
                for t in e[1]:
                    if (
                        isinstance(t, _Term)
                        and t.kind == "var"
                        and t.value not in out
                    ):
                        out.append(t.value)
            elif e[0] == "bind":
                if e[1][0] not in out:
                    out.append(e[1][0])
            elif e[0] == "optional":
                walk(e[1])
            elif e[0] == "union":
                walk(e[1])
                walk(e[2])
            elif e[0] == "subselect":
                for v in e[1][1]:
                    if v not in out:
                        out.append(v)

    walk(elems)
    return out


def parse_sparql(q: str) -> dict:
    """Parse into {vars, distinct, elements, filters, order, limit} —
    ``elements`` is the WHERE group (see _parse_group), ``filters``
    the top-level FILTERs (group-scoped, applied after all joins)."""
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
    form = p.next().upper()
    sel: list[str] = []
    star = False
    distinct = False
    aggs: list[tuple[str, bool, str | None, str, str]] = []
    template: list[tuple[_Term, _Term, _Term]] = []
    if form == "CONSTRUCT":
        p.expect("{")
        while p.peek() and p.peek() != "}":
            template.append((p.term(), p.term(), p.term()))
            if p.peek() == ".":
                p.next()
        p.expect("}")
        if not template:
            raise SparqlError("empty CONSTRUCT template")
    elif form == "SELECT":
        if p.peek() and p.peek().upper() == "DISTINCT":
            p.next()
            distinct = True
        while p.peek() and p.peek().upper() != "WHERE":
            t = p.next()
            if t == "*":
                star = True
            elif t.startswith("?"):
                sel.append(t[1:])
            elif t == "(":
                # ( FN ( [DISTINCT] ?v | * ) [; SEPARATOR = "s"]
                #   AS ?alias )  with FN one of COUNT MIN MAX SUM AVG
                #   SAMPLE GROUP_CONCAT
                fn = p.next().upper()
                if fn not in (
                    "COUNT", "MIN", "MAX", "SUM", "AVG", "SAMPLE",
                    "GROUP_CONCAT",
                ):
                    raise SparqlError(f"unsupported aggregate {fn!r}")
                p.expect("(")
                agg_distinct = False
                if p.peek() and p.peek().upper() == "DISTINCT":
                    p.next()
                    agg_distinct = True
                at = p.next()
                if at == "*":
                    if fn != "COUNT" or agg_distinct:
                        raise SparqlError("only COUNT(*) may use *")
                    arg = None
                elif at.startswith("?"):
                    arg = at[1:]
                else:
                    raise SparqlError(f"bad aggregate argument {at!r}")
                sep = " "  # the SPARQL default separator
                if p.peek() == ";":
                    if fn != "GROUP_CONCAT":
                        raise SparqlError(
                            "only GROUP_CONCAT takes a SEPARATOR"
                        )
                    p.next()
                    p.expect("SEPARATOR")
                    p.expect("=")
                    st = p.next()
                    if not st.startswith('"'):
                        raise SparqlError("SEPARATOR must be a literal")
                    sep = st[1:-1]
                p.expect(")")
                p.expect("AS")
                alias = p.next()
                if not alias.startswith("?"):
                    raise SparqlError("aggregate alias must be a ?var")
                p.expect(")")
                aggs.append((fn, agg_distinct, arg, alias[1:], sep))
                sel.append(alias[1:])
            else:
                raise SparqlError(f"bad SELECT item {t!r}")
    elif form == "ASK":
        pass  # no projection; WHERE (optional keyword) follows
    elif form == "DESCRIBE":
        describe = p.term()
        if describe.kind not in ("var", "const"):
            raise SparqlError("DESCRIBE takes a ?var or an <iri>")
    else:
        raise SparqlError(
            f"expected SELECT, CONSTRUCT, DESCRIBE or ASK, got {form!r}"
        )
    if form != "DESCRIBE":
        describe = None
    if form == "DESCRIBE" and describe.kind == "const" and p.peek() is None:
        elements = []  # bare DESCRIBE <iri> — no pattern needed
    else:
        if p.peek() == "{" and form in ("ASK", "DESCRIBE"):
            pass  # SPARQL allows ASK/DESCRIBE {…} without WHERE
        else:
            p.expect("WHERE")
        elements = _parse_group(p, compound=True)
    filters = [e[1] for e in elements if e[0] == "filter"]
    values = [e[1] for e in elements if e[0] == "values"]
    elements = [e for e in elements if e[0] not in ("filter", "values")]
    order: list[tuple[str, bool]] = []
    limit: int | None = None
    offset: int | None = None
    group_by: list[str] = []
    having: list[tuple[str, str, _Term]] = []
    while p.peek() is not None:
        t = p.next().upper()
        if t == "GROUP":
            p.expect("BY")
            while p.peek() and p.peek().startswith("?"):
                group_by.append(p.term().value)
            if not group_by:
                raise SparqlError("empty GROUP BY")
        elif t == "HAVING":
            # one or more parenthesized constraints over aggregate
            # aliases / grouping keys, applied post-aggregate
            while p.peek() == "(":
                having.append(_parse_constraint(p))
            if not having:
                raise SparqlError("empty HAVING")
        elif t == "ORDER":
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
        elif t == "OFFSET":
            offset = int(p.next())
        else:
            raise SparqlError(f"unexpected trailing token {t!r}")
    if not elements and not (
        form == "DESCRIBE" and describe is not None
        and describe.kind == "const"
    ):
        raise SparqlError("empty WHERE block")
    # scope rules that keep left-join/union compilation exact
    bound: list[str] = []
    opt_introduced: set[str] = set()
    for e in elements:
        if e[0] == "bind":
            # target must be fresh; expression variables must already
            # be bound by WRITTEN order (OPTIONAL-introduced ones are
            # fine: SPARQL's type-error-on-unbound makes the target
            # unbound, and Spark's NULL propagation agrees)
            bv, bexpr = e[1]
            if not bound:
                raise SparqlError("BIND cannot be the first pattern")
            if bv in bound or bv in opt_introduced:
                raise SparqlError(f"BIND target ?{bv} is already bound")
            missing = [
                v for v in _expr_vars(bexpr)
                if v not in bound and v not in opt_introduced
            ]
            if missing:
                raise SparqlError(
                    f"BIND expression uses unbound ?{missing[0]}"
                )
            bound.append(bv)
            continue
        evars = _pattern_vars([e])
        reused = [v for v in evars if v in opt_introduced]
        if reused:
            raise SparqlError(
                f"variable ?{reused[0]} bound in OPTIONAL cannot be "
                "mentioned by a later pattern"
            )
        if e[0] == "minus":
            # MINUS compiles to a LEFT ANTI join on the shared
            # variables — exact when (a) at least one variable is
            # shared (SPARQL's disjoint-domain MINUS removes NOTHING,
            # a silent no-op we reject instead) and (b) no shared
            # variable is nullable (OPTIONAL-introduced vars are
            # rejected: NULL never equi-matches, which would silently
            # KEEP rows SPARQL removes)
            mvars = _pattern_vars(e[1])
            if not bound:
                raise SparqlError("MINUS cannot be the first pattern")
            if not [v for v in mvars if v in bound]:
                raise SparqlError(
                    "MINUS block shares no variable with the "
                    "preceding patterns"
                )
            bad = [v for v in mvars if v in opt_introduced]
            if bad:
                raise SparqlError(
                    f"variable ?{bad[0]} bound in OPTIONAL cannot be "
                    "mentioned by a later pattern"
                )
        if e[0] == "exists":
            # same static scope rules as MINUS (semi/anti join on the
            # shared vars is exact only when ≥1 shared var is bound
            # and none is OPTIONAL-nullable)
            xvars = _pattern_vars(e[1])
            if not bound:
                raise SparqlError(
                    "FILTER EXISTS cannot be the first pattern"
                )
            bad = [v for v in xvars if v in opt_introduced]
            if bad:
                raise SparqlError(
                    f"variable ?{bad[0]} bound in OPTIONAL cannot be "
                    "mentioned by a later pattern"
                )
            if not [v for v in xvars if v in bound]:
                raise SparqlError(
                    "FILTER EXISTS block shares no variable with the "
                    "preceding patterns"
                )
        if e[0] in ("optional", "union", "minus"):
            branches = e[1:]
        elif e[0] == "exists":
            branches = (e[1],)
        else:
            branches = ()
        for branch in branches:
            bvars = _pattern_vars(branch)
            for be in branch:
                if be[0] != "filter":
                    continue
                fv, _, frhs = be[1]
                used = [fv] + ([frhs.value] if frhs.kind == "var" else [])
                for v in used:
                    if v not in bvars:
                        raise SparqlError(
                            f"FILTER on ?{v} inside {e[0].upper()} "
                            "must use a variable the block itself binds"
                        )
        if e[0] == "optional":
            if not bound:
                raise SparqlError("OPTIONAL cannot be the first pattern")
            shared = [v for v in evars if v in bound]
            if not shared:
                raise SparqlError(
                    "OPTIONAL block shares no variable with the "
                    "preceding patterns"
                )
            opt_introduced.update(v for v in evars if v not in bound)
            continue
        if e[0] == "union" and set(_pattern_vars(e[1])) != set(
            _pattern_vars(e[2])
        ):
            raise SparqlError("UNION branches must bind the same variables")
        bound.extend(v for v in evars if v not in bound)
    all_vars = _pattern_vars(elements)
    aliases = [a[3] for a in aggs]
    if form == "ASK" and (
        aggs or group_by or having or star or distinct or order
        or limit is not None or offset is not None
    ):
        raise SparqlError("ASK takes a plain group pattern")
    if form == "DESCRIBE":
        if (
            aggs or group_by or having or star or distinct or order
            or limit is not None or offset is not None
        ):
            raise SparqlError("DESCRIBE takes a plain group pattern")
        if describe.kind == "var" and describe.value not in all_vars:
            raise SparqlError(
                f"DESCRIBE variable ?{describe.value} not bound in WHERE"
            )
    if form == "CONSTRUCT":
        if aggs or group_by or having or star or distinct:
            raise SparqlError("CONSTRUCT takes a plain WHERE block")
        for tri in template:
            for t in tri:
                if t.kind == "var" and t.value not in all_vars:
                    raise SparqlError(
                        f"template variable ?{t.value} not bound in WHERE"
                    )
    if star:
        if aggs:
            raise SparqlError("SELECT * cannot mix with aggregates")
        sel = all_vars
    if form == "SELECT" and not sel:
        raise SparqlError("SELECT list is empty")
    if aggs:
        for v in sel:
            if v not in aliases and v not in group_by:
                raise SparqlError(
                    f"?{v} must appear in GROUP BY or an aggregate"
                )
        for fn, _, arg, alias, _sep in aggs:
            if arg is not None and arg not in all_vars:
                raise SparqlError(f"aggregate over unbound ?{arg}")
            if alias in all_vars or alias in group_by:
                raise SparqlError(f"aggregate alias ?{alias} shadows "
                                  "a bound variable")
    elif group_by:
        raise SparqlError("GROUP BY requires an aggregate in SELECT")
    if having and not aggs:
        raise SparqlError("HAVING requires aggregates in SELECT")
    for hv, _, hrhs in having:
        for v in [hv] + ([hrhs.value] if hrhs.kind == "var" else []):
            if v not in aliases and v not in group_by:
                raise SparqlError(
                    f"HAVING variable ?{v} must be an aggregate alias "
                    "or a GROUP BY key"
                )
    filter_vars = [v for v, _, _ in filters] + [
        r.value for _, _, r in filters if r.kind == "var"
    ]
    for v in group_by + filter_vars + [v for v, _ in values]:
        if v not in all_vars:
            raise SparqlError(f"variable ?{v} not bound in WHERE")
    for v in sel + [v for v, _ in order]:
        if v not in all_vars and v not in aliases:
            raise SparqlError(f"variable ?{v} not bound in WHERE")
    if offset is not None and (form == "CONSTRUCT" or not order):
        # SPARQL allows OFFSET over an unordered solution sequence,
        # but that is nondeterministic on a distributed engine —
        # require ORDER BY so results are stable across runs/layouts
        raise SparqlError("OFFSET requires ORDER BY (and SELECT form)")
    return {
        "form": form.lower(),
        "vars": sel, "distinct": distinct, "elements": elements,
        "filters": filters, "order": order, "limit": limit,
        "offset": offset, "values": values,
        "aggs": aggs, "group_by": group_by, "having": having,
        "template": template, "describe": describe,
    }


_PATH_MAX_ROUNDS = 20  # squaring rounds: covers path depth 2^20


def _compile_path(triples: DataFrame, ast) -> DataFrame:
    """A property-path expression → its binary relation as an (s, o)
    DataFrame. seq is a join chain, alt a bag union, inv a column
    swap; '+' (OneOrMorePath — DISTINCT node pairs per SPARQL 1.1) is
    transitive closure by ITERATED SQUARING: round k covers paths up
    to length 2^k, so like the pointer-jumping CC in
    operators/linking.py it needs O(log diameter) shuffle rounds, not
    O(diameter) — the scale-viable closure shape. Each round is
    localCheckpointed to cut lineage, mirroring operators/graph.py."""
    kind = ast[0]
    if kind == "pred":
        return triples.filter(F.col("p") == ast[1]).select("s", "o")
    if kind == "nps":
        # negated property set (SPARQL 1.1 §9.1): the forward
        # component matches edges whose predicate is NOT in the
        # forward member set; the ^-member component matches
        # REVERSED edges whose predicate is not in the inverse
        # member set; a mixed set is the union of the two. Bag
        # semantics like a plain pred scan — a NOT-IN filter pushed
        # to the scan, no join at all.
        fwd = [v for d, v in ast[1] if d == "fwd"]
        rev = [v for d, v in ast[1] if d == "rev"]
        parts = []
        if fwd:
            parts.append(
                triples.filter(~F.col("p").isin(fwd)).select("s", "o")
            )
        if rev:
            parts.append(
                triples.filter(~F.col("p").isin(rev)).select(
                    F.col("o").alias("s"), F.col("s").alias("o")
                )
            )
        out = parts[0]
        for part in parts[1:]:
            out = out.unionByName(part)
        return out
    if kind == "inv":
        r = _compile_path(triples, ast[1])
        return r.select(F.col("o").alias("s"), F.col("s").alias("o"))
    if kind == "seq":
        out = _compile_path(triples, ast[1][0])
        for part in ast[1][1:]:
            nxt = _compile_path(triples, part)
            out = (
                out.alias("l")
                .join(nxt.alias("r"), F.col("l.o") == F.col("r.s"))
                .select(F.col("l.s").alias("s"), F.col("r.o").alias("o"))
            )
        return out
    if kind == "alt":
        out = _compile_path(triples, ast[1][0])
        for part in ast[1][1:]:
            out = out.unionByName(_compile_path(triples, part))
        return out
    if kind in ("star", "opt"):
        # zero-length component: the identity relation over the
        # GRAPH NODES (every term in subject or object position —
        # SPARQL 1.1 zero-length-path semantics). Linear in node
        # count, not quadratic; with a constant endpoint Catalyst
        # pushes the equality filter through the union into both
        # branches, so <x> p* ?y prunes the identity side to one row.
        step = (
            _compile_path(triples, ("plus", ast[1]))
            if kind == "star"
            else _compile_path(triples, ast[1])
        )
        nodes = (
            triples.select("s")
            .unionByName(triples.select(F.col("o").alias("s")))
            .distinct()
        )
        ident = nodes.select(F.col("s"), F.col("s").alias("o"))
        return step.unionByName(ident).distinct()
    assert kind == "plus"
    paths = _compile_path(triples, ast[1]).distinct().localCheckpoint(
        eager=False
    )
    prev = paths.count()
    for _ in range(_PATH_MAX_ROUNDS):
        doubled = (
            paths.alias("l")
            .join(paths.alias("r"), F.col("l.o") == F.col("r.s"))
            .select(F.col("l.s").alias("s"), F.col("r.o").alias("o"))
        )
        paths = (
            paths.unionByName(doubled)
            .distinct()
            .localCheckpoint(eager=False)
        )
        n = paths.count()
        if n == prev:
            return paths
        prev = n
    raise SparqlError(
        f"property-path closure did not converge within depth "
        f"2^{_PATH_MAX_ROUNDS}"
    )


def _scan(triples: DataFrame, pat) -> DataFrame:
    """One triple pattern → a scan with constants pushed down as
    equality filters and variable positions renamed. A property-path
    predicate first compiles to its (s, o) relation, then the
    subject/object terms apply identically."""
    s, pr, o = pat
    if isinstance(pr, _Term) or pr[0] == "pred":
        scan = triples.select("s", "p", "o")
        positions = (
            ("s", s),
            ("p", pr if isinstance(pr, _Term) else _Term("const", pr[1])),
            ("o", o),
        )
    else:
        scan = _compile_path(triples, pr)
        positions = (("s", s), ("o", o))
    cols: dict[str, str] = {}  # var -> position column
    for pos, t in positions:
        if t.kind == "const":
            scan = scan.filter(F.col(pos) == t.value)
        elif t.value in cols:  # repeated var inside one pattern
            scan = scan.filter(F.col(pos) == F.col(cols[t.value]))
        else:
            cols[t.value] = pos
    return scan.select(
        *[F.col(pos).alias(var) for var, pos in cols.items()]
    )


def _apply_filter(plan: DataFrame, flt) -> DataFrame:
    var, op, rhs = flt
    if op == "regex":
        return plan.filter(F.col(var).rlike(rhs.value))
    lc = F.col(var)
    rv = F.col(rhs.value) if rhs.kind == "var" else F.lit(rhs.value)
    if rhs.kind == "num" and op in ("<", ">", "<=", ">="):
        # numeric comparison: SPARQL raises a type error (row drops)
        # on a non-numeric operand; try_cast yields NULL there (plain
        # cast would THROW under Spark 4 ANSI mode), and the NULL
        # comparison drops the row — identical outcomes
        lc = lc.try_cast("double")
        rv = F.lit(float(rhs.value))
    cmp = {
        "=": lc == rv, "!=": lc != rv, "<": lc < rv,
        ">": lc > rv, "<=": lc <= rv, ">=": lc >= rv,
    }[op]
    return plan.filter(cmp)


def _compile_bgp(triples: DataFrame, elems: list[tuple]) -> DataFrame:
    """Compile a plain pattern+filter list (an OPTIONAL body or a
    UNION branch) into a joined plan; filters apply group-scoped,
    after the joins."""
    plan: DataFrame | None = None
    for e in elems:
        if e[0] != "pat":
            continue
        scan = _scan(triples, e[1])
        if plan is None:
            plan = scan
        else:
            shared = [c for c in scan.columns if c in plan.columns]
            plan = (
                plan.join(scan, shared) if shared else plan.crossJoin(scan)
            )
    if plan is None:
        raise SparqlError("pattern group binds no triples")
    for e in elems:
        if e[0] == "filter":
            plan = _apply_filter(plan, e[1])
    return plan


def sparql_query(triples: DataFrame, q: str) -> DataFrame:
    """Compile + run ``q`` against a (s, p, o) triple DataFrame.
    Output columns are the SELECT variables, in order."""
    ast = parse_sparql(q)
    plan: DataFrame | None = None
    for e in ast["elements"]:
        if e[0] == "pat":
            scan = _scan(triples, e[1])
        elif e[0] == "union":
            # SPARQL UNION is bag union; branches bind the same
            # variable set (enforced at parse), so column-name union
            # is exact
            scan = _compile_bgp(triples, e[1]).unionByName(
                _compile_bgp(triples, e[2])
            )
        elif e[0] == "subselect":
            # { SELECT … }: compile the captured text recursively —
            # its output columns ARE its projected variables, so the
            # enclosing natural join on shared names implements the
            # SPARQL join of solution mappings. A grouped subselect
            # is the aggregate-then-join shape (the aggregate side is
            # group-count-sized, so AQE broadcasts it); a scalar one
            # is a 1-row crossJoin.
            scan = sparql_query(triples, e[1][0])
        elif e[0] == "minus":
            # anti join on the shared vars (scope rules make it exact)
            mplan = _compile_bgp(triples, e[1])
            assert plan is not None  # parse enforces a preceding pattern
            shared = [c for c in mplan.columns if c in plan.columns]
            plan = plan.join(mplan, shared, "left_anti")
            continue
        elif e[0] == "bind":
            # computed column at this position; row-local, no shuffle
            assert plan is not None  # parse enforces a preceding pattern
            plan = plan.withColumn(e[1][0], _compile_expr(e[1][1]))
            continue
        elif e[0] == "exists":
            # FILTER [NOT] EXISTS — a correlated semi/anti join on the
            # shared vars (the scope rules make the equi-join exact).
            # The pattern side is usually a constant-constrained scan,
            # i.e. the small build side AQE broadcasts.
            xplan = _compile_bgp(triples, e[1])
            assert plan is not None  # parse enforces a preceding pattern
            shared = [c for c in xplan.columns if c in plan.columns]
            plan = plan.join(
                xplan, shared, "left_semi" if e[2] else "left_anti"
            )
            continue
        else:  # optional — left-join on the shared (already-bound) vars
            opt = _compile_bgp(triples, e[1])
            assert plan is not None  # parse enforces a preceding pattern
            shared = [c for c in opt.columns if c in plan.columns]
            plan = plan.join(opt, shared, "left")
            continue
        if plan is None:
            plan = scan
        else:
            shared = [c for c in scan.columns if c in plan.columns]
            plan = (
                plan.join(scan, shared) if shared else plan.crossJoin(scan)
            )
    if ast["form"] == "describe":
        # concise description: all triples whose SUBJECT is a
        # described resource (the common implementation choice; the
        # spec leaves the result form to the service). The resource
        # set is a distinct projection of the solutions — small, so
        # AQE broadcasts it against the triple table.
        d = ast["describe"]
        if d.kind == "const":
            base = triples.filter(F.col("s") == d.value)
        else:
            assert plan is not None
            for flt in ast["filters"]:
                plan = _apply_filter(plan, flt)
            for v, vals in ast["values"]:
                plan = plan.filter(F.col(v).isin(vals))
            res = plan.select(F.col(d.value).alias("s")).distinct()
            base = triples.join(res, "s")
        return base.select("s", "p", "o")
    assert plan is not None
    for flt in ast["filters"]:
        plan = _apply_filter(plan, flt)
    for v, vals in ast["values"]:
        # inline data over a bound variable = a map-side IN filter
        plan = plan.filter(F.col(v).isin(vals))
    if ast["form"] == "ask":
        # EXISTS over the solution set: limit(1) short-circuits the
        # scan once any solution is found; one boolean row out
        return plan.limit(1).agg(
            (F.count(F.lit(1)) > 0).alias("ask")
        )
    if ast["form"] == "construct":
        # instantiate each template triple over the solutions; an RDF
        # graph is a SET of triples, so the union is distinct
        parts = []
        for s, pr, o in ast["template"]:
            parts.append(
                plan.select(
                    *[
                        (
                            F.col(t.value) if t.kind == "var"
                            else F.lit(t.value)
                        ).alias(name)
                        for name, t in (("s", s), ("p", pr), ("o", o))
                    ]
                )
            )
        out = parts[0]
        for part in parts[1:]:
            out = out.unionByName(part)
        out = out.distinct()
        if ast["limit"] is not None:
            out = out.limit(ast["limit"])
        return out
    if ast["aggs"]:
        agg_fns = {
            "COUNT": (F.count, F.count_distinct),
            "MIN": (F.min, F.min),
            "MAX": (F.max, F.max),
            # deterministic SAMPLE: the minimum (documented)
            "SAMPLE": (F.min, F.min),
        }
        exprs = []
        for fn, dis, arg, alias, sep in ast["aggs"]:
            if arg is None:  # COUNT(*)
                exprs.append(F.count(F.lit(1)).alias(alias))
            elif fn in ("SUM", "AVG"):
                # integer-micros quantization row-side, exact integer
                # sum, one final division — both engines emit the
                # identical double (module docstring)
                q = F.floor(
                    F.col(arg).try_cast("double") * 1_000_000
                ).cast("long")
                s = F.sum_distinct(q) if dis else F.sum(q)
                if fn == "AVG":
                    c = (
                        F.count_distinct(q) if dis else F.count(q)
                    )
                    s = F.floor(F.try_divide(s, c)).cast("long")
                exprs.append((s / F.lit(1_000_000.0)).alias(alias))
            elif fn == "GROUP_CONCAT":
                vals = (
                    F.collect_set(arg) if dis else F.collect_list(arg)
                )
                exprs.append(
                    F.array_join(F.array_sort(vals), sep).alias(alias)
                )
            else:
                exprs.append(agg_fns[fn][int(dis)](arg).alias(alias))
        plan = (
            plan.groupBy(*ast["group_by"]) if ast["group_by"]
            else plan.groupBy()
        ).agg(*exprs)
        for flt in ast["having"]:
            plan = _apply_filter(plan, flt)
    plan = plan.select(*ast["vars"])
    if ast["distinct"]:
        plan = plan.distinct()
    if ast["order"]:
        plan = plan.orderBy(
            *[F.col(v) if asc else F.desc(v) for v, asc in ast["order"]]
        )
    if ast["offset"] is not None:
        plan = plan.offset(ast["offset"])
    if ast["limit"] is not None:
        plan = plan.limit(ast["limit"])
    return plan


def sparql_update(triples: DataFrame, q: str) -> DataFrame:
    """SPARQL 1.1 Update, the ``DELETE {} INSERT {} WHERE {}`` family
    (either template block optional, at least one required) — the
    graph-maintenance face of the compiler: WHERE solutions
    instantiate the delete/insert templates exactly as CONSTRUCT
    does, then the store is rewritten set-wise.

    Compilation is BY COMPOSITION: each template block is compiled as
    a ``CONSTRUCT { tmpl } WHERE { … }`` over the same WHERE text, so
    every pattern feature the query compiler supports (OPTIONAL,
    FILTER, MINUS, property paths, …) works in updates for free, and
    the update inherits the compiler's scope/determinism rules.

    Application plan at scale: one left-anti join removes the delete
    set (solution-set-sized build side — AQE broadcasts it), one
    left-anti dedups the insert set against the surviving store, one
    union appends. The store itself is NEVER distinct'd or re-sorted;
    a set-valued store stays a set (callers with multiset stores
    dedup first — documented).

    ``INSERT DATA { … }``/``DELETE DATA { … }`` (constant triples, no
    WHERE) are not parsed — express them as a union/anti-join with a
    literal DataFrame; the WHERE forms are the distributed-rewrite
    case this operator exists for.

    Returns the updated (s, p, o) DataFrame.
    """
    import re as _re

    text = q.strip()
    m = _re.match(
        r"(?is)^\s*((?:PREFIX\s+[^\s]+\s+<[^>]*>\s*)*)"
        r"(?:DELETE\s*\{(?P<d>[^{}]*)\})?\s*"
        r"(?:INSERT\s*\{(?P<i>[^{}]*)\})?\s*"
        r"WHERE\s*(?P<w>\{.*\})\s*$",
        text,
    )
    if not m:
        raise SparqlError(
            "unsupported update form (expected [PREFIX…] "
            "[DELETE {tmpl}] [INSERT {tmpl}] WHERE {…})"
        )
    prefixes = m.group(1) or ""
    d_tmpl, i_tmpl, where = m.group("d"), m.group("i"), m.group("w")
    if d_tmpl is None and i_tmpl is None:
        raise SparqlError("update needs a DELETE or INSERT template")

    def inst(tmpl: str) -> DataFrame:
        return sparql_query(
            triples, f"{prefixes} CONSTRUCT {{ {tmpl} }} WHERE {where}"
        )

    keys = ["s", "p", "o"]
    store = triples.select(*keys)
    if d_tmpl is not None:
        store = store.join(inst(d_tmpl), keys, "left_anti")
    if i_tmpl is not None:
        fresh = inst(i_tmpl).join(store, keys, "left_anti")
        store = store.unionByName(fresh)
    return store
