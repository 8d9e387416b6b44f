"""Structural guards for the driver contract (serd_spark/contract/*):
no silent def shadowing — the q_sql_q5 and q_crawl_delta incidents
were both a query defined twice, where the later def wins and the
earlier (sometimes the FIX) silently dies."""

import ast
import os

CONTRACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "serd_spark", "contract",
)
ENTRY = os.path.join(
    os.path.dirname(CONTRACT.rstrip(os.sep)), "..", "__spark_entry__.py"
)


def _top_defs(path):
    tree = ast.parse(open(path).read())
    out = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            out.append(node.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    out.append(t.id)
    return out


def _contract_files():
    return sorted(
        os.path.join(CONTRACT, f)
        for f in os.listdir(CONTRACT)
        if f.endswith(".py") and f != "__init__.py"
    )


def test_no_duplicate_defs_within_any_module():
    for path in _contract_files() + [os.path.abspath(ENTRY)]:
        names = [n for n in _top_defs(path) if n != "__all__"]
        dups = {n for n in names if names.count(n) > 1}
        assert not dups, f"{os.path.basename(path)} defines twice: {dups}"


def test_no_query_defined_in_two_modules():
    owner: dict[str, str] = {}
    clashes = []
    for path in _contract_files():
        mod = os.path.basename(path)
        for n in _top_defs(path):
            if n == "__all__" or n.startswith("_"):
                continue
            if n in owner:
                clashes.append((n, owner[n], mod))
            owner[n] = mod
    assert not clashes, f"cross-module shadowing: {clashes}"


def test_every_query_and_oracle_key_resolves():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert len(q) >= 197
    assert set(o) <= set(q)
    assert all(callable(v) for v in q.values())
