"""RDF dataset canonicalization — RDFC-1.0 (W3C rdf-canon, the
algorithm formerly known as URDNA2015).

Produces a canonical blank-node labeling (``c14n0, c14n1, …``) that
depends only on the *structure* of the dataset: two isomorphic
datasets (same quads up to a blank-node bijection, in any statement
order) canonicalize to byte-identical sorted canonical N-Quads. This
is the missing piece next to the writer's first-appearance relabeling
(``ntriples.canonical_blank_relabel`` — stable for round-trips but
order-sensitive) and skolemization (``serialize.skolemize`` — turns
blanks into IRIs rather than naming them canonically): c14n is what
dataset diffing, content-addressing, and signing need.

Spark shape: blank-node scope is the document (extraction labels are
blake2b(url)-prefixed), so canonicalization is embarrassingly
parallel per document — the operator runs the whole algorithm inside
the extraction UDF's Python crossing, no shuffle (see
``__spark_entry__.q_c14n``). There is deliberately no dataset-global
c14n: at 10^12 documents a global blank-node graph does not fit any
single pass, and per-document scope is exactly the RDF 1.1 notion the
rest of the engine uses.

Algorithm per the public spec (https://www.w3.org/TR/rdf-canon/):
first-degree hashes over each node's quads with the reference node as
``_:a`` and every other blank as ``_:z``; unique hashes are issued
canonical labels in hash order; tied groups go through the recursive
N-degree hash with per-permutation gossip paths, lexicographically
least path wins. Hash is SHA-256.

Adversarial bounds (house rule: decode work must be bounded *before*
looping): the N-degree permutation step is factorial in the size of a
related-hash group and the classic poison input (a clique of
indistinguishable blanks) makes naive implementations burn forever.
``C14nLimitError`` is raised when a permutation group exceeds
``MAX_PERM_GROUP``, recursion exceeds ``MAX_DEPTH``, or the total
N-degree evaluation budget ``MAX_STEPS`` is spent; callers treat it
like any lax-mode parse error (the document is reported, not the
executor pinned).
"""

from __future__ import annotations

import hashlib
from itertools import permutations

from serd_spark.rdf.model import BLANK, Statement, Term
from serd_spark.rdf.ntriples import format_term

MAX_PERM_GROUP = 6  # 6! = 720 candidate paths per tied group
MAX_DEPTH = 32
MAX_STEPS = 20_000


class C14nLimitError(ValueError):
    """Canonicalization aborted: pathological (near-automorphic)
    blank-node structure exceeded the work bounds."""


class _Issuer:
    """Label issuer (spec §4.5): hands out ``<prefix><n>`` in first-
    issue order and remembers the order for the final assignment."""

    __slots__ = ("prefix", "issued", "order")

    def __init__(self, prefix: str):
        self.prefix = prefix
        self.issued: dict[str, str] = {}
        self.order: list[str] = []

    def issue(self, ident: str) -> str:
        lab = self.issued.get(ident)
        if lab is None:
            lab = f"{self.prefix}{len(self.order)}"
            self.issued[ident] = lab
            self.order.append(ident)
        return lab

    def copy(self) -> "_Issuer":
        c = _Issuer(self.prefix)
        c.issued = dict(self.issued)
        c.order = list(self.order)
        return c


def _quad_line(st: Statement, blank_repr) -> str:
    """One canonical N-Quads line; ``blank_repr(label) -> '_:x'``.
    ascii_only keeps every line pure ASCII so downstream sorts agree
    byte-for-byte across engines (UTF-16 vs UTF-8 ordering trap —
    CLAUDE.md cross-engine notes)."""

    def term(t: Term) -> str:
        if t.kind == BLANK:
            return blank_repr(t.value)
        return format_term(t, None, ascii_only=True)

    parts = [term(st.subject), term(st.predicate), term(st.object)]
    if st.graph is not None and st.graph.value:
        parts.append(term(st.graph))
    return " ".join(parts) + " ."


class _Canonicalizer:
    def __init__(self, statements: list[Statement]):
        # quad index per blank label (spec step 2); duplicates dropped
        # — a dataset is a set of quads
        self.quads: list[Statement] = []
        seen: set[tuple] = set()
        for st in statements:
            key = (st.as_row(), "" if st.graph is None else st.graph.kind)
            if key not in seen:
                seen.add(key)
                self.quads.append(st)
        self.node_quads: dict[str, list[Statement]] = {}
        for st in self.quads:
            for t in (st.subject, st.object, st.graph):
                if t is not None and t.kind == BLANK:
                    self.node_quads.setdefault(t.value, []).append(st)
        self.canon = _Issuer("c14n")
        self._fd: dict[str, str] = {}
        self._steps = 0

    # -- first-degree hash (spec §4.6) --------------------------------
    def hash_first_degree(self, n: str) -> str:
        h = self._fd.get(n)
        if h is not None:
            return h

        def repr_fd(label: str) -> str:
            return "_:a" if label == n else "_:z"

        lines = sorted(
            _quad_line(st, repr_fd) + "\n" for st in self.node_quads[n]
        )
        h = hashlib.sha256("".join(lines).encode()).hexdigest()
        self._fd[n] = h
        return h

    # -- related-node hash (spec §4.7) ---------------------------------
    def _hash_related(
        self, related: str, quad: Statement, issuer: _Issuer, pos: str
    ) -> str:
        data = pos
        if pos != "g":
            data += format_term(quad.predicate, None, ascii_only=True)
        if related in self.canon.issued:
            data += "_:" + self.canon.issued[related]
        elif related in issuer.issued:
            data += "_:" + issuer.issued[related]
        else:
            data += self.hash_first_degree(related)
        return hashlib.sha256(data.encode()).hexdigest()

    # -- N-degree hash (spec §4.8) --------------------------------------
    def hash_n_degree(
        self, identifier: str, issuer: _Issuer, depth: int = 0
    ) -> tuple[str, _Issuer]:
        if depth > MAX_DEPTH:
            raise C14nLimitError("c14n recursion depth exceeded")
        self._steps += 1
        if self._steps > MAX_STEPS:
            raise C14nLimitError("c14n work budget exceeded")

        related_map: dict[str, set[str]] = {}
        for quad in self.node_quads[identifier]:
            for pos, t in (
                ("s", quad.subject), ("o", quad.object), ("g", quad.graph)
            ):
                if t is None or t.kind != BLANK or t.value == identifier:
                    continue
                h = self._hash_related(t.value, quad, issuer, pos)
                related_map.setdefault(h, set()).add(t.value)

        data: list[str] = []
        for related_hash in sorted(related_map):
            data.append(related_hash)
            group = sorted(related_map[related_hash])
            if len(group) > MAX_PERM_GROUP:
                raise C14nLimitError(
                    f"c14n permutation group of {len(group)} blanks"
                )
            chosen_path = ""
            chosen_issuer: _Issuer | None = None
            for perm in permutations(group):
                issuer_copy = issuer.copy()
                path = ""
                recursion: list[str] = []
                viable = True
                for related in perm:
                    if related in self.canon.issued:
                        path += "_:" + self.canon.issued[related]
                    else:
                        if related not in issuer_copy.issued:
                            recursion.append(related)
                        path += "_:" + issuer_copy.issue(related)
                    if (
                        chosen_path
                        and len(path) >= len(chosen_path)
                        and path > chosen_path
                    ):
                        viable = False
                        break
                if not viable:
                    continue
                for related in recursion:
                    rh, ri = self.hash_n_degree(
                        related, issuer_copy, depth + 1
                    )
                    path += "_:" + issuer_copy.issue(related)
                    path += f"<{rh}>"
                    issuer_copy = ri
                    if (
                        chosen_path
                        and len(path) >= len(chosen_path)
                        and path > chosen_path
                    ):
                        viable = False
                        break
                if not viable:
                    continue
                if not chosen_path or path < chosen_path:
                    chosen_path = path
                    chosen_issuer = issuer_copy
            data.append(chosen_path)
            if chosen_issuer is not None:
                issuer = chosen_issuer
        return (
            hashlib.sha256("".join(data).encode()).hexdigest(),
            issuer,
        )

    # -- main loop (spec §4.4) -------------------------------------------
    def run(self) -> dict[str, str]:
        h2b: dict[str, list[str]] = {}
        for n in self.node_quads:
            h2b.setdefault(self.hash_first_degree(n), []).append(n)
        # unique first-degree hashes: canonical labels in hash order
        for h in sorted(h2b):
            nodes = h2b[h]
            if len(nodes) == 1:
                self.canon.issue(nodes[0])
        # tied groups: N-degree with temporary issuers
        for h in sorted(h2b):
            nodes = h2b[h]
            if len(nodes) == 1:
                continue
            results = []
            for n in sorted(nodes):
                if n in self.canon.issued:
                    continue
                temp = _Issuer("b")
                temp.issue(n)
                results.append(self.hash_n_degree(n, temp))
            for _, ri in sorted(results, key=lambda r: r[0]):
                for existing in ri.order:
                    self.canon.issue(existing)
        return self.canon.issued


def canonical_label_map(statements: list[Statement]) -> dict[str, str]:
    """blank label → ``c14nN``, per RDFC-1.0. Raises
    :class:`C14nLimitError` on pathological automorphic structure."""
    return _Canonicalizer(statements).run()


def canonical_nquads(statements: list[Statement]) -> list[str]:
    """The canonical form: deduplicated quads with canonical blank
    labels, serialized as ASCII N-Quads lines, sorted. Hash the
    concatenation for a content address; compare lists for
    isomorphism."""
    c = _Canonicalizer(statements)
    labels = c.run()

    def repr_canon(label: str) -> str:
        return "_:" + labels[label]

    return sorted({_quad_line(st, repr_canon) for st in c.quads})
