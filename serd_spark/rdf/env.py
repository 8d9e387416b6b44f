"""Prefix/base environment — equivalent of ``SerdEnv`` (ref:
src/env.c#serd_env_set_prefix, #serd_env_expand, #serd_env_qualify;
SURVEY.md §2A ops 5-6).

Document-scoped and mutated sequentially in document order by
``@prefix``/``@base`` directives, exactly like the reference; it is
never a Spark-level structure (directives cannot cross document
boundaries — SURVEY.md §1.1).
"""

from __future__ import annotations

from serd_spark.rdf import uri as urimod


class Env:
    __slots__ = ("prefixes", "base", "_rcache", "pn_cache")

    def __init__(self, base: str = ""):
        self.prefixes: dict[str, str] = {}
        self.base = base
        # per-base memo of resolve() results: web documents repeat
        # vocabulary IRIs heavily; bounded, cleared on @base
        self._rcache: dict[str, str] = {}
        # raw prefixed-name token → expanded Term, owned by the
        # parser's hot path; MUST be cleared whenever a prefix
        # mapping changes (set_prefix does)
        self.pn_cache: dict = {}

    def set_prefix(self, name: str, namespace: str) -> None:
        # Namespace IRIs are themselves resolved against the current
        # base (Turtle spec: "Relative IRIs are resolved with base
        # IRIs as per RFC 3986" — applies to directive IRIs too).
        self.prefixes[name] = self.resolve(namespace)
        self.pn_cache.clear()

    def set_base(self, base_iri: str) -> None:
        # A new @base is resolved against the previous base.
        self.base = self.resolve(base_iri)
        self._rcache.clear()
        self.pn_cache.clear()

    def expand(self, prefix: str, local: str) -> str:
        """CURIE expansion: namespace ⧺ suffix. Raises ``KeyError``
        on unknown prefix (caller maps it to the equivalent of
        ``SERD_ERR_BAD_CURIE``)."""
        return self.prefixes[prefix] + local

    def resolve(self, ref: str) -> str:
        """Resolve a (possibly relative) IRI reference against the
        current base (no-op when base is empty, matching the
        reference's leave-unresolved behavior)."""
        if not self.base:
            return ref
        out = self._rcache.get(ref)
        if out is None:
            out = urimod.resolve(self.base, ref)
            if len(self._rcache) < 8192:
                self._rcache[ref] = out
        return out

    def qualify(self, iri: str) -> tuple[str, str] | None:
        """Inverse of expand, for the abbreviating writer (ref:
        src/env.c#serd_env_qualify): longest-namespace match wins."""
        best: tuple[str, str] | None = None
        best_len = 0
        for name, ns in self.prefixes.items():
            if ns and iri.startswith(ns) and len(ns) > best_len:
                best = (name, iri[len(ns) :])
                best_len = len(ns)
        return best
