"""RFC 3986 URI parsing, reference resolution, and normalization.

Equivalent of the reference's ``serd_uri_parse`` /
``serd_uri_resolve`` / ``serd_uri_serialise`` (ref: src/uri.c,
src/uri_utils.h — SURVEY.md §2A op-7). Implemented directly from the
published RFC 3986 algorithms:

- :func:`parse` — §3 component split (pure string slicing, no regex
  backtracking surprises);
- :func:`resolve` — §5.2 reference resolution (merge paths + remove
  dot segments), the semantics Turtle/TriG relative-IRI handling
  needs;
- :func:`normalize` — §6.2.2/§6.2.3 syntax- and scheme-based
  normalization (case-fold scheme/host, upper-case percent triplets,
  decode unreserved percent-encodings, drop default ports, empty
  path → "/" under authority). Used by the canonicalization stage,
  NOT during parsing (parsing matches reference resolution exactly).

All functions are allocation-light and document-scoped so they can
run millions of times inside Arrow batches.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

__all__ = ["ParsedURI", "parse", "resolve", "normalize", "remove_dot_segments"]

# scheme "://" prefix — the shape of virtually every IRI on the web;
# used for the resolve() fast path
_ABS_AUTHORITY = re.compile(r"[A-Za-z][A-Za-z0-9+.\-]*://")
# scheme followed by ':' (match end tells us where)
_SCHEME = re.compile(r"[A-Za-z][A-Za-z0-9+.\-]*:")
# already-canonical shape: lowercase scheme + lowercase reg-name host
# with NO port, non-empty path, no percent triplets anywhere — for
# these, normalize() is the identity (dot segments still checked
# separately). The common case for machine-generated web IRIs.
_CANONICAL = re.compile(
    r"[a-z][a-z0-9+.\-]*://[a-z0-9\-._~]+/[^%\s]*\Z"
)


def _no_dot_segments(uri: str) -> bool:
    """True iff the PATH portion provably has no dot segments — the
    checks must run on the part before '?'/'#', or 'a/..#f' slips
    through (dot segments just before the query/fragment)."""
    head = uri
    q = head.find("?")
    if q >= 0:
        head = head[:q]
    h = head.find("#")
    if h >= 0:
        head = head[:h]
    return (
        "/./" not in head
        and "/../" not in head
        and not head.endswith(("/.", "/.."))
    )


@dataclass(frozen=True, slots=True)
class ParsedURI:
    """Component view of a URI reference — equivalent of ``SerdURI``
    (scheme/authority/path/query/fragment views; ref:
    serd/serd.h#SerdURI). ``None`` means *absent* (distinct from
    empty string), which matters for resolution."""

    scheme: str | None
    authority: str | None
    path: str
    query: str | None
    fragment: str | None

    def recompose(self) -> str:
        # RFC 3986 §5.3 component recomposition.
        out: list[str] = []
        if self.scheme is not None:
            out.append(self.scheme)
            out.append(":")
        if self.authority is not None:
            out.append("//")
            out.append(self.authority)
        out.append(self.path)
        if self.query is not None:
            out.append("?")
            out.append(self.query)
        if self.fragment is not None:
            out.append("#")
            out.append(self.fragment)
        return "".join(out)


def parse(ref: str) -> ParsedURI:
    """Split a URI reference into components (RFC 3986 §3 / appendix
    B semantics, without regex)."""
    scheme: str | None = None
    authority: str | None = None
    query: str | None = None
    fragment: str | None = None

    # fragment
    h = ref.find("#")
    if h >= 0:
        fragment = ref[h + 1 :]
        ref = ref[:h]
    # query
    q = ref.find("?")
    if q >= 0:
        query = ref[q + 1 :]
        ref = ref[:q]
    # scheme: ALPHA *( ALPHA / DIGIT / "+" / "-" / "." ) ":"
    m = _SCHEME.match(ref)
    if m:
        c = m.end() - 1
        # a ':' inside the first path segment of a relative ref is
        # not a scheme if a '/' precedes it
        s = ref.find("/")
        if s == -1 or s > c:
            scheme = ref[:c]
            ref = ref[c + 1 :]
    # authority
    if ref.startswith("//"):
        ref = ref[2:]
        end = len(ref)
        for i, ch in enumerate(ref):
            if ch in "/?#":
                end = i
                break
        authority = ref[:end]
        ref = ref[end:]
    return ParsedURI(scheme, authority, ref, query, fragment)


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    output: list[str] = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if output:
                output.pop()
        elif path == "/..":
            path = "/"
            if output:
                output.pop()
        elif path in (".", ".."):
            path = ""
        else:
            # move first segment (through but not incl. next "/")
            if path.startswith("/"):
                nxt = path.find("/", 1)
            else:
                nxt = path.find("/")
            if nxt == -1:
                output.append(path)
                path = ""
            else:
                output.append(path[:nxt])
                path = path[nxt:]
    return "".join(output)


def _merge(base: ParsedURI, ref_path: str) -> str:
    """RFC 3986 §5.2.3."""
    if base.authority is not None and base.path == "":
        return "/" + ref_path
    i = base.path.rfind("/")
    if i == -1:
        return ref_path
    return base.path[: i + 1] + ref_path


def resolve(base_str: str, ref_str: str) -> str:
    """RFC 3986 §5.2.2 transform-references (strict mode).

    Behavioral contract of ``serd_uri_resolve``: resolve ``ref``
    against ``base``; if base is not absolute the reference is
    returned as-is (the reference library leaves unresolvable URIs
    untouched rather than failing).
    """
    if not base_str:
        return ref_str
    # fast path (the overwhelmingly common web case): ref is already
    # absolute with an authority and its path has no dot segments →
    # §5.2.2 is the identity. Conservative checks — anything unusual
    # falls through to the full algorithm.
    if _ABS_AUTHORITY.match(ref_str) and _no_dot_segments(ref_str):
        return ref_str
    ref = parse(ref_str)
    base = parse(base_str)
    if base.scheme is None:
        return ref_str

    if ref.scheme is not None:
        t = ParsedURI(
            ref.scheme,
            ref.authority,
            remove_dot_segments(ref.path),
            ref.query,
            ref.fragment,
        )
    elif ref.authority is not None:
        t = ParsedURI(
            base.scheme,
            ref.authority,
            remove_dot_segments(ref.path),
            ref.query,
            ref.fragment,
        )
    elif ref.path == "":
        t = ParsedURI(
            base.scheme,
            base.authority,
            base.path,
            ref.query if ref.query is not None else base.query,
            ref.fragment,
        )
    elif ref.path.startswith("/"):
        t = ParsedURI(
            base.scheme,
            base.authority,
            remove_dot_segments(ref.path),
            ref.query,
            ref.fragment,
        )
    else:
        t = ParsedURI(
            base.scheme,
            base.authority,
            remove_dot_segments(_merge(base, ref.path)),
            ref.query,
            ref.fragment,
        )
    return t.recompose()


# --- §6 normalization (canonicalization stage) -------------------------

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80", "wss": "443"}

_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)


def _normalize_pct(s: str, extra_keep_decoded: str = "") -> str:
    """Upper-case percent triplets; decode those that encode
    unreserved characters (RFC 3986 §6.2.2.1-2)."""
    if "%" not in s:
        return s
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "%":
            hx = s[i + 1 : i + 3]
            if len(hx) == 2 and all(c in "0123456789abcdefABCDEF" for c in hx):
                code = int(hx, 16)
                dec = chr(code)
                if dec in _UNRESERVED or dec in extra_keep_decoded:
                    out.append(dec)
                else:
                    out.append("%" + hx.upper())
                i += 3
                continue
        out.append(ch)
        i += 1
    return "".join(out)


def normalize(uri: str) -> str:
    """Syntax-based + scheme-based normalization of an absolute URI
    (RFC 3986 §6.2.2, §6.2.3). Non-absolute inputs are returned with
    percent-normalization only — the canonicalization stage never
    invents a base."""
    if _CANONICAL.match(uri) and _no_dot_segments(uri):
        return uri
    p = parse(uri)
    if p.scheme is None:
        return _normalize_pct(uri)
    scheme = p.scheme.lower()
    authority = p.authority
    if authority is not None:
        # split userinfo@host:port
        userinfo = None
        hostport = authority
        at = authority.rfind("@")
        if at >= 0:
            userinfo = authority[:at]
            hostport = authority[at + 1 :]
        # IPv6 literal
        if hostport.startswith("["):
            close = hostport.find("]")
            host = hostport[: close + 1].lower()
            rest = hostport[close + 1 :]
            port = rest[1:] if rest.startswith(":") else None
        else:
            colon = hostport.rfind(":")
            if colon >= 0 and hostport[colon + 1 :].isdigit():
                host, port = hostport[:colon], hostport[colon + 1 :]
            elif colon >= 0 and hostport[colon + 1 :] == "":
                host, port = hostport[:colon], ""  # trailing ':' → drop
            else:
                host, port = hostport, None
            host = _normalize_pct(host.lower())
        if port is not None and (port == "" or port == _DEFAULT_PORTS.get(scheme)):
            port = None
        authority = (userinfo + "@" if userinfo is not None else "") + host + (
            ":" + port if port is not None else ""
        )
    path = remove_dot_segments(_normalize_pct(p.path, extra_keep_decoded=""))
    if authority is not None and path == "":
        path = "/"  # §6.2.3
    query = _normalize_pct(p.query) if p.query is not None else None
    fragment = _normalize_pct(p.fragment) if p.fragment is not None else None
    return ParsedURI(scheme, authority, path, query, fragment).recompose()
