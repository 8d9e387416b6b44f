"""Typed node constructors and the file-URI bridge — parity with the
reference's node utilities (ref: src/node.c#serd_node_new_decimal /
#serd_node_new_integer / #serd_node_new_blob, src/uri.c
#serd_file_uri_parse / #serd_node_new_file_uri; SURVEY.md §2A ops
8, 15).

Formatting is locale-independent by construction (pure string
arithmetic, never locale-aware printf — ≙ serd_strtod/serd's own
dtoa avoiding the C locale; SURVEY.md §1.2).
"""

from __future__ import annotations

import base64
import math

from serd_spark.rdf.model import Term, literal

XSD_BASE64 = "http://www.w3.org/2001/XMLSchema#base64Binary"
XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"
XSD_DECIMAL = "http://www.w3.org/2001/XMLSchema#decimal"


def new_integer(i: int) -> Term:
    """≙ serd_node_new_integer: canonical lexical form, xsd:integer."""
    return literal(str(int(i)), XSD_INTEGER)


def new_decimal(d: float, frac_digits: int) -> Term:
    """≙ serd_node_new_decimal: fixed-point with at most
    ``frac_digits`` fractional digits, trailing zeros trimmed down to
    one ('x.0' keeps a digit — a Turtle DECIMAL needs '.d+')."""
    if math.isnan(d) or math.isinf(d):
        raise ValueError("decimal nodes require finite values")
    s = f"{d:.{max(frac_digits, 1)}f}"  # a Turtle DECIMAL needs '.d+'
    s = s.rstrip("0")
    if s.endswith("."):
        s += "0"
    return literal(s, XSD_DECIMAL)


def new_blob(data: bytes) -> Term:
    """≙ serd_node_new_blob: base64 body, xsd:base64Binary."""
    return literal(base64.b64encode(data).decode("ascii"), XSD_BASE64)


def blob_decode(t: Term) -> bytes:
    """≙ serd_base64_decode."""
    return base64.b64decode(t.value)


# --- file-URI bridge ---------------------------------------------------

_UNRESERVED_PATH = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    "0123456789-._~/!$&'()*+,;=:@"
)


def new_file_uri(path: str, hostname: str = "") -> str:
    """≙ serd_node_new_file_uri: absolute path → file:// URI with
    percent-escaping of non-URI path bytes."""
    out = []
    for b in path.encode("utf-8"):
        ch = chr(b)
        if ch in _UNRESERVED_PATH:
            out.append(ch)
        else:
            out.append(f"%{b:02X}")
    escaped = "".join(out)
    if not escaped.startswith("/"):
        escaped = "/" + escaped
    return f"file://{hostname}{escaped}"


def file_uri_parse(uri: str) -> tuple[str, str]:
    """≙ serd_file_uri_parse: file URI → (path, hostname);
    percent-decodes the path. Raises ValueError for non-file URIs."""
    if not uri.startswith("file:"):
        raise ValueError(f"not a file URI: {uri!r}")
    rest = uri[len("file:") :]
    hostname = ""
    if rest.startswith("//"):
        rest = rest[2:]
        slash = rest.find("/")
        if slash == -1:
            hostname, rest = rest, "/"
        else:
            hostname, rest = rest[:slash], rest[slash:]
        if hostname == "localhost":
            hostname = ""
    # percent-decode; invalid escapes pass through literally.
    # Strict two-hex-digit check — int(hx, 16) alone would accept
    # signs/whitespace ('%+1' → control byte 0x01)
    hexdigits = set("0123456789abcdefABCDEF")
    out = bytearray()
    i, n = 0, len(rest)
    while i < n:
        c = rest[i]
        if c == "%" and i + 2 < n:
            hx = rest[i + 1 : i + 3]
            if hx[0] in hexdigits and hx[1] in hexdigits:
                out.append(int(hx, 16))
                i += 3
                continue
        out.extend(c.encode("utf-8"))
        i += 1
    return out.decode("utf-8", errors="replace"), hostname


def uri_to_path(uri: str) -> str:
    """≙ serd_uri_to_path."""
    return file_uri_parse(uri)[0]
