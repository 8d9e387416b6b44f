"""Bounded PDF text extraction — pure stdlib (zlib + re), the same
closed-loop codec pattern as jpeg_codec/exif_codec: a deterministic
WRITER (``encode_pdf``) synthesizes real classic-PDF files whose text
is a closed-form function of the row id, and the PARSER
(``decode_pdf_text``) must get that text back byte-for-byte — so the
whole object scanner / page tree / Flate stream / content-operator
pipeline sits under the contract-query hash without the oracle ever
reading a payload byte.

Why this operator exists: Common-Crawl-style corpora carry a large
PDF slice, and a training-data engine has to turn it into text. The
decode libraries (pdfminer/pypdf/poppler) are not in this container,
and the repo discipline for that case is a real stdlib implementation
of the tractable core with clearly-gated feature branches — not a
fake.

Supported (the "classic PDF" core that pre-1.5 writers and most
generators still emit):
- object scanning (``N G obj … endobj``) with declared-/Length stream
  slicing and an endstream-search fallback when /Length is indirect
  or wrong (the slice path means binary stream bytes that happen to
  contain ``endobj`` cannot derail the scan);
- the trailer → /Root → /Pages → /Kids page tree (cycle-guarded,
  depth-capped), /Contents as one ref or an array of refs; when no
  catalog resolves, lax mode falls back to document-order /Type /Page
  objects, then to any stream containing a BT text block;
- /Filter /FlateDecode via ``zlib.decompressobj`` with a hard
  ``max_length`` output cap — the PNG bounded-inflate rule from
  CLAUDE.md: a 2 KB zlib bomb must cost its declared cap, never pin
  an executor;
- content-stream text operators: Tj, ' , " (next-line shows), TJ
  (kerning array — a gap ≤ -TJ_SPACE_GAP thousandths inserts one
  space, the standard extractor heuristic, here also the writer's
  contract), with Td/TD/T*/Tm/ET starting a new line; literal
  strings with balanced parens, all escapes and octal, hex strings.

Gated gaps (NotImplementedError in strict mode, skip/empty in lax —
each is a real feature branch beside a working sibling path):
- cross-reference STREAMS + /ObjStm object streams (PDF 1.5 packed
  objects): the scanner cannot see inside them without implementing
  the /W-column xref decoder; detected and reported, not mis-parsed;
- /Encrypt-ed documents;
- filters other than FlateDecode (DCT/LZW/ASCII85…);
- font /ToUnicode CMaps: text bytes decode as Latin-1, the simple-
  font default. Multi-byte CID text would need the CMap machinery;
  for synthesized and simple-font PDFs Latin-1 is exact (documented
  divergence for exotic fonts).

Every bound is enforced BEFORE the work it limits (decoded-size caps,
object/page/op counts, nesting depths) — the image-codec
bomb-proofing rule.

Scale shape (Spark section at the bottom): ``pdf_text`` is one
iterator mapInPandas crossing, row-local, no shuffle — corpus-scale
PDF extraction is embarrassingly parallel, and the per-stream output
caps bound executor memory whatever an adversarial payload declares.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator, NamedTuple

MAX_OBJECTS = 10_000
MAX_PAGES = 2_000
MAX_DICT_KEYS = 512
MAX_ARRAY_ITEMS = 8_192
MAX_NEST = 32
MAX_STREAM_OUT = 1 << 23  # 8 MiB decompressed, per stream
MAX_TEXT_CHARS = 1 << 22  # 4 MiB extracted text, per page
MAX_CONTENT_OPS = 200_000
MAX_STRING_BYTES = 1 << 20
TJ_SPACE_GAP = 180  # thousandths of text space; ≤ -gap → one space


class PdfError(ValueError):
    pass


# ---------------------------------------------------------------- writer

_ESC = {ord("("): b"\\(", ord(")"): b"\\)", ord("\\"): b"\\\\"}


def _esc(b: bytes) -> bytes:
    return b"".join(_ESC.get(c, bytes((c,))) for c in b)


def _content_for(text: str, variant: str) -> bytes:
    """One BT block per page: set font, one Td, one text-show op in
    the requested encoding variant. All three variants must decode to
    the identical ``text`` — that is the closed-loop contract."""
    raw = text.encode("latin-1")
    if variant == "plain":
        body = b"(" + _esc(raw) + b") Tj"
    elif variant == "hex":
        body = b"<" + raw.hex().encode("ascii") + b"> Tj"
    elif variant == "tj":
        pieces = raw.split(b" ")
        body = (
            b"["
            + b" -200 ".join(b"(" + _esc(p) + b")" for p in pieces)
            + b"] TJ"
        )
    else:
        raise ValueError(f"unknown variant {variant!r}")
    return b"BT\n/F1 12 Tf\n72 720 Td\n" + body + b"\nET"


def encode_pdf(
    pages: list[str], variant: str = "plain", compress: bool = False
) -> bytes:
    """A minimal but REAL classic PDF: catalog → pages tree → one
    page + one content stream per entry, a shared Type1 font, a
    correct xref table and trailer. ``variant`` picks the text-show
    encoding (plain literal string with escapes, hex string, or a
    TJ kerning array split on spaces with -200 gaps); ``compress``
    Flate-encodes the content streams."""
    if not pages:
        raise ValueError("encode_pdf: at least one page required")
    n = len(pages)
    font_num = 3 + 2 * n
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    bodies: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode(),
        font_num: b"<< /Type /Font /Subtype /Type1"
        b" /BaseFont /Helvetica >>",
    }
    for i, text in enumerate(pages):
        pnum, cnum = 3 + 2 * i, 4 + 2 * i
        bodies[pnum] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
            f"/Contents {cnum} 0 R >>"
        ).encode()
        data = _content_for(text, variant)
        filt = b""
        if compress:
            data = zlib.compress(data, 6)
            filt = b"/Filter /FlateDecode "
        bodies[cnum] = (
            b"<< "
            + filt
            + f"/Length {len(data)} >>".encode()
            + b"\nstream\n"
            + data
            + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in range(1, font_num + 1):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + bodies[num] + b"\nendobj\n"
    xref_off = len(out)
    out += f"xref\n0 {font_num + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, font_num + 1):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {font_num + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_off}\n%%EOF\n"
    ).encode()
    return bytes(out)


# ------------------------------------------------------------- tokenizer

_WS_SET = frozenset(b"\x00\t\n\x0c\r ")
_NAME_RE = re.compile(rb"/[^\x00\t\n\x0c\r ()<>\[\]{}/%]*")
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_REF_RE = re.compile(
    rb"(\d{1,10})[\x00\t\n\x0c\r ]+(\d{1,5})[\x00\t\n\x0c\r ]+R(?![A-Za-z0-9])"
)
_HEX_WS_RE = re.compile(rb"[\x00\t\n\x0c\r ]+")


class _Ref(NamedTuple):
    num: int


def _skip_ws(data: bytes, i: int, end: int) -> int:
    while i < end:
        c = data[i]
        if c in (0, 9, 10, 12, 13, 32):
            i += 1
        elif c == 0x25:  # % comment to end of line
            j = data.find(b"\n", i, end)
            i = end if j < 0 else j + 1
        else:
            break
    return i


def _parse_string(
    data: bytes, i: int, end: int, cap: int = MAX_STRING_BYTES
) -> tuple[bytes, int]:
    """Literal ( ) string: balanced parens, \\-escapes, up-to-3-digit
    octal, line continuations. Nesting and output size are capped
    BEFORE growing."""
    i += 1  # opening (
    depth = 1
    out = bytearray()
    while i < end:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= end:
                raise PdfError("string: trailing backslash")
            e = data[i]
            if e == 0x6E:
                out.append(0x0A)
            elif e == 0x72:
                out.append(0x0D)
            elif e == 0x74:
                out.append(0x09)
            elif e == 0x62:
                out.append(0x08)
            elif e == 0x66:
                out.append(0x0C)
            elif e in (0x28, 0x29, 0x5C):
                out.append(e)
            elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                v = e - 0x30
                k = 1
                while k < 3 and i + 1 < end and 0x30 <= data[i + 1] <= 0x37:
                    i += 1
                    v = v * 8 + (data[i] - 0x30)
                    k += 1
                out.append(v & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                if e == 0x0D and i + 1 < end and data[i + 1] == 0x0A:
                    i += 1
            else:  # unknown escape: the char itself (spec rule)
                out.append(e)
            i += 1
        elif c == 0x28:
            depth += 1
            if depth > 256:
                raise PdfError("string: paren nesting cap")
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
        if len(out) > cap:
            raise PdfError("string: size cap")
    raise PdfError("unterminated string")


def _parse_hex_string(data: bytes, i: int, end: int) -> tuple[bytes, int]:
    j = data.find(b">", i + 1, end)
    if j < 0:
        raise PdfError("unterminated hex string")
    if j - i - 1 > 2 * MAX_STRING_BYTES:
        raise PdfError("hex string: size cap")
    hx = _HEX_WS_RE.sub(b"", data[i + 1 : j])
    if len(hx) % 2:
        hx += b"0"  # spec: odd final digit reads as digit-0
    try:
        return bytes.fromhex(hx.decode("ascii")), j + 1
    except (ValueError, UnicodeDecodeError) as exc:
        raise PdfError(f"bad hex string: {exc}") from None


def _parse_value(data: bytes, i: int, end: int, depth: int = 0):
    """One PDF object value → (value, next_pos). Dicts are plain
    dicts keyed by name text, names are ('name', text) tuples,
    indirect references are _Ref, strings are bytes."""
    if depth > MAX_NEST:
        raise PdfError("value nesting cap")
    i = _skip_ws(data, i, end)
    if i >= end:
        raise PdfError("unexpected end of data")
    if data.startswith(b"<<", i):
        d: dict = {}
        i += 2
        while True:
            i = _skip_ws(data, i, end)
            if data.startswith(b">>", i):
                return d, i + 2
            if i >= end or data[i] != 0x2F:
                raise PdfError("dict: expected /name key")
            m = _NAME_RE.match(data, i)
            key = m.group()[1:].decode("latin-1")
            val, i = _parse_value(data, m.end(), end, depth + 1)
            if len(d) >= MAX_DICT_KEYS:
                raise PdfError("dict: key cap")
            d[key] = val
    c = data[i]
    if c == 0x5B:  # [
        arr: list = []
        i += 1
        while True:
            i = _skip_ws(data, i, end)
            if i < end and data[i] == 0x5D:
                return arr, i + 1
            v, i = _parse_value(data, i, end, depth + 1)
            if len(arr) >= MAX_ARRAY_ITEMS:
                raise PdfError("array: item cap")
            arr.append(v)
    if c == 0x2F:
        m = _NAME_RE.match(data, i)
        return ("name", m.group()[1:].decode("latin-1")), m.end()
    if c == 0x28:
        return _parse_string(data, i, end)
    if c == 0x3C:  # < but not << (handled above)
        return _parse_hex_string(data, i, end)
    for lit, val in ((b"true", True), (b"false", False), (b"null", None)):
        if data.startswith(lit, i):
            return val, i + len(lit)
    m = _REF_RE.match(data, i)
    if m:
        return _Ref(int(m.group(1))), m.end()
    m = _NUM_RE.match(data, i)
    if m:
        txt = m.group()
        return (float(txt) if b"." in txt else int(txt)), m.end()
    raise PdfError(f"bad token at offset {i}")


# --------------------------------------------------------- object scan

_OBJ_HEAD_RE = re.compile(
    rb"(\d{1,10})[\x00\t\n\x0c\r ]+(\d{1,5})[\x00\t\n\x0c\r ]+obj"
    rb"(?![A-Za-z0-9])"
)


def _scan_objects(
    data: bytes, strict: bool
) -> tuple[dict[int, tuple], list[int]]:
    """Sequential object scan → {num: (value, stream|None)} plus the
    document order. A direct /Length slices the stream body exactly
    (binary bytes containing 'endobj'/'obj' cannot derail the
    cursor); otherwise the endstream search is the fallback."""
    objs: dict[int, tuple] = {}
    order: list[int] = []
    n = len(data)
    pos = 0
    while len(objs) < MAX_OBJECTS:
        m = _OBJ_HEAD_RE.search(data, pos)
        if not m:
            break
        num = int(m.group(1))
        try:
            val, i = _parse_value(data, m.end(), n)
        except PdfError:
            if strict:
                raise
            pos = m.end()
            continue
        stream = None
        i2 = _skip_ws(data, i, n)
        if data.startswith(b"stream", i2):
            j = i2 + 6
            if data.startswith(b"\r\n", j):
                j += 2
            elif j < n and data[j] in (0x0A, 0x0D):
                j += 1
            length = val.get("Length") if isinstance(val, dict) else None
            sliced = False
            if isinstance(length, int) and 0 <= length <= n - j:
                k = _skip_ws(data, j + length, n)
                if data.startswith(b"endstream", k):
                    stream = data[j : j + length]
                    i = k + 9
                    sliced = True
            if not sliced:
                k = data.find(b"endstream", j)
                if k < 0:
                    if strict:
                        raise PdfError("unterminated stream")
                    break
                stream = data[j:k]
                while stream[-1:] in (b"\r", b"\n"):
                    stream = stream[:-1]
                i = k + 9
        i3 = _skip_ws(data, i, n)
        if data.startswith(b"endobj", i3):
            i3 += 6
        elif strict:
            raise PdfError(f"object {num}: missing endobj")
        if num not in objs:
            objs[num] = (val, stream)
            order.append(num)
        pos = max(i3, m.end())
    return objs, order


# -------------------------------------------------------- page traversal

def _find_root(data: bytes, objs: dict[int, tuple]):
    """/Root from the LAST trailer dict (incremental updates append
    trailers; the last one wins), falling back to any scanned dict
    carrying /Root (xref-stream trailers), then to a direct /Type
    /Catalog object."""
    t = len(data)
    while True:
        t = data.rfind(b"trailer", 0, t)
        if t < 0:
            break
        try:
            d, _ = _parse_value(data, t + 7, len(data))
        except PdfError:
            continue
        if isinstance(d, dict):
            if "Encrypt" in d:
                raise NotImplementedError(
                    "encrypted PDF (/Encrypt) is not supported"
                )
            if "Root" in d:
                return d["Root"]
    for num, (val, _st) in objs.items():
        if isinstance(val, dict) and "Root" in val:
            return val["Root"]
    for num, (val, _st) in objs.items():
        if isinstance(val, dict) and val.get("Type") == ("name", "Catalog"):
            return _Ref(num)
    return None


def _collect_pages(
    root, objs: dict[int, tuple], strict: bool
) -> list[dict] | None:
    """Walk /Root → /Pages → /Kids depth-first, cycle-guarded, into
    the ordered page-dict list."""

    def deref(v, _depth: int = 0):
        seen = set()
        while isinstance(v, _Ref):
            if v.num in seen or len(seen) > 16:
                return None
            seen.add(v.num)
            v = objs.get(v.num, (None, None))[0]
        return v

    cat = deref(root)
    if not isinstance(cat, dict):
        return None
    out: list[dict] = []
    visited: set[int] = set()

    def walk(node_ref, depth: int):
        if depth > MAX_NEST or len(out) >= MAX_PAGES:
            raise PdfError("page tree depth/count cap")
        if isinstance(node_ref, _Ref):
            if node_ref.num in visited:
                return  # cycle guard
            visited.add(node_ref.num)
        node = deref(node_ref)
        if not isinstance(node, dict):
            return
        if node.get("Type") == ("name", "Page") or (
            "Contents" in node and "Kids" not in node
        ):
            out.append(node)
            return
        kids = deref(node.get("Kids"))
        if isinstance(kids, list):
            for kid in kids[: MAX_PAGES * 2]:
                walk(kid, depth + 1)

    walk(cat.get("Pages"), 0)
    return out if out else None


# -------------------------------------------------------- stream decode

def _inflate_bounded(b: bytes, cap: int = MAX_STREAM_OUT) -> bytes:
    """zlib with a hard output cap — decompressobj(max_length), the
    bounded-inflate rule: a bomb costs its cap, never its ratio."""
    d = zlib.decompressobj()
    try:
        out = d.decompress(b, cap + 1)
    except zlib.error as exc:
        raise PdfError(f"bad Flate stream: {exc}") from None
    if len(out) > cap:
        raise PdfError("Flate stream exceeds decompressed-size cap")
    return out


def _stream_data(val: dict, stream: bytes, strict: bool) -> bytes:
    filt = val.get("Filter")
    filters = (
        [] if filt is None
        else (filt if isinstance(filt, list) else [filt])
    )
    data = stream
    for f in filters:
        if f == ("name", "FlateDecode"):
            data = _inflate_bounded(data)
        else:
            fname = f[1] if isinstance(f, tuple) else f
            raise NotImplementedError(
                f"stream filter {fname!r} not supported "
                "(FlateDecode only)"
            )
    return data


# ----------------------------------------------------- text extraction

_OP_RE = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]{1,16}")


def _extract_text(content: bytes, strict: bool) -> str:
    """Operand-stack scan of one content stream. Text-show ops emit;
    Td/TD/T*/Tm/ET arm a newline that the NEXT show op flushes — so
    each positioning move starts a fresh line, matching the writer's
    one-Td-per-line contract and the usual extractor behavior.
    Latin-1 byte decoding (module docstring: simple-font rule)."""
    i, n = 0, len(content)
    out: list[str] = []
    stack: list = []
    pending_nl = False
    size = 0
    ops = 0

    def emit(raw: bytes):
        nonlocal pending_nl, size
        if pending_nl and out:
            out.append("\n")
            size += 1
        pending_nl = False
        s = raw.decode("latin-1")
        out.append(s)
        size += len(s)
        if size > MAX_TEXT_CHARS:
            raise PdfError("extracted-text cap")

    while i < n:
        i = _skip_ws(content, i, n)
        if i >= n:
            break
        c = content[i]
        if c in (0x28, 0x5B) or content.startswith(b"<", i):
            try:
                v, i = _parse_value(content, i, n)
            except PdfError:
                if strict:
                    raise
                i += 1
                continue
            stack.append(v)
            continue
        if c == 0x2F:
            m = _NAME_RE.match(content, i)
            stack.append(("name", m.group()[1:].decode("latin-1")))
            i = m.end()
            continue
        m = _NUM_RE.match(content, i)
        if m:
            txt = m.group()
            stack.append(float(txt) if b"." in txt else int(txt))
            i = m.end()
            continue
        m = _OP_RE.match(content, i)
        if not m:
            if strict:
                raise PdfError(f"bad content token at {i}")
            i += 1
            continue
        op = m.group()
        i = m.end()
        ops += 1
        if ops > MAX_CONTENT_OPS:
            raise PdfError("content operator cap")
        if op == b"Tj":
            if stack and isinstance(stack[-1], bytes):
                emit(stack[-1])
            elif strict:
                raise PdfError("Tj without a string operand")
        elif op in (b"'", b'"'):
            pending_nl = True
            if stack and isinstance(stack[-1], bytes):
                emit(stack[-1])
            elif strict:
                raise PdfError("quote operator without a string operand")
        elif op == b"TJ":
            if stack and isinstance(stack[-1], list):
                for item in stack[-1]:
                    if isinstance(item, bytes):
                        emit(item)
                    elif (
                        isinstance(item, (int, float))
                        and item <= -TJ_SPACE_GAP
                        and out
                    ):
                        out.append(" ")
                        size += 1
            elif strict:
                raise PdfError("TJ without an array operand")
        elif op in (b"Td", b"TD", b"T*", b"Tm", b"ET"):
            pending_nl = True
        stack.clear()
    return "".join(out)


# --------------------------------------------------------------- decode

def decode_pdf_text(
    payload: bytes, strict: bool = False, max_pages: int = MAX_PAGES
) -> list[str]:
    """PDF bytes → per-page extracted text (list of strings, page
    order from the page tree). Strict mode raises PdfError /
    NotImplementedError on malformed input and gated features; lax
    mode extracts what it can (possibly ``[]``) and never raises on
    content problems — the 100 TB rule that one malformed blob must
    not kill a task."""
    if not payload.startswith(b"%PDF-"):
        raise PdfError("not a PDF (missing %PDF- header)")
    objs, order = _scan_objects(payload, strict)
    if strict:
        for num, (val, _st) in objs.items():
            if isinstance(val, dict) and val.get("Type") in (
                ("name", "ObjStm"),
                ("name", "XRef"),
            ):
                raise NotImplementedError(
                    "PDF 1.5 object/xref streams (/ObjStm, /XRef) "
                    "are not supported; classic xref PDFs only"
                )
    root = _find_root(payload, objs)  # raises on /Encrypt
    pages = _collect_pages(root, objs, strict) if root is not None else None
    if pages is None:
        if strict:
            raise PdfError("no page tree resolvable from /Root")
        # lax fallback 1: document-order /Type /Page objects
        pages = [
            objs[num][0]
            for num in order
            if isinstance(objs[num][0], dict)
            and objs[num][0].get("Type") == ("name", "Page")
        ]
    texts: list[str] = []
    if pages:
        def deref(v):
            seen = set()
            while isinstance(v, _Ref):
                if v.num in seen or len(seen) > 16:
                    return None
                seen.add(v.num)
                v = objs.get(v.num, (None, None))[0]
            return v

        for pg in pages[:max_pages]:
            contents = pg.get("Contents")
            refs = (
                contents if isinstance(contents, list) else [contents]
            )
            parts: list[bytes] = []
            for r in refs:
                sval, sdata = None, None
                if isinstance(r, _Ref) and r.num in objs:
                    sval, sdata = objs[r.num]
                if sdata is None:
                    if strict:
                        raise PdfError("page /Contents is not a stream")
                    continue
                try:
                    parts.append(_stream_data(sval, sdata, strict))
                except (PdfError, NotImplementedError):
                    if strict:
                        raise
            texts.append(_extract_text(b"\n".join(parts), strict))
        return texts
    # lax fallback 2: any stream whose decoded bytes hold a BT block
    for num in order:
        val, sdata = objs[num]
        if sdata is None or not isinstance(val, dict):
            continue
        try:
            data = _stream_data(val, sdata, strict=False)
        except (PdfError, NotImplementedError):
            continue
        if b"BT" in data:
            texts.append(_extract_text(data, strict=False))
    return texts


# ------------------------------------------------------ Spark surface

PDF_TEXT_SCHEMA = "media_id long, n_pages int, n_chars int, text string"


def pdf_text(
    media,
    id_col: str = "media_id",
    payload_col: str = "payload",
    strict: bool = False,
):
    """(id, payload) → (id, n_pages, n_chars, text) with pages joined
    by newline. One iterator mapInPandas crossing, row-local, no
    shuffle; in lax mode any per-payload failure yields the empty
    extraction (0 pages) instead of killing the task."""
    import pandas as pd

    src = media.select(
        media[id_col].alias("media_id"), media[payload_col].alias("payload")
    )

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            c_id, c_np, c_nc, c_tx = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    pages = decode_pdf_text(bytes(payload), strict=strict)
                except Exception:
                    if strict:
                        raise
                    pages = []
                text = "\n".join(pages)
                c_id.append(int(mid))
                c_np.append(len(pages))
                c_nc.append(len(text))
                c_tx.append(text)
            yield pd.DataFrame(
                {
                    "media_id": c_id,
                    "n_pages": c_np,
                    "n_chars": c_nc,
                    "text": c_tx,
                }
            )

    return src.mapInPandas(run, schema=PDF_TEXT_SCHEMA)


def synthesize_pdfs(spark, n_rows: int, partitions: int = 8):
    """Deterministic PDF corpus for the contract query: row ``i`` is
    a real classic PDF with ``1 + i % 3`` pages; page ``p`` carries
    the closed-form text

        'Doc {i} page {p}: ' + 'word ' * (1 + (i+p) % 4) + '(é)\\.'

    — parens, a backslash and a Latin-1 é so the escape machinery is
    exercised on EVERY row. The encoding rotates through the three
    writer variants (plain/hex/TJ) by ``i % 3`` and Flate-compresses
    even rows, so all reader paths land under one oracle that
    regenerates the text purely from the row id."""
    import pandas as pd

    base = spark.range(0, n_rows, 1, partitions)

    def gen(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            c_id, c_payload = [], []
            for i in pdf["id"]:
                i = int(i)
                pages = [
                    f"Doc {i} page {p}: "
                    + "word " * (1 + (i + p) % 4)
                    + "(\xe9)\\."
                    for p in range(1 + i % 3)
                ]
                variant = ("plain", "hex", "tj")[i % 3]
                c_id.append(i)
                c_payload.append(
                    encode_pdf(pages, variant=variant, compress=(i % 2 == 0))
                )
            yield pd.DataFrame({"media_id": c_id, "payload": c_payload})

    return base.mapInPandas(gen, schema="media_id long, payload binary")
