"""MIME-type and charset sniffing over raw response bytes.

A crawl pipeline sees Content-Type lies constantly (servers label PNGs
``text/html``, ship UTF-8 as ``iso-8859-1``, omit charset entirely), so
the ingest layer must decide format and encoding from the BYTES — the
same role serd's syntax guessing plays for RDF input (upstream
serdi.c#choose_syntax picks a parser from content when the caller gives
no hint), widened to the web-payload container set this engine ingests.

Design: the entire sniff is ONE pure-JVM expression tree
(WholeStageCodegen — `hex(substring(...))` magic-number probes,
`is_valid_utf8` for encoding validity, `regexp_extract` over a
lossy-but-safe binary→string cast for the HTML meta / XML encoding
declarations). Zero Python crossings, no shuffle: at 100 TB this is a
map-only pass fused into the scan. Measured facts this builds on (see
CLAUDE.md): ANSI-mode `decode()` THROWS on invalid UTF-8 so it is never
used here; `cast(binary as string)` replaces invalid sequences with
U+FFFD without throwing, and ASCII-compatible markup (tags, meta
charset names) survives that cast byte-exactly, which is precisely the
property HTML charset sniffing needs (the WHATWG prescan is defined
over ASCII bytes for the same reason).

Certificate shape (mm_probe pattern): `synthesize_responses` declares
ground-truth (mime, charset) per row and then RENDERS payload bytes to
match; the Spark query recovers both from the bytes alone while the
DuckDB oracle aggregates the declared columns, which never touched a
payload byte — a value-hash match proves the sniffer reproduces the
generator's ground truth over every variant.
"""
from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "sniff_mime",
    "sniff_charset",
    "sniff_responses",
    "synthesize_responses",
    "transcode_text",
]

# Magic-number table: (hex-prefix, mime). Ordered longest-first so a
# `when` chain can test in sequence without overlap ambiguity.
_MAGIC = [
    ("474946383761", "image/gif"),   # GIF87a
    ("474946383961", "image/gif"),   # GIF89a
    ("89504E47", "image/png"),
    ("504B0304", "application/zip"),
    ("25504446", "application/pdf"),  # %PDF
    ("FFD8FF", "image/jpeg"),
    ("1F8B", "application/gzip"),
]

_BINARY_MIMES = (
    "image/png image/jpeg image/gif image/webp image/bmp audio/wav "
    "video/mp4 application/pdf application/gzip application/zip "
    "application/octet-stream"
).split()


def _hexpfx(payload: Column, n: int) -> Column:
    return F.hex(F.substring(payload, 1, n))


def sniff_mime(payload: Column) -> Column:
    """Pure-JVM MIME sniff of a binary column.

    Magic numbers first (container formats), then RIFF/ftyp envelope
    dispatch, then text probes on the lossy string cast: HTML tag,
    XML declaration, JSON bracket, UTF-16 BOMs, UTF-8 validity.
    Anything that is neither a known container nor decodable text is
    ``application/octet-stream``.
    """
    # Text view: BOM-stripped, lossy-cast, left-trimmed. The U+FEFF
    # that a UTF-8 BOM casts to is not markup; strip bytes up front so
    # `^<` anchors work.
    body = F.when(
        _hexpfx(payload, 3) == "EFBBBF",
        F.substring(payload, 4, 2147483000),
    ).otherwise(payload)
    # NOT ltrim'd: Spark ltrim strips only U+0020, so the probes carry
    # their own `^\s*` anchors (rlike is a find — `^` is required).
    s = body.cast("string")
    # WHATWG "binary data byte" table: C0 controls minus \t\n\f\r\x1b.
    # These are valid single-byte UTF-8, so they survive the lossy
    # cast byte-exactly even inside otherwise-invalid payloads.
    has_ctl = s.rlike("[\\x00-\\x08\\x0B\\x0E-\\x1A\\x1C-\\x1F]")

    expr = None
    for pfx, mime in _MAGIC:
        cond = _hexpfx(payload, len(pfx) // 2) == pfx
        expr = F.when(cond, mime) if expr is None else expr.when(cond, mime)
    riff_tag = F.substring(payload, 9, 4).cast("string")
    expr = (
        expr.when(
            (_hexpfx(payload, 4) == "52494646") & (riff_tag == "WEBP"),
            "image/webp",
        )
        .when(
            (_hexpfx(payload, 4) == "52494646") & (riff_tag == "WAVE"),
            "audio/wav",
        )
        .when(_hexpfx(payload, 2) == "424D", "image/bmp")
        # ISO-BMFF: box size (4 bytes) then 'ftyp' — ASCII-safe compare
        .when(F.substring(payload, 5, 4).cast("string") == "ftyp",
              "video/mp4")
        # WHATWG-style ASCII prescan: tags survive the lossy cast even
        # when the document body is not valid UTF-8 (latin-1 pages).
        .when(
            s.rlike(r"(?i)^\s*(<!doctype\s+html|<html[\s>])"), "text/html"
        )
        .when(s.rlike(r"^\s*<\?xml[\s?]"), "application/xml")
        # UTF-16 text: BOM then NUL-interleaved ASCII; the lossy cast
        # cannot see into it, so classify by BOM alone.
        .when(_hexpfx(payload, 2).isin("FFFE", "FEFF"), "text/plain")
        .when(
            F.is_valid_utf8(body) & s.rlike(r"^\s*[\[{]"),
            "application/json",
        )
        .when(F.is_valid_utf8(body), "text/plain")
        # Invalid UTF-8 but free of WHATWG binary bytes: legacy
        # single-byte text (latin-1 et al.), not opaque binary.
        .when(~has_ctl, "text/plain")
        .otherwise("application/octet-stream")
    )
    return expr


def sniff_charset(payload: Column, mime: Column) -> Column:
    """Charset decision for a sniffed payload: BOMs win, then an
    in-document declaration (HTML ``<meta charset=…>`` / XML
    ``encoding="…"`` — both pure ASCII, so readable through the lossy
    cast regardless of body encoding), then UTF-8 validity, then the
    WHATWG fallback windows-1252. Binary MIMEs get the literal
    ``'binary'`` so the column is total (never null) and groupable."""
    s = payload.cast("string")
    meta = F.lower(
        F.regexp_extract(
            s, r"(?i)<meta\s+charset\s*=\s*['\"]?([A-Za-z0-9._-]+)", 1
        )
    )
    xml_enc = F.lower(
        F.regexp_extract(
            s, r"(?i)^<\?xml[^>]*encoding\s*=\s*['\"]([A-Za-z0-9._-]+)", 1
        )
    )
    return (
        F.when(mime.isin(_BINARY_MIMES), "binary")
        .when(_hexpfx(payload, 3) == "EFBBBF", "utf-8")
        .when(_hexpfx(payload, 2) == "FFFE", "utf-16le")
        .when(_hexpfx(payload, 2) == "FEFF", "utf-16be")
        .when(meta != "", meta)
        .when(xml_enc != "", xml_enc)
        .when(F.is_valid_utf8(payload), "utf-8")
        .otherwise("windows-1252")
    )


def transcode_text(payload: Column, charset: Column) -> Column:
    """Recover the decoded CHARACTER text from payload bytes given a
    sniffed charset — the step that makes "byte-identical extracted
    text per url" hold for non-UTF-8 pages instead of silently
    mangling them through the lossy cast.

    Pure JVM, and TOTAL (never throws under ANSI, which is what makes
    it safe in a 100 TB scan): every branch decodes only inputs its
    Java charset accepts without error —

      utf-16le/be : Java's UTF-16 decoder consumes the BOM and picks
                    the endianness from it (measured); guarded on
                    even byte length so a truncated payload falls
                    through instead of throwing
      utf-8       : guarded on ``is_valid_utf8`` of the BOM-stripped
                    body (ANSI ``decode`` throws on invalid UTF-8 —
                    CLAUDE.md)
      everything else (iso-8859-*, windows-125x, unknown labels,
      invalid-UTF-8 fallbacks): ISO-8859-1, a bijection on bytes —
                    total by construction. For true windows-1252 text
                    the C1 range 0x80–0x9F maps to control chars
                    instead of cp1252 glyphs; documented divergence
                    (the byte content is preserved 1:1, so a later
                    exact pass can re-map — nothing is lost).

    Binary charsets ('binary') return NULL.
    """
    body = F.when(
        _hexpfx(payload, 3) == "EFBBBF",
        F.substring(payload, 4, 2147483000),
    ).otherwise(payload)
    even = F.length(payload) % 2 == 0
    return (
        F.when(charset == "binary", F.lit(None).cast("string"))
        .when(
            charset.isin("utf-16le", "utf-16be") & even,
            F.decode(payload, "UTF-16"),
        )
        .when(
            (charset == "utf-8") & F.is_valid_utf8(body),
            F.decode(body, "UTF-8"),
        )
        .otherwise(F.decode(body, "ISO-8859-1"))
    )


def sniff_responses(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Append ``sniffed_mime`` and ``sniffed_charset`` columns. One
    map-only projection, whole-stage-codegen end to end."""
    p = F.col(payload_col)
    mime = sniff_mime(p)
    return df.withColumn("sniffed_mime", mime).withColumn(
        "sniffed_charset", sniff_charset(p, F.col("sniffed_mime"))
    )


# ---------------------------------------------------------------------
# Deterministic ground-truth generator (certificate input)
# ---------------------------------------------------------------------

_N_VARIANTS = 18


def _render(i: int, seed: int) -> tuple[bytes, str, str, str | None]:
    """Payload bytes + declared (mime, charset, text) for row ``i`` —
    a pure function of (seed, i), one variant per residue class mod
    18. ``text`` is the decoded-character ground truth (BOM excluded)
    for text variants, None for binary ones — the transcode
    certificate's per-row target."""
    v = i % _N_VARIANTS
    digest = hashlib.blake2b(
        f"{seed}:sniff:{i}".encode(), digest_size=32
    ).digest()
    tok = digest.hex()[:12]
    filler = (digest * 4)[: 48 + i % 32]
    if v == 0:  # plain UTF-8 HTML, no declaration
        t = f"<html><body>doc {i} {tok} élève</body></html>"
        return t.encode("utf-8"), "text/html", "utf-8", t
    if v == 1:  # latin-1 HTML with meta charset (body NOT valid UTF-8)
        t = f"<html><meta charset=iso-8859-1>café {tok}</html>"
        return t.encode("iso-8859-1"), "text/html", "iso-8859-1", t
    if v == 2:  # BOM'd UTF-8 HTML with doctype and leading whitespace
        t = f"  <!DOCTYPE html>\n<html>{tok}</html>"
        return (b"\xef\xbb\xbf" + t.encode("utf-8"),
                "text/html", "utf-8", t)
    if v == 3:  # XML with encoding declaration
        t = f'<?xml version="1.0" encoding="UTF-8"?><r id="{i}">{tok}</r>'
        return t.encode("utf-8"), "application/xml", "utf-8", t
    if v == 4:  # JSON object
        t = f'{{"id": {i}, "tok": "{tok}"}}'
        return t.encode("utf-8"), "application/json", "utf-8", t
    if v == 5:  # JSON array
        t = f'[{i}, "{tok}"]'
        return t.encode("utf-8"), "application/json", "utf-8", t
    if v == 6:  # plain UTF-8 text (multibyte, no markup)
        t = f"plain text {i} {tok} 中文 ü"
        return t.encode("utf-8"), "text/plain", "utf-8", t
    if v == 7:  # UTF-16LE text with BOM
        t = f"utf16 doc {i} {tok}"
        return (b"\xff\xfe" + t.encode("utf-16-le"),
                "text/plain", "utf-16le", t)
    if v == 8:  # UTF-16BE text with BOM
        t = f"utf16 doc {i} {tok}"
        return (b"\xfe\xff" + t.encode("utf-16-be"),
                "text/plain", "utf-16be", t)
    if v == 9:
        return b"\x89PNG\r\n\x1a\n" + filler, "image/png", "binary", None
    if v == 10:
        return b"\xff\xd8\xff\xe0\x00\x10JFIF" + filler, \
            "image/jpeg", "binary", None
    if v == 11:
        return b"GIF89a" + filler, "image/gif", "binary", None
    if v == 12:
        return (b"RIFF" + len(filler).to_bytes(4, "little") + b"WEBPVP8 "
                + filler, "image/webp", "binary", None)
    if v == 13:
        return (b"RIFF" + len(filler).to_bytes(4, "little") + b"WAVEfmt "
                + filler, "audio/wav", "binary", None)
    if v == 14:
        return ((len(filler) + 8).to_bytes(4, "big") + b"ftypisom"
                + filler, "video/mp4", "binary", None)
    if v == 15:
        return b"%PDF-1.4\n" + filler, "application/pdf", "binary", None
    if v == 16:
        return b"\x1f\x8b\x08\x00" + filler, "application/gzip", "binary", None
    # v == 17: opaque bytes, guaranteed invalid UTF-8 and magic-free
    # (0xC0 is never a valid UTF-8 lead byte for what follows).
    return b"\xc0\x11" + filler, "application/octet-stream", "binary", None


def synthesize_responses(
    spark, n_rows: int, seed: int = 42, partitions: int = 8
) -> DataFrame:
    """Deterministic web-response table: (resp_id, payload, mime,
    charset, text) where mime/charset/text are the generator's
    DECLARED ground truth and payload is rendered to match (text is
    the decoded-character content for text variants, NULL for binary
    ones). 18 variants spanning every branch of the sniffer,
    including the adversarial ones (latin-1 body behind an ASCII meta
    tag, BOM before doctype, magic-free binary)."""
    base = spark.range(0, n_rows, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            c_id, c_payload, c_mime, c_charset, c_text = [], [], [], [], []
            for i in pdf["id"]:
                i = int(i)
                payload, mime, charset, text = _render(i, seed)
                c_id.append(i)
                c_payload.append(payload)
                c_mime.append(mime)
                c_charset.append(charset)
                c_text.append(text)
            yield pd.DataFrame(
                {
                    "resp_id": pd.Series(c_id, dtype="int64"),
                    "payload": pd.Series(c_payload, dtype=object),
                    "mime": pd.Series(c_mime, dtype=object),
                    "charset": pd.Series(c_charset, dtype=object),
                    "text": pd.Series(c_text, dtype=object),
                }
            )

    return base.mapInPandas(
        gen,
        schema=(
            "resp_id long, payload binary, mime string, charset string, "
            "text string"
        ),
    )
