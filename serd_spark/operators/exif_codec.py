"""EXIF metadata encode/parse — TIFF 6.0 IFD structures inside a
JPEG APP1 segment (the universal photo-metadata container on the
web; public specs: TIFF 6.0, EXIF 2.3, JPEG ITU-T T.81 marker
layout).

Both directions are implemented so the engine can certify itself:
``encode_exif_app1`` builds a real APP1 payload (either byte order),
``inject_app1`` splices it into a JPEG after SOI, and ``parse_exif``
walks JPEG segments, finds the Exif APP1, and decodes the IFD chain
(IFD0 → Exif sub-IFD) back to tag/value rows.

House decode rules (CLAUDE.md: bound work by DECLARED size BEFORE
looping): segment walking is bounded by the buffer; IFD entry counts
are capped (``MAX_ENTRIES``); the IFD chain follows at most
``MAX_IFDS`` tables with an offset-visited set (no pointer cycles);
ASCII/numeric value reads are capped; every offset is validated
against the TIFF block before any slice. Malformed structure stops
the parse and returns what was already collected (lax, like the
image probes) — it never throws from adversarial bytes and never
loops past the caps.
"""

from __future__ import annotations

import struct

MAX_ENTRIES = 64      # per IFD
MAX_IFDS = 4          # IFD0 + Exif + GPS + thumbnail is the real max
MAX_ASCII = 256       # bytes per ASCII value
MAX_COUNT = 64        # elements per numeric value

# type id → element size (TIFF 6.0 §2)
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}

EXIF_IFD_TAG = 0x8769

TAG_NAMES = {
    0x010F: "Make",
    0x0110: "Model",
    0x0112: "Orientation",
    0x011A: "XResolution",
    0x0128: "ResolutionUnit",
    0x0132: "DateTime",
    EXIF_IFD_TAG: "ExifIFD",
    0x829A: "ExposureTime",
    0x8827: "ISOSpeedRatings",
    0xA002: "PixelXDimension",
    0xA003: "PixelYDimension",
}


def _encode_value(typ: int, val, order: str) -> tuple[bytes, int]:
    """→ (raw bytes, element count)."""
    if typ == 2:  # ASCII, NUL-terminated
        raw = str(val).encode("ascii") + b"\0"
        return raw, len(raw)
    if typ == 3:
        return struct.pack(order + "H", int(val)), 1
    if typ == 4:
        return struct.pack(order + "I", int(val)), 1
    if typ == 5:
        num, den = val
        return struct.pack(order + "II", int(num), int(den)), 1
    raise ValueError(f"unsupported encode type {typ}")


def _pack_ifd(entries, ifd_offset: int, order: str) -> bytes:
    """Serialize one IFD at absolute TIFF offset ``ifd_offset``:
    count, 12-byte entries sorted by tag (TIFF requires ascending
    order), zero next-IFD pointer, then the overflow data area."""
    n = len(entries)
    data_start = ifd_offset + 2 + 12 * n + 4
    body = struct.pack(order + "H", n)
    data = b""
    for tag, typ, val in sorted(entries):
        raw, count = _encode_value(typ, val, order)
        if len(raw) <= 4:
            field = raw.ljust(4, b"\0")
        else:
            field = struct.pack(order + "I", data_start + len(data))
            data += raw
        body += struct.pack(order + "HHI", tag, typ, count) + field
    body += struct.pack(order + "I", 0)
    return body + data


def encode_exif_app1(
    ifd0_entries, exif_entries=(), little_endian: bool = True
) -> bytes:
    """Build a complete APP1 segment (marker + length + "Exif\\0\\0"
    + TIFF block). ``entries`` are (tag, type, value) with value str
    for ASCII, int for SHORT/LONG, (num, den) for RATIONAL."""
    order = "<" if little_endian else ">"
    tiff = (b"II" if little_endian else b"MM") + struct.pack(
        order + "HI", 42, 8
    )
    entries0 = list(ifd0_entries)
    if exif_entries:
        # two-pass: the pointer is a fixed-size LONG, so packing with
        # a placeholder yields the true IFD0 size and thus the target
        placeholder = entries0 + [(EXIF_IFD_TAG, 4, 0)]
        exif_off = 8 + len(_pack_ifd(placeholder, 8, order))
        entries0.append((EXIF_IFD_TAG, 4, exif_off))
        block = _pack_ifd(entries0, 8, order) + _pack_ifd(
            list(exif_entries), exif_off, order
        )
    else:
        block = _pack_ifd(entries0, 8, order)
    payload = b"Exif\0\0" + tiff + block
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def inject_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment right after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    return jpeg[:2] + app1 + jpeg[2:]


def _format_values(typ: int, raw: bytes, count: int, order: str) -> str:
    if typ == 2:
        return raw.split(b"\0", 1)[0].decode("ascii", errors="replace")
    fmt = {1: "B", 3: "H", 4: "I", 7: "B", 9: "i"}.get(typ)
    if fmt is not None:
        vals = struct.unpack(order + fmt * count, raw)
        return ",".join(str(v) for v in vals)
    # RATIONAL / SRATIONAL
    sub = "I" if typ == 5 else "i"
    vals = struct.unpack(order + sub * (2 * count), raw)
    return ",".join(
        f"{vals[2 * i]}/{vals[2 * i + 1]}" for i in range(count)
    )


def parse_tiff_ifds(tiff: bytes) -> list[tuple[str, int, str, str]]:
    """Parse a TIFF block → [(ifd, tag, name, value_str)]. Lax and
    bounded: structural violations stop the walk."""
    out: list[tuple[str, int, str, str]] = []
    if len(tiff) < 8 or tiff[:2] not in (b"II", b"MM"):
        return out
    order = "<" if tiff[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack(order + "HI", tiff[2:8])
    if magic != 42:
        return out
    # (offset, label) worklist; visited set breaks pointer cycles
    todo: list[tuple[int, str]] = [(ifd_off, "ifd0")]
    visited: set[int] = set()
    while todo and len(visited) < MAX_IFDS:
        off, label = todo.pop(0)
        if off in visited or off < 8 or off + 2 > len(tiff):
            continue
        visited.add(off)
        (n,) = struct.unpack(order + "H", tiff[off:off + 2])
        if n > MAX_ENTRIES or off + 2 + 12 * n > len(tiff):
            continue
        for k in range(n):
            e = off + 2 + 12 * k
            tag, typ, count = struct.unpack(
                order + "HHI", tiff[e:e + 8]
            )
            size = _TYPE_SIZE.get(typ)
            if size is None:
                continue
            if typ == 2:
                if count > MAX_ASCII:
                    continue
            elif count > MAX_COUNT:
                continue
            nbytes = size * count
            if nbytes <= 4:
                raw = tiff[e + 8:e + 8 + nbytes]
            else:
                (voff,) = struct.unpack(
                    order + "I", tiff[e + 8:e + 12]
                )
                if voff + nbytes > len(tiff):
                    continue
                raw = tiff[voff:voff + nbytes]
            # count must be exactly 1 for the sub-IFD pointer: a
            # fuzzed count=0 entry leaves raw empty and the unpack
            # would throw (hypothesis-found, round 5)
            if tag == EXIF_IFD_TAG and typ == 4 and count == 1:
                (sub,) = struct.unpack(order + "I", raw)
                todo.append((sub, "exif"))
                continue
            name = TAG_NAMES.get(tag, f"0x{tag:04X}")
            out.append(
                (label, tag, name, _format_values(typ, raw, count, order))
            )
    return out


def parse_exif(jpeg: bytes) -> list[tuple[str, int, str, str]]:
    """Find the Exif APP1 in a JPEG and parse its IFDs. Bounded
    segment walk; returns [] when there is no Exif segment or the
    bytes are not a JPEG."""
    if len(jpeg) < 4 or jpeg[:2] != b"\xff\xd8":
        return []
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            return []
        marker = jpeg[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA or marker == 0xD9:  # SOS/EOI: no APP1 later
            return []
        (seglen,) = struct.unpack(">H", jpeg[pos + 2:pos + 4])
        if seglen < 2 or pos + 2 + seglen > len(jpeg):
            return []
        if marker == 0xE1 and jpeg[pos + 4:pos + 10] == b"Exif\0\0":
            return parse_tiff_ifds(jpeg[pos + 10:pos + 2 + seglen])
        pos += 2 + seglen
    return []
