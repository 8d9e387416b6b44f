"""Baseline JPEG (ITU-T T.81 / JFIF) encode + decode in pure
stdlib + numpy — no Pillow/opencv (not installed in this sandbox).

Scope (the web-dominant baseline profile):

- decode: baseline sequential DCT, 8-bit, 1 or 3 components,
  arbitrary sampling factors h,v ∈ {1,2} (covers 4:4:4, 4:2:2,
  4:2:0), Huffman tables read from the stream's DHT segments,
  restart markers (DRI/RSTn), 0xFF00 byte unstuffing.  Progressive
  JPEG and arithmetic coding raise ``NotImplementedError`` (the
  feature path then falls back to the digest fake in lax mode).
- encode: used to synthesize REAL test payloads — 4:4:4 or 4:2:0,
  quality-scaled quantization, simple LEGAL canonical Huffman tables
  written into DHT (flat ~8-bit codes: poor compression, valid
  stream; any conformant decoder reads it), optional restart
  interval.

Everything is deterministic (pure function of the pixel array), so
features derived from decoded content are stable under task retry.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index i of the scan → (row, col) flat index
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# 8x8 DCT-II matrix: M[u, x] = alpha(u)/2 * cos((2x+1) u pi / 16)
_M = np.zeros((8, 8))
for _u in range(8):
    _a = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = 0.5 * _a * np.cos((2 * _x + 1) * _u * np.pi / 16)

# ITU-T T.81 Annex K.1 example luminance/chrominance quant tables
# (row-major), scaled by quality at encode time
_QY = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling; quality=100 → all-ones table
    (near-lossless: only DCT float rounding remains)."""
    q = min(max(int(quality), 1), 100)
    s = 5000 / q if q < 50 else 200 - 2 * q
    t = np.floor((base * s + 50) / 100)
    return np.clip(t, 1, 255)


# ------------------------------------------------------- Huffman


def _canonical_codes(bits: list[int], vals: list[int]):
    """BITS (count of codes per length 1..16) + HUFFVAL → canonical
    {symbol: (code, length)} (T.81 Annex C)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _flat_table(n_symbols: int):
    """A LEGAL canonical table covering symbols 0..n_symbols-1 with
    near-flat code lengths, never assigning the all-ones code (T.81
    forbids it so padding bits can't decode as a symbol).  For ≤255
    symbols everything fits at length ceil(log2(n+1)); the last
    symbol is pushed one level deeper to keep the all-ones slot
    free."""
    length = max(1, int(np.ceil(np.log2(n_symbols + 1))))
    bits = [0] * 16
    bits[length - 1] = n_symbols - 1
    bits[length] = 1  # one symbol a level deeper; all-ones unused
    vals = list(range(n_symbols))
    return bits, vals


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude(v: int, cat: int) -> int:
    # one's-complement style amplitude encoding (T.81 F.1.2.1)
    return v if v >= 0 else v + (1 << cat) - 1


# ------------------------------------------------------- encoder


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 92,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB (or (h, w) grayscale) → baseline JFIF
    bytes.  ``subsample=True`` writes 4:2:0 (Y at 2x2, Cb/Cr at 1x1),
    else 4:4:4.  ``restart_interval`` > 0 emits DRI + RSTn markers
    every that many MCUs."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if h == 0 or w == 0:
        raise ValueError(f"degenerate image dimensions {w}x{h}")
    qy = _scaled_quant(_QY, quality)
    qc = _scaled_quant(_QC, quality)

    if gray:
        planes = [pixels.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qtab = [qy]
        qid = [0]
    else:
        rgb = pixels.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            # box-filter 2x2 chroma downsample on an even-padded grid
            def down(p):
                ph = p.shape[0] + (p.shape[0] & 1)
                pw = p.shape[1] + (p.shape[1] & 1)
                full = np.empty((ph, pw))
                full[: p.shape[0], : p.shape[1]] = p
                if ph > p.shape[0]:
                    full[p.shape[0]:, : p.shape[1]] = p[-1:]
                if pw > p.shape[1]:
                    full[:, p.shape[1]:] = full[:, p.shape[1] - 1 : p.shape[1]]
                return (full[0::2, 0::2] + full[1::2, 0::2]
                        + full[0::2, 1::2] + full[1::2, 1::2]) / 4.0
            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1)] * 3
        qtab = [qy, qc, qc]
        qid = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # per-component padded planes sized to whole MCUs
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        pw, ph = mcux * 8 * sh, mcuy * 8 * sv
        full = np.zeros((ph, pw))
        ch, cw = p.shape
        full[:ch, :cw] = p
        if ph > ch:
            full[ch:, :cw] = p[-1:, :]
        if pw > cw:
            full[:, cw:] = full[:, cw - 1 : cw]
        padded.append(full)

    dc_bits, dc_vals = _flat_table(12)
    ac_bits, ac_vals = _flat_table(256)
    dc_codes = _canonical_codes(dc_bits, dc_vals)
    ac_codes = _canonical_codes(ac_bits, ac_vals)

    bw = _BitWriter()
    pred = [0] * len(planes)
    mcu_count = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (rst_n & 7)])
                rst_n += 1
                pred = [0] * len(planes)
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = p[y0 : y0 + 8, x0 : x0 + 8]
                        co = _M @ block @ _M.T
                        qz = np.round(
                            co.reshape(-1)[_ZIGZAG] / qtab[ci].reshape(-1)[_ZIGZAG]
                        ).astype(np.int64)
                        # DC
                        diff = int(qz[0]) - pred[ci]
                        pred[ci] = int(qz[0])
                        cat = _category(diff)
                        c, ln = dc_codes[cat]
                        bw.write(c, ln)
                        if cat:
                            bw.write(_amplitude(diff, cat), cat)
                        # AC run-length
                        run = 0
                        for k in range(1, 64):
                            v = int(qz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                c, ln = ac_codes[0xF0]  # ZRL
                                bw.write(c, ln)
                                run -= 16
                            cat = _category(v)
                            c, ln = ac_codes[(run << 4) | cat]
                            bw.write(c, ln)
                            bw.write(_amplitude(v, cat), cat)
                            run = 0
                        if run:
                            c, ln = ac_codes[0x00]  # EOB
                            bw.write(c, ln)
            mcu_count += 1
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(
        int(v) for v in qy.reshape(-1)[_ZIGZAG]
    ))
    if not gray:
        out += seg(0xDB, bytes([1]) + bytes(
            int(v) for v in qc.reshape(-1)[_ZIGZAG]
        ))
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, qid[ci]])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00])  # DC table 0 / AC table 0
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------- decoder


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self):
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: consumed by the caller via
                    # sync_restart(), not by the bit stream
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def sync_restart(self):
        """Consume an expected RSTn marker and resync to byte
        boundary.  The reader may not have buffered up to the marker
        yet (only pad bits precede it) — scan forward to it first."""
        self.acc = 0
        self.nbits = 0
        if self.marker is None:
            while self.pos + 1 < len(self.data):
                if (self.data[self.pos] == 0xFF
                        and self.data[self.pos + 1] != 0x00):
                    self.marker = self.data[self.pos + 1]
                    break
                self.pos += 1
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2
            self.marker = None


def _huff_decode(br: _BitReader, lut: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bits(1)
        sym = lut.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(payload: bytes, max_pixels: int = 1 << 24) -> np.ndarray:
    """Baseline JFIF bytes → (h, w, 3) uint8 RGB (grayscale is
    broadcast).  Raises ``NotImplementedError`` for progressive /
    arithmetic / 12-bit streams and ``ValueError`` for corrupt
    data.

    ``max_pixels`` (default 16M ≈ 4096²) bounds the declared SOF
    dimensions: this is a pure-Python MCU loop, and an adversarial
    2-KB payload declaring 65535×65535 would otherwise pin an
    executor for hours instead of failing fast (the decode cost is
    driven by the DECLARED size, not the payload size)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}  # (class, id) → (len,code)→sym
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    scan_pos = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                t = np.zeros(64)
                t[_ZIGZAG] = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8)
                qtabs[tq] = t.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                codes = _canonical_codes(bits, vals)
                htabs[(tc, th)] = {
                    (ln, code): sym for sym, (code, ln) in codes.items()
                }
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            for ci in range(nc):
                cid, hv, tq = seg[6 + ci * 3 : 9 + ci * 3]
                comps.append({
                    "id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq,
                })
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            for si in range(ns):
                cid, tabs = seg[1 + si * 2 : 3 + si * 2]
                for c in comps:
                    if c["id"] == cid:
                        c["dc"] = tabs >> 4
                        c["ac"] = tabs & 0xF
            scan_pos = pos
            break
        # else: APPn/COM — skipped
    if scan_pos is None or not comps or h == 0:
        raise ValueError("JPEG missing SOF/SOS")
    if h * w > max_pixels:
        # NotImplementedError, not ValueError: the payload may be a
        # perfectly valid large photo (24 MP cameras are common) — the
        # limitation is THIS decoder's pure-Python MCU loop, the same
        # class as "no codec for this format". Callers distinguish
        # too-large from corrupt; lax feature extraction falls back to
        # the digest fake either way, by policy.
        raise NotImplementedError(
            f"declared {w}x{h} exceeds max_pixels={max_pixels} for the "
            "pure-Python decoder; install a codec library or raise the cap"
        )
    for c in comps:
        if c["h"] not in (1, 2) or c["v"] not in (1, 2):
            raise NotImplementedError("sampling factors beyond 2x2")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"])) for c in comps
    ]

    br = _BitReader(payload, scan_pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.sync_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_lut = htabs[(0, c.get("dc", 0))]
                ac_lut = htabs[(1, c.get("ac", 0))]
                q = qtabs[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64)
                        cat = _huff_decode(br, dc_lut)
                        diff = _extend(br.bits(cat), cat) if cat else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, ac_lut)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            cat = rs & 0xF
                            if k > 63:
                                raise ValueError("AC index out of range")
                            zz[k] = _extend(br.bits(cat), cat)
                            k += 1
                        co = np.zeros(64)
                        co[_ZIGZAG] = zz
                        block = _M.T @ (co.reshape(8, 8) * q) @ _M
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    # upsample to full resolution by replication, crop, color-convert
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w] + 128.0)
    if len(full) == 1:
        ch = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(ch[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.round(np.stack([r, g, b], axis=2)), 0, 255
    ).astype(np.uint8)
