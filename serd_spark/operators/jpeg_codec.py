"""JPEG (ITU-T T.81 / JFIF) encode + decode in pure stdlib + numpy —
no Pillow/opencv (not installed in this sandbox).

Scope (the two web-dominant Huffman profiles):

- decode: baseline sequential DCT (SOF0/1) AND progressive DCT
  (SOF2: spectral selection, successive approximation, EOB runs —
  T.81 Annex G), 8-bit, 1 or 3 components, arbitrary sampling
  factors h,v ∈ {1,2} (covers 4:4:4, 4:2:2, 4:2:0), Huffman tables
  read from the stream's DHT segments (including between scans),
  restart markers (DRI/RSTn), 0xFF00 byte unstuffing.  Hierarchical
  / lossless / arithmetic profiles raise ``NotImplementedError``
  (the feature path then falls back to the digest fake in lax mode).
- encode: used to synthesize REAL test payloads — baseline
  (``encode_jpeg``) and progressive (``encode_jpeg_progressive``,
  band-split + bit-plane-split scans), 4:4:4 or 4:2:0,
  quality-scaled quantization, simple LEGAL canonical Huffman tables
  written into DHT (flat ~8-bit codes: poor compression, valid
  stream; any conformant decoder reads it), optional restart
  interval.  Both encoders quantize identically, so
  ``decode(encode_progressive(px)) == decode(encode(px))``
  bit-for-bit — the equality the tests pin.

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


def _plane_setup(pixels: np.ndarray, quality: int, subsample: bool):
    """Shared encoder front half: RGB→YCbCr (optionally 4:2:0), MCU
    padding, quality-scaled quant tables. Returns (padded planes,
    samp, qtab, qid, gray, h, w, mcux, mcuy)."""
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
    return padded, samp, qtab, qid, gray, h, w, mcux, mcuy


def _headers(
    samp, qtab, qid, gray, h, w, sof_marker: int,
    dc_tbl, ac_tbl, restart_interval: int = 0,
) -> bytearray:
    """SOI..DHT header common to the baseline and progressive
    encoders; ``sof_marker`` selects 0xC0 (baseline) / 0xC2
    (progressive)."""
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    dc_bits, dc_vals = dc_tbl
    ac_bits, ac_vals = ac_tbl
    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(
        int(v) for v in qtab[0].reshape(-1)[_ZIGZAG]
    ))
    if not gray:
        out += seg(0xDB, bytes([1]) + bytes(
            int(v) for v in qtab[1].reshape(-1)[_ZIGZAG]
        ))
    sof = struct.pack(">BHHB", 8, h, w, len(samp))
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, qid[ci]])
    out += seg(sof_marker, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    return out


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
    padded, samp, qtab, qid, gray, h, w, mcux, mcuy = _plane_setup(
        pixels, quality, subsample
    )
    dc_bits, dc_vals = _flat_table(12)
    ac_bits, ac_vals = _flat_table(256)
    dc_codes = _canonical_codes(dc_bits, dc_vals)
    ac_codes = _canonical_codes(ac_bits, ac_vals)

    bw = _BitWriter()
    pred = [0] * len(padded)
    mcu_count = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (rst_n & 7)])
                rst_n += 1
                pred = [0] * len(padded)
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

    out = _headers(samp, qtab, qid, gray, h, w, 0xC0,
                   (dc_bits, dc_vals), (ac_bits, ac_vals),
                   restart_interval)
    sos = bytes([len(padded)])
    for ci in range(len(padded)):
        sos += bytes([ci + 1, 0x00])  # DC table 0 / AC table 0
    sos += bytes([0, 63, 0])
    out += struct.pack(">BBH", 0xFF, 0xDA, len(sos) + 2) + sos
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _coef_blocks(padded, samp, qtab):
    """Quantized zigzag DCT coefficients per component:
    (blocks_y, blocks_x, 64) int64 arrays over the MCU-padded
    planes."""
    out = []
    for p, (sh, sv), q in zip(padded, samp, qtab):
        nby, nbx = p.shape[0] // 8, p.shape[1] // 8
        qz = q.reshape(-1)[_ZIGZAG]
        arr = np.zeros((nby, nbx, 64), dtype=np.int64)
        for by in range(nby):
            for bx in range(nbx):
                co = _M @ p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] @ _M.T
                arr[by, bx] = np.round(co.reshape(-1)[_ZIGZAG] / qz)
        out.append(arr)
    return out


def _comp_block_dims(sh: int, sv: int, w: int, h: int,
                     hmax: int, vmax: int) -> tuple[int, int]:
    """Block grid of ONE component in a NON-interleaved scan (T.81
    A.2.2): ceil over the component's own sample dimensions — smaller
    than the MCU-padded grid when sampling factors differ."""
    cw = (w * sh + hmax - 1) // hmax
    ch = (h * sv + vmax - 1) // vmax
    return (cw + 7) // 8, (ch + 7) // 8


def _flush_eobrun(bwr: _BitWriter, ac_codes, st: dict) -> None:
    """Emit a pending EOB-run symbol plus any correction bits
    buffered across the run (T.81 G.1.2.2 / G.1.2.3)."""
    n = st["eob"]
    if n:
        nb = n.bit_length() - 1
        c, ln = ac_codes[nb << 4]
        bwr.write(c, ln)
        if nb:
            bwr.write(n - (1 << nb), nb)
        st["eob"] = 0
        for b in st["pend"]:
            bwr.write(b, 1)
        st["pend"] = []


def _enc_ac_first(bwr, ac_codes, blk, ss, se, al, st) -> None:
    """First AC scan of a band at point transform ``al``: baseline
    run/size coding of ``sign·(|coef|>>al)`` plus cross-block
    EOB runs."""
    r = 0
    for k in range(ss, se + 1):
        v = int(blk[k])
        v = (abs(v) >> al) * (1 if v >= 0 else -1)
        if v == 0:
            r += 1
            continue
        _flush_eobrun(bwr, ac_codes, st)
        while r > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            bwr.write(c, ln)
            r -= 16
        cat = _category(v)
        c, ln = ac_codes[(r << 4) | cat]
        bwr.write(c, ln)
        bwr.write(_amplitude(v, cat), cat)
        r = 0
    if r:
        st["eob"] += 1
        if st["eob"] == 0x7FFF:
            _flush_eobrun(bwr, ac_codes, st)


def _enc_ac_refine(bwr, ac_codes, blk, ss, se, al, st) -> None:
    """AC refinement scan (Ah=al+1 → Al=al): one correction bit per
    already-nonzero coefficient, run/sign coding for newly-nonzero
    ones, correction bits buffered until the next emitted symbol
    (T.81 G.1.2.3 semantics)."""
    absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
    eob_k = ss - 1  # position of the LAST newly-nonzero coefficient
    for k in range(ss, se + 1):
        if absv[k - ss] == 1:
            eob_k = k
    r = 0
    bits: list[int] = []
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob_k:
            _flush_eobrun(bwr, ac_codes, st)
            c, ln = ac_codes[0xF0]
            bwr.write(c, ln)
            r -= 16
            for b in bits:
                bwr.write(b, 1)
            bits = []
        if t > 1:  # history coefficient: buffer its correction bit
            bits.append(t & 1)
            continue
        _flush_eobrun(bwr, ac_codes, st)
        c, ln = ac_codes[(r << 4) | 1]
        bwr.write(c, ln)
        bwr.write(1 if int(blk[k]) > 0 else 0, 1)
        r = 0
        for b in bits:
            bwr.write(b, 1)
        bits = []
    if r > 0 or bits:
        st["eob"] += 1
        st["pend"].extend(bits)
        if st["eob"] == 0x7FFF:
            _flush_eobrun(bwr, ac_codes, st)


def encode_jpeg_progressive(
    pixels: np.ndarray,
    quality: int = 92,
    subsample: bool = False,
    bands: tuple = ((1, 5), (6, 63)),
    dc_al: int = 1,
    ac_al: int = 1,
) -> bytes:
    """(h, w, 3) uint8 RGB (or (h, w) grayscale) → PROGRESSIVE
    (SOF2) JFIF bytes with both progressive mechanisms exercised:
    spectral selection (``bands`` splits the AC spectrum across
    scans) and successive approximation (DC sent at ``Al=dc_al``
    then bit-refined; AC at ``Al=ac_al`` then bit-refined).  The
    quantized coefficients are identical to ``encode_jpeg``'s for
    the same (pixels, quality, subsample), so a correct decoder
    reconstructs bit-identical output for both encodings."""
    padded, samp, qtab, qid, gray, h, w, mcux, mcuy = _plane_setup(
        pixels, quality, subsample
    )
    coefs = _coef_blocks(padded, samp, qtab)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    dc_bits, dc_vals = _flat_table(12)
    ac_bits, ac_vals = _flat_table(256)
    dc_codes = _canonical_codes(dc_bits, dc_vals)
    ac_codes = _canonical_codes(ac_bits, ac_vals)
    out = _headers(samp, qtab, qid, gray, h, w, 0xC2,
                   (dc_bits, dc_vals), (ac_bits, ac_vals))

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int,
            body: bytes) -> bytes:
        seg = bytes([len(comp_ids)])
        for cid in comp_ids:
            seg += bytes([cid, 0x00])
        seg += bytes([ss, se, (ah << 4) | al])
        return (struct.pack(">BBH", 0xFF, 0xDA, len(seg) + 2) + seg + body)

    all_ids = [ci + 1 for ci in range(len(padded))]

    # scan 1: DC first, interleaved, point transform dc_al
    bwr = _BitWriter()
    pred = [0] * len(padded)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        dc = int(coefs[ci][my * sv + by, mx * sh + bx, 0])
                        diff = (dc >> dc_al) - pred[ci]
                        pred[ci] = dc >> dc_al
                        cat = _category(diff)
                        c, ln = dc_codes[cat]
                        bwr.write(c, ln)
                        if cat:
                            bwr.write(_amplitude(diff, cat), cat)
    bwr.flush()
    out += sos(all_ids, 0, 0, 0, dc_al, bytes(bwr.out))

    # DC refinement scans: one raw bit per block per level
    for al in range(dc_al - 1, -1, -1):
        bwr = _BitWriter()
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (sh, sv) in enumerate(samp):
                    for by in range(sv):
                        for bx in range(sh):
                            dc = int(coefs[ci][my * sv + by, mx * sh + bx, 0])
                            bwr.write((dc >> al) & 1, 1)
        bwr.flush()
        out += sos(all_ids, 0, 0, al + 1, al, bytes(bwr.out))

    # AC scans: per band, per component, first then refinements
    # (non-interleaved — one component per scan, T.81 requirement)
    for ss, se in bands:
        for ci, (sh, sv) in enumerate(samp):
            nbx, nby = _comp_block_dims(sh, sv, w, h, hmax, vmax)
            bwr = _BitWriter()
            st = {"eob": 0, "pend": []}
            for by in range(nby):
                for bx in range(nbx):
                    _enc_ac_first(bwr, ac_codes, coefs[ci][by, bx],
                                  ss, se, ac_al, st)
            _flush_eobrun(bwr, ac_codes, st)
            bwr.flush()
            out += sos([ci + 1], ss, se, 0, ac_al, bytes(bwr.out))
    for al in range(ac_al - 1, -1, -1):
        for ss, se in bands:
            for ci, (sh, sv) in enumerate(samp):
                nbx, nby = _comp_block_dims(sh, sv, w, h, hmax, vmax)
                bwr = _BitWriter()
                st = {"eob": 0, "pend": []}
                for by in range(nby):
                    for bx in range(nbx):
                        _enc_ac_refine(bwr, ac_codes, coefs[ci][by, bx],
                                       ss, se, al, st)
                _flush_eobrun(bwr, ac_codes, st)
                bwr.flush()
                out += sos([ci + 1], ss, se, al + 1, al, bytes(bwr.out))
    out += b"\xff\xd9"
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


def _dec_ac_first(br: _BitReader, lut: dict, blk: np.ndarray,
                  ss: int, se: int, al: int, eobrun: int) -> int:
    """First AC scan of one block's band; returns the remaining
    EOB run (blocks to skip)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(br, lut)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.bits(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("AC index outside spectral band")
        blk[k] = _extend(br.bits(s), s) * (1 << al)
        k += 1
    return 0


def _dec_ac_refine(br: _BitReader, lut: dict, blk: np.ndarray,
                   ss: int, se: int, p1: int, m1: int,
                   eobrun: int) -> int:
    """AC refinement scan for one block (T.81 G.2 / the libjpeg
    decode_mcu_AC_refine algorithm): correction bits for
    already-nonzero coefficients, run/sign codes for newly-nonzero
    ones, EOB runs carrying correction bits."""
    def correct(k: int) -> None:
        if br.bits(1) and (int(blk[k]) & p1) == 0:
            blk[k] += p1 if blk[k] > 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(br, lut)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
                # r == 15: run of 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad AC refinement magnitude")
                newval = p1 if br.bits(1) else m1
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _progressive_scan(payload: bytes, pos: int, seg: bytes, comps,
                      coefs, htabs, restart_interval: int,
                      geom) -> int:
    """Decode ONE progressive scan's entropy data into the
    per-component coefficient arrays; returns the byte position of
    the marker that terminated the scan."""
    mcux, mcuy, hmax, vmax, w, h = geom
    ns = seg[0]
    sc = []
    for si in range(ns):
        cid, tabs = seg[1 + si * 2 : 3 + si * 2]
        matches = [i for i, c in enumerate(comps) if c["id"] == cid]
        if not matches:
            raise ValueError(f"scan references unknown component {cid}")
        sc.append((matches[0], tabs >> 4, tabs & 0xF))
    ss, se, a = seg[1 + ns * 2 : 4 + ns * 2]
    ah, al = a >> 4, a & 0xF
    if se > 63 or (ss > se) or al > 13:
        raise ValueError("bad progressive scan header")
    br = _BitReader(payload, pos)
    p1, m1 = 1 << al, -(1 << al)
    state = {"n": 0, "pred": [0] * ns, "eobrun": 0}

    def maybe_restart() -> None:
        if (restart_interval and state["n"]
                and state["n"] % restart_interval == 0):
            br.sync_restart()
            state["pred"] = [0] * ns
            state["eobrun"] = 0
        state["n"] += 1

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")

        def dc_block(si: int, blk: np.ndarray) -> None:
            if ah == 0:
                cat = _huff_decode(br, htabs[(0, sc[si][1])])
                diff = _extend(br.bits(cat), cat) if cat else 0
                state["pred"][si] += diff
                blk[0] = state["pred"][si] << al
            elif br.bits(1):
                blk[0] |= p1

        if ns == 1:  # single-component DC scan is non-interleaved
            ci = sc[0][0]
            c = comps[ci]
            nbx, nby = _comp_block_dims(c["h"], c["v"], w, h, hmax, vmax)
            for by in range(nby):
                for bx in range(nbx):
                    maybe_restart()
                    dc_block(0, coefs[ci][by, bx])
        else:
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart()
                    for si, (ci, _, _) in enumerate(sc):
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                dc_block(si, coefs[ci][my * c["v"] + by,
                                                       mx * c["h"] + bx])
    else:  # AC scan: always one component (T.81 B.2.3)
        if ns != 1:
            raise ValueError("interleaved progressive AC scan")
        ci, _, acid = sc[0]
        c = comps[ci]
        nbx, nby = _comp_block_dims(c["h"], c["v"], w, h, hmax, vmax)
        for by in range(nby):
            for bx in range(nbx):
                maybe_restart()
                lut = htabs[(1, acid)]
                blk = coefs[ci][by, bx]
                if ah == 0:
                    state["eobrun"] = _dec_ac_first(
                        br, lut, blk, ss, se, al, state["eobrun"])
                else:
                    state["eobrun"] = _dec_ac_refine(
                        br, lut, blk, ss, se, p1, m1, state["eobrun"])

    # skip pad bits / stuffing / stray RSTs up to the scan-ending marker
    p = max(br.pos, pos)
    while p + 1 < len(payload):
        nxt = payload[p + 1]
        if (payload[p] == 0xFF and nxt != 0x00
                and not 0xD0 <= nxt <= 0xD7):
            return p
        p += 1
    return len(payload)


def decode_jpeg(payload: bytes, max_pixels: int = 1 << 24) -> np.ndarray:
    """Baseline (SOF0/1) or progressive (SOF2) JFIF bytes →
    (h, w, 3) uint8 RGB (grayscale is broadcast).  Raises
    ``NotImplementedError`` for hierarchical / lossless /
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
    progressive = False
    coefs = None  # progressive: per-comp (nby, nbx, 64) zigzag ints
    hmax = vmax = mcux = mcuy = 0

    def check_caps() -> None:
        if not comps or h == 0:
            raise ValueError("JPEG SOS before SOF")
        if h * w > max_pixels:
            # NotImplementedError, not ValueError: the payload may be
            # a perfectly valid large photo — the limitation is THIS
            # decoder's pure-Python loop (see docstring).
            raise NotImplementedError(
                f"declared {w}x{h} exceeds max_pixels={max_pixels} for "
                "the pure-Python decoder; install a codec library or "
                "raise the cap"
            )
        for c in comps:
            if c["h"] not in (1, 2) or c["v"] not in (1, 2):
                raise NotImplementedError("sampling factors beyond 2x2")

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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            for ci in range(nc):
                cid, hv, tq = seg[6 + ci * 3 : 9 + ci * 3]
                comps.append({
                    "id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq,
                })
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG profile (SOF marker 0x{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if not progressive:
                ns = seg[0]
                for si in range(ns):
                    cid, tabs = seg[1 + si * 2 : 3 + si * 2]
                    for c in comps:
                        if c["id"] == cid:
                            c["dc"] = tabs >> 4
                            c["ac"] = tabs & 0xF
                scan_pos = pos
                break
            # progressive: decode this scan's entropy data in place,
            # then continue the marker walk (DHT/DQT may interleave)
            if coefs is None:
                check_caps()
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = (w + 8 * hmax - 1) // (8 * hmax)
                mcuy = (h + 8 * vmax - 1) // (8 * vmax)
                coefs = [
                    np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                             dtype=np.int64)
                    for c in comps
                ]
            pos = _progressive_scan(
                payload, pos, seg, comps, coefs, htabs,
                restart_interval, (mcux, mcuy, hmax, vmax, w, h),
            )
        # else: APPn/COM — skipped

    if progressive:
        if coefs is None:
            raise ValueError("JPEG missing SOS")
        # all scans consumed: dequantize + IDCT every block
        planes = []
        for ci, c in enumerate(comps):
            q = qtabs[c["tq"]]
            arr = coefs[ci]
            nby, nbx = arr.shape[:2]
            plane = np.zeros((nby * 8, nbx * 8))
            for by in range(nby):
                for bx in range(nbx):
                    co = np.zeros(64)
                    co[_ZIGZAG] = arr[by, bx]
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                        _M.T @ (co.reshape(8, 8) * q) @ _M
                    )
            planes.append(plane)
        return _reconstruct(planes, comps, hmax, vmax, h, w)

    if scan_pos is None:
        raise ValueError("JPEG missing SOF/SOS")
    check_caps()
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

    return _reconstruct(planes, comps, hmax, vmax, h, w)


def _reconstruct(planes, comps, hmax: int, vmax: int,
                 h: int, w: int) -> np.ndarray:
    """Shared decoder tail: upsample each component to full
    resolution by replication, crop to (h, w), color-convert."""
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
