"""Pure-stdlib VP8L (WebP lossless) codec — encoder + decoder.

Implemented from the published WebP Lossless Bitstream Specification
(RFC 9649 / developers.google.com webp_lossless_bitstream_specification),
not translated from libwebp. Like the repo's PNG/GIF/JPEG codecs, the
goal is REAL pixel decode for the dominant web image formats with no
external libraries: bit-exact round-trip (encode → decode) is enforced
by tests, and the decoder bounds all work by DECLARED dimensions
before looping (CLAUDE.md: adversarial 2 KB payloads must not pin an
executor).

Supported subset (precisely documented, spec-section-cited):
- 14-bit packed dimensions, version 0 header (§3).
- Canonical prefix codes, both the "simple" (1-2 symbol) and the
  "normal" code-length-coded form, incl. the 19-symbol code-length
  code with its spec ordering and the 16/17/18 repeat symbols (§6.2).
- Literal ARGB decoding via the 4 channel codes (green/red/blue/alpha)
  and LZ77 back-references via the 24 length / 40 distance prefix
  values with extra bits (§5.2).
- Plain distance codes (> 120). The 120 two-dimensional
  neighbor-mapped distance codes (§5.2.2's scan-order table) and the
  color cache (§5.3), meta prefix images (§6.2.1) and the four
  transforms (§4) raise NotImplementedError with the feature named —
  the encoder never emits them, and no external WebP files exist in
  this offline sandbox to exercise them.

The encoder emits: no transforms, no color cache, a single prefix
group, per-channel canonical Huffman codes (length-limited to 15),
and dist=1 LZ77 run back-references — a small but fully valid VP8L
stream for arbitrary RGB/RGBA input.
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

MAX_CODE_LEN = 15
# §6.2: static order in which code-length-code lengths are written
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
_GREEN_ALPHABET = 256 + 24  # literals + length prefix codes (no cache)
_DIST_ALPHABET = 40


# ------------------------------------------------------------------ bits
class _BitReader:
    """LSB-first bit reader (§3: 'bits are read starting from the
    least-significant bit of each byte')."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte_i, bit_i = divmod(self.pos, 8)
            if byte_i >= len(self.data):
                raise ValueError("VP8L bitstream truncated")
            v |= ((self.data[byte_i] >> bit_i) & 1) << i
            self.pos += 1
        return v


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.bitpos = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            if self.bitpos % 8 == 0:
                self.out.append(0)
            if (value >> i) & 1:
                self.out[-1] |= 1 << (self.bitpos % 8)
            self.bitpos += 1

    def bytes(self) -> bytes:
        return bytes(self.out)


# -------------------------------------------------- canonical prefix code
def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, nbits), canonical assignment (shorter codes
    first, ties by symbol order) as in DEFLATE/§6.2."""
    pairs = sorted(
        (ln, sym) for sym, ln in enumerate(lengths) if ln > 0
    )
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for ln, sym in pairs:
        code <<= ln - prev_len
        codes[sym] = (code, ln)
        code += 1
        prev_len = ln
    return codes


class _PrefixCode:
    """Decoder-side canonical prefix code. Code bits appear in the
    stream MSB-of-code first (DEFLATE convention, §6.2.2)."""

    __slots__ = ("single", "table", "max_len")

    def __init__(self, lengths: list[int]):
        nz = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = None
            self.max_len = 0
            return
        self.single = None
        kraft = sum(1 << (MAX_CODE_LEN - ln) for ln, _ in nz)
        if kraft != 1 << MAX_CODE_LEN:
            raise ValueError("invalid prefix code (Kraft sum)")
        self.table = {
            (ln, code): sym
            for sym, (code, ln) in _canonical_codes(lengths).items()
        }
        self.max_len = max(ln for ln, _ in nz)

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code in VP8L stream")


def _limited_lengths(freqs: list[int], limit: int = MAX_CODE_LEN) -> list[int]:
    """Huffman code lengths limited to ``limit`` bits. Standard
    heap-based Huffman; if the depth exceeds the limit, lengths are
    clamped and the Kraft sum repaired by deepening the least
    frequent shorter codes (zlib-style adjustment)."""
    syms = [s for s, f in enumerate(freqs) if f > 0]
    n = len(syms)
    lengths = [0] * len(freqs)
    if n == 0:
        return lengths
    if n == 1:
        lengths[syms[0]] = 1
        return lengths
    heap = [(freqs[s], s, (s,)) for s in syms]
    heapq.heapify(heap)
    depth = dict.fromkeys(syms, 0)
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, t2, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, t2, g1 + g2))
    # zlib-style depth limiting on the per-depth histogram: move one
    # leaf up to make room for each pair of overflow leaves; exact
    # Kraft equality is restored by construction.
    bl_count = [0] * (limit + 1)
    overflow = 0
    for d in depth.values():
        if d > limit:
            overflow += 1
            d = limit
        bl_count[d] += 1
    while overflow > 0:
        bits = limit - 1
        while bl_count[bits] == 0:
            bits -= 1
        bl_count[bits] -= 1
        bl_count[bits + 1] += 2
        bl_count[limit] -= 1
        overflow -= 2
    # deepest codes go to the least frequent symbols
    order = sorted(syms, key=lambda s: (freqs[s], s))
    oi = 0
    for d in range(limit, 0, -1):
        for _ in range(bl_count[d]):
            lengths[order[oi]] = d
            oi += 1
    kraft = sum(1 << (limit - lengths[s]) for s in syms)
    if kraft != 1 << limit:
        raise ValueError("could not build length-limited prefix code")
    return lengths


# -------------------------------------------------- code transmission
def _write_prefix_code(bw: _BitWriter, lengths: list[int]) -> None:
    """§6.2.2: simple form for <=2 symbols, else code-length coding
    over the 19-symbol alphabet in the spec's fixed order (no 16/17/18
    repeats on the write side — literal lengths, which every conforming
    reader accepts)."""
    nz = [s for s, ln in enumerate(lengths) if ln > 0]
    if 1 <= len(nz) <= 2 and all(s < 256 for s in nz):
        bw.write(1, 1)  # simple
        bw.write(len(nz) - 1, 1)
        first = nz[0]
        if first <= 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(first, 1)
        else:
            bw.write(1, 1)
            bw.write(first, 8)
        if len(nz) == 2:
            bw.write(nz[1], 8)
        return
    bw.write(0, 1)  # normal form
    clc_freq = [0] * 19
    for ln in lengths:
        clc_freq[ln] += 1
    clc_len = _limited_lengths(clc_freq, 7)
    # num_code_lengths: cover every CLC symbol we actually use
    used = [i for i, o in enumerate(_CLC_ORDER) if clc_len[o] > 0]
    n_clc = max(4, (used[-1] + 1) if used else 4)
    bw.write(n_clc - 4, 4)
    for i in range(n_clc):
        bw.write(clc_len[_CLC_ORDER[i]], 3)
    bw.write(0, 1)  # no max_symbol shortcut: all lengths follow
    clc_codes = _canonical_codes(clc_len)
    single_clc = len([ln for ln in clc_len if ln > 0]) == 1
    for ln in lengths:
        if single_clc:
            continue  # 0-bit code: nothing to write
        code, nbits = clc_codes[ln]
        for b in range(nbits - 1, -1, -1):  # MSB of code first
            bw.write((code >> b) & 1, 1)


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        if br.read(1):
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        if sym0 >= alphabet_size:
            raise ValueError("simple code symbol out of range")
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            lengths[sym0] = 1
            pc = _PrefixCode.__new__(_PrefixCode)
            pc.single = sym0
            pc.table = None
            pc.max_len = 0
            return pc
        sym1 = br.read(8)
        if sym0 >= alphabet_size or sym1 >= alphabet_size:
            raise ValueError("simple code symbol out of range")
        lengths[sym0] = lengths[sym1] = 1
        return _PrefixCode(lengths)
    n_clc = 4 + br.read(4)
    clc_len = [0] * 19
    for i in range(n_clc):
        clc_len[_CLC_ORDER[i]] = br.read(3)
    clc = _PrefixCode(clc_len) if sum(
        1 for x in clc_len if x
    ) > 1 else None
    clc_single = next((s for s, x in enumerate(clc_len) if x), None)
    if clc is None and clc_single is None:
        raise ValueError("VP8L code-length code has no symbols")
    if br.read(1):  # explicit max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    sym = 0
    prev = 8
    while sym < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = clc.read(br) if clc is not None else clc_single
        if s < 16:
            lengths[sym] = s
            sym += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read(2)
            lengths[sym : sym + rep] = [prev] * rep
            sym += rep
        elif s == 17:
            sym += 3 + br.read(3)
        else:  # 18
            sym += 11 + br.read(7)
        if sym > alphabet_size:
            raise ValueError("code lengths overflow alphabet")
    return _PrefixCode(lengths)


# ------------------------------------------------------------ LZ77 values
def _prefix_value_split(value: int) -> tuple[int, int, int]:
    """§5.2.2 prefix-value split: returns (prefix_code, extra_bits,
    extra_val) for an LZ77 length or distance value (1-based)."""
    if value <= 4:
        return value - 1, 0, 0
    vm1 = value - 1
    hi = vm1.bit_length() - 1
    extra_bits = hi - 1
    second = (vm1 >> extra_bits) & 1
    code = 2 * hi + second
    offset = (2 + second) << extra_bits
    return code, extra_bits, vm1 - offset


def _prefix_value_read(br: _BitReader, code: int) -> int:
    if code < 4:
        return code + 1
    extra_bits = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


# ------------------------------------------------------------------ encode
def encode_vp8l(px: np.ndarray) -> bytes:
    """(h, w, 3|4) uint8 → a valid standalone WebP file (RIFF +
    VP8L). Literals + dist=1 run back-references, single prefix
    group, no transforms/cache."""
    h, w = int(px.shape[0]), int(px.shape[1])
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("VP8L dimensions must be in [1, 16384]")
    has_alpha = px.shape[2] == 4
    if not has_alpha:
        a = np.full((h, w, 1), 255, dtype=np.uint8)
        px = np.concatenate([px, a], axis=2)
    flat = px.reshape(-1, 4).astype(np.uint32)
    argb = (
        (flat[:, 3] << 24) | (flat[:, 0] << 16)
        | (flat[:, 1] << 8) | flat[:, 2]
    )
    n = len(argb)

    # greedy dist=1 runs: literal pixel, then one backref per run
    ops: list[tuple[str, int]] = []  # ('lit', idx) or ('ref', length)
    i = 0
    while i < n:
        ops.append(("lit", i))
        run = 1
        while (
            i + run < n
            and argb[i + run] == argb[i]
            and run < 4096
        ):
            run += 1
        if run > 1:
            ops.append(("ref", run - 1))
            i += run
        else:
            i += 1

    gf = [0] * _GREEN_ALPHABET
    rf, bf, af = [0] * 256, [0] * 256, [0] * 256
    df = [0] * _DIST_ALPHABET
    for kind, v in ops:
        if kind == "lit":
            p = int(argb[v])
            gf[(p >> 8) & 0xFF] += 1
            rf[(p >> 16) & 0xFF] += 1
            bf[p & 0xFF] += 1
            af[(p >> 24) & 0xFF] += 1
        else:
            code, _, _ = _prefix_value_split(v)
            gf[256 + code] += 1
            dcode, _, _ = _prefix_value_split(1 + 120)
            df[dcode] += 1
    if not any(df):
        df[0] = 1  # unused code still needs a valid (simple) tree

    g_len = _limited_lengths(gf)
    r_len = _limited_lengths(rf)
    b_len = _limited_lengths(bf)
    a_len = _limited_lengths(af)
    d_len = _limited_lengths(df)

    bw = _BitWriter()
    bw.write(0x2F, 8)  # signature
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if has_alpha else 0, 1)  # alpha hint (pre-expansion)
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix image
    for lens in (g_len, r_len, b_len, a_len, d_len):
        _write_prefix_code(bw, lens)

    g_codes = _canonical_codes(g_len)
    r_codes = _canonical_codes(r_len)
    b_codes = _canonical_codes(b_len)
    a_codes = _canonical_codes(a_len)
    d_codes = _canonical_codes(d_len)
    g_single = sum(1 for x in g_len if x) == 1
    chan_single = {
        id(r_codes): sum(1 for x in r_len if x) == 1,
        id(b_codes): sum(1 for x in b_len if x) == 1,
        id(a_codes): sum(1 for x in a_len if x) == 1,
        id(d_codes): sum(1 for x in d_len if x) == 1,
    }

    def emit(codes, sym, single):
        if single:
            return  # 0-bit code
        code, nbits = codes[sym]
        for b in range(nbits - 1, -1, -1):
            bw.write((code >> b) & 1, 1)

    for kind, v in ops:
        if kind == "lit":
            p = int(argb[v])
            emit(g_codes, (p >> 8) & 0xFF, g_single)
            emit(r_codes, (p >> 16) & 0xFF, chan_single[id(r_codes)])
            emit(b_codes, p & 0xFF, chan_single[id(b_codes)])
            emit(a_codes, (p >> 24) & 0xFF, chan_single[id(a_codes)])
        else:
            lcode, lx, lxv = _prefix_value_split(v)
            emit(g_codes, 256 + lcode, g_single)
            bw.write(lxv, lx)
            dcode, dx, dxv = _prefix_value_split(1 + 120)
            emit(d_codes, dcode, chan_single[id(d_codes)])
            bw.write(dxv, dx)

    data = bw.bytes()
    pad = b"\x00" if len(data) % 2 else b""
    vp8l = b"VP8L" + struct.pack("<I", len(data)) + data + pad
    return b"RIFF" + struct.pack("<I", 4 + len(vp8l)) + b"WEBP" + vp8l


# ------------------------------------------------------------------ decode
def decode_vp8l(payload: bytes, max_pixels: int = 1 << 24) -> np.ndarray:
    """WebP file (RIFF/VP8L) or bare VP8L chunk data → (h, w, 4)
    RGBA uint8. Subset per the module docstring; unsupported spec
    features raise NotImplementedError naming the feature."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        if payload[12:16] != b"VP8L":
            # Environment-blocked, not merely unimplemented: a lossy
            # VP8 decoder that really reads web streams needs RFC
            # 6386's normative constant tables (default coefficient
            # probabilities, mode trees, quant lookups), which exist
            # nowhere in this offline sandbox. Invented tables would
            # decode only self-encoded streams — fake interop.
            raise NotImplementedError(
                f"WebP chunk {payload[12:16]!r}: only VP8L (lossless) "
                "decodes without a VP8 codec library"
            )
        (sz,) = struct.unpack_from("<I", payload, 16)
        data = payload[20 : 20 + sz]
    else:
        data = payload
    br = _BitReader(data)
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature byte")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    if w * h > max_pixels:
        raise ValueError(f"VP8L declares {w}x{h} > max_pixels cap")
    if br.read(1):
        raise NotImplementedError("VP8L transforms not supported")
    cache_bits = 0
    if br.read(1):
        raise NotImplementedError("VP8L color cache not supported")
    if br.read(1):
        raise NotImplementedError("VP8L meta prefix images not supported")
    g_code = _read_prefix_code(br, _GREEN_ALPHABET + (1 << cache_bits
                                                      if cache_bits else 0))
    r_code = _read_prefix_code(br, 256)
    b_code = _read_prefix_code(br, 256)
    a_code = _read_prefix_code(br, 256)
    d_code = _read_prefix_code(br, _DIST_ALPHABET)

    n = w * h
    out = np.zeros(n, dtype=np.uint32)
    pos = 0
    while pos < n:
        s = g_code.read(br)
        if s < 256:
            g = s
            r = r_code.read(br)
            b = b_code.read(br)
            a = a_code.read(br)
            out[pos] = (a << 24) | (r << 16) | (g << 8) | b
            pos += 1
        elif s < 256 + 24:
            length = _prefix_value_read(br, s - 256)
            dist_code = _prefix_value_read(br, d_code.read(br))
            if dist_code <= 120:
                raise NotImplementedError(
                    "VP8L 2D neighbor distance codes not supported"
                )
            dist = dist_code - 120
            if dist > pos or pos + length > n:
                raise ValueError("VP8L back-reference out of range")
            for k in range(length):
                out[pos + k] = out[pos + k - dist]
            pos += length
        else:
            raise NotImplementedError("VP8L color cache not supported")
    rgba = np.empty((n, 4), dtype=np.uint8)
    rgba[:, 0] = (out >> 16) & 0xFF
    rgba[:, 1] = (out >> 8) & 0xFF
    rgba[:, 2] = out & 0xFF
    rgba[:, 3] = (out >> 24) & 0xFF
    return rgba.reshape(h, w, 4)
