"""Pure-stdlib VP8 intra-frame (lossy WebP) codec — encoder + decoder.

Implemented from the published VP8 bitstream format (RFC 6386), not
translated from libvpx/libwebp. WebP 'VP8 ' chunks are always single
VP8 key frames, so an intra-only decoder covers every lossy WebP
still image. Like the repo's PNG/GIF/JPEG/VP8L codecs the goal is
REAL pixel decode with no external libraries, with all work bounded
by DECLARED dimensions before any loop runs (CLAUDE.md: adversarial
2 KB payloads must not pin an executor or overflow at the Arrow
boundary).

Spec-faithful (RFC 6386, implemented from the published layout):
- frame tag / start code / 14-bit dimension header (§9.1)
- the boolean arithmetic coder, both directions (§7)
- first-partition header field order: colorspace, segmentation,
  loop-filter params, token-partition count, quantizer indices +
  deltas, per-position token-probability updates, mb_no_coeff_skip
  (§9.2-§9.11)
- keyframe mode trees (Y / UV / 4x4 submodes) and token tree with
  the EOB-skip-after-zero rule, coefficient bands, zigzag order,
  category extra-bit probabilities (§8, §11, §13)
- dequant lookup tables + the Y2/UV multipliers and clamps (§14.1)
- exact integer inverse DCT (20091/35468 constants) and inverse
  Walsh-Hadamard with spec rounding (§14.3-§14.4)
- intra prediction: 16x16 and chroma DC/V/H/TM with edge defaults,
  all ten 4x4 submodes (§12.2-§12.3)

Documented approximations (this sandbox has NO copy of the spec's
numeric appendices and no reference decoder to diff against — see
OPERATORS.md). ``install_default_tables()`` accepts the real §13.4 /
§13.5 / §11.5 constants the moment a copy materializes (they are
data, not code); every consumer reads through that hook, and
``tests/test_vp8.py::test_thirdparty_fixture_decodes_if_provided``
documents the drop-in fixture path that then certifies
reference-identical decode of third-party streams. Until then:
- the 1,056-entry default token probability table (§13.5) and the
  update-flag probability table (§13.4) are flat (128 / 252): the
  bool coder is correct for ANY probability table as long as both
  sides agree, so encode→decode is bit-exact, but third-party
  streams that rely on the spec default table will not decode to
  the same bits. The in-stream update mechanism is fully
  implemented, so dropping in the real tables is a constant swap.
- the keyframe 4x4 context-conditioned submode probabilities
  (10x10x9, §11.5) are flat 128 under the real tree + context
  indexing, with the same caveat.
- loop filtering is parsed but NOT applied (our encoder always
  writes filter_level=0, where the spec also applies no filter);
  for third-party streams with filter_level>0 the block edges
  would be slightly harder than a reference decode.

The encoder is closed-loop: it returns the exact reconstruction the
decoder will produce (it runs the same integer inverse transforms on
the quantized coefficients), so tests assert bit-exact equality of
``decode == expected`` plus a PSNR floor against the source.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------- modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = range(5)
(B_DC_PRED, B_TM_PRED, B_VE_PRED, B_HE_PRED, B_LD_PRED,
 B_RD_PRED, B_VR_PRED, B_VL_PRED, B_HD_PRED, B_HU_PRED) = range(10)

# keyframe mode trees (RFC 6386 §8.2 / §11.2): (-leaf) terminates
KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROB = (145, 156, 163, 128)
UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROB = (142, 114, 183)
BMODE_TREE = (
    -B_DC_PRED, 2,
    -B_TM_PRED, 4,
    -B_VE_PRED, 6,
    8, 12,
    -B_HE_PRED, 10,
    -B_RD_PRED, -B_VR_PRED,
    -B_LD_PRED, 14,
    -B_VL_PRED, 16,
    -B_HD_PRED, -B_HU_PRED,
)
# §11.5's kf_bmode_prob[above][left][9] — flat approximation (see
# module docstring); the [above][left] context indexing is real.
KF_BMODE_PROB_FLAT = (128,) * 9

# token tree (§13.2). Leaves are token ids 0..11.
(TOK_ZERO, TOK_ONE, TOK_TWO, TOK_THREE, TOK_FOUR, TOK_CAT1, TOK_CAT2,
 TOK_CAT3, TOK_CAT4, TOK_CAT5, TOK_CAT6, TOK_EOB) = range(12)
COEF_TREE = (
    -TOK_EOB, 2,
    -TOK_ZERO, 4,
    -TOK_ONE, 6,
    8, 12,
    -TOK_TWO, 10,
    -TOK_THREE, -TOK_FOUR,
    14, 16,
    -TOK_CAT1, -TOK_CAT2,
    18, 20,
    -TOK_CAT3, -TOK_CAT4,
    -TOK_CAT5, -TOK_CAT6,
)
# category base values and extra-bit probabilities (§13.2)
CAT_BASE = {TOK_CAT1: 5, TOK_CAT2: 7, TOK_CAT3: 11, TOK_CAT4: 19,
            TOK_CAT5: 35, TOK_CAT6: 67}
CAT_PROBS = {
    TOK_CAT1: (159,),
    TOK_CAT2: (165, 145),
    TOK_CAT3: (173, 148, 140),
    TOK_CAT4: (176, 155, 140, 135),
    TOK_CAT5: (180, 157, 141, 134, 130),
    TOK_CAT6: (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
}
COEF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
N_BANDS, N_CTX, N_PROBS = 8, 3, 11
# plane types for token-probability indexing (§13.3): 0 = Y after a
# Y2 block (AC-only), 1 = Y2, 2 = chroma, 3 = Y with DC (B_PRED MBs)
PLANE_Y_NO_DC, PLANE_Y2, PLANE_UV, PLANE_Y_WITH_DC = 0, 1, 2, 3

# flat default token probabilities (see module docstring)
FLAT_COEF_PROB = 128
FLAT_UPDATE_PROB = 252

# ------------------------------------------------ table injection
# The spec's numeric probability appendices (§13.4, §13.5, §11.5) are
# DATA, not code, and no offline copy exists in this sandbox. Every
# consumer below reads through these hooks, so dropping in the real
# constants is a runtime call — no structural change:
#   install_default_tables(coef_probs=..., coef_update_probs=...,
#                          kf_bmode_probs=...)
# With real tables installed, third-party (libwebp-encoded) lossy
# streams decode with the reference probabilities; without, the
# documented flat approximation applies (closed-loop encode→decode
# stays bit-exact either way, because encoder and decoder read the
# same hooks).
_COEF_PROBS_DEFAULT: tuple | None = None  # [4][8][3][11]
_COEF_UPDATE_PROBS: tuple | None = None   # [4][8][3][11]
_KF_BMODE_PROBS: tuple | None = None      # [10][10][9]


def _check_table(t, shape, name):
    def rec(x, dims):
        if not dims:
            if not (isinstance(x, int) and 1 <= x <= 255):
                raise ValueError(
                    f"{name}: probabilities must be ints in [1, 255]"
                )
            return x
        if len(x) != dims[0]:
            raise ValueError(
                f"{name}: expected axis of length {dims[0]}, got {len(x)}"
            )
        return tuple(rec(e, dims[1:]) for e in x)

    return rec(t, shape)


def install_default_tables(
    coef_probs=None, coef_update_probs=None, kf_bmode_probs=None
) -> None:
    """Install the spec's default probability tables (a constants
    swap — see module docstring). Each argument is optional; ``None``
    leaves that table on the flat approximation. Shapes:
    coef_probs / coef_update_probs [4][8][3][11] (§13.5 / §13.4),
    kf_bmode_probs [10][10][9] (§11.5). Values are 1..255."""
    global _COEF_PROBS_DEFAULT, _COEF_UPDATE_PROBS, _KF_BMODE_PROBS
    if coef_probs is not None:
        _COEF_PROBS_DEFAULT = _check_table(
            coef_probs, (4, N_BANDS, N_CTX, N_PROBS), "coef_probs"
        )
    if coef_update_probs is not None:
        _COEF_UPDATE_PROBS = _check_table(
            coef_update_probs, (4, N_BANDS, N_CTX, N_PROBS),
            "coef_update_probs",
        )
    if kf_bmode_probs is not None:
        _KF_BMODE_PROBS = _check_table(
            kf_bmode_probs, (10, 10, 9), "kf_bmode_probs"
        )


def reset_default_tables() -> None:
    """Back to the documented flat approximation (test isolation)."""
    global _COEF_PROBS_DEFAULT, _COEF_UPDATE_PROBS, _KF_BMODE_PROBS
    _COEF_PROBS_DEFAULT = None
    _COEF_UPDATE_PROBS = None
    _KF_BMODE_PROBS = None


def tables_installed() -> dict:
    return {
        "coef_probs": _COEF_PROBS_DEFAULT is not None,
        "coef_update_probs": _COEF_UPDATE_PROBS is not None,
        "kf_bmode_probs": _KF_BMODE_PROBS is not None,
    }


def _update_prob(i: int, j: int, k: int, m: int) -> int:
    """§13.4 coefficient-update-flag probability at one position."""
    if _COEF_UPDATE_PROBS is None:
        return FLAT_UPDATE_PROB
    return _COEF_UPDATE_PROBS[i][j][k][m]


def _kf_bmode(above: int, left: int):
    """§11.5 context-conditioned 4x4 submode probabilities."""
    if _KF_BMODE_PROBS is None:
        return KF_BMODE_PROB_FLAT
    return _KF_BMODE_PROBS[above][left]

# dequantization lookups (§14.1, reconstructed from the published
# tables; monotone, 128 entries each)
DC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114,
    116, 118, 122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143,
    145, 148, 151, 154, 157,
)
AC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106,
    108, 110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140,
    143, 146, 149, 152, 155, 158, 161, 164, 167, 170, 173, 177, 181,
    185, 189, 193, 197, 201, 205, 209, 213, 217, 221, 225, 229, 234,
    239, 245, 249, 254, 259, 264, 269, 274, 279, 284,
)


def _clamp_qi(q: int) -> int:
    return 0 if q < 0 else 127 if q > 127 else q


def quant_factors(y_ac_qi: int, y_dc_d: int = 0, y2_dc_d: int = 0,
                  y2_ac_d: int = 0, uv_dc_d: int = 0, uv_ac_d: int = 0):
    """(§14.1) → dict of the six dequant factors. Y2 DC is doubled,
    Y2 AC is *155/100 with an 8 floor, chroma DC clamps at 132."""
    y2ac = AC_QLOOKUP[_clamp_qi(y_ac_qi + y2_ac_d)] * 155 // 100
    return {
        "y_dc": DC_QLOOKUP[_clamp_qi(y_ac_qi + y_dc_d)],
        "y_ac": AC_QLOOKUP[_clamp_qi(y_ac_qi)],
        "y2_dc": DC_QLOOKUP[_clamp_qi(y_ac_qi + y2_dc_d)] * 2,
        "y2_ac": max(8, y2ac),
        "uv_dc": min(132, DC_QLOOKUP[_clamp_qi(y_ac_qi + uv_dc_d)]),
        "uv_ac": AC_QLOOKUP[_clamp_qi(y_ac_qi + uv_ac_d)],
    }


# --------------------------------------------------------- bool coder
class BoolDecoder:
    """RFC 6386 §7.3 boolean decoder. Reads past the end of the
    buffer decode zero bytes (bounded: every caller loop is bounded
    by declared MB counts, never by stream content)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        self.value = (data[0] << 8 | data[1]) if len(data) >= 2 else (
            (data[0] << 8) if data else 0)
        self.range = 255
        self.bit_count = 0

    def read_bool(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value = (self.value << 1) & 0xFFFF
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                    self.pos += 1
        return ret

    def read_literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bool(128)
        return v

    def read_signed(self, n: int) -> int:
        v = self.read_literal(n)
        return -v if self.read_bool(128) else v

    def read_tree(self, tree, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.read_bool(probs[i >> 1])]
            if i <= 0:
                return -i


class BoolEncoder:
    """§7.3's encoder direction (carry-propagating)."""

    def __init__(self):
        self.low = 0
        self.range = 255
        self.count = -24
        self.out = bytearray()

    def write_bool(self, prob: int, bit: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.low += split
            self.range -= split
        else:
            self.range = split
        shift = 0
        r = self.range
        while r < 128:
            r <<= 1
            shift += 1
        self.range = r
        self.count += shift
        if self.count >= 0:
            offset = shift - self.count
            if (self.low << (offset - 1)) & 0x80000000:
                i = len(self.out) - 1
                while i >= 0 and self.out[i] == 0xFF:
                    self.out[i] = 0
                    i -= 1
                if i >= 0:
                    self.out[i] += 1
            self.out.append((self.low >> (24 - offset)) & 0xFF)
            self.low = (self.low << offset) & 0xFFFFFF
            shift = self.count
            self.count -= 8
        self.low = (self.low << shift) & 0xFFFFFFFF

    def write_literal(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.write_bool(128, (value >> i) & 1)

    def write_signed(self, value: int, n: int) -> None:
        self.write_literal(abs(value), n)
        self.write_bool(128, 1 if value < 0 else 0)

    def write_tree(self, tree, probs, leaf: int, start: int = 0) -> None:
        # walk down, emitting the branch bits that reach -leaf
        path = self._tree_path(tree, leaf, start)
        for node, bit in path:
            self.write_bool(probs[node >> 1], bit)

    @staticmethod
    def _tree_path(tree, leaf, start):
        # DFS for the leaf; trees here are tiny (<= 11 leaves)
        stack = [(start, [])]
        while stack:
            i, path = stack.pop()
            for bit in (0, 1):
                nxt = tree[i + bit]
                if nxt == -leaf and (nxt <= 0):
                    return path + [(i, bit)]
                if nxt > 0:
                    stack.append((nxt, path + [(i, bit)]))
        raise ValueError(f"leaf {leaf} unreachable from node {start}")

    def finish(self) -> bytes:
        for _ in range(32):
            self.write_bool(128, 0)
        return bytes(self.out)


# --------------------------------------------------------- transforms
def idct4x4(coeffs: np.ndarray) -> np.ndarray:
    """Exact integer inverse DCT (§14.3): 20091/35468 fixed-point
    constants, final (x+4)>>3. coeffs: (16,) int array, natural
    (row-major) order. Returns (4,4) int residuals."""
    c = [int(v) for v in coeffs]
    tmp = [0] * 16
    for i in range(4):  # columns
        ip0, ip4, ip8, ip12 = c[i], c[i + 4], c[i + 8], c[i + 12]
        a1 = ip0 + ip8
        b1 = ip0 - ip8
        t1 = (ip4 * 35468) >> 16
        t2 = ip12 + ((ip12 * 20091) >> 16)
        c1 = t1 - t2
        t1 = ip4 + ((ip4 * 20091) >> 16)
        t2 = (ip12 * 35468) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[i + 12] = a1 - d1
        tmp[i + 4] = b1 + c1
        tmp[i + 8] = b1 - c1
    out = np.empty((4, 4), dtype=np.int64)
    for r in range(4):
        ip0, ip1, ip2, ip3 = tmp[4 * r], tmp[4 * r + 1], tmp[4 * r + 2], tmp[4 * r + 3]
        a1 = ip0 + ip2
        b1 = ip0 - ip2
        t1 = (ip1 * 35468) >> 16
        t2 = ip3 + ((ip3 * 20091) >> 16)
        c1 = t1 - t2
        t1 = ip1 + ((ip1 * 20091) >> 16)
        t2 = (ip3 * 35468) >> 16
        d1 = t1 + t2
        out[r, 0] = (a1 + d1 + 4) >> 3
        out[r, 3] = (a1 - d1 + 4) >> 3
        out[r, 1] = (b1 + c1 + 4) >> 3
        out[r, 2] = (b1 - c1 + 4) >> 3
    return out


def iwht4x4(coeffs: np.ndarray) -> np.ndarray:
    """Inverse Walsh-Hadamard for the Y2 block (§14.3), exact
    integer with final (x+3)>>3. Returns the 16 Y-block DC values
    in raster order."""
    c = [int(v) for v in coeffs]
    tmp = [0] * 16
    for i in range(4):
        a1 = c[i] + c[i + 12]
        b1 = c[i + 4] + c[i + 8]
        c1 = c[i + 4] - c[i + 8]
        d1 = c[i] - c[i + 12]
        tmp[i] = a1 + b1
        tmp[i + 4] = c1 + d1
        tmp[i + 8] = a1 - b1
        tmp[i + 12] = d1 - c1
    out = np.empty(16, dtype=np.int64)
    for r in range(4):
        i = 4 * r
        a1 = tmp[i] + tmp[i + 3]
        b1 = tmp[i + 1] + tmp[i + 2]
        c1 = tmp[i + 1] - tmp[i + 2]
        d1 = tmp[i] - tmp[i + 3]
        out[i] = (a1 + b1 + 3) >> 3
        out[i + 1] = (c1 + d1 + 3) >> 3
        out[i + 2] = (a1 - b1 + 3) >> 3
        out[i + 3] = (d1 - c1 + 3) >> 3
    return out


def _linear_map_matrix(transform, n: int = 16) -> np.ndarray:
    """Float matrix of an (approximately linear) integer transform,
    probed column-by-column at a large scale to wash out rounding.
    Used ONLY by the encoder to pick coefficients — the decoder-side
    ground truth is always the exact integer inverse above."""
    scale = 1 << 12
    m = np.empty((n, n))
    for j in range(n):
        e = np.zeros(n, dtype=np.int64)
        e[j] = scale
        m[:, j] = np.asarray(transform(e), dtype=np.float64).reshape(-1) / scale
    return m


_IDCT_MAT = _linear_map_matrix(idct4x4)
_FDCT_MAT = np.linalg.inv(_IDCT_MAT)
_IWHT_MAT = _linear_map_matrix(iwht4x4)
_FWHT_MAT = np.linalg.inv(_IWHT_MAT)


# -------------------------------------------------------- prediction
def _dc_pred(above, left, size: int) -> int:
    have_a, have_l = above is not None, left is not None
    if have_a and have_l:
        s = int(np.sum(above)) + int(np.sum(left))
        n = 2 * size
    elif have_a:
        s, n = int(np.sum(above)), size
    elif have_l:
        s, n = int(np.sum(left)), size
    else:
        return 128
    return (s + n // 2) >> (n.bit_length() - 1)


def predict_block(mode: int, above, left, above_left: int, size: int
                  ) -> np.ndarray:
    """16x16 / 8x8 whole-block intra prediction (§12.2). ``above`` /
    ``left`` are 1-D uint8 arrays or None outside the frame;
    defaults 127 (above) / 129 (left)."""
    if mode == DC_PRED:
        return np.full((size, size), _dc_pred(above, left, size), np.uint8)
    a = np.full(size, 127, np.int64) if above is None else above.astype(np.int64)
    l = np.full(size, 129, np.int64) if left is None else left.astype(np.int64)
    if mode == V_PRED:
        return np.tile(a, (size, 1)).astype(np.uint8)
    if mode == H_PRED:
        return np.tile(l.reshape(-1, 1), (1, size)).astype(np.uint8)
    if mode == TM_PRED:
        p = np.clip(l.reshape(-1, 1) + a.reshape(1, -1) - int(above_left),
                    0, 255)
        return p.astype(np.uint8)
    raise ValueError(f"bad whole-block mode {mode}")


def predict_subblock(mode: int, a8: np.ndarray, l4: np.ndarray,
                     p: int) -> np.ndarray:
    """All ten 4x4 submodes (§12.3). a8 = 8 above pixels (4 above +
    4 above-right), l4 = 4 left pixels, p = above-left."""
    A = a8.astype(np.int64)
    L = l4.astype(np.int64)
    P = int(p)
    o = np.empty((4, 4), np.int64)
    if mode == B_DC_PRED:
        o[:] = (int(A[:4].sum()) + int(L.sum()) + 4) >> 3
    elif mode == B_TM_PRED:
        o = np.clip(L.reshape(-1, 1) + A[:4].reshape(1, -1) - P, 0, 255)
    elif mode == B_VE_PRED:
        e = np.array([P, A[0], A[1], A[2], A[3], A[4]])
        row = (e[:4] + 2 * e[1:5] + e[2:6] + 2) >> 2
        o[:] = row
    elif mode == B_HE_PRED:
        e = np.array([P, L[0], L[1], L[2], L[3], L[3]])
        col = (e[:4] + 2 * e[1:5] + e[2:6] + 2) >> 2
        o[:] = col.reshape(-1, 1)
    elif mode == B_LD_PRED:
        ext = np.concatenate([A, A[7:8]])  # A[8] replicate for the corner
        for r in range(4):
            for c in range(4):
                x = r + c
                if x == 6:
                    o[r, c] = (A[6] + 3 * A[7] + 2) >> 2
                else:
                    o[r, c] = (ext[x] + 2 * ext[x + 1] + ext[x + 2] + 2) >> 2
    elif mode == B_RD_PRED:
        e = np.array([L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]])
        for r in range(4):
            for c in range(4):
                i = 4 + c - r
                o[r, c] = (e[i - 1] + 2 * e[i] + e[i + 1] + 2) >> 2
    elif mode == B_VR_PRED:
        row0 = [(P + A[0] + 1) >> 1, (A[0] + A[1] + 1) >> 1,
                (A[1] + A[2] + 1) >> 1, (A[2] + A[3] + 1) >> 1]
        row1 = [(L[0] + 2 * P + A[0] + 2) >> 2, (P + 2 * A[0] + A[1] + 2) >> 2,
                (A[0] + 2 * A[1] + A[2] + 2) >> 2,
                (A[1] + 2 * A[2] + A[3] + 2) >> 2]
        o[0] = row0
        o[1] = row1
        o[2] = [(P + 2 * L[0] + L[1] + 2) >> 2] + row0[:3]
        o[3] = [(L[0] + 2 * L[1] + L[2] + 2) >> 2] + row1[:3]
    elif mode == B_VL_PRED:
        row0 = [(A[0] + A[1] + 1) >> 1, (A[1] + A[2] + 1) >> 1,
                (A[2] + A[3] + 1) >> 1, (A[3] + A[4] + 1) >> 1]
        row1 = [(A[0] + 2 * A[1] + A[2] + 2) >> 2,
                (A[1] + 2 * A[2] + A[3] + 2) >> 2,
                (A[2] + 2 * A[3] + A[4] + 2) >> 2,
                (A[3] + 2 * A[4] + A[5] + 2) >> 2]
        o[0] = row0
        o[1] = row1
        o[2] = row0[1:] + [(A[4] + 2 * A[5] + A[6] + 2) >> 2]
        o[3] = row1[1:] + [(A[5] + 2 * A[6] + A[7] + 2) >> 2]
    elif mode == B_HD_PRED:
        r0 = [(L[0] + P + 1) >> 1, (L[0] + 2 * P + A[0] + 2) >> 2,
              (P + 2 * A[0] + A[1] + 2) >> 2, (A[0] + 2 * A[1] + A[2] + 2) >> 2]
        r1 = [(L[1] + L[0] + 1) >> 1, (L[1] + 2 * L[0] + P + 2) >> 2,
              r0[0], r0[1]]
        r2 = [(L[2] + L[1] + 1) >> 1, (L[2] + 2 * L[1] + L[0] + 2) >> 2,
              r1[0], r1[1]]
        r3 = [(L[3] + L[2] + 1) >> 1, (L[3] + 2 * L[2] + L[1] + 2) >> 2,
              r2[0], r2[1]]
        o[0], o[1], o[2], o[3] = r0, r1, r2, r3
    elif mode == B_HU_PRED:
        r0 = [(L[0] + L[1] + 1) >> 1, (L[0] + 2 * L[1] + L[2] + 2) >> 2,
              (L[1] + L[2] + 1) >> 1, (L[1] + 2 * L[2] + L[3] + 2) >> 2]
        r1 = [r0[2], r0[3], (L[2] + L[3] + 1) >> 1,
              (L[2] + 3 * L[3] + 2) >> 2]
        o[0], o[1] = r0, r1
        o[2] = [r1[2], r1[3], int(L[3]), int(L[3])]
        o[3] = [int(L[3])] * 4
    else:
        raise ValueError(f"bad 4x4 submode {mode}")
    return np.clip(o, 0, 255).astype(np.uint8)


# ----------------------------------------------------- token coding
def _token_for_value(v: int) -> int:
    a = abs(v)
    if a <= 4:
        return a  # TOK_ZERO..TOK_FOUR
    for tok in (TOK_CAT1, TOK_CAT2, TOK_CAT3, TOK_CAT4, TOK_CAT5):
        base = CAT_BASE[tok]
        if a < base + (1 << len(CAT_PROBS[tok])):
            return tok
    return TOK_CAT6


def decode_coeffs(bd: BoolDecoder, probs, plane: int, ctx: int,
                  first: int, q_dc: int, q_ac: int) -> tuple:
    """One 4x4 block's tokens (§13.3) → (dequantized natural-order
    int64[16], nonzero_flag). ``probs[plane][band][ctx][11-ish]``
    uses only the 10 interior tree probabilities (index 0..9)."""
    out = np.zeros(16, dtype=np.int64)
    c = first
    last_zero = False
    nonzero = False
    while c < 16:
        p = probs[plane][COEF_BANDS[c]][ctx]
        tok = bd.read_tree(COEF_TREE, p, start=2 if last_zero else 0)
        if tok == TOK_EOB:
            break
        if tok == TOK_ZERO:
            v = 0
        elif tok <= TOK_FOUR:
            v = tok
        else:
            extra = 0
            for cp in CAT_PROBS[tok]:  # MSB-first extra bits
                extra = (extra << 1) | bd.read_bool(cp)
            v = CAT_BASE[tok] + extra
        if v:
            if bd.read_bool(128):
                v = -v
            nonzero = True
            ctx = 2 if abs(v) > 1 else 1
            last_zero = False
        else:
            ctx = 0
            last_zero = True
        q = q_dc if c == 0 else q_ac
        out[ZIGZAG[c]] = v * q
        c += 1
    return out, nonzero


def encode_coeffs(be: BoolEncoder, probs, plane: int, ctx: int,
                  first: int, qcoeffs) -> int:
    """Mirror of decode_coeffs: qcoeffs are the QUANTIZED (integer,
    pre-dequant) values in zigzag order including positions < first.
    Returns the final eob position (== first when all-zero)."""
    eob = first
    for i in range(first, 16):
        if qcoeffs[i]:
            eob = i + 1
    c = first
    last_zero = False
    while c < eob:
        v = int(qcoeffs[c])
        p = probs[plane][COEF_BANDS[c]][ctx]
        tok = _token_for_value(v)
        be.write_tree(COEF_TREE, p, tok, start=2 if last_zero else 0)
        if tok >= TOK_CAT1:
            extra = abs(v) - CAT_BASE[tok]
            bits = CAT_PROBS[tok]
            for i, cp in enumerate(bits):
                be.write_bool(cp, (extra >> (len(bits) - 1 - i)) & 1)
        if v:
            be.write_bool(128, 1 if v < 0 else 0)
            ctx = 2 if abs(v) > 1 else 1
            last_zero = False
        else:
            ctx = 0
            last_zero = True
        c += 1
    if eob < 16:
        p = probs[plane][COEF_BANDS[eob]][ctx]
        # EOB is never legal right after a zero token — encoder never
        # leaves trailing zeros, so last_zero is False here
        be.write_tree(COEF_TREE, p, TOK_EOB, start=0)
    return eob


# ------------------------------------------------------ frame header
def _default_coef_probs():
    """probs[plane][band][ctx] -> list of 11 interior-node probs.
    Installed §13.5 table when present, else the flat approximation
    (module docstring); mutated in place by in-stream updates."""
    if _COEF_PROBS_DEFAULT is not None:
        return [[[list(_COEF_PROBS_DEFAULT[i][j][k])
                  for k in range(N_CTX)] for j in range(N_BANDS)]
                for i in range(4)]
    return [[[ [FLAT_COEF_PROB] * N_PROBS
               for _ in range(N_CTX)] for _ in range(N_BANDS)]
            for _ in range(4)]


class _FrameHeader:
    __slots__ = ("width", "height", "mb_w", "mb_h", "quants",
                 "coef_probs", "mb_no_skip", "prob_skip",
                 "seg_enabled", "seg_update_map", "seg_tree_probs",
                 "seg_abs", "seg_quant", "seg_quants",
                 "filter_level", "n_parts")


def _parse_header(bd: BoolDecoder, w: int, h: int) -> _FrameHeader:
    """First-partition header, keyframe field order (§9.2-§9.11)."""
    hdr = _FrameHeader()
    hdr.width, hdr.height = w, h
    hdr.mb_w, hdr.mb_h = (w + 15) // 16, (h + 15) // 16
    bd.read_literal(1)  # color space (0 = YCbCr per spec)
    bd.read_literal(1)  # clamping type
    hdr.seg_enabled = bd.read_literal(1)
    hdr.seg_update_map = 0
    hdr.seg_tree_probs = [255, 255, 255]
    hdr.seg_abs = 0
    hdr.seg_quant = [0, 0, 0, 0]
    if hdr.seg_enabled:
        hdr.seg_update_map = bd.read_literal(1)
        update_data = bd.read_literal(1)
        if update_data:
            hdr.seg_abs = bd.read_literal(1)
            for i in range(4):  # per-segment quantizer deltas
                if bd.read_literal(1):
                    hdr.seg_quant[i] = bd.read_signed(7)
            for _ in range(4):  # per-segment loop-filter deltas
                if bd.read_literal(1):
                    bd.read_signed(6)
        if hdr.seg_update_map:
            for i in range(3):
                if bd.read_literal(1):
                    hdr.seg_tree_probs[i] = bd.read_literal(8)
    bd.read_literal(1)  # filter type (parsed; filtering not applied)
    hdr.filter_level = bd.read_literal(6)
    bd.read_literal(3)  # sharpness
    if bd.read_literal(1):  # loop-filter adjustments enabled
        if bd.read_literal(1):  # deltas updated this frame
            for _ in range(8):  # 4 ref-frame + 4 mode deltas
                if bd.read_literal(1):
                    bd.read_signed(6)
    hdr.n_parts = 1 << bd.read_literal(2)
    y_ac_qi = bd.read_literal(7)
    deltas = []
    for _ in range(5):  # y_dc, y2_dc, y2_ac, uv_dc, uv_ac
        deltas.append(bd.read_signed(4) if bd.read_literal(1) else 0)
    hdr.quants = quant_factors(y_ac_qi, *deltas)
    if hdr.seg_enabled:
        # per-segment base index: absolute value or delta on y_ac_qi
        hdr.seg_quants = [
            quant_factors(
                _clamp_qi(hdr.seg_quant[s] if hdr.seg_abs
                          else y_ac_qi + hdr.seg_quant[s]),
                *deltas,
            )
            for s in range(4)
        ]
    else:
        hdr.seg_quants = None
    bd.read_literal(1)  # refresh entropy probs (meaningless intra)
    hdr.coef_probs = _default_coef_probs()
    for i in range(4):
        for j in range(N_BANDS):
            for k in range(N_CTX):
                for m in range(N_PROBS):
                    if bd.read_bool(_update_prob(i, j, k, m)):
                        hdr.coef_probs[i][j][k][m] = bd.read_literal(8)
    hdr.mb_no_skip = bd.read_literal(1)
    hdr.prob_skip = bd.read_literal(8) if hdr.mb_no_skip else 0
    return hdr


_SEG_TREE = (2, 4, -0, -1, -2, -3)


def _read_modes(bd: BoolDecoder, hdr: _FrameHeader):
    """Per-MB keyframe mode info from the first partition (§11).
    Returns (ymodes, uvmodes, submodes, skips, segments)."""
    mw, mh = hdr.mb_w, hdr.mb_h
    ymodes = np.zeros((mh, mw), np.int32)
    uvmodes = np.zeros((mh, mw), np.int32)
    segs = np.zeros((mh, mw), np.int32)
    skips = np.zeros((mh, mw), np.int32)
    submodes = {}
    # 4x4 submode context rows: above per MB-column (4 each), left 4
    above_sub = np.full((mw, 4), B_DC_PRED, np.int32)
    for my in range(mh):
        left_sub = np.full(4, B_DC_PRED, np.int32)
        for mx in range(mw):
            if hdr.seg_update_map:
                segs[my, mx] = bd.read_tree(_SEG_TREE, hdr.seg_tree_probs)
            if hdr.mb_no_skip:
                skips[my, mx] = bd.read_bool(hdr.prob_skip)
            ym = bd.read_tree(KF_YMODE_TREE, KF_YMODE_PROB)
            ymodes[my, mx] = ym
            if ym == B_PRED:
                sub = np.zeros((4, 4), np.int32)
                for r in range(4):
                    for c in range(4):
                        a = sub[r - 1, c] if r else above_sub[mx, c]
                        l = sub[r, c - 1] if c else left_sub[r]
                        # real [above][left] context indexing; resolves
                        # to the installed §11.5 table or the flat row
                        sub[r, c] = bd.read_tree(
                            BMODE_TREE, _kf_bmode(int(a), int(l)))
                submodes[(my, mx)] = sub
                above_sub[mx] = sub[3]
                left_sub[:] = sub[:, 3]
            else:
                # whole-MB modes imply a uniform submode context
                implied = {DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED,
                           H_PRED: B_HE_PRED, TM_PRED: B_TM_PRED}[ym]
                above_sub[mx] = implied
                left_sub[:] = implied
            uvmodes[my, mx] = bd.read_tree(UV_MODE_TREE, KF_UV_MODE_PROB)
    return ymodes, uvmodes, submodes, skips, segs



# --------------------------------------------------------- decoding
def decode_vp8(payload: bytes, max_pixels: int = 1 << 24) -> np.ndarray:
    """VP8 key frame → (h, w, 3) uint8 RGB. ``payload`` is the raw
    'VP8 ' chunk body (frame tag onward). Work is bounded by the
    DECLARED dimensions: MB loops derive from w/h (validated against
    the pixel cap), token loops are bounded per block, and the bool
    decoder zero-extends past truncated partitions instead of
    looping."""
    y, u, v, w, h = decode_vp8_yuv(payload, max_pixels)
    return yuv_to_rgb(y[:h, :w], u[: (h + 1) // 2, : (w + 1) // 2],
                      v[: (h + 1) // 2, : (w + 1) // 2])


def decode_vp8_yuv(payload: bytes, max_pixels: int = 1 << 24):
    """Decode to the padded YUV planes (exact reconstruction targets
    for the closed-loop tests). Returns (Y, U, V, w, h) where plane
    shapes are MB-padded."""
    if len(payload) < 10:
        raise ValueError("VP8 frame shorter than the 10-byte header")
    tag = int.from_bytes(payload[0:3], "little")
    if tag & 1:
        raise ValueError("VP8 interframe: only key frames carry stills")
    part1_size = tag >> 5
    if payload[3:6] != b"\x9d\x01\x2a":
        raise ValueError("VP8 keyframe start code missing")
    w = int.from_bytes(payload[6:8], "little") & 0x3FFF
    h = int.from_bytes(payload[8:10], "little") & 0x3FFF
    if w == 0 or h == 0:
        raise ValueError(f"degenerate VP8 dimensions {w}x{h}")
    if w * h > max_pixels:
        raise ValueError(f"VP8 declares {w}x{h} > max_pixels cap")
    body = payload[10:]
    if part1_size > len(body):
        raise ValueError("VP8 first partition overruns the payload")
    bd = BoolDecoder(body[:part1_size])
    hdr = _parse_header(bd, w, h)
    modes = _read_modes(bd, hdr)

    # token partition sizes: (n-1) 3-byte LE sizes after partition 1
    rest = body[part1_size:]
    parts = []
    if hdr.n_parts > 1:
        sizes_len = 3 * (hdr.n_parts - 1)
        if len(rest) < sizes_len:
            raise ValueError("VP8 partition size table truncated")
        off = sizes_len
        for i in range(hdr.n_parts - 1):
            sz = int.from_bytes(rest[3 * i: 3 * i + 3], "little")
            if off + sz > len(rest):
                raise ValueError("VP8 token partition overruns payload")
            parts.append(BoolDecoder(rest[off: off + sz]))
            off += sz
        parts.append(BoolDecoder(rest[off:]))
    else:
        parts.append(BoolDecoder(rest))
    return _reconstruct(hdr, modes, parts) + (w, h)


def _reconstruct(hdr: _FrameHeader, modes, parts):
    ymodes, uvmodes, submodes, skips, segs = modes
    mw, mh = hdr.mb_w, hdr.mb_h
    Y = np.zeros((mh * 16, mw * 16), np.uint8)
    U = np.zeros((mh * 8, mw * 8), np.uint8)
    V = np.zeros((mh * 8, mw * 8), np.uint8)
    probs = hdr.coef_probs
    # nonzero contexts: above per MB column, left reset per row
    ab = {"y": np.zeros(mw * 4, np.int8), "u": np.zeros(mw * 2, np.int8),
          "v": np.zeros(mw * 2, np.int8), "y2": np.zeros(mw, np.int8)}
    for my in range(mh):
        lf = {"y": np.zeros(4, np.int8), "u": np.zeros(2, np.int8),
              "v": np.zeros(2, np.int8), "y2": np.zeros(1, np.int8)}
        bd = parts[my % len(parts)]
        for mx in range(mw):
            q = (hdr.seg_quants[int(segs[my, mx])]
                 if hdr.seg_quants else hdr.quants)
            ym = int(ymodes[my, mx])
            has_y2 = ym != B_PRED
            if skips[my, mx]:
                # no tokens: all residuals zero; contexts reset
                # (incl. Y2 — documented convention, mirrored by the
                # encoder)
                ab["y"][mx * 4: mx * 4 + 4] = 0
                lf["y"][:] = 0
                ab["u"][mx * 2: mx * 2 + 2] = 0
                lf["u"][:] = 0
                ab["v"][mx * 2: mx * 2 + 2] = 0
                lf["v"][:] = 0
                if has_y2:
                    ab["y2"][mx] = 0
                    lf["y2"][0] = 0
                ycoef = np.zeros((16, 16), np.int64)
                ucoef = np.zeros((4, 16), np.int64)
                vcoef = np.zeros((4, 16), np.int64)
            else:
                ycoef = np.zeros((16, 16), np.int64)
                ucoef = np.zeros((4, 16), np.int64)
                vcoef = np.zeros((4, 16), np.int64)
                first = 0
                yplane = PLANE_Y_WITH_DC
                if has_y2:
                    ctx = int(ab["y2"][mx] + lf["y2"][0])
                    co, nz = decode_coeffs(bd, probs, PLANE_Y2, ctx, 0,
                                           q["y2_dc"], q["y2_ac"])
                    ab["y2"][mx] = lf["y2"][0] = 1 if nz else 0
                    dcs = iwht4x4(co)
                    first = 1
                    yplane = PLANE_Y_NO_DC
                for b in range(16):
                    r, c = divmod(b, 4)
                    ctx = int(ab["y"][mx * 4 + c] + lf["y"][r])
                    co, nz = decode_coeffs(bd, probs, yplane, ctx, first,
                                           q["y_dc"], q["y_ac"])
                    if has_y2:
                        co[0] = dcs[b]
                    ycoef[b] = co
                    ab["y"][mx * 4 + c] = lf["y"][r] = 1 if nz else 0
                for b in range(4):
                    r, c = divmod(b, 2)
                    ctx = int(ab["u"][mx * 2 + c] + lf["u"][r])
                    co, nz = decode_coeffs(bd, probs, PLANE_UV, ctx, 0,
                                           q["uv_dc"], q["uv_ac"])
                    ucoef[b] = co
                    ab["u"][mx * 2 + c] = lf["u"][r] = 1 if nz else 0
                for b in range(4):
                    r, c = divmod(b, 2)
                    ctx = int(ab["v"][mx * 2 + c] + lf["v"][r])
                    co, nz = decode_coeffs(bd, probs, PLANE_UV, ctx, 0,
                                           q["uv_dc"], q["uv_ac"])
                    vcoef[b] = co
                    ab["v"][mx * 2 + c] = lf["v"][r] = 1 if nz else 0
            _recon_mb(Y, U, V, my, mx, ym, int(uvmodes[my, mx]),
                      submodes.get((my, mx)), ycoef, ucoef, vcoef)
    return Y, U, V


def _edge(plane: np.ndarray, y0: int, x0: int, size: int):
    """(above, left, above_left) for a block at (y0, x0); None when
    outside, above_left defaults 127 on the top row else 129 on the
    left column (documented convention)."""
    above = plane[y0 - 1, x0: x0 + size].copy() if y0 > 0 else None
    left = plane[y0: y0 + size, x0 - 1].copy() if x0 > 0 else None
    if y0 > 0 and x0 > 0:
        al = int(plane[y0 - 1, x0 - 1])
    elif y0 > 0:
        al = 129
    else:
        al = 127
    return above, left, al


def _above_right4(Y, y0: int, x0: int, r: int, c: int,
                  a4) -> "np.ndarray":
    """Above-right 4 pixels for subblock (r, c) of the MB at
    (y0, x0), per RFC 6386 §12.3: interior columns read the
    up-right subblock's bottom row; the RIGHT MB column (c == 3)
    always reads the row ABOVE the macroblock at x0+16..x0+20 —
    the above-right MB's bottom row, already reconstructed in
    raster order and deliberately "stale" for rows 1-3 — never the
    undecoded right-neighbor MB; edges replicate the last above
    pixel."""
    by, bx = y0 + 4 * r, x0 + 4 * c
    if c < 3:
        if by > 0:
            return Y[by - 1, bx + 4: bx + 8].copy()
        return np.full(4, a4[-1], np.uint8)
    if y0 > 0 and x0 + 20 <= Y.shape[1]:
        return Y[y0 - 1, x0 + 16: x0 + 20].copy()
    return np.full(4, a4[-1], np.uint8)


def _recon_mb(Y, U, V, my, mx, ym, uvm, sub, ycoef, ucoef, vcoef):
    y0, x0 = my * 16, mx * 16
    if ym == B_PRED:
        for b in range(16):
            r, c = divmod(b, 4)
            by, bx = y0 + 4 * r, x0 + 4 * c
            above, left, al = _edge(Y, by, bx, 4)
            a4 = (np.full(4, 127, np.uint8) if above is None
                  else above.astype(np.uint8))
            ar = _above_right4(Y, y0, x0, r, c, a4)
            a8 = np.concatenate([a4, ar])
            l4 = (np.full(4, 129, np.uint8) if left is None
                  else left.astype(np.uint8))
            pred = predict_subblock(int(sub[r, c]), a8, l4, al)
            res = idct4x4(ycoef[b])
            Y[by: by + 4, bx: bx + 4] = np.clip(
                pred.astype(np.int64) + res, 0, 255).astype(np.uint8)
    else:
        above, left, al = _edge(Y, y0, x0, 16)
        pred = predict_block(ym, above, left, al, 16).astype(np.int64)
        for b in range(16):
            r, c = divmod(b, 4)
            res = idct4x4(ycoef[b])
            pred[4 * r: 4 * r + 4, 4 * c: 4 * c + 4] += res
        Y[y0: y0 + 16, x0: x0 + 16] = np.clip(pred, 0, 255).astype(np.uint8)
    cy, cx = my * 8, mx * 8
    for plane, coefs in ((U, ucoef), (V, vcoef)):
        above, left, al = _edge(plane, cy, cx, 8)
        pred = predict_block(uvm, above, left, al, 8).astype(np.int64)
        for b in range(4):
            r, c = divmod(b, 2)
            res = idct4x4(coefs[b])
            pred[4 * r: 4 * r + 4, 4 * c: 4 * c + 4] += res
        plane[cy: cy + 8, cx: cx + 8] = np.clip(pred, 0, 255).astype(np.uint8)


# ----------------------------------------------------- color / planes
def rgb_to_yuv420(rgb: np.ndarray):
    """RGB uint8 (h, w, 3) → BT.601 studio-swing YUV 4:2:0 (integer
    arithmetic; chroma = rounded 2x2 box average). Odd dimensions are
    edge-padded to even before subsampling."""
    x = rgb.astype(np.int32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = ((66 * r + 129 * g + 25 * b + 128) >> 8) + 16
    u = ((-38 * r - 74 * g + 112 * b + 128) >> 8) + 128
    v = ((112 * r - 94 * g - 18 * b + 128) >> 8) + 128
    h, w = y.shape
    if h % 2:
        u = np.vstack([u, u[-1:]])
        v = np.vstack([v, v[-1:]])
    if w % 2:
        u = np.hstack([u, u[:, -1:]])
        v = np.hstack([v, v[:, -1:]])
    u = (u[0::2, 0::2] + u[0::2, 1::2] + u[1::2, 0::2] + u[1::2, 1::2] + 2) >> 2
    v = (v[0::2, 0::2] + v[0::2, 1::2] + v[1::2, 0::2] + v[1::2, 1::2] + 2) >> 2
    clip = lambda p: np.clip(p, 0, 255).astype(np.uint8)  # noqa: E731
    return clip(y), clip(u), clip(v)


def yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """BT.601 studio-swing inverse; chroma upsampled by pixel
    replication (documented: libwebp's 'fancy' bilinear upsampler is
    a different, equally valid reconstruction)."""
    h, w = y.shape
    uu = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w]
    vv = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w]
    c = y.astype(np.int32) - 16
    d = uu.astype(np.int32) - 128
    e = vv.astype(np.int32) - 128
    r = (298 * c + 409 * e + 128) >> 8
    g = (298 * c - 100 * d - 208 * e + 128) >> 8
    b = (298 * c + 516 * d + 128) >> 8
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _pad_mb(plane: np.ndarray, mb: int) -> np.ndarray:
    h, w = plane.shape
    ph = (h + mb - 1) // mb * mb
    pw = (w + mb - 1) // mb * mb
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


# ------------------------------------------------------------ encoder
COEF_CLAMP = 2047  # cat6 ceiling (67 + 2^11 - 1 = 2114 > 2047 + dc)


def _quantize_block(dequant_target: np.ndarray, q_dc: int, q_ac: int,
                    first: int) -> np.ndarray:
    """Natural-order float targets → zigzag-order quantized ints."""
    out = np.zeros(16, dtype=np.int64)
    for c in range(first, 16):
        nat = ZIGZAG[c]
        q = q_dc if c == 0 else q_ac
        v = int(np.round(dequant_target[nat] / q))
        out[c] = max(-COEF_CLAMP, min(COEF_CLAMP, v))
    return out


def _dequantize(zz: np.ndarray, q_dc: int, q_ac: int) -> np.ndarray:
    nat = np.zeros(16, dtype=np.int64)
    for c in range(16):
        nat[ZIGZAG[c]] = zz[c] * (q_dc if c == 0 else q_ac)
    return nat


def encode_vp8(rgb: np.ndarray, qi: int = 12, ymode: int = DC_PRED,
               uvmode: int = DC_PRED, sub_mode: int = B_DC_PRED):
    """Closed-loop VP8 keyframe encoder over a fixed whole-frame mode
    choice (DC/V/H/TM 16x16, or B_PRED with ``sub_mode`` on every
    subblock — exercising any of the ten 4x4 predictors end to end).
    Returns ``(frame_bytes, expected_rgb)`` where expected_rgb is the
    EXACT decoder output (same integer inverse transforms + the same
    YUV→RGB path): lossy vs the source, bit-exact vs decode_vp8."""
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("encode_vp8 wants (h, w, 3) RGB")
    h, w = rgb.shape[:2]
    if not (1 <= w < 1 << 14 and 1 <= h < 1 << 14):
        raise ValueError("VP8 dimensions must be in [1, 16383]")
    ys, us, vs = rgb_to_yuv420(rgb)
    ys = _pad_mb(ys, 16)
    us = _pad_mb(us, 8)
    vs = _pad_mb(vs, 8)
    mh, mw = ys.shape[0] // 16, ys.shape[1] // 16
    q = quant_factors(qi)
    probs = _default_coef_probs()
    Y = np.zeros_like(ys)
    U = np.zeros_like(us)
    V = np.zeros_like(vs)
    has_y2 = ymode != B_PRED
    yplane = PLANE_Y_NO_DC if has_y2 else PLANE_Y_WITH_DC
    first = 1 if has_y2 else 0

    tokens = BoolEncoder()
    mode_bits = []  # (skip, submode grid) per MB, written after header
    ab = {"y": np.zeros(mw * 4, np.int8), "u": np.zeros(mw * 2, np.int8),
          "v": np.zeros(mw * 2, np.int8), "y2": np.zeros(mw, np.int8)}
    for my in range(mh):
        lf = {"y": np.zeros(4, np.int8), "u": np.zeros(2, np.int8),
              "v": np.zeros(2, np.int8), "y2": np.zeros(1, np.int8)}
        for mx in range(mw):
            y0, x0 = my * 16, mx * 16
            cy, cx = my * 8, mx * 8
            # ---- plan the MB: quantized coeffs + reconstruction
            yq = np.zeros((16, 16), np.int64)  # zigzag-quantized
            ydeq = np.zeros((16, 16), np.int64)
            if has_y2:
                above, left, al = _edge(Y, y0, x0, 16)
                pred = predict_block(ymode, above, left, al, 16).astype(
                    np.int64)
                res = ys[y0: y0 + 16, x0: x0 + 16].astype(np.int64) - pred
                dtargets = np.empty((16, 16))
                for b in range(16):
                    r, c = divmod(b, 4)
                    blk = res[4 * r: 4 * r + 4, 4 * c: 4 * c + 4]
                    dtargets[b] = _FDCT_MAT @ blk.reshape(16).astype(
                        np.float64)
                    yq[b] = _quantize_block(dtargets[b], 1, q["y_ac"], 1)
                    ydeq[b] = _dequantize(yq[b], 1, q["y_ac"])
                y2t = _FWHT_MAT @ dtargets[:, 0]
                y2q = _quantize_block(y2t, q["y2_dc"], q["y2_ac"], 0)
                y2deq = _dequantize(y2q, q["y2_dc"], q["y2_ac"])
                dcs = iwht4x4(y2deq)
                for b in range(16):
                    ydeq[b][0] = dcs[b]
                    r, c = divmod(b, 4)
                    rr = idct4x4(ydeq[b])
                    pred[4 * r: 4 * r + 4, 4 * c: 4 * c + 4] += rr
                Y[y0: y0 + 16, x0: x0 + 16] = np.clip(
                    pred, 0, 255).astype(np.uint8)
                skip = not (np.any(yq[:, 1:]) or np.any(y2q))
            else:
                y2q = None
                skip = True
                for b in range(16):
                    r, c = divmod(b, 4)
                    by, bx = y0 + 4 * r, x0 + 4 * c
                    above, left, al = _edge(Y, by, bx, 4)
                    a4 = (np.full(4, 127, np.uint8) if above is None
                          else above.astype(np.uint8))
                    ar = _above_right4(Y, y0, x0, r, c, a4)
                    a8 = np.concatenate([a4, ar])
                    l4 = (np.full(4, 129, np.uint8) if left is None
                          else left.astype(np.uint8))
                    pred = predict_subblock(sub_mode, a8, l4, al).astype(
                        np.int64)
                    blk = (ys[by: by + 4, bx: bx + 4].astype(np.int64)
                           - pred)
                    dt = _FDCT_MAT @ blk.reshape(16).astype(np.float64)
                    yq[b] = _quantize_block(dt, q["y_dc"], q["y_ac"], 0)
                    ydeq[b] = _dequantize(yq[b], q["y_dc"], q["y_ac"])
                    rr = idct4x4(ydeq[b])
                    Y[by: by + 4, bx: bx + 4] = np.clip(
                        pred + rr, 0, 255).astype(np.uint8)
                    if np.any(yq[b]):
                        skip = False
            uq = np.zeros((4, 16), np.int64)
            vq = np.zeros((4, 16), np.int64)
            for plane, src, qzz, rec in ((U, us, uq, U), (V, vs, vq, V)):
                above, left, al = _edge(rec, cy, cx, 8)
                pred = predict_block(uvmode, above, left, al, 8).astype(
                    np.int64)
                res = src[cy: cy + 8, cx: cx + 8].astype(np.int64) - pred
                for b in range(4):
                    r, c = divmod(b, 2)
                    blk = res[4 * r: 4 * r + 4, 4 * c: 4 * c + 4]
                    dt = _FDCT_MAT @ blk.reshape(16).astype(np.float64)
                    qzz[b] = _quantize_block(dt, q["uv_dc"], q["uv_ac"], 0)
                    deq = _dequantize(qzz[b], q["uv_dc"], q["uv_ac"])
                    rr = idct4x4(deq)
                    pred[4 * r: 4 * r + 4, 4 * c: 4 * c + 4] += rr
                rec[cy: cy + 8, cx: cx + 8] = np.clip(
                    pred, 0, 255).astype(np.uint8)
                if np.any(qzz):
                    skip = False
            mode_bits.append(skip)
            # ---- emit tokens (mirrors _reconstruct's context flow)
            if skip:
                ab["y"][mx * 4: mx * 4 + 4] = 0
                lf["y"][:] = 0
                ab["u"][mx * 2: mx * 2 + 2] = 0
                lf["u"][:] = 0
                ab["v"][mx * 2: mx * 2 + 2] = 0
                lf["v"][:] = 0
                if has_y2:
                    ab["y2"][mx] = 0
                    lf["y2"][0] = 0
                continue
            if has_y2:
                ctx = int(ab["y2"][mx] + lf["y2"][0])
                eob = encode_coeffs(tokens, probs, PLANE_Y2, ctx, 0, y2q)
                ab["y2"][mx] = lf["y2"][0] = 1 if eob > 0 else 0
            for b in range(16):
                r, c = divmod(b, 4)
                ctx = int(ab["y"][mx * 4 + c] + lf["y"][r])
                eob = encode_coeffs(tokens, probs, yplane, ctx, first,
                                    yq[b])
                ab["y"][mx * 4 + c] = lf["y"][r] = 1 if eob > first else 0
            for key, qzz in (("u", uq), ("v", vq)):
                for b in range(4):
                    r, c = divmod(b, 2)
                    ctx = int(ab[key][mx * 2 + c] + lf[key][r])
                    eob = encode_coeffs(tokens, probs, PLANE_UV, ctx, 0,
                                        qzz[b])
                    ab[key][mx * 2 + c] = lf[key][r] = 1 if eob > 0 else 0

    # ---- first partition: header then per-MB modes
    be = BoolEncoder()
    be.write_literal(0, 1)  # color space
    be.write_literal(0, 1)  # clamping
    be.write_literal(0, 1)  # segmentation off
    be.write_literal(0, 1)  # filter type
    be.write_literal(0, 6)  # loop filter level 0 (no filtering)
    be.write_literal(0, 3)  # sharpness
    be.write_literal(0, 1)  # lf adjustments off
    be.write_literal(0, 2)  # one token partition
    be.write_literal(qi, 7)
    for _ in range(5):
        be.write_literal(0, 1)  # no quantizer deltas
    be.write_literal(1, 1)  # refresh entropy probs
    # "no update" flags, written with the SAME per-position §13.4
    # probabilities the decoder reads them with (installed or flat) —
    # token coding then uses the default table on both sides
    for pi in range(4):
        for pj in range(N_BANDS):
            for pk in range(N_CTX):
                for pm in range(N_PROBS):
                    be.write_bool(_update_prob(pi, pj, pk, pm), 0)
    be.write_literal(1, 1)  # mb_no_coeff_skip on
    be.write_literal(128, 8)  # prob_skip_false
    i = 0
    # mirror the decoder's above/left 4x4-submode context tracking
    # (§11.5) so context-conditioned tables stay closed-loop
    above_sub = np.full((mw, 4), B_DC_PRED, np.int32)
    for my in range(mh):
        left_sub = np.full(4, B_DC_PRED, np.int32)
        for mx in range(mw):
            be.write_bool(128, 1 if mode_bits[i] else 0)
            i += 1
            be.write_tree(KF_YMODE_TREE, KF_YMODE_PROB, ymode)
            if ymode == B_PRED:
                sub = np.full((4, 4), sub_mode, np.int32)
                for r in range(4):
                    for c in range(4):
                        a = sub[r - 1, c] if r else above_sub[mx, c]
                        l = sub[r, c - 1] if c else left_sub[r]
                        be.write_tree(
                            BMODE_TREE, _kf_bmode(int(a), int(l)),
                            sub_mode,
                        )
                above_sub[mx] = sub[3]
                left_sub[:] = sub[:, 3]
            else:
                implied = {DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED,
                           H_PRED: B_HE_PRED, TM_PRED: B_TM_PRED}[ymode]
                above_sub[mx] = implied
                left_sub[:] = implied
            be.write_tree(UV_MODE_TREE, KF_UV_MODE_PROB, uvmode)
    part1 = be.finish()
    toks = tokens.finish()

    tag = (0 | (0 << 1) | (1 << 4) | (len(part1) << 5))
    frame = (tag.to_bytes(3, "little") + b"\x9d\x01\x2a"
             + (w & 0x3FFF).to_bytes(2, "little")
             + (h & 0x3FFF).to_bytes(2, "little") + part1 + toks)
    expected = yuv_to_rgb(Y[:h, :w], U[: (h + 1) // 2, : (w + 1) // 2],
                          V[: (h + 1) // 2, : (w + 1) // 2])
    return frame, expected


def encode_webp_vp8(rgb: np.ndarray, qi: int = 12, **kw):
    """RIFF/WebP container around an encode_vp8 frame. Returns
    (payload, expected_rgb)."""
    frame, expected = encode_vp8(rgb, qi=qi, **kw)
    pad = b"\x00" if len(frame) % 2 else b""
    chunk = b"VP8 " + struct.pack("<I", len(frame)) + frame + pad
    riff = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    return riff, expected


def decode_webp_vp8(payload: bytes, max_pixels: int = 1 << 24) -> np.ndarray:
    """RIFF/WebP with a 'VP8 ' (lossy keyframe) chunk → RGB."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos: pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if tag == b"VP8 ":
            body = payload[pos + 8: pos + 8 + size]
            if len(body) < size:
                raise ValueError("VP8 chunk truncated")
            return decode_vp8(body, max_pixels=max_pixels)
        pos += 8 + size + (size & 1)
    raise ValueError("WebP without a VP8 chunk")
