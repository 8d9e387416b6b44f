"""Lossy-WebP (VP8 intra keyframe) codec tests.

The codec is closed-loop (vp8_codec.py module docstring): the
encoder returns the EXACT reconstruction the decoder must produce,
so the primary contract here is bit-exact ``decode == expected``
across every prediction mode, plus PSNR floors against the source,
bounded-work guarantees on adversarial payloads, and the
multimodal-dispatch integration."""

import math

import numpy as np
import pytest

from serd_spark.operators import multimodal
from serd_spark.operators import vp8_codec as vc


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 10 * math.log10(255 * 255 / max(mse, 1e-9))


def _img(h: int, w: int, seed: int) -> np.ndarray:
    """Smooth block image (8x8 constant tiles) — the shape real
    photos have after downscaling; random per-pixel noise is the
    wrong fixture for a lossy codec (chroma subsampling alone
    destroys it)."""
    r = np.random.default_rng(seed)
    base = r.integers(0, 256, (max(1, (h + 7) // 8),
                               max(1, (w + 7) // 8), 3)).astype(float)
    return np.kron(base, np.ones((8, 8, 1)))[:h, :w].astype(np.uint8)


# ------------------------------------------------------- bool coder
def test_bool_coder_round_trip():
    rng = np.random.default_rng(0)
    for trial in range(20):
        n = int(rng.integers(1, 400))
        probs = rng.integers(1, 255, n)
        bits = rng.integers(0, 2, n)
        be = vc.BoolEncoder()
        for p, b in zip(probs, bits):
            be.write_bool(int(p), int(b))
        data = be.finish()
        bd = vc.BoolDecoder(data)
        got = [bd.read_bool(int(p)) for p in probs]
        assert got == list(bits)


def test_bool_literals_and_trees():
    be = vc.BoolEncoder()
    be.write_literal(93, 7)
    be.write_signed(-11, 6)
    for leaf in range(10):
        be.write_tree(vc.BMODE_TREE, vc.KF_BMODE_PROB_FLAT, leaf)
    for tok in range(12):
        be.write_tree(vc.COEF_TREE, [128] * 11, tok)
    data = be.finish()
    bd = vc.BoolDecoder(data)
    assert bd.read_literal(7) == 93
    assert bd.read_signed(6) == -11
    for leaf in range(10):
        assert bd.read_tree(vc.BMODE_TREE, vc.KF_BMODE_PROB_FLAT) == leaf
    for tok in range(12):
        assert bd.read_tree(vc.COEF_TREE, [128] * 11) == tok


# ------------------------------------------------------- transforms
def test_idct_dc_only_is_constant():
    co = np.zeros(16, dtype=np.int64)
    co[0] = 100
    out = vc.idct4x4(co)
    assert (out == (100 + 4) >> 3).all()
    assert (vc.idct4x4(np.zeros(16, dtype=np.int64)) == 0).all()


def test_fdct_is_idct_inverse_through_quant():
    rng = np.random.default_rng(2)
    for _ in range(30):
        blk = rng.integers(-255, 256, 16).astype(np.int64)
        dt = vc._FDCT_MAT @ blk.astype(float)
        qz = vc._quantize_block(dt, 4, 4, 0)
        rec = vc.idct4x4(vc._dequantize(qz, 4, 4)).reshape(16)
        # q=4 is the finest quantizer: reconstruction within ±3
        assert np.abs(rec - blk).max() <= 3


def test_quant_factor_invariants():
    q0 = vc.quant_factors(0)
    assert q0["y2_ac"] == 8  # the *155/100 floor
    q_hi = vc.quant_factors(127)
    assert q_hi["uv_dc"] == 132  # chroma DC clamp
    assert q_hi["y2_dc"] == 2 * vc.DC_QLOOKUP[127]
    # monotone lookups
    assert list(vc.DC_QLOOKUP) == sorted(vc.DC_QLOOKUP)
    assert list(vc.AC_QLOOKUP) == sorted(vc.AC_QLOOKUP)


# ------------------------------------------------ closed-loop decode
@pytest.mark.parametrize("ymode", [vc.DC_PRED, vc.V_PRED, vc.H_PRED,
                                   vc.TM_PRED])
def test_round_trip_16x16_modes(ymode):
    img = _img(33, 47, 10 + ymode)
    frame, expected = vc.encode_vp8(img, qi=6, ymode=ymode, uvmode=ymode)
    dec = vc.decode_vp8(frame)
    assert np.array_equal(dec, expected)
    assert _psnr(dec, img) > 30


@pytest.mark.parametrize("sub_mode", range(10))
def test_round_trip_all_4x4_submodes(sub_mode):
    img = _img(20, 24, 50 + sub_mode)
    frame, expected = vc.encode_vp8(
        img, qi=6, ymode=vc.B_PRED, sub_mode=sub_mode)
    dec = vc.decode_vp8(frame)
    assert np.array_equal(dec, expected)
    assert _psnr(dec, img) > 28


def test_round_trip_edge_dimensions():
    for h, w in [(1, 1), (16, 16), (15, 17), (1, 64), (48, 1)]:
        img = _img(h, w, h * 100 + w)
        frame, expected = vc.encode_vp8(img, qi=10)
        assert np.array_equal(vc.decode_vp8(frame), expected)


def test_quality_ladder():
    """Coarser quantizers: payload shrinks, PSNR drops, decode stays
    bit-exact vs the closed loop."""
    img = _img(48, 64, 7)
    sizes, psnrs = [], []
    for qi in (4, 40, 100):
        frame, expected = vc.encode_vp8(img, qi=qi)
        dec = vc.decode_vp8(frame)
        assert np.array_equal(dec, expected)
        sizes.append(len(frame))
        psnrs.append(_psnr(dec, img))
    assert sizes[0] > sizes[1] > sizes[2]
    assert psnrs[0] > psnrs[1] >= psnrs[2]


def test_webp_container_round_trip():
    img = _img(32, 32, 9)
    payload, expected = vc.encode_webp_vp8(img, qi=8)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WEBP"
    assert np.array_equal(vc.decode_webp_vp8(payload), expected)
    # multimodal dispatch: decode_image + probe + strict features
    assert np.array_equal(multimodal.decode_image(payload), expected)
    pr = multimodal.probe_payload(payload)
    assert (pr["container"], pr["width"], pr["height"]) == ("webp", 32, 32)
    feats = multimodal.payload_features(payload, strict=True)
    assert feats.shape[0] == multimodal.FEATURE_DIM


# ------------------------------------------------------ adversarial
def test_dimension_bomb_rejected_before_decode():
    img = _img(16, 16, 3)
    frame, _ = vc.encode_vp8(img, qi=6)
    bomb = bytearray(frame)
    bomb[6:8] = (16383).to_bytes(2, "little")
    bomb[8:10] = (16383).to_bytes(2, "little")
    with pytest.raises(ValueError, match="max_pixels"):
        vc.decode_vp8(bytes(bomb))


def test_corruption_fuzz_bounded():
    """Random byte flips + truncations either decode to SOME valid
    uint8 image or raise ValueError — never hang, never leak numpy
    index errors through the Arrow boundary."""
    rng = np.random.default_rng(11)
    img = _img(24, 24, 4)
    frame, _ = vc.encode_vp8(img, qi=6)
    for _ in range(60):
        b = bytearray(frame)
        for _ in range(int(rng.integers(1, 5))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        try:
            out = vc.decode_vp8(bytes(b))
            assert out.dtype == np.uint8 and out.ndim == 3
        except ValueError:
            pass
    for cut in range(0, len(frame), 11):
        try:
            vc.decode_vp8(frame[:cut])
        except ValueError:
            pass


def test_interframe_and_bad_magic_rejected():
    img = _img(16, 16, 5)
    frame, _ = vc.encode_vp8(img, qi=6)
    inter = bytearray(frame)
    inter[0] |= 1  # frame_type = interframe
    with pytest.raises(ValueError, match="interframe"):
        vc.decode_vp8(bytes(inter))
    nostart = bytearray(frame)
    nostart[3] = 0
    with pytest.raises(ValueError, match="start code"):
        vc.decode_vp8(bytes(nostart))
    with pytest.raises(ValueError):
        vc.decode_webp_vp8(b"RIFF\x00\x00\x00\x00WEBPVP8L\x00\x00\x00\x00")


# --------------------------------------------- table injection API
def _synthetic_tables():
    """Deterministic non-flat tables with the spec shapes — stand-ins
    proving the injection is wired through every site (the real §13.4
    / §13.5 / §11.5 constants are data this sandbox lacks)."""
    r = np.random.default_rng(0xF00D)
    coef = r.integers(1, 256, (4, vc.N_BANDS, vc.N_CTX, vc.N_PROBS))
    upd = r.integers(200, 256, (4, vc.N_BANDS, vc.N_CTX, vc.N_PROBS))
    bmode = r.integers(1, 256, (10, 10, 9))
    return (coef.tolist(), upd.tolist(), bmode.tolist())


def test_injected_tables_round_trip_and_change_bits():
    """With non-flat tables installed, encode→decode stays bit-exact
    (every site reads the hooks on both sides), the emitted stream
    differs from the flat-table stream (the constants are live, not
    dead config), and reset restores flat behavior exactly."""
    img = _img(48, 32, seed=9)
    vc.reset_default_tables()
    try:
        flat_frame, flat_expected = vc.encode_vp8(
            img, qi=8, ymode=vc.B_PRED, sub_mode=vc.B_VE_PRED
        )
        assert np.array_equal(vc.decode_vp8(flat_frame), flat_expected)

        coef, upd, bmode = _synthetic_tables()
        vc.install_default_tables(
            coef_probs=coef, coef_update_probs=upd, kf_bmode_probs=bmode
        )
        assert all(vc.tables_installed().values())
        inj_frame, inj_expected = vc.encode_vp8(
            img, qi=8, ymode=vc.B_PRED, sub_mode=vc.B_VE_PRED
        )
        assert np.array_equal(vc.decode_vp8(inj_frame), inj_expected)
        # same reconstruction (tables change coding, not math) …
        assert np.array_equal(inj_expected, flat_expected)
        # … but different bits: the tables are actually consulted
        assert inj_frame != flat_frame
    finally:
        vc.reset_default_tables()
    # flat behavior restored bit-exactly
    again, _ = vc.encode_vp8(
        img, qi=8, ymode=vc.B_PRED, sub_mode=vc.B_VE_PRED
    )
    assert again == flat_frame


def test_injected_tables_validation():
    vc.reset_default_tables()
    with pytest.raises(ValueError, match="kf_bmode"):
        vc.install_default_tables(kf_bmode_probs=[[[128] * 9] * 10] * 9)
    with pytest.raises(ValueError, match="in \\[1, 255\\]"):
        bad = [[[[0] * vc.N_PROBS] * vc.N_CTX] * vc.N_BANDS] * 4
        vc.install_default_tables(coef_probs=bad)
    assert not any(vc.tables_installed().values())


def test_thirdparty_fixture_decodes_if_provided():
    """Drop-in path for the real constants (VERDICT r4 #4): place
    tests/fixtures/vp8_tables.json ({"coef_probs": …,
    "coef_update_probs": …, "kf_bmode_probs": …}) plus
    tests/fixtures/vp8_thirdparty.webp and its expected RGB as
    vp8_thirdparty_rgb.npy (reference-decoded pixels), and this test
    certifies reference-identical decode of a non-self-encoded
    stream. Skipped until the data exists — the spec appendix is
    data this sandbox cannot synthesize."""
    import json
    import os

    fdir = os.path.join(os.path.dirname(__file__), "fixtures")
    tables = os.path.join(fdir, "vp8_tables.json")
    webp = os.path.join(fdir, "vp8_thirdparty.webp")
    rgb = os.path.join(fdir, "vp8_thirdparty_rgb.npy")
    if not (os.path.exists(tables) and os.path.exists(webp)
            and os.path.exists(rgb)):
        pytest.skip("real VP8 default tables / fixture not available")
    vc.reset_default_tables()
    try:
        with open(tables) as f:
            vc.install_default_tables(**json.load(f))
        with open(webp, "rb") as f:
            payload = f.read()
        got = vc.decode_webp_vp8(payload)
        want = np.load(rgb)
        assert np.array_equal(got, want)
    finally:
        vc.reset_default_tables()
