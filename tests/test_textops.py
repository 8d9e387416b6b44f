"""Text analysis + dedup + similarity + multimodal operators."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from serd_spark.operators import dedup, multimodal, similarity, text


@pytest.fixture()
def docs(spark):
    rows = [
        (0, "the cat and the hat is on the mat", "en"),
        (1, "The cat and the hat  is on the mat", "en"),  # ws/case dup of 0
        (2, "le chat et les chapeaux des rues", "fr"),
        (3, "el gato que vive en los tejados una vez", "es"),
        (4, "zzz qqq xxx", "xx"),
        (5, "the cat and the hat is on the mat today", "en"),  # near-dup of 0
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_token_count(spark, docs):
    got = {r.doc_id: r.n for r in docs.select(
        "doc_id", text.token_count(F.col("text")).alias("n")).collect()}
    assert got[0] == 9
    assert got[4] == 3
    empty = spark.createDataFrame([(9, "   ")], ["doc_id", "text"])
    assert empty.select(text.token_count(F.col("text")).alias("n")).first().n == 0


def test_lang_id(docs):
    got = {r.doc_id: r.l for r in docs.select(
        "doc_id", text.lang_id(F.col("text")).alias("l")).collect()}
    assert got[0] == "en"
    assert got[2] == "fr"
    assert got[3] == "es"
    assert got[4] == "und"


def test_fingerprint_normalizes(docs):
    fp = {r.doc_id: r.f for r in docs.select(
        "doc_id", text.fingerprint(F.col("text")).alias("f")).collect()}
    assert fp[0] == fp[1]
    assert fp[0] != fp[5]


def test_quality_features(docs):
    row = text.quality_features(docs).filter(F.col("doc_id") == 0).first()
    assert row.q_tokens == 9
    assert row.q_chars == len("the cat and the hat is on the mat")
    assert 0 <= row.q_stopword_ratio <= 1
    assert row.q_mean_word_len == pytest.approx(
        len("thecatandthehatisonthemat") / 9, abs=1e-5
    )


def test_shingle_fingerprints(docs):
    out = docs.select(
        "doc_id", text.shingle_fingerprints(F.col("text"), k=5).alias("sh")
    )
    got = {r.doc_id: r.sh for r in out.collect()}
    assert len(got[0]) == 9 - 5 + 1
    assert got[4] == []  # fewer than k tokens
    # shared windows between near-dups overlap
    assert len(set(got[0]) & set(got[5])) > 0


def test_exact_dedup(docs):
    reps = dedup.exact_dedup(docs)
    groups = {r.rep_id: r.n_dups for r in reps.collect()}
    assert groups[0] == 2  # doc 1 collapses into doc 0
    kept = {r.doc_id for r in dedup.drop_exact_dups(docs).collect()}
    assert kept == {0, 2, 3, 4, 5}


def test_minhash_near_dups(docs):
    pairs = dedup.minhash_near_dups(docs, threshold=0.4)
    got = {(r.entity_a, r.entity_b) for r in pairs.collect()}
    assert ("0", "1") in got
    assert ("0", "5") in got or ("5", "0") in got
    assert not any("4" in p for pair in got for p in pair)


def test_simhash_near_dups(spark, docs):
    sigs = {r.doc_id: r.simhash for r in
            dedup.simhash_signatures(docs).collect()}
    assert sigs[0] == sigs[1]  # distinct-token sets identical after ws change
    pairs = dedup.simhash_near_dups(docs, max_hamming=10)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 1) in got


def test_ngram_jaccard(spark, docs):
    pairs = spark.createDataFrame([(0, 1), (0, 4)], ["id_a", "id_b"])
    out = {(r.id_a, r.id_b): r.jaccard
           for r in dedup.ngram_jaccard_pairs(pairs, docs).collect()}
    assert out[(0, 1)] == 1.0  # normalization collapses ws/case
    assert out[(0, 4)] < 0.2


@pytest.fixture()
def emb(spark):
    rng = np.random.default_rng(3)
    base = rng.standard_normal(16)
    rows = []
    for i in range(40):
        if i < 3:  # 3 vectors near the base
            v = base + 0.01 * rng.standard_normal(16)
        else:
            v = rng.standard_normal(16)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk(emb):
    q = emb.filter(F.col("vec_id") == 0).first().embedding
    top = similarity.brute_force_topk(emb, list(q), k=3).collect()
    assert top[0].vec_id == 0 and top[0].cos == pytest.approx(1.0, abs=1e-4)
    assert {r.vec_id for r in top} == {0, 1, 2}


def test_ivf_topk_matches_brute_force_on_probe_hit(emb):
    cents = similarity.train_centroids(emb, n_centroids=4, sample_rows=40)
    assigned = similarity.assign_centroids(emb, cents)
    assert assigned.count() == 40
    q = emb.filter(F.col("vec_id") == 0).first().embedding
    top = similarity.ivf_topk(assigned, cents, list(q), k=3, n_probe=2).collect()
    assert top[0].vec_id == 0
    assert {r.vec_id for r in top} == {0, 1, 2}


def test_embedding_near_dups(emb):
    pairs = dedup.embedding_near_dups(emb, dim=16, threshold=0.95, n_planes=6)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 1) in got and (0, 2) in got and (1, 2) in got


def test_multimodal_features_and_plans(spark):
    media = multimodal.synthesize_media(spark, 32)
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 32
    assert all(len(r.feature) == multimodal.FEATURE_DIM for r in rows)
    # determinism across two runs
    again = {r.media_id: r.feature for r in
             multimodal.extract_features(media).collect()}
    assert all(again[r.media_id] == r.feature for r in rows)

    plan = multimodal.resize_plan(media, max_side=128)
    for r in plan.filter(F.col("width").isNotNull()).collect():
        assert max(r.out_w, r.out_h) <= 128 or r.scale == 1.0

    frames = multimodal.frame_sample_plan(media, every_ms=5000)
    assert frames.filter(F.col("frame_ts_ms") % 5000 != 0).count() == 0

    with pytest.raises(Exception, match="NotImplementedError|image decode"):
        multimodal.extract_features(media, strict=True).collect()


def test_train_centroids_layout_invariant(spark):
    """The k-means sample is a pure function of ids (xxhash64-ordered
    top-N), so centroids must be identical across partition layouts."""
    import numpy as np

    from serd_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = similarity.train_centroids(emb.repartition(1), n_centroids=4,
                                   sample_rows=64)
    b = similarity.train_centroids(emb.repartition(13, "vec_id"),
                                   n_centroids=4, sample_rows=64)
    assert np.array_equal(a, b)


def test_bmp_roundtrip():
    import numpy as np

    rng = np.random.default_rng(3)
    for w, h in [(1, 1), (3, 2), (8, 8), (5, 7)]:  # odd widths → padding
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(multimodal.decode_bmp(multimodal.encode_bmp(px)), px)


def test_png_roundtrip():
    import numpy as np

    rng = np.random.default_rng(5)
    for shape in [(1, 1, 3), (2, 3, 3), (7, 5, 4), (8, 8, 1), (4, 4, 2)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = multimodal.decode_png(multimodal.encode_png(px))
        assert np.array_equal(out, px.reshape(shape[0], shape[1], shape[2]))


def test_png_all_filter_types():
    """Our encoder emits filter 0, but arbitrary PNGs use Sub/Up/
    Average/Paeth — hand-build a stream per filter type and check the
    unfilter math against the spec's reconstruction functions."""
    import struct
    import zlib

    import numpy as np

    rng = np.random.default_rng(6)
    px = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
    h, w, ch = px.shape
    for ft in (1, 2, 3, 4):
        # forward-filter each row with type ft (spec §9.2)
        rows = []
        prev = np.zeros(w * ch, dtype=np.int32)
        for y in range(h):
            cur = px[y].reshape(-1).astype(np.int32)
            filt = np.empty(w * ch, dtype=np.int32)
            for x in range(w * ch):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if ft == 1:
                    pred = a
                elif ft == 2:
                    pred = b
                elif ft == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c
                    )
                filt[x] = (cur[x] - pred) & 0xFF
            rows.append(bytes([ft]) + filt.astype(np.uint8).tobytes())
            prev = cur
        body = b"".join(rows)

        def chunk(tag, data):
            c = tag + data
            return struct.pack(">I", len(data)) + c + struct.pack(
                ">I", zlib.crc32(c)
            )

        payload = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(body))
            + chunk(b"IEND", b"")
        )
        assert np.array_equal(multimodal.decode_png(payload), px), ft


def test_png_features_real_content():
    """A solid-color PNG must yield its exact channel means — the
    PNG path derives features from decoded pixels, not digest fakes."""
    import numpy as np

    px = np.zeros((6, 6, 3), dtype=np.uint8)
    px[..., 2] = 255  # pure blue
    f = multimodal.payload_features(multimodal.encode_png(px))
    assert abs(f[2] - 1.0) < 1e-9 and abs(f[0]) < 1e-9 and abs(f[1]) < 1e-9
    # strict mode no longer raises for PNG
    f2 = multimodal.payload_features(
        multimodal.encode_png(px), strict=True
    )
    assert np.array_equal(f, f2)
    # corrupt PNG still falls back (lax) / raises (strict)
    bad = b"\x89PNG\r\n\x1a\n" + b"junkjunkjunk"
    assert np.array_equal(
        multimodal.payload_features(bad), multimodal._fake_decode(bad)
    )
    import pytest

    with pytest.raises(Exception):
        multimodal.payload_features(bad, strict=True)


def test_wav_roundtrip():
    import numpy as np

    rng = np.random.default_rng(4)
    s = rng.integers(-32768, 32767, size=777, dtype=np.int16)
    out, rate = multimodal.decode_wav(multimodal.encode_wav(s, 8000))
    assert rate == 8000
    assert np.array_equal(out, s)


def test_real_content_features():
    """A solid-color BMP must yield its exact channel means — proves
    features derive from decoded pixel content, not digest fakes."""
    import numpy as np

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[..., 0] = 255  # pure red
    f = multimodal.payload_features(multimodal.encode_bmp(px))
    assert abs(f[0] - 1.0) < 1e-9 and abs(f[1]) < 1e-9 and abs(f[2]) < 1e-9
    # silent WAV → zero RMS; loud sine → nonzero RMS
    silent = multimodal.encode_wav(np.zeros(100, dtype=np.int16))
    assert multimodal.payload_features(silent)[0] == 0.0
    t = np.arange(800)
    sine = multimodal.encode_wav(
        (np.sin(2 * np.pi * 440 * t / 8000) * 12000).astype(np.int16)
    )
    # amplitude 12000/32768 ≈ 0.366 → RMS ≈ 0.366/√2 ≈ 0.259
    assert abs(multimodal.payload_features(sine)[0] - 0.259) < 0.01


def test_payload_features_bm_magic_fallback():
    """Arbitrary binary starting with 'BM'/'RIFF' magic must not kill
    lax feature extraction — it falls back to the digest fake (and
    still raises under strict)."""
    import hashlib

    import numpy as np
    import pytest

    fake_bmp = b"BM" + hashlib.blake2b(b"x").digest() * 4
    f = multimodal.payload_features(fake_bmp)  # must not raise
    assert np.array_equal(f, multimodal._fake_decode(fake_bmp))
    truncated = multimodal.encode_bmp(
        np.zeros((4, 4, 3), dtype=np.uint8)
    )[:20]
    assert multimodal.payload_features(truncated) is not None
    with pytest.raises(Exception):
        multimodal.payload_features(fake_bmp, strict=True)


def test_jpeg_roundtrip_lossy():
    """Baseline JPEG encode→decode: near-lossless at q100 4:4:4,
    bounded error with 4:2:0 subsampling and restart markers."""
    import numpy as np

    from serd_spark.operators import jpeg_codec as jc

    # solid color survives exactly
    px = np.zeros((16, 16, 3), dtype=np.uint8)
    px[..., 0], px[..., 1], px[..., 2] = 200, 50, 120
    assert np.array_equal(jc.decode_jpeg(jc.encode_jpeg(px, quality=100)), px)

    # q100 4:4:4: only DCT float rounding (≤2/255 per sample)
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    out = jc.decode_jpeg(jc.encode_jpeg(px, quality=100))
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 2

    # smooth gradient through 4:2:0 + restart markers: small mean err
    gx = np.linspace(0, 255, 33)[None, :].repeat(40, 0)
    gy = np.linspace(0, 255, 40)[:, None].repeat(33, 1)
    px = np.stack([gx, gy, (gx + gy) / 2], axis=2).astype(np.uint8)
    for kwargs in ({"subsample": True}, {"restart_interval": 2},
                   {"subsample": True, "restart_interval": 3}):
        out = jc.decode_jpeg(jc.encode_jpeg(px, quality=92, **kwargs))
        assert np.abs(out.astype(int) - px.astype(int)).mean() < 4.0

    # grayscale broadcasts to RGB
    g = rng.integers(0, 256, size=(12, 12), dtype=np.uint8)
    out = jc.decode_jpeg(jc.encode_jpeg(g, quality=100))
    assert out.shape == (12, 12, 3)
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 2

    # determinism: same pixels → same bytes → same features
    assert jc.encode_jpeg(px, quality=92) == jc.encode_jpeg(px, quality=92)


def test_jpeg_features_and_fallback():
    """JPEG features derive from decoded pixels; corrupt/progressive
    payloads fall back (lax) or raise (strict)."""
    import numpy as np
    import pytest

    from serd_spark.operators import jpeg_codec as jc

    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[..., 1] = 255  # pure green
    f = multimodal.payload_features(jc.encode_jpeg(px, quality=100))
    assert abs(f[1] - 1.0) < 1e-9 and abs(f[0]) < 1e-9 and abs(f[2]) < 1e-9
    f2 = multimodal.payload_features(
        jc.encode_jpeg(px, quality=100), strict=True
    )
    assert np.array_equal(f, f2)

    bad = b"\xff\xd8" + b"garbage data here"
    assert np.array_equal(
        multimodal.payload_features(bad), multimodal._fake_decode(bad)
    )
    with pytest.raises(Exception):
        multimodal.payload_features(bad, strict=True)


def test_image_decoders_fuzz_crash_free():
    """Random/truncated bytes through every image decoder must raise
    cleanly (ValueError/NotImplementedError) or decode — never hang —
    and payload_features must always fall back in lax mode."""
    import hashlib
    import zlib
    from struct import error as struct_error

    import numpy as np

    from serd_spark.operators import jpeg_codec as jc

    rng = np.random.default_rng(11)
    real = [
        multimodal.encode_bmp(
            rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
        ),
        multimodal.encode_png(
            rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
        ),
        jc.encode_jpeg(
            rng.integers(0, 256, size=(10, 9, 3), dtype=np.uint8)
        ),
        multimodal.encode_gif(
            rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
        ),
    ]
    payloads = []
    for r in real:
        for cut in (3, 10, len(r) // 2, len(r) - 2):
            payloads.append(r[:cut])
        # bit-flip corruption
        b = bytearray(r)
        for k in range(0, len(b), 7):
            b[k] ^= 0xA5
        payloads.append(bytes(b))
    for i in range(30):
        junk = hashlib.blake2b(bytes([i]), digest_size=32).digest() * 8
        payloads.append(b"\x89PNG\r\n\x1a\n" + junk)
        payloads.append(b"\xff\xd8" + junk)
        payloads.append(b"BM" + junk)
        payloads.append(b"GIF89a" + junk)
    for p in payloads:
        for dec in (multimodal.decode_bmp, multimodal.decode_png,
                    multimodal.decode_gif, jc.decode_jpeg):
            try:
                dec(p)
            except (ValueError, NotImplementedError, IndexError,
                    KeyError, struct_error, zlib.error, OSError):
                pass
        f = multimodal.payload_features(p)  # lax: never raises
        assert len(f) == multimodal.FEATURE_DIM



def test_probe_media_containers(spark):
    """Byte-level container probing over the synthetic media table:
    every probed value must equal the generator's declared metadata;
    junk payloads probe as 'unknown' in lax mode and raise in
    strict."""
    import pytest

    media = multimodal.synthesize_media(spark, 48)
    probed = {r.media_id: r for r in
              multimodal.probe_media(media).collect()}
    declared = {r.media_id: r for r in media.collect()}
    assert len(probed) == 48
    for mid, d in declared.items():
        p = probed[mid]
        if d.kind == "image":
            assert p.container in ("bmp", "png", "gif", "jpeg", "webp")
            assert (p.width, p.height) == (d.width, d.height)
        elif d.kind == "audio":
            n = 8000 * d.duration_ms // 1000 // 50
            assert p.container == "wav"
            assert p.duration_ms == n * 1000 // 8000
        else:
            assert p.container == "mp4"
            assert p.duration_ms == d.duration_ms
            assert p.width == 320 + (mid % 8) * 16
            assert p.n_tracks == (1 if mid % 8 == 0 else 2)

    junk = spark.createDataFrame(
        [(99, bytearray(b"not a media payload at all"))],
        "media_id long, payload binary",
    )
    lax = multimodal.probe_media(junk).first()
    assert lax.container == "unknown" and lax.width is None
    with pytest.raises(Exception):
        multimodal.probe_media(junk, strict=True).collect()


def test_mp4_probe_fuzz():
    """Truncated/corrupt MP4 boxes raise cleanly, never hang."""
    import pytest

    p = multimodal.encode_mp4_meta(5000, width=64, height=48)
    for cut in (3, 9, 15, len(p) // 2, len(p) - 3):
        with pytest.raises(Exception):
            multimodal.probe_mp4(p[:cut] if cut < 20 else p[:cut] + b"\xff")
    b = bytearray(p)
    b[0:4] = (1 << 30).to_bytes(4, "big")  # absurd box size
    with pytest.raises(ValueError):
        multimodal.probe_mp4(bytes(b))


def test_repetition_features(spark):
    rows = [
        (0, "the cat and the hat is on the mat"),   # varied text
        (1, "spam spam spam spam"),                  # maximally repetitive
        (2, "a\nb\na\nc"),                           # repeated line
        (3, ""),                                     # empty
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in text.repetition_features(df).collect()}

    r0 = got[0]  # 9 tokens, 7 distinct; all 8 2-grams and 7 3-grams unique
    assert r0.r_tokens == 9
    assert r0.r_ttr == pytest.approx(7 / 9, abs=1e-6)
    assert r0.r_top2gram_frac == pytest.approx(1 / 8, abs=1e-6)
    assert r0.r_dup3gram_frac == 0.0
    assert r0.r_dup_line_frac == 0.0

    r1 = got[1]  # "spam spam" ×3 of 3; 3-grams: 2 total, 1 distinct
    assert r1.r_ttr == pytest.approx(0.25, abs=1e-6)
    assert r1.r_top2gram_frac == 1.0
    assert r1.r_dup3gram_frac == 0.5

    assert got[2].r_dup_line_frac == 0.25  # 4 lines, 'a' repeats once
    r3 = got[3]
    assert (r3.r_tokens, r3.r_ttr, r3.r_top2gram_frac) == (0, 0.0, 0.0)


def test_pii_features(spark):
    rows = [
        (0, "mail bob@example.com or 415-555-0131 from 10.0.0.7"),
        (1, "no pii here"),
        (2, "a@1.2.3.4 and also carol.smith+x@sub.example.org"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in text.pii_features(df).collect()}

    assert (got[0].pii_email, got[0].pii_phone, got[0].pii_ipv4) == (1, 1, 1)
    assert got[0].text_redacted == "mail <EMAIL> or <PHONE> from <IP>"
    assert (got[1].pii_email, got[1].pii_phone, got[1].pii_ipv4) == (0, 0, 0)
    # 'a@1.2.3.4' has no alpha TLD: not an email; its host IS an ipv4.
    # Redaction order (email first) must not consume it either.
    assert (got[2].pii_email, got[2].pii_ipv4) == (1, 1)
    assert got[2].text_redacted == "a@<IP> and also <EMAIL>"


def test_gif_roundtrip():
    """decode(encode(px)) must equal the RGB332-palette projection of
    px exactly, interlaced or not — the LZW pair and the fixed global
    palette are both pinned by this."""
    import numpy as np

    rng = np.random.default_rng(9)
    for (h, w), interlace in [((1, 1), False), ((2, 3), False),
                              ((9, 13), True), ((16, 8), True)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = multimodal.decode_gif(multimodal.encode_gif(px, interlace=interlace))
        want = multimodal._GIF_PALETTE[multimodal.gif_quantize(px)]
        assert np.array_equal(out, want), (h, w, interlace)


def test_gif_lzw_table_reset():
    """Streams long enough to fill the 4096-entry LZW table exercise
    the clear-code reset on both sides."""
    import numpy as np

    rng = np.random.default_rng(13)
    data = rng.integers(0, 256, size=120_000, dtype=np.uint8).tobytes()
    enc = multimodal._gif_lzw_encode(data)
    assert multimodal._gif_lzw_decode(enc, 8, len(data)) == data


def test_gif_animated_probe_and_first_frame():
    import numpy as np

    rng = np.random.default_rng(17)
    frames = [rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
              for _ in range(3)]
    g = multimodal.encode_gif(frames, delay_cs=25)
    p = multimodal.probe_gif(g)
    assert (p["n_frames"], p["duration_ms"]) == (3, 750)
    meta = multimodal.probe_payload(g)
    assert (meta["container"], meta["width"], meta["height"]) == ("gif", 8, 8)
    first = multimodal.decode_gif(g)
    want = multimodal._GIF_PALETTE[multimodal.gif_quantize(frames[0])]
    assert np.array_equal(first, want)


def test_gif_decoder_bomb_bounded():
    """A declared-2x2 frame whose LZW stream expands to 100k pixels
    must be rejected by the output cap, not decoded or looped."""
    import pytest

    lzw = multimodal._gif_lzw_encode(b"z" * 100_000)
    blocks = b""
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        blocks += bytes([len(chunk)]) + chunk
    payload = (b"GIF89a" + bytes([2, 0, 2, 0, 0xF7, 0, 0])
               + multimodal._GIF_PALETTE.tobytes()
               + b"\x2c" + bytes([0, 0, 0, 0, 2, 0, 2, 0, 0]) + b"\x08"
               + blocks + b"\x00\x3b")
    with pytest.raises(ValueError, match="exceeds declared"):
        multimodal.decode_gif(payload)


def test_jpeg_progressive_matches_baseline():
    """Progressive (SOF2) scans reconstruct the SAME quantized
    coefficients as the baseline encoding of the same pixels, so the
    two decodes must be bit-identical — this pins spectral selection,
    successive approximation (DC and AC bit planes), EOB-run carry
    across blocks, and non-interleaved chroma block geometry."""
    import numpy as np

    from serd_spark.operators import jpeg_codec as jc

    rng = np.random.default_rng(21)
    cases = [
        ((16, 16), False, {}),
        ((21, 17), True, {}),                      # 4:2:0, odd dims
        ((19, 23), True, {"dc_al": 2, "ac_al": 2}),  # deeper bit planes
        ((12, 20), False, {"bands": ((1, 63),)}),    # single AC band
        ((9, 7), False, {"bands": ((1, 2), (3, 9), (10, 63)),
                         "dc_al": 0, "ac_al": 0}),   # spectral-only
    ]
    for (h, w), sub, kw in cases:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        base = jc.decode_jpeg(jc.encode_jpeg(px, 92, sub))
        prog = jc.decode_jpeg(jc.encode_jpeg_progressive(px, 92, sub, **kw))
        assert np.array_equal(base, prog), ((h, w), sub, kw)
    g = rng.integers(0, 256, size=(14, 11), dtype=np.uint8)
    assert np.array_equal(
        jc.decode_jpeg(jc.encode_jpeg(g, 90)),
        jc.decode_jpeg(jc.encode_jpeg_progressive(g, 90)),
    )


def test_jpeg_progressive_fuzz_and_bomb():
    import struct as st

    import numpy as np
    import pytest

    from serd_spark.operators import jpeg_codec as jc

    rng = np.random.default_rng(22)
    px = rng.integers(0, 256, size=(12, 10, 3), dtype=np.uint8)
    real = jc.encode_jpeg_progressive(px, 92, True)
    for cut in range(2, len(real), max(1, len(real) // 40)):
        try:
            jc.decode_jpeg(real[:cut])
        except (ValueError, NotImplementedError, IndexError, KeyError,
                st.error):
            pass
    b = bytearray(real)
    for k in range(0, len(b), 5):
        b[k] ^= 0x5A
    try:
        jc.decode_jpeg(bytes(b))
    except (ValueError, NotImplementedError, IndexError, KeyError,
            st.error):
        pass
    # declared-huge progressive stream must fail BEFORE allocating
    bomb = (b"\xff\xd8\xff\xc2" + st.pack(">H", 11)
            + st.pack(">BHHB", 8, 60000, 60000, 1) + bytes([1, 0x11, 0])
            + b"\xff\xda" + st.pack(">H", 8) + bytes([1, 1, 0, 0, 0, 0]))
    with pytest.raises(NotImplementedError, match="max_pixels"):
        jc.decode_jpeg(bomb)


def test_mp4_sample_table_roundtrip():
    sizes = [500 + (k * 13) % 200 for k in range(30)]
    p = multimodal.encode_mp4_meta(
        3000, width=320, height=240, tracks=(b"vide", b"soun"),
        sample_sizes=sizes,
    )
    t = multimodal.mp4_sample_table(p)
    assert len(t) == 30
    assert t[0] == (0, 4096, sizes[0])
    off = 4096
    for k, (pts, o, sz) in enumerate(t):
        assert (pts, o, sz) == (k * 100, off, sizes[k])
        off += sz
    # probing is unaffected by the added mdhd/minf boxes
    pr = multimodal.probe_payload(p)
    assert (pr["container"], pr["n_tracks"]) == ("mp4", 2)
    # metadata-only MP4s (no stbl) still raise a clear error
    bare = multimodal.encode_mp4_meta(3000, width=320, height=240)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sample table"):
        multimodal.mp4_sample_table(bare)


def test_mp4_sample_table_bounds_declared_counts():
    import struct as st

    import pytest as _pytest

    p = bytearray(multimodal.encode_mp4_meta(
        1000, width=8, height=8, sample_sizes=[10] * 5
    ))
    i = bytes(p).find(b"stts")
    # declare an absurd run count in stts: must raise, not allocate
    st.pack_into(">II", p, i + 12, 1 << 30, 100)
    with _pytest.raises(ValueError, match="implausible|stsz"):
        multimodal.mp4_sample_table(bytes(p))


def test_sample_frames_spark(spark):
    media = multimodal.synthesize_media(spark, 64)
    rows = multimodal.sample_frames(media, every_ms=1000).collect()
    assert rows, "64 synthetic rows include videos"
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    for mid, rs in by_id.items():
        rs.sort(key=lambda r: r.t_ms)
        # ranged reads: sampled frame k has the formula size/offset
        for r in rs:
            assert r.pts_ms <= r.t_ms < r.pts_ms + 100
            assert r.n_bytes == 500 + ((mid * 7 + r.frame_idx * 13) % 200)
        offs = [r.byte_off for r in rs]
        assert offs == sorted(offs) and offs[0] >= 4096


def test_webp_probe_roundtrip():
    for w, h in [(1, 1), (31, 17), (16384, 16384)]:
        pay = multimodal.encode_webp_meta(w, h, body=b"\x01\x02\x03")
        pr = multimodal.probe_payload(pay)
        assert (pr["container"], pr["width"], pr["height"]) == ("webp", w, h)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        multimodal.probe_payload(b"RIFF\x00\x00\x00\x00WEBPXXXX")
    # lossy VP8 now decodes for real (vp8_codec.py); an all-zero
    # first partition is a legal degenerate keyframe
    body = (b"\x00\x00\x00" + b"\x9d\x01\x2a"
            + (320).to_bytes(2, "little")
            + (240).to_bytes(2, "little") + bytes(8))
    vp8 = (b"RIFF" + (12 + len(body)).to_bytes(4, "little")
           + b"WEBPVP8 " + len(body).to_bytes(4, "little") + body)
    img = multimodal.decode_image(vp8)
    assert img.shape == (240, 320, 3)


def test_webp_vp8l_real_decode():
    import numpy as np

    from serd_spark.operators import vp8l_codec as vc

    rng = np.random.default_rng(11)
    for shape in [(1, 1, 3), (9, 14, 3), (16, 16, 4)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        enc = vc.encode_vp8l(px)
        dec = vc.decode_vp8l(enc)
        assert np.array_equal(dec[..., : shape[2]], px)
        if shape[2] == 3:
            assert (dec[..., 3] == 255).all()
        # decode_image integration + probing agree on dims
        img = multimodal.decode_image(enc)
        assert img.shape == (shape[0], shape[1], 3)
        pr = multimodal.probe_payload(enc)
        assert (pr["width"], pr["height"]) == (shape[1], shape[0])
    # LZ77 runs and constant images (single-symbol prefix codes)
    px = np.full((12, 7, 3), 42, dtype=np.uint8)
    assert np.array_equal(
        vc.decode_vp8l(vc.encode_vp8l(px))[..., :3], px
    )
    # real content features flow through payload_features
    f = multimodal.payload_features(vc.encode_vp8l(px), strict=True)
    assert abs(f[0] - 42 / 255) < 0.01  # mean red of a constant image


def test_vp8l_decoder_is_crash_free_on_corrupt_input():
    import numpy as np

    from serd_spark.operators import vp8l_codec as vc

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(12, 12, 3), dtype=np.uint8)
    real = vc.encode_vp8l(px)
    for cut in range(21, len(real), max(1, len(real) // 40)):
        try:
            vc.decode_vp8l(real[:cut])
        except (ValueError, NotImplementedError):
            pass
    b = bytearray(real)
    for k in range(20, len(b), 3):
        b[k] ^= 0x5A
        try:
            vc.decode_vp8l(bytes(b))
        except (ValueError, NotImplementedError):
            pass
        b[k] ^= 0x5A
    # declared-huge dims must fail BEFORE allocating
    import pytest as _pytest

    bomb = bytearray(real)
    # dims field after RIFF(12)+chunk hdr(8)+signature(1): 16384x16384
    bomb[21:25] = (0x3FFF | (0x3FFF << 14)).to_bytes(4, "little")
    with _pytest.raises((ValueError, NotImplementedError)):
        vc.decode_vp8l(bytes(bomb), max_pixels=1 << 20)


def test_sample_frames_bounds_declared_pts(spark):
    # a tiny payload declaring a huge stts delta must not allocate a
    # giant sampling schedule: lax skips the row, strict raises
    import pytest as _pytest

    bomb = multimodal.encode_mp4_meta(
        1000, width=8, height=8,
        sample_sizes=[10] * 5, sample_delta_ms=4_000_000_000,
    )
    media = spark.createDataFrame(
        [(1, "video", bytearray(bomb))],
        "media_id long, kind string, payload binary",
    )
    assert multimodal.sample_frames(media).count() == 0
    with _pytest.raises(Exception, match="implausible sampling span"):
        multimodal.sample_frames(media, strict=True).count()


def test_vp8l_adversarial_streams_raise_value_error():
    import pytest as _pytest

    from serd_spark.operators import vp8l_codec as vc

    def header(bw):
        bw.write(0x2F, 8)
        bw.write(0, 14)  # w-1
        bw.write(0, 14)  # h-1
        bw.write(0, 1)
        bw.write(0, 3)
        bw.write(0, 1)  # no transforms
        bw.write(0, 1)  # no cache
        bw.write(0, 1)  # no meta

    def simple1(bw, sym):
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # 1 symbol
        bw.write(1, 1)  # 8-bit
        bw.write(sym, 8)

    # distance code simple-form symbol 200 >= alphabet 40
    bw = vc._BitWriter()
    header(bw)
    for _ in range(4):  # green, red, blue, alpha
        simple1(bw, 0)
    simple1(bw, 200)  # distance: out of range
    with _pytest.raises(ValueError, match="out of range"):
        vc.decode_vp8l(bw.bytes())

    # code-length code with ALL zero lengths
    bw = vc._BitWriter()
    header(bw)
    bw.write(0, 1)  # normal form for green
    bw.write(0, 4)  # n_clc = 4
    for _ in range(4):
        bw.write(0, 3)  # all CLC lengths zero
    with _pytest.raises(ValueError, match="no symbols"):
        vc.decode_vp8l(bw.bytes())


def test_stratified_rate_one_keeps_everything(spark):
    from serd_spark.operators.corpus import stratified_sample

    rows = [(i, "t", "en") for i in range(50)]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    assert stratified_sample(d, {"en": 1.0}).count() == 50


def test_mp4_mjpeg_roundtrip_and_decode():
    # container round-trip: each sample slice is the original JPEG,
    # decode_image recovers exactly the pixels decode_jpeg sees
    import hashlib

    import numpy as np

    from serd_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg

    frames = []
    for k in range(4):
        out, c = b"", 0
        while len(out) < 16 * 24 * 3:
            out += hashlib.blake2b(
                f"f:{k}".encode() + c.to_bytes(4, "big"), digest_size=32
            ).digest()
            c += 1
        px = np.frombuffer(out[: 16 * 24 * 3], dtype=np.uint8).reshape(
            16, 24, 3
        )
        frames.append(encode_jpeg(px, quality=90, subsample=True))
    pay = multimodal.encode_mp4_mjpeg(frames, 24, 16, sample_delta_ms=200)
    table = multimodal.mp4_sample_table(pay)
    assert [p for p, _, _ in table] == [0, 200, 400, 600]
    for k, (_, off, sz) in enumerate(table):
        assert pay[off : off + sz] == frames[k]
        assert np.array_equal(
            multimodal.decode_image(pay[off : off + sz]),
            decode_jpeg(frames[k]),
        )
    pr = multimodal.probe_mp4(pay)
    assert (pr["width"], pr["height"], pr["n_tracks"]) == (24, 16, 1)


def test_decode_frames_spark(spark):
    media = multimodal.synthesize_mjpeg_media(spark, 16)
    rows = multimodal.decode_frames(media, every_ms=300).collect()
    assert rows
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    assert set(by_id) == set(range(16))
    for mid, rs in by_id.items():
        n_f = 4 + mid % 5
        assert len(rs) == (200 * (n_f - 1)) // 300 + 1
        for r in sorted(rs, key=lambda r: r.t_ms):
            assert r.frame_idx == r.t_ms // 200
            assert (r.fw, r.fh) == (16 + (mid % 3) * 8, 16 + (mid % 2) * 8)
            assert 0 <= r.lum_mean_u <= 1_000_000
            assert 0 <= r.lum_std_u <= 500_000  # std of [0,1] data <= .5
    # determinism: a second run is bit-identical
    again = multimodal.decode_frames(media, every_ms=300).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_decode_frames_corrupt_frame_lax_and_strict(spark):
    import numpy as np
    import pytest as _pytest

    from serd_spark.operators.jpeg_codec import encode_jpeg

    good = encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), quality=90)
    bad = b"\xff\xd8" + b"\x00" * 40  # JPEG magic, garbage body
    pay = multimodal.encode_mp4_mjpeg(
        [good, bad, good], 8, 8, sample_delta_ms=100
    )
    media = spark.createDataFrame(
        [(7, "video", bytearray(pay))],
        "media_id long, kind string, payload binary",
    )
    rows = multimodal.decode_frames(media, every_ms=100).collect()
    assert [
        r.frame_idx for r in sorted(rows, key=lambda r: r.t_ms)
    ] == [0, 2]
    with _pytest.raises(Exception):
        multimodal.decode_frames(media, every_ms=100, strict=True).collect()


def test_decode_frames_range_beyond_payload(spark):
    # stco pointing past the file: lax skips those frames before any
    # decoder sees a short slice
    meta = multimodal.encode_mp4_meta(
        300, width=8, height=8, sample_sizes=[100, 100, 100],
        sample_delta_ms=100, chunk_base_off=1 << 20,
    )
    media = spark.createDataFrame(
        [(1, "video", bytearray(meta))],
        "media_id long, kind string, payload binary",
    )
    assert multimodal.decode_frames(media, every_ms=100).count() == 0


def test_sample_frames_empty_sample_table_skips_in_both_modes(spark):
    # zero-sample stts: a valid but empty schedule, not an error
    meta = multimodal.encode_mp4_meta(
        0, width=8, height=8, sample_sizes=[], sample_delta_ms=100
    )
    media = spark.createDataFrame(
        [(1, "video", bytearray(meta))],
        "media_id long, kind string, payload binary",
    )
    assert multimodal.sample_frames(media).count() == 0
    assert multimodal.sample_frames(media, strict=True).count() == 0
    assert multimodal.decode_frames(media, strict=True).count() == 0


def test_wminhash_signatures(spark):
    # doc 0 and doc 1: identical token MULTISETS under normalization
    # (case/whitespace) -> identical signatures; doc 2 has the same
    # token SET but different tf -> replica expansion must tell them
    # apart (the whole point vs unweighted minhash); doc 3 empty.
    rows = [
        (0, "spark spark spark row row key"),
        (1, "  SPARK   spark SPARK row ROW key "),
        (2, "spark row key key key"),
        (3, "   "),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_replicas, (r.h0, r.h1, r.h2, r.h3))
        for r in dedup.wminhash_signatures_md5(docs).collect()
    }
    assert 3 not in out  # no tokens, no row
    assert out[0][0] == 6 and out[2][0] == 5
    assert out[0][1] == out[1][1]
    assert out[0][1] != out[2][1]

    # python reference for one doc: min over md5(w#r#seed)
    import hashlib

    def h(w, r, s):
        return hashlib.md5(f"{w}#{r}#{s}".encode()).hexdigest()

    reps = [("spark", r) for r in (1, 2, 3)] + [
        ("row", r) for r in (1, 2)
    ] + [("key", 1)]
    want = tuple(
        min(h(w, r, s) for w, r in reps) for s in range(4)
    )
    assert out[0][1] == want


def test_wminhash_weight_cap_and_validation(spark):
    import pytest as _pytest

    docs = spark.createDataFrame(
        [(0, " ".join(["tok"] * 50) + " other")], "doc_id long, text string"
    )
    out = dedup.wminhash_signatures_md5(docs, weight_cap=8).collect()
    assert out[0].n_replicas == 9  # 8 capped replicas + 1
    with _pytest.raises(ValueError):
        dedup.wminhash_signatures_md5(docs, n_seeds=0)
    with _pytest.raises(ValueError):
        dedup.wminhash_signatures_md5(docs, weight_cap=0)


def test_semantic_decontaminate_flags_close_vectors(spark):
    from serd_spark.operators.similarity import semantic_decontaminate
    from pyspark.sql import functions as F

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),          # benchmark
            (1, [2.0, 0.0]),          # cos 1.0 → contaminated
            (2, [0.0, 1.0]),          # cos 0.0 → clean
            (3, [-1.0, 0.0]),         # cos -1.0 → clean
            (4, [1.0, 1.0]),          # cos ~0.707107 → contaminated
        ],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: r
        for r in semantic_decontaminate(
            emb, F.col("vec_id") == 0, threshold_micros=500_000
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}  # the benchmark row is not scored
    assert out[1]["max_cos_micros"] == 1_000_000
    assert out[1]["contaminated"] == 1 and out[1]["n_hits"] == 1
    assert out[2]["max_cos_micros"] == 0
    assert out[2]["contaminated"] == 0 and out[2]["n_hits"] == 0
    assert out[3]["max_cos_micros"] == -1_000_000
    assert out[4]["max_cos_micros"] == 707_107  # round(cos,6)*1e6
    assert out[4]["contaminated"] == 1


def test_semantic_decontaminate_max_over_benchmarks(spark):
    from serd_spark.operators.similarity import semantic_decontaminate
    from pyspark.sql import functions as F

    emb = spark.createDataFrame(
        [
            (10, [1.0, 0.0]),
            (11, [0.0, 1.0]),
            (1, [1.0, 1.0]),  # cos 0.707107 to BOTH benchmarks
        ],
        "vec_id long, embedding array<float>",
    )
    (r,) = semantic_decontaminate(
        emb, F.col("vec_id") >= 10, threshold_micros=700_000
    ).collect()
    assert r["vec_id"] == 1
    assert r["n_hits"] == 2 and r["max_cos_micros"] == 707_107


def test_dup_clusters_transitive_groups_and_singletons(spark):
    from serd_spark.operators.dedup import dup_clusters

    base = " ".join(f"token{i}" for i in range(30))
    near = base.replace("token3", "changed3")
    uniq = " ".join(f"zq{i}x" for i in range(30))
    d = spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, uniq)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dup_clusters(d, threshold=0.5).collect()}
    assert len(out) == 4
    # 1,2,3 form one cluster with the min-id canon; 4 is a singleton
    assert out[1]["canon_id"] == out[2]["canon_id"] == out[3]["canon_id"] == 1
    assert out[1]["cluster_size"] == 3
    assert out[1]["is_canonical"] == 1 and out[2]["is_canonical"] == 0
    assert out[4]["cluster_size"] == 1 and out[4]["is_canonical"] == 1


def test_dup_clusters_canon_is_string_min(spark):
    from serd_spark.operators.dedup import dup_clusters

    # the linking contract compares entity ids AS STRINGS: "10" < "9",
    # so the canon of {9, 10} is 10 — deterministic, and pinned here
    t = " ".join(f"w{i}" for i in range(25))
    d = spark.createDataFrame([(9, t), (10, t)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in dup_clusters(d, threshold=0.5).collect()}
    assert out[9]["canon_id"] == 10 and out[10]["canon_id"] == 10
    assert out[10]["is_canonical"] == 1 and out[9]["is_canonical"] == 0


def _dhash_reference(px):
    """Independent pure-Python dHash (direct loops, no numpy) — the
    spec the vectorized implementation must match bit-for-bit."""
    h, w = px.shape[0], px.shape[1]
    lum = [[(299 * int(px[y][x][0]) + 587 * int(px[y][x][1])
             + 114 * int(px[y][x][2])) // 1000
            for x in range(w)] for y in range(h)]
    xs = [(i * w) // 9 for i in range(10)]
    ys = [(j * h) // 8 for j in range(9)]
    val = 0
    m = [[0] * 9 for _ in range(8)]
    for j in range(8):
        for i in range(9):
            s = n = 0
            for y in range(ys[j], ys[j + 1]):
                for x in range(xs[i], xs[i + 1]):
                    s += lum[y][x]
                    n += 1
            m[j][i] = s // n
    for j in range(8):
        for i in range(8):
            if m[j][i] > m[j][i + 1]:
                val |= 1 << (j * 8 + i)
    return val - (1 << 64) if val >= 1 << 63 else val


def test_dhash64_matches_independent_reference():
    import hashlib

    import numpy as np

    from serd_spark.operators.multimodal import dhash64

    for g in range(4):
        w, h = 9 + g * 3, 8 + g * 2
        raw = b"".join(
            hashlib.blake2b(f"dh:{g}:{c}".encode(), digest_size=32).digest()
            for c in range(w * h)
        )
        px = np.frombuffer(raw[: w * h * 3], dtype=np.uint8).reshape(h, w, 3)
        assert dhash64(px) == _dhash_reference(px)
    import pytest

    with pytest.raises(ValueError, match="needs w>=9"):
        dhash64(np.zeros((8, 8, 3), dtype=np.uint8))


def test_dhash_invariant_across_lossless_formats(spark):
    from pyspark.sql import functions as F

    from serd_spark.operators.multimodal import (
        image_dhash,
        synthesize_image_variants,
    )

    media = synthesize_image_variants(spark, 6)
    rows = image_dhash(media).collect()
    got = {r["media_id"]: r["dhash"] for r in rows}
    assert len(got) == 24 and all(v is not None for v in got.values())
    for g in range(6):
        # same pixels → identical hash across BMP and PNG/VP8L
        assert got[4 * g + 0] == got[4 * g + 1]
        # the unrelated control image differs
        assert got[4 * g + 3] != got[4 * g + 0]


def test_dhash_lax_null_on_garbage(spark):
    from serd_spark.operators.multimodal import image_dhash

    media = spark.createDataFrame(
        [(1, bytearray(b"not an image")), (2, None)],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in image_dhash(media).collect()}
    assert rows[1]["dhash"] is None and rows[2]["dhash"] is None


def test_audio_energy_matches_formula(spark):
    from serd_spark.operators.multimodal import (
        audio_energy,
        synthesize_audio_saw,
    )

    media = synthesize_audio_saw(spark, 3)
    rows = audio_energy(media, window_samples=100).collect()
    got = {(r["media_id"], r["win"]): r for r in rows}
    for i in range(3):
        n = 400 + (i * 37) % 800
        step, phase = 1 + i % 7, i % 100
        s = [((phase + j * step) * 97) % 24001 - 12000 for j in range(n)]
        for w in range(0, n, 100):
            blk = s[w:w + 100]
            r = got[(i, w // 100)]
            assert r["n_samples"] == len(blk)
            assert r["energy"] == sum(x * x for x in blk)
    # every window accounted for, none invented
    assert len(rows) == sum((400 + (i * 37) % 800 + 99) // 100
                            for i in range(3))


def test_audio_energy_skips_non_wav(spark):
    from serd_spark.operators.multimodal import audio_energy

    media = spark.createDataFrame(
        [(1, bytearray(b"garbage")), (2, None)],
        "media_id long, payload binary",
    )
    assert audio_energy(media).count() == 0


def test_mine_training_pairs_labels(spark):
    from pyspark.sql import functions as F

    from serd_spark.operators.dedup import mine_training_pairs

    base = " ".join(f"token{i}" for i in range(30))
    near = base.replace("token3", "changed3")          # high jaccard
    # superset doc: shares every base shingle + a tail → verified
    # est 0.703125 with exactly one colliding band (fixed perms make
    # this deterministic; probed, not assumed)
    part = base + " " + " ".join(f"extra{i}word" for i in range(5))
    far = " ".join(f"zz{i}q" for i in range(30))       # no overlap
    d = spark.createDataFrame(
        [(1, base), (2, near), (3, part), (4, far)],
        "doc_id long, text string",
    )
    rows = mine_training_pairs(
        d, pos_threshold=0.85, neg_floor=0.05
    ).collect()
    got = {(r["id_a"], r["id_b"]): r for r in rows}
    assert got[(1, 2)]["label"] == "pos"
    assert got[(1, 2)]["jaccard_est"] >= 0.85
    # the superset doc collides in one band yet verifies below pos
    assert (1, 3) in got and got[(1, 3)]["label"] == "hard_neg"
    assert got[(1, 3)]["jaccard_est"] == 0.703125
    # disjoint docs never become pairs at all
    assert not any(4 in p for p in got)


def test_mine_training_pairs_validation(spark):
    import pytest

    from serd_spark.operators.dedup import mine_training_pairs

    d = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        mine_training_pairs(d, pos_threshold=0.3, neg_floor=0.5)


def test_encoding_features_detects_mojibake(spark):
    from serd_spark.operators.text import _as_mojibake, encoding_features

    clean_fr = "café déjà « voilà »"
    corrupted = _as_mojibake(clean_fr)
    rows = encoding_features(
        spark.createDataFrame(
            [
                (1, "plain ascii text"),
                (2, clean_fr),
                (3, corrupted),
                (4, "broken � char"),
            ],
            "doc_id long, text string",
        )
    ).orderBy("doc_id").collect()
    by_id = {r.doc_id: r for r in rows}
    assert by_id[1].mojibake_hits == 0 and by_id[1].flagged == 0
    # genuine accented text: non-ASCII but NOT flagged
    assert by_id[2].mojibake_hits == 0 and by_id[2].flagged == 0
    assert by_id[2].non_ascii_chars > 0
    # the double-encoded version of the same string IS flagged
    assert by_id[3].mojibake_hits >= 4 and by_id[3].flagged == 1
    assert by_id[4].replacement_chars == 1 and by_id[4].flagged == 0


def test_mojibake_pattern_alternatives_disjoint():
    """Leftmost-first (Java) vs leftmost-longest (RE2 POSIX) cannot
    diverge iff no two alternatives match at one position."""
    from serd_spark.operators.text import MOJIBAKE_PATTERN

    alts = MOJIBAKE_PATTERN.split("|")
    assert len(set(alts)) == len(alts)
    for a in alts:
        for b in alts:
            if a is not b:
                assert not b.startswith(a)


def test_nfc_normalize(spark):
    from serd_spark.operators.text import nfc_normalize

    rows = [
        ("a", "e" + chr(0x301)),          # e + combining acute -> é
        ("b", chr(0x1100) + chr(0x1161)), # Hangul jamo -> syllable
        ("c", "plain ascii"),             # already NFC
        ("d", None),                      # null survives
    ]
    docs = spark.createDataFrame(rows, "id string, text string")
    got = {r.id: r.text_nfc for r in nfc_normalize(docs).collect()}
    assert got["a"] == "é"
    assert got["b"] == "가"
    assert got["c"] == "plain ascii"
    assert got["d"] is None


def test_readability_matches_python_replay(spark):
    import re

    from serd_spark.operators.text import readability

    rows = [
        (0, "The cat sat. On a mat!"),
        (1, ""),
        (2, "mhm 123"),
        (3, "One two three four five six seven? Yes. No!"),
        (4, "Syllables in queueing and cooperation are counted"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in readability(df).collect()}
    for i, text in rows:
        w = 0 if not text.strip() else len(re.split(r"\s+", text.strip()))
        s = max(1, len(re.findall(r"[.!?]+", text)))
        syl = max(w, len(re.findall(r"[aeiouy]+", text.lower())))
        flesch = (
            206835000 - (1015000 * w) // s
            - (84600000 * syl) // max(w, 1)
        )
        grade = (
            (390000 * w) // s + (11800000 * syl) // max(w, 1)
            - 15590000
        )
        r = got[i]
        assert (r["words"], r["sentences"], r["syllables"]) == (w, s, syl), i
        assert (r["flesch_u"], r["grade_u"]) == (flesch, grade), i
