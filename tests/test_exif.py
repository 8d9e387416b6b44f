"""EXIF codec (operators/exif_codec.py): encode→parse round trips,
both byte orders, bounds on adversarial structure, corruption fuzz."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from serd_spark.operators.exif_codec import (
    MAX_ENTRIES,
    encode_exif_app1,
    inject_app1,
    parse_exif,
    parse_tiff_ifds,
)
from serd_spark.operators.jpeg_codec import encode_jpeg

_PX = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)


def _jpeg_with(ifd0, exif=(), le=True):
    return inject_app1(
        encode_jpeg(_PX, quality=90, subsample=True),
        encode_exif_app1(ifd0, exif, little_endian=le),
    )


IFD0 = [
    (0x010F, 2, "CamX"),
    (0x0112, 3, 6),
    (0x011A, 5, (72, 1)),
    (0x0132, 2, "2021:05:06 07:08:09"),
]
EXIF = [(0x829A, 5, (1, 125)), (0x8827, 3, 400), (0xA002, 4, 8)]


@pytest.mark.parametrize("le", [True, False])
def test_round_trip_both_orders(le):
    rows = parse_exif(_jpeg_with(IFD0, EXIF, le))
    by_name = {(ifd, name): v for ifd, _, name, v in rows}
    assert by_name[("ifd0", "Make")] == "CamX"
    assert by_name[("ifd0", "Orientation")] == "6"
    assert by_name[("ifd0", "XResolution")] == "72/1"
    assert by_name[("exif", "ExposureTime")] == "1/125"
    assert by_name[("exif", "ISOSpeedRatings")] == "400"
    assert by_name[("exif", "PixelXDimension")] == "8"


def test_no_exif_returns_empty():
    assert parse_exif(encode_jpeg(_PX, quality=90, subsample=True)) == []
    assert parse_exif(b"") == []
    assert parse_exif(b"\xff\xd8\xff\xd9") == []
    assert parse_exif(b"not a jpeg at all") == []


def test_decoder_still_reads_pixels_after_injection():
    from serd_spark.operators.jpeg_codec import decode_jpeg

    plain = encode_jpeg(_PX, quality=90, subsample=True)
    tagged = _jpeg_with(IFD0, EXIF)
    assert np.array_equal(decode_jpeg(plain), decode_jpeg(tagged))


def test_entry_count_cap():
    # a declared 65535-entry IFD must be skipped, not walked
    tiff = b"II" + struct.pack("<HI", 42, 8) + struct.pack("<H", 0xFFFF)
    assert parse_tiff_ifds(tiff) == []
    assert MAX_ENTRIES < 0xFFFF


def test_pointer_cycle_bounded():
    # ExifIFD pointer pointing back at IFD0: the visited set must
    # break the cycle
    app1 = encode_exif_app1([(0x8769, 4, 8)], (), little_endian=True)
    tiff = app1[10 + 6 - 6:]  # strip marker+len+"Exif\0\0"
    rows = parse_tiff_ifds(app1[10:])
    assert rows == []  # pointer consumed, nothing else emitted


def test_out_of_range_value_offset_skipped():
    # ASCII value whose offset points past the block: entry skipped,
    # in-range entries still emitted
    good = encode_exif_app1(
        [(0x010F, 2, "CamOK"), (0x0110, 2, "M-im-long-enough")],
        (), little_endian=True,
    )
    tiff = bytearray(good[10:])
    # entry 1 (Model) value offset → absurd
    # layout: 8 tiff hdr + 2 count + 12*entry; offset field at +8
    off_field = 8 + 2 + 12 * 1 + 8
    tiff[off_field:off_field + 4] = struct.pack("<I", 10**6)
    rows = parse_tiff_ifds(bytes(tiff))
    names = [n for _, _, n, _ in rows]
    assert "Make" in names and "Model" not in names


@given(st.integers(0, 10**6), st.data())
@settings(max_examples=150, deadline=None)
def test_corruption_fuzz_never_throws(seed, data):
    base = bytearray(_jpeg_with(IFD0, EXIF, le=bool(seed % 2)))
    n_flips = data.draw(st.integers(1, 8))
    for _ in range(n_flips):
        pos = data.draw(st.integers(0, len(base) - 1))
        base[pos] = data.draw(st.integers(0, 255))
    rows = parse_exif(bytes(base))  # must terminate, never raise
    assert isinstance(rows, list)


def test_truncation_fuzz_never_throws():
    full = _jpeg_with(IFD0, EXIF)
    for cut in range(0, min(len(full), 400), 7):
        assert isinstance(parse_exif(full[:cut]), list)
