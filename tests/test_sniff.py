"""MIME/charset sniffing: handcrafted adversarial payloads plus the
full generator ground-truth closure (sniffed == declared on every row,
all 18 variants)."""

import pyspark.sql.functions as F
import pytest

from serd_spark.operators.sniff import (
    _render,
    sniff_responses,
    synthesize_responses,
)


def _sniff_one(spark, payload: bytes):
    df = spark.createDataFrame([(bytearray(payload),)], "payload binary")
    row = sniff_responses(df).collect()[0]
    return row.sniffed_mime, row.sniffed_charset


CASES = [
    # Content-Type lies the sniffer must see through
    (b"\x89PNG\r\n\x1a\n0123", "image/png", "binary"),
    (b"\xff\xd8\xff\xe1\x00\x10Exif", "image/jpeg", "binary"),
    (b"GIF87a0123456789", "image/gif", "binary"),
    (b"RIFF\x10\x00\x00\x00WEBPVP8 xxxx", "image/webp", "binary"),
    (b"RIFF\x10\x00\x00\x00WAVEfmt xxxx", "audio/wav", "binary"),
    (b"\x00\x00\x00\x18ftypmp42more", "video/mp4", "binary"),
    (b"%PDF-1.7\nstream", "application/pdf", "binary"),
    (b"\x1f\x8b\x08\x00deadbeef", "application/gzip", "binary"),
    (b"PK\x03\x04content", "application/zip", "binary"),
    (b"BM\x36\x00\x00\x00rest", "image/bmp", "binary"),
    # HTML: doctype, bare tag, uppercase, leading whitespace
    (b"<!DOCTYPE html><html>x</html>", "text/html", "utf-8"),
    (b"  \n\t<html lang=en>x</html>", "text/html", "utf-8"),
    (b"<HTML>upper</HTML>", "text/html", "utf-8"),
    # latin-1 body behind an ASCII meta tag (invalid UTF-8 overall)
    (
        b"<html><meta charset=iso-8859-1>caf\xe9</html>",
        "text/html",
        "iso-8859-1",
    ),
    # quoted meta, mixed case
    (
        b'<html><META CHARSET="Windows-1251">\xff</html>',
        "text/html",
        "windows-1251",
    ),
    # BOM before doctype
    (b"\xef\xbb\xbf<!doctype html><html>x", "text/html", "utf-8"),
    # XML declaration with encoding
    (
        b'<?xml version="1.0" encoding="ISO-8859-1"?><r/>',
        "application/xml",
        "iso-8859-1",
    ),
    (b'<?xml version="1.0"?><r/>', "application/xml", "utf-8"),
    # JSON object / array
    (b'{"a": 1}', "application/json", "utf-8"),
    (b"[1, 2, 3]", "application/json", "utf-8"),
    # UTF-16 BOMs
    (b"\xff\xfeh\x00i\x00", "text/plain", "utf-16le"),
    (b"\xfe\xff\x00h\x00i", "text/plain", "utf-16be"),
    # plain text, multibyte UTF-8
    ("plain ü text".encode("utf-8"), "text/plain", "utf-8"),
    # invalid UTF-8, no magic
    (b"\xc0\x11\x22\x33", "application/octet-stream", "binary"),
    # invalid UTF-8 text with no declaration -> WHATWG fallback
    (b"latin only \xe9\xe8 no tags", "text/plain", "windows-1252"),
]


@pytest.mark.parametrize(
    "payload,mime,charset", CASES,
    ids=[f"{m}/{c}" for _, m, c in CASES],
)
def test_sniff_cases(spark, payload, mime, charset):
    got_mime, got_charset = _sniff_one(spark, payload)
    assert got_mime == mime
    assert got_charset == charset


def test_latin1_fallback_is_text(spark):
    # Invalid UTF-8 without declaration sniffs as text/plain only
    # because the bytes are magic-free AND tag-free; the charset
    # falls back per WHATWG, it is never silently 'utf-8'.
    got_mime, got_charset = _sniff_one(spark, b"caf\xe9 au lait")
    assert (got_mime, got_charset) == ("text/plain", "windows-1252")


def test_generator_variants_cover_all_branches():
    mimes = {_render(i, seed=7)[1] for i in range(18)}
    charsets = {_render(i, seed=7)[2] for i in range(18)}
    assert len(mimes) >= 12
    assert {"utf-8", "iso-8859-1", "utf-16le", "utf-16be", "binary"} <= (
        charsets
    )


def test_ground_truth_closure(spark):
    """Every synthesized row sniffs back to its declared ground truth
    — the certificate invariant, asserted row-exactly."""
    df = sniff_responses(synthesize_responses(spark, 200, seed=13))
    bad = df.filter(
        (F.col("sniffed_mime") != F.col("mime"))
        | (F.col("sniffed_charset") != F.col("charset"))
    )
    assert bad.count() == 0


def test_determinism(spark):
    a = sorted(
        (r.resp_id, bytes(r.payload))
        for r in synthesize_responses(spark, 36, seed=5).collect()
    )
    b = sorted(
        (r.resp_id, bytes(r.payload))
        for r in synthesize_responses(spark, 36, seed=5).collect()
    )
    assert a == b


def test_sniff_plan_is_pure_jvm(spark):
    """The sniff projection must not introduce a Python stage or a
    shuffle: map-only WholeStageCodegen over the scan."""
    df = spark.createDataFrame(
        [(bytearray(b"<html>x</html>"),)], "payload binary"
    )
    plan = (
        sniff_responses(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan and "ArrowEval" not in plan


def test_transcode_recovers_declared_text(spark):
    """Every text variant (utf-8, BOM'd, latin-1, utf-16le/be)
    transcodes to the declared character content exactly; binary
    variants give NULL."""
    from serd_spark.operators.sniff import transcode_text

    df = sniff_responses(synthesize_responses(spark, 180, seed=9))
    out = df.withColumn(
        "rec", transcode_text(F.col("payload"), F.col("sniffed_charset"))
    )
    assert out.filter(
        ~F.col("rec").eqNullSafe(F.col("text"))
    ).count() == 0


def test_transcode_is_total_on_garbage(spark):
    """No ANSI decode error on any adversarial byte string — the
    fallback branches are byte-total."""
    from serd_spark.operators.sniff import transcode_text

    rows = [
        (bytearray(b"\xff\xfe\x00"),),          # odd-length utf-16 BOM
        (bytearray(b"\xef\xbb\xbf\xc0\x11"),),  # BOM + invalid utf-8
        (bytearray(b"\xfe\xff"),),              # BOM only
        (bytearray(b"caf\xe9"),),               # bare latin-1
        (bytearray(b""),),
    ]
    df = spark.createDataFrame(rows, "payload binary")
    out = sniff_responses(df).withColumn(
        "rec", transcode_text(F.col("payload"), F.col("sniffed_charset"))
    )
    got = [(r.sniffed_charset, r.rec) for r in out.collect()]
    assert len(got) == 5  # nothing threw
    # the odd-length utf-16 candidate fell through to the total path
    assert all(r is not None or c == "binary" for c, r in got)


def test_transcode_latin1_preserves_bytes(spark):
    from serd_spark.operators.sniff import transcode_text

    payload = "café à l'été".encode("iso-8859-1")
    df = spark.createDataFrame([(bytearray(payload),)], "payload binary")
    out = sniff_responses(df).withColumn(
        "rec", transcode_text(F.col("payload"), F.col("sniffed_charset"))
    )
    r = out.collect()[0]
    assert r.rec == "café à l'été"
    # bijection: re-encoding recovers the original bytes exactly
    assert r.rec.encode("iso-8859-1") == payload
