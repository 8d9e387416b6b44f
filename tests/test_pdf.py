"""PDF codec (operators/pdf_codec.py): writer↔parser round trips over
all encoding variants, the bounded-work guarantees (zlib bomb, paren
nesting, op caps), gated-feature strictness, and lax-mode survival on
corrupted bytes."""

import zlib

import pytest

from serd_spark.operators.pdf_codec import (
    MAX_STREAM_OUT,
    PdfError,
    decode_pdf_text,
    encode_pdf,
    pdf_text,
    synthesize_pdfs,
)

PAGES = [
    "Doc 5 page 0: word word (\xe9)\\.",
    "second page (x) \\ hi",
    "third",
]


@pytest.mark.parametrize("variant", ["plain", "hex", "tj"])
@pytest.mark.parametrize("compress", [False, True])
def test_round_trip_all_variants(variant, compress):
    b = encode_pdf(PAGES, variant=variant, compress=compress)
    assert decode_pdf_text(b, strict=True) == PAGES


def test_page_order_follows_kids_not_document_order():
    # the page tree (Kids order) is authoritative — synthesize a PDF
    # then verify each page's text lands at its Kids position
    b = encode_pdf([f"p{i}" for i in range(5)])
    assert decode_pdf_text(b, strict=True) == [f"p{i}" for i in range(5)]


def test_escapes_octal_and_line_continuation():
    # hand-built content: octal \101 = 'A', escaped parens, \n escape,
    # and a backslash-newline continuation that must vanish
    content = b"BT (\\101\\(x\\)\\n) Tj (a\\\nb) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length "
        + str(len(content)).encode()
        + b" >>\nstream\n"
        + content
        + b"\nendstream endobj\n"
        b"trailer << /Size 5 /Root 1 0 R >>\n"
    )
    assert decode_pdf_text(pdf, strict=True) == ["A(x)\nab"]


def test_newline_rule_td_and_quote():
    content = b"BT 0 0 Td (l1) Tj 0 -14 Td (l2) Tj (l3) ' ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length "
        + str(len(content)).encode()
        + b" >>\nstream\n"
        + content
        + b"\nendstream endobj\n"
        b"trailer << /Size 5 /Root 1 0 R >>\n"
    )
    assert decode_pdf_text(pdf, strict=True) == ["l1\nl2\nl3"]


def test_tj_kerning_threshold():
    # gaps under the threshold insert nothing; at/over insert a space
    content = b"BT [(a) -100 (b) -180 (c) -9000 (d)] TJ ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length "
        + str(len(content)).encode()
        + b" >>\nstream\n"
        + content
        + b"\nendstream endobj\n"
        b"trailer << /Size 5 /Root 1 0 R >>\n"
    )
    assert decode_pdf_text(pdf, strict=True) == ["ab c d"]


def test_indirect_length_falls_back_to_endstream_search():
    content = b"BT (x) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length 9 0 R >>\nstream\n"
        + content
        + b"\nendstream endobj\n"
        b"9 0 obj 12 endobj\n"
        b"trailer << /Size 5 /Root 1 0 R >>\n"
    )
    assert decode_pdf_text(pdf, strict=True) == ["x"]


def test_zlib_bomb_is_bounded():
    # ~64 KB of zeros compresses to ~70 bytes; scale so the DECLARED
    # decompressed size exceeds the cap — must raise, never allocate
    bomb = zlib.compress(b"\0" * (MAX_STREAM_OUT + 1024), 9)
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Filter /FlateDecode /Length "
        + str(len(bomb)).encode()
        + b" >>\nstream\n"
        + bomb
        + b"\nendstream endobj\n"
        b"trailer << /Size 5 /Root 1 0 R >>\n"
    )
    with pytest.raises(PdfError, match="decompressed-size cap"):
        decode_pdf_text(pdf, strict=True)
    # lax: survives with an empty extraction, never hangs/allocates
    assert decode_pdf_text(pdf, strict=False) == [""]


def test_paren_nesting_cap():
    deep = b"(" * 5000 + b")" * 5000
    content = b"BT " + deep + b" Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length "
        + str(len(content)).encode()
        + b" >>\nstream\n"
        + content
        + b"\nendstream endobj\n"
        b"trailer << /Size 5 /Root 1 0 R >>\n"
    )
    with pytest.raises(PdfError, match="nesting"):
        decode_pdf_text(pdf, strict=True)
    decode_pdf_text(pdf, strict=False)  # must terminate quietly


def test_gated_features_strict():
    objstm = (
        b"%PDF-1.5\n"
        b"1 0 obj << /Type /ObjStm /N 1 /First 5 /Length 4 >>\n"
        b"stream\nabcd\nendstream endobj\n"
    )
    with pytest.raises(NotImplementedError, match="ObjStm"):
        decode_pdf_text(objstm, strict=True)
    enc = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"trailer << /Size 2 /Root 1 0 R /Encrypt 7 0 R >>\n"
    )
    with pytest.raises(NotImplementedError, match="ncrypt"):
        decode_pdf_text(enc, strict=True)
    dct = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Filter /DCTDecode /Length 2 >>\nstream\nxx\n"
        b"endstream endobj\n"
        b"trailer << /Size 5 /Root 1 0 R >>\n"
    )
    with pytest.raises(NotImplementedError, match="FlateDecode only"):
        decode_pdf_text(dct, strict=True)


def test_not_a_pdf_raises_both_modes():
    with pytest.raises(PdfError, match="not a PDF"):
        decode_pdf_text(b"GIF89a....")


def test_truncation_fuzz_never_hangs():
    b = encode_pdf(PAGES, variant="plain", compress=True)
    for cut in range(8, len(b), 37):
        out = decode_pdf_text(b[:cut], strict=False)
        assert isinstance(out, list)
    # byte-corruption fuzz: flip one byte at a stride
    for pos in range(9, len(b) - 1, 53):
        mut = bytearray(b)
        mut[pos] ^= 0xFF
        out = decode_pdf_text(bytes(mut), strict=False)
        assert isinstance(out, list)


def test_missing_root_lax_falls_back_to_page_objects():
    content = b"BT (fb) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length "
        + str(len(content)).encode()
        + b" >>\nstream\n"
        + content
        + b"\nendstream endobj\n"
    )
    assert decode_pdf_text(pdf, strict=False) == ["fb"]
    with pytest.raises(PdfError, match="no page tree"):
        decode_pdf_text(pdf, strict=True)


def test_spark_pdf_text_and_synthesis(spark):
    media = synthesize_pdfs(spark, 24, partitions=4)
    out = {
        r["media_id"]: r
        for r in pdf_text(media, strict=True).collect()
    }
    assert len(out) == 24
    for i in range(24):
        pages = [
            f"Doc {i} page {p}: "
            + "word " * (1 + (i + p) % 4)
            + "(\xe9)\\."
            for p in range(1 + i % 3)
        ]
        want = "\n".join(pages)
        assert out[i]["n_pages"] == 1 + i % 3
        assert out[i]["text"] == want
        assert out[i]["n_chars"] == len(want)


def test_spark_lax_survives_garbage(spark):
    rows = [(0, b"%PDF-1.4 garbage"), (1, b"not a pdf"), (2, b"")]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in pdf_text(media).collect()}
    assert all(got[i]["n_pages"] == 0 for i in range(3))
