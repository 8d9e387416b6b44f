"""Regression tests for the round-2 package-wide review findings —
web-input robustness of the RDF core."""

import time

import pytest

from serd_spark.rdf.model import BLANK, IRI, Statement, Term
from serd_spark.rdf.ntriples import parse_ntriples, write_ntriples
from serd_spark.rdf.turtle import parse_trig, parse_turtle
from serd_spark.rdf.turtle_writer import write_trig, write_turtle


def test_crlf_ntriples_parse():
    doc = (
        "<http://a> <http://b> <http://c> .\r\n"
        '<http://a> <http://b> "lit" .\r\n'
    )
    stmts, errs = parse_ntriples(doc, lax=True)
    assert errs == [] and len(stmts) == 2


def test_jsonld_cyclic_context_alias_no_crash():
    from serd_spark.rdf.jsonld import parse_jsonld

    doc = '{"@context":{"a":"b","b":"a"},"a":1,"@id":"http://s"}'
    stmts, errs = parse_jsonld(doc, "http://base/", lax=True)
    assert isinstance(stmts, list)  # must terminate, not RecursionError


def test_writer_deep_blank_chain_no_stack_blowup():
    p = Term(IRI, "http://p")
    stmts = [
        Statement(Term(BLANK, f"b{i}"), p, Term(BLANK, f"b{i+1}"))
        for i in range(2000)
    ]
    out = write_turtle(stmts)
    # every statement survives the depth-capped re-chunking
    back, errs = parse_turtle(out, "")
    assert errs == [] and len(back) == len(stmts)


def test_trig_blank_graph_label_reparses():
    st = Statement(
        Term(IRI, "http://s"), Term(IRI, "http://p"),
        Term(IRI, "http://o"), Term(BLANK, "j=1"),
    )
    out = write_trig([st])
    back, errs = parse_trig(out, "")
    assert errs == [] and len(back) == 1
    assert back[0].graph is not None and back[0].graph.kind == BLANK


def test_writer_large_collection_linear_time():
    first = Term(IRI, "http://www.w3.org/1999/02/22-rdf-syntax-ns#first")
    rest = Term(IRI, "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest")
    nil = Term(IRI, "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil")
    n = 20_000
    stmts = [
        Statement(Term(IRI, "http://s"), Term(IRI, "http://p"),
                  Term(BLANK, "c0"))
    ]
    for i in range(n):
        cell = Term(BLANK, f"c{i}")
        stmts.append(Statement(cell, first, Term(IRI, f"http://e/{i}")))
        nxt = nil if i == n - 1 else Term(BLANK, f"c{i+1}")
        stmts.append(Statement(cell, rest, nxt))
    t0 = time.time()
    out = write_turtle(stmts)
    assert time.time() - t0 < 20  # was O(n²): effectively hung
    back, errs = parse_turtle(out, "")
    assert errs == [] and len(back) == len(stmts)


def test_microdata_untyped_item_absolute_predicates():
    from serd_spark.rdf.microdata import parse_microdata

    html = '<div itemscope><span itemprop="name">Bob</span></div>'
    stmts, _ = parse_microdata(html, base_iri="http://page/")
    assert stmts and all(":" in st.predicate.value for st in stmts)
    assert stmts[0].predicate.value == "http://page/#name"
    # no base at all → urn fallback, still absolute
    stmts2, _ = parse_microdata(html)
    assert stmts2[0].predicate.value == "urn:md:prop:name"


def test_boolean_dot_prefix_lookahead():
    doc = "@prefix true.x: <http://ex/> . <http://s> <http://p> true.x:y ."
    stmts, errs = parse_turtle(doc, "")
    assert errs == [] and stmts[0].object.value == "http://ex/y"
    # plain boolean+terminator still lexes as boolean
    stmts2, errs2 = parse_turtle("<http://s> <http://p> true.", "")
    assert errs2 == [] and stmts2[0].object.value == "true"


def test_file_uri_invalid_escape_passthrough():
    from serd_spark.rdf.nodes import file_uri_parse

    assert file_uri_parse("file:///a%+1b")[0] == "/a%+1b"
    assert file_uri_parse("file:///a%2Fb")[0] == "/a/b"
    assert file_uri_parse("file:///a%g")[0] == "/a%g"


def test_new_decimal_zero_frac_digits_keeps_point():
    from serd_spark.rdf.nodes import new_decimal

    assert new_decimal(3.7, 0).value in ("3.7", "4.0")  # never "4"
    assert "." in new_decimal(4.0, 0).value


def test_island_blank_scoping_distinct():
    from serd_spark.rdf.html_islands import extract_document

    html = (
        '<script type="text/turtle">[ <http://p> 1 ] .</script>'
        '<script type="text/turtle">[ <http://p> 2 ] .</script>'
    )
    triples, errs = extract_document(html, "http://page/", lax=True)
    assert errs == []
    subs = {t[2].subject.value for t in triples}
    assert len(subs) == 2  # one distinct blank per island


def test_nquads_graph_iri_escaped(spark):
    from serd_spark.operators.serialize import nt_lines
    from serd_spark.rdf.ntriples import parse_nquads

    rows = [("u", 0, 0, "turtle", "http://g/é>x", "http://s", 0,
             "http://p", "http://o", 0, "", "")]
    cols = ("url island stmt_ord syntax g s s_kind p o o_kind o_dt "
            "o_lang").split()
    df = spark.createDataFrame(rows, cols)
    line = nt_lines(df, quads=True).first().nt
    stmts, errs = parse_nquads(line)
    assert errs == [] and stmts[0].graph.value == "http://g/é>x"


def test_train_centroids_small_table_clamps(spark):
    import numpy as np

    from serd_spark.operators import similarity

    rows = [(i, [float(i + 1)] * 4) for i in range(3)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = similarity.train_centroids(emb, n_centroids=16, sample_rows=10)
    assert 1 <= len(cents) <= 3
    # zero vector must not NaN-poison the centroids
    rows.append((9, [0.0] * 4))
    emb2 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents2 = similarity.train_centroids(emb2, n_centroids=2, sample_rows=10)
    assert np.isfinite(cents2).all()


def test_simhash_bucket_cap_prunes_degenerate(spark):
    from serd_spark.operators import dedup

    # 30 empty docs (signature 0) + 2 near-identical real docs
    rows = [(i, "") for i in range(30)]
    # identical token sets → Hamming 0, guaranteed pair
    rows += [(100, "the quick brown fox jumps over the dog"),
             (101, "the  quick brown fox jumps over the dog")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = dedup.simhash_near_dups(docs, max_bucket=8)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (100, 101) in got           # real pair survives the cap
    assert not any(a < 30 and b < 30 for a, b in got)  # degenerate gone
    full = dedup.simhash_near_dups(docs, max_bucket=None)
    assert full.count() == 30 * 29 // 2 + 1  # uncapped keeps everything


def test_unicode_text_not_punctuation(spark):
    from serd_spark.operators.text import quality_features

    rows = [(0, "équipe déjà évoluée près des rivières et châteaux")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    row = quality_features(df).first()
    assert row.q_punct_ratio == 0.0


def test_lineage_has_per_partition_wall(spark):
    from serd_spark.plans.pipeline import (
        extract_with_lineage,
        lineage_from_extracted,
    )
    from serd_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, 40, seed=42, partitions=4)
    lin = lineage_from_extracted(extract_with_lineage(pages)).collect()
    assert len(lin) == 4
    assert all(r.wall_ms is not None and r.wall_ms >= 0 for r in lin)


# ---------------------------------------------------------- round 3


def test_jsonld_corrupt_snapshot_file_is_per_island(tmp_path):
    """A truncated context file in the snapshot dir must surface as a
    per-island error, not escape the lax parse."""
    from urllib.parse import quote

    from serd_spark.rdf.jsonld import dir_context_loader, parse_jsonld

    d = tmp_path / "ctx"
    d.mkdir()
    url = "https://ctx.example/bad"
    (d / (quote(url, safe="") + ".json")).write_text('{"@context": {')
    doc = '{"@context": "https://ctx.example/bad", "@id": "http://e/1"}'
    stmts, errs = parse_jsonld(
        doc, lax=True, context_loader=dir_context_loader(str(d))
    )
    assert stmts == [] and "failed loading" in errs[0][2]


def test_microdata_itemref_into_own_subtree_once():
    """itemref pointing at an element inside the item's own subtree
    must not emit its properties twice (WHATWG once-per-crawl)."""
    from serd_spark.rdf.microdata import parse_microdata

    html = ('<div itemscope itemtype="http://schema.org/Thing" '
            'itemref="c"><span id="c" itemprop="x">v</span></div>')
    stmts, _ = parse_microdata(html)
    xs = [s for s in stmts if s.predicate.value.endswith("x")]
    assert len(xs) == 1


def test_probe_out_of_range_headers_lax(spark):
    """Implausible header dimensions (PNG 0xFFFFFFFF width, mvhd
    absurd duration) probe as errors, not int32 overflows."""
    import struct

    import pytest

    from serd_spark.operators import multimodal as mm

    bad_png = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
               + struct.pack(">II", 0xFFFFFFFF, 4) + b"\x08\x02\x00\x00\x00"
               + b"\x00" * 4)
    with pytest.raises(ValueError):
        mm.probe_payload(bad_png)
    junk = spark.createDataFrame(
        [(1, bytearray(bad_png))], "media_id long, payload binary"
    )
    row = mm.probe_media(junk).first()
    assert row.container == "unknown" and row.width is None


def test_jpeg_dimension_bomb_fails_fast():
    """A tiny payload declaring a huge SOF size must raise, not loop
    for hours."""
    import time

    import numpy as np
    import pytest

    from serd_spark.operators import jpeg_codec as jc

    px = np.zeros((8, 8, 3), dtype=np.uint8)
    data = bytearray(jc.encode_jpeg(px, quality=90))
    i = data.find(b"\xff\xc0")
    # SOF0 payload: len(2) prec(1) h(2) w(2) — declare 65535x65535
    data[i + 5 : i + 9] = b"\xff\xff\xff\xff"
    t0 = time.time()
    with pytest.raises(NotImplementedError, match="max_pixels"):
        jc.decode_jpeg(bytes(data))
    assert time.time() - t0 < 5


def test_png_zlib_bomb_bounded():
    """IDAT that inflates past the declared scanline size must fail
    without allocating the full bomb."""
    import struct
    import zlib

    import pytest

    from serd_spark.operators import multimodal as mm

    def chunk(tag, payload):
        c = tag + payload
        return struct.pack(">I", len(payload)) + c + struct.pack(
            ">I", zlib.crc32(c)
        )

    bomb = zlib.compress(b"\x00" * (32 * 1024 * 1024), 9)  # ~32 MB → KBs
    data = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", bomb) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="mismatch"):
        mm.decode_png(data)


def test_wav_probe_reads_header_only():
    """WAV probing must not decode PCM data (header math only)."""
    import numpy as np

    from serd_spark.operators import multimodal as mm

    payload = mm.encode_wav(np.zeros(80000, dtype=np.int16), 8000)
    p = mm.probe_payload(payload)
    assert p["duration_ms"] == 10000
    # 24-bit WAV would fail decode_wav (PCM16 only) but probes fine
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(3)
        wv.setframerate(8000)
        wv.writeframes(b"\x00\x00\x00" * 800)
    p = mm.probe_payload(buf.getvalue())
    assert p["container"] == "wav" and p["duration_ms"] == 100


def test_extract_raw_null_or_unknown_syntax_lax(spark):
    """Null or unknown syntax values in extract_raw must surface as
    error rows (lax) or raise (strict) — never silently fall through
    to the HTML-island scan and extract nothing."""
    import pytest

    from serd_spark.operators.extract import (
        errors_only,
        extract_raw,
        triples_only,
    )

    # "n3" stays unknown (rdfxml became a real syntax in round 4 —
    # this test is about values NO parser claims)
    docs = spark.createDataFrame(
        [("http://d/x.ttl", "<a> <b> <c> .", None),
         ("http://d/y.n3", "<a> <b> <c> .", "n3")],
        "url string, text string, syntax string",
    )
    ext = extract_raw(docs, lax=True)
    assert triples_only(ext).count() == 0
    errs = errors_only(ext).collect()
    assert len(errs) == 2
    assert all("unsupported syntax" in e.err_msg for e in errs)
    with pytest.raises(Exception):
        extract_raw(docs, lax=False).collect()


def test_mp4_unknown_duration_sentinel():
    """All-ones mvhd duration (the spec's 'unknown' sentinel, used by
    fragmented/live MP4s) keeps the probe row with a null duration
    instead of degrading everything to 'unknown'."""
    import struct

    from serd_spark.operators import multimodal as mm

    p = bytearray(mm.encode_mp4_meta(5000, width=64, height=48))
    sentinel = struct.pack(">I", 0xFFFFFFFF)
    dur_off = p.find(struct.pack(">II", 1000, 5000)) + 4
    p[dur_off : dur_off + 4] = sentinel
    pr = mm.probe_mp4(bytes(p))
    assert pr["duration_ms"] is None
    assert pr["width"] == 64 and pr["n_tracks"] == 1
    row = mm.probe_payload(bytes(p))
    assert row["container"] == "mp4" and row["duration_ms"] is None


def test_decoder_size_caps_are_not_implemented_errors():
    """Too-large declared dimensions raise NotImplementedError (this
    decoder's limitation, possibly a valid photo) — distinct from
    ValueError (corrupt payload)."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from serd_spark.operators import jpeg_codec as jc
    from serd_spark.operators import multimodal as mm

    data = bytearray(jc.encode_jpeg(np.zeros((8, 8, 3), np.uint8)))
    i = data.find(b"\xff\xc0")
    data[i + 5 : i + 9] = b"\xff\xff\xff\xff"
    with pytest.raises(NotImplementedError):
        jc.decode_jpeg(bytes(data))

    def chunk(tag, payload):
        c = tag + payload
        return struct.pack(">I", len(payload)) + c + struct.pack(
            ">I", zlib.crc32(c)
        )

    big_png = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR",
                       struct.pack(">IIBBBBB", 1, 1 << 27, 8, 0, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(b"\x00"))
               + chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        mm.decode_png(big_png)


def test_brute_force_guard_refuses_large_input(spark):
    """The two O(n²) certification queries in the contract must refuse
    inputs past the documented cap instead of launching a cartesian
    product (VERDICT r3 'What's wrong' item 1)."""
    import __spark_entry__ as entry

    big = spark.range(entry._BRUTE_FORCE_ROW_CAP + 10)
    with pytest.raises(ValueError, match="brute-force"):
        entry._assert_brute_force_scale(big, "test_query")
    # under the cap: no raise
    entry._assert_brute_force_scale(spark.range(100), "test_query")
