"""Typed node constructors + file-URI bridge (serd ops 8, 15)."""

import pytest

from serd_spark.rdf.nodes import (
    blob_decode,
    file_uri_parse,
    new_blob,
    new_decimal,
    new_file_uri,
    new_integer,
    uri_to_path,
)


def test_integer():
    t = new_integer(42)
    assert t.value == "42" and t.datatype.endswith("integer")
    assert new_integer(-7).value == "-7"


def test_decimal_trims_but_keeps_one_digit():
    assert new_decimal(1.5, 4).value == "1.5"
    assert new_decimal(2.0, 4).value == "2.0"
    assert new_decimal(0.125, 6).value == "0.125"
    assert new_decimal(-0.5, 2).value == "-0.5"
    with pytest.raises(ValueError):
        new_decimal(float("nan"), 2)


def test_blob_roundtrip():
    data = bytes(range(256))
    t = new_blob(data)
    assert t.datatype.endswith("base64Binary")
    assert blob_decode(t) == data


def test_file_uri_roundtrip():
    for path in ["/tmp/x.ttl", "/a b/c%d.nt", "/ünï/漢.ttl"]:
        uri = new_file_uri(path)
        assert uri.startswith("file:///")
        assert uri_to_path(uri) == path


def test_file_uri_hostname():
    uri = new_file_uri("/x", hostname="host")
    assert uri == "file://host/x"
    path, host = file_uri_parse(uri)
    assert (path, host) == ("/x", "host")
    assert file_uri_parse("file://localhost/x") == ("/x", "")
    with pytest.raises(ValueError):
        file_uri_parse("http://e/")
