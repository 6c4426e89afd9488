"""WARC web-crawl container (functions/warc.py, born r13): record grammar
round-trips under both layouts (plain and Common Crawl's one-gzip-member-
per-record), member splitting must use the decompressor hand-off (payload
bytes may contain the gzip magic), malformed inputs must raise cleanly,
and a hand-built record (independent byte construction) pins the grammar.
The Spark plumbing is covered by the `corpus_warc_extract` catalog
entry's full value oracle (tests/test_oracle.py)."""

from __future__ import annotations

import hashlib
import zlib

import pytest

from kafka_cdc_hudi_spark.functions.warc import (
    decode_warc,
    encode_warc,
    http_body,
    is_warc,
    split_gzip_members,
)


def _recs():
    return [
        (
            {
                "WARC-Type": "response",
                "WARC-Record-ID": "<urn:uuid:1>",
                "WARC-Date": "2024-01-01T00:00:00Z",
                "WARC-Target-URI": "http://example.com/a",
                "Content-Type": "application/http; msgtype=response",
            },
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>hi</html>",
        ),
        (
            {
                "WARC-Type": "resource",
                "WARC-Record-ID": "<urn:uuid:2>",
                "WARC-Date": "2024-01-01T00:00:01Z",
                "WARC-Target-URI": "http://example.com/b",
            },
            b"raw block \x00\xff bytes",
        ),
    ]


@pytest.mark.parametrize("gz", [True, False])
def test_roundtrip_both_layouts(gz):
    blob = encode_warc(_recs(), gzip_members=gz)
    assert is_warc(blob)
    got = decode_warc(blob)
    assert len(got) == 2
    for (h0, b0), (h1, b1) in zip(_recs(), got):
        assert b1 == b0
        for k, v in h0.items():
            assert h1[k] == v
        assert h1["Content-Length"] == str(len(b0))


def test_gzip_member_split_ignores_embedded_magic():
    """A block containing the 1f 8b magic must not confuse the member
    split — the hand-off is via zlib unused_data, not byte scanning."""
    recs = [
        ({"WARC-Type": "resource", "WARC-Record-ID": "<u:1>",
          "WARC-Date": "2024-01-01T00:00:00Z"}, b"\x1f\x8b" * 64),
        ({"WARC-Type": "resource", "WARC-Record-ID": "<u:2>",
          "WARC-Date": "2024-01-01T00:00:00Z"}, b"tail"),
    ]
    got = decode_warc(encode_warc(recs))
    assert [b for _h, b in got] == [b"\x1f\x8b" * 64, b"tail"]
    members = split_gzip_members(encode_warc(recs))
    assert len(members) == 2


def test_http_body():
    assert http_body(b"HTTP/1.1 200 OK\r\nX: y\r\n\r\nbody") == b"body"
    assert http_body(b"no http wrapper") == b"no http wrapper"


def test_handbuilt_record_bytes():
    """Independent byte-level construction of one record pins the
    grammar: version line, header lines, blank line, Content-Length
    block, CRLF CRLF terminator."""
    block = b"hello world"
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: resource\r\n"
        b"WARC-Record-ID: <urn:x:1>\r\n"
        b"WARC-Date: 2024-02-02T00:00:00Z\r\n"
        + f"Content-Length: {len(block)}\r\n".encode()
        + b"\r\n"
        + block
        + b"\r\n\r\n"
    )
    got = decode_warc(raw)
    assert len(got) == 1
    headers, b = got[0]
    assert b == block
    assert headers["WARC-Type"] == "resource"
    assert headers["WARC-Date"] == "2024-02-02T00:00:00Z"
    # gzip single member of the same bytes
    c = zlib.compressobj(9, zlib.DEFLATED, 31)
    gz = c.compress(raw) + c.flush()
    assert decode_warc(gz)[0][1] == block


def test_malformed_inputs_raise():
    with pytest.raises(ValueError):
        decode_warc(b"NOTWARC/1.0\r\n\r\n")
    # record block truncated
    with pytest.raises(ValueError):
        decode_warc(b"WARC/1.0\r\nContent-Length: 100\r\n\r\nshort")
    # missing terminator
    with pytest.raises(ValueError):
        decode_warc(b"WARC/1.0\r\nContent-Length: 2\r\n\r\nab__")
    # missing Content-Length
    with pytest.raises(ValueError):
        decode_warc(b"WARC/1.0\r\nWARC-Type: resource\r\n\r\n")
    # truncated gzip member
    blob = encode_warc(_recs())
    with pytest.raises((ValueError, zlib.error)):
        decode_warc(blob[: len(blob) - 8])
    assert not is_warc(b"\x1f\x8bgarbage")
    assert not is_warc(b"plain text")


def test_extract_warc_records_operator(spark):
    from kafka_cdc_hudi_spark.operators.multimodal import extract_warc_records

    blob = encode_warc(_recs())
    df = spark.createDataFrame(
        [(1, bytearray(blob), "warc", len(blob))],
        "media_id long, content binary, format string, byte_len long",
    )
    rows = sorted(extract_warc_records(df).collect(), key=lambda r: r["record_idx"])
    assert [r["warc_type"] for r in rows] == ["response", "resource"]
    assert rows[0]["target_uri"] == "http://example.com/a"
    assert rows[0]["body_hash"] == hashlib.md5(b"<html>hi</html>").hexdigest()
    assert rows[1]["body_hash"] == hashlib.md5(b"raw block \x00\xff bytes").hexdigest()
    assert [r["n_records"] for r in rows] == [2, 2]


def test_repeated_headers_are_combined():
    """ISO 28500 permits repeated headers (WARC-Concurrent-To); decode
    must not silently drop values — they combine RFC-7230-style."""
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: metadata\r\n"
        b"WARC-Concurrent-To: <urn:uuid:a>\r\n"
        b"WARC-Concurrent-To: <urn:uuid:b>\r\n"
        b"Content-Length: 2\r\n"
        b"\r\nhi\r\n\r\n"
    )
    headers, block = decode_warc(raw)[0]
    assert headers["WARC-Concurrent-To"] == "<urn:uuid:a>, <urn:uuid:b>"
    assert block == b"hi"


def test_non_http_block_with_crlfcrlf_hashes_whole(spark):
    """A raw resource block CONTAINING the CRLF CRLF sequence must be
    hashed whole — http_body stripping is gated on the record's
    Content-Type, not on byte content."""
    from kafka_cdc_hudi_spark.functions.warc import is_http_record
    from kafka_cdc_hudi_spark.operators.multimodal import extract_warc_records

    tricky = b"head\r\n\r\ntail"
    recs = [
        ({"WARC-Type": "resource", "WARC-Record-ID": "<u:1>",
          "WARC-Date": "2024-01-01T00:00:00Z", "Content-Type": "text/plain"},
         tricky),
    ]
    assert not is_http_record(recs[0][0])
    blob = encode_warc(recs)
    df = spark.createDataFrame(
        [(1, bytearray(blob), "warc", len(blob))],
        "media_id long, content binary, format string, byte_len long",
    )
    row = extract_warc_records(df).collect()[0]
    assert row["body_hash"] == hashlib.md5(tricky).hexdigest()
