"""Pure-stdlib WARC (Web ARChive, ISO 28500 / WARC/1.0) reader + writer.

WARC is the container format of web crawls (Common Crawl ships it), which
makes it the dominant RAW INPUT of large-scale text-pipeline ingestion —
the counterpart of the image/audio/video codecs for the text modality.
A WARC file is a sequence of records, each:

    WARC/1.0 CRLF
    <header-name>: <value> CRLF ...
    CRLF
    <Content-Length bytes of block>
    CRLF CRLF

and is conventionally stored gzip-compressed with ONE GZIP MEMBER PER
RECORD so readers can random-access records by offset. Both layouts
(plain and multi-member gzip) are implemented; member splitting uses
zlib's ``unused_data`` hand-off, not magic-byte scanning (gzip payload
bytes may contain 1f 8b).

Runs per Arrow batch inside mapInPandas workers; per-row work is
O(record bytes). No external libraries — gzip members via ``zlib``.
"""

from __future__ import annotations

import zlib

_GZIP_MAGIC = b"\x1f\x8b"
_CRLF = b"\r\n"


def is_warc(data: bytes) -> bool:
    if data[:2] == _GZIP_MAGIC:
        try:
            head = zlib.decompressobj(wbits=31).decompress(data, 16)
        except zlib.error:
            return False
        return head[:5] == b"WARC/"
    return data[:5] == b"WARC/"


def split_gzip_members(data: bytes) -> list[bytes]:
    """Split a multi-member gzip stream into DECOMPRESSED members via the
    decompressor's ``unused_data`` hand-off."""
    out: list[bytes] = []
    rest = data
    while rest:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(rest))
        out[-1] += d.flush()
        if not d.eof:
            raise ValueError("truncated gzip member in WARC stream")
        rest = d.unused_data
    return out


def _parse_records(raw: bytes) -> list[tuple[dict[str, str], bytes]]:
    records: list[tuple[dict[str, str], bytes]] = []
    pos = 0
    n = len(raw)
    while pos < n:
        # tolerate inter-record padding CRLFs
        while raw[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        eol = raw.index(b"\r\n", pos)
        version = raw[pos:eol].decode("ascii", errors="replace")
        if not version.startswith("WARC/"):
            raise ValueError(f"bad WARC version line: {version!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = raw.index(b"\r\n", pos)
            line = raw[pos:eol]
            pos = eol + 2
            if not line:
                break  # blank line ends the header block
            k, _, v = line.decode("utf-8", errors="replace").partition(":")
            k, v = k.strip(), v.strip()
            if k in headers:
                # ISO 28500 permits repeated headers (WARC-Concurrent-To);
                # combine RFC-7230-style so no value is silently dropped
                headers[k] = f"{headers[k]}, {v}"
            else:
                headers[k] = v
        try:
            length = int(headers["Content-Length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record without a valid Content-Length")
        if pos + length > n:
            raise ValueError("WARC record block truncated")
        block = raw[pos : pos + length]
        pos += length
        if raw[pos : pos + 4] != _CRLF + _CRLF:
            raise ValueError("WARC record missing the CRLF CRLF terminator")
        pos += 4
        records.append((headers, block))
    return records


def decode_warc(data: bytes) -> list[tuple[dict[str, str], bytes]]:
    """WARC bytes (plain or multi-member gzip) -> list of
    (headers, block) per record, in file order."""
    if data[:2] == _GZIP_MAGIC:
        records: list[tuple[dict[str, str], bytes]] = []
        for member in split_gzip_members(data):
            records.extend(_parse_records(member))
        return records
    return _parse_records(data)


def is_http_record(headers: dict[str, str]) -> bool:
    """True when the record block is an HTTP message (the ISO 28500
    convention: Content-Type application/http). Gates body stripping —
    a raw resource block may legitimately CONTAIN a CRLF CRLF sequence
    and must be hashed/returned whole."""
    return headers.get("Content-Type", "").lower().startswith("application/http")


def http_body(block: bytes) -> bytes:
    """The body of an HTTP-message record block (everything past the
    first blank line); a block without HTTP headers is returned whole.
    Callers should gate on :func:`is_http_record` — see its docstring."""
    i = block.find(b"\r\n\r\n")
    return block[i + 4 :] if i >= 0 else block


def encode_warc(
    records: list[tuple[dict[str, str], bytes]],
    gzip_members: bool = True,
) -> bytes:
    """Serialize (headers, block) records as WARC/1.0. ``Content-Length``
    is computed; all other headers pass through in the given order. With
    ``gzip_members`` each record becomes its own gzip member (the
    Common Crawl layout); mtime/filename are not stamped so output is
    deterministic."""
    out = bytearray()
    for headers, block in records:
        rec = bytearray(b"WARC/1.0\r\n")
        for k, v in headers.items():
            if k.lower() == "content-length":
                continue
            rec += f"{k}: {v}\r\n".encode()
        rec += f"Content-Length: {len(block)}\r\n".encode()
        rec += _CRLF
        rec += block
        rec += _CRLF + _CRLF
        if gzip_members:
            c = zlib.compressobj(9, zlib.DEFLATED, 31)
            member = c.compress(bytes(rec)) + c.flush()
            out += member
        else:
            out += rec
    return bytes(out)
