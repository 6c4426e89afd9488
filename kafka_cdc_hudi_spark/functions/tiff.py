"""Pure-stdlib baseline TIFF codec — the seventh real media format, and
the only offset-based container in the family (PNG/GIF/AVI walk chunks
sequentially; TIFF's IFD is a directory of absolute file offsets, the
idiom scientific/scanner pipelines still emit).

Scope: single-IFD grayscale 8-bit uncompressed (compression=1), single
strip, either byte order on decode ('II' little- / 'MM' big-endian; the
encoder emits 'II'). ``ValueError`` on corruption, ``NotImplementedError``
on legal-but-unsupported features (multi-strip, compressed, RGB, tiled).
"""

from __future__ import annotations

import struct

TIFF_MAGIC_LE = b"II*\x00"
TIFF_MAGIC_BE = b"MM\x00*"

# tag ids
_WIDTH, _HEIGHT = 256, 257
_BITS, _COMPRESSION, _PHOTOMETRIC = 258, 259, 262
_STRIP_OFFSETS, _SAMPLES_PER_PX = 273, 277
_ROWS_PER_STRIP, _STRIP_BYTES = 278, 279


def encode_tiff_gray(pixels: bytes, width: int, height: int) -> bytes:
    """Encode raw 8-bit grayscale samples as a minimal little-endian
    single-strip TIFF."""
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dims {width}x{height}")
    if len(pixels) != width * height:
        raise ValueError(f"pixel buffer {len(pixels)} bytes, want {width * height}")
    # layout: header(8) | pixel strip | IFD
    strip_off = 8
    ifd_off = strip_off + len(pixels)
    entries = [
        (_WIDTH, 3, 1, width),
        (_HEIGHT, 3, 1, height),
        (_BITS, 3, 1, 8),
        (_COMPRESSION, 3, 1, 1),      # uncompressed
        (_PHOTOMETRIC, 3, 1, 1),      # BlackIsZero
        (_STRIP_OFFSETS, 4, 1, strip_off),
        (_SAMPLES_PER_PX, 3, 1, 1),
        (_ROWS_PER_STRIP, 3, 1, height),
        (_STRIP_BYTES, 4, 1, len(pixels)),
    ]
    out = bytearray()
    out += TIFF_MAGIC_LE + struct.pack("<I", ifd_off)
    out += pixels
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)  # no next IFD
    return bytes(out)


def decode_tiff_gray(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a single-strip grayscale TIFF -> (width, height, 1, pixels).
    Handles both byte orders."""
    if data.startswith(TIFF_MAGIC_LE):
        e = "<"
    elif data.startswith(TIFF_MAGIC_BE):
        e = ">"
    else:
        raise ValueError("not a TIFF (missing II*/MM* magic)")
    if len(data) < 8:
        raise ValueError("truncated TIFF header")
    (ifd_off,) = struct.unpack(f"{e}I", data[4:8])
    if ifd_off + 2 > len(data):
        raise ValueError("IFD offset beyond file")
    (n_entries,) = struct.unpack(f"{e}H", data[ifd_off : ifd_off + 2])
    tags: dict[int, int] = {}
    pos = ifd_off + 2
    if pos + 12 * n_entries + 4 > len(data):
        raise ValueError("truncated IFD")
    for _ in range(n_entries):
        tag, typ, cnt, raw = struct.unpack(f"{e}HHI4s", data[pos : pos + 12])
        if cnt != 1:
            raise NotImplementedError(f"tag {tag}: multi-value counts (multi-strip?)")
        if typ == 3:  # SHORT — left-justified in the value field (both orders)
            (val,) = struct.unpack(f"{e}H", raw[:2])
        elif typ == 4:  # LONG
            (val,) = struct.unpack(f"{e}I", raw)
        else:
            raise NotImplementedError(f"tag {tag}: value type {typ}")
        tags[tag] = val
        pos += 12
    for req in (_WIDTH, _HEIGHT, _STRIP_OFFSETS, _STRIP_BYTES):
        if req not in tags:
            raise ValueError(f"missing required tag {req}")
    if tags.get(_COMPRESSION, 1) != 1:
        raise NotImplementedError(f"compression {tags[_COMPRESSION]}")
    if tags.get(_BITS, 8) != 8 or tags.get(_SAMPLES_PER_PX, 1) != 1:
        raise NotImplementedError("non-8-bit or multi-sample TIFF")
    w, h = tags[_WIDTH], tags[_HEIGHT]
    off, n = tags[_STRIP_OFFSETS], tags[_STRIP_BYTES]
    if n != w * h:
        raise ValueError(f"strip bytes {n} != {w}x{h}")
    if off + n > len(data):
        raise ValueError("pixel strip beyond file")
    return w, h, 1, data[off : off + n]
