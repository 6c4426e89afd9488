"""Pure-stdlib PNG codec (zlib + struct only) for the multimodal decode path.

The container has no PIL/ffmpeg, but PNG's format is fully implementable
with the standard library: chunk framing + CRC32, IHDR parse, IDAT inflate
(zlib), and per-scanline unfiltering (filter types 0-4 incl. Paeth, per the
PNG spec §6). That turns `operators/multimodal.py`'s decode stage from a
documented stub into a REAL codec for PNG inputs — the Arrow/mapInPandas
plumbing is unchanged; only the kernel body is real now.

Scope (and honest limits):
- 8-bit depth, no interlacing (Adam7 raises), color types gray(0), RGB(2),
  gray+alpha(4), RGBA(6). Palette (3) and 16-bit raise NotImplementedError.
- encoder emits non-interlaced 8-bit PNGs and can CYCLE filter types 0-4
  across scanlines (``filter_cycle=True``) so round-trip tests exercise
  every unfilter branch, not just filter 0.

Runs per Arrow batch inside mapInPandas workers; rows are small decoded
images, so pure-Python byte loops are bounded by pixel count per row, and
the stage parallelism comes from Spark partitioning (media_repartition),
not from the kernel.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: PNG color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> color type


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(row: bytes, prev: bytes, ftype: int, bpp: int) -> bytes:
    """Apply PNG filter ``ftype`` to one scanline (encode direction)."""
    if ftype == 0:
        return row
    out = bytearray(len(row))
    for i, x in enumerate(row):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 1:
            out[i] = (x - a) & 0xFF
        elif ftype == 2:
            out[i] = (x - b) & 0xFF
        elif ftype == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        elif ftype == 4:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
    return bytes(out)


def _unfilter_row(line: bytearray, prev: bytes, ftype: int, bpp: int) -> None:
    """Invert PNG filter ``ftype`` in place (decode direction)."""
    if ftype == 0:
        return
    for i in range(len(line)):
        a = line[i - bpp] if i >= bpp else 0  # already-reconstructed left
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 1:
            line[i] = (line[i] + a) & 0xFF
        elif ftype == 2:
            line[i] = (line[i] + b) & 0xFF
        elif ftype == 3:
            line[i] = (line[i] + (a + b) // 2) & 0xFF
        elif ftype == 4:
            line[i] = (line[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")


def encode_png(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    filter_cycle: bool = False,
) -> bytes:
    """Encode raw 8-bit samples (row-major, ``width*height*channels`` bytes)
    as a non-interlaced PNG. ``filter_cycle=True`` uses filter type
    ``y % 5`` on scanline ``y`` — decoded output is identical (filters are
    lossless), but a decoder must implement all five reconstruction rules."""
    if channels not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(f"need {stride * height} bytes, got {len(pixels)}")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        ftype = (y % 5) if filter_cycle else 0
        raw.append(ftype)
        raw += _filter_row(row, prev, ftype, channels)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, _COLOR_TYPE[channels], 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG -> ``(width, height, channels, pixels)`` with ``pixels``
    the reconstructed raw samples (row-major, post-unfilter). Validates the
    signature and every chunk CRC; raises ``ValueError`` on corruption and
    ``NotImplementedError`` on legal-but-unsupported features (16-bit,
    palette, Adam7)."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr: bytes | None = None
    idat = bytearray()
    while pos + 12 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {typ!r} chunk")
        if typ == b"IHDR":
            ihdr = body
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None:
        raise ValueError("missing IHDR")
    width, height, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8:
        raise NotImplementedError(f"bit depth {depth} (only 8-bit supported)")
    if ctype not in _CHANNELS:
        raise NotImplementedError(f"color type {ctype} (palette not supported)")
    if comp != 0 or filt != 0:
        raise ValueError("bad IHDR compression/filter method")
    if interlace != 0:
        raise NotImplementedError("Adam7 interlacing not supported")
    channels = _CHANNELS[ctype]
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT size does not match dimensions")
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        base = y * (stride + 1)
        line = bytearray(raw[base + 1 : base + 1 + stride])
        _unfilter_row(line, prev, raw[base], channels)
        out += line
        prev = bytes(line)
    return width, height, channels, bytes(out)
