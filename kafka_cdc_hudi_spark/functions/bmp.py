"""Pure-stdlib BMP (Windows DIB) codec — the third REAL media format next
to PNG (functions/png.py) and WAV (functions/wav.py).

Supports the uncompressed BI_RGB layouts that cover virtually every BMP in
the wild: 8-bit palettized (decoded through the palette — grayscale
palettes reconstruct the original sample bytes exactly) and 24-bit BGR.
Rows are stored bottom-up with 4-byte-aligned stride; the decoder returns
row-major top-down samples, matching the PNG codec's pixel contract:
``decode_bmp(data) -> (width, height, channels, pixels)``.

``ValueError`` on corruption (bad magic, truncated sections, size
mismatches); ``NotImplementedError`` on legal-but-unsupported features
(RLE compression, 1/4/16/32-bit depths, top-down negative heights).
"""

from __future__ import annotations

import struct

BMP_MAGIC = b"BM"
_FILE_HDR = 14  # BITMAPFILEHEADER
_INFO_HDR = 40  # BITMAPINFOHEADER


def _stride(width: int, bits: int) -> int:
    return ((width * bits + 31) // 32) * 4


def encode_bmp(pixels: bytes, width: int, height: int, channels: int = 1) -> bytes:
    """Encode raw 8-bit samples (row-major top-down, ``width*height*
    channels`` bytes; 1 = grayscale via palette, 3 = RGB) as an
    uncompressed BMP."""
    if channels not in (1, 3):
        raise ValueError(f"unsupported channel count {channels}")
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dims {width}x{height}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, want {width * height * channels}"
        )
    bits = 8 * channels
    stride = _stride(width, bits)
    palette = (
        b"".join(bytes((i, i, i, 0)) for i in range(256)) if channels == 1 else b""
    )
    data_off = _FILE_HDR + _INFO_HDR + len(palette)
    img_size = stride * height
    rows = []
    row_bytes = width * channels
    pad = b"\x00" * (stride - row_bytes)
    for y in range(height - 1, -1, -1):  # bottom-up storage
        row = pixels[y * row_bytes : (y + 1) * row_bytes]
        if channels == 3:  # RGB -> stored BGR
            row = bytes(
                b
                for x in range(width)
                for b in (row[3 * x + 2], row[3 * x + 1], row[3 * x])
            )
        rows.append(row + pad)
    body = b"".join(rows)
    file_hdr = struct.pack("<2sIHHI", BMP_MAGIC, data_off + img_size, 0, 0, data_off)
    info_hdr = struct.pack(
        "<IiiHHIIiiII",
        _INFO_HDR, width, height, 1, bits, 0, img_size, 2835, 2835,
        256 if channels == 1 else 0, 0,
    )
    return file_hdr + info_hdr + palette + body


def decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a BMP -> ``(width, height, channels, pixels)`` with ``pixels``
    row-major top-down (8-bit: palette-resolved single channel; 24-bit:
    RGB)."""
    if data[:2] != BMP_MAGIC:
        raise ValueError("not a BMP (bad magic)")
    if len(data) < _FILE_HDR + _INFO_HDR:
        raise ValueError("truncated BMP header")
    (data_off,) = struct.unpack_from("<I", data, 10)
    hdr_size, width, height, planes, bits, compression = struct.unpack_from(
        "<IiiHHI", data, _FILE_HDR
    )
    if hdr_size < _INFO_HDR:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    if planes != 1:
        raise ValueError(f"bad plane count {planes}")
    if compression != 0:
        raise NotImplementedError(f"compressed BMP (method {compression}) unsupported")
    if height < 0:
        raise NotImplementedError("top-down BMP unsupported")
    if bits not in (8, 24):
        raise NotImplementedError(f"{bits}-bit BMP unsupported (8/24 only)")
    if width <= 0 or height == 0:
        raise ValueError(f"bad dims {width}x{height}")
    palette: bytes = b""
    if bits == 8:
        (colors_used,) = struct.unpack_from("<I", data, _FILE_HDR + 32)
        n_colors = colors_used or 256
        pal_off = _FILE_HDR + hdr_size
        palette = data[pal_off : pal_off + 4 * n_colors]
        if len(palette) != 4 * n_colors:
            raise ValueError("truncated palette")
    stride = _stride(width, bits)
    if data_off + stride * height > len(data):
        raise ValueError("truncated pixel data")
    channels = 1 if bits == 8 else 3
    out = bytearray(width * height * channels)
    row_bytes = width * channels
    for y in range(height):
        src = data_off + (height - 1 - y) * stride  # stored bottom-up
        row = data[src : src + stride]
        dst = y * row_bytes
        if bits == 8:
            for x in range(width):
                # palette entries are (B,G,R,0); resolve through the blue
                # channel (identical for the grayscale palettes we emit)
                out[dst + x] = palette[4 * row[x]]
        else:
            for x in range(width):
                out[dst + 3 * x] = row[3 * x + 2]
                out[dst + 3 * x + 1] = row[3 * x + 1]
                out[dst + 3 * x + 2] = row[3 * x]
    return width, height, channels, bytes(out)
