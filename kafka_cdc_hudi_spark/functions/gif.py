"""Pure-stdlib GIF codec — the fourth REAL media format (after PNG, WAV,
BMP), and the first with genuine entropy coding on the decode path: GIF
image data is LZW-compressed with variable-width codes (9..12 bits,
LSB-first bit packing, clear/EOI control codes, the ``cScSc`` self-
referencing case), so the decoder here is a full LZW implementation.

The encoder emits valid-but-simple LZW (literal codes with periodic clear
codes before the dictionary would force a width change — the classic
"uncompressed GIF" technique), which any conformant decoder accepts; OUR
decoder handles general LZW streams, not just this encoder's output
(pinned in tests against dictionary-growing streams).

Scope: single-image, non-interlaced GIF87a/89a with a global color table.
Extensions (0x21) are skipped per spec. ``ValueError`` on corruption,
``NotImplementedError`` on interlace / local color tables.

``decode_gif(data) -> (width, height, 1, pixels)`` with pixels the
palette-resolved (red channel) row-major samples — same contract as the
PNG/BMP codecs.
"""

from __future__ import annotations

import struct

GIF_MAGIC = b"GIF8"  # GIF87a / GIF89a


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.cur |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.cur & 0xFF)
            self.cur >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.cur & 0xFF)
        return bytes(self.out)


def encode_gif(pixels: bytes, width: int, height: int) -> bytes:
    """Encode 8-bit grayscale samples (row-major, ``width*height`` bytes)
    as a single-image GIF89a with a 256-entry grayscale global table."""
    if width <= 0 or height <= 0 or width > 0xFFFF or height > 0xFFFF:
        raise ValueError(f"bad dims {width}x{height}")
    if len(pixels) != width * height:
        raise ValueError(f"pixel buffer is {len(pixels)} bytes, want {width * height}")
    head = b"GIF89a" + struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    gct = b"".join(bytes((i, i, i)) for i in range(256))
    img_desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    clear, eoi = 256, 257
    bw = _BitWriter()
    bw.write(clear, 9)
    since_clear = 0
    for px in pixels:
        # each literal grows the decoder dict; clear before next_code
        # could reach 512 and force a 10-bit width
        if since_clear == 250:
            bw.write(clear, 9)
            since_clear = 0
        bw.write(px, 9)
        since_clear += 1
    bw.write(eoi, 9)
    lzw = bw.finish()
    blocks = bytearray([8])  # LZW min code size
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)  # block terminator
    return head + gct + img_desc + bytes(blocks) + b"\x3b"


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes((i,)) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream ended without EOI")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = table[: clear + 2]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"bad first LZW code {code}")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # cScSc
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} beyond table size {len(table)}")
        out.extend(entry)
        if len(out) > n_pixels:
            raise ValueError("LZW output exceeds image size")
        prev = entry
        # the "early change" off-by-one: the decoder's table lags the
        # encoder's by one at read time (the encoder assigned an entry for
        # the code it just sent; we only add it on the NEXT code), so the
        # width must grow when the table reaches 2^width - 1, not 2^width
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    if len(out) != n_pixels:
        raise ValueError(f"decoded {len(out)} pixels, want {n_pixels}")
    return bytes(out)


def decode_gif(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a single-image GIF -> ``(width, height, 1, pixels)`` with
    pixels palette-resolved through the global color table (red channel)."""
    if data[:4] != GIF_MAGIC or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    lsd_w, lsd_h, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    palette = b""
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = data[pos : pos + 3 * n]
        if len(palette) != 3 * n:
            raise ValueError("truncated global color table")
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            raise ValueError("GIF trailer before any image data")
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated image descriptor")
        _left, _top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if ipacked & 0x40:
            raise NotImplementedError("interlaced GIF unsupported")
        if ipacked & 0x80:
            raise NotImplementedError("local color table unsupported")
        if not palette:
            raise ValueError("no color table")
        if w <= 0 or h <= 0 or w > lsd_w or h > lsd_h:
            raise ValueError(f"bad image dims {w}x{h} in {lsd_w}x{lsd_h}")
        if pos >= len(data):
            raise ValueError("missing LZW minimum code size")
        min_code_size = data[pos]
        pos += 1
        if not 2 <= min_code_size <= 8:
            raise ValueError(f"bad LZW min code size {min_code_size}")
        lzw = bytearray()
        while pos < len(data) and data[pos] != 0:
            ln = data[pos]
            pos += 1
            if pos + ln > len(data):
                raise ValueError("truncated image sub-block")
            lzw.extend(data[pos : pos + ln])
            pos += ln
        indices = _lzw_decode(bytes(lzw), min_code_size, w * h)
        n_colors = len(palette) // 3
        if any(i >= n_colors for i in indices):
            raise ValueError("palette index out of range")
        return w, h, 1, bytes(palette[3 * i] for i in indices)
    raise ValueError("no image data in GIF")
