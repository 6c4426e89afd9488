"""Pure-stdlib baseline JPEG codec — the first DCT (transform) codec next
to the entropy-coding GIF/LZW path, completing the common-raster-format
set (PNG, BMP, GIF, WAV, JPEG).

Scope: baseline sequential JFIF, grayscale (1 component) AND 4:4:4 YCbCr
color (3 components, interleaved MCUs — the common real-world case), no
subsampling, no restart intervals — LEGAL profiles every JPEG decoder
accepts. The full pipeline is real: JFIF RGB->YCbCr color transform,
level shift, 8x8 forward DCT, quantization (standard Annex K luminance +
chrominance tables), zigzag, per-component differential DC, canonical
Huffman entropy coding with 0xFF byte stuffing — and the exact inverse on
decode (marker walk, DHT canonical rebuild, bit unstuffing, coefficient
extend, dequantize, IDCT, clamp, YCbCr->RGB).

Huffman tables are canonical fixed-length (4-bit DC / 8-bit AC codes over
the standard 162-symbol alphabet) — legal-but-suboptimal; the decoder
reads whatever DHT declares, so files interoperate with any baseline
decoder in both directions.

Determinism: encode and decode are pure float64/integer arithmetic in
fixed order — byte-identical across runs and hosts. For a FLAT w x h
image (all pixels = v, dims multiples of 8) the decoded result is exactly
``clamp(128 + 2 * round_half_away((v - 128) / 2))`` per pixel (only the
DC coefficient survives; luma q[0][0] = 16), which is what lets the
catalog entry carry a full SQL value oracle over a lossy codec. The
chroma generalization is ``flat_decode_value_q(v, 17)`` (chroma
q[0][0] = 17). The color transforms deliberately round with
``floor(x + 0.5)`` (round-half-up) in left-to-right IEEE-double
expression order so a SQL oracle can reproduce them bit-exactly —
JPEG does not mandate a color-transform rounding convention.

``ValueError`` on corruption; ``NotImplementedError`` on legal-but-
unsupported features (progressive, subsampled, 12-bit, DRI).
"""

from __future__ import annotations

import math
import struct

JPEG_MAGIC = b"\xff\xd8\xff"

#: standard Annex K luminance quantization table (row-major)
QUANT = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]


#: standard Annex K chrominance quantization table (row-major)
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]


def _round_half_up(x: float) -> int:
    """floor(x + 0.5) — the SQL-reproducible rounding the color
    transforms use (see module docstring)."""
    return int(math.floor(x + 0.5))


def rgb_to_ycbcr(r: int, g: int, b: int) -> tuple[int, int, int]:
    """JFIF full-range RGB -> YCbCr, rounded half-up. Expression order is
    load-bearing: the SQL oracle evaluates the same left-to-right IEEE
    double chain and must land on the identical value."""
    y = _round_half_up(0.299 * r + 0.587 * g + 0.114 * b)
    cb = _round_half_up(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b)
    cr = _round_half_up(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b)
    clamp = lambda v: min(255, max(0, v))  # noqa: E731
    return clamp(y), clamp(cb), clamp(cr)


def ycbcr_to_rgb(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    """JFIF YCbCr -> RGB, rounded half-up, clamped to [0, 255]."""
    r = _round_half_up(y + 1.402 * (cr - 128))
    g = _round_half_up(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
    b = _round_half_up(y + 1.772 * (cb - 128))
    clamp = lambda v: min(255, max(0, v))  # noqa: E731
    return clamp(r), clamp(g), clamp(b)


def _zigzag() -> list[int]:
    """Row-major index for each zigzag position (generated, not
    transcribed)."""
    order = []
    for s in range(15):
        diag = [(y, s - y) for y in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            diag.reverse()  # even diagonals run bottom-left -> top-right
        order.extend(y * 8 + x for y, x in diag)
    return order


ZIGZAG = _zigzag()

#: cosine basis c[u][x] = cos((2x+1) u pi / 16)
_COS = [[math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)] for u in range(8)]
_C = [1 / math.sqrt(2)] + [1.0] * 7

# -- canonical fixed-length Huffman tables ------------------------------------

#: DC: 12 size symbols, all 4-bit codes
DC_BITS = [0] * 16
DC_BITS[3] = 12  # BITS index 3 -> code length 4
DC_SYMBOLS = list(range(12))

#: AC: EOB, ZRL and every (run 0..15, size 1..10) pair, all 8-bit codes
AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
AC_BITS = [0] * 16
AC_BITS[7] = len(AC_SYMBOLS)  # code length 8


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the JPEG canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(DC_BITS, DC_SYMBOLS)
_AC_ENC = _canonical_codes(AC_BITS, AC_SYMBOLS)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


def _round_half_away(x: float) -> int:
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


from functools import lru_cache


@lru_cache(maxsize=4096)
def _fdct_quant_cached(block: tuple, chroma: bool = False) -> tuple:
    return tuple(_fdct_quant(list(block), QUANT_CHROMA if chroma else QUANT))


def _fdct_quant(block: list[int], quant: list[int] | None = None) -> list[int]:
    """Level-shifted 8x8 block -> quantized coefficients in zigzag order."""
    quant = QUANT if quant is None else quant
    coeffs = [0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                cy = _COS[u][y]
                row = block[y * 8 : y * 8 + 8]
                for x in range(8):
                    s += row[x] * cy * _COS[v][x]
            # DC scale 0.25 * (1/sqrt2)^2 is EXACTLY 0.125 (a power of two):
            # computing it as float products lands an ulp off, which flips
            # the half-boundary rounding for odd flat values and breaks the
            # flat_decode_value contract the SQL oracle relies on
            scale = 0.125 if u == 0 and v == 0 else 0.25 * _C[u] * _C[v]
            val = scale * s
            coeffs[u * 8 + v] = _round_half_away(val / quant[u * 8 + v])
    return [coeffs[i] for i in ZIGZAG]


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size, amplitude bits): one's-complement negatives."""
    size = abs(v).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _write_block(writer: _BitWriter, zz: list[int], prev_dc: int) -> int:
    """Entropy-encode one quantized zigzag block; returns the new DC
    predictor for this block's component."""
    diff = zz[0] - prev_dc
    size, bits = _magnitude(diff)
    code, length = _DC_ENC[size]
    writer.write(code, length)
    if size:
        writer.write(bits, size)
    # AC: run-length of zeros + (run, size) symbols
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            c, ln = _AC_ENC[0xF0]  # ZRL
            writer.write(c, ln)
            run -= 16
        size, bits = _magnitude(zz[i])
        c, ln = _AC_ENC[(run << 4) | size]
        writer.write(c, ln)
        writer.write(bits, size)
        run = 0
    if last_nz < 63:
        c, ln = _AC_ENC[0x00]  # EOB
        writer.write(c, ln)
    return zz[0]


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dht(cls: int, tid: int, bits: list[int], symbols: list[int]) -> bytes:
    return bytes([cls << 4 | tid]) + bytes(bits) + bytes(symbols)


def encode_jpeg_gray(pixels: bytes, width: int, height: int) -> bytes:
    """Encode raw 8-bit grayscale samples (row-major, width*height bytes)
    as a baseline JFIF JPEG. Images whose dims are not multiples of 8 are
    edge-padded (standard practice; decode crops back)."""
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dims {width}x{height}")
    if len(pixels) != width * height:
        raise ValueError(f"pixel buffer {len(pixels)} bytes, want {width * height}")
    bw = (width + 7) // 8
    bh = (height + 7) // 8

    def px(x: int, y: int) -> int:  # edge-replicated sample
        return pixels[min(y, height - 1) * width + min(x, width - 1)]

    writer = _BitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            block = tuple(
                px(bx * 8 + x, by * 8 + y) - 128 for y in range(8) for x in range(8)
            )
            # repeated blocks (flat regions, synthetic fixtures) hit the
            # memo instead of re-running the 64x64 float DCT
            zz = list(_fdct_quant_cached(block))
            prev_dc = _write_block(writer, zz, prev_dc)
    body = writer.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0x00]) + bytes(QUANT[i] for i in ZIGZAG))
    out += _seg(
        0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    )
    out += _seg(0xFFC4, _dht(0, 0, DC_BITS, DC_SYMBOLS))
    out += _seg(0xFFC4, _dht(1, 0, AC_BITS, AC_SYMBOLS))
    out += _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += body
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_color(pixels: bytes, width: int, height: int) -> bytes:
    """Encode raw 8-bit interleaved RGB samples (row-major, 3*width*height
    bytes) as a baseline 4:4:4 YCbCr JFIF JPEG: JFIF color transform
    (``rgb_to_ycbcr``), one 8x8 block per component per MCU interleaved
    Y,Cb,Cr, luma quant table for Y (tq 0) and Annex-K chroma table for
    Cb/Cr (tq 1), shared canonical Huffman tables, per-component
    differential DC. Non-multiple-of-8 dims are edge-padded."""
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dims {width}x{height}")
    if len(pixels) != 3 * width * height:
        raise ValueError(f"pixel buffer {len(pixels)} bytes, want {3 * width * height}")
    # plane-ize through the color transform once — vectorized: numpy
    # float64 elementwise ops are the same IEEE doubles as the scalar
    # rgb_to_ycbcr chain, so results are bit-identical (pinned in
    # tests/test_multimodal.py)
    import numpy as np

    rgb = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64).reshape(-1, 3)
    r_, g_, b_ = rgb[:, 0], rgb[:, 1], rgb[:, 2]
    y_ = np.floor(0.299 * r_ + 0.587 * g_ + 0.114 * b_ + 0.5)
    cb_ = np.floor(128.0 - 0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + 0.5)
    cr_ = np.floor(128.0 + 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + 0.5)
    planes = [
        np.clip(p, 0, 255).astype(np.uint8).tobytes() for p in (y_, cb_, cr_)
    ]
    bw = (width + 7) // 8
    bh = (height + 7) // 8

    def px(plane: bytearray, x: int, y: int) -> int:  # edge-replicated
        return plane[min(y, height - 1) * width + min(x, width - 1)]

    writer = _BitWriter()
    prev_dc = [0, 0, 0]
    for by in range(bh):
        for bx in range(bw):
            for ci in range(3):  # interleaved MCU: Y, Cb, Cr
                block = tuple(
                    px(planes[ci], bx * 8 + x, by * 8 + y) - 128
                    for y in range(8)
                    for x in range(8)
                )
                zz = list(_fdct_quant_cached(block, ci > 0))
                prev_dc[ci] = _write_block(writer, zz, prev_dc[ci])
    body = writer.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0x00]) + bytes(QUANT[i] for i in ZIGZAG))
    out += _seg(0xFFDB, bytes([0x01]) + bytes(QUANT_CHROMA[i] for i in ZIGZAG))
    out += _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 3)
        # component id, sampling 1x1 (4:4:4), quant table id
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += _seg(0xFFC4, _dht(0, 0, DC_BITS, DC_SYMBOLS))
    out += _seg(0xFFC4, _dht(1, 0, AC_BITS, AC_SYMBOLS))
    # all three components use DC table 0 / AC table 0
    out += _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    out += body
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- decoder ------------------------------------------------------------------


class _BitReader:
    """Entropy-segment reader with 0xFF00 unstuffing and a buffered
    accumulator (consume n bits per call, not per bit)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        # bounds-check so a truncated scan (data ends before EOI) raises
        # the documented corruption error, not a bare IndexError (ADVICE r7)
        if self.pos >= len(self.data):
            raise ValueError("truncated scan: entropy data ends before EOI")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated scan: entropy data ends before EOI")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif nxt == 0xD9:  # EOI reached; spec allows trailing 1-padding
                # do not consume the marker; synthesize 1-padding
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
            else:
                raise NotImplementedError(f"marker 0xFF{nxt:02x} inside scan (DRI/RST?)")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def peek16(self) -> int:
        while self.nbits < 16:
            self._fill()
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def take(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1  # bound the accumulator
        return v

    # back-compat names used by tests/fuzzers if any
    def read_bit(self) -> int:
        return self.take(1)

    def read_bits(self, n: int) -> int:
        return self.take(n) if n else 0


@lru_cache(maxsize=64)
def _decode_lut(bits_t: tuple, symbols_t: tuple) -> list:
    """16-bit-prefix lookup table for one canonical Huffman table:
    lut[peek16] = (symbol, code_length), None for invalid prefixes.
    Cached by table content — every image our encoder produces shares the
    two fixed tables, so the 65536-slot build cost amortizes across a
    whole decode workload (the per-bit tree walk dominated video decode)."""
    enc = _canonical_codes(list(bits_t), list(symbols_t))
    lut: list = [None] * 65536
    for sym, (code, length) in enc.items():
        base = code << (16 - length)
        for suffix in range(1 << (16 - length)):
            lut[base | suffix] = (sym, length)
    return lut


def _read_symbol(r: _BitReader, lut: list) -> int:
    hit = lut[r.peek16()]
    if hit is None:
        raise ValueError("invalid huffman code in scan")
    sym, length = hit
    r.take(length)
    return sym


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG -> (width, height, n_components, pixels).

    Grayscale (1 component) returns row-major 8-bit samples; 4:4:4 YCbCr
    (3 components, 1x1 sampling each, interleaved scan) returns
    interleaved RGB after the JFIF inverse color transform
    (``ycbcr_to_rgb``). Subsampled/progressive/DRI inputs raise
    ``NotImplementedError``."""
    if not data.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, list[int]] = {}
    trees: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = 0
    ncomp = 0
    comp_tq: dict[int, int] = {}  # component id -> quant table id
    comp_order: list[int] = []  # component ids in SOF order
    scan_tids: dict[int, tuple[int, int]] = {}  # comp id -> (dc_tid, ac_tid)
    scan_order: list[int] = []  # component ids in SOS order
    scan_pos = None
    while scan_pos is None:
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            raise ValueError("EOI before SOS")
        (ln,) = struct.unpack(">H", data[pos : pos + 2])
        payload = data[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                p += 1
                n = 64 * (2 if pq else 1)
                raw = payload[p : p + n]
                vals = (
                    list(struct.unpack(f">{64}H", raw)) if pq else list(raw)
                )
                tbl = [0] * 64
                for i, zz in enumerate(ZIGZAG):
                    tbl[zz] = vals[i]
                quant[tq] = tbl
                p += n
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                symbols = list(payload[p + 17 : p + 17 + n])
                trees[(cls, tid)] = _decode_lut(tuple(bits), tuple(symbols))
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision, height, width, ncomp = struct.unpack(">BHHB", payload[:6])
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit precision")
            if ncomp not in (1, 3):
                raise NotImplementedError(f"{ncomp}-component JPEG (1 or 3 only)")
            for c in range(ncomp):
                cid, sampling, tq = payload[6 + 3 * c : 9 + 3 * c]
                if sampling != 0x11:
                    raise NotImplementedError("subsampled JPEG (4:4:4 only)")
                comp_tq[cid] = tq
                comp_order.append(cid)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(f"non-baseline SOF 0xFF{marker:02x}")
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals (DRI)")
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            if ns != ncomp:
                raise NotImplementedError(
                    f"scan components ({ns}) != frame components ({ncomp})"
                )
            for c in range(ns):
                cid, tids = payload[1 + 2 * c], payload[2 + 2 * c]
                scan_tids[cid] = (tids >> 4, tids & 0xF)
                scan_order.append(cid)
            scan_pos = pos + ln
        # APPn/COM and anything else: skip
        pos += ln
    if not width or not height:
        raise ValueError("missing SOF before SOS")
    if ncomp == 3 and (comp_order != [1, 2, 3] or scan_order != [1, 2, 3]):
        # the color path below maps plane position -> (Y, Cb, Cr); a legal
        # baseline JPEG with non-JFIF component ids or a reordered scan
        # would silently swap channels — refuse instead (ADVICE r7)
        raise NotImplementedError(
            f"non-JFIF component order (SOF={comp_order}, SOS={scan_order}); "
            "only ids 1,2,3 in order are supported"
        )
    comp_q: list[list[int]] = []
    comp_trees: list[tuple[dict, dict]] = []
    for cid in scan_order:
        q = quant.get(comp_tq.get(cid, -1))
        if q is None:
            raise ValueError(f"missing quant table for component {cid}")
        dc_tid, ac_tid = scan_tids[cid]
        dc_tree = trees.get((0, dc_tid))
        ac_tree = trees.get((1, ac_tid))
        if dc_tree is None or ac_tree is None:
            raise ValueError("missing huffman tables for scan")
        comp_q.append(q)
        comp_trees.append((dc_tree, ac_tree))

    r = _BitReader(data, scan_pos)
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    planes = [bytearray(bw * 8 * bh * 8) for _ in range(ncomp)]
    prev_dc = [0] * ncomp
    for by in range(bh):
        for bx in range(bw):
            for ci in range(ncomp):  # interleaved MCU (trivial when ncomp=1)
                dc_tree, ac_tree = comp_trees[ci]
                q = comp_q[ci]
                zz = [0] * 64
                size = _read_symbol(r, dc_tree)
                prev_dc[ci] += _extend(r.take(size) if size else 0, size)
                zz[0] = prev_dc[ci]
                i = 1
                while i < 64:
                    sym = _read_symbol(r, ac_tree)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        i += 16
                        continue
                    run, size = sym >> 4, sym & 0xF
                    i += run
                    if i > 63:
                        raise ValueError("AC coefficient index out of range")
                    zz[i] = _extend(r.take(size) if size else 0, size)
                    i += 1
                # de-zigzag + dequantize, keeping only nonzero coefficients —
                # the standard sparse-IDCT: typical blocks carry a handful of
                # coefficients, so the reconstruction sum iterates those
                # instead of all 64 basis terms per pixel
                nz = [
                    (ri // 8, ri % 8, zz[zi] * q[ri])
                    for zi, ri in enumerate(ZIGZAG)
                    if zz[zi]
                ]
                plane = planes[ci]
                if not nz or (len(nz) == 1 and nz[0][:2] == (0, 0)):
                    # DC-only block: the IDCT is a constant fill (flat
                    # regions; every flat fixture) — skip 64 basis sums
                    dc_c = nz[0][2] if nz else 0
                    const = min(255, max(0, _round_half_away(0.25 * (0.5 * dc_c) + 128.0)))
                    for y in range(8):
                        row0 = (by * 8 + y) * bw * 8 + bx * 8
                        for x in range(8):
                            plane[row0 + x] = const
                    continue
                for y in range(8):
                    for x in range(8):
                        s = 0.0
                        for u, v, c in nz:
                            # the DC basis product is EXACTLY 0.5 (the
                            # encoder's 0.125-scale special case mirrored):
                            # computing it as _C[0]^2 float products lands
                            # an ulp low, flipping half-boundary rounding
                            # for DC-only blocks (chroma q=17, coeff 52)
                            if u == 0 and v == 0:
                                s += 0.5 * c
                            else:
                                s += _C[u] * _COS[u][y] * _C[v] * _COS[v][x] * c
                        val = _round_half_away(0.25 * s + 128.0)
                        plane[(by * 8 + y) * bw * 8 + bx * 8 + x] = min(
                            255, max(0, val)
                        )
    if ncomp == 1:
        padded = planes[0]
        if bw * 8 == width and bh * 8 == height:
            return width, height, 1, bytes(padded)
        rows = [padded[y * bw * 8 : y * bw * 8 + width] for y in range(height)]
        return width, height, 1, b"".join(bytes(r) for r in rows)
    # color: crop + inverse JFIF transform to interleaved RGB — vectorized
    # (bit-identical to the scalar ycbcr_to_rgb chain, see encode note)
    import numpy as np

    stride = bw * 8
    grid = [
        np.frombuffer(bytes(p), dtype=np.uint8)
        .reshape(bh * 8, stride)[:height, :width]
        .astype(np.float64)
        for p in planes
    ]
    yv, cb, cr = grid
    rr = np.floor(yv + 1.402 * (cr - 128) + 0.5)
    gg = np.floor(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5)
    bb = np.floor(yv + 1.772 * (cb - 128) + 0.5)
    out = np.stack(
        [np.clip(c, 0, 255).astype(np.uint8) for c in (rr, gg, bb)], axis=-1
    )
    return width, height, 3, out.tobytes()


def decode_jpeg_gray(data: bytes) -> tuple[int, int, int, bytes]:
    """Back-compat name: decode a baseline JPEG (grayscale or color —
    see :func:`decode_jpeg`)."""
    return decode_jpeg(data)


def flat_decode_value(v: int) -> int:
    """The exact decoded pixel value for a FLAT image of value ``v`` (dims
    multiples of 8): only the DC coefficient survives, quantized by
    q[0][0] = 16. Shared with the SQL oracle."""
    a = v - 128
    quantized = (abs(a) + 1) // 2 * (1 if a >= 0 else -1)
    return min(255, max(0, 128 + 2 * quantized))


def flat_decode_value_q(v: int, q00: int) -> int:
    """``flat_decode_value`` generalized to any DC quantizer ``q00`` (the
    chroma table's 17 is the case the color fixtures need). Exact integer
    arithmetic; tests/test_multimodal.py pins it against the real codec's
    float path for every v in [0, 255] on both tables, so the SQL oracle
    can use the same closed form:

      quantized = round_half_away(8 * (v - 128) / q00)
      decoded   = clamp(round_half_away(128 + q00 * quantized / 8))

    with the integer encodings below (for q00 = 17 the first rounding
    never lands on an exact .5; the second is computed as
    (1024 + 17 * quantized + 4) // 8, matching the decoder's half-up
    behavior at its reachable .5 boundaries)."""
    a = v - 128
    # round_half_away(8a / q00) without floats: never an exact .5 for
    # q00=17 (16a ≡ 17(2m+1) has no solution with 17 coprime to 16 unless
    # 17 | a, which yields an integer); exact for the power-of-two 16
    quantized = (16 * abs(a) + q00) // (2 * q00) * (1 if a >= 0 else -1)
    t = 1024 + q00 * quantized  # decoded value in units of 1/8, >= 0
    return min(255, max(0, (t + 4) // 8))
