"""Pure-stdlib WebP-lossless (VP8L) codec for the multimodal decode path.

Completes the from-scratch codec family (PNG/BMP/GIF/JPEG/TIFF/WAV/AVI):
the VP8L bitstream is fully self-contained — LSB-first bit packing,
canonical prefix codes (both the "simple" and the code-length-coded
"normal" form), LZ77 backward references, a color cache, and the four
transforms (predictor, color, subtract-green, color-indexing incl. pixel
bundling for small palettes) — so no external codec library is needed.
Spec: the public "WebP Lossless Bitstream Specification" (RFC 9649).

Scope (and honest limits):
- decoder: literals, LZ77 refs with both ABSOLUTE distance codes and the
  120 short-distance NEIGHBOR codes, meta prefix images (multiple code
  groups selected by a tiled sub-image), color cache, all four
  transforms, palette pixel bundling, both prefix-code forms. The meta
  prefix bit exists only at level 0 (the spatially-coded main image);
  transform tiles and palettes are plain entropy-coded images without it.
- encoder: fixture-grade but emits GENUINE VP8L streams; ``variant``
  selects which decoder machinery a stream exercises (flat prefix codes,
  LZ77 runs, color cache, subtract-green, predictor, palette, neighbor
  distance codes, meta prefix groups). Backward-reference distances are
  mapped through the neighbor table exactly like libwebp's encoder.
- cross-implementation compatibility is untestable in this container
  (no libwebp anywhere); round-trip tests pin encoder/decoder mutual
  consistency and hand-built streams pin the bit-level format details.
  The neighbor table is generated from the spec's ordering rule (the 120
  closest (dx, dy) offsets with dy in 0..7, dx in -7..8, dx >= 1 on row
  0, sorted by squared distance then larger dy then positive dx first)
  and the FULL 120-entry listing is pinned verbatim against the spec in
  tests (ADVICE r13).
- lossy VP8 (the majority of real-world WebP) raises a loud
  NotImplementedError. Honesty correction (r14): everything needed IS
  public — RFC 6386 carries the complete default coefficient
  probability tables, token trees, and intra-mode probabilities — so a
  key-frame intra-only decoder is a feasible from-spec build; the guard
  reflects the outstanding implementation effort (boolean coder +
  dequant + iDCT/iWHT + the four 16x16 / ten 4x4 intra predictors +
  loop filter), not missing information.

Runs per Arrow batch inside mapInPandas workers; rows are small images,
so pure-Python loops are bounded by pixel count per row — stage
parallelism comes from Spark partitioning (media_repartition), not the
kernel.
"""

from __future__ import annotations

import struct
from functools import lru_cache as _lru_cache

WEBP_RIFF_MAGIC = b"RIFF"

#: code-length-code symbol order (spec §"Decoding the Code Lengths")
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
_GREEN_LITERALS = 256
_LENGTH_CODES = 24
_DISTANCE_CODES = 40


def _neighbor_table() -> list[tuple[int, int]]:
    """The 120 short-distance (dx, dy) offsets, spec order: distance
    prefix values 1..120 name a close neighbor of the current pixel
    rather than an absolute distance. The table is the 120 offsets with
    dy in 0..7 and dx in -7..8 (dx >= 1 when dy == 0), sorted by squared
    Euclidean distance, ties broken by larger dy first, then positive dx
    before negative — which reproduces the spec's explicit listing
    ((0,1), (1,0), (1,1), (-1,1), (0,2), ...)."""
    cands = [
        (dx, dy)
        for dy in range(8)
        for dx in range(-7, 9)
        if not (dy == 0 and dx < 1)
    ]
    return sorted(cands, key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]))


#: distance prefix value (1-based) -> (dx, dy); values > 120 are absolute
_NEIGHBORS = _neighbor_table()
_NEIGHBOR_CODE = {p: i + 1 for i, p in enumerate(_NEIGHBORS)}


def _distance_to_code(dist: int, xsize: int) -> int:
    """Encoder-side inverse of the neighbor mapping (libwebp's
    DistanceToPlaneCode): prefer a 1..120 neighbor code when the absolute
    distance lands on one for this row width, else dist + 120."""
    dy, dx = divmod(dist, xsize)
    code = _NEIGHBOR_CODE.get((dx, dy))
    if code is not None:
        return code
    # same distance expressed as a negative dx on the next row
    code = _NEIGHBOR_CODE.get((dx - xsize, dy + 1))
    if code is not None:
        return code
    return dist + 120


def _code_to_distance(dcode: int, xsize: int) -> int:
    """Decoder-side mapping: 1..120 -> neighbor offset (clamped to >= 1),
    else absolute distance dcode - 120."""
    if dcode > 120:
        return dcode - 120
    dx, dy = _NEIGHBORS[dcode - 1]
    dist = dy * xsize + dx
    return dist if dist >= 1 else 1


def is_webp(content: bytes) -> bool:
    return (
        len(content) >= 16
        and content[:4] == WEBP_RIFF_MAGIC
        and content[8:12] == b"WEBP"
    )


# -- bit io (LSB-first, like DEFLATE) -----------------------------------------


class _BitReader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        pos = self.pos
        if pos + n > self.nbits:
            raise ValueError("truncated VP8L stream")
        self.pos = pos + n
        i = pos >> 3
        off = pos & 7
        chunk = int.from_bytes(
            self.data[i : i + ((n + off + 7) >> 3)], "little"
        )
        return (chunk >> off) & ((1 << n) - 1)

    def peek(self, n: int) -> int:
        """Next ``n`` stream bits LSB-first WITHOUT advancing; bits past
        the end read as 0 (the LUT consumer re-checks bounds on
        advance, so truncation still raises)."""
        pos = self.pos
        i = pos >> 3
        off = pos & 7
        chunk = int.from_bytes(
            self.data[i : i + ((n + off + 7) >> 3)], "little"
        )
        return (chunk >> off) & ((1 << n) - 1)

    def read_code_bit(self) -> int:
        pos = self.pos
        if pos >= self.nbits:
            raise ValueError("truncated VP8L stream")
        byte = self.data[pos >> 3]
        self.pos = pos + 1
        return (byte >> (pos & 7)) & 1


class _BitWriter:
    """LSB-first bit sink. Bits accumulate in an int buffer and flush to
    the bytearray a whole byte at a time (r15: the per-BIT append loop was
    the single hottest encoder frame in the profile — ~1.6M calls/0.9s per
    fixture pass; the multi-bit write emits the identical bit stream).
    Observable state matches the original per-bit writer exactly: ``out``
    always holds the partial trailing byte and ``bitpos`` is the next free
    bit index in it (the hand-built bitstream tests splice on both)."""

    __slots__ = ("out", "_acc", "bitpos")

    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self.bitpos = 0

    def write(self, value: int, n: int) -> None:
        nacc = self.bitpos
        acc = self._acc | ((value & ((1 << n) - 1)) << nacc)
        nacc += n
        if nacc >= 8:
            out = self.out
            if self.bitpos:
                del out[-1]  # re-emit the partial byte now being extended
            while nacc >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nacc -= 8
            if nacc:
                out.append(acc & 0xFF)
        elif n:
            if self.bitpos:
                self.out[-1] = acc & 0xFF
            else:
                self.out.append(acc & 0xFF)
        self._acc = acc
        self.bitpos = nacc

    def write_code(self, code: int, length: int) -> None:
        """Prefix-code bits are emitted MSB-first into the LSB-first
        stream: bit-reverse the code once and emit with a single write."""
        v = 0
        for i in range(length):
            v = (v << 1) | ((code >> i) & 1)
        self.write(v, length)

    def bytes(self) -> bytes:
        return bytes(self.out)


# -- canonical prefix codes ----------------------------------------------------


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """{symbol: length>0} -> {symbol: (code, length)}, canonical order
    (increasing length, then symbol) — the DEFLATE/VP8L construction."""
    code = 0
    prev_len = 0
    out: dict[int, tuple[int, int]] = {}
    # plain tuple sort == (length, symbol) order, no per-element lambda
    for ln, sym in sorted((ln, s) for s, ln in lengths.items()):
        code <<= ln - prev_len
        out[sym] = (code, ln)
        code += 1
        prev_len = ln
    return out


class _PrefixCode:
    """Decoder side: canonical-code reader with two strategies.

    The default is the bit-by-bit (length, accumulated-code) dict walk —
    cheapest when an image is small, because it needs no table build.
    ``ensure_lut()`` upgrades to a one-shot lookup table indexed by the
    next ``max_len`` STREAM bits LSB-first (prefix-code bits are emitted
    MSB-first into the LSB-first stream, so a symbol's index pattern is
    its code bit-reversed, with every longer extension mapping to the
    same symbol; the fill is a C-speed strided slice assignment). The
    entropy-image decoder calls ensure_lut() only when the pixel count
    amortizes the build — real web images do, 100-pixel fixtures don't.
    Spec caps code lengths at 15, so a LUT is at most 32k entries.

    r15: canonically-constructed codes additionally carry the classic
    first-code/count/offset arrays, so the default read is ONE bit-peek
    plus pure int arithmetic per symbol (no per-bit method call, no dict
    probe, no build cost beyond O(n_symbols)) — the measured optimum for
    the small images where a LUT build cannot amortize. Hand-built code
    lists (:meth:`from_code_list` — the simple form, possibly degenerate)
    keep the dict walk."""

    __slots__ = (
        "single", "codes", "table", "lut", "max_len",
        "first", "cnt", "off", "syms",
    )

    def __init__(self, lengths: dict[int, int]):
        used = {s: ln for s, ln in lengths.items() if ln > 0}
        if not used:
            raise ValueError("empty prefix code")
        if max(used.values()) > 15:
            raise ValueError("VP8L code length > 15")
        if len(used) == 1:
            self.single = next(iter(used))
            self.codes = None
            self.table = None
            self.lut = None
            self.max_len = 0
            self.first = None
            return
        self._init_codes(_canonical_codes(used))
        # canonical construction guarantees the per-length code values are
        # consecutive from first[L] upward — the invariant the fast
        # canonical walk needs (from_code_list skips this: its simple-form
        # codes may be degenerate/non-canonical). _canonical_codes emits
        # symbols in (length, symbol) order with monotonically increasing
        # codes, so one linear pass builds the arrays.
        L = self.max_len
        first = [0] * (L + 1)
        cnt = [0] * (L + 1)
        off = [0] * (L + 1)
        syms = [s for s, _c, _ln in self.codes]
        prev = 0
        for pos_i, (sym, code, ln) in enumerate(self.codes):
            if ln != prev:
                first[ln] = code
                off[ln] = pos_i
                prev = ln
            cnt[ln] += 1
        self.first, self.cnt, self.off, self.syms = first, cnt, off, syms

    @classmethod
    def from_code_list(cls, entries: list[tuple[int, int, int]]) -> "_PrefixCode":
        """Construct from explicit (symbol, code, length) entries. The
        simple two-symbol form maps code 0 to the FIRST symbol in read
        order (not canonical order), and spec-legal degenerate streams
        may map BOTH codes to the SAME symbol — so entries are keyed by
        code, never by symbol (and the canonical fast walk is skipped:
        ``first`` stays None, reads take the dict walk)."""
        pc = cls.__new__(cls)
        pc.single = None
        pc.first = None
        pc._init_codes(entries)
        return pc

    def _init_codes(self, codes) -> None:
        """``codes``: {symbol: (code, len)} or [(symbol, code, len)]."""
        if isinstance(codes, dict):
            codes = [(s, c, ln) for s, (c, ln) in codes.items()]
        self.single = None
        self.codes = codes
        self.table = {(ln, code): sym for sym, code, ln in codes}
        self.lut = None
        self.max_len = max(ln for _s, _c, ln in codes)

    def ensure_lut(self) -> None:
        if self.lut is not None or self.single is not None:
            return
        L = self.max_len
        size = 1 << L
        lut: list = [None] * size
        for sym, code, ln in self.codes:
            # bit-reverse the MSB-first code into stream (LSB-first) order
            v = 0
            for i in range(ln):
                v |= ((code >> i) & 1) << (ln - 1 - i)
            step = 1 << ln
            n_slots = (size - v + step - 1) >> ln
            lut[v::step] = [(sym, ln)] * n_slots
        self.lut = lut

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        pos = br.pos
        L = self.max_len
        i = pos >> 3
        boff = pos & 7
        if self.lut is not None:
            # inlined peek (hot path: one call frame per symbol saved)
            chunk = int.from_bytes(
                br.data[i : i + ((L + boff + 7) >> 3)], "little"
            )
            entry = self.lut[(chunk >> boff) & ((1 << L) - 1)]
            if entry is None:
                raise ValueError("invalid prefix code in VP8L stream")
            sym, ln = entry
            br.pos = pos + ln
            if br.pos > br.nbits:
                raise ValueError("truncated VP8L stream")
            return sym
        if self.first is not None:
            # canonical walk: one peek, then pure int arithmetic — prefix
            # bits are MSB-first in stream order, so accumulate from the
            # low end of the peeked chunk
            chunk = int.from_bytes(
                br.data[i : i + ((L + boff + 7) >> 3)], "little"
            ) >> boff
            first, cnt = self.first, self.cnt
            acc = 0
            for ln in range(1, L + 1):
                acc = (acc << 1) | (chunk & 1)
                chunk >>= 1
                idx = acc - first[ln]
                if 0 <= idx < cnt[ln]:
                    br.pos = pos + ln
                    if br.pos > br.nbits:
                        raise ValueError("truncated VP8L stream")
                    return self.syms[self.off[ln] + idx]
            raise ValueError("invalid prefix code in VP8L stream")
        acc = 0
        table_get = self.table.get
        for ln in range(1, self.max_len + 1):
            acc = (acc << 1) | br.read_code_bit()
            sym = table_get((ln, acc))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code in VP8L stream")


def _complete_flat_lengths(n: int) -> dict[int, int]:
    """Complete canonical code over symbols [0, n): the first (2^L - n)
    symbols get length L-1, the rest L, where L = ceil(log2 n) — Kraft
    sum exactly 1, so strict decoders accept it."""
    if n < 2:
        raise ValueError("use the simple form for <2 symbols")
    L = max(1, (n - 1).bit_length())
    a = (1 << L) - n
    return {s: (L - 1 if s < a else L) for s in range(n)}


# -- prefix-code (de)serialization ---------------------------------------------


@_lru_cache(maxsize=4096)
def _prefix_code_cached(length_items: tuple) -> _PrefixCode:
    """Shared canonical-code instances keyed by the exact (symbol,
    length) map (r15: fixture corpora re-read the same handful of length
    maps thousands of times — construction was ~40% of the decode
    profile). Safe to share: a _PrefixCode is immutable after build
    except ensure_lut(), which is idempotent."""
    return _PrefixCode(dict(length_items))


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple form
        num_symbols = br.read(1) + 1
        if br.read(1):
            first = br.read(8)
        else:
            first = br.read(1)
        if num_symbols == 1:
            return _PrefixCode({first: 1})  # zero bits on read
        second = br.read(8)
        # code 0 -> FIRST symbol as written (read order, NOT canonical
        # symbol order — they differ when first > second)
        return _PrefixCode.from_code_list([(first, 0, 1), (second, 1, 1)])
    # normal form: code-length code first
    num_clc = 4 + br.read(4)
    clc_lengths: dict[int, int] = {}
    for i in range(num_clc):
        ln = br.read(3)
        if ln:
            clc_lengths[_CLC_ORDER[i]] = ln
    clc = _prefix_code_cached(tuple(sorted(clc_lengths.items())))
    if br.read(1):  # explicit max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = {}
    prev_len = 8
    sym = 0
    while sym < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = clc.read(br)
        if s < 16:
            if s:
                lengths[sym] = s
                prev_len = s
            sym += 1
        elif s == 16:
            for _ in range(3 + br.read(2)):
                lengths[sym] = prev_len
                sym += 1
        elif s == 17:
            sym += 3 + br.read(3)
        else:  # 18
            sym += 11 + br.read(7)
    # symbols are assigned in increasing order above, so the insertion
    # order is already the sorted cache key
    return _prefix_code_cached(tuple(lengths.items()))


def _rev_bits(code: int, ln: int) -> int:
    """MSB-first prefix code -> LSB-first stream bit pattern."""
    v = 0
    for i in range(ln):
        v = (v << 1) | ((code >> i) & 1)
    return v


@_lru_cache(maxsize=1024)
def _flat_code_plan(n: int):
    """Serialized normal-form header + code maps for the complete
    semi-flat code over [0, n) — everything ``_write_prefix_code`` emits
    for the normal form depends ONLY on n, so the whole header is built
    once per alphabet size (r15: the per-image header serialization —
    tokenize + clc canonical build + per-token write_code — was ~25% of
    the encoder profile). Returns (header_val, header_bits, codes,
    rev_codes): the header as ONE LSB-first integer ready for a single
    ``bw.write``, the canonical {sym: (code, len)} map (the documented
    return contract), and {sym: (stream_bits, len)} pre-bit-reversed for
    the data-loop emitters."""
    bw = _BitWriter()
    bw.write(0, 1)  # normal
    lengths = _complete_flat_lengths(n)
    # the lengths take at most two distinct values {L-1, L}
    distinct = sorted(set(lengths.values()))
    clc_syms = distinct + [16]
    clc_lengths = (
        {distinct[0]: 1, 16: 1}
        if len(distinct) == 1
        else {distinct[0]: 2, distinct[1]: 2, 16: 1}
    )
    num_clc = max(_CLC_ORDER.index(s) for s in clc_syms) + 1
    bw.write(num_clc - 4, 4)
    for i in range(num_clc):
        bw.write(clc_lengths.get(_CLC_ORDER[i], 0), 3)
    clc_codes = _canonical_codes(clc_lengths)
    # tokenize the length sequence first: max_symbol counts code-length
    # TOKENS the reader may consume (one loop iteration each), not the
    # lengths they expand to — a repeat-16 token is ONE unit
    tokens: list[tuple] = []
    i = 0
    while i < n:
        ln = lengths[i]
        run = 1
        while i + run < n and lengths[i + run] == ln:
            run += 1
        tokens.append(("len", ln))
        emitted = 1
        while run - emitted >= 3:
            rep = min(6, run - emitted)
            tokens.append(("rep", rep))
            emitted += rep
        for _ in range(run - emitted):
            tokens.append(("len", ln))
        i += run
    max_symbol = len(tokens)
    bw.write(1, 1)
    nbits_k = 0
    while max_symbol - 2 >= (1 << (2 + 2 * nbits_k)):
        nbits_k += 1
    bw.write(nbits_k, 3)
    bw.write(max_symbol - 2, 2 + 2 * nbits_k)
    for kind, v in tokens:
        if kind == "len":
            c, cl = clc_codes[v]
            bw.write_code(c, cl)
        else:
            c16, cl16 = clc_codes[16]
            bw.write_code(c16, cl16)
            bw.write(v - 3, 2)
    header_bits = len(bw.out) * 8 - (8 - bw.bitpos if bw.bitpos else 0)
    header_val = int.from_bytes(bw.bytes(), "little") & ((1 << header_bits) - 1)
    codes = _canonical_codes(lengths)
    rev_codes = {s: (_rev_bits(c, ln), ln) for s, (c, ln) in codes.items()}
    return header_val, header_bits, codes, rev_codes


def _write_prefix_code(
    bw: _BitWriter, used: list[int], alphabet_size: int, rev: bool = False
) -> dict[int, tuple[int, int]]:
    """Emit a prefix code covering ``used`` symbols; returns {symbol:
    (code, length)} for the writer. Simple form for <=2 used symbols
    (when they fit 8 bits), else a complete semi-flat normal code over
    [0, max_used+1). ``rev=True`` returns the codes pre-bit-reversed
    into LSB-first stream order for direct ``bw.write`` emission (the
    1-bit simple-form codes are their own reversal)."""
    used = sorted(set(used))
    if 1 <= len(used) <= 2 and used[-1] < 256:
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        first = used[0]
        if first <= 1:
            bw.write(0, 1)
            bw.write(first, 1)
        else:
            bw.write(1, 1)
            bw.write(first, 8)
        if len(used) == 1:
            return {first: (0, 0)}
        bw.write(used[1], 8)
        return {used[0]: (0, 1), used[1]: (1, 1)}
    header_val, header_bits, codes, rev_codes = _flat_code_plan(used[-1] + 1)
    bw.write(header_val, header_bits)
    return rev_codes if rev else codes


# -- LZ77 length/distance prefix values ----------------------------------------


def _read_lz77_value(br: _BitReader, code: int) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _lz77_code_for(value: int) -> tuple[int, int, int]:
    """value -> (prefix code, extra bits, extra value)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    rem = v - (2 << extra)
    if rem < (1 << extra):
        return 2 * extra + 2, extra, rem
    return 2 * extra + 3, extra, rem - (1 << extra)


# -- transforms ------------------------------------------------------------------


def _avg2(a: tuple, b: tuple) -> tuple:
    return tuple((x + y) >> 1 for x, y in zip(a, b))


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _select(t: tuple, l: tuple, tl: tuple) -> tuple:  # noqa: E741
    p = [tc + lc - tlc for tc, lc, tlc in zip(t, l, tl)]
    pt = sum(abs(pc - tc) for pc, tc in zip(p, t))
    pl = sum(abs(pc - lc) for pc, lc in zip(p, l))
    return t if pt <= pl else l


def _predict(mode: int, l: tuple, t: tuple, tl: tuple, tr: tuple) -> tuple:  # noqa: E741
    if mode == 0:
        return (255, 0, 0, 0)  # ARGB opaque black
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(t, l, tl)
    if mode == 12:
        return tuple(_clamp(lc + tc - tlc) for lc, tc, tlc in zip(l, t, tl))
    if mode == 13:
        # ClampAddSubtractHalf: the spec's (a - c) / 2 is C integer
        # division (truncation toward zero), not Python floor division —
        # they differ when (ave - TL) is negative and odd.
        ave = _avg2(l, t)
        out = []
        for a, c in zip(ave, tl):
            d = a - c
            half = -((-d) >> 1) if d < 0 else d >> 1
            out.append(_clamp(a + half))
        return tuple(out)
    raise ValueError(f"predictor mode {mode} out of range")


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: int8(t) * int8(c) >> 5 (arithmetic)."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


# -- entropy-coded image ----------------------------------------------------------


def _read_entropy_image(
    br: _BitReader, w: int, h: int, is_level0: bool = False
) -> list[tuple]:
    """Decode one entropy-coded ARGB image (pixels as (a, r, g, b)).

    ``is_level0`` is True only for the spatially-coded MAIN image: per
    the spec (and libwebp's DecodeImageStream/ReadHuffmanCodes) only
    level 0 carries the meta-prefix-image bit; transform tile sub-images
    and palettes are plain entropy-coded images without it."""
    cache_bits = br.read(4) if br.read(1) else 0
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [(0, 0, 0, 0)] * cache_size
    meta = None  # (size_bits, tile_w, group_index_per_tile)
    n_groups = 1
    if is_level0 and br.read(1):
        size_bits = br.read(3) + 2
        tw = (w + (1 << size_bits) - 1) >> size_bits
        th = (h + (1 << size_bits) - 1) >> size_bits
        meta_px = _read_entropy_image(br, tw, th)
        # group index = (red << 8) | green of the meta-image pixel
        idx = [(p[1] << 8) | p[2] for p in meta_px]
        n_groups = max(idx) + 1
        meta = (size_bits, tw, idx)
    green_alpha = _GREEN_LITERALS + _LENGTH_CODES + cache_size
    groups = [
        (
            _read_prefix_code(br, green_alpha),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, _DISTANCE_CODES),
        )
        for _ in range(n_groups)
    ]

    n = w * h
    if n >= 1024:  # LUT build amortizes past ~1k pixels (see _PrefixCode)
        for g in groups:
            for code in g:
                code.ensure_lut()
    px: list[tuple] = []

    if cache_size:
        def emit(p: tuple) -> None:
            px.append(p)
            argb = (p[0] << 24) | (p[1] << 16) | (p[2] << 8) | p[3]
            cache[(0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = p
    else:
        emit = px.append  # no cache: skip a Python frame per pixel

    while len(px) < n:
        if meta is None:
            green, red, blue, alpha, dist = groups[0]
        else:
            size_bits, tw, idx = meta
            x, y = len(px) % w, len(px) // w
            green, red, blue, alpha, dist = groups[
                idx[(y >> size_bits) * tw + (x >> size_bits)]
            ]
        s = green.read(br)
        if s < 256:
            r = red.read(br)
            b = blue.read(br)
            a = alpha.read(br)
            emit((a, r, s, b))
        elif s < 256 + _LENGTH_CODES:
            length = _read_lz77_value(br, s - 256)
            distance = _code_to_distance(_read_lz77_value(br, dist.read(br)), w)
            for _ in range(length):
                emit(px[-distance])
        else:
            emit(cache[s - 256 - _LENGTH_CODES])
    return px


# -- decoder --------------------------------------------------------------------


def _walk_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload) over a RIFF chunk run (word-aligned)."""
    off = start
    while off + 8 <= end:
        tag = data[off : off + 4]
        (size,) = struct.unpack("<I", data[off + 4 : off + 8])
        yield tag, data[off + 8 : off + 8 + size]
        off += 8 + size + (size & 1)


#: VP8X flag byte (container spec): Rsv(2) ICC Alpha EXIF XMP Anim Rsv
_VP8X_ANIM = 0x02


def decode_webp(data: bytes) -> tuple[int, int, int, bytes]:
    """VP8L decode -> (width, height, n_channels, raw samples).

    A fully-opaque gray image returns 1 channel of gray bytes (matching
    the gray-fixture convention of the other codecs); anything else
    returns 4-channel interleaved RGBA."""
    if not is_webp(data):
        raise ValueError("not a RIFF/WEBP container")
    payload = None
    for tag, body in _walk_chunks(data, 12, len(data)):
        if tag == b"VP8X" and len(body) >= 1 and body[0] & _VP8X_ANIM:
            raise ValueError(
                "animated WebP: use decode_webp_frames for per-frame access"
            )
        if tag == b"VP8L":
            payload = body
            break
    if payload is None:
        raise NotImplementedError(
            "no VP8L chunk: lossy VP8 WebP is not supported "
            "(the lossless bitstream is the implemented scope)"
        )
    if payload[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-used hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")

    transforms = []  # (type, data) in read order
    seen = set()
    img_w = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(ttype)
        if ttype == 0 or ttype == 1:  # predictor / color: tiled subimage
            size_bits = br.read(3) + 2
            bs = 1 << size_bits
            tw = (img_w + bs - 1) >> size_bits
            th = (h + bs - 1) >> size_bits
            tiles = _read_entropy_image(br, tw, th)
            transforms.append((ttype, (size_bits, tw, tiles)))
        elif ttype == 2:  # subtract green
            transforms.append((2, None))
        else:  # 3: color indexing
            pal_size = br.read(8) + 1
            pal = _read_entropy_image(br, pal_size, 1)
            # palette entries are delta-coded component-wise
            for i in range(1, pal_size):
                pal[i] = tuple((pal[i][c] + pal[i - 1][c]) & 255 for c in range(4))
            if pal_size <= 2:
                width_bits = 3
            elif pal_size <= 4:
                width_bits = 2
            elif pal_size <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append((3, (pal, width_bits)))
            img_w = (img_w + (1 << width_bits) - 1) >> width_bits

    px = _read_entropy_image(br, img_w, h, is_level0=True)

    for ttype, tdata in reversed(transforms):
        if ttype == 3:
            pal, width_bits = tdata
            if width_bits:
                per = 1 << width_bits
                bits = 8 >> width_bits
                mask = (1 << bits) - 1
                wide: list[tuple] = []
                for y in range(h):
                    row = px[y * img_w : (y + 1) * img_w]
                    out_row = []
                    for p in row:
                        g = p[2]
                        for k in range(per):
                            idx = (g >> (k * bits)) & mask
                            out_row.append(pal[idx] if idx < len(pal) else (0, 0, 0, 0))
                    wide.extend(out_row[:w])
                px = wide
                img_w = w
            else:
                px = [pal[p[2]] if p[2] < len(pal) else (0, 0, 0, 0) for p in px]
        elif ttype == 2:
            px = [
                (a, (r + g) & 255, g, (b + g) & 255) for (a, r, g, b) in px
            ]
        elif ttype == 0:
            size_bits, tw, tiles = tdata
            out: list[tuple] = []
            for y in range(h):
                for x in range(w):
                    if x == 0 and y == 0:
                        pred = (255, 0, 0, 0)
                    elif y == 0:
                        pred = out[-1]  # left
                    elif x == 0:
                        pred = out[(y - 1) * w]  # top
                    else:
                        mode = tiles[(y >> size_bits) * tw + (x >> size_bits)][2]
                        l = out[y * w + x - 1]  # noqa: E741
                        t = out[(y - 1) * w + x]
                        tl = out[(y - 1) * w + x - 1]
                        # row-major wraparound: TR at x == w-1 is the
                        # FIRST pixel of the current row ((y-1)*w + w =
                        # y*w), already reconstructed — not the left pixel
                        tr = out[(y - 1) * w + x + 1]
                        pred = _predict(mode, l, t, tl, tr)
                    d = px[y * w + x]
                    out.append(tuple((dc + pc) & 255 for dc, pc in zip(d, pred)))
            px = out
        else:  # color transform
            size_bits, tw, tiles = tdata
            out = []
            for y in range(h):
                for x in range(w):
                    cte = tiles[(y >> size_bits) * tw + (x >> size_bits)]
                    g2r, g2b, r2b = cte[3], cte[2], cte[1]
                    a, r, g, b = px[y * w + x]
                    r = (r + _ct_delta(g2r, g)) & 255
                    b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 255
                    out.append((a, r, g, b))
            px = out

    gray = all(a == 255 and r == g == b for a, r, g, b in px)
    if gray:
        return w, h, 1, bytes(p[2] for p in px)
    raw = bytearray()
    for a, r, g, b in px:
        raw += bytes((r, g, b, a))
    return w, h, 4, bytes(raw)


# -- extended container: VP8X / ANIM / ANMF (animated WebP) ----------------------
#
# Layout per the public WebP container spec: VP8X = 1 flag byte + 3
# reserved + 24-bit canvas width-1 + 24-bit canvas height-1; ANIM =
# 32-bit background color + 16-bit loop count; ANMF = 24-bit x/2 +
# 24-bit y/2 + 24-bit width-1 + 24-bit height-1 + 24-bit duration(ms) +
# 1 flag byte (blend/dispose), then the frame's image subchunks. All
# multi-byte fields little-endian; chunks word-aligned.


def _u24(v: int) -> bytes:
    return struct.pack("<I", v)[:3]


def _rd24(b: bytes, off: int) -> int:
    return b[off] | (b[off + 1] << 8) | (b[off + 2] << 16)


def _riff_chunk(tag: bytes, payload: bytes) -> bytes:
    out = tag + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        out += b"\x00"
    return out


def decode_webp_frames(
    data: bytes,
) -> tuple[int, int, int, list[tuple[int, int, int, int, int, int, bytes]]]:
    """Animated (or still) WebP -> (canvas_w, canvas_h, loop_count,
    frames) with one tuple (x, y, duration_ms, width, height, n_channels,
    pixels) per frame. Lossless (VP8L) frames only — a lossy (VP8) frame
    raises the documented guard. A still file returns a single frame at
    (0, 0) with duration 0."""
    if not is_webp(data):
        raise ValueError("not a RIFF/WEBP container")
    canvas_w = canvas_h = None
    loop_count = 0
    animated = False
    frames: list[tuple] = []
    for tag, body in _walk_chunks(data, 12, len(data)):
        if tag == b"VP8X":
            if len(body) < 10:
                raise ValueError("short VP8X chunk")
            animated = bool(body[0] & _VP8X_ANIM)
            canvas_w = _rd24(body, 4) + 1
            canvas_h = _rd24(body, 7) + 1
        elif tag == b"ANIM":
            if len(body) < 6:
                raise ValueError("short ANIM chunk")
            (loop_count,) = struct.unpack_from("<H", body, 4)
        elif tag == b"ANMF":
            if len(body) < 16:
                raise ValueError("short ANMF chunk")
            fx = _rd24(body, 0) * 2
            fy = _rd24(body, 3) * 2
            fw = _rd24(body, 6) + 1
            fh = _rd24(body, 9) + 1
            dur = _rd24(body, 12)
            sub = None
            for stag, sbody in _walk_chunks(body, 16, len(body)):
                if stag == b"VP8L":
                    sub = sbody
                    break
                if stag == b"VP8 ":
                    raise NotImplementedError(
                        "lossy VP8 animation frame (lossless VP8L frames "
                        "are the implemented scope)"
                    )
            if sub is None:
                raise ValueError("ANMF frame without image data")
            riff = b"WEBP" + _riff_chunk(b"VP8L", sub)
            w, h, ch, px = decode_webp(b"RIFF" + struct.pack("<I", len(riff)) + riff)
            if (w, h) != (fw, fh):
                raise ValueError(
                    f"ANMF header says {fw}x{fh} but frame decodes {w}x{h}"
                )
            frames.append((fx, fy, dur, w, h, ch, px))
    if not animated:
        w, h, ch, px = decode_webp(data)
        return w, h, 0, [(0, 0, 0, w, h, ch, px)]
    if not frames:
        raise ValueError("animated WebP without ANMF frames")
    return canvas_w, canvas_h, loop_count, frames


def encode_webp_anim(
    frames: list[bytes],
    width: int,
    height: int,
    channels: int = 1,
    durations: list[int] | None = None,
    loop_count: int = 0,
    variant: str = "flat",
) -> bytes:
    """Encode raw same-sized frames as a GENUINE animated lossless WebP
    (VP8X + ANIM + one ANMF-wrapped VP8L per frame). ``durations`` in ms
    (default 40 each)."""
    if not frames:
        raise ValueError("need at least one frame")
    durations = durations or [40] * len(frames)
    if len(durations) != len(frames):
        raise ValueError("durations must match frames")
    vp8x = bytes([_VP8X_ANIM]) + b"\x00\x00\x00" + _u24(width - 1) + _u24(height - 1)
    body = _riff_chunk(b"VP8X", vp8x)
    body += _riff_chunk(b"ANIM", struct.pack("<IH", 0xFFFFFFFF, loop_count))
    for pix, dur in zip(frames, durations):
        still = encode_webp(pix, width, height, channels=channels, variant=variant)
        # lift the VP8L chunk out of the still's RIFF wrapper
        vp8l = None
        for tag, chunk_body in _walk_chunks(still, 12, len(still)):
            if tag == b"VP8L":
                vp8l = chunk_body
                break
        assert vp8l is not None
        anmf = (
            _u24(0)  # x/2
            + _u24(0)  # y/2
            + _u24(width - 1)
            + _u24(height - 1)
            + _u24(dur)
            + b"\x00"  # dispose-to-background off, no blending flags set
            + _riff_chunk(b"VP8L", vp8l)
        )
        body += _riff_chunk(b"ANMF", anmf)
    riff = b"WEBP" + body
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# -- encoder (fixture-grade, genuine streams) -------------------------------------

_VARIANTS = (
    "flat",
    "lz77",
    "cache",
    "subtract-green",
    "predictor",
    "color-transform",
    "palette",
    "neighbor",
    "meta",
)


def _to_argb(pixels: bytes, width: int, height: int, channels: int) -> list[tuple]:
    n = width * height
    if channels == 1:
        if len(pixels) < n:
            raise ValueError("pixel buffer too small")
        return [(255, pixels[i], pixels[i], pixels[i]) for i in range(n)]
    if channels == 3:
        return [
            (255, pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2])
            for i in range(n)
        ]
    if channels == 4:
        return [
            (
                pixels[4 * i + 3],
                pixels[4 * i],
                pixels[4 * i + 1],
                pixels[4 * i + 2],
            )
            for i in range(n)
        ]
    raise ValueError(f"channels must be 1/3/4, got {channels}")


def _cache_slot(p: tuple, cache_bits: int) -> int:
    argb = (p[0] << 24) | (p[1] << 16) | (p[2] << 8) | p[3]
    return (0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)


def _tokenize(
    px: list[tuple], cache_bits: int, lz77: bool, vertical_xsize: int = 0
) -> list[tuple]:
    """Pixels -> ops, mirroring the decoder's cache semantics exactly
    (copied pixels are inserted too). ops: ("lit", p) / ("copy", length,
    dist) / ("cache", idx). With ``vertical_xsize`` set, runs matching
    the row directly above are preferred (distance = xsize — the (0, 1)
    neighbor code on the wire)."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [(0, 0, 0, 0)] * cache_size
    ops: list[tuple] = []
    i = 0
    n = len(px)

    def insert(p: tuple) -> None:
        if cache_size:
            cache[_cache_slot(p, cache_bits)] = p

    def take_run(dist: int) -> None:
        nonlocal i
        run = 1
        while i + run < n and px[i + run] == px[i + run - dist] and run < 4096:
            run += 1
        ops.append(("copy", run, dist))
        for k in range(run):
            insert(px[i + k])
        i += run

    while i < n:
        if vertical_xsize and i >= vertical_xsize and px[i] == px[i - vertical_xsize]:
            take_run(vertical_xsize)
            continue
        if lz77 and i > 0 and px[i] == px[i - 1]:
            take_run(1)
            continue
        p = px[i]
        if cache_size and cache[_cache_slot(p, cache_bits)] == p:
            ops.append(("cache", _cache_slot(p, cache_bits)))
        else:
            ops.append(("lit", p))
        insert(p)
        i += 1
    return ops


def _write_entropy_image(
    bw: _BitWriter,
    px: list[tuple],
    cache_bits: int = 0,
    lz77: bool = False,
    toplevel: bool = False,
    xsize: int = 0,
    vertical: bool = False,
) -> None:
    """Emit one entropy-coded image. ``toplevel`` marks the spatially-
    coded MAIN image — the only level that carries the meta-prefix bit
    (transform tiles and palettes must not, per spec). With ``xsize``
    set, copy distances are mapped through the 120-entry neighbor table
    like libwebp's encoder; otherwise absolute codes are emitted."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if toplevel:
        bw.write(0, 1)  # single code group (the meta variant writes its own)
    cache_size = (1 << cache_bits) if cache_bits else 0
    ops = _tokenize(px, cache_bits, lz77, vertical_xsize=xsize if vertical else 0)

    def dmap(dist: int) -> int:
        return _distance_to_code(dist, xsize) if xsize else dist + 120

    greens, reds, blues, alphas, dists = set(), set(), set(), set(), set()
    for op in ops:
        if op[0] == "lit":
            a, r, g, b = op[1]
            greens.add(g)
            reds.add(r)
            blues.add(b)
            alphas.add(a)
        elif op[0] == "copy":
            greens.add(256 + _lz77_code_for(op[1])[0])
            dists.add(_lz77_code_for(dmap(op[2]))[0])
        else:
            greens.add(256 + _LENGTH_CODES + op[1])
    green_alpha = _GREEN_LITERALS + _LENGTH_CODES + cache_size
    # rev=True: codes arrive pre-bit-reversed so the data loop emits each
    # with one plain write (no per-token reversal loop)
    gc = _write_prefix_code(bw, sorted(greens), green_alpha, rev=True)
    rc = _write_prefix_code(bw, sorted(reds) or [0], 256, rev=True)
    bc = _write_prefix_code(bw, sorted(blues) or [0], 256, rev=True)
    ac = _write_prefix_code(bw, sorted(alphas) or [255], 256, rev=True)
    dc = _write_prefix_code(bw, sorted(dists) or [0], _DISTANCE_CODES, rev=True)

    write = bw.write
    for op in ops:
        if op[0] == "lit":
            a, r, g, b = op[1]
            write(*gc[g])
            write(*rc[r])
            write(*bc[b])
            write(*ac[a])
        elif op[0] == "copy":
            code, extra, ev = _lz77_code_for(op[1])
            write(*gc[256 + code])
            write(ev, extra)
            code, extra, ev = _lz77_code_for(dmap(op[2]))
            write(*dc[code])
            write(ev, extra)
        else:
            write(*gc[256 + _LENGTH_CODES + op[1]])


def _write_meta_entropy_image(
    bw: _BitWriter, px: list[tuple], w: int, h: int, size_bits: int
) -> None:
    """Emit the main image with a META PREFIX IMAGE: tiles of
    2^size_bits px alternate between two code groups (checkerboard), the
    group index rides in the meta sub-image as (red << 8) | green, and
    each group gets its own five prefix codes. All pixels are literals
    (no cache / LZ77) so group selection per pixel is exact."""
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta prefix image present
    bw.write(size_bits - 2, 3)
    tw = (w + (1 << size_bits) - 1) >> size_bits
    th = (h + (1 << size_bits) - 1) >> size_bits

    def group_of(x: int, y: int) -> int:
        return ((y >> size_bits) * tw + (x >> size_bits)) & 1

    meta_px = [(255, 0, ((ty * tw + tx) & 1), 0) for ty in range(th) for tx in range(tw)]
    _write_entropy_image(bw, meta_px)

    # the decoder reads max(group index) + 1 code groups — a single-tile
    # image has only group 0, so only one code group may be written
    n_groups = max(p[2] for p in meta_px) + 1
    group_codes = []
    for g in range(n_groups):
        pix = [
            px[y * w + x]
            for y in range(h)
            for x in range(w)
            if group_of(x, y) == g
        ] or [(255, 0, 0, 0)]
        greens = sorted({p[2] for p in pix})
        reds = sorted({p[1] for p in pix})
        blues = sorted({p[3] for p in pix})
        alphas = sorted({p[0] for p in pix})
        gc = _write_prefix_code(bw, greens, _GREEN_LITERALS + _LENGTH_CODES, rev=True)
        rc = _write_prefix_code(bw, reds, 256, rev=True)
        bc = _write_prefix_code(bw, blues, 256, rev=True)
        ac = _write_prefix_code(bw, alphas, 256, rev=True)
        dc_ = _write_prefix_code(bw, [0], _DISTANCE_CODES, rev=True)  # unused
        group_codes.append((gc, rc, bc, ac, dc_))

    for y in range(h):
        for x in range(w):
            gc, rc, bc, ac, _dc = group_codes[group_of(x, y)]
            a, r, g, b = px[y * w + x]
            bw.write(*gc[g])
            bw.write(*rc[r])
            bw.write(*bc[b])
            bw.write(*ac[a])


def encode_webp(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    variant: str = "flat",
) -> bytes:
    """Encode raw samples as a GENUINE VP8L lossless WebP. ``variant``
    picks the bitstream features exercised (see ``_VARIANTS``); output
    always decodes back to the input samples via :func:`decode_webp`."""
    if variant not in _VARIANTS:
        raise ValueError(f"variant must be one of {_VARIANTS}, got {variant!r}")
    px = _to_argb(pixels, width, height, channels)
    bw = _BitWriter()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version

    if variant == "subtract-green":
        bw.write(1, 1)
        bw.write(2, 2)
        px = [(a, (r - g) & 255, g, (b - g) & 255) for (a, r, g, b) in px]
    elif variant in ("predictor", "color-transform"):
        size_bits = max(2, max(width - 1, height - 1).bit_length())
        if (1 << size_bits) < max(width, height):
            raise ValueError("image too large for the single-tile fixture encoder")
        bw.write(1, 1)
        if variant == "predictor":
            mode = 7  # Average2(L, T) — exercises the neighbor plumbing
            bw.write(0, 2)
            bw.write(size_bits - 2, 3)
            _write_entropy_image(bw, [(255, 0, mode, 0)])
            out = []
            for y in range(height):
                for x in range(width):
                    if x == 0 and y == 0:
                        pred = (255, 0, 0, 0)
                    elif y == 0:
                        pred = px[y * width + x - 1]
                    elif x == 0:
                        pred = px[(y - 1) * width]
                    else:
                        l = px[y * width + x - 1]  # noqa: E741
                        t = px[(y - 1) * width + x]
                        tl = px[(y - 1) * width + x - 1]
                        # row-major wraparound: at x == w-1 the index
                        # lands on y*w, the first pixel of this row —
                        # the spec's TR, mirrored by the decoder
                        tr = px[(y - 1) * width + x + 1]
                        pred = _predict(mode, l, t, tl, tr)
                    p = px[y * width + x]
                    out.append(tuple((pc - qc) & 255 for pc, qc in zip(p, pred)))
            px = out
        else:
            g2r, g2b, r2b = 0x23, 0xE9, 0x11  # mixed-sign int8 deltas
            bw.write(1, 2)
            bw.write(size_bits - 2, 3)
            _write_entropy_image(bw, [(255, r2b, g2b, g2r)])
            out = []
            for a, r, g, b in px:
                re = (r - _ct_delta(g2r, g)) & 255
                be = (b - _ct_delta(g2b, g) - _ct_delta(r2b, (re + _ct_delta(g2r, g)) & 255)) & 255
                out.append((a, re, g, be))
            px = out
    elif variant == "palette":
        pal: list[tuple] = []
        index: dict[tuple, int] = {}
        for p in px:
            if p not in index:
                index[p] = len(pal)
                pal.append(p)
        if len(pal) > 256:
            raise ValueError("palette variant needs <= 256 distinct pixels")
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(len(pal) - 1, 8)
        deltas = [pal[0]] + [
            tuple((pal[i][c] - pal[i - 1][c]) & 255 for c in range(4))
            for i in range(1, len(pal))
        ]
        _write_entropy_image(bw, deltas)
        if len(pal) <= 2:
            width_bits = 3
        elif len(pal) <= 4:
            width_bits = 2
        elif len(pal) <= 16:
            width_bits = 1
        else:
            width_bits = 0
        packed_w = (width + (1 << width_bits) - 1) >> width_bits
        bits = 8 >> width_bits
        packed: list[tuple] = []
        for y in range(height):
            for bx in range(packed_w):
                g = 0
                for k in range(1 << width_bits):
                    x = (bx << width_bits) + k
                    if x < width:
                        g |= index[px[y * width + x]] << (k * bits)
                packed.append((255, 0, g, 0))
        px = packed

    bw.write(0, 1)  # no more transforms
    img_w = width if variant != "palette" else (len(px) // height)
    if variant == "meta":
        _write_meta_entropy_image(bw, px, img_w, height, size_bits=2)
    else:
        _write_entropy_image(
            bw,
            px,
            cache_bits=4 if variant == "cache" else 0,
            lz77=(variant in ("lz77", "neighbor")),
            toplevel=True,
            xsize=img_w,
            vertical=(variant == "neighbor"),
        )

    payload = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# ---------------------------------------------------------------------------
# lossy VP8 (RFC 6386): key-frame HEADER parse only. The uncompressed
# 10-byte frame header (frame tag + start code + dimensions) is fully
# specified and needs none of the boolean-coded state, so width/height/
# scaling are recoverable from every real-world lossy WebP without the
# (still-guarded) pixel decoder — the metadata a crawl-ingest pipeline
# wants before deciding whether to decode at all.
# ---------------------------------------------------------------------------

_VP8_START_CODE = b"\x9d\x01\x2a"


def parse_vp8_frame_header(body: bytes) -> dict:
    """Parse the uncompressed header of a VP8 frame ("VP8 " chunk body,
    RFC 6386 §9.1): 3-byte little-endian frame tag (frame_type bit 0,
    version bits 1-3, show_frame bit 4, first-partition size bits 5-23),
    then for key frames the 3-byte start code 9D 01 2A and two 16-bit
    little-endian fields carrying 14-bit width/height plus 2-bit upscale
    codes. Interframes (frame_type 1) only occur mid-video and carry no
    dimensions; they raise."""
    if len(body) < 10:
        raise ValueError("VP8 frame shorter than its 10-byte key-frame header")
    tag = body[0] | (body[1] << 8) | (body[2] << 16)
    if tag & 1:
        raise ValueError("VP8 interframe: no dimensions outside a video stream")
    if body[3:6] != _VP8_START_CODE:
        raise ValueError("bad VP8 key-frame start code")
    w16 = body[6] | (body[7] << 8)
    h16 = body[8] | (body[9] << 8)
    return {
        "version": (tag >> 1) & 0x7,
        "show_frame": (tag >> 4) & 0x1,
        "first_partition_size": tag >> 5,
        "width": w16 & 0x3FFF,
        "width_scale": w16 >> 14,
        "height": h16 & 0x3FFF,
        "height_scale": h16 >> 14,
    }


def webp_meta(data: bytes) -> dict:
    """Container-level metadata for ANY WebP flavor without pixel
    decoding: codec ('vp8l' lossless / 'vp8' lossy / none), width/height
    (VP8L 14-bit header fields, VP8 key-frame header, or the VP8X canvas
    when no image chunk precedes it), and animation flag. This is the
    piece of the lossy-VP8 surface that IS implementable from the
    published headers alone (see the module scope note)."""
    if not is_webp(data):
        raise ValueError("not a RIFF/WEBP container")
    meta = {"codec": None, "width": None, "height": None, "animated": False}
    for tag, body in _walk_chunks(data, 12, len(data)):
        if tag == b"VP8X" and len(body) >= 10:
            meta["animated"] = bool(body[0] & _VP8X_ANIM)
            meta["width"] = _rd24(body, 4) + 1
            meta["height"] = _rd24(body, 7) + 1
        elif tag == b"VP8L" and len(body) >= 5 and body[0] == 0x2F:
            bits = body[1] | (body[2] << 8) | (body[3] << 16) | (body[4] << 24)
            meta["codec"] = "vp8l"
            meta["width"] = (bits & 0x3FFF) + 1
            meta["height"] = ((bits >> 14) & 0x3FFF) + 1
            break
        elif tag == b"VP8 ":
            h = parse_vp8_frame_header(body)
            meta["codec"] = "vp8"
            meta["width"] = h["width"]
            meta["height"] = h["height"]
            meta.update(
                {
                    "width_scale": h["width_scale"],
                    "height_scale": h["height_scale"],
                    "show_frame": h["show_frame"],
                    "version": h["version"],
                    "first_partition_size": h["first_partition_size"],
                }
            )
            break
    return meta


def encode_webp_lossy_header(
    width: int,
    height: int,
    *,
    version: int = 0,
    show_frame: int = 1,
    width_scale: int = 0,
    height_scale: int = 0,
    partition_filler: bytes = b"",
) -> bytes:
    """Fixture-grade container: a genuine RIFF/WEBP "VP8 " chunk whose
    10-byte key-frame header is spec-exact (frame tag, start code,
    scaled dimensions) followed by ``partition_filler`` standing in for
    the boolean-coded partitions (which the guarded pixel decoder never
    reads). first_partition_size is stamped as len(partition_filler) so
    the tag arithmetic round-trips."""
    if not (0 < width <= 0x3FFF and 0 < height <= 0x3FFF):
        raise ValueError("VP8 dimensions are 14-bit")
    if not (0 <= width_scale <= 3 and 0 <= height_scale <= 3):
        raise ValueError("upscale codes are 2-bit")
    if len(partition_filler) >= 1 << 19:
        raise ValueError("first_partition_size is a 19-bit field")
    tag = (len(partition_filler) << 5) | ((show_frame & 1) << 4) | ((version & 7) << 1)
    body = (
        struct.pack("<I", tag)[:3]
        + _VP8_START_CODE
        + struct.pack("<H", width | (width_scale << 14))
        + struct.pack("<H", height | (height_scale << 14))
        + partition_filler
    )
    riff = b"WEBP" + _riff_chunk(b"VP8 ", body)
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
