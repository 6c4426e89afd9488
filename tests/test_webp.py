"""From-scratch WebP-lossless (VP8L) codec (functions/webp.py, born r12;
meta prefix images + short-distance neighbor codes + the animated
VP8X/ANIM/ANMF container added r13): every encoder variant must
round-trip bit-exactly through the decoder across gray/RGB/RGBA inputs
and degenerate shapes, palette bundling must cover all three packed
widths, hand-built streams with hand-computed expected pixels pin the
bit layout (round-trips alone cannot catch shared encoder/decoder
bugs), and the remaining documented limit (lossy VP8) must raise
loudly. The Spark-side plumbing is covered by the
`multimodal_decode_webp` / `multimodal_webp_anim_frames` catalog
entries' full value oracles (tests/test_oracle.py)."""

from __future__ import annotations

import random
import struct

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_cdc_hudi_spark.functions.webp import (
    _VARIANTS,
    decode_webp,
    encode_webp,
    is_webp,
)


@pytest.mark.parametrize("variant", _VARIANTS)
@settings(max_examples=25, deadline=4000, suppress_health_check=[HealthCheck.too_slow])
@given(data=st.data())
def test_gray_roundtrip_all_variants(variant, data):
    w = data.draw(st.integers(1, 20))
    h = data.draw(st.integers(1, 14))
    if variant == "palette":
        vals = data.draw(
            st.lists(st.integers(0, 255), min_size=1, max_size=20, unique=True)
        )
        pix = bytes(data.draw(st.sampled_from(vals)) for _ in range(w * h))
    elif variant == "lz77":
        # runs guaranteed: few distinct values
        pix = bytes(data.draw(st.sampled_from([3, 3, 3, 250])) for _ in range(w * h))
    else:
        pix = bytes(data.draw(st.integers(0, 255)) for _ in range(w * h))
    blob = encode_webp(pix, w, h, channels=1, variant=variant)
    assert is_webp(blob)
    ww, hh, ch, out = decode_webp(blob)
    assert (ww, hh, ch) == (w, h, 1)
    assert out == pix


@pytest.mark.parametrize("variant", ["flat", "cache", "subtract-green", "predictor", "color-transform"])
def test_rgba_roundtrip(variant):
    rng = random.Random(hash(variant) & 0xFFFF)
    w, h = 11, 9
    pix = bytes(rng.randrange(256) for _ in range(w * h * 4))
    ww, hh, ch, out = decode_webp(encode_webp(pix, w, h, channels=4, variant=variant))
    assert (ww, hh, ch) == (w, h, 4)
    assert out == pix


def test_rgb_input_gains_opaque_alpha():
    rng = random.Random(5)
    w, h = 6, 5
    pix = bytes(rng.randrange(256) for _ in range(w * h * 3))
    ww, hh, ch, out = decode_webp(encode_webp(pix, w, h, channels=3, variant="flat"))
    assert (ww, hh, ch) == (w, h, 4)
    want = b"".join(pix[3 * i : 3 * i + 3] + b"\xff" for i in range(w * h))
    assert out == want


@pytest.mark.parametrize("npal", [2, 3, 4, 9, 16, 17, 200])
def test_palette_bundling_widths(npal):
    """<=2 / <=4 / <=16 palettes bundle 8/4/2 indices per green byte; the
    unbundled path covers the rest."""
    rng = random.Random(npal)
    w, h = 13, 7
    vals = rng.sample(range(256), npal)
    pix = bytes(rng.choice(vals) for _ in range(w * h))
    ww, hh, ch, out = decode_webp(
        encode_webp(pix, w, h, channels=1, variant="palette")
    )
    assert (ww, hh, ch) == (w, h, 1)
    assert out == pix


@pytest.mark.parametrize("shape", [(1, 1), (1, 12), (17, 1), (2, 2)])
@pytest.mark.parametrize("variant", ["flat", "predictor", "cache", "lz77"])
def test_degenerate_shapes(shape, variant):
    w, h = shape
    rng = random.Random(w * 100 + h)
    pix = bytes(rng.randrange(256) for _ in range(w * h))
    assert decode_webp(encode_webp(pix, w, h, channels=1, variant=variant))[3] == pix


def test_gray_detection_boundary():
    """One non-gray pixel flips the output to 4-channel RGBA."""
    pix = bytes([7] * 16)
    assert decode_webp(encode_webp(pix, 4, 4, channels=1))[2] == 1
    rgba = bytearray(b"".join(bytes([b, b, b, 255]) for b in pix))
    rgba[1] ^= 1  # green differs from red/blue in pixel 0
    ww, hh, ch, out = decode_webp(encode_webp(bytes(rgba), 4, 4, channels=4))
    assert ch == 4
    assert out == bytes(rgba)


def test_lossy_vp8_raises_not_implemented():
    payload = b"\x00" * 10
    chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    riff = b"WEBP" + chunk
    blob = b"RIFF" + struct.pack("<I", len(riff)) + riff
    with pytest.raises(NotImplementedError, match="lossless"):
        decode_webp(blob)


def test_non_webp_rejected():
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00AVI LIST")
    with pytest.raises(ValueError):
        decode_webp(b"")


def test_decode_any_image_dispatches_webp():
    from kafka_cdc_hudi_spark.operators.multimodal import decode_any_image

    pix = bytes(range(48))
    w, h, ch, out = decode_any_image(encode_webp(pix, 8, 6, channels=1, variant="cache"))
    assert (w, h, ch) == (8, 6, 1)
    assert out == pix


def test_real_resize_roundtrip_webp(spark):
    """resize_images real path on webp input: decode(resize(x)) equals the
    numpy nearest-neighbor resample of decode(x), re-encoded as webp."""
    import numpy as np
    import pandas as pd  # noqa: F401

    from kafka_cdc_hudi_spark.operators.multimodal import resize_images

    rng = random.Random(12)
    w0, h0, tw, th = 10, 8, 5, 4
    pix = bytes(rng.randrange(256) for _ in range(w0 * h0))
    blob = encode_webp(pix, w0, h0, channels=1, variant="cache")
    df = spark.createDataFrame(
        [(1, bytearray(blob), "webp", len(blob))],
        "media_id long, content binary, format string, byte_len long",
    )
    out = resize_images(df, tw, th).collect()[0]
    ww, hh, ch, got = decode_webp(bytes(out["content"]))
    assert (ww, hh, ch) == (tw, th, 1)
    img = np.frombuffer(pix, dtype=np.uint8).reshape(h0, w0)
    ys = (np.arange(th) * h0) // th
    xs = (np.arange(tw) * w0) // tw
    assert got == img[ys][:, xs].tobytes()


class _HandWriter:
    """Independent LSB-first bit writer (deliberately NOT the module's
    _BitWriter) so these tests pin the absolute bit layout."""

    def __init__(self):
        self.bits = []

    def put(self, value, n):
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def blob(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        payload = b"\x2f" + bytes(out)
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            chunk += b"\x00"
        riff = b"WEBP" + chunk
        return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _hand_header(w, h):
    hw = _HandWriter()
    hw.put(w - 1, 14)
    hw.put(h - 1, 14)
    hw.put(0, 1)  # alpha hint
    hw.put(0, 3)  # version
    return hw


def _put_simple_1sym(hw, sym):
    hw.put(1, 1)  # simple form
    hw.put(0, 1)  # one symbol
    if sym <= 1:
        hw.put(0, 1)
        hw.put(sym, 1)
    else:
        hw.put(1, 1)
        hw.put(sym, 8)


def test_handbuilt_minimal_stream_decodes():
    """Bit-for-bit hand construction of a 1x1 gray pixel (value 9): 14+14
    dim bits, transform/cache/meta flags, five simple single-symbol
    prefix codes — the pixel itself costs ZERO stream bits. Pins header
    layout, LSB-first packing, and the simple-code form against drift."""
    hw = _hand_header(1, 1)
    hw.put(0, 1)  # no transforms
    hw.put(0, 1)  # no color cache
    hw.put(0, 1)  # no meta prefix image
    for sym in (9, 9, 9, 255, 0):  # green, red, blue, alpha, distance
        _put_simple_1sym(hw, sym)
    w, h, ch, out = decode_webp(hw.blob())
    assert (w, h, ch, out) == (1, 1, 1, b"\x09")


def test_handbuilt_meta_prefix_two_groups():
    """Bit-for-bit hand construction of an 8x1 image using a META PREFIX
    IMAGE: size_bits=2 gives two 4px tiles, the meta sub-image names
    groups 0 and 1 via (red<<8)|green, and each group carries its own
    five prefix codes (single-symbol greens 5 and 9). Pins: the meta bit
    position (after cache-info, level 0 only), the 3-bit size field, the
    sub-image having NO meta bit of its own, group-count = max index + 1,
    and per-pixel group selection by tile."""
    hw = _hand_header(8, 1)
    hw.put(0, 1)  # no transforms
    hw.put(0, 1)  # no color cache
    hw.put(1, 1)  # meta prefix image PRESENT
    hw.put(0, 3)  # size_bits = 2 -> tiles of 4px, tw=2, th=1
    # meta sub-image (2x1): cache bit only — NO meta bit at level > 0
    hw.put(0, 1)  # no cache
    # green: simple TWO-symbol code {0, 1}
    hw.put(1, 1)  # simple form
    hw.put(1, 1)  # two symbols
    hw.put(0, 1)  # first fits 1 bit
    hw.put(0, 1)  # first = 0
    hw.put(1, 8)  # second = 1
    for sym in (0, 0, 255, 0):  # red, blue, alpha, distance
        _put_simple_1sym(hw, sym)
    hw.put(0, 1)  # meta pixel 0: green code 0 -> group 0
    hw.put(1, 1)  # meta pixel 1: green code 1 -> group 1
    # group 0 codes: gray 5; group 1 codes: gray 9
    for g in (5, 9):
        for sym in (g, g, g, 255, 0):
            _put_simple_1sym(hw, sym)
    # 8 literal pixels cost ZERO data bits (all single-symbol codes)
    w, h, ch, out = decode_webp(hw.blob())
    assert (w, h, ch) == (8, 1, 1)
    assert out == bytes([5] * 4 + [9] * 4)


def _splice_module_bits(hw, bw):
    """Append a module _BitWriter's bits into the hand stream."""
    total_bits = bw.bitpos + (len(bw.out) - 1) * 8 if bw.bitpos else len(bw.out) * 8
    for i in range(total_bits):
        hw.put((bw.out[i >> 3] >> (i & 7)) & 1, 1)


def _put_code(hw, code, length):
    for i in range(length - 1, -1, -1):
        hw.put((code >> i) & 1, 1)


def test_handbuilt_short_distance_vertical_copy():
    """A backward reference whose distance prefix VALUE is 1 maps through
    the 120-entry neighbor table to offset (0, 1) — the pixel directly
    above, distance = row width. Hand stream: 4x2, row 0 = green
    literals 1..4, then one copy (length 4, neighbor value 1) producing
    row 1 identical to row 0. Pins the neighbor mapping at the bit
    level against an expectation computed by hand."""
    from kafka_cdc_hudi_spark.functions.webp import _BitWriter, _write_prefix_code

    hw = _hand_header(4, 2)
    hw.put(0, 1)  # no transforms
    hw.put(0, 1)  # no cache
    hw.put(0, 1)  # no meta
    bw = _BitWriter()
    # greens: literals 1..4 plus length-code 3 (LZ77 length value 4)
    gcodes = _write_prefix_code(bw, [1, 2, 3, 4, 259], 280)
    _splice_module_bits(hw, bw)
    for sym in (0, 0, 255, 0):  # red, blue, alpha, distance(code 0)
        _put_simple_1sym(hw, sym)
    for g in (1, 2, 3, 4):  # row 0 literals (r/b/a cost 0 bits)
        _put_code(hw, *gcodes[g])
    # copy: green symbol 259 = length code 3 -> value 4, no extra bits;
    # distance tree emits code 0 -> LZ77 value 1 -> neighbor (0,1)
    _put_code(hw, *gcodes[259])
    w, h, ch, out = decode_webp(hw.blob())
    assert (w, h, ch) == (4, 2, 4)  # r=0 != g -> RGBA output
    want = b"".join(bytes((0, g, 0, 255)) for g in (1, 2, 3, 4)) * 2
    assert out == want


def test_handbuilt_predictor_tile_no_meta_bit_and_tr_wraparound():
    """A predictor-transform stream built by hand: the tile sub-image has
    NO meta-prefix bit (level > 0), and predictor mode 3 (TOP-RIGHT) at
    the right edge uses the row-major wraparound pixel — the FIRST pixel
    of the current row — not the left neighbor. 3x2 image, mode 3
    everywhere; expected grays computed by hand: 10,11,12,12,15,17 (the
    final pixel is 12+5 via TR=out[3]; a left-substitution bug would
    give 15+5=20)."""
    from kafka_cdc_hudi_spark.functions.webp import _BitWriter, _write_prefix_code

    hw = _hand_header(3, 2)
    hw.put(1, 1)  # a transform follows
    hw.put(0, 2)  # type 0: predictor
    hw.put(0, 3)  # size_bits = 2 -> one 4px tile covers 3x2
    # tile sub-image (1x1, mode 3): cache bit, then straight to codes —
    # no meta bit here
    hw.put(0, 1)  # no cache
    for sym in (3, 0, 0, 255, 0):  # green=mode, red, blue, alpha, dist
        _put_simple_1sym(hw, sym)
    hw.put(0, 1)  # no more transforms
    hw.put(0, 1)  # no cache (main image)
    hw.put(0, 1)  # no meta
    bw = _BitWriter()
    gcodes = _write_prefix_code(bw, [1, 2, 3, 5, 10], 280)
    _splice_module_bits(hw, bw)
    bw = _BitWriter()
    rcodes = _write_prefix_code(bw, [1, 2, 3, 5, 10], 256)
    _splice_module_bits(hw, bw)
    bw = _BitWriter()
    bcodes = _write_prefix_code(bw, [1, 2, 3, 5, 10], 256)
    _splice_module_bits(hw, bw)
    for sym in (0, 0):  # alpha residual, distance
        _put_simple_1sym(hw, sym)
    for d in (10, 1, 1, 2, 3, 5):  # gray residuals in scan order
        _put_code(hw, *gcodes[d])
        _put_code(hw, *rcodes[d])
        _put_code(hw, *bcodes[d])
    w, h, ch, out = decode_webp(hw.blob())
    assert (w, h, ch) == (3, 2, 1)
    assert out == bytes([10, 11, 12, 12, 15, 17])


def test_predict_mode13_truncates_toward_zero():
    """ClampAddSubtractHalf divides like C (toward zero): ave=5, TL=8
    gives half = trunc(-3/2) = -1 -> 4; floor division would yield 3."""
    from kafka_cdc_hudi_spark.functions.webp import _predict

    l = (255, 4, 4, 4)
    t = (255, 6, 6, 6)
    tl = (255, 8, 8, 8)
    assert _predict(13, l, t, tl, (0, 0, 0, 0)) == (255, 4, 4, 4)


def test_neighbor_table_spec_pins():
    """The generated 120-entry table must match the spec's explicit
    listing at both ends, and the encoder mapping must invert the
    decoder mapping for every (distance, width) pair."""
    import random as _random

    from kafka_cdc_hudi_spark.functions.webp import (
        _NEIGHBORS,
        _code_to_distance,
        _distance_to_code,
    )

    assert len(_NEIGHBORS) == 120
    # the FULL 120-entry (dx, dy) listing from the spec (RFC 9649
    # §"Decoding of Distances"), pinned verbatim — the derived comparator
    # must reproduce every middle entry, not just the two ends a
    # round-trip test can't distinguish (ADVICE r13)
    spec_listing = [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
        (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
        (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
        (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
        (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
        (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
        (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
        (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
        (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
        (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
        (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
        (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
        (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
    ]
    assert _NEIGHBORS == spec_listing
    rng = _random.Random(99)
    for _ in range(3000):
        xs = rng.randrange(1, 64)
        d = rng.randrange(1, 600)
        assert _code_to_distance(_distance_to_code(d, xs), xs) == d


def test_vp8_lossy_header_parse():
    """Hand-built 10-byte key-frame header (independent byte
    construction) pins the RFC 6386 frame-tag arithmetic: 3-byte LE tag
    (type bit 0, version 1-3, show 4, partition size 5-23), start code
    9D 01 2A, 14-bit dims + 2-bit upscale codes."""
    from kafka_cdc_hudi_spark.functions.webp import parse_vp8_frame_header

    # tag: part_size=1000, show=1, version=3, key frame
    tag = (1000 << 5) | (1 << 4) | (3 << 1)
    hdr = (
        bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
        + b"\x9d\x01\x2a"
        + (1920 | (2 << 14)).to_bytes(2, "little")
        + (1080 | (1 << 14)).to_bytes(2, "little")
    )
    h = parse_vp8_frame_header(hdr + b"\x00" * 4)
    assert h == {
        "version": 3, "show_frame": 1, "first_partition_size": 1000,
        "width": 1920, "width_scale": 2, "height": 1080, "height_scale": 1,
    }
    with pytest.raises(ValueError, match="start code"):
        parse_vp8_frame_header(hdr[:3] + b"\x9d\x01\x2b" + hdr[6:])
    with pytest.raises(ValueError, match="interframe"):
        parse_vp8_frame_header(bytes([(tag & 0xFF) | 1]) + hdr[1:])
    with pytest.raises(ValueError, match="shorter"):
        parse_vp8_frame_header(hdr[:9])


def test_webp_meta_all_flavors():
    """webp_meta recovers codec + dims from all three container flavors
    without pixel decoding — including lossy VP8, whose pixel decoder
    stays guarded."""
    from kafka_cdc_hudi_spark.functions.webp import (
        decode_webp,
        encode_webp,
        encode_webp_anim,
        encode_webp_lossy_header,
        webp_meta,
    )

    lossless = encode_webp(bytes(range(40)), 8, 5, channels=1, variant="flat")
    m = webp_meta(lossless)
    assert (m["codec"], m["width"], m["height"], m["animated"]) == ("vp8l", 8, 5, False)

    anim = encode_webp_anim([bytes(range(32))] * 2, 8, 4)
    m = webp_meta(anim)
    assert m["animated"] is True and (m["width"], m["height"]) == (8, 4)

    # 19-bit partition-size cap: silent tag truncation -> loud ValueError
    with pytest.raises(ValueError, match="19-bit"):
        encode_webp_lossy_header(8, 8, partition_filler=b"x" * (1 << 19))

    lossy = encode_webp_lossy_header(
        321, 123, version=1, width_scale=3, partition_filler=b"f" * 9
    )
    m = webp_meta(lossy)
    assert (m["codec"], m["width"], m["height"]) == ("vp8", 321, 123)
    assert m["width_scale"] == 3 and m["first_partition_size"] == 9
    # the pixel decoder still guards loudly on the same container
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp(lossy)


def test_neighbor_variant_emits_vertical_copies():
    """The neighbor encoder variant prefers distance = row-width copies;
    a vertically-striped image round-trips and actually exercises the
    (0, 1) neighbor code path (asserted via the tokenizer)."""
    from kafka_cdc_hudi_spark.functions.webp import _to_argb, _tokenize

    w, h = 9, 6
    pix = bytes((x * 29) & 255 for _y in range(h) for x in range(w))
    px = _to_argb(pix, w, h, 1)
    ops = _tokenize(px, 0, True, vertical_xsize=w)
    assert any(op[0] == "copy" and op[2] == w for op in ops)
    ww, hh, ch, out = decode_webp(encode_webp(pix, w, h, channels=1, variant="neighbor"))
    assert (ww, hh, ch, out) == (w, h, 1, pix)


class TestAnimatedWebp:
    """Extended-container support (VP8X / ANIM / ANMF, r13): animated
    lossless WebP round-trips frame-exactly, VP8X stills decode through
    the plain path, the container byte layout is pinned by hand, and the
    lossy-frame guard stays loud."""

    def test_anim_roundtrip_frames_durations_loop(self):
        from kafka_cdc_hudi_spark.functions.webp import (
            decode_webp_frames,
            encode_webp_anim,
        )

        rng = random.Random(3)
        w, h = 7, 5
        frames = [bytes(rng.randrange(256) for _ in range(w * h)) for _ in range(4)]
        blob = encode_webp_anim(
            frames, w, h, durations=[40, 50, 60, 70], loop_count=3, variant="cache"
        )
        cw, ch, loop, out = decode_webp_frames(blob)
        assert (cw, ch, loop, len(out)) == (w, h, 3, 4)
        for i, (fx, fy, dur, fw, fh, nch, px) in enumerate(out):
            assert (fx, fy, dur, fw, fh, nch) == (0, 0, 40 + 10 * i, w, h, 1)
            assert px == frames[i]

    def test_still_through_frames_api(self):
        from kafka_cdc_hudi_spark.functions.webp import decode_webp_frames

        pix = bytes(range(24))
        cw, ch, loop, out = decode_webp_frames(encode_webp(pix, 6, 4))
        assert (cw, ch, loop) == (6, 4, 0)
        assert out == [(0, 0, 0, 6, 4, 1, pix)]

    def test_decode_webp_rejects_animation(self):
        from kafka_cdc_hudi_spark.functions.webp import encode_webp_anim

        blob = encode_webp_anim([bytes(12)], 4, 3)
        with pytest.raises(ValueError, match="decode_webp_frames"):
            decode_webp(blob)

    def test_vp8x_still_with_metadata_decodes(self):
        """A VP8X still (metadata chunks, anim flag OFF) must decode its
        top-level VP8L chunk through the plain path."""
        pix = bytes((i * 7) & 255 for i in range(20))
        still = encode_webp(pix, 5, 4)
        off, inner = 12, None
        while off + 8 <= len(still):
            tag = still[off : off + 4]
            (sz,) = struct.unpack("<I", still[off + 4 : off + 8])
            if tag == b"VP8L":
                inner = still[off + 8 : off + 8 + sz]
                break
            off += 8 + sz + (sz & 1)

        def chunk(tag, payload):
            out = tag + struct.pack("<I", len(payload)) + payload
            return out + (b"\x00" if len(payload) & 1 else b"")

        vp8x = bytes([0x00, 0, 0, 0]) + struct.pack("<I", 4)[:3] + struct.pack("<I", 3)[:3]
        riff = b"WEBP" + chunk(b"VP8X", vp8x) + chunk(b"XMP ", b"<x/>") + chunk(b"VP8L", inner)
        blob = b"RIFF" + struct.pack("<I", len(riff)) + riff
        assert decode_webp(blob) == (5, 4, 1, pix)

    def test_handbuilt_container_layout(self):
        """Byte-level pin of the container spec fields: VP8X flag byte +
        24-bit canvas dims, ANIM background+loop, ANMF 16-byte header
        (24-bit x/2, y/2, w-1, h-1, duration + flag byte)."""
        from kafka_cdc_hudi_spark.functions.webp import encode_webp_anim

        blob = encode_webp_anim(
            [bytes(6)], 3, 2, durations=[250], loop_count=7
        )
        # walk: RIFF(12) -> VP8X
        assert blob[12:16] == b"VP8X"
        vp8x = blob[20:30]
        assert vp8x[0] == 0x02  # animation flag only
        assert vp8x[4:7] == bytes([2, 0, 0])  # canvas w-1 = 2, LE24
        assert vp8x[7:10] == bytes([1, 0, 0])  # canvas h-1 = 1
        off = 20 + 10  # VP8X payload is even: no pad
        assert blob[off : off + 4] == b"ANIM"
        anim = blob[off + 8 : off + 14]
        assert struct.unpack("<H", anim[4:6])[0] == 7  # loop count
        off += 8 + 6
        assert blob[off : off + 4] == b"ANMF"
        anmf = blob[off + 8 :]
        assert anmf[0:3] == bytes(3) and anmf[3:6] == bytes(3)  # x/2, y/2
        assert anmf[6:9] == bytes([2, 0, 0])  # w-1
        assert anmf[9:12] == bytes([1, 0, 0])  # h-1
        assert anmf[12:15] == bytes([250, 0, 0])  # duration ms LE24
        assert anmf[16:20] == b"VP8L"

    def test_lossy_frame_guard(self):
        from kafka_cdc_hudi_spark.functions.webp import decode_webp_frames

        def chunk(tag, payload):
            out = tag + struct.pack("<I", len(payload)) + payload
            return out + (b"\x00" if len(payload) & 1 else b"")

        vp8x = bytes([0x02, 0, 0, 0]) + bytes([3, 0, 0]) + bytes([2, 0, 0])
        anmf = bytes(3) * 2 + bytes([3, 0, 0]) + bytes([2, 0, 0]) + bytes([40, 0, 0]) + b"\x00"
        anmf += chunk(b"VP8 ", b"\x00" * 12)
        riff = b"WEBP" + chunk(b"VP8X", vp8x) + chunk(b"ANIM", struct.pack("<IH", 0, 0)) + chunk(b"ANMF", anmf)
        blob = b"RIFF" + struct.pack("<I", len(riff)) + riff
        with pytest.raises(NotImplementedError, match="lossy"):
            decode_webp_frames(blob)

    def test_decode_anim_frames_operator(self, spark):
        from kafka_cdc_hudi_spark.functions.webp import encode_webp_anim
        from kafka_cdc_hudi_spark.operators.multimodal import decode_webp_anim_frames

        w, h = 4, 3
        frames = [bytes([i] * (w * h)) for i in (9, 77)]
        blob = encode_webp_anim(frames, w, h, durations=[40, 50])
        df = spark.createDataFrame(
            [(1, bytearray(blob), "webp", len(blob))],
            "media_id long, content binary, format string, byte_len long",
        )
        rows = sorted(decode_webp_anim_frames(df).collect(), key=lambda r: r["frame_idx"])
        assert [r["duration_ms"] for r in rows] == [40, 50]
        assert [r["n_frames"] for r in rows] == [2, 2]
        import hashlib

        assert [r["frame_hash"] for r in rows] == [
            hashlib.md5(f).hexdigest() for f in frames
        ]


@settings(max_examples=10, deadline=10000, suppress_health_check=[HealthCheck.too_slow])
@given(data=st.data())
def test_lut_and_walk_decoders_agree(data):
    """The adaptive LUT path (>=1k pixels) and the bit-walk path must
    decode identical pixels for the same stream — pin the equivalence on
    images straddling the threshold."""
    import kafka_cdc_hudi_spark.functions.webp as W

    w = data.draw(st.integers(30, 40))
    h = data.draw(st.integers(30, 40))  # 900..1600 px straddles 1024
    variant = data.draw(st.sampled_from(["flat", "cache", "lz77", "neighbor"]))
    pix = bytes(data.draw(st.integers(0, 255)) for _ in range(w * h))
    blob = encode_webp(pix, w, h, channels=1, variant=variant)
    lut_out = decode_webp(blob)
    orig = W._PrefixCode.ensure_lut
    W._PrefixCode.ensure_lut = lambda self: None
    try:
        walk_out = decode_webp(blob)
    finally:
        W._PrefixCode.ensure_lut = orig
    assert lut_out == walk_out == (w, h, 1, pix)


def test_simple_form_two_equal_symbols_decodes():
    """Spec-legal degenerate streams may write the SAME symbol as both
    entries of the two-symbol simple form; both 1-bit codes must decode
    to it (a symbol-keyed table would collapse and reject the stream)."""
    from kafka_cdc_hudi_spark.functions.webp import _BitReader, _BitWriter, _read_prefix_code

    bw = _BitWriter()
    bw.write(1, 1)  # simple form
    bw.write(1, 1)  # two symbols
    bw.write(1, 1)  # first is 8-bit
    bw.write(42, 8)
    bw.write(42, 8)  # second == first
    bw.write(0, 1)
    bw.write(1, 1)
    br = _BitReader(bw.bytes())
    pc = _read_prefix_code(br, 256)
    assert pc.read(br) == 42 and pc.read(br) == 42
    pc.ensure_lut()  # the LUT build must also key by code, not symbol


def test_bitwriter_multibit_matches_per_bit_reference():
    """r15: the multi-bit accumulator _BitWriter must emit the exact bit
    stream (and expose the same mid-stream out/bitpos state) as the
    original per-bit writer, for arbitrary (value, n) sequences."""
    import random

    from kafka_cdc_hudi_spark.functions.webp import _BitWriter

    class _PerBit:  # the pre-r15 reference implementation
        def __init__(self):
            self.out = bytearray()
            self.bitpos = 0

        def write(self, value, n):
            for i in range(n):
                if self.bitpos == 0:
                    self.out.append(0)
                if (value >> i) & 1:
                    self.out[-1] |= 1 << self.bitpos
                self.bitpos = (self.bitpos + 1) & 7

    rng = random.Random(1515)
    for _trial in range(50):
        bw, ref = _BitWriter(), _PerBit()
        for _ in range(rng.randint(1, 120)):
            n = rng.randint(0, 24)
            v = rng.getrandbits(n) if n else 0
            bw.write(v, n)
            ref.write(v, n)
            assert bytes(bw.out) == bytes(ref.out)
            assert bw.bitpos == ref.bitpos
        assert bw.bytes() == bytes(ref.out)


def test_write_prefix_code_rev_is_bit_reversal():
    """r15: rev=True must return exactly the bit-reversed codes of the
    documented rev=False contract, emitting identical header bits."""
    from kafka_cdc_hudi_spark.functions.webp import (
        _BitWriter,
        _rev_bits,
        _write_prefix_code,
    )

    for used in ([1, 2, 3, 4, 259], [0, 7], [5], list(range(40))):
        b1, b2 = _BitWriter(), _BitWriter()
        plain = _write_prefix_code(b1, used, 280)
        rev = _write_prefix_code(b2, used, 280, rev=True)
        assert b1.bytes() == b2.bytes() and b1.bitpos == b2.bitpos
        assert set(plain) == set(rev)
        for sym, (code, ln) in plain.items():
            assert rev[sym] == (_rev_bits(code, ln), ln)


def test_canonical_fast_walk_matches_dict_walk():
    """r15: the first-code/count/offset canonical walk must decode the
    same symbols as the (ln, acc)-keyed dict walk for random canonical
    codes driven over random bitstreams."""
    import random

    from kafka_cdc_hudi_spark.functions.webp import (
        _BitReader,
        _BitWriter,
        _PrefixCode,
    )

    rng = random.Random(42)
    for _trial in range(30):
        n_syms = rng.randint(2, 60)
        syms = rng.sample(range(280), n_syms)
        # random Kraft-complete length map via repeated splitting
        lengths = {s: 1 for s in syms[:2]}
        pool = syms[2:]
        while pool:
            victim = rng.choice(list(lengths))
            if lengths[victim] >= 14:
                continue
            nxt = pool.pop()
            lengths[nxt] = lengths[victim] = lengths[victim] + 1
        pc = _PrefixCode(dict(sorted(lengths.items())))
        assert pc.first is not None  # fast walk active
        # emit a random symbol sequence, decode with both walks
        seq = [rng.choice(list(lengths)) for _ in range(100)]
        by_sym = {s: (c, ln) for s, c, ln in pc.codes}
        bw = _BitWriter()
        for s in seq:
            bw.write_code(*by_sym[s])
        br1 = _BitReader(bw.bytes())
        got_fast = [pc.read(br1) for _ in seq]
        pc_slow = _PrefixCode(dict(sorted(lengths.items())))
        pc_slow.first = None  # force the dict-walk fallback
        br2 = _BitReader(bw.bytes())
        got_slow = [pc_slow.read(br2) for _ in seq]
        assert got_fast == got_slow == seq
