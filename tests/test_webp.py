"""From-scratch WebP-lossless (VP8L) codec (functions/webp.py, born r12):
every encoder variant must round-trip bit-exactly through the decoder
across gray/RGB/RGBA inputs and degenerate shapes, palette bundling must
cover all three packed widths, and the documented limits (lossy VP8,
meta prefix images, short-distance codes) must raise loudly. The
Spark-side plumbing is covered by the `multimodal_decode_webp` catalog
entry's full value oracle (tests/test_oracle.py)."""

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


def test_handbuilt_meta_prefix_guard():
    """The meta-prefix-image bit must raise the documented guard."""
    hw = _hand_header(2, 2)
    hw.put(0, 1)  # no transforms
    hw.put(0, 1)  # no cache
    hw.put(1, 1)  # meta prefix image present
    with pytest.raises(NotImplementedError, match="meta prefix"):
        decode_webp(hw.blob())


def test_handbuilt_short_distance_code_guard():
    """A backward reference whose distance code maps into the 120-entry
    neighbor table must raise the documented guard. Green is a 2-symbol
    simple code {literal 0, length-code 256}; distance code 0 (-> mapped
    value 1 <= 120) triggers it."""
    hw = _hand_header(4, 1)
    hw.put(0, 1)  # no transforms
    hw.put(0, 1)  # no cache
    hw.put(0, 1)  # no meta
    # green: simple, TWO symbols: 0 (literal) and 256 is not 8-bit-expressible,
    # so use the normal form via the module writer for green only
    from kafka_cdc_hudi_spark.functions.webp import _BitWriter, _write_prefix_code

    bw = _BitWriter()
    gcodes = _write_prefix_code(bw, [0, 256], 280)
    # splice the module-written green-code bits into the hand stream
    total_bits = bw.bitpos + (len(bw.out) - 1) * 8 if bw.bitpos else len(bw.out) * 8
    for i in range(total_bits):
        hw.put((bw.out[i >> 3] >> (i & 7)) & 1, 1)
    for sym in (0, 0, 255, 0):  # red, blue, alpha, distance(code 0)
        _put_simple_1sym(hw, sym)
    # pixel 0: literal green=0 (red/blue/alpha cost 0 bits each)
    c, ln = gcodes[0]
    for i in range(ln - 1, -1, -1):
        hw.put((c >> i) & 1, 1)
    # then a copy: green symbol 256 = length code 0 (length 1, no extras),
    # distance tree emits code 0 -> lz77 value 1 -> neighbor-table range
    c, ln = gcodes[256]
    for i in range(ln - 1, -1, -1):
        hw.put((c >> i) & 1, 1)
    with pytest.raises(NotImplementedError, match="short-distance"):
        decode_webp(hw.blob())
