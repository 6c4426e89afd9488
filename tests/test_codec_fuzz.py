"""Decoder robustness: arbitrary bytes and truncations of valid files must
raise a CLEAN error (ValueError / NotImplementedError / EOF-class), never
hang, loop, or corrupt state — a decode kernel that dies messily on one
bad blob takes a whole executor task with it.

Hypothesis drives random buffers; each decoder also fuzzes truncations and
single-byte corruptions of a file its own encoder produced (much deeper
paths than pure noise reaches).
"""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_cdc_hudi_spark.functions.avi import decode_avi_mjpeg, encode_avi_mjpeg
from kafka_cdc_hudi_spark.functions.bmp import decode_bmp, encode_bmp
from kafka_cdc_hudi_spark.functions.gif import decode_gif, encode_gif
from kafka_cdc_hudi_spark.functions.jpeg import (
    decode_jpeg_gray,
    encode_jpeg_color,
    encode_jpeg_gray,
)
from kafka_cdc_hudi_spark.functions.png import decode_png, encode_png
from kafka_cdc_hudi_spark.functions.tiff import decode_tiff_gray, encode_tiff_gray
from kafka_cdc_hudi_spark.functions.wav import decode_wav, encode_wav, encode_wav_adpcm
from kafka_cdc_hudi_spark.functions.warc import decode_warc, encode_warc, http_body
from kafka_cdc_hudi_spark.functions.webp import decode_webp_frames, encode_webp_anim
from kafka_cdc_hudi_spark.functions.webp import decode_webp, encode_webp
from kafka_cdc_hudi_spark.functions.webp import encode_webp_lossy_header, webp_meta

#: the clean-failure contract: decoders may raise these and nothing else
_CLEAN = (ValueError, NotImplementedError, struct.error, IndexError, EOFError, zlib.error)

_PIXELS = bytes(range(64))


def _valid_samples():
    return {
        "png": encode_png(_PIXELS, 8, 8, channels=1),
        "bmp": encode_bmp(_PIXELS, 8, 8, channels=1),
        "gif": encode_gif(_PIXELS, 8, 8),
        "jpeg": encode_jpeg_gray(_PIXELS, 8, 8),
        "jpeg_color": encode_jpeg_color(bytes(range(192)), 8, 8),
        "avi": encode_avi_mjpeg([encode_jpeg_gray(_PIXELS, 8, 8)] * 2, 8, 8),
        "wav": encode_wav(list(range(-100, 100)), sample_rate=8000, channels=1),
        "tiff": encode_tiff_gray(_PIXELS, 8, 8),
        "webp": encode_webp(_PIXELS, 8, 8, channels=1, variant="flat"),
        "wav_adpcm": encode_wav_adpcm(list(range(-100, 100)), sample_rate=8000),
        "webp_lz77": encode_webp(bytes([7] * 64), 8, 8, channels=1, variant="lz77"),
        "webp_palette": encode_webp(bytes(i % 3 for i in range(64)), 8, 8, channels=1, variant="palette"),
        "webp_meta": encode_webp(_PIXELS, 8, 8, channels=1, variant="meta"),
        "webp_neighbor": encode_webp(bytes([7] * 64), 8, 8, channels=1, variant="neighbor"),
        "webp_anim": encode_webp_anim([_PIXELS[:32]] * 2, 8, 4),
        "warc": encode_warc([({"WARC-Type": "resource", "WARC-Record-ID": "<u:1>", "WARC-Date": "2024-01-01T00:00:00Z"}, bytes(_PIXELS))]),
        "warc_http": b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n8\r\n01234567\r\n0\r\n\r\n",
        "webp_lossy_meta": encode_webp_lossy_header(64, 48, partition_filler=b"p" * 16),
    }


_DECODERS = {
    "png": decode_png,
    "bmp": decode_bmp,
    "gif": decode_gif,
    "jpeg": decode_jpeg_gray,
    "jpeg_color": decode_jpeg_gray,  # one dispatching decoder, two profiles
    "avi": decode_avi_mjpeg,
    "wav": decode_wav,
    "tiff": decode_tiff_gray,
    "webp": decode_webp,
    "wav_adpcm": decode_wav,
    "webp_lz77": decode_webp,
    "webp_palette": decode_webp,
    "webp_meta": decode_webp,
    "webp_neighbor": decode_webp,
    "webp_anim": lambda b: decode_webp_frames(b),
    "warc": decode_warc,
    "warc_http": http_body,
    "webp_lossy_meta": webp_meta,
}


@pytest.mark.parametrize("fmt", sorted(_DECODERS))
@settings(max_examples=150, deadline=2000, suppress_health_check=[HealthCheck.too_slow])
@given(data=st.binary(max_size=300))
def test_random_bytes_fail_cleanly(fmt, data):
    try:
        _DECODERS[fmt](data)
    except _CLEAN:
        pass  # clean rejection is the contract


@pytest.mark.parametrize("fmt", sorted(_DECODERS))
def test_truncations_fail_cleanly(fmt):
    blob = _valid_samples()[fmt]
    for cut in range(0, len(blob), max(1, len(blob) // 60)):
        try:
            _DECODERS[fmt](blob[:cut])
        except _CLEAN:
            pass


@pytest.mark.parametrize("fmt", sorted(_DECODERS))
def test_single_byte_corruptions_fail_cleanly_or_decode(fmt):
    """Flipping one byte anywhere must either still decode (payload bytes)
    or raise cleanly (structure bytes) — never crash with an unexpected
    exception class."""
    blob = bytearray(_valid_samples()[fmt])
    step = max(1, len(blob) // 80)
    for pos in range(0, len(blob), step):
        mutated = bytearray(blob)
        mutated[pos] ^= 0xFF
        try:
            _DECODERS[fmt](bytes(mutated))
        except _CLEAN:
            pass


def test_jpeg_truncated_scan_raises_valueerror():
    """A scan cut off before EOI must raise the documented corruption
    error (ValueError), not a bare IndexError from the bit reader
    (ADVICE r7). Cut INSIDE the entropy segment: past the SOS header but
    before the final 2-byte EOI marker."""
    blob = _valid_samples()["jpeg"]
    sos = blob.index(b"\xff\xda")
    hdr_len = struct.unpack(">H", blob[sos + 2 : sos + 4])[0]
    scan_start = sos + 2 + hdr_len
    assert blob[-2:] == b"\xff\xd9"
    for cut in range(scan_start + 1, len(blob) - 2):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_jpeg_gray(blob[:cut])


def test_jpeg_non_jfif_component_order_rejected():
    """A baseline color JPEG whose components are ordered 3,2,1 would
    silently swap channels if mapped by position — the decoder must
    refuse (ADVICE r7)."""
    blob = bytearray(_valid_samples()["jpeg_color"])
    # SOF0 payload: precision(1) h(2) w(2) ncomp(1), then (cid, sampling,
    # tq) per component; SOS payload: ns(1), then (cid, tids) per component
    sof = bytes(blob).index(b"\xff\xc0")
    base = sof + 4 + 6
    for i in range(3):
        assert blob[base + 3 * i] == i + 1
        blob[base + 3 * i] = 3 - i
    sos = bytes(blob).index(b"\xff\xda")
    sbase = sos + 5
    for i in range(3):
        assert blob[sbase + 2 * i] == i + 1
        blob[sbase + 2 * i] = 3 - i
    # swap the SOS table ids and SOF quant ids along with the ids so the
    # stream stays self-consistent — ONLY the ordering differs
    with pytest.raises(NotImplementedError, match="component order"):
        decode_jpeg_gray(bytes(blob))
