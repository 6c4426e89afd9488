"""Multimodal plumbing: real mapInPandas machinery, stubbed codec."""

import pytest

from kafka_cdc_hudi_spark.operators.multimodal import (
    IMAGE_FEATURES_SCHEMA,
    RESIZED_SCHEMA,
    decode_images,
    documents_as_media,
    media_repartition,
    resize_images,
    sample_frames,
)
from kafka_cdc_hudi_spark.sources.tables import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    return documents_as_media(load_table(spark, SF_DIR, "documents")).cache()


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "content", "format", "byte_len"]
    row = media.first()
    assert isinstance(row["content"], (bytes, bytearray))
    assert row["byte_len"] == len(row["content"])


def test_fake_decode_deterministic(spark, media):
    df = media_repartition(media, target_rows_per_partition=100)
    a = decode_images(df, fake=True)
    assert a.schema == IMAGE_FEATURES_SCHEMA
    rows = {r["media_id"]: (r["width"], r["height"], r["n_channels"]) for r in a.collect()}
    assert len(rows) == media.count()
    b = {
        r["media_id"]: (r["width"], r["height"], r["n_channels"])
        for r in decode_images(media, fake=True).collect()
    }
    assert rows == b
    # plausible image dims from the stub
    assert all(64 <= w < 2048 and 64 <= h < 2048 and 1 <= c <= 4 for (w, h, c) in rows.values())


def test_real_decode_raises_for_non_png(spark, media):
    # documents_as_media blobs are raw text bytes (no PNG signature): the
    # real-codec path must refuse them, not guess
    with pytest.raises(Exception) as ei:
        decode_images(media.limit(2), fake=False).collect()
    assert "NotImplementedError" in str(ei.value)


def test_resize_deterministic_and_sized(spark, media):
    out = resize_images(media, 32, 32, fake=True)
    assert out.schema == RESIZED_SCHEMA
    rows = {r["media_id"]: r["content"] for r in out.collect()}
    assert len(rows) == media.count()
    src = {r["media_id"]: r["byte_len"] for r in media.collect()}
    for mid, content in rows.items():
        assert len(content) == min(src[mid], 32 * 32)
    again = {r["media_id"]: r["content"] for r in resize_images(media, 32, 32, fake=True).collect()}
    assert rows == again
    # different target dims -> different payloads
    other = {r["media_id"]: r["content"] for r in resize_images(media, 16, 16, fake=True).collect()}
    assert any(rows[m][: len(other[m])] != other[m] for m in rows)


# -- real PNG codec path ------------------------------------------------------


def test_png_codec_roundtrip_all_filters_and_channels():
    """Pure-codec property: encode -> decode is identity for every filter
    type (cycled across scanlines) and every supported channel count."""
    import random

    from kafka_cdc_hudi_spark.functions.png import decode_png, encode_png

    rng = random.Random(42)
    for ch in (1, 2, 3, 4):
        w, h = rng.randint(1, 33), rng.randint(5, 29)  # h >= 5 cycles all filters
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        for cyc in (False, True):
            assert decode_png(encode_png(px, w, h, channels=ch, filter_cycle=cyc)) == (
                w, h, ch, px
            )


def test_png_codec_rejects_corruption_and_unsupported():
    from kafka_cdc_hudi_spark.functions.png import decode_png, encode_png

    data = bytearray(encode_png(bytes(range(16)), 4, 4))
    data[-5] ^= 0x01  # flip a bit inside IEND CRC
    with pytest.raises(ValueError):
        decode_png(bytes(data))
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_png_codec_decodes_real_world_files():
    """Cross-validate against PNGs produced by standard encoders (libpng),
    if the host has any — proves the decoder isn't merely self-consistent."""
    import glob

    from kafka_cdc_hudi_spark.functions.png import decode_png

    found = 0
    for p in glob.glob("/usr/share/doc/python3/_static/*.png"):
        try:
            w, h, ch, px = decode_png(open(p, "rb").read())
        except NotImplementedError:
            continue  # palette/16-bit variants are out of scope
        assert w > 0 and h > 0 and len(px) == w * h * ch
        found += 1
    if not found:
        pytest.skip("no decodable system PNGs on this host")


def test_real_decode_png_end_to_end(spark):
    """documents -> real PNG encode -> REAL stdlib decode: dims and pixel
    hash must equal the fixture formulas (no fake anywhere)."""
    import hashlib

    from kafka_cdc_hudi_spark.operators.multimodal import (
        _png_fixture_dims,
        documents_as_png,
    )

    docs = load_table(spark, SF_DIR, "documents")
    out = {r["media_id"]: r for r in decode_images(documents_as_png(docs)).collect()}
    src = {r["doc_id"]: r["text"] for r in docs.collect() if len(r["text"].encode()) >= 128}
    assert set(out) == set(src) and out
    for mid, row in out.items():
        w, h = _png_fixture_dims(mid)
        assert (row["width"], row["height"], row["n_channels"]) == (w, h, 1)
        assert row["feature_hash"] == hashlib.md5(src[mid].encode()[: w * h]).hexdigest()


def test_real_resize_png_roundtrip(spark):
    """Real resize path: decode(resize(png)) equals the numpy nearest-
    neighbor resample of decode(png) — pinned per-pixel, not just shapes."""
    import numpy as np

    from kafka_cdc_hudi_spark.functions.png import decode_png
    from kafka_cdc_hudi_spark.operators.multimodal import documents_as_png

    docs = load_table(spark, SF_DIR, "documents")
    media = documents_as_png(docs).limit(20).cache()
    src = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    out = {r["media_id"]: r for r in resize_images(media, 8, 6, fake=False).collect()}
    assert set(out) == set(src)
    for mid, row in out.items():
        w2, h2, ch, px = decode_png(bytes(row["content"]))
        assert (w2, h2, ch) == (8, 6, 1)
        w0, h0, _, px0 = decode_png(src[mid])
        img = np.frombuffer(px0, dtype=np.uint8).reshape(h0, w0)
        ys = (np.arange(6) * h0) // 6
        xs = (np.arange(8) * w0) // 8
        assert px == img[ys][:, xs].tobytes()
    media.unpersist()


# -- real WAV codec path ------------------------------------------------------


def test_wav_codec_roundtrip_and_chunk_skip():
    import random
    import struct

    from kafka_cdc_hudi_spark.functions.wav import decode_wav, encode_wav

    rng = random.Random(11)
    for _ in range(20):
        ch = rng.choice([1, 2])
        samples = [rng.randint(-32768, 32767) for _ in range(rng.randint(1, 300) * ch)]
        rate = rng.choice([8000, 22050, 44100])
        assert decode_wav(encode_wav(samples, rate, ch)) == (rate, ch, samples)
    # real-world WAVs carry LIST/INFO chunks (odd sizes are word-padded):
    # the decoder must skip unknown chunks, not choke
    w = encode_wav([1, -2, 3], 8000)
    lst = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = bytearray(w[:12] + lst + w[12:])
    spliced[4:8] = struct.pack("<I", len(spliced) - 8)
    assert decode_wav(bytes(spliced))[2] == [1, -2, 3]
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        decode_wav(w[:-3])  # truncated data chunk


def test_real_decode_wav_end_to_end(spark):
    """documents -> real WAV encode -> REAL stdlib decode: rates, counts,
    and exact integer sample stats must match the fixture formulas."""
    from kafka_cdc_hudi_spark.operators.multimodal import (
        _wav_fixture_rate,
        decode_audio,
        documents_as_wav,
    )

    docs = load_table(spark, SF_DIR, "documents").limit(30)
    out = {r["media_id"]: r for r in decode_audio(documents_as_wav(docs)).collect()}
    src = {r["doc_id"]: r["text"].encode()[:256] for r in docs.collect()}
    assert set(out) == set(src) and out
    for mid, row in out.items():
        amps = [(b - 128) * 256 for b in src[mid]]
        assert row["sample_rate"] == _wav_fixture_rate(mid)
        assert (row["n_channels"], row["n_samples"]) == (1, len(amps))
        assert row["peak_amp"] == max(abs(a) for a in amps)
        assert row["sum_sq"] == sum(a * a for a in amps)


def test_sample_frames_cardinality_and_hashes(spark, media):
    import hashlib

    out = sample_frames(media, frame_bytes=256, fake=True).collect()
    by_media = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append(r)
    src = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    assert set(by_media) == set(src)
    for mid, frames in by_media.items():
        c = src[mid]
        expected_n = max(1, -(-len(c) // 256))
        assert len(frames) == expected_n
        frames.sort(key=lambda r: r["frame_idx"])
        for i, fr in enumerate(frames):
            assert fr["frame_hash"] == hashlib.md5(c[i * 256 : (i + 1) * 256]).hexdigest()


# -- real BMP codec path ------------------------------------------------------


def test_bmp_codec_roundtrip_gray_and_rgb():
    import random

    from kafka_cdc_hudi_spark.functions.bmp import decode_bmp, encode_bmp

    rng = random.Random(7)
    for ch in (1, 3):
        for _ in range(15):
            # widths that hit every 4-byte stride padding remainder
            w = rng.randint(1, 13)
            h = rng.randint(1, 9)
            px = bytes(rng.randrange(256) for _ in range(w * h * ch))
            out = decode_bmp(encode_bmp(px, w, h, channels=ch))
            assert out == (w, h, ch, px), (w, h, ch)


def test_bmp_codec_rejects_corruption():
    import pytest as _pytest

    from kafka_cdc_hudi_spark.functions.bmp import decode_bmp, encode_bmp

    good = encode_bmp(bytes(range(12)), 4, 3, channels=1)
    with _pytest.raises(ValueError):
        decode_bmp(b"XX" + good[2:])  # bad magic
    with _pytest.raises(ValueError):
        decode_bmp(good[:20])  # truncated header
    with _pytest.raises(ValueError):
        decode_bmp(good[:-4])  # truncated pixel data
    import struct as _struct

    hacked = bytearray(good)
    _struct.pack_into("<I", hacked, 30, 1)  # compression = RLE8
    with _pytest.raises(NotImplementedError):
        decode_bmp(bytes(hacked))


def test_real_decode_dispatches_png_and_bmp(spark):
    """One media frame mixing both real containers decodes through the
    matching codec per row — the format dispatch itself is under test."""
    import hashlib

    from kafka_cdc_hudi_spark.operators.multimodal import (
        _bmp_fixture_dims,
        decode_images,
        documents_as_bmp,
        documents_as_png,
    )

    docs = load_table(spark, SF_DIR, "documents")
    mixed = documents_as_png(docs).limit(10).unionByName(
        documents_as_bmp(docs).limit(10)
    )
    out = decode_images(mixed).collect()
    assert len(out) == 20
    src = {r["doc_id"]: r["text"] for r in docs.limit(50).collect()}
    for row in out:
        if row["media_id"] in src and row["width"] == _bmp_fixture_dims(row["media_id"])[0]:
            w, h = _bmp_fixture_dims(row["media_id"])
            want = hashlib.md5(src[row["media_id"]].encode()[: w * h]).hexdigest()
            assert row["feature_hash"] == want


# -- real GIF codec path ------------------------------------------------------


def _lzw_compress_ref(pixels, min_code_size=8):
    """Independent REAL LZW compressor (dictionary growth, width changes,
    4096 reset) — produces streams our simple encoder never emits, so the
    decoder is pinned against general GIF data, not just its own output."""
    from kafka_cdc_hudi_spark.functions.gif import _BitWriter

    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    bw = _BitWriter()
    width = min_code_size + 1
    table = {bytes((i,)): i for i in range(clear)}
    next_code = eoi + 1
    bw.write(clear, width)
    cur = b""
    for b in pixels:
        nxt = cur + bytes((b,))
        if nxt in table:
            cur = nxt
            continue
        bw.write(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            bw.write(clear, width)
            table = {bytes((i,)): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        cur = bytes((b,))
    bw.write(table[cur], width)
    bw.write(eoi, width)
    return bw.finish()


def test_gif_codec_roundtrip():
    import random

    from kafka_cdc_hudi_spark.functions.gif import decode_gif, encode_gif

    rng = random.Random(13)
    for _ in range(20):
        w, h = rng.randint(1, 30), rng.randint(1, 20)
        px = bytes(rng.randrange(256) for _ in range(w * h))
        assert decode_gif(encode_gif(px, w, h)) == (w, h, 1, px), (w, h)


def test_gif_decoder_handles_real_lzw_streams():
    """Repetitive AND random payloads through a genuine compressing LZW
    encoder: exercises dictionary growth through every width (9..12),
    the early-change transition, cScSc self-reference, and 4096 resets."""
    import random
    import struct

    from kafka_cdc_hudi_spark.functions.gif import decode_gif

    def wrap(lzw, w, h):
        head = b"GIF89a" + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
        gct = b"".join(bytes((i, i, i)) for i in range(256))
        desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        blocks = bytearray([8])
        for i in range(0, len(lzw), 255):
            c = lzw[i : i + 255]
            blocks.append(len(c))
            blocks.extend(c)
        blocks.append(0)
        return head + gct + desc + bytes(blocks) + b"\x3b"

    rng = random.Random(5)
    repetitive = ((b"abcabcabcab" + bytes(range(40))) * 2000)[: 300 * 80]
    random_px = bytes(rng.randrange(256) for _ in range(300 * 80))
    for px in (repetitive, random_px):
        g = wrap(_lzw_compress_ref(px), 300, 80)
        assert decode_gif(g) == (300, 80, 1, px)


def test_gif_codec_rejects_corruption():
    import pytest as _pytest

    from kafka_cdc_hudi_spark.functions.gif import decode_gif, encode_gif

    good = encode_gif(bytes(range(12)), 4, 3)
    with _pytest.raises(ValueError):
        decode_gif(b"JIF8" + good[4:])  # bad magic
    with _pytest.raises(ValueError):
        decode_gif(good[:10])  # truncated header
    with _pytest.raises(ValueError):
        decode_gif(good[:-20])  # truncated image data
    # image descriptor sits after the 13-byte header + 768-byte GCT;
    # (can't search for 0x2c — the grayscale palette contains that byte)
    desc = 13 + 768
    assert good[desc] == 0x2C
    hacked = bytearray(good)
    hacked[desc + 9] |= 0x40  # interlace flag
    with _pytest.raises(NotImplementedError):
        decode_gif(bytes(hacked))


class TestJpegCodec:
    """Baseline JPEG (functions/jpeg.py): the DCT transform codec."""

    def test_flat_roundtrip_matches_formula_all_values(self):
        from kafka_cdc_hudi_spark.functions.jpeg import (
            decode_jpeg_gray,
            encode_jpeg_gray,
            flat_decode_value,
        )

        for v in range(0, 256, 7):
            data = encode_jpeg_gray(bytes([v]) * 128, 16, 8)
            w, h, c, px = decode_jpeg_gray(data)
            assert (w, h, c) == (16, 8, 1)
            assert set(px) == {flat_decode_value(v)}, v

    def test_gradient_roundtrip_bounded_error(self):
        """Non-flat content drives real AC coefficients through the
        run-length/ZRL/EOB paths; quantization error under the standard
        table must stay small."""
        import random

        from kafka_cdc_hudi_spark.functions.jpeg import decode_jpeg_gray, encode_jpeg_gray

        rng = random.Random(11)
        w, h = 40, 24
        pix = bytes(
            min(255, max(0, 6 * (x // 2) + 4 * (y // 2) + rng.randrange(4)))
            for y in range(h)
            for x in range(w)
        )
        data = encode_jpeg_gray(pix, w, h)
        w2, h2, c2, out = decode_jpeg_gray(data)
        assert (w2, h2, c2) == (w, h, 1)
        err = max(abs(a - b) for a, b in zip(pix, out))
        assert err <= 16, f"quantization error {err} too large"
        # deterministic in both directions
        assert encode_jpeg_gray(pix, w, h) == data
        assert decode_jpeg_gray(data)[3] == out

    def test_odd_dims_pad_and_crop(self):
        from kafka_cdc_hudi_spark.functions.jpeg import decode_jpeg_gray, encode_jpeg_gray

        pix = bytes((3 * i) % 256 for i in range(13 * 5))
        w, h, c, out = decode_jpeg_gray(encode_jpeg_gray(pix, 13, 5))
        assert (w, h, c, len(out)) == (13, 5, 1, 65)

    def test_corruption_raises(self):
        import pytest

        from kafka_cdc_hudi_spark.functions.jpeg import decode_jpeg_gray, encode_jpeg_gray

        with pytest.raises(ValueError):
            decode_jpeg_gray(b"not a jpeg")
        data = encode_jpeg_gray(bytes(64), 8, 8)
        with pytest.raises((ValueError, NotImplementedError, IndexError, Exception)):
            decode_jpeg_gray(data[:20])


class TestJpegColorCodec:
    """4:4:4 YCbCr color JPEG (3-component interleaved MCUs)."""

    def test_flat_decode_value_q_pins_codec_float_path(self):
        """The closed-form integer formula the SQL oracle uses must match
        the decoder's actual float arithmetic for every DC-only value on
        BOTH quant tables (incl. the q=17 half boundaries the DC-exactness
        special case exists for)."""
        from kafka_cdc_hudi_spark.functions.jpeg import (
            _round_half_away,
            flat_decode_value,
            flat_decode_value_q,
        )

        for q00 in (16, 17):
            for v in range(256):
                a = v - 128
                # encoder float path: DC = 0.125 * 64a = 8a exact
                quantized = _round_half_away((8 * a) / q00)
                # decoder float path with the exact-0.5 DC basis term
                val = _round_half_away(0.25 * (0.5 * (q00 * quantized)) + 128.0)
                assert flat_decode_value_q(v, q00) == min(255, max(0, val)), (q00, v)
        for v in range(256):
            assert flat_decode_value_q(v, 16) == flat_decode_value(v), v

    def test_flat_color_roundtrip_matches_formula(self):
        """End-to-end: encode a flat RGB image, decode, and every pixel
        must equal the composition rgb_to_ycbcr -> per-channel flat
        decode -> ycbcr_to_rgb (the SQL oracle's derivation)."""
        from kafka_cdc_hudi_spark.functions.jpeg import (
            decode_jpeg,
            encode_jpeg_color,
            flat_decode_value_q,
            rgb_to_ycbcr,
            ycbcr_to_rgb,
        )

        colors = [
            (0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 255, 0), (0, 0, 255),
            (0, 0, 220),  # chroma cb≈238: the q=17 half-boundary regression
            (200, 100, 50), (123, 45, 67), (31, 224, 17), (250, 1, 128),
        ]
        for r, g, b in colors:
            w, h, c, px = decode_jpeg(encode_jpeg_color(bytes([r, g, b]) * 128, 16, 8))
            assert (w, h, c) == (16, 8, 3)
            triples = set(zip(px[0::3], px[1::3], px[2::3]))
            assert len(triples) == 1, (r, g, b, triples)
            y, cb, cr = rgb_to_ycbcr(r, g, b)
            pred = ycbcr_to_rgb(
                flat_decode_value_q(y, 16),
                flat_decode_value_q(cb, 17),
                flat_decode_value_q(cr, 17),
            )
            assert triples.pop() == pred, (r, g, b)

    def test_gradient_color_roundtrip_bounded_error(self):
        """Non-flat color drives real AC coefficients through all three
        interleaved components; chroma quantization is coarser than luma
        so the bound is looser but must stay visually small."""
        import random

        from kafka_cdc_hudi_spark.functions.jpeg import decode_jpeg, encode_jpeg_color

        rng = random.Random(13)
        w, h = 24, 16
        pix = bytes(
            min(255, max(0, 5 * (x // 2) + 4 * (y // 2) + 40 * ch + rng.randrange(3)))
            for y in range(h)
            for x in range(w)
            for ch in range(3)
        )
        data = encode_jpeg_color(pix, w, h)
        w2, h2, c2, out = decode_jpeg(data)
        assert (w2, h2, c2) == (w, h, 3)
        err = max(abs(a - b) for a, b in zip(pix, out))
        assert err <= 40, f"quantization error {err} too large"
        # deterministic in both directions
        assert encode_jpeg_color(pix, w, h) == data
        assert decode_jpeg(data)[3] == out

    def test_odd_dims_pad_and_crop_color(self):
        from kafka_cdc_hudi_spark.functions.jpeg import decode_jpeg, encode_jpeg_color

        pix = bytes((3 * i) % 256 for i in range(13 * 5 * 3))
        w, h, c, out = decode_jpeg(encode_jpeg_color(pix, 13, 5))
        assert (w, h, c, len(out)) == (13, 5, 3, 13 * 5 * 3)

    def test_subsampled_raises_not_implemented(self):
        """A legal 4:2:0 SOF0 must be rejected as unsupported, not
        misdecoded."""
        import pytest

        from kafka_cdc_hudi_spark.functions.jpeg import decode_jpeg, encode_jpeg_color

        data = bytearray(encode_jpeg_color(bytes([10, 20, 30]) * 64, 8, 8))
        sof = data.find(b"\xff\xc0")
        assert sof > 0
        data[sof + 11] = 0x22  # Y component sampling 2x2 -> 4:2:0
        with pytest.raises(NotImplementedError):
            decode_jpeg(bytes(data))

    def test_channel_stats_operator(self, spark):
        """decode_image_channel_stats: color JPEG -> per-channel min/max;
        grayscale input fills c1/c2 with nulls."""
        from kafka_cdc_hudi_spark.functions.jpeg import (
            encode_jpeg_color,
            encode_jpeg_gray,
            flat_decode_value,
        )
        from kafka_cdc_hudi_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            decode_image_channel_stats,
        )

        rows = [
            (1, encode_jpeg_color(bytes([200, 100, 50]) * 128, 16, 8), "jpeg"),
            (2, encode_jpeg_gray(bytes([77]) * 128, 16, 8), "jpeg"),
        ]
        df = spark.createDataFrame(
            [(i, bytearray(b), f, len(b)) for i, b, f in rows], MEDIA_SCHEMA
        )
        out = {r["media_id"]: r for r in decode_image_channel_stats(df).collect()}
        color = out[1]
        assert color["n_channels"] == 3
        assert color["c0_min"] == color["c0_max"]
        assert color["c1_min"] == color["c1_max"]
        assert color["c2_min"] == color["c2_max"]
        gray = out[2]
        assert gray["n_channels"] == 1
        assert gray["c0_min"] == gray["c0_max"] == flat_decode_value(77)
        assert gray["c1_min"] is None and gray["c2_max"] is None


class TestAudioSegments:
    """Windowed audio segmentation (energy / ZCR / silence)."""

    def test_features_on_crafted_clip(self, spark):
        from kafka_cdc_hudi_spark.functions.wav import encode_wav
        from kafka_cdc_hudi_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            audio_segment_features,
        )

        # 100 samples: first 64 alternate +/-2000 (63 crossings, loud),
        # last 36 are a quiet constant 10 (0 crossings, silence)
        samples = [2000 if i % 2 == 0 else -2000 for i in range(64)] + [10] * 36
        blob = encode_wav(samples, 8000, channels=1)
        df = spark.createDataFrame([(1, bytearray(blob), "wav", len(blob))], MEDIA_SCHEMA)
        rows = {r["seg_idx"]: r for r in audio_segment_features(df).collect()}
        assert set(rows) == {0, 1}
        s0, s1 = rows[0], rows[1]
        assert (s0["n_samples"], s0["zero_crossings"]) == (64, 63)
        assert s0["peak_amp"] == 2000 and not s0["is_silence"]
        assert s0["sum_sq"] == 64 * 2000 * 2000
        assert (s1["n_samples"], s1["zero_crossings"]) == (36, 0)
        assert s1["sum_sq"] == 36 * 100 and s1["is_silence"]

    def test_catalog_silence_flag_nonvacuous(self, spark):
        """The catalog-calibrated threshold must actually flag windows on
        the fixture corpus (the operator default never fires there — loud
        floor, see _AUD_SILENCE_MSQ)."""
        from kafka_cdc_hudi_spark.plans.catalog_text import multimodal_audio_segments

        from .conftest import SF_DIR

        segs = multimodal_audio_segments(spark, SF_DIR)
        assert segs.filter("is_silence").limit(1).count() == 1
        assert segs.filter("NOT is_silence").limit(1).count() == 1

    def test_non_wav_raises(self, spark):
        import pytest
        from pyspark.errors import PythonException

        from kafka_cdc_hudi_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            audio_segment_features,
        )

        df = spark.createDataFrame([(1, bytearray(b"mp3 junk"), "mp3", 8)], MEDIA_SCHEMA)
        with pytest.raises(PythonException, match="PCM WAV only"):
            audio_segment_features(df).collect()


class TestVideoSceneCuts:
    """Frame-difference scene-cut detection over MJPEG-AVI."""

    def test_cut_flags_on_crafted_video(self, spark):
        from kafka_cdc_hudi_spark.functions.avi import encode_avi_mjpeg
        from kafka_cdc_hudi_spark.functions.jpeg import (
            encode_jpeg_gray,
            flat_decode_value,
        )
        from kafka_cdc_hudi_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            video_scene_cuts,
        )

        # frame values: 100, 102 (small step, no cut), 160 (scene change)
        vals = [100, 102, 160]
        frames = [encode_jpeg_gray(bytes([v]) * 128, 16, 8) for v in vals]
        blob = encode_avi_mjpeg(frames, 16, 8, fps=10)
        df = spark.createDataFrame([(7, bytearray(blob), "avi", len(blob))], MEDIA_SCHEMA)
        rows = {r["frame_idx"]: r for r in video_scene_cuts(df).collect()}
        assert set(rows) == {0, 1, 2}
        assert rows[0]["sum_abs_diff"] is None and rows[0]["is_cut"] is None
        dec = [flat_decode_value(v) for v in vals]
        assert rows[1]["sum_abs_diff"] == 128 * abs(dec[1] - dec[0])
        assert rows[1]["is_cut"] is False
        assert rows[2]["sum_abs_diff"] == 128 * abs(dec[2] - dec[1])
        assert rows[2]["is_cut"] is True


class TestAviContainer:
    """MJPEG-in-AVI container (functions/avi.py)."""

    def test_roundtrip_preserves_frames(self):
        from kafka_cdc_hudi_spark.functions.avi import decode_avi_mjpeg, encode_avi_mjpeg
        from kafka_cdc_hudi_spark.functions.jpeg import encode_jpeg_gray

        frames = [encode_jpeg_gray(bytes([90 + 20 * i]) * 128, 16, 8) for i in range(5)]
        avi = encode_avi_mjpeg(frames, 16, 8, fps=24)
        w, h, fps, out = decode_avi_mjpeg(avi)
        assert (w, h, fps) == (16, 8, 24)
        assert out == frames
        assert encode_avi_mjpeg(frames, 16, 8, fps=24) == avi

    def test_frames_decode_through_jpeg(self):
        from kafka_cdc_hudi_spark.functions.avi import decode_avi_mjpeg, encode_avi_mjpeg
        from kafka_cdc_hudi_spark.functions.jpeg import (
            decode_jpeg_gray,
            encode_jpeg_gray,
            flat_decode_value,
        )

        frames = [encode_jpeg_gray(bytes([100 + 7 * i]) * 128, 16, 8) for i in range(3)]
        _, _, _, out = decode_avi_mjpeg(encode_avi_mjpeg(frames, 16, 8))
        for i, fr in enumerate(out):
            _, _, _, px = decode_jpeg_gray(fr)
            assert set(px) == {flat_decode_value(100 + 7 * i)}

    def test_corruption_raises(self):
        import pytest

        from kafka_cdc_hudi_spark.functions.avi import decode_avi_mjpeg, encode_avi_mjpeg
        from kafka_cdc_hudi_spark.functions.jpeg import encode_jpeg_gray

        with pytest.raises(ValueError):
            decode_avi_mjpeg(b"not an avi at all....")
        avi = encode_avi_mjpeg([encode_jpeg_gray(bytes(64), 8, 8)], 8, 8)
        with pytest.raises(ValueError):
            decode_avi_mjpeg(avi[:40])  # truncated


def test_decode_images_on_error_null(spark):
    """Error-tolerant ingest: corrupt blobs yield null-feature rows instead
    of failing the job; good blobs still decode exactly."""
    from kafka_cdc_hudi_spark.functions.jpeg import encode_jpeg_gray
    from kafka_cdc_hudi_spark.operators.multimodal import decode_images

    good = encode_jpeg_gray(bytes([150]) * 64, 8, 8)
    rows = [
        (1, bytearray(good), "jpeg", len(good)),
        (2, bytearray(b"\xff\xd8\xffgarbage-truncated"), "jpeg", 20),
        (3, bytearray(b"totally not an image"), "bin", 20),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, content binary, format string, byte_len long"
    )
    out = {r.media_id: (r.width, r.feature_hash) for r in decode_images(df, on_error="null").collect()}
    assert out[1][0] == 8 and out[1][1] is not None
    assert out[2] == (None, None)
    assert out[3] == (None, None)

    import pytest

    with pytest.raises(Exception):
        decode_images(df, on_error="raise").collect()


class TestImaAdpcm:
    """IMA ADPCM WAV (format tag 17, r12): the former non-PCM guard is now
    a real decode. ADPCM is lossy, so the contract is (a) decode returns
    exactly the reconstruction the encoder's predictor loop defines, (b)
    that reconstruction tracks the input within the local step size, and
    (c) a hand-crafted block decodes to values an independent in-test
    reference computes."""

    def test_decode_matches_independent_reference(self):
        import struct

        from kafka_cdc_hudi_spark.functions.wav import decode_wav

        # hand-built mono file: one block, predictor 100, index 3,
        # nibble words [0x76543210, 0x0F0F0F0F]
        block = struct.pack("<hBB", 100, 3, 0) + struct.pack("<II", 0x76543210, 0x0F0F0F0F)
        fmt = struct.pack("<HHIIHHHH", 17, 1, 8000, 8000, len(block), 4, 2, 17)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(block)) + block)
        blob = b"RIFF" + struct.pack("<I", len(body)) + body

        # independent reference (tables typed fresh here on purpose)
        steps = [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28,
                 31, 34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107,
                 118, 130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
                 337, 371, 408, 449, 494, 544, 598, 658, 724, 796, 876,
                 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
                 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
                 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
                 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
                 27086, 29794, 32767]
        adj = [-1, -1, -1, -1, 2, 4, 6, 8]
        pred, idx, want = 100, 3, [100]
        for word in (0x76543210, 0x0F0F0F0F):
            for k in range(8):
                n = (word >> (4 * k)) & 0xF
                st = steps[idx]
                diff = st >> 3
                if n & 1:
                    diff += st >> 2
                if n & 2:
                    diff += st >> 1
                if n & 4:
                    diff += st
                pred = pred - diff if n & 8 else pred + diff
                pred = max(-32768, min(32767, pred))
                idx = max(0, min(88, idx + adj[n & 7]))
                want.append(pred)
        rate, ch, got = decode_wav(blob)
        assert (rate, ch) == (8000, 1)
        assert got == want

    @pytest.mark.parametrize("channels", [1, 2])
    def test_reconstruction_tracks_input(self, channels):
        import math

        from kafka_cdc_hudi_spark.functions.wav import decode_wav, encode_wav_adpcm

        sig = []
        for i in range(800):
            frame = [int(11000 * math.sin(i / 9))]
            if channels == 2:
                frame.append(int(9000 * math.cos(i / 13)))
            sig.extend(frame)
        rate, ch, out = decode_wav(encode_wav_adpcm(sig, 16000, channels=channels))
        assert (rate, ch) == (16000, channels)
        assert len(out) == len(sig)  # fact chunk trims final-block padding
        # skip the step-index warm-in; thereafter the reconstruction must
        # track within a generous local-step bound
        errs = [abs(a - b) for a, b in zip(sig[60 * channels:], out[60 * channels:])]
        assert max(errs) < 1500

    def test_decode_is_exactly_the_encoder_reconstruction(self):
        """decode(encode(x)) equals the predictor sequence the encoder
        itself stepped through — the deterministic half of a lossy codec."""
        import random

        from kafka_cdc_hudi_spark.functions import wav as wav_mod
        from kafka_cdc_hudi_spark.functions.wav import decode_wav, encode_wav_adpcm

        rng = random.Random(4)
        sig = [rng.randrange(-20000, 20000) for _ in range(300)]
        # re-derive the encoder's reconstruction with the module's own step
        pred = idx = 0
        recon = []
        blob = encode_wav_adpcm(sig, 8000, channels=1)
        _, _, got = decode_wav(blob)
        data_words = 8  # default block: 32-byte payload = 8 words -> 65 frames
        frames_per_block = 1 + data_words * 8
        f = 0
        while f < len(sig):
            pred = sig[f]
            recon.append(pred)
            for w in range(data_words):
                for k in range(8):
                    i = f + 1 + w * 8 + k
                    target = sig[i] if i < len(sig) else pred
                    n = wav_mod._ima_encode_nibble(target, pred, idx)
                    pred, idx = wav_mod._ima_step(pred, idx, n)
                    recon.append(pred)
            f += frames_per_block
        # the encoder's fact chunk trims final-block padding to len(sig)
        assert got == recon[: len(sig)]

    def test_truncated_final_block_decodes(self):
        """Real IMA ADPCM writers may truncate the last block to the
        remaining samples: header + fewer word groups than block_align
        implies must decode, not raise (ADVICE r12)."""
        import struct

        from kafka_cdc_hudi_spark.functions.wav import decode_wav

        # block_align says 2 data words, but the final (only) block
        # carries just ONE: header (4) + one word (4) = 8 bytes
        block = struct.pack("<hBB", 50, 0, 0) + struct.pack("<I", 0x00000000)
        fmt = struct.pack("<HHIIHHHH", 17, 1, 8000, 8000, 12, 4, 2, 17)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(block)) + block)
        blob = b"RIFF" + struct.pack("<I", len(body)) + body
        rate, ch, out = decode_wav(blob)
        assert (rate, ch) == (8000, 1)
        assert len(out) == 1 + 8  # header frame + one word (8 nibbles)
        assert out[0] == 50

    def test_fact_chunk_trims_padding(self):
        """A fact chunk with a smaller frame count than the padded block
        decodes must trim the output to the true count."""
        import struct

        from kafka_cdc_hudi_spark.functions.wav import decode_wav

        block = struct.pack("<hBB", 10, 0, 0) + struct.pack("<I", 0)
        fmt = struct.pack("<HHIIHHHH", 17, 1, 8000, 8000, 8, 4, 2, 9)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"fact" + struct.pack("<II", 4, 5)
                + b"data" + struct.pack("<I", len(block)) + block)
        blob = b"RIFF" + struct.pack("<I", len(body)) + body
        rate, ch, out = decode_wav(blob)
        assert len(out) == 5
        assert out[0] == 10

    def test_corrupt_index_rejected(self):
        import struct

        from kafka_cdc_hudi_spark.functions.wav import decode_wav

        block = struct.pack("<hBB", 0, 99, 0) + b"\x00" * 4  # index 99 > 88
        fmt = struct.pack("<HHIIHHHH", 17, 1, 8000, 8000, len(block), 4, 2, 9)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(block)) + block)
        with pytest.raises(ValueError, match="step index"):
            decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
