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


def test_real_decode_raises_not_implemented(spark, media):
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
