"""Multimodal plumbing: real mapInPandas machinery, stubbed codec."""

import pytest

from kafka_cdc_hudi_spark.operators.multimodal import (
    IMAGE_FEATURES_SCHEMA,
    decode_images,
    documents_as_media,
    media_repartition,
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
