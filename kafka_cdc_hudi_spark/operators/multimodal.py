"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode/feature-extract as Arrow-batched ``mapInPandas`` stages.

Design for 100 TB of image/audio/video:

- media is an opaque ``binary`` column plus a typed metadata struct —
  Spark never interprets the bytes except inside the decode UDF;
- decode/resize/frame-sample run as ``mapInPandas`` (Arrow batches, one
  Python worker per core, no per-row overhead). Output schemas are fixed
  ``StructType``s so downstream stays fully native;
- partitioning: media rows are large — repartition by size budget before a
  decode stage so one Arrow batch fits comfortably in worker memory
  (``media_repartition``).

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernel is stubbed: ``decode_images(..., fake=True)`` produces
deterministic pseudo-features from the bytes (md5-derived), and
``fake=False`` raises ``NotImplementedError`` at evaluation time. The
Spark-side plumbing — schema, batching, UDF signature — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical media-row schema: id + opaque bytes + container metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content", BinaryType(), True),
        StructField("format", StringType(), True),
        StructField("byte_len", LongType(), True),
    ]
)

#: decode output: id + extracted typed features
IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("feature_hash", StringType(), True),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as a stand-in media blob (the
    container has no real image fixtures)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("content"),
        F.when(F.octet_length("text") % 3 == 0, "png")
        .when(F.octet_length("text") % 3 == 1, "jpeg")
        .otherwise("webp")
        .alias("format"),
        F.octet_length("text").cast("long").alias("byte_len"),
    )


#: sizeInBytes at/above this is Catalyst's "no statistics" placeholder
#: (spark.sql.defaultSizeInBytes = Long.MaxValue, possibly scaled by a
#: join estimate) rather than a real measurement
_NO_STATS_SIZE = 1 << 60
#: hard ceiling on computed partition counts — far above any sane local or
#: cluster fan-out, low enough that a garbage estimate cannot melt the
#: scheduler with ~10^11 empty tasks
_MAX_PARTITIONS = 100_000


def media_repartition(
    df: DataFrame,
    target_rows_per_partition: int = 1024,
    avg_row_bytes: int = 64 * 1024,
    exact: bool = False,
) -> DataFrame:
    """Bound Arrow batch size ahead of a decode stage.

    Default sizing uses Catalyst's plan statistics (``sizeInBytes`` — file
    metadata, NO job) divided by an assumed blob size: free, and accurate
    enough for a batch-size bound where only the order of magnitude
    matters. ``exact=True`` restores the row-count job for callers that
    need the tight bound and have a cached upstream (the former behavior —
    a full count of an expensive lineage was the cost the default now
    avoids). Ceil division: floor would leave up to 2x the budget in one
    partition.

    Plans with NO file statistics (non-file sources, post-join/UDF lineage)
    report ``spark.sql.defaultSizeInBytes`` (Long.MaxValue) — that sentinel
    falls back to the exact count instead of planning ~10^11 partitions,
    and the result is clamped to ``_MAX_PARTITIONS`` either way."""
    if exact:
        n_rows = df.count()
    else:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        if size >= _NO_STATS_SIZE:
            n_rows = df.count()  # stats are the Long.MaxValue placeholder
        else:
            n_rows = max(1, size // max(1, avg_row_bytes))
    n = max(1, min(_MAX_PARTITIONS, -(-n_rows // target_rows_per_partition)))
    return df.repartition(n)


def _fake_decode(content: bytes) -> tuple[int, int, int, str]:
    """Deterministic pseudo-decode: md5-derived dims. Stands in for
    PIL.Image.open; same bytes -> same 'image'."""
    h = hashlib.md5(content or b"").hexdigest()
    width = 64 + int(h[:4], 16) % 1984
    height = 64 + int(h[4:8], 16) % 1984
    channels = 1 + int(h[8], 16) % 4
    return width, height, channels, h


def decode_images(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode stage: media frame -> IMAGE_FEATURES_SCHEMA frame.

    ``fake=False`` is the real-codec path — unavailable here, raises
    ``NotImplementedError`` inside the workers (by design; see module
    docstring). ``fake=True`` runs the deterministic stub through the SAME
    mapInPandas machinery, so batching/schema/serialization are exercised.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image codecs are not available in this environment; "
                    "install PIL/ffmpeg and implement the kernel here, or use fake=True"
                )
            feats = [_fake_decode(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": pd.Series([f[0] for f in feats], dtype="int32"),
                    "height": pd.Series([f[1] for f in feats], dtype="int32"),
                    "n_channels": pd.Series([f[2] for f in feats], dtype="int32"),
                    "feature_hash": [f[3] for f in feats],
                }
            )

    return df.mapInPandas(decode_batches, IMAGE_FEATURES_SCHEMA)


#: resize output: original id + new dims + resized payload (still opaque)
RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("content", BinaryType(), True),
    ]
)


def resize_images(df: DataFrame, width: int, height: int, fake: bool = False) -> DataFrame:
    """Resize stage: media frame -> RESIZED_SCHEMA frame at (width, height).

    Real path (``fake=False``) would decode + resample + re-encode per
    batch; stubbed here (no codecs in the container). The fake kernel emits
    a deterministic payload derived from the input bytes and the target
    dims, sized min(byte_len, width*height) — small enough to exercise
    Arrow round-trips without blowing memory.
    """

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image codecs are not available in this environment; "
                    "install PIL and implement the resample kernel, or use fake=True"
                )
            out_bytes = []
            for c in pdf["content"]:
                c = c or b""
                seed = hashlib.md5(c + f"{width}x{height}".encode()).digest()
                n = min(len(c), width * height)
                out_bytes.append((seed * (n // len(seed) + 1))[:n])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "content": out_bytes,
                }
            )

    return df.mapInPandas(resize_batches, RESIZED_SCHEMA)


#: frame-sample output: one row per sampled frame (one-to-many stage)
FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_hash", StringType(), True),
    ]
)


def sample_frames(df: DataFrame, frame_bytes: int = 256, fake: bool = False) -> DataFrame:
    """Frame-sampling stage: media frame -> one row per sampled frame.

    Models video frame extraction as a one-to-many ``mapInPandas`` (output
    cardinality = ceil(byte_len / frame_bytes) per row) — the shape matters:
    downstream operators see an exploded frame table they can window/join
    natively. Real path would be ffmpeg keyframe sampling; the fake kernel
    hashes fixed-size byte windows, so frame count and hashes are
    deterministic functions of the input.
    """

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "ffmpeg is not available in this environment; "
                    "implement keyframe sampling here, or use fake=True"
                )
            ids, idxs, hashes = [], [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                c = c or b""
                n_frames = max(1, -(-len(c) // frame_bytes))
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    hashes.append(hashlib.md5(c[i * frame_bytes : (i + 1) * frame_bytes]).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_hash": hashes,
                }
            )

    return df.mapInPandas(frame_batches, FRAME_SCHEMA)
