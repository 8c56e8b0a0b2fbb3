"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: payloads are ``binary`` columns
with typed metadata; decode / feature-extract / resize / frame-sample
run as ``mapInPandas`` stages (Arrow batches of bytes in, fixed-schema
features out) so the expensive step parallelizes per input split and
never round-trips through the driver.

The real codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode step is stubbed two ways (clearly marked):
  - ``decode_image(...)``      raises NotImplementedError (the real hook)
  - ``fake_decode_meta(...)``  deterministic fake decoder used by tests
    and the driver queries — derives width/height/duration from a crc32
    of the payload so every piece of Spark-side plumbing (schema, batch
    shape, partitioning, null handling) is exercised for real.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def decode_image(payload: bytes):
    """Real decode hook — requires an image codec, absent here."""
    raise NotImplementedError(
        "image/audio codecs are not available in this environment; "
        "wire PIL/ffmpeg here on a real cluster"
    )


def _fake_meta(media_id: int, payload: bytes, media_type: str) -> dict:
    """Deterministic stand-in: all fields derived from crc32(payload)."""
    crc = zlib.crc32(payload or b"")
    rng = np.random.RandomState(crc % (2**31))
    return {
        "media_id": media_id,
        "byte_len": len(payload or b""),
        "media_type": media_type,
        "width": 64 + crc % 1024,
        "height": 64 + (crc >> 10) % 1024,
        "duration_ms": (crc >> 5) % 600000 if media_type in ("audio", "video") else 0,
        "feature": [float(x) for x in np.round(rng.normal(size=8), 4)],
    }


def extract_media_meta(df: DataFrame, id_col: str = "media_id",
                       payload_col: str = "payload",
                       type_col: str = "media_type") -> DataFrame:
    """mapInPandas decode stage: binary in → typed metadata + feature out.

    Batch shape is the real contract: each Arrow batch is decoded as a
    unit; output rows align 1:1 with inputs; partitioning of the input
    (e.g. by source shard) is preserved."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    _fake_meta(i, p, t)
                    for i, p, t in zip(pdf[id_col], pdf[payload_col], pdf[type_col])
                ]
            )

    return df.select(id_col, payload_col, type_col).mapInPandas(
        decode, schema=MEDIA_META_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(df: DataFrame, target_w: int, target_h: int,
                  id_col: str = "media_id", payload_col: str = "payload") -> DataFrame:
    """mapInPandas resize stage (binary in → binary out, fixed target
    dims).  The real kernel (PIL/opencv) is absent here — the
    deterministic fake re-encodes the payload as a crc-stamped byte
    string proportional to target area, so batch shape, binary-out
    schema, and null handling are exercised for real; swap ``_fake``
    for a codec call on a real cluster (decode_image hook)."""

    def _fake(payload: bytes | None) -> bytes | None:
        if payload is None:
            return None
        crc = zlib.crc32(payload)
        # deterministic pseudo-pixels: area/64 bytes seeded by content
        n = max(1, (target_w * target_h) // 64)
        return np.random.RandomState(crc % (2**31)).bytes(n)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "width": np.int32(target_w),
                    "height": np.int32(target_h),
                    "payload": [_fake(p) for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(resize, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(df: DataFrame, every_ms: int = 1000, max_frames: int = 32,
                  id_col: str = "media_id", payload_col: str = "payload",
                  type_col: str = "media_type") -> DataFrame:
    """mapInPandas frame-sampling stage for video payloads: one input
    row fans out to ≤max_frames frame rows at every_ms spacing — the
    1:N output shape (unlike decode's 1:1) is the contract exercised
    here.  Frame count derives from the fake decoder's duration;
    non-video rows produce zero frames.  The capped fan-out bounds
    output volume at corpus scale (a 10 h video cannot explode a task)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame": []}
            for i, p, t in zip(pdf[id_col], pdf[payload_col], pdf[type_col]):
                if t != "video" or p is None:
                    continue
                meta = _fake_meta(i, p, t)
                n = min(max_frames, max(1, meta["duration_ms"] // every_ms))
                crc = zlib.crc32(p)
                for f in range(int(n)):
                    out["media_id"].append(i)
                    out["frame_idx"].append(f)
                    out["ts_ms"].append(f * every_ms)
                    out["frame"].append(
                        np.random.RandomState((crc + f) % (2**31)).bytes(32)
                    )
            yield pd.DataFrame(out).astype(
                {"frame_idx": "int32", "ts_ms": "int32"}, errors="ignore"
            )

    return df.select(id_col, payload_col, type_col).mapInPandas(
        sample, schema=FRAMES_SCHEMA
    )


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter for the testdata ``documents`` table: treat text bytes as
    an opaque payload (exercises the binary-column path end-to-end)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("image").alias("media_type"),
    )
