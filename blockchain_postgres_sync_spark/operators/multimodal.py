"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas`` pipelines.

This mirrors how a 100 TB training-data pipeline treats media: bytes are
never interpreted by the engine — only by vectorized Python stages at the
edge.  The Spark-side plumbing here is real (schemas, batch iteration,
partition sizing, output contracts); the actual codec calls are STUBBED
because this container ships no image/audio libraries:

- ``decode_stub=True`` (default) derives deterministic fake features from
  the bytes (shape from a seeded hash, mean from a byte-sum) so the
  pipeline is testable end-to-end;
- with ``decode_stub=False`` the stage raises ``NotImplementedError`` at the
  exact point a real codec (PIL/librosa/ffmpeg) would plug in.

Scale notes: media rows are wide (MBs) — ``spark.sql.files.maxPartitionBytes``
and ``maxRecordsPerBatch`` bound Arrow batch memory; mapInPandas streams
batches (never materializes a partition), so executor memory stays flat.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

#: canonical media-table schema: opaque payload + typed metadata
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),        # image | audio | video
    StructField("payload", BinaryType(), True),
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),        # images/video
    StructField("height", IntegerType(), True),
    StructField("duration_ms", LongType(), True),     # audio/video
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_bytes", LongType(), False),
    StructField("mean_intensity", FloatType(), True),
    StructField("phash64", LongType(), True),
])

FRAME_SAMPLE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_index", IntegerType(), False),
    StructField("frame_ts_ms", LongType(), False),
    StructField("frame", BinaryType(), True),
])

AUDIO_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("duration_ms", LongType(), True),
    StructField("n_bytes", LongType(), False),
    StructField("rms", FloatType(), True),
    StructField("mfcc", ArrayType(FloatType()), True),
])


def _fake_u64(data: bytes, salt: int) -> int:
    """Deterministic 63-bit value from payload bytes (stub feature source)."""
    h = 1469598103934665603 ^ salt  # FNV-1a offset basis, salted
    for b in data[:4096]:
        h = ((h ^ b) * 1099511628211) & ((1 << 63) - 1)
    return h


def image_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract images.  Real plumbing, stubbed codec."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            imgs = pdf[pdf["kind"] == "image"]
            if imgs.empty:
                continue
            rows = []
            for _, r in imgs.iterrows():
                payload = bytes(r["payload"]) if r["payload"] is not None else b""
                if not decode_stub:
                    raise NotImplementedError(
                        "real image decode requires PIL/cv2 (not in container); "
                        "plug codec here"
                    )
                h = _fake_u64(payload, 1)
                rows.append({
                    "media_id": r["media_id"],
                    "width": int(r["width"]) if pd.notna(r["width"]) else int(h % 4096),
                    "height": int(r["height"]) if pd.notna(r["height"]) else int((h >> 12) % 4096),
                    "n_bytes": len(payload),
                    "mean_intensity": float((h % 256_000) / 1000.0),
                    "phash64": _fake_u64(payload, 2),
                })
            yield pd.DataFrame(rows)

    return media.mapInPandas(_batches, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000, decode_stub: bool = True) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (fan-out
    inside the Arrow batch, so frame extraction parallelizes per video
    partition, not per video)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vids = pdf[pdf["kind"] == "video"]
            if vids.empty:
                continue
            rows = []
            for _, r in vids.iterrows():
                payload = bytes(r["payload"]) if r["payload"] is not None else b""
                duration = int(r["duration_ms"]) if pd.notna(r["duration_ms"]) else 0
                if not decode_stub:
                    raise NotImplementedError(
                        "real frame extraction requires ffmpeg; plug codec here"
                    )
                for i, ts in enumerate(range(0, max(duration, 1), every_ms)):
                    marker = _fake_u64(payload + i.to_bytes(4, "big"), 3)
                    rows.append({
                        "media_id": r["media_id"],
                        "frame_index": i,
                        "frame_ts_ms": ts,
                        "frame": marker.to_bytes(8, "big"),
                    })
            yield pd.DataFrame(rows)

    return media.mapInPandas(_batches, schema=FRAME_SAMPLE_SCHEMA)


def audio_features(media: DataFrame, n_mfcc: int = 4, decode_stub: bool = True) -> DataFrame:
    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            auds = pdf[pdf["kind"] == "audio"]
            if auds.empty:
                continue
            rows = []
            for _, r in auds.iterrows():
                payload = bytes(r["payload"]) if r["payload"] is not None else b""
                if not decode_stub:
                    raise NotImplementedError(
                        "real audio decode requires librosa/soundfile; plug codec here"
                    )
                h = _fake_u64(payload, 4)
                rows.append({
                    "media_id": r["media_id"],
                    "duration_ms": int(r["duration_ms"]) if pd.notna(r["duration_ms"]) else None,
                    "n_bytes": len(payload),
                    "rms": float((h % 1000) / 1000.0),
                    "mfcc": [float(((h >> (8 * k)) % 997) / 100.0) for k in range(n_mfcc)],
                })
            yield pd.DataFrame(rows)

    return media.mapInPandas(_batches, schema=AUDIO_FEATURES_SCHEMA)
