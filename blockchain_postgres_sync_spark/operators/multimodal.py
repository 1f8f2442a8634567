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

import numpy as np
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


def _fnv_batch(payloads: pd.Series, salt: int) -> np.ndarray:
    """Vectorized :func:`_fake_u64` over a whole Arrow batch: one numpy pass
    per byte position instead of a Python loop per row.  uint64 wrap-around
    multiply + 63-bit mask ≡ the per-row integer math, so values are
    bit-identical (property-tested against _fake_u64)."""
    bs = [bytes(p)[:4096] if p is not None else b"" for p in payloads]
    n = len(bs)
    h = np.full(n, np.uint64(1469598103934665603 ^ salt), dtype=np.uint64)
    maxlen = max((len(b) for b in bs), default=0)
    if maxlen == 0:
        return h
    arr = np.zeros((n, maxlen), dtype=np.uint64)
    lens = np.zeros(n, dtype=np.int64)
    for i, b in enumerate(bs):
        lens[i] = len(b)
        if b:
            arr[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    mask63 = np.uint64((1 << 63) - 1)
    prime = np.uint64(1099511628211)
    for pos in range(maxlen):
        active = lens > pos
        h[active] = ((h[active] ^ arr[active, pos]) * prime) & mask63
    return h


def image_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract images.  Real plumbing, stubbed codec."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            imgs = pdf[pdf["kind"] == "image"]
            if imgs.empty:
                continue
            if not decode_stub:
                raise NotImplementedError(
                    "real image decode requires PIL/cv2 (not in container); "
                    "plug codec here"
                )
            h1 = _fnv_batch(imgs["payload"], 1)
            h2 = _fnv_batch(imgs["payload"], 2)
            n_bytes = np.array(
                [len(bytes(p)) if p is not None else 0 for p in imgs["payload"]],
                dtype=np.int64,
            )
            width = np.where(
                imgs["width"].notna(), imgs["width"].fillna(0), h1 % np.uint64(4096)
            ).astype(np.int32)
            height = np.where(
                imgs["height"].notna(), imgs["height"].fillna(0),
                (h1 >> np.uint64(12)) % np.uint64(4096),
            ).astype(np.int32)
            yield pd.DataFrame({
                "media_id": imgs["media_id"].to_numpy(),
                "width": width,
                "height": height,
                "n_bytes": n_bytes,
                "mean_intensity": ((h1 % np.uint64(256_000)).astype(np.float64)
                                   / 1000.0).astype(np.float32),
                "phash64": h2.astype(np.int64),
            })

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
            if not decode_stub:
                raise NotImplementedError(
                    "real audio decode requires librosa/soundfile; plug codec here"
                )
            h = _fnv_batch(auds["payload"], 4)
            n_bytes = np.array(
                [len(bytes(p)) if p is not None else 0 for p in auds["payload"]],
                dtype=np.int64,
            )
            mfcc = [
                [float(((int(hv) >> (8 * k)) % 997) / 100.0) for k in range(n_mfcc)]
                for hv in h
            ]
            yield pd.DataFrame({
                "media_id": auds["media_id"].to_numpy(),
                "duration_ms": auds["duration_ms"],
                "n_bytes": n_bytes,
                "rms": ((h % np.uint64(1000)).astype(np.float64) / 1000.0
                        ).astype(np.float32),
                "mfcc": mfcc,
            })

    return media.mapInPandas(_batches, schema=AUDIO_FEATURES_SCHEMA)
