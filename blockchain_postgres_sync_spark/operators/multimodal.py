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


def decode_png_stdlib(data: bytes) -> tuple[int, int, float]:
    """Minimal stdlib PNG decoder: parses IHDR, inflates IDAT, undoes the
    full scanline filter set (None/Sub/Up/Average/Paeth — what real
    encoders such as PIL actually emit) for 8-bit RGB/gray images.
    Returns (width, height, mean_intensity).  This is the proof that the
    ``codec`` seam in :func:`image_features` accepts a REAL decoder: same
    signature a PIL-backed codec would have.
    """
    import struct
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, width, height, bit_depth, color_type = 8, 0, 0, 0, 0
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(">IIBB", body[:10])
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if bit_depth != 8 or color_type not in (0, 2):
        raise ValueError("stdlib decoder handles 8-bit gray/RGB only")
    channels = 1 if color_type == 0 else 3
    raw = zlib.decompress(idat)
    stride = width * channels
    prev = np.zeros(stride, dtype=np.uint8)
    total, count = 0, 0
    for y in range(height):
        row_start = y * (stride + 1)
        filt = raw[row_start]
        line = np.frombuffer(raw[row_start + 1 : row_start + 1 + stride], np.uint8).copy()
        if filt == 1:  # Sub: left predictor
            for i in range(channels, stride):
                line[i] = (int(line[i]) + int(line[i - channels])) & 0xFF
        elif filt == 2:  # Up: above predictor
            line = (line.astype(np.int32) + prev.astype(np.int32)).astype(np.uint8)
        elif filt == 3:  # Average: floor((left + above) / 2)
            for i in range(stride):
                left = int(line[i - channels]) if i >= channels else 0
                line[i] = (int(line[i]) + (left + int(prev[i])) // 2) & 0xFF
        elif filt == 4:  # Paeth predictor (spec's exact tie-break order)
            for i in range(stride):
                a = int(line[i - channels]) if i >= channels else 0
                b = int(prev[i])
                c = int(prev[i - channels]) if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                line[i] = (int(line[i]) + pred) & 0xFF
        elif filt != 0:
            raise ValueError(f"unsupported PNG filter {filt}")
        total += int(line.sum())
        count += stride
        prev = line
    return width, height, total / max(count, 1)


def encode_png_stdlib(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal stdlib PNG encoder (8-bit grayscale, filter 0): the fixture
    side of the real-codec seam — bytes it emits round-trip through
    :func:`decode_png_stdlib` (and any standards-compliant decoder)."""
    import struct
    import zlib

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def encode_wav_stdlib(samples: "np.ndarray", rate: int = 8000) -> bytes:
    """Minimal stdlib WAV encoder (16-bit PCM mono) — fixture side of the
    :func:`decode_wav_stdlib` seam."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples).astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav_stdlib(data: bytes) -> tuple[int, float]:
    """Stdlib WAV decoder via the ``wave`` module: returns (duration_ms,
    rms in [0, 1]) for 16-bit PCM — the real-codec seam for
    :func:`audio_features`."""
    import io
    import wave

    with wave.open(io.BytesIO(data)) as w:
        n = w.getnframes()
        rate = w.getframerate()
        width = w.getsampwidth()
        frames = w.readframes(n)
    if width != 2:
        raise ValueError("stdlib decoder handles 16-bit PCM only")
    samples = np.frombuffer(frames, dtype=np.int16).astype(np.float64) / 32768.0
    duration_ms = int(n * 1000 / rate)
    rms = float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0
    return duration_ms, rms


def image_features(
    media: DataFrame, decode_stub: bool = True, codec=None
) -> DataFrame:
    """Decode + feature-extract images.  Real plumbing; the codec is
    pluggable: ``codec`` is any ``bytes -> (width, height, mean_intensity)``
    callable (:func:`decode_png_stdlib` is a working stdlib instance; a
    PIL/cv2 codec drops in with the same shape).  With no codec and
    ``decode_stub=False`` the stage raises at the plug point."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            imgs = pdf[pdf["kind"] == "image"]
            if imgs.empty:
                continue
            if codec is not None:
                decoded = [
                    codec(bytes(p)) if p is not None else (0, 0, 0.0)
                    for p in imgs["payload"]
                ]
                yield pd.DataFrame({
                    "media_id": imgs["media_id"].to_numpy(),
                    "width": np.array([d[0] for d in decoded], dtype=np.int32),
                    "height": np.array([d[1] for d in decoded], dtype=np.int32),
                    "n_bytes": np.array(
                        [len(bytes(p)) if p is not None else 0
                         for p in imgs["payload"]], dtype=np.int64),
                    "mean_intensity": np.array(
                        [d[2] for d in decoded], dtype=np.float32),
                    "phash64": _fnv_batch(imgs["payload"], 2).astype(np.int64),
                })
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
            if not decode_stub:
                raise NotImplementedError(
                    "real frame extraction requires ffmpeg; plug codec here"
                )
            # vectorized fan-out: per-video frame counts -> repeat video
            # indices, derive each frame's index by subtracting its video's
            # running offset (the repeat + cumcount idiom) — no row loop
            payloads = [
                bytes(p) if p is not None else b"" for p in vids["payload"]
            ]
            durations = np.where(
                vids["duration_ms"].notna(), vids["duration_ms"].fillna(0), 0
            ).astype(np.int64)
            counts = np.maximum(
                -(-np.maximum(durations, 1) // every_ms), 1
            ).astype(np.int64)
            vid_idx = np.repeat(np.arange(len(vids)), counts)
            offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
            frame_index = (
                np.arange(counts.sum()) - np.repeat(offsets, counts)
            ).astype(np.int64)
            # marker hash = FNV over (payload + frame-index suffix), batch-
            # vectorized; same truncation as _fake_u64 so values match the
            # per-row form bit for bit
            suffixed = pd.Series(
                [
                    payloads[v] + int(i).to_bytes(4, "big")
                    for v, i in zip(vid_idx, frame_index)
                ]
            )
            markers = _fnv_batch(suffixed, 3)
            yield pd.DataFrame({
                "media_id": vids["media_id"].to_numpy()[vid_idx],
                "frame_index": frame_index.astype(np.int32),
                "frame_ts_ms": frame_index * every_ms,
                "frame": [int(m).to_bytes(8, "big") for m in markers],
            })

    return media.mapInPandas(_batches, schema=FRAME_SAMPLE_SCHEMA)


def audio_features(
    media: DataFrame, n_mfcc: int = 4, decode_stub: bool = True, codec=None
) -> DataFrame:
    """Audio decode + features; ``codec`` is any ``bytes -> (duration_ms,
    rms)`` callable (:func:`decode_wav_stdlib` is the stdlib instance)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            auds = pdf[pdf["kind"] == "audio"]
            if auds.empty:
                continue
            if codec is not None:
                decoded = [
                    codec(bytes(p)) if p is not None else (0, 0.0)
                    for p in auds["payload"]
                ]
                yield pd.DataFrame({
                    "media_id": auds["media_id"].to_numpy(),
                    "duration_ms": np.array(
                        [d[0] for d in decoded], dtype=np.int64),
                    "n_bytes": np.array(
                        [len(bytes(p)) if p is not None else 0
                         for p in auds["payload"]], dtype=np.int64),
                    "rms": np.array([d[1] for d in decoded], dtype=np.float32),
                    "mfcc": [
                        [float(d[1])] * n_mfcc for d in decoded
                    ],
                })
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
