"""Multimodal plumbing tests: schemas, batch fan-out, determinism, and the
explicit NotImplementedError seam for real codecs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blockchain_postgres_sync_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNGfake-bytes-1", "image/png", 64, 48, None),
        (2, "image", b"\x89PNGfake-bytes-2", "image/png", None, None, None),
        (3, "audio", b"RIFFfake-audio", "audio/wav", None, None, 2500),
        (4, "video", b"\x00\x00ftypfake-video", "video/mp4", 640, 360, 3500),
        (5, "video", b"", "video/mp4", None, None, 0),
    ]
    return spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)


def test_image_features(media):
    out = mm.image_features(media).orderBy("media_id").collect()
    assert [r["media_id"] for r in out] == [1, 2]
    assert out[0]["width"] == 64 and out[0]["height"] == 48  # metadata wins
    assert out[1]["width"] is not None  # stub-derived when metadata missing
    assert out[0]["n_bytes"] == len(b"\x89PNGfake-bytes-1")
    # deterministic across runs
    again = mm.image_features(media).orderBy("media_id").collect()
    assert [r["phash64"] for r in again] == [r["phash64"] for r in out]


def test_frame_sampling_fanout(media):
    frames = mm.sample_frames(media, every_ms=1000).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id[4]) == 4  # 3500ms @ 1000ms -> ts 0,1000,2000,3000
    assert [r["frame_ts_ms"] for r in sorted(by_id[4], key=lambda r: r["frame_index"])] == [0, 1000, 2000, 3000]
    assert len(by_id[5]) == 1  # zero-duration still yields frame 0
    assert all(len(r["frame"]) == 8 for r in frames)


def test_audio_features(media):
    out = mm.audio_features(media, n_mfcc=4).collect()
    assert len(out) == 1 and out[0]["media_id"] == 3
    assert out[0]["duration_ms"] == 2500 and len(out[0]["mfcc"]) == 4


def test_real_codec_seam_raises(media):
    with pytest.raises(Exception) as ei:
        mm.image_features(media, decode_stub=False).collect()
    assert "NotImplementedError" in str(ei.value) or "decode" in str(ei.value)


def test_fnv_batch_matches_scalar():
    import pandas as pd

    from blockchain_postgres_sync_spark.operators.multimodal import (
        _fake_u64, _fnv_batch,
    )

    payloads = [b"", b"a", b"hello world" * 50, bytes(range(256)) * 20, None]
    for salt in (1, 2, 4):
        got = _fnv_batch(pd.Series(payloads, dtype=object), salt)
        want = [_fake_u64(p if p is not None else b"", salt) for p in payloads]
        assert [int(x) for x in got] == want


def _tiny_png(width=4, height=3):
    """Hand-assembled 8-bit RGB PNG (filter 0 rows) via stdlib only."""
    import struct
    import zlib

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b""
    val = 0
    for _y in range(height):
        raw += b"\x00"
        for _x in range(width * 3):
            raw += bytes([val % 256])
            val += 7
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _tiny_wav(n_frames=800, rate=8000):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"".join(
            struct.pack("<h", (1000 if i % 2 else -1000)) for i in range(n_frames)
        ))
    return buf.getvalue()


def test_real_codec_seam_png_wav(spark):
    """The codec seam accepts REAL stdlib decoders: a hand-built PNG and a
    wave-module WAV flow through the same mapInPandas stages as the stub
    path and produce true decoded dimensions/duration — proving a PIL/
    librosa codec plugs in without touching the Spark plumbing."""
    from blockchain_postgres_sync_spark.operators.multimodal import (
        MEDIA_SCHEMA, audio_features, decode_png_stdlib, decode_wav_stdlib,
        image_features,
    )

    png = _tiny_png(width=4, height=3)
    wav = _tiny_wav(n_frames=800, rate=8000)
    rows = [
        (1, "image", bytearray(png), "image/png", None, None, None),
        (2, "audio", bytearray(wav), "audio/wav", None, None, 0),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)

    img = image_features(media, codec=decode_png_stdlib).collect()
    assert len(img) == 1
    assert (img[0]["width"], img[0]["height"]) == (4, 3)
    assert img[0]["n_bytes"] == len(png)
    assert 0.0 < img[0]["mean_intensity"] < 255.0

    aud = audio_features(media, codec=decode_wav_stdlib).collect()
    assert len(aud) == 1
    assert aud[0]["duration_ms"] == 100  # 800 frames @ 8 kHz
    assert abs(aud[0]["rms"] - 1000 / 32768) < 1e-4


def test_png_decoder_average_and_paeth_filters():
    """Real encoders (PIL/libpng) emit Average/Paeth-filtered scanlines;
    the stdlib decoder must undo the full filter set.  Builds a PNG whose
    rows cycle filters 0..4 (filtering applied forward per spec), then
    checks the decoded mean against the known pixel values."""
    import struct
    import zlib

    import numpy as np

    from blockchain_postgres_sync_spark.operators.multimodal import (
        decode_png_stdlib,
    )

    w, h, ch = 7, 10, 3  # RGB
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(h, w * ch), dtype=np.uint8)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return c

    stride = w * ch
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        filt = y % 5
        line = img[y].astype(np.int32)
        out = np.empty(stride, dtype=np.int32)
        for i in range(stride):
            a = int(line[i - ch]) if i >= ch else 0
            b = int(prev[i])
            c = int(prev[i - ch]) if i >= ch else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: paeth(a, b, c)}[filt]
            out[i] = (int(line[i]) - pred) % 256
        raw.append(filt)
        raw.extend(out.astype(np.uint8).tobytes())
        prev = line

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))

    dw, dh, mean = decode_png_stdlib(png)
    assert (dw, dh) == (w, h)
    assert abs(mean - img.mean()) < 1e-9
