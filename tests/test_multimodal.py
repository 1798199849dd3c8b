"""Multimodal column plumbing: REAL WAV decode, frame sampling,
thumbnail resize."""

from __future__ import annotations

import io
import math
import struct
import wave

import numpy as np
from pyspark.sql import functions as F

from kgtk_spark.textops.multimodal import (
    audio_features,
    resize_image_stub,
    sample_video_frames,
)


def _make_wav(freq: float = 440.0, sr: int = 8000, seconds: float = 0.5) -> bytes:
    n = int(sr * seconds)
    samples = (
        (np.sin(2 * math.pi * freq * np.arange(n) / sr) * 20000).astype(np.int16)
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def test_audio_features_real_wav_decode(spark):
    wav = _make_wav()
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(b"not a wav"))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in audio_features(df).collect()}
    a = out[1]
    assert a["sample_rate"] == 8000
    assert a["n_channels"] == 1
    assert a["n_samples"] == 4000
    assert abs(a["duration_sec"] - 0.5) < 1e-9
    # a 20000-amplitude sine has RMS ≈ 20000/√2
    assert abs(a["rms"] - 20000 / math.sqrt(2)) < 200
    # 440 Hz crosses zero ~880 times/sec → rate ≈ 0.11 at 8 kHz
    assert 0.08 < a["zero_crossing_rate"] < 0.14
    # non-WAV payloads degrade to null features, not batch failure
    assert out[2]["sample_rate"] is None


def test_sample_video_frames(spark):
    payload = bytes(range(256)) * 40  # 10240 bytes = 10 frames of 1024
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    frames = sample_video_frames(df, frame_bytes=1024, every_nth=3).collect()
    idx = sorted(r["frame_index"] for r in frames)
    assert idx == [0, 3, 6, 9]
    by_idx = {r["frame_index"]: bytes(r["frame"]) for r in frames}
    assert by_idx[0] == payload[:1024]
    assert by_idx[9] == payload[9 * 1024 : 10 * 1024]


def test_resize_image_stub_shapes_and_determinism(spark):
    df = spark.createDataFrame(
        [(1, bytearray(bytes(range(256)) * 16)), (2, bytearray(b"\xff" * 100))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in resize_image_stub(df, out_h=4, out_w=4).collect()}
    assert out[1]["height"] == 4 and out[1]["width"] == 4
    assert len(out[1]["pixels"]) == 16
    # constant 0xff image → every block mean is 255
    assert all(abs(p - 255.0) < 1e-9 for p in out[2]["pixels"])
    # deterministic across runs
    again = {r["doc_id"]: r for r in resize_image_stub(df, out_h=4, out_w=4).collect()}
    assert again[1]["pixels"] == out[1]["pixels"]


def _make_png(arr, ctype=0, filters=None):
    """Encode a small image as PNG with chosen per-row filters."""
    import struct
    import zlib

    import numpy as np

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    if arr.ndim == 2:
        h, w = arr.shape
        nch = 1
        px = arr[:, :, None]
    else:
        h, w, nch = arr.shape
        px = arr
    filters = filters or [0] * h
    raw = b""
    prev = np.zeros(w * nch, dtype=np.uint8)
    for y, f in zip(range(h), filters):
        line = px[y].reshape(-1).astype(np.uint8)
        if f == 0:
            enc = line
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(nch, np.uint8), line[:-nch]])
            enc = line - left
        elif f == 2:  # Up
            enc = line - prev
        else:
            raise ValueError
        raw += bytes([f]) + enc.tobytes()
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _make_bmp(rgb):
    import struct

    import numpy as np

    h, w, _ = rgb.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        bgr = rgb[y][:, ::-1].astype(np.uint8).tobytes()
        body += bgr + b"\x00" * pad
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    return hdr + info + body


def test_decode_image_bytes_real_formats():
    import numpy as np

    from kgtk_spark.textops.multimodal import decode_image_bytes

    rng = np.random.RandomState(7)
    gray = rng.randint(0, 256, (5, 4)).astype(np.uint8)

    # PNG grayscale, every implemented filter type on some row
    png = _make_png(gray, ctype=0, filters=[0, 1, 2, 1, 0])
    out = decode_image_bytes(png)
    assert out.shape == (5, 4)
    assert np.array_equal(out, gray.astype(np.float64))

    # PNG RGB → luma
    rgb = rng.randint(0, 256, (3, 3, 3)).astype(np.uint8)
    png_rgb = _make_png(rgb, ctype=2)
    out = decode_image_bytes(png_rgb)
    luma = rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114
    assert np.allclose(out, luma)

    # BMP 24bpp bottom-up with row padding (w=3 → 9 bytes + 3 pad)
    bmp = _make_bmp(rgb)
    assert np.allclose(decode_image_bytes(bmp), luma)

    # PGM with a comment line
    pgm = b"P5\n# comment\n4 5\n255\n" + gray.tobytes()
    assert np.array_equal(decode_image_bytes(pgm), gray.astype(np.float64))

    # unknown magic raises
    import pytest

    with pytest.raises(ValueError):
        decode_image_bytes(b"\xff\xd8\xff\xe0 fake jpeg")


def test_thumbnail_image_real_and_fallback(spark):
    import numpy as np

    from kgtk_spark.textops.multimodal import thumbnail_image

    grad = np.tile(np.arange(16, dtype=np.uint8) * 16, (16, 1))
    png = _make_png(grad, ctype=0)
    rows = [(1, bytearray(png)), (2, bytearray(b"\xff\xd8 not decodable"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in thumbnail_image(df, out_h=4, out_w=4).collect()}
    assert out[1]["decoded"] is True
    # horizontal gradient: each thumbnail row identical, increasing
    pix = np.array(out[1]["pixels"]).reshape(4, 4)
    assert np.allclose(pix[0], pix[3])
    assert (np.diff(pix[0]) > 0).all()
    # undecodable payload takes the disclosed fallback
    assert out[2]["decoded"] is False
