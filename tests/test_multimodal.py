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
