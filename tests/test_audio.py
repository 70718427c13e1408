"""RIFF/WAVE codec + audio operator tests (mirrors the raster suite:
in-repo encoder produces spec-shaped files the in-repo decoder reads
back; signal statistics are checked against closed-form values)."""

from __future__ import annotations

import numpy as np
import pytest

from etl_lealone_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _parse_wav,
    audio_resample,
    audio_stats_features,
    encode_wav,
)


def _sine(freq=440.0, rate=8000, seconds=0.5, amp=0.5, channels=1):
    t = np.arange(int(rate * seconds)) / rate
    s = amp * np.sin(2 * np.pi * freq * t)
    return np.stack([s] * channels, axis=1)


def test_wav_roundtrip_16bit_stereo():
    s = _sine(channels=2)
    rate, ch, back = _parse_wav(encode_wav(s, 8000, bits=16))
    assert (rate, ch) == (8000, 2)
    assert back.shape == s.shape
    assert np.abs(back - s).max() < 1 / 32000  # 16-bit quantization floor


def test_wav_roundtrip_float32():
    s = _sine()
    rate, ch, back = _parse_wav(encode_wav(s, 44100, bits=32))
    assert (rate, ch) == (44100, 1)
    assert np.abs(back - s).max() < 1e-6


def test_wav_24bit_decode():
    # hand-build a 24-bit PCM file: values near full scale incl. the
    # negative wrap, little-endian 3-byte packing
    import struct

    vals = [0, 1 << 22, -(1 << 22), (1 << 23) - 1, -(1 << 23)]
    data = b"".join(struct.pack("<i", v)[:3] for v in vals)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    buf = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    rate, ch, s = _parse_wav(buf)
    expect = np.array(vals, dtype=np.float64) / (1 << 23)
    assert np.allclose(s[:, 0], expect)


def test_wav_compressed_tag_gated():
    import struct

    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)  # ADPCM tag
    buf = (
        b"RIFF" + struct.pack("<I", 28) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(NotImplementedError, match="ADPCM|format tag"):
        _parse_wav(buf)


def test_not_a_wav_raises():
    with pytest.raises(ValueError, match="RIFF"):
        _parse_wav(b"\xff\xd8 definitely not audio")


def test_audio_stats_closed_form(spark):
    # 440 Hz sine at amp 0.5: rms = amp/sqrt(2), zcr = 2*f/rate
    s = _sine(freq=440.0, rate=8000, seconds=1.0, amp=0.5)
    media = spark.createDataFrame(
        [(1, bytearray(encode_wav(s, 8000)), ("audio", "audio/wav", None, None, 1000))],
        MEDIA_SCHEMA,
    )
    r = audio_stats_features(media).collect()[0]
    assert r["sample_rate"] == 8000 and r["channels"] == 1
    assert r["n_frames"] == 8000 and r["duration_ms"] == 1000
    assert abs(r["rms"] - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(r["zero_crossing_rate"] - 2 * 440 / 8000) < 5e-3
    assert 0.49 < r["peak"] <= 0.5


def test_audio_resample_preserves_signal(spark):
    s = _sine(freq=200.0, rate=8000, seconds=0.5, amp=0.4)
    media = spark.createDataFrame(
        [(7, bytearray(encode_wav(s, 8000)), ("audio", "audio/wav", None, None, 500))],
        MEDIA_SCHEMA,
    )
    out = audio_resample(media, target_rate=4000).collect()[0]
    rate, ch, back = _parse_wav(bytes(out["payload"]))
    assert rate == 4000 and back.shape[0] == 2000
    assert out["meta"]["duration_ms"] == 500
    # a 200 Hz tone is far below the new nyquist: rms must survive
    assert abs(float(np.sqrt(np.mean(back**2))) - 0.4 / np.sqrt(2)) < 5e-3


def test_wav_zero_rate_or_channels_rejected():
    import struct

    for ch, rate in ((0, 8000), (1, 0)):
        fmt = struct.pack("<HHIIHH", 1, ch, rate, 8000, 2, 16)
        buf = (
            b"RIFF" + struct.pack("<I", 28) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0)
        )
        with pytest.raises(ValueError, match="corrupt WAV"):
            _parse_wav(buf)
