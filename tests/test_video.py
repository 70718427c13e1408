"""MJPEG-AVI container tests: the in-repo AVI writer wraps frames from
the in-repo JPEG encoder, the parser splits them back, and the sampled
frames decode through the raster path — a fully hermetic video
pipeline (inter-frame codecs stay gated)."""

from __future__ import annotations

import numpy as np
import pytest

from etl_lealone_spark.operators.jpeg import decode_jpeg, encode_jpeg
from etl_lealone_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _parse_avi_mjpeg,
    encode_avi_mjpeg,
    frame_sample_mjpeg,
)


def _frames(n=6, h=16, w=16):
    # each frame a distinct flat gray level so identity survives the DCT
    return [
        encode_jpeg(np.full((h, w), 40 + 24 * i, dtype=np.uint8), quality=90)
        for i in range(n)
    ]


def test_avi_roundtrip_preserves_frames():
    frames = _frames(6)
    usec, back = _parse_avi_mjpeg(encode_avi_mjpeg(frames, fps=4, width=16, height=16))
    assert usec == 250_000
    assert back == frames  # byte-identical container roundtrip


def test_avi_rejects_non_riff_and_non_mjpeg():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        _parse_avi_mjpeg(b"\x00" * 32)
    # a well-formed AVI whose frame chunk is not a JPEG must gate loudly
    fake = encode_avi_mjpeg([b"\x00\x01notjpeg"], fps=10)
    with pytest.raises(NotImplementedError, match="non-MJPEG"):
        _parse_avi_mjpeg(fake)


def test_frame_sample_mjpeg_grid_and_decode(spark):
    # 6 frames at 4 fps = 250ms apart; sampling every 500ms keeps
    # frames 0, 2, 4
    frames = _frames(6)
    media = spark.createDataFrame(
        [(3, bytearray(encode_avi_mjpeg(frames, fps=4)), ("video", "video/x-msvideo", 16, 16, 1500))],
        MEDIA_SCHEMA,
    )
    rows = sorted(
        frame_sample_mjpeg(media, every_ms=500).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    assert [r["ts_ms"] for r in rows] == [0, 500, 1000]
    # every sampled frame is a decodable JPEG carrying its gray level
    for r in rows:
        w, h, c, arr = decode_jpeg(bytes(r["frame_bytes"]))
        assert (w, h) == (16, 16)
        expect = 40 + 24 * r["frame_idx"]
        assert abs(int(arr.mean()) - expect) <= 2


def test_extract_features_real_path_for_decodable_payloads(spark):
    # a PNG payload gets genuine pixel stats; an opaque blob keeps the
    # deterministic fake — same schema, one operator
    import numpy as np

    from etl_lealone_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_png,
        extract_features,
        resize,
        decode_raster,
    )

    img = np.full((10, 20, 3), 64, dtype=np.uint8)
    rows = [
        (1, bytearray(encode_png(img)), ("image", "image/png", 20, 10, None)),
        (2, bytearray(b"opaque-blob-bytes"), ("image", "image/fake", 5, 5, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    assert feats[1][:3] == [20.0, 10.0, 3.0] and feats[1][3] == 64.0
    assert feats[2][0] == float(len(b"opaque-blob-bytes"))  # fake path
    out = {r["media_id"]: r for r in resize(media, width=8, height=4).collect()}
    w, h, c, arr = decode_raster(bytes(out[1]["payload"]))
    assert (w, h, c) == (8, 4, 3) and int(arr.mean()) == 64
    assert out[1]["meta"]["mime"] == "image/x-portable-pixmap"
    assert len(bytes(out[2]["payload"])) == 8 * 4 // 64 or out[2]["meta"]["width"] == 8


def test_resize_drops_alpha_channels(spark):
    # RGBA PNG -> netpbm has no alpha: resize must emit a valid 3-channel
    # P6, not 4-byte pixels under a P6 header (silent corruption)
    import numpy as np

    from etl_lealone_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_raster,
        encode_png,
        resize,
    )

    rgba = np.dstack([np.full((12, 8), 64, np.uint8)] * 3 + [np.full((12, 8), 200, np.uint8)])
    ga = np.dstack([np.full((6, 6), 100, np.uint8), np.full((6, 6), 50, np.uint8)])
    rows = [
        (1, bytearray(encode_png(rgba)), ("image", "image/png", 8, 12, None)),
        (2, bytearray(encode_png(ga)), ("image", "image/png", 6, 6, None)),
    ]
    out = {
        r["media_id"]: r
        for r in resize(
            spark.createDataFrame(rows, MEDIA_SCHEMA), width=4, height=4
        ).collect()
    }
    w, h, c, arr = decode_raster(bytes(out[1]["payload"]))
    assert (w, h, c) == (4, 4, 3) and int(arr.mean()) == 64  # alpha gone
    assert out[1]["meta"]["mime"] == "image/x-portable-pixmap"
    w, h, c, arr = decode_raster(bytes(out[2]["payload"]))
    assert (w, h, c) == (4, 4, 1) and int(arr.mean()) == 100
    assert out[2]["meta"]["mime"] == "image/x-portable-graymap"
