"""GIF codec tests — LZW is lossless, so unlike JPEG every roundtrip is
exact equality; interlacing and multi-block streams are exercised via
the in-repo writer."""

from __future__ import annotations

import numpy as np
import pytest

from etl_lealone_spark.operators.multimodal import (
    _gif_lzw_decode,
    _gif_lzw_encode,
    decode_raster,
    encode_gif,
)


def _paletted_image(h=23, w=31, colors=7, seed=5):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(colors, 3), dtype=np.uint8)
    idx = rng.integers(0, colors, size=(h, w))
    return pal[idx]


def test_gif_roundtrip_exact():
    img = _paletted_image()
    w, h, c, back = decode_raster(encode_gif(img))
    assert (w, h, c) == (31, 23, 3)
    assert np.array_equal(back, img)


def test_gif_interlaced_roundtrip_exact():
    img = _paletted_image(h=17, w=12, colors=5, seed=9)
    w, h, c, back = decode_raster(encode_gif(img, interlace=True))
    assert np.array_equal(back, img)


def test_gif_two_color_and_solid():
    # depth-1 palette exercises the min_code_size=2 floor
    img = np.where(
        (np.add.outer(np.arange(9), np.arange(14)) % 2)[..., None].astype(bool),
        np.array([255, 0, 0], dtype=np.uint8),
        np.array([0, 0, 255], dtype=np.uint8),
    )
    assert np.array_equal(decode_raster(encode_gif(img))[3], img)
    solid = np.full((5, 5, 3), 17, dtype=np.uint8)
    assert np.array_equal(decode_raster(encode_gif(solid))[3], solid)


def test_lzw_dictionary_overflow_path():
    # long low-entropy stream forces code-width growth; a random one at
    # 8-bit symbols forces dictionary resets past 4096 entries
    rng = np.random.default_rng(3)
    for stream in (
        bytes(np.tile(np.arange(4, dtype=np.uint8), 3000)),
        bytes(rng.integers(0, 256, size=20000, dtype=np.uint8)),
    ):
        min_code = 8
        enc = _gif_lzw_encode(stream, min_code)
        dec = bytes(_gif_lzw_decode(enc, min_code, len(stream)))
        assert dec == stream


def test_gif_truncated_raises():
    buf = encode_gif(_paletted_image())
    with pytest.raises(ValueError):
        decode_raster(buf[: len(buf) // 3])


def test_gif_too_many_colors_rejected():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="256"):
        encode_gif(img)
