"""Core operator tests: recursive CTE, multimodal plumbing, session shell."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_lealone_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    synthesize_media_table,
)
from etl_lealone_spark.operators.recursive import recursive_cte
from etl_lealone_spark.session import EngineSession


def test_recursive_series(spark):
    base = spark.range(1, 2).select(F.col("id").cast("int").alias("n"))
    out = recursive_cte(
        base, lambda d: d.filter(F.col("n") < 10).select((F.col("n") + 1).alias("n"))
    )
    vals = sorted(r["n"] for r in out.collect())
    assert vals == list(range(1, 11))


def test_recursive_distinct_terminates_on_cycle(spark):
    # graph with a cycle: 1→2→3→1; UNION (distinct) semantics must terminate
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src int, dst int")
    base = spark.createDataFrame([(1,)], "node int")
    out = recursive_cte(
        base,
        lambda d: d.join(edges, d.node == edges.src).select(
            F.col("dst").alias("node")
        ),
        distinct=True,
        max_iterations=10,
    )
    assert sorted(r["node"] for r in out.collect()) == [1, 2, 3]


def test_recursive_hits_iteration_cap(spark):
    base = spark.range(1, 2).select(F.col("id").alias("n"))
    with pytest.raises(RuntimeError, match="fixpoint"):
        recursive_cte(base, lambda d: d.select((F.col("n") + 1).alias("n")), max_iterations=5)


def test_multimodal_pipeline(tables):
    media = synthesize_media_table(tables["documents"].limit(20))
    assert media.schema["payload"].dataType.typeName() == "binary"
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r["features"]) == 8 for r in rows)


def test_multimodal_strict_raises(tables):
    media = synthesize_media_table(tables["documents"].limit(2))
    with pytest.raises(Exception):  # NotImplementedError surfaces via Py4J
        extract_features(media, strict=True).collect()


def test_multimodal_resize(tables):
    from etl_lealone_spark.operators.multimodal import resize

    media = synthesize_media_table(tables["documents"].limit(10))
    out = resize(media, width=64, height=64)
    rows = out.collect()
    assert len(rows) == 10
    target = 64 * 64 // 64
    assert all(len(r["payload"]) == target for r in rows)
    assert all(
        r["meta"]["width"] == 64 and r["meta"]["height"] == 64 for r in rows
    )
    # schema is unchanged → resize composes with extract_features
    feats = extract_features(resize(media, width=64, height=64))
    assert feats.count() == 10


def test_frame_sample(tables):
    media = synthesize_media_table(tables["documents"].limit(5))
    frames = frame_sample(media)
    assert frames.count() == 5  # null duration → 1 frame each


def test_engine_session_shell(spark):
    es = EngineSession(spark)
    es.set_setting("MAX_MEMORY_ROWS", 10000)
    assert es.get_setting("max_memory_rows") == 10000

    es.set_variable("@x", 42)
    assert es.get_variable("x") == 42

    seq = es.create_sequence("s1", start=10, increment=2)
    assert seq.next_value() == 10 and seq.next_value() == 12
    first, inc = seq.next_block(100)
    assert first == 14 and inc == 2
    assert seq.next_value() == 14 + 200

    es.prepare("q1", "SELECT 1 AS one")
    assert es.execute_prepared("q1").collect()[0]["one"] == 1


# ---------------------------------------------------------------------------
# REAL raster decode/resize (netpbm + 24-bit BMP — no codec libs needed)
# ---------------------------------------------------------------------------
def _ppm_gradient(w, h):
    import numpy as np

    arr = np.zeros((h, w, 3), dtype=np.uint8)
    arr[:, :, 0] = np.arange(w, dtype=np.uint8)[None, :]          # R = x
    arr[:, :, 1] = np.arange(h, dtype=np.uint8)[:, None]          # G = y
    arr[:, :, 2] = 7
    return arr


def _bmp24_bytes(arr):
    """Minimal uncompressed bottom-up 24-bit BMP writer."""
    import struct

    import numpy as np

    h, w, _ = arr.shape
    row_bytes = (w * 3 + 3) & ~3
    raster = np.zeros((h, row_bytes), dtype=np.uint8)
    bgr = arr[:, :, ::-1]                    # RGB -> BGR
    raster[:, : w * 3] = bgr.reshape(h, -1)
    raster = raster[::-1]                    # bottom-up
    data = raster.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0)
    return header + info + data


def test_netpbm_roundtrip_and_stats(spark):
    import numpy as np

    from etl_lealone_spark.operators.multimodal import (
        decode_raster,
        encode_ppm,
        image_stats_features,
    )

    arr = _ppm_gradient(16, 8)
    buf = encode_ppm(arr)
    w, h, c, back = decode_raster(buf)
    assert (w, h, c) == (16, 8, 3)
    assert np.array_equal(back, arr)

    media = spark.createDataFrame(
        [(1, bytearray(buf), ("image", "image/x-portable-pixmap", 16, 8, None))],
        "media_id long, payload binary, "
        "meta struct<modality:string,mime:string,width:int,height:int,duration_ms:bigint>",
    )
    r = image_stats_features(media).collect()[0]
    assert (r["width"], r["height"], r["channels"]) == (16, 8, 3)
    assert r["mean"][0] == round(float(np.arange(16).mean()), 6)  # R = x ramp
    assert r["mean"][2] == 7.0                                    # constant B


def test_bmp24_decode_matches_source(spark):
    import numpy as np

    from etl_lealone_spark.operators.multimodal import decode_raster

    arr = _ppm_gradient(5, 3)  # odd width exercises row padding
    w, h, c, back = decode_raster(_bmp24_bytes(arr))
    assert (w, h, c) == (5, 3, 3)
    assert np.array_equal(back, arr)


def test_resize_nearest_real(spark):
    import numpy as np

    from etl_lealone_spark.operators.multimodal import (
        decode_raster,
        encode_ppm,
        resize_nearest,
    )

    arr = _ppm_gradient(16, 8)
    media = spark.createDataFrame(
        [(9, bytearray(encode_ppm(arr)), ("image", "image/x-portable-pixmap", 16, 8, None))],
        "media_id long, payload binary, "
        "meta struct<modality:string,mime:string,width:int,height:int,duration_ms:bigint>",
    )
    out = resize_nearest(media, width=8, height=4).collect()[0]
    assert out["meta"]["width"] == 8 and out["meta"]["height"] == 4
    w, h, c, small = decode_raster(bytes(out["payload"]))
    assert (w, h, c) == (8, 4, 3)
    # nearest-neighbor: pixel (y, x) comes from (y*8//4... source mapping)
    assert np.array_equal(small, arr[::2, ::2])


def test_decode_raster_rejects_unknown(spark):
    import pytest

    from etl_lealone_spark.operators.multimodal import decode_raster

    with pytest.raises(NotImplementedError):
        decode_raster(b"\x00\x01unknown-magic....")  # no codec for this


def test_decode_raster_dispatches_jpeg(spark):
    import numpy as np

    from etl_lealone_spark.operators.jpeg import encode_jpeg
    from etl_lealone_spark.operators.multimodal import decode_raster

    arr = np.full((24, 16, 3), 200, dtype=np.uint8)
    w, h, c, back = decode_raster(encode_jpeg(arr, quality=90))
    assert (w, h, c) == (16, 24, 3)
    # flat color survives the DCT near-exactly (only DC, exact quantize)
    assert int(np.abs(back.astype(int) - 200).max()) <= 2


def test_image_stats_features_on_jpeg_payloads(spark):
    import numpy as np

    from etl_lealone_spark.operators.jpeg import encode_jpeg
    from etl_lealone_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_stats_features,
    )

    imgs = {
        11: np.full((16, 16, 3), 64, dtype=np.uint8),
        12: np.full((8, 24), 200, dtype=np.uint8),  # grayscale
    }
    rows = [
        (
            mid,
            bytearray(encode_jpeg(a, quality=90)),
            ("image", "image/jpeg", a.shape[1], a.shape[0], None),
        )
        for mid, a in imgs.items()
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in image_stats_features(media).collect()}
    assert got[11]["width"] == 16 and got[11]["channels"] == 3
    assert got[12]["width"] == 24 and got[12]["channels"] == 1
    assert abs(got[11]["mean"][0] - 64.0) < 2.5
    assert abs(got[12]["mean"][0] - 200.0) < 2.5


# ---------------------------------------------------------------------------
# REAL PNG decode (stdlib zlib + numpy unfiltering; PNG spec is public)
# ---------------------------------------------------------------------------
def _png_with_filters(arr, filters):
    """Encode HxWxC uint8 as a PNG using the given per-row filter types
    (forward-filtering per the spec) — exercises the decoder's
    unfiltering paths, which the filter-0-only encode_png cannot."""
    import struct
    import zlib

    import numpy as np

    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bpp = c
    flat = arr.reshape(h, w * c).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        line = flat[y]
        f = filters[y % len(filters)]
        raw.append(f)
        for x in range(w * c):
            a = int(line[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            cc = int(prev[x - bpp]) if x >= bpp else 0
            if f == 0:
                v = line[x]
            elif f == 1:
                v = line[x] - a
            elif f == 2:
                v = line[x] - b
            elif f == 3:
                v = line[x] - ((a + b) >> 1)
            else:  # paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                v = line[x] - pred
            raw.append(v & 0xFF)
        prev = line

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_all_color_types(spark):
    import numpy as np

    from etl_lealone_spark.operators.multimodal import decode_raster, encode_png

    rng = np.random.default_rng(7)
    for c in (1, 2, 3, 4):
        arr = rng.integers(0, 256, size=(9, 13, c), dtype=np.uint8)
        w, h, ch, back = decode_raster(encode_png(arr))
        assert (w, h, ch) == (13, 9, c)
        assert np.array_equal(back, arr)


def test_png_unfiltering_every_filter_type(spark):
    import numpy as np

    from etl_lealone_spark.operators.multimodal import decode_raster

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        w, h, c, back = decode_raster(_png_with_filters(arr, filters))
        assert (w, h, c) == (7, 10, 3), filters
        assert np.array_equal(back, arr), f"filters {filters}"


def test_png_palette_expands_to_rgb(spark):
    import struct
    import zlib

    import numpy as np

    from etl_lealone_spark.operators.multimodal import decode_raster

    # 2x3 palette image: indices 0..5 into a 6-color palette
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9], [1, 2, 3], [250, 40, 7]],
        dtype=np.uint8,
    )
    idx = np.array([[0, 1, 2], [3, 4, 5]], dtype=np.uint8)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)  # color type 3
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    buf = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w, h, c, back = decode_raster(buf)
    assert (w, h, c) == (3, 2, 3)
    assert np.array_equal(back, palette[idx])


def test_png_gates_16bit_and_interlaced(spark):
    import struct
    import zlib

    import pytest

    from etl_lealone_spark.operators.multimodal import decode_raster

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    # sub-8-bit is now a supported decode; spec-invalid depths and
    # depth/color combinations fail typed instead
    ihdr = struct.pack(">IIBBBBB", 2, 2, 3, 0, 0, 0, 0)  # depth 3: not in spec
    buf = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="invalid PNG bit depth"):
        decode_raster(buf)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)  # 4-bit RGB: invalid
    buf = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="gray/palette"):
        decode_raster(buf)
    # truncated sub-8-bit stream fails typed
    ihdr = struct.pack(">IIBBBBB", 2, 2, 4, 0, 0, 0, 0)
    buf = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="length mismatch"):
        decode_raster(buf)
    # truncated 16-bit stream fails typed
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    buf = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="length mismatch"):
        decode_raster(buf)
    # truncated Adam7 stream (now a SUPPORTED format) fails typed
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    buf = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlaced pass"):
        decode_raster(buf)


def test_png_16bit_decodes_high_byte(spark):
    """16-bit big-endian samples downconvert to their high byte; the
    encoder writes real deep samples so the low bytes genuinely differ
    from the high bytes (catching an endianness mixup), in both plain
    and Adam7 layouts."""
    import numpy as np

    from etl_lealone_spark.operators.multimodal import decode_raster, encode_png

    rng = np.random.default_rng(37)
    for c in (1, 3, 4):
        arr16 = rng.integers(0, 65536, (11, 7, c), dtype=np.uint16)
        for interlace in (False, True):
            w, h, dc, back = decode_raster(
                encode_png(arr16, interlace=interlace, depth=16)
            )
            assert (w, h, dc) == (7, 11, c)
            assert np.array_equal(back, (arr16 >> 8).astype(np.uint8))


def test_png_sub8bit_decode(spark):
    """1/2/4-bit PNG (gray and palette, plain and Adam7): bit-unpacking
    is MSB-first with zero-padded row tails, gray codes rescale so the
    max code is exactly 255, palette indices look up PLTE. Odd widths
    exercise the byte-boundary padding; 2x2 images exercise mostly-empty
    Adam7 passes."""
    import numpy as np
    import pytest

    from etl_lealone_spark.operators.multimodal import decode_raster, encode_png

    rng = np.random.default_rng(59)
    scale = {1: 255, 2: 85, 4: 17}
    for depth in (1, 2, 4):
        for h, w in [(5, 7), (2, 2), (9, 16), (3, 1)]:
            idx = rng.integers(0, 1 << depth, (h, w, 1), dtype=np.uint8)
            # gray: value k decodes to k * (255 // (2^depth - 1))
            dw, dh, dc, back = decode_raster(encode_png(idx, depth=depth))
            assert (dw, dh, dc) == (w, h, 1)
            assert np.array_equal(back, idx * np.uint8(scale[depth]))
            # Adam7 variant decodes identically
            dw, dh, dc, back7 = decode_raster(
                encode_png(idx, depth=depth, interlace=True)
            )
            assert np.array_equal(back7, back)
            # palette: indices expand through PLTE to RGB
            palette = rng.integers(0, 256, (1 << depth, 3), dtype=np.uint8)
            dw, dh, dc, backp = decode_raster(
                encode_png(idx, depth=depth, palette=palette)
            )
            assert (dw, dh, dc) == (w, h, 3)
            assert np.array_equal(backp, palette[idx.reshape(h, w)])
    # out-of-range palette index fails typed
    palette = np.zeros((2, 3), dtype=np.uint8)  # depth-2 image, 2-entry PLTE
    idx = np.full((2, 2, 1), 3, dtype=np.uint8)
    with pytest.raises(ValueError, match="palette index out of range"):
        decode_raster(encode_png(idx, depth=2, palette=palette))


def test_wav_g711_companding_roundtrip(spark):
    """G.711 mu-law / A-law WAV decode: encode->decode->re-encode is
    code-identical for every reachable code (companding is bijective on
    the code space; mu-law's two zero codes both decode to 0), and the
    decoded signal matches the source within the companding error."""
    import numpy as np

    from etl_lealone_spark.operators.multimodal import (
        _ALAW_DECODE_LUT,
        _ULAW_DECODE_LUT,
        _linear_to_alaw,
        _linear_to_ulaw,
        _parse_wav,
        encode_wav,
    )

    t = np.linspace(0, 1, 800)
    sig = (0.6 * np.sin(2 * np.pi * 13 * t))[:, None]
    for comp in ("ulaw", "alaw"):
        buf = encode_wav(sig, 8000, companding=comp)
        rate, ch, back = _parse_wav(buf)
        assert (rate, ch) == (8000, 1)
        assert back.shape == sig.shape
        # companding SNR: coarse, but the waveform must track closely
        err = float(np.abs(back - sig).max())
        assert err < 0.05, err
    # bijectivity over the code space (modulo mu-law's +0/-0 pair)
    codes = np.arange(256, dtype=np.uint8)
    u_lin = np.round(_ULAW_DECODE_LUT[codes] * 32768).astype(np.int64)
    a_lin = np.round(_ALAW_DECODE_LUT[codes] * 32768).astype(np.int64)
    u_back = _linear_to_ulaw(u_lin)
    assert all(b == c or (c == 0x7F and b == 0xFF) for c, b in zip(codes, u_back))
    assert np.array_equal(_linear_to_alaw(a_lin), codes)


def test_png_adam7_interlaced_roundtrip(spark):
    """Adam7 encode -> decode must reproduce the array exactly for every
    color type, including sizes where late passes dominate (odd dims)
    and tiny images where most passes are EMPTY."""
    import numpy as np

    from etl_lealone_spark.operators.multimodal import decode_raster, encode_png

    rng = np.random.default_rng(31)
    for h, w, c in [(13, 17, 3), (8, 8, 1), (21, 5, 4), (3, 3, 2), (1, 9, 3), (2, 2, 1)]:
        arr = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        dw, dh, dc, back = decode_raster(encode_png(arr, interlace=True))
        assert (dw, dh) == (w, h)
        if c == 2:  # gray+alpha keeps 2 channels
            assert dc == 2 and np.array_equal(back, arr)
        elif c in (1, 3, 4):
            assert dc == c and np.array_equal(back, arr)
    # interlaced and plain encodes of the same array decode identically
    arr = rng.integers(0, 256, (19, 23, 3), dtype=np.uint8)
    plain = decode_raster(encode_png(arr))
    inter = decode_raster(encode_png(arr, interlace=True))
    assert np.array_equal(plain[3], inter[3])


def test_png_through_image_stats_and_resize(spark):
    import numpy as np

    from etl_lealone_spark.operators.multimodal import (
        decode_raster,
        encode_png,
        image_stats_features,
        resize_nearest,
    )

    arr = _ppm_gradient(16, 8)
    media = spark.createDataFrame(
        [(4, bytearray(encode_png(arr)), ("image", "image/png", 16, 8, None))],
        "media_id long, payload binary, "
        "meta struct<modality:string,mime:string,width:int,height:int,duration_ms:bigint>",
    )
    r = image_stats_features(media).collect()[0]
    assert (r["width"], r["height"], r["channels"]) == (16, 8, 3)
    assert r["mean"][2] == 7.0
    out = resize_nearest(media, width=8, height=4).collect()[0]
    w, h, c, small = decode_raster(bytes(out["payload"]))
    assert np.array_equal(small, arr[::2, ::2])
