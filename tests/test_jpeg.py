"""Baseline JPEG codec tests (pure numpy — no SparkSession needed).

Roundtrip strategy mirrors the PNG/netpbm tests: the in-repo encoder
produces spec-shaped files the in-repo decoder must read back. JPEG is
lossy, so pixel checks are PSNR thresholds except where the math is
exact (flat blocks quantize losslessly); structural checks (restart
framing, subsampled geometry, gated SOF types) are exact.
"""

from __future__ import annotations

import numpy as np
import pytest

from etl_lealone_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    quality_tables,
)


def _test_image(h, w, channels=3, seed=7):
    """Deterministic smooth gradient + low-amplitude texture — a
    natural-image stand-in (pure noise is the JPEG worst case and not
    what the corpus looks like)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 96 + 64 * np.sin(xx / 17.0) + 48 * np.cos(yy / 23.0)
    img = np.stack(
        [base + 18 * np.sin((xx + yy) / (11.0 + c)) for c in range(channels)],
        axis=-1,
    )
    img += rng.normal(0, 3.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_rgb_roundtrip_non_multiple_of_8():
    img = _test_image(41, 57)  # forces edge padding + crop
    buf = encode_jpeg(img, quality=90)
    w, h, c, back = decode_jpeg(buf)
    assert (w, h, c) == (57, 41, 3)
    assert back.shape == (41, 57, 3)
    assert _psnr(img, back) > 33.0


def test_grayscale_roundtrip():
    img = _test_image(64, 48, channels=1)
    buf = encode_jpeg(img[:, :, 0], quality=85)
    w, h, c, back = decode_jpeg(buf)
    assert (w, h, c) == (48, 64, 1)
    assert _psnr(img, back) > 33.0


def test_flat_image_roundtrips_exactly():
    # A flat block's only nonzero coefficient is DC; at quality 75 the
    # luma DC quantizer is 8 and (200-128)*8 = 576 divides exactly, so
    # grayscale decode must be bit-identical.
    img = np.full((32, 32), 200, dtype=np.uint8)
    w, h, c, back = decode_jpeg(encode_jpeg(img, quality=75))
    assert (w, h, c) == (32, 32, 1)
    assert np.array_equal(back[:, :, 0], img)


def test_quality_ladder_monotone_size_and_fidelity():
    img = _test_image(64, 64)
    sizes, psnrs = [], []
    for q in (30, 60, 90):
        buf = encode_jpeg(img, quality=q)
        _, _, _, back = decode_jpeg(buf)
        sizes.append(len(buf))
        psnrs.append(_psnr(img, back))
    assert sizes[0] < sizes[1] < sizes[2]
    assert psnrs[0] < psnrs[1] < psnrs[2]


def test_422_subsampling_roundtrip():
    # horizontal-only chroma subsampling (2,1) — the video-derived
    # layout; exercises asymmetric sampling ratios in the decoder
    img = _test_image(50, 70)
    buf = encode_jpeg(img, quality=90, sampling="4:2:2")
    w, h, c, back = decode_jpeg(buf)
    assert (w, h, c) == (70, 50, 3)
    assert _psnr(img, back) > 31.0
    # sits between 4:4:4 and 4:2:0 in size at equal quality
    assert len(buf) < len(encode_jpeg(img, quality=90, sampling="4:4:4"))
    assert len(buf) > len(encode_jpeg(img, quality=90, sampling="4:2:0"))


def test_422_progressive_roundtrip_identical_to_baseline():
    from etl_lealone_spark.operators.jpeg import encode_jpeg_progressive

    img = _test_image(41, 57)
    base = decode_jpeg(encode_jpeg(img, quality=80, sampling="4:2:2"))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, quality=80, sampling="4:2:2")
    )
    assert np.array_equal(base[3], prog[3])


def test_420_subsampling_roundtrip_and_geometry():
    img = _test_image(50, 70)  # not multiples of the 16-pixel MCU
    buf = encode_jpeg(img, quality=90, sampling="4:2:0")
    w, h, c, back = decode_jpeg(buf)
    assert (w, h, c) == (70, 50, 3)
    # chroma is box-averaged 2x2 then replicated back: luma detail must
    # survive, so the threshold is only slightly looser than 4:4:4
    assert _psnr(img, back) > 30.0
    # and 4:2:0 must actually be smaller than 4:4:4 at equal quality
    assert len(buf) < len(encode_jpeg(img, quality=90, sampling="4:4:4"))


def test_restart_markers_do_not_change_pixels():
    # Restart intervals only re-frame the entropy stream (byte-align +
    # DC predictor reset); the quantized coefficients are identical, so
    # the decoded pixels must be EXACTLY equal, not just close.
    img = _test_image(48, 64)
    plain = decode_jpeg(encode_jpeg(img, quality=75))[3]
    restarted_buf = encode_jpeg(img, quality=75, restart_interval=3)
    assert b"\xff\xd0" in restarted_buf or b"\xff\xd1" in restarted_buf
    restarted = decode_jpeg(restarted_buf)[3]
    assert np.array_equal(plain, restarted)


def test_exotic_sof_types_are_gated():
    # Lossless (SOF3) and arithmetic-coded (SOF9) remain strict gates.
    for sof in (0xC3, 0xC9):
        buf = bytearray(encode_jpeg(_test_image(16, 16), quality=75))
        idx = buf.find(b"\xff\xc0")
        assert idx > 0
        buf[idx + 1] = sof
        with pytest.raises(NotImplementedError, match="lossless|arithmetic"):
            decode_jpeg(bytes(buf))


def test_baseline_scan_under_sof2_fails_typed():
    # Flipping SOF0 -> SOF2 leaves a full-band interleaved scan, which
    # is malformed as progressive (DC scan must have Se == 0): the
    # decoder must refuse loudly, not misparse.
    buf = bytearray(encode_jpeg(_test_image(16, 16), quality=75))
    idx = buf.find(b"\xff\xc0")
    buf[idx + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(buf))


# --- progressive (SOF2): decode must match baseline bit-for-bit ------------


@pytest.mark.parametrize(
    "channels,sampling",
    [(1, "4:4:4"), (3, "4:4:4"), (3, "4:2:0")],
)
def test_progressive_roundtrip_identical_to_baseline(channels, sampling):
    """Progressive encode uses the SAME quantized coefficients as
    baseline, so decoding the progressive stream (spectral selection +
    successive approximation, libjpeg default script) must reproduce
    the baseline decode EXACTLY — any drift is a scan-accumulation bug."""
    from etl_lealone_spark.operators.jpeg import encode_jpeg_progressive

    img = _test_image(50, 70, channels=channels)
    if channels == 1:
        img = img[:, :, 0]
    base = decode_jpeg(encode_jpeg(img, quality=80, sampling=sampling))
    prog_buf = encode_jpeg_progressive(img, quality=80, sampling=sampling)
    prog = decode_jpeg(prog_buf)
    assert prog[:3] == base[:3]
    assert np.array_equal(prog[3], base[3])
    # and it really is a progressive stream with multiple scans
    assert b"\xff\xc2" in prog_buf
    assert prog_buf.count(b"\xff\xda") >= 6


def test_progressive_spectral_only_script():
    """Spectral selection without successive approximation (Ah=Al=0
    everywhere) — the EOBn-run path without refinement bits."""
    from etl_lealone_spark.operators.jpeg import encode_jpeg_progressive

    img = _test_image(41, 57)
    scans = [
        ((0, 1, 2), 0, 0, 0, 0),
        ((0,), 1, 9, 0, 0),
        ((0,), 10, 63, 0, 0),
        ((1,), 1, 63, 0, 0),
        ((2,), 1, 63, 0, 0),
    ]
    base = decode_jpeg(encode_jpeg(img, quality=75))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=75, scans=scans))
    assert np.array_equal(prog[3], base[3])


def test_progressive_deep_successive_approximation():
    """Three successive-approximation levels on the full AC band plus a
    DC refinement — exercises long EOB runs, ZRL-in-refinement, and
    correction-bit interleaving at every level."""
    from etl_lealone_spark.operators.jpeg import encode_jpeg_progressive

    img = _test_image(48, 64, channels=1)[:, :, 0]
    scans = [
        ((0,), 0, 0, 0, 2),
        ((0,), 1, 63, 0, 3),
        ((0,), 1, 63, 3, 2),
        ((0,), 0, 0, 2, 1),
        ((0,), 1, 63, 2, 1),
        ((0,), 0, 0, 1, 0),
        ((0,), 1, 63, 1, 0),
    ]
    base = decode_jpeg(encode_jpeg(img, quality=60))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=60, scans=scans))
    assert np.array_equal(prog[3], base[3])


def test_progressive_truncated_at_scan_boundary_raises():
    """A progressive payload cut at a scan boundary parses cleanly but
    is missing refinement scans — it must raise (r5 review: it used to
    return silently degraded pixels), and stripping just the EOI also
    counts as truncation."""
    from etl_lealone_spark.operators.jpeg import encode_jpeg_progressive

    buf = encode_jpeg_progressive(_test_image(24, 24), quality=70)
    # cut right before the 4th SOS
    idx = -1
    for _ in range(4):
        idx = buf.find(b"\xff\xda", idx + 1)
    assert idx > 0
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(buf[:idx])
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(buf[:-2])  # EOI stripped
    # the intact stream still decodes
    assert decode_jpeg(buf)[3] is not None


def test_progressive_truncated_and_mutated_fail_typed():
    from etl_lealone_spark.operators.jpeg import encode_jpeg_progressive

    buf = encode_jpeg_progressive(_test_image(17, 13), quality=70)
    rng = np.random.default_rng(23)
    mutants = [buf[: len(buf) // 3], buf[: len(buf) - 2]]
    for _ in range(300):
        b = bytearray(buf)
        for _ in range(rng.integers(1, 6)):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        mutants.append(bytes(b))
    for m in mutants:
        try:
            decode_jpeg(m)
        except (ValueError, NotImplementedError):
            pass  # typed failure: the contract


def test_truncated_entropy_data_raises():
    buf = encode_jpeg(_test_image(32, 32), quality=75)
    with pytest.raises(ValueError):
        decode_jpeg(buf[: len(buf) // 2])


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnope")


def test_sof_dimension_bomb_rejected_before_allocation():
    """A ~300-byte payload whose SOF declares 65500x65500 would allocate
    a ~16 GiB coefficient store if the decoder trusted the header; the
    guard must reject it with a typed ValueError BEFORE allocating
    (r4 advisor: decompression-bomb DoS, escaped as MemoryError)."""
    buf = bytearray(encode_jpeg(_test_image(16, 16), quality=75))
    idx = buf.find(b"\xff\xc0")
    assert idx > 0
    # SOF payload: len(2) prec(1) fh(2) fw(2) — patch fh/fw to 65500.
    import struct

    buf[idx + 5 : idx + 9] = struct.pack(">HH", 65500, 65500)
    with pytest.raises(ValueError, match="inconsistent with entropy"):
        decode_jpeg(bytes(buf))


def test_progressive_sampling_factor_bomb_rejected():
    """r5 review: a progressive SOF with a high-sampling-factor luma
    component plus a tiny SINGLE-component first DC scan used to pass
    the per-scan bomb guard while the all-components allocation ran to
    gigabytes. The whole-payload bound must reject it BEFORE allocating;
    out-of-spec sampling factors (>4) fail typed too."""
    import struct

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def craft(samp_luma):
        out = bytearray(b"\xff\xd8")
        out += seg(0xDB, bytes([0x00]) + bytes(64))  # all-zero quant ok for parse
        sof = struct.pack(">BHHB", 8, 20000, 20000, 3)
        sof += bytes([1, samp_luma, 0])  # luma: (samp>>4, samp&15)
        sof += bytes([2, 0x11, 0])
        sof += bytes([3, 0x11, 0])
        out += seg(0xC2, sof)
        # DC huffman table: single 1-bit code for category 0
        out += seg(0xC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([0]))
        # single-component (chroma) DC-first scan with ~64KB junk entropy
        out += seg(0xDA, bytes([1, 2, 0x00, 0, 0, 0]))
        out += b"\x55" * 65536
        out += b"\xff\xd9"
        return bytes(out)

    with pytest.raises(ValueError, match="payload size"):
        decode_jpeg(craft(0x44))  # legal 4x4 luma: amplification attack
    with pytest.raises(ValueError, match="sampling factor"):
        decode_jpeg(craft(0x55))  # 5x5: outside T.81's 1..4


def test_corrupt_dht_symbols_fail_typed_not_overflow():
    """A DHT whose value list contains symbols > 15 makes the entropy
    decoder request huge bit counts, building Python ints too large for
    the int32 coefficient store. The decode boundary must convert that
    to ValueError (r4 advisor: OverflowError escaped the typed-error
    contract)."""
    buf = bytearray(encode_jpeg(_test_image(16, 16, channels=1), quality=75))
    idx = buf.find(b"\xff\xc4")  # first DHT (DC luminance)
    assert idx > 0
    # DHT payload: len(2) tc/th(1) bits(16) vals(...) — poison the first
    # few DC category symbols with out-of-range values.
    for k in range(3):
        buf[idx + 21 + k] = 0xC8  # 200: receive(200) would be a 200-bit int
    try:
        decode_jpeg(bytes(buf))
    except (ValueError, NotImplementedError):
        pass  # typed failure: the contract
    # any other exception type propagates and fails the test


def test_quality_tables_scale():
    lum50, _ = quality_tables(50)
    lum90, _ = quality_tables(90)
    lum10, _ = quality_tables(10)
    assert np.all(lum90 <= lum50) and np.all(lum50 <= lum10)
    assert lum50.min() >= 1 and lum10.max() <= 255


# --- adversarial robustness: decoders must fail loudly, never crash -------


def test_codecs_never_crash_on_mutated_payloads():
    """Bit-flip / truncate / splice valid payloads of every format:
    decode must either succeed or raise ValueError/NotImplementedError —
    any other exception is a parser bug. (Deterministic mutation sweep;
    hypothesis-style but reproducible by construction.)"""
    from etl_lealone_spark.operators.multimodal import (
        decode_raster,
        encode_avi_mjpeg,
        encode_gif,
        encode_png,
        encode_ppm,
        encode_wav,
        _parse_avi_mjpeg,
        _parse_wav,
    )

    from etl_lealone_spark.operators.jpeg import encode_jpeg_progressive

    img = _test_image(17, 13)
    img16 = (img.astype(np.uint16) << 8) | 0x5A
    seeds = {
        "jpeg": encode_jpeg(img, quality=70),
        "jpeg_prog": encode_jpeg_progressive(img, quality=70),
        "png": encode_png(img),
        "png_adam7": encode_png(img, interlace=True),
        "png16": encode_png(img16, depth=16),
        "gif": encode_gif((img // 64) * 64),
        "ppm": encode_ppm(img),
        "wav": encode_wav(np.linspace(-0.5, 0.5, 300)[:, None], 8000),
        "wav_ulaw": encode_wav(
            np.linspace(-0.5, 0.5, 300)[:, None], 8000, companding="ulaw"
        ),
        "wav_alaw": encode_wav(
            np.linspace(-0.5, 0.5, 300)[:, None], 8000, companding="alaw"
        ),
        "avi": encode_avi_mjpeg([encode_jpeg(img, quality=70)] * 3, fps=5),
    }
    decoders = {
        "wav": _parse_wav,
        "wav_ulaw": _parse_wav,
        "wav_alaw": _parse_wav,
        "avi": _parse_avi_mjpeg,
    }
    rng = np.random.default_rng(11)
    for kind, buf in seeds.items():
        decoder = decoders.get(kind, decode_raster)
        mutants = [buf[:k] for k in (0, 3, 9, len(buf) // 2, len(buf) - 1)]
        # 400 random 1-6-byte mutations per format: the r4 advisor
        # reproduced an OverflowError escape at ~34/2000 mutants, which a
        # 40-mutant sweep missed by luck — the count is sized so that
        # failure class cannot slip through again.
        for _ in range(400):
            b = bytearray(buf)
            for _ in range(rng.integers(1, 6)):
                b[rng.integers(0, len(b))] = rng.integers(0, 256)
            mutants.append(bytes(b))
        mutants.append(buf + buf[:7])
        for m in mutants:
            try:
                decoder(m)
            except (ValueError, NotImplementedError):
                pass  # loud, typed failure: the contract
