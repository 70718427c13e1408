"""Baseline JPEG (ITU-T T.81) codec in numpy + stdlib — no codec libs.

Round-3 verdict flagged compressed-image decode as the remaining
multimodal gap: a real corpus is overwhelmingly JPEG/PNG, and PNG
landed via zlib+numpy. This module closes the JPEG half with a
from-spec implementation of the BASELINE SEQUENTIAL process (the
format of essentially every training-corpus JPEG):

- ``decode_jpeg(buf)``: baseline DCT, 8-bit, 1-4 components, any
  integer-ratio sampling factors (4:4:4 / 4:2:2 / 4:2:0 / ...),
  restart markers (DRI/RSTn), multiple DQT/DHT segments, AND
  PROGRESSIVE (SOF2) per T.81 Annex G — spectral selection +
  successive approximation, interleaved DC scans, non-interleaved AC
  scans with EOBn runs and refinement correction bits (the scan
  scripts libjpeg emits for ~10% of web JPEGs). The remaining exotic
  SOF types (hierarchical, lossless, arithmetic-coded) raise
  NotImplementedError — the same strict-gate policy as sub-8-bit PNG.
- ``encode_jpeg(arr, quality, sampling, restart_interval)``: the
  matching baseline encoder (Annex K quantization + huffman tables,
  libjpeg quality scaling) so roundtrips are testable hermetically.
  Grayscale and RGB; 4:4:4, 4:2:2 or 4:2:0.
- ``encode_jpeg_progressive(arr, quality, scans=...)``: progressive
  encoder driven by an explicit (components, Ss, Se, Ah, Al) scan
  script, so the decoder's spectral-selection AND
  successive-approximation paths roundtrip hermetically against the
  SAME quantized coefficients the baseline encoder produces.

Everything here is public knowledge: the T.81 spec defines the
marker grammar, zigzag order, huffman canonical-code construction,
EXTEND, and the Annex K tables; the quality→table scaling is the
scheme libjpeg documents. Reference parity note: the reference engine
(sevenfang/etl-Lealone) has no media codecs at all — BLOBs are opaque
(lealone-db ValueBlob) — so this whole surface is an extension for
the multimodal-pipeline requirement, not a port.

Scale shape: decode runs inside mapInPandas per document (see
multimodal.image_stats_features) — embarrassingly parallel, no
shuffle. The entropy decode is per-image sequential by nature (bit
stream), the DCT/color math is vectorized across all blocks of an
image at once.
"""

from __future__ import annotations

import struct

import numpy as np

# --- spec constants ---------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K quantization tables (luminance, chrominance), natural order.
QUANT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K huffman tables as (bits[1..16], values). bits[i] = number of
# codes of length i+1; canonical code assignment per the spec.
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Orthonormal 8-point DCT-II basis: forward S = D s D^T, inverse
# s = D^T S D — exactly the T.81 FDCT/IDCT definition.
_x = np.arange(8)
DCT_D = np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16) / 2.0
DCT_D[0] /= np.sqrt(2)
del _x


def quality_tables(quality: int = 75):
    """(lum, chroma) int64 quant tables at the given quality, natural
    order — the libjpeg scaling of the Annex K bases."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    lum = np.clip((QUANT_LUM * scale + 50) // 100, 1, 255)
    chroma = np.clip((QUANT_CHROMA * scale + 50) // 100, 1, 255)
    return lum, chroma


def _huff_encode_table(bits, vals):
    """symbol -> (code, length) with canonical code assignment."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits, vals):
    """(length, code) -> symbol."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


# --- color ------------------------------------------------------------------


def _rgb_to_ycbcr(arr):
    """HxWx3 uint8 -> 3 float64 planes, JFIF full-range."""
    r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _ycbcr_to_rgb(y, cb, cr):
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


# --- block helpers ----------------------------------------------------------


def _pad_to(plane, mult_y: int, mult_x: int):
    """Edge-replicate so both dims are multiples of the block size."""
    h, w = plane.shape
    py = (-h) % mult_y
    px = (-w) % mult_x
    if py or px:
        plane = np.pad(plane, ((0, py), (0, px)), mode="edge")
    return plane


def _to_blocks(plane):
    """(H, W) float -> (H//8 * W//8, 8, 8) in raster block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _from_blocks(blocks, h: int, w: int):
    return (
        blocks.reshape(h // 8, w // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(h, w)
    )


def _fdct_quant(plane, qtable):
    """All-blocks forward DCT + quantization -> (n_blocks, 64) int32 in
    ZIGZAG order. Symmetric round-half-away (sign * floor(|x|/q + .5))."""
    blocks = _to_blocks(plane.astype(np.float64) - 128.0)
    coeffs = np.einsum("ux,nxy,vy->nuv", DCT_D, blocks, DCT_D)
    flat = coeffs.reshape(-1, 64)[:, ZIGZAG]
    q = qtable[ZIGZAG].astype(np.float64)
    return (np.sign(flat) * np.floor(np.abs(flat) / q + 0.5)).astype(np.int32)


def _dequant_idct(zz, qtable, h: int, w: int):
    """(n_blocks, 64) int zigzag coeffs -> (h, w) float pixel plane."""
    flat = (zz.astype(np.float64) * qtable[ZIGZAG])[:, UNZIGZAG]
    blocks = np.einsum(
        "xu,nuv,yv->nxy", DCT_D.T, flat.reshape(-1, 8, 8), DCT_D.T
    )
    return _from_blocks(blocks + 128.0, h, w)


# --- bit I/O ----------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def byte_align(self):
        if self.nbits:
            self.put((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # pad 1s


class _BitReader:
    """Reads an entropy segment (stuffing already removed)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if not self.nbits:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data truncated")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def decode(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t received bits to a signed magnitude."""
    if t == 0:
        return 0
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# --- encoder ----------------------------------------------------------------


def _prepare_frame(arr, quality: int, sampling: str):
    """Shared encoder front half: color transform, subsample, pad,
    DCT+quantize. Returns (h, w, nc, samps, qsel, lum_q, chroma_q,
    comp_zz, mcus_x, mcus_y, hmax, vmax)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg supports 1 or 3 channels")
    if sampling not in ("4:4:4", "4:2:2", "4:2:0"):
        raise ValueError("sampling must be 4:4:4, 4:2:2 or 4:2:0")
    lum_q, chroma_q = quality_tables(quality)

    if nc == 1:
        planes = [arr[:, :, 0].astype(np.float64)]
        samps = [(1, 1)]
        qsel = [0]
    else:
        y, cb, cr = _rgb_to_ycbcr(arr)
        if sampling == "4:2:0":
            # 2x2 box-average chroma downsample (pad to even first)
            def down(p):
                p = _pad_to(p, 2, 2)
                return (
                    p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(
                        axis=(1, 3)
                    )
                )

            planes = [y, down(cb), down(cr)]
            samps = [(2, 2), (1, 1), (1, 1)]
        elif sampling == "4:2:2":
            # horizontal-only 1x2 box-average (the video-derived layout)
            def down_h(p):
                p = _pad_to(p, 1, 2)
                return p.reshape(p.shape[0], p.shape[1] // 2, 2).mean(axis=2)

            planes = [y, down_h(cb), down_h(cr)]
            samps = [(2, 1), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samps = [(1, 1), (1, 1), (1, 1)]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # Per component: pad plane to its MCU grid, DCT+quantize every block.
    comp_zz = []  # (blocks_per_row, zigzag coeff matrix)
    for plane, (sh, sv), qi in zip(planes, samps, qsel):
        target_h = mcus_y * sv * 8
        target_w = mcus_x * sh * 8
        plane = _pad_to(plane, target_h, target_w)[:target_h, :target_w]
        q = lum_q if qi == 0 else chroma_q
        comp_zz.append((target_w // 8, _fdct_quant(plane, q)))
    return (
        h, w, nc, samps, qsel, lum_q, chroma_q, comp_zz,
        mcus_x, mcus_y, hmax, vmax,
    )


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _frame_headers(
    sof_marker: int, h, w, nc, samps, qsel, lum_q, chroma_q
) -> bytearray:
    """SOI + APP0 + DQT(s) + SOF — shared by both encoders."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(lum_q[ZIGZAG].astype(np.uint8)))
    if nc == 3:
        out += _seg(
            0xDB, bytes([0x01]) + bytes(chroma_q[ZIGZAG].astype(np.uint8))
        )
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci, (sh, sv) in enumerate(samps):
        sof += bytes([ci + 1, (sh << 4) | sv, qsel[ci]])
    out += _seg(sof_marker, sof)
    return out


def encode_jpeg(
    arr,
    quality: int = 75,
    sampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """HxWx1 (grayscale) or HxWx3 (RGB) uint8 -> baseline JFIF bytes.

    ``sampling`` is '4:4:4', '4:2:2' or '4:2:0' (color only). ``restart_interval``
    > 0 emits DRI + RSTn markers every that-many MCUs (what real encoders
    do for error resilience; exercises the decoder's restart path)."""
    (
        h, w, nc, samps, qsel, lum_q, chroma_q, comp_zz,
        mcus_x, mcus_y, hmax, vmax,
    ) = _prepare_frame(arr, quality, sampling)

    dc_tabs = [
        _huff_encode_table(DC_LUM_BITS, DC_LUM_VALS),
        _huff_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    ac_tabs = [
        _huff_encode_table(AC_LUM_BITS, AC_LUM_VALS),
        _huff_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]

    wr = _BitWriter()
    pred = [0] * nc
    mcu_count = 0
    rst_idx = 0

    def put_block(zz_row, ci):
        ti = 0 if ci == 0 or nc == 1 else 1
        dct, act = dc_tabs[ti], ac_tabs[ti]
        diff = int(zz_row[0]) - pred[ci]
        pred[ci] = int(zz_row[0])
        t = _category(diff)
        code, length = dct[t]
        wr.put(code, length)
        if t:
            wr.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        last_nz = np.nonzero(zz_row[1:])[0]
        last = int(last_nz[-1]) + 1 if last_nz.size else 0
        for k in range(1, last + 1):
            v = int(zz_row[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = act[0xF0]
                wr.put(code, length)
                run -= 16
            s = _category(v)
            code, length = act[(run << 4) | s]
            wr.put(code, length)
            wr.put(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            code, length = act[0x00]  # EOB
            wr.put(code, length)

    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wr.byte_align()
                wr.out.extend(bytes([0xFF, 0xD0 + rst_idx]))
                rst_idx = (rst_idx + 1) % 8
                for i in range(len(pred)):
                    pred[i] = 0
            for ci, (sh, sv) in enumerate(samps):
                bpr, zz = comp_zz[ci]
                for by in range(sv):
                    for bx in range(sh):
                        idx = (my * sv + by) * bpr + (mx * sh + bx)
                        put_block(zz[idx], ci)
            mcu_count += 1
    wr.byte_align()

    # --- headers ---
    out = _frame_headers(0xC0, h, w, nc, samps, qsel, lum_q, chroma_q)
    for tc, (bits, vals) in enumerate(
        [(DC_LUM_BITS, DC_LUM_VALS), (AC_LUM_BITS, AC_LUM_VALS)]
    ):
        out += _seg(0xC4, bytes([tc << 4]) + bytes(bits) + bytes(vals))
    if nc == 3:
        for tc, (bits, vals) in enumerate(
            [(DC_CHROMA_BITS, DC_CHROMA_VALS), (AC_CHROMA_BITS, AC_CHROMA_VALS)]
        ):
            out += _seg(0xC4, bytes([(tc << 4) | 1]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        ti = 0 if ci == 0 or nc == 1 else 1
        sos += bytes([ci + 1, (ti << 4) | ti])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += wr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- progressive encoder (T.81 Annex G) -------------------------------------

# libjpeg's default progressive scan script (jcparam.c — public source):
# DC of all components at Al=1, luma AC 1-5 at Al=2, chroma AC full band
# at Al=1, luma AC 6-63 at Al=2, luma refinement to Al=1, DC refinement,
# chroma + luma AC refinements to Al=0.
DEFAULT_SCANS_COLOR = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
]
DEFAULT_SCANS_GRAY = [
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
]


class _SymbolRun:
    """One encoding pass over a scan. With ``collect=True`` it only
    tallies the huffman symbols (so a minimal DHT can be emitted); with
    a real table it writes codes + raw bits into the _BitWriter."""

    def __init__(self, wr: _BitWriter | None, table: dict | None):
        self.wr = wr
        self.table = table
        self.symbols: list[int] = []

    def sym(self, s: int):
        if self.table is None:
            self.symbols.append(s)
        else:
            code, length = self.table[s]
            self.wr.put(code, length)

    def bits(self, v: int, n: int):
        if n and self.table is not None:
            self.wr.put(v, n)


def _flat_huff_spec(symbols):
    """(bits, vals) for a spec-valid table containing exactly the used
    symbols, all at one code length L with 2^L > |vals| (canonical codes
    then never reach the forbidden all-ones code). Compression is
    deliberately not the point — decode-path coverage is."""
    vals = sorted(set(symbols))
    if not vals:
        vals = [0x00]
    length = max(2, len(vals).bit_length())
    while (1 << length) <= len(vals):
        length += 1
    bits = [0] * 16
    bits[length - 1] = len(vals)
    return bits, vals


def _enc_dc_scan(run: _SymbolRun, blocks, al: int, first: bool, preds):
    """blocks yields (ci, zz_row); DC point transform is an arithmetic
    right shift (T.81 G.1.2.1)."""
    for ci, row in blocks:
        v = int(row[0]) >> al
        if first:
            diff = v - preds[ci]
            preds[ci] = v
            t = _category(diff)
            run.sym(t)
            if t:
                run.bits(diff if diff >= 0 else diff + (1 << t) - 1, t)
        else:
            run.bits(v & 1, 1)


def _enc_ac_first(run: _SymbolRun, rows, ss: int, se: int, al: int):
    """Initial AC scan with EOBn run accumulation (G.1.2.2); AC point
    transform truncates toward zero."""
    eobrun = 0

    def flush():
        nonlocal eobrun
        if eobrun > 0:
            nb = eobrun.bit_length() - 1
            run.sym(nb << 4)
            if nb:
                run.bits(eobrun - (1 << nb), nb)
            eobrun = 0

    for row in rows:
        vals = []
        for k in range(ss, se + 1):
            v = int(row[k])
            vals.append(v >> al if v >= 0 else -((-v) >> al))
        last = -1
        for i, v in enumerate(vals):
            if v:
                last = i
        if last < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        r = 0
        for i in range(last + 1):
            v = vals[i]
            if v == 0:
                r += 1
                continue
            while r > 15:
                run.sym(0xF0)
                r -= 16
            s = _category(v)
            run.sym((r << 4) | s)
            run.bits(v if v >= 0 else v + (1 << s) - 1, s)
            r = 0
        if last < len(vals) - 1:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()


def _enc_ac_refine(run: _SymbolRun, rows, ss: int, se: int, al: int):
    """AC successive-approximation refinement (G.1.2.3): newly
    significant coefficients carry a sign bit; already-nonzero history
    coefficients contribute interleaved correction bits; trailing
    corrections ride with the next EOBn."""
    eobrun = 0
    pending: list[int] = []  # correction bits deferred with the EOB run

    def flush():
        nonlocal eobrun, pending
        if eobrun > 0:
            nb = eobrun.bit_length() - 1
            run.sym(nb << 4)
            if nb:
                run.bits(eobrun - (1 << nb), nb)
            for b in pending:
                run.bits(b, 1)
            eobrun = 0
            pending = []

    for row in rows:
        coefs = [int(row[k]) for k in range(ss, se + 1)]
        absv = [abs(c) >> al for c in coefs]
        eob_i = -1
        for i, a in enumerate(absv):
            if a == 1:
                eob_i = i
        r = 0
        br: list[int] = []
        for i, a in enumerate(absv):
            if a == 0:
                r += 1
                continue
            while r > 15 and i <= eob_i:
                flush()
                run.sym(0xF0)
                for b in br:
                    run.bits(b, 1)
                br = []
                r -= 16
            if a > 1:  # history coefficient: correction bit only
                br.append(a & 1)
                continue
            # newly significant (|coef| >> al == 1)
            flush()
            run.sym((r << 4) | 1)
            run.bits(1 if coefs[i] >= 0 else 0, 1)
            for b in br:
                run.bits(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == 0x7FFF:
                flush()
    flush()


def encode_jpeg_progressive(
    arr,
    quality: int = 75,
    sampling: str = "4:4:4",
    scans: list | None = None,
) -> bytes:
    """HxWx1 / HxWx3 uint8 -> progressive (SOF2) JFIF bytes.

    ``scans`` is a list of ``(component_indices, Ss, Se, Ah, Al)``
    tuples (the libjpeg scan-script shape); default is libjpeg's
    standard progressive script. Quantized coefficients are IDENTICAL
    to :func:`encode_jpeg` at the same quality/sampling, so a
    progressive decode must reproduce the baseline decode bit-for-bit
    — the hermetic roundtrip the tests pin."""
    (
        h, w, nc, samps, qsel, lum_q, chroma_q, comp_zz,
        mcus_x, mcus_y, hmax, vmax,
    ) = _prepare_frame(arr, quality, sampling)
    if scans is None:
        scans = DEFAULT_SCANS_COLOR if nc == 3 else DEFAULT_SCANS_GRAY

    out = _frame_headers(0xC2, h, w, nc, samps, qsel, lum_q, chroma_q)

    def scan_blocks(comp_ids, interleaved):
        if interleaved:
            for m in range(mcus_x * mcus_y):
                my, mx = divmod(m, mcus_x)
                for ci in comp_ids:
                    sh, sv = samps[ci]
                    bpr, zz = comp_zz[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            yield ci, zz[
                                (my * sv + by) * bpr + (mx * sh + bx)
                            ]
        else:
            ci = comp_ids[0]
            sh, sv = samps[ci]
            bpr, zz = comp_zz[ci]
            bw = -(-((w * sh + hmax - 1) // hmax) // 8)
            bh = -(-((h * sv + vmax - 1) // vmax) // 8)
            for by in range(bh):
                for bx in range(bw):
                    yield ci, zz[by * bpr + bx]

    for comp_ids, ss, se, ah, al in scans:
        comp_ids = tuple(comp_ids)
        if any(ci >= nc for ci in comp_ids):
            raise ValueError("scan script references missing component")
        if ss == 0 and se != 0:
            raise ValueError("DC scan must have Se == 0")
        if ss > 0 and len(comp_ids) != 1:
            raise ValueError("AC scan must be single-component")
        interleaved = len(comp_ids) > 1
        first = ah == 0
        tc = 0 if ss == 0 else 1
        uses_table = not (ss == 0 and not first)  # DC refine: raw bits

        def run_pass(run: _SymbolRun):
            if ss == 0:
                preds = [0] * nc
                _enc_dc_scan(
                    run, scan_blocks(comp_ids, interleaved), al, first, preds
                )
            else:
                rows = (row for _, row in scan_blocks(comp_ids, False))
                if first:
                    _enc_ac_first(run, rows, ss, se, al)
                else:
                    _enc_ac_refine(run, rows, ss, se, al)

        if uses_table:
            collector = _SymbolRun(None, None)
            run_pass(collector)
            bits, vals = _flat_huff_spec(collector.symbols)
            out += _seg(0xC4, bytes([tc << 4]) + bytes(bits) + bytes(vals))
            table = _huff_encode_table(bits, vals)
        else:
            table = {}  # unused: DC refinement is raw bits
        wr = _BitWriter()
        run_pass(_SymbolRun(wr, table))
        wr.byte_align()

        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            sos += bytes([ci + 1, (0 << 4) | 0])  # table slot 0 for tc
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        out += wr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ----------------------------------------------------------------


def _split_entropy(buf: bytes, pos: int):
    """From the start of scan data, return (segments, end_pos): entropy
    bytes with 0xFF00 stuffing removed, split at RSTn boundaries."""
    segments, cur = [], bytearray()
    n = len(buf)
    while pos < n:
        b = buf[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        nxt = buf[pos + 1] if pos + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:  # restart marker
            segments.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # EOI or next real marker ends the scan
            break
    segments.append(bytes(cur))
    return segments, pos


def decode_jpeg(buf: bytes):
    """JPEG -> (w, h, channels, HxWxC uint8).

    Baseline sequential (SOF0) and progressive (SOF2) are both decoded;
    only hierarchical / lossless / arithmetic-coded frames raise
    NotImplementedError. 1 component -> grayscale; 3 -> YCbCr->RGB
    (JFIF); 4 -> raises (CMYK needs an Adobe transform table).
    Malformed payloads always raise ValueError —
    low-level parse faults (bad offsets, dangling table refs) are
    converted at this boundary so corrupt corpus rows fail typed, not
    with arbitrary exceptions (pinned by the codec fuzz test)."""
    try:
        return _decode_jpeg_impl(bytes(buf))
    except (KeyError, IndexError, struct.error, OverflowError, MemoryError) as e:
        raise ValueError(f"corrupt JPEG payload: {type(e).__name__} {e}") from e


def _decode_jpeg_impl(buf: bytes):
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    progressive = False
    states = None  # persistent per-component coeff stores (progressive)
    restart_interval = 0
    n = len(buf)
    while pos + 4 <= n:
        if buf[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack_from(">H", buf, pos + 2)
        payload = buf[pos + 4 : pos + 2 + length]
        if len(payload) != length - 2:
            raise ValueError("JPEG segment truncated")
        pos += 2 + length
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant tables")
                zz = np.frombuffer(payload, np.uint8, 64, p + 1).astype(np.int64)
                qtables[tq] = zz  # stored in zigzag order
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 15
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nv])
                if len(bits) != 16 or len(vals) != nv:
                    raise ValueError("JPEG DHT segment truncated")
                htables[(tc, th)] = _huff_decode_table(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext seq / progressive
            prec, fh, fw, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, samp, tq = payload[6 + 3 * i : 9 + 3 * i]
                sh, sv = samp >> 4, samp & 15
                # T.81 A.1.1: sampling factors are 1..4. Enforcing the
                # spec range also bounds the bomb-guard amplification a
                # crafted large-factor SOF could otherwise buy.
                if not (1 <= sh <= 4 and 1 <= sv <= 4):
                    raise ValueError("JPEG sampling factor out of range")
                comps.append((cid, sh, sv, tq))
            frame = (fh, fw, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "hierarchical/lossless/arithmetic JPEG unsupported "
                "(baseline sequential + progressive only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = payload[0]
            scan_comps = []
            for i in range(ns):
                cid, tt = payload[1 + 2 * i : 3 + 2 * i]
                scan_comps.append((cid, tt >> 4, tt & 15))
            if len(payload) < 4 + 2 * ns:
                raise ValueError("JPEG SOS header truncated")
            ss, se, ahal = payload[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            segments, pos = _split_entropy(buf, pos)
            if not progressive:
                scan_tabs = {cid: (td, ta) for cid, td, ta in scan_comps}
                return _decode_scan(
                    frame, qtables, htables, scan_tabs, segments,
                    restart_interval,
                )
            if states is None:
                if ss != 0:
                    raise ValueError("progressive AC scan before DC scan")
                states = _init_states(frame, segments, scan_comps, len(buf))
            _decode_progressive_scan(
                frame, states, htables, scan_comps, ss, se, ah, al,
                segments, restart_interval,
            )
        # other markers (APPn, COM): skipped
    if progressive and states is not None:
        # A progressive image is only complete at EOI: a payload cut at
        # a scan boundary parses cleanly but is missing refinement /
        # spectral scans — that must fail typed (corruption contract),
        # not silently yield degraded pixels. (The loop never *enters*
        # for a trailing 2-byte EOI — pos+4 > n — so also check the
        # bytes where parsing stopped.)
        saw_eoi = marker == 0xD9 or (
            pos + 2 <= n and buf[pos] == 0xFF and buf[pos + 1] == 0xD9
        )
        if not saw_eoi:
            raise ValueError("progressive JPEG truncated before EOI")
        return _reconstruct(frame, states, qtables)
    raise ValueError("JPEG has no scan data")


def _geometry(frame):
    """(hmax, vmax, mcus_x, mcus_y) for a parsed SOF frame."""
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for _, sh, sv, _ in comps:
        if hmax % sh or vmax % sv:
            raise NotImplementedError("fractional JPEG sampling ratios")
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    return hmax, vmax, mcus_x, mcus_y


def _init_states(frame, segments, scan_comps, buf_len):
    """Per-component persistent coefficient stores for a progressive
    frame, with a two-part decompression-bomb guard:

    - the FIRST scan's own components (T.81 allows a non-interleaved
      single-component first DC scan, whose entropy bytes bound only
      that component's blocks) must fit >= 1 coded bit per block in the
      scan's entropy data;
    - TOTAL blocks across all components must fit >= 1 bit per block in
      the WHOLE payload — every component eventually needs a DC scan,
      so a complete file carries at least that much entropy. Without
      this second bound a crafted high-sampling-factor SOF plus a tiny
      single-component first scan could pass the per-scan check while
      the all-components allocation runs to gigabytes (r5 review)."""
    fh, fw, comps = frame
    if len(comps) not in (1, 3):
        raise NotImplementedError("1- or 3-component JPEG only (no CMYK)")
    hmax, vmax, mcus_x, mcus_y = _geometry(frame)
    scan_cids = {cid for cid, _, _ in scan_comps}
    scan_blocks = sum(
        (mcus_x * sh) * (mcus_y * sv)
        for cid, sh, sv, _ in comps
        if cid in scan_cids
    )
    if scan_blocks == 0:
        raise ValueError("JPEG scan references unknown component")
    entropy_bytes = sum(len(s) for s in segments)
    if scan_blocks > max(1024, entropy_bytes * 8):
        raise ValueError(
            "JPEG frame dimensions inconsistent with entropy data "
            f"({scan_blocks} blocks declared, {entropy_bytes} entropy bytes)"
        )
    total_blocks = sum(
        (mcus_x * sh) * (mcus_y * sv) for _, sh, sv, _ in comps
    )
    if total_blocks > max(1024, buf_len * 8):
        raise ValueError(
            "JPEG frame dimensions inconsistent with payload size "
            f"({total_blocks} blocks declared, {buf_len} payload bytes)"
        )
    states = []
    for cid, sh, sv, tq in comps:
        bpr = mcus_x * sh
        nblocks = bpr * mcus_y * sv
        states.append(
            {
                "cid": cid,
                "zz": np.zeros((nblocks, 64), dtype=np.int32),
                "bpr": bpr,
                "sh": sh,
                "sv": sv,
                "tq": tq,
                "pred": 0,
                # TRUE block grid, ceil(ceil(dim*samp/max)/8): T.81
                # A.2.2 — non-interleaved scans iterate this, not the
                # MCU-padded grid
                "bw": -(-((fw * sh + hmax - 1) // hmax) // 8),
                "bh": -(-((fh * sv + vmax - 1) // vmax) // 8),
            }
        )
    return states


def _reconstruct(frame, states, qtables):
    """Dequantize + IDCT + upsample + crop — shared by the baseline and
    progressive paths (both accumulate into the same zigzag stores)."""
    fh, fw, comps = frame
    nc = len(comps)
    hmax, vmax, _, _ = _geometry(frame)
    planes = []
    for st in states:
        q = qtables.get(st["tq"])
        if q is None:
            raise ValueError("JPEG component references missing quant table")
        ph = (st["zz"].shape[0] // st["bpr"]) * 8
        pw = st["bpr"] * 8
        plane = _dequant_idct(st["zz"], q[UNZIGZAG], ph, pw)
        ry, rx = vmax // st["sv"], hmax // st["sh"]
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:fh, :fw])
    if nc == 1:
        out = np.clip(planes[0].round(), 0, 255).astype(np.uint8)[:, :, None]
        return fw, fh, 1, out
    rgb = _ycbcr_to_rgb(*planes)
    return fw, fh, 3, rgb


def _decode_scan(frame, qtables, htables, scan_tabs, segments, restart_interval):
    fh, fw, comps = frame
    nc = len(comps)
    if nc not in (1, 3):
        raise NotImplementedError("1- or 3-component JPEG only (no CMYK)")
    hmax, vmax, mcus_x, mcus_y = _geometry(frame)
    total_mcus = mcus_x * mcus_y

    # Decompression-bomb guard: every coded block consumes at least 2
    # bits of entropy data (a 1-bit DC symbol + a 1-bit EOB), so a frame
    # whose declared block count exceeds 4 bits-per-byte * entropy bytes
    # cannot be a real scan — reject BEFORE allocating the coefficient
    # store (a crafted ~100-byte SOF 65500x65500 would otherwise attempt
    # a 16 GiB np.zeros).
    total_blocks = sum(
        (mcus_x * sh) * (mcus_y * sv) for _, sh, sv, _ in comps
    )
    entropy_bytes = sum(len(s) for s in segments)
    if total_blocks > max(1024, entropy_bytes * 4):
        raise ValueError(
            "JPEG frame dimensions inconsistent with entropy data "
            f"({total_blocks} blocks declared, {entropy_bytes} entropy bytes)"
        )

    # zigzag coefficient store per component
    comp_state = []
    for cid, sh, sv, tq in comps:
        bpr = mcus_x * sh
        nblocks = bpr * mcus_y * sv
        td, ta = scan_tabs[cid]
        dc = htables.get((0, td))
        ac = htables.get((1, ta))
        if dc is None or ac is None:
            raise ValueError("JPEG scan references missing huffman table")
        comp_state.append(
            {
                "zz": np.zeros((nblocks, 64), dtype=np.int32),
                "bpr": bpr,
                "sh": sh,
                "sv": sv,
                "tq": tq,
                "dc": dc,
                "ac": ac,
                "pred": 0,
            }
        )

    seg_idx = 0
    rd = _BitReader(segments[0])
    for m in range(total_mcus):
        if restart_interval and m and m % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("JPEG missing restart segment")
            rd = _BitReader(segments[seg_idx])
            for st in comp_state:
                st["pred"] = 0
        my, mx = divmod(m, mcus_x)
        for st in comp_state:
            for by in range(st["sv"]):
                for bx in range(st["sh"]):
                    idx = (my * st["sv"] + by) * st["bpr"] + (mx * st["sh"] + bx)
                    row = st["zz"][idx]
                    t = rd.decode(st["dc"])
                    # T.81 F.1.2.1.2: baseline 8-bit DC categories are
                    # 0..11 — a corrupt DHT can emit arbitrary symbols,
                    # which would build huge Python ints in receive().
                    if t > 11:
                        raise ValueError("JPEG DC category out of range")
                    st["pred"] += _extend(rd.receive(t), t)
                    row[0] = st["pred"]
                    k = 1
                    while k < 64:
                        rs = rd.decode(st["ac"])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        if s > 10:  # T.81 F.1.2.2.1: AC SSSS is 1..10
                            raise ValueError("JPEG AC category out of range")
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC coefficient overrun")
                        row[k] = _extend(rd.receive(s), s)
                        k += 1

    return _reconstruct(frame, comp_state, qtables)


# --- progressive (SOF2) scan decoding: T.81 Annex G -------------------------


def _ac_first_band(rd, ac, row, ss, se, al, eobrun):
    """Initial AC scan for one block's band; returns the new EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = rd.decode(ac)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += rd.receive(r)
            break
        if s > 10:  # T.81 F.1.2.2.1: AC SSSS is 1..10
            raise ValueError("JPEG AC category out of range")
        k += r
        if k > se:
            raise ValueError("JPEG AC coefficient overrun")
        row[k] = _extend(rd.receive(s), s) << al
        k += 1
    return eobrun


def _ac_refine_band(rd, ac, row, ss, se, al, eobrun):
    """Successive-approximation AC refinement for one block's band
    (T.81 G.1.2.3: correction bits for history coefficients interleave
    with newly-significant insertions); returns the new EOB run."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rd.decode(ac)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += rd.receive(r)
                    break
                # r == 15 (ZRL): skip 16 zero-history positions below
            else:
                if s != 1:
                    raise ValueError("JPEG refinement magnitude must be 1")
                val = p1 if rd.bit() else m1
            while k <= se:
                c = int(row[k])
                if c != 0:
                    if rd.bit() and (c & p1) == 0:
                        row[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                row[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(row[k])
            if c != 0:
                if rd.bit() and (c & p1) == 0:
                    row[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(
    frame, states, htables, scan_comps, ss, se, ah, al, segments,
    restart_interval,
):
    """Apply one progressive SOS to the persistent coefficient stores."""
    hmax, vmax, mcus_x, mcus_y = _geometry(frame)
    by_cid = {st["cid"]: st for st in states}
    sel = []
    for cid, td, ta in scan_comps:
        st = by_cid.get(cid)
        if st is None:
            raise ValueError("JPEG scan references unknown component")
        if ss == 0:
            if ah == 0:
                dc = htables.get((0, td))
                if dc is None:
                    raise ValueError(
                        "JPEG scan references missing huffman table"
                    )
                st["_tab"] = dc
        else:
            ac = htables.get((1, ta))
            if ac is None:
                raise ValueError("JPEG scan references missing huffman table")
            st["_tab"] = ac
        sel.append(st)
    if ss == 0:
        if se != 0:
            raise ValueError("JPEG DC scan with Se != 0")
    else:
        if len(sel) != 1:
            raise ValueError("JPEG progressive AC scan must be one component")
        if not (1 <= ss <= se <= 63):
            raise ValueError("JPEG spectral band out of range")
    if ah and ah != al + 1:  # G.1.1.1.2: refinements step precision by 1
        raise ValueError("JPEG successive approximation Ah != Al+1")

    # Units: an MCU for interleaved scans (ns > 1), a single block of
    # the component's TRUE grid for non-interleaved scans (T.81 A.2.2).
    if len(sel) > 1:
        def units():
            for m in range(mcus_x * mcus_y):
                my, mx = divmod(m, mcus_x)
                blocks = []
                for st in sel:
                    for by in range(st["sv"]):
                        for bx in range(st["sh"]):
                            blocks.append(
                                (
                                    st,
                                    (my * st["sv"] + by) * st["bpr"]
                                    + (mx * st["sh"] + bx),
                                )
                            )
                yield blocks
    else:
        only = sel[0]

        def units():
            for by in range(only["bh"]):
                for bx in range(only["bw"]):
                    yield [(only, by * only["bpr"] + bx)]

    seg_idx = 0
    rd = _BitReader(segments[0])
    eobrun = 0
    for st in sel:
        st["pred"] = 0  # DC prediction restarts per scan
    for u, blocks in enumerate(units()):
        if restart_interval and u and u % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("JPEG missing restart segment")
            rd = _BitReader(segments[seg_idx])
            eobrun = 0
            for st in sel:
                st["pred"] = 0
        for st, idx in blocks:
            row = st["zz"][idx]
            if ss == 0:
                if ah == 0:  # initial DC scan
                    t = rd.decode(st["_tab"])
                    if t > 11:
                        raise ValueError("JPEG DC category out of range")
                    st["pred"] += _extend(rd.receive(t), t)
                    row[0] = st["pred"] << al
                else:  # DC refinement: one raw bit per block
                    if rd.bit():
                        row[0] = int(row[0]) | (1 << al)
            else:
                if ah == 0:
                    eobrun = _ac_first_band(
                        rd, st["_tab"], row, ss, se, al, eobrun
                    )
                else:
                    eobrun = _ac_refine_band(
                        rd, st["_tab"], row, ss, se, al, eobrun
                    )
