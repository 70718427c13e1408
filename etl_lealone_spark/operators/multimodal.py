"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with a typed metadata struct
(modality, mime, width/height/duration, …) — the columnar pattern for
multimodal training data. The Spark-side plumbing (schemas, batch
iteration via mapInPandas, partition sizing) is real and tested; the
actual codec work is stubbed because no image/audio libraries exist in
this container — each stub either raises NotImplementedError (strict
mode) or produces a deterministic fake (plumbing-test mode).

Scale notes: decode/feature-extract runs as mapInPandas over Arrow
batches — per-partition streaming, no shuffle; partition size should be
tuned so a batch of decoded frames fits executor memory
(spark.sql.files.maxPartitionBytes down-tuned for media tables).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("modality", T.StringType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)


def synthesize_media_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media-shaped table from the documents table: payload =
    utf-8 bytes of the text (an opaque blob as far as the pipeline is
    concerned), metadata derived deterministically."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("image/fake").alias("mime"),
            (F.length(F.col(text_col)) % 640 + 32).cast("int").alias("width"),
            (F.length(F.col(text_col)) % 480 + 32).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, width: int, height: int) -> list[float]:
    """Deterministic stand-in for an image decoder: 8 'pixel statistics'
    derived from payload bytes. Replace with PIL/torchvision in prod."""
    if payload is None:
        return [0.0] * 8
    n = len(payload)
    s = sum(payload[:256])
    return [
        float(n),
        float(s % 997),
        float(width),
        float(height),
        float(payload[0] if n else 0),
        float(payload[-1] if n else 0),
        float(s % 31),
        float(n % 13),
    ]


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def extract_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched).

    ``strict=True`` raises NotImplementedError — the marker that a real
    codec must be plugged in; ``strict=False`` runs the deterministic
    fake so the distributed plumbing (batching, schema, partitioning) is
    exercised end to end.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "media decode requires an image/audio codec; not available "
                "in this environment — plug a decoder into extract_features()"
            )
        for pdf in it:
            feats = [
                _fake_decode(p, m["width"], m["height"])
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats}
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize(
    media: DataFrame, width: int = 224, height: int = 224, strict: bool = False
) -> DataFrame:
    """Image resize via mapInPandas — same media schema out, metadata
    updated to the target dimensions.

    Deterministic fake (no codec in this container): the payload is
    truncated/padded to ``width*height // 64`` bytes, a stand-in with the
    real operator's cost shape (per-row byte work, output size bounded by
    the target resolution, not the input). Replace the inner loop with
    PIL/cv2 in prod; the Arrow batching, schema, and partition behavior
    are what this function actually tests.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError("resize requires an image codec")
        target = max(1, width * height // 64)
        for pdf in it:
            payloads = []
            for p in pdf["payload"]:
                b = bytes(p or b"")
                payloads.append((b * (target // max(len(b), 1) + 1))[:target])
            metas = [
                {**m, "width": width, "height": height} for m in pdf["meta"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads, "meta": metas}
            )

    return media.mapInPandas(batches, schema=MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000, strict: bool = False) -> DataFrame:
    """Video frame sampling stub: emits (media_id, frame_idx, frame_bytes)
    rows. Deterministic fake: one 'frame' per metadata duration bucket."""
    if strict:
        raise NotImplementedError("frame sampling requires a video codec")
    n_frames = F.coalesce(
        (F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias(
            "frame_idx"
        ),
        F.col("payload").alias("frame_bytes"),
    )


# ---------------------------------------------------------------------------
# REAL decoders — uncompressed raster formats parse with numpy alone
# (netpbm P5/P6, 24-bit BMP); compressed formats (jpeg/png/...) remain
# gated behind strict-NotImplementedError since no codec lib ships here.
# ---------------------------------------------------------------------------


def _parse_netpbm(buf: bytes):
    """Decode binary PGM (P5) / PPM (P6) -> (w, h, channels, HxWxC uint8)."""
    import numpy as np

    if not buf or buf[:1] != b"P" or buf[1:2] not in (b"5", b"6"):
        raise ValueError("not a binary netpbm payload")
    channels = 1 if buf[1:2] == b"5" else 3
    # header tokens: magic, width, height, maxval — whitespace separated,
    # '#' comments run to end-of-line
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":
            while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit netpbm unsupported")
    need = w * h * channels
    raster = np.frombuffer(buf, dtype=np.uint8, count=need, offset=pos)
    return w, h, channels, raster.reshape(h, w, channels)


def _parse_bmp24(buf: bytes):
    """Decode an uncompressed 24-bit BMP -> (w, h, 3, HxWx3 uint8, RGB)."""
    import struct

    import numpy as np

    if not buf or buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_sz, w, h = struct.unpack_from("<Iii", buf, 14)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    flip = h > 0  # positive height = bottom-up row order
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3  # rows padded to 4-byte boundaries
    raster = np.frombuffer(
        buf, dtype=np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if flip:
        raster = raster[::-1]
    return w, h, 3, raster[:, :, ::-1]  # BGR -> RGB


def decode_raster(buf: bytes):
    """(w, h, channels, HxWxC uint8) for any supported payload."""
    if buf and buf[:2] in (b"P5", b"P6"):
        return _parse_netpbm(buf)
    if buf and buf[:2] == b"BM":
        return _parse_bmp24(buf)
    raise NotImplementedError(
        "compressed/unknown image format — plug a codec (PIL/cv2) in prod"
    )


def encode_ppm(arr) -> bytes:
    """HxWxC uint8 -> binary netpbm payload (P5 gray / P6 rgb)."""
    h, w, c = arr.shape
    magic = b"P5" if c == 1 else b"P6"
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


def image_stats_features(media: DataFrame) -> DataFrame:
    """REAL decode + statistics for netpbm/BMP payloads:
    (media_id, width, height, channels, mean per channel, std per
    channel padded to 3). Map-only Arrow pass, no shuffle."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("mean", T.ArrayType(T.DoubleType())),
            T.StructField("std", T.ArrayType(T.DoubleType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("media_id", "width", "height", "channels", "mean", "std")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h, c, arr = decode_raster(bytes(p))
                flat = arr.reshape(-1, c).astype("float64")
                rows["media_id"].append(mid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(c)
                rows["mean"].append([round(float(x), 6) for x in flat.mean(axis=0)])
                rows["std"].append([round(float(x), 6) for x in flat.std(axis=0)])
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, schema=schema)


def resize_nearest(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """REAL nearest-neighbor resize for netpbm/BMP payloads; re-emits the
    media schema with PPM/PGM payloads at the target resolution."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, metas = [], []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                w, h, c, arr = decode_raster(bytes(p))
                yi = np.minimum((np.arange(height) * h) // height, h - 1)
                xi = np.minimum((np.arange(width) * w) // width, w - 1)
                out = arr[yi][:, xi]
                payloads.append(encode_ppm(out))
                metas.append(
                    {
                        **m,
                        "mime": "image/x-portable-graymap" if c == 1 else "image/x-portable-pixmap",
                        "width": width,
                        "height": height,
                    }
                )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads, "meta": metas}
            )

    return media.mapInPandas(batches, schema=MEDIA_SCHEMA)
