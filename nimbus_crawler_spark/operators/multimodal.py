"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus typed metadata — the same closed-world
columnar treatment the crawl engine gives HTML bytes. The Spark-side plumbing
(schemas, Arrow batching via ``mapInPandas``, partition-aligned processing,
deterministic feature schema) is real and tested, and the decode step handles
two real container formats with pure numpy — uncompressed **BMP** (24/32-bit)
and PCM **WAV** — plus a deterministic byte-statistics fallback for anything
else. Compressed codecs (JPEG/PNG/MP3/H.264) need external libraries this
container doesn't ship; swapping Pillow/ffmpeg in touches only the
``_decode_*`` functions — the DataFrame contract is unchanged.

At scale: ``mapInPandas`` streams Arrow batches (no per-row Python loops —
all byte math is vectorized numpy over the payload buffer), media bytes never
shuffle (features are computed in-place on the scan partitions), and only the
small typed feature rows move downstream.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),      # image | audio | video
        T.StructField("mime", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),   # opaque bytes
        T.StructField("meta_json", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("format", T.StringType(), False),    # bmp | wav | raw
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_entropy", T.DoubleType(), False),
        T.StructField("histogram", T.ArrayType(T.IntegerType()), False),  # 16 bins
        T.StructField("frames_sampled", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), True),       # bmp only
        T.StructField("height", T.IntegerType(), True),      # bmp only
        T.StructField("sample_rate", T.IntegerType(), True),  # wav only
        T.StructField("duration_s", T.DoubleType(), True),    # wav only
    ]
)


def _hist_entropy(values: np.ndarray, nbins: int = 16) -> tuple[list[int], float]:
    """16-bin histogram + Shannon entropy of a uint8-ranged array (vectorized).

    Entropy rounds HALF_UP to 6 dp (floor(x·1e6 + 0.5), matching the repo's
    portable-rounding convention) so the raw byte-stats path is bit-checkable
    against a SQL oracle — Python's ``round`` is banker's rounding."""
    import math

    hist = np.bincount(values >> 4, minlength=nbins)[:nbins]
    n = int(values.size)
    if n == 0:
        return [0] * nbins, 0.0
    p = hist[hist > 0] / n
    entropy = float(-(p * np.log2(p)).sum())
    return hist.astype(int).tolist(), math.floor(entropy * 1e6 + 0.5) / 1e6


def _decode_raw(payload: bytes, kind: str) -> dict:
    """Byte-statistics fallback: histogram + entropy over the raw payload.
    Deterministic stand-in for formats without a pure-numpy decoder."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, entropy = _hist_entropy(arr)
    frames = 1 if kind == "image" else max(1, arr.size // 256)
    return {
        "format": "raw",
        "n_bytes": arr.size,
        "byte_entropy": entropy,
        "histogram": hist,
        "frames_sampled": frames,
    }


def _decode_bmp(payload: bytes) -> dict | None:
    """Uncompressed 24/32-bit BMP: header parse + luminance statistics.

    Returns None if the buffer is not a decodable BMP (caller falls back)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_off, = struct.unpack_from("<I", payload, 10)
    hdr_size, = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40 or len(payload) < data_off:
        return None
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression, = struct.unpack_from("<I", payload, 30)
    if compression != 0 or bpp not in (24, 32) or width <= 0 or height == 0:
        return None
    rows = abs(height)
    stride = ((width * (bpp // 8) + 3) // 4) * 4
    need = data_off + stride * rows
    if len(payload) < need:
        return None
    px = np.frombuffer(payload, dtype=np.uint8, count=stride * rows, offset=data_off)
    px = px.reshape(rows, stride)[:, : width * (bpp // 8)].reshape(rows, width, bpp // 8)
    # integer BT.601-ish luminance (BGR order in BMP)
    lum = (
        px[:, :, 2].astype(np.uint32) * 299
        + px[:, :, 1].astype(np.uint32) * 587
        + px[:, :, 0].astype(np.uint32) * 114
    ) // 1000
    hist, entropy = _hist_entropy(lum.astype(np.uint8).ravel())
    return {
        "format": "bmp",
        "n_bytes": len(payload),
        "byte_entropy": entropy,
        "histogram": hist,
        "frames_sampled": 1,
        "width": int(width),
        "height": int(rows),
    }


def _decode_wav(payload: bytes) -> dict | None:
    """PCM WAV: RIFF parse + 16-bin amplitude histogram over samples.

    Returns None if the buffer is not simple PCM WAV (caller falls back)."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size, = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_fmt, channels, rate = struct.unpack_from("<HHI", fmt, 0)
    bits, = struct.unpack_from("<H", fmt, 14)
    if audio_fmt != 1 or channels < 1 or bits not in (8, 16):
        return None
    if bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8)
    else:
        samples = (
            np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2").astype(np.int32)
            // 256
            + 128
        ).astype(np.uint8)
    hist, entropy = _hist_entropy(samples)
    n_frames = samples.size // channels
    return {
        "format": "wav",
        "n_bytes": len(payload),
        "byte_entropy": entropy,
        "histogram": hist,
        "frames_sampled": int(min(n_frames, 2**31 - 1)),
        "sample_rate": int(rate),
        "duration_s": round(n_frames / rate, 6) if rate else None,
    }


def decode_media(payload: bytes, kind: str, codec: str = "auto") -> dict:
    """Decode one payload. ``auto`` sniffs BMP / WAV magic and falls back to
    raw byte statistics; ``raw``/``fake`` forces the fallback."""
    payload = bytes(payload)
    if codec == "auto":
        out = None
        if payload[:2] == b"BM":
            out = _decode_bmp(payload)
        elif payload[:4] == b"RIFF":
            out = _decode_wav(payload)
        return out if out is not None else _decode_raw(payload, kind)
    if codec in ("raw", "fake"):
        return _decode_raw(payload, kind)
    raise ValueError(f"unknown media codec {codec!r} (auto|raw)")


def extract_features(media: DataFrame, codec: str = "auto") -> DataFrame:
    """mapInPandas feature extraction over binary media columns."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_media(p, k, codec) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "format": [f["format"] for f in feats],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "byte_entropy": [f["byte_entropy"] for f in feats],
                    "histogram": [f["histogram"] for f in feats],
                    "frames_sampled": [f["frames_sampled"] for f in feats],
                    "width": [f.get("width") for f in feats],
                    "height": [f.get("height") for f in feats],
                    "sample_rate": [f.get("sample_rate") for f in feats],
                    "duration_s": [f.get("duration_s") for f in feats],
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic media table from the documents fixture: the
    document bytes become the payload (kind round-robins by doc_id). Lets the
    multimodal plumbing run against driver-provided test data only."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("x-nimbus/"), kind).alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
        F.to_json(F.struct("lang", "source", "n_chars")).alias("meta_json"),
    )


def make_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic 24-bit BMP test vector (valid, uncompressed)."""
    stride = ((width * 3 + 3) // 4) * 4
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(height, stride), dtype=np.uint8)
    data = px.tobytes()
    off = 54
    header = struct.pack(
        "<2sIHHI", b"BM", off + len(data), 0, 0, off
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data


def make_wav(n_frames: int, rate: int = 8000, seed: int = 0) -> bytes:
    """Deterministic 16-bit mono PCM WAV test vector."""
    rng = np.random.default_rng(seed)
    samples = rng.integers(-(2**15), 2**15, size=n_frames, dtype=np.int16)
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )
