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


def _bmp_lum(payload: bytes) -> tuple[np.ndarray, int, int] | None:
    """Uncompressed 24/32-bit BMP → (luminance grid [rows×width], w, h).

    Returns None if the buffer is not a decodable BMP. Shared by the stats
    decode and the resize path so both see identical pixel numerics."""
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
    return lum, int(width), int(rows)


def _decode_bmp(payload: bytes) -> dict | None:
    """Uncompressed 24/32-bit BMP: header parse + luminance statistics.

    Returns None if the buffer is not a decodable BMP (caller falls back)."""
    decoded = _bmp_lum(payload)
    if decoded is None:
        return None
    lum, width, rows = decoded
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


def _wav_samples(payload: bytes) -> tuple[np.ndarray, int, int] | None:
    """RIFF chunk walk + PCM int16→uint8 transform, shared by the decoder
    and the frame sampler (the WAV analog of ``_bmp_lum``): returns
    ``(uint8 samples, channels, rate)``, or None if the buffer is not
    simple PCM WAV (caller falls back)."""
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
    return samples, int(channels), int(rate)


def _decode_wav(payload: bytes) -> dict | None:
    """PCM WAV: RIFF parse + 16-bin amplitude histogram over samples.

    Returns None if the buffer is not simple PCM WAV (caller falls back)."""
    decoded = _wav_samples(payload)
    if decoded is None:
        return None
    samples, channels, rate = decoded
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
    """mapInPandas feature extraction over binary media columns.

    The input is ``_spread`` first: a small single-file scan would otherwise
    pin the whole Python decode stage to ONE task (measured: the sf0.1 media
    table is one parquet file — 5000 payloads decoded on one core while 31
    idle). At 100 TB the file count exceeds the core count and the spread is
    a no-op, so payloads never shuffle in production (the module-doc
    invariant)."""
    from .textdedup import _spread

    media = _spread(media)

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


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("src_w", T.IntegerType(), False),
        T.StructField("src_h", T.IntegerType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("pixels", T.ArrayType(T.IntegerType()), False),  # row-major lum
        T.StructField("mean_lum", T.LongType(), False),                # floor mean
    ]
)


def _block_mean_resize(lum: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Area (block-mean) resample with integer-floor semantics.

    Output cell (i,j) averages input rows [i·h//oh, (i+1)·h//oh) ×
    cols [j·w//ow, (j+1)·w//ow) (ranges widened to ≥1 when upscaling),
    value = sum // count — exact integer math so the result is bit-checkable
    against a plain-Python oracle. The per-cell loop is over the OUTPUT grid
    (e.g. 64 cells for 8×8) with numpy slice-sums inside — the per-image
    cost is O(pixels), not O(cells·pixels)."""
    h, w = lum.shape
    out = np.empty((out_h, out_w), dtype=np.int64)
    lum64 = lum.astype(np.int64)
    for i in range(out_h):
        r0 = (i * h) // out_h
        r1 = max(((i + 1) * h) // out_h, r0 + 1)
        for j in range(out_w):
            c0 = (j * w) // out_w
            c1 = max(((j + 1) * w) // out_w, c0 + 1)
            block = lum64[r0:r1, c0:c1]
            out[i, j] = int(block.sum()) // block.size
    return out


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Deterministic image resize (area / block-mean) over binary BMP columns.

    Emits one row per DECODABLE image payload: the resized luminance grid as
    a flat row-major ``array<int>`` plus its floor-mean — the typed,
    fixed-size tensor shape a training pipeline feeds downstream (swap the
    luminance grid for RGB channels / float32 when a real codec library is
    plugged into ``_bmp_lum``). Non-decodable payloads produce no row (a
    production pipeline would route them to a quarantine sink).

    Scale: ``mapInPandas`` over Arrow batches on the scan partitions — the
    image bytes never shuffle; only the (out_w·out_h)-int rows move
    (``_spread`` parallelizes small single-file scans and is a no-op at
    production file counts, as in ``extract_features``).
    """
    from .textdedup import _spread

    media = _spread(media)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {k.name: [] for k in RESIZE_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                decoded = _bmp_lum(bytes(payload))
                if decoded is None:
                    continue
                lum, w, h = decoded
                resized = _block_mean_resize(lum, out_w, out_h)
                rows["media_id"].append(mid)
                rows["src_w"].append(w)
                rows["src_h"].append(h)
                rows["out_w"].append(out_w)
                rows["out_h"].append(out_h)
                rows["pixels"].append(resized.ravel().astype(int).tolist())
                rows["mean_lum"].append(int(resized.sum()) // resized.size)
            # a batch with no decodable image yields nothing: an empty
            # pandas frame's untyped object columns break Arrow's
            # list<int> conversion, and mapInPandas permits zero yields
            if rows["media_id"]:
                yield pd.DataFrame(rows)

    return media.mapInPandas(batches, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("format", T.StringType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_val", T.IntegerType(), False),     # first value, uint8
        T.StructField("window_mean", T.IntegerType(), False),   # floor mean, ≤16 vals
    ]
)


def _uniform_indices(n: int, k: int) -> list[int]:
    """k uniformly-spaced frame indices over [0, n) — every index distinct;
    when n < k this degrades to all n indices (never a repeated frame)."""
    if n <= 0:
        return []
    return sorted({(t * n) // k for t in range(k)})


def sample_frames(media: DataFrame, k: int = 4) -> DataFrame:
    """Uniform frame sampling over binary media columns (the decode-side
    half of a video/audio training pipeline: pick K representative frames,
    featurize each).

    Frame semantics per container: WAV → one frame per channel-frame
    (value = first channel, int16→uint8 transform shared with the decoder);
    raw/video → one frame per 256-byte block; BMP image → a single frame of
    the whole luminance grid. Each sampled frame emits its first value and
    the floor-mean of a ≤16-value window — integer math end-to-end so the
    rows are bit-checkable against a plain-Python oracle.

    Scale: same ``mapInPandas`` shape as ``extract_features`` — media bytes
    stay on the scan partitions; k typed rows per payload move on
    (``_spread`` applied for the same small-scan reason).
    """
    from .textdedup import _spread

    media = _spread(media)

    def frame_rows(payload: bytes, kind: str) -> tuple[str, int, list[tuple[int, int, int]]]:
        decoded = _bmp_lum(payload) if payload[:2] == b"BM" else None
        if decoded is not None:
            lum, _w, _h = decoded
            flat = lum.astype(np.int64).ravel()
            return "bmp", 1, [(0, int(flat[0]), int(flat.sum()) // flat.size)]
        wav = _wav_samples(payload) if payload[:4] == b"RIFF" else None
        if wav is not None:
            samples, channels, _rate = wav
            vals = samples.astype(np.int64)
            n = int(vals.size) // channels
            out = []
            for idx in _uniform_indices(n, k):
                first = int(vals[idx * channels])
                win = vals[idx * channels : (idx + 16) * channels : channels][:16]
                out.append((idx, first, int(win.sum()) // win.size))
            return "wav", n, out
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
        n = max(1, arr.size // 256) if kind != "image" else 1
        out = []
        for idx in _uniform_indices(n, k if kind != "image" else 1):
            block = arr[idx * 256 : (idx + 1) * 256]
            if block.size == 0:
                block = arr if arr.size else np.zeros(1, dtype=np.int64)
            out.append((idx, int(block[0]), int(block.sum()) // block.size))
        return "raw", n, out

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {f.name: [] for f in FRAME_SCHEMA.fields}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                fmt, n, frames = frame_rows(bytes(payload), kind)
                for idx, first, wmean in frames:
                    rows["media_id"].append(mid)
                    rows["kind"].append(kind)
                    rows["format"].append(fmt)
                    rows["n_frames"].append(min(n, 2**31 - 1))
                    rows["frame_idx"].append(idx)
                    rows["frame_val"].append(first)
                    rows["window_mean"].append(wmean)
            if rows["media_id"]:
                yield pd.DataFrame(rows)

    return media.mapInPandas(batches, FRAME_SCHEMA)


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
