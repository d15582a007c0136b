"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus typed metadata — the same closed-world
columnar treatment the crawl engine gives HTML bytes. The Spark-side plumbing
(schemas, Arrow batching via ``mapInPandas``, partition-aligned processing,
deterministic feature schema) is real and tested; the codec step itself is
stubbed: this container has no image/audio libraries, so ``decode_media``
raises ``NotImplementedError`` unless the deterministic fake decoder is
selected. Swapping in Pillow/ffmpeg touches only ``_decode_fake`` — the
DataFrame contract is unchanged.

At scale: ``mapInPandas`` streams Arrow batches (no per-row Python), media
bytes never shuffle (features are computed in-place on the scan partitions),
and only the small typed feature rows move downstream.
"""

from __future__ import annotations

from collections.abc import Iterator

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
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_entropy", T.DoubleType(), False),
        T.StructField("histogram", T.ArrayType(T.IntegerType()), False),  # 16-bin byte histogram
        T.StructField("frames_sampled", T.IntegerType(), False),
    ]
)


def _decode_fake(payload: bytes, kind: str) -> dict:
    """Deterministic fake decode: byte histogram + entropy + frame count.

    Stands in for image decode / resize / audio resample / video frame
    sampling. Purely a function of the bytes — reproducible everywhere.
    """
    import math

    n = len(payload)
    hist = [0] * 16
    for b in payload:
        hist[b >> 4] += 1
    entropy = 0.0
    for c in hist:
        if c:
            p = c / n
            entropy -= p * math.log2(p)
    frames = 1 if kind == "image" else max(1, n // 256)
    return {"n_bytes": n, "byte_entropy": round(entropy, 6), "histogram": hist, "frames_sampled": frames}


def decode_media(payload: bytes, kind: str, codec: str = "fake") -> dict:
    if codec == "fake":
        return _decode_fake(payload, kind)
    # Real codecs (Pillow / soundfile / pyav) are not available in this
    # environment — see module docstring.
    raise NotImplementedError(f"media codec {codec!r} not available in this build")


def extract_features(media: DataFrame, codec: str = "fake") -> DataFrame:
    """mapInPandas feature extraction over binary media columns."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_media(p, k, codec) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "byte_entropy": [f["byte_entropy"] for f in feats],
                    "histogram": [f["histogram"] for f in feats],
                    "frames_sampled": [f["frames_sampled"] for f in feats],
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
