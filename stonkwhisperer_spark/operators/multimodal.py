"""Multimodal-column operators: opaque binary payloads with typed
metadata, processed via Arrow-batched ``mapInPandas``.

The pattern for image/audio/video at 100 TB:
  * store payloads as a ``binary`` column next to typed metadata
    (media_type, n_bytes, content hash — see the media_manifest query);
  * decode / feature-extract / resize / frame-sample runs as a
    ``mapInPandas`` stage: Arrow ships each partition to Python in
    columnar batches, the decoder is vectorized per batch, and the
    output schema is declared up front so Catalyst can keep planning
    around the stage;
  * partition by content-size buckets before heavy decode so one task
    doesn't get all the 4K videos (see ``size_bucket``).

The actual codec calls are STUBBED: image/audio libraries are not
available in this environment. ``decode_features`` computes real,
deterministic features of the bytes themselves (length, byte entropy,
header) so the Spark-side plumbing — schema, batching, partitioning —
is fully exercised and tested; swap ``_decode_stub`` for a real decoder
(PIL/librosa/av) in production.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_entropy", T.DoubleType(), True),
        T.StructField("header_hex", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _byte_entropy(b: bytes) -> float:
    if not b:
        return 0.0
    counts: dict[int, int] = {}
    for x in b:
        counts[x] = counts.get(x, 0) + 1
    n = len(b)
    return -sum((c / n) * math.log2(c / n) for c in counts.values())


def _decode_stub(payload: bytes, media_type: str) -> list[float]:
    """Deterministic fake 'decoded feature' (8-dim). A real deployment
    replaces this with PIL/librosa/av decode + model features; the
    Spark-side contract (bytes in, fixed-width float vector out, batch
    shape) is identical."""
    if payload is None:
        raise NotImplementedError("real decoder required for null-payload media")
    return [float((len(payload) * (i + 1) + sum(payload[:16])) % 997) for i in range(8)]


def decode_features(media: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA → FEATURE_SCHEMA via mapInPandas (Arrow batches).

    Scale: narrow map stage — no shuffle; heavy decode parallelism is
    controlled by the input partitioning (repartition by size_bucket
    upstream if payload sizes are skewed)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else None),
                    "byte_entropy": payloads.map(
                        lambda b: _byte_entropy(b) if b is not None else None
                    ),
                    "header_hex": payloads.map(
                        lambda b: b[:4].hex() if b is not None else None
                    ),
                    "feature": payloads.map(
                        lambda b: _decode_stub(b, "") if b is not None else None
                    ),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("pixels", T.BinaryType(), True),
    ]
)


def _resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resize: width·height 'grayscale pixels'
    derived by striding/repeating the source bytes. A real deployment
    replaces this with PIL decode→resize→tobytes; the contract (bytes
    in, exactly width·height bytes out) is identical."""
    if not payload:
        return bytes(width * height)
    n = width * height
    reps = -(-n // len(payload))
    return (payload * reps)[:n]


def resize_images(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """MEDIA_SCHEMA → RESIZED_SCHEMA via mapInPandas: one output row
    per input image with a fixed-size pixel buffer — the normalize
    stage before vision-model feature extraction. Narrow map stage;
    output size is constant per row (width·height), so downstream
    partition sizing is predictable regardless of source image sizes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "pixels": pdf["payload"].map(
                        lambda b: _resize_stub(b, width, height) if b is not None else None
                    ),
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(media: DataFrame, frame_bytes: int = 64, every_n: int = 2) -> DataFrame:
    """MEDIA_SCHEMA (video payloads) → one row per sampled frame: the
    1→N row expansion shape (mapInPandas output batches need not align
    with input rows). The stub treats the payload as a concatenation of
    ``frame_bytes`` frames and keeps every ``every_n``-th; a real
    deployment replaces the slicing with av/ffmpeg keyframe extraction.
    Scale: output cardinality is rows·frames/every_n — repartition on
    size_bucket first so long videos spread across tasks."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                n_frames = len(payload) // frame_bytes
                for k in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(k)
                    frames.append(payload[k * frame_bytes : (k + 1) * frame_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(run, FRAME_SCHEMA)


def size_bucket(df: DataFrame, payload_col: str = "payload", n_buckets: int = 32) -> DataFrame:
    """Add a decode-cost bucket column (by payload size) to repartition
    on before a heavy decode stage, so large payloads spread evenly."""
    return df.withColumn(
        "_size_bucket",
        (F.floor(F.log2(F.octet_length(payload_col) + 2)) * 7 + F.crc32(F.col(payload_col)) % n_buckets)
        % n_buckets,
    )
