"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched mapInPandas.

The image/audio codecs are not available in this container, so the
decode step is STUBBED: `decode_image` raises NotImplementedError unless
`fake=True`, in which case a deterministic fake 'feature vector' is
derived from the bytes (sha-based) so the Spark-side plumbing — schema,
batch iteration, partitioning — is real and testable end to end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def decode_image(content: bytes, fake: bool = False) -> list[float]:
    """STUB: real decode needs PIL/ffmpeg (absent here). fake=True
    derives a deterministic pseudo-feature vector from a sha256 of the
    bytes, keeping downstream shapes honest."""
    if not fake:
        raise NotImplementedError("image codecs not available in this environment")
    h = hashlib.sha256(content or b"").digest()
    return [h[i] / 255.0 for i in range(FEATURE_DIM)]


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches
    out — the per-row Python cost is amortized across the batch; at
    scale the input should be repartitioned so batches are ~100 MB."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                    "features": pdf["content"].map(lambda b: decode_image(b, fake=fake)),
                }
            )
            yield out

    return df.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: emits (media_id, frame_index) rows
    without decoding — the decode itself is the stubbed step."""
    n_frames = (F.length(F.col("content")) / F.lit(1000)).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return df.where(F.col("kind") == "video").select(
        "media_id", F.explode(idx).alias("frame_index")
    )


def resize_image(content: bytes, width: int, height: int, fake: bool = False) -> bytes:
    """STUB: real resize needs PIL (absent here). fake=True returns a
    deterministic sha-derived byte string of length width*height//64 so
    batch shapes and size accounting stay honest."""
    if not fake:
        raise NotImplementedError("image codecs not available in this environment")
    seed = hashlib.sha256((content or b"") + f":{width}x{height}".encode()).digest()
    n = max(1, width * height // 64)
    return (seed * (n // len(seed) + 1))[:n]


def resize(df: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """mapInPandas resize: same MEDIA_SCHEMA out, content replaced by the
    resized bytes and width/height updated — schema-stable so resized
    media can re-enter any pipeline stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["content"] = pdf["content"].map(
                lambda b: resize_image(b, width, height, fake=fake)
            )
            out["width"] = width
            out["height"] = height
            yield out

    return df.mapInPandas(run, MEDIA_SCHEMA)


def audio_chunk_plan(df: DataFrame, chunk_bytes: int = 4000) -> DataFrame:
    """Audio chunking *plan*: (media_id, chunk_index, offset) rows sized
    from the payload length without decoding — the relational frame the
    stubbed decoder fills in."""
    n_chunks = F.ceil(F.length(F.col("content")) / F.lit(chunk_bytes)).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
    return (
        df.where(F.col("kind") == "audio")
        .select("media_id", F.explode(idx).alias("chunk_index"))
        .withColumn("offset", F.col("chunk_index") * chunk_bytes)
    )
