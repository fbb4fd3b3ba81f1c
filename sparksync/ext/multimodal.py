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
