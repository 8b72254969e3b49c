"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages.  The actual media decode is STUBBED
(image/audio libraries are not in this container): ``decode_features``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic hash-derived feature vector stands in so the Spark-side
plumbing (schema, batching, partitioning) is real and testable.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("kind", T.StringType()),       # image|audio|video
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]), True),
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("features", T.ArrayType(T.FloatType()), True),
])


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for testing: treat document text bytes as an opaque image
    payload with synthetic metadata."""
    return docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit(64).alias("width"), F.lit(64).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(1).alias("n_frames"),
        ).alias("meta"),
    )


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in feature: sha256 expansion of the payload."""
    out = np.empty(dim, dtype=np.float32)
    h = hashlib.sha256(payload)
    block = b""
    for d in range(dim):
        if d % 4 == 0:
            h.update(b"x")
            block = h.digest()
        v = int.from_bytes(block[(d % 4) * 8:(d % 4) * 8 + 8], "big")
        out[d] = v / 2 ** 63 - 1.0
    return out


def decode_features(media: DataFrame, dim: int = 16, fake: bool = False
                    ) -> DataFrame:
    """Decode payloads and emit a feature vector per media row.

    Real decode is not available in this environment; ``fake=True``
    substitutes a deterministic hash feature so the distributed plumbing
    (Arrow batching, schema, partition parallelism) is exercised
    end-to-end.
    """
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "media decode requires image/audio libs not present "
                    "in this container; pass fake=True for the "
                    "deterministic stand-in")
            feats = [
                _fake_feature(bytes(p), dim).tolist()
                if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": [len(bytes(p)) if p is not None else 0
                            for p in pdf["payload"]],
                "features": feats,
            })

    return media.mapInPandas(batches, FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing: one output row per kept frame index
    (pure Catalyst: the frame grid comes from metadata, payload slicing
    is the stubbed decode's job)."""
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("meta.n_frames") - 1,
                             F.lit(every_n))).alias("frame_idx"),
    )
