"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video are `binary` columns with a metadata struct; decode
and feature extraction run as Arrow-batched functions over mapInPandas
so each Python worker touches a whole record batch at a time (the only
sane shape for MB-sized payloads: no per-row serialization overhead,
and batch size is controlled by spark.sql.execution.arrow.maxRecordsPerBatch).

The actual codecs (Pillow/ffmpeg/soundfile) are NOT available in this
container, so `decode_image` raises NotImplementedError unless
`fake=True`, in which case a deterministic stand-in decoder produces
stable pseudo-features from the bytes — the Spark-side plumbing
(schema, batching, partitioning, UDF signatures) is real and tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _fake_decode(payload: bytes, dim: int = 16):
    """Deterministic stand-in for a real decoder: stable per-byte-content
    pseudo-features.  Replace with Pillow/ffmpeg in production."""
    import hashlib

    import numpy as np

    digest = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4],
                        dtype=np.uint32)
    return (arr.astype(np.float64) / 2**32).astype(np.float32)


def decode_image(payload: bytes, fake: bool = False):
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        "image decoding requires Pillow/libvips, not present in this "
        "container; pass fake=True for the deterministic test decoder"
    )


def extract_features(df: DataFrame, fake: bool = False, dim: int = 16) -> DataFrame:
    """media table -> per-item feature vectors via mapInPandas."""

    def batches(iterator):
        import pandas as pd

        for pdf in iterator:
            feats = [
                None if p is None else [float(x) for x in decode_image(bytes(p), fake=fake)]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: computes the frame timestamps to
    decode per item (JVM-side), leaving the decode itself to the
    stubbed batch decoder.  Demonstrates the partitioning shape: one
    row per (media_id, frame_ts)."""
    from pyspark.sql import functions as F

    n = (F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast("int")
    return df.select(
        "media_id",
        F.explode(
            F.transform(F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0))),
                        lambda i: i * every_ms)
        ).alias("frame_ts_ms"),
    )
