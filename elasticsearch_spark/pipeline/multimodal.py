"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct —
the reference's `binary` mapper analog (/root/reference/src/main/java/org/
elasticsearch/index/mapper/core/BinaryFieldMapper.java:307 LoC), extended
with the batch plumbing a training pipeline needs.

The decode/feature kernels are STUBS (image/audio libs are not in this
container): `decode_stub=True` produces deterministic fake features with
the real schema/batch shape; passing decode_stub=False raises
NotImplementedError at the exact point a real libjpeg/ffmpeg call belongs.
The Spark-side contract — schema, mapInPandas batch iteration, Arrow
binary transfer, partition sizing — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "key long, media_type string, payload binary, width int, height int, "
    "duration_ms int"
)

FEATURE_SCHEMA = "key long, media_type string, feature array<float>, n_bytes int"


def synthesize_media(df: DataFrame, key_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media table from a text corpus: payload bytes are
    the utf-8 text (stand-in for jpeg/pcm), metadata derived from lengths."""
    return df.select(
        F.col(key_col).cast("long").alias("key"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64(F.col(key_col)), F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        (F.pmod(F.xxhash64(F.col(key_col), F.lit(1)), F.lit(1920)) + 1).cast("int").alias("width"),
        (F.pmod(F.xxhash64(F.col(key_col), F.lit(2)), F.lit(1080)) + 1).cast("int").alias("height"),
        (F.pmod(F.xxhash64(F.col(key_col), F.lit(3)), F.lit(60000)) + 1).cast("int").alias("duration_ms"),
    )


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder+featurizer: bytes →
    normalized histogram-ish vector. Vectorized per batch below."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(dim, dtype=np.float32)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
    n = np.linalg.norm(hist)
    return hist / n if n else hist


def extract_features(
    media: DataFrame, dim: int = 32, decode_stub: bool = True
) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow binary batches).

    Real pipeline shape: batches of payloads enter Python as Arrow buffers,
    a vectorized kernel maps them to fixed-dim float features, results flow
    back columnar. Swap `_fake_feature` for PIL/torchvision/librosa when
    available (decode_stub=False marks the spot)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this "
                    "container; run with decode_stub=True"
                )
            feats = [_fake_feature(p, dim) for p in b["payload"]]
            yield pd.DataFrame(
                {
                    "key": b["key"],
                    "media_type": b["media_type"],
                    "feature": feats,
                    "n_bytes": b["payload"].str.len(),
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one row per planned frame timestamp
    (the decode itself is the stubbed kernel above). Pure JVM explode."""
    return media.where(F.col("media_type") == "video").select(
        "key",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ms"),
    )
