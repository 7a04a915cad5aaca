"""Multimodal column processing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct —
the reference's `binary` mapper analog (/root/reference/src/main/java/org/
elasticsearch/index/mapper/core/BinaryFieldMapper.java), extended with the
batch plumbing a training pipeline needs.

Decode support is split honestly by codec availability:
- REAL decoders (no external libs needed): PPM (P6) images via numpy,
  WAV (PCM16) audio via the stdlib ``wave`` module — decode, resize
  (nearest-neighbor), frame/sample statistics all actually run and are
  value-tested.
- STUBS at the exact swap point: compressed codecs (jpeg/png/mp3/mp4)
  raise NotImplementedError naming the library that belongs there
  (PIL/ffmpeg are not in this container). The Spark-side contract —
  schema, mapInPandas Arrow batch iteration, partition sizing — is
  identical for both, so swapping the kernel is a one-function change.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "key long, media_type string, format string, payload binary, width int, "
    "height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "key long, media_type string, feature array<float>, n_bytes int"
)

DECODED_IMAGE_SCHEMA = (
    "key long, width int, height int, mean_r float, mean_g float, "
    "mean_b float, thumb array<float>"
)

DECODED_AUDIO_SCHEMA = (
    "key long, n_samples int, sample_rate int, rms float, peak float"
)


# --- real encoders (deterministic synthetic media) ------------------------


def _ppm_bytes(key: int, w: int, h: int) -> bytes:
    """Deterministic P6 PPM image: per-pixel values from a seeded LCG."""
    rng = np.random.default_rng(key)
    pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    return b"P6\n%d %d\n255\n" % (w, h) + pix.tobytes()


def _wav_bytes(key: int, n_samples: int, rate: int = 8000) -> bytes:
    """Deterministic mono PCM16 WAV: a seeded sine + noise mixture."""
    rng = np.random.default_rng(key)
    t = np.arange(n_samples, dtype=np.float64)
    freq = 100.0 + (key % 17) * 50.0
    sig = 0.5 * np.sin(2 * np.pi * freq * t / rate) + 0.1 * rng.standard_normal(
        n_samples
    )
    pcm = np.clip(sig * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


def synthesize_media(df: DataFrame, key_col: str, text_col: str) -> DataFrame:
    """Deterministic media table from a keyed corpus: REAL ppm/wav payloads
    (decodable in-container) for image/audio rows; 'video' rows carry the
    utf-8 text as an opaque mp4 stand-in exercising the stub path."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for key, text in zip(b["key"], b["text"]):
                key = int(key)
                kind = key % 3
                if kind == 0:
                    w, h = 8 + key % 9, 6 + key % 7
                    rows.append(
                        (key, "image", "ppm", _ppm_bytes(key, w, h), w, h, 0)
                    )
                elif kind == 1:
                    n = 800 + (key % 5) * 400
                    rows.append(
                        (key, "audio", "wav", _wav_bytes(key, n), 0, 0,
                         int(n * 1000 / 8000))
                    )
                else:
                    payload = (text or "").encode()
                    rows.append(
                        (key, "video", "mp4", payload, 640, 360,
                         1000 + (key % 60) * 1000)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "key", "media_type", "format", "payload", "width",
                    "height", "duration_ms",
                ],
            )

    src = df.select(
        F.col(key_col).cast("long").alias("key"), F.col(text_col).alias("text")
    )
    return src.mapInPandas(kernel, MEDIA_SCHEMA)


# --- real decoders --------------------------------------------------------


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 PPM → (h, w, 3) uint8 array. Pure numpy, no imaging library."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    parts = payload.split(b"\n", 3)
    w, h = (int(v) for v in parts[1].split())
    data = parts[3][: w * h * 3]
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize — the thumbnailing kernel, pure numpy."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV (PCM16 mono) → (float samples in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        rate = f.getframerate()
        raw = f.readframes(f.getnframes())
    pcm = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    return pcm, rate


def _stub_decode(fmt: str) -> None:
    raise NotImplementedError(
        f"decoding '{fmt}' requires an external codec library "
        "(PIL for jpeg/png, ffmpeg for mp3/mp4) — not in this container. "
        "ppm/wav payloads decode natively; swap this branch when the "
        "library is available."
    )


def decode_images(media: DataFrame, thumb: int = 4) -> DataFrame:
    """Decode image payloads → per-image stats + a thumb×thumb grayscale
    thumbnail (real for ppm; stub branch for compressed formats)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for key, fmt, payload in zip(b["key"], b["format"], b["payload"]):
                if fmt != "ppm":
                    _stub_decode(fmt)
                img = decode_ppm(payload)
                means = img.reshape(-1, 3).mean(axis=0)
                tn = resize_nearest(img, thumb, thumb).mean(axis=2)
                rows.append(
                    (
                        int(key), img.shape[1], img.shape[0],
                        float(means[0]), float(means[1]), float(means[2]),
                        (tn.ravel() / 255.0).astype(np.float32),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "key", "width", "height", "mean_r", "mean_g", "mean_b",
                    "thumb",
                ],
            )

    return media.where(F.col("media_type") == "image").mapInPandas(
        kernel, DECODED_IMAGE_SCHEMA
    )


def decode_audio(media: DataFrame) -> DataFrame:
    """Decode audio payloads → sample stats (real for wav; stub branch
    for compressed formats)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for key, fmt, payload in zip(b["key"], b["format"], b["payload"]):
                if fmt != "wav":
                    _stub_decode(fmt)
                pcm, rate = decode_wav(payload)
                rows.append(
                    (
                        int(key), int(pcm.size), int(rate),
                        float(np.sqrt(np.mean(pcm**2))) if pcm.size else 0.0,
                        float(np.abs(pcm).max()) if pcm.size else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["key", "n_samples", "sample_rate", "rms", "peak"],
            )

    return media.where(F.col("media_type") == "audio").mapInPandas(
        kernel, DECODED_AUDIO_SCHEMA
    )


# --- generic featurizer (all media types) ---------------------------------


def _byte_histogram(payload: bytes, dim: int) -> np.ndarray:
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(dim, dtype=np.float32)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
    n = np.linalg.norm(hist)
    return hist / n if n else hist


def extract_features(
    media: DataFrame, dim: int = 32, decode_stub: bool = True
) -> DataFrame:
    """Uniform featurizer via mapInPandas (Arrow binary batches): images
    use decoded pixel bytes (real for ppm), audio uses decoded samples
    (real for wav), opaque formats fall back to a payload byte histogram
    (decode_stub=True) or raise at the codec swap point."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = []
            for fmt, payload in zip(b["format"], b["payload"]):
                if fmt == "ppm":
                    feats.append(
                        _byte_histogram(decode_ppm(payload).tobytes(), dim)
                    )
                elif fmt == "wav":
                    pcm, _ = decode_wav(payload)
                    q = ((pcm + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
                    feats.append(_byte_histogram(q.tobytes(), dim))
                elif decode_stub:
                    feats.append(_byte_histogram(payload, dim))
                else:
                    _stub_decode(fmt)
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
    (the mp4 frame decode is the stubbed kernel above). Pure JVM explode."""
    return media.where(F.col("media_type") == "video").select(
        "key",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ms"),
    )
