"""Multimodal pipeline: REAL ppm/wav decode kernels + stubbed codecs.

The decode math is value-checked against direct numpy computation on the
same payload bytes — not just shape checks."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.pipeline import multimodal as mm

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    return mm.synthesize_media(docs, "doc_id", "text").cache()


def test_media_types_and_formats(media):
    rows = media.select("media_type", "format").distinct().collect()
    pairs = {(r["media_type"], r["format"]) for r in rows}
    assert pairs == {("image", "ppm"), ("audio", "wav"), ("video", "mp4")}


def test_image_decode_values(media):
    got = {r["key"]: r for r in mm.decode_images(media, thumb=4).collect()}
    src = {r["key"]: r for r in media.where(F.col("media_type") == "image").collect()}
    assert got and set(got) == set(src)
    for key, r in got.items():
        img = mm.decode_ppm(bytes(src[key]["payload"]))
        assert (r["width"], r["height"]) == (img.shape[1], img.shape[0])
        means = img.reshape(-1, 3).mean(axis=0)
        assert abs(r["mean_r"] - means[0]) < 1e-3
        assert abs(r["mean_b"] - means[2]) < 1e-3
        assert len(r["thumb"]) == 16
        want_thumb = mm.resize_nearest(img, 4, 4).mean(axis=2).ravel() / 255.0
        assert np.allclose(np.array(r["thumb"]), want_thumb, atol=1e-6)


def test_audio_decode_values(media):
    got = {r["key"]: r for r in mm.decode_audio(media).collect()}
    src = {r["key"]: r for r in media.where(F.col("media_type") == "audio").collect()}
    assert got and set(got) == set(src)
    for key, r in got.items():
        pcm, rate = mm.decode_wav(bytes(src[key]["payload"]))
        assert r["sample_rate"] == rate == 8000
        assert r["n_samples"] == pcm.size
        assert abs(r["rms"] - float(np.sqrt(np.mean(pcm**2)))) < 1e-6  # float32 column
        # the seeded sine dominates: rms near 0.5/sqrt(2)
        assert 0.2 < r["rms"] < 0.7


def test_feature_extraction_all_types(media):
    feats = mm.extract_features(media, dim=16).collect()
    assert len(feats) == media.count()
    for r in feats:
        v = np.array(r["feature"])
        assert v.shape == (16,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5 or np.allclose(v, 0)


def test_stub_raises_at_codec_boundary(media):
    with pytest.raises(Exception) as ei:
        mm.extract_features(
            media.where(F.col("media_type") == "video"), decode_stub=False
        ).collect()
    assert "NotImplementedError" in str(ei.value) or "ffmpeg" in str(ei.value)


def test_frame_sample_plan(media):
    plan = mm.frame_sample_plan(media, every_ms=500)
    vid = media.where(F.col("media_type") == "video").collect()
    counts = {
        r["key"]: r["n"]
        for r in plan.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in vid:
        assert counts[r["key"]] == r["duration_ms"] // 500 + 1
