"""Multimodal plumbing: schema, Arrow batch shape, stubbed decode."""

import hashlib

import pytest
from pyspark.sql import functions as F

from cryptowalletcommunitydetection_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("img1", "image", b"\x89PNGfakebytes1", (64, 48, None, "image/png")),
        ("img2", "image", b"\x89PNGfakebytes2", (32, 32, None, "image/png")),
        ("aud1", "audio", b"RIFFfakeaudio", (None, None, 2500, "audio/wav")),
        ("vid1", "video", b"ftypfakevideo", (640, 360, 3500, "video/mp4")),
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_extract_features_deterministic(spark, media):
    f1 = {r["asset_id"]: r["feature"] for r in M.extract_features(media).collect()}
    f2 = {r["asset_id"]: r["feature"] for r in M.extract_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == 8 for v in f1.values())
    assert f1["img1"] != f1["img2"]


def test_extract_features_real_decode_is_stubbed(spark, media):
    with pytest.raises(Exception) as exc:
        M.extract_features(media, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_sample_frames(spark, media):
    frames = M.sample_frames(media, every_ms=1000).collect()
    assert len(frames) == 3  # vid1: 3500ms -> frames 0,1,2
    assert {f["frame_idx"] for f in frames} == {0, 1, 2}
    base = hashlib.sha256(b"ftypfakevideo").hexdigest()
    want0 = hashlib.sha256(f"{base}:0".encode()).hexdigest()
    assert [f["frame_sha"] for f in sorted(frames, key=lambda r: r["frame_idx"])][0] == want0


def test_media_stats_jvm_only(spark, media):
    stats = M.media_stats(media)
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    got = {r["kind"]: r["n_assets"] for r in stats.collect()}
    assert got == {"image": 2, "audio": 1, "video": 1}
