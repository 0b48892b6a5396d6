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


# --------------------------- real decode paths (RGB8 / VID8), round 2

def _img(seed, h=6, w=8):
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_rawrgb_roundtrip_and_real_features(spark):
    import numpy as np

    arr = _img(1)
    assert (M.decode_rawrgb(M.encode_rawrgb(arr)) == arr).all()
    df = spark.createDataFrame(
        [("a", "image", bytearray(M.encode_rawrgb(arr)))],
        "asset_id string, kind string, bytes binary",
    )
    # fake=False: RGB8 must decode for real, no stub on this path
    feat = M.extract_features(df, fake=False, feature_dtype="double").collect()[0]
    w, h = arr.shape[1], arr.shape[0]
    flat = arr.reshape(-1, 3).astype("float64")
    want = [
        float(w), float(h),
        flat[:, 0].sum() / (h * w) / 255.0,
        flat[:, 1].sum() / (h * w) / 255.0,
        flat[:, 2].sum() / (h * w) / 255.0,
        flat.sum() / (h * w * 3) / 255.0,
        float(arr.min()) / 255.0, float(arr.max()) / 255.0,
    ]
    assert list(feat["feature"]) == pytest.approx(want, abs=0)
    assert feat["n_bytes"] == 8 + h * w * 3


def test_resize_rawrgb_real(spark):
    import numpy as np

    arr = _img(2, h=8, w=8)
    df = spark.createDataFrame(
        [("a", bytearray(M.encode_rawrgb(arr)))], "asset_id string, bytes binary"
    )
    out = M.resize_rawrgb(df, out_w=4, out_h=4).collect()[0]
    got = M.decode_rawrgb(bytes(out["bytes"]))
    # nearest-neighbor: every output pixel is an actual input pixel at 2x stride
    assert got.shape == (4, 4, 3)
    assert (got == arr[::2, ::2]).all()


def test_sample_frames_rawvid_real(spark):
    import hashlib

    import numpy as np

    frames = np.stack([_img(i, h=4, w=4) for i in range(5)])
    vid = M.encode_rawvid(frames)
    df = spark.createDataFrame(
        [("v", "video", bytearray(vid), (4, 4, 5000, "video/raw"))], M.MEDIA_SCHEMA
    )
    got = M.sample_frames(df, fake=False, stride=2).collect()
    assert {r["frame_idx"] for r in got} == {0, 2, 4}
    by_idx = {r["frame_idx"]: r["frame_sha"] for r in got}
    for i in (0, 2, 4):
        assert by_idx[i] == hashlib.sha256(frames[i].tobytes()).hexdigest()
