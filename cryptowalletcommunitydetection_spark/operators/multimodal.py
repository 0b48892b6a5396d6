"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark side is real and tested — schema, partitioning, Arrow batch
shape, UDF signatures; the actual codecs are NOT in this container, so
the decode kernels are stubbed: ``fake=True`` produces deterministic
features derived from sha256(bytes) (so pipelines are testable end to
end), ``fake=False`` raises NotImplementedError at the decode boundary.

Batch-shape notes for 100 TB: media bytes ride in Arrow record batches —
cap ``spark.sql.execution.arrow.maxRecordsPerBatch`` so batch bytes stay
~10-100 MB; partition by (kind, bucket(asset_id)) so one giant video
doesn't skew a partition.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = "asset_id string, kind string, feature array<float>, n_bytes long"
FRAMES_SCHEMA = "asset_id string, frame_idx int, frame_sha string"


def _fake_feature(data: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real encoder: dim floats from sha256."""
    h = hashlib.sha256(data or b"").digest()
    arr = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (arr.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32).tolist()


def extract_features(df: DataFrame, dim: int = 8, fake: bool = True) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Real codecs (PIL/ffmpeg/torchaudio) are not available in this
    container — ``fake=False`` raises NotImplementedError where the real
    decode would run; the Spark plumbing is identical either way.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires PIL/ffmpeg — not in this container; "
                    "run with fake=True for the deterministic stand-in"
                )
            feats = pdf["bytes"].map(lambda b: _fake_feature(bytes(b or b""), dim))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": pdf["bytes"].map(lambda b: len(b or b"")).astype("int64"),
                }
            )

    return df.select("asset_id", "kind", "bytes").mapInPandas(kernel, FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame.

    The fake kernel derives frame count from meta.duration_ms and frame
    'content' hashes from (asset sha, frame index) — the real kernel
    would decode with ffmpeg at the marked point.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("ffmpeg frame decode not available here")
            rows = []
            for _, r in pdf.iterrows():
                dur = int(r["duration_ms"] or 0)
                base = hashlib.sha256(bytes(r["bytes"] or b"")).hexdigest()
                for i in range(max(dur // every_ms, 0)):
                    rows.append(
                        {
                            "asset_id": r["asset_id"],
                            "frame_idx": i,
                            "frame_sha": hashlib.sha256(f"{base}:{i}".encode()).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "frame_sha"])

    vids = df.filter(F.col("kind") == "video").select(
        "asset_id", "bytes", F.col("meta.duration_ms").alias("duration_ms")
    )
    return vids.mapInPandas(kernel, FRAMES_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Pure-JVM metadata rollup (no decode): per kind, count/bytes/dims."""
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.length("bytes")).alias("total_bytes"),
        F.avg("meta.width").alias("avg_width"),
        F.avg("meta.duration_ms").alias("avg_duration_ms"),
    )
