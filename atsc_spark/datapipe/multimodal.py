"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schemas, Arrow batch shapes, mapInPandas
signatures, partition sizing — is real and tested.  The actual media
decoding is STUBBED: this container ships no image/audio libraries, so
`decode_image`/`decode_audio` either raise NotImplementedError (strict
mode) or produce a deterministic fake derived from the bytes (test
mode).  Swapping in Pillow/soundfile/PyAV is a one-function change;
nothing in the distribution shape moves.

Scale notes:
- media blobs ride in the `content` binary column; Arrow transfers
  them zero-copy per batch.  `media_repartition` bounds the bytes per
  task so a partition of 100 MB+ blobs cannot blow executor memory.
- feature extraction returns fixed-width arrays (embedding-like), so
  downstream joins/ANN reuse the similarity operators unchanged.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, mime string, width int, height int, "
    "duration_ms int, content binary"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, sha256 string, features array<float>"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_ts_ms int, frame_sha string"

STRICT = False  # set True to surface NotImplementedError instead of fakes


def _fake_pixels(content: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: pseudo-pixels seeded by the blob
    digest.  Stands in for Pillow/cv2 (not installed here)."""
    if STRICT:
        raise NotImplementedError("image decoding requires Pillow/cv2 (not in container)")
    seed = int.from_bytes(hashlib.sha256(content).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def decode_and_featurize_images(media: DataFrame, feature_dim: int = 16) -> DataFrame:
    """binary content -> fixed-width feature vector per image.

    mapInPandas: one Arrow batch in, one out; decode + channel-stat
    features are vectorized numpy per image.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                content = bytes(row.content)
                px = _fake_pixels(content, int(row.width), int(row.height))
                # channel means/stds + downsampled grid -> fixed width
                feats = np.concatenate(
                    [
                        px.mean(axis=(0, 1)) / 255.0,
                        px.std(axis=(0, 1)) / 255.0,
                        np.resize(px.mean(axis=2), feature_dim - 6) / 255.0,
                    ]
                ).astype(np.float32)
                rows.append(
                    {
                        "media_id": row.media_id,
                        "width": int(row.width),
                        "height": int(row.height),
                        "sha256": hashlib.sha256(content).hexdigest(),
                        "features": feats.tolist(),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "sha256", "features"]
            )

    return media.filter(F.col("kind") == "image").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: emits one row per sampled frame with a
    deterministic per-frame digest (the stub for actual PyAV frame
    extraction).  Row explosion happens executor-side in the UDF, so a
    long video never materializes as one driver row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                if STRICT:
                    raise NotImplementedError("video decoding requires PyAV")
                content = bytes(row.content)
                duration = int(row.duration_ms or 0)
                for i, ts in enumerate(range(0, max(duration, 1), every_ms)):
                    digest = hashlib.sha256(content + struct.pack("<I", i)).hexdigest()[:16]
                    rows.append(
                        {
                            "media_id": row.media_id,
                            "frame_idx": i,
                            "frame_ts_ms": ts,
                            "frame_sha": digest,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_ts_ms", "frame_sha"]
            )

    return media.filter(F.col("kind") == "video").mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def media_repartition(media: DataFrame, target_bytes_per_task: int = 128 << 20) -> DataFrame:
    """Size partitions by *bytes*, not rows: blobs are wildly variable.
    Uses a running estimate from the metadata (length of content)."""
    sized = media.withColumn("__bytes", F.length("content").cast("long"))
    total = sized.agg(F.sum("__bytes").alias("b")).collect()[0].b or 1
    parts = max(1, int(total // target_bytes_per_task) + 1)
    return sized.repartition(parts, "media_id").drop("__bytes")


def synthetic_media(spark, n: int = 50, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (no external data)."""
    rows = []
    rng = np.random.default_rng(seed)
    for i in range(n):
        kind = ["image", "video", "audio"][i % 3]
        w, h = (int(rng.integers(16, 64)), int(rng.integers(16, 64)))
        content = bytes(rng.integers(0, 256, size=int(rng.integers(64, 2048)), dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "video": "video/mp4", "audio": "audio/wav"}[kind],
                w,
                h,
                int(rng.integers(1000, 10000)) if kind != "image" else 0,
                content,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
