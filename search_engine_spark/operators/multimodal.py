"""Multimodal columns: opaque binary media + typed metadata over Spark.

Treats image/audio/video payloads as ``binary`` columns with a typed
metadata struct, processed by Arrow-batched ``mapInPandas`` stages. The
actual codec work (image decode, resampling, frame extraction) requires
libraries not present in this container, so the codec boundary is
STUBBED: ``decode_media`` raises ``NotImplementedError`` unless the
deterministic fake decoder is requested. Everything Spark-side — schema,
partitioning, UDF signatures, Arrow batch shapes, metadata propagation —
is real and tested (tests/test_multimodal.py).

Pipeline stages (each a mapInPandas over MEDIA-schema batches):

- ``decode_features``  — media bytes → fixed-dim float feature vector
  (fake decoder: seeded from a stable content digest, so features are
  deterministic and equality-testable without any codec library).
- ``resize_meta``      — image resize planning: new (width, height)
  honoring aspect ratio; pure-metadata op, bytes passed through opaque.
- ``frame_sample``     — video frame sampling: explodes one row per
  sampled frame index given duration/fps metadata (1 row → N rows, the
  UDTF-ish shape done with mapInPandas).

These compose with the embedding ANN path (contract.py ann_*): decoded
features land in the same ``array<float>`` column shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),       # image|audio|video
        StructField("payload", BinaryType(), False),    # opaque encoded bytes
        StructField("width", IntegerType()),            # image/video
        StructField("height", IntegerType()),
        StructField("duration_s", DoubleType()),        # audio/video
        StructField("fps", DoubleType()),               # video
    ]
)

FEATURE_DIM = 32

MEDIA_FEATURES = StructType(
    MEDIA.fields[:2] + [StructField("features", ArrayType(FloatType()), False)]
)

RESIZED = StructType(
    MEDIA.fields
    + [
        StructField("out_width", IntegerType(), False),
        StructField("out_height", IntegerType(), False),
    ]
)

FRAMES = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("t_offset_s", DoubleType(), False),
        StructField("payload", BinaryType(), False),
    ]
)


def decode_media(payload: bytes, kind: str, fake: bool = False) -> np.ndarray:
    """Codec boundary. Real decoders (PIL/ffmpeg/soundfile) are not in
    this container — the ``fake`` path derives a deterministic float32
    vector from a content digest, preserving the exact downstream shape."""
    if not fake:
        raise NotImplementedError(
            f"no {kind} codec in this environment; pass fake=True for the "
            "deterministic stub (same output schema/shape as a real decoder)"
        )
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


def decode_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """media → (media_id, kind, features[FEATURE_DIM]) via mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_media(p, k, fake=fake).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=MEDIA_FEATURES)


def resize_meta(media: DataFrame, max_side: int) -> DataFrame:
    """Resize planning: clamp the longer side to ``max_side`` preserving
    aspect ratio (vectorized metadata math; payload passes through)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["width"].to_numpy(dtype=float)
            h = pdf["height"].to_numpy(dtype=float)
            with np.errstate(invalid="ignore", divide="ignore"):
                scale = np.minimum(1.0, max_side / np.maximum(w, h))
            ow = np.where(np.isnan(scale), -1, np.round(w * scale)).astype(int)
            oh = np.where(np.isnan(scale), -1, np.round(h * scale)).astype(int)
            out = pdf.copy()
            out["out_width"] = ow
            out["out_height"] = oh
            yield out

    return media.mapInPandas(run, schema=RESIZED)


def frame_sample(media: DataFrame, every_s: float) -> DataFrame:
    """One output row per sampled frame (videos only): frame_idx at
    ``every_s``-second intervals from duration/fps metadata."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            vids = pdf[pdf["kind"] == "video"]
            for r in vids.itertuples(index=False):
                if not r.duration_s or not r.fps:
                    continue
                n = int(r.duration_s // every_s) + 1
                for i in range(n):
                    t = i * every_s
                    rows.append(
                        (r.media_id, int(t * r.fps), float(t), r.payload)
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "t_offset_s", "payload"]
            )

    return media.mapInPandas(run, schema=FRAMES)


def synthetic_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (no external data): payload bytes
    derived from (seed, media_id); kinds cycle image/audio/video."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                payload,
                int(rng.integers(64, 1920)) if kind != "audio" else None,
                int(rng.integers(64, 1080)) if kind != "audio" else None,
                float(rng.uniform(1, 30)) if kind != "image" else None,
                24.0 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA)
