"""Multimodal column plumbing: schemas, Arrow batch shapes, deterministic
fake decode, metadata ops, frame explosion (the codec itself is stubbed —
see operators/multimodal.py)."""

from __future__ import annotations

import numpy as np
import pytest

from search_engine_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_features,
    decode_media,
    frame_sample,
    resize_meta,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, 60, seed=42).cache()


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_media(b"\x00\x01", "image")


def test_decode_fake_is_deterministic():
    a = decode_media(b"same-bytes", "image", fake=True)
    b = decode_media(b"same-bytes", "video", fake=True)
    c = decode_media(b"other-bytes", "image", fake=True)
    assert np.array_equal(a, b)          # content-addressed, kind-agnostic
    assert not np.array_equal(a, c)
    assert a.shape == (FEATURE_DIM,) and a.dtype == np.float32


def test_decode_features_spark(media):
    rows = decode_features(media, fake=True).collect()
    assert len(rows) == 60
    by_id = {r["media_id"]: r for r in rows}
    # spark output == pure-python decode of the same payload
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, payload in list(payloads.items())[:5]:
        exp = decode_media(payload, "x", fake=True)
        assert np.allclose(by_id[mid]["features"], exp, atol=1e-6)
    assert all(len(r["features"]) == FEATURE_DIM for r in rows)


def test_resize_meta(media):
    rows = resize_meta(media, max_side=256).collect()
    for r in rows:
        if r["width"] is None:
            assert r["out_width"] == -1  # audio: no spatial dims
            continue
        assert max(r["out_width"], r["out_height"]) <= 256
        if max(r["width"], r["height"]) <= 256:  # never upscale
            assert (r["out_width"], r["out_height"]) == (r["width"], r["height"])
        else:  # exact spec: round(dim * scale), scale clamps longer side
            scale = 256 / max(r["width"], r["height"])
            assert r["out_width"] == round(r["width"] * scale)
            assert r["out_height"] == round(r["height"] * scale)
        assert bytes(r["payload"])  # opaque passthrough


def test_frame_sample(media):
    frames = frame_sample(media, every_s=2.0).collect()
    vids = {
        r["media_id"]: r for r in media.collect() if r["kind"] == "video"
    }
    assert frames and {f["media_id"] for f in frames} == set(vids)
    for mid, v in vids.items():
        mine = sorted(
            (f for f in frames if f["media_id"] == mid),
            key=lambda f: f["frame_idx"],
        )
        assert len(mine) == int(v["duration_s"] // 2.0) + 1
        assert mine[0]["t_offset_s"] == 0.0
        assert all(f["frame_idx"] == int(f["t_offset_s"] * 24.0) for f in mine)


def test_features_feed_ann_shape(media, spark):
    """Decoded features slot into the ANN path's array<float> shape."""
    from pyspark.sql import functions as F

    feats = decode_features(media, fake=True)
    dot = feats.select(
        "media_id",
        F.aggregate(
            F.zip_with(
                "features", "features", lambda a, b: a.cast("double") * b
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("norm_sq"),
    ).collect()
    assert all(r["norm_sq"] > 0 for r in dot)
