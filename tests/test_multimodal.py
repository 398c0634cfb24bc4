"""Multimodal column plumbing: schemas, Arrow batch shapes, deterministic
fake decode, metadata ops, frame explosion — plus the REAL
dependency-free codecs (WAV-PCM, PPM, BMP) and the real resize stage
(see operators/multimodal.py)."""

from __future__ import annotations

import numpy as np
import pytest

from search_engine_spark.operators.multimodal import (
    FEATURE_DIM,
    audio_features,
    decode_features,
    decode_image,
    decode_media,
    decode_wav,
    encode_ppm,
    encode_wav,
    frame_sample,
    image_features,
    resize_image_array,
    resize_images,
    resize_meta,
    synthetic_media,
    synthetic_real_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, 60, seed=42).cache()


@pytest.fixture(scope="module")
def real_media(spark):
    return synthetic_real_media(spark, 60, seed=42).cache()


def test_decode_stub_raises_for_video_without_fake():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_media(b"\x00\x01", "video")


def test_decode_rejects_undecodable_image():
    with pytest.raises(ValueError, match="not a P6 PPM"):
        decode_media(b"\x00\x01not-an-image", "image")


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


def test_wav_roundtrip():
    rng = np.random.default_rng(3)
    samples = rng.uniform(-0.9, 0.9, size=1234)
    rate, got = decode_wav(encode_wav(samples, 8000))
    assert rate == 8000
    assert got.shape == samples.shape
    # quantization bound: round-to-nearest at scale 32767, decode at
    # 32768 → error ≤ (0.5 + |x|·1)/32768 < 1.5/32768
    assert np.allclose(got, samples, atol=1.5 / 32768)


def test_wav_stereo_downmix_and_8bit():
    import struct

    # hand-build a stereo 16-bit WAV: L=+0.5, R=-0.5 → mono mean 0
    frames = np.array([16384, -16384] * 50, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(frames)) + frames
    rate, mono = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert rate == 8000 and mono.shape == (50,)
    assert np.allclose(mono, 0.0)
    # 8-bit unsigned: 128 → 0.0, 255 → ~+1, 0 → -1
    data8 = bytes([128, 255, 0])
    fmt8 = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    b8 = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt8)) + fmt8
    b8 += b"data" + struct.pack("<I", len(data8)) + data8
    _, x8 = decode_wav(b"RIFF" + struct.pack("<I", len(b8)) + b8)
    assert np.allclose(x8, [0.0, 127 / 128, -1.0])


def test_ppm_roundtrip_and_comment_header():
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, size=(11, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_ppm(arr)), arr)
    # comment in the header parses too
    with_comment = b"P6\n# a comment\n7 11\n255\n" + arr.tobytes()
    assert np.array_equal(decode_image(with_comment), arr)


def test_bmp_decode_bottom_up_with_padding():
    import struct

    # 3x2 24-bit BMP, bottom-up, stride padded to 12 bytes (3*3=9 → 12)
    rgb = np.array(
        [[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
         [[10, 20, 30], [40, 50, 60], [70, 80, 90]]],
        dtype=np.uint8,
    )
    stride = 12
    raster = b""
    for row in rgb[::-1]:  # bottom-up
        line = b"".join(bytes([p[2], p[1], p[0]]) for p in row)  # BGR
        raster += line + b"\x00" * (stride - len(line))
    info = struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 24, 0, len(raster),
                       2835, 2835, 0, 0)
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(raster), 0, 0, 54)
    assert np.array_equal(decode_image(hdr + info + raster), rgb)


def test_real_decode_features_spark(real_media):
    """decode_features(fake=False) really decodes WAV/PPM payloads in
    the Spark kernel: output matches the driver-side codec run."""
    imgs_audio = real_media.filter("kind != 'video'")
    rows = decode_features(imgs_audio, fake=False).collect()
    assert rows and all(len(r["features"]) == FEATURE_DIM for r in rows)
    by_id = {r["media_id"]: np.array(r["features"]) for r in rows}
    for r in imgs_audio.collect()[:8]:
        payload = bytes(r["payload"])
        if r["kind"] == "image":
            exp = image_features(decode_image(payload))
        else:
            exp = audio_features(decode_wav(payload)[1])
        assert np.allclose(by_id[r["media_id"]], exp, atol=1e-6), r["media_id"]
    # real features are content-derived: distinct payloads → distinct
    vals = list(by_id.values())
    assert not np.allclose(vals[0], vals[1])


def test_resize_images_real(real_media):
    """The real resize stage: decoded output dims obey the resize_meta
    clamp plan and the raster equals the nearest-neighbor reference."""
    imgs = real_media.filter("kind = 'image'")
    out = {r["media_id"]: r for r in resize_images(imgs, max_side=16).collect()}
    src = {r["media_id"]: bytes(r["payload"]) for r in imgs.collect()}
    assert set(out) == set(src)
    shrunk = 0
    for mid, payload in src.items():
        arr = decode_image(payload)
        h, w = arr.shape[:2]
        scale = min(1.0, 16 / max(w, h))
        ow, oh = round(w * scale), round(h * scale)
        r = out[mid]
        assert (r["out_width"], r["out_height"]) == (ow, oh)
        got = decode_image(bytes(r["payload"]))
        exp = arr if (ow, oh) == (w, h) else resize_image_array(arr, ow, oh)
        assert np.array_equal(got, exp), mid
        shrunk += (ow, oh) != (w, h)
    assert shrunk  # the fixture actually exercised downscaling


def test_resize_images_rejects_non_image(real_media):
    with pytest.raises(Exception, match="images only"):
        resize_images(real_media.filter("kind = 'audio'"), 16).collect()


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
