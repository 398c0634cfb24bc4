"""Dependency-free baseline JPEG codec (functions/jpeg.py): encode →
decode roundtrips within quantization error for 4:4:4 and 4:2:0, odd
sizes, grayscale; marker robustness; honest NotImplementedError on
progressive; integration through operators/multimodal.decode_image and
the Spark feature stage."""

from __future__ import annotations

import numpy as np
import pytest

from search_engine_spark.functions.jpeg import decode_jpeg, encode_jpeg


def _test_image(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 / max(w - 1, 1),
            yy * 255 / max(h - 1, 1),
            127 + 100 * np.sin(xx / 9.0) * np.cos(yy / 7.0),
        ],
        axis=2,
    ).clip(0, 255).astype(np.uint8)


@pytest.mark.parametrize("subsample", ["444", "420"])
@pytest.mark.parametrize("hw", [(41, 57), (64, 64), (17, 130)])
def test_roundtrip_smooth(subsample, hw):
    img = _test_image(*hw)
    enc = encode_jpeg(img, quality=90, subsample=subsample)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    dec = decode_jpeg(enc)
    assert dec.shape == img.shape and dec.dtype == np.uint8
    err = np.abs(dec.astype(float) - img.astype(float)).mean()
    assert err < (2.0 if subsample == "444" else 5.0), (subsample, hw, err)


def test_quality_monotone():
    img = _test_image(48, 48)
    sizes, errs = [], []
    for q in (30, 60, 90):
        enc = encode_jpeg(img, quality=q)
        sizes.append(len(enc))
        errs.append(
            np.abs(decode_jpeg(enc).astype(float) - img.astype(float)).mean()
        )
    assert sizes[0] < sizes[2]  # higher quality → more bytes
    assert errs[0] > errs[2]    # ... and less error


def test_grayscale_and_flat():
    g = _test_image(33, 29)[:, :, 0]
    dec = decode_jpeg(encode_jpeg(g, quality=95))
    assert dec.shape == (33, 29, 3)
    assert np.abs(dec[:, :, 0].astype(float) - g.astype(float)).mean() < 1.0
    flat = np.full((16, 16, 3), 200, dtype=np.uint8)
    dec2 = decode_jpeg(encode_jpeg(flat, quality=90))
    assert np.abs(dec2.astype(int) - 200).max() <= 2


def test_progressive_raises_honestly():
    img = _test_image(16, 16)
    enc = bytearray(encode_jpeg(img))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="SOF2"):
        decode_jpeg(bytes(enc))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")


def test_multimodal_integration(spark):
    """JPEG payloads flow through decode_image and the REAL (fake=False)
    Spark feature stage; features match the PPM encoding of the same
    pixels decoded back (same pixel source, codec-independent shape)."""
    from search_engine_spark.operators.multimodal import (
        MEDIA,
        decode_features,
        decode_image,
        encode_ppm,
    )

    img = _test_image(40, 56)
    jp = encode_jpeg(img, quality=92)
    px = decode_image(jp)
    assert px.shape == img.shape
    rows = [
        (1, "image", bytearray(jp), 56, 40, None, None),
        (2, "image", bytearray(encode_ppm(px)), 56, 40, None, None),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA)
    out = {
        r["media_id"]: r["features"]
        for r in decode_features(df, fake=False).collect()
    }
    # row 2 encodes row 1's DECODED pixels losslessly → identical features
    assert out[1] == out[2]
    assert len(out[1]) == 32
