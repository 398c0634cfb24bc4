"""Dependency-free PNG codec (functions/png.py): lossless roundtrip,
all five scanline filters reconstructed from hand-filtered streams,
palette / alpha color types, honest NotImplementedError on interlace,
and dispatch through multimodal.decode_image."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from search_engine_spark.functions.png import decode_png, encode_png


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_roundtrip_lossless():
    img = _img(23, 31)
    assert np.array_equal(decode_png(encode_png(img)), img)
    g = _img(9, 14)[:, :, 0]
    dg = decode_png(encode_png(g))
    assert np.array_equal(dg[:, :, 0], g) and dg.shape == (9, 14, 3)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_from_raw(w, h, ctype, raw, plte=None):
    out = b"\x89PNG\r\n\x1a\n"
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    out += _chunk(b"IDAT", zlib.compress(raw))
    return out + _chunk(b"IEND", b"")


def test_all_filters_reconstruct():
    """Apply each spec filter by hand to a known image; the decoder must
    reconstruct the original pixels exactly."""
    img = _img(6, 5, seed=3)
    h, w = img.shape[:2]
    bpp = 3
    flat = img.reshape(h, w * bpp).astype(np.int64)
    raw = bytearray()
    for y, ftype in zip(range(h), [0, 1, 2, 3, 4, 1]):
        cur = flat[y]
        prior = flat[y - 1] if y else np.zeros(w * bpp, dtype=np.int64)
        if ftype == 0:
            enc = cur
        elif ftype == 1:
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
            enc = (cur - left) % 256
        elif ftype == 2:
            enc = (cur - prior) % 256
        elif ftype == 3:
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
            enc = (cur - ((left + prior) >> 1)) % 256
        else:  # Paeth
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, dtype=np.int64), prior[:-bpp]])
            p = left + prior - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prior, ul))
            enc = (cur - pred) % 256
        raw += bytes([ftype]) + bytes(enc.astype(np.uint8))
    got = decode_png(_png_from_raw(w, h, 2, bytes(raw)))
    assert np.array_equal(got, img)


def test_palette_and_alpha_types():
    # palette: 4 colors, 3x4 indices
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9])
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 2, 2]], np.uint8)
    raw = b"".join(b"\x00" + r.tobytes() for r in idx)
    got = decode_png(_png_from_raw(4, 3, 3, raw, plte=plte))
    pal = np.frombuffer(plte, np.uint8).reshape(4, 3)
    assert np.array_equal(got, pal[idx])
    # RGBA: alpha 0 -> white, alpha 255 -> the color
    rgba = np.zeros((1, 2, 4), np.uint8)
    rgba[0, 0] = (10, 20, 30, 255)
    rgba[0, 1] = (10, 20, 30, 0)
    raw = b"\x00" + rgba.tobytes()
    got = decode_png(_png_from_raw(2, 1, 6, raw))
    assert got[0, 0].tolist() == [10, 20, 30]
    assert got[0, 1].tolist() == [255, 255, 255]
    # grey+alpha half transparency composites toward white
    ga = np.array([[[100, 128]]], np.uint8)
    got = decode_png(_png_from_raw(1, 1, 4, b"\x00" + ga.tobytes()))
    assert 170 <= got[0, 0, 0] <= 186  # 100*0.502 + 255*0.498 ≈ 178


def test_interlace_and_garbage_raise():
    img = _img(8, 8)
    enc = bytearray(encode_png(img))
    # IHDR interlace byte is the last byte of the 13-byte IHDR data
    ih = enc.find(b"IHDR")
    enc[ih + 4 + 12] = 1
    # CRC now wrong but the decoder (by design) doesn't verify CRCs
    with pytest.raises(NotImplementedError, match="Adam7"):
        decode_png(bytes(enc))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"definitely not a png")


def test_multimodal_dispatch():
    from search_engine_spark.operators.multimodal import decode_image

    img = _img(12, 17)
    assert np.array_equal(decode_image(encode_png(img)), img)
