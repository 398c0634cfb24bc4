"""Dependency-free PNG codec (stdlib zlib + numpy).

Round 4: with baseline JPEG (functions/jpeg.py) this makes both
dominant web image formats REAL in ``operators/multimodal.py`` without
PIL. Follows the public PNG spec (RFC 2083 / ISO 15948).

Scope:
- ``decode_png``: 8-bit greyscale (0), truecolor (2), palette (3),
  greyscale+alpha (4), truecolor+alpha (6); all five scanline filters;
  multiple IDAT chunks. 16-bit depths, sub-8-bit palettes and Adam7
  interlace raise ``NotImplementedError`` honestly. Alpha composites
  over WHITE (deterministic, documented), returning HxWx3 uint8 RGB
  like the other image decoders.
- ``encode_png``: 8-bit truecolor (or greyscale), filter 0, one zlib
  stream — the self-verifying fixture source (lossless roundtrip).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunks(payload: bytes):
    pos = 8
    while pos + 8 <= len(payload):
        ln = struct.unpack(">I", payload[pos:pos + 4])[0]
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        yield ctype, data
        pos += 12 + ln  # length + type + data + crc
        if ctype == b"IEND":
            break


def _paeth(a, b, c):
    p = a.astype(np.int64) + b.astype(np.int64) - c.astype(np.int64)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → HxWx3 uint8 RGB (alpha composited over white)."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG payload (bad signature)")
    ihdr = None
    palette = None
    idat = bytearray()
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype_v, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace != 0:
        raise NotImplementedError("Adam7 interlaced PNG")
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} (8 only)")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype_v)
    if channels is None:
        raise ValueError(f"unknown PNG color type {ctype_v}")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG scanline data truncated")
    # unfilter scanline by scanline (filters reference the PRIOR
    # reconstructed row, so this stays a per-row loop by design)
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        prior = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            rec = line
        elif ftype == 1:  # Sub
            rec = line
            for x in range(bpp, stride):
                rec[x] = (int(rec[x]) + int(rec[x - bpp])) & 0xFF
        elif ftype == 2:  # Up
            rec = (line.astype(np.int64) + prior).astype(np.uint8)
        elif ftype == 3:  # Average
            rec = line
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (int(rec[x]) + ((left + int(prior[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = line
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                c = int(prior[x - bpp]) if x >= bpp else 0
                b = int(prior[x])
                rec[x] = (
                    int(rec[x]) + int(_paeth(
                        np.uint8(a), np.uint8(b), np.uint8(c)
                    ))
                ) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = rec
    px = out.reshape(h, w, channels)
    if ctype_v == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        return palette[px[..., 0]]
    if ctype_v == 0:
        return np.repeat(px, 3, axis=2)
    if ctype_v == 2:
        return px
    # alpha types: composite over white
    a = px[..., -1:].astype(np.float64) / 255.0
    rgb = px[..., :-1].astype(np.float64)
    if rgb.shape[2] == 1:
        rgb = np.repeat(rgb, 3, axis=2)
    comp_ = rgb * a + 255.0 * (1.0 - a)
    return np.clip(np.floor(comp_ + 0.5), 0, 255).astype(np.uint8)


def encode_png(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB (or HxW greyscale) → PNG bytes (filter 0,
    lossless — the fixture twin of ``decode_png``)."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    ctype = 0 if gray else 2
    body = arr.reshape(h, -1)
    raw = b"".join(b"\x00" + body[y].tobytes() for y in range(h))

    def chunk(ctype_b: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype_b + data
            + struct.pack(">I", zlib.crc32(ctype_b + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
