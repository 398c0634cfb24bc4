"""Dependency-free GIF decoder (GIF87a/GIF89a → HxWx3 uint8 RGB).

Public format: GIF89a specification (CompuServe, 1990; W3C mirror) —
LZW-compressed palette images with variable 3–12-bit codes, optional
interlacing, extension blocks, and multi-frame animation. Covered here:

- global and local color tables (any size 2..256);
- the full variable-width LZW decode (clear/end codes, dictionary
  growth to 4095, the deferred-clear quirk, the KwKwK case);
- interlaced images (the 4-pass 8/8/4/2 row schedule);
- extension blocks (graphic control, comment, application — all
  skipped structurally; transparency indices render as their palette
  color, documented divergence);
- animated GIFs decode as their FIRST frame, composited at its
  (left, top) offset on a canvas pre-filled with the background color.

Like functions/jpeg.py, the hot loop is per-CODE Python (a code covers
a growing pixel run, so cost is O(codes), not O(pixels)); the codec
boundary in operators/multimodal.py batches via mapInPandas, so
per-image decode stays off the driver. Reference analog: none (the
reference engine has no media path) — this extends the multimodal
column suite (SURVEY.md training-data-pipeline items).
"""

from __future__ import annotations

import numpy as np


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-LZW decode → uint8 palette indices (exactly ``n_pixels``).

    Variable code width starting at min_code_size+1, growing when the
    NEXT dictionary slot reaches 2^width (cap 12 bits / 4095 entries);
    ``clear`` resets the table, ``end`` terminates. The KwKwK case
    (code == next unassigned slot) resolves as prev + prev[0]."""
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]

    table = list(base)
    width = min_code_size + 1
    prev: bytes | None = None
    out: list[bytes] = []
    got = 0

    acc = 0
    acc_bits = 0
    pos = 0
    n = len(data)
    while got < n_pixels:
        while acc_bits < width:
            if pos >= n:
                raise ValueError("GIF: LZW stream truncated")
            acc |= data[pos] << acc_bits
            acc_bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        acc_bits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"GIF: invalid LZW code {code}")
        out.append(entry)
        got += len(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    idx = np.frombuffer(b"".join(out), dtype=np.uint8)
    if idx.size < n_pixels:
        raise ValueError(
            f"GIF: LZW produced {idx.size} of {n_pixels} pixels"
        )
    return idx[:n_pixels]


def _u16(b: bytes, i: int) -> int:
    return b[i] | (b[i + 1] << 8)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """Interlaced row stream → natural order (the 4-pass schedule)."""
    h = rows.shape[0]
    order = np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a bytes → HxWx3 uint8 RGB (logical-screen sized; the
    FIRST image frame composited at its offset over the background
    color; transparency ignored — see module docstring)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    try:
        return _decode_gif_inner(payload)
    except IndexError:
        raise ValueError("GIF: truncated stream") from None


def _decode_gif_inner(payload: bytes) -> np.ndarray:
    sw, sh = _u16(payload, 6), _u16(payload, 8)
    packed = payload[10]
    bg_idx = payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        if len(payload) < pos + 3 * size:
            raise ValueError("GIF: truncated color table")
        gct = np.frombuffer(
            payload[pos:pos + 3 * size], dtype=np.uint8
        ).reshape(-1, 3)
        pos += 3 * size
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer before any image
            raise ValueError("GIF: no image data")
        if b == 0x21:  # extension: introducer + label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{b:02x}")
        left, top = _u16(payload, pos + 1), _u16(payload, pos + 3)
        w, h = _u16(payload, pos + 5), _u16(payload, pos + 7)
        ipacked = payload[pos + 9]
        pos += 10
        palette = gct
        if ipacked & 0x80:
            size = 2 << (ipacked & 0x07)
            if len(payload) < pos + 3 * size:
                raise ValueError("GIF: truncated color table")
            palette = np.frombuffer(
                payload[pos:pos + 3 * size], dtype=np.uint8
            ).reshape(-1, 3)
            pos += 3 * size
        if palette is None:
            raise ValueError("GIF: image has no color table")
        min_code = payload[pos]
        pos += 1
        chunks = []
        while payload[pos] != 0:
            sz = payload[pos]
            chunks.append(payload[pos + 1:pos + 1 + sz])
            pos += 1 + sz
        pos += 1
        idx = _lzw_decode(b"".join(chunks), min_code, w * h)
        if int(idx.max(initial=0)) >= palette.shape[0]:
            raise ValueError("GIF: palette index out of range")
        frame = palette[idx].reshape(h, w, 3)
        if ipacked & 0x40:
            frame = _deinterlace(frame)
        if (left, top, w, h) == (0, 0, sw, sh):
            return np.ascontiguousarray(frame)
        canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
        if gct is not None and bg_idx < gct.shape[0]:
            canvas[:] = gct[bg_idx]
        canvas[top:top + h, left:left + w] = frame
        return canvas
    raise ValueError("GIF: truncated stream")
