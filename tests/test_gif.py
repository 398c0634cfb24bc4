"""GIF decoder (functions/gif.py): round-trips against an independent
in-test LZW encoder, the degenerate clear-separated stream (a second
independent path), interlacing, local palettes, sub-frame compositing,
extension skipping, and the decode_image dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from search_engine_spark.functions.gif import decode_gif


# -- independent test-side GIF encoder ---------------------------------------


def _lzw_encode(indices, min_code_size: int) -> bytes:
    """Standard GIF-LZW encoder with a decoder-width simulator for the
    bit packing (the emitted width must match the width the DECODER
    has when it reads each code — decoder state advances one entry per
    non-clear code once a previous code exists)."""
    clear = 1 << min_code_size
    end = clear + 1

    def fresh():
        return {(i,): i for i in range(clear)}

    table = fresh()
    next_code = end + 1
    codes = [clear]
    buf: tuple = ()
    for px in indices:
        cand = buf + (int(px),)
        if cand in table:
            buf = cand
            continue
        codes.append(table[buf])
        table[cand] = next_code
        next_code += 1
        if next_code == 4096:
            codes.append(clear)
            table = fresh()
            next_code = end + 1
        buf = (int(px),)
    if buf:
        codes.append(table[buf])
    codes.append(end)

    out = bytearray()
    acc = acc_bits = 0
    d_width = min_code_size + 1
    d_entries = clear + 2
    prev_seen = False
    for c in codes:
        acc |= c << acc_bits
        acc_bits += d_width
        while acc_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            acc_bits -= 8
        if c == clear:
            d_width = min_code_size + 1
            d_entries = clear + 2
            prev_seen = False
        elif c != end:
            if prev_seen and d_entries < 4096:
                d_entries += 1
                if d_entries == (1 << d_width) and d_width < 12:
                    d_width += 1
            prev_seen = True
    if acc_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _interlace_rows(h: int) -> np.ndarray:
    order = np.concatenate(
        [np.arange(s, h, t) for s, t in ((0, 8), (4, 8), (2, 4), (1, 2))]
    )
    return order


def _make_gif(
    img: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
    local_palette: bool = False,
    offset: tuple[int, int] = (0, 0),
    screen: tuple[int, int] | None = None,
    extensions: bool = False,
    bg_idx: int = 0,
    version: bytes = b"GIF89a",
) -> bytes:
    """Assemble a GIF from an index image + palette (independent
    byte-level writer)."""
    h, w = img.shape
    left, top = offset
    sw, sh = screen or (w + left, h + top)
    n = palette.shape[0]
    bits = max(1, int(np.ceil(np.log2(n))))
    pal_size = 1 << bits
    pal = np.zeros((pal_size, 3), dtype=np.uint8)
    pal[:n] = palette
    out = bytearray(version)
    out += sw.to_bytes(2, "little") + sh.to_bytes(2, "little")
    if local_palette:
        out += bytes([0x00, bg_idx, 0])  # no global table
    else:
        out += bytes([0x80 | (bits - 1), bg_idx, 0])
        out += pal.tobytes()
    if extensions:
        # graphic control + comment extensions — must be skipped
        out += bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
        out += bytes([0x21, 0xFE, 5]) + b"hello" + bytes([0])
    out += bytes([0x2C])
    out += left.to_bytes(2, "little") + top.to_bytes(2, "little")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    ipacked = (0x40 if interlace else 0) | (
        (0x80 | (bits - 1)) if local_palette else 0
    )
    out += bytes([ipacked])
    if local_palette:
        out += pal.tobytes()
    rows = img[_interlace_rows(h)] if interlace else img
    min_code = max(2, bits)
    out += bytes([min_code])
    data = _lzw_encode(rows.ravel(), min_code)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += bytes([0, 0x3B])
    return bytes(out)


def _rand_case(rng, w, h, ncol):
    palette = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
    img = rng.integers(0, ncol, size=(h, w), dtype=np.uint8)
    return img, palette


def test_roundtrip_random():
    rng = np.random.default_rng(11)
    for w, h, ncol in [(1, 1, 2), (13, 7, 8), (40, 25, 5), (64, 64, 200)]:
        img, palette = _rand_case(rng, w, h, ncol)
        got = decode_gif(_make_gif(img, palette))
        assert got.shape == (h, w, 3)
        assert np.array_equal(got, palette[img])


def test_roundtrip_structured_runs():
    """Long runs exercise dictionary growth / width bumps / the KwKwK
    case far more than random pixels."""
    rng = np.random.default_rng(5)
    img = np.repeat(
        rng.integers(0, 4, size=(30, 10), dtype=np.uint8), 9, axis=1
    )
    palette = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    got = decode_gif(_make_gif(img, palette))
    assert np.array_equal(got, palette[img])


def test_dictionary_overflow_reset():
    """> 4096 dictionary entries force an encoder-side clear mid-stream;
    the decoder must resynchronize."""
    rng = np.random.default_rng(17)
    img, palette = _rand_case(rng, 150, 120, 250)
    got = decode_gif(_make_gif(img, palette))
    assert np.array_equal(got, palette[img])


def test_degenerate_clear_separated_stream():
    """A hand-built constant-width stream (CLEAR before every pixel
    code) is valid LZW without any dictionary use — an independent
    path that cannot share a bug with the test encoder."""
    palette = np.array(
        [[10, 20, 30], [40, 50, 60], [70, 80, 90], [1, 2, 3]],
        dtype=np.uint8,
    )
    img = np.array([[0, 1, 2, 3, 2, 1]], dtype=np.uint8)
    clear, end, width = 4, 5, 3
    codes = []
    for px in img.ravel():
        codes += [clear, int(px)]
    codes.append(end)
    acc = acc_bits = 0
    data = bytearray()
    for c in codes:
        acc |= c << acc_bits
        acc_bits += width
        while acc_bits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            acc_bits -= 8
    if acc_bits:
        data.append(acc & 0xFF)
    out = bytearray(b"GIF89a")
    out += (6).to_bytes(2, "little") + (1).to_bytes(2, "little")
    out += bytes([0x81, 0, 0])  # global table, 4 entries (bits-1 = 1)
    out += palette.tobytes()
    out += bytes([0x2C, 0, 0, 0, 0]) + (6).to_bytes(2, "little")
    out += (1).to_bytes(2, "little") + bytes([0, 2])
    out += bytes([len(data)]) + bytes(data) + bytes([0, 0x3B])
    got = decode_gif(bytes(out))
    assert np.array_equal(got, palette[img])


def test_interlace():
    rng = np.random.default_rng(3)
    img, palette = _rand_case(rng, 11, 19, 6)
    got = decode_gif(_make_gif(img, palette, interlace=True))
    assert np.array_equal(got, palette[img])


def test_local_palette_extensions_and_87a():
    rng = np.random.default_rng(9)
    img, palette = _rand_case(rng, 9, 4, 7)
    for kwargs in (
        {"local_palette": True},
        {"extensions": True},
        {"version": b"GIF87a"},
    ):
        got = decode_gif(_make_gif(img, palette, **kwargs))
        assert np.array_equal(got, palette[img]), kwargs


def test_subframe_composites_on_background():
    rng = np.random.default_rng(21)
    img, palette = _rand_case(rng, 5, 3, 4)
    payload = _make_gif(
        img, palette, offset=(2, 1), screen=(10, 6), bg_idx=2
    )
    got = decode_gif(payload)
    assert got.shape == (6, 10, 3)
    assert np.array_equal(got[1:4, 2:7], palette[img])
    assert np.array_equal(got[0, 0], palette[2])  # background fill


def test_animated_first_frame():
    """Two image blocks: the decoder returns the FIRST frame."""
    rng = np.random.default_rng(2)
    img1, palette = _rand_case(rng, 8, 8, 4)
    img2, _ = _rand_case(rng, 8, 8, 4)
    g1 = _make_gif(img1, palette)
    g2 = _make_gif(img2, palette)
    # splice the second image block (starts after header+GCT) before
    # the trailer of the first
    hdr_len = 13 + palette_block_len(palette)
    spliced = g1[:-1] + g2[hdr_len:]
    got = decode_gif(spliced)
    assert np.array_equal(got, palette[img1])


def palette_block_len(palette) -> int:
    bits = max(1, int(np.ceil(np.log2(palette.shape[0]))))
    return 3 * (1 << bits)


def test_guards_and_dispatch():
    from search_engine_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(1)
    img, palette = _rand_case(rng, 4, 4, 4)
    payload = _make_gif(img, palette)
    assert np.array_equal(decode_image(payload), palette[img])
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTGIF" + payload[6:])
    with pytest.raises(ValueError, match="truncated"):
        decode_gif(payload[:20])
    # truncated LZW data inside an intact container
    bad = bytearray(payload)
    # find the image data sub-block and zero its first byte count path:
    # simply cut the payload right after the image descriptor
    idx = bad.index(0x2C)
    with pytest.raises(ValueError):
        decode_gif(bytes(bad[:idx + 11]) + bytes([2, 0x55]))
