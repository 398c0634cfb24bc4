"""Dependency-free baseline JPEG codec (pure numpy + struct).

Round-4 stretch item (VERDICT #6): makes the most common image format
REAL in ``operators/multimodal.py decode_media`` without PIL/ffmpeg.

Scope — honest and explicit:
- ``decode_jpeg``: baseline sequential DCT (SOF0), 8-bit, 1 or 3
  components, sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0), restart
  intervals, multi-table DQT/DHT segments. Progressive (SOF2),
  arithmetic coding, 12-bit and hierarchical modes raise
  ``NotImplementedError`` by design.
- ``encode_jpeg``: baseline 4:4:4 (and grayscale) with the Annex K
  standard quantization + Huffman tables, IJG quality scaling. Used by
  the tests as the self-verifying fixture source (decode(encode(x))
  must reconstruct x within quantization error) and by re-encode
  pipelines.

Everything follows ITU-T T.81 (public spec); tables are the spec's
Annex K examples. No reference-engine analog exists (the reference
indexes text only) — this belongs to the training-data pipeline suite.
"""

from __future__ import annotations

import struct

import numpy as np

# -- Annex K tables ----------------------------------------------------------

QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# zigzag: index i of the scan order -> (row, col)
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# standard Huffman tables: (BITS list of 16 counts, HUFFVAL symbols)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    u = x.reshape(8, 1)
    d = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
    d[0, :] *= 1.0 / np.sqrt(2.0)
    return d


_D = _dct_matrix()


def _canonical_codes(bits, values):
    """(BITS, HUFFVAL) → {symbol: (code, length)} (T.81 Annex C)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, values):
    """(BITS, HUFFVAL) → {(length, code): symbol}."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, values).items()
    }


def _quality_tables(quality: int):
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    lum = np.clip((QUANT_LUM * scale + 50) // 100, 1, 255)
    chrom = np.clip((QUANT_CHROM * scale + 50) // 100, 1, 255)
    return lum, chrom


# -- encoder -----------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """value → (size category, amplitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_blocks(planes, factors, quants, dc_tabs, ac_tabs) -> bytes:
    """Interleaved MCU loop for arbitrary (h, v) sampling factors;
    each plane is already padded to its own 8·factor multiples."""
    w = _BitWriter()
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    assert factors[0] == (hmax, vmax), "plane 0 must carry max factors"
    mcus_y = planes[0].shape[0] // (8 * vmax)
    mcus_x = planes[0].shape[1] // (8 * hmax)
    pred = [0] * len(planes)
    zz_r, zz_c = _ZZ // 8, _ZZ % 8

    def put_block(ci, blk):
        coef = _D @ (blk.astype(np.float64) - 128.0) @ _D.T
        q = np.floor(coef / quants[ci] + 0.5).astype(np.int64)
        zz = q[zz_r, zz_c]
        dc = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        size, bits = _magnitude(dc)
        code, ln = dc_tabs[ci][size]
        w.put(code, ln)
        if size:
            w.put(bits, size)
        run = 0
        for v in zz[1:]:
            v = int(v)
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_tabs[ci][0xF0]  # ZRL
                w.put(code, ln)
                run -= 16
            size, bits = _magnitude(v)
            code, ln = ac_tabs[ci][(run << 4) | size]
            w.put(code, ln)
            w.put(bits, size)
            run = 0
        if run:
            code, ln = ac_tabs[ci][0x00]  # EOB
            w.put(code, ln)

    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, plane in enumerate(planes):
                fh, fv = factors[ci]
                for by in range(fv):
                    for bx in range(fh):
                        y0 = (my * fv + by) * 8
                        x0 = (mx * fh + bx) * 8
                        put_block(
                            ci, plane[y0:y0 + 8, x0:x0 + 8]
                        )
    return w.flush()


def _pad_mult(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(
        plane, ((0, (-h) % mult), (0, (-w) % mult)), mode="edge"
    )


def encode_jpeg(
    rgb: np.ndarray, quality: int = 85, subsample: str = "444"
) -> bytes:
    """HxWx3 uint8 RGB (or HxW grayscale) → baseline JFIF bytes
    (standard tables, IJG quality scaling). ``subsample``: "444" (no
    chroma subsampling) or "420" (2×2 box-averaged chroma — the common
    camera layout, exercising the decoder's upsampling path)."""
    rgb = np.asarray(rgb)
    gray = rgb.ndim == 2
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    h, w = rgb.shape[:2]
    lum_q, chrom_q = _quality_tables(quality)
    if gray:
        planes = [_pad_mult(rgb.astype(np.float64), 8)]
        quants = [lum_q]
        factors = [(1, 1)]
    else:
        r = rgb[..., 0].astype(np.float64)
        g = rgb[..., 1].astype(np.float64)
        b = rgb[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
        if subsample == "420":
            y = _pad_mult(y, 16)
            # 2×2 box average on the padded plane, then pad to 8s
            cbp = _pad_mult(cb, 2)
            crp = _pad_mult(cr, 2)
            cb = cbp.reshape(
                cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2
            ).mean(axis=(1, 3))
            cr = crp.reshape(
                crp.shape[0] // 2, 2, crp.shape[1] // 2, 2
            ).mean(axis=(1, 3))
            planes = [y, _pad_mult(cb, 8), _pad_mult(cr, 8)]
            factors = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [_pad_mult(p, 8) for p in (y, cb, cr)]
            factors = [(1, 1), (1, 1), (1, 1)]
        quants = [lum_q, chrom_q, chrom_q]

    dc_l = _canonical_codes(*_DC_LUM)
    ac_l = _canonical_codes(*_AC_LUM)
    dc_c = _canonical_codes(*_DC_CHROM)
    ac_c = _canonical_codes(*_AC_CHROM)
    dc_tabs = [dc_l] + [dc_c] * (len(planes) - 1)
    ac_tabs = [ac_l] + [ac_c] * (len(planes) - 1)
    scan = _encode_blocks(planes, factors, quants, dc_tabs, ac_tabs)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, q in ((0, lum_q), (1, chrom_q))[: 1 if gray else 2]:
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(q[_ZZ[i] // 8, _ZZ[i] % 8]) for i in range(64))
    nc = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        fh, fv = factors[ci] if not gray else (1, 1)
        out += bytes([ci + 1, (fh << 4) | fv, 0 if ci == 0 else 1])
    for cls, tid, (bits, vals) in (
        (0, 0, _DC_LUM), (1, 0, _AC_LUM),
        (0, 1, _DC_CHROM), (1, 1, _AC_CHROM),
    )[: 2 if gray else 4]:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- decoder -----------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                return 0  # pad past end (spec: fill bits)
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _huff_decode(reader: _BitReader, table) -> int:
    code, length = 0, 0
    for _ in range(16):
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → HxWx3 uint8 RGB (grayscale replicated)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
    scan_comps = None
    data_start = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", payload[pos:pos + 2])[0]
        seg = payload[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if prec != 0:
                    raise NotImplementedError("16-bit DQT")
                tbl = np.zeros((8, 8), dtype=np.int64)
                for i in range(64):
                    tbl[_ZZ[i] // 8, _ZZ[i] % 8] = seg[p + i]
                quants[tid] = tbl
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                huff[(cls, tid)] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG mode SOF{marker - 0xC0} (progressive/arithmetic/"
                "hierarchical) is out of the baseline decoder's scope"
            )
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = [
                (seg[1 + 2 * i], seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0x0F)
                for i in range(ns)
            ]
            data_start = pos + seglen
            break
        pos += seglen
    if frame is None or scan_comps is None:
        raise ValueError("no baseline frame/scan found")
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # entropy-coded data: unstuff 0xFF00 and split at restart markers
    segments = []
    cur = bytearray()
    p = data_start
    while p < len(payload):
        b = payload[p]
        if b == 0xFF:
            nxt = payload[p + 1] if p + 1 < len(payload) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
            break  # EOI or next marker
        cur.append(b)
        p += 1
    segments.append(bytes(cur))

    planes = {
        cid: np.zeros((mcus_y * 8 * v, mcus_x * 8 * hh), dtype=np.float64)
        for cid, hh, v, _tq in comps
    }
    comp_of = {cid: (hh, v, tq) for cid, hh, v, tq in comps}
    pred = {cid: 0 for cid, *_ in comps}
    seg_i = 0
    reader = _BitReader(segments[0])
    mcu_count = 0
    zz_r, zz_c = _ZZ // 8, _ZZ % 8
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_count and mcu_count % restart == 0:
                seg_i += 1
                reader = _BitReader(segments[seg_i])
                pred = {cid: 0 for cid in pred}
            mcu_count += 1
            for cid, td, ta in scan_comps:
                hh, v, tq = comp_of[cid]
                for by in range(v):
                    for bx in range(hh):
                        sym = _huff_decode(reader, huff[(0, td)])
                        diff = _extend(reader.bits(sym), sym)
                        pred[cid] += diff
                        zz = np.zeros(64, dtype=np.int64)
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, huff[(1, ta)])
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(
                                reader.bits(rs & 0x0F), rs & 0x0F
                            )
                            k += 1
                        blk = np.zeros((8, 8), dtype=np.float64)
                        blk[zz_r, zz_c] = zz
                        blk *= quants[tq]
                        pix = _D.T @ blk @ _D + 128.0
                        y0 = (my * v + by) * 8
                        x0 = (mx * hh + bx) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = pix

    # upsample to full resolution and crop
    full = []
    for cid, hh, v, _tq in comps:
        p_ = planes[cid]
        if hh < hmax:
            p_ = np.repeat(p_, hmax // hh, axis=1)
        if v < vmax:
            p_ = np.repeat(p_, vmax // v, axis=0)
        full.append(p_[:h, :w])
    if len(full) == 1:
        ych = np.clip(np.floor(full[0] + 0.5), 0, 255).astype(np.uint8)
        return np.stack([ych] * 3, axis=2)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
