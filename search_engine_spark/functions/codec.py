"""Posting-list physical format: delta + varbyte compression (pure NumPy).

The reference stores one MySQL row per posting (model/Index.java:8-28).
This engine redesigns the physical layout for columnar scale-out: per
lemma, sorted doc_ids are gap-encoded then varbyte-compressed into
fixed-size blocks (BLOCK_SIZE ids) with per-block maxima for block-max
WAND (public technique: Williams & Zobel varbyte; Ding & Suel block-max;
Broder et al. WAND).

Wire format (little-endian 7-bit groups): each uint64 is emitted as 1-10
bytes, low 7 bits first; the high bit of every byte EXCEPT the last of a
value is set (continuation). Encode/decode are fully vectorized — no
per-value Python loops (loop is over byte-position, max 10 iterations).
"""

from __future__ import annotations

import numpy as np

_U7 = np.uint64(7)
_MASK = np.uint64(0x7F)


def varbyte_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Vectorized varbyte encode of a uint64 array → (buffer, per-value
    byte lengths). The lengths let a caller slice the buffer into
    arbitrary sub-ranges (blocks) without re-encoding — the columnar
    batch-encode path in operators/compress.py depends on this."""
    values = np.ascontiguousarray(values, dtype=np.uint64)
    n = values.size
    if n == 0:
        return b"", np.empty(0, dtype=np.int64)
    nbytes = np.ones(n, dtype=np.int64)
    v = values >> _U7
    while v.any():
        nbytes += v > 0
        v >>= _U7
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    vals = values.copy()
    for j in range(int(nbytes.max())):
        mask = nbytes > j
        idx = starts[mask] + j
        byte = (vals[mask] & _MASK).astype(np.uint8)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
        out[idx] = byte | cont
        vals[mask] >>= _U7
    return out.tobytes(), nbytes


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized varbyte encode of a uint64 array."""
    return varbyte_encode_with_lengths(values)[0]


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Vectorized varbyte decode → uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    group = np.zeros(b.size, dtype=np.int64)
    group[1:] = np.cumsum(is_last)[:-1]
    starts = np.flatnonzero(
        np.concatenate(([True], is_last[:-1].astype(bool)))
    )
    pos = np.arange(b.size, dtype=np.int64) - starts[group]
    contrib = (b & 0x7F).astype(np.uint64) << (pos.astype(np.uint64) * _U7)
    n_groups = int(is_last.sum())
    out = np.zeros(n_groups, dtype=np.uint64)
    np.add.at(out, group, contrib)
    return out


def delta_decode_segmented(gaps: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Per-segment delta decode of a CONCATENATED gap stream in one
    vectorized pass: segment ``i`` holds ``counts[i]`` gaps whose first
    entry is absolute (the per-block-absolute block layout —
    operators/compress.py). Equivalent to
    ``np.concatenate([delta_decode(g) for g in segments])`` but without
    the per-block Python loop: one global cumsum, then subtract each
    segment's carried-in prefix. A varbyte value never spans a buffer
    boundary, so callers can fuse N block buffers with one ``b"".join``
    + ``varbyte_decode`` and hand the counts here — this is what makes
    decoding thousands of small blocks O(total postings) instead of
    O(blocks) numpy-call overhead (measured ~6x on a 5k-block term)."""
    gaps = np.ascontiguousarray(gaps, dtype=np.uint64)
    if gaps.size == 0:
        return gaps
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    cs = np.cumsum(gaps, dtype=np.uint64)
    ends = np.cumsum(counts)
    prev = np.concatenate(
        (np.zeros(1, dtype=np.uint64), cs[ends[:-1] - 1])
    )
    return cs - np.repeat(prev, counts)


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing int64 ids → gaps (first id kept absolute)."""
    a = np.ascontiguousarray(sorted_ids, dtype=np.uint64)
    if a.size == 0:
        return a
    gaps = np.empty_like(a)
    gaps[0] = a[0]
    np.subtract(a[1:], a[:-1], out=gaps[1:])
    return gaps


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.ascontiguousarray(gaps, dtype=np.uint64), dtype=np.uint64)


def encode_posting_block(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """One block: (delta+varbyte doc_ids, varbyte tfs)."""
    return varbyte_encode(delta_encode(doc_ids)), varbyte_encode(tfs)


def decode_posting_block(doc_ids_buf: bytes, tfs_buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of encode_posting_block → (int64 doc_ids, int64 tfs)."""
    ids = delta_decode(varbyte_decode(doc_ids_buf)).astype(np.int64)
    tfs = varbyte_decode(tfs_buf).astype(np.int64)
    return ids, tfs
