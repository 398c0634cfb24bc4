"""Varbyte / delta codec round-trip tests (SURVEY.md §5 items 1, 5)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.functions.codec import (
    decode_posting_block,
    delta_decode,
    delta_encode,
    encode_posting_block,
    varbyte_decode,
    varbyte_encode,
)


def test_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


def test_known_values():
    # 0 → single byte 0x00; 127 → 0x7F; 128 → 0x80 0x01 (little-endian 7-bit)
    assert varbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varbyte_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varbyte_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500)
)
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = varbyte_decode(varbyte_encode(arr))
    assert np.array_equal(out, arr)


@given(
    st.sets(st.integers(min_value=1, max_value=2**40), min_size=1, max_size=400)
)
@settings(max_examples=200, deadline=None)
def test_posting_block_roundtrip(ids):
    doc_ids = np.array(sorted(ids), dtype=np.int64)
    rng = np.random.default_rng(0)
    tfs = rng.integers(1, 1000, size=doc_ids.size).astype(np.int64)
    ids_buf, tfs_buf = encode_posting_block(doc_ids, tfs)
    ids2, tfs2 = decode_posting_block(ids_buf, tfs_buf)
    assert np.array_equal(ids2, doc_ids)
    assert np.array_equal(tfs2, tfs)


def test_delta_roundtrip():
    ids = np.array([1, 2, 10, 11, 1000, 10**12], dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(ids)), ids)


def test_compression_wins_on_dense_ids():
    ids = np.arange(1, 100_001, dtype=np.int64)
    tfs = np.ones(ids.size, dtype=np.int64)
    ids_buf, _ = encode_posting_block(ids, tfs)
    # gaps of 1 → ~1 byte/id vs 8 raw
    assert len(ids_buf) < ids.size * 2


def test_delta_decode_segmented_matches_per_block():
    from search_engine_spark.functions.codec import (
        delta_decode_segmented,
        varbyte_encode,
    )

    rng = np.random.default_rng(7)
    # random per-block-absolute blocks of uneven sizes, interleaving ranges
    blocks = []
    for _ in range(37):
        n = int(rng.integers(1, 50))
        ids = np.sort(
            rng.choice(np.arange(1, 10_000, dtype=np.int64), n, replace=False)
        )
        blocks.append(ids)
    bufs = [varbyte_encode(delta_encode(b.astype(np.uint64))) for b in blocks]
    counts = np.array([b.size for b in blocks], dtype=np.int64)
    fused = delta_decode_segmented(
        varbyte_decode(b"".join(bufs)), counts
    ).astype(np.int64)
    per_block = np.concatenate(
        [delta_decode(varbyte_decode(bf)).astype(np.int64) for bf in bufs]
    )
    assert np.array_equal(fused, per_block)
    # empty stream
    assert delta_decode_segmented(
        np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    ).size == 0
