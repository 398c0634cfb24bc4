"""Compressed block postings: salted-by-doc-range build (SURVEY.md §4 items 1-2).

Physical redesign of the reference's one-row-per-posting ``index`` table
(model/Index.java:8-28): per (scope, lemma, doc-range shard), sorted
doc_ids are delta+varbyte-compressed into fixed-size blocks with per-block
maxima for block-max WAND (Ding & Suel) — see functions/codec.py.

Skew design: lemma df is Zipfian, so repartitioning by lemma alone puts a
hot term's whole posting list on one task. The salt here is the doc_id
RANGE bucket ``shard = (doc_id - 1) // range_size``: every (lemma, shard)
group holds at most ``range_size`` docs regardless of df, and because
shards are doc_id-range-ALIGNED, the global posting list of a lemma is the
plain concatenation of its shards in shard order — the k-way merge of
classic salted builds degenerates to a no-op (SURVEY.md §4: "align by
salting on doc_id // range_size, making the merge a pure ordered concat").
Query-time benefit: a shard is a self-contained doc partition, so top-k
can run per shard independently and merge k-row results.

Execution shape (scale-critical): ONE shuffle —
``repartition(scope, lemma, shard).sortWithinPartitions(..., doc_id)`` —
then a STREAMING ``mapInPandas`` encoder. A grouped-map
(``applyInPandas``) formulation pays pandas-DataFrame-per-group overhead,
which at Zipfian vocabularies means hundreds of thousands of tiny groups
(measured ~3× the whole build's cost); the streaming encoder instead
varbyte-encodes an entire Arrow batch in one vectorized pass and slices
the buffer per block, carrying partial groups across batch boundaries.

Block self-containment: each block stores (delta+varbyte doc_ids, varbyte
tfs, varbyte doc_lens) — scoring never joins back to docs; each block's
first doc_id is absolute, so blocks decode independently. Block maxima
are (max_tf, min_dl): BM25's term score is increasing in tf and
decreasing in dl, so ``score(max_tf, min_dl)`` is a valid upper bound for
every doc in the block under ANY scope's (idf, avgdl) — the bound stays
safe for scoped queries without storing per-scope numbers.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.functions.codec import varbyte_encode_with_lengths
from search_engine_spark.schemas import POSTINGS, POSTINGS_POS

BLOCK_SIZE = 128
DEFAULT_DOCS_PER_SHARD = 65_536

_KEY = ["scope", "lemma", "shard"]


def shard_spec(max_doc_id: int, docs_per_shard: int = DEFAULT_DOCS_PER_SHARD) -> int:
    """Doc-range width per shard (≥1). doc_id is dense 1-based, so
    ``(doc_id - 1) // range_size`` gives contiguous, aligned shards."""
    return max(1, min(int(docs_per_shard), int(max_doc_id)))


def _encode_frame(pdf: pd.DataFrame, group_starts: np.ndarray) -> pd.DataFrame:
    """Columnar batch encode: rows are key-contiguous and doc_id-sorted
    within each group; ``group_starts`` are the row indices where a new
    (scope, lemma, shard) group begins. One varbyte pass per column for
    the WHOLE frame, then per-block byte slicing."""
    ids = pdf["doc_id"].to_numpy(np.int64)
    tfs = pdf["tf"].to_numpy(np.int64)
    dls = pdf["doc_len"].to_numpy(np.int64)
    n = ids.size
    # in-group row index → block boundaries (every group start is one)
    gflag = np.zeros(n, dtype=np.int64)
    gflag[group_starts] = 1
    gid = np.cumsum(gflag) - 1
    ig = np.arange(n, dtype=np.int64) - group_starts[gid]
    block_starts = np.flatnonzero(ig % BLOCK_SIZE == 0)
    block_ends = np.append(block_starts[1:], n)
    # delta within block; block-leading values stay absolute (negative
    # diffs at group boundaries are overwritten — every group start is a
    # block start)
    gaps = np.empty(n, dtype=np.uint64)
    if n > 1:
        gaps[1:] = (ids[1:] - ids[:-1]).astype(np.uint64)
    gaps[block_starts] = ids[block_starts].astype(np.uint64)
    id_buf, id_len = varbyte_encode_with_lengths(gaps)
    tf_buf, tf_len = varbyte_encode_with_lengths(tfs.astype(np.uint64))
    dl_buf, dl_len = varbyte_encode_with_lengths(dls.astype(np.uint64))

    def offs(lens: np.ndarray) -> np.ndarray:
        o = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=o[1:])
        return o

    io, to, do = offs(id_len), offs(tf_len), offs(dl_len)
    bs, be = block_starts, block_ends
    return pd.DataFrame(
        {
            "scope": pdf["scope"].to_numpy()[bs],
            "lemma": pdf["lemma"].to_numpy()[bs],
            "shard": pdf["shard"].to_numpy(np.int32)[bs],
            "block_id": (ig[bs] // BLOCK_SIZE).astype(np.int32),
            "first_doc_id": ids[bs],
            "last_doc_id": ids[be - 1],
            "count": (be - bs).astype(np.int32),
            "sum_tf": np.add.reduceat(tfs, bs),
            "max_tf": np.maximum.reduceat(tfs, bs).astype(np.int32),
            "min_dl": np.minimum.reduceat(dls, bs).astype(np.int32),
            "doc_ids": [id_buf[io[s]:io[e]] for s, e in zip(bs, be)],
            "tfs": [tf_buf[to[s]:to[e]] for s, e in zip(bs, be)],
            "doc_lens": [dl_buf[do[s]:do[e]] for s, e in zip(bs, be)],
        }
    )


def _encode_frame_pos(pdf: pd.DataFrame, group_starts: np.ndarray) -> pd.DataFrame:
    """Positional variant of ``_encode_frame``: adds per-block position
    buffers — per-posting gap lists (posting-first absolute), one varbyte
    pass over the flattened frame, per-block byte slicing (a posting's
    sublist splits back out via its tf at decode time). Kept as a
    SEPARATE function so the default path's hot code stays untouched."""
    out = _encode_frame(pdf, group_starts)
    tfs = pdf["tf"].to_numpy(np.int64)
    n = tfs.size
    gflag = np.zeros(n, dtype=np.int64)
    gflag[group_starts] = 1
    gid = np.cumsum(gflag) - 1
    ig = np.arange(n, dtype=np.int64) - group_starts[gid]
    bs = np.flatnonzero(ig % BLOCK_SIZE == 0)
    be = np.append(bs[1:], n)
    if n:
        pflat = np.concatenate(
            [np.asarray(p, dtype=np.int64) for p in pdf["positions"]]
        )
    else:
        pflat = np.empty(0, dtype=np.int64)
    pstarts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(tfs, out=pstarts[1:])  # tf == len(positions), pinned
    gaps = np.empty(pflat.size, dtype=np.uint64)
    if pflat.size > 1:
        gaps[1:] = (pflat[1:] - pflat[:-1]).astype(np.uint64)
    row_first = pstarts[:-1][pstarts[:-1] < pflat.size]
    gaps[row_first] = pflat[row_first].astype(np.uint64)
    p_buf, p_len = varbyte_encode_with_lengths(gaps)
    pe = np.zeros(pflat.size + 1, dtype=np.int64)
    np.cumsum(p_len, out=pe[1:])
    row_byte = pe[pstarts]  # byte offset at each posting boundary
    out["positions"] = [p_buf[row_byte[s]:row_byte[e]] for s, e in zip(bs, be)]
    return out


def _group_starts(pdf: pd.DataFrame) -> np.ndarray:
    keys = pdf[_KEY]
    change = (keys != keys.shift()).any(axis=1).to_numpy()
    change[0] = True
    return np.flatnonzero(change)


def _encode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Streaming encoder: groups are contiguous within the partition
    (repartition by key + sortWithinPartitions), but may span Arrow batch
    boundaries — the trailing (possibly incomplete) group carries over."""
    carry: pd.DataFrame | None = None
    for pdf in batches:
        if pdf.empty:
            continue
        if carry is not None:
            pdf = pd.concat([carry, pdf], ignore_index=True)
        starts = _group_starts(pdf)
        if starts.size == 1:
            carry = pdf  # whole batch is one (unfinished) group
            continue
        last = starts[-1]
        carry = pdf.iloc[last:].reset_index(drop=True)
        yield _encode_frame(pdf.iloc[:last], starts[:-1])
    if carry is not None and not carry.empty:
        yield _encode_frame(carry, _group_starts(carry))


def _encode_partition_pos(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Positional streaming encoder (same carry discipline)."""
    carry: pd.DataFrame | None = None
    for pdf in batches:
        if pdf.empty:
            continue
        if carry is not None:
            pdf = pd.concat([carry, pdf], ignore_index=True)
        starts = _group_starts(pdf)
        if starts.size == 1:
            carry = pdf
            continue
        last = starts[-1]
        carry = pdf.iloc[last:].reset_index(drop=True)
        yield _encode_frame_pos(pdf.iloc[:last], starts[:-1])
    if carry is not None and not carry.empty:
        yield _encode_frame_pos(carry, _group_starts(carry))


def build_postings_compressed(
    postings_flat: DataFrame, range_size: int, positional: bool = False
) -> DataFrame:
    """postings_flat (lemma, doc_id, tf, scope, doc_len[, positions]) →
    POSTINGS (or POSTINGS_POS with ``positional=True``, which requires
    the positions column from ``build_postings_flat_positional``) blocks.

    One explicit shuffle (the build's skew-managed one, SURVEY.md §3.2),
    then the streaming columnar encoder. The reference's analog is the
    10k-row batched INSERT (services/BatchIndexWriter.java:29-63); here
    the batch is the block.
    """
    sharded = postings_flat.withColumn(
        "shard", ((F.col("doc_id") - 1) / F.lit(int(range_size))).cast("int")
    )
    part = sharded.repartition(*_KEY).sortWithinPartitions(*_KEY, "doc_id")
    if positional:
        return part.mapInPandas(_encode_partition_pos, schema=POSTINGS_POS)
    return part.mapInPandas(_encode_partition, schema=POSTINGS)


# Design note (measured, 700k turns, local[4]): a "shuffle docs rows
# instead of postings" variant — repartitionByRange(docs, shard) →
# explode+sort within partitions — is 3x SLOWER than the flat-posting
# shuffle above (195s vs 68s): range partitioning adds a sampling pass
# over the child, and exchanging rows that carry array<struct> columns
# costs far more per byte (nested UnsafeArrayData copy) than exchanging
# 40x as many flat narrow rows. Narrow rows through the exchange win.


def decode_positions(buf: bytes, tfs: np.ndarray) -> list[np.ndarray]:
    """One block's ``positions`` buffer → per-posting position arrays
    (gap decode, posting-first absolute; split by tf)."""
    from search_engine_spark.functions.codec import varbyte_decode

    vals = varbyte_decode(buf).astype(np.int64)
    starts = np.zeros(tfs.size + 1, dtype=np.int64)
    np.cumsum(tfs, out=starts[1:])
    cs = np.cumsum(vals)
    # within-posting cumsum: subtract the running total at each posting
    # start, then add back the (absolute) first value
    base = np.repeat(cs[starts[:-1]] - vals[starts[:-1]], tfs)
    pos = cs - base
    return [pos[s:e] for s, e in zip(starts[:-1], starts[1:])]


def decode_blocks(
    doc_ids_bufs: Iterable[bytes],
    tfs_bufs: Iterable[bytes],
    doc_lens_bufs: Iterable[bytes],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Concatenate-decode a list of blocks → (ids, tfs, dls) int64 arrays
    (NOT globally sorted if blocks come from different scope groups)."""
    from search_engine_spark.functions.codec import delta_decode, varbyte_decode

    ids_parts, tf_parts, dl_parts = [], [], []
    for ib, tb, lb in zip(doc_ids_bufs, tfs_bufs, doc_lens_bufs):
        ids_parts.append(delta_decode(varbyte_decode(ib)).astype(np.int64))
        tf_parts.append(varbyte_decode(tb).astype(np.int64))
        dl_parts.append(varbyte_decode(lb).astype(np.int64))
    if not ids_parts:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    return (
        np.concatenate(ids_parts),
        np.concatenate(tf_parts),
        np.concatenate(dl_parts),
    )
