"""Compressed block postings: salted-by-doc-range build (SURVEY.md §4 item 1-2).

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

Block self-containment: each block stores (delta+varbyte doc_ids, varbyte
tfs, varbyte doc_lens) — scoring never joins back to docs. Block maxima
are (max_tf, min_dl): BM25's term score is increasing in tf and
decreasing in dl, so ``score(max_tf, min_dl)`` is a valid upper bound for
every doc in the block under ANY scope's (idf, avgdl) — the bound stays
safe for scoped queries without storing per-scope numbers.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.functions.codec import varbyte_encode, delta_encode
from search_engine_spark.schemas import POSTINGS

BLOCK_SIZE = 128
DEFAULT_DOCS_PER_SHARD = 65_536


def shard_spec(max_doc_id: int, docs_per_shard: int = DEFAULT_DOCS_PER_SHARD) -> int:
    """Doc-range width per shard (≥1). doc_id is dense 1-based, so
    ``(doc_id - 1) // range_size`` gives contiguous, aligned shards."""
    return max(1, min(int(docs_per_shard), int(max_doc_id)))


def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (scope, lemma, shard) group → block rows (grouped-map pandas)."""
    scope = pdf["scope"].iat[0]
    lemma = pdf["lemma"].iat[0]
    shard = int(pdf["shard"].iat[0])
    order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
    ids = pdf["doc_id"].to_numpy()[order].astype(np.int64)
    tfs = pdf["tf"].to_numpy()[order].astype(np.int64)
    dls = pdf["doc_len"].to_numpy()[order].astype(np.int64)
    rows = []
    for b, lo in enumerate(range(0, ids.size, BLOCK_SIZE)):
        hi = min(lo + BLOCK_SIZE, ids.size)
        bi, bt, bl = ids[lo:hi], tfs[lo:hi], dls[lo:hi]
        rows.append(
            (
                scope, lemma, shard, b,
                int(bi[0]), int(bi[-1]), int(bi.size),
                int(bt.max()), int(bl.min()),
                varbyte_encode(delta_encode(bi.astype(np.uint64))),
                varbyte_encode(bt.astype(np.uint64)),
                varbyte_encode(bl.astype(np.uint64)),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "scope", "lemma", "shard", "block_id",
            "first_doc_id", "last_doc_id", "count",
            "max_tf", "min_dl", "doc_ids", "tfs", "doc_lens",
        ],
    )


def build_postings_compressed(
    postings_flat: DataFrame, range_size: int
) -> DataFrame:
    """postings_flat (lemma, doc_id, tf, scope, doc_len) → POSTINGS blocks.

    One explicit shuffle: ``groupBy(scope, lemma, shard)`` feeds the
    grouped-map encoder (Arrow batches; NumPy inside — no per-row Python).
    The reference's analog is the 10k-row batched INSERT
    (services/BatchIndexWriter.java:29-63); here batching is the block.
    """
    sharded = postings_flat.withColumn(
        "shard", ((F.col("doc_id") - 1) / F.lit(int(range_size))).cast("int")
    )
    return sharded.groupBy("scope", "lemma", "shard").applyInPandas(
        _encode_group, schema=POSTINGS
    )


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
