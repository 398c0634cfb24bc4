"""Compressed block postings + block-max WAND (SURVEY.md §7.2 steps 4-5).

- round-trip: blocks decode back to exactly the flat postings;
- range-aligned salting invariant: per-lemma global order = shard-order
  concat (the "merge is a pure concat" design, SURVEY.md §4 item 1);
- rank-identity: exact-over-blocks == WAND-over-blocks == flat == oracle
  on every FIXTURES.md §3 query class, scores to float64 equality;
- skew: tiny range_size (many shards per lemma) changes nothing.
"""

from __future__ import annotations

import numpy as np
import pytest

from oracle import oracle as orc
from search_engine_spark.operators.compress import (
    BLOCK_SIZE,
    build_postings_compressed,
    decode_blocks,
)
from search_engine_spark.operators.query import bm25_search
from search_engine_spark.operators.wand import bm25_search_blocks
from tests.test_spark_engine import QUERY_CASES, _rows


@pytest.fixture(scope="module")
def blocks(engine_tables):
    # range_size=256 → ~8 shards over ~2.1k docs; hot terms span them all
    return build_postings_compressed(
        engine_tables["postings_flat"], range_size=256
    ).cache()


def test_blocks_round_trip_to_flat(blocks, engine_tables):
    flat = {
        (r["lemma"], r["doc_id"]): (r["tf"], r["doc_len"], r["scope"])
        for r in engine_tables["postings_flat"].collect()
    }
    got = {}
    for r in blocks.collect():
        ids, tfs, dls = decode_blocks([r["doc_ids"]], [r["tfs"]], [r["doc_lens"]])
        assert r["count"] == ids.size <= BLOCK_SIZE
        assert r["first_doc_id"] == ids[0] and r["last_doc_id"] == ids[-1]
        assert r["max_tf"] == tfs.max() and r["min_dl"] == dls.min()
        assert np.all(np.diff(ids) > 0)  # strictly increasing within block
        for i, t, d in zip(ids.tolist(), tfs.tolist(), dls.tolist()):
            got[(r["lemma"], i)] = (t, d, r["scope"])
    assert got == flat


def test_shard_alignment_is_concat_order(blocks):
    """Within (scope, lemma): ordering by (shard, block_id) must yield a
    globally strictly-increasing doc_id sequence — no k-way merge needed."""
    rows = blocks.collect()
    per_key: dict = {}
    for r in rows:
        per_key.setdefault((r["scope"], r["lemma"]), []).append(r)
    checked = 0
    for key, rs in per_key.items():
        if len(rs) < 2:
            continue
        rs.sort(key=lambda r: (r["shard"], r["block_id"]))
        lasts = [r["last_doc_id"] for r in rs]
        firsts = [r["first_doc_id"] for r in rs]
        assert all(lasts[i] < firsts[i + 1] for i in range(len(rs) - 1)), key
        checked += 1
    assert checked > 0  # fixture really produced multi-block lemmas


@pytest.mark.parametrize("mode", ["exact", "wand"])
@pytest.mark.parametrize("qid,query,scope,k,offset", QUERY_CASES)
def test_blocks_rank_identical(
    blocks, engine_tables, oracle_idx, mode, qid, query, scope, k, offset
):
    exp = orc.search(oracle_idx, query, scope=scope, k=k, offset=offset)
    got = _rows(
        bm25_search_blocks(
            blocks,
            engine_tables["lemma_stats"],
            engine_tables["doc_stats"],
            query, scope=scope, k=k, offset=offset, mode=mode,
        )
    )
    assert [d for d, _ in got] == [d for d, _ in exp], (qid, mode)
    for (gd, gs), (ed, es) in zip(got, exp):
        assert gs == es, (qid, mode, gd)  # bit-identical float64


def test_lemma_stats_from_blocks_match(blocks, engine_tables):
    """Dictionary stats derived from block metadata == stats from flat
    postings (the no-corpus-rescan path)."""
    from search_engine_spark.operators.build import (
        build_lemma_stats,
        lemma_stats_from_blocks,
    )

    exp = {
        (r["scope"], r["lemma"]): (r["df"], r["cf"])
        for r in build_lemma_stats(engine_tables["postings_flat"]).collect()
    }
    got = {
        (r["scope"], r["lemma"]): (r["df"], r["cf"])
        for r in lemma_stats_from_blocks(blocks).collect()
    }
    assert got == exp


def test_skew_range_size_invariance(engine_tables, oracle_idx):
    """Same ranking with pathological shard width (range_size=64 → every
    hot lemma split across ~33 shards)."""
    tiny = build_postings_compressed(engine_tables["postings_flat"], range_size=64)
    from tests.test_spark_engine import HOT_TERM, RARE

    q = f"{HOT_TERM} {RARE}"
    exp = orc.search(oracle_idx, q, k=20)
    got = _rows(
        bm25_search_blocks(
            tiny, engine_tables["lemma_stats"], engine_tables["doc_stats"],
            q, k=20, mode="wand",
        )
    )
    assert [(d, s) for d, s in got] == [(d, s) for d, s in exp]


def test_wand_equals_exact_property(blocks, engine_tables):
    """WAND safe-up-to-k: identical (ids, scores) to exhaustive scoring for
    a spread of k values on a multi-term query with real pruning pressure."""
    from tests.test_spark_engine import HOT_TERM, MID

    q = f"{HOT_TERM} {MID}"
    for k in (1, 3, 10, 50):
        e = _rows(
            bm25_search_blocks(
                blocks, engine_tables["lemma_stats"], engine_tables["doc_stats"],
                q, k=k, mode="exact",
            )
        )
        w = _rows(
            bm25_search_blocks(
                blocks, engine_tables["lemma_stats"], engine_tables["doc_stats"],
                q, k=k, mode="wand",
            )
        )
        assert e == w, k
