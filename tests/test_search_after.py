"""Cursor (search_after) pagination: the k rows strictly AFTER an
``after=(score, doc_id)`` cursor in the pinned (score desc, doc_id asc)
order. The order is total, so chaining each page's last row as the next
cursor must walk the FULL ranking with no skipped or repeated rows —
and must stay rank-identical across oracle / blocks{exact,wand} ×
{and,or} / phrase / SearchEngine. Unlike offset paging (O(offset+k)
heap per shard), a cursor page is O(k) at any depth — the kernels drop
pre-cursor docs at admission (operators/wand.py ``_after_cut``).
"""

from __future__ import annotations

import pytest

from oracle import oracle as orc
from search_engine_spark.operators.compress import build_postings_compressed
from search_engine_spark.operators.wand import bm25_search_blocks
from tests.test_spark_engine import HOT_TERM, RARE, VOCAB


@pytest.fixture(scope="module")
def blocks(engine_tables):
    return build_postings_compressed(
        engine_tables["postings_flat"], range_size=256
    ).cache()


def _collect(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_oracle_cursor_paging_walks_full_ranking(oracle_idx):
    for combine, q in (("and", RARE), ("or", f"{RARE} {VOCAB[310]}")):
        full = orc.search(oracle_idx, q, k=10_000, combine=combine)
        assert len(full) > 5
        pages, cur = [], None
        while True:
            pg = orc.search(oracle_idx, q, k=3, combine=combine, after=cur)
            if not pg:
                break
            pages += pg
            cur = (pg[-1][1], pg[-1][0])
        assert pages == full, combine
    with pytest.raises(ValueError, match="offset"):
        orc.search(oracle_idx, RARE, k=3, offset=2, after=(1.0, 1))


@pytest.mark.parametrize("mode", ["exact", "wand"])
@pytest.mark.parametrize("combine", ["and", "or"])
def test_blocks_cursor_rank_identity(blocks, engine_tables, oracle_idx,
                                     mode, combine):
    """Every kernel pages identically to the oracle, from any cursor —
    including cursors at score TIES (the doc_id tiebreak arm) and a
    cursor past the end (empty page)."""
    t = engine_tables
    q = RARE if combine == "and" else f"{RARE} {VOCAB[310]}"
    full = orc.search(oracle_idx, q, k=10_000, combine=combine)
    assert len(full) > 5
    # cursors at every position of the first 6 rows + the very last row
    for i in list(range(6)) + [len(full) - 1]:
        cur = (full[i][1], full[i][0])
        exp = orc.search(oracle_idx, q, k=4, combine=combine, after=cur)
        got = _collect(
            bm25_search_blocks(
                blocks, t["lemma_stats"], t["doc_stats"], q,
                k=4, mode=mode, combine=combine, after=cur,
            )
        )
        assert got == exp == full[i + 1:i + 5], (mode, combine, i)
    # chaining from the top reconstructs the full ranking
    pages, cur = [], None
    while True:
        pg = _collect(
            bm25_search_blocks(
                blocks, t["lemma_stats"], t["doc_stats"], q,
                k=5, mode=mode, combine=combine, after=cur,
            )
        )
        if not pg:
            break
        pages += pg
        cur = (pg[-1][1], pg[-1][0])
    assert pages == full


def test_blocks_cursor_composes_with_filters_and_not(
    blocks, engine_tables, oracle_idx
):
    from search_engine_spark.operators.filters import build_filter_blocks
    from search_engine_spark.functions.analyze import query_lemmas

    t = engine_tables
    flt = build_filter_blocks(t["docs"], range_size=256)
    filters = {"role": "user"}
    full = orc.search(oracle_idx, RARE, k=10_000, filters=filters)
    assert 2 < len(full) < len(orc.search(oracle_idx, RARE, k=10_000))
    cur = (full[1][1], full[1][0])
    for mode in ("exact", "wand"):
        got = _collect(
            bm25_search_blocks(
                blocks, t["lemma_stats"], t["doc_stats"], RARE, k=3,
                mode=mode, filters=filters, filter_postings=flt, after=cur,
            )
        )
        assert got == full[2:5], mode
    # -term exclusion composes too
    excl = query_lemmas(HOT_TERM)
    fullx = orc.search(oracle_idx, RARE, k=10_000, exclude=excl)
    if len(fullx) > 2:
        cur = (fullx[0][1], fullx[0][0])
        from search_engine_spark.operators.wand import bm25_blocks_from_terms

        got = _collect(
            bm25_blocks_from_terms(
                blocks, t["lemma_stats"], t["doc_stats"],
                query_lemmas(RARE), k=3, exclude_terms=excl, after=cur,
            )
        )
        assert got == orc.search(oracle_idx, RARE, k=3, exclude=excl,
                                 after=cur)
    with pytest.raises(ValueError, match="offset"):
        bm25_search_blocks(
            blocks, t["lemma_stats"], t["doc_stats"], RARE,
            k=3, offset=2, after=cur,
        )


def test_api_search_after_pages(spark, base_index_dir, oracle_idx):
    from search_engine_spark.api import SearchEngine

    eng = SearchEngine(spark, base_index_dir["index"])
    full = orc.search(oracle_idx, RARE, k=10_000)
    assert len(full) > 6
    got, cur = [], None
    while True:
        res = eng.search(RARE, limit=3, after=cur)
        if not res["data"]:
            assert res["next_after"] is None
            break
        got += [d["relevance"] for d in res["data"]]
        cur = res["next_after"]
        assert cur == [res["data"][-1]["relevance"], cur[1]]
    assert got == [s for _, s in full]
    # the cursor is part of the result-cache key: a repeat of the SAME
    # page hits the cache, a different cursor must not serve stale rows
    res1 = eng.search(RARE, limit=3)
    res2 = eng.search(RARE, limit=3, after=res1["next_after"])
    assert res1["data"] != res2["data"]
    with pytest.raises(ValueError, match="offset"):
        eng.search(RARE, limit=3, offset=3, after=(1.0, 1))
    with pytest.raises(ValueError, match="bm25"):
        eng.search(RARE, scorer="reftf", after=(1.0, 1))
    with pytest.raises(ValueError, match="collapse"):
        eng.search(RARE, collapse="conv_id", after=(1.0, 1))
