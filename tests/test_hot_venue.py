"""HOT serving venue (the both-hot conjunction answer): queries whose
lemma df-sum exceeds the local budget but fits ``hot_df_budget`` serve
driver-side from the bytes-capped block cache, with decoded postings
memoized across queries in the FUSE MEMO. Pins: rank/score identity vs
the oracle across modes/combines/scopes, identity again on the
memo-warm repeat, per-scope memo isolation, the bytes cap, and the
local_df_budget=0 master off-switch (bench's forced-distributed warm
relies on it)."""

from __future__ import annotations

import pytest

from oracle import oracle as orc
from search_engine_spark.operators.serve import QueryServer
from tests.test_spark_engine import HOT2, HOT_TERM, MID, RARE, QUERY_CASES


@pytest.fixture()
def srv(spark, base_index_dir):
    s = QueryServer(spark, base_index_dir["index"], cache_blocks=False)
    s.local_df_budget = 1       # below any real query -> local venue off
    s.hot_df_budget = 10 ** 9   # everything fits the hot venue
    s.result_cache_size = 0     # repeats must exercise the KERNEL path
    return s


def test_hot_venue_rank_identity_and_memo_reuse(srv, oracle_idx):
    for round_ in (1, 2):  # round 2 serves from the warmed fuse memo
        for qid, query, scope, k, offset in QUERY_CASES:
            for combine in ("and", "or"):
                exp = orc.search(
                    oracle_idx, query, scope=scope, k=k, offset=offset,
                    combine=combine,
                )
                for mode in ("wand", "exact"):
                    got = srv.search(
                        query, scope=scope, k=k, offset=offset,
                        mode=mode, combine=combine,
                    )
                    assert got == exp, (round_, qid, combine, mode)
        assert any(srv._fuse_memos.values())  # the memo actually engaged


def test_hot_venue_scope_isolation(srv, oracle_idx):
    """Scoped and unscoped runs interleave without sharing fused
    arrays (the memo is keyed per scope — frames are scope-filtered).
    OR + exact fuses every present term even where a scope's cutoff
    drops a partner, so each scope populates its own memo."""
    q = f"{RARE} {MID}"
    for scope in ("scope-1", None, "scope-2", None, "scope-1"):
        exp = orc.search(oracle_idx, q, scope=scope, k=10, combine="or")
        got = srv.search(q, scope=scope, k=10, mode="exact", combine="or")
        assert got == exp, scope
    assert len([s for s in srv._fuse_memos if s is not None]) >= 2
    # keys never collide across scopes: same (shard, lemma) may appear
    # in several memos, each with its own scope-filtered arrays
    sizes = {
        s: {k2: v[0].size for k2, v in m.items()}
        for s, m in srv._fuse_memos.items()
    }
    assert sizes.get(None) != sizes.get("scope-1")


def test_hot_venue_bool(srv, oracle_idx):
    q = f"{RARE} ({HOT_TERM} | {MID})"
    exp = orc.bool_search(oracle_idx, q, k=10)
    assert srv.bool_search(q, k=10) == exp
    assert srv.bool_search(q, k=10) == exp  # memo-warm repeat
    assert exp  # the case actually matches something


def test_hot_venue_exclusion_and_cursor(srv, oracle_idx):
    q = f"{MID} -{HOT2}"
    exp = orc.search(oracle_idx, MID, exclude=[HOT2], k=10)
    assert srv.search(q, k=10) == exp
    full = orc.search(oracle_idx, MID, k=20)
    if len(full) > 1:
        after = (full[0][1], full[0][0])
        assert srv.search(MID, k=5, after=after) == full[1:6]


def test_fuse_memo_bytes_cap(srv, oracle_idx):
    srv._fuse_cache_cap = 1  # pathological: evict after every query
    for qid, query, scope, k, offset in QUERY_CASES[:4]:
        exp = orc.search(oracle_idx, query, scope=scope, k=k, offset=offset)
        assert srv.search(query, scope=scope, k=k, offset=offset) == exp
    total = sum(
        sum(a.nbytes for a in v)
        for m in srv._fuse_memos.values() for v in m.values()
    )
    assert total == 0  # every entry evicted, results still exact


def test_local_budget_zero_disables_all_driver_venues(
    spark, base_index_dir, oracle_idx
):
    s = QueryServer(spark, base_index_dir["index"], cache_blocks=False)
    s.local_df_budget = 0
    q = f"{HOT_TERM} {HOT2}"
    exp = orc.search(oracle_idx, q, k=10)
    assert s.search(q, k=10) == exp
    assert not s._fuse_memos  # distributed path: memo untouched


def test_result_cache_repeats_and_isolation(spark, base_index_dir, oracle_idx):
    """Repeated-query result cache (the reference's last-result cache,
    SearchServiceImpl.java:45-51, as an LRU over the full signature):
    identical repeats return the same rows without re-running kernels;
    different params never collide; the returned list is a COPY (caller
    mutation can't poison the cache); =0 disables."""
    from search_engine_spark.operators.serve import QueryServer

    srv = QueryServer(spark, base_index_dir["index"], cache_blocks=False)
    assert srv.result_cache_size > 0
    a = srv.search(MID, k=10)
    assert ("search", MID, None, 10, 0, "wand", "and", False, 1, None,
            None, 0, None, 1) in srv._result_cache
    calls = {"n": 0}
    orig = srv._search_impl

    def spy(*args, **kw):
        calls["n"] += 1
        return orig(*args, **kw)

    srv._search_impl = spy
    b = srv.search(MID, k=10)
    assert b == a and calls["n"] == 0  # served from the cache
    b.append((0, 0.0))
    assert srv.search(MID, k=10) == a  # cached copy unharmed
    c = srv.search(MID, k=5)
    assert calls["n"] == 1 and c == a[:5]  # different params = new entry
    exp = orc.search(oracle_idx, MID, k=10)
    assert a == exp
    # bool/phrase key namespaces never collide with term search
    srv.bool_search(MID, k=10)
    kinds = {k2[0] for k2 in srv._result_cache}
    assert kinds == {"search", "bool"}
