"""Pseudo-relevance-feedback expansion: QueryServer.search_prf is
rank/score-identical to oracle.prf_search (both venues), the expansion
stage actually fires, and the pinned choices (base weight 1.0, beta on
expansions, cutoff ignoring weights) hold."""

from __future__ import annotations

import pytest

from oracle import oracle as orc
from search_engine_spark.operators.serve import QueryServer
from tests.test_spark_engine import QUERY_CASES


@pytest.fixture(scope="module")
def srv(spark, base_index_dir):
    return QueryServer(spark, base_index_dir["index"], cache_blocks=False)


def test_prf_rank_identity_both_venues(spark, base_index_dir, srv, oracle_idx):
    srv_dist = QueryServer(
        spark, base_index_dir["index"], cache_blocks=False, local_df_budget=0
    )
    checked = 0
    for qid, query, scope, k, offset in QUERY_CASES[:10]:
        exp = [
            (d, s)
            for d, s in orc.prf_search(
                oracle_idx, query, scope=scope, k=k, offset=offset
            )
        ]
        got_l = srv.search_prf(query, scope=scope, k=k, offset=offset)
        got_d = srv_dist.search_prf(query, scope=scope, k=k, offset=offset)
        assert got_l == exp and got_d == exp, qid
        checked += 1
    assert checked


def test_prf_expansion_changes_ranking(srv, oracle_idx):
    """For at least one fixture query the expanded ranking differs from
    the plain OR ranking — the feedback stage is doing real work."""
    differed = False
    for qid, query, scope, k, offset in QUERY_CASES[:10]:
        plain = orc.search(
            oracle_idx, query, scope=scope, k=k, offset=offset, combine="or"
        )
        prf = orc.prf_search(oracle_idx, query, scope=scope, k=k, offset=offset)
        if prf and [d for d, _ in plain] != [d for d, _ in prf]:
            differed = True
            got = srv.search_prf(query, scope=scope, k=k, offset=offset)
            assert got == [(d, s) for d, s in prf], qid
            break
    assert differed, "no fixture query produced a differing expansion"


def test_prf_beta_zero_keeps_base_scores_for_base_only_docs(srv, oracle_idx):
    """beta=0: expansion terms contribute nothing — every returned doc
    score equals its plain weighted-OR-over-base score (ranking may
    still reorder only via zero-contribution ties, which the pinned
    tiebreak resolves identically)."""
    for qid, query, scope, k, offset in QUERY_CASES[:6]:
        exp = orc.prf_search(
            oracle_idx, query, scope=scope, k=k, offset=offset, beta=0.0
        )
        got = srv.search_prf(
            query, scope=scope, k=k, offset=offset, beta=0.0
        )
        assert got == [(d, s) for d, s in exp], qid
        plain = dict(
            orc.search(
                oracle_idx, query, scope=scope, k=max(50, k), combine="or"
            )
        )
        for d, s in got:
            if d in plain:
                assert s == plain[d], (qid, d)
