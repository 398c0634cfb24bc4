"""QueryServer (long-lived serving session): rank-identity with the
oracle in both dictionary modes (full preload / memoized per-query
lookup), AND + OR."""

from __future__ import annotations

from oracle import oracle as orc
from search_engine_spark.operators.serve import QueryServer
from tests.test_spark_engine import QUERY_CASES


def _check(srv, oracle_idx):
    for i in (0, 2, 7, 8, 11):
        qid, query, scope, k, offset = QUERY_CASES[i]
        exp = orc.search(oracle_idx, query, scope=scope, k=k, offset=offset)
        got = srv.search(query, scope=scope, k=k, offset=offset)
        assert got == [(d, s) for d, s in exp], qid
    # disjunctive mode over golden OR queries
    import json
    import os

    gpath = os.path.join(os.path.dirname(__file__), "fixtures", "queries.jsonl")
    with open(gpath) as f:
        ors = [
            g for line in f if line.strip()
            and (g := json.loads(line)).get("combine") == "or"
        ]
    assert ors
    for g in ors:
        exp = [(e["doc_id"], e["score"]) for e in g["expected"]]
        got = srv.search(
            g["query"], scope=g["scope"], k=g["k"], offset=g["offset"],
            combine="or",
        )
        assert got == exp, g["qid"]


def test_server_preloaded_dictionary(spark, base_index_dir, oracle_idx):
    srv = QueryServer(spark, base_index_dir["index"], cache_blocks=False)
    assert srv._all_loaded
    _check(srv, oracle_idx)


def test_server_memoized_dictionary(spark, base_index_dir, oracle_idx):
    """Dictionary too large to preload → per-query pushed-filter lookups,
    memoized; results identical."""
    srv = QueryServer(
        spark, base_index_dir["index"], cache_blocks=False,
        preload_dict_max_rows=0,
    )
    assert not srv._all_loaded
    _check(srv, oracle_idx)
    assert srv._known_terms  # memo actually populated


def test_server_filters_and_cursor(spark, base_index_dir, oracle_idx):
    """The serving session supports attribute filters (lazily loaded
    filter-postings table) and search_after cursors — rank-identical to
    oracle.search(filters=..., after=...)."""
    import pytest

    from tests.test_spark_engine import RARE

    srv = QueryServer(spark, base_index_dir["index"], cache_blocks=False)
    assert srv._filter_blocks is None  # lazy until a filtered query
    filters = {"role": "user"}
    exp = orc.search(oracle_idx, RARE, k=10, filters=filters)
    assert exp and exp != orc.search(oracle_idx, RARE, k=10)
    assert srv.search(RARE, k=10, filters=filters) == exp
    assert srv._filter_blocks is not None

    # cursor paging from the 2nd row, composed with the filter
    full = orc.search(oracle_idx, RARE, k=10_000, filters=filters)
    cur = (full[1][1], full[1][0])
    got = srv.search(RARE, k=4, filters=filters, after=cur)
    assert got == full[2:6]
    # plain cursor (no filter) too
    full_nf = orc.search(oracle_idx, RARE, k=10_000)
    cur = (full_nf[0][1], full_nf[0][0])
    assert srv.search(RARE, k=4, after=cur) == full_nf[1:5]
    with pytest.raises(ValueError, match="offset"):
        srv.search(RARE, k=4, offset=2, after=cur)


def test_server_rescore_matches_oracle(spark, base_index_dir, oracle_idx):
    """search(rescore_window=N) from the serving session — rank-identical
    to oracle.rescore_search in both combine modes, plus the cursor
    guard."""
    import pytest

    from tests.test_spark_engine import RARE, VOCAB

    srv = QueryServer(spark, base_index_dir["index"], cache_blocks=False)
    q = f"{RARE} {VOCAB[310]}"
    for combine in ("and", "or"):
        want = orc.rescore_search(
            oracle_idx, q, k=10, window=50, combine=combine
        )
        got = srv.search(q, k=10, combine=combine, rescore_window=50)
        assert [(d, round(s, 9)) for d, s in got] == [
            (d, round(s, 9)) for d, s in want
        ], combine
        assert want
    # offset paging slices the rescored order
    deep = orc.rescore_search(oracle_idx, q, k=9, window=50)
    got = srv.search(q, k=3, offset=6, rescore_window=50)
    assert [(d, round(s, 9)) for d, s in got] == [
        (d, round(s, 9)) for d, s in deep[6:9]
    ]
    with pytest.raises(ValueError, match="rescore"):
        srv.search(q, k=3, rescore_window=50, after=(1.0, 1))


def test_server_explain_parity(spark, base_index_dir, oracle_idx):
    """QueryServer.explain equals SearchEngine.explain field-for-field
    (both delegate to the shared explain_breakdown), and its total is
    bit-identical to the served search scores."""
    from search_engine_spark.api import SearchEngine

    from tests.test_spark_engine import HOT_TERM, RARE, VOCAB

    srv = QueryServer(spark, base_index_dir["index"], cache_blocks=False)
    eng = SearchEngine(spark, base_index_dir["index"])
    q = f"{RARE} {VOCAB[310]}"
    hits = orc.search(oracle_idx, q, k=5)
    assert hits
    for combine in ("and", "or"):
        for doc_id, score in hits:
            got = srv.explain(q, doc_id, combine=combine)
            assert got == eng.explain(q, doc_id, combine=combine)
            if combine == "and":
                assert got["score"] == score  # bit-identical float64
    # gate reporting survives the cached-stats path
    ex = srv.explain(HOT_TERM, hits[0][0], combine="and")
    assert ex["killed_by_cutoff"] is True and ex["matches"] is False
    import pytest

    with pytest.raises(ValueError, match="unknown doc_id"):
        srv.explain(q, 10_000_000)


def test_server_collapse_and_facets_parity(spark, base_index_dir, oracle_idx):
    """Field collapsing and the facet panel from the serving session —
    collapse is rank-identical to the oracle composition at the pinned
    deep-page depth; facets equal the SearchEngine panel."""
    from search_engine_spark.api import SearchEngine

    from tests.test_spark_engine import HOT_TERM, RARE

    srv = QueryServer(spark, base_index_dir["index"], cache_blocks=False)
    eng = SearchEngine(spark, base_index_dir["index"])
    q = f"{HOT_TERM} {RARE}"
    conv = dict(
        zip(oracle_idx.docs["doc_id"], oracle_idx.docs["conv_id"])
    )
    full = orc.search(oracle_idx, q, k=100)  # the 10*(0+10) deep page
    exp = orc.collapse_ranked(full, lambda d: conv[d], 1)[:10]
    assert exp and len(exp) < len(full)
    assert srv.search(q, k=10, collapse="conv_id") == exp
    # offset slices the collapsed order
    assert srv.search(q, k=3, offset=2, collapse="conv_id") == exp[2:5]

    want = eng.facets(RARE, facet_cols=("role",))["facets"]
    got = srv.facets(RARE, facet_cols=("role",))
    assert want and got == want


def test_server_more_like_this_parity(spark, base_index_dir, oracle_idx):
    """Server-side related-document search — rank-identical to
    oracle.more_like_this (rarest-terms OR query, source excluded via
    the k+1 fetch)."""
    from tests.test_spark_engine import RARE

    srv = QueryServer(spark, base_index_dir["index"], cache_blocks=False)
    hits = orc.search(oracle_idx, RARE, k=3)
    assert hits
    any_results = False
    for doc_id, _ in hits:
        want = orc.more_like_this(oracle_idx, doc_id, k=10)
        got = srv.more_like_this(doc_id, k=10)
        assert got == want, doc_id
        assert all(d != doc_id for d, _ in got)
        any_results = any_results or bool(got)
    assert any_results
    assert srv.more_like_this(10_000_000) == []


def test_server_significant_terms_parity(spark, base_index_dir):
    """QueryServer.significant_terms equals the SearchEngine panel (both
    delegate to significant_for_ids over the same top-depth sample)."""
    from search_engine_spark.api import SearchEngine

    from tests.test_spark_engine import RARE

    srv = QueryServer(spark, base_index_dir["index"], cache_blocks=False)
    eng = SearchEngine(spark, base_index_dir["index"])
    want = eng.significant_terms(RARE, k=8, depth=50)["terms"]
    got = srv.significant_terms(RARE, k=8, depth=50)
    assert want and got == want
    assert srv.significant_terms("zzzznotaword", k=8) == []


def test_server_local_fast_path_rank_identity(spark, base_index_dir, oracle_idx):
    """Small posting sets execute DRIVER-LOCAL (wand.blocks_core_local —
    same kernel closures, zero Spark jobs on a warm term); results must
    be bit-identical to the distributed path and the oracle across
    modes. The tiny test corpus keeps every query under the default df
    budget, so srv_local always takes the local venue."""
    srv_local = QueryServer(spark, base_index_dir["index"], cache_blocks=False)
    srv_dist = QueryServer(
        spark, base_index_dir["index"], cache_blocks=False, local_df_budget=0
    )
    assert srv_local.local_df_budget > 0
    for i in (0, 2, 7, 8, 11):
        qid, query, scope, k, offset = QUERY_CASES[i]
        exp = [
            (d, s)
            for d, s in orc.search(
                oracle_idx, query, scope=scope, k=k, offset=offset
            )
        ]
        for mode in ("wand", "exact"):
            got_l = srv_local.search(
                query, scope=scope, k=k, offset=offset, mode=mode
            )
            got_d = srv_dist.search(
                query, scope=scope, k=k, offset=offset, mode=mode
            )
            assert got_l == exp and got_d == exp, (qid, mode)
    assert srv_local._block_cache and not srv_dist._block_cache
    # warm repeat: served purely from the driver cache, same rows
    qid, query, scope, k, offset = QUERY_CASES[0]
    before = dict(srv_local._block_cache)
    again = srv_local.search(query, scope=scope, k=k, offset=offset)
    assert again == srv_dist.search(query, scope=scope, k=k, offset=offset)
    assert list(srv_local._block_cache) == list(before)


def test_server_local_cache_eviction(spark, base_index_dir, oracle_idx):
    """A 1-byte cache cap forces eviction of every lemma not in the
    current query; results stay oracle-identical throughout."""
    srv = QueryServer(
        spark, base_index_dir["index"], cache_blocks=False,
        local_cache_bytes=1,
    )
    for i in (0, 2, 0):
        qid, query, scope, k, offset = QUERY_CASES[i]
        exp = [
            (d, s)
            for d, s in orc.search(
                oracle_idx, query, scope=scope, k=k, offset=offset
            )
        ]
        assert srv.search(query, scope=scope, k=k, offset=offset) == exp, qid
        # only the current query's lemmas may remain cached
        assert sum(srv._block_cache_sizes.values()) == sum(
            srv._block_cache_sizes[l] for l in srv._block_cache
        )
        assert len(srv._block_cache) <= 4
