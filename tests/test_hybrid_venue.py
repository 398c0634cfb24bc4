"""Hot∧rare hybrid serving venue: rare side from the driver cache,
hot blocks point-fetched by candidate range — rank/score-identical to
the oracle and the distributed path across modes, exclusions, cursors
and scopes; cap/disable knobs fall back cleanly."""

from __future__ import annotations

import pytest

from oracle import oracle as orc
from search_engine_spark.functions.analyze import query_lemmas, split_negations
from search_engine_spark.operators.serve import QueryServer
from tests.test_spark_engine import QUERY_CASES


@pytest.fixture(scope="module")
def srv(spark, base_index_dir):
    s = QueryServer(spark, base_index_dir["index"], cache_blocks=False)
    s.hot_df_budget = 0  # the HOT tier would otherwise serve first —
    # these tests pin the HYBRID venue specifically
    s.result_cache_size = 0  # repeats must exercise the venue
    return s


def _force_hybrid_budget(srv, query) -> int | None:
    """Budget that fits ONLY the rarest positive lemma — guarantees the
    hybrid venue (not local, rare side non-empty) for multi-term
    queries with distinct dfs."""
    pos_text, neg_text = split_negations(query)
    pos = query_lemmas(pos_text)
    neg = query_lemmas(neg_text)
    lemmas = sorted(set(pos) | set(neg))
    if len(set(pos)) < 2 and not neg:
        return None
    totals = srv._term_dfs(lemmas, None)
    dfs = sorted(totals[t] for t in set(pos))
    if len(dfs) < 2 or dfs[0] == dfs[-1]:
        return None
    return dfs[0]


def test_hybrid_rank_identity(srv, oracle_idx):
    exercised = 0
    for qid, query, scope, k, offset in QUERY_CASES:
        budget = _force_hybrid_budget(srv, query)
        if budget is None:
            continue
        srv.local_df_budget = budget
        exp = [
            (d, s)
            for d, s in orc.search(
                oracle_idx, query, scope=scope, k=k, offset=offset
            )
        ]
        for mode in ("wand", "exact"):
            got = srv.search(query, scope=scope, k=k, offset=offset, mode=mode)
            assert got == exp, (qid, mode)
        exercised += 1
    assert exercised >= 2
    assert srv._meta_cache  # the hybrid path actually ran


def test_hybrid_with_exclusion_and_cursor(srv, oracle_idx):
    """-term queries and search_after cursors ride the hybrid venue:
    excluded lemmas are candidate-fetched, the kernels' pinned cursor
    cut applies unchanged."""
    cases = [c for c in QUERY_CASES if _force_hybrid_budget(srv, c[1])]
    assert cases
    qid, query, scope, k, offset = cases[0]
    srv.local_df_budget = _force_hybrid_budget(srv, query)
    full = orc.search(oracle_idx, query, scope=scope, k=2 * k, offset=0)
    if len(full) > 1:
        after = (full[0][1], full[0][0])  # cursor = (score, doc_id)
        exp = [(d, s) for d, s in full[1:k + 1]]
        got = srv.search(query, scope=scope, k=k, mode="wand", after=after)
        assert got == exp, qid
    # exclusion: drop docs holding a mid-df lemma (hot enough that the
    # exclusion is candidate-fetched, small enough that results remain);
    # oracle.search takes pre-analyzed exclude= lemmas, so the chosen
    # lemma must round-trip the analyzer unchanged
    pos_lemmas = set(query_lemmas(split_negations(query)[0]))
    cands = sorted(
        (l for l, d in (srv._df_totals or {}).items()
         if l not in pos_lemmas and query_lemmas(l) == [l]),
        key=lambda l: -srv._df_totals[l],
    )
    nq = got = exp = None
    for ex in cands:
        exp = [
            (d, s)
            for d, s in orc.search(
                oracle_idx, query, scope=scope, k=k, offset=offset,
                exclude=[ex],
            )
        ]
        if exp:
            nq = f"{query} -{ex}"
            break
    if nq is None:
        pytest.skip("no exclusion lemma leaves results")
    got = srv.search(nq, scope=scope, k=k, offset=offset)
    assert got == exp, (qid, nq)


def test_hybrid_cap_falls_back_distributed(spark, base_index_dir, oracle_idx):
    srv2 = QueryServer(
        spark, base_index_dir["index"], cache_blocks=False,
        hybrid_max_fetch_blocks=0, hot_df_budget=0,
    )
    for qid, query, scope, k, offset in QUERY_CASES[:6]:
        budget = _force_hybrid_budget(srv2, query)
        if budget is None:
            continue
        srv2.local_df_budget = budget
        exp = [
            (d, s)
            for d, s in orc.search(
                oracle_idx, query, scope=scope, k=k, offset=offset
            )
        ]
        assert srv2.search(query, scope=scope, k=k, offset=offset) == exp, qid
    assert not srv2._meta_cache  # venue disabled — never planned


def _spy_hybrid(srv):
    """Wrap srv._hybrid_blocks to record whether the venue actually
    SERVED (returned a frame) vs declined to the distributed path."""
    served = []
    orig = srv._hybrid_blocks

    def spy(*a, **kw):
        r = orig(*a, **kw)
        served.append(r is not None)
        return r

    srv._hybrid_blocks = spy
    return served


def _cooccurring_pair(oracle_idx, min_ratio=3):
    """(rare, hot) analyzer-stable lemmas with df(hot) ≥ min_ratio ×
    df(rare) and a non-empty posting intersection."""
    posts = oracle_idx.postings
    by_df = sorted(posts, key=lambda l: (len(posts[l]), l))
    for rare in by_df[:60]:
        if query_lemmas(rare) != [rare]:
            continue
        rd = set(posts[rare])
        for hot in reversed(by_df):
            if len(posts[hot]) < min_ratio * len(posts[rare]):
                break
            if hot == rare or query_lemmas(hot) != [hot]:
                continue
            if rd & set(posts[hot]):
                return rare, hot
    return None


def test_hybrid_bool_rank_identity(spark, base_index_dir, oracle_idx):
    """Boolean queries ride the hot∧rare venue: the tree's top-level
    plain-term conjuncts bound the match set, OR-branch and negated
    lemmas are candidate-fetched — rank/score-identical to
    oracle.bool_search, and the venue demonstrably SERVES (not just
    plans) at least one query."""
    srv = QueryServer(spark, base_index_dir["index"], cache_blocks=False)
    srv.hot_df_budget = 0  # pin the hybrid venue (hot tier serves first)
    srv.hybrid_fetch_frac = 1.0  # small corpus: don't let the
    # nothing-to-skip gate hide the venue from the test
    pair = _cooccurring_pair(oracle_idx)
    assert pair, "corpus has no co-occurring rare/hot pair"
    rare, hot = pair
    posts = oracle_idx.postings
    others = sorted(
        (l for l in posts
         if l not in pair and query_lemmas(l) == [l]),
        key=lambda l: -len(posts[l]),
    )
    hot2 = others[0]
    srv.local_df_budget = srv._term_dfs([rare], None)[rare]
    served = _spy_hybrid(srv)
    queries = [
        f"{rare} {hot}",             # implicit AND of plain terms
        f"{rare} ({hot} | {hot2})",  # OR branch rides the candidate fetch
        f"{rare} {hot} -{hot2}",     # negated lemma rides it too
        f"({rare} | {hot2}) {hot}",  # no rare top-level term conjunct
    ]
    nonempty = 0
    for q in queries:
        exp = orc.bool_search(oracle_idx, q, k=10)
        got = srv.bool_search(q, k=10)
        assert got == [(d, s) for d, s in exp], q
        nonempty += bool(exp)
    assert nonempty >= 2
    assert any(served), "hybrid venue never served a bool query"


def test_hybrid_with_filters_rank_identity(spark, base_index_dir, oracle_idx):
    """Attribute-filtered queries ride the hybrid venue (round-3
    extension): filter lemmas are candidate-fetched from the FILTER
    family — never loaded whole (they are hot by nature) — and results
    stay identical to oracle.search/bool_search(filters=...) on both
    the term and bool paths."""
    srv = QueryServer(spark, base_index_dir["index"], cache_blocks=False)
    srv.hot_df_budget = 0  # pin the hybrid venue (hot tier serves first)
    srv.hybrid_fetch_frac = 1.0
    pair = _cooccurring_pair(oracle_idx)
    assert pair
    rare, hot = pair
    srv.local_df_budget = srv._term_dfs([rare], None)[rare]
    served = _spy_hybrid(srv)
    filter_cases = [
        {"role": "user"},
        {"role": "assistant"},
        {"role": ["user", "assistant"]},
        {"date": {"from": "2025-01-02", "to": "2025-01-07"}},
    ]
    q = f"{rare} {hot}"
    nonempty = bites = 0
    base = orc.search(oracle_idx, q, k=10)
    for filters in filter_cases:
        exp = orc.search(oracle_idx, q, k=10, filters=filters)
        got = srv.search(q, k=10, filters=filters)
        assert got == exp, filters
        bexp = orc.bool_search(oracle_idx, q, k=10, filters=filters)
        bgot = srv.bool_search(q, k=10, filters=filters)
        assert bgot == bexp, ("bool", filters)
        nonempty += bool(exp)
        bites += exp != base
    assert nonempty and bites  # filters really constrained something
    assert any(served), "hybrid venue never served a filtered query"


def test_hybrid_empty_intersection(spark, base_index_dir, oracle_idx, small_pdf):
    """Two terms that never co-occur: the hybrid venue short-circuits
    on an empty candidate set without fetching any hot block."""
    srv2 = QueryServer(spark, base_index_dir["index"], cache_blocks=False)
    srv2.hot_df_budget = 0  # pin the hybrid venue (hot tier serves first)
    # find a (rare, hot) lemma pair with empty intersection via oracle
    posts = orc.build_index(small_pdf).postings
    by_df = sorted(posts, key=lambda l: len(posts[l]))
    pair = None
    for rare in by_df[:20]:
        rare_docs = set(posts[rare])
        for hot in reversed(by_df):
            if len(posts[hot]) <= len(posts[rare]):
                break
            if not rare_docs & set(posts[hot]):
                pair = (rare, hot)
                break
        if pair:
            break
    if pair is None:
        pytest.skip("corpus has no disjoint rare/hot pair")
    rare, hot = pair
    srv2.local_df_budget = len(posts[rare])
    q = f"{rare} {hot}"
    exp = [(d, s) for d, s in orc.search(oracle_idx, q, k=10)]
    assert srv2.search(q, k=10) == exp
