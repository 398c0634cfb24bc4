"""Significant-terms aggregation (operators/significant.py + the
SearchEngine.significant_terms sampler path) vs the oracle twin.
Contract twin: significant_terms (JLH over the documents table)."""

from __future__ import annotations

from oracle import oracle as orc
from tests.test_spark_engine import RARE


def test_oracle_significant_semantics(oracle_idx):
    # foreground = every doc containing RARE → RARE itself must qualify
    # with fg_df == its df and the maximal possible fgPct (1.0)
    fg = idx_docs(oracle_idx, RARE)
    out = orc.significant_terms(oracle_idx, fg, k=10, min_fg_df=2)
    assert out, "rare-term foreground yields significant terms"
    terms = [t for t, *_ in out]
    assert RARE_LEMMA(oracle_idx) in terms
    top = dict((t, (f, b, j)) for t, f, b, j in out)
    lem = RARE_LEMMA(oracle_idx)
    fg_df, bg_df, jlh = top[lem]
    assert fg_df == bg_df == len(fg)  # the seed term is in 100% of fg
    # pinned float shape
    n_docs = len(orc._scope_doc_ids(oracle_idx, None))
    fg_pct, bg_pct = fg_df / float(len(fg)), bg_df / float(n_docs)
    assert jlh == round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6)
    # min_fg_df respected
    assert all(f >= 2 for _, f, _, _ in out)
    # jlh desc, term asc ordering
    keys = [(-j, t) for t, _, _, j in out]
    assert keys == sorted(keys)


def idx_docs(idx, word):
    from search_engine_spark.functions.analyze import query_lemmas

    (lem,) = query_lemmas(word)
    return sorted(idx.postings.get(lem, {}))


def RARE_LEMMA(idx):
    from search_engine_spark.functions.analyze import query_lemmas

    (lem,) = query_lemmas(RARE)
    return lem


def test_api_significant_matches_oracle(spark, base_index_dir, oracle_idx):
    from search_engine_spark.api import SearchEngine

    eng = SearchEngine(spark, base_index_dir["index"])
    depth = 50
    # the engine's foreground = its top-`depth` result ids, which are
    # rank-identical to the oracle's (pinned total order)
    fg = [d for d, _ in orc.search(oracle_idx, RARE, k=depth)]
    want = orc.significant_terms(oracle_idx, fg, k=10)
    got = eng.significant_terms(RARE, k=10, depth=depth)
    assert got["result"] is True
    assert [
        (t["term"], t["fg_df"], t["bg_df"], t["score"])
        for t in got["terms"]
    ] == want
    assert want  # non-vacuous


def test_api_significant_scoped(spark, base_index_dir, oracle_idx):
    from search_engine_spark.api import SearchEngine

    eng = SearchEngine(spark, base_index_dir["index"])
    scope = "scope-0"
    fg = [d for d, _ in orc.search(oracle_idx, RARE, scope=scope, k=50)]
    want = orc.significant_terms(oracle_idx, fg, scope=scope, k=10)
    got = eng.significant_terms(RARE, k=10, scope=scope, depth=50)
    assert [
        (t["term"], t["fg_df"], t["bg_df"], t["score"])
        for t in got["terms"]
    ] == want
