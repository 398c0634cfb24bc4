"""More-like-this (operators/query.py) vs the oracle twin, plus facet
counts over a result set."""

from __future__ import annotations

import pytest

from oracle import oracle as orc


@pytest.mark.parametrize("doc_id", [5, 17, 123, 999])
def test_more_like_this_matches_oracle(engine_tables, oracle_idx, doc_id):
    from search_engine_spark.operators.query import more_like_this

    got = [
        (r["doc_id"], r["score"])
        for r in more_like_this(
            engine_tables["docs"],
            engine_tables["postings_flat"],
            engine_tables["lemma_stats"],
            engine_tables["doc_stats"],
            doc_id,
            k=10,
        ).collect()
    ]
    want = orc.more_like_this(oracle_idx, doc_id, k=10)
    assert got == want  # bit-identical float64, same tiebreak


def test_more_like_this_scoped(engine_tables, oracle_idx):
    from search_engine_spark.operators.query import more_like_this

    # pick a doc and query within its own scope
    doc_id = 42
    scope = oracle_idx.doc_scope[doc_id]
    got = [
        (r["doc_id"], r["score"])
        for r in more_like_this(
            engine_tables["docs"],
            engine_tables["postings_flat"],
            engine_tables["lemma_stats"],
            engine_tables["doc_stats"],
            doc_id,
            scope=scope,
            k=10,
        ).collect()
    ]
    want = orc.more_like_this(oracle_idx, doc_id, scope=scope, k=10)
    assert got == want
    # scoped results stay in scope and never include the source
    for d, _ in got:
        assert oracle_idx.doc_scope[d] == scope
        assert d != doc_id


def test_more_like_this_missing_doc_is_empty(engine_tables):
    from search_engine_spark.operators.query import more_like_this

    assert (
        more_like_this(
            engine_tables["docs"],
            engine_tables["postings_flat"],
            engine_tables["lemma_stats"],
            engine_tables["doc_stats"],
            10_000_000,
        ).count()
        == 0
    )


def test_facet_counts_matches_pandas(engine_tables):
    from search_engine_spark.operators.query import bm25_search, facet_counts
    from tests.test_spark_engine import RARE

    results = bm25_search(
        engine_tables["postings_flat"],
        engine_tables["lemma_stats"],
        engine_tables["doc_stats"],
        RARE,  # NOT "dup merge": that conjunction never co-occurs in the
        k=50,  # fixture corpus, so the test was passing on empty sets
    )
    got = {
        (r["scope"], r["role"]): r["n_docs"]
        for r in facet_counts(
            results, engine_tables["docs"], ["scope", "role"]
        ).collect()
    }
    hit_ids = {r["doc_id"] for r in results.collect()}
    docs_pdf = (
        engine_tables["docs"]
        .select("doc_id", "scope", "role")
        .toPandas()
    )
    sub = docs_pdf[docs_pdf["doc_id"].isin(hit_ids)]
    want = sub.groupby(["scope", "role"]).size().to_dict()
    assert hit_ids and got == want and sum(got.values()) == len(hit_ids)


def test_api_more_like_this_and_facets(spark, base_index_dir):
    from search_engine_spark.api import SearchEngine

    eng = SearchEngine(spark, base_index_dir["index"])
    mlt = eng.more_like_this(5, limit=5)
    assert mlt["result"] is True
    assert 0 < mlt["count"] <= 5
    for item in mlt["data"]:
        assert set(item) == {"site", "uri", "title", "relevance"}
        assert item["uri"].count("#") == 1

    fac = eng.facets("bavabaed", facet_cols=("scope",))
    assert fac["result"] is True
    assert fac["facets"] and all(
        f["n_docs"] > 0 and f["scope"].startswith("scope-")
        for f in fac["facets"]
    )
