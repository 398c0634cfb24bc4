"""SearchEngine.explain: per-term scoring breakdown whose total is
BIT-IDENTICAL to the search kernels' returned relevance, with the
cutoff gates reported (AND kill vs OR per-term drop)."""

from __future__ import annotations

from oracle import oracle as orc
from tests.test_spark_engine import HOT_TERM, RARE, VOCAB

R2 = str(VOCAB[310])


def _engine(spark, base_index_dir):
    from search_engine_spark.api import SearchEngine

    return SearchEngine(spark, base_index_dir["index"])


def test_explain_matches_search_scores(spark, base_index_dir, oracle_idx):
    eng = _engine(spark, base_index_dir)
    for combine in ("and", "or"):
        hits = orc.search(oracle_idx, f"{RARE} {R2}", k=5, combine=combine)
        assert hits
        for doc_id, score in hits:
            ex = eng.explain(f"{RARE} {R2}", doc_id, combine=combine)
            assert ex["matches"] is True
            assert ex["score"] == score  # bit-identical float64
            assert sum(
                t["partial"] for t in ex["terms"] if t["present"]
            ) == ex["score"]
            for t in ex["terms"]:
                assert t["df"] > 0 and t["idf"] > 0.0
                if combine == "and":
                    assert t["present"] and t["tf"] > 0


def test_explain_non_match_and_gates(spark, base_index_dir, oracle_idx):
    eng = _engine(spark, base_index_dir)
    # a doc that holds RARE but not R2 does not match the AND query
    only_rare = sorted(
        set(orc_postings(oracle_idx, RARE)) - set(orc_postings(oracle_idx, R2))
    )
    assert only_rare
    ex = eng.explain(f"{RARE} {R2}", only_rare[0], combine="and")
    assert ex["matches"] is False and ex["score"] > 0.0  # rare partial only
    # ...but it DOES match (and scores the same partial) in OR mode
    ex_or = eng.explain(f"{RARE} {R2}", only_rare[0], combine="or")
    assert ex_or["matches"] is True and ex_or["score"] == ex["score"]
    # AND kill is the reference rule: the query dies iff the RAREST
    # term is over-cutoff — an all-hot query dies, hot∧rare does not
    hot_doc = orc_postings(oracle_idx, HOT_TERM)[0]
    ex = eng.explain(HOT_TERM, hot_doc, combine="and")
    assert ex["killed_by_cutoff"] is True and ex["matches"] is False
    assert ex["score"] == 0.0
    # hot∧rare: not killed; the hot term PARTICIPATES in AND scoring,
    # and explain equals the real search score for a matched doc
    both = sorted(
        set(orc_postings(oracle_idx, HOT_TERM))
        & set(orc_postings(oracle_idx, RARE))
    )
    if both:
        hits = dict(orc.search(oracle_idx, f"{HOT_TERM} {RARE}", k=10000))
        ex = eng.explain(f"{HOT_TERM} {RARE}", both[0], combine="and")
        assert ex["killed_by_cutoff"] is False and ex["matches"] is True
        assert ex["score"] == hits[both[0]]
    # OR mode drops the hot term per-term, keeps the rare one
    ex = eng.explain(f"{HOT_TERM} {RARE}", hot_doc, combine="or")
    assert ex["killed_by_cutoff"] is False
    dropped = {t["lemma"]: t["dropped"] for t in ex["terms"]}
    assert any(dropped.values()) and not all(dropped.values())
    # scope mismatch: nothing scores
    doc_scope = oracle_idx.doc_scope[hot_doc]
    other = "scope-0" if doc_scope != "scope-0" else "scope-1"
    ex = eng.explain(RARE, hot_doc, scope=other)
    assert ex["in_scope"] is False and ex["score"] == 0.0
    assert ex["matches"] is False


def orc_postings(idx, word):
    from search_engine_spark.functions.analyze import query_lemmas

    (lem,) = query_lemmas(word)
    return sorted(idx.postings.get(lem, {}))
