"""Engine ⇄ oracle parity: docs, stats, and rank-identical BM25/reftf
search across the FIXTURES.md §3 query classes (SURVEY.md §5 items 2-3, 6)."""

from __future__ import annotations

import pytest

from oracle import oracle as orc
from search_engine_spark.operators.query import bm25_search, reftf_search
from search_engine_spark.sources.corpus import HOT_TERM, _build_vocab

import numpy as np

VOCAB = _build_vocab(np.random.default_rng(0))
RARE = VOCAB[300]      # Zipf rank ~301 → rare, passes cutoff
MID = VOCAB[30]        # mid-frequency
HOT2 = VOCAB[0]        # rank-1 vocab word → above cutoff


def _oracle_docs(small_pdf):
    return orc.build_docs(small_pdf)


def test_docs_match_oracle(engine_tables, small_pdf):
    got = (
        engine_tables["docs"]
        .select("doc_id", "conv_id", "turn_idx", "scope", "doc_len", "text")
        .orderBy("doc_id")
        .collect()
    )
    exp = _oracle_docs(small_pdf)
    assert len(got) == len(exp)
    for g, (_, e) in zip(got, exp.iterrows()):
        assert g["doc_id"] == e["doc_id"]
        assert g["conv_id"] == e["conv_id"]
        assert g["turn_idx"] == e["turn_idx"]
        assert g["scope"] == e["scope"]
        assert g["doc_len"] == e["doc_len"]
        assert g["text"] == e["text"]  # per-row invariant (input_hint)


def test_lemma_stats_match_oracle(engine_tables, oracle_idx):
    got = {
        (r["scope"], r["lemma"]): (r["df"], r["cf"])
        for r in engine_tables["lemma_stats"].collect()
    }
    exp = {
        k: (df, oracle_idx.lemma_cf[k]) for k, df in oracle_idx.lemma_df.items()
    }
    assert got == exp


def test_doc_stats_match_oracle(engine_tables, oracle_idx):
    rows = engine_tables["doc_stats"].collect()
    for r in rows:
        ids = oracle_idx.scope_docs[r["scope"]]
        assert r["n_docs"] == len(ids)
        assert r["sum_doc_len"] == sum(oracle_idx.doc_len[d] for d in ids)


QUERY_CASES = [
    # (qid, query, scope, k, offset) — FIXTURES.md §3 classes
    ("q01_rare", RARE, None, 10, 0),
    ("q02_hot_cutoff", HOT_TERM, None, 10, 0),
    ("q03_conj_mixed", f"{HOT_TERM} {RARE}", None, 10, 0),
    ("q04_conj_all_hot", f"{HOT_TERM} {HOT2}", None, 10, 0),
    ("q05_absent", "zzqqxxunknown", None, 10, 0),
    ("q06_yo_variant", "зелёный", None, 10, 0),
    ("q07_particles_only", "the and of и в", None, 10, 0),
    ("q08_scoped", MID, "scope-1", 10, 0),
    ("q08b_global_same_term", MID, None, 10, 0),
    ("q09_paginated", MID, None, 5, 5),
    ("q10_k_gt_matches", RARE, None, 100, 0),
    ("q11_multi3", f"{MID} {VOCAB[40]} {VOCAB[50]}", None, 10, 0),
]


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


@pytest.mark.parametrize("qid,query,scope,k,offset", QUERY_CASES)
def test_bm25_rank_identical(engine_tables, oracle_idx, qid, query, scope, k, offset):
    exp = orc.search(oracle_idx, query, scope=scope, k=k, offset=offset, scorer="bm25")
    got = _rows(
        bm25_search(
            engine_tables["postings_flat"],
            engine_tables["lemma_stats"],
            engine_tables["doc_stats"],
            query, scope=scope, k=k, offset=offset,
        )
    )
    assert [d for d, _ in got] == [d for d, _ in exp], qid
    for (gd, gs), (ed, es) in zip(got, exp):
        assert gs == pytest.approx(es, abs=1e-12), (qid, gd)


def test_query_classes_hit_intended_paths(oracle_idx):
    """Guard: the chosen words actually exercise the intended classes."""
    n = len(oracle_idx.doc_len)
    from search_engine_spark.functions.analyze import query_lemmas
    from search_engine_spark.functions.scoring import df_cutoff

    def gdf(word):
        (lem,) = query_lemmas(word)
        return sum(v for (s, l), v in oracle_idx.lemma_df.items() if l == lem)

    assert gdf(HOT_TERM) > df_cutoff(n)       # q02 really hits the cutoff
    assert 0 < gdf(RARE) <= df_cutoff(n)      # q01 really is a plain hit
    assert orc.search(oracle_idx, HOT_TERM) == []
    assert orc.search(oracle_idx, RARE) != []
    assert orc.search(oracle_idx, f"{HOT_TERM} {HOT2}") == []  # q04 killed
    assert orc.search(oracle_idx, f"{HOT_TERM} {RARE}") != []  # q03 passes


@pytest.mark.parametrize("qid,query,scope", [
    ("r01", RARE, None),
    ("r02", f"{HOT_TERM} {RARE}", None),
    ("r03", MID, "scope-1"),
])
def test_reftf_rank_identical(engine_tables, oracle_idx, qid, query, scope):
    exp = orc.search(oracle_idx, query, scope=scope, k=10, scorer="reftf")
    got = _rows(
        reftf_search(
            engine_tables["postings_flat"],
            engine_tables["lemma_stats"],
            engine_tables["doc_stats"],
            query, scope=scope, k=10,
        )
    )
    assert [d for d, _ in got] == [d for d, _ in exp], qid
    for (gd, gs), (ed, es) in zip(got, exp):
        assert gs == pytest.approx(es, abs=1e-12), (qid, gd)
