"""Reciprocal-rank fusion (operators/hybrid.py): pinned formula
1/(60+rank) summed in list order, missing docs contribute 0.0, rounded
output, (rrf desc, doc_id asc) ties. Contract twin: hybrid_rrf_topk."""

from __future__ import annotations

import pytest

from search_engine_spark.operators.hybrid import rrf_fuse


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, score double")


def _collect(df):
    return [(r["doc_id"], r["rrf"]) for r in df.collect()]


def test_rrf_hand_computed(spark):
    # lex ranks: 1→d1, 2→d2, 3→d3; sem ranks: 1→d2, 2→d4
    lex = _df(spark, [(1, 9.0), (2, 5.0), (3, 1.0)])
    sem = _df(spark, [(2, 0.9), (4, 0.8)])
    got = dict(_collect(rrf_fuse([lex, sem], topk=10)))
    assert got[2] == round(1.0 / 62 + 1.0 / 61, 6)  # lex rank 2 + sem rank 1
    assert got[1] == round(1.0 / 61, 6)             # lex rank 1 only
    assert got[4] == round(1.0 / 62, 6)             # sem rank 2 only
    assert got[3] == round(1.0 / 63, 6)
    # doc in both lists outranks the lex winner; full order pinned
    order = [d for d, _ in _collect(rrf_fuse([lex, sem], topk=10))]
    assert order == [2, 1, 4, 3]


def test_rrf_rank_ties_and_topk(spark):
    # equal scores rank by doc_id asc inside a list (pinned tiebreak)
    lex = _df(spark, [(7, 3.0), (5, 3.0), (9, 3.0)])
    got = _collect(rrf_fuse([lex], topk=2))
    assert got == [
        (5, round(1.0 / 61, 6)),
        (7, round(1.0 / 62, 6)),
    ]


def test_rrf_custom_k_and_errors(spark):
    lex = _df(spark, [(1, 2.0)])
    assert _collect(rrf_fuse([lex], rrf_k=10)) == [(1, round(1.0 / 11, 6))]
    with pytest.raises(ValueError):
        rrf_fuse([])
