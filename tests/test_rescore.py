"""Proximity rescoring (operators/rescore.py): min-cover-span kernel
properties, oracle twin rank identity on the engine path, API guards.
Contract twin: rescore_proximity."""

from __future__ import annotations

import pytest

from oracle import oracle as orc
from search_engine_spark.operators.rescore import (
    min_cover_span,
    proximity_of,
)
from tests.test_spark_engine import RARE, VOCAB

R2 = str(VOCAB[310])


def test_min_cover_span():
    assert min_cover_span([[0], [1]]) == 2           # adjacent
    assert min_cover_span([[0, 9], [5, 10]]) == 2    # 9,10
    assert min_cover_span([[3]]) == 1                # single list
    assert min_cover_span([[0, 20], [10], [11, 30]]) == 11  # window 10..20
    assert min_cover_span([[1], []]) is None         # missing term
    assert min_cover_span([]) is None


def test_proximity_of_pins():
    from search_engine_spark.functions.analyze import query_lemmas

    lems = sorted(set(query_lemmas(f"{RARE} {R2}")))  # the API's terms
    # adjacent run of both lemmas scores exactly 1.0
    assert proximity_of(f"{RARE} {R2}", lems) == 1.0
    # a missing term scores 0
    assert proximity_of(RARE, lems) == 0.0
    # stopwords do not widen the span (positions index the ANALYZED
    # post-stopword stream, same as phrase search)
    assert proximity_of(f"{RARE} the {R2}", lems) == 1.0
    far = proximity_of(f"{RARE} zaba cabada {R2}", lems)
    assert 0.0 < far < 1.0


def test_api_rescore_matches_oracle(spark, base_index_dir, oracle_idx):
    from search_engine_spark.api import SearchEngine

    eng = SearchEngine(spark, base_index_dir["index"])
    q = f"{RARE} {R2}"
    for combine in ("and", "or"):
        want = orc.rescore_search(
            oracle_idx, q, k=100, window=50, combine=combine
        )[:10]
        got = eng.search(
            q, combine=combine, limit=10, rescore_window=50
        )
        assert [
            (d, round(s, 9)) for d, s in zip(
                eng._cache_ids[:10],
                [x["relevance"] for x in got["data"]],
            )
        ] == [(d, round(s, 9)) for d, s in want]
        assert want
    # a window WIDER than the deep page (10*(offset+limit)) must widen
    # the first-stage fetch — oracle/QueryServer pin stage 1 at
    # k=window, so rescoring only the page depth ranks differently
    want_wide = orc.rescore_search(oracle_idx, q, k=50, window=50)[:2]
    got_wide = eng.search(q, limit=2, rescore_window=50)
    assert [
        (d, round(s, 9)) for d, s in zip(
            eng._cache_ids[:2],
            [x["relevance"] for x in got_wide["data"]],
        )
    ] == [(d, round(s, 9)) for d, s in want_wide]
    # guards: rescore composes with neither cursors nor collapse
    with pytest.raises(ValueError, match="rescore"):
        eng.search(q, rescore_window=50, after=(1.0, 1))
    with pytest.raises(ValueError, match="rescore"):
        eng.search(q, rescore_window=50, collapse="conv_id")
    with pytest.raises(ValueError, match="rescore"):
        eng.search(q, rescore_window=50, match="phrase")
