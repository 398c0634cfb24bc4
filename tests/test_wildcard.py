"""Prefix wildcards (the ``term*`` query syntax): bounded top-cf
dictionary rewrite (operators/fuzzy.expand_prefix, the public Lucene
PrefixQuery top-terms rewrite), then the standard pinned OR plans.
Rank identity: oracle (extra_terms) vs QueryServer vs SearchEngine."""

from __future__ import annotations

import pytest

from oracle import oracle as orc
from search_engine_spark.functions.analyze import query_lemmas, split_wildcards
from tests.test_spark_engine import RARE


def test_split_wildcards():
    assert split_wildcards("dup me*") == ("dup", ["me"])
    assert split_wildcards("a* b c*") == ("b", ["a", "c"])
    assert split_wildcards("c* a* c*") == ("", ["a", "c"])  # sorted, deduped
    assert split_wildcards("*") == ("*", [])  # bare star is not a wildcard
    assert split_wildcards("ME*") == ("", ["me"])  # folded
    assert split_wildcards("x?!*") == ("", [])  # non-token prefix dropped


@pytest.fixture(scope="module")
def wc(oracle_idx):
    """(prefix, expansions): a prefix of the RARE lemma with ≥2
    completions — guaranteed to exist in the shared corpus vocab."""
    lem = query_lemmas(RARE)[0]
    for cut in (4, 3, 2):
        prefix = lem[:cut]
        exp = orc.expand_prefix(oracle_idx, prefix)
        if len(exp) >= 2:
            return prefix, exp
    pytest.fail("no multi-completion prefix found")


def test_expansion_matches_oracle(spark, base_index_dir, oracle_idx, wc):
    from search_engine_spark.operators.fuzzy import expand_prefix
    from search_engine_spark.sources.io import read_table

    prefix, exp = wc
    ls = read_table(spark, f"{base_index_dir['index']}/lemma_stats")
    assert expand_prefix(ls, prefix) == exp


def test_wildcard_rank_identity(spark, base_index_dir, oracle_idx, wc):
    from search_engine_spark.api import SearchEngine
    from search_engine_spark.operators.serve import QueryServer

    prefix, exp_terms = wc
    srv = QueryServer(spark, base_index_dir["index"], cache_blocks=False)

    # pure wildcard
    expected = orc.search(
        oracle_idx, "", combine="or", extra_terms=exp_terms, k=10
    )
    assert expected, "expansion must hit the corpus"
    assert srv.search(f"{prefix}*", combine="or", k=10) == expected

    # wildcard mixed with an explicit term
    exp_mixed = orc.search(
        oracle_idx, RARE, combine="or", extra_terms=exp_terms, k=10
    )
    assert srv.search(f"{RARE} {prefix}*", combine="or", k=10) == exp_mixed

    # API facade: relevance sequence equals the oracle's scores
    eng = SearchEngine(spark, base_index_dir["index"])
    res = eng.search(f"{prefix}*", combine="or", limit=10)
    assert [d["relevance"] for d in res["data"]] == [
        s for _, s in expected[: len(res["data"])]
    ]


def test_wildcard_requires_or_mode(spark, base_index_dir, wc):
    from search_engine_spark.api import SearchEngine
    from search_engine_spark.operators.serve import QueryServer

    prefix, _ = wc
    srv = QueryServer(spark, base_index_dir["index"], cache_blocks=False)
    with pytest.raises(ValueError, match="or"):
        srv.search(f"{prefix}*", combine="and")
    eng = SearchEngine(spark, base_index_dir["index"])
    with pytest.raises(ValueError, match="or"):
        eng.search(f"{prefix}*")  # default combine="and"


def test_wildcard_with_exclusion(spark, base_index_dir, oracle_idx, wc):
    """Syntax composes: "pre* -excl" = expansion minus excluded docs."""
    from search_engine_spark.operators.serve import QueryServer

    prefix, exp_terms = wc
    base = orc.search(
        oracle_idx, "", combine="or", extra_terms=exp_terms, k=10
    )
    # rarest lemma of the top hit, not among the expansions
    cands = sorted(
        (len(pl), t)
        for t, pl in oracle_idx.postings.items()
        if base[0][0] in pl and t not in set(exp_terms)
    )
    excl_word = cands[0][1]
    expected = orc.search(
        oracle_idx, "", combine="or", extra_terms=exp_terms, k=10,
        exclude=query_lemmas(excl_word),
    )
    assert expected != base
    srv = QueryServer(spark, base_index_dir["index"], cache_blocks=False)
    got = srv.search(f"{prefix}* -{excl_word}", combine="or", k=10)
    assert got == expected
