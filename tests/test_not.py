"""Negative terms (the ``-term`` query syntax): docs holding an excluded
lemma drop from the candidate set BEFORE the top-k cut. Rank identity is
asserted across all implementations — oracle / flat / blocks{exact,wand}
× {and,or} / QueryServer / SearchEngine — plus a kernel-level hypothesis
property (exclusion-aware kernels ≡ brute-force filter of untruncated
exact results)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings

from oracle import oracle as orc
from search_engine_spark.functions.analyze import query_lemmas, split_negations
from search_engine_spark.operators.query import bm25_search
from search_engine_spark.operators.wand import bm25_search_blocks
from tests.test_spark_engine import HOT_TERM, RARE, VOCAB
from tests.test_wand_property import _blocks_frame, corpus_strategy


# -- parsing -----------------------------------------------------------------


def test_split_negations():
    assert split_negations("merge -draft") == ("merge", "draft")
    assert split_negations("-a b -c d") == ("b d", "a c")
    assert split_negations("state-of-the-art x") == ("state-of-the-art x", "")
    assert split_negations("-") == ("-", "")  # bare dash is not a negation
    assert split_negations("-only") == ("", "only")


# -- picking exclusions that actually change results -------------------------


def _lemmas_of_doc(idx, doc_id: int) -> set[str]:
    return {t for t, pl in idx.postings.items() if doc_id in pl}


def _effective_exclusion(idx, query: str, scope=None, combine="and") -> str:
    """The RAREST lemma held by the top result but not in the query —
    excluding it is guaranteed to change the ranking (it removes at
    least the top doc) without emptying the result like a hot lemma
    would (deterministic pick)."""
    base = orc.search(idx, query, scope=scope, k=10, combine=combine)
    assert base, "exclusion cases need a non-empty base result"
    qset = set(query_lemmas(query))
    cands = sorted(
        (len(idx.postings[t]), t)
        for t in _lemmas_of_doc(idx, base[0][0]) - qset
    )
    assert cands
    return cands[0][1]


# -- rank identity across every implementation -------------------------------


CASES = [
    # (qid, positive query, scope, k, offset, combine) — RARE-anchored:
    # everything hotter is cutoff-killed on this corpus (q02 class)
    ("n01_rare", RARE, None, 10, 0, "and"),
    ("n02_conj", f"{HOT_TERM} {RARE}", None, 10, 0, "and"),
    ("n03_scoped", RARE, "scope-1", 10, 0, "and"),
    ("n04_or", f"{RARE} {VOCAB[40]}", None, 10, 0, "or"),
    ("n05_paginated", RARE, None, 5, 3, "and"),
]


@pytest.mark.parametrize("qid,query,scope,k,offset,combine", CASES)
def test_not_rank_identity(
    spark, engine_tables, base_index_dir, oracle_idx,
    qid, query, scope, k, offset, combine,
):
    from search_engine_spark.sources.io import read_table

    excl_word = _effective_exclusion(
        oracle_idx, query, scope=scope, combine=combine
    )
    excl = query_lemmas(excl_word)
    exp = orc.search(
        oracle_idx, query, scope=scope, k=k, offset=offset,
        combine=combine, exclude=excl,
    )
    base = orc.search(
        oracle_idx, query, scope=scope, k=k, offset=offset, combine=combine
    )
    assert exp != base, qid  # the exclusion must actually bite

    flat = bm25_search(
        engine_tables["postings_flat"], engine_tables["lemma_stats"],
        engine_tables["doc_stats"], query,
        scope=scope, k=k, offset=offset, combine=combine, exclude_terms=excl,
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in flat] == exp, qid

    blocks = read_table(spark, f"{base_index_dir['index']}/postings")
    ls = read_table(spark, f"{base_index_dir['index']}/lemma_stats")
    ds = read_table(spark, f"{base_index_dir['index']}/doc_stats")
    for mode in ("exact", "wand"):
        got = bm25_search_blocks(
            blocks, ls, ds, query, scope=scope, k=k, offset=offset,
            mode=mode, combine=combine, exclude_terms=excl,
        ).collect()
        assert [(r["doc_id"], r["score"]) for r in got] == exp, (qid, mode)


def test_not_via_query_server_and_api(spark, base_index_dir, oracle_idx):
    """The raw ``-term`` string parses identically through QueryServer and
    SearchEngine; results match the oracle bit-identically."""
    from search_engine_spark.api import SearchEngine
    from search_engine_spark.operators.serve import QueryServer

    excl_word = _effective_exclusion(oracle_idx, RARE)
    exp = orc.search(
        oracle_idx, RARE, k=10, exclude=query_lemmas(excl_word)
    )
    srv = QueryServer(spark, base_index_dir["index"], cache_blocks=False)
    got = srv.search(f"{RARE} -{excl_word}", k=10)
    assert got == exp

    eng = SearchEngine(spark, base_index_dir["index"])
    res = eng.search(f"{RARE} -{excl_word}", limit=10)
    # API rows keep the pinned order — the relevance sequence must equal
    # the oracle's scores exactly
    assert [d["relevance"] for d in res["data"]] == [
        s for _, s in exp[: len(res["data"])]
    ]
    assert len(res["data"]) == min(10, len(exp))


def test_not_contradiction_and_unknown(spark, engine_tables, oracle_idx):
    """positive ∩ excluded → empty everywhere; unknown exclusion → no-op
    (bit-identical to the plain query)."""
    lem = query_lemmas(RARE)
    assert orc.search(oracle_idx, RARE, k=10, exclude=lem) == []
    got = bm25_search(
        engine_tables["postings_flat"], engine_tables["lemma_stats"],
        engine_tables["doc_stats"], RARE, k=10, exclude_terms=lem,
    ).collect()
    assert got == []

    plain = orc.search(oracle_idx, RARE, k=10)
    noop = orc.search(oracle_idx, RARE, k=10, exclude=["zzqqxxunknown"])
    assert noop == plain
    got2 = bm25_search(
        engine_tables["postings_flat"], engine_tables["lemma_stats"],
        engine_tables["doc_stats"], RARE, k=10,
        exclude_terms=["zzqqxxunknown"],
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in got2] == plain


# -- kernel-level property ----------------------------------------------------


@given(corpus_strategy)
@settings(max_examples=100, deadline=None)
def test_kernels_with_exclusion_random(cfg):
    """All four kernels with an excluded term ≡ brute-force filter of the
    UNtruncated exact result (filter-then-cut, never cut-then-filter)."""
    from search_engine_spark.operators import compress as C
    from search_engine_spark.operators.wand import (
        _shard_exact_kernel,
        _shard_or_exact_kernel,
        _shard_or_wand_kernel,
        _shard_wand_kernel,
    )

    rng = np.random.default_rng(cfg["seed"])
    docs = np.arange(1, cfg["n_docs"] + 1)
    doc_lens = {int(d): int(rng.integers(1, 200)) for d in docs}
    terms = [f"t{j}" for j in range(cfg["n_terms"])]
    term_postings = {}
    for t in terms + ["xx_excl"]:
        mask = rng.random(docs.size) < cfg["density"]
        chosen = docs[mask]
        if chosen.size == 0:
            chosen = docs[:1]
        term_postings[t] = {int(d): int(rng.integers(1, 30)) for d in chosen}
    excl_docs = set(term_postings["xx_excl"])
    scope_of_doc = lambda d: f"s{d % 3}"  # noqa: E731
    old = C.BLOCK_SIZE
    C.BLOCK_SIZE = 16
    try:
        pdf = _blocks_frame(term_postings, doc_lens, scope_of_doc)
    finally:
        C.BLOCK_SIZE = old
    idfs = [float(rng.uniform(0.1, 5.0)) for _ in terms]
    avg_len = float(rng.uniform(5, 150))
    m = cfg["k"]

    def canon(df):
        return sorted(
            zip(df["doc_id"].astype(int), df["score"].astype(float)),
            key=lambda r: (-r[1], r[0]),
        )

    for combine, kexact, kwand in (
        ("and", _shard_exact_kernel, _shard_wand_kernel),
        ("or", _shard_or_exact_kernel, _shard_or_wand_kernel),
    ):
        # reference: untruncated exact WITHOUT exclusion, filtered, cut
        full = canon(kexact(terms, idfs, avg_len, 10**9)(pdf))
        ref = [r for r in full if r[0] not in excl_docs][:m]
        got_e = canon(kexact(terms, idfs, avg_len, m, ("xx_excl",))(pdf))
        got_w = canon(kwand(terms, idfs, avg_len, m, ("xx_excl",))(pdf))
        assert got_e == ref, combine
        assert got_w == ref, combine
