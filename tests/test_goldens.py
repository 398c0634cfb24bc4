"""Pinned golden fixtures (tests/fixtures/queries.jsonl): guard against
silent semantics drift — if the analyzer/scoring pins change, BOTH the
oracle and the engine would move together and oracle-diff tests would
still pass; the on-disk goldens catch it."""

from __future__ import annotations

import json
import os

import pytest

from oracle import oracle as orc

FIXTURE_PATH = os.path.join(os.path.dirname(__file__), "fixtures", "queries.jsonl")


def _load():
    with open(FIXTURE_PATH) as f:
        return [json.loads(line) for line in f if line.strip()]


GOLDENS = _load()


def test_golden_coverage():
    assert len(GOLDENS) >= 21
    assert {g["scorer"] for g in GOLDENS} == {"bm25", "reftf"}
    assert any(g["expected"] == [] for g in GOLDENS)      # cutoff/empty classes
    assert any(g["scope"] for g in GOLDENS)               # scoped search
    assert any(g["offset"] > 0 for g in GOLDENS)          # pagination
    ors = [g for g in GOLDENS if g.get("combine") == "or"]
    assert len(ors) >= 5                                  # disjunctive mode
    assert any(g["expected"] == [] for g in ors)          # all-terms-dropped
    assert any(g["expected"] and g["offset"] > 0 for g in ors)


@pytest.mark.parametrize("g", GOLDENS, ids=[g["qid"] for g in GOLDENS])
def test_oracle_reproduces_goldens(oracle_idx, g):
    got = orc.search(
        oracle_idx, g["query"], scope=g["scope"], k=g["k"],
        offset=g["offset"], scorer=g["scorer"],
        combine=g.get("combine", "and"),
    )
    exp = [(e["doc_id"], e["score"]) for e in g["expected"]]
    assert [(d, s) for d, s in got] == exp, g["qid"]


_ENGINE_SUBSET = [g for g in GOLDENS if g["scorer"] == "bm25"][:6] + [
    g for g in GOLDENS if g.get("combine") == "or"
]


@pytest.mark.parametrize(
    "g", _ENGINE_SUBSET, ids=[g["qid"] for g in _ENGINE_SUBSET]
)
def test_wand_engine_reproduces_goldens(engine_tables, g):
    """Spark WAND/weak-AND path vs on-disk goldens (subset; the full
    engine/oracle matrix runs in test_compressed.py)."""
    from search_engine_spark.operators.compress import build_postings_compressed
    from search_engine_spark.operators.wand import bm25_search_blocks

    blocks = build_postings_compressed(
        engine_tables["postings_flat"], range_size=512
    )
    got = [
        (r["doc_id"], r["score"])
        for r in bm25_search_blocks(
            blocks, engine_tables["lemma_stats"], engine_tables["doc_stats"],
            g["query"], scope=g["scope"], k=g["k"], offset=g["offset"],
            mode="wand", combine=g.get("combine", "and"),
        ).collect()
    ]
    exp = [(e["doc_id"], e["score"]) for e in g["expected"]]
    assert got == exp, g["qid"]


@pytest.mark.parametrize(
    "g",
    [g for g in GOLDENS if g.get("combine") == "or"],
    ids=[g["qid"] for g in GOLDENS if g.get("combine") == "or"],
)
def test_flat_or_engine_reproduces_goldens(engine_tables, g):
    """Flat-postings OR path vs the same goldens (three independent
    implementations — oracle, WAND blocks, flat Catalyst — must agree)."""
    from search_engine_spark.operators.query import bm25_search

    got = [
        (r["doc_id"], r["score"])
        for r in bm25_search(
            engine_tables["postings_flat"], engine_tables["lemma_stats"],
            engine_tables["doc_stats"], g["query"], scope=g["scope"],
            k=g["k"], offset=g["offset"], combine="or",
        ).collect()
    ]
    exp = [(e["doc_id"], e["score"]) for e in g["expected"]]
    assert got == exp, g["qid"]
