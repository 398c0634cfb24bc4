"""Batch query scoring: rank-identical per query to the oracle, broadcast
join in the physical plan."""

from __future__ import annotations

from oracle import oracle as orc
from search_engine_spark.operators.batch_query import bm25_batch_search
from tests.test_spark_engine import HOT_TERM, MID, RARE, VOCAB


def test_batch_matches_oracle_per_query(engine_tables, oracle_idx):
    queries = {
        "a": RARE,
        "b": f"{HOT_TERM} {RARE}",
        "c": str(MID),
        "d": f"{MID} {VOCAB[40]} {VOCAB[50]}",
        "e": HOT_TERM,            # killed by cutoff → absent from output
        "f": "zzabsent",          # no postings → absent
        "g": "the and of",        # stopwords only → absent
    }
    out = bm25_batch_search(
        engine_tables["postings_flat"], engine_tables["lemma_stats"],
        engine_tables["doc_stats"], queries, k=10,
    ).collect()
    by_qid: dict = {}
    for r in out:
        by_qid.setdefault(r["qid"], []).append((r["rank"], r["doc_id"], r["score"]))
    expected = {qid: orc.search(oracle_idx, q, k=10) for qid, q in queries.items()}
    assert set(by_qid) == {qid for qid, exp in expected.items() if exp}
    assert len(by_qid) >= 2  # the batch really scored multiple queries
    for qid, rows in by_qid.items():
        exp = expected[qid]
        assert [(i + 1, d, s) for i, (d, s) in enumerate(exp)] == sorted(rows), qid


def test_batch_or_matches_oracle(engine_tables, oracle_idx):
    """Disjunctive batch mode == oracle OR per query (incl. the per-term
    cutoff DROP and the all-dropped → absent case)."""
    import json
    import os

    gpath = os.path.join(os.path.dirname(__file__), "fixtures", "queries.jsonl")
    with open(gpath) as f:
        ors = [
            g for line in f if line.strip()
            and (g := json.loads(line)).get("combine") == "or"
            and g["scope"] is None and g["offset"] == 0
        ]
    queries = {g["qid"]: g["query"] for g in ors}
    queries["hot"] = HOT_TERM  # all terms dropped → absent from output
    out = bm25_batch_search(
        engine_tables["postings_flat"], engine_tables["lemma_stats"],
        engine_tables["doc_stats"], queries, k=10, combine="or",
    ).collect()
    by_qid: dict = {}
    for r in out:
        by_qid.setdefault(r["qid"], []).append((r["rank"], r["doc_id"], r["score"]))
    expected = {
        qid: orc.search(oracle_idx, q, k=10, combine="or")
        for qid, q in queries.items()
    }
    assert set(by_qid) == {qid for qid, exp in expected.items() if exp}
    assert "hot" not in by_qid and len(by_qid) >= 2
    for qid, rows in by_qid.items():
        exp = expected[qid]
        assert [(i + 1, d, s) for i, (d, s) in enumerate(exp)] == sorted(rows), qid


def test_batch_scoped(engine_tables, oracle_idx):
    out = bm25_batch_search(
        engine_tables["postings_flat"], engine_tables["lemma_stats"],
        engine_tables["doc_stats"], {"q": RARE}, scope="scope-1", k=5,
    ).collect()
    exp = orc.search(oracle_idx, RARE, scope="scope-1", k=5)
    got = [(r["doc_id"], r["score"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert got == [(d, s) for d, s in exp]
    assert exp  # scoped query really returns hits


def test_batch_plan_uses_broadcast_join(engine_tables):
    plan = bm25_batch_search(
        engine_tables["postings_flat"], engine_tables["lemma_stats"],
        engine_tables["doc_stats"], {"q": RARE}, k=5,
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
