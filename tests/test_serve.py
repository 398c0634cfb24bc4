"""QueryServer (long-lived serving session): rank-identity with the
oracle in both dictionary modes (full preload / memoized per-query
lookup), AND + OR."""

from __future__ import annotations

from oracle import oracle as orc
from search_engine_spark.operators.serve import QueryServer
from tests.test_spark_engine import QUERY_CASES


def _check(srv, oracle_idx):
    for i in (0, 2, 7, 8, 11):
        qid, query, scope, k, offset = QUERY_CASES[i]
        exp = orc.search(oracle_idx, query, scope=scope, k=k, offset=offset)
        got = srv.search(query, scope=scope, k=k, offset=offset)
        assert got == [(d, s) for d, s in exp], qid
    # disjunctive mode over golden OR queries
    import json
    import os

    gpath = os.path.join(os.path.dirname(__file__), "fixtures", "queries.jsonl")
    with open(gpath) as f:
        ors = [
            g for line in f if line.strip()
            and (g := json.loads(line)).get("combine") == "or"
        ]
    assert ors
    for g in ors:
        exp = [(e["doc_id"], e["score"]) for e in g["expected"]]
        got = srv.search(
            g["query"], scope=g["scope"], k=g["k"], offset=g["offset"],
            combine="or",
        )
        assert got == exp, g["qid"]


def test_server_preloaded_dictionary(spark, base_index_dir, oracle_idx):
    srv = QueryServer(spark, base_index_dir["index"], cache_blocks=False)
    assert srv._all_loaded
    _check(srv, oracle_idx)


def test_server_memoized_dictionary(spark, base_index_dir, oracle_idx):
    """Dictionary too large to preload → per-query pushed-filter lookups,
    memoized; results identical."""
    srv = QueryServer(
        spark, base_index_dir["index"], cache_blocks=False,
        preload_dict_max_rows=0,
    )
    assert not srv._all_loaded
    _check(srv, oracle_idx)
    assert srv._known_terms  # memo actually populated
