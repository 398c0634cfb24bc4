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


def test_server_filters_and_cursor(spark, base_index_dir, oracle_idx):
    """The serving session supports attribute filters (lazily loaded
    filter-postings table) and search_after cursors — rank-identical to
    oracle.search(filters=..., after=...)."""
    import pytest

    from tests.test_spark_engine import RARE

    srv = QueryServer(spark, base_index_dir["index"], cache_blocks=False)
    assert srv._filter_blocks is None  # lazy until a filtered query
    filters = {"role": "user"}
    exp = orc.search(oracle_idx, RARE, k=10, filters=filters)
    assert exp and exp != orc.search(oracle_idx, RARE, k=10)
    assert srv.search(RARE, k=10, filters=filters) == exp
    assert srv._filter_blocks is not None

    # cursor paging from the 2nd row, composed with the filter
    full = orc.search(oracle_idx, RARE, k=10_000, filters=filters)
    cur = (full[1][1], full[1][0])
    got = srv.search(RARE, k=4, filters=filters, after=cur)
    assert got == full[2:6]
    # plain cursor (no filter) too
    full_nf = orc.search(oracle_idx, RARE, k=10_000)
    cur = (full_nf[0][1], full_nf[0][0])
    assert srv.search(RARE, k=4, after=cur) == full_nf[1:5]
    with pytest.raises(ValueError, match="offset"):
        srv.search(RARE, k=4, offset=2, after=cur)
