"""Field collapsing (operators/query.py collapse_results): ≤ per_key hits
per docs-column value, pinned global order preserved. Oracle twin:
oracle.collapse_ranked over the same input ranking."""

from __future__ import annotations

from oracle import oracle as orc
from search_engine_spark.operators.query import bm25_search, collapse_results
from tests.test_spark_engine import HOT_TERM, RARE, VOCAB


def _conv_of(oracle_idx):
    d = oracle_idx.docs
    return dict(zip(d["doc_id"], d["conv_id"]))


def test_collapse_matches_oracle(spark, engine_tables, oracle_idx):
    query = f"{RARE} {VOCAB[40]}"
    full = orc.search(oracle_idx, query, combine="or", k=10_000)
    conv = _conv_of(oracle_idx)
    assert len({conv[d] for d, _ in full}) < len(full), "need collapsible dups"
    for per_key in (1, 2):
        exp = orc.collapse_ranked(full, lambda d: conv[d], per_key)[:10]
        deep = bm25_search(
            engine_tables["postings_flat"], engine_tables["lemma_stats"],
            engine_tables["doc_stats"], query, combine="or", k=10_000,
        )
        got = collapse_results(
            deep, engine_tables["docs"], "conv_id", per_key
        ).limit(10).collect()
        assert [(r["doc_id"], r["score"]) for r in got] == exp, per_key
        # the collapse key is on every output row
        assert all(r["conv_id"] == conv[r["doc_id"]] for r in got)


def test_collapse_api(spark, base_index_dir, oracle_idx):
    """SearchEngine collapse on the deep page: pinned depth policy is
    deep = 10*(offset+limit), collapse, then slice — mirrored here."""
    from search_engine_spark.api import SearchEngine

    conv = _conv_of(oracle_idx)
    full = orc.search(oracle_idx, f"{HOT_TERM} {RARE}", k=100)  # deep page
    exp = orc.collapse_ranked(full, lambda d: conv[d], 1)[:10]
    eng = SearchEngine(spark, base_index_dir["index"])
    res = eng.search(f"{HOT_TERM} {RARE}", limit=10, collapse="conv_id")
    assert [d["relevance"] for d in res["data"]] == [s for _, s in exp]
    # one hit per conversation in the payload
    uris = [d["uri"].split("#")[0] for d in res["data"]]
    assert len(uris) == len(set(uris))


def test_collapse_cache_never_fakes_exhaustion(spark, base_index_dir,
                                               oracle_idx):
    """A collapsed deep page shorter than the fetch depth says nothing
    about deeper matches (collapse truncated it AFTER the first stage),
    so the result cache must refetch for deeper offsets instead of
    serving a fake empty tail. Pin: cached pagination == fresh-engine
    pagination for every offset."""
    from search_engine_spark.api import SearchEngine

    q = f"{RARE} {VOCAB[40]}"
    # pick the fetch depth from the oracle ranking so the deep page is
    # GUARANTEED to compress (contains a repeated conv) while more
    # matches exist beyond it — the exact shape the old exhaustion rule
    # got wrong
    full = orc.search(oracle_idx, q, combine="or", k=100_000)
    conv = _conv_of(oracle_idx)
    seen: set = set()
    p = None
    for i, (d, _) in enumerate(full):
        if conv[d] in seen:
            p = i
            break
        seen.add(conv[d])
    assert p is not None, "corpus lost its collapsible dups"
    limit = p // 10 + 1  # deep = 10*limit > p → page contains the dup
    assert len(full) > 10 * limit, "need matches beyond the deep page"

    eng = SearchEngine(spark, base_index_dir["index"])
    first = eng.search(q, combine="or", limit=limit, collapse="conv_id")
    assert first["data"]
    n_cached = first["count"]
    # collapse compressed the deep page below the fetch depth → the old
    # exhaustion rule would have frozen the cache at n_cached rows
    assert n_cached < 10 * limit
    deeper = eng.search(
        q, combine="or", offset=n_cached, limit=limit, collapse="conv_id"
    )
    fresh = SearchEngine(spark, base_index_dir["index"]).search(
        q, combine="or", offset=n_cached, limit=limit, collapse="conv_id"
    )
    assert deeper["data"] == fresh["data"]
    assert deeper["count"] == fresh["count"]
    # oracle-exact: the refetch collapses the DEEPER first stage
    exp = orc.collapse_ranked(
        full[: 10 * (n_cached + limit)], lambda d: conv[d], 1
    )
    assert deeper["count"] == len(exp)
    assert [x["relevance"] for x in deeper["data"]] == [
        s for _, s in exp[n_cached:n_cached + limit]
    ]


def test_collapse_semantics_synthetic(spark):
    """Unique keys → identity; duplicate keys keep the per-key best by
    the pinned (score desc, doc_id asc) order, incl. tie handling."""
    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a"), (4, "a"), (5, "c")],
        "doc_id long, grp string",
    )
    res = spark.createDataFrame(
        [(1, 2.0), (2, 1.5), (3, 2.0), (4, 0.5), (5, 1.0)],
        "doc_id long, score double",
    )
    got = collapse_results(res, docs, "grp", 1).collect()
    # grp 'a': docs 1 and 3 tie at 2.0 → doc_id asc keeps 1
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (1, 2.0), (2, 1.5), (5, 1.0)
    ]
    got2 = collapse_results(res, docs, "grp", 2).collect()
    assert [(r["doc_id"], r["score"]) for r in got2] == [
        (1, 2.0), (3, 2.0), (2, 1.5), (5, 1.0)
    ]
