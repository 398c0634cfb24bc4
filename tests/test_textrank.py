"""TextRank keyword extraction (operators/text.py textrank_keywords):
weighted PageRank over the word-adjacency graph with pinned per-iteration
6dp rounding. Verifies Spark vs the DuckDB oracle twin and hand-checked
graph mechanics."""

import duckdb
import pandas as pd

from search_engine_spark.operators.text import (
    textrank_keywords,
    textrank_oracle_sql,
)


def _twin(pdf, **kw):
    con = duckdb.connect()
    con.register("documents", pdf)
    return sorted(map(tuple, con.execute(textrank_oracle_sql(**kw)).fetchall()))


def test_textrank_matches_duckdb_twin(spark):
    texts = [
        "spark shuffle join spark shuffle agg",
        "join agg window join shuffle",
        "isolated",  # single token -> no edge -> dropped
        "loop loop loop",  # only self-adjacency -> no edge -> dropped
        "window agg spark window",
        "",
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    docs = spark.createDataFrame(pdf)
    for kw in [dict(), dict(damping=0.5, iters=3), dict(k=3)]:
        got = sorted(map(tuple, textrank_keywords(docs, **kw).collect()))
        assert got == _twin(pdf, **kw), kw
    # isolated / self-loop-only words never appear
    terms = {t for t, _ in textrank_keywords(docs).collect()}
    assert "isolated" not in terms and "loop" not in terms


def test_textrank_two_node_graph_converges(spark):
    # graph a--b only: symmetric, so s_a == s_b at every iteration and
    # the fixpoint is s = (1-d) + d*s -> s = 1.0 exactly
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["a b a b a b"]})
    )
    rows = dict(textrank_keywords(docs, iters=5).collect())
    assert rows == {"a": 1.0, "b": 1.0}


def test_textrank_hub_outranks_leaf(spark):
    # star graph: hub adjacent to 3 distinct leaves -> hub scores highest
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2, 3], "text": ["hub xx", "hub yy", "hub zz"]}
        )
    )
    rows = dict(textrank_keywords(docs).collect())
    assert rows["hub"] > rows["xx"] == rows["yy"] == rows["zz"]
