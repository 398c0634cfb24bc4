"""MMR diversification (operators/rescore.py mmr_rerank): greedy
relevance-vs-novelty re-ranking of a scored window, verified against the
unrolled DuckDB oracle twin and hand-checked greedy mechanics."""

import duckdb
import pandas as pd

from search_engine_spark.operators.rescore import mmr_oracle_sql, mmr_rerank

TOKS_SPARK = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
TOKS_DUCK = "regexp_extract_all(lower(text), '[a-z0-9]+')"


def _twin(docs_pdf, scored_pdf, k, lam):
    con = duckdb.connect()
    con.register("documents", docs_pdf)
    con.register("first_stage", scored_pdf)
    sql = mmr_oracle_sql(
        "SELECT doc_id, score FROM first_stage", TOKS_DUCK, k=k, lam=lam
    )
    return sorted(map(tuple, con.execute(sql).fetchall()))


def test_mmr_matches_duckdb_twin(spark):
    docs_pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                "spark shuffle join agg",
                "spark shuffle join agg window",  # near-dup of 1
                "python pandas arrow batch",
                "spark shuffle",  # subset of 1
                "totally different content here",
                "",  # empty token set
            ],
        }
    )
    scored_pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "score": [10.0, 9.5, 8.0, 7.0, 6.0, 5.0],
        }
    )
    docs = spark.createDataFrame(docs_pdf)
    scored = spark.createDataFrame(scored_pdf)
    for k, lam in [(4, 0.7), (6, 0.5), (10, 0.3)]:
        got = sorted(
            map(
                tuple,
                mmr_rerank(scored, docs, TOKS_SPARK, k=k, lam=lam).collect(),
            )
        )
        assert got == _twin(docs_pdf, scored_pdf, k, lam), (k, lam)


def test_mmr_demotes_near_duplicate(spark):
    # doc 2 is a near-dup of the top hit; MMR must rank the dissimilar
    # doc 3 above it even though 2 has the higher first-stage score
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "alpha beta gamma delta",
                    "alpha beta gamma delta epsilon",
                    "omega psi chi phi",
                ],
            }
        )
    )
    scored = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "score": [10.0, 9.9, 5.0]})
    )
    ranks = {
        r["doc_id"]: r["rank"]
        for r in mmr_rerank(scored, docs, TOKS_SPARK, k=3, lam=0.5).collect()
    }
    assert ranks[1] == 1 and ranks[3] == 2 and ranks[2] == 3
    # lam=1.0 is pure relevance: first-stage order preserved
    ranks_rel = {
        r["doc_id"]: r["rank"]
        for r in mmr_rerank(scored, docs, TOKS_SPARK, k=3, lam=1.0).collect()
    }
    assert ranks_rel == {1: 1, 2: 2, 3: 3}


def test_mmr_window_smaller_than_k(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["aa bb", "cc dd"]})
    )
    scored = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "score": [2.0, 1.0]})
    )
    out = mmr_rerank(scored, docs, TOKS_SPARK, k=10).collect()
    assert sorted(r["rank"] for r in out) == [1, 2]
