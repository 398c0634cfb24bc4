"""Repetition signals (operators/text.py repetition_signals): Gopher-style
top-token / duplicate-n-gram ratios. The contract twin covers DuckDB
parity at sf0.01; this pins the semantics on hand-built docs and checks
Spark == DuckDB on the same rows (incl. empty / short edge cases)."""

from __future__ import annotations

import duckdb

from search_engine_spark.operators.text import (
    repetition_signals,
    repetition_signals_oracle_sql,
)

TOKS_SQL = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
TOKS_DUCK = "regexp_extract_all(lower(text), '[a-z0-9]+')"

DOCS = [
    (1, ""),  # no tokens: all ratios 0
    (2, "x"),  # one token: top ratio 1, no n-grams
    (3, "a b a b a b"),  # bigram stream heavily duplicated
    (4, "spam spam spam spam"),  # single repeated token
    (5, "all tokens here are fully distinct words"),
    (6, "x y z x y z x y z w"),  # trigram dups without single-token spam
]


def _spark_rows(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        r["doc_id"]: r.asDict()
        for r in repetition_signals(df, TOKS_SQL).collect()
    }


def test_repetition_semantics(spark):
    got = _spark_rows(spark)
    assert got[1] == {
        "doc_id": 1, "top_token_ratio": 0.0, "dup_bigram_ratio": 0.0,
        "dup_trigram_ratio": 0.0,
    }
    assert got[2]["top_token_ratio"] == 1.0
    assert got[2]["dup_bigram_ratio"] == 0.0  # no bigrams from one token
    # "a b a b a b": 6 tokens, top 'a' x3; 5 bigrams, 2 distinct; 4
    # trigrams, 2 distinct
    assert got[3]["top_token_ratio"] == 0.5
    assert got[3]["dup_bigram_ratio"] == round(1 - 2 / 5, 6)
    assert got[3]["dup_trigram_ratio"] == 0.5
    assert got[4] == {
        "doc_id": 4, "top_token_ratio": 1.0,
        "dup_bigram_ratio": round(1 - 1 / 3, 6), "dup_trigram_ratio": 0.5,
    }
    assert got[5]["top_token_ratio"] == round(1 / 7, 6)
    assert got[5]["dup_bigram_ratio"] == 0.0
    assert got[5]["dup_trigram_ratio"] == 0.0
    # 10 tokens, 9 bigrams (4 distinct), 8 trigrams (4 distinct)
    assert got[6]["dup_bigram_ratio"] == round(1 - 4 / 9, 6)
    assert got[6]["dup_trigram_ratio"] == 0.5


def test_repetition_matches_duckdb_twin(spark):
    got = _spark_rows(spark)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in DOCS)
        + ") AS v(doc_id, text)"
    )
    orc = con.execute(repetition_signals_oracle_sql(TOKS_DUCK)).df()
    for _, row in orc.iterrows():
        g = got[int(row["doc_id"])]
        for c in ("top_token_ratio", "dup_bigram_ratio", "dup_trigram_ratio"):
            assert g[c] == float(row[c]), (int(row["doc_id"]), c)
