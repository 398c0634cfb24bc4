"""Interpolated-bigram LM scoring (operators/text.py lm_logppl): the
CCNet-style perplexity quality filter. Verifies the Spark operator
against its DuckDB oracle twin on an in-memory corpus (the same check
the driver contract runs at sf0.01) and a hand-computed tiny model."""

import math

import duckdb
import pandas as pd
import pytest

from search_engine_spark.operators.text import lm_logppl, lm_logppl_oracle_sql


def _twin_rows(docs_pdf, vocab_size, lam):
    con = duckdb.connect()
    con.register("documents", docs_pdf)
    sql = lm_logppl_oracle_sql(vocab_size=vocab_size, lam=lam)
    return sorted(map(tuple, con.execute(sql).fetchall()))


def test_lm_matches_duckdb_twin(spark):
    texts = [
        "the fast sort merges the fast table",
        "the fast fast fast fast fast fast",
        "window window window window",
        "a completely different stream of words here",
        "the the the the a a a zz",
        "",  # zero tokens -> excluded
        "123 456 !!",  # zero [a-z]+ tokens -> excluded
        "one token",
        "the fast sort merges the fast table",  # exact dup of doc 0
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    docs = spark.createDataFrame(pdf)
    for vocab_size, lam in [(4, 0.7), (100, 0.5)]:
        got = sorted(
            map(tuple, lm_logppl(docs, vocab_size=vocab_size, lam=lam).collect())
        )
        want = _twin_rows(pdf, vocab_size, lam)
        assert got == want, (vocab_size, lam)
    # excluded docs really are excluded; dup docs score identically
    rows = dict(
        (r[0], (r[1], r[2]))
        for r in lm_logppl(docs, vocab_size=4).collect()
    )
    assert 5 not in rows and 6 not in rows
    assert rows[0] == rows[8]


def test_lm_hand_computed(spark):
    # corpus: d1="a b a", d2="a c"; vocab_size=2 -> counts a:3, b:1, c:1,
    # tie (b,c) by token asc -> vocab = [a, b]; c -> <unk>
    # mapped: d1=[a,b,a], d2=[a,<unk>]; N=5, V=2
    # uni: a:3, b:1, <unk>:1; bi: (a,b):1, (b,a):1, (a,<unk>):1
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a b a", "a c"]})
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["logppl"])
        for r in lm_logppl(docs, vocab_size=2, lam=0.7).collect()
    }
    lam, mu = 0.7, 1.0 - 0.7
    pu = lambda n: (n + 1.0) / (5 + 2 + 1.0)  # noqa: E731
    # d2: pos0 p_uni(a); pos1 prev=a: lam*(1/3) + mu*p_uni(<unk>)
    s2 = 0.0
    s2 += math.log10(pu(3))
    s2 += math.log10(lam * (1 / 3) + mu * pu(1))
    assert out[2] == (2, round(-s2 / 2, 6))
    # d1: p_uni(a); lam*(n(a,b)/n(a)) + mu*p_uni(b); lam*(n(b,a)/n(b)) + mu*p_uni(a)
    s1 = 0.0
    s1 += math.log10(pu(3))
    s1 += math.log10(lam * (1 / 3) + mu * pu(1))
    s1 += math.log10(lam * (1 / 1) + mu * pu(3))
    assert out[1] == (3, round(-s1 / 3, 6))


def test_lm_ranks_repetitive_text_as_predictable(spark):
    # a doc that is one token repeated is maximally predictable under a
    # self-trained bigram model -> lowest logppl of the set
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [
                    "loop loop loop loop loop loop loop loop loop loop",
                    "assorted varied tokens appear once each time here now",
                ],
            }
        )
    )
    out = {r["doc_id"]: r["logppl"] for r in lm_logppl(docs).collect()}
    assert out[1] < out[2]
