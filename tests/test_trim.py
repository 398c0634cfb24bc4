"""Trim features (SURVEY.md §7.2 step 7): snippets, statistics rollup,
incremental upsert."""

from __future__ import annotations

import pandas as pd
import pytest

from oracle import oracle as orc
from search_engine_spark.operators.snippet import (
    MAX_SNIPPET_SIZE,
    make_snippet,
    materialize_with_snippets,
)


# -- snippets (pure core) ----------------------------------------------------


def test_snippet_bolds_lemma_matches():
    s = make_snippet("The dogs were running fast", frozenset(["dog", "runn"]))
    assert "<b>dogs</b>" in s and "<b>running</b>" in s


def test_snippet_empty_cases():
    assert make_snippet("", frozenset(["x"])) == ""
    assert make_snippet("hello world", frozenset()) == ""
    assert make_snippet("hello world", frozenset(["absent"])) == ""


def test_snippet_budget():
    text = ("word filler " * 200) + "target"
    s = make_snippet(text, frozenset(["word"]))
    # budget counts raw-text chars (tags excluded), fragments joined by ...
    import re

    raw = re.sub(r"</?b>", "", s)
    assert len(raw.replace("...", "")) <= MAX_SNIPPET_SIZE + 40
    assert s.startswith("<b>word</b>") or "<b>word</b>" in s


def test_snippet_context_window():
    text = "aaaaaaaaaaaaaaaaaaaa needle bbbbbbbbbbbbbbbbbbbb"
    s = make_snippet(text, frozenset(["needle"]))
    assert "<b>needle</b>" in s
    head = s.split("<b>")[0]
    assert 0 < len(head) <= 20  # >=10 chars context, not the whole prefix


def test_phrase_snippet_bolds_chain_only():
    from search_engine_spark.functions.analyze import analyze
    from search_engine_spark.operators.snippet import make_snippet_phrase

    seq = analyze("quick brown")
    text = "A quick dog. quick brown shoes. brown alone."
    s = make_snippet_phrase(text, seq)
    # only the adjacent chain is bolded, not the isolated term occurrences
    assert "<b>quick</b> <b>brown</b>" in s
    assert s.count("<b>") == 2


def test_phrase_snippet_slop_and_stopword_positions():
    from search_engine_spark.functions.analyze import analyze
    from search_engine_spark.operators.snippet import phrase_hit_spans

    seq = analyze("quick brown")
    # slop counts ANALYZED positions (post-stopword), like the index
    assert phrase_hit_spans("quick red brown", seq, slop=0) == []
    assert len(phrase_hit_spans("quick red brown", seq, slop=1)) == 2
    # a stopword is not a position: adjacency survives 'the'
    assert len(phrase_hit_spans("quick the brown", seq, slop=0)) == 2


def test_phrase_snippet_fallback_to_term_bolding():
    from search_engine_spark.functions.analyze import analyze
    from search_engine_spark.operators.snippet import make_snippet_phrase

    s = make_snippet_phrase("only brown here", analyze("quick brown"))
    assert "<b>brown</b>" in s  # no chain in this text → per-term bolding


def test_materialize_with_snippets(spark, engine_tables, oracle_idx):
    from search_engine_spark.operators.query import bm25_search
    from tests.test_spark_engine import RARE

    res = bm25_search(
        engine_tables["postings_flat"], engine_tables["lemma_stats"],
        engine_tables["doc_stats"], RARE, k=5,
    )
    from search_engine_spark.functions.analyze import query_lemmas

    rows = materialize_with_snippets(
        res, engine_tables["docs"].drop("lemma_counts"), query_lemmas(RARE)
    ).collect()
    assert rows and all("<b>" in r["snippet"] for r in rows)
    assert [r["doc_id"] for r in rows] == [
        d for d, _ in orc.search(oracle_idx, RARE, k=5)
    ]


# -- statistics rollup -------------------------------------------------------


def test_statistics_rollup(engine_tables, oracle_idx):
    from search_engine_spark.operators.build import statistics

    rows = {
        r["scope"]: r
        for r in statistics(
            engine_tables["docs"], engine_tables["lemma_stats"]
        ).collect()
    }
    n_scopes = len(oracle_idx.scope_docs)
    assert set(rows) == {"<total>"} | set(oracle_idx.scope_docs)
    for scope, ids in oracle_idx.scope_docs.items():
        assert rows[scope]["n_docs"] == len(ids)
        assert rows[scope]["n_lemmas"] == sum(
            1 for (s, _l) in oracle_idx.lemma_df if s == scope
        )
    assert rows["<total>"]["n_docs"] == len(oracle_idx.doc_len)
    assert rows["<total>"]["n_lemmas"] == len(oracle_idx.lemma_df)
    assert n_scopes == 4


# -- incremental upsert ------------------------------------------------------


@pytest.fixture(scope="module")
def upsert_env(spark, small_pdf, copy_index):
    """Take a mutable copy of the shared index, modify 5 turns, APPLY the
    upsert; return (job, modified corpus, upsert summary)."""
    from search_engine_spark.operators.upsert import upsert_turns
    from search_engine_spark.plans.job import IndexBuildJob
    from search_engine_spark.schemas import TRANSCRIPTS

    job = IndexBuildJob(
        spark, copy_index["corpus"], copy_index["index"],
        n_buckets=4, docs_per_shard=256, run_id="base",
    )

    mod = small_pdf.copy()
    victims = mod.index[[3, 50, 400, 401, 1200]]
    for i, v in enumerate(victims):
        mod.loc[v, "text"] = f"replacement unique{i} zanzibar text"
    delta = mod.loc[victims]
    summary = upsert_turns(job, spark.createDataFrame(delta, schema=TRANSCRIPTS))
    return job, mod, summary


def test_upsert_matches_fresh_build(upsert_env, spark, tmp_path_factory):
    from search_engine_spark.plans.job import IndexBuildJob
    from tests.test_job import _decoded_postings

    job, mod, summary = upsert_env
    assert summary["updated_turns"] == 5
    assert 0 < len(summary["buckets_rebuilt"]) <= 4

    base2 = tmp_path_factory.mktemp("ups2")
    corpus2 = str(base2 / "tr.parquet")
    mod.to_parquet(corpus2, index=False, row_group_size=512)
    fresh = IndexBuildJob(
        spark, corpus2, str(base2 / "idx"), n_buckets=4, docs_per_shard=256,
        run_id="fresh",
    )
    fresh.run()

    a, b = job.tables(), fresh.tables()
    docs_a = {r["doc_id"]: r["text"] for r in a["docs"].collect()}
    docs_b = {r["doc_id"]: r["text"] for r in b["docs"].collect()}
    assert docs_a == docs_b
    assert _decoded_postings(a["postings"]) == _decoded_postings(b["postings"])
    ls_a = {(r["scope"], r["lemma"]): (r["df"], r["cf"]) for r in a["lemma_stats"].collect()}
    ls_b = {(r["scope"], r["lemma"]): (r["df"], r["cf"]) for r in b["lemma_stats"].collect()}
    assert ls_a == ls_b  # df decrement semantics incl. delete-at-0


def test_upsert_query_rank_identical(upsert_env, spark):
    """Post-upsert index answers like an oracle over the modified corpus."""
    from search_engine_spark.operators.wand import bm25_search_blocks

    job, mod, _ = upsert_env
    idx = orc.build_index(mod)
    t = job.tables()
    for q in ("zanzibar", "unique0", "replacement zanzibar"):
        exp = orc.search(idx, q, k=10)
        got = [
            (r["doc_id"], r["score"])
            for r in bm25_search_blocks(
                t["postings"], t["lemma_stats"], t["doc_stats"], q, k=10,
                mode="wand",
            ).collect()
        ]
        assert [(d, s) for d, s in got] == [(d, s) for d, s in exp], q
