"""Positional postings + phrase/proximity queries: codec round-trip,
engine-vs-oracle rank identity, slop semantics."""

from __future__ import annotations

import numpy as np
import pytest

from oracle import oracle as orc
from search_engine_spark.functions.analyze import STOPWORDS, TOKEN_RE, fold


# -- pure core ---------------------------------------------------------------


def test_positions_codec_roundtrip():
    from search_engine_spark.operators.compress import (
        _encode_frame_pos,
        _group_starts,
        decode_positions,
    )
    import pandas as pd

    rng = np.random.default_rng(7)
    rows = []
    pos_by_doc = {}
    for doc in range(1, 40):
        n_pos = int(rng.integers(1, 9))
        pos = np.sort(rng.choice(500, size=n_pos, replace=False))
        pos_by_doc[doc] = pos.tolist()
        rows.append(
            ("s0", "lem", 0, doc, n_pos, 30, pos.tolist())
        )
    pdf = pd.DataFrame(
        rows,
        columns=["scope", "lemma", "shard", "doc_id", "tf", "doc_len",
                 "positions"],
    )
    enc = _encode_frame_pos(pdf, _group_starts(pdf))
    got = {}
    for r in enc.itertuples(index=False):
        from search_engine_spark.functions.codec import (
            delta_decode,
            varbyte_decode,
        )

        ids = delta_decode(varbyte_decode(r.doc_ids)).astype(np.int64)
        tfs = varbyte_decode(r.tfs).astype(np.int64)
        for d, plist in zip(ids.tolist(), decode_positions(r.positions, tfs)):
            got[d] = plist.tolist()
    assert got == pos_by_doc


def test_phrase_match_doc_semantics():
    f = orc.phrase_match_doc
    assert f([[0, 7], [1]])            # adjacent
    assert not f([[0], [2]])           # gap of 1 with slop=0
    assert f([[0], [2]], slop=1)       # gap allowed with slop=1
    assert not f([[2], [1]])           # wrong order never matches
    assert f([[0, 5], [6], [7]])       # chain via later start
    assert not f([[0], [1], [1]])      # position cannot repeat backwards
    # completeness for slop >= 1 (greedy smallest-next missed these: it
    # commits to the earliest middle position and never backtracks)
    assert f([[0], [1, 2], [4]], slop=1)        # only 0→2→4 works
    assert not f([[0], [1, 2], [5]], slop=1)
    assert f([[0], [1, 3], [2, 6], [4]], slop=1)  # 0→3→? no; 0→1→2→4
    assert f([[10], [11, 12], [14]], slop=1)    # same shape, shifted
    assert not f([[], [1]])                     # empty first list
    assert not f([])


def test_phrase_hit_spans_non_greedy_chain():
    """Spans bold exactly the tokens on COMPLETE chains: the greedy dead
    end (first middle occurrence) is excluded, the viable one included."""
    from search_engine_spark.functions.analyze import analyze
    from search_engine_spark.operators.snippet import phrase_hit_spans

    txt = "krontak velmor velmor plixun drazet"
    seq = analyze("krontak velmor drazet")
    assert seq == ["krontak", "velmor", "drazet"]
    # chain = krontak@0 → velmor@2 (second) → drazet@4; velmor@1 has no
    # continuation within slop=1 and must NOT be bolded
    assert phrase_hit_spans(txt, seq, slop=1) == [(0, 7), (15, 21), (29, 35)]
    assert phrase_hit_spans(txt, seq, slop=0) == []


# -- engine vs oracle --------------------------------------------------------


@pytest.fixture(scope="module")
def pos_tables(spark, transcripts_sdf):
    from search_engine_spark.operators.build import (
        build_doc_stats,
        build_lemma_stats,
        build_postings_flat_positional,
    )
    from search_engine_spark.operators.compress import (
        build_postings_compressed,
    )
    from search_engine_spark.operators.docs import build_docs

    docs_tok = build_docs(
        transcripts_sdf, with_lemmas=True, positional=True
    ).cache()
    pf = build_postings_flat_positional(docs_tok)
    ls, ds = build_lemma_stats(pf), build_doc_stats(docs_tok)
    blocks = build_postings_compressed(pf, range_size=512, positional=True).cache()
    assert "positions" in blocks.columns
    return {"blocks": blocks, "lemma_stats": ls.cache(), "doc_stats": ds.cache()}


def _phrases_from_corpus(small_pdf, n=6, width=2):
    """Real raw-token windows from corpus texts (skipping stopwords) —
    phrases guaranteed present; plus their reverses as likely-absent."""
    out = []
    for i in (3, 100, 500, 900, 1400, 1900):
        toks = [
            t for t in TOKEN_RE.findall(fold(small_pdf.iloc[i]["text"]))
            if t not in STOPWORDS
        ]
        if len(toks) >= width:
            out.append(" ".join(toks[:width]))
        if len(out) >= n:
            break
    return out


def test_phrase_rank_identity(spark, pos_tables, small_pdf, oracle_idx):
    from search_engine_spark.operators.wand import phrase_search_blocks

    t = pos_tables
    queries = _phrases_from_corpus(small_pdf)
    assert queries
    cases = [(q, None, 0) for q in queries]
    cases += [(" ".join(reversed(q.split())), None, 0) for q in queries[:3]]
    cases += [(queries[0], "scope-1", 0), (queries[0], None, 1)]
    nonempty = 0
    for q, scope, slop in cases:
        exp = orc.phrase_search(oracle_idx, q, scope=scope, k=10, slop=slop)
        got = [
            (r["doc_id"], r["score"])
            for r in phrase_search_blocks(
                t["blocks"], t["lemma_stats"], t["doc_stats"], q,
                scope=scope, k=10, slop=slop,
            ).collect()
        ]
        assert got == [(d, s) for d, s in exp], (q, scope, slop)
        nonempty += bool(exp)
    assert nonempty >= 3  # the matrix actually exercised real matches


def test_positional_job_api_upsert(spark, tmp_path_factory):
    """End-to-end: checkpointed positional build → SearchEngine phrase
    endpoint → positional-aware upsert of a new turn containing the
    phrase → result set grows accordingly."""
    from search_engine_spark.api import SearchEngine
    from search_engine_spark.operators.upsert import upsert_turns
    from search_engine_spark.plans.job import IndexBuildJob
    from search_engine_spark.schemas import TRANSCRIPTS
    from search_engine_spark.sources.corpus import generate_transcripts

    small = generate_transcripts(80, seed=7)
    base = tmp_path_factory.mktemp("posidx")
    corpus = str(base / "tr.parquet")
    small.to_parquet(corpus, index=False, row_group_size=512)
    job = IndexBuildJob(
        spark, corpus, str(base / "idx"), n_buckets=2, docs_per_shard=256,
        positional=True,
    )
    job.run()

    toks = [
        t for t in TOKEN_RE.findall(fold(small.iloc[5]["text"]))
        if t not in STOPWORDS
    ]
    q = " ".join(toks[:2])
    idx = orc.build_index(small)
    exp = orc.phrase_search(idx, q, k=100)
    assert exp  # the bigram really occurs

    eng = SearchEngine(spark, str(base / "idx"))
    res = eng.search(q, match="phrase", limit=100)
    assert len(res["data"]) == len(exp)
    assert [r["relevance"] for r in res["data"]] == [s for _, s in exp]
    # filters compose with phrase through the API (the positional index
    # carries the filters family); one of the two role filters must bite
    role5 = small.iloc[5]["role"]
    other = "assistant" if role5 != "assistant" else "user"
    for role in (role5, other):
        exp_f = orc.phrase_search(idx, q, k=100, filters={"role": role})
        res_f = eng.search(q, match="phrase", limit=100,
                           filters={"role": role})
        assert [r["relevance"] for r in res_f["data"]] == [
            s for _, s in exp_f
        ], role
    assert orc.phrase_search(idx, q, k=100, filters={"role": other}) != exp \
        or orc.phrase_search(idx, q, k=100, filters={"role": role5}) != exp
    # phrase results carry chain-precise snippets: the matched pair is
    # bolded together (both terms, in order) in the top hit
    import re as _re

    top = res["data"][0]["snippet"]
    t1, t2 = q.split()
    # both chain terms bolded, in order, with only non-indexed filler
    # (stopwords/punctuation) between them
    assert _re.search(
        rf"<b>{t1}</b>(?:(?!<b>).){{0,40}}<b>{t2}</b>", top, _re.S
    ), top

    proto = small.iloc[0]
    delta = small.iloc[:0].copy()
    delta.loc[0] = {
        "conv_id": "zzzz-00000009", "turn_idx": 0, "role": "user",
        "text": f"prefix {q} suffix", "tool": proto["tool"], "ts": proto["ts"],
    }
    summary = upsert_turns(job, spark.createDataFrame(delta, schema=TRANSCRIPTS))
    assert summary["inserted_turns"] == 1
    eng2 = SearchEngine(spark, str(base / "idx"))
    res2 = eng2.search(q, match="phrase", limit=100)
    assert len(res2["data"]) == len(exp) + 1


def test_phrase_with_filters_rank_identity(
    spark, pos_tables, small_pdf, oracle_idx, engine_tables
):
    """Attribute/date filters compose with phrase match: the filter
    lemmas' non-positional blocks union into the positional kernel scan
    and candidates intersect the shard-local filter set BEFORE the
    position verify (oracle.phrase_search(filters=...) is the twin)."""
    from search_engine_spark.operators.filters import build_filter_blocks
    from search_engine_spark.operators.wand import phrase_search_blocks

    # same range_size as pos_tables blocks → same kernel shards
    flt = build_filter_blocks(engine_tables["docs"], range_size=512)
    t = pos_tables
    queries = _phrases_from_corpus(small_pdf)
    filter_cases = [
        {"role": "user"},
        {"role": "assistant"},
        {"date": {"from": "2025-01-02", "to": "2025-01-07"}},
        {"role": ["user", "assistant"],
         "date": {"from": "2025-01-01", "to": "2025-01-05"}},
    ]
    nonempty = bites = 0
    for q in queries[:3]:
        base = orc.phrase_search(oracle_idx, q, k=10)
        for filters in filter_cases:
            exp = orc.phrase_search(oracle_idx, q, k=10, filters=filters)
            got = [
                (r["doc_id"], r["score"])
                for r in phrase_search_blocks(
                    t["blocks"], t["lemma_stats"], t["doc_stats"], q,
                    k=10, filters=filters, filter_postings=flt,
                ).collect()
            ]
            assert got == exp, (q, filters)
            nonempty += bool(exp)
            bites += exp != base
    assert nonempty and bites

    # single-term phrase over-cutoff gate sees the UNfiltered count:
    # empty on both sides even though a filter would shrink it
    from search_engine_spark.sources.corpus import HOT_TERM

    assert orc.phrase_search(
        oracle_idx, HOT_TERM, k=10, filters={"role": "user"}
    ) == []
    got = phrase_search_blocks(
        t["blocks"], t["lemma_stats"], t["doc_stats"], HOT_TERM,
        k=10, filters={"role": "user"}, filter_postings=flt,
    ).collect()
    assert got == []

    with pytest.raises(ValueError, match="filter_postings"):
        phrase_search_blocks(
            t["blocks"], t["lemma_stats"], t["doc_stats"], queries[0],
            k=10, filters={"role": "user"},
        )


def test_phrase_requires_positional_index(spark, base_index_dir):
    from search_engine_spark.api import SearchEngine

    eng = SearchEngine(spark, base_index_dir["index"])
    with pytest.raises(ValueError, match="positional"):
        eng.search("any words", match="phrase")


def test_phrase_stricter_than_and(spark, pos_tables, small_pdf, oracle_idx):
    """Phrase results are a subset of the conjunctive result set."""
    from search_engine_spark.operators.wand import (
        bm25_search_blocks,
        phrase_search_blocks,
    )

    t = pos_tables
    q = _phrases_from_corpus(small_pdf)[0]
    phrase = {
        r["doc_id"]
        for r in phrase_search_blocks(
            t["blocks"], t["lemma_stats"], t["doc_stats"], q, k=100
        ).collect()
    }
    conj = {
        r["doc_id"]
        for r in bm25_search_blocks(
            t["blocks"], t["lemma_stats"], t["doc_stats"], q, k=100
        ).collect()
    }
    assert phrase and phrase <= conj


def test_phrase_cursor_rank_identity(pos_tables, small_pdf, oracle_idx):
    """Cursor (search_after) pagination on the phrase path: rank-identical
    to oracle.phrase_search(after=...) (see tests/test_search_after.py
    for the bm25 kernels)."""
    from search_engine_spark.operators.wand import phrase_search_blocks

    from tests.test_spark_engine import RARE

    t = pos_tables
    paged_any = False
    # RARE as a single-term "phrase" trivially matches every doc that
    # contains it (well over one page); the multi-word corpus phrases
    # page only when a window recurs across docs
    for q in [RARE] + _phrases_from_corpus(small_pdf):
        full = orc.phrase_search(oracle_idx, q, k=10_000)
        if len(full) < 2:
            continue
        paged_any = True
        cur = (full[0][1], full[0][0])
        got = [
            (r["doc_id"], r["score"])
            for r in phrase_search_blocks(
                t["blocks"], t["lemma_stats"], t["doc_stats"], q,
                k=5, after=cur,
            ).collect()
        ]
        assert got == orc.phrase_search(oracle_idx, q, k=5, after=cur)
        assert got == full[1:6]
    assert paged_any


def test_query_server_phrase(
    spark, pos_tables, engine_tables, small_pdf, oracle_idx,
    tmp_path_factory,
):
    """QueryServer.phrase: phrase serving from cached stats — identical
    to oracle.phrase_search across slop/filters/cursor; one Spark job in
    steady state (stats resolved driver-side from the preloaded dict)."""
    from search_engine_spark.operators.filters import build_filter_blocks
    from search_engine_spark.operators.serve import QueryServer
    from tests.test_spark_engine import RARE

    d = str(tmp_path_factory.mktemp("pos_srv"))
    pos_tables["blocks"].write.parquet(f"{d}/postings")
    pos_tables["lemma_stats"].write.parquet(f"{d}/lemma_stats")
    pos_tables["doc_stats"].write.parquet(f"{d}/doc_stats")
    build_filter_blocks(engine_tables["docs"], range_size=512).write.parquet(
        f"{d}/filters"
    )
    srv = QueryServer(spark, d, cache_blocks=False)
    checked = 0
    for q in [RARE] + _phrases_from_corpus(small_pdf)[:3]:
        for kwargs in ({}, {"slop": 1}, {"filters": {"role": "user"}}):
            exp = orc.phrase_search(oracle_idx, q, k=10, **kwargs)
            assert srv.phrase(q, k=10, **kwargs) == exp, (q, kwargs)
            checked += bool(exp)
    assert checked
    full = orc.phrase_search(oracle_idx, RARE, k=10_000)
    assert len(full) > 6
    cur = (full[0][1], full[0][0])
    assert srv.phrase(RARE, k=5, after=cur) == full[1:6]
    with pytest.raises(ValueError, match="offset"):
        srv.phrase(RARE, k=5, offset=2, after=cur)


def test_query_server_phrase_hybrid_venue(
    spark, pos_tables, engine_tables, small_pdf, oracle_idx,
    tmp_path_factory,
):
    """Phrase queries ride the hot∧rare hybrid venue: every phrase term
    is required (a phrase is conjunctive), so the rare side's candidates
    bound the matches and hot POSITIONAL blocks point-fetch by candidate
    range — identical to oracle.phrase_search at slop 0 and 1 and under
    attribute filters (filter blocks candidate-fetched, round-3
    extension), and the venue demonstrably serves (not just plans)."""
    from search_engine_spark.functions.analyze import analyze
    from search_engine_spark.operators.filters import build_filter_blocks
    from search_engine_spark.operators.serve import QueryServer

    d = str(tmp_path_factory.mktemp("pos_srv_hyb"))
    pos_tables["blocks"].write.parquet(f"{d}/postings")
    pos_tables["lemma_stats"].write.parquet(f"{d}/lemma_stats")
    pos_tables["doc_stats"].write.parquet(f"{d}/doc_stats")
    build_filter_blocks(engine_tables["docs"], range_size=512).write.parquet(
        f"{d}/filters"
    )
    srv = QueryServer(spark, d, cache_blocks=False)
    srv.hybrid_fetch_frac = 1.0  # small corpus: keep the
    # nothing-to-skip gate from hiding the venue
    srv.hot_df_budget = 0  # pin the HYBRID venue (hot tier serves first)
    served = []
    orig = srv._hybrid_blocks

    def spy(*a, **kw):
        r = orig(*a, **kw)
        served.append(r is not None)
        return r

    srv._hybrid_blocks = spy
    checked = 0
    for q in _phrases_from_corpus(small_pdf):
        uniq = sorted(set(analyze(q)))
        if len(uniq) < 2:
            continue
        dfs = srv._term_dfs(uniq, None)
        lo, hi = min(dfs.values()), max(dfs.values())
        if lo == hi:
            continue
        srv.local_df_budget = lo  # only the rarest term fits → hybrid
        for slop in (0, 1):
            exp = orc.phrase_search(oracle_idx, q, k=10, slop=slop)
            got = srv.phrase(q, k=10, slop=slop)
            assert got == exp, (q, slop)
            checked += bool(exp)
        for filters in ({"role": "user"}, {"role": "assistant"}):
            exp = orc.phrase_search(oracle_idx, q, k=10, filters=filters)
            got = srv.phrase(q, k=10, filters=filters)
            assert got == exp, (q, filters)
            checked += bool(exp)
    assert checked >= 2
    assert any(served), "hybrid venue never served a phrase query"


def test_query_server_phrase_hot_venue(
    spark, pos_tables, engine_tables, small_pdf, oracle_idx,
    tmp_path_factory,
):
    """Phrases with stopword-grade members ride the HOT venue: when the
    terms' df-sum fits ``hot_df_budget`` the positional blocks fetch
    whole into the driver cache and the shared phrase kernel runs
    in-process — identical to oracle.phrase_search across slop values,
    and the repeat serves without the hybrid/distributed paths."""
    from search_engine_spark.operators.filters import build_filter_blocks
    from search_engine_spark.operators.serve import QueryServer

    d = str(tmp_path_factory.mktemp("pos_srv_hot"))
    pos_tables["blocks"].write.parquet(f"{d}/postings")
    pos_tables["lemma_stats"].write.parquet(f"{d}/lemma_stats")
    pos_tables["doc_stats"].write.parquet(f"{d}/doc_stats")
    build_filter_blocks(engine_tables["docs"], range_size=512).write.parquet(
        f"{d}/filters"
    )
    srv = QueryServer(spark, d, cache_blocks=False)
    srv.local_df_budget = 1      # local venue off for real queries
    srv.hot_df_budget = 10 ** 9  # everything fits the hot tier
    srv.result_cache_size = 0    # repeats must exercise the kernels
    # the hybrid venue must never fire: hot serves first
    srv._hybrid_blocks = lambda *a, **kw: (_ for _ in ()).throw(
        AssertionError("hybrid fired despite the hot venue")
    )
    checked = 0
    for q in _phrases_from_corpus(small_pdf)[:3]:
        for kwargs in ({}, {"slop": 1}):
            exp = orc.phrase_search(oracle_idx, q, k=10, **kwargs)
            assert srv.phrase(q, k=10, **kwargs) == exp, (q, kwargs)
            assert srv.phrase(q, k=10, **kwargs) == exp  # warm repeat
            checked += bool(exp)
    assert checked


def test_query_server_phrase_elite_venue(
    spark, pos_tables, engine_tables, small_pdf, oracle_idx,
    tmp_path_factory,
):
    """Phrases past EVERY driver budget ride the elite-candidate venue
    (round 4 ``_elite_phrase``): candidates = union of the terms'
    elite ids, positional point-fetch, summed-residual certificate.
    With a large elite_top the tiny corpus is fully summarized
    (certificate unconditional → the venue must SERVE); with a small
    elite_top the residual path exercises and identity holds whether
    it certifies or falls through to the full positional scan."""
    from search_engine_spark.operators.filters import build_filter_blocks
    from search_engine_spark.operators.serve import QueryServer

    d = str(tmp_path_factory.mktemp("pos_srv_elite"))
    pos_tables["blocks"].write.parquet(f"{d}/postings")
    pos_tables["lemma_stats"].write.parquet(f"{d}/lemma_stats")
    pos_tables["doc_stats"].write.parquet(f"{d}/doc_stats")
    build_filter_blocks(engine_tables["docs"], range_size=512).write.parquet(
        f"{d}/filters"
    )
    srv = QueryServer(spark, d, cache_blocks=False)
    srv.local_df_budget = 0   # every driver venue off (hybrid included)
    srv.hot_df_budget = 0
    srv.result_cache_size = 0
    srv.selective_min_blocks = 1
    served = []
    orig = srv._elite_phrase

    def spy(*a, **kw):
        r = orig(*a, **kw)
        served.append(r is not None)
        return r

    srv._elite_phrase = spy
    checked = 0
    for q in _phrases_from_corpus(small_pdf)[:4]:
        for kwargs in ({}, {"slop": 1}, {"filters": {"role": "user"}}):
            exp = orc.phrase_search(oracle_idx, q, k=10, **kwargs)
            assert srv.phrase(q, k=10, **kwargs) == exp, (q, kwargs)
            checked += bool(exp)
    assert checked
    assert any(served), "elite phrase venue never served"
    # small elite_top: the residual certificate path (serve or decline,
    # identity either way)
    srv.elite_top = 4
    srv._elite_memos.clear()
    for q in _phrases_from_corpus(small_pdf)[:3]:
        exp = orc.phrase_search(oracle_idx, q, k=3)
        assert srv.phrase(q, k=3) == exp, q
