"""Impact-ordered posting cache (operators/impact.py): layout
invariants, residual soundness, and rank-identity of the rank-prefix
venues against the oracle and the full distributed scan — in every
outcome (certified, escalated, declined)."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pytest

from oracle import oracle as orc
from search_engine_spark.functions.analyze import query_lemmas
from search_engine_spark.operators.compress import BLOCK_SIZE
from search_engine_spark.operators.impact import (
    build_impact_cache,
    impact_blocks,
    load_manifest,
    merge_certified,
)
from search_engine_spark.operators.serve import QueryServer
from tests.test_spark_engine import HOT2, HOT_TERM, MID, QUERY_CASES, RARE, VOCAB


@pytest.fixture(scope="module")
def impact_index(spark, base_index_dir, tmp_path_factory):
    """Private copy of the shared index with a FULL-coverage impact
    cache (min_df=0 — every lemma, so the tiny corpus exercises every
    venue path)."""
    dst = str(tmp_path_factory.mktemp("idximp") / "idx")
    shutil.copytree(base_index_dir["index"], dst)
    manifest = build_impact_cache(spark, dst, min_df=0)
    assert manifest["terms"], "impact cache built no terms"
    return {"corpus": base_index_dir["corpus"], "index": dst,
            "manifest": manifest}


@pytest.fixture(scope="module")
def srv(spark, impact_index):
    """Forced-distributed server where the impact venues are the ONLY
    pre-full-scan paths (driver venues, elite, selective all off)."""
    s = QueryServer(spark, impact_index["index"], cache_blocks=False)
    s.local_df_budget = 0
    s.hot_df_budget = 0
    s.result_cache_size = 0
    s.elite_top = 0
    s.selective_max_fetch_blocks = 0
    s.selective_min_blocks = 1
    s.impact_min_blocks = 1
    s.selective_floor_postings = 4
    return s


def _spy(srv, name):
    hits = []
    orig = getattr(srv, name)

    def wrapper(*a, **k):
        out = orig(*a, **k)
        hits.append(out is not None)
        return out

    setattr(srv, name, wrapper)
    return hits, orig


# -- layout invariants -------------------------------------------------------


def test_layout_invariants(spark, impact_index, engine_tables):
    """Every (scope, lemma, shard) group: contiguous ranks from 0,
    proxy-monotone rank boundaries, doc-sorted ids inside each block,
    posting multiset identical to the doc-ordered family, next_tf/
    next_dl = the first suffix posting in proxy order, strata = exact
    per-tf min dl."""
    from search_engine_spark.functions.codec import (
        delta_decode,
        varbyte_decode,
    )

    pdf = impact_blocks(spark, impact_index["index"]).toPandas()
    flat = engine_tables["postings_flat"].toPandas()
    flat_by = {
        (sc, lem): g
        for (sc, lem), g in flat.groupby(["scope", "lemma"], sort=False)
    }
    checked = 0
    for (sc, lem, sh), g in pdf.groupby(
        ["scope", "lemma", "shard"], sort=False
    ):
        k0 = g[g["kind"] == 0].sort_values("rank")
        k1 = g[g["kind"] == 1]
        assert list(k0["rank"]) == list(range(len(k0)))
        got = []
        for ib, tb, lb, cnt, mtf, mdl, nt, nd in zip(
            k0["doc_ids"], k0["tfs"], k0["doc_lens"], k0["count"],
            k0["max_tf"], k0["min_dl"], k0["next_tf"], k0["next_dl"],
        ):
            ids = delta_decode(varbyte_decode(ib)).astype(np.int64)
            tfs = varbyte_decode(tb).astype(np.int64)
            dls = varbyte_decode(lb).astype(np.int64)
            assert (np.diff(ids) > 0).all()  # doc-sorted within block
            assert int(cnt) == ids.size
            assert int(mtf) == tfs.max()
            assert int(mdl) == dls.min()
            got.append((ids, tfs, dls, int(nt), int(nd)))
        # proxy re-sort of the concatenation reproduces the rank cuts
        # and the suffix descriptors
        all_ids = np.concatenate([x[0] for x in got])
        all_tfs = np.concatenate([x[1] for x in got])
        all_dls = np.concatenate([x[2] for x in got])
        proxy = np.lexsort((all_ids, all_dls, -all_tfs))
        for i, (ids, tfs, dls, nt, nd) in enumerate(got):
            nxt = (i + 1) * BLOCK_SIZE
            if nxt < all_ids.size:
                assert nt == all_tfs[proxy][nxt]
                assert nd == all_dls[proxy][nxt]
            else:
                assert (nt, nd) == (-1, -1)
            chunk = proxy[i * BLOCK_SIZE:nxt]
            assert set(all_ids[chunk]) == set(ids)
        # posting multiset == flat postings restricted to this shard
        ref = flat_by[(sc, lem)]
        ref = ref[(ref["doc_id"] - 1) // 256 == sh]
        assert sorted(zip(all_ids.tolist(), all_tfs.tolist())) == sorted(
            zip(ref["doc_id"].tolist(), ref["tf"].tolist())
        )
        # strata: exact per-tf min dl over the whole group
        exp = {
            int(t): int(all_dls[all_tfs == t].min())
            for t in np.unique(all_tfs)
        }
        got_strata = {
            int(t): int(d) for t, d in zip(k1["max_tf"], k1["min_dl"])
        }
        assert got_strata == exp
        checked += 1
    assert checked > 50


def test_manifest(impact_index):
    m = load_manifest(impact_index["index"])
    assert m["block_size"] == BLOCK_SIZE
    assert HOT_TERM in m["terms"] or any(
        HOT_TERM == t for t in m["terms"]
    )


# -- certificate merge (pure) ------------------------------------------------


def test_merge_certified_rules():
    rows = [
        {"doc_id": 3, "score": 5.0},
        {"doc_id": 1, "score": 4.0},
        {"doc_id": 2, "score": 4.0},
    ]
    # no sentinels → exact even under-filled
    assert merge_certified(rows, 5, 0) == [(3, 5.0), (1, 4.0), (2, 4.0)]
    # sentinel below the m-th (strictly) → certified
    ok = rows + [{"doc_id": -1, "score": 3.9}]
    assert merge_certified(ok, 3, 0) == [(3, 5.0), (1, 4.0), (2, 4.0)]
    # tie with the m-th → NOT certified (a suffix doc could tie with a
    # smaller doc_id)
    tie = rows + [{"doc_id": -1, "score": 4.0}]
    assert merge_certified(tie, 3, 0) is None
    # under-filled with a sentinel → escalate
    assert merge_certified(ok, 4, 0) is None
    # offset slicing after certification
    assert merge_certified(ok, 2, 1) == [(1, 4.0), (2, 4.0)]


# -- venue rank-identity -----------------------------------------------------


def test_impact_single_rank_identity(srv, oracle_idx):
    hits, _ = _spy(srv, "_impact_single")
    for qid, query, scope, k, offset in QUERY_CASES:
        if len(set(query_lemmas(query))) != 1:
            continue
        exp = orc.search(oracle_idx, query, scope=scope, k=k, offset=offset)
        for mode in ("wand", "exact"):
            got = srv.search(query, scope=scope, k=k, offset=offset,
                             mode=mode)
            assert got == exp, (qid, mode)
    assert any(hits), "the impact single-term venue never served"


def test_impact_and_rank_identity(srv, oracle_idx):
    hits, _ = _spy(srv, "_impact_and")
    exercised = 0
    for qid, query, scope, k, offset in QUERY_CASES:
        if len(set(query_lemmas(query))) < 2:
            continue
        exp = orc.search(oracle_idx, query, scope=scope, k=k, offset=offset)
        got = srv.search(query, scope=scope, k=k, offset=offset)
        assert got == exp, qid
        exercised += 1
    assert exercised >= 2
    assert any(hits), "the impact AND venue never served"


def test_impact_exclusions_and_cursor(srv, oracle_idx):
    q = f"{MID} {VOCAB[40]}"
    excl = VOCAB[120]
    exp = orc.search(oracle_idx, q, k=10, exclude=query_lemmas(excl))
    got = srv.search(f"{q} -{excl}", k=10)
    assert got == exp
    # single positive term + exclusion rides _impact_single's cogroup
    # path (both combine modes; term must survive the 5% df cutoff)
    hits, _ = _spy(srv, "_impact_single")
    for combine in ("and", "or"):
        exp1 = orc.search(
            oracle_idx, RARE, k=10, exclude=query_lemmas(excl),
            combine=combine,
        )
        got1 = srv.search(f"{RARE} -{excl}", k=10, combine=combine)
        assert got1 == exp1, combine
        assert exp1, "query unexpectedly empty — cutoff ate the term?"
    assert any(hits), "single+excl never reached the impact venue"
    # cursor pagination through the venue
    full = orc.search(oracle_idx, q, k=20)
    if len(full) > 3:
        after = full[2]
        got = srv.search(q, k=5, after=after)
        assert got == full[3:8]


def test_escalation_still_exact(spark, impact_index, oracle_idx):
    """impact_rounds=1 with a tiny first prefix: the venue may decline
    (certificate fails, no escalation budget) — the full scan must
    serve the identical answer either way."""
    s = QueryServer(spark, impact_index["index"], cache_blocks=False)
    s.local_df_budget = 0
    s.hot_df_budget = 0
    s.result_cache_size = 0
    s.elite_top = 0
    s.selective_max_fetch_blocks = 0
    s.selective_min_blocks = 1
    s.impact_min_blocks = 1
    s.selective_floor_postings = 1
    s.impact_rounds = 1
    for q, scope, k in [
        (MID, None, 50),
        (f"{MID} {VOCAB[40]}", None, 30),
        (f"{HOT_TERM} {RARE}", None, 10),
    ]:
        exp = orc.search(oracle_idx, q, scope=scope, k=k)
        assert s.search(q, scope=scope, k=k) == exp, q


def test_matches_full_distributed(srv, spark, impact_index):
    full = QueryServer(spark, impact_index["index"], cache_blocks=False)
    full.local_df_budget = 0
    full.hot_df_budget = 0
    full.result_cache_size = 0
    full.elite_top = 0
    full.selective_max_fetch_blocks = 0
    full.impact_rounds = 0  # impact OFF → pure scan
    for q, scope in [
        (f"{HOT_TERM} {RARE}", None),
        (f"{MID} {RARE}", None),
        (f"{MID} -{RARE}", None),
        (MID, "scope-1"),
        (MID, None),
        (f"{MID} {VOCAB[40]} {VOCAB[50]}", None),
    ]:
        assert srv.search(q, scope=scope, k=10) == full.search(
            q, scope=scope, k=10
        ), q


# -- elite summaries from the impact cache -----------------------------------


def test_elite_from_impact(spark, impact_index, oracle_idx):
    """With the cache present, elite summaries load from a rank-prefix
    read; results stay oracle-identical and the loader is actually
    used."""
    s = QueryServer(spark, impact_index["index"], cache_blocks=False)
    s.local_df_budget = 0
    s.hot_df_budget = 0
    s.result_cache_size = 0
    s.selective_min_blocks = 1
    s.elite_top = 8  # small E so strata are non-trivial
    used = []
    orig = s._elite_from_impact

    def spy(term, scope):
        out = orig(term, scope)
        used.append(out is not None)
        return out

    s._elite_from_impact = spy
    for qid, query, scope, k, offset in QUERY_CASES:
        exp = orc.search(oracle_idx, query, scope=scope, k=k, offset=offset)
        got = s.search(query, scope=scope, k=k, offset=offset)
        assert got == exp, qid
    assert any(used), "elite summaries never loaded from the impact cache"


# -- lifecycle ---------------------------------------------------------------


def test_upsert_drops_cache(spark, impact_index, small_pdf, tmp_path_factory):
    from search_engine_spark.operators.upsert import upsert_turns
    from search_engine_spark.plans.job import IndexBuildJob
    from search_engine_spark.schemas import TRANSCRIPTS

    dst = str(tmp_path_factory.mktemp("idximpup") / "idx")
    shutil.copytree(impact_index["index"], dst)
    assert os.path.exists(f"{dst}/.cache_impact")
    job = IndexBuildJob(
        spark, impact_index["corpus"], dst,
        n_buckets=4, docs_per_shard=256, run_id="base",
    )
    proto = small_pdf.iloc[0]
    delta = pd.DataFrame([{
        "conv_id": proto["conv_id"], "turn_idx": 0, "role": proto["role"],
        "text": "совершенно новый текст", "tool": proto["tool"],
        "ts": proto["ts"],
    }])
    upsert_turns(job, spark.createDataFrame(delta, schema=TRANSCRIPTS))
    assert not os.path.exists(f"{dst}/.cache_impact")
