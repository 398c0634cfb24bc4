"""Property test: the impact rank-prefix kernels are SAFE-UP-TO-M — on
random posting sets, for ANY prefix depth R, ``merge_certified`` either
returns exactly what the production exact kernel returns or declines
(None); at full coverage it always returns and always matches.

Runs the kernels directly on pandas frames (no Spark) with BLOCK_SIZE
patched small so prefixes are genuinely partial on hypothesis-sized
corpora. The Spark-level identity on the fixture corpus lives in
tests/test_impact.py."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.operators import compress as C
from search_engine_spark.operators import impact as I
from search_engine_spark.operators.wand import _shard_exact_kernel
from tests.test_wand_property import _blocks_frame

BM_BLOCK = 8  # patched block size: partial prefixes at hypothesis scale


@pytest.fixture(autouse=True)
def small_blocks(monkeypatch):
    monkeypatch.setattr(C, "BLOCK_SIZE", BM_BLOCK)
    monkeypatch.setattr(I, "BLOCK_SIZE", BM_BLOCK)
    yield


def _impact_frame(blocks_pdf: pd.DataFrame) -> pd.DataFrame:
    """POSTINGS-shaped frame → IMPACT rows via the production encoder
    kernel, per (scope, lemma, shard) group."""
    parts = [
        I._impact_encode_kernel(g)
        for _, g in blocks_pdf.groupby(
            ["scope", "lemma", "shard"], sort=True
        )
    ]
    return pd.concat(parts, ignore_index=True)


def _corpus(cfg):
    rng = np.random.default_rng(cfg["seed"])
    docs = np.arange(1, cfg["n_docs"] + 1)
    doc_lens = {int(d): int(rng.integers(1, 200)) for d in docs}
    scope_of = (
        (lambda d: f"s{d % 2}") if cfg["two_scopes"] else (lambda d: "s0")
    )
    terms = {}
    for t in range(cfg["n_terms"]):
        mask = rng.random(docs.size) < cfg["density"]
        if not mask.any():
            mask[rng.integers(docs.size)] = True
        terms[f"t{t}"] = {
            int(d): int(rng.integers(1, 9)) for d in docs[mask]
        }
    return terms, doc_lens, scope_of


corpus_strategy = st.builds(
    dict,
    n_docs=st.integers(5, 220),
    n_terms=st.integers(1, 3),
    k=st.integers(1, 15),
    r=st.integers(1, 40),
    seed=st.integers(0, 10_000),
    density=st.floats(0.1, 0.95),
    two_scopes=st.booleans(),
)


def _exact(blocks, terms, idfs, avg_len, m):
    out = _shard_exact_kernel(terms, idfs, avg_len, m)(blocks)
    ids = out["doc_id"].to_numpy(np.int64)
    sc = out["score"].to_numpy(np.float64)
    order = np.lexsort((ids, -sc))[:m]
    return [(int(ids[i]), float(sc[i])) for i in order]


def _prefix(imp, r):
    return imp[(imp["rank"] < r)]  # strata rows have rank -1 → included


@given(corpus_strategy)
@settings(max_examples=120, deadline=None)
def test_impact_single_safe_up_to_m(cfg):
    term_postings, doc_lens, scope_of = _corpus(cfg)
    sub = {"t0": term_postings["t0"]}
    blocks = _blocks_frame(sub, doc_lens, scope_of)
    imp = _impact_frame(blocks)
    idf, avg_len = 1.7, float(np.mean(list(doc_lens.values())))
    m = cfg["k"]
    exp = _exact(blocks, ["t0"], [idf], avg_len, m)
    max_rank = int(imp["rank"].max())
    for r in sorted({min(cfg["r"], max_rank + 1), max_rank + 1}):
        rows = I.impact_single_kernel("t0", idf, avg_len, m)(
            _prefix(imp, r)
        )
        got = I.merge_certified(rows.to_dict("records"), m, 0)
        if r > max_rank:
            assert got is not None, "full coverage must certify"
        if got is not None:
            assert got == exp, (r, max_rank)


@given(corpus_strategy)
@settings(max_examples=120, deadline=None)
def test_impact_and_safe_up_to_m(cfg):
    if cfg["n_terms"] < 2:
        return
    term_postings, doc_lens, scope_of = _corpus(cfg)
    names = sorted(term_postings)
    blocks = _blocks_frame(term_postings, doc_lens, scope_of)
    idfs = [1.0 + 0.3 * i for i in range(len(names))]
    avg_len = float(np.mean(list(doc_lens.values())))
    m = cfg["k"]
    exp = _exact(blocks, names, idfs, avg_len, m)
    # anchor = rarest term; partners ride impact prefixes
    sizes = {t: len(p) for t, p in term_postings.items()}
    anchor = min(names, key=lambda t: (sizes[t], t))
    partners = [t for t in names if t != anchor]
    left = blocks[blocks["lemma"] == anchor].reset_index(drop=True)
    imp = _impact_frame(blocks[blocks["lemma"].isin(partners)])
    max_rank = int(imp["rank"].max())
    kern = I.impact_and_kernel(
        [anchor], partners, names, idfs, avg_len, m
    )
    for r in sorted({min(cfg["r"], max_rank + 1), max_rank + 1}):
        rows = kern(left, _prefix(imp, r))
        got = I.merge_certified(rows.to_dict("records"), m, 0)
        if r > max_rank:
            assert got is not None, "full coverage must certify"
        if got is not None:
            assert got == exp, (r, max_rank)


@given(corpus_strategy)
@settings(max_examples=60, deadline=None)
def test_impact_single_excl_safe_up_to_m(cfg):
    if cfg["n_terms"] < 2:
        return
    term_postings, doc_lens, scope_of = _corpus(cfg)
    blocks = _blocks_frame(term_postings, doc_lens, scope_of)
    idf, avg_len = 1.4, float(np.mean(list(doc_lens.values())))
    m = cfg["k"]
    excl = ("t1",)
    # exact twin: production kernel with exclusions on the doc-ordered frame
    out = _shard_exact_kernel(["t0"], [idf], avg_len, m, excl)(blocks)
    ids = out["doc_id"].to_numpy(np.int64)
    sc = out["score"].to_numpy(np.float64)
    order = np.lexsort((ids, -sc))[:m]
    exp = [(int(ids[i]), float(sc[i])) for i in order]
    left = blocks[blocks["lemma"] == "t1"].reset_index(drop=True)
    imp = _impact_frame(blocks[blocks["lemma"] == "t0"])
    max_rank = int(imp["rank"].max())
    kern = I.impact_single_excl_kernel("t0", idf, avg_len, m, excl)
    for r in sorted({min(cfg["r"], max_rank + 1), max_rank + 1}):
        rows = kern(left, _prefix(imp, r))
        got = I.merge_certified(rows.to_dict("records"), m, 0)
        if r > max_rank:
            assert got is not None, "full coverage must certify"
        if got is not None:
            assert got == exp, (r, max_rank)
