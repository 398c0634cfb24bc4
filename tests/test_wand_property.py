"""Property test: block-max WAND ≡ exhaustive scoring on random posting
sets (SURVEY.md §5 item 5 "WAND == exhaustive ∀ random corpora/queries/k").

Runs the per-shard kernels directly on synthetic block frames — no Spark
session — so hypothesis can explore hundreds of corpora cheaply. The
Spark-level equivalence on the fixture corpus lives in
tests/test_compressed.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.operators import compress as C
from search_engine_spark.operators.wand import (
    _shard_exact_kernel,
    _shard_or_exact_kernel,
    _shard_or_wand_kernel,
    _shard_wand_kernel,
)


def _blocks_frame(term_postings: dict, doc_lens: dict, scope_of_doc) -> pd.DataFrame:
    """Encode {term: {doc: tf}} into a POSTINGS-shaped pandas frame using
    the production encoder (single shard, per-scope groups)."""
    rows = []
    for term, plist in sorted(term_postings.items()):
        for doc, tf in sorted(plist.items()):
            rows.append((scope_of_doc(doc), term, 0, doc, tf, doc_lens[doc]))
    pdf = pd.DataFrame(
        rows, columns=["scope", "lemma", "shard", "doc_id", "tf", "doc_len"]
    ).sort_values(["scope", "lemma", "shard", "doc_id"], kind="mergesort")
    pdf = pdf.reset_index(drop=True)
    out = list(C._encode_partition(iter([pdf])))
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        columns=["scope", "lemma", "shard", "block_id", "first_doc_id",
                 "last_doc_id", "count", "sum_tf", "max_tf", "min_dl",
                 "doc_ids", "tfs", "doc_lens"]
    )


corpus_strategy = st.builds(
    dict,
    n_docs=st.integers(2, 250),
    n_terms=st.integers(1, 4),
    k=st.integers(1, 20),
    seed=st.integers(0, 10_000),
    density=st.floats(0.05, 0.9),
)


@given(corpus_strategy)
@settings(max_examples=150, deadline=None)
def test_wand_equals_exact_random(cfg):
    rng = np.random.default_rng(cfg["seed"])
    docs = np.arange(1, cfg["n_docs"] + 1)
    doc_lens = {int(d): int(rng.integers(1, 200)) for d in docs}
    terms = [f"t{j}" for j in range(cfg["n_terms"])]
    term_postings = {}
    for t in terms:
        mask = rng.random(docs.size) < cfg["density"]
        chosen = docs[mask]
        if chosen.size == 0:
            chosen = docs[:1]
        term_postings[t] = {
            int(d): int(rng.integers(1, 30)) for d in chosen
        }
    scope_of_doc = lambda d: f"s{d % 3}"  # multi-scope interleaved blocks
    # tiny blocks to force multi-block iteration + pruning pressure
    old = C.BLOCK_SIZE
    C.BLOCK_SIZE = 16
    try:
        pdf = _blocks_frame(term_postings, doc_lens, scope_of_doc)
    finally:
        C.BLOCK_SIZE = old
    idfs = [float(rng.uniform(0.1, 5.0)) for _ in terms]
    avg_len = float(rng.uniform(5, 150))
    m = cfg["k"]

    exact = _shard_exact_kernel(terms, idfs, avg_len, m)(pdf)
    wand = _shard_wand_kernel(terms, idfs, avg_len, m)(pdf)

    def canon(df):
        return sorted(
            zip(df["doc_id"].astype(int), df["score"].astype(float)),
            key=lambda r: (-r[1], r[0]),
        )

    assert canon(wand) == canon(exact)


@given(corpus_strategy)
@settings(max_examples=150, deadline=None)
def test_or_wand_equals_or_exact_random(cfg):
    """Weak-AND (disjunctive block-max) ≡ exhaustive OR scoring, including
    shards where some query terms have no postings at all."""
    rng = np.random.default_rng(cfg["seed"])
    docs = np.arange(1, cfg["n_docs"] + 1)
    doc_lens = {int(d): int(rng.integers(1, 200)) for d in docs}
    terms = [f"t{j}" for j in range(cfg["n_terms"])]
    term_postings = {}
    for j, t in enumerate(terms):
        if cfg["n_terms"] > 1 and j == cfg["n_terms"] - 1 and cfg["seed"] % 3 == 0:
            term_postings[t] = {}  # term absent in this shard (OR-legal)
            continue
        mask = rng.random(docs.size) < cfg["density"]
        chosen = docs[mask]
        if chosen.size == 0:
            chosen = docs[:1]
        term_postings[t] = {int(d): int(rng.integers(1, 30)) for d in chosen}
    scope_of_doc = lambda d: f"s{d % 3}"
    old = C.BLOCK_SIZE
    C.BLOCK_SIZE = 16
    try:
        pdf = _blocks_frame(
            {t: p for t, p in term_postings.items() if p}, doc_lens,
            scope_of_doc,
        )
    finally:
        C.BLOCK_SIZE = old
    idfs = [float(rng.uniform(0.1, 5.0)) for _ in terms]
    avg_len = float(rng.uniform(5, 150))
    m = cfg["k"]

    exact = _shard_or_exact_kernel(terms, idfs, avg_len, m)(pdf)
    wand = _shard_or_wand_kernel(terms, idfs, avg_len, m)(pdf)

    def canon(df):
        return sorted(
            zip(df["doc_id"].astype(int), df["score"].astype(float)),
            key=lambda r: (-r[1], r[0]),
        )

    assert canon(wand) == canon(exact)
