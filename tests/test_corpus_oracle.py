"""Corpus determinism + oracle semantics tests (SURVEY.md §5)."""

import pandas as pd

from oracle.oracle import build_docs, build_index, scope_of, search
from search_engine_spark.functions.scoring import df_cutoff
from search_engine_spark.sources.corpus import HOT_TERM, generate_transcripts


def _mini_transcripts():
    rows = [
        ("conv-0", 0, "user", "rocket engines burn fuel"),
        ("conv-0", 1, "assistant", "the rocket uses liquid fuel engines"),
        ("conv-1", 0, "user", "gardens need water"),
        ("conv-1", 1, "assistant", "water the gardens daily"),
        ("conv-2", 0, "user", "rocket gardens"),
    ]
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text"]
    ).assign(tool=None, ts=pd.Timestamp("2025-01-01"))


def test_corpus_deterministic():
    a = generate_transcripts(30, seed=42)
    b = generate_transcripts(30, seed=42)
    pd.testing.assert_frame_equal(a, b)
    assert list(a.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    # emitted sorted by (conv_id, turn_idx)
    assert a.sort_values(["conv_id", "turn_idx"]).equals(a)


def test_corpus_hot_term_frequency():
    t = generate_transcripts(200, seed=42)
    frac = t["text"].str.contains(HOT_TERM).mean()
    assert 0.5 < frac < 0.7


def test_docs_dense_ids_and_invariant():
    t = _mini_transcripts()
    docs = build_docs(t)
    assert list(docs["doc_id"]) == [1, 2, 3, 4, 5]
    # per-row invariant: text equality under stable (conv_id, turn_idx) order
    merged = docs.merge(t, on=["conv_id", "turn_idx"], suffixes=("", "_in"))
    assert (merged["text"] == merged["text_in"]).all()


def test_scope_pinned():
    import zlib
    assert scope_of("conv-0") == f"scope-{zlib.crc32(b'conv-0') % 4}"


def test_oracle_search_basics():
    idx = build_index(_mini_transcripts())
    # "rocket" appears in docs 1, 2, 5 → df=3 of N=5; cutoff=0.25 → killed
    assert search(idx, "rocket") == []
    # absent term → empty
    assert search(idx, "zzzmissing") == []
    # stop-particle-only → empty
    assert search(idx, "the and of") == []


def test_oracle_conjunction_and_tiebreak():
    rows = []
    for i in range(60):
        rows.append((f"conv-{i:03d}", 0, "user", "filler words here"))
    rows.append(("conv-900", 0, "user", "alpha beta gamma"))
    rows.append(("conv-901", 0, "user", "alpha beta beta gamma"))
    rows.append(("conv-902", 0, "user", "alpha only here"))
    t = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"]).assign(
        tool=None, ts=pd.Timestamp("2025-01-01")
    )
    idx = build_index(t)
    res = search(idx, "alpha beta", k=10)
    ids = [d for d, _ in res]
    assert set(ids) == {61, 62}
    # doc 62 has higher tf for beta → higher bm25 → first
    assert ids[0] == 62
    scores = [s for _, s in res]
    assert scores == sorted(scores, reverse=True)


def test_oracle_pagination_clamps():
    rows = [(f"conv-{i:03d}", 0, "user", f"unique{i} shared") for i in range(30)]
    t = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"]).assign(
        tool=None, ts=pd.Timestamp("2025-01-01")
    )
    idx = build_index(t)
    full = search(idx, "unique5", k=100)
    assert len(full) == 1
    assert search(idx, "unique5", k=100, offset=5) == []


def test_cutoff_value():
    assert df_cutoff(100) == 5.0
    assert df_cutoff(350) == 17.5
