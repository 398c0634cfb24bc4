"""BPE trainer pins: Spark merges == a from-scratch Python reference
(greedy left-to-right apply, freq-weighted overlapping pair counts,
(count desc, pair asc) pick), including the overlap ('aaaa') and
boundary (symbol 'ab' vs pair 'b b') traps; segmentation twin; the
double-separator invariant self-preserves through merges."""

from __future__ import annotations

import pytest

from search_engine_spark.operators.bpe import (
    END_WORD,
    bpe_train,
    segment_docs,
    segment_words,
    word_counts,
)


# ---------------------------------------------------------------- reference
def _ref_pairs(syms: list[str]) -> list[tuple[str, str]]:
    return list(zip(syms, syms[1:]))


def _ref_merge(syms: list[str], pair: tuple[str, str]) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def ref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Sennrich reference: vocab of (symbol-list, freq); merges pinned
    by (count desc, pair asc)."""
    vocab = {w: (list(w) + [END_WORD], f) for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.values():
            for p in _ref_pairs(syms):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        pair = min(counts, key=lambda p: (-counts[p], f"{p[0]} {p[1]}"))
        merges.append((f"{pair[0]} {pair[1]}", counts[pair]))
        vocab = {w: (_ref_merge(s, pair), f) for w, (s, f) in vocab.items()}
    segs = {w: s for w, (s, _) in vocab.items()}
    return merges, segs


CORPUS = [
    "aaaa aaaa abab",          # overlap trap: greedy pairs (0,1),(2,3)
    "banana bandana cabana",
    "the cat sat on the mat the bat",
    "ab ab abb bab b",          # boundary trap: 'ab' symbol vs 'b b' pair
    "low lower lowest newest newer wide wider widest",
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame([(t,) for t in CORPUS], ["text"])


def _freqs(corpus: list[str]) -> dict[str, int]:
    f: dict[str, int] = {}
    for line in corpus:
        for w in line.split():
            f[w] = f.get(w, 0) + 1
    return f


def test_word_counts_topv_pinned(spark, corpus_df):
    got = {
        r["word"]: r["freq"]
        for r in word_counts(corpus_df).collect()
    }
    assert got == _freqs(CORPUS)
    top3 = [r["word"] for r in word_counts(corpus_df, top_v=3).collect()]
    ref = sorted(_freqs(CORPUS).items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert top3 == [w for w, _ in ref]


def test_merges_match_reference(spark, corpus_df):
    ref_merges, _ = ref_bpe(_freqs(CORPUS), 12)
    got = bpe_train(word_counts(corpus_df), 12)
    assert got == ref_merges


def test_segment_words_matches_reference(spark, corpus_df):
    n = 10
    wc = word_counts(corpus_df)
    merges = bpe_train(wc, n)
    ref_merges, ref_segs = ref_bpe(_freqs(CORPUS), n)
    assert merges == ref_merges
    got = {r["word"]: list(r["tokens"]) for r in segment_words(wc, merges).collect()}
    assert got == ref_segs


def test_segment_docs_token_counts(spark, corpus_df):
    docs = corpus_df.selectExpr("monotonically_increasing_id() AS doc_id", "text")
    merges, ref_segs = ref_bpe(_freqs(CORPUS), 8)
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in segment_docs(docs, merges, ["doc_id"]).collect()
    }
    rows = docs.collect()
    for r in rows:
        want = sum(len(ref_segs[w]) for w in r["text"].split())
        assert got[r["doc_id"]] == want


def test_exhausted_vocab_stops_early(spark):
    df = spark.createDataFrame([("a b",)], ["text"])
    # each word is one char + </w>: after merging ('a','</w>') and
    # ('b','</w>') every word is ONE symbol — no pairs remain
    merges = bpe_train(word_counts(df), 10)
    assert len(merges) == 2
    assert {m[0] for m in merges} == {f"a {END_WORD}", f"b {END_WORD}"}


def test_duckdb_twin_smoke(spark, corpus_df):
    """The unrolled-CTE DuckDB twin (contract `bpe_merges`) agrees with
    the Spark trainer on this corpus — a driver-independent pin so twin
    drift is caught at pytest time, not contract time."""
    import duckdb

    from search_engine_spark.contract import bpe_merges_duck

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"('{t}')" for t in CORPUS)
        + ") t(text)"
    )
    got = con.sql(bpe_merges_duck(8, None)).fetchall()
    ref_merges, _ = ref_bpe(_freqs(CORPUS), 8)
    assert [(int(r[0]), r[1], int(r[2])) for r in got] == [
        (i + 1, p, c) for i, (p, c) in enumerate(ref_merges)
    ]
