"""Snippet generation (reference F2-F3) + result materialization.

Re-expresses the reference's snippet pipeline
(services/SearchServiceImpl.java:249-333):

- term match with stemming tolerance: the reference bolds words matching
  a stripped stem + up to 3 extra letters (``getBolderRegex``,
  SearchServiceImpl.java:249-288). This engine has a pinned lemmatizer,
  so the analog is exact: a text token matches iff its LEMMA equals a
  query lemma (same analyzer as indexing — stronger and deterministic).
- ``<b>`` injection around every match (SearchServiceImpl.java:291-293).
- window extraction with budget: max_snippet_size=280 chars total,
  >= min_chars_around=10 context around each hit, fragments joined by
  "..." (``getSnippetFromBoldedText``/``trimSnippet``,
  SearchServiceImpl.java:290-333; config application.yaml:48-49).

Runs as a pandas UDF over the FINAL k rows only (cost is nil; the heavy
path never sees text).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from search_engine_spark.functions.analyze import (
    STOPWORDS,
    TOKEN_RE,
    lemmatize,
)

MAX_SNIPPET_SIZE = 280   # application.yaml:48
MIN_CHARS_AROUND = 10    # application.yaml:49


def _fold_preserving(text: str) -> str:
    """Length-preserving fold for OFFSET-carrying matching: hit offsets
    are found on the folded text but sliced from the original, so the
    fold must be 1:1 per character. ``str.lower()`` is not ('İ' → 'i̇'),
    hence per-char lowering that leaves length-changing code points
    untouched (they aren't analyzer tokens anyway), then the 1:1 ё→е."""
    return "".join(
        (low if len(low := c.lower()) == 1 else c) for c in text
    ).replace("ё", "е")


def make_snippet(
    text: str,
    query_lemma_set: frozenset[str],
    max_size: int = MAX_SNIPPET_SIZE,
    around: int = MIN_CHARS_AROUND,
) -> str:
    """Pure core (oracle-testable): bold lemma-matching tokens, then pack
    hit windows into the budget left-to-right, joined by ``...``."""
    if not text or not query_lemma_set:
        return ""
    folded = _fold_preserving(text)
    hits = [
        (m.start(), m.end())
        for m in TOKEN_RE.finditer(folded)
        if lemmatize(m.group()) in query_lemma_set
    ]
    return _pack_windows(text, hits, max_size, around)


def _analyzed_spans(text: str) -> list[tuple[int, int, str]]:
    """The ANALYZED post-stopword lemma stream with char offsets into the
    original text: (start, end, lemma) per surviving token. Index position
    i (operators/compress.py positional gap lists) is exactly element i
    here — the bridge that lets snippets bold the same chains the
    positional index matched."""
    return [
        (m.start(), m.end(), lemmatize(tok))
        for m in TOKEN_RE.finditer(_fold_preserving(text))
        if (tok := m.group()) not in STOPWORDS
    ]


def phrase_hit_spans(
    text: str, seq: list[str], slop: int = 0
) -> list[tuple[int, int]]:
    """Char spans of every token participating in SOME complete phrase
    chain: ordered occurrences of ``seq`` where each next term sits
    within [prev+1, prev+1+slop] analyzed positions — the same
    reachability semantics as oracle.phrase_match_doc (greedy
    smallest-next is incomplete for slop >= 1). Forward sweep keeps the
    positions reachable from the chain start; the backward sweep then
    keeps only those that also reach a chain end, so exactly the tokens
    on full chains are bolded. Spans are deduped and sorted."""
    spans = _analyzed_spans(text)
    if not seq or not spans:
        return []
    occ = [[j for j, s in enumerate(spans) if s[2] == t] for t in seq]
    if any(not o for o in occ):
        return []
    # forward: reach[k] = occurrences of seq[k] reachable from a start
    reach: list[list[int]] = [occ[0]]
    for nxt in occ[1:]:
        prev = reach[-1]
        new = []
        i = 0
        for p in nxt:  # some q in prev with p-1-slop <= q <= p-1
            while i < len(prev) and prev[i] < p - 1 - slop:
                i += 1
            if i < len(prev) and prev[i] <= p - 1:
                new.append(p)
        if not new:
            return []
        reach.append(new)
    # backward: keep positions that also reach the chain's last term
    keep = reach[-1]
    chained: set[int] = set(keep)
    for level in range(len(reach) - 2, -1, -1):
        cur = []
        i = 0
        for q in reach[level]:  # some p in keep with q+1 <= p <= q+1+slop
            while i < len(keep) and keep[i] < q + 1:
                i += 1
            if i < len(keep) and keep[i] <= q + 1 + slop:
                cur.append(q)
        keep = cur
        chained.update(cur)
    return sorted({(spans[j][0], spans[j][1]) for j in chained})


def make_snippet_phrase(
    text: str,
    seq: list[str],
    slop: int = 0,
    max_size: int = MAX_SNIPPET_SIZE,
    around: int = MIN_CHARS_AROUND,
) -> str:
    """Phrase-precise snippet: bold ONLY tokens that are part of an actual
    phrase chain (order + adjacency), not every isolated lemma match —
    upgrade over the reference's per-word bolding
    (SearchServiceImpl.java:249-293), possible because the positional
    index pins chain semantics. Falls back to per-term bolding when no
    chain lands in this text (e.g. a multi-field doc)."""
    if not text or not seq:
        return ""
    hits = phrase_hit_spans(text, seq, slop)
    if not hits:
        return make_snippet(text, frozenset(seq), max_size, around)
    return _pack_windows(text, hits, max_size, around)


def _pack_windows(
    text: str,
    hits: list[tuple[int, int]],
    max_size: int = MAX_SNIPPET_SIZE,
    around: int = MIN_CHARS_AROUND,
) -> str:
    """Left-to-right window packing under the char budget (shared by term
    and phrase snippets): hits whose ±``around`` context windows touch
    merge into ONE fragment with EVERY contained hit bolded (no text ever
    repeats, and the second word of an adjacent phrase is bolded too);
    fragments joined by '...' until the raw-char budget runs out."""
    if not hits:
        return ""
    # merge hits into disjoint windows [lo, hi) carrying their hit spans
    groups: list[list] = []
    for s, e in hits:
        lo, hi = max(0, s - around), min(len(text), e + around)
        if groups and lo <= groups[-1][1]:
            groups[-1][1] = max(groups[-1][1], hi)
            groups[-1][2].append((s, e))
        else:
            groups.append([lo, hi, [(s, e)]])
    pieces: list[str] = []
    used = 0
    for lo, hi, spans in groups:
        if used >= max_size:
            break
        parts: list[str] = []
        cur = lo
        end = lo
        got_hit = False
        for s, e in spans:
            s = max(s, cur)  # chains may share tokens — never re-emit
            if e <= cur:
                continue
            cand_end = min(hi, e + around)
            # budget check per hit (a merged group can exceed the whole
            # budget on its own); always emit at least the first hit
            if used + (cand_end - lo) > max_size and (pieces or got_hit):
                break
            parts.append(text[cur:s])
            parts.append("<b>" + text[s:e] + "</b>")
            cur = e
            end = cand_end
            got_hit = True
        if not got_hit:
            break
        parts.append(text[cur:end])
        pieces.append("".join(parts))
        used += end - lo
        if end < hi:
            break  # group truncated — budget exhausted
    return "...".join(pieces)


def snippet_udf(terms: list[str]):
    """Series→Series pandas UDF for a fixed query-term list."""
    lemset = frozenset(terms)

    def batch(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: make_snippet(t, lemset))

    return pandas_udf(batch, StringType())


def snippet_udf_phrase(seq: list[str], slop: int = 0):
    """Series→Series pandas UDF bolding phrase chains for a fixed
    analyzed query sequence."""

    def batch(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: make_snippet_phrase(t, seq, slop))

    return pandas_udf(batch, StringType())


def materialize_with_snippets(
    results: DataFrame,
    docs: DataFrame,
    terms: list[str],
    phrase_seq: list[str] | None = None,
    slop: int = 0,
) -> DataFrame:
    """J4 + F3: join the k-row result to docs (broadcast the tiny side),
    add snippets, order for presentation. Output shape mirrors the
    reference SearchItem (dto/SearchItem.java:13-19): conv/turn identity,
    headline snippet, relevance. ``phrase_seq`` switches to chain-precise
    phrase bolding (phrase searches highlight the matched phrase, not
    every stray term occurrence)."""
    udf = (
        snippet_udf_phrase(phrase_seq, slop)
        if phrase_seq
        else snippet_udf(terms)
    )
    return (
        docs.join(F.broadcast(results), "doc_id")
        .withColumn("snippet", udf(F.col("text")))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .select(
            "doc_id", "conv_id", "turn_idx", "role", "scope",
            "score", "snippet", "text",
        )
    )
