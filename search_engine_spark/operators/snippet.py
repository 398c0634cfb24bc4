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

from search_engine_spark.functions.analyze import TOKEN_RE, lemmatize

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
    if not hits:
        return ""
    pieces: list[str] = []
    used = 0
    last_end = 0
    for s, e in hits:
        if used >= max_size:
            break
        if e <= last_end:
            continue  # hit already fully shown inside the previous window
        lo = max(0, s - around, last_end)
        hi = min(len(text), e + around)
        pre = text[lo:s] if lo < s else ""
        frag = pre + "<b>" + text[s:e] + "</b>" + text[e:hi]
        cost = len(frag) - 7  # raw chars emitted (tags excluded)
        if used + cost > max_size and pieces:
            break
        pieces.append(frag)
        used += cost
        last_end = hi
    return "...".join(pieces)


def snippet_udf(terms: list[str]):
    """Series→Series pandas UDF for a fixed query-term list."""
    lemset = frozenset(terms)

    def batch(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: make_snippet(t, lemset))

    return pandas_udf(batch, StringType())


def materialize_with_snippets(
    results: DataFrame, docs: DataFrame, terms: list[str]
) -> DataFrame:
    """J4 + F3: join the k-row result to docs (broadcast the tiny side),
    add snippets, order for presentation. Output shape mirrors the
    reference SearchItem (dto/SearchItem.java:13-19): conv/turn identity,
    headline snippet, relevance."""
    return (
        docs.join(F.broadcast(results), "doc_id")
        .withColumn("snippet", snippet_udf(terms)(F.col("text")))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .select(
            "doc_id", "conv_id", "turn_idx", "role", "scope",
            "score", "snippet", "text",
        )
    )
