"""Vectorized pandas/Arrow UDF wrappers around the pure cores.

The single heavy UDF of the build is the tokenizer (north star:
"tokenization and lemma normalization via vectorized pandas/Arrow UDFs").
Everything downstream is native Catalyst. Reference analog: the Lucene
morphology call inside LemmaFinder (services/LemmaFinder.java:49-59).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from search_engine_spark.functions.analyze import (
    STOPWORDS,
    TOKEN_RE,
    fold,
    lemmatize,
)

LEMMA_COUNTS_TYPE = ArrayType(
    StructType(
        [
            StructField("lemma", StringType(), False),
            StructField("tf", IntegerType(), False),
        ]
    )
)


def _analyze_batch(texts: pd.Series) -> pd.Series:
    """Batch analyzer with a per-batch lemma memo (Zipf token reuse makes
    the memo hit rate very high, so lemmatize() runs ~once per unique
    token per Arrow batch, not once per occurrence)."""
    memo: dict[str, str] = {}
    stop = STOPWORDS
    findall = TOKEN_RE.findall

    def one(text):
        if not text:
            return []
        out = []
        for tok in findall(fold(text)):
            if tok in stop:
                continue
            lem = memo.get(tok)
            if lem is None:
                lem = lemmatize(tok)
                memo[tok] = lem
            out.append(lem)
        return out

    return texts.map(one)


tokenize_lemmatize = pandas_udf(_analyze_batch, ArrayType(StringType()))


def _analyze_counts_batch(texts: pd.Series) -> pd.Series:
    """Batch analyzer emitting per-doc (lemma, tf) pairs directly.

    Counting INSIDE the UDF makes the tf aggregation (SURVEY.md A1) a
    narrow operation: the downstream explode yields already-unique
    (doc_id, lemma) rows, so the index build's only wide stages are the
    stats aggregation and the repartition-by-(scope, lemma, shard) into
    the block encoder. At 10^12 turns that removes a full
    tokens-sized shuffle (~1.5× the posting count in rows).
    """
    memo: dict[str, str] = {}
    stop = STOPWORDS
    findall = TOKEN_RE.findall

    def one(text):
        if not text:
            return []
        counts: dict[str, int] = {}
        for tok in findall(fold(text)):
            if tok in stop:
                continue
            lem = memo.get(tok)
            if lem is None:
                lem = lemmatize(tok)
                memo[tok] = lem
            counts[lem] = counts.get(lem, 0) + 1
        return list(counts.items())

    return texts.map(one)


tokenize_lemmatize_counts = pandas_udf(_analyze_counts_batch, LEMMA_COUNTS_TYPE)


LEMMA_POSITIONS_TYPE = ArrayType(
    StructType(
        [
            StructField("lemma", StringType(), False),
            StructField("tf", IntegerType(), False),
            StructField("positions", ArrayType(IntegerType()), False),
        ]
    )
)


def _analyze_positions_batch(texts: pd.Series) -> pd.Series:
    """Positional variant of the counting analyzer: per-doc
    (lemma, tf, positions) where a position is the index in the ANALYZED
    (post-stopword) lemma stream — the pinned definition phrase queries
    verify against (oracle.OracleIndex.positions is the twin).
    tf == len(positions) by construction."""
    memo: dict[str, str] = {}
    stop = STOPWORDS
    findall = TOKEN_RE.findall

    def one(text):
        if not text:
            return []
        poss: dict[str, list[int]] = {}
        i = 0
        for tok in findall(fold(text)):
            if tok in stop:
                continue
            lem = memo.get(tok)
            if lem is None:
                lem = lemmatize(tok)
                memo[tok] = lem
            poss.setdefault(lem, []).append(i)
            i += 1
        return [(lem, len(p), p) for lem, p in poss.items()]

    return texts.map(one)


tokenize_lemmatize_positions = pandas_udf(
    _analyze_positions_batch, LEMMA_POSITIONS_TYPE
)
