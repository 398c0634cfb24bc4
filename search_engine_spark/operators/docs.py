"""transcripts → docs: deterministic dense doc_id + scope + doc_len.

Replaces the reference's MySQL auto-increment page ids (model/Page.java:
11-12) with a deterministic dense rank over (conv_id, turn_idx) —
required for rank-identity and resume idempotence.

Scale design (SURVEY.md §2.9, §7.4 item 3): a global
``row_number().over(Window.orderBy(...))`` is a single-partition sort
trap. Instead, two-level offsets, all DataFrame-native and sampling-free
(no repartitionByRange nondeterminism):

1. per-conversation sizes:   groupBy(conv_id).count()            (shuffle 1)
2. conversation offset:      cumulative sum over conv_id order — a window
   over the CONVERSATION dictionary (|convs| ≈ |turns|/7; at 10^12 turns
   recurse the same trick on a conv_id prefix bucket)
3. doc_id = conv_offset + row_number within conv (distributed window
   partitioned by conv_id)                                        (shuffle 2)

Both shuffles are on conv_id, so AQE reuses the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from oracle.oracle import N_SCOPES  # pinned scope derivation constant
from search_engine_spark.functions.udfs import tokenize_lemmatize_counts


def with_scope(df: DataFrame) -> DataFrame:
    """scope = f"scope-{crc32(conv_id) % 4}" — pinned, UDF-free
    (FIXTURES.md §2; oracle.scope_of is the twin)."""
    return df.withColumn(
        "scope",
        F.concat(
            F.lit("scope-"),
            (F.crc32(F.col("conv_id").cast("binary")) % N_SCOPES).cast("string"),
        ),
    )


def conv_offsets(transcripts: DataFrame) -> DataFrame:
    """(conv_id, _n, _conv_offset): per-conversation turn counts and the
    exclusive cumulative doc_id offset in conv_id order — the first pass
    of the two-level deterministic id scheme. The window runs over the
    CONVERSATION dictionary (|convs| ≈ |turns|/7), not the turns."""
    conv_sizes = transcripts.groupBy("conv_id").agg(F.count("*").alias("_n"))
    w_cum = (
        Window.orderBy("conv_id").rowsBetween(Window.unboundedPreceding, -1)
    )
    return conv_sizes.select(
        "conv_id",
        "_n",
        F.coalesce(F.sum("_n").over(w_cum), F.lit(0)).alias("_conv_offset"),
    )


def docs_from_offsets(transcripts: DataFrame, offsets: DataFrame) -> DataFrame:
    """Second pass: doc_id = conv offset + row_number within conversation.
    ``offsets`` may be pre-filtered to a subset of conversations (the
    checkpointed bucket build, plans/job.py) — ids stay globally correct
    because the offsets were computed over the full input."""
    w_turn = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        transcripts.join(offsets.select("conv_id", "_conv_offset"), "conv_id")
        .withColumn(
            "doc_id",
            (F.col("_conv_offset") + F.row_number().over(w_turn)).cast("long"),
        )
        .drop("_conv_offset")
    )


def assign_doc_ids(transcripts: DataFrame) -> DataFrame:
    """Adds dense 1-based ``doc_id`` ordered by (conv_id, turn_idx)."""
    return docs_from_offsets(transcripts, conv_offsets(transcripts))


def build_docs(transcripts: DataFrame, with_lemmas: bool = False) -> DataFrame:
    """Full docs table (FIXTURES.md §2). ``with_lemmas=True`` keeps the
    tokenized ``lemma_counts`` column (array<struct<lemma,tf>>) so the
    index build tokenizes exactly once AND needs no tf shuffle (counting
    happens inside the UDF — see functions/udfs.py).

    Per-row invariant (input_hint): text carried through untouched; doc_id
    strictly increasing in (conv_id, turn_idx) order. ``doc_len`` is the
    indexed-token count = Σ tf (pinned: post-stopword; oracle twin
    ``doc_length``).
    """
    return enrich_docs(assign_doc_ids(transcripts), with_lemmas)


def enrich_docs(docs_with_ids: DataFrame, with_lemmas: bool = False) -> DataFrame:
    """scope + tokenization + doc_len over a frame that already has
    doc_id (shared by the single-pass build and the bucketed job)."""
    d = with_scope(docs_with_ids)
    d = d.withColumn("lemma_counts", tokenize_lemmatize_counts(F.col("text")))
    d = d.withColumn(
        "doc_len",
        F.expr("aggregate(lemma_counts, 0, (a, x) -> a + x.tf)").cast("int"),
    )
    cols = [
        "doc_id", "conv_id", "turn_idx", "role", "tool", "ts",
        "scope", "text", "doc_len",
    ]
    if with_lemmas:
        cols.append("lemma_counts")
    return d.select(*cols)
