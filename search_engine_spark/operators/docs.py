"""transcripts → docs: deterministic dense doc_id + scope + doc_len.

Replaces the reference's MySQL auto-increment page ids (model/Page.java:
11-12) with a deterministic dense rank over (conv_id, turn_idx) —
required for rank-identity and resume idempotence.

Scale design (SURVEY.md §2.9, §7.4 item 3): a global
``row_number().over(Window.orderBy(...))`` is a single-partition sort
trap. Instead, multi-level offsets, all DataFrame-native and sampling-free
(no repartitionByRange nondeterminism):

1. per-conversation sizes:   groupBy(conv_id).count()            (shuffle 1)
2. conversation offset:      exclusive cumulative sum in conv_id order via
   PREFIX-BUCKETED recursion (``_exclusive_cumsum``): a fixed-length
   conv_id prefix is an order-preserving bucket key (for lexicographic
   string order, ``substring(a,1,L) <= substring(b,1,L)`` whenever
   ``a <= b``), so global order = bucket order ++ within-bucket order.
   Each level cumsums WITHIN buckets with a distributed
   ``Window.partitionBy(bucket)`` and recurses on the per-bucket totals
   (|buckets| << |rows|); only the coarsest level runs in one explicitly
   tiny partition. No level ever moves the full conversation dictionary
   to a single task.
3. doc_id = conv_offset + row_number within conv (distributed window
   partitioned by conv_id)                                        (shuffle 2)

Both big shuffles are on conv_id, so AQE reuses the exchange.
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


# conv_id prefix lengths, fine → coarse, for the bucketed cumsum. With the
# synthetic "conv-XXXXXXXX" ids: level 0 buckets 1000 convs, level 1 holds
# 1000 level-0 rows, and the pinned top level sees ~|convs|/10^6 rows.
# Tune per id scheme at deployment; correctness never depends on balance
# (a degenerate all-one-bucket prefix just wastes a level).
OFFSET_PREFIX_LENS: tuple[int, ...] = (10, 7)


def _exclusive_cumsum(
    sizes: DataFrame,
    key: str,
    val: str,
    out: str,
    prefix_lens: tuple[int, ...],
) -> DataFrame:
    """Adds ``out`` = exclusive cumulative sum of ``val`` in ``key`` order
    (first row gets 0), without ever sorting the full frame on one task.

    Recursion: bucket by an order-preserving key prefix, cumsum within
    buckets under ``Window.partitionBy`` (distributed), recurse on the
    per-bucket totals for the bucket base offsets. The base case only ever
    sees the coarsest bucket table (bounded rows), so it uses a broadcast
    theta-join prefix sum — O(|buckets|²) work but NO WindowExec and no
    single-partition stage anywhere in the plan.

    ``sizes`` must carry exactly the (key, val) columns (callers pass the
    two-column conv_sizes / bucket-totals frames).
    """
    if not prefix_lens:
        rest = sizes.select(F.col(key).alias("_k2"), F.col(val).alias("_v2"))
        return (
            sizes.join(F.broadcast(rest), F.col("_k2") < F.col(key), "left")
            .groupBy(key, val)
            .agg(F.coalesce(F.sum("_v2"), F.lit(0)).cast("long").alias(out))
        )
    lvl = len(prefix_lens)  # level-unique temp names (recursion reuses them)
    bk, bn, boff, ioff = f"_bkt{lvl}", f"_bn{lvl}", f"_boff{lvl}", f"_ioff{lvl}"
    bucketed = sizes.withColumn(
        bk, F.substring(F.col(key), 1, int(prefix_lens[0]))
    )
    w_in = (
        Window.partitionBy(bk)
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = bucketed.withColumn(
        ioff, F.coalesce(F.sum(val).over(w_in), F.lit(0)).cast("long")
    )
    totals = bucketed.groupBy(bk).agg(F.sum(val).alias(bn))
    base = _exclusive_cumsum(totals, bk, bn, boff, prefix_lens[1:]).select(
        bk, boff
    )
    # join key == the within-window partition key, so the big side's
    # exchange is reused; AQE broadcasts the (tiny) bucket side.
    return (
        within.join(base, bk)
        .withColumn(out, (F.col(boff) + F.col(ioff)).cast("long"))
        .drop(bk, ioff, boff)
    )


def conv_offsets(
    transcripts: DataFrame,
    prefix_lens: tuple[int, ...] = OFFSET_PREFIX_LENS,
) -> DataFrame:
    """(conv_id, _n, _conv_offset): per-conversation turn counts and the
    exclusive cumulative doc_id offset in conv_id order — the first pass
    of the deterministic id scheme. Runs over the CONVERSATION dictionary
    (|convs| ≈ |turns|/7) with prefix-bucketed windows, so no level moves
    more than one bucket of rows to a single task (see module docstring)."""
    conv_sizes = transcripts.groupBy("conv_id").agg(F.count("*").alias("_n"))
    return _exclusive_cumsum(
        conv_sizes, "conv_id", "_n", "_conv_offset", prefix_lens
    ).select("conv_id", "_n", "_conv_offset")


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


def build_docs(
    transcripts: DataFrame,
    with_lemmas: bool = False,
    positional: bool = False,
) -> DataFrame:
    """Full docs table (FIXTURES.md §2). ``with_lemmas=True`` keeps the
    tokenized ``lemma_counts`` column (array<struct<lemma,tf>>) so the
    index build tokenizes exactly once AND needs no tf shuffle (counting
    happens inside the UDF — see functions/udfs.py). ``positional=True``
    additionally carries per-lemma analyzed-stream positions (phrase
    queries) — opt-in, the default path pays zero bytes for it.

    Per-row invariant (input_hint): text carried through untouched; doc_id
    strictly increasing in (conv_id, turn_idx) order. ``doc_len`` is the
    indexed-token count = Σ tf (pinned: post-stopword; oracle twin
    ``doc_length``).
    """
    return enrich_docs(assign_doc_ids(transcripts), with_lemmas, positional)


def enrich_docs(
    docs_with_ids: DataFrame,
    with_lemmas: bool = False,
    positional: bool = False,
) -> DataFrame:
    """scope + tokenization + doc_len over a frame that already has
    doc_id (shared by the single-pass build and the bucketed job)."""
    d = with_scope(docs_with_ids)
    if positional:
        from search_engine_spark.functions.udfs import (
            tokenize_lemmatize_positions,
        )

        d = d.withColumn(
            "lemma_counts", tokenize_lemmatize_positions(F.col("text"))
        )
    else:
        d = d.withColumn(
            "lemma_counts", tokenize_lemmatize_counts(F.col("text"))
        )
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
