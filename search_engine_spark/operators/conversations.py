"""Conversation-level operators over the transcripts table.

The engine's input is multi-turn conversation / agent transcripts
(``conv_id, turn_idx, role, text, tool, ts`` — BASELINE.json
``input_hint``); everything else in the repo treats a TURN as the
document. These operators treat the CONVERSATION as the unit — the
shapes an LLM training pipeline needs when preparing dialogue data:

- ``conversation_stats``   — per-conversation rollup (turn/role/tool
  counts, token budget) for curation filters and mixing decisions.
- ``context_windows``      — (context, target) pairs: each assistant
  turn with its preceding ≤n turns rendered as the prompt context
  (next-turn-prediction / reward-model sample preparation).
- ``assemble_samples``     — fixed-token-budget segmentation of each
  conversation into training samples (the dialogue analog of
  ``curate.chunk_windows``: long conversations become several samples,
  split at turn boundaries).
- ``tool_transitions``     — corpus-wide tool-call bigram (transition)
  counts for agent-behavior analytics.

The reference engine has no conversation concept (its document is one
crawled page — services/WebParser.java:162-178); this suite extends it
for the transcripts payload, like operators/curate.py extends it for
training-data curation.

Pinned semantics (each operator's DuckDB twin computes the same):
- tokens = ``[^\\s]+`` runs of the RAW text (the ``chunk_windows`` /
  ``text.token_counts`` whitespace rule; empty text = 0 tokens);
- a turn renders as ``role || ': ' || text`` and turns join with a
  single ``\\n`` — always in ``turn_idx`` order;
- sample segmentation is OFFSET-based (``seg = (cum_before) div
  budget``), not greedy-reset, so the assignment is a pure prefix sum
  (the ``curate.pack_sequences`` rule applied within a conversation).

Scale shape: every operator is one partitioned window and/or one hash
aggregation keyed by ``conv_id`` — conversations are bounded (thousands
of turns at worst), so per-conversation windows never concentrate data,
and nothing here shuffles more than one row per turn. No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_WS_TOKS = "size(regexp_extract_all({col}, '[^\\\\s]+', 0))"

# one turn rendered for sample/context text — `role || ': ' || text`
# (concat propagates NULL text like the DuckDB twin's ||)
_FMT = "concat(role, ': ', text)"


def conversation_stats(tr: DataFrame) -> DataFrame:
    """Per-conversation rollup: (conv_id, n_turns, n_user, n_assistant,
    n_tool_calls, n_tools, n_tokens, avg_turn_tokens).

    ``n_tool_calls`` counts turns with a non-null ``tool``; ``n_tools``
    counts distinct non-null tools; ``avg_turn_tokens`` is
    round(n_tokens / n_turns, 6). One hash aggregation (map-side
    partials), narrow rows — the 100-TB shape."""
    return (
        tr.groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.sum((F.col("role") == "user").cast("long")).alias("n_user"),
            F.sum((F.col("role") == "assistant").cast("long")).alias(
                "n_assistant"
            ),
            F.count("tool").cast("long").alias("n_tool_calls"),
            F.countDistinct("tool").cast("long").alias("n_tools"),
            F.sum(F.expr(_WS_TOKS.format(col="text"))).cast("long").alias(
                "n_tokens"
            ),
        )
        .withColumn(
            "avg_turn_tokens",
            F.round(F.col("n_tokens") / F.col("n_turns"), 6),
        )
    )


def conversation_stats_oracle_sql(table: str = "transcripts") -> str:
    """DuckDB twin of ``conversation_stats``."""
    return f"""
        SELECT conv_id,
               count(*)::BIGINT AS n_turns,
               sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)::BIGINT
                   AS n_user,
               sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)::BIGINT
                   AS n_assistant,
               count(tool)::BIGINT AS n_tool_calls,
               count(DISTINCT tool)::BIGINT AS n_tools,
               sum(len(regexp_extract_all(text, '[^\\s]+')))::BIGINT
                   AS n_tokens,
               round(sum(len(regexp_extract_all(text, '[^\\s]+')))::DOUBLE
                     / count(*), 6) AS avg_turn_tokens
        FROM {table}
        GROUP BY conv_id
    """


def context_windows(
    tr: DataFrame, n_prev: int, target_role: str = "assistant"
) -> DataFrame:
    """(conv_id, turn_idx, context, target) pairs: for every turn whose
    ``role == target_role`` and which has at least one preceding turn,
    ``context`` = the previous ≤``n_prev`` turns rendered
    ``role: text`` and joined by newlines (turn order), ``target`` =
    the turn's own text — the next-turn-prediction / reward-model
    sample shape.

    One partitioned window per conversation (``collect_list`` over an
    ordered row frame is frame-order-deterministic because ``turn_idx``
    is unique); no shuffle beyond the window's conv_id partitioning."""
    if n_prev <= 0:
        raise ValueError("need n_prev > 0")
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-n_prev, -1)
    )
    ctx = F.array_join(F.collect_list(F.expr(_FMT)).over(w), "\n")
    return (
        tr.select(
            "conv_id",
            "turn_idx",
            "role",
            ctx.alias("context"),
            F.col("text").alias("target"),
        )
        .filter((F.col("role") == target_role) & (F.col("context") != ""))
        .select("conv_id", "turn_idx", "context", "target")
    )


def context_windows_oracle_sql(
    n_prev: int, target_role: str = "assistant", table: str = "transcripts"
) -> str:
    """DuckDB twin of ``context_windows`` (window list() respects the
    frame's ORDER BY, same as Spark's collect_list over the frame)."""
    return f"""
        WITH c AS (
            SELECT conv_id, turn_idx, role, text AS target,
                   array_to_string(
                       list(role || ': ' || text) OVER (
                           PARTITION BY conv_id ORDER BY turn_idx
                           ROWS BETWEEN {n_prev} PRECEDING
                                    AND 1 PRECEDING),
                       chr(10)) AS context
            FROM {table})
        SELECT conv_id, turn_idx, context, target
        FROM c WHERE role = '{target_role}' AND context <> ''
    """


def assemble_samples(tr: DataFrame, budget: int) -> DataFrame:
    """Segment each conversation into training samples of ~``budget``
    tokens, split at turn boundaries: turn i belongs to segment
    ``(tokens of turns before i within the conv) div budget`` — the
    offset-based ``curate.pack_sequences`` rule applied per
    conversation, so a turn longer than the budget still lands in
    exactly one segment and the assignment is a pure prefix sum.
    Returns (conv_id, seg, n_turns, n_tokens, sample) where ``sample``
    is the segment's turns rendered ``role: text`` joined by newlines
    in turn order.

    Scale shape: the running token offset is a window cumsum
    PARTITIONED by conv_id (bounded groups — never the unpartitioned
    cumsum operators/docs.py had to distribute), then one (conv, seg)
    hash agg; sample text is reassembled with
    ``array_sort(collect_list(struct(turn_idx, ...)))`` so the join
    order is pinned without an ordered shuffle."""
    if budget <= 0:
        raise ValueError("need budget > 0")
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tok = F.expr(_WS_TOKS.format(col="text")).cast("long")
    seg = tr.select(
        "conv_id",
        "turn_idx",
        tok.alias("_tok"),
        F.expr(_FMT).alias("_fmt"),
    ).withColumn(
        "seg",
        F.floor((F.sum("_tok").over(w) - F.col("_tok")) / budget).cast(
            "long"
        ),
    )
    return (
        seg.groupBy("conv_id", "seg")
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.sum("_tok").cast("long").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("turn_idx", "_fmt"))
                    ),
                    lambda s: s["_fmt"],
                ),
                "\n",
            ).alias("sample"),
        )
    )


def assemble_samples_oracle_sql(
    budget: int, table: str = "transcripts"
) -> str:
    """DuckDB twin of ``assemble_samples``."""
    return f"""
        WITH t AS (
            SELECT conv_id, turn_idx,
                   len(regexp_extract_all(text, '[^\\s]+'))::BIGINT AS tok,
                   role || ': ' || text AS fmt
            FROM {table}),
        s AS (
            SELECT conv_id, turn_idx, tok, fmt,
                   ((sum(tok) OVER (PARTITION BY conv_id ORDER BY turn_idx
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW) - tok)
                    // {budget})::BIGINT AS seg
            FROM t)
        SELECT conv_id, seg,
               count(*)::BIGINT AS n_turns,
               sum(tok)::BIGINT AS n_tokens,
               string_agg(fmt, chr(10) ORDER BY turn_idx) AS sample
        FROM s GROUP BY conv_id, seg
    """


def tool_transitions(tr: DataFrame) -> DataFrame:
    """Corpus-wide tool-call transition counts: for each conversation,
    the sequence of non-null ``tool`` values in turn order; adjacent
    pairs aggregate to (from_tool, to_tool, n). The agent-behavior
    analog of ``text.collocations`` (bigrams over the tool stream
    instead of the token stream).

    Scale shape: filter (scan-pushed ``tool IS NOT NULL``) → lag window
    partitioned by conv_id → one small hash agg keyed by the tool
    vocabulary (tiny domain — the agg output is |tools|² at worst)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    calls = tr.filter(F.col("tool").isNotNull()).select(
        "conv_id", "turn_idx", "tool"
    )
    return (
        calls.withColumn("from_tool", F.lag("tool").over(w))
        .filter(F.col("from_tool").isNotNull())
        .groupBy("from_tool", F.col("tool").alias("to_tool"))
        .agg(F.count("*").cast("long").alias("n"))
    )


def tool_transitions_oracle_sql(table: str = "transcripts") -> str:
    """DuckDB twin of ``tool_transitions``."""
    return f"""
        WITH calls AS (
            SELECT conv_id, turn_idx, tool FROM {table}
            WHERE tool IS NOT NULL),
        l AS (
            SELECT conv_id, tool AS to_tool,
                   lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                       AS from_tool
            FROM calls)
        SELECT from_tool, to_tool, count(*)::BIGINT AS n
        FROM l WHERE from_tool IS NOT NULL
        GROUP BY from_tool, to_tool
    """
