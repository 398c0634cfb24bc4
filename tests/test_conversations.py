"""Conversation-suite unit pins (operators/conversations.py) plus the
substring-dedup operator (operators/dedup.py duplicate_spans) — hand
computed expectations on tiny handcrafted transcripts; the contract
twins (conv_stats / conv_context / conv_samples / tool_transitions /
dup_spans) cover the sf0.01 cross-engine compare."""

from __future__ import annotations

import pytest

from search_engine_spark.operators.conversations import (
    assemble_samples,
    context_windows,
    conversation_stats,
    tool_transitions,
)
from search_engine_spark.operators.dedup import duplicate_spans

ROWS = [
    # conv a: user/assistant alternation, one tool call chain
    ("a", 0, "user", "hello there", None),
    ("a", 1, "assistant", "hi how can I help", None),
    ("a", 2, "user", "run the numbers", None),
    ("a", 3, "assistant", "calling tool", "python"),
    ("a", 4, "assistant", "searching now", "search"),
    ("a", 5, "assistant", "done: the answer is 42", "python"),
    # conv b: single turn, no context possible
    ("b", 0, "assistant", "standalone reply", None),
    # conv c: empty text turn
    ("c", 0, "user", "", None),
    ("c", 1, "assistant", "ok", None),
]


@pytest.fixture(scope="module")
def tr(spark):
    return spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, role string, text string, tool string"
    )


def test_conversation_stats(tr):
    rows = {r["conv_id"]: r for r in conversation_stats(tr).collect()}
    a = rows["a"]
    assert a["n_turns"] == 6
    assert a["n_user"] == 2
    assert a["n_assistant"] == 4
    assert a["n_tool_calls"] == 3
    assert a["n_tools"] == 2  # distinct: python, search
    # tokens: 2 + 5 + 3 + 2 + 2 + 5 = 19
    assert a["n_tokens"] == 19
    assert a["avg_turn_tokens"] == round(19 / 6, 6)
    c = rows["c"]
    assert c["n_tokens"] == 1 and c["n_tool_calls"] == 0 and c["n_tools"] == 0


def test_context_windows(tr):
    out = {
        (r["conv_id"], r["turn_idx"]): r
        for r in context_windows(tr, n_prev=2).collect()
    }
    # assistant turns with >=1 predecessor: a1, a3, a4, a5, c1
    assert set(out) == {("a", 1), ("a", 3), ("a", 4), ("a", 5), ("c", 1)}
    assert out[("a", 1)]["context"] == "user: hello there"
    assert out[("a", 1)]["target"] == "hi how can I help"
    # window is the previous TWO turns, in turn order
    assert out[("a", 4)]["context"] == (
        "user: run the numbers\nassistant: calling tool"
    )
    # b0 has no predecessor -> absent; c1's context includes empty text
    assert out[("c", 1)]["context"] == "user: "


def test_assemble_samples_segments_and_order(tr):
    # budget 8: conv a turn tokens [2,5,3,2,2,5], cum-before [0,2,7,10,12,14]
    # -> segs [0,0,0,1,1,1]
    out = {
        (r["conv_id"], r["seg"]): r
        for r in assemble_samples(tr, budget=8).collect()
    }
    a0, a1 = out[("a", 0)], out[("a", 1)]
    assert a0["n_turns"] == 3 and a0["n_tokens"] == 10
    assert a0["sample"] == (
        "user: hello there\nassistant: hi how can I help\n"
        "user: run the numbers"
    )
    assert a1["n_turns"] == 3 and a1["n_tokens"] == 9
    assert a1["sample"].startswith("assistant: calling tool\n")
    # a turn longer than the budget still lands in exactly one segment
    big = tr.sparkSession.createDataFrame(
        [("z", 0, "user", "w " * 40, None), ("z", 1, "assistant", "ok", None)],
        tr.schema,
    )
    zz = {r["seg"]: r for r in assemble_samples(big, budget=8).collect()}
    assert zz[0]["n_turns"] == 1 and zz[0]["n_tokens"] == 40
    assert zz[5]["n_turns"] == 1  # next turn starts at offset 40 -> seg 5


def test_tool_transitions(tr):
    out = {
        (r["from_tool"], r["to_tool"]): r["n"]
        for r in tool_transitions(tr).collect()
    }
    assert out == {("python", "search"): 1, ("search", "python"): 1}


def test_duplicate_spans(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"{shared} one two three"),
            (2, f"zero {shared} four"),
            (3, "totally different text with eight sober tokens here"),
            # within-doc repeat only -> not duplicated (min_docs=2)
            (4, f"{shared.replace('alpha', 'ALPHA')}"),  # same after lower()
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in duplicate_spans(docs, width=8).collect()}
    # doc 1: 11 tokens -> 4 grams; grams starting at 0 only matches others
    assert out[1]["n_grams"] == 4 and out[1]["dup_grams"] == 1
    assert out[1]["dup_ratio"] == 0.25
    # doc 2: 10 tokens -> 3 grams; the shared gram starts at pos 1
    assert out[2]["n_grams"] == 3 and out[2]["dup_grams"] == 1
    # doc 3: unique
    assert out[3]["dup_grams"] == 0 and out[3]["dup_ratio"] == 0.0
    # doc 4: exactly the shared 8 tokens (case-folded) -> its 1 gram dup
    assert out[4]["n_grams"] == 1 and out[4]["dup_grams"] == 1
    # a doc below width tokens is excluded entirely
    short = spark.createDataFrame(
        [(9, "only four tokens here")], "doc_id long, text string"
    )
    assert duplicate_spans(short, width=8).count() == 0
