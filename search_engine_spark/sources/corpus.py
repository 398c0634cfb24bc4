"""Deterministic synthetic transcript corpus (FIXTURES.md §1 recipe).

One row per conversation turn: (conv_id, turn_idx, role, text, tool, ts).
Seeded numpy generation, rows emitted sorted by (conv_id, turn_idx); the
same (n_convs, seed) always yields byte-identical tables. No external data.

Vocabulary: 20k synthetic words with Zipf(s=1.1) frequencies, built from
syllables so the suffix-stripping lemmatizer has real work; sprinkled
stop-particles, digits, punctuation, ё-variant Russian words, and a hot
term ("pipeline") present in ~60% of turns (skew/cutoff tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

VOCAB_SIZE = 20_000
HOT_TERM = "pipeline"
HOT_TERM_TURN_PROB = 0.60
_EPOCH = np.datetime64("2025-01-01T00:00:00")

_SYLLABLES = [
    "ba", "ce", "di", "fo", "gu", "ha", "je", "ki", "lo", "mu",
    "na", "pe", "ri", "so", "tu", "va", "we", "xi", "yo", "zu",
]
_EN_SUFFIX = ["", "", "", "s", "ed", "ing", "er", "ly"]
_RU_WORDS = [
    "ежик", "ёжик", "зелёный", "зеленый", "привет", "быстро",
    "огонёк", "огонек", "работать", "работает", "ошибка", "ошибки",
]
_PARTICLES = ["the", "a", "of", "to", "and", "in", "и", "в", "не", "на"]
_PUNCT = ["", "", "", ".", ",", "!", "?", ";"]
_TOOLS = np.array(["bash", "search", "browser", "editor"])


def _build_vocab(rng: np.random.Generator) -> np.ndarray:
    """VOCAB_SIZE deterministic pronounceable words."""
    n_syl = len(_SYLLABLES)
    words = []
    for i in range(VOCAB_SIZE):
        w, j = [], i
        for _ in range(3):
            w.append(_SYLLABLES[j % n_syl])
            j //= n_syl
        base = "".join(w)
        words.append(base + _EN_SUFFIX[i % len(_EN_SUFFIX)])
    return np.array(words)


def _zipf_probs(n: int, s: float = 1.1) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** (-s)
    return p / p.sum()


def generate_transcripts(n_convs: int, seed: int = 42) -> pd.DataFrame:
    """FIXTURES.md scales: tiny=50 convs, small=2000, bench=200000."""
    rng = np.random.default_rng(seed)
    vocab = _build_vocab(rng)
    probs = _zipf_probs(VOCAB_SIZE)

    conv_lens = 1 + rng.poisson(6.0, size=n_convs)
    np.minimum(conv_lens, 40, out=conv_lens)
    n_turns = int(conv_lens.sum())

    conv_idx = np.repeat(np.arange(n_convs), conv_lens)
    turn_idx = np.concatenate([np.arange(c) for c in conv_lens]).astype(np.int32)

    n_words = rng.integers(5, 121, size=n_turns)
    total_words = int(n_words.sum())
    flat = rng.choice(VOCAB_SIZE, size=total_words, p=probs)
    word_arr = vocab[flat]

    # sprinkle particles (8%), digits (2%), ё-variant Russian (2%)
    r = rng.random(total_words)
    part_mask = r < 0.08
    word_arr[part_mask] = rng.choice(_PARTICLES, size=int(part_mask.sum()))
    dig_mask = (r >= 0.08) & (r < 0.10)
    word_arr[dig_mask] = rng.integers(0, 10_000, size=int(dig_mask.sum())).astype(str)
    ru_mask = (r >= 0.10) & (r < 0.12)
    word_arr[ru_mask] = rng.choice(_RU_WORDS, size=int(ru_mask.sum()))

    punct = rng.choice(_PUNCT, size=total_words)
    word_arr = np.char.add(word_arr.astype("U24"), punct.astype("U1"))

    bounds = np.zeros(n_turns + 1, dtype=np.int64)
    np.cumsum(n_words, out=bounds[1:])
    hot = rng.random(n_turns) < HOT_TERM_TURN_PROB
    # plain-list slicing + str.join is ~10x faster than numpy-array joins
    words = word_arr.tolist()
    hot_prefix = HOT_TERM + " "
    texts = [
        (hot_prefix if hot[t] else "") + " ".join(words[bounds[t]:bounds[t + 1]])
        for t in range(n_turns)
    ]

    role = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    tool_mask = rng.random(n_turns) < 0.10
    role[tool_mask] = "tool"
    tool = np.full(n_turns, None, dtype=object)
    tool[tool_mask] = rng.choice(_TOOLS, size=int(tool_mask.sum()))

    gaps = rng.integers(1, 91, size=n_turns).astype("timedelta64[s]")
    conv_start = _EPOCH + conv_idx.astype("timedelta64[h]")
    # cumulative within-conversation offsets
    csum = np.cumsum(gaps)
    conv_first = np.zeros(n_turns, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(conv_lens)[:-1]))
    base = np.repeat(csum[starts] - gaps[starts], conv_lens)
    ts = conv_start + (csum - base)

    df = pd.DataFrame(
        {
            "conv_id": np.char.add("conv-", np.char.zfill(conv_idx.astype(str), 8)),
            "turn_idx": turn_idx,
            "role": role,
            "text": texts,
            "tool": tool,
            "ts": ts.astype("datetime64[us]"),
        }
    )
    return df.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)


def write_transcripts_parquet(path: str, n_convs: int, seed: int = 42) -> int:
    """Write the corpus as a deterministic parquet file; returns rows.

    Small row groups (16k rows) keep the file SPLITTABLE — a single
    pandas-default row group would make Spark's initial scan effectively
    one task regardless of requested partitions."""
    df = generate_transcripts(n_convs, seed)
    df.to_parquet(path, index=False, row_group_size=16_384)
    return len(df)
