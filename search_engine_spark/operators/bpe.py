"""Distributed BPE tokenizer training (Sennrich et al. 2016, ACL —
"Neural Machine Translation of Rare Words with Subword Units") and
greedy merge-order segmentation.

The classic trainer never iterates over the corpus: ONE corpus pass
builds the (word, freq) table, and every merge iteration runs over that
vocabulary-sized table only — at 100 TB the corpus pass is a single
hash aggregation and each of the M iterations is a small cluster job
over ~10^7 distinct words, not 10^12 tokens.

Word representation pin (shared with the DuckDB contract twin): a word
is its symbols joined by TWO spaces, plus a final ``</w>`` end-of-word
symbol ("hello" → ``h  e  l  l  o  </w>``). Greedy left-to-right
non-overlapping pair merging is then ONE literal ``replace()`` per
iteration: with double separators and single-space padding, adjacent
matches never share a character (`` a  a  a  a `` → `` aa  aa ``), and
a pattern can never match inside a longer symbol because every symbol
is flanked by spaces. The replacement ``' L  R ' → ' LR '`` consumes
one flanking space per side and restores it, so the double-separator
invariant self-preserves; a trailing ``regexp_replace(' +' → '  ')``
normalization is kept as a belt-and-braces guard (it is a no-op when
the invariant holds). ``replace`` scans left-to-right non-overlapping
in Spark, DuckDB and Python alike — the three implementations agree
by construction.

Merge-pick pin: per iteration the winning pair is
``ORDER BY count DESC, pair ASC LIMIT 1`` — freq-weighted adjacent
pair counts (overlapping occurrences all count, per the reference
algorithm), lexicographic tiebreak. The pick is a 1-row collect per
iteration: the algorithm is sequential in its merges (each changes the
next iteration's pair counts), so M driver round-trips is the
irreducible control flow, not a scale smell — the heavy operand (the
pair aggregation) stays distributed.

Integer counts only — no float pins needed anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

END_WORD = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text",
                tokens_sql: str | None = None,
                top_v: int | None = None) -> DataFrame:
    """One corpus pass → (word, freq). ``tokens_sql`` defaults to the
    contract tokenizer (``[a-z0-9]+`` of lower); ``top_v`` keeps the
    top-V words by (freq DESC, word ASC) — the standard trainer bound
    (word-count truncation, as sentencepiece/subword-nmt do)."""
    toks = tokens_sql or f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
    wc = (
        docs.select(F.explode(F.expr(toks)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    if top_v is not None:
        # deterministic truncation; V rows → TakeOrderedAndProject
        wc = wc.orderBy(F.col("freq").desc(), F.col("word").asc()).limit(top_v)
    return wc


def _init_repr(words: DataFrame) -> DataFrame:
    """(word, freq) → + repr: double-space-joined chars + ``</w>``."""
    return words.withColumn(
        "repr",
        F.concat(
            F.trim(F.regexp_replace(F.col("word"), "(.)", "$1  ")),
            F.lit("  " + END_WORD),
        ),
    )


def _pair_counts(reprs: DataFrame) -> DataFrame:
    """Freq-weighted adjacent-pair counts over the repr table. Pure
    higher-order-function SQL — symbols split on the literal double
    separator, pairs joined by ONE space (symbols are space-free, so
    the single space is an unambiguous pair key)."""
    return (
        reprs.select(
            "freq",
            F.explode(
                # CASE guard: Spark's sequence(1, 0) counts DOWN
                # ([1, 0]) instead of yielding empty — a fully-merged
                # single-symbol word must produce no pairs
                F.expr(
                    "CASE WHEN size(split(repr, '  ')) < 2 THEN "
                    "array() ELSE "
                    "transform(sequence(1, size(split(repr, '  ')) - 1), "
                    "i -> concat(element_at(split(repr, '  '), i), ' ', "
                    "element_at(split(repr, '  '), i + 1))) END"
                )
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def merge_expr(col, pair: str):
    """The pinned greedy merge of ``pair`` ("L R") applied to a repr
    column: pad → literal replace of `` L  R `` with `` LR `` → collapse
    space runs back to the double separator → trim."""
    left, right = pair.split(" ")
    return F.trim(
        F.regexp_replace(
            F.replace(
                F.concat(F.lit(" "), col, F.lit(" ")),
                F.lit(f" {left}  {right} "),
                F.lit(f" {left}{right} "),
            ),
            " +",
            "  ",
        )
    )


def bpe_train(words: DataFrame, n_merges: int) -> list[tuple[str, int]]:
    """Learn ``n_merges`` BPE merges from a (word, freq) table.

    Returns ``[(pair, cnt), ...]`` in merge order — ``pair`` is
    ``"L R"``, ``cnt`` its freq-weighted count at pick time. The repr
    table is persisted per iteration (flat strings — safe per the
    array-column persist ban) and the previous epoch unpersisted, so
    iteration i never replays merges 1..i-1 from lineage."""
    cur = _init_repr(words).persist()
    cur.count()
    merges: list[tuple[str, int]] = []
    try:
        for _ in range(n_merges):
            top = (
                _pair_counts(cur)
                .orderBy(F.col("cnt").desc(), F.col("pair").asc())
                .limit(1)
                .collect()
            )
            if not top:
                break
            pair, cnt = top[0]["pair"], int(top[0]["cnt"])
            merges.append((pair, cnt))
            nxt = cur.withColumn("repr", merge_expr(F.col("repr"), pair))
            nxt = nxt.persist()
            nxt.count()
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return merges


def segment_words(words: DataFrame, merges: list[tuple[str, int]] | list[str]) -> DataFrame:
    """Apply learned merges in rank order to each distinct word —
    returns (word[, freq], tokens array<string>). Map-only: a chain of
    M literal replaces over the vocabulary-sized table; segmenting a
    corpus is then a broadcast join of this table onto exploded words
    (never re-run the merge chain per corpus row)."""
    out = _init_repr(words)
    expr = F.col("repr")
    for m in merges:
        pair = m[0] if isinstance(m, tuple) else m
        expr = merge_expr(expr, pair)
    return out.withColumn("tokens", F.split(expr, "  ")).drop("repr")


def segment_docs(docs: DataFrame, merges, key_cols: list[str],
                 text_col: str = "text",
                 tokens_sql: str | None = None) -> DataFrame:
    """Per-doc BPE token counts: tokenize → join each word's segment
    length from the broadcast segmented vocabulary → sum. Words absent
    from the vocabulary segment on the fly is NOT needed — the segment
    chain is applied to the doc's own distinct words, so coverage is
    total by construction."""
    toks = tokens_sql or f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
    exploded = docs.select(*key_cols, F.explode(F.expr(toks)).alias("word"))
    vocab = segment_words(
        exploded.select("word").distinct(), merges
    ).select("word", F.size("tokens").alias("_n"))
    return (
        exploded.join(F.broadcast(vocab), "word")
        .groupBy(*key_cols)
        .agg(F.sum("_n").cast("long").alias("n_bpe_tokens"))
    )
