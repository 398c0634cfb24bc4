"""Percolator: reverse search — match STORED queries against incoming
documents (the Elasticsearch percolate / Lucene Monitor alerting
primitive, public prior art; the reference engine has no analog — this
extends it with the saved-search / alerting feature a serving stack
needs).

Semantics (pinned, shared with the DuckDB twin ``percolate_oracle_sql``):
- tokenization = the contract's document tokenizer: ``[a-z0-9]+`` over
  ``lower(text)`` (TOKS_SQL twin), distinct tokens per doc;
- a stored query is a whitespace-separated token list; a ``-tok`` atom
  is an exclusion. Match = every required token present AND no excluded
  token present (AND + NOT — the engine's conjunctive search mirrored);
- a query with no required atoms raises (an exclusion-only query would
  match almost everything — reject it loudly, like the search path's
  empty-query guard).

Scale shape: queries are the SMALL side (saved alerts — thousands), docs
are the stream/corpus (unbounded). The compiled query set broadcasts as
a plain Python constant inside one ``mapInPandas`` closure; per Arrow
batch, each query is looked up through an inverted token→queries index
keyed on each query's lexicographically-smallest required token (a doc
can only match a query if it contains that token), so per-doc work is
O(|candidate queries|) not O(|all queries|). No shuffle at all — the
operator is a narrow map, which also makes it directly usable on a
STREAMING DataFrame (stateless mapInPandas is stream-compatible; see
tests/test_percolate.py for the availableNow micro-batch twin).
"""

from __future__ import annotations

import re
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def compile_queries(
    queries: Sequence[tuple[int, str]],
) -> list[tuple[int, frozenset, tuple, frozenset, tuple]]:
    """``(query_id, '"a b"~1 (b | c) -d')`` → ``(query_id, required,
    groups, excluded, phrases)`` under the pinned tokenizer: plain
    atoms are required (AND), a parenthesized group matches when ≥1 of
    its tokens is present (OR — the engine's bool-tree conjunct-of-
    disjunctions mirrored), ``-tok`` excludes, and a double-quoted
    phrase (optional ``~slop``) requires the ORDERED token sequence
    with ≤ slop extra tokens between consecutive terms — verified by
    the engine's pinned reachability sweep (oracle.phrase_match_doc,
    round 4). Phrase tokens fold into ``required`` (a match must
    contain them all — the same cheap set prefilter), the sequence
    constraint rides in ``phrases`` as ((tok, ...), slop) tuples with
    order and duplicates KEPT. Raises on duplicate ids, on queries
    with no required content (exclusion-only would match almost
    everything), on empty groups/phrases, and on negated groups or
    phrases (not supported — negate tokens individually)."""
    seen: set[int] = set()
    out = []
    for qid, q in queries:
        if qid in seen:
            raise ValueError(f"duplicate query_id {qid}")
        seen.add(qid)
        if re.search(r"-\s*\(", q):
            raise ValueError(
                f"query {qid!r}: negated groups are not supported: {q!r}"
            )
        if re.search(r'-\s*"', q):
            raise ValueError(
                f"query {qid!r}: negated phrases are not supported: {q!r}"
            )
        phrases: list[tuple[tuple, int]] = []

        def _grab_phrase(mo: re.Match) -> str:
            toks = tuple(_TOKEN_RE.findall(mo.group(1).lower()))
            if not toks:
                raise ValueError(
                    f"query {qid!r} has an empty phrase: {q!r}"
                )
            phrases.append((toks, int(mo.group(2) or 0)))
            return " "

        rest = re.sub(r'"([^"]*)"\s*(?:~(\d+))?', _grab_phrase, q)
        groups: list[frozenset] = []
        for body in re.findall(r"\(([^)]*)\)", rest):
            g = frozenset(_TOKEN_RE.findall(body.lower()))
            if not g:
                raise ValueError(f"query {qid!r} has an empty group: {q!r}")
            groups.append(g)
        rest = re.sub(r"\([^)]*\)", " ", rest)
        req: set[str] = set()
        exc: set[str] = set()
        for atom in rest.split():
            neg = atom.startswith("-")
            toks = _TOKEN_RE.findall(atom.lower())
            (exc if neg else req).update(toks)
        for toks, _slop in phrases:
            req.update(toks)
        if not req and not groups:
            raise ValueError(f"query {qid!r} has no required token: {q!r}")
        out.append((
            qid, frozenset(req),
            tuple(sorted(groups, key=sorted)), frozenset(exc),
            tuple(sorted(phrases)),
        ))
    return out


def _registration_index(compiled) -> dict[str, list[int]]:
    """Token → candidate-query index: a query with a plain required atom
    files under its smallest one (a doc lacking it cannot match; phrase
    tokens are folded into required, so phrase queries file there too);
    a groups-only query files under EVERY token of its first group —
    any match holds ≥1 of them, so candidates per doc stay the union
    over its PRESENT tokens — O(candidates), not O(|Q|)."""
    index: dict[str, list[int]] = {}
    for i, (_qid, req, groups, _exc, _ph) in enumerate(compiled):
        for t in ([min(req)] if req else sorted(groups[0])):
            index.setdefault(t, []).append(i)
    return index


def _make_kernel(get_state, id_col: str, text_col: str):
    """The percolation ``mapInPandas`` kernel over a deferred
    (compiled, index) state: ``get_state`` resolves ONCE per task at
    kernel start — a plain closure constant for the ad-hoc
    ``percolate()``, a broadcast-variable read for ``AlertRegistry``
    (torrent-distributed once per executor per epoch instead of
    pickled into every task — the 10^6-alert shape)."""
    from oracle.oracle import phrase_match_doc

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        compiled, index = get_state()
        for pdf in it:
            if pdf.empty:
                continue
            ids_out: list = []
            qids_out: list[int] = []
            texts = pdf[text_col].astype(str).str.lower()
            for doc_id, toks_l in zip(
                pdf[id_col].tolist(),
                texts.str.findall(_TOKEN_RE).tolist(),
            ):
                toks = set(toks_l)
                cand: set[int] = set()
                for t in toks:
                    cand.update(index.get(t, ()))
                # token→positions map, built once per doc and only when
                # a candidate carries a phrase constraint
                pos_map: dict | None = None
                for i in cand:
                    qid, req, groups, exc, phrases = compiled[i]
                    if not (
                        req <= toks
                        and all(g & toks for g in groups)
                        and not (exc & toks)
                    ):
                        continue
                    if phrases:
                        if pos_map is None:
                            pos_map = {}
                            for pi, t in enumerate(toks_l):
                                pos_map.setdefault(t, []).append(pi)
                        if not all(
                            phrase_match_doc(
                                [pos_map.get(t, []) for t in ph], slop
                            )
                            for ph, slop in phrases
                        ):
                            continue
                    ids_out.append(doc_id)
                    qids_out.append(qid)
            yield pd.DataFrame({id_col: ids_out, "query_id": qids_out})

    return kernel


def _percolate_with_state(
    docs: DataFrame, get_state, id_col: str, text_col: str
) -> DataFrame:
    schema = T.StructType(
        [docs.schema[id_col], T.StructField("query_id", T.LongType())]
    )
    return docs.select(id_col, text_col).mapInPandas(
        _make_kernel(get_state, id_col, text_col), schema=schema
    )


def percolate(
    docs: DataFrame,
    queries: Sequence[tuple[int, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All ``(doc_id, query_id)`` pairs where the stored query matches
    the document. Works identically on batch and streaming inputs (the
    kernel is a stateless narrow map). The query set is captured as a
    closure constant — right for ad-hoc/thousands-scale alert sets;
    for large or refreshable registries use ``AlertRegistry``."""
    compiled = compile_queries(queries)
    index = _registration_index(compiled)
    return _percolate_with_state(
        docs, lambda: (compiled, index), id_col, text_col
    )


class AlertRegistry:
    """Epoch-refreshable alert set for STREAMING percolation at scale.

    Two problems with the closure-constant shape at registry scale:
    a 10^6-alert compiled set pickles into every task (vs once per
    executor), and a running ``writeStream`` freezes its closure at
    start — alerts added later never match. This registry fixes both:

    - the compiled set + registration index live in a Spark BROADCAST
      variable (torrent distribution, one copy per executor);
    - ``refresh(queries)`` swaps in a NEW broadcast and bumps the
      epoch; the old broadcast is unpersisted (never destroyed — an
      in-flight batch that still holds the handle can refetch);
    - ``attach(stream, sink)`` wires percolation through
      ``foreachBatch``, whose function body runs DRIVER-side per
      micro-batch — so each batch re-reads ``self._bc`` and picks up
      the newest epoch: the rebuild-closure-per-epoch pattern.

    Batch use works too (``registry.percolate(df)``)."""

    def __init__(
        self,
        spark,
        queries: Sequence[tuple[int, str]],
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        self.spark = spark
        self.id_col = id_col
        self.text_col = text_col
        self.epoch = 0
        self._bc = None
        self.n_queries = 0
        self.refresh(queries)

    def refresh(self, queries: Sequence[tuple[int, str]]) -> int:
        """Replace the alert set; returns the new epoch. Compile errors
        raise BEFORE the swap, so a bad registry update never takes
        down a running stream."""
        compiled = compile_queries(queries)
        index = _registration_index(compiled)
        new = self.spark.sparkContext.broadcast((compiled, index))
        old, self._bc = self._bc, new
        self.epoch += 1
        self.n_queries = len(compiled)
        if old is not None:
            old.unpersist()  # executors drop cached copies; the driver
            # value survives, so a straggler batch can still refetch
        return self.epoch

    def percolate(self, docs: DataFrame) -> DataFrame:
        """Match ``docs`` against the CURRENT epoch's alert set. The
        kernel closure carries only the broadcast handle; the compiled
        set resolves executor-side."""
        bc = self._bc
        return _percolate_with_state(
            docs, lambda: bc.value, self.id_col, self.text_col
        )

    def attach(self, stream_docs: DataFrame, sink):
        """``foreachBatch`` wiring for a refreshable stream:
        ``sink(matches_df, batch_id, epoch)`` is called per micro-batch
        with the matches of the batch under the epoch CURRENT at batch
        time. Returns the ``DataStreamWriter`` (caller configures
        checkpointing and ``.start()``)."""

        def process(batch_df, batch_id):
            sink(self.percolate(batch_df), batch_id, self.epoch)

        return stream_docs.writeStream.foreachBatch(process)


def alert_rates(
    matches: DataFrame,
    ts_col: str | None = None,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-alert match-rate metrics over a percolation output — the
    monitoring half of an alerting stack. Without ``ts_col``: total
    matches per query (batch roll-up). With ``ts_col``: tumbling-window
    counts per query — on a STREAMING matches frame the watermark
    bounds state and finalizes windows under late data (the
    streaming/trending.py recipe); on a batch frame the same expression
    computes the identical windows (watermark skipped — it is a
    streaming-only hint)."""
    from pyspark.sql import functions as F

    if ts_col is None:
        return matches.groupBy("query_id").agg(
            F.count("*").alias("n_matches")
        )
    src = (
        matches.withWatermark(ts_col, watermark)
        if matches.isStreaming else matches
    )
    return (
        src.groupBy(F.window(ts_col, window).alias("w"), "query_id")
        .agg(F.count("*").alias("n_matches"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "query_id", "n_matches",
        )
    )


def percolate_oracle_sql(
    table_expr: str,
    queries: Sequence[tuple[int, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of ``percolate`` (same tokenizer, same AND + OR-group
    + NOT + phrase semantics), generated from the SAME compiled query
    set so the two sides cannot drift. A phrase constraint compiles to
    nested EXISTS list-comprehensions over the ORDERED token sequence —
    ∃ a position chain with each step in [prev+1, prev+1+slop] — the
    declarative statement of exactly the predicate the engine's
    reachability sweep (oracle.phrase_match_doc) decides."""
    def lit(toks) -> str:
        items = ", ".join(f"'{t}'" for t in sorted(toks))
        return f"[{items}]::VARCHAR[]"

    def glit(groups: tuple) -> str:
        items = ", ".join(lit(g) for g in groups)
        return f"[{items}]::VARCHAR[][]"

    def phrase_pred(ph: tuple, slop: int) -> str:
        # innermost-out nested exists; 1-based DuckDB list indexing
        def nested(j: int, prev: str) -> str:
            t = ph[j]
            if j == 0:
                rng = "range(1, len(d.seq) + 1)"
            else:
                rng = (
                    f"range({prev} + 1, "
                    f"least({prev} + 1 + {slop}, len(d.seq)) + 1)"
                )
            var = f"i{j}"
            inner = (
                nested(j + 1, var) if j + 1 < len(ph) else "TRUE"
            )
            return (
                f"len([{var} for {var} in {rng} "
                f"if d.seq[{var}] = '{t}' AND {inner}]) > 0"
            )

        return nested(0, "")

    compiled = compile_queries(queries)
    rows = ",\n            ".join(
        f"({qid}, {lit(req)}, {glit(groups)}, {lit(exc)})"
        for qid, req, groups, exc, _ph in compiled
    )
    ph_cases = [
        f"WHEN {qid} THEN ({' AND '.join(phrase_pred(p, s) for p, s in phrases)})"
        for qid, _req, _g, _e, phrases in compiled
        if phrases
    ]
    ph_clause = (
        "AND (CASE q.query_id {} ELSE TRUE END)".format(" ".join(ph_cases))
        if ph_cases
        else ""
    )
    return f"""
        WITH d AS (
            SELECT {id_col},
                   regexp_extract_all(
                       lower({text_col}), '[a-z0-9]+', 0) AS seq,
                   list_distinct(regexp_extract_all(
                       lower({text_col}), '[a-z0-9]+', 0)) AS toks
            FROM {table_expr}
        ),
        q(query_id, req, grps, exc) AS (VALUES
            {rows}
        )
        SELECT d.{id_col}, q.query_id::BIGINT AS query_id
        FROM d CROSS JOIN q
        WHERE list_has_all(d.toks, q.req)
          AND len(list_filter(q.grps, gl -> list_has_any(d.toks, gl)))
              = len(q.grps)
          AND NOT list_has_any(d.toks, q.exc)
          {ph_clause}
    """
