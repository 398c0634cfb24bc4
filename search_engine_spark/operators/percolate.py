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
) -> list[tuple[int, frozenset, tuple, frozenset]]:
    """``(query_id, "a (b | c) -d")`` → ``(query_id, required, groups,
    excluded)`` under the pinned tokenizer: plain atoms are required
    (AND), a parenthesized group matches when ≥1 of its tokens is
    present (OR — the engine's bool-tree conjunct-of-disjunctions
    mirrored), ``-tok`` excludes. Raises on duplicate ids, on queries
    with neither a required atom nor a group (exclusion-only would
    match almost everything), on empty groups, and on negated groups
    (not supported — negate tokens individually)."""
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
        groups: list[frozenset] = []
        for body in re.findall(r"\(([^)]*)\)", q):
            g = frozenset(_TOKEN_RE.findall(body.lower()))
            if not g:
                raise ValueError(f"query {qid!r} has an empty group: {q!r}")
            groups.append(g)
        rest = re.sub(r"\([^)]*\)", " ", q)
        req: set[str] = set()
        exc: set[str] = set()
        for atom in rest.split():
            neg = atom.startswith("-")
            toks = _TOKEN_RE.findall(atom.lower())
            (exc if neg else req).update(toks)
        if not req and not groups:
            raise ValueError(f"query {qid!r} has no required token: {q!r}")
        out.append((
            qid, frozenset(req),
            tuple(sorted(groups, key=sorted)), frozenset(exc),
        ))
    return out


def percolate(
    docs: DataFrame,
    queries: Sequence[tuple[int, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All ``(doc_id, query_id)`` pairs where the stored query matches
    the document. Works identically on batch and streaming inputs (the
    kernel is a stateless narrow map)."""
    compiled = compile_queries(queries)
    # registration index: a query with a plain required atom files under
    # its smallest one (a doc lacking it cannot match); a groups-only
    # query files under EVERY token of its first group — any match holds
    # ≥1 of them, so candidates per doc stay the union over its PRESENT
    # tokens — O(candidates), not O(|Q|)
    index: dict[str, list[int]] = {}
    for i, (_qid, req, groups, _exc) in enumerate(compiled):
        for t in ([min(req)] if req else sorted(groups[0])):
            index.setdefault(t, []).append(i)
    id_field = docs.schema[id_col]

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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
                for i in cand:
                    qid, req, groups, exc = compiled[i]
                    if (
                        req <= toks
                        and all(g & toks for g in groups)
                        and not (exc & toks)
                    ):
                        ids_out.append(doc_id)
                        qids_out.append(qid)
            yield pd.DataFrame({id_col: ids_out, "query_id": qids_out})

    schema = T.StructType(
        [id_field, T.StructField("query_id", T.LongType())]
    )
    return docs.select(id_col, text_col).mapInPandas(kernel, schema=schema)


def percolate_oracle_sql(
    table_expr: str,
    queries: Sequence[tuple[int, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of ``percolate`` (same tokenizer, same AND+NOT
    semantics), generated from the SAME compiled query set so the two
    sides cannot drift."""
    def lit(toks) -> str:
        items = ", ".join(f"'{t}'" for t in sorted(toks))
        return f"[{items}]::VARCHAR[]"

    def glit(groups: tuple) -> str:
        items = ", ".join(lit(g) for g in groups)
        return f"[{items}]::VARCHAR[][]"

    rows = ",\n            ".join(
        f"({qid}, {lit(req)}, {glit(groups)}, {lit(exc)})"
        for qid, req, groups, exc in compile_queries(queries)
    )
    return f"""
        WITH d AS (
            SELECT {id_col},
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
    """
