"""Single-node oracle: the pinned source of truth for ranking fixtures.

A plain-Python/dict reference implementation of the whole engine —
docs build, inverted index, BM25 + legacy-reftf search — independent of
Spark (SURVEY.md §5 item 2). It shares exactly one module with the engine:
the pinned analyzer (``search_engine_spark.functions.analyze``) and the
pinned scoring math (``functions.scoring``), because rank-identity is
defined BY those pins.

Search semantics pinned from the reference (SearchServiceImpl.java):
- all query lemmas bind (missing → df=0)                   (:148-155)
- query dies iff the RAREST lemma's df > 5% of scope docs  (:156-163)
- conjunctive AND over ALL terms' posting sets             (:166-188)
- single-term: posting count must also pass the threshold  (:136-139)
- tiebreak (score desc, doc_id asc); offset/limit clamped  (:113-116, 359-364)
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field

import pandas as pd

from search_engine_spark import BM25_B, BM25_K1
from search_engine_spark.functions.analyze import analyze, query_lemmas
from search_engine_spark.functions.scoring import (
    bm25_idf,
    bm25_term_score,
    df_cutoff,
    query_killed_by_cutoff,
)

N_SCOPES = 4


def scope_of(conv_id: str) -> str:
    """Pinned scope derivation (FIXTURES.md §2): crc32 so Spark's native
    ``crc32`` reproduces it with no UDF."""
    return f"scope-{zlib.crc32(conv_id.encode('utf-8')) % N_SCOPES}"


@dataclass
class OracleIndex:
    docs: pd.DataFrame = field(default_factory=pd.DataFrame)  # doc_id-indexed
    postings: dict = field(default_factory=dict)   # lemma -> {doc_id: tf}
    lemma_df: dict = field(default_factory=dict)   # (scope, lemma) -> df
    lemma_cf: dict = field(default_factory=dict)   # (scope, lemma) -> cf
    scope_docs: dict = field(default_factory=dict)  # scope -> [doc_ids]
    doc_len: dict = field(default_factory=dict)     # doc_id -> len
    doc_scope: dict = field(default_factory=dict)   # doc_id -> scope
    # lemma -> {doc_id: [positions]} — position = index in the ANALYZED
    # (post-stopword) lemma stream, the pinned definition for phrases
    positions: dict = field(default_factory=dict)


def build_docs(transcripts: pd.DataFrame) -> pd.DataFrame:
    """transcripts → docs with dense 1-based doc_id over (conv_id, turn_idx)."""
    d = transcripts.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    d["doc_id"] = range(1, len(d) + 1)
    d["scope"] = [scope_of(c) for c in d["conv_id"]]
    d["doc_len"] = [len(analyze(t)) for t in d["text"]]
    return d[["doc_id", "conv_id", "turn_idx", "role", "tool", "ts", "scope", "text", "doc_len"]]


def build_index(transcripts: pd.DataFrame) -> OracleIndex:
    idx = OracleIndex()
    docs = build_docs(transcripts)
    idx.docs = docs.set_index("doc_id", drop=False)
    for row in docs.itertuples(index=False):
        doc_id, scope = row.doc_id, row.scope
        idx.doc_scope[doc_id] = scope
        idx.scope_docs.setdefault(scope, []).append(doc_id)
        lemmas = analyze(row.text)
        idx.doc_len[doc_id] = len(lemmas)
        counts: dict[str, int] = {}
        for pos, lem in enumerate(lemmas):
            counts[lem] = counts.get(lem, 0) + 1
            idx.positions.setdefault(lem, {}).setdefault(doc_id, []).append(pos)
        for lem, tf in counts.items():
            idx.postings.setdefault(lem, {})[doc_id] = tf
            idx.lemma_df[(scope, lem)] = idx.lemma_df.get((scope, lem), 0) + 1
            idx.lemma_cf[(scope, lem)] = idx.lemma_cf.get((scope, lem), 0) + tf
    return idx


def _scope_doc_ids(idx: OracleIndex, scope: str | None) -> list[int]:
    if scope is None:
        return sorted(idx.doc_len)
    return sorted(idx.scope_docs.get(scope, []))


def _df_of(idx: OracleIndex, lemma: str, scope: str | None) -> int:
    if scope is None:
        return sum(v for (s, l), v in idx.lemma_df.items() if l == lemma)
    return idx.lemma_df.get((scope, lemma), 0)


def _filter_doc_ids(idx: OracleIndex, filters: dict | None) -> set | None:
    """Doc ids passing an attribute-filter mapping {column: value-or-list}
    (AND across columns, OR within; NULL never matches), or None when no
    filters. The twin of the engine's filter-postings intersection."""
    if not filters:
        return None
    allowed: set[int] | None = None
    for col in sorted(filters):
        vals = filters[col]
        if col == "date":
            col_ids = _date_doc_ids(idx, vals)
        else:
            if isinstance(vals, str):
                vals = [vals]
            vals = set(vals)
            col_ids = {
                int(r.doc_id)
                for r in idx.docs.itertuples(index=False)
                if getattr(r, col) is not None and getattr(r, col) in vals
            }
        allowed = col_ids if allowed is None else (allowed & col_ids)
    return allowed


def _date_doc_ids(idx: OracleIndex, vals) -> set:
    """Doc ids whose UTC ts-day matches the "date" filter: a {"from",
    "to"} dict is the inclusive day range, a day string / list of day
    strings the exact days. NULL (NaT) ts never matches. Twin of the
    engine's date-family filter postings + ``date_cover`` expansion
    (operators/filters.py)."""
    if isinstance(vals, dict):
        lo, hi = str(vals["from"]), str(vals["to"])
        if lo > hi:
            raise ValueError(f"empty date range: {lo!r} > {hi!r}")
        return {
            int(r.doc_id)
            for r in idx.docs.itertuples(index=False)
            if r.ts is not None
            and not pd.isna(r.ts)
            and lo <= r.ts.strftime("%Y-%m-%d") <= hi
        }
    days = {vals} if isinstance(vals, str) else set(map(str, vals))
    return {
        int(r.doc_id)
        for r in idx.docs.itertuples(index=False)
        if r.ts is not None
        and not pd.isna(r.ts)
        and r.ts.strftime("%Y-%m-%d") in days
    }


def _page(
    ranked: list[tuple[int, float]], k: int, offset: int, after
) -> list[tuple[int, float]]:
    """Final cut over the full pinned-order ranking: the offset/limit
    page, or — when ``after=(score, doc_id)`` — the first k rows
    strictly AFTER the cursor in (score desc, doc_id asc) order.
    Cursor and offset are mutually exclusive; score equality in the
    tiebreak arm is exact (float64 scores are pinned bit-identical
    across oracle and engine)."""
    if after is not None:
        if offset:
            raise ValueError(
                "after=(score, doc_id) replaces offset pagination — "
                "pass offset=0 with a cursor"
            )
        s0, d0 = after
        tail = [
            (d, s) for d, s in ranked if s < s0 or (s == s0 and d > d0)
        ]
        return tail[:k]
    lo = max(0, min(offset, len(ranked)))
    hi = max(lo, min(offset + k, len(ranked)))
    return ranked[lo:hi]


def search(
    idx: OracleIndex,
    query: str,
    scope: str | None = None,
    k: int = 10,
    offset: int = 0,
    scorer: str = "bm25",
    combine: str = "and",
    exclude: list[str] | None = None,
    extra_terms: list[str] | None = None,
    filters: dict | None = None,
    after: tuple[float, int] | None = None,
) -> list[tuple[int, float]]:
    """Top-k (doc_id, float64 score), pinned semantics. Returns [] on any
    cutoff/no-match path.

    ``combine``: "and" = conjunction over all terms (the reference's only
    mode); "or" = disjunction with PER-TERM cutoff semantics — a term
    whose df exceeds the 5% cutoff is DROPPED (X2's purpose, applied
    per-term instead of killing the whole query), the rest union; a doc's
    score sums the scores of the terms it contains, still accumulated in
    lexicographic term order. "or" is bm25-only.

    ``exclude``: ANALYZED lemmas whose docs are removed from the
    candidate set BEFORE ranking/top-k (the ``-term`` query syntax —
    analyze.split_negations does the parsing). Pinned semantics:
    cutoff gates are computed from the POSITIVE terms only, before
    exclusion; excluded terms have no df cutoff (excluding a hot term
    is legitimate — nothing is scored); a lemma both positive and
    excluded → empty (exclusion wins); unknown excluded lemmas are
    no-ops.

    ``filters``: doc-attribute restriction {column: value-or-list} over
    the docs table (role/tool in the transcripts schema). Pinned
    semantics (operators/filters.py is the engine side): a doc survives
    iff for EVERY filtered column its value is one of the listed values
    (AND across columns, OR within a column); NULL attribute values
    never match; filters are NON-scoring — idf/avgdl/cutoff gates are
    computed from the positive terms as if unfiltered, and surviving
    docs keep their unfiltered scores; application point is after the
    gates, before the top-k cut (the same slot as ``exclude`` — the two
    compose).

    ``after``: (score, doc_id) cursor pagination — the k rows strictly
    after the cursor in the pinned order (see ``_page``); replaces
    ``offset``. Chaining pages via the last row of each page walks the
    full ranking exactly (the order is total, so cursor paging ≡ offset
    paging with no skipped or repeated rows).
    """
    terms = query_lemmas(query)  # sorted unique lemmas
    # extra_terms: PRE-ANALYZED lemmas (wildcard expansions) unioned in
    # verbatim — never re-analyzed (re-lemmatizing a lemma can strip it
    # again); the sorted union keeps accumulation order pinned
    terms = sorted(set(terms) | set(extra_terms or []))
    if not terms:
        return []
    excl = sorted(set(exclude or []))
    if excl and set(excl) & set(terms):
        return []
    excl_docs: set[int] = set()
    for e in excl:
        excl_docs |= idx.postings.get(e, {}).keys()
    allowed = _filter_doc_ids(idx, filters)
    scope_ids = _scope_doc_ids(idx, scope)
    n_docs = len(scope_ids)
    if n_docs == 0:
        return []
    dfs = [_df_of(idx, t, scope) for t in terms]
    scope_set = set(scope_ids)

    if combine == "or":
        if scorer != "bm25":
            raise ValueError("combine='or' supports scorer='bm25' only")
        cutoff = df_cutoff(n_docs)
        usable = [(t, df) for t, df in zip(terms, dfs) if df <= cutoff]
        if not usable:
            return []
        avg_len = sum(idx.doc_len[d] for d in scope_ids) / n_docs
        scores: dict[int, float] = {}
        for t, df in usable:  # lexicographic term order (pinned)
            idf = bm25_idf(df, n_docs)
            for d, tf in idx.postings.get(t, {}).items():
                if (
                    d in scope_set
                    and d not in excl_docs
                    and (allowed is None or d in allowed)
                ):
                    scores[d] = scores.get(d, 0.0) + bm25_term_score(
                        float(tf), float(idx.doc_len[d]), avg_len, idf,
                        BM25_K1, BM25_B,
                    )
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return _page(ranked, k, offset, after)
    if combine != "and":
        raise ValueError(f"unknown combine {combine!r}")

    if query_killed_by_cutoff(dfs, n_docs):
        return []

    matched: set[int] | None = None
    for t in terms:
        docs_t = {d for d in idx.postings.get(t, {}) if d in scope_set}
        matched = docs_t if matched is None else (matched & docs_t)
        if not matched:
            return []
    assert matched is not None
    if len(terms) == 1 and len(matched) > df_cutoff(n_docs):
        # single-term extra gate (SearchServiceImpl.java:136-139)
        return []
    if excl_docs:
        # exclusion AFTER the gates (gates see positive terms only)
        matched -= excl_docs
        if not matched:
            return []
    if allowed is not None:
        # attribute filters, same slot as exclusion (after gates,
        # before the top-k cut; scores of survivors stay unfiltered)
        matched &= allowed
        if not matched:
            return []

    avg_len = sum(idx.doc_len[d] for d in scope_ids) / n_docs
    scores: dict[int, float] = {}
    if scorer == "bm25":
        for t, df in zip(terms, dfs):  # lexicographic term order (pinned)
            idf = bm25_idf(df, n_docs)
            plist = idx.postings.get(t, {})
            for d in matched:
                scores[d] = scores.get(d, 0.0) + bm25_term_score(
                    float(plist[d]), float(idx.doc_len[d]), avg_len, idf,
                    BM25_K1, BM25_B,
                )
    elif scorer == "reftf":
        # absolute relevance = Σtf / max tf (SearchServiceImpl.java:335-357)
        for d in matched:
            tfs = [float(idx.postings[t][d]) for t in terms]
            scores[d] = sum(tfs) / max(tfs)
        mx = max(scores.values())
        if mx > 0:
            scores = {d: s / mx for d, s in scores.items()}
    else:
        raise ValueError(f"unknown scorer {scorer!r}")

    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return _page(ranked, k, offset, after)


def bool_search(
    idx: OracleIndex,
    query: str,
    scope: str | None = None,
    k: int = 10,
    offset: int = 0,
    filters: dict | None = None,
    after: tuple[float, int] | None = None,
    synonyms: dict | None = None,
) -> list[tuple[int, float]]:
    """Boolean query search (functions/boolquery.py syntax + pinned
    semantics — see its module docstring). Matching is set algebra over
    the AST within the scope; a pure-negative clause matches nothing.
    df cutoff drops positive lemmas PER-TERM (OR-mode style;
    prune_over_cutoff); negated subtrees are never cutoff-pruned.
    score(doc) = Σ bm25_term_score over the distinct positive lemmas of
    the pruned tree present in the doc, accumulated in lexicographic
    lemma order. ``filters``/``after`` compose exactly as in ``search``
    (non-scoring restriction after the gates; cursor replaces offset).
    ``synonyms`` ({lemma: synonym lemmas}, see compile_synonyms) expands
    positive term atoms to OR groups BEFORE the cutoff gate. Boost
    syntax (``a^2``, ``(...)^3`` — parse_bool_boosted) weights each
    lemma's partial as ``boosted_idf = weight * idf``, one pinned
    multiply; synonym lemmas inherit their source's boost.
    Twin: operators/wand.py ``bool_search_blocks``."""
    from search_engine_spark.functions.boolquery import (
        all_lemmas,
        expand_synonyms,
        expand_weights,
        parse_bool_boosted,
        positive_lemmas,
        prune_over_cutoff,
    )

    tree, weights = parse_bool_boosted(query)
    tree = expand_synonyms(tree, synonyms)
    weights = expand_weights(weights, synonyms)
    if tree is None:
        return []
    scope_ids = _scope_doc_ids(idx, scope)
    n_docs = len(scope_ids)
    if n_docs == 0:
        return []
    cutoff = df_cutoff(n_docs)
    over = {
        t for t in positive_lemmas(tree) if _df_of(idx, t, scope) > cutoff
    }
    tree = prune_over_cutoff(tree, over)
    if tree is None:
        return []
    scope_set = set(scope_ids)
    term_docs = {
        t: {d for d in idx.postings.get(t, {}) if d in scope_set}
        for t in all_lemmas(tree)
    }

    def ev(node) -> set:
        if node[0] == "term":
            return term_docs[node[1]]
        if node[0] == "or":
            s: set = set()
            for c in node[1]:
                s |= ev(c)
            return s
        pos, negs = node[1], node[2]
        if not pos:
            return set()  # pure-negative clause matches nothing
        parts = sorted((ev(c) for c in pos), key=len)
        s = set(parts[0])
        for p in parts[1:]:
            s &= p
            if not s:
                return s
        for nchild in negs:
            s -= ev(nchild)
            if not s:
                return s
        return s

    matched = ev(tree)
    allowed = _filter_doc_ids(idx, filters)
    if allowed is not None:
        matched &= allowed
    if not matched:
        return []
    avg_len = sum(idx.doc_len[d] for d in scope_ids) / n_docs
    scores: dict[int, float] = {}
    for t in positive_lemmas(tree):  # lexicographic order (pinned)
        idf = bm25_idf(_df_of(idx, t, scope), n_docs)
        if t in weights:
            idf = weights[t] * idf  # pinned single multiply
        plist = idx.postings.get(t, {})
        for d in matched:
            tf = plist.get(d)
            if tf is not None:
                scores[d] = scores.get(d, 0.0) + bm25_term_score(
                    float(tf), float(idx.doc_len[d]), avg_len, idf,
                    BM25_K1, BM25_B,
                )
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return _page(ranked, k, offset, after)


def phrase_match_doc(
    pos_lists: list[list[int]], slop: int = 0
) -> bool:
    """True iff the analyzed-position lists admit an ordered chain where
    each next term sits within [prev+1, prev+1+slop] (slop=0 = exact
    adjacency in the post-stopword lemma stream — the pinned phrase
    semantics).

    Forward REACHABILITY sweep, not greedy smallest-next: greedy is
    incomplete for slop >= 1 — [[0], [1, 2], [4]] with slop=1 admits the
    chain 0→2→4, but greedy commits to 1 and finds no continuation in
    [2, 3]. Each level keeps every position reachable from the previous
    level; both lists are ascending, so one two-pointer pass per level
    (O(total positions) overall)."""
    if not pos_lists or not pos_lists[0]:
        return False
    reach = pos_lists[0]
    for nxt in pos_lists[1:]:
        new = []
        i = 0
        for p in nxt:  # need some q in reach with p-1-slop <= q <= p-1
            while i < len(reach) and reach[i] < p - 1 - slop:
                i += 1  # p ascending → dropped entries never match later
            if i < len(reach) and reach[i] <= p - 1:
                new.append(p)
        if not new:
            return False
        reach = new
    return True


def phrase_search(
    idx: OracleIndex,
    query: str,
    scope: str | None = None,
    k: int = 10,
    offset: int = 0,
    slop: int = 0,
    filters: dict | None = None,
    after: tuple[float, int] | None = None,
) -> list[tuple[int, float]]:
    """Top-k phrase search: docs whose analyzed lemma stream contains the
    query's analyzed lemma SEQUENCE (order + adjacency, ``slop`` extra
    lemmas allowed between consecutive terms), scored with the same
    pinned BM25 over the phrase's distinct terms, (score desc, doc_id
    asc). Conjunctive cutoff semantics apply (a phrase is an AND plus a
    position predicate). ``filters``: same pinned semantics as
    ``search`` — non-scoring, gates (incl. the single-term match-count
    gate) see the UNfiltered result, application before the top-k cut."""
    seq = analyze(query)  # ordered, duplicates kept — NOT query_lemmas
    if not seq:
        return []
    uniq = sorted(set(seq))
    scope_ids = _scope_doc_ids(idx, scope)
    n_docs = len(scope_ids)
    if n_docs == 0:
        return []
    dfs = [_df_of(idx, t, scope) for t in uniq]
    if query_killed_by_cutoff(dfs, n_docs):
        return []
    scope_set = set(scope_ids)
    matched: set[int] | None = None
    for t in uniq:
        docs_t = {d for d in idx.postings.get(t, {}) if d in scope_set}
        matched = docs_t if matched is None else (matched & docs_t)
        if not matched:
            return []
    assert matched is not None
    verified = [
        d for d in matched
        if phrase_match_doc([idx.positions[t][d] for t in seq], slop)
    ]
    if len(seq) == 1 and len(verified) > df_cutoff(n_docs):
        return []  # single-term gate, same as search()
    allowed = _filter_doc_ids(idx, filters)
    if allowed is not None:
        # attribute filters: after the gates, before the top-k cut
        verified = [d for d in verified if d in allowed]
    if not verified:
        return []
    avg_len = sum(idx.doc_len[d] for d in scope_ids) / n_docs
    scores: dict[int, float] = {}
    for t, df in zip(uniq, dfs):  # lexicographic term order (pinned)
        idf = bm25_idf(df, n_docs)
        plist = idx.postings[t]
        for d in verified:
            scores[d] = scores.get(d, 0.0) + bm25_term_score(
                float(plist[d]), float(idx.doc_len[d]), avg_len, idf,
                BM25_K1, BM25_B,
            )
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return _page(ranked, k, offset, after)


def more_like_this(
    idx: OracleIndex,
    doc_id: int,
    scope: str | None = None,
    k: int = 10,
    max_terms: int = 25,
) -> list[tuple[int, float]]:
    """Related-document twin (operators/query.py more_like_this): the
    source doc's ``max_terms`` rarest lemmas (df asc, lemma asc; absent
    from scope → dropped) run as an OR query — per-term cutoff drop,
    lexicographic accumulation — with the source excluded."""
    src = sorted(t for t, pl in idx.postings.items() if doc_id in pl)
    if not src:
        return []
    ranked = sorted(
        (df, t) for t in src if (df := _df_of(idx, t, scope)) > 0
    )
    terms = sorted(t for _, t in ranked[:max_terms])
    scope_ids = _scope_doc_ids(idx, scope)
    n_docs = len(scope_ids)
    if n_docs == 0 or not terms:
        return []
    cutoff = df_cutoff(n_docs)
    usable = [
        (t, df) for t in terms if (df := _df_of(idx, t, scope)) <= cutoff
    ]
    if not usable:
        return []
    scope_set = set(scope_ids)
    avg_len = sum(idx.doc_len[d] for d in scope_ids) / n_docs
    scores: dict[int, float] = {}
    for t, df in usable:  # lexicographic term order (pinned)
        idf = bm25_idf(df, n_docs)
        for d, tf in idx.postings.get(t, {}).items():
            if d in scope_set and d != doc_id:
                scores[d] = scores.get(d, 0.0) + bm25_term_score(
                    float(tf), float(idx.doc_len[d]), avg_len, idf,
                    BM25_K1, BM25_B,
                )
    ranked_docs = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked_docs[:k]


def rescore_search(
    idx: OracleIndex,
    query: str,
    scope: str | None = None,
    k: int = 10,
    window: int = 50,
    combine: str = "and",
) -> list[tuple[int, float]]:
    """Proximity-rescore twin (operators/rescore.py): first-stage
    ``search`` top-``window``, then combined = score + prox over the
    analyzed lemma stream (min-cover span), order (combined desc,
    doc_id asc) top-k. Docs beyond the window are dropped."""
    from search_engine_spark.functions.analyze import query_lemmas
    from search_engine_spark.operators.rescore import proximity_of

    terms = sorted(set(query_lemmas(query)))
    first = search(idx, query, scope=scope, k=window, combine=combine)
    rescored = [
        (d, s + proximity_of(idx.docs.loc[d, "text"] or "", terms))
        for d, s in first
    ]
    rescored.sort(key=lambda kv: (-kv[1], kv[0]))
    return rescored[:k]


def significant_terms(
    idx: OracleIndex,
    fg_ids: list[int],
    scope: str | None = None,
    k: int = 10,
    min_fg_df: int = 2,
) -> list[tuple[str, int, int, float]]:
    """Significant-terms twin (operators/significant.py): JLH-scored
    lemmas of a foreground doc-id sample vs the (scoped) corpus.
    (lemma, fg_df, bg_df, jlh) with the pinned float shape
    ``(fg/nf - bg/nd) * ((fg/nf) / (bg/nd))`` rounded to 6dp; only
    fgPct > bgPct and fg_df ≥ min_fg_df; order (jlh desc, lemma asc)."""
    scope_ids = _scope_doc_ids(idx, scope)
    n_docs = len(scope_ids)
    n_fg = len(fg_ids)
    if n_fg == 0 or n_docs == 0:
        return []
    fg_set = set(fg_ids)
    out = []
    for t in sorted(idx.postings):
        fg_df = sum(1 for d in idx.postings[t] if d in fg_set)
        if fg_df < min_fg_df:
            continue
        bg_df = _df_of(idx, t, scope)
        fg_pct = fg_df / float(n_fg)
        bg_pct = bg_df / float(n_docs)
        if not fg_pct > bg_pct:
            continue
        jlh = round((fg_pct - bg_pct) * ((fg_pct) / (bg_pct)), 6)
        out.append((t, fg_df, bg_df, jlh))
    out.sort(key=lambda r: (-r[3], r[0]))
    return out[:k]


def expand_prefix(
    idx: OracleIndex,
    prefix: str,
    scope: str | None = None,
    k: int = 8,
) -> list[str]:
    """Wildcard-rewrite twin of operators/fuzzy.expand_prefix: top-k
    dictionary lemmas completing ``prefix``, ranked (cf desc, lemma
    asc), cf summed over scopes (or within ``scope``)."""
    cf: dict[str, int] = {}
    for (sc, lem), c in idx.lemma_cf.items():
        if scope is not None and sc != scope:
            continue
        if lem.startswith(prefix):
            cf[lem] = cf.get(lem, 0) + c
    ranked = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))
    return [lem for lem, _ in ranked[:k]]


def collapse_ranked(
    ranked: list[tuple[int, float]],
    doc_key,
    per_key: int = 1,
) -> list[tuple[int, float]]:
    """Field-collapse twin of operators/query.collapse_results: walk the
    pinned-order ranking, keep at most ``per_key`` docs per
    ``doc_key(doc_id)`` value, preserve order."""
    seen: dict = {}
    out = []
    for d, s in ranked:
        k = doc_key(d)
        n = seen.get(k, 0)
        if n < per_key:
            out.append((d, s))
            seen[k] = n + 1
    return out


def prf_search(
    idx: OracleIndex,
    query: str,
    scope: str | None = None,
    k: int = 10,
    offset: int = 0,
    feedback_k: int = 10,
    expand_n: int = 4,
    beta: float = 0.4,
    min_fg_df: int = 2,
) -> list[tuple[int, float]]:
    """Pseudo-relevance-feedback expansion twin (QueryServer.search_prf
    — the Rocchio/RM3 recipe; ES' significant-terms expansion as prior
    art). Pinned pipeline:

    1. feedback = ``search(query, combine="or", k=feedback_k)`` (OR
       first stage — robust when some seed terms are hot);
    2. expansion = ``significant_terms`` over the feedback ids with
       ``k = expand_n + |base lemmas|``, minus the base lemmas, first
       ``expand_n`` kept in the (jlh desc, term asc) order;
    3. final = weighted OR over base ∪ expansion — weight 1.0 for base
       lemmas, ``beta`` for expansions, applied as ONE multiply
       ``boosted_idf = weight * idf`` before the pinned evaluation
       shape (the boost pin); per-term df cutoff drops apply to ALL
       stage-2 terms regardless of weight; accumulation in
       lexicographic term order; (score desc, doc_id asc)."""
    base = sorted(set(query_lemmas(query)))
    if not base:
        return []
    first = search(idx, query, scope=scope, k=feedback_k, combine="or")
    if not first:
        return []
    ids = [d for d, _ in first]
    sig = significant_terms(
        idx, ids, scope=scope, k=expand_n + len(base), min_fg_df=min_fg_df
    )
    base_set = set(base)
    exp = [t for t, _, _, _ in sig if t not in base_set][:expand_n]
    weights = {t: 1.0 for t in base}
    weights.update({t: beta for t in exp})
    scope_ids = _scope_doc_ids(idx, scope)
    n_docs = len(scope_ids)
    if n_docs == 0:
        return []
    cutoff = df_cutoff(n_docs)
    terms = [
        t for t in sorted(weights) if _df_of(idx, t, scope) <= cutoff
    ]
    if not terms:
        return []
    scope_set = set(scope_ids)
    avg_len = sum(idx.doc_len[d] for d in scope_ids) / n_docs
    scores: dict[int, float] = {}
    for t in terms:  # lexicographic order (pinned)
        boosted_idf = weights[t] * bm25_idf(_df_of(idx, t, scope), n_docs)
        for d, tf in idx.postings.get(t, {}).items():
            if d in scope_set:
                scores[d] = scores.get(d, 0.0) + bm25_term_score(
                    float(tf), float(idx.doc_len[d]), avg_len,
                    boosted_idf, BM25_K1, BM25_B,
                )
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return _page(ranked, k, offset, None)
