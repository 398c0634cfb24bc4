"""Boolean query language: nested AND / OR / NOT with parentheses,
compiled to a small AST shared by the oracle and the Spark kernels.

Syntax (Lucene-lite; reference has no boolean syntax — this is a
beyond-reference feature, cf. Lucene's BooleanQuery as public prior
art):

- ``a b``            implicit AND (adjacency)
- ``a AND b``        explicit AND (keyword, uppercase only)
- ``a OR b``         OR binds LOOSER than AND: ``a b OR c`` = (a AND b) OR c
- ``NOT a`` / ``-a`` negation; only meaningful as a conjunct — a clause
                     with no positive conjunct matches NOTHING (Lucene's
                     pure-negative behavior: there is no match-all
                     universe to subtract from at scale)
- ``( ... )``        grouping; ``NOT ( ... )`` negates the whole group
- ``a^2.5``/``(...)^2`` term/group boost (Lucene ``^`` syntax) — see
                     ``parse_bool_boosted``
- ``"``              reserved (phrase atoms), currently rejected

Every word atom runs through the standard analyzer, so matching uses
exactly the indexed lemma forms; a stopword atom is VACUOUS and simply
vanishes from its clause (``the AND merge`` ≡ ``merge``). A word that
analyzes to several lemmas becomes an implicit AND group.

AST (plain picklable tuples — they travel into applyInPandas closures):

- ``("term", lemma)``
- ``("and", (pos_children...), (neg_children...))`` — matches docs in
  EVERY positive child and NO negative child
- ``("or", (children...))`` — matches docs in ANY child

Nested ANDs are flattened on assembly (and-associativity), so a
pure-negative GROUP used as a conjunct — ``a AND (NOT b)`` — merges into
the parent's negative list and means exactly ``a -b``.

Pinned matching/scoring semantics (oracle.bool_search is the twin):

- df cutoff is PER-TERM, OR-mode style (oracle.search combine="or"): a
  positive lemma whose df exceeds the 5% cutoff is dropped from the
  tree; an AND clause whose positive conjuncts all drop dies entirely
  (negations die with it); negated subtrees are never cutoff-pruned
  (excluding a hot term is legitimate — nothing is scored for it).
- score(doc) = Σ bm25_term_score over the DISTINCT positive lemmas of
  the pruned tree that the doc CONTAINS (wherever it matched),
  accumulated in lexicographic lemma order — float64, bit-identical
  between oracle and kernels. ``a b`` is therefore score-identical to
  combine="and" and ``a OR b`` to combine="or" when no cutoff fires.
"""

from __future__ import annotations

from search_engine_spark.functions.analyze import analyze

_KEYWORDS = {"AND", "OR", "NOT"}

Node = tuple  # ("term", str) | ("and", tuple, tuple) | ("or", tuple)


def _lex(query: str) -> list[str]:
    if '"' in query:
        raise ValueError('\'"\' is reserved for phrase atoms — not yet '
                         "supported in boolean syntax")
    return query.replace("(", " ( ").replace(")", " ) ").split()


def _split_boost(word: str) -> tuple[str, float]:
    """``a^2.5`` → ("a", 2.5); no ``^`` → (word, 1.0). The weight must
    be a positive float (a zero/negative boost would break the WAND
    upper-bound invariant and has no retrieval meaning)."""
    if "^" not in word:
        return word, 1.0
    base, _, raw = word.rpartition("^")
    if not base:
        raise ValueError("boost '^' must attach to a term or group")
    try:
        w = float(raw)
    except ValueError:
        raise ValueError(f"malformed boost {word!r}: expected term^NUMBER")
    if not w > 0:
        raise ValueError(f"boost must be > 0, got {w} in {word!r}")
    return base, w


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0
        # positive-occurrence boost records: [lemma, weight] appended as
        # atoms parse; and_expr deletes the slice a negation contributed
        # (negations never score, so they never weigh); group boosts
        # scale the slice their group contributed (nested boosts
        # therefore multiply)
        self.occ: list[list] = []

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    # or_expr := and_expr ('OR' and_expr)*
    def or_expr(self) -> Node | None:
        kids = []
        first = self.and_expr()
        if first is not None:
            kids.append(first)
        while self.peek() == "OR":
            self.take()
            nxt = self.and_expr()
            if nxt is not None:
                kids.append(nxt)
        if not kids:
            return None
        return kids[0] if len(kids) == 1 else ("or", tuple(kids))

    # and_expr := factor ('AND'? factor)*   (implicit AND on adjacency)
    def and_expr(self) -> Node | None:
        pos: list[Node] = []
        negs: list[Node] = []
        saw_atom = False
        pending_and = False
        while True:
            t = self.peek()
            if t is None or t in (")", "OR"):
                if pending_and:
                    raise ValueError(
                        "dangling 'AND': expected a term or group"
                    )
                break
            if t == "AND":
                self.take()
                pending_and = True
                continue
            pending_and = False
            mark = len(self.occ)
            neg, node = self.factor()
            if neg:
                del self.occ[mark:]  # negations never score/weigh
            saw_atom = True
            if node is None:  # vacuous (stopword) atom — vanishes
                continue
            if neg:
                negs.append(node)
            elif node[0] == "and":
                # flatten nested AND (associativity): a AND (NOT b)
                # merges b into THIS clause's negative list
                pos.extend(node[1])
                negs.extend(node[2])
            else:
                pos.append(node)
        if not saw_atom:
            raise ValueError("dangling operator: expected a term or group")
        if not pos and not negs:
            return None
        if len(pos) == 1 and not negs:
            return pos[0]
        return ("and", tuple(pos), tuple(negs))

    # factor := ('NOT' | '-'word) factor | '(' or_expr ')' | word
    # returns (negated?, node)
    def factor(self) -> tuple[bool, Node | None]:
        t = self.peek()
        if t is None:
            raise ValueError("dangling operator: expected a term or group")
        if t == "NOT":
            self.take()
            neg, node = self.factor()
            return (not neg, node)  # NOT NOT a = a (involution)
        if t == "(":
            self.take()
            mark = len(self.occ)
            node = self.or_expr()
            if self.peek() != ")":
                raise ValueError("unbalanced '(' in boolean query")
            self.take()
            nxt = self.peek()
            if nxt is not None and nxt.startswith("^"):  # (…)^2 group boost
                _, w = _split_boost("g" + self.take())
                for rec in self.occ[mark:]:
                    rec[1] *= w
            return (False, node)
        if t == ")":
            raise ValueError("unbalanced ')' in boolean query")
        word = self.take()
        if word in _KEYWORDS:
            raise ValueError(f"dangling operator {word!r}")
        if word.startswith("^"):
            raise ValueError("boost '^' must attach to a term or group")
        neg = word.startswith("-") and len(word) > 1
        base, w = _split_boost(word[1:] if neg else word)
        lemmas = analyze(base)
        self.occ.extend([l, w] for l in lemmas)
        return (neg, _atom(lemmas))


def _atom(lemmas: list[str]) -> Node | None:
    uniq = sorted(set(lemmas))
    if not uniq:
        return None
    if len(uniq) == 1:
        return ("term", uniq[0])
    return ("and", tuple(("term", l) for l in uniq), ())


def parse_bool(query: str) -> Node | None:
    """Raw query string → AST (None = vacuous query, matches nothing).
    Raises ValueError on malformed syntax (unbalanced parens, dangling
    operators, reserved quotes). Boost syntax parses but its weights are
    discarded — use ``parse_bool_boosted`` on scoring paths."""
    return parse_bool_boosted(query)[0]


def parse_bool_boosted(query: str) -> tuple[Node | None, dict[str, float]]:
    """``parse_bool`` plus the query's boost weights: {lemma: weight}
    for every positively-occurring lemma with an effective weight ≠ 1.
    Pinned semantics (Lucene ``^`` as public prior art):

    - ``a^2.5`` weights the atom's lemmas; ``( ... )^2`` weights every
      positive lemma inside the group; nested boosts MULTIPLY
      (``(a^2 b)^3`` → a:6, b:3);
    - a lemma occurring positively more than once takes the MAX of its
      occurrence weights (scoring sums DISTINCT lemmas once, so the
      per-lemma weight must be a single pinned number);
    - negated atoms/groups never score, so their boosts are inert
      (``-a^2`` excludes exactly like ``-a``);
    - scoring applies the weight as ``boosted_idf = weight * idf`` —
      ONE multiply before the pinned evaluation shape, bit-identical
      oracle vs kernels (weight 1.0 ≡ unboosted: the map omits it, so
      the scoring loop's float path is untouched);
    - the df cutoff ignores weights (a boosted hot term still drops).
    """
    toks = _lex(query)
    if not toks:
        return None, {}
    p = _Parser(toks)
    node = p.or_expr()
    if p.peek() is not None:
        raise ValueError("unbalanced ')' in boolean query")
    weights: dict[str, float] = {}
    for l, w in p.occ:
        weights[l] = max(weights.get(l, 0.0), w)
    return node, {l: w for l, w in weights.items() if w != 1.0}


def positive_lemmas(node: Node | None) -> list[str]:
    """Sorted distinct lemmas reachable WITHOUT crossing a negation edge
    — the scoring set (and the df-cutoff-gated set)."""
    out: set[str] = set()

    def walk(n: Node) -> None:
        if n[0] == "term":
            out.add(n[1])
        elif n[0] == "or":
            for c in n[1]:
                walk(c)
        else:
            for c in n[1]:
                walk(c)

    if node is not None:
        walk(node)
    return sorted(out)


def all_lemmas(node: Node | None) -> list[str]:
    """Sorted distinct lemmas anywhere in the tree (postings to fetch)."""
    out: set[str] = set()

    def walk(n: Node) -> None:
        if n[0] == "term":
            out.add(n[1])
        elif n[0] == "or":
            for c in n[1]:
                walk(c)
        else:
            for c in n[1] + n[2]:
                walk(c)

    if node is not None:
        walk(node)
    return sorted(out)


def compile_synonyms(raw_groups: list[list[str]]) -> dict[str, tuple[str, ...]]:
    """Raw synonym groups (lists of words, e.g. loaded from a config
    table) → {lemma: sorted tuple of the OTHER lemmas in its group}.
    Each word runs through the standard analyzer so expansion matches
    the indexed lemma forms; words sharing a group are symmetric
    equivalents, and a word in several groups gets their union."""
    lemma_groups: list[set[str]] = []
    for grp in raw_groups:
        lems: set[str] = set()
        for w in grp:
            lems.update(analyze(w))
        if len(lems) > 1:
            lemma_groups.append(lems)
    out: dict[str, set[str]] = {}
    for g in lemma_groups:
        for l in g:
            out.setdefault(l, set()).update(g - {l})
    return {l: tuple(sorted(s)) for l, s in out.items()}


def expand_synonyms(
    node: Node | None, synonyms: dict[str, tuple[str, ...]] | None
) -> Node | None:
    """Query-time synonym expansion: each POSITIVE term atom with an
    entry in ``synonyms`` (see compile_synonyms) becomes an OR group
    over the term and its synonyms. Pinned semantics:

    - expansion precedes the df-cutoff gate, so a hot synonym drops
      per-term like any other positive lemma;
    - negated subtrees are NEVER expanded (you exclude exactly what you
      typed);
    - scoring follows the standard OR rule — each present synonym
      contributes its own idf-weighted BM25 partial (a deliberate
      re-pin of Lucene's SynonymQuery blending, which pretends the
      group is one term; per-term sums keep the oracle/kernel
      accumulation order pinned and rank-identity exact)."""
    if node is None or not synonyms:
        return node
    kind = node[0]
    if kind == "term":
        syns = synonyms.get(node[1])
        if not syns:
            return node
        alts = sorted({node[1], *syns})
        return ("or", tuple(("term", l) for l in alts))
    if kind == "or":
        return ("or", tuple(expand_synonyms(c, synonyms) for c in node[1]))
    return (
        "and",
        tuple(expand_synonyms(c, synonyms) for c in node[1]),
        node[2],  # negations untouched
    )


def expand_weights(
    weights: dict[str, float], synonyms: dict[str, tuple[str, ...]] | None
) -> dict[str, float]:
    """Synonym lemmas inherit their source atom's boost (Lucene boosts
    an expanded SynonymQuery as a unit): each synonym of a weighted
    lemma gets that weight, max-combined with any weight of its own."""
    if not weights or not synonyms:
        return weights
    out = dict(weights)
    for l, w in weights.items():
        for s in synonyms.get(l, ()):
            out[s] = max(out.get(s, w), w)
    return out


def prune_over_cutoff(node: Node | None, over: set[str]) -> Node | None:
    """Drop over-cutoff POSITIVE lemmas (per-term, OR-mode style). An
    AND whose positive conjuncts all drop dies entirely; negated
    subtrees are never pruned. Returns None when the whole tree dies."""
    if node is None or not over:
        return node
    kind = node[0]
    if kind == "term":
        return None if node[1] in over else node
    if kind == "or":
        kids = [p for c in node[1]
                if (p := prune_over_cutoff(c, over)) is not None]
        if not kids:
            return None
        return kids[0] if len(kids) == 1 else ("or", tuple(kids))
    pos = [p for c in node[1]
           if (p := prune_over_cutoff(c, over)) is not None]
    if not pos:
        return None
    if len(pos) == 1 and not node[2]:
        return pos[0]
    return ("and", tuple(pos), node[2])
