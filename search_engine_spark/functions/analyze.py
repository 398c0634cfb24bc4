"""The analyzer: tokenization + lemma normalization (pure, Spark-free core).

Re-expresses the reference's analyzer pipeline (T1-T6, T9 in SURVEY.md §2.3):

- lowercase                        (services/LemmaFinder.java:105)
- ё→е fold                         (services/SearchServiceImpl.java:91-93)
- non-letter strip / tokenize      (services/LemmaFinder.java:106-108; the
  reference keeps only Cyrillic — transcripts are mostly English, so this
  engine pins ``[a-z0-9а-яе]+`` instead; the oracle uses the same rule)
- stop-particle filter             (services/LemmaFinder.java:50-52, 91-102 —
  the reference drops interjections/prepositions/conjunctions by POS tag;
  this engine pins an explicit stopword list playing the same role)
- morphological lemmatization      (services/LemmaFinder.java:54-59 — the
  reference takes Lucene's first normal form; this engine pins a
  deterministic suffix-stripping lemmatizer + exception dict)

Everything here is PURE PYTHON over strings/lists — importable by the
single-node oracle, the pandas UDFs, and the tests, so all three share one
pinned analyzer definition (rank-identity requires it).
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# Pinned analyzer constants. CHANGING ANY OF THESE INVALIDATES ALL FIXTURES.
# ---------------------------------------------------------------------------

TOKEN_RE = re.compile(r"[a-z0-9а-яе]+")

# Plays the role of the reference's POS-based particle filter
# (МЕЖД/ПРЕДЛ/СОЮЗ, LemmaFinder.java:15): closed-class words carry no
# ranking signal. Applied to the RAW token (before lemmatization).
STOPWORDS = frozenset(
    """
    a an and are as at be but by for from had has have he her his i if in is
    it its my no not of on or our she so that the their them they this to was
    we were will with you your
    и в во не на с со по а но как что это из у за от для же или то при о об
    он она они мы вы ты я бы ли да нет его ее их там тут
    """.split()
)

# Irregular forms the suffix stripper cannot reach (reference analog: the
# morphology dictionary's non-suffix normal forms).
LEMMA_EXCEPTIONS = {
    "went": "go",
    "gone": "go",
    "ran": "run",
    "made": "make",
    "said": "say",
    "better": "good",
    "best": "good",
    "worse": "bad",
    "worst": "bad",
    "children": "child",
    "mice": "mouse",
    "людей": "люди",
    "детей": "дети",
}

# Ordered longest-first; strip the FIRST matching suffix ONCE, only if the
# remaining stem keeps >= MIN_STEM chars. Deterministic by construction.
_MIN_STEM = 3
_SUFFIXES = (
    # English
    "ization", "ational", "fulness", "ousness", "iveness",
    "tional", "ations", "ingly", "ments",
    "ation", "ously", "ively", "iness",
    "ment", "ness", "edly", "ings", "ions",
    "ies", "ion", "ing", "est",
    "ed", "es", "ly", "er",
    "s",
    # Russian (post ё→е fold)
    "иями", "иях", "ями", "ами", "ием",
    "ться", "тся", "ость", "ости",
    "ению", "ения", "ение",
    "ыми", "ими", "ого", "его", "ому", "ему",
    "ая", "яя", "ый", "ий", "ой", "ое", "ее", "ые", "ие",
    "ах", "ях", "ам", "ям", "ом", "ем", "ов", "ев", "ей",
    "ть", "ет", "ют", "ит", "ат", "ят", "ил", "ал", "ла", "ло", "ли",
    "а", "я", "о", "е", "ы", "и", "у", "ю", "ь",
)


def fold(text: str) -> str:
    """Lowercase + ё→е (reference: SearchServiceImpl.java:91-93, T1+T4)."""
    return text.lower().replace("ё", "е")


def tokenize(text: str) -> list[str]:
    """Fold then extract ``[a-z0-9а-яе]+`` runs (T1-T3)."""
    return TOKEN_RE.findall(fold(text))


def lemmatize(token: str) -> str:
    """Deterministic lemma: exception dict, else one longest-suffix strip.

    Reference analog: first Lucene normal form (LemmaFinder.java:54-59).
    Digits pass through unchanged.
    """
    hit = LEMMA_EXCEPTIONS.get(token)
    if hit is not None:
        return hit
    if token.isdigit():
        return token
    for suf in _SUFFIXES:
        if token.endswith(suf) and len(token) - len(suf) >= _MIN_STEM:
            return token[: len(token) - len(suf)]
    return token


def analyze(text: str) -> list[str]:
    """Full analyzer: fold → tokenize → stopword filter → lemmatize.

    Returns the lemma sequence (duplicates preserved — tf comes from
    counting; reference analog LemmaFinder.collectLemmas,
    LemmaFinder.java:40-69, which counts per unique lemma per page).
    Empty/None text → [] (reference: LemmaFinder.java:45-47).
    """
    if not text:
        return []
    return [lemmatize(t) for t in tokenize(text) if t not in STOPWORDS]


def doc_length(text: str) -> int:
    """Indexed-token count, the BM25 ``|d|`` (pinned: post-stopword)."""
    return len(analyze(text))


def split_negations(query: str) -> tuple[str, str]:
    """Split a raw query into (positive text, negated text): a
    whitespace token starting with ``-`` (and longer than the bare
    dash) is a negation — ``"merge -draft"`` → ``("merge", "draft")``.
    Hyphens INSIDE a token ("state-of-the-art") are untouched; both
    halves then go through the standard analyzer, so negation matching
    uses exactly the indexed lemma forms. This is query-syntax parsing
    (pre-analysis), the one place the raw string is inspected."""
    pos, neg = [], []
    for tok in query.split():
        if tok.startswith("-") and len(tok) > 1:
            neg.append(tok[1:])
        else:
            pos.append(tok)
    return " ".join(pos), " ".join(neg)


def split_wildcards(query: str) -> tuple[str, list[str]]:
    """Split out prefix wildcards: a whitespace token ending in ``*``
    (longer than the bare star) is a wildcard — ``"dup me*"`` →
    ``("dup", ["me"])``. Prefixes are FOLDED but never lemmatized (they
    match dictionary lemmas by startswith; re-lemmatizing a prefix
    would strip suffixes the user typed); a prefix that isn't a single
    analyzer token is dropped. Sorted unique prefixes → deterministic
    expansion order."""
    rest, prefixes = [], []
    for tok in query.split():
        if tok.endswith("*") and len(tok) > 1:
            p = fold(tok[:-1])
            if TOKEN_RE.fullmatch(p):
                prefixes.append(p)
        else:
            rest.append(tok)
    return " ".join(rest), sorted(set(prefixes))


def query_lemmas(query: str) -> list[str]:
    """Query-side analysis: unique lemmas, sorted lexicographically.

    Mirrors LemmaFinder.getLemmaSet (LemmaFinder.java:76-89) — a SET of
    lemmas; sorting pins deterministic per-term accumulation order (SURVEY
    §4 item 6). The reference's sub-lemma dedup (SearchServiceImpl.java:
    190-217) collapses duplicate normal-form expansions; our lemmatizer
    emits exactly one form, so set-dedup suffices.
    """
    return sorted(set(analyze(query)))
