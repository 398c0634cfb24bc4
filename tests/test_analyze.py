"""Analyzer unit tests (SURVEY.md §5 item 1): T1-T6/T9 pinned edge cases."""

from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.functions.analyze import (
    STOPWORDS,
    analyze,
    doc_length,
    fold,
    lemmatize,
    query_lemmas,
    tokenize,
)


def test_fold_lower_and_yo():
    assert fold("Ёжик ЗЕЛЁНЫЙ Hello") == "ежик зеленый hello"


def test_tokenize_strips_non_letters():
    assert tokenize("Hello, world! x=42; почём?") == ["hello", "world", "x", "42", "почем"]


def test_empty_and_none_text():
    # reference: blank text → empty map (LemmaFinder.java:45-47)
    assert analyze("") == []
    assert analyze(None) == []
    assert analyze("   \t\n") == []
    assert doc_length("") == 0


def test_stopwords_dropped():
    assert analyze("the cat and the dog") == ["cat", "dog"]
    assert analyze("и в не на") == []  # stop-particle-only → empty


def test_lemmatizer_suffix_strip():
    assert lemmatize("running") == "runn"
    assert lemmatize("caches") == "cach"
    assert lemmatize("cats") == "cat"
    # stem floor: never strip below 3 chars
    assert lemmatize("las") == "las"


def test_lemmatizer_exceptions():
    assert lemmatize("went") == "go"
    assert lemmatize("children") == "child"


def test_digits_pass_through():
    assert lemmatize("12345") == "12345"
    assert analyze("error 404 found") == ["error", "404", "found"]


def test_yo_variant_equivalence():
    # ё-spelling and е-spelling must produce identical lemmas
    assert analyze("зелёный") == analyze("зеленый")
    assert analyze("ёжик") == analyze("ежик")


def test_query_lemmas_sorted_unique():
    ql = query_lemmas("Dog dogs DOG cat")
    assert ql == sorted(set(ql))
    assert len(ql) <= 2


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_analyze_deterministic_and_idempotent_tokens(s):
    out1 = analyze(s)
    out2 = analyze(s)
    assert out1 == out2
    for lem in out1:
        assert lem not in STOPWORDS or lem.isdigit() is False
        # re-analyzing a lemma never crashes and yields tokens
        assert isinstance(lem, str) and lem


@given(st.text(alphabet="abcdefgsxyz аеиоуёьЁ.,!? 0123456789", max_size=100))
@settings(max_examples=200, deadline=None)
def test_doc_length_matches_analyze(s):
    assert doc_length(s) == len(analyze(s))
