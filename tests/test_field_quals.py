"""In-query field qualifiers (operators/filters.split_field_quals):
``merge role:assistant`` ≡ filters={"role": "assistant"} on every
match mode, pinned error cases for typo'd/negated/empty quals."""

from __future__ import annotations

import pytest

from search_engine_spark.operators.filters import split_field_quals
from tests.test_spark_engine import RARE, VOCAB

R2 = str(VOCAB[310])


def test_split_field_quals_unit():
    assert split_field_quals("a role:user b") == ("a b", {"role": "user"})
    # repeated quals OR together; order of values preserved as given
    assert split_field_quals("role:user x role:assistant") == (
        "x", {"role": ["user", "assistant"]}
    )
    q, f = split_field_quals("x date:2024-01-02..2024-03-04 tool:py")
    assert q == "x"
    assert f == {"date": {"from": "2024-01-02", "to": "2024-03-04"},
                 "tool": "py"}
    assert split_field_quals("date:2024-01-02 date:2024-01-05")[1] == {
        "date": ["2024-01-02", "2024-01-05"]
    }
    # no quals → query untouched
    assert split_field_quals("plain query -neg term*") == (
        "plain query -neg term*", {}
    )
    for bad in ["unknowncol:x", "-role:user", "role:",
                "date:2024-01-01..2024-02-01 date:2024-03-05",
                "date:2024-03-05 date:2024-01-01..2024-02-01"]:
        with pytest.raises(ValueError):
            split_field_quals(bad)


def test_api_quals_equal_explicit_filters(spark, base_index_dir):
    from search_engine_spark.api import SearchEngine

    eng = SearchEngine(spark, base_index_dir["index"])
    base = eng.search(f"{RARE} {R2}", combine="or",
                      filters={"role": "user"}, limit=10)
    qual = eng.search(f"{RARE} role:user {R2}", combine="or", limit=10)
    assert qual["data"] == base["data"] and base["data"]
    # bool match mode composes the same way
    b = eng.search(f"{RARE} OR {R2}", match="bool",
                   filters={"role": "user"}, limit=10)
    bq = eng.search(f"role:user {RARE} OR {R2}", match="bool", limit=10)
    assert bq["data"] == b["data"]
    # same column in both places is ambiguous
    with pytest.raises(ValueError, match="field"):
        eng.search(f"{RARE} role:user", filters={"role": "assistant"})
