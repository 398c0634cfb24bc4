"""KMV distinct-count sketch (operators/sketch.py): exact small-group
fallback, bit-identity vs a Python reference of the pinned math,
partition invariance of the combiner, the DuckDB SQL twin, and accuracy
of the estimator at a cardinality well past k."""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.sketch import kmv_distinct, kmv_distinct_sql

HASH_SPAN = 2.0 ** 60


def _h(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


def _ref_kmv(keys: list[str], k: int) -> float:
    hs = sorted({_h(x) for x in keys})
    if len(hs) < k:
        return float(len(hs))
    return round((k - 1) * HASH_SPAN / float(hs[k - 1]), 6)


@pytest.fixture(scope="module")
def grouped_pdf() -> pd.DataFrame:
    rows = []
    for g, n in [("a", 7), ("b", 40), ("c", 300)]:
        for i in range(n):
            # duplicate every key once — distinct counts are n, not 2n
            rows += [(g, f"{g}-key-{i}")] * 2
    return pd.DataFrame(rows, columns=["grp", "key"])


def test_exact_branch_and_reference_identity(spark, grouped_pdf):
    df = spark.createDataFrame(grouped_pdf)
    out = {
        r["grp"]: r["distinct_est"]
        for r in kmv_distinct(df, "key", k=16, group_cols=["grp"]).collect()
    }
    for g in ("a", "b", "c"):
        keys = grouped_pdf.loc[grouped_pdf["grp"] == g, "key"].tolist()
        assert out[g] == _ref_kmv(keys, 16), g
    assert out["a"] == 7.0  # < k: exact fallback


def test_partition_invariance(spark, grouped_pdf):
    df = spark.createDataFrame(grouped_pdf)
    one = kmv_distinct(
        df.repartition(1), "key", k=16, group_cols=["grp"]
    ).collect()
    many = kmv_distinct(
        df.repartition(13), "key", k=16, group_cols=["grp"]
    ).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


def test_global_no_group(spark, grouped_pdf):
    df = spark.createDataFrame(grouped_pdf)
    [row] = kmv_distinct(df, "key", k=64).collect()
    assert row["distinct_est"] == _ref_kmv(grouped_pdf["key"].tolist(), 64)


def test_duckdb_twin_matches(spark, grouped_pdf):
    df = spark.createDataFrame(grouped_pdf)
    got = sorted(
        (r["grp"], r["distinct_est"])
        for r in kmv_distinct(df, "key", k=16, group_cols=["grp"]).collect()
    )
    con = duckdb.connect()
    con.register("t", grouped_pdf)
    sql = kmv_distinct_sql("t", "key", 16, group_cols=["grp"])
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want


def test_estimator_accuracy(spark):
    n = 500
    pdf = pd.DataFrame({"key": [f"uniq-{i}" for i in range(n)]})
    [row] = kmv_distinct(spark.createDataFrame(pdf), "key", k=64).collect()
    assert abs(row["distinct_est"] - n) / n < 0.35, row["distinct_est"]


def test_null_keys_excluded_and_k_guard(spark):
    pdf = pd.DataFrame({"key": ["x", None, "y", None]})
    [row] = kmv_distinct(spark.createDataFrame(pdf), "key", k=8).collect()
    assert row["distinct_est"] == 2.0
    with pytest.raises(ValueError):
        kmv_distinct(spark.createDataFrame(pdf), "key", k=1)


# ---------------------------------------------------------------------------
# Misra–Gries frequent items
# ---------------------------------------------------------------------------


def _freq_ref(keys: list[str], num: int, den: int) -> set:
    from collections import Counter

    n = len(keys)
    return {(k, c) for k, c in Counter(keys).items() if c * den >= num * n}


@pytest.fixture(scope="module")
def skewed_pdf() -> pd.DataFrame:
    # zipf-ish: key-0 30%, key-1 15%, key-2 8%, long tail of singletons
    keys = (
        ["hot-0"] * 300 + ["hot-1"] * 150 + ["hot-2"] * 80
        + [f"tail-{i}" for i in range(470)]
    )
    return pd.DataFrame({"key": keys})


def test_frequent_items_exact_counts(spark, skewed_pdf):
    from search_engine_spark.operators.sketch import frequent_items

    got = {
        (r["key"], r["cnt"])
        for r in frequent_items(
            spark.createDataFrame(skewed_pdf), "key", 5, 100
        ).collect()
    }
    assert got == _freq_ref(skewed_pdf["key"].tolist(), 5, 100)
    assert got == {("hot-0", 300), ("hot-1", 150), ("hot-2", 80)}


def test_frequent_items_partition_invariance_and_guarantee(spark, skewed_pdf):
    """The MG candidate union must be a superset of the true heavy
    hitters at ANY partitioning — including ones that split a hot key
    across every partition."""
    from search_engine_spark.operators.sketch import frequent_items

    want = _freq_ref(skewed_pdf["key"].tolist(), 5, 100)
    df = spark.createDataFrame(skewed_pdf)
    for parts in (1, 7, 32):
        got = {
            (r["key"], r["cnt"])
            for r in frequent_items(
                df.repartition(parts), "key", 5, 100
            ).collect()
        }
        assert got == want, parts


def test_frequent_items_duckdb_twin(spark, skewed_pdf):
    from search_engine_spark.operators.sketch import (
        frequent_items,
        frequent_items_sql,
    )

    got = sorted(
        (r["key"], r["cnt"])
        for r in frequent_items(
            spark.createDataFrame(skewed_pdf), "key", 5, 100
        ).collect()
    )
    con = duckdb.connect()
    con.register("t", skewed_pdf)
    want = sorted(
        map(tuple, con.execute(frequent_items_sql("t", "key", 5, 100)).fetchall())
    )
    assert got == want


def test_frequent_items_share_guard(spark, skewed_pdf):
    from search_engine_spark.operators.sketch import frequent_items

    with pytest.raises(ValueError):
        frequent_items(spark.createDataFrame(skewed_pdf), "key", 0, 100)
    with pytest.raises(ValueError):
        frequent_items(spark.createDataFrame(skewed_pdf), "key", 5, 5)


def test_sampled_quantiles_deterministic_and_close(spark):
    """sampled_quantiles: identical at any partitioning (hash sample, no
    RNG), matches its DuckDB twin exactly, and lands near the exact
    quantiles (sample-quantile concentration)."""
    import numpy as np
    import pandas as pd

    from search_engine_spark.operators.sketch import (
        sampled_quantiles,
        sampled_quantiles_oracle_sql,
    )

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(6000),
            "event_type": np.repeat(["a", "b", "c"], 2000),
            "value": np.concatenate(
                [rng.normal(10, 2, 2000), rng.exponential(5, 2000),
                 rng.uniform(0, 100, 2000)]
            ),
        }
    )
    df1 = spark.createDataFrame(pdf).repartition(1)
    df8 = spark.createDataFrame(pdf).repartition(8, "event_id")
    rows1 = sorted(
        tuple(r) for r in sampled_quantiles(
            df1, "value", "event_id", ["event_type"], fraction=0.3
        ).collect()
    )
    rows8 = sorted(
        tuple(r) for r in sampled_quantiles(
            df8, "value", "event_id", ["event_type"], fraction=0.3
        ).collect()
    )
    assert rows1 == rows8  # partition-invariant sample

    con = duckdb.connect()
    con.register("events", pdf)
    want = sorted(
        map(tuple, con.execute(
            sampled_quantiles_oracle_sql(
                "value", "event_id", ["event_type"], fraction=0.3
            )
        ).fetchall())
    )
    assert rows1 == want  # exact cross-engine twin

    exact = {
        r["event_type"]: (r["p50"], r["p90"])
        for r in df1.groupBy("event_type").agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
        ).collect()
    }
    for et, p50, p90, _p99, n in rows1:
        assert n > 400  # the sample actually fired
        spread = exact[et][1] - exact[et][0] + 1e-9
        assert abs(p50 - exact[et][0]) < 0.5 * spread, et
        assert abs(p90 - exact[et][1]) < 0.5 * spread, et
