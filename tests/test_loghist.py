"""Mergeable log-linear quantile sketch (operators/sketch.py loghist_*):
cross-engine bucket identity on CONSTRUCTED boundary values (exact
powers of two and sub-bucket edges — where a 1-ulp log2 disagreement
would flip the octave without the integer correction), merge
invariance under arbitrary splits, the documented 1/k error bound,
and the structural size bound that makes it a sketch."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from search_engine_spark.operators.sketch import (
    LOGHIST_K,
    LOGHIST_SCALE,
    loghist_merge,
    loghist_oracle_sql,
    loghist_quantiles,
    loghist_quantiles_from,
    loghist_sketch,
)


def _boundary_values() -> list[float]:
    """Values whose fixed-point image v lands ON and AROUND every kind
    of bucket edge: octave edges 2^e +- 1 (the log2-guess correction
    path), exact sub-bucket lower edges, zeros, negatives, huge."""
    vals: list[float] = [0.0, 0.4 / LOGHIST_SCALE, -0.4 / LOGHIST_SCALE]
    k = LOGHIST_K
    for e in (0, 1, 5, 20, 35, 52, 54):
        pe = 1 << e
        for d in (-1, 0, 1):
            v = pe + d
            if v >= 1:
                vals.append(v / LOGHIST_SCALE)
                vals.append(-v / LOGHIST_SCALE)
        for i in (1, k // 2, k - 1):
            lo = pe + (i * pe + k - 1) // k  # ceil edge of sub-bucket i
            for d in (-1, 0, 1):
                if lo + d >= 1:
                    vals.append((lo + d) / LOGHIST_SCALE)
    return vals


def test_bucket_twin_on_boundaries(spark):
    vals = _boundary_values()
    pdf = pd.DataFrame({"value": vals, "g": ["a"] * len(vals)})
    df = spark.createDataFrame(pdf)
    sk = loghist_sketch(df, "value", ["g"]).toPandas()
    spark_hist = sorted(map(tuple, sk[["bucket", "cnt"]].itertuples(index=False)))

    con = duckdb.connect()
    con.register("t", pdf)
    # reuse the oracle's bucket stages verbatim (CTEs s1..h of the twin)
    sql = loghist_oracle_sql("value", ["g"], table="t")
    head = sql.split("), c AS")[0] + ") SELECT bucket, cnt FROM h"
    duck_hist = sorted(
        map(tuple, con.execute(head).df().itertuples(index=False))
    )
    assert spark_hist == duck_hist


def test_quantiles_twin_and_error_bound(spark):
    rng = np.random.RandomState(7)
    vals = np.concatenate([
        rng.lognormal(3.0, 2.0, 4000),
        -rng.lognormal(1.0, 1.0, 500),
        np.zeros(25),
    ])
    pdf = pd.DataFrame({
        "value": vals,
        "g": rng.choice(["x", "y", "z"], len(vals)),
    })
    df = spark.createDataFrame(pdf)
    ps = (0.1, 0.5, 0.9, 0.99)
    got = (
        loghist_quantiles_from(df, "value", ["g"], ps=ps)
        .orderBy("g").toPandas().reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        loghist_oracle_sql("value", ["g"], ps=ps, table="t") + " ORDER BY g"
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # documented accuracy: |est - exact_rank_stat| <= |exact|/k + 1/scale
    for g, sub in pdf.groupby("g"):
        xs = np.sort(sub.value.to_numpy())
        row = got[got.g == g].iloc[0]
        for p in ps:
            exact = xs[int(np.floor((len(xs) - 1) * p))]
            est = row[f"p{f'{p * 100:g}'.replace('.', '_')}"]
            tol = abs(exact) / LOGHIST_K + 2.0 / LOGHIST_SCALE
            assert abs(est - exact) <= tol, (g, p, est, exact)


def test_merge_invariance_any_split(spark):
    rng = np.random.RandomState(11)
    pdf = pd.DataFrame({
        "value": rng.lognormal(2.0, 3.0, 3000),
        "g": rng.choice(["a", "b"], 3000),
        "part": rng.randint(0, 5, 3000),
    })
    df = spark.createDataFrame(pdf)
    whole = loghist_sketch(df, "value", ["g"])
    parts = [
        loghist_sketch(df.filter(f"part = {i}"), "value", ["g"])
        for i in range(5)
    ]
    merged = loghist_merge(parts, ["g"])
    a = sorted(map(tuple, whole.select("g", "bucket", "cnt").collect()))
    b = sorted(map(tuple, merged.select("g", "bucket", "cnt").collect()))
    assert a == b
    # and the read-off agrees too (exactly: same sketch -> same answer)
    qa = sorted(map(tuple, loghist_quantiles(whole, ["g"]).collect()))
    qb = sorted(map(tuple, loghist_quantiles(merged, ["g"]).collect()))
    assert qa == qb


def test_sketch_size_structurally_bounded(spark):
    # 50k rows spanning 15 orders of magnitude -> bucket count stays
    # <= octaves*k per sign, independent of n (the sketch property).
    rng = np.random.RandomState(3)
    vals = np.exp(rng.uniform(np.log(1e-5), np.log(1e9), 50_000))
    df = spark.createDataFrame(pd.DataFrame({"value": vals}))
    n_buckets = loghist_sketch(df, "value").count()
    assert n_buckets <= 56 * LOGHIST_K
    # monotone: bucket order == value order
    one = spark.createDataFrame(
        pd.DataFrame({"value": sorted(set(np.round(vals[:500], 4)))})
    )
    sk = (
        loghist_sketch(one, "value")
        .orderBy("bucket").toPandas()
    )
    assert sk.bucket.is_monotonic_increasing


def test_ordering_with_negatives_and_zero(spark):
    vals = [-100.0, -1.5, -1e-6, 0.0, 1e-6, 1.5, 100.0]
    df = spark.createDataFrame(pd.DataFrame({"value": vals}))
    q = loghist_quantiles_from(
        df, "value", ps=(0.0, 0.5, 1.0)
    ).toPandas().iloc[0]
    assert q.p0 < 0 and q.p100 > 0
    assert q.n_rows == len(vals)
    assert q.p0 == pytest.approx(-100.0, rel=1.0 / LOGHIST_K)
    assert q.p100 == pytest.approx(100.0, rel=1.0 / LOGHIST_K)


def test_out_of_domain_values_clamp_not_crash(spark):
    """Values past the 2^55 fixed-point domain — including inf — clamp
    into the top bucket identically in both engines instead of raising
    an int64 overflow (ANSI mode) and killing the job."""
    vals = [1e30, -1e30, 1e308, 3.7e10, -3.7e10, 5.0, float("inf")]
    pdf = pd.DataFrame({"value": vals, "g": ["a"] * len(vals)})
    sk = (
        loghist_sketch(spark.createDataFrame(pdf), "value", ["g"])
        .toPandas()
    )
    spark_hist = sorted(map(tuple, sk[["bucket", "cnt"]].itertuples(index=False)))
    con = duckdb.connect()
    con.register("t", pdf)
    sql = loghist_oracle_sql("value", ["g"], table="t")
    head = sql.split("), c AS")[0] + ") SELECT bucket, cnt FROM h"
    duck_hist = sorted(map(tuple, con.execute(head).df().itertuples(index=False)))
    assert spark_hist == duck_hist
    top = 1 + 55 * LOGHIST_K  # the (e=55, i=0) clamp bucket
    assert (top, 4) in spark_hist  # 1e30, 1e308, 3.7e10(*scale>2^55), inf
    assert (-top, 2) in spark_hist


def test_refined_quantiles_twin_error_and_exactness(spark):
    """Round-4 refined read-off (loghist_sketch_sums →
    loghist_quantiles_refined): Spark == DuckDB twin bit-for-bit; the
    refined estimate keeps the ≤ 1-bucket-width bound AND is strictly
    no further from the exact rank statistic (in aggregate) than the
    lower-edge answer; a bucket holding one distinct value answers
    EXACTLY; merge invariance holds for the (cnt, vsum) columns."""
    import duckdb

    from search_engine_spark.operators.sketch import (
        loghist_merge_sums,
        loghist_quantiles_refined,
        loghist_refined_oracle_sql,
        loghist_sketch_sums,
    )

    rng = np.random.RandomState(11)
    vals = np.concatenate([
        rng.lognormal(3.0, 2.0, 3000),
        -rng.lognormal(1.0, 1.0, 400),
        np.zeros(20),
    ])
    pdf = pd.DataFrame({
        "value": vals,
        "g": rng.choice(["x", "y"], len(vals)),
    })
    df = spark.createDataFrame(pdf)
    ps = (0.1, 0.5, 0.9, 0.99)
    got = (
        loghist_quantiles_refined(
            loghist_sketch_sums(df, "value", ["g"]), ["g"], ps=ps
        ).orderBy("g").toPandas().reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        loghist_refined_oracle_sql("value", ["g"], ps=ps, table="t")
        + " ORDER BY g"
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # error bound kept; refined beats the lower edge in aggregate
    edge = (
        loghist_quantiles_from(df, "value", ["g"], ps=ps)
        .orderBy("g").toPandas().reset_index(drop=True)
    )
    err_ref = err_edge = 0.0
    for g, sub in pdf.groupby("g"):
        xs = np.sort(sub.value.to_numpy())
        row_r = got[got.g == g].iloc[0]
        row_e = edge[edge.g == g].iloc[0]
        for p in ps:
            exact = xs[int(np.floor((len(xs) - 1) * p))]
            nm = f"p{f'{p * 100:g}'.replace('.', '_')}"
            tol = abs(exact) / LOGHIST_K + 2.0 / LOGHIST_SCALE
            assert abs(row_r[nm] - exact) <= tol, (g, p)
            err_ref += abs(row_r[nm] - exact)
            err_edge += abs(row_e[nm] - exact)
    assert err_ref < err_edge

    # single-distinct-value buckets answer exactly: small integers at
    # magnitude < 64 have bucket width < 1 fixed-point unit
    ints = pd.DataFrame({"value": [3.0] * 10 + [7.0] * 30 + [50.0] * 10,
                         "g": ["a"] * 50})
    r = (
        loghist_quantiles_refined(
            loghist_sketch_sums(spark.createDataFrame(ints), "value",
                                ["g"]),
            ["g"], ps=(0.5,),
        ).toPandas().iloc[0]
    )
    assert r["p50"] == 7.0

    # merge invariance of (cnt, vsum) under an arbitrary 3-way split
    from pyspark.sql import functions as F

    df_i = df.withColumn("rid", F.monotonically_increasing_id())
    parts = [
        loghist_sketch_sums(df_i.filter(f"rid % 3 = {i}"), "value", ["g"])
        for i in range(3)
    ]
    merged = (
        loghist_quantiles_refined(
            loghist_merge_sums(parts, ["g"]), ["g"], ps=ps
        ).orderBy("g").toPandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(merged, got, check_dtype=False)
