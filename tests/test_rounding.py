"""The 6dp HALF_UP rounding pin: ``round6`` must agree with DuckDB's
``round(v, 6)`` and Spark's ``F.round(col, 6)`` on float64 — INCLUDING
exact 6dp midpoints, where ``np.round`` (banker's half-to-even)
disagrees with both engines. Every cross-engine kernel (kmeans/PQ
argmins, SemDeDup threshold, MMR margins) routes through this helper,
so this test is what keeps a midpoint fixture from flipping a contract
twin."""

from __future__ import annotations

import duckdb
import numpy as np

from search_engine_spark.functions.rounding import half_up, round6

# doubles whose value*1e6 is an exact x.5 midpoint (verified below) —
# the cases where banker's rounding and the engines disagree
MIDPOINTS = [2.5e-06, 4.5e-06, 6.5e-06, 8.5e-06, 1.05e-05,
             -2.5e-06, -4.5e-06, -1.05e-05]


def test_midpoints_are_real_midpoints():
    for x in MIDPOINTS:
        frac = abs(x) * 1e6 % 1.0
        assert frac == 0.5, (x, frac)


def test_round6_half_up_away_from_zero_on_midpoints():
    got = round6(np.array(MIDPOINTS))
    want = [3e-06, 5e-06, 7e-06, 9e-06, 1.1e-05, -3e-06, -5e-06, -1.1e-05]
    assert got.tolist() == want
    # and np.round demonstrably differs — the regression this pin guards
    assert np.round(MIDPOINTS[0], 6) != got[0]


def test_round6_matches_duckdb_everywhere():
    rng = np.random.default_rng(42)
    xs = np.concatenate(
        [np.array(MIDPOINTS), rng.normal(scale=3.0, size=500),
         rng.normal(scale=1e-5, size=500)]
    )
    con = duckdb.connect()
    for x in xs:
        d = con.execute("select round(?::DOUBLE, 6)", [float(x)]).fetchone()[0]
        assert float(round6(x)) == d, x
    con.close()


def test_round6_matches_spark(spark):
    rng = np.random.default_rng(7)
    xs = MIDPOINTS + [float(v) for v in rng.normal(scale=2.0, size=200)]
    df = spark.createDataFrame([(float(x),) for x in xs], "v double")
    from pyspark.sql import functions as F

    got = [r["r"] for r in
           df.select(F.round("v", 6).alias("r")).collect()]
    want = [float(round6(x)) for x in xs]
    assert got == want


def test_half_up_integer_sibling():
    assert half_up(np.array([0.5, 1.5, 2.5, -0.5, -2.5])).tolist() == [
        1.0, 2.0, 3.0, -1.0, -3.0]
