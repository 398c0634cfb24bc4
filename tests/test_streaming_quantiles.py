"""Streaming windowed loghist sketch (streaming/quantiles.py): the
watermarked windowed bucket histogram over a closed feed equals its
batch twin bucket-for-bucket, both equal a pure-python recount of the
SAME bucket pin (int.bit_length gives the exact floor(log2) the SQL
computes via the corrected guess), and the per-window quantile read-off
matches the batch operator applied per window — the sketch's bucket-add
mergeability is exactly streaming-aggregation associativity."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from search_engine_spark.operators.sketch import LOGHIST_K, LOGHIST_SCALE


def _py_bucket(x: float, scale: int = LOGHIST_SCALE, k: int = LOGHIST_K) -> int:
    xv = abs(x) * float(scale) + 0.5
    v = int(math.floor(xv)) if xv <= float(1 << 55) else (1 << 55)
    if v == 0:
        return 0
    e = v.bit_length() - 1  # exact floor(log2(v)) for integers
    pe = 1 << e
    i = ((v - pe) * k) // pe
    b = 1 + e * k + i
    return -b if x < 0 else b


@pytest.fixture(scope="module")
def values_pdf():
    rng = np.random.RandomState(13)
    n = 900
    base = pd.Timestamp("2024-01-01")
    return pd.DataFrame({
        "ts": pd.Series(
            [base + pd.Timedelta(seconds=int(s))
             for s in np.sort(rng.randint(0, 3 * 3600, n))],
            dtype="datetime64[us]",
        ),
        "event_type": rng.choice(["click", "view"], n),
        "value": np.round(rng.lognormal(2.0, 2.0, n), 2),
    })


def _expected_hist(pdf: pd.DataFrame) -> set:
    rows: dict = {}
    for ts, g, x in zip(pdf["ts"], pdf["event_type"], pdf["value"]):
        w = pd.Timestamp(ts).floor("h")
        key = (w, g, _py_bucket(float(x)))
        rows[key] = rows.get(key, 0) + 1
    return {(w, g, b, n) for (w, g, b), n in rows.items()}


def test_stream_equals_batch_equals_python(spark, values_pdf, tmp_path):
    import os

    from search_engine_spark.streaming.quantiles import (
        loghist_stream,
        loghist_windows_batch,
        windowed_quantiles,
    )
    from tests.test_streaming_sessions import _feed

    os.makedirs(f"{tmp_path}/in", exist_ok=True)
    pdf = values_pdf.sort_values("ts").reset_index(drop=True)
    mid = len(pdf) // 2
    sentinel = pdf.iloc[:1].copy()
    sentinel["ts"] = pd.Series(
        [pdf["ts"].max() + pd.Timedelta(days=30)], dtype="datetime64[us]"
    ).values
    sentinel["value"] = 1.0
    chunks = [pdf.iloc[:mid], pdf.iloc[mid:], sentinel]

    schema = "ts timestamp, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp_path}/in")
    )
    got_df = _feed(
        spark, loghist_stream(stream, watermark="1 minute"), "lh", tmp_path,
        chunks,
    )
    horizon = pd.Timestamp(pdf["ts"].max())
    got = {
        (pd.Timestamp(r["window_start"]), r["event_type"], r["bucket"],
         r["cnt"])
        for r in got_df.collect()
        if pd.Timestamp(r["window_start"]) <= horizon
    }
    want = _expected_hist(values_pdf)
    assert got == want and want

    sdf = spark.createDataFrame(values_pdf)
    batch = {
        (pd.Timestamp(r["window_start"]), r["event_type"], r["bucket"],
         r["cnt"])
        for r in loghist_windows_batch(sdf).collect()
    }
    assert batch == want

    # quantile read-off per emitted window == the batch sketch operator
    # applied to that window's rows alone (window = just another group)
    q = windowed_quantiles(loghist_windows_batch(sdf)).collect()
    assert q
    from search_engine_spark.operators.sketch import loghist_quantiles_from

    one = q[0]
    w0 = pd.Timestamp(one["window_start"])
    sub = values_pdf[
        values_pdf["ts"].dt.floor("h") == w0
    ]
    ref = (
        loghist_quantiles_from(
            spark.createDataFrame(sub), "value", ["event_type"]
        )
        .filter(f"event_type = '{one['event_type']}'")
        .collect()[0]
    )
    assert (one["p50"], one["p90"], one["p99"], one["n_rows"]) == (
        ref["p50"], ref["p90"], ref["p99"], ref["n_rows"]
    )
