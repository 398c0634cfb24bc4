"""Multi-format transcript ingestion (sources/io.py read_transcripts):
parquet / ORC / JSONL / CSV land the SAME rows under the pinned
TRANSCRIPTS schema (explicit schema, never inference), an index built
from a non-parquet source answers queries identically, and format
inference keys off the extension."""

from __future__ import annotations

import pandas as pd
import pytest

from search_engine_spark.schemas import TRANSCRIPTS
from search_engine_spark.sources.io import read_transcripts


@pytest.fixture(scope="module")
def small100(small_pdf):
    return (
        small_pdf.sort_values(["conv_id", "turn_idx"]).head(100)
        .reset_index(drop=True)
    )


def _norm(df):
    pdf = df.toPandas().sort_values(["conv_id", "turn_idx"])
    return pdf.reset_index(drop=True)


def test_formats_land_identical_rows(spark, small100, tmp_path):
    base = spark.createDataFrame(small100, TRANSCRIPTS)
    want = _norm(base)

    pq = f"{tmp_path}/t.parquet"
    small100.to_parquet(pq, index=False)
    orc = f"{tmp_path}/t.orc"
    base.coalesce(1).write.orc(orc)
    jl = f"{tmp_path}/t.jsonl"
    base.coalesce(1).write.json(jl)
    csv = f"{tmp_path}/t.csv"
    base.coalesce(1).write.option("header", "true").option(
        "timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS"
    ).csv(csv)

    for path in (pq, orc, jl, csv):
        got = read_transcripts(spark, path)  # format inferred from ext
        assert got.schema == TRANSCRIPTS, path
        g = _norm(got)
        pd.testing.assert_frame_equal(g, want, check_dtype=False)

    with pytest.raises(ValueError, match="unsupported"):
        read_transcripts(spark, pq, fmt="avro-nope")


def test_index_from_jsonl_source_matches_parquet(
    spark, small100, tmp_path, oracle_idx
):
    """End-to-end: build postings from a JSONL ingest and answer a
    query — identical rows to the same build from parquet (the source
    format must never leak into the engine)."""
    from search_engine_spark.operators.build import build_all
    from search_engine_spark.operators.docs import build_docs

    base = spark.createDataFrame(small100, TRANSCRIPTS)
    jl = f"{tmp_path}/src.jsonl"
    base.coalesce(1).write.json(jl)

    def postings(src):
        docs = build_docs(src, with_lemmas=True)
        pf, _, _ = build_all(docs)
        return sorted(map(tuple, pf.collect()))

    pa = postings(read_transcripts(spark, jl))
    pb = postings(base)
    assert pa == pb and pa
