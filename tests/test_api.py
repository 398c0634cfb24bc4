"""SearchEngine facade: the reference's four API endpoints end-to-end."""

from __future__ import annotations

import pytest

from oracle import oracle as orc
from search_engine_spark.api import SearchEngine


@pytest.fixture(scope="module")
def engine(spark, copy_index):
    return SearchEngine(spark, copy_index["index"])


def test_start_indexing_builds(spark, small_pdf, tmp_path_factory):
    """start_indexing endpoint itself (tiny corpus — the big build is
    covered by the shared fixture)."""
    base = tmp_path_factory.mktemp("api_build")
    corpus = str(base / "tr.parquet")
    small_pdf.head(200).to_parquet(corpus, index=False, row_group_size=128)
    eng = SearchEngine.start_indexing(
        spark, corpus, str(base / "idx"), n_buckets=2
    )
    assert eng.statistics()["statistics"]["total"]["pages"] == 200


def test_search_endpoint(engine, oracle_idx):
    from tests.test_spark_engine import RARE

    resp = engine.search(RARE, limit=5)
    assert resp["result"] is True and resp["data"]
    exp = orc.search(oracle_idx, RARE, k=5)
    assert [d["relevance"] for d in resp["data"][:len(exp)]] == [s for _, s in exp]
    item = resp["data"][0]
    assert set(item) == {"site", "siteName", "uri", "title", "snippet", "relevance"}
    assert "#" in item["uri"] and item["site"].startswith("scope-")


def test_search_pagination_and_cache(engine):
    from tests.test_spark_engine import MID

    full = engine.search(MID, offset=0, limit=10)
    assert engine._cache_rows is not None  # cache primed
    page2 = engine.search(MID, offset=5, limit=5)  # served from cache
    assert page2["data"] == full["data"][5:10]


def test_search_reftf_scorer(engine, oracle_idx):
    from tests.test_spark_engine import RARE

    resp = engine.search(RARE, limit=5, scorer="reftf")
    exp = orc.search(oracle_idx, RARE, k=5, scorer="reftf")
    assert [d["relevance"] for d in resp["data"][:len(exp)]] == [s for _, s in exp]


def test_statistics_endpoint(engine, oracle_idx):
    resp = engine.statistics()
    st = resp["statistics"]
    assert st["total"]["sites"] == 4
    assert st["total"]["pages"] == len(oracle_idx.doc_len)
    assert st["total"]["lemmas"] == len(oracle_idx.lemma_df)
    assert len(st["detailed"]) == 4


def test_index_turns_endpoint(engine, spark, small_pdf):
    from search_engine_spark.schemas import TRANSCRIPTS

    mod = small_pdf.copy()
    v = mod.index[123]
    mod.loc[v, "text"] = "api upsert xylophone probe"
    delta = spark.createDataFrame(mod.loc[[v]], schema=TRANSCRIPTS)
    resp = engine.index_turns(delta)
    assert resp["result"] is True and resp["updated_turns"] == 1
    found = engine.search("xylophone", limit=5)
    assert found["data"] and "xylophone" in found["data"][0]["snippet"]
