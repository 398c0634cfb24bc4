"""Shared Spark fixtures. One session per test run (local mode)."""

from __future__ import annotations

import pytest

from oracle import oracle as orc
from search_engine_spark.sources.corpus import generate_transcripts


@pytest.fixture(scope="session")
def spark():
    from search_engine_spark.sources.session import get_spark

    s = get_spark("tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_pdf():
    """'small'-ish fixture corpus: 300 convs ≈ 2.1k turns (deterministic)."""
    return generate_transcripts(300, seed=42)


@pytest.fixture(scope="session")
def oracle_idx(small_pdf):
    return orc.build_index(small_pdf)


@pytest.fixture(scope="session")
def transcripts_sdf(spark, small_pdf):
    from search_engine_spark.schemas import TRANSCRIPTS

    return spark.createDataFrame(small_pdf, schema=TRANSCRIPTS)


@pytest.fixture(scope="session")
def base_index_dir(spark, small_pdf, tmp_path_factory):
    """ONE checkpointed index build over the shared corpus, reused across
    test modules. Read-only — mutating tests copy the directory
    (copy_index) instead of rebuilding (~1 min saved per module)."""
    from search_engine_spark.plans.job import IndexBuildJob

    base = tmp_path_factory.mktemp("shared_idx")
    corpus = str(base / "tr.parquet")
    small_pdf.to_parquet(corpus, index=False, row_group_size=512)
    out = str(base / "idx")
    IndexBuildJob(
        spark, corpus, out, n_buckets=4, docs_per_shard=256, run_id="shared"
    ).run()
    return {"corpus": corpus, "index": out}


@pytest.fixture(scope="module")
def copy_index(base_index_dir, tmp_path_factory):
    """Private mutable copy of the shared index (cheap file copy), one
    per test module."""
    import shutil

    dst = str(tmp_path_factory.mktemp("idxcopy") / "idx")
    shutil.copytree(base_index_dir["index"], dst)
    return {"corpus": base_index_dir["corpus"], "index": dst}


@pytest.fixture(scope="session")
def engine_tables(transcripts_sdf):
    from search_engine_spark.operators.build import build_all
    from search_engine_spark.operators.docs import build_docs

    docs_tok = build_docs(transcripts_sdf, with_lemmas=True).cache()
    pf, ls, ds = build_all(docs_tok)
    pf, ls, ds = pf.cache(), ls.cache(), ds.cache()
    return {"docs": docs_tok, "postings_flat": pf, "lemma_stats": ls, "doc_stats": ds}
