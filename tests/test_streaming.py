"""Streaming ingest tests (SURVEY §2.10 mapping)."""

import shutil

import pytest

from fixtures.gen_corpus import gen_corpus


@pytest.fixture(scope="module")
def stream_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    src = base / "src"
    src.mkdir()
    return base, src


def test_stream_ingest_and_query(spark, stream_dirs):
    from donkey_spark.streaming import stream_ingest
    from donkey_spark.plans.query import Index
    base, src = stream_dirs
    pdf = gen_corpus(120, seed=7)
    # two "insert" waves land as separate files
    pdf.iloc[:60].to_parquet(src / "wave1.parquet", index=False)
    pdf.iloc[60:].to_parquet(src / "wave2.parquet", index=False)

    q = stream_ingest(spark, str(src), str(base / "idx"),
                      str(base / "ckpt"), trigger_once=True)
    q.awaitTermination(300)

    idx = Index(spark, str(base / "idx"))
    assert idx.n_docs == 120
    res = idx.search("def return", k=5).collect()
    assert len(res) == 5
    assert all(r["score"] > 0 for r in res)


def test_stream_restart_is_idempotent(spark, stream_dirs):
    """Re-running with the same checkpoint must not re-apply epochs."""
    from donkey_spark.streaming import stream_ingest
    from donkey_spark.plans.query import Index
    base, src = stream_dirs
    q = stream_ingest(spark, str(src), str(base / "idx"),
                      str(base / "ckpt"), trigger_once=True)
    q.awaitTermination(300)
    idx = Index(spark, str(base / "idx"))
    assert idx.n_docs == 120          # unchanged — no duplicate ingestion


def test_compact_restores_canonical_index(spark, stream_dirs, tmp_path):
    from donkey_spark.streaming import compact_index
    from donkey_spark.plans.query import Index
    base, src = stream_dirs
    corpus = spark.read.parquet(str(src))
    out = str(tmp_path / "compacted")
    info = compact_index(spark, corpus, out)
    assert info["n_docs"] == 120
    idx = Index(spark, out)
    res = idx.search("def return", k=5).collect()
    assert len(res) == 5
