"""Operator + end-to-end tests on Spark (SURVEY §5.2 layers 3–5).

Small fixture corpus → build index → query → rank-identical to the
pure-Python oracle engine (tests/oracle_bm25.py), plus determinism and
resume checks.
"""

import shutil

import numpy as np
import pandas as pd
import pytest

from fixtures.gen_corpus import gen_corpus, gen_ref_hashes
from tests.oracle_bm25 import OracleIndex, tokenize as oracle_tokenize

N_DOCS = 300


@pytest.fixture(scope="module")
def corpus_pdf():
    return gen_corpus(N_DOCS, seed=42)


@pytest.fixture(scope="module")
def corpus_df(spark, corpus_pdf):
    return spark.createDataFrame(corpus_pdf)


@pytest.fixture(scope="module")
def built_index(spark, corpus_df, tmp_path_factory):
    from donkey_spark.plans.build import build_index
    out = str(tmp_path_factory.mktemp("index"))
    info = build_index(spark, corpus_df, out, range_size=64)
    return out, info


@pytest.fixture(scope="module")
def oracle(corpus_pdf):
    ordered = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index()
    return OracleIndex(list(enumerate(ordered["content"])))


# ---------- tokenizer (op 10) ------------------------------------------------

def test_tokenizer_pandas_matches_oracle(spark, corpus_pdf):
    from pyspark.sql import functions as F
    from donkey_spark.functions.tokenize import (tokenize_expr,
                                                 tokenize_pandas_udf)
    df = spark.createDataFrame(corpus_pdf.head(50))
    got = (df.select("content", tokenize_pandas_udf("content").alias("a"),
                     tokenize_expr(F.col("content")).alias("b")).collect())
    for r in got:
        expect = oracle_tokenize(r["content"])
        assert r["a"] == expect          # Arrow UDF == frozen §T oracle
        assert r["b"] == expect          # JVM twin == same (NFC-clean input)


def test_tokenizer_edge_docs(spark):
    from donkey_spark.functions.tokenize import tokenize_pandas_udf
    edge = ["", "   \n\t  ", "(((|||)))==->", "x" * 70 + " ok_token",
            "naïve café 日本語 x9", None]
    df = spark.createDataFrame([(c,) for c in edge], "content string")
    got = [r["t"] for r in
           df.select(tokenize_pandas_udf("content").alias("t")).collect()]
    assert got[0] == [] and got[1] == [] and got[2] == []
    assert got[3] == ["ok_token"]            # 70-char token dropped (§T.3)
    assert got[4] == ["na", "ve", "caf", "x9"]
    assert got[5] == []


# ---------- doc ids (op 9) ----------------------------------------------------

def test_doc_ids_dense_and_partition_invariant(spark, corpus_df):
    from donkey_spark.operators.doc_ids import assign_doc_ids
    from pyspark.sql import functions as F

    expected = (corpus_df.toPandas()
                .sort_values(["repo", "path", "commit"]).reset_index(drop=True))
    for n_part in (1, 3, 7):
        got = (assign_doc_ids(corpus_df, num_partitions=n_part)
               .select("doc_id", "repo", "path", "commit")
               .toPandas().sort_values("doc_id").reset_index(drop=True))
        assert list(got["doc_id"]) == list(range(len(expected)))
        pd.testing.assert_frame_equal(
            got[["repo", "path", "commit"]],
            expected[["repo", "path", "commit"]])


# ---------- sha256 invariant (op 2) -------------------------------------------

def test_sha256_invariant(spark, corpus_pdf, corpus_df):
    from donkey_spark.sources.corpus import check_sha256
    ref = spark.createDataFrame(gen_ref_hashes(corpus_pdf))
    assert check_sha256(corpus_df, ref) == 0
    bad = ref.toPandas()
    bad.loc[0, "sha256"] = "0" * 64
    with pytest.raises(ValueError, match="sha256 invariant"):
        check_sha256(corpus_df, spark.createDataFrame(bad))


# ---------- build + rank identity (ops 22/23/26-28/35/36, K6/K7) ---------------

def test_build_info(built_index):
    _, info = built_index
    assert info["n_docs"] == N_DOCS
    assert info["n_postings"] > 0 and info["avgdl"] > 0


def test_rank_identity_vs_oracle(spark, built_index, oracle):
    from donkey_spark.plans.query import Index
    out, _ = built_index
    idx = Index(spark, out)
    # engine stats must equal oracle stats exactly
    assert idx.n_docs == oracle.n_docs
    assert abs(idx.avgdl - oracle.avgdl) < 1e-9

    queries = [
        (0, "def return", 10),
        (1, "spark", 10),
        (2, "class import spark select", 5),
        (3, "loop_token", 10),
        (4, "zz_totally_oov", 10),
        (5, "filter zz_partial_oov", 10),
        (6, "def", 100),
    ]
    got = idx.search_batch(queries).collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, text, k in queries:
        expect = oracle.search(text, k)
        rows = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in rows] == [d for _, d, _ in expect], \
            f"doc ids differ on query {qid}: {text!r}"
        np.testing.assert_allclose([r["score"] for r in rows],
                                   [s for _, _, s in expect], atol=1e-9)
        assert [r["rank"] for r in rows] == [rk for rk, _, _ in expect]


def test_index_determinism_across_layouts(spark, corpus_df, tmp_path_factory):
    """BASELINE.md: identical segment content across input order, partition
    count, and chunk count."""
    from donkey_spark.operators.postings import segments_digest
    from donkey_spark.plans.build import build_index

    digests = []
    variants = [
        corpus_df.repartition(2),
        corpus_df.orderBy("lang").repartition(5),   # shuffled input order
    ]
    for i, var in enumerate(variants):
        out = str(tmp_path_factory.mktemp(f"det{i}"))
        build_index(spark, var, out, range_size=64,
                    n_chunks=1 if i == 0 else 3)
        seg = spark.read.option("basePath", f"{out}/segments").parquet(
            f"{out}/segments")
        digests.append(segments_digest(seg.drop("chunk", "bucket")))
        shutil.rmtree(out)
    assert digests[0] == digests[1]


def test_resume_skips_done_chunks(spark, corpus_df, tmp_path_factory):
    from donkey_spark.plans.build import build_index
    out = str(tmp_path_factory.mktemp("resume"))
    info1 = build_index(spark, corpus_df, out, range_size=64, n_chunks=3)
    assert info1["chunks_built"] == info1["n_chunks"]
    info2 = build_index(spark, corpus_df, out, range_size=64, n_chunks=3,
                        resume=True)
    assert info2["chunks_built"] == 0
    assert info2["chunks_skipped"] == info1["n_chunks"]
    assert info2["n_postings"] == info1["n_postings"]


def test_pfor_codec_end_to_end(spark, corpus_df, oracle, tmp_path_factory):
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    out = str(tmp_path_factory.mktemp("pfor"))
    build_index(spark, corpus_df, out, range_size=64, codec="pfor")
    idx = Index(spark, out)
    got = idx.search_batch([(0, "def return spark", 10)]).collect()
    expect = oracle.search("def return spark", 10)
    assert [r["doc_id"] for r in got] == [d for _, d, _ in expect]
    np.testing.assert_allclose([r["score"] for r in got],
                               [s for _, _, s in expect], atol=1e-9)


def test_conjunctive_and_rank_identity_vs_oracle(spark, built_index, oracle):
    """op 32 fast path: engine AND mode == oracle conjunctive scoring,
    including the empty-result cases (OOV conjunct, never-co-occurring)."""
    from donkey_spark.plans.query import Index
    out, _ = built_index
    idx = Index(spark, out)
    queries = [
        (0, "def return", 10),
        (1, "class import spark", 10),
        (2, "def zz_totally_oov", 10),      # OOV conjunct → empty
        (3, "spark select", 100),
        (4, "def", 10),                     # single-term AND == OR
    ]
    got = idx.search_batch(queries, mode="and").collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, text, k in queries:
        expect = oracle.search_and(text, k)
        rows = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in rows] == [d for _, d, _ in expect], \
            f"doc ids differ on AND query {qid}: {text!r}"
        np.testing.assert_allclose([r["score"] for r in rows],
                                   [s for _, _, s in expect], atol=1e-9)
    # AND results are a subset of OR results' doc set for the same terms
    assert all(r["score"] > 0 for r in got)


def test_fresh_rebuild_clears_stale_chunks(spark, corpus_df,
                                           tmp_path_factory):
    """ADVICE r1: rebuilding into an existing out_dir with fewer chunks
    must not leave stale chunk dirs in the finalize union."""
    from donkey_spark.plans.build import build_index
    out = str(tmp_path_factory.mktemp("rebuild"))
    info1 = build_index(spark, corpus_df, out, range_size=64, n_chunks=4)
    assert info1["n_chunks"] > 1
    info2 = build_index(spark, corpus_df, out, range_size=64)  # 1 chunk
    assert info2["n_chunks"] == 1
    assert info2["n_postings"] == info1["n_postings"]
    chunks = {str(r["chunk"]) for r in
              spark.read.option("basePath", f"{out}/segments")
              .parquet(f"{out}/segments").select("chunk").distinct()
              .collect()}
    assert chunks == {"0"}


def test_local_fast_path_identical_to_distributed(spark, built_index):
    """The driver-local pyarrow scoring path must be bit-identical to the
    distributed applyInPandas path (same kernels, same merge)."""
    from donkey_spark.plans.query import Index
    out, _ = built_index
    fast = Index(spark, out)                       # local path (small index)
    dist = Index(spark, out, local_bytes=0)        # force distributed
    queries = [(0, "def return", 10), (1, "class import spark select", 5),
               (2, "zz_totally_oov", 10)]
    for mode in ("or", "and"):
        a = sorted(tuple(r) for r in
                   fast.search_batch(queries, mode=mode).collect())
        b = sorted(tuple(r) for r in
                   dist.search_batch(queries, mode=mode).collect())
        assert a == b, mode


def test_doc_ids_dedupe_with_null_keys(spark):
    """dedupe=True with NULL key columns: the per-partition offset count
    must include NULL-keyed groups (count_distinct over bare columns drops
    them → overlapping doc_id ranges, ADVICE r2)."""
    from donkey_spark.operators.doc_ids import assign_doc_ids
    rows = ([("r1", None, "c1"), ("r1", None, "c1"),    # dup NULL-keyed PK
             (None, None, None)]
            + [(f"r{i % 5}", f"p{i}", None) for i in range(40)])
    df = spark.createDataFrame(rows, "repo string, path string, commit string")
    ids, n_keys, n_rows = assign_doc_ids(df, num_partitions=5, dedupe=True)
    got = sorted(r["doc_id"] for r in ids.select("doc_id").collect())
    assert n_rows == 43
    assert n_keys == 42                         # one duplicated key dropped
    assert got == list(range(42))               # dense, no overlaps


def test_resume_failure_injection_rebuilds_with_attempt_2(
        spark, corpus_df, tmp_path_factory):
    """Simulate a crash between a chunk's segment write and its manifest
    commit (delete the 'done' row, keep the 'start' row and the segment
    dir): resume must rebuild EXACTLY that chunk, journal it as attempt=2,
    and reproduce the same index."""
    import glob as _glob
    import os as _os
    from donkey_spark.plans.build import build_index
    out = str(tmp_path_factory.mktemp("failinj"))
    info1 = build_index(spark, corpus_df, out, range_size=64, n_chunks=3)
    assert info1["n_chunks"] == 3
    victims = _glob.glob(f"{out}/manifest/part-job-0-1-d1.parquet")
    assert len(victims) == 1
    _os.remove(victims[0])

    info2 = build_index(spark, corpus_df, out, range_size=64, n_chunks=3,
                        resume=True)
    assert info2["chunks_built"] == 1
    assert info2["chunks_skipped"] == 2
    assert info2["n_postings"] == info1["n_postings"]
    m = spark.read.parquet(f"{out}/manifest")
    rows = {(r["chunk"], r["status"], r["attempt"]) for r in m.collect()}
    assert (1, "done", 2) in rows           # the rebuilt chunk, attempt 2
    assert (1, "start", 2) in rows
    assert (0, "done", 1) in rows and (2, "done", 1) in rows
