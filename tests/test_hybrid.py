"""Hybrid RRF retrieval tests (pipeline/hybrid.py). The end-to-end
fusion is additionally DuckDB-checked by the ``hybrid_topk`` contract
pair; these cover the fusion arithmetic against a transparent python
oracle and the branch/weight plumbing."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _rows(df):
    return [tuple(r) for r in df.collect()]


def _py_rrf(lists, rrf_k=60, weights=None):
    """Transparent oracle: lists = {name: [ids in rank order]}."""
    weights = weights or {}
    score = {}
    for name, ids in lists.items():
        w = weights.get(name, 1.0)
        for i, d in enumerate(ids, 1):
            score[d] = score.get(d, 0.0) + w / (rrf_k + i)
    return sorted(score, key=lambda d: (-round(score[d], 6), d))


def test_rrf_fuse_matches_python_oracle(spark):
    from donkey_spark.pipeline.hybrid import rrf_fuse
    a_ids, b_ids = [3, 1, 4, 1000], [1, 5, 9, 2, 6]
    a = spark.createDataFrame([(d, i + 1) for i, d in enumerate(a_ids)],
                              "doc_id long, rank int")
    b = spark.createDataFrame([(d, i + 1) for i, d in enumerate(b_ids)],
                              "doc_id long, rank int")
    got = _rows(rrf_fuse([("a", a), ("b", b)], k=10))
    want_order = _py_rrf({"a": a_ids, "b": b_ids})
    assert [r[1] for r in got] == want_order
    # doc 1 (rank 2 in a, rank 1 in b) fuses both contributions and wins
    assert got[0][1] == 1
    assert got[0][2] == round(1 / 62 + 1 / 61, 6)
    assert got[0][3:] == (2, 1)          # (a_rank, b_rank)
    # absent-from-one-list rank reports 0
    by_id = {r[1]: r for r in got}
    assert by_id[3][3:] == (1, 0)
    assert by_id[9][3:] == (0, 3)


def test_rrf_fuse_weights_and_guards(spark):
    from donkey_spark.pipeline.hybrid import rrf_fuse
    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank int")
    # weight 0 on branch a reduces to branch b's order (+ zero-score tail)
    got = _rows(rrf_fuse([("a", a), ("b", b)], k=10,
                         weights={"a": 0.0}))
    assert [r[1] for r in got] == [2, 3, 1]
    with pytest.raises(ValueError):
        rrf_fuse([], k=5)
    with pytest.raises(ValueError):
        rrf_fuse([("x", a), ("x", b)], k=5)


@pytest.fixture(scope="module")
def bm25_idx(spark, tmp_path_factory):
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    from donkey_spark.sources import documents_as_corpus
    out = str(tmp_path_factory.mktemp("hyb") / "idx")
    build_index(spark, documents_as_corpus(spark, SF), out)
    return Index(spark, out)


def test_hybrid_topk_fuses_both_branches(spark, bm25_idx, tmp_path):
    from donkey_spark.pipeline.hybrid import hybrid_topk, ranked_by
    from donkey_spark.pipeline.similarity import (build_ann_index,
                                                  ann_topk)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    probe = [float(x) for x in emb.where(F.col("vec_id") == 0)
             .collect()[0]["embedding"]]
    ann_dir = str(tmp_path / "ann")
    build_ann_index(emb, ann_dir, n_tables=4, n_planes=4)
    got = _rows(hybrid_topk(
        bm25_idx, "spark join filter", probe, ann_dir=ann_dir, k=10,
        depth=20, ann_opts={"n_tables": 4, "n_planes": 4}))
    assert len(got) == 10
    # python-oracle the fusion from the two engine rankings
    lex = [r["doc_id"] for r in ranked_by(
        bm25_idx.search("spark join filter", k=20)
        .select("doc_id", F.round(F.col("score"), 6).alias("s")),
        [F.desc("s")], "doc_id").orderBy("rank").collect()]
    sem = [r["vec_id"] for r in
           ann_topk(spark, ann_dir, probe, k=20, n_tables=4,
                    n_planes=4).collect()]
    want = _py_rrf({"bm25": lex, "ann": sem})[:10]
    assert [r[1] for r in got] == want
    # both branches contributed members to the fused list
    ids = {r[1] for r in got}
    assert ids & set(lex) and ids & set(sem)


def test_hybrid_topk_ann_kinds_agree_at_full_recall(spark, bm25_idx,
                                                    tmp_path):
    """With exhaustive vector branches (IVF at nprobe=n_lists, exact
    brute force) the semantic ranking is identical, so the fused lists
    must be identical too; unknown kinds raise."""
    from donkey_spark.pipeline.hybrid import hybrid_topk
    from donkey_spark.pipeline.ivf import build_ivf_index
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    probe = [float(x) for x in emb.where(F.col("vec_id") == 0)
             .collect()[0]["embedding"]]
    ivf_dir = str(tmp_path / "ivf")
    build_ivf_index(emb, ivf_dir, n_lists=4, n_iters=1)
    via_ivf = _rows(hybrid_topk(bm25_idx, "spark join filter", probe,
                                ann_dir=ivf_dir, ann="ivf", k=10,
                                depth=20, ann_opts={"nprobe": 4}))
    via_exact = _rows(hybrid_topk(bm25_idx, "spark join filter", probe,
                                  ann="exact", vectors=emb, k=10,
                                  depth=20))
    assert via_ivf == via_exact
    with pytest.raises(ValueError):
        hybrid_topk(bm25_idx, "x", probe, ann="bogus")
    with pytest.raises(ValueError):
        hybrid_topk(bm25_idx, "x", probe, ann="exact")  # vectors missing


def test_hybrid_exact_branch_passes_filters_and_exclude(spark, bm25_idx):
    """r5 review: ann_opts pass-through must hold on the exact branch
    too (it crashed with TypeError on filters/exclude before)."""
    from donkey_spark.pipeline.hybrid import hybrid_topk
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    probe = [float(x) for x in emb.where(F.col("vec_id") == 0)
             .collect()[0]["embedding"]]
    meta = emb.select("vec_id", (F.col("vec_id") % 2 == 0).alias("even"))
    got = _rows(hybrid_topk(
        bm25_idx, "spark join filter", probe, ann="exact", vectors=emb,
        k=10, depth=20,
        ann_opts={"filters": {"even": True}, "metadata": meta,
                  "exclude": [0]}))
    assert len(got) == 10
    # the ANN branch contributed only even, non-excluded ids
    ann_members = [r[1] for r in got if r[4] > 0]   # ann_rank column
    assert ann_members and all(d % 2 == 0 and d != 0
                               for d in ann_members)
