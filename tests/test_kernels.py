"""Kernel unit tests (SURVEY §5.2 layer 1) — no Spark.

Round-trips for K1–K3 on the FIXTURES.md §6 posting_arrays shapes; K6 BM25
against hand computation; K7 block-max scorer against the brute-force oracle
on 200 random corpora.
"""

import numpy as np
import pytest

from donkey_spark.config import BM25_B, BM25_K1
from donkey_spark.kernels.varint import (
    delta_decode, delta_encode, varint_decode, varint_encode)
from donkey_spark.kernels.pfor import pfor_decode, pfor_encode
from donkey_spark.kernels.blocks import build_blocks, decode_doc_ids, decode_tfs
from donkey_spark.kernels.bm25 import brute_force_topk, idf, tf_part
from donkey_spark.kernels.wand import TermBlocks, score_range_topk

RNG = np.random.default_rng(42)

EDGE_ARRAYS = [
    np.array([], dtype=np.uint64),
    np.array([0], dtype=np.uint64),
    np.array([1], dtype=np.uint64),
    np.array([127, 128], dtype=np.uint64),
    np.arange(129, dtype=np.uint64),
    np.array([0, 1, 2**20, 2**20 + 1, 2**31 - 1, 2**31, 2**40], dtype=np.uint64),
    np.full(1000, 7, dtype=np.uint64),
    np.array([2**63 - 1, 2**63, 2**64 - 1], dtype=np.uint64),
]


@pytest.mark.parametrize("arr", EDGE_ARRAYS, ids=range(len(EDGE_ARRAYS)))
def test_varint_roundtrip_edges(arr):
    out = varint_decode(varint_encode(arr))
    np.testing.assert_array_equal(out, arr)


def test_varint_roundtrip_random():
    for _ in range(50):
        n = int(RNG.integers(0, 5000))
        a = RNG.integers(0, 2**62, size=n, dtype=np.uint64)
        np.testing.assert_array_equal(varint_decode(varint_encode(a)), a)


def test_delta_roundtrip():
    for n in (0, 1, 2, 127, 128, 129, 1000, 100_000):
        ids = np.sort(RNG.choice(2**31, size=n, replace=False)).astype(np.uint64)
        np.testing.assert_array_equal(delta_decode(delta_encode(ids)), ids)


@pytest.mark.parametrize("arr", EDGE_ARRAYS, ids=range(len(EDGE_ARRAYS)))
def test_pfor_roundtrip_edges(arr):
    np.testing.assert_array_equal(pfor_decode(pfor_encode(arr)), arr)


def test_pfor_roundtrip_random_skewed():
    for _ in range(50):
        n = int(RNG.integers(1, 3000))
        # mostly-small values with a heavy-tail of exceptions — PFor's case
        a = RNG.zipf(1.5, size=n).astype(np.uint64)
        a[RNG.random(n) < 0.05] = RNG.integers(2**40, 2**50)
        np.testing.assert_array_equal(pfor_decode(pfor_encode(a)), a)


def test_pfor_smaller_than_varint_on_dense_deltas():
    deltas = RNG.integers(1, 16, size=4096, dtype=np.uint64)
    deltas[RNG.random(4096) < 0.02] = 2**30
    assert len(pfor_encode(deltas)) < len(varint_encode(deltas))


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_block_roundtrip(codec):
    for n in (1, 2, 127, 128, 129, 1000):
        ids = np.sort(RNG.choice(10**7, size=n, replace=False)).astype(np.int64)
        tfs = RNG.integers(1, 500, size=n).astype(np.int64)
        dls = RNG.integers(1, 5000, size=n).astype(np.int64)
        rows = list(build_blocks(ids, tfs, dls, avgdl=300.0, codec=codec))
        assert sum(r["n_docs"] for r in rows) == n
        got_ids = np.concatenate([decode_doc_ids(r["docids_blob"], codec) for r in rows])
        got_tfs = np.concatenate([decode_tfs(r["tfs_blob"], codec) for r in rows])
        got_dls = np.concatenate([decode_tfs(r["dls_blob"], codec) for r in rows])
        np.testing.assert_array_equal(got_ids, ids)
        np.testing.assert_array_equal(got_tfs, tfs)
        np.testing.assert_array_equal(got_dls, dls)
        for r in rows:
            bi = decode_doc_ids(r["docids_blob"], codec)
            bt = decode_tfs(r["tfs_blob"], codec)
            assert r["first_doc_id"] == bi[0] and r["max_doc_id"] == bi[-1]
            assert r["max_tf"] == bt.max() and r["sum_tf"] == bt.sum()
            expect_max = (tf_part(bt, dls[np.searchsorted(ids, bi)], 300.0)).max()
            assert np.isclose(r["block_max_tfpart"], expect_max, atol=1e-12)


def test_build_blocks_rejects_unsorted():
    with pytest.raises(ValueError):
        list(build_blocks(np.array([3, 1]), np.array([1, 1]), np.array([5, 5]), 5.0))


def test_bm25_hand_computed():
    # tiny_corpus: N=6 docs, term "spark" df=2, doc dl=10, tf=3, avgdl=8
    w = idf(6, 2)
    assert np.isclose(w, np.log(1 + (6 - 2 + 0.5) / (2 + 0.5)))
    part = tf_part(np.array([3]), np.array([10]), 8.0)
    denom = 3 + BM25_K1 * (1 - BM25_B + BM25_B * 10 / 8.0)
    assert np.isclose(part[0], 3 * (BM25_K1 + 1) / denom)


def _make_term_blocks(ids, tfs, dls_full, avgdl, n_docs, codec="varint"):
    rows = list(build_blocks(ids, tfs, dls_full[ids], avgdl, block_size=8,
                             codec=codec))
    for r in rows:
        r["codec"] = codec
    return rows


def test_wand_matches_brute_force_200_corpora():
    for trial in range(200):
        rng = np.random.default_rng(1000 + trial)
        n_docs = int(rng.integers(5, 400))
        vocab = [f"t{j}" for j in range(int(rng.integers(3, 30)))]
        dls = rng.integers(1, 200, size=n_docs).astype(np.int64)
        avgdl = float(dls.mean())
        postings = {}
        for t in vocab:
            df = int(rng.integers(1, n_docs + 1))
            ids = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
            tfs = rng.integers(1, 20, size=df).astype(np.int64)
            postings[t] = (ids, tfs)
        nq = int(rng.integers(1, 4))
        qterms = list(rng.choice(vocab, size=nq, replace=False)) + ["oov_term"]
        k = int(rng.integers(1, 15))
        exp_ids, exp_sc = brute_force_topk(qterms, postings, dls, n_docs, avgdl, k)
        terms = []
        for t in qterms:
            if t not in postings:
                continue
            ids, tfs = postings[t]
            w = idf(n_docs, ids.size)
            terms.append(TermBlocks(w, _make_term_blocks(ids, tfs, dls, avgdl,
                                                         n_docs)))
        got_ids, got_sc = score_range_topk(0, n_docs, terms, avgdl, k)
        np.testing.assert_array_equal(got_ids, exp_ids)
        np.testing.assert_allclose(got_sc, exp_sc, atol=1e-9)


def test_wand_actually_skips_blocks():
    rng = np.random.default_rng(7)
    n_docs = 100_000
    dls = rng.integers(50, 150, size=n_docs).astype(np.int64)
    avgdl = float(dls.mean())
    hot_ids = np.arange(n_docs, dtype=np.int64)      # stopword-ish term
    hot_tfs = np.ones(n_docs, dtype=np.int64)
    rare_ids = np.sort(rng.choice(n_docs, 50, replace=False)).astype(np.int64)
    rare_tfs = np.full(50, 30, dtype=np.int64)
    terms = [
        TermBlocks(idf(n_docs, 50),
                   _make_term_blocks(rare_ids, rare_tfs, dls, avgdl, n_docs)),
        TermBlocks(idf(n_docs, n_docs),
                   _make_term_blocks(hot_ids, hot_tfs, dls, avgdl, n_docs)),
    ]
    stats: dict = {}
    score_range_topk(0, n_docs, terms, avgdl, 10, stats=stats)
    assert stats.get("blocks_skipped", 0) > 0


def test_pfor_rejects_oversized_block():
    with pytest.raises(ValueError, match="u16 header limit"):
        pfor_encode(np.arange(70_000, dtype=np.uint64))


def _brute_force_and(qterms, postings, dls, n_docs, avgdl, k):
    """Conjunctive oracle: score only docs hit by EVERY indexed query term;
    any unindexed term → empty."""
    if any(t not in postings for t in qterms):
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    acc = np.zeros(n_docs)
    cnt = np.zeros(n_docs, dtype=np.int64)
    for t in qterms:
        ids, tfs = postings[t]
        w = idf(n_docs, ids.size)
        acc[ids] += w * tf_part(tfs, dls[ids], avgdl)
        cnt[ids] += 1
    hit = np.flatnonzero(cnt == len(qterms))
    order = sorted(hit, key=lambda d: (-acc[d], d))[:k]
    return (np.array(order, dtype=np.int64),
            np.array([acc[d] for d in order]))


def test_and_kernel_matches_brute_force_200_corpora():
    from donkey_spark.kernels.wand import score_range_topk_and
    for trial in range(200):
        rng = np.random.default_rng(5000 + trial)
        n_docs = int(rng.integers(5, 400))
        vocab = [f"t{j}" for j in range(int(rng.integers(3, 20)))]
        dls = rng.integers(1, 200, size=n_docs).astype(np.int64)
        avgdl = float(dls.mean())
        postings = {}
        for t in vocab:
            df = int(rng.integers(1, n_docs + 1))
            ids = np.sort(rng.choice(n_docs, size=df,
                                     replace=False)).astype(np.int64)
            tfs = rng.integers(1, 20, size=df).astype(np.int64)
            postings[t] = (ids, tfs)
        nq = int(rng.integers(1, 4))
        qterms = list(rng.choice(vocab, size=nq, replace=False))
        if trial % 5 == 0:
            qterms.append("oov_term")        # unindexed conjunct → empty
        k = int(rng.integers(1, 15))
        exp_ids, exp_sc = _brute_force_and(qterms, postings, dls, n_docs,
                                           avgdl, k)
        terms = [TermBlocks(idf(n_docs, postings[t][0].size),
                            _make_term_blocks(postings[t][0], postings[t][1],
                                              dls, avgdl, n_docs))
                 for t in qterms if t in postings]
        n_present = len([t for t in qterms if t in postings])
        got_ids, got_sc = score_range_topk_and(
            0, n_docs, terms, avgdl, k,
            n_present if n_present == len(qterms) else len(qterms))
        np.testing.assert_array_equal(got_ids, exp_ids)
        np.testing.assert_allclose(got_sc, exp_sc, atol=1e-9)


def test_and_kernel_skips_blocks_outside_rarest_span():
    from donkey_spark.kernels.wand import score_range_topk_and
    rng = np.random.default_rng(9)
    n_docs = 100_000
    dls = rng.integers(50, 150, size=n_docs).astype(np.int64)
    avgdl = float(dls.mean())
    hot_ids = np.arange(n_docs, dtype=np.int64)
    hot_tfs = np.ones(n_docs, dtype=np.int64)
    rare_ids = np.sort(rng.choice(2_000, 30, replace=False)).astype(np.int64)
    rare_tfs = np.full(30, 5, dtype=np.int64)      # rare docs all < 2000
    terms = [
        TermBlocks(idf(n_docs, 30),
                   _make_term_blocks(rare_ids, rare_tfs, dls, avgdl, n_docs)),
        TermBlocks(idf(n_docs, n_docs),
                   _make_term_blocks(hot_ids, hot_tfs, dls, avgdl, n_docs)),
    ]
    stats: dict = {}
    ids, _ = score_range_topk_and(0, n_docs, terms, avgdl, 10, 2,
                                  stats=stats)
    assert ids.size == 10 and ids.max() < 2_000
    # hot term has n_docs/8 blocks; all but the rare span's few must skip
    assert stats["blocks_skipped"] > n_docs // 8 - 300


def test_and_kernel_handles_unsorted_block_spans():
    """Streamed indexes interleave a (term, salt) group across chunk dirs
    with duplicate block_ids, so the scorer can receive the rarest term's
    blocks NON-doc-ordered. The span skip test must sort them first or it
    silently drops valid AND hits (ADVICE r2, high)."""
    from donkey_spark.kernels.wand import score_range_topk_and
    n_docs = 64
    dls = np.full(n_docs, 10, dtype=np.int64)
    avgdl = 10.0
    # rarest term: two epochs' blocks, presented LATER-epoch-first
    a_lo = np.arange(0, 4, dtype=np.int64)          # epoch 0 docs
    a_hi = np.arange(40, 44, dtype=np.int64)        # epoch 1 docs
    tfs4 = np.ones(4, dtype=np.int64)
    blocks_a = (_make_term_blocks(a_hi, tfs4, dls, avgdl, n_docs)
                + _make_term_blocks(a_lo, tfs4, dls, avgdl, n_docs))
    # hot term: covers everything in several blocks
    b_ids = np.arange(n_docs, dtype=np.int64)
    blocks_b = _make_term_blocks(b_ids, np.ones(n_docs, dtype=np.int64),
                                 dls, avgdl, n_docs)
    terms = [TermBlocks(idf(n_docs, 8), blocks_a),
             TermBlocks(idf(n_docs, n_docs), blocks_b)]
    from donkey_spark.kernels.wand import score_range_topk_and
    ids, _ = score_range_topk_and(0, n_docs, terms, avgdl, 64, 2)
    np.testing.assert_array_equal(
        np.sort(ids), np.concatenate([a_lo, a_hi]))


def test_and_kernel_theta_prunes_hot_blocks():
    """VERDICT r2 #5: when the rare term's docs are SPREAD across the range
    (span-overlap alone keeps every hot block alive), the θ test must still
    skip hot blocks once k docs have qualified and the heap is unbeatable —
    with results identical to the brute-force conjunction."""
    from donkey_spark.kernels.wand import score_range_topk_and
    rng = np.random.default_rng(21)
    n_docs = 100_000
    dls = rng.integers(50, 150, size=n_docs).astype(np.int64)
    avgdl = float(dls.mean())
    hot_ids = np.arange(n_docs, dtype=np.int64)
    hot_tfs = np.ones(n_docs, dtype=np.int64)
    # 200 rare docs spread uniformly; tf varies so θ separates the heap
    rare_ids = np.sort(rng.choice(n_docs, 200, replace=False)).astype(np.int64)
    rare_tfs = rng.integers(1, 30, size=200).astype(np.int64)
    postings = {"rare": (rare_ids, rare_tfs), "hot": (hot_ids, hot_tfs)}
    terms = [TermBlocks(idf(n_docs, ids.size),
                        _make_term_blocks(ids, tfs, dls, avgdl, n_docs))
             for ids, tfs in postings.values()]
    stats: dict = {}
    ids, sc = score_range_topk_and(0, n_docs, terms, avgdl, 10, 2,
                                   stats=stats)
    exp_ids, exp_sc = _brute_force_and(["rare", "hot"], postings, dls,
                                       n_docs, avgdl, 10)
    np.testing.assert_array_equal(ids, exp_ids)
    np.testing.assert_allclose(sc, exp_sc, atol=1e-9)
    # every hot block overlaps *some* rare span? No — but spans keep far
    # more than θ lets through: θ must fire on this fixture
    assert stats.get("blocks_skipped_theta", 0) > 0
    # and the θ skips come ON TOP of span skips (strictly more total skips
    # than the span-only baseline of the same fixture)
    span_only = stats.get("blocks_skipped", 0)
    total = span_only + stats["blocks_skipped_theta"]
    assert total > span_only


def test_and_kernel_theta_single_term_blockmax():
    """Single-term AND: θ-pruning degenerates to pure block-max pruning."""
    from donkey_spark.kernels.wand import score_range_topk_and
    rng = np.random.default_rng(22)
    n_docs = 50_000
    dls = np.full(n_docs, 100, dtype=np.int64)
    avgdl = 100.0
    ids_all = np.arange(n_docs, dtype=np.int64)
    tfs = np.ones(n_docs, dtype=np.int64)
    tfs[rng.choice(n_docs, 20, replace=False)] = 40    # a few heavy docs
    postings = {"t": (ids_all, tfs)}
    terms = [TermBlocks(idf(n_docs, n_docs),
                        _make_term_blocks(ids_all, tfs, dls, avgdl, n_docs))]
    stats: dict = {}
    ids, sc = score_range_topk_and(0, n_docs, terms, avgdl, 5, 1,
                                   stats=stats)
    exp_ids, exp_sc = _brute_force_and(["t"], postings, dls, n_docs,
                                       avgdl, 5)
    np.testing.assert_array_equal(ids, exp_ids)
    np.testing.assert_allclose(sc, exp_sc, atol=1e-9)
    assert stats.get("blocks_skipped_theta", 0) > 0


def test_span_maxima_empty_and_basic():
    """r5 (ADVICE): _span_maxima on zero spans returns an empty array
    (reduceat would IndexError); non-empty spans match per-slice max."""
    from donkey_spark.kernels.wand import _span_maxima
    acc = np.array([3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0])
    out = _span_maxima(acc, np.empty(0, dtype=np.int64),
                       np.empty(0, dtype=np.int64))
    assert out.size == 0 and out.dtype == acc.dtype
    lo = np.array([4, 0], dtype=np.int64)
    hi = np.array([7, 3], dtype=np.int64)
    np.testing.assert_array_equal(_span_maxima(acc, lo, hi),
                                  np.array([9.0, 4.0]))
