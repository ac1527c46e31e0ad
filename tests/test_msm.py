"""minimum_should_match (kernels/wand.score_range_topk_msm +
Index.search_rows(min_match=...) + plans/sharded federation).

Contract: only docs containing at least m DISTINCT query terms rank;
a survivor's score is the plain disjunctive BM25 sum over the terms it
contains. m=1 must be bit-identical to the plain OR query, m = the
query's term count must reproduce mode="and"'s results, and m above
the live-term count is provably empty. The kernel's conservative
θ-pruning must stay exact — fuzzed against a brute-force oracle with
tombstones and facet masks in play.
"""

import numpy as np
import pytest

from fixtures.gen_corpus import gen_corpus
from tests.oracle_bm25 import OracleIndex

QS = [(0, "def return class", 10), (1, "while yield lambda pass", 8),
      (2, "v62_tmp v82_node v78_vec v66_src", 12)]
MS = {0: 2, 1: 3, 2: 3}


# ---------------------------------------------------------------- kernel

def _brute_force_msm(qterms, postings, dls, n_docs, avgdl, k, m,
                     dead=None, allowed=None):
    from donkey_spark.kernels.bm25 import idf, tf_part
    acc = np.zeros(n_docs)
    cnt = np.zeros(n_docs, dtype=np.int64)
    for t in qterms:
        if t not in postings:
            continue
        ids, tfs = postings[t]
        w = idf(n_docs, ids.size)
        acc[ids] += w * tf_part(tfs, dls[ids], avgdl)
        cnt[ids] += 1
    if dead is not None:
        cnt[dead] = -1
    if allowed is not None:
        cnt[~allowed] = -1
    hit = np.flatnonzero(cnt >= m)
    order = sorted(hit, key=lambda d: (-acc[d], d))[:k]
    return (np.array(order, dtype=np.int64),
            np.array([acc[d] for d in order]))


def test_msm_kernel_matches_brute_force_200_corpora():
    """Fuzz vs brute force across corpus shapes, m values, tombstones
    and facet masks — θ-pruning must never change the answer."""
    from donkey_spark.kernels.bm25 import idf
    from donkey_spark.kernels.blocks import build_blocks
    from donkey_spark.kernels.wand import TermBlocks, score_range_topk_msm
    for trial in range(200):
        rng = np.random.default_rng(9000 + trial)
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
        nq = int(rng.integers(2, 6))
        qterms = list(rng.choice(vocab, size=min(nq, len(vocab)),
                                 replace=False))
        if trial % 3 == 0:
            qterms.append("oov_term")     # never in postings
        m = int(rng.integers(1, len(qterms) + 2))
        k = int(rng.integers(1, 15))
        dead = allowed = None
        if trial % 4 == 1:
            dead = rng.choice(n_docs, size=max(1, n_docs // 10),
                              replace=False).astype(np.int64)
        elif trial % 4 == 2:
            allowed = rng.random(n_docs) < 0.7
        exp_ids, exp_sc = _brute_force_msm(
            qterms, postings, dls, n_docs, avgdl, k, m,
            dead=dead, allowed=allowed)
        terms = []
        for t in qterms:
            if t not in postings:
                continue
            ids, tfs = postings[t]
            rows = list(build_blocks(ids, tfs, dls[ids], avgdl,
                                     block_size=8, codec="varint"))
            for r in rows:
                r["codec"] = "varint"
            terms.append(TermBlocks(idf(n_docs, ids.size), rows))
        got_ids, got_sc = score_range_topk_msm(
            0, n_docs, terms, avgdl, k, m, dead=dead, allowed=allowed)
        np.testing.assert_array_equal(got_ids, exp_ids, err_msg=f"t{trial}")
        np.testing.assert_allclose(got_sc, exp_sc, atol=1e-9)


def test_msm_kernel_theta_prunes_and_stays_exact():
    """On a hot-term corpus the counting kernel must still skip blocks
    (θ from already-qualified docs) without changing the ranking."""
    from donkey_spark.kernels.bm25 import idf
    from donkey_spark.kernels.blocks import build_blocks
    from donkey_spark.kernels.wand import TermBlocks, score_range_topk_msm
    rng = np.random.default_rng(11)
    n_docs = 50_000
    dls = rng.integers(50, 150, size=n_docs).astype(np.int64)
    avgdl = float(dls.mean())
    postings = {
        # two hot terms covering everything, one rare high-tf term
        "hot1": (np.arange(n_docs, dtype=np.int64),
                 np.ones(n_docs, dtype=np.int64)),
        "hot2": (np.arange(0, n_docs, 2, dtype=np.int64),
                 np.ones((n_docs + 1) // 2, dtype=np.int64)),
        "rare": (np.sort(rng.choice(n_docs, 40, replace=False)
                         ).astype(np.int64),
                 np.full(40, 25, dtype=np.int64)),
    }
    qterms = ["hot1", "hot2", "rare"]
    exp_ids, exp_sc = _brute_force_msm(qterms, postings, dls, n_docs,
                                       avgdl, 10, 2)
    terms = []
    for t in qterms:
        ids, tfs = postings[t]
        rows = list(build_blocks(ids, tfs, dls[ids], avgdl,
                                 block_size=128, codec="varint"))
        for r in rows:
            r["codec"] = "varint"
        terms.append(TermBlocks(idf(n_docs, ids.size), rows))
    stats: dict = {}
    got_ids, got_sc = score_range_topk_msm(0, n_docs, terms, avgdl, 10, 2,
                                           stats=stats)
    np.testing.assert_array_equal(got_ids, exp_ids)
    np.testing.assert_allclose(got_sc, exp_sc, atol=1e-9)
    assert stats.get("blocks_skipped", 0) > 0


def test_msm_kernel_fewer_live_terms_than_m_is_empty():
    from donkey_spark.kernels.wand import score_range_topk_msm
    ids, sc = score_range_topk_msm(0, 100, [], 10.0, 5, 2)
    assert ids.size == 0 and sc.size == 0


# ----------------------------------------------------------- Index level

@pytest.fixture(scope="module")
def msm_setup(spark, tmp_path_factory):
    from donkey_spark.plans.build import build_index
    pdf = gen_corpus(300, seed=29)
    corpus = spark.createDataFrame(pdf)
    out = str(tmp_path_factory.mktemp("msmidx"))
    build_index(spark, corpus, out, range_size=64, facets=("lang",))
    ordered = pdf.sort_values(["repo", "path", "commit"]).reset_index()
    oracle = OracleIndex(list(enumerate(ordered["content"])))
    return pdf, out, oracle


def test_msm_identity_endpoints(spark, msm_setup):
    """m=1 ≡ plain OR (bit-identical), m=termcount ≡ mode='and',
    m>live terms ≡ empty — on the local and distributed paths."""
    from donkey_spark.plans.query import Index
    _, out, _ = msm_setup
    text = "def return class"
    for local_bytes in (64 << 20, 0):
        idx = Index(spark, out, local_bytes=local_bytes)
        plain = idx.search_rows([(0, text, 10)])
        assert idx.search_rows([(0, text, 10)], min_match=1) == plain
        assert idx.search_rows([(0, text, 10)],
                               min_match={0: 1}) == plain
        want_and = [(q, rk, d, s) for q, rk, d, s, _, _
                    in idx.search_rows([(0, text, 10)], mode="and")]
        got = [(q, rk, d, s) for q, rk, d, s, _, _
               in idx.search_rows([(0, text, 10)], min_match=3)]
        assert got == want_and and got
        assert idx.search_rows([(0, text, 10)], min_match=4) == []
        # an OOV term counts toward m but can never match: 3 live terms,
        # m=4 impossible even though the query names 4
        assert idx.search_rows([(0, text + " zz_oov", 10)],
                               min_match=4) == []


def test_msm_matches_reference_engine(spark, msm_setup):
    from donkey_spark.plans.query import Index
    _, out, oracle = msm_setup
    for local_bytes in (64 << 20, 0):
        idx = Index(spark, out, local_bytes=local_bytes)
        rows = idx.search_rows(QS, min_match=MS)
        for qid, text, k in QS:
            got = [(rk, d, round(s, 9)) for q, rk, d, s, _, _ in rows
                   if q == qid]
            want = [(rk, d, round(s, 9))
                    for rk, d, s in oracle.search_msm(text, k, MS[qid])]
            assert got == want, (qid, local_bytes)
            assert got            # fixture sanity: every query matches


def test_msm_composes_with_filters_and_tombstones(spark, msm_setup,
                                                  tmp_path):
    """min_match + facet filter + tombstones: survivors are exactly the
    oracle's msm ranking restricted to live, facet-matching docs."""
    import shutil

    from donkey_spark.plans.delete import delete_docs
    from donkey_spark.plans.query import Index
    pdf, src, oracle = msm_setup
    # the delete below mutates the index — work on a copy so the
    # module-scoped fixture stays pristine for later tests
    out = str(tmp_path / "idx")
    shutil.copytree(src, out)
    ordered = pdf.sort_values(["repo", "path", "commit"]).reset_index()
    text, m, k = "def return class", 2, 10
    full = oracle.search_msm(text, len(ordered), m)
    py = set(ordered.index[ordered["lang"] == "py"])
    want_f = [(d, round(s, 9)) for _, d, s in full if d in py][:k]
    idx = Index(spark, out)
    got = [(d, round(s, 9)) for _, _, d, s, _, _ in
           idx.search_rows([(0, text, k)], min_match=m,
                           filters={"lang": ["py"]})]
    assert got == want_f and got
    # tombstone the top surviving doc; ranking must re-close over the rest
    top = got[0][0]
    delete_docs(spark, out, [int(top)])
    idx2 = Index(spark, out)
    want2 = [(d, round(s, 9)) for _, d, s in full
             if d in py and d != top][:k]
    got2 = [(d, round(s, 9)) for _, _, d, s, _, _ in
            idx2.search_rows([(0, text, k)], min_match=m,
                             filters={"lang": ["py"]})]
    assert got2 == want2


def test_msm_sharded_equals_unified(spark, msm_setup, tmp_path_factory):
    """Federated msm must reproduce the unified index exactly — the
    matched-term count is shard-local by construction."""
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import search_rows_sharded
    pdf, out, _ = msm_setup
    base = tmp_path_factory.mktemp("msmshards")
    parts = []
    for i in range(3):
        shard_pdf = pdf[pdf.index % 3 == i]
        build_index(spark, spark.createDataFrame(shard_pdf),
                    str(base / f"s{i}"), range_size=64, facets=("lang",))
        parts.append(str(base / f"s{i}"))
    uni = Index(spark, out)
    want = [(q, rk, repo, path, round(s, 9)) for q, rk, d, s, repo, path
            in uni.search_rows(QS, min_match=MS)]
    shards = [Index(spark, d) for d in parts]
    got = [(q, rk, repo, path, round(s, 9))
           for q, rk, sh, d, s, repo, path
           in search_rows_sharded(shards, QS, min_match=MS)]
    assert got == want and got


def test_msm_validation(spark, msm_setup):
    from donkey_spark.plans.query import Index, _validate_min_match
    _, out, _ = msm_setup
    idx = Index(spark, out)
    with pytest.raises(ValueError, match="mode='or' only"):
        idx.search_rows([(0, "def return", 5)], mode="and", min_match=2)
    with pytest.raises(ValueError, match="invalid entries"):
        idx.search_rows([(0, "def return", 5)], min_match={1: 2})
    with pytest.raises(ValueError, match="invalid entries"):
        idx.search_rows([(0, "def return", 5)], min_match={0: 0})
    with pytest.raises(ValueError, match="int or"):
        idx.search_rows([(0, "def return", 5)], min_match="2")
    # normalizer: ints fan out, m<=1 entries drop to None
    assert _validate_min_match(1, [(0, "a", 5)], "or") is None
    assert _validate_min_match({0: 1}, [(0, "a", 5)], "or") is None
    assert _validate_min_match(2, [(0, "a", 5), (1, "b", 5)],
                               "or") == {0: 2, 1: 2}
    # m<=1 int short-circuits before the mode check (plain query)
    assert _validate_min_match(1, [(0, "a", 5)], "and") is None
