"""Synonym queries (§2.14 T44 — the Lucene SynonymQuery construct):
a query token with a synonyms-map entry scores as ONE blended clause
over {token} ∪ synonyms — member tfs SUM per doc before the BM25
saturation, under one idf from the MAX member df — never as
independent per-term clauses. Checked against a from-first-principles
Python oracle over the raw corpus, across both probe paths and the
federation (including a member absent from one shard's dictionary,
whose GLOBAL liveness must still set the blended idf everywhere)."""

import math
from collections import Counter

import numpy as np
import pytest

from donkey_spark.functions.tokenize import tokenize_py
from fixtures.gen_corpus import gen_corpus


@pytest.fixture(scope="module")
def syn_setup(spark, tmp_path_factory):
    from donkey_spark.plans.build import build_index
    base = tmp_path_factory.mktemp("syn")
    pdf = gen_corpus(240, seed=53)
    build_index(spark, spark.createDataFrame(pdf), str(base / "idx"),
                range_size=64, facets=("lang",))
    shard_dirs = []
    for i in (0, 1):
        build_index(spark, spark.createDataFrame(pdf[pdf.index % 2 == i]),
                    str(base / f"s{i}"), range_size=64, facets=("lang",))
        shard_dirs.append(str(base / f"s{i}"))
    return str(base / "idx"), shard_dirs, pdf


def _brute_synonyms(pdf, queries, synonyms):
    """The SynonymQuery arithmetic from raw text: groups = mapped
    tokens' member sets, plain tokens singleton groups; per (doc,
    group) tf sums, df_g = max member df, one saturation per group."""
    ordered = pdf.sort_values(["repo", "path", "commit"]).reset_index()
    toks = [tokenize_py(t) for t in ordered["content"]]
    n = len(toks)
    dls = np.array([len(t) for t in toks], dtype=np.float64)
    avgdl = dls.sum() / n
    dfc: Counter = Counter()
    for t in toks:
        dfc.update(set(t))

    def idf(d):
        return math.log(1 + (n - d + 0.5) / (d + 0.5))

    def tfp(tf, dl):
        return tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))

    out = []
    for qid, text, k in queries:
        groups = []
        for t in sorted(set(tokenize_py(text))):
            mems = sorted(set(synonyms.get(t, [])) | {t}
                          ) if t in synonyms else [t]
            live = [m for m in mems if dfc[m]]
            if live:
                groups.append((idf(max(dfc[m] for m in live)), live))
        scores = np.zeros(n)
        for gidf, live in groups:
            for i, tt in enumerate(toks):
                c = Counter(tt)
                gtf = sum(c[m] for m in live)
                if gtf:
                    scores[i] += gidf * tfp(gtf, dls[i])
        order = [i for i in sorted(range(n),
                                   key=lambda i: (-round(scores[i], 9), i))
                 if scores[i] > 0][:k]
        out.extend((qid, rk + 1, i, round(scores[i], 9))
                   for rk, i in enumerate(order))
    return out


QUERIES = [(0, "return filter", 10), (1, "class import", 8),
           (2, "loop_token read", 10), (3, "select", 6)]
SYNONYMS = {
    "return": ["read", "break"],       # 3-member group
    "class": ["lambda"],
    "loop_token": ["zz_oov_synonym"],  # OOV member drops
    "zz_oov_head": ["select"],         # select is only a VALUE: scores
    "select": ["select"],              # self-synonym = plain (dedup)
}


def _norm(rows):
    return [(q, r, d, round(s, 9)) for q, r, d, s, *_ in rows]


def test_synonyms_match_brute_force_both_paths(spark, syn_setup):
    from donkey_spark.plans.query import Index
    idx_dir, _, pdf = syn_setup
    want = _brute_synonyms(pdf, QUERIES, SYNONYMS)
    assert want
    for lb in (64 << 20, 0):
        got = Index(spark, idx_dir, local_bytes=lb).search_rows(
            QUERIES, synonyms=SYNONYMS)
        assert _norm(got) == want, lb
    # the blend must actually CHANGE results vs plain scoring
    plain = Index(spark, idx_dir).search_rows(QUERIES)
    assert _norm(plain) != want


def test_synonyms_value_only_token_scores_alone(spark, syn_setup):
    """A token that appears only as a map VALUE (select, via the
    unused zz_oov_head entry) is a plain clause — except here 'select'
    is also a self-synonym head, which dedups to plain."""
    from donkey_spark.plans.query import Index
    idx = Index(spark, syn_setup[0])
    qs = [(3, "select", 6)]
    assert (idx.search_rows(qs, synonyms=SYNONYMS)
            == idx.search_rows(qs))


def test_synonyms_boost_scales_group(spark, syn_setup):
    """A boost on the HEAD token scales the group's blended idf —
    every group score exactly w× the unboosted one."""
    from donkey_spark.plans.query import Index
    idx = Index(spark, syn_setup[0])
    qs = [(0, "return", 10)]
    base = idx.search_rows(qs, synonyms={"return": ["read"]})
    up = idx.search_rows(qs, synonyms={"return": ["read"]},
                         boosts={0: {"return": 2.0}})
    assert [(d, round(s, 9)) for _, _, d, s, *_ in up] == \
        [(d, round(2 * s, 9)) for _, _, d, s, *_ in base]


def test_synonyms_compose_filters_tombstones(spark, syn_setup, tmp_path):
    import shutil

    from donkey_spark.fsutil import local_path
    from donkey_spark.plans.delete import delete_docs
    from donkey_spark.plans.query import Index
    idx_dir, _, _ = syn_setup
    idx = Index(spark, idx_dir)
    qs = [(0, "return filter", 10)]
    unf = {d: s for _, _, d, s, *_ in idx.search_rows(
        qs, synonyms=SYNONYMS)}
    got = idx.search_rows(qs, synonyms=SYNONYMS,
                          filters={"lang": ["py", "go"]})
    assert got
    docs = {r["doc_id"] for r in
            idx._docs.where("lang in ('py','go')").collect()}
    for _, _, d, s, *_ in got:
        assert d in docs
        if d in unf:
            assert s == unf[d]
    # tombstoned survivors keep their exact scores (frozen stats)
    dst = str(tmp_path / "del")
    shutil.copytree(local_path(idx_dir), dst)
    victims = [d for d in unf][:3]
    delete_docs(spark, dst, victims)
    after = Index(spark, dst).search_rows(qs, synonyms=SYNONYMS)
    assert victims[0] not in {d for _, _, d, *_ in after}
    for _, _, d, s, *_ in after:
        if d in unf:
            assert s == unf[d]


def test_synonyms_validation():
    from donkey_spark.plans.query import _normalize_synonyms
    assert _normalize_synonyms(None, "or", None) is None
    assert _normalize_synonyms({"Foo": "bar"}, "or", None) == {
        "foo": ["bar", "foo"]}
    with pytest.raises(ValueError, match="mode='or'"):
        _normalize_synonyms({"foo": ["bar"]}, "and", None)
    with pytest.raises(ValueError, match="min_match"):
        _normalize_synonyms({"foo": ["bar"]}, "or", {0: 2})
    with pytest.raises(ValueError, match="one token"):
        _normalize_synonyms({"two words": ["bar"]}, "or", None)
    with pytest.raises(ValueError, match="one token"):
        _normalize_synonyms({"foo": ["two words"]}, "or", None)
    # a 1-char "token" normalizes to ZERO tokens (term alphabet is
    # [a-z0-9_]{2,64}) — refused the same way
    with pytest.raises(ValueError, match="one token"):
        _normalize_synonyms({"a": ["bar"]}, "or", None)
    # heads normalizing to the same token MERGE, never last-wins-drop
    assert _normalize_synonyms({"Foo": ["bar"], "foo": ["baz"]},
                               "or", None) == {
        "foo": ["bar", "baz", "foo"]}


def test_syngroup_exact_under_theta_pressure():
    """A low-ub group processed AFTER a rare high-idf plain term (θ
    already set from the top-k) must still accumulate exactly — the
    kernel's θ machinery orders and bounds group entries but never
    skips their decode (a whole-entry range-max test is provably
    vacuous; see SynGroup), so results equal brute force bit for
    bit."""
    from donkey_spark.kernels.blocks import build_blocks
    from donkey_spark.kernels.bm25 import idf as bm25_idf
    from donkey_spark.kernels.bm25 import tf_part
    from donkey_spark.kernels.wand import (SynGroup, TermBlocks,
                                           score_range_topk)
    rng = np.random.default_rng(11)
    n, avgdl = 400, 40.0
    dls = rng.integers(20, 60, n).astype(np.float64)

    def term(p, hi):
        docs = np.flatnonzero(rng.random(n) < p)
        return docs, rng.integers(1, hi, docs.size)

    rare = term(0.02, 9)          # high idf — processed first
    m1, m2 = term(0.5, 2), term(0.5, 2)   # common, low-idf group

    def blocks(t):
        ids, tfs = t
        return [dict(r) for r in build_blocks(
            ids.astype(np.int64), tfs.astype(np.int64), dls[ids],
            avgdl=avgdl)]

    idf_r = float(bm25_idf(n, rare[0].size))
    idf_g = float(bm25_idf(n, max(m1[0].size, m2[0].size)))
    entries = [TermBlocks(idf_r, blocks(rare)),
               SynGroup(idf_g, [blocks(m1), blocks(m2)])]
    assert entries[0].ub > entries[1].ub   # rare term orders first
    stats: dict = {}
    ids, sc = score_range_topk(0, n, entries, avgdl, k=3, stats=stats)
    # brute force
    acc = np.zeros(n)
    gtf = np.zeros(n)
    for d, t in (m1, m2):
        np.add.at(gtf, d, t)
    nz = gtf > 0
    acc[nz] += idf_g * tf_part(gtf[nz], dls[nz], avgdl)
    acc[rare[0]] += idf_r * tf_part(rare[1].astype(np.float64),
                                    dls[rare[0]], avgdl)
    order = [i for i in sorted(range(n),
                               key=lambda i: (-acc[i], i))
             if acc[i] > 0][:3]
    assert list(ids) == order
    np.testing.assert_allclose(sc, acc[order], rtol=1e-12)
    # every group block decoded — the group is never θ-skipped
    assert stats["blocks_decoded"] >= len(blocks(m1)) + len(blocks(m2))


def test_synonyms_sharded_matches_unified(spark, syn_setup):
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import search_rows_sharded
    idx_dir, shard_dirs, _ = syn_setup
    uni = Index(spark, idx_dir)
    shards = [Index(spark, d) for d in shard_dirs]
    want = [(q, rk, repo, path, round(s, 9)) for q, rk, d, s, repo, path
            in uni.search_rows(QUERIES, synonyms=SYNONYMS)]
    assert want
    for order in (shards, shards[::-1]):
        got = search_rows_sharded(order, QUERIES, synonyms=SYNONYMS)
        assert [(q, rk, repo, path, round(s, 9))
                for q, rk, sh, d, s, repo, path in got] == want


def test_synonyms_sharded_member_missing_from_one_shard(spark, tmp_path):
    """A member absent from one shard's dictionary but live elsewhere
    must still set the blended idf on EVERY shard (global liveness) —
    the case a shard-local max-df would get wrong: 'bbq_rare' (df 9,
    only in shard B) outweighs 'bbq_common' (df 2+2) in the blend."""
    import pandas as pd

    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import search_rows_sharded

    def corpus(rows, repo):
        return pd.DataFrame([{
            "repo": repo, "path": f"f/{i}", "commit": "c" * 40,
            "lang": "py", "content": txt} for i, txt in enumerate(rows)])

    a = corpus(["bbq_common pad"] * 2 + ["other token"] * 3, "r_a")
    b = corpus(["bbq_rare pad"] * 9 + ["bbq_common pad"] * 2, "r_b")
    uni = pd.concat([a, b], ignore_index=True)
    for name, frame in (("sa", a), ("sb", b), ("uni", uni)):
        build_index(spark, spark.createDataFrame(frame),
                    str(tmp_path / name), range_size=64)
    syn = {"bbq_common": ["bbq_rare"]}
    qs = [(0, "bbq_common", 20)]
    uidx = Index(spark, str(tmp_path / "uni"))
    want = [(q, rk, repo, path, round(s, 9)) for q, rk, d, s, repo, path
            in uidx.search_rows(qs, synonyms=syn)]
    shards = [Index(spark, str(tmp_path / "sa")),
              Index(spark, str(tmp_path / "sb"))]
    got = search_rows_sharded(shards, qs, synonyms=syn)
    assert [(q, rk, repo, path, round(s, 9))
            for q, rk, sh, d, s, repo, path in got] == want
    assert len(got) == 13                  # every member doc matches
