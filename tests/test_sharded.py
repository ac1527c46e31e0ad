"""Federated sharded search (plans/sharded.py): global-stats BM25 over
shard indexes must reproduce a unified index's ranking EXACTLY —
sharding is an operational choice, not a semantics change."""

import pytest
from pyspark.sql import functions as F

from fixtures.gen_corpus import gen_corpus

QS = [(0, "def return", 10), (1, "class import self", 7),
      (2, "return value", 12)]


def _key(rows, unified=False):
    """(qid, rank, repo, path, score@9) — the shard-layout-independent
    identity of a result set."""
    if unified:
        return [(q, rk, repo, path, round(s, 9))
                for q, rk, d, s, repo, path in rows]
    return [(q, rk, repo, path, round(s, 9))
            for q, rk, sh, d, s, repo, path in rows]


@pytest.fixture(scope="module")
def sh_setup(spark, tmp_path_factory):
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    base = tmp_path_factory.mktemp("shards")
    pdf = gen_corpus(240, seed=43)
    corpus = spark.createDataFrame(pdf)
    build_index(spark, corpus, str(base / "uni"), range_size=64,
                facets=("lang",))
    parts = []
    for i, lo in enumerate((0, 1, 2)):
        shard_pdf = pdf[pdf.index % 3 == lo]
        build_index(spark, spark.createDataFrame(shard_pdf),
                    str(base / f"s{i}"), range_size=64, facets=("lang",))
        parts.append(str(base / f"s{i}"))
    return str(base / "uni"), parts, pdf


def test_rank_identity_across_shard_counts(spark, sh_setup):
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import search_rows_sharded
    uni_dir, parts, _ = sh_setup
    uni = Index(spark, uni_dir)
    for mode in ("or", "and"):
        want = _key(uni.search_rows(QS, mode=mode), unified=True)
        assert want                       # fixture sanity
        # 3 shards, and a 2-way regrouping (shard 0+1 merged corpus is
        # NOT buildable from dirs — instead take [s0, s1, s2] vs
        # [s2, s0, s1]: ordering of shards must not matter either
        shards = [Index(spark, d) for d in parts]
        got3 = _key(search_rows_sharded(shards, QS, mode=mode))
        assert got3 == want, mode
        rot = [shards[2], shards[0], shards[1]]
        assert _key(search_rows_sharded(rot, QS, mode=mode)) == want
        # one shard carrying everything == the unified index
        assert _key(search_rows_sharded([uni], QS, mode=mode)) == want


def test_skewed_avgdl_shard_stays_exact(spark, tmp_path):
    """The pruning-bound case: one shard holds only SHORT docs, so the
    global avgdl exceeds its build avgdl and the stored block maxima
    alone would under-bound tf_part — pot_scale must keep every skip
    safe (kernels/wand.TermBlocks)."""
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import search_rows_sharded
    pdf = gen_corpus(200, seed=47)
    dl = pdf["content"].str.split().map(len)
    short, long_ = pdf[dl <= dl.median()], pdf[dl > dl.median()]
    spark_pdf = spark.createDataFrame
    build_index(spark, spark_pdf(pdf), str(tmp_path / "uni"),
                range_size=64)
    build_index(spark, spark_pdf(short), str(tmp_path / "short"),
                range_size=64)
    build_index(spark, spark_pdf(long_), str(tmp_path / "long"),
                range_size=64)
    uni = Index(spark, str(tmp_path / "uni"))
    shards = [Index(spark, str(tmp_path / "short")),
              Index(spark, str(tmp_path / "long"))]
    from donkey_spark.plans.sharded import global_stats
    from donkey_spark.functions.tokenize import tokenize_py
    stats = global_stats(shards,
                         [t for _, s, _ in QS for t in tokenize_py(s)])
    plan = shards[0]._plan_search(QS, "or", None, stats)
    assert plan["pot_scale"] > 1.0        # the scale is actually live
    for mode in ("or", "and"):
        assert _key(search_rows_sharded(shards, QS, mode=mode)) == \
            _key(uni.search_rows(QS, mode=mode), unified=True), mode


def test_sharded_filters_and_tombstones(spark, sh_setup):
    from donkey_spark.plans.delete import delete_docs
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import search_rows_sharded
    uni_dir, parts, pdf = sh_setup
    uni = Index(spark, uni_dir)
    shards = [Index(spark, d) for d in parts]
    langs = sorted(set(pdf["lang"]))[:2]
    for filt in ({"lang": langs[0]}, {"lang": langs},
                 {"lang": {"not": [langs[0]]}}):
        want = _key(uni.search_rows(QS, filters=filt), unified=True)
        assert want
        assert _key(search_rows_sharded(shards, QS,
                                        filters=filt)) == want, filt

    # tombstone the unified top hit IN ITS SHARD; the same key deleted
    # from the unified index must yield the same survivor ranking
    top = uni.search_rows([QS[0]])[0]
    key_row = pdf[(pdf["repo"] == top[4]) & (pdf["path"] == top[5])]
    keys = spark.createDataFrame(key_row[["repo", "path", "commit"]])
    delete_docs(spark, uni_dir, keys)
    for d in parts:
        delete_docs(spark, d, keys)       # no-op in 2 of 3 shards
    uni2 = Index(spark, uni_dir)
    shards2 = [Index(spark, d) for d in parts]
    want = _key(uni2.search_rows(QS), unified=True)
    got = _key(search_rows_sharded(shards2, QS))
    assert got == want
    assert all((top[4], top[5]) != (r[2], r[3]) for r in got)


def test_sharded_distributed_path_agrees(spark, sh_setup):
    """local_bytes=0 forces every shard through the distributed scorer —
    stats injection must hold on both code paths."""
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import search_rows_sharded
    uni_dir, parts, _ = sh_setup
    uni = Index(spark, uni_dir)
    shards = [Index(spark, d, local_bytes=0) for d in parts]
    assert _key(search_rows_sharded(shards, QS)) == \
        _key(uni.search_rows(QS), unified=True)


def test_own_stats_injection_is_bit_identical(spark, sh_setup):
    """stats == the index's own stats must reproduce plain search at
    full float precision (the pot_scale=1 / local-df degenerate case)."""
    from donkey_spark.functions.tokenize import tokenize_py
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import global_stats
    uni_dir, _, _ = sh_setup
    uni = Index(spark, uni_dir)
    stats = global_stats(
        [uni], [t for _, s, _ in QS for t in tokenize_py(s)])
    assert uni.search_rows(QS, stats=stats) == uni.search_rows(QS)


def test_sharded_validation(spark, sh_setup):
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import (global_stats,
                                            search_rows_sharded)
    uni_dir, _, _ = sh_setup
    uni = Index(spark, uni_dir)
    with pytest.raises(ValueError, match="no shards"):
        search_rows_sharded([], QS)
    with pytest.raises(ValueError, match="stats override"):
        uni.search_rows(QS, stats={"n_docs": 1})
    assert global_stats([uni], ["zz_not_a_term"])["dfs"] == {}


def test_sharded_facet_counts_sum_exactly(spark, sh_setup):
    from donkey_spark.plans.facet_counts import facet_counts
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import facet_counts_sharded
    uni_dir, parts, pdf = sh_setup
    uni = Index(spark, uni_dir)
    shards = [Index(spark, d) for d in parts]
    text = "def return"
    lang0 = sorted(set(pdf["lang"]))[0]
    for mode, filt in (("or", None), ("and", None),
                       ("or", {"lang": {"not": [lang0]}})):
        want = {r["value"]: r["n_docs"] for r in
                facet_counts(uni, text, "lang", mode=mode,
                             filters=filt).collect()}
        got = {r["value"]: r["n_docs"] for r in
               facet_counts_sharded(shards, text, "lang", mode=mode,
                                    filters=filt).collect()}
        assert got == want and sum(got.values()) > 0, (mode, filt)


@pytest.fixture(scope="module")
def ph_setup(spark, tmp_path_factory):
    """Positional (format v3) unified index + 3-way shard split of the
    same corpus, for the federated phrase tests."""
    from donkey_spark.plans.build import build_index
    base = tmp_path_factory.mktemp("phshards")
    pdf = gen_corpus(240, seed=53)
    build_index(spark, spark.createDataFrame(pdf), str(base / "uni"),
                range_size=64, positions=True)
    parts = []
    for i in range(3):
        build_index(spark, spark.createDataFrame(pdf[pdf.index % 3 == i]),
                    str(base / f"s{i}"), range_size=64, positions=True)
        parts.append(str(base / f"s{i}"))
    return str(base / "uni"), parts, pdf


def test_phrase_federation_matches_unified(spark, ph_setup):
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import search_phrase_sharded
    uni_dir, parts, _ = ph_setup
    uni = Index(spark, uni_dir)
    shards = [Index(spark, d) for d in parts]
    for text, slop in (("def return", 0), ("def return", 2),
                       ("def", 0)):
        want = [(q, rk, repo, path, round(s, 9)) for q, rk, d, s, repo,
                path in uni.search_phrase(text, k=10, slop=slop)]
        assert want, (text, slop)               # fixture sanity
        got = _key(search_phrase_sharded(shards, text, k=10, slop=slop))
        assert got == want, (text, slop)
        rot = [shards[1], shards[2], shards[0]]
        assert _key(search_phrase_sharded(rot, text, k=10,
                                          slop=slop)) == want


def test_phrase_federation_requires_positional_shards(spark, ph_setup,
                                                      sh_setup):
    """A v2 shard in the federation fails fast with the same rebuild
    hint a direct phrase query gives."""
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import search_phrase_sharded
    _, pos_parts, _ = ph_setup
    _, v2_parts, _ = sh_setup
    mixed = [Index(spark, pos_parts[0]), Index(spark, v2_parts[0])]
    with pytest.raises(ValueError, match="positions=True"):
        search_phrase_sharded(mixed, "def return", k=5)


def test_ann_federation_is_bit_equal_to_unified(spark, tmp_path):
    """Deterministic planes ⇒ every shard hashes into the SAME bucket
    space, so the federated probe's candidate union IS the unified
    index's candidate set — results must be identical rows, not merely
    close."""
    import numpy as np

    from donkey_spark.pipeline.similarity import ann_topk, build_ann_index
    from donkey_spark.plans.sharded import ann_topk_sharded
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((400, 16)).astype("float64")
    rows = [(int(i), [float(x) for x in vecs[i]], int(i % 3))
            for i in range(len(vecs))]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    knobs = dict(n_tables=4, n_planes=4)
    build_ann_index(df, str(tmp_path / "uni"), meta_cols=("label",),
                    **knobs)
    dirs = []
    for i in range(2):
        d = str(tmp_path / f"s{i}")
        build_ann_index(df.where(F.col("vec_id") % 2 == i), d,
                        meta_cols=("label",), **knobs)
        dirs.append(d)
    probes = [[float(x) for x in vecs[j]] for j in (5, 77, 311)]
    for probe in probes:
        for extra in ({}, {"multiprobe": 1},
                      {"filters": {"label": [0, 2]}}):
            want = ann_topk(spark, str(tmp_path / "uni"), probe, k=10,
                            **knobs, **extra).collect()
            got = ann_topk_sharded(spark, dirs, probe, k=10,
                                   **knobs, **extra).collect()
            assert [tuple(r) for r in got] == [tuple(r) for r in want], \
                extra
            assert len(want) > 0


def test_ann_federation_validation(spark, tmp_path):
    from donkey_spark.plans.sharded import ann_topk_sharded
    with pytest.raises(ValueError, match="no shards"):
        ann_topk_sharded(spark, [], [0.0] * 16, k=5)
    with pytest.raises(ValueError, match="must align"):
        ann_topk_sharded(spark, ["a", "b"], [0.0] * 16, k=5,
                         tombstones_from=["x"])


def test_sharded_snippets_match_unified(spark, sh_setup):
    """Federated snippets must be the unified function's rows exactly
    (plus the shard column): same ranking, same matched-term choice
    (global dfs == unified dfs), same snippet text, same NULL-commit
    handling."""
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.snippets import (search_snippets,
                                             search_snippets_sharded)
    uni_dir, parts, pdf = sh_setup
    uni = Index(spark, uni_dir)
    shards = [Index(spark, d) for d in parts]
    corpus = spark.createDataFrame(pdf)
    for corp in (corpus, corpus.drop("commit")):
        # identity = (qid, rank, score, repo, path, term, pos, snippet):
        # a federation's doc_id is shard-LOCAL, so it is dropped from
        # both sides (the unified id and the shard id legitimately
        # differ for the same document)
        want = sorted((r[0], r[1], *r[3:]) for r in
                      search_snippets(uni, corp, QS, window=3).collect())
        assert want and any(r[-1] is not None for r in want)
        got = sorted((r[0], r[1], *r[4:]) for r in
                     search_snippets_sharded(shards, corp, QS,
                                             window=3).collect())
        assert got == want


def test_sharded_snippets_validation_and_empty(spark, sh_setup):
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.snippets import search_snippets_sharded
    uni_dir, parts, pdf = sh_setup
    corpus = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="no shards"):
        search_snippets_sharded([], corpus, QS)
    shards = [Index(spark, d) for d in parts]
    out = search_snippets_sharded(shards, corpus,
                                  [(0, "zz_not_a_term", 5)])
    assert out.count() == 0 and "shard" in out.columns


def test_ivf_federation_shared_quantizer_is_bit_equal(spark, tmp_path):
    """With ONE frozen quantizer across shards, every shard partitions
    the same centroid space — the federated IVF probe must be bit-equal
    to one index over all vectors. A shard trained separately must be
    refused, not silently merged."""
    import numpy as np

    from donkey_spark.pipeline.ivf import build_ivf_index, ivf_topk
    from donkey_spark.plans.sharded import ivf_topk_sharded
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((300, 12)).astype("float64")
    rows = [(int(i), [float(x) for x in vecs[i]], int(i % 2))
            for i in range(len(vecs))]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    cents = build_ivf_index(df, str(tmp_path / "uni"), n_lists=6,
                            n_iters=1, meta_cols=("label",))
    dirs = []
    for i in range(2):
        d = str(tmp_path / f"s{i}")
        build_ivf_index(df.where(F.col("vec_id") % 2 == i), d,
                        n_lists=6, meta_cols=("label",), centroids=cents)
        dirs.append(d)
    for j in (3, 141):
        probe = [float(x) for x in vecs[j]]
        for extra in ({"nprobe": 2}, {"nprobe": 6},
                      {"nprobe": 3, "filters": {"label": [1]}}):
            want = ivf_topk(spark, str(tmp_path / "uni"), probe, k=8,
                            **extra).collect()
            got = ivf_topk_sharded(spark, dirs, probe, k=8,
                                   **extra).collect()
            assert [tuple(r) for r in got] == [tuple(r) for r in want], \
                (j, extra)
            assert len(want) > 0

    # a shard built from a trained index's own stored quantizer must
    # store it BIT-EQUAL (r5 fourth review: re-normalizing a rounded
    # unit vector can flip 9th-decimal digits — canonical input is
    # accepted verbatim, non-normalized input still canonicalizes)
    from donkey_spark.pipeline.ivf import (_accept_quantizer, _normalize,
                                           read_centroids)
    stored = read_centroids(spark, str(tmp_path / "uni"))
    assert np.array_equal(_accept_quantizer(stored), stored)
    assert np.array_equal(read_centroids(spark, dirs[0]), stored)
    assert np.array_equal(_accept_quantizer(stored * 3.0),
                          _normalize(stored * 3.0))
    # a canonical quantizer with a ZERO row (degenerate seed —
    # _normalize keeps zeros) must ALSO pass verbatim: the unit test is
    # per-row, else one zero row re-normalizes the whole matrix and
    # reintroduces the 9th-decimal drift on every other row
    with_zero = stored.copy()
    with_zero[1] = 0.0
    assert np.array_equal(_accept_quantizer(with_zero), with_zero)

    # separately-trained shard (different quantizer) must be refused
    rogue = str(tmp_path / "rogue")
    build_ivf_index(df.where(F.col("vec_id") % 2 == 1), rogue,
                    n_lists=6, n_iters=1, meta_cols=("label",))
    with pytest.raises(ValueError, match="different quantizer"):
        ivf_topk_sharded(spark, [dirs[0], rogue],
                         [float(x) for x in vecs[0]], k=5)


def test_sharded_mixed_batch_matches_unified(spark, sh_setup, ph_setup):
    """The federated mixed batch must reproduce the unified mixed batch
    group for group: or/and/filtered specs on the faceted federation,
    phrase specs on the positional one."""
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import search_rows_mixed_sharded
    uni_dir, parts, pdf = sh_setup
    uni = Index(spark, uni_dir)
    shards = [Index(spark, d) for d in parts]
    lang0 = sorted(set(pdf["lang"]))[0]
    specs = [(0, "def return", 6, None, None),
             (1, "class import self", 5, "and", None),
             (2, "def return", 6, "or", {"lang": lang0}),
             (3, "return value", 5, "or", {"lang": {"not": [lang0]}})]
    want = [(q, rk, repo, path, round(s, 9)) for q, rk, d, s, repo, path
            in uni.search_rows_mixed(specs)]
    assert want
    got = _key(search_rows_mixed_sharded(shards, specs))
    assert got == want

    # phrase specs route through the positional federation
    p_uni_dir, p_parts, _ = ph_setup
    p_uni = Index(spark, p_uni_dir)
    p_shards = [Index(spark, d) for d in p_parts]
    pspecs = [(0, "def return", 5, "phrase", None),
              (1, "def return", 8, None, None)]
    want = [(q, rk, repo, path, round(s, 9)) for q, rk, d, s, repo, path
            in p_uni.search_rows_mixed(pspecs)]
    assert want
    assert _key(search_rows_mixed_sharded(p_shards, pspecs)) == want

    with pytest.raises(ValueError, match="duplicate query_ids"):
        search_rows_mixed_sharded(shards, [(0, "a", 1, None, None),
                                           (0, "b", 1, None, None)])
    with pytest.raises(ValueError, match="do not take filters"):
        search_rows_mixed_sharded(
            p_shards, [(0, "def return", 5, "phrase", {"lang": "py"})])


def test_sharded_match_count_sums_exactly(spark, sh_setup):
    """Total hits over the federation = the unified count — no global
    stats needed (match predicates are shard-local, shards partition
    the corpus), across modes and filters."""
    from donkey_spark.plans.facet_counts import match_count
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import match_count_sharded
    uni_dir, parts, pdf = sh_setup
    uni = Index(spark, uni_dir)
    shards = [Index(spark, d) for d in parts]
    text = "def return"
    lang0 = sorted(set(pdf["lang"]))[0]
    for mode, filt in (("or", None), ("and", None),
                       ("or", {"lang": lang0}),
                       ("and", {"lang": {"not": [lang0]}})):
        want = match_count(uni, text, mode=mode, filters=filt)
        got = match_count_sharded(shards, text, mode=mode, filters=filt)
        assert got == want and (filt is not None or got > 0), (mode, filt)
    assert match_count_sharded(shards, "zz_totally_oov") == 0


def test_sharded_match_stats_folds_exactly(spark, sh_setup):
    """Federated stats agg ≡ the unified index's: counts and sums add,
    min/max fold, avg recomputes — shards partition the corpus."""
    from donkey_spark.plans.facet_counts import match_stats
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import match_stats_sharded
    uni_dir, parts, pdf = sh_setup
    uni = Index(spark, uni_dir)
    shards = [Index(spark, d) for d in parts]
    text = "def return"
    lang0 = sorted(set(pdf["lang"]))[0]
    for mode, filt in (("or", None), ("and", None),
                       ("or", {"lang": lang0}),
                       ("and", {"lang": {"not": [lang0]}})):
        want = match_stats(uni, text, by="dl", mode=mode, filters=filt)
        got = match_stats_sharded(shards, text, by="dl", mode=mode,
                                  filters=filt)
        assert got == want and want["n_docs"] > 0, (mode, filt)
    empty = match_stats_sharded(shards, "zz_totally_oov")
    assert empty["n_docs"] == 0 and empty["sum"] is None


def test_sharded_suggest_matches_unified(spark, sh_setup):
    """Federated did-you-mean ≡ the unified index's: uncapped per-shard
    candidates, dfs summed, ranked once globally."""
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import suggest_sharded
    uni_dir, parts, _ = sh_setup
    uni = Index(spark, uni_dir)
    shards = [Index(spark, d) for d in parts]
    hit = False
    for probe in ("clas", "retur", "zzqxv"):
        got = suggest_sharded(shards, probe)
        assert got == uni.suggest(probe), probe
        hit = hit or bool(got)
    assert hit                            # fixture sanity: real output
    with pytest.raises(ValueError, match="one term"):
        suggest_sharded(shards, "two words")


def test_sharded_match_percentiles_exact(spark, sh_setup):
    """Federated percentiles ≡ the unified index's EXACTLY (to 9 dp):
    the federation aggregates the union of matched doc-values — all
    shards driver-local (concatenated arrays) AND all-distributed (one
    union + percentile agg) must both reproduce the unified numbers,
    because a fold of per-shard percentiles would be wrong by
    construction."""
    from donkey_spark.plans.facet_counts import match_percentiles
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import match_percentiles_sharded
    uni_dir, parts, pdf = sh_setup
    text = "def return"
    lang0 = sorted(set(pdf["lang"]))[0]

    def rnd(got):
        return {**got, "percentiles": {
            q: None if v is None else round(v, 9)
            for q, v in got["percentiles"].items()}}

    for local_bytes in (64 << 20, 0):
        uni = Index(spark, uni_dir, local_bytes=local_bytes)
        shards = [Index(spark, d, local_bytes=local_bytes)
                  for d in parts]
        for mode, filt in (("or", None), ("and", None),
                           ("or", {"lang": lang0})):
            want = match_percentiles(uni, text, mode=mode, filters=filt)
            got = match_percentiles_sharded(shards, text, mode=mode,
                                            filters=filt)
            assert rnd(got) == rnd(want) and want["n_docs"] > 0, \
                (local_bytes, mode, filt)
        empty = match_percentiles_sharded(shards, "zz_totally_oov")
        assert empty["n_docs"] == 0


def test_sharded_match_percentiles_mixed_budget(spark, sh_setup):
    """One shard within its local budget, one over: the federation must
    ship the local shard's already-read values into the distributed
    aggregate (never re-matching it) and still reproduce the unified
    numbers exactly — including n_docs when the local shard holds
    matched rows."""
    from donkey_spark.plans.facet_counts import match_percentiles
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import match_percentiles_sharded
    uni_dir, parts, _ = sh_setup
    text = "def return"
    uni = Index(spark, uni_dir)
    shards = [Index(spark, parts[0], local_bytes=64 << 20),
              Index(spark, parts[1], local_bytes=0),
              Index(spark, parts[2], local_bytes=64 << 20)]
    for mode in ("or", "and"):
        want = match_percentiles(uni, text, mode=mode)
        got = match_percentiles_sharded(shards, text, mode=mode)
        assert got["n_docs"] == want["n_docs"] > 0
        assert got["n_values"] == want["n_values"]
        for q, v in want["percentiles"].items():
            assert abs(got["percentiles"][q] - v) < 1e-9, (mode, q)


def test_sharded_match_docs_unions_exactly(spark, sh_setup):
    """Federated export = the union of per-shard exports = the unified
    index's export keyed by (repo, path); the shard column fetches back
    into the owning shard."""
    from donkey_spark.plans.facet_counts import match_docs
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import match_docs_sharded
    uni_dir, parts, _ = sh_setup
    text = "def return"
    uni = Index(spark, uni_dir)
    shards = [Index(spark, d) for d in parts]
    want = sorted((r["repo"], r["path"], r["dl"]) for r in match_docs(
        uni, text, columns=("repo", "path", "dl")).collect())
    rows = match_docs_sharded(shards, text,
                              columns=("repo", "path", "dl")).collect()
    assert sorted((r["repo"], r["path"], r["dl"]) for r in rows) == want
    assert len(want) > 0
    # the shard column points at the owning shard
    for r in rows[:20]:
        owned = match_docs(shards[r["shard"]], text,
                           columns=("repo", "path")).collect()
        assert (r["repo"], r["path"]) in {(x["repo"], x["path"])
                                          for x in owned}


def test_sharded_cardinality_unions_not_sums(spark, sh_setup):
    """Federated cardinality ≡ unified: per-shard distinct counts may
    NOT be summed (the same repo matches in many shards — asserted),
    so the union-of-values path must reproduce the unified number."""
    from donkey_spark.plans.facet_counts import match_cardinality
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import match_cardinality_sharded
    uni, parts, _ = sh_setup
    shards = [Index(spark, d) for d in parts]
    text = "def return"
    for by in ("repo", "lang"):
        want = match_cardinality(Index(spark, uni), text, by=by)
        got = match_cardinality_sharded(shards, text, by=by)
        assert got == want and want["n_docs"] > 0, by
        per = [match_cardinality(s, text, by=by)["cardinality"]
               for s in shards]
        assert sum(per) > want["cardinality"]    # overlap is real
    # filters flow through; unknown column refused
    wantf = match_cardinality(Index(spark, uni), text, by="repo",
                              filters={"lang": ["py"]})
    assert match_cardinality_sharded(shards, text, by="repo",
                                     filters={"lang": ["py"]}) == wantf
    import pytest as _pt
    with _pt.raises(ValueError, match="metadata column"):
        match_cardinality_sharded(shards, text, by="nope")
