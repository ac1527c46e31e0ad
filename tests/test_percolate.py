"""Percolation (plans/percolate.py).

Contract: a doc matches a stored query under exactly the engine's own
match semantics — percolating a corpus and searching its index must
agree doc-for-doc across modes and min_match. One Catalyst pass, no
UDF, query table broadcast.
"""

import pytest

from fixtures.gen_corpus import gen_corpus

QS = [(0, "def return class"), (1, "while yield lambda"),
      (2, "v62_tmp zz_oov_token"), (3, "zz_oov_token")]


@pytest.fixture(scope="module")
def perc_setup(spark, tmp_path_factory):
    from donkey_spark.plans.build import build_index
    pdf = gen_corpus(300, seed=41)
    corpus = spark.createDataFrame(pdf)
    out = str(tmp_path_factory.mktemp("percidx"))
    build_index(spark, corpus, out, range_size=64)
    return pdf, corpus, out


def _got(df):
    return {(r["query_id"], r["repo"], r["path"])
            for r in df.collect()}


def _want(spark, out, queries, mode, min_match=None):
    from donkey_spark.plans.facet_counts import match_docs
    from donkey_spark.plans.query import Index
    idx = Index(spark, out)
    want = set()
    for qid, text in queries:
        if min_match is not None:
            mm = (min_match if isinstance(min_match, int)
                  else {qid: min_match[qid]})
            rows = idx.search_rows([(qid, text, idx.n_docs)],
                                   min_match=mm)
            want |= {(qid, repo, path)
                     for q, _rk, _d, _s, repo, path in rows}
        else:
            for r in match_docs(idx, text, mode=mode,
                                columns=["repo", "path"]).collect():
                want.add((qid, r["repo"], r["path"]))
    return want


@pytest.mark.parametrize("mode", ["or", "and"])
def test_percolate_agrees_with_index_search(spark, perc_setup, mode):
    from donkey_spark.plans.percolate import percolate
    _, corpus, out = perc_setup
    got = _got(percolate(corpus, QS, mode=mode))
    assert got == _want(spark, out, QS, mode) and got
    # the all-OOV query matches nothing in either engine
    assert not {g for g in got if g[0] == 3}


def test_percolate_min_match_and_counts(spark, perc_setup):
    from donkey_spark.plans.percolate import percolate
    pdf, corpus, out = perc_setup
    qs = QS[:2]
    got = percolate(corpus, qs, min_match={0: 2, 1: 3})
    assert _got(got) == _want(spark, out, qs, "or",
                              min_match={0: 2, 1: 3})
    # n_terms_matched respects the threshold and the query size
    for r in got.collect():
        lo = 2 if r["query_id"] == 0 else 3
        assert lo <= r["n_terms_matched"] <= 3
    # int fans out to every query; m=1 is plain OR
    assert _got(percolate(corpus, qs, min_match=1)) \
        == _want(spark, out, qs, "or")


def test_percolate_validation_and_plan(spark, perc_setup):
    from donkey_spark.plans.percolate import percolate
    _, corpus, _ = perc_setup
    with pytest.raises(ValueError, match="duplicate"):
        percolate(corpus, [(0, "a"), (0, "b")])
    with pytest.raises(ValueError, match="mode='or'"):
        percolate(corpus, QS[:1], mode="and", min_match=2)
    with pytest.raises(ValueError, match="invalid min_match"):
        percolate(corpus, QS[:1], min_match={9: 2})
    # zero-token queries match nothing; empty query list -> empty frame
    assert percolate(corpus, [(0, "!!! ...")]).count() == 0
    assert percolate(corpus, []).count() == 0
    # plan: broadcast join, no Python eval in the pass
    plan = percolate(corpus, QS)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
