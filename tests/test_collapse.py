"""Field collapsing (plans/collapse.py + the sharded federation).

Contract: top-k GROUPS per query ranked by their best-scoring matching
doc (ties on the representative's doc_id); group_hits counts the
group's FULL match set; inner_hits=n returns each surviving group's
top-n docs. Exact over the whole match set — per-range/per-shard
truncation must never change which groups rank or who represents them
— and composing filters / tombstones / min_match must collapse the
correspondingly-restricted match set.
"""

import numpy as np
import pytest

from fixtures.gen_corpus import gen_corpus
from tests.oracle_bm25 import OracleIndex

QS = [(0, "def return class", 5), (1, "while yield lambda", 4),
      (2, "v62_tmp v82_node v78_vec", 6)]


def _brute_collapse(oracle, ordered, text, k, by="repo",
                    keep=None):
    """Group the oracle's FULL ranking by the column, best-first."""
    full = oracle.search(text, len(ordered))
    best, hits = {}, {}
    for _, d, s in full:
        if keep is not None and d not in keep:
            continue
        g = ordered.loc[d, by]
        hits[g] = hits.get(g, 0) + 1
        if g not in best:
            best[g] = (d, s)
    ranked = sorted(((g, d, s) for g, (d, s) in best.items()),
                    key=lambda r: (-r[2], r[1]))[:k]
    return ranked, hits


@pytest.fixture(scope="module")
def collapse_setup(spark, tmp_path_factory):
    from donkey_spark.plans.build import build_index
    pdf = gen_corpus(300, seed=29)
    corpus = spark.createDataFrame(pdf)
    out = str(tmp_path_factory.mktemp("colidx"))
    build_index(spark, corpus, out, range_size=64, facets=("lang",))
    ordered = pdf.sort_values(["repo", "path", "commit"]).reset_index()
    oracle = OracleIndex(list(enumerate(ordered["content"])))
    return pdf, out, ordered, oracle


def test_collapse_matches_brute_force_both_paths(spark, collapse_setup):
    from donkey_spark.plans.collapse import collapse_rows
    from donkey_spark.plans.query import Index
    _, out, ordered, oracle = collapse_setup
    for local_bytes in (64 << 20, 0):
        idx = Index(spark, out, local_bytes=local_bytes)
        rows = collapse_rows(idx, QS, by="repo")
        for qid, text, k in QS:
            want, hits = _brute_collapse(oracle, ordered, text, k)
            got = [(g, d, round(s, 9)) for q, _, g, hr, d, s, _, _, _
                   in rows if q == qid and hr == 1]
            assert got == [(g, d, round(s, 9)) for g, d, s in want], \
                (qid, local_bytes)
            assert got                      # fixture sanity
            gh = {r[2]: r[6] for r in rows if r[0] == qid}
            assert all(gh[g] == hits[g] for g, _, _ in want)
            # identity columns point at the representative
            for q, _, g, hr, d, s, _, repo, path in rows:
                if q == qid and hr == 1:
                    assert repo == ordered.loc[d, "repo"] == g
                    assert path == ordered.loc[d, "path"]


def test_collapse_inner_hits(spark, collapse_setup):
    """inner_hits=3: each surviving group's top-3 docs in order, all
    carrying the group's rank and hit count."""
    from donkey_spark.plans.collapse import collapse_rows
    from donkey_spark.plans.query import Index
    _, out, ordered, oracle = collapse_setup
    text, k = "def return class", 5
    full = oracle.search(text, len(ordered))
    for local_bytes in (64 << 20, 0):
        idx = Index(spark, out, local_bytes=local_bytes)
        rows = collapse_rows(idx, [(0, text, k)], by="repo",
                             inner_hits=3)
        want_top, _ = _brute_collapse(oracle, ordered, text, k)
        per_g: dict = {}
        for _, rk, g, hr, d, s, n, _, _ in rows:
            per_g.setdefault(g, []).append((hr, d, round(s, 9), rk, n))
        assert set(per_g) == {g for g, _, _ in want_top}
        for g, _, _ in want_top:
            members = [(d, round(s, 9)) for _, d, s in full
                       if ordered.loc[d, "repo"] == g][:3]
            got = sorted(per_g[g])
            assert [(d, s) for _, d, s, _, _ in got] == members, \
                (g, local_bytes)
            assert len({rk for _, _, _, rk, _ in got}) == 1
            assert len({n for _, _, _, _, n in got}) == 1


def test_collapse_by_lang_and_filters(spark, collapse_setup):
    """Low-cardinality collapse + facet filter: groups and counts come
    from the filtered match set only."""
    from donkey_spark.plans.collapse import collapse_rows
    from donkey_spark.plans.query import Index
    _, out, ordered, oracle = collapse_setup
    text = "def return class"
    idx = Index(spark, out)
    rows = collapse_rows(idx, [(0, text, 10)], by="lang")
    want, hits = _brute_collapse(oracle, ordered, text, 10, by="lang")
    assert [(g, d, round(s, 9)) for _, _, g, _, d, s, _, _, _ in rows] \
        == [(g, d, round(s, 9)) for g, d, s in want]
    # filter to two langs: collapse-by-lang must return exactly those
    keep = set(ordered.index[ordered["lang"].isin(["py", "java"])])
    wantf, hitsf = _brute_collapse(oracle, ordered, text, 10,
                                   by="lang", keep=keep)
    rowsf = collapse_rows(idx, [(0, text, 10)], by="lang",
                          filters={"lang": ["py", "java"]})
    assert [(g, d, round(s, 9), n)
            for _, _, g, _, d, s, n, _, _ in rowsf] \
        == [(g, d, round(s, 9), hitsf[g]) for g, d, s in wantf]
    assert {r[2] for r in rowsf} == {"py", "java"}


def test_collapse_composes_with_min_match_and_tombstones(
        spark, collapse_setup, tmp_path):
    import shutil

    from donkey_spark.plans.collapse import collapse_rows
    from donkey_spark.plans.delete import delete_docs
    from donkey_spark.plans.query import Index
    _, src, ordered, oracle = collapse_setup
    out = str(tmp_path / "idx")
    shutil.copytree(src, out)
    text, k, m = "def return class", 5, 2
    # min_match twin: restrict the brute-force to docs matching >= m
    msm = {d for _, d, _ in oracle.search_msm(text, len(ordered), m)}
    want, _ = _brute_collapse(oracle, ordered, text, k, keep=msm)
    idx = Index(spark, out)
    got = collapse_rows(idx, [(0, text, k)], by="repo", min_match=m)
    assert [(g, d) for _, _, g, _, d, _, _, _, _ in got] \
        == [(g, d) for g, d, _ in want]
    # tombstone the top representative: its group re-picks or drops
    top = got[0][4]
    delete_docs(spark, out, [int(top)])
    idx2 = Index(spark, out)
    want2, _ = _brute_collapse(oracle, ordered, text, k,
                               keep=msm - {top})
    got2 = collapse_rows(idx2, [(0, text, k)], by="repo", min_match=m)
    assert [(g, d) for _, _, g, _, d, _, _, _, _ in got2] \
        == [(g, d) for g, d, _ in want2]


def test_collapse_sharded_equals_unified(spark, collapse_setup,
                                         tmp_path_factory):
    """Federated collapse ≡ unified (modulo the documented group_hits
    omission): groups span shards by construction here."""
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.collapse import collapse_rows
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import collapse_rows_sharded
    pdf, out, _, _ = collapse_setup
    base = tmp_path_factory.mktemp("colshards")
    parts = []
    for i in range(3):
        shard_pdf = pdf[pdf.index % 3 == i]
        build_index(spark, spark.createDataFrame(shard_pdf),
                    str(base / f"s{i}"), range_size=64, facets=("lang",))
        parts.append(str(base / f"s{i}"))
    uni = Index(spark, out)
    want = [(q, rk, g, round(s, 9), repo, path)
            for q, rk, g, hr, d, s, n, repo, path
            in collapse_rows(uni, QS, by="repo") if hr == 1]
    shards = [Index(spark, d) for d in parts]
    got = [(q, rk, g, round(s, 9), repo, path)
           for q, rk, si, g, d, s, repo, path
           in collapse_rows_sharded(shards, QS, by="repo")]
    assert got == want and got
    # every source spans >= 2 shards in this split (merge is exercised)
    src_shards = {}
    for i, p in enumerate(parts):
        for r in set(pdf[pdf.index % 3 == i]["repo"]):
            src_shards.setdefault(r, set()).add(i)
    assert any(len(v) > 1 for v in src_shards.values())


def test_collapse_validation(spark, collapse_setup):
    from donkey_spark.plans.collapse import collapse_rows
    from donkey_spark.plans.query import Index
    _, out, _, _ = collapse_setup
    idx = Index(spark, out)
    with pytest.raises(ValueError, match="cannot collapse"):
        collapse_rows(idx, QS, by="doc_id")
    with pytest.raises(ValueError, match="cannot collapse"):
        collapse_rows(idx, QS, by="nope")
    with pytest.raises(ValueError, match="inner_hits"):
        collapse_rows(idx, QS, inner_hits=0)
    # OOV query collapses to nothing, not an error
    assert collapse_rows(idx, [(0, "zz_oov_token", 5)]) == []
