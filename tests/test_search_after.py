"""Cursor pagination (Index.search_rows_after + plans/sharded twin).

Contract: walking a ranking page by page through (score, doc_id)
cursors reproduces the unbounded ranking EXACTLY — same match set,
same order, ties included — under or/and/bool modes, facet filters,
and tombstones; and the per-page cost never depends on page depth
(the offset-paging pathology T30 documents). The federated cursor is
the merge ordering key (score, repo, path); boundary-score ties are
the adversarial case, so the fixture plants duplicate-content docs
that score bit-identically.
"""

import pytest

from fixtures.gen_corpus import gen_corpus

TEXT = "def return"
K = 7


@pytest.fixture(scope="module")
def after_setup(spark, tmp_path_factory):
    from donkey_spark.plans.build import build_index
    pdf = gen_corpus(260, seed=11)
    # plant exact score ties: identical content => identical tf vector
    # and dl => bit-identical BM25, across distinct (repo, path) docs
    dup_src = pdf["content"].iloc[:8].tolist()
    for i in range(200, 240):
        pdf.loc[i, "content"] = dup_src[i % 8]
    corpus = spark.createDataFrame(pdf)
    out = str(tmp_path_factory.mktemp("afteridx"))
    build_index(spark, corpus, out, range_size=64, facets=("lang",))
    return pdf, out


def _walk(idx, text, k, mode="or", filters=None):
    """Page through the full ranking via cursors."""
    out, cur = [], None
    for _ in range(1000):               # bounded: the ranking is finite
        page = idx.search_rows_after([(0, text, k)],
                                     {0: cur} if cur else {},
                                     mode=mode, filters=filters)
        if not page:
            return out
        assert [r[1] for r in page] == list(range(1, len(page) + 1))
        out.extend(page)
        cur = (page[-1][3], page[-1][2])
    raise AssertionError("walk did not terminate")


def test_cursor_tiles_full_ranking_all_modes(spark, after_setup):
    from donkey_spark.plans.query import Index
    _, out = after_setup
    for local_bytes in (64 << 20, 0):   # driver-local AND distributed
        idx = Index(spark, out, local_bytes=local_bytes)
        for mode in ("or", "and"):
            full = idx.search_rows([(0, TEXT, 10_000)], mode=mode)
            walked = _walk(idx, TEXT, K, mode=mode)
            assert ([(r[2], r[3]) for r in walked]
                    == [(r[2], r[3]) for r in full]), (mode, local_bytes)
            assert len(full) > 2 * K    # fixture sanity: multiple pages


def test_cursor_crosses_exact_score_ties(spark, after_setup):
    """The duplicate-content docs give runs of bit-equal scores; a page
    boundary inside such a run must not skip or repeat docs."""
    from donkey_spark.plans.query import Index
    _, out = after_setup
    idx = Index(spark, out)
    full = idx.search_rows([(0, TEXT, 10_000)])
    scores = [r[3] for r in full]
    assert len(scores) != len(set(scores))      # ties really exist
    for k in (1, 2, 3):                         # boundaries land in runs
        walked = _walk(idx, TEXT, k)
        assert [(r[2], r[3]) for r in walked] \
            == [(r[2], r[3]) for r in full], k


def test_cursor_equals_offset_pages(spark, after_setup):
    from donkey_spark.plans.query import Index
    _, out = after_setup
    idx = Index(spark, out)
    q = [(0, TEXT, 10)]
    p1 = idx.search_rows(q)
    cur = {0: (p1[-1][3], p1[-1][2])}
    assert idx.search_rows_after(q, cur) == idx.search_rows_page(q, 10)
    p2 = idx.search_rows_after(q, cur)
    cur2 = {0: (p2[-1][3], p2[-1][2])}
    assert idx.search_rows_after(q, cur2) == idx.search_rows_page(q, 20)


def test_cursor_composes_with_filters(spark, after_setup):
    from donkey_spark.plans.query import Index
    pdf, out = after_setup
    filt = {"lang": pdf["lang"].iloc[0]}
    for local_bytes in (64 << 20, 0):   # driver-local AND distributed
        idx = Index(spark, out, local_bytes=local_bytes)
        full = idx.search_rows([(0, TEXT, 10_000)], filters=filt)
        walked = _walk(idx, TEXT, 4, filters=filt)
        assert [(r[2], r[3]) for r in walked] \
            == [(r[2], r[3]) for r in full], local_bytes


def test_cursor_respects_tombstones(spark, after_setup, tmp_path):
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.delete import delete_docs
    from donkey_spark.plans.query import Index
    from pyspark.sql import functions as F
    pdf, _ = after_setup
    out = str(tmp_path / "delidx")
    build_index(spark, spark.createDataFrame(pdf), out, range_size=64)
    dead = (spark.read.parquet(f"{out}/docs")
            .where(F.col("doc_id") % 5 == 0).select("doc_id"))
    delete_docs(spark, out, dead)
    for local_bytes in (64 << 20, 0):   # driver-local AND distributed
        idx = Index(spark, out, local_bytes=local_bytes)
        full = idx.search_rows([(0, TEXT, 10_000)])
        assert full and all(r[2] % 5 != 0 for r in full)
        walked = _walk(idx, TEXT, 6)
        assert [(r[2], r[3]) for r in walked] \
            == [(r[2], r[3]) for r in full], local_bytes


def test_cursor_bool_mode(spark, after_setup):
    from donkey_spark.plans.query import Index
    _, out = after_setup
    expr = "def AND (return OR class) AND NOT zzqx"
    for local_bytes in (64 << 20, 0):   # driver-local AND distributed
        idx = Index(spark, out, local_bytes=local_bytes)
        full = idx.search_rows_bool([(0, expr, 10_000)])
        assert len(full) > 2 * K
        walked = _walk(idx, expr, K, mode="bool")
        assert [(r[2], r[3]) for r in walked] \
            == [(r[2], r[3]) for r in full], local_bytes


def test_after_edge_shapes(spark, after_setup):
    from donkey_spark.plans.query import Index
    _, out = after_setup
    idx = Index(spark, out)
    full = idx.search_rows([(0, TEXT, 10_000)])
    # beyond the end: empty, not an error
    last = (full[-1][3], full[-1][2])
    assert idx.search_rows_after([(0, TEXT, 5)], {0: last}) == []
    # empty/None after -> first page verbatim
    assert idx.search_rows_after([(0, TEXT, 5)], {}) \
        == idx.search_rows([(0, TEXT, 5)])
    assert idx.search_rows_after([(0, TEXT, 5)], {0: None}) \
        == idx.search_rows([(0, TEXT, 5)])
    with pytest.raises(ValueError):
        idx.search_rows_after([(0, TEXT, 5)], {7: (1.0, 3)})
    with pytest.raises(ValueError):
        idx.search_rows_after([(0, TEXT, 5)], {0: (1.0,)})
    with pytest.raises(ValueError):
        idx.search_rows_after([(0, TEXT, 5)], {0: (1.0, 2)},
                              mode="phrase")


@pytest.fixture(scope="module")
def after_shards(spark, tmp_path_factory, after_setup):
    from donkey_spark.plans.build import build_index
    pdf, _ = after_setup
    base = tmp_path_factory.mktemp("aftersh")
    dirs = []
    for i in range(3):
        shard_pdf = pdf[pdf.index % 3 == i]
        build_index(spark, spark.createDataFrame(shard_pdf),
                    str(base / f"s{i}"), range_size=64, facets=("lang",))
        dirs.append(str(base / f"s{i}"))
    return dirs


def test_sharded_cursor_walk_equals_unified(spark, after_setup,
                                            after_shards):
    """Federated cursor pages must tile to the unified ranking on the
    (repo, path, score) identity — including pages whose boundary sits
    inside a duplicate-content score tie, which is exactly the case
    that exercises the shard-side tie-prefix retry."""
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import (open_shards,
                                            search_after_sharded)
    _, uni_dir = after_setup
    uni = Index(spark, uni_dir)
    shards = open_shards(spark, after_shards)
    full = uni.search_rows([(0, TEXT, 10_000)])
    want = [(r[4], r[5], round(r[3], 9)) for r in full]
    for k in (2, 5):                    # k=2 forces tie-run boundaries
        walked, cur = [], None
        for _ in range(1000):
            page = search_after_sharded(shards, [(0, TEXT, k)],
                                        {0: cur} if cur else {})
            if not page:
                break
            walked.extend(page)
            cur = (page[-1][4], page[-1][5], page[-1][6])
        got = [(repo, path, round(s, 9))
               for _, _, _, _, s, repo, path in walked]
        assert got == want, k
    with pytest.raises(ValueError):
        search_after_sharded(shards, [(0, TEXT, 5)], {9: (1.0, "a", "b")})
    with pytest.raises(ValueError):
        search_after_sharded(shards, [(0, TEXT, 5)], {0: (1.0, "a")})
    with pytest.raises(ValueError):
        search_after_sharded(shards, [(0, TEXT, 5)],
                             {0: (1.0, "a", "b")}, mode="phrase")


def test_sharded_cursor_bool_mode(spark, after_setup, after_shards):
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import (open_shards,
                                            search_after_sharded)
    _, uni_dir = after_setup
    uni = Index(spark, uni_dir)
    shards = open_shards(spark, after_shards)
    expr = "def AND (return OR class) AND NOT zzqx"
    full = uni.search_rows_bool([(0, expr, 10_000)])
    want = [(r[4], r[5], round(r[3], 9)) for r in full]
    walked, cur = [], None
    for _ in range(1000):
        page = search_after_sharded(shards, [(0, expr, 5)],
                                    {0: cur} if cur else {},
                                    mode="bool")
        if not page:
            break
        walked.extend(page)
        cur = (page[-1][4], page[-1][5], page[-1][6])
    got = [(repo, path, round(s, 9))
           for _, _, _, _, s, repo, path in walked]
    assert got == want
