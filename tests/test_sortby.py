"""Sort-by-field search (plans/sortby.py + plans/sharded.py twin).

Contract: sorted_topk returns EXACTLY the query's match set (same
modes, same facet-filter grammar, same tombstone mask as search)
re-ordered by a docs metadata column with the deterministic doc_id
tie-break — scores never enter; and the federated merge is invisible
(identical (key, repo, path) rows as a unified index over the same
corpus).
"""

import pytest

from fixtures.gen_corpus import gen_corpus


@pytest.fixture(scope="module")
def sort_setup(spark, tmp_path_factory):
    from donkey_spark.plans.build import build_index
    pdf = gen_corpus(300, seed=7)
    corpus = spark.createDataFrame(pdf)
    out = str(tmp_path_factory.mktemp("sortidx"))
    build_index(spark, corpus, out, range_size=64, facets=("lang",))
    docs = {r["doc_id"]: (r["dl"], r["lang"], r["repo"], r["path"])
            for r in spark.read.parquet(f"{out}/docs").collect()}
    return corpus, out, docs


def _expected(idx, docs, text, by_i, k, descending, mode,
              keep=None):
    """Brute force: the engine's own (already oracle-certified)
    unbounded match set, re-ordered by the docs column."""
    full = idx.search_rows([(0, text, len(docs) + 1)], mode=mode)
    ids = [r[2] for r in full if keep is None or keep(r[2])]
    rows = sorted(((docs[d][by_i], d) for d in ids),
                  key=lambda r: (-r[0], r[1]) if descending
                  and not isinstance(r[0], str) else (r[0], r[1]))
    if descending and rows and isinstance(rows[0][0], str):
        # string desc with doc_id-asc ties: reverse the key groups
        groups, out = {}, []
        for key, d in rows:
            groups.setdefault(key, []).append(d)
        for key in sorted(groups, reverse=True):
            out.extend((key, d) for d in groups[key])
        rows = out
    return [(rk, d, key) for rk, (key, d)
            in enumerate(rows[:k], start=1)]


def test_sorted_matches_bruteforce_all_modes(spark, sort_setup):
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sortby import sorted_topk
    _, out, docs = sort_setup
    # local_bytes=64MB -> the driver-local pyarrow path; 0 -> the
    # distributed match-ids + docs-join + TakeOrdered plan. Both must
    # produce identical rows (the local path reuses the same per-salt
    # helpers, but the docs read and ordering machinery differ).
    for local_bytes in (64 << 20, 0):
        idx = Index(spark, out, local_bytes=local_bytes)
        for mode in ("or", "and"):
            for desc in (True, False):
                got = sorted_topk(idx, "def return", by="dl", k=12,
                                  descending=desc, mode=mode)
                exp = _expected(idx, docs, "def return", 0, 12, desc,
                                mode)
                assert [(rk, d, key)
                        for rk, d, key, _r, _p in got] == exp, \
                    (mode, desc, local_bytes)
                # identity columns come from the docs table
                assert all((r, p) == docs[d][2:]
                           for _, d, _, r, p in got)


def test_match_count_local_equals_distributed(spark, sort_setup):
    from donkey_spark.plans.facet_counts import match_count
    from donkey_spark.plans.query import Index
    _, out, docs = sort_setup
    target = docs[0][1]
    loc = Index(spark, out)                      # local fast path
    dist = Index(spark, out, local_bytes=0)      # distributed kernel
    for mode in ("or", "and"):
        for filt in (None, {"lang": target}):
            assert match_count(loc, "def return", mode=mode,
                               filters=filt) \
                == match_count(dist, "def return", mode=mode,
                               filters=filt), (mode, filt)
    assert match_count(loc, "zzqx") == 0


def test_sorted_string_key_desc_and_asc(spark, sort_setup):
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sortby import sorted_topk
    _, out, docs = sort_setup
    for local_bytes in (64 << 20, 0):
        idx = Index(spark, out, local_bytes=local_bytes)
        for desc in (True, False):
            got = sorted_topk(idx, "def return", by="lang", k=15,
                              descending=desc, mode="or")
            exp = _expected(idx, docs, "def return", 1, 15, desc, "or")
            assert [(rk, d, key) for rk, d, key, _r, _p in got] == exp, \
                (desc, local_bytes)


def test_sorted_respects_filters(spark, sort_setup):
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sortby import sorted_topk
    _, out, docs = sort_setup
    target = docs[0][1]
    for local_bytes in (64 << 20, 0):   # driver-local AND distributed
        idx = Index(spark, out, local_bytes=local_bytes)
        got = sorted_topk(idx, "def return", by="dl", k=10,
                          filters={"lang": target})
        exp = _expected(idx, docs, "def return", 0, 10, True, "or",
                        keep=lambda d: docs[d][1] == target)
        assert exp and [(rk, d, key)
                        for rk, d, key, _r, _p in got] == exp, local_bytes


def test_sorted_excludes_tombstones(spark, sort_setup, tmp_path):
    import shutil

    from donkey_spark.plans.delete import delete_docs
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sortby import sorted_topk
    _, out, docs = sort_setup
    dup = str(tmp_path / "tombidx")
    shutil.copytree(out, dup)
    idx = Index(spark, dup)
    before = sorted_topk(idx, "def return", by="dl", k=5)
    victim = before[0][1]
    delete_docs(spark, dup, [victim])
    for local_bytes in (64 << 20, 0):   # driver-local AND distributed
        after = sorted_topk(Index(spark, dup, local_bytes=local_bytes),
                            "def return", by="dl", k=5)
        assert victim not in [r[1] for r in after], local_bytes
        assert [r[1] for r in after][:4] \
            == [r[1] for r in before[1:5]], local_bytes


def test_sorted_oov_empty_and_bad_column(spark, sort_setup):
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sortby import sorted_topk
    _, out, _ = sort_setup
    for local_bytes in (64 << 20, 0):
        idx = Index(spark, out, local_bytes=local_bytes)
        assert sorted_topk(idx, "zzqx", by="dl", k=5) == []
        with pytest.raises(ValueError, match="sortable"):
            sorted_topk(idx, "def", by="content", k=5)


def test_sorted_sharded_equals_unified(spark, sort_setup,
                                       tmp_path_factory):
    from pyspark.sql import functions as F

    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import sorted_topk_sharded
    from donkey_spark.plans.sortby import sorted_topk
    corpus, out, _ = sort_setup
    part = F.abs(F.hash("path")) % 2
    shards = []
    for i in range(2):
        d = str(tmp_path_factory.mktemp(f"sortshard{i}"))
        build_index(spark, corpus.where(part == i), d, range_size=64,
                    facets=("lang",))
        shards.append(Index(spark, d))
    uni = Index(spark, out)
    for mode in ("or", "and"):
        for by in ("dl", "lang"):
            u = sorted_topk(uni, "def return", by=by, k=10, mode=mode)
            s = sorted_topk_sharded(shards, "def return", by=by, k=10,
                                    mode=mode)
            assert [(rk, key, r, p) for rk, _d, key, r, p in u] \
                == [(rk, key, r, p) for rk, _si, _d, key, r, p in s], \
                (mode, by)
