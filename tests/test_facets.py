"""Field filters via facet terms (plans/build.py facets=... +
Index.search(filters=...)).

Contract: a filtered query returns exactly the unfiltered ranking
restricted to docs carrying the facet value (scores byte-identical for
survivors — facet postings are presence-only and never touch BM25
stats), in OR and AND mode, on both execution paths; and building with
facets changes NOTHING for unfiltered queries.
"""

import numpy as np
import pytest

from fixtures.gen_corpus import gen_corpus


@pytest.fixture(scope="module")
def facet_setup(spark, tmp_path_factory):
    from donkey_spark.plans.build import build_index
    pdf = gen_corpus(300, seed=42)
    corpus = spark.createDataFrame(pdf)
    plain = str(tmp_path_factory.mktemp("plain"))
    faceted = str(tmp_path_factory.mktemp("faceted"))
    build_index(spark, corpus, plain, range_size=64)
    build_index(spark, corpus, faceted, range_size=64, facets=("lang",))
    # doc_id -> lang via the engine's own docs table
    lang = {r["doc_id"]: r["lang"] for r in
            spark.read.parquet(f"{faceted}/docs").collect()}
    return plain, faceted, lang


def test_unfiltered_results_identical_with_and_without_facets(
        spark, facet_setup):
    from donkey_spark.plans.query import Index
    plain, faceted, _ = facet_setup
    qs = [(0, "def return", 10), (1, "class import spark", 5), (2, "def", 50)]
    for mode in ("or", "and"):
        a = sorted(map(tuple, Index(spark, plain)
                       .search_batch(qs, mode=mode).collect()))
        b = sorted(map(tuple, Index(spark, faceted)
                       .search_batch(qs, mode=mode).collect()))
        assert a == b, mode


def test_filtered_equals_unfiltered_restricted(spark, facet_setup):
    from donkey_spark.plans.query import Index
    plain, faceted, lang = facet_setup
    n = len(lang)
    target = lang[0]                      # some lang present in the corpus
    for local_bytes in (64 << 20, 0):     # driver-local AND distributed
        idx = Index(spark, faceted, local_bytes=local_bytes)
        for mode, text in (("or", "def return"), ("and", "def return")):
            full = idx.search_rows([(0, text, n)], mode=mode)
            exp = [(r[2], round(r[3], 9)) for r in full
                   if lang[r[2]] == target][:10]
            assert len(exp) > 2           # fixture sanity
            got = idx.search_rows([(0, text, 10)], mode=mode,
                                  filters={"lang": target})
            assert [(r[2], round(r[3], 9)) for r in got] == exp, \
                (mode, local_bytes)
            assert all(lang[r[2]] == target for r in got)


def test_filter_nonexistent_value_returns_empty(spark, facet_setup):
    from donkey_spark.plans.query import Index
    _, faceted, _ = facet_setup
    idx = Index(spark, faceted)
    assert idx.search_rows([(0, "def", 10)],
                           filters={"lang": "klingon"}) == []


def test_filter_on_unfaceted_index_raises(spark, facet_setup):
    from donkey_spark.plans.query import Index
    plain, faceted, _ = facet_setup
    with pytest.raises(ValueError, match="no facet"):
        Index(spark, plain).search_rows([(0, "def", 5)],
                                        filters={"lang": "py"})
    with pytest.raises(ValueError, match="no facet"):
        Index(spark, faceted).search_rows([(0, "def", 5)],
                                          filters={"repo": "x"})


def test_filters_compose_with_tombstones(spark, facet_setup):
    """Deletion and facet filtering stack: a deleted doc stays invisible
    inside the filtered result set too."""
    import shutil
    from donkey_spark.plans.delete import delete_docs
    from donkey_spark.plans.query import Index
    _, faceted, lang = facet_setup
    idx = Index(spark, faceted)
    target = lang[0]
    got = idx.search_rows([(0, "def return", 5)], filters={"lang": target})
    assert got
    victim = got[0][2]
    delete_docs(spark, faceted, [victim])
    try:
        got2 = Index(spark, faceted).search_rows(
            [(0, "def return", 5)], filters={"lang": target})
        assert victim not in [r[2] for r in got2]
        assert [r[2] for r in got2][:len(got) - 1] == \
            [r[2] for r in got][1:]
    finally:
        for d in ("tombstones", "tombstones_staging"):
            shutil.rmtree(f"{faceted}/{d}", ignore_errors=True)


def test_stream_epochs_preserve_base_facets(spark, tmp_path):
    """Epochs appended over a facet-enabled batch index must keep
    indexing the same facets: filtered queries stay exact over the union
    of batch and streamed docs."""
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    from donkey_spark.streaming.ingest import _append_epoch
    from donkey_spark.sources.corpus import CORPUS_SCHEMA
    pdf = gen_corpus(120, seed=23)
    out = str(tmp_path / "sfidx")
    build_index(spark, spark.createDataFrame(pdf.iloc[:80]), out,
                range_size=64, facets=("lang",))
    memo: dict = {}
    _append_epoch(spark.createDataFrame(pdf.iloc[80:], CORPUS_SCHEMA),
                  0, out, "varint", 128, memo=memo)
    idx = Index(spark, out)
    assert idx.facets == ("lang",)
    lang = {r["doc_id"]: r["lang"] for r in
            spark.read.parquet(f"{out}/docs").collect()}
    target = lang[0]
    n = idx.n_docs
    full = idx.search_rows([(0, "def return", n)])
    exp = [r[2] for r in full if lang[r[2]] == target][:10]
    got = [r[2] for r in idx.search_rows([(0, "def return", 10)],
                                         filters={"lang": target})]
    assert got == exp
    # streamed docs must be findable through the filter too
    streamed = {d for d, v in lang.items() if d >= 80 and v == target}
    assert streamed & set(r[2] for r in full if lang[r[2]] == target) \
        or not streamed


def test_compact_preserves_facets(spark, tmp_path):
    """The periodic reindex must keep indexing the same facets (review
    r3: compact used to rebuild with facets=() and silently break
    filtered queries)."""
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    from donkey_spark.streaming import compact_index
    pdf = gen_corpus(100, seed=31)
    corpus = spark.createDataFrame(pdf)
    out = str(tmp_path / "cfidx")
    build_index(spark, corpus, out, range_size=64, facets=("lang",))
    lang0 = Index(spark, out).search_rows([(0, "def", 3)])[0]
    compact_index(spark, corpus, out, range_size=64)
    idx = Index(spark, out)
    assert idx.facets == ("lang",)
    lang = {r["doc_id"]: r["lang"] for r in
            spark.read.parquet(f"{out}/docs").collect()}
    target = lang[0]
    got = idx.search_rows([(0, "def", 5)], filters={"lang": target})
    assert got and all(lang[r[2]] == target for r in got)


def test_or_filter_equals_unfiltered_restricted(spark, facet_setup):
    """r4 multi-value filters: {"lang": [v1, v2]} == unfiltered ranking
    restricted to docs with lang IN (v1, v2); survivor scores identical;
    both modes, both execution paths."""
    from donkey_spark.plans.query import Index
    plain, faceted, lang = facet_setup
    n = len(lang)
    vals = sorted({v for v in lang.values()})[:2]
    assert len(vals) == 2
    for local_bytes in (64 << 20, 0):
        idx = Index(spark, faceted, local_bytes=local_bytes)
        for mode in ("or", "and"):
            full = idx.search_rows([(0, "def return", n)], mode=mode)
            exp = [(r[2], round(r[3], 9)) for r in full
                   if lang[r[2]] in vals][:10]
            assert len(exp) > 2
            got = idx.search_rows([(0, "def return", 10)], mode=mode,
                                  filters={"lang": vals})
            assert [(r[2], round(r[3], 9)) for r in got] == exp, \
                (mode, local_bytes)
            # a single-value LIST equals the scalar form
            one = idx.search_rows([(0, "def return", 10)], mode=mode,
                                  filters={"lang": [vals[0]]})
            scalar = idx.search_rows([(0, "def return", 10)], mode=mode,
                                     filters={"lang": vals[0]})
            assert one == scalar, (mode, local_bytes)


def test_or_filter_unknown_values_drop_out(spark, facet_setup):
    """Values absent from the dictionary drop out of their OR group; a
    group with NO present value returns empty."""
    from donkey_spark.plans.query import Index
    _, faceted, lang = facet_setup
    target = lang[0]
    idx = Index(spark, faceted)
    with_ghost = idx.search_rows([(0, "def return", 10)],
                                 filters={"lang": [target, "zz_nope"]})
    alone = idx.search_rows([(0, "def return", 10)],
                            filters={"lang": target})
    assert with_ghost == alone
    assert idx.search_rows([(0, "def return", 10)],
                           filters={"lang": ["zz_nope", "zz_nada"]}) == []
    with pytest.raises(ValueError, match="empty filter"):
        idx.search_rows([(0, "def return", 10)], filters={"lang": []})


def test_not_filter_equals_unfiltered_complement(spark, facet_setup):
    """r4 negation: {"lang": {"not": [v...]}} == unfiltered ranking minus
    docs carrying a listed value; survivor scores identical; both modes,
    both execution paths; scalar and list forms agree."""
    from donkey_spark.plans.query import Index
    plain, faceted, lang = facet_setup
    n = len(lang)
    vals = sorted({v for v in lang.values()})[:2]
    for local_bytes in (64 << 20, 0):
        idx = Index(spark, faceted, local_bytes=local_bytes)
        for mode in ("or", "and"):
            full = idx.search_rows([(0, "def return", n)], mode=mode)
            exp = [(r[2], round(r[3], 9)) for r in full
                   if lang[r[2]] not in vals][:10]
            assert len(exp) > 2
            got = idx.search_rows([(0, "def return", 10)], mode=mode,
                                  filters={"lang": {"not": vals}})
            assert [(r[2], round(r[3], 9)) for r in got] == exp, \
                (mode, local_bytes)
            one = idx.search_rows([(0, "def return", 10)], mode=mode,
                                  filters={"lang": {"not": vals[0]}})
            lst = idx.search_rows([(0, "def return", 10)], mode=mode,
                                  filters={"lang": {"not": [vals[0]]}})
            assert one == lst, (mode, local_bytes)


def test_not_filter_unknown_value_is_noop(spark, facet_setup):
    """NOT of a value no doc carries excludes nothing; malformed filter
    dicts raise."""
    from donkey_spark.plans.query import Index
    _, faceted, _ = facet_setup
    idx = Index(spark, faceted)
    base = idx.search_rows([(0, "def return", 10)])
    got = idx.search_rows([(0, "def return", 10)],
                          filters={"lang": {"not": ["zz_nope"]}})
    assert got == base
    with pytest.raises(ValueError, match="must be"):
        idx.search_rows([(0, "def", 5)], filters={"lang": {"nope": ["x"]}})
    with pytest.raises(ValueError, match="empty filter"):
        idx.search_rows([(0, "def", 5)], filters={"lang": {"not": []}})


def test_mixed_batch_per_query_filters(spark, facet_setup):
    """search_rows_mixed: one batch mixing unfiltered, equality, OR, NOT
    and AND-mode queries returns exactly each query's individual result."""
    from donkey_spark.plans.query import Index
    _, faceted, lang = facet_setup
    vals = sorted({v for v in lang.values()})[:2]
    idx = Index(spark, faceted)
    specs = [
        (0, "def return", 5, None, None),
        (1, "def return", 5, "or", {"lang": vals[0]}),
        (2, "def return", 5, "or", {"lang": vals}),
        (3, "def return", 5, "or", {"lang": {"not": vals}}),
        (4, "def return", 5, "and", None),
        (5, "class import", 5, "or", {"lang": vals[0]}),  # batches with 1
    ]
    got = idx.search_rows_mixed(specs)
    exp = []
    for qid, text, k, mode, filt in specs:
        exp.extend(idx.search_rows([(qid, text, k)], mode=mode or "or",
                                   filters=filt))
    assert got == sorted(exp)
    assert {r[0] for r in got} == set(range(6))


def test_mixed_batch_rejects_duplicate_query_ids(spark, facet_setup):
    """r5 (ADVICE): duplicate query_ids across sub-batches would silently
    interleave rankings under one id — reject them up front."""
    import pytest
    from donkey_spark.plans.query import Index
    _, faceted, _ = facet_setup
    idx = Index(spark, faceted)
    with pytest.raises(ValueError, match="duplicate query_ids \\[7\\]"):
        idx.search_rows_mixed([(7, "def", 5, None, None),
                               (7, "return", 5, "and", None)])


def test_index_child_sessions_are_shared(spark, facet_setup):
    """r5 (ADVICE): Index instances with the same caller conf + split
    size share ONE child session (no session leak per instance); a
    different split size gets its own."""
    from donkey_spark.plans.query import Index
    _, faceted, _ = facet_setup
    a = Index(spark, faceted)
    b = Index(spark, faceted)
    assert a._qspark is b._qspark
    assert a._qspark is not spark
    c = Index(spark, faceted, scan_partition_bytes="64m")
    assert c._qspark is not a._qspark
    assert c._qspark.conf.get("spark.sql.files.maxPartitionBytes") == "64m"
    assert a._qspark.conf.get("spark.sql.files.maxPartitionBytes") == "128m"


def test_distributed_fallback_split_sizing(spark, facet_setup):
    """When the isolated query session is unavailable (Index._qspark is
    the caller's session), the scorer applies its split size via
    set/restore: results identical, session conf restored."""
    from donkey_spark.plans.query import Index
    _, faceted, _ = facet_setup
    base = Index(spark, faceted, local_bytes=0).search_rows(
        [(0, "def return", 10)])
    idx = Index(spark, faceted, local_bytes=0)
    idx._qspark = spark                      # force the fallback branch
    idx._seg = spark.read.option(
        "basePath", f"{faceted}/segments").parquet(f"{faceted}/segments")
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    got = idx.search_rows([(0, "def return", 10)])
    assert got == base
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") == prev


def test_qspark_cache_evicts_stale_applications(spark, facet_setup):
    """r5 review: cached child sessions keyed by a DIFFERENT (stopped/
    replaced) applicationId are evicted when a new one is created."""
    from donkey_spark.plans import query as qmod
    _, faceted, _ = facet_setup
    stale_key = ("app-that-no-longer-exists", "128m", ("x",))
    qmod._QSPARK_CACHE[stale_key] = spark
    # force a fresh creation path (unique split size → cache miss)
    from donkey_spark.plans.query import Index
    idx = Index(spark, faceted, scan_partition_bytes="96m")
    assert stale_key not in qmod._QSPARK_CACHE
    assert idx._qspark.conf.get(
        "spark.sql.files.maxPartitionBytes") == "96m"


def test_filter_spec_accepts_any_iterable(spark, facet_setup):
    """r5 review: frozenset / dict_keys / tuple filter values must behave
    like lists, not collapse to a stringified scalar."""
    from donkey_spark.plans.query import Index
    _, faceted, lang = facet_setup
    target = lang[0]
    idx = Index(spark, faceted)
    base = idx.search_rows([(0, "def return", 5)],
                           filters={"lang": [target]})
    assert base
    for form in (frozenset({target}), (target,), {target: 1}.keys(),
                 iter([target])):
        assert idx.search_rows([(0, "def return", 5)],
                               filters={"lang": form}) == base, form


# -- facet histograms (plans/facet_counts.py) --------------------------------

def _brute_counts(idx, lang, text, mode):
    """Oracle: full match set via the (already oracle-verified) scorer at
    k=corpus, counted per lang."""
    from collections import Counter
    n = len(lang)
    rows = idx.search_rows([(0, text, n)], mode=mode)
    c = Counter(lang[r[2]] for r in rows if lang[r[2]] is not None)
    return dict(c)


@pytest.mark.parametrize("mode", ["or", "and"])
def test_facet_counts_match_full_match_set(spark, facet_setup, mode):
    from donkey_spark.plans.facet_counts import facet_counts
    from donkey_spark.plans.query import Index
    _, faceted, lang = facet_setup
    idx = Index(spark, faceted)
    text = "def return class"
    exp = _brute_counts(idx, lang, text, mode)
    assert sum(exp.values()) > 10         # fixture sanity
    got = {r["value"]: r["n_docs"]
           for r in facet_counts(idx, text, "lang", mode=mode).collect()}
    assert got == exp


def test_facet_counts_values_subset(spark, facet_setup):
    """values= restricts the histogram without touching other counts."""
    from donkey_spark.plans.facet_counts import facet_counts
    from donkey_spark.plans.query import Index
    _, faceted, lang = facet_setup
    idx = Index(spark, faceted)
    full = {r["value"]: r["n_docs"]
            for r in facet_counts(idx, "def return", "lang").collect()}
    assert len(full) >= 2
    pick = sorted(full)[:1]
    sub = {r["value"]: r["n_docs"]
           for r in facet_counts(idx, "def return", "lang",
                                 values=pick).collect()}
    assert sub == {v: full[v] for v in pick}


def test_facet_counts_compose_with_tombstones(spark, facet_setup):
    import shutil
    from donkey_spark.plans.delete import delete_docs
    from donkey_spark.plans.facet_counts import facet_counts
    from donkey_spark.plans.query import Index
    _, faceted, lang = facet_setup
    idx = Index(spark, faceted)
    before = {r["value"]: r["n_docs"]
              for r in facet_counts(idx, "def return", "lang").collect()}
    victim = idx.search_rows([(0, "def return", 1)])[0][2]
    delete_docs(spark, faceted, [victim])
    try:
        after = {r["value"]: r["n_docs"] for r in facet_counts(
            Index(spark, faceted), "def return", "lang").collect()}
        exp = dict(before)
        exp[lang[victim]] -= 1
        assert after == {v: n for v, n in exp.items() if n}
    finally:
        for d in ("tombstones", "tombstones_staging"):
            shutil.rmtree(f"{faceted}/{d}", ignore_errors=True)


def test_facet_counts_errors_and_empty(spark, facet_setup):
    from donkey_spark.plans.facet_counts import facet_counts, facet_values
    from donkey_spark.plans.query import Index
    plain, faceted, lang = facet_setup
    idx = Index(spark, faceted)
    with pytest.raises(ValueError, match="no facet"):
        facet_counts(Index(spark, plain), "def", "lang")
    with pytest.raises(ValueError):
        facet_counts(idx, "def", "lang", mode="xor")
    assert facet_counts(idx, "zzqqxwnotaterm", "lang").collect() == []
    # AND with one OOV term matches nothing
    assert facet_counts(idx, "def zzqqxwnotaterm", "lang",
                        mode="and").collect() == []
    assert facet_values(idx, "lang") == \
        sorted({v for v in lang.values() if v is not None})
    # r5 review: the OOV early-exit must fire BEFORE the value-
    # enumeration dictionary scan — that job is pure waste on a query
    # that provably matches nothing
    import donkey_spark.plans.facet_counts as fc

    def boom(*a, **k):
        raise AssertionError("value enumeration ran on an OOV query")

    orig = fc._tag_values
    fc._tag_values = boom
    try:
        assert facet_counts(idx, "zzqqxwnotaterm", "lang").collect() == []
        assert facet_counts(idx, "def zzqqxwnotaterm", "lang",
                            mode="and").collect() == []
    finally:
        fc._tag_values = orig


# -- explain_search (planning observability) ---------------------------------

def test_explain_search_reports_the_plan(spark, facet_setup):
    """explain_search must agree with what search_rows actually does:
    path choice, per-term dfs, bucket count, facet resolution — and
    never execute a scan (it is pure planning)."""
    import json
    from donkey_spark.plans.query import Index
    _, faceted, lang = facet_setup
    target = lang[0]
    idx = Index(spark, faceted)
    exp = idx.explain_search([(0, "def return", 10)],
                             filters={"lang": target})
    json.dumps(exp)                        # JSON-serializable contract
    assert exp["path"] == "local"          # tiny fixture fits the budget
    assert exp["est_bytes"] <= exp["local_budget_bytes"]
    assert exp["facet_groups"] == [{"kind": "any", "values": [target]}]
    terms = {t["term"]: t for t in exp["queries"][0]["terms"]}
    assert set(terms) == {"def", "return"}
    assert all(t["df"] > 0 and t["idf"] > 0 for t in terms.values())
    assert 1 <= exp["buckets_probed"] <= exp["n_buckets"]
    # forcing the distributed path flips the decision
    exp2 = Index(spark, faceted, local_bytes=0).explain_search(
        [(0, "def return", 10)])
    assert exp2["path"] == "distributed"
    # provably-empty plans say so
    exp3 = idx.explain_search([(0, "zzqnotaterm", 5)])
    assert exp3["path"] == "empty" and exp3["queries"] == {}
    exp4 = idx.explain_search([(0, "def zzq_oov", 5)], mode="and")
    assert exp4["path"] == "empty"
    # OOV terms in OR mode are listed as dropped, not silently gone
    exp5 = idx.explain_search([(0, "def zzq_oov", 5)])
    assert exp5["queries"][0]["dropped_oov"] == ["zzq_oov"]


def test_facet_counts_multi_column_single_pass(spark, tmp_path):
    """The list form counts every facet column in one pass and agrees
    with per-column calls."""
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.facet_counts import facet_counts
    from donkey_spark.plans.query import Index
    pdf = gen_corpus(200, seed=21)
    out = str(tmp_path / "multi")
    build_index(spark, spark.createDataFrame(pdf), out, range_size=64,
                facets=("lang", "repo"))
    idx = Index(spark, out)
    multi = {(r["facet"], r["value"]): r["n_docs"] for r in
             facet_counts(idx, "def return", ["lang", "repo"]).collect()}
    singles = {}
    for col in ("lang", "repo"):
        for r in facet_counts(idx, "def return", col).collect():
            singles[(col, r["value"])] = r["n_docs"]
    assert multi == singles
    assert {f for f, _ in multi} == {"lang", "repo"}
    with pytest.raises(ValueError, match="values="):
        facet_counts(idx, "def", ["lang", "repo"], values=["py"])
    with pytest.raises(ValueError, match="no facet"):
        facet_counts(idx, "def", ["lang", "nope"])


def test_facet_counts_respect_filters(spark, tmp_path):
    """Faceted navigation: one column's histogram respects the other
    column's active selection (equality, OR list, NOT), matching a
    brute-force recount of the filtered match set."""
    from collections import Counter
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.facet_counts import facet_counts
    from donkey_spark.plans.query import Index
    pdf = gen_corpus(250, seed=31)
    out = str(tmp_path / "nav")
    build_index(spark, spark.createDataFrame(pdf), out, range_size=64,
                facets=("lang", "repo"))
    idx = Index(spark, out)
    docs = {r["doc_id"]: (r["lang"], r["repo"]) for r in
            spark.read.parquet(f"{out}/docs").collect()}
    match = [r[2] for r in
             idx.search_rows([(0, "def return", len(docs))])]
    langs = sorted({v[0] for v in docs.values() if v[0]})
    sel = langs[:2]
    cases = [
        ({"lang": sel[0]}, lambda l: l == sel[0]),
        ({"lang": sel}, lambda l: l in sel),
        ({"lang": {"not": [sel[0]]}}, lambda l: l != sel[0]),
    ]
    for filt, keep in cases:
        exp = Counter(docs[d][1] for d in match
                      if keep(docs[d][0]) and docs[d][1] is not None)
        got = {r["value"]: r["n_docs"] for r in facet_counts(
            idx, "def return", "repo", filters=filt).collect()}
        assert got == dict(exp), filt
        assert sum(got.values()) < len(match)     # filter actually bites
    # filters compose with the multi-column form
    got = {(r["facet"], r["value"]): r["n_docs"] for r in facet_counts(
        idx, "def return", ["lang", "repo"],
        filters={"lang": sel[0]}).collect()}
    assert set(got) and all(
        f != "lang" or v == sel[0] for (f, v) in got)
    # an impossible selection yields an empty histogram
    assert facet_counts(idx, "def return", "repo",
                        filters={"lang": "klingon"}).collect() == []
    with pytest.raises(ValueError, match="no facet"):
        facet_counts(idx, "def return", "repo", filters={"nope": "x"})


def test_bool_facet_values_match_spark_cast(spark, tmp_path):
    """The build side renders facet values with Spark cast('string')
    (booleans -> 'true'/'false'); the query side's facet_term must
    render them the SAME way — Python str(True) is 'True', which would
    compile to an out-of-dictionary tag and silently match nothing
    (or, negated, silently filter nothing). r5 review."""
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.facet_counts import facet_values
    from donkey_spark.plans.query import Index
    rows = [("r", f"f/{i}", "c" * 40, "py", f"tok{i} common zz",
             i % 2 == 0) for i in range(12)]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string, flag boolean")
    out = str(tmp_path / "bfidx")
    build_index(spark, df, out, range_size=64, facets=("flag",))
    idx = Index(spark, out)
    assert facet_values(idx, "flag") == ["false", "true"]
    on = idx.search_rows([(0, "common", 50)], filters={"flag": True})
    off = idx.search_rows([(0, "common", 50)],
                          filters={"flag": {"not": [True]}})
    assert len(on) == 6 and all(int(p[2:]) % 2 == 0
                                for _, _, _, _, _, p in on)
    assert len(off) == 6 and all(int(p[2:]) % 2 == 1
                                 for _, _, _, _, _, p in off)
    from donkey_spark.plans.facet_counts import facet_counts
    hist = {r["value"]: r["n_docs"]
            for r in facet_counts(idx, "common", "flag").collect()}
    assert hist == {"true": 6, "false": 6}
    # the arrow extractor's projection carries the custom facet column
    # through its mapInArrow schema too
    out2 = str(tmp_path / "bfidx_arrow")
    build_index(spark, df, out2, range_size=64, facets=("flag",),
                extractor="arrow")
    assert Index(spark, out2).search_rows(
        [(0, "common", 50)], filters={"flag": True}) == on


def test_mixed_type_filter_values_raise(spark):
    """A value list whose members do not sort together must raise, not
    collapse into one garbage str()-of-the-list tag (silently empty for
    'any', silently ignored for 'not'). r5 review."""
    from donkey_spark.operators.facets import normalize_filter_spec
    for bad in (["py", None], ["py", 3], {"not": ["java", None]}):
        with pytest.raises(ValueError, match="comparable"):
            normalize_filter_spec("lang", bad)
    # homogeneous non-string values still normalize fine
    assert normalize_filter_spec("n", [3, 1, 2]) == ("any", [1, 2, 3])


@pytest.mark.parametrize("mode", ["or", "and"])
def test_match_count_equals_full_ranking_size(spark, facet_setup, mode):
    """match_count is exactly the number of rows an unbounded search
    would rank — across modes, filters, and after deletions."""
    from donkey_spark.plans.delete import clear_tombstones, delete_docs
    from donkey_spark.plans.facet_counts import match_count
    from donkey_spark.plans.query import Index
    _, faceted, lang = facet_setup
    idx = Index(spark, faceted)
    n = idx.n_docs
    text = "def return class"
    langs = sorted(set(lang.values()))[:2]
    for filt in (None, {"lang": langs[0]}, {"lang": langs},
                 {"lang": {"not": langs}}):
        got = match_count(idx, text, mode=mode, filters=filt)
        want = len(idx.search_rows([(0, text, n)], mode=mode,
                                   filters=filt))
        assert got == want and (filt is not None or got > 0), filt
    # OOV: 0 in OR (single OOV term query) and in AND (mixed query)
    assert match_count(idx, "zz_totally_oov", mode=mode) == 0
    if mode == "and":
        assert match_count(idx, "def zz_totally_oov", mode="and") == 0
    # tombstoned docs leave the count (same mask as search)
    base = match_count(idx, text, mode=mode)
    victims = [r[2] for r in idx.search_rows([(0, text, 3)], mode=mode)]
    delete_docs(spark, faceted, victims)
    try:
        fresh = Index(spark, faceted)
        assert match_count(fresh, text, mode=mode) == base - len(victims)
    finally:
        clear_tombstones(spark, faceted)


def test_pagination_tiles_the_full_ranking(spark, facet_setup):
    """Pages of k concatenated (re-offset) == the single big ranking;
    filters compose; short rankings underfill or skip pages; offset 0
    is exactly search_rows."""
    from donkey_spark.plans.query import Index
    _, faceted, lang = facet_setup
    idx = Index(spark, faceted)
    text = "def return class"
    n = idx.n_docs
    full = idx.search_rows([(0, text, n)])
    assert len(full) > 25                 # fixture sanity: >2 pages of 10
    qs = [(0, text, 10)]
    tiled = []
    for off in range(0, len(full) + 10, 10):
        page = idx.search_rows_page(qs, offset=off)
        tiled += [(r[0], r[1] + off, *r[2:]) for r in page]
    assert tiled == full
    assert idx.search_rows_page(qs, offset=len(full)) == []
    assert idx.search_rows_page(qs, offset=0) == idx.search_rows(qs)
    # filters ride through; the filtered page tiles the filtered ranking
    target = sorted(set(lang.values()))[0]
    ffull = idx.search_rows([(0, text, n)], filters={"lang": target})
    page2 = idx.search_rows_page(qs, offset=10, filters={"lang": target})
    assert page2 == [(r[0], r[1] - 10, *r[2:]) for r in ffull[10:20]]
    with pytest.raises(ValueError, match="offset"):
        idx.search_rows_page(qs, offset=-1)


@pytest.mark.parametrize("mode", ["or", "and"])
def test_match_stats_equals_bruteforce(spark, facet_setup, mode):
    """match_stats aggregates EXACTLY the docs an unbounded search
    would rank — brute-forced from the engine's own (oracle-certified)
    ranking plus the docs parquet — on both the driver-local pyarrow
    path and the distributed join path, across filters and deletions."""
    from donkey_spark.plans.delete import clear_tombstones, delete_docs
    from donkey_spark.plans.facet_counts import match_stats
    from donkey_spark.plans.query import Index
    _, faceted, lang = facet_setup
    dl = {r["doc_id"]: r["dl"] for r in
          spark.read.parquet(f"{faceted}/docs").collect()}
    text = "def return class"
    langs = sorted(set(lang.values()))[:2]

    def want(idx, filt):
        ids = [r[2] for r in idx.search_rows(
            [(0, text, idx.n_docs)], mode=mode, filters=filt)]
        vals = [dl[d] for d in ids]
        if not vals:
            return {"n_docs": 0, "n_values": 0, "sum": None,
                    "min": None, "max": None, "avg": None}
        return {"n_docs": len(ids), "n_values": len(vals),
                "sum": sum(vals), "min": min(vals), "max": max(vals),
                "avg": sum(vals) / len(vals)}

    # 64MB budget -> driver-local pyarrow; 0 -> distributed ids+join
    for local_bytes in (64 << 20, 0):
        idx = Index(spark, faceted, local_bytes=local_bytes)
        for filt in (None, {"lang": langs[0]}, {"lang": langs},
                     {"lang": {"not": langs}}):
            got = match_stats(idx, text, by="dl", mode=mode,
                              filters=filt)
            assert got == want(idx, filt), (local_bytes, filt)
        # by may BE doc_id (the column-pair dedupe edge)
        got = match_stats(idx, text, by="doc_id", mode=mode)
        assert got["n_docs"] == got["n_values"] \
            and got["max"] >= got["min"], got
        # empty match set
        assert match_stats(idx, "zz_totally_oov", by="dl",
                           mode=mode)["n_docs"] == 0
        # non-numeric / unknown columns raise
        with pytest.raises(ValueError, match="not numeric"):
            match_stats(idx, text, by="repo")
        with pytest.raises(ValueError, match="metadata column"):
            match_stats(idx, text, by="nope")

    # tombstoned docs leave the aggregate (same mask as search)
    idx = Index(spark, faceted)
    base = match_stats(idx, text, by="dl", mode=mode)
    victims = [r[2] for r in idx.search_rows([(0, text, 3)], mode=mode)]
    delete_docs(spark, faceted, victims)
    try:
        got = match_stats(Index(spark, faceted), text, by="dl",
                          mode=mode)
        assert got["n_docs"] == base["n_docs"] - len(victims)
        assert got["sum"] == base["sum"] - sum(dl[d] for d in victims)
    finally:
        clear_tombstones(spark, faceted)


@pytest.mark.parametrize("mode", ["or", "and"])
def test_match_percentiles_equals_bruteforce(spark, facet_setup, mode):
    """match_percentiles returns EXACTLY numpy's linear-interpolated
    quantiles over the docs an unbounded search would rank — on both
    the driver-local numpy path and the distributed percentile-agg
    path (the two interpolate identically to 9 dp), across filters,
    custom fractions, and the empty/invalid edges."""
    import numpy as np

    from donkey_spark.plans.facet_counts import match_percentiles
    from donkey_spark.plans.query import Index
    _, faceted, lang = facet_setup
    dl = {r["doc_id"]: r["dl"] for r in
          spark.read.parquet(f"{faceted}/docs").collect()}
    text = "def return class"
    langs = sorted(set(lang.values()))[:2]
    QS = (0.0, 0.25, 0.5, 0.9, 1.0)

    def want(idx, filt, qs):
        ids = [r[2] for r in idx.search_rows(
            [(0, text, idx.n_docs)], mode=mode, filters=filt)]
        vals = np.array([dl[d] for d in ids], dtype=np.float64)
        if not vals.size:
            return {"n_docs": len(ids), "n_values": 0,
                    "percentiles": {q: None for q in qs}}
        return {"n_docs": len(ids), "n_values": int(vals.size),
                "percentiles": dict(zip(qs, (round(float(p), 9) for p
                                             in np.quantile(vals, qs))))}

    def rnd(got):
        return {**got, "percentiles": {
            q: None if v is None else round(v, 9)
            for q, v in got["percentiles"].items()}}

    for local_bytes in (64 << 20, 0):
        idx = Index(spark, faceted, local_bytes=local_bytes)
        for filt in (None, {"lang": langs[0]}, {"lang": langs},
                     {"lang": {"not": langs}}):
            got = match_percentiles(idx, text, qs=QS, mode=mode,
                                    filters=filt)
            assert rnd(got) == want(idx, filt, QS), (local_bytes, filt)
        # default fractions + by=doc_id column-dedupe edge
        got = match_percentiles(idx, text, by="doc_id", mode=mode)
        assert got["n_docs"] == got["n_values"] and \
            got["percentiles"][0.95] >= got["percentiles"][0.25]
        # empty match set
        e = match_percentiles(idx, "zz_totally_oov", mode=mode)
        assert e["n_docs"] == 0 and \
            all(v is None for v in e["percentiles"].values())
        with pytest.raises(ValueError, match="not numeric"):
            match_percentiles(idx, text, by="repo")
        with pytest.raises(ValueError, match=r"\[0, 1\]"):
            match_percentiles(idx, text, qs=(0.5, 1.5))
        with pytest.raises(ValueError, match=r"\[0, 1\]"):
            match_percentiles(idx, text, qs=())


@pytest.mark.parametrize("mode", ["or", "and"])
def test_match_docs_equals_search_set(spark, facet_setup, mode):
    """match_docs exports EXACTLY the docs an unbounded search ranks —
    same kernel, so same match set — with the requested metadata
    columns, across filters, deletions, and the column edges."""
    from donkey_spark.plans.delete import clear_tombstones, delete_docs
    from donkey_spark.plans.facet_counts import match_docs
    from donkey_spark.plans.query import Index
    _, faceted, lang = facet_setup
    meta = {r["doc_id"]: (r["repo"], r["path"], r["dl"]) for r in
            spark.read.parquet(f"{faceted}/docs").collect()}
    text = "def return class"
    langs = sorted(set(lang.values()))[:2]
    idx = Index(spark, faceted)
    for filt in (None, {"lang": langs[0]}, {"lang": {"not": langs}}):
        want = sorted((d, *meta[d]) for d in
                      (r[2] for r in idx.search_rows(
                          [(0, text, idx.n_docs)], mode=mode,
                          filters=filt)))
        got = sorted(tuple(r) for r in match_docs(
            idx, text, mode=mode, filters=filt,
            columns=("doc_id", "repo", "path", "dl")).collect())
        assert got == want and (filt is not None or len(got) > 0), filt
    # default columns = the whole docs schema; unknown columns refuse
    full = match_docs(idx, text, mode=mode)
    assert full.columns == spark.read.parquet(f"{faceted}/docs").columns
    with pytest.raises(ValueError, match="unknown docs columns"):
        match_docs(idx, text, columns=("nope",))
    # OOV -> empty frame, same schema
    assert match_docs(idx, "zz_totally_oov", mode=mode).count() == 0
    # tombstoned docs leave the export
    victims = [r[2] for r in idx.search_rows([(0, text, 3)], mode=mode)]
    delete_docs(spark, faceted, victims)
    try:
        left = {r["doc_id"] for r in match_docs(
            Index(spark, faceted), text, mode=mode,
            columns=("doc_id",)).collect()}
        assert not (set(victims) & left)
    finally:
        clear_tombstones(spark, faceted)


@pytest.mark.parametrize("mode", ["or", "and"])
def test_match_cardinality_equals_bruteforce(spark, facet_setup, mode):
    """match_cardinality counts EXACTLY the distinct column values of
    the docs an unbounded search would rank — both paths, across
    filters, string and numeric columns, and the empty match set."""
    from donkey_spark.plans.facet_counts import match_cardinality
    from donkey_spark.plans.query import Index
    _, faceted, lang = facet_setup
    meta = {r["doc_id"]: (r["repo"], r["dl"]) for r in
            spark.read.parquet(f"{faceted}/docs").collect()}
    text = "def return class"
    langs = sorted(set(lang.values()))[:2]

    def want(idx, by, filt):
        ids = [r[2] for r in idx.search_rows(
            [(0, text, idx.n_docs)], mode=mode, filters=filt)]
        vals = [meta[d][0] if by == "repo" else meta[d][1] for d in ids]
        return {"n_docs": len(ids), "n_values": len(vals),
                "cardinality": len(set(vals))}

    for local_bytes in (64 << 20, 0):
        idx = Index(spark, faceted, local_bytes=local_bytes)
        for by in ("repo", "dl"):
            for filt in (None, {"lang": langs[0]}, {"lang": langs}):
                got = match_cardinality(idx, text, by=by, mode=mode,
                                        filters=filt)
                assert got == want(idx, by, filt), \
                    (local_bytes, by, filt)
        assert match_cardinality(idx, "zz_totally_oov", mode=mode) \
            == {"n_docs": 0, "n_values": 0, "cardinality": 0}
        with pytest.raises(ValueError, match="metadata column"):
            match_cardinality(idx, text, by="nope")
