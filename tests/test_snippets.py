"""Result snippets (plans/snippets.py): top-k hits annotated with the
±window tokens around the first occurrence of each hit's rarest matched
query term, content fetched from the source corpus (the index stores
none).

Oracle: re-derive matched term / pos / snippet in plain python from the
corpus and the engine's own ranking + dictionary dfs — every rule the
SQL twin replays, checked here without DuckDB.
"""

import pytest

from fixtures.gen_corpus import gen_corpus


@pytest.fixture(scope="module")
def snip_setup(spark, tmp_path_factory):
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    pdf = gen_corpus(300, seed=7)
    corpus = spark.createDataFrame(pdf)
    out = str(tmp_path_factory.mktemp("snipidx"))
    build_index(spark, corpus, out, range_size=64)
    content = {(r["repo"], r["path"]): r["content"]
               for _, r in pdf.iterrows()}
    return Index(spark, out), corpus, content


def _expected(idx, content, queries, window, mode="or"):
    from donkey_spark.functions.tokenize import tokenize_py
    rows = idx.search_rows(queries, mode=mode)
    terms = sorted({t for _, text, _ in queries for t in tokenize_py(text)})
    dfs = idx._lookup_terms(terms)
    order = {qid: [t for t in sorted(set(tokenize_py(text)),
                                     key=lambda t: (dfs.get(t) or 0, t))
                   if dfs.get(t)]
             for qid, text, _ in queries}
    exp = {}
    for qid, rank, doc_id, score, repo, path in rows:
        toks = tokenize_py(content[(repo, path)])
        hit = next((t for t in order[qid] if t in toks), None)
        assert hit is not None            # an OR/AND hit contains a term
        i = toks.index(hit)
        exp[(qid, doc_id)] = (hit, i + 1,
                              " ".join(toks[max(0, i - window):
                                            i + window + 1]))
    return rows, exp


@pytest.mark.parametrize("mode", ["or", "and"])
def test_snippets_match_python_oracle(spark, snip_setup, mode):
    from donkey_spark.plans.snippets import search_snippets
    idx, corpus, content = snip_setup
    queries = [(0, "def return", 10), (1, "class import spark", 5)]
    rows, exp = _expected(idx, content, queries, window=3, mode=mode)
    assert len(rows) >= 10                # fixture sanity
    got = search_snippets(idx, corpus, queries, window=3,
                          mode=mode).collect()
    assert len(got) == len(rows)
    for r in got:
        assert (r["matched_term"], r["pos"], r["snippet"]) == \
            exp[(r["query_id"], r["doc_id"])], dict(r.asDict())
    # hit rows themselves are untouched (rank/score pass through)
    assert sorted((r["query_id"], r["rank"], r["doc_id"],
                   round(r["score"], 9)) for r in got) == \
        sorted((q, rk, d, round(s, 9)) for q, rk, d, s, _, _ in rows)


def test_snippet_window_clips_at_document_edges(spark, snip_setup):
    """A match in the first/last tokens yields a shorter snippet, never
    an error or wrap-around."""
    from donkey_spark.functions.tokenize import tokenize_py
    from donkey_spark.plans.snippets import search_snippets
    idx, corpus, content = snip_setup
    # find a doc with tokens and query its FIRST token
    first = next(toks[0] for toks in
                 (tokenize_py(t) for t in content.values()) if toks)
    got = search_snippets(idx, corpus, [(0, first, 300)],
                          window=5).collect()
    starts = [r for r in got if r["pos"] == 1]
    assert starts, "some doc should start with its own first token"
    for r in starts:
        assert len(r["snippet"].split()) <= 6      # 1 + window, clipped


def test_missing_source_file_keeps_hit_with_null_snippet(
        spark, snip_setup):
    """The index outliving a source file surfaces as a NULL snippet row,
    not a silently dropped hit."""
    from pyspark.sql import functions as F
    from donkey_spark.plans.snippets import search_snippets
    idx, corpus, content = snip_setup
    queries = [(0, "def return", 5)]
    full = search_snippets(idx, corpus, queries).collect()
    assert full
    victim_path = full[0]["path"]
    pruned = corpus.where(F.col("path") != victim_path)
    got = {r["doc_id"]: r for r in
           search_snippets(idx, pruned, queries).collect()}
    assert set(got) == {r["doc_id"] for r in full}   # no hit dropped
    vic = got[full[0]["doc_id"]]
    assert vic["snippet"] is None and vic["matched_term"] is None
    assert vic["score"] == full[0]["score"]


def test_snippets_compose_with_filters(spark, tmp_path):
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.snippets import search_snippets
    pdf = gen_corpus(200, seed=11)
    corpus = spark.createDataFrame(pdf)
    out = str(tmp_path / "fidx")
    build_index(spark, corpus, out, range_size=64, facets=("lang",))
    idx = Index(spark, out)
    lang = {r["doc_id"]: r["lang"] for r in
            spark.read.parquet(f"{out}/docs").collect()}
    target = lang[0]
    got = search_snippets(idx, corpus, [(0, "def return", 8)],
                          filters={"lang": target}).collect()
    assert got
    assert all(lang[r["doc_id"]] == target for r in got)
    assert all(r["snippet"] for r in got)


def test_empty_and_oov_queries(spark, snip_setup):
    from donkey_spark.plans.snippets import search_snippets
    idx, corpus, _ = snip_setup
    assert search_snippets(idx, corpus,
                           [(0, "zzqnotaterm", 5)]).collect() == []
    assert search_snippets(idx, corpus, [(0, "", 5)]).collect() == []


def test_snippets_join_versions_not_just_paths(spark, tmp_path):
    """r5 review: after an upsert the source corpus legitimately holds
    several (repo, path) versions — the content join must go through the
    full (repo, path, commit) triple or hits duplicate and render stale
    snippets."""
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.snippets import search_snippets
    from donkey_spark.plans.upsert import upsert_docs
    pdf = gen_corpus(80, seed=41)
    out = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(pdf), out, range_size=64)
    newv = pdf.iloc[::8].copy()
    newv["commit"] = "v" + newv["commit"].str.slice(1)
    newv["content"] = "snippet_upsert_marker " + newv["content"]
    upsert_docs(spark, out, spark.createDataFrame(newv))

    import pandas as pd
    corpus_both = spark.createDataFrame(
        pd.concat([pdf, newv], ignore_index=True))
    idx = Index(spark, out)
    qs = [(0, "snippet_upsert_marker", 50)]
    res = search_snippets(idx, corpus_both, qs, window=2).collect()
    # one row per hit (no version fan-out), snippet from the NEW content
    assert len(res) == len(newv)
    assert len({(r["query_id"], r["rank"]) for r in res}) == len(res)
    for r in res:
        assert r["matched_term"] == "snippet_upsert_marker"
        assert r["pos"] == 1                 # the marker is prepended
        assert r["snippet"].startswith("snippet_upsert_marker")
