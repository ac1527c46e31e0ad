"""Positional postings + phrase queries (r5, format version 3).

Oracle: a transparent Python recomputation — tokenize with the frozen §T
tokenizer, test consecutive containment, rank by the ENGINE-verified
AND-mode BM25 (itself driver-certified hash-exact against DuckDB), so
the phrase layer is checked in isolation on top of a trusted ranker.
"""

import pytest

from fixtures.gen_corpus import gen_corpus


@pytest.fixture(scope="module")
def pos_index(spark, tmp_path_factory):
    from donkey_spark.plans.build import build_index
    out = str(tmp_path_factory.mktemp("posidx") / "idx")
    pdf = gen_corpus(200, seed=41)
    build_index(spark, spark.createDataFrame(pdf), out, range_size=64,
                positions=True)
    return out, pdf


def _phrase_oracle(idx, pdf, text, k):
    """Expected rows: AND-mode candidates (trusted ranker) filtered by
    python-verified consecutive containment, re-ranked 1..k."""
    from donkey_spark.functions.tokenize import tokenize_py
    seq = tokenize_py(text)
    content = {(r.repo, r.path): r.content
               for r in pdf.itertuples(index=False)}

    def contains(doc_text):
        toks = tokenize_py(doc_text)
        n = len(seq)
        return any(toks[i:i + n] == seq
                   for i in range(len(toks) - n + 1))

    cand = idx.search_rows([(0, " ".join(seq), 10 ** 6)], mode="and")
    hits = [r for r in cand if contains(content[(r[4], r[5])])]
    return [(0, rank, r[2], round(r[3], 9), r[4], r[5])
            for rank, r in enumerate(hits[:k], start=1)]


def test_phrase_matches_python_oracle(spark, pos_index):
    from donkey_spark.plans.query import Index
    out, pdf = pos_index
    idx = Index(spark, out)
    assert idx.version == 3
    for text in ("def return", "return def", "for in range",
                 "class def"):
        got = [(q, r, d, round(s, 9), rp, p) for q, r, d, s, rp, p in
               idx.search_phrase(text, k=10)]
        want = _phrase_oracle(idx, pdf, text, 10)
        assert got == want, text
    # at least one of those phrases must really match somewhere, and at
    # least one must have FEWER phrase hits than AND hits (the
    # verification layer actually rejects candidates)
    n_and = len(idx.search_rows([(0, "def return", 10 ** 6)], mode="and"))
    n_ph = len(idx.search_phrase("def return", k=10 ** 6))
    assert n_ph > 0 and n_ph < n_and


def test_phrase_widening_loop_and_duplicate_terms(spark, pos_index):
    """start_candidates=2 forces the geometric widening path; a
    duplicate-term phrase ('in in'?) exercises same-term adjacency."""
    from donkey_spark.plans.query import Index
    out, pdf = pos_index
    idx = Index(spark, out)
    wide = idx.search_phrase("def return", k=10)
    narrow = idx.search_phrase("def return", k=10, start_candidates=2)
    assert narrow == wide
    # duplicate-term phrase: verified against the python oracle
    got = [(q, r, d, round(s, 9), rp, p) for q, r, d, s, rp, p in
           idx.search_phrase("in in", k=5)]
    assert got == _phrase_oracle(idx, pdf, "in in", 5)


def test_phrase_edges(spark, pos_index):
    from donkey_spark.plans.query import Index
    out, _ = pos_index
    idx = Index(spark, out)
    assert idx.search_phrase("zz_nope_a zz_nope_b", k=5) == []
    assert idx.search_phrase("", k=5) == []
    # single-token phrase degenerates to plain top-k
    assert idx.search_phrase("def", k=5) == \
        idx.search_rows([(0, "def", 5)])
    # distributed verification path agrees with the driver-local one
    d = Index(spark, out, local_bytes=0)
    assert d.search_phrase("def return", k=10) == \
        idx.search_phrase("def return", k=10)


def _slop_oracle_contains(toks, seq, slop):
    """Independent proximity oracle: per-token forward scan inside each
    bounded window (no searchsorted — a different algorithm from the
    engine's greedy chain)."""
    n = len(seq)
    w = n - 1 + slop
    for i, t in enumerate(toks):
        if t != seq[0]:
            continue
        j, need = i, 1
        while need < n and j < min(i + w, len(toks) - 1):
            j += 1
            if toks[j] == seq[need]:
                need += 1
        if need == n:
            return True
    return False


def test_phrase_slop_proximity(spark, pos_index):
    """slop>0 = ordered within-window proximity: results match an
    independent per-token oracle, are a superset of slop=0, and grow
    monotonically with slop."""
    from donkey_spark.functions.tokenize import tokenize_py
    from donkey_spark.plans.query import Index
    out, pdf = pos_index
    idx = Index(spark, out)
    content = {(r.repo, r.path): r.content
               for r in pdf.itertuples(index=False)}
    text = "def for"
    seq = tokenize_py(text)
    ids = {}
    for slop in (0, 2, 5):
        rows = idx.search_phrase(text, k=10 ** 6, slop=slop)
        ids[slop] = {r[2] for r in rows}
        # every hit verified by the independent oracle; every AND
        # candidate the oracle accepts is in the result
        cand = idx.search_rows([(0, text, 10 ** 6)], mode="and")
        want = {r[2] for r in cand
                if _slop_oracle_contains(
                    tokenize_py(content[(r[4], r[5])]), seq, slop)}
        assert ids[slop] == want, slop
    assert ids[0] <= ids[2] <= ids[5]
    assert ids[0] != ids[5]          # slop actually relaxes something


def test_phrase_in_mixed_batch(spark, pos_index):
    """search_rows_mixed accepts mode='phrase' specs alongside or/and."""
    from donkey_spark.plans.query import Index
    out, _ = pos_index
    idx = Index(spark, out)
    specs = [(0, "def return", 5, None, None),
             (1, "def return", 5, "phrase", None),
             (2, "def return", 5, "and", None)]
    got = idx.search_rows_mixed(specs)
    exp = sorted(
        idx.search_rows([(0, "def return", 5)])
        + idx.search_phrase("def return", k=5, query_id=1)
        + idx.search_rows([(2, "def return", 5)], mode="and"))
    assert got == exp
    with pytest.raises(ValueError, match="filters"):
        idx.search_rows_mixed(
            [(0, "def return", 5, "phrase", {"lang": "en"})])


def test_phrase_requires_positional_index(spark, tmp_path):
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    out = str(tmp_path / "plain")
    build_index(spark, spark.createDataFrame(gen_corpus(40, seed=5)), out,
                range_size=64)
    idx = Index(spark, out)
    assert idx.version == 2          # plain indexes keep the old version
    with pytest.raises(ValueError, match="positions=True"):
        idx.search_phrase("def return", k=5)


def test_streaming_extends_positional_index(spark, tmp_path):
    """r5: epochs write their own positions chunk (chunk=stream<e>) —
    phrase queries must see streamed docs, exactly as a batch build of
    the union corpus would (compared by (repo, path) since doc ids
    differ between the two histories)."""
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    from donkey_spark.sources.corpus import CORPUS_SCHEMA
    from donkey_spark.streaming.ingest import _append_epoch
    out, ref = str(tmp_path / "posidx"), str(tmp_path / "refidx")
    pdf = gen_corpus(120, seed=6)
    build_index(spark, spark.createDataFrame(pdf.iloc[:90]), out,
                range_size=64, positions=True)
    _append_epoch(spark.createDataFrame(pdf.iloc[90:], CORPUS_SCHEMA),
                  0, out, "varint", 128, memo={})
    idx = Index(spark, out)
    assert idx.version == 3                 # epoch meta keeps v3
    build_index(spark, spark.createDataFrame(pdf), ref, range_size=64,
                positions=True)
    got = idx.search_phrase("def return", k=50)
    exp = Index(spark, ref).search_phrase("def return", k=50)
    assert {(r[4], r[5]) for r in got} == {(r[4], r[5]) for r in exp}
    assert len(got) > 0
    # at least one hit must come from the STREAMED slice
    streamed = set(zip(pdf.iloc[90:]["repo"], pdf.iloc[90:]["path"]))
    all_hits = idx.search_phrase("def", k=200)
    assert {(r[4], r[5]) for r in all_hits} & streamed


def test_streaming_refuses_flat_positions_layout(spark, tmp_path):
    """The early-r5 flat bucket=* positions layout cannot take chunk
    dirs beside it — ingest fails fast and points at compaction."""
    import os
    import shutil
    from donkey_spark.plans.build import build_index
    from donkey_spark.sources.corpus import CORPUS_SCHEMA
    from donkey_spark.streaming.ingest import _append_epoch
    out = str(tmp_path / "flat")
    pdf = gen_corpus(40, seed=8)
    build_index(spark, spark.createDataFrame(pdf.iloc[:30]), out,
                range_size=64, positions=True)
    # forge the legacy layout: hoist bucket=* out of chunk=batch
    pos = f"{out}/positions"
    for b in os.listdir(f"{pos}/chunk=batch"):
        shutil.move(f"{pos}/chunk=batch/{b}", f"{pos}/{b}")
    shutil.rmtree(f"{pos}/chunk=batch")
    with pytest.raises(ValueError, match="flat bucket"):
        _append_epoch(spark.createDataFrame(pdf.iloc[30:], CORPUS_SCHEMA),
                      0, out, "varint", 128, memo={})


def test_compact_preserves_positions(spark, pos_index, tmp_path):
    """A compaction of a positional index keeps phrase support (like it
    keeps facets): version stays 3 and phrase results track the
    rebuilt corpus."""
    from donkey_spark.plans.query import Index
    from donkey_spark.streaming import compact_index
    out, pdf = pos_index
    dst = str(tmp_path / "compacted")
    import shutil
    shutil.copytree(out, dst)
    corpus = spark.createDataFrame(pdf)
    compact_index(spark, corpus, dst, range_size=64)
    idx = Index(spark, dst)
    assert idx.version == 3
    got = [(q, r, d, round(s, 9), rp, p) for q, r, d, s, rp, p in
           idx.search_phrase("def return", k=10)]
    assert got == _phrase_oracle(idx, pdf, "def return", 10)


def test_phrase_composes_with_tombstones(spark, pos_index, tmp_path):
    """A tombstoned doc vanishes from phrase results immediately (the
    AND candidate stage already applies the dead mask; verification
    must not resurrect it), survivors keep rank order."""
    import shutil
    from donkey_spark.plans.delete import delete_docs
    from donkey_spark.plans.query import Index
    out, _ = pos_index
    base = Index(spark, out).search_phrase("def return", k=10)
    assert len(base) == 10
    victim = base[0][2]
    delete_docs(spark, out, [victim])
    try:
        got = Index(spark, out).search_phrase("def return", k=9)
        assert victim not in [r[2] for r in got]
        assert [r[2] for r in got] == [r[2] for r in base[1:10]]
    finally:
        for d in ("tombstones", "tombstones_staging"):
            shutil.rmtree(f"{out}/{d}", ignore_errors=True)


def test_positional_build_chunked_and_resumed(spark, tmp_path):
    """positions interact correctly with chunked + resumed builds: the
    side table covers the whole corpus (it is written at finalize, not
    per chunk) and a resumed run leaves phrase results identical."""
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    pdf = gen_corpus(150, seed=47)
    corpus = spark.createDataFrame(pdf)
    out = str(tmp_path / "chunked")
    info1 = build_index(spark, corpus, out, range_size=64, n_chunks=3,
                        positions=True)
    assert info1["n_chunks"] >= 2
    base = Index(spark, out).search_phrase("def return", k=10)
    assert base
    info2 = build_index(spark, corpus, out, range_size=64, n_chunks=3,
                        positions=True, resume=True)
    assert info2["chunks_built"] == 0
    assert Index(spark, out).search_phrase("def return", k=10) == base
