"""Streaming ingest tests (SURVEY §2.10 mapping)."""

import shutil

import pytest

from fixtures.gen_corpus import gen_corpus


@pytest.fixture(scope="module")
def stream_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    src = base / "src"
    src.mkdir()
    return base, src


def test_stream_ingest_and_query(spark, stream_dirs):
    from donkey_spark.streaming import stream_ingest
    from donkey_spark.plans.query import Index
    base, src = stream_dirs
    pdf = gen_corpus(120, seed=7)
    # two "insert" waves land as separate files
    pdf.iloc[:60].to_parquet(src / "wave1.parquet", index=False)
    pdf.iloc[60:].to_parquet(src / "wave2.parquet", index=False)

    q = stream_ingest(spark, str(src), str(base / "idx"),
                      str(base / "ckpt"), trigger_once=True)
    q.awaitTermination(300)

    idx = Index(spark, str(base / "idx"))
    assert idx.n_docs == 120
    res = idx.search("def return", k=5).collect()
    assert len(res) == 5
    assert all(r["score"] > 0 for r in res)


def test_stream_restart_is_idempotent(spark, stream_dirs):
    """Re-running with the same checkpoint must not re-apply epochs."""
    from donkey_spark.streaming import stream_ingest
    from donkey_spark.plans.query import Index
    base, src = stream_dirs
    q = stream_ingest(spark, str(src), str(base / "idx"),
                      str(base / "ckpt"), trigger_once=True)
    q.awaitTermination(300)
    idx = Index(spark, str(base / "idx"))
    assert idx.n_docs == 120          # unchanged — no duplicate ingestion


def test_compact_restores_canonical_index(spark, stream_dirs, tmp_path):
    from donkey_spark.streaming import compact_index
    from donkey_spark.plans.query import Index
    base, src = stream_dirs
    corpus = spark.read.parquet(str(src))
    out = str(tmp_path / "compacted")
    info = compact_index(spark, corpus, out)
    assert info["n_docs"] == 120
    idx = Index(spark, out)
    res = idx.search("def return", k=5).collect()
    assert len(res) == 5


def test_epoch_replay_is_idempotent(spark, tmp_path):
    """A foreachBatch retry re-delivers the same (batch, epoch_id); the
    index state — doc ids, docs rows, meta counts — must not shift."""
    from donkey_spark.streaming.ingest import _append_epoch
    from donkey_spark.sources.corpus import CORPUS_SCHEMA
    idx = str(tmp_path / "idx")
    pdf = gen_corpus(40, seed=11)
    b0 = spark.createDataFrame(pdf.iloc[:25], CORPUS_SCHEMA)
    b1 = spark.createDataFrame(pdf.iloc[25:], CORPUS_SCHEMA)

    _append_epoch(b0, 0, idx, "varint", 128)
    snap = sorted((r["doc_id"], r["path"]) for r in
                  spark.read.parquet(f"{idx}/docs").collect())
    n1 = spark.read.parquet(f"{idx}/meta").collect()[0]["n_docs"]
    _append_epoch(b0, 0, idx, "varint", 128)          # replayed epoch
    snap2 = sorted((r["doc_id"], r["path"]) for r in
                   spark.read.parquet(f"{idx}/docs").collect())
    assert snap2 == snap
    assert spark.read.parquet(f"{idx}/meta").collect()[0]["n_docs"] == n1

    _append_epoch(b1, 1, idx, "varint", 128)
    _append_epoch(b1, 1, idx, "varint", 128)          # replayed epoch
    docs = spark.read.parquet(f"{idx}/docs").collect()
    assert len(docs) == 40
    assert sorted(r["doc_id"] for r in docs) == list(range(40))


def test_compact_in_place_clears_stream_chunks(spark, tmp_path):
    """compact_index() rebuilding IN PLACE over a streamed index must not
    leave stale chunk=stream* segment/docs dirs in the finalize union."""
    from donkey_spark.streaming.ingest import _append_epoch
    from donkey_spark.streaming import compact_index
    from donkey_spark.plans.query import Index
    from donkey_spark.sources.corpus import CORPUS_SCHEMA
    idx = str(tmp_path / "idx")
    pdf = gen_corpus(30, seed=13)
    _append_epoch(spark.createDataFrame(pdf, CORPUS_SCHEMA), 0, idx,
                  "varint", 128)
    corpus = spark.createDataFrame(pdf, CORPUS_SCHEMA)
    info = compact_index(spark, corpus, idx)
    assert info["n_docs"] == 30
    chunks = {str(r["chunk"]) for r in
              spark.read.option("basePath", f"{idx}/segments")
              .parquet(f"{idx}/segments").select("chunk").distinct()
              .collect()}
    assert not any(c.startswith("stream") for c in chunks)
    assert len(Index(spark, idx).search("def return", k=3).collect()) == 3


def test_streamed_index_and_mode_across_epochs(spark, tmp_path):
    """AND-mode queries over a STREAMED index: one (term, salt) group spans
    two chunk=stream* dirs with duplicate block_ids and a non-rsize-aligned
    epoch boundary — the scorer must doc-order the spans before its skip
    test (ADVICE r2, high). Invariant: a doc containing every query term
    scores identically in OR and AND mode, so the AND result must equal
    the OR result filtered to all-terms docs."""
    from donkey_spark.functions.tokenize import tokenize_py
    from donkey_spark.plans.query import Index
    from donkey_spark.streaming import stream_ingest
    pdf = gen_corpus(120, seed=11)
    src = tmp_path / "src"
    src.mkdir()
    for i in range(10):                     # 10 files @ maxFilesPerTrigger=8
        pdf.iloc[i * 12:(i + 1) * 12].to_parquet(
            src / f"f{i}.parquet", index=False)
    q = stream_ingest(spark, str(src), str(tmp_path / "idx"),
                      str(tmp_path / "ckpt"), trigger_once=True)
    q.awaitTermination(300)
    n_epochs = spark.read.parquet(
        str(tmp_path / "idx" / "manifest_stream")).count()
    assert n_epochs >= 2                    # the interleaved-chunk regime

    content = {(r.repo, r.path): r.content for r in
               spark.createDataFrame(pdf).collect()}
    qtext = "def return"
    qterms = set(tokenize_py(qtext))
    for local_bytes in (64 << 20, 0):       # driver-local AND distributed
        idx = Index(spark, str(tmp_path / "idx"), local_bytes=local_bytes)
        res_or = idx.search_rows([(0, qtext, 120)])
        res_and = idx.search_rows([(0, qtext, 120)], mode="and")
        exp = sorted(
            ((r[2], round(r[3], 9)) for r in res_or
             if qterms <= set(tokenize_py(content[(r[4], r[5])]))),
            key=lambda x: (-x[1], x[0]))
        got = [(r[2], round(r[3], 9)) for r in res_and]
        assert len(exp) > 5                 # fixture sanity: real AND hits
        assert got == exp


def test_epoch_cost_is_o_epoch_not_o_index(spark, tmp_path):
    """VERDICT r2 #6: a later epoch must not rescan the accumulated index.
    Structural check: record every parquet path _append_epoch READS during
    epoch 5 (memo warm) — none may be the full docs/segments/dictionary
    trees; only the tiny manifests and this epoch's own chunk dir."""
    from donkey_spark.streaming import ingest as ing
    from donkey_spark.sources.corpus import CORPUS_SCHEMA
    idx = str(tmp_path / "idx")
    pdf = gen_corpus(120, seed=17)
    memo: dict = {}
    for e in range(5):
        ing._append_epoch(
            spark.createDataFrame(pdf.iloc[e * 20:(e + 1) * 20],
                                  CORPUS_SCHEMA),
            e, idx, "varint", 128, memo=memo)

    read_paths = []
    orig = type(spark.read).parquet

    def spy(self, *paths):
        read_paths.extend(paths)
        return orig(self, *paths)

    type(spark.read).parquet = spy
    try:
        ing._append_epoch(
            spark.createDataFrame(pdf.iloc[100:120], CORPUS_SCHEMA),
            5, idx, "varint", 128, memo=memo)
    finally:
        type(spark.read).parquet = orig
    banned = {f"{idx}/docs", f"{idx}/segments", f"{idx}/dictionary"}
    assert not banned & set(read_paths), read_paths
    # state must still be exact
    meta = spark.read.parquet(f"{idx}/meta").collect()[0]
    assert meta["n_docs"] == 120
    seg_all = spark.read.option("basePath", f"{idx}/segments").parquet(
        f"{idx}/segments")
    from pyspark.sql import functions as F
    assert meta["n_postings"] == int(
        seg_all.agg(F.sum("n_docs")).collect()[0][0])
    # dictionary partials sum to the true df relation
    d = (spark.read.parquet(f"{idx}/dictionary")
         .groupBy("term").agg(F.sum("df").alias("df")))
    from donkey_spark.operators.postings import dictionary_from_segments
    exp = dictionary_from_segments(seg_all).select("term", "df")
    got = {r["term"]: r["df"] for r in d.collect()}
    want = {r["term"]: r["df"] for r in exp.collect()}
    assert got == want


def test_dictionary_partial_merge_caps_probe_cost(spark, tmp_path,
                                                  monkeypatch):
    """r4: a long-running stream accumulates one dictionary partial per
    epoch; the auto-triggered dictionary-only merge must cap the number
    of live partials (probe cost O(buckets), not O(epochs)) while every
    term's summed df stays exact and queries are unchanged on both
    execution paths."""
    import donkey_spark.config as cfg
    monkeypatch.setattr(cfg, "DICT_MERGE_MIN_PARTIALS", 3)
    from donkey_spark.operators.postings import dictionary_from_segments
    from donkey_spark.plans.query import Index
    from donkey_spark.sources.corpus import CORPUS_SCHEMA
    from donkey_spark.streaming import ingest as ing
    from pyspark.sql import functions as F
    idx = str(tmp_path / "idx")
    pdf = gen_corpus(200, seed=23)
    memo: dict = {}
    for e in range(10):
        ing._append_epoch(
            spark.createDataFrame(pdf.iloc[e * 20:(e + 1) * 20],
                                  CORPUS_SCHEMA),
            e, idx, "varint", 128, memo=memo)

    chunks = ing.dictionary_chunks(spark, idx)
    active = ing.active_dictionary_chunks(chunks)
    n_stream = sum(1 for c in active if c.startswith("stream"))
    assert any(c.startswith("m") for c in active), chunks
    assert n_stream <= 3 + 1, chunks          # capped, not O(epochs)
    # superseded source dirs survive the merge that superseded them (a
    # one-merge grace period so live readers' memoized handles stay
    # valid); the NEXT maintenance call reclaims them (min_partials=99
    # makes it GC-only — no new fold, or ITS sources would linger)
    ing.merge_dictionary_partials(spark, idx, min_partials=99)
    chunks = ing.dictionary_chunks(spark, idx)
    assert sorted(chunks) == sorted(ing.active_dictionary_chunks(chunks))

    # summed df over ACTIVE partials == truth recomputed from segments
    seg_all = spark.read.option("basePath", f"{idx}/segments").parquet(
        f"{idx}/segments")
    want = {r["term"]: r["df"] for r in
            dictionary_from_segments(seg_all).select("term", "df")
            .collect()}
    got = {r["term"]: r["df"] for r in
           (spark.read.parquet(f"{idx}/dictionary")
            .where(F.col("chunk").isin(active))
            .groupBy("term").agg(F.sum("df").alias("df"))).collect()}
    assert got == want

    # probes agree across paths and return live results
    res = {}
    for local_bytes in (64 << 20, 0):
        i = Index(spark, idx, local_bytes=local_bytes)
        res[local_bytes] = [(r[2], round(r[3], 9)) for r in
                            i.search_rows([(0, "def return", 10)])]
    assert res[64 << 20] == res[0] and len(res[0]) == 10


def test_dictionary_merge_grace_leftover_is_ignored_and_gcd(spark,
                                                            tmp_path):
    """A merge leaves its superseded source partials on disk (one-merge
    grace period for live readers' memoized handles — also exactly the
    state a crash between rename-commit and GC leaves). Readers must
    IGNORE them (no df double-count), a reader created BEFORE the merge
    must keep probing correctly through it, and the next maintenance
    call must reclaim them."""
    from donkey_spark.plans.query import Index
    from donkey_spark.sources.corpus import CORPUS_SCHEMA
    from donkey_spark.streaming import ingest as ing
    idx = str(tmp_path / "idx")
    pdf = gen_corpus(80, seed=29)
    memo: dict = {}
    for e in range(4):
        ing._append_epoch(
            spark.createDataFrame(pdf.iloc[e * 20:(e + 1) * 20],
                                  CORPUS_SCHEMA),
            e, idx, "varint", 128, memo=memo)
    pre_idx = Index(spark, idx)        # created BEFORE the merge
    base = [(r[2], round(r[3], 9)) for r in
            pre_idx.search_rows([(0, "def return", 10)])]
    base_df = pre_idx._lookup_terms(["def", "return"])

    folded = ing.merge_dictionary_partials(spark, idx)
    assert folded == 4
    # superseded sources linger (grace period)...
    chunks = ing.dictionary_chunks(spark, idx)
    assert any(c.startswith("stream") for c in chunks), chunks
    # ...the pre-merge reader's handles still resolve — an UNCACHED term
    # probe (not in its memo) plus a fresh search must not FileNotFound
    pre_idx._lookup_terms(["the"])
    assert [(r[2], round(r[3], 9)) for r in
            pre_idx.search_rows([(1, "def return", 10)])] == base
    # ...and fresh readers on both paths ignore them (no double-count)
    for local_bytes in (64 << 20, 0):
        i = Index(spark, idx, local_bytes=local_bytes)
        assert i._lookup_terms(["def", "return"]) == base_df, local_bytes
        got = [(r[2], round(r[3], 9)) for r in
               i.search_rows([(0, "def return", 10)])]
        assert got == base, local_bytes
    # next maintenance call GCs the leftovers
    ing.merge_dictionary_partials(spark, idx, min_partials=99)
    assert not any(c.startswith("stream")
                   for c in ing.dictionary_chunks(spark, idx))


def test_dictionary_merge_derives_before_epoch_from_journal(spark,
                                                            tmp_path):
    """r5 (ADVICE): merge_dictionary_partials called WITHOUT before_epoch
    while an epoch is mid-write (dictionary partial on disk, manifest row
    not yet journaled) must not fold that epoch — folding a partial
    rewrite would freeze understated df into the m-chunk."""
    from donkey_spark.sources.corpus import CORPUS_SCHEMA
    from donkey_spark.streaming import ingest as ing
    idx = str(tmp_path / "idx")
    pdf = gen_corpus(60, seed=31)
    memo: dict = {}
    for e in range(3):
        ing._append_epoch(
            spark.createDataFrame(pdf.iloc[e * 20:(e + 1) * 20],
                                  CORPUS_SCHEMA),
            e, idx, "varint", 128, memo=memo)
    # simulate epoch 3 mid-write: its dictionary partial exists but its
    # manifest_stream row does not (that is the write order in
    # _append_epoch: dictionary before manifest)
    import shutil as sh
    sh.copytree(f"{idx}/dictionary/chunk=stream2",
                f"{idx}/dictionary/chunk=stream3")
    folded = ing.merge_dictionary_partials(spark, idx)
    assert folded == 3                  # epochs 0..2 only
    chunks = ing.dictionary_chunks(spark, idx)
    active = ing.active_dictionary_chunks(chunks)
    assert "stream3" in active, chunks  # mid-write epoch left alone


def test_catchup_epoch_uses_two_phase_assignment(spark, tmp_path,
                                                 monkeypatch):
    """r5: a bootstrap/catch-up epoch over a backlog must not sort the
    whole batch on one partition. Above STREAM_ID_GATE_ROWS the epoch
    switches to the batch build's two-phase range assignment — evidenced
    by a multi-file docs chunk — and the resulting index must be
    IDENTICAL to the window path's (ids, postings, search results)."""
    import glob

    import donkey_spark.config as cfg
    from donkey_spark.plans.query import Index
    from donkey_spark.sources.corpus import CORPUS_SCHEMA
    from donkey_spark.streaming import ingest as ing
    pdf = gen_corpus(400, seed=37)

    def build(idx, gate):
        monkeypatch.setattr(cfg, "STREAM_ID_GATE_ROWS", gate)
        ing._append_epoch(spark.createDataFrame(pdf, CORPUS_SCHEMA),
                          0, idx, "varint", 128, memo={})

    gated = str(tmp_path / "gated")
    windowed = str(tmp_path / "windowed")
    build(gated, 10)            # force the two-phase path
    build(windowed, 10 ** 9)    # force the single-partition window path

    # multi-partition execution evidence: the gated chunk fans out
    assert len(glob.glob(f"{gated}/docs/chunk=stream0/part-*.parquet")) > 1
    assert len(glob.glob(
        f"{windowed}/docs/chunk=stream0/part-*.parquet")) == 1

    cols = ["doc_id", "repo", "path", "commit", "lang", "dl", "sha256"]
    da = sorted(tuple(r) for r in
                spark.read.parquet(f"{gated}/docs").select(cols).collect())
    db = sorted(tuple(r) for r in
                spark.read.parquet(f"{windowed}/docs").select(cols)
                .collect())
    assert da == db
    ma = spark.read.parquet(f"{gated}/meta").collect()[0]
    mb = spark.read.parquet(f"{windowed}/meta").collect()[0]
    assert (ma["n_docs"], ma["avgdl"], ma["n_postings"]) == \
        (mb["n_docs"], mb["avgdl"], mb["n_postings"])
    ra = Index(spark, gated).search_rows([(0, "def return", 10)])
    rb = Index(spark, windowed).search_rows([(0, "def return", 10)])
    assert ra == rb and len(ra) == 10


def test_zero_posting_epoch_commits_and_stream_continues(spark, tmp_path):
    """An epoch whose docs yield ZERO postings (every token under the
    minimum length) used to write a segments dir holding only _SUCCESS
    and crash on the read-back before its journal row — wedging the
    stream in a permanent retry loop (r5 third review). It must commit:
    journal row with n_postings=0, docs chunk present, no empty
    segments/dictionary dirs, and the next epoch proceeds normally."""
    import os

    import pandas as pd

    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    from donkey_spark.streaming.ingest import _append_epoch, journal_df
    pdf = gen_corpus(40, seed=11)
    out = str(tmp_path / "zidx")
    build_index(spark, spark.createDataFrame(pdf), out, range_size=64)
    n0 = Index(spark, out).n_docs
    bad = pd.DataFrame([{"repo": "rz", "path": f"z/{i}",
                         "commit": "e" * 40, "lang": "py",
                         "content": "a b c 1 2"} for i in range(3)])
    memo: dict = {}
    _append_epoch(spark.createDataFrame(bad), 5, out, "varint", 128,
                  memo=memo)
    j = {int(r["epoch"]): r for r in journal_df(spark, out).collect()}
    assert j[5]["n_docs"] == 3 and j[5]["n_postings"] == 0
    assert os.path.isdir(f"{out}/docs/chunk=stream5")
    assert not os.path.exists(f"{out}/segments/chunk=stream5")
    assert not os.path.exists(f"{out}/dictionary/chunk=stream5")
    idx = Index(spark, out)
    assert idx.n_docs == n0 + 3
    assert idx.search_rows([(0, "def return", 3)])
    good = gen_corpus(10, seed=12)
    good["repo"] = "rz2"
    _append_epoch(spark.createDataFrame(good), 6, out, "varint", 128,
                  memo=memo)
    assert Index(spark, out).n_docs == n0 + 13


def test_mid_stream_add_facet_survives_next_epoch(spark, tmp_path):
    """A facet backfilled BETWEEN micro-batches (add_facet commits meta
    with the new column) must not be erased by the next epoch's meta
    rewrite from the memoized base — and, because the epoch re-reads
    meta facets, docs of later epochs index the column inline when the
    batch carries it (r5 third review)."""
    from donkey_spark.plans.add_facet import add_facet
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    from donkey_spark.streaming.ingest import _append_epoch
    pdf = gen_corpus(60, seed=13)
    out = str(tmp_path / "midx")
    build_index(spark, spark.createDataFrame(pdf.iloc[:40]), out,
                range_size=64)
    memo: dict = {}
    _append_epoch(spark.createDataFrame(pdf.iloc[40:50]), 0, out,
                  "varint", 128, memo=memo)
    add_facet(spark, out, "lang")          # mid-stream backfill
    assert Index(spark, out).facets == ("lang",)
    _append_epoch(spark.createDataFrame(pdf.iloc[50:]), 1, out,
                  "varint", 128, memo=memo)
    idx = Index(spark, out)
    assert idx.facets == ("lang",), "stale memo erased the backfill"
    # the filter is exact over ALL docs — incl. epoch 1's, which the
    # refreshed base indexes inline
    lang = {r["doc_id"]: r["lang"] for r in
            spark.read.parquet(f"{out}/docs").collect()}
    target = lang[0]
    n = idx.n_docs
    full = idx.search_rows([(0, "def return", n)])
    want = [r[2] for r in full if lang[r[2]] == target]
    got = [r[2] for r in idx.search_rows([(0, "def return", n)],
                                         filters={"lang": target})]
    assert got == want
    assert any(d >= 50 for d in got) or not any(
        lang[d] == target for d in range(50, 60))
