"""Tombstone deletion (plans/delete.py) — visibility-exact semantics.

The contract: a tombstoned doc is invisible to every query path and
mode immediately (it can neither rank nor inflate θ/block potentials),
live docs rank EXACTLY as if scored with the frozen index stats and the
dead docs filtered afterward, and compact_index makes deletion physical
(rebuild without the docs, tombstones cleared).
"""

import numpy as np
import pytest

from fixtures.gen_corpus import gen_corpus
from tests.oracle_bm25 import OracleIndex


# ---------- kernel level -----------------------------------------------------

def _rand_postings(rng, n_docs, vocab):
    postings = {}
    for t in vocab:
        df = int(rng.integers(1, n_docs + 1))
        ids = np.sort(rng.choice(n_docs, size=df,
                                 replace=False)).astype(np.int64)
        tfs = rng.integers(1, 20, size=df).astype(np.int64)
        postings[t] = (ids, tfs)
    return postings


def test_kernel_dead_docs_excluded_or_and():
    """Both kernels vs brute force with dead docs filtered AFTER scoring
    (stats frozen) — 100 random corpora, random dead sets."""
    from donkey_spark.kernels.blocks import build_blocks
    from donkey_spark.kernels.bm25 import idf, tf_part
    from donkey_spark.kernels.wand import (TermBlocks, score_range_topk,
                                           score_range_topk_and)
    for trial in range(100):
        rng = np.random.default_rng(8000 + trial)
        n_docs = int(rng.integers(10, 300))
        vocab = [f"t{j}" for j in range(int(rng.integers(3, 12)))]
        dls = rng.integers(1, 200, size=n_docs).astype(np.int64)
        avgdl = float(dls.mean())
        postings = _rand_postings(rng, n_docs, vocab)
        nq = int(rng.integers(1, 4))
        qterms = list(rng.choice(vocab, size=nq, replace=False))
        k = int(rng.integers(1, 12))
        n_dead = int(rng.integers(0, max(1, n_docs // 3)))
        dead = np.sort(rng.choice(n_docs, size=n_dead,
                                  replace=False)).astype(np.int64)
        dead_set = set(dead.tolist())

        # brute force with frozen stats, dead filtered before top-k
        acc = np.zeros(n_docs)
        cnt = np.zeros(n_docs, dtype=np.int64)
        for t in qterms:
            ids, tfs = postings[t]
            acc[ids] += idf(n_docs, ids.size) * tf_part(tfs, dls[ids], avgdl)
            cnt[ids] += 1

        def expect(mode):
            live = [d for d in range(n_docs) if d not in dead_set]
            if mode == "and":
                hits = [d for d in live if cnt[d] == len(qterms)]
            else:
                hits = [d for d in live if acc[d] > 0]
            order = sorted(hits, key=lambda d: (-acc[d], d))[:k]
            return (np.array(order, dtype=np.int64),
                    np.array([acc[d] for d in order]))

        terms = []
        for t in qterms:
            ids, tfs = postings[t]
            rows = list(build_blocks(ids, tfs, dls[ids], avgdl,
                                     block_size=8, codec="varint"))
            for r in rows:
                r["codec"] = "varint"
            terms.append(TermBlocks(idf(n_docs, ids.size), rows))

        g_ids, g_sc = score_range_topk(0, n_docs, terms, avgdl, k,
                                       dead=dead)
        e_ids, e_sc = expect("or")
        np.testing.assert_array_equal(g_ids, e_ids)
        np.testing.assert_allclose(g_sc, e_sc, atol=1e-9)

        g_ids, g_sc = score_range_topk_and(0, n_docs, terms, avgdl, k,
                                           len(qterms), dead=dead)
        e_ids, e_sc = expect("and")
        np.testing.assert_array_equal(g_ids, e_ids)
        np.testing.assert_allclose(g_sc, e_sc, atol=1e-9)


# ---------- engine level -----------------------------------------------------

@pytest.fixture(scope="module")
def del_index(spark, tmp_path_factory):
    from donkey_spark.plans.build import build_index
    pdf = gen_corpus(300, seed=42)
    corpus = spark.createDataFrame(pdf)
    out = str(tmp_path_factory.mktemp("delidx"))
    build_index(spark, corpus, out, range_size=64)
    ordered = pdf.sort_values(["repo", "path", "commit"]).reset_index()
    oracle = OracleIndex(list(enumerate(ordered["content"])))
    return out, corpus, oracle


def test_delete_then_query_matches_filtered_oracle(spark, del_index):
    from donkey_spark.plans.delete import delete_docs
    from donkey_spark.plans.query import Index
    out, _, oracle = del_index
    base = Index(spark, out)
    # delete the CURRENT top-3 of the query — the hardest case for θ
    top = [r["doc_id"] for r in base.search("def return", k=3).collect()]
    n = delete_docs(spark, out, top)
    assert n == 3
    assert delete_docs(spark, out, top) == 3        # idempotent re-delete

    for local_bytes in (64 << 20, 0):               # local AND distributed
        idx = Index(spark, out, local_bytes=local_bytes)
        for mode in ("or", "and"):
            got = idx.search_batch([(0, "def return", 10)],
                                   mode=mode).collect()
            search = (oracle.search if mode == "or" else oracle.search_and)
            exp = [(d, s) for _, d, s in search("def return", 10 + 3)
                   if d not in set(top)][:10]
            assert [r["doc_id"] for r in got] == [d for d, _ in exp], mode
            np.testing.assert_allclose([r["score"] for r in got],
                                       [s for _, s in exp], atol=1e-9)
            assert not set(top) & {r["doc_id"] for r in got}


def test_compact_reclaims_tombstones(spark, del_index, tmp_path):
    """compact_index over a tombstoned index: deleted docs physically
    gone, tombstone set cleared, stats refreshed."""
    import os
    from donkey_spark.plans.delete import delete_docs, load_tombstones
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.build import build_index
    from donkey_spark.streaming import compact_index
    from fixtures.gen_corpus import gen_corpus as _gen
    pdf = _gen(120, seed=5)
    corpus = spark.createDataFrame(pdf)
    out = str(tmp_path / "cidx")
    build_index(spark, corpus, out, range_size=64)
    idx = Index(spark, out)
    victims = [r["doc_id"] for r in idx.search("def", k=2).collect()]
    delete_docs(spark, out, victims)

    info = compact_index(spark, corpus, out, range_size=64)
    assert info["n_docs"] == 120 - len(victims)
    assert load_tombstones(spark, out).size == 0
    assert not os.path.isdir(f"{out}/tombstones")
    idx2 = Index(spark, out)
    assert idx2.n_docs == 120 - len(victims)
    assert len(idx2.search("def", k=5).collect()) == 5


def test_tombstone_staging_fallback_and_remerge(spark, del_index, tmp_path):
    """Crash-window recovery: if a crash lands between the old set's
    delete and the staging rename, the reader must fall back to the
    staging copy (always the full merged set), and the next delete_docs
    must re-merge losslessly."""
    import shutil
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.delete import delete_docs, load_tombstones
    from fixtures.gen_corpus import gen_corpus as _gen
    out = str(tmp_path / "sidx")
    build_index(spark, spark.createDataFrame(_gen(80, seed=9)), out,
                range_size=64)
    assert delete_docs(spark, out, [1, 2, 3]) == 3
    # simulate the torn swap: committed dir gone, staging holds the set
    shutil.move(f"{out}/tombstones", f"{out}/tombstones_staging")
    assert sorted(load_tombstones(spark, out).tolist()) == [1, 2, 3]
    # next delete must merge staging content, then commit atomically
    assert delete_docs(spark, out, [7]) == 4
    assert sorted(load_tombstones(spark, out).tolist()) == [1, 2, 3, 7]
    import os
    assert os.path.isdir(f"{out}/tombstones")
    assert not os.path.isdir(f"{out}/tombstones_staging")


def test_old_id_format_tombstones_migrate(spark, tmp_path):
    """A pre-r3 tombstone set (doc_id-only parquet) must keep working:
    ids resolve through the docs table instead of crashing."""
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.delete import delete_docs, load_tombstones
    from donkey_spark.plans.query import Index
    from fixtures.gen_corpus import gen_corpus as _gen
    out = str(tmp_path / "oldidx")
    build_index(spark, spark.createDataFrame(_gen(60, seed=3)), out,
                range_size=64)
    # simulate the old format: ids-only parquet at tombstones/
    (spark.createDataFrame([(4,), (9,)], "doc_id long")
     .coalesce(1).write.parquet(f"{out}/tombstones"))
    assert sorted(load_tombstones(spark, out).tolist()) == [4, 9]
    assert 4 not in [r["doc_id"] for r in
                     Index(spark, out).search("def", k=60).collect()]
    # a further delete migrates the set to the key format losslessly
    assert delete_docs(spark, out, [11]) == 3
    assert sorted(load_tombstones(spark, out).tolist()) == [4, 9, 11]


def test_kernel_allowed_mask_with_dead_or_and():
    """Facet allowed-mask + tombstones combined, kernel level: both
    kernels vs brute force restricted to (allowed ∧ ¬dead) docs with
    frozen stats — 60 random corpora."""
    import numpy as np
    from donkey_spark.kernels.blocks import build_blocks
    from donkey_spark.kernels.bm25 import idf, tf_part
    from donkey_spark.kernels.wand import (TermBlocks, score_range_topk,
                                           score_range_topk_and)
    for trial in range(60):
        rng = np.random.default_rng(9100 + trial)
        n_docs = int(rng.integers(10, 250))
        vocab = [f"t{j}" for j in range(int(rng.integers(3, 10)))]
        dls = rng.integers(1, 150, size=n_docs).astype(np.int64)
        avgdl = float(dls.mean())
        postings = _rand_postings(rng, n_docs, vocab)
        qterms = list(rng.choice(vocab, size=int(rng.integers(1, 4)),
                                 replace=False))
        k = int(rng.integers(1, 10))
        allowed = rng.random(n_docs) < 0.6
        dead = np.sort(rng.choice(n_docs, size=int(rng.integers(0, 6)),
                                  replace=False)).astype(np.int64)
        live = allowed.copy()
        live[dead] = False

        acc = np.zeros(n_docs)
        cnt = np.zeros(n_docs, dtype=np.int64)
        for t in qterms:
            ids, tfs = postings[t]
            acc[ids] += idf(n_docs, ids.size) * tf_part(tfs, dls[ids], avgdl)
            cnt[ids] += 1

        def expect(mode):
            if mode == "and":
                hits = [d for d in range(n_docs)
                        if live[d] and cnt[d] == len(qterms)]
            else:
                hits = [d for d in range(n_docs) if live[d] and acc[d] > 0]
            order = sorted(hits, key=lambda d: (-acc[d], d))[:k]
            return (np.array(order, dtype=np.int64),
                    np.array([acc[d] for d in order]))

        terms = []
        for t in qterms:
            ids, tfs = postings[t]
            rows = list(build_blocks(ids, tfs, dls[ids], avgdl,
                                     block_size=8, codec="varint"))
            for r in rows:
                r["codec"] = "varint"
            terms.append(TermBlocks(idf(n_docs, ids.size), rows))

        # the engine folds dead into the mask when both are present
        # (query.py score_group); mirror that here
        mask = allowed.copy()
        mask[dead] = False
        g_ids, g_sc = score_range_topk(0, n_docs, terms, avgdl, k,
                                       allowed=mask)
        e_ids, e_sc = expect("or")
        np.testing.assert_array_equal(g_ids, e_ids)
        np.testing.assert_allclose(g_sc, e_sc, atol=1e-9)
        g_ids, g_sc = score_range_topk_and(0, n_docs, terms, avgdl, k,
                                           len(qterms), allowed=mask)
        e_ids, e_sc = expect("and")
        np.testing.assert_array_equal(g_ids, e_ids)
        np.testing.assert_allclose(g_sc, e_sc, atol=1e-9)


def test_kernel_dead_plus_allowed_both_passed():
    """Both kernels accept dead AND allowed simultaneously with identical
    semantics (r4 ADVICE: the OR kernel used to silently ignore dead when
    a mask was present, relying on the caller to fold them)."""
    from donkey_spark.kernels.blocks import build_blocks
    from donkey_spark.kernels.bm25 import idf, tf_part
    from donkey_spark.kernels.wand import (TermBlocks, score_range_topk,
                                           score_range_topk_and)
    for trial in range(40):
        rng = np.random.default_rng(9400 + trial)
        n_docs = int(rng.integers(10, 250))
        vocab = [f"t{j}" for j in range(int(rng.integers(2, 8)))]
        dls = rng.integers(1, 150, size=n_docs).astype(np.int64)
        avgdl = float(dls.mean())
        postings = _rand_postings(rng, n_docs, vocab)
        qterms = list(rng.choice(
            vocab, size=int(rng.integers(1, min(4, len(vocab) + 1))),
            replace=False))
        k = int(rng.integers(1, 10))
        allowed = rng.random(n_docs) < 0.7
        dead = np.sort(rng.choice(n_docs, size=int(rng.integers(1, 8)),
                                  replace=False)).astype(np.int64)
        folded = allowed.copy()
        folded[dead] = False

        terms = []
        for t in qterms:
            ids, tfs = postings[t]
            rows = list(build_blocks(ids, tfs, dls[ids], avgdl,
                                     block_size=8, codec="varint"))
            for r in rows:
                r["codec"] = "varint"
            terms.append(TermBlocks(idf(n_docs, ids.size), rows))

        for kern, extra in ((score_range_topk, ()),
                            (score_range_topk_and, (len(qterms),))):
            allowed_before = allowed.copy()
            b_ids, b_sc = kern(0, n_docs, terms, avgdl, k, *extra,
                               dead=dead, allowed=allowed)
            f_ids, f_sc = kern(0, n_docs, terms, avgdl, k, *extra,
                               allowed=folded)
            np.testing.assert_array_equal(b_ids, f_ids)
            np.testing.assert_allclose(b_sc, f_sc, atol=1e-12)
            assert not set(dead.tolist()) & set(b_ids.tolist())
            # the kernel must not mutate the caller's mask (reused across
            # the batch's queries)
            np.testing.assert_array_equal(allowed, allowed_before)


def test_fresh_build_preserves_tombstones(spark, tmp_path):
    """A fresh (resume=False) build over an index dir with committed
    tombstones must NOT erase the key set (r4 ADVICE: a crash inside
    compact_index between its cleanup and its post-commit clear would
    otherwise silently resurrect deleted documents on recovery). Keys
    survive the rebuild and keep hiding the matching docs; only
    compact_index's post-commit clear erases them."""
    import os
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.delete import delete_docs, load_tombstones
    from donkey_spark.plans.query import Index
    from donkey_spark.streaming import compact_index
    out = str(tmp_path / "idx")
    corpus = spark.createDataFrame(gen_corpus(80, seed=21))
    build_index(spark, corpus, out, range_size=64)
    assert delete_docs(spark, out, [5, 6]) == 2
    # crash-recovery analog: a full fresh rebuild over the SAME corpus
    build_index(spark, corpus, out, range_size=64)
    assert os.path.isdir(f"{out}/tombstones")
    ids = load_tombstones(spark, out)
    assert ids.size == 2               # keys still resolve to the docs
    idx = Index(spark, out)
    got = {r["doc_id"] for q in ("def return", "import class")
           for r in idx.search(q, k=80).collect()}
    assert not set(ids.tolist()) & got
    # the sanctioned eraser: compaction clears after its build commits
    compact_index(spark, corpus, out, range_size=64)
    assert load_tombstones(spark, out).size == 0
    assert not os.path.isdir(f"{out}/tombstones")


def test_delete_million_key_set_and_compact(spark, tmp_path):
    """10^6-key tombstone set (r4): the staging commit fans out past the
    single-file gate, readers resolve the bounded live subset, and
    compact_index reclaims via its parquet snapshot (no driver
    round-trip) and cleans the snapshot up after committing."""
    import os
    from pyspark.sql import functions as F
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.delete import delete_docs, load_tombstones
    from donkey_spark.plans.query import Index
    from donkey_spark.streaming import compact_index
    out = str(tmp_path / "idx")
    corpus = spark.createDataFrame(gen_corpus(60, seed=31))
    build_index(spark, corpus, out, range_size=64)
    # 10^6 synthetic keys (resolve to no docs — harmless by design)
    big = (spark.range(1_000_000)
           .select(F.concat(F.lit("r"), (F.col("id") % 997))
                   .alias("repo"),
                   F.concat(F.lit("p/"), F.col("id")).alias("path"),
                   F.sha2(F.col("id").cast("string"), 256).substr(1, 40)
                   .alias("commit")))
    assert delete_docs(spark, out, big) == 1_000_000
    # real deletions resolve correctly amid the noise keys
    assert delete_docs(spark, out, [3, 4]) == 1_000_002
    ids = load_tombstones(spark, out)
    assert sorted(ids.tolist()) == [3, 4]
    got = {r["doc_id"] for r in
           Index(spark, out).search("def return", k=60).collect()}
    assert not {3, 4} & got

    info = compact_index(spark, corpus, out, range_size=64)
    assert info["n_docs"] == 58
    assert load_tombstones(spark, out).size == 0
    assert not os.path.isdir(f"{out}/_tombstone_snapshot")
    assert not {3, 4} & {r["doc_id"] for r in
                         spark.read.parquet(f"{out}/docs")
                         .join(corpus.where(
                             F.col("path").isin("doc/3", "doc/4")),
                             ["repo", "path", "commit"], "left_semi")
                         .collect()}


def test_legacy_id_tombstones_migrate_before_fresh_rebuild(spark, tmp_path):
    """A pre-r3 id-only tombstone set must be resolved to KEYS through
    the OLD docs table before a fresh rebuild reassigns doc ids —
    otherwise the stale ids would remap onto arbitrary wrong documents
    in the rebuilt index (r4 review finding)."""
    import pandas as pd
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.delete import load_tombstones
    out = str(tmp_path / "idx")
    pdf1 = gen_corpus(60, seed=3)
    build_index(spark, spark.createDataFrame(pdf1), out, range_size=64)
    old = {r["doc_id"]: (r["repo"], r["path"], r["commit"]) for r in
           spark.read.parquet(f"{out}/docs").collect()}
    victims = {old[4], old[9]}
    (spark.createDataFrame([(4,), (9,)], "doc_id long")
     .coalesce(1).write.parquet(f"{out}/tombstones"))

    # rebuild over an EXTENDED corpus — dense id assignment shifts
    pdf2 = pd.concat([pdf1, gen_corpus(30, seed=77)], ignore_index=True)
    build_index(spark, spark.createDataFrame(pdf2), out, range_size=64)

    t = spark.read.parquet(f"{out}/tombstones")
    assert {"repo", "path", "commit"} <= set(t.columns)   # migrated
    assert {(r["repo"], r["path"], r["commit"])
            for r in t.collect()} == victims
    # the hidden docs are the ORIGINAL documents, at their NEW ids
    new = {(r["repo"], r["path"], r["commit"]): r["doc_id"] for r in
           spark.read.parquet(f"{out}/docs").collect()}
    assert sorted(load_tombstones(spark, out).tolist()) == \
        sorted(new[k] for k in victims)


def test_legacy_staging_only_set_promoted_before_migration(spark, tmp_path):
    """A legacy id-format set living ONLY in tombstones_staging (torn
    pre-migration swap) must be promoted before the migration rewrites
    staging — the rewrite may never overwrite the set's only copy."""
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.delete import load_tombstones
    out = str(tmp_path / "idx")
    pdf = gen_corpus(50, seed=13)
    build_index(spark, spark.createDataFrame(pdf), out, range_size=64)
    old = {r["doc_id"]: (r["repo"], r["path"], r["commit"]) for r in
           spark.read.parquet(f"{out}/docs").collect()}
    (spark.createDataFrame([(7,)], "doc_id long")
     .coalesce(1).write.parquet(f"{out}/tombstones_staging"))
    build_index(spark, spark.createDataFrame(pdf), out, range_size=64)
    t = spark.read.parquet(f"{out}/tombstones")
    assert {(r["repo"], r["path"], r["commit"])
            for r in t.collect()} == {old[7]}
    assert load_tombstones(spark, out).tolist() == [7]


def test_ten_million_key_smj_fallback_end_to_end(spark, tmp_path,
                                                 monkeypatch):
    """r5: a 10^7-key tombstone set crosses BOTH large-set regimes
    end-to-end: the staging commit fans out to multiple files
    (plans/delete.py nparts gate) and compact's reclamation snapshot
    exceeds the 64 MB broadcast gate, so the anti-join must run WITHOUT
    a forced broadcast — Spark picks the shuffle (SMJ) plan — while
    survivor docs keep their exact pre-delete scores and ranks."""
    import time

    from pyspark.sql import functions as F
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.delete import delete_docs, load_tombstones
    from donkey_spark.plans.query import Index
    from donkey_spark.streaming import compact_index

    out = str(tmp_path / "idx")
    corpus = spark.createDataFrame(gen_corpus(60, seed=31))
    build_index(spark, corpus, out, range_size=64)
    base = [(r[2], round(r[3], 9)) for r in
            Index(spark, out).search_rows([(0, "def return", 60)])]

    big = (spark.range(10_000_000)
           .select(F.concat(F.lit("r"), (F.col("id") % 997)).alias("repo"),
                   F.concat(F.lit("p/"), F.col("id")).alias("path"),
                   F.sha2(F.col("id").cast("string"), 256).substr(1, 16)
                   .alias("commit")))
    t0 = time.perf_counter()
    assert delete_docs(spark, out, big) == 10_000_000
    assert delete_docs(spark, out, [3, 4]) == 10_000_002
    t_delete = time.perf_counter() - t0
    # multi-file staging commit (nparts = n // 5M = 2)
    import glob
    assert len(glob.glob(f"{out}/tombstones/part-*.parquet")) >= 2
    assert sorted(load_tombstones(spark, out).tolist()) == [3, 4]

    # survivors keep EXACT pre-delete scores/ranks (stats frozen)
    after = [(r[2], round(r[3], 9)) for r in
             Index(spark, out).search_rows([(0, "def return", 60)])]
    assert after == [x for x in base if x[0] not in (3, 4)]

    # at this key volume Spark itself must choose a shuffle join for the
    # reclamation anti-join (the 64 MB gate refuses to force broadcast)
    dead = spark.read.parquet(f"{out}/tombstones")
    plan = (corpus.join(dead, ["repo", "path", "commit"], "left_anti")
            ._jdf.queryExecution().executedPlan().toString())
    assert "SortMergeJoin" in plan and "Broadcast" not in plan, plan

    calls = []
    orig_broadcast = F.broadcast
    monkeypatch.setattr(
        "pyspark.sql.functions.broadcast",
        lambda df: (calls.append(1), orig_broadcast(df))[1])
    t0 = time.perf_counter()
    info = compact_index(spark, corpus, out, range_size=64)
    t_compact = time.perf_counter() - t0
    assert calls == [], "compact forced a broadcast past the 64 MB gate"
    assert info["n_docs"] == 58
    assert load_tombstones(spark, out).size == 0
    print(f"\n10M-key e2e: delete {t_delete:.1f}s, "
          f"compact(SMJ) {t_compact:.1f}s")


def test_revive_docs_is_the_delete_inverse(spark, tmp_path):
    """revive_docs removes keys from the set (idempotent, unknown keys
    ignored) and the revived documents rank again (r5 third review —
    the primitive upsert's revert path needs)."""
    from pyspark.sql import functions as F

    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.delete import (delete_docs, revive_docs,
                                           tombstone_keys)
    from donkey_spark.plans.query import Index
    pdf = gen_corpus(60, seed=29)
    out = str(tmp_path / "ridx")
    build_index(spark, spark.createDataFrame(pdf), out, range_size=64)
    idx = Index(spark, out)
    base = idx.search_rows([(0, "def return", 6)])
    assert len(base) >= 3
    victims = [r[2] for r in base[:3]]
    assert delete_docs(spark, out, victims) == 3
    keys = spark.read.parquet(f"{out}/docs") \
        .where(F.col("doc_id").isin(victims[:2])) \
        .select("repo", "path", "commit")
    assert revive_docs(spark, out, keys) == 1      # two keys removed
    got = Index(spark, out).search_rows([(0, "def return", 6)])
    ids = [r[2] for r in got]
    assert victims[0] in ids and victims[1] in ids
    assert victims[2] not in ids
    # idempotent; unknown keys are ignored
    assert revive_docs(spark, out, keys) == 1
    assert tombstone_keys(spark, out).count() == 1


def test_delete_by_query_matches_search_semantics(spark, tmp_path):
    """delete_by_query tombstones exactly the docs the same query (mode
    + filters) would rank; the query itself then returns nothing;
    idempotent; OOV deletes nothing."""
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.delete import delete_by_query
    from donkey_spark.plans.facet_counts import match_count
    from donkey_spark.plans.query import Index
    pdf = gen_corpus(80, seed=37)
    out = str(tmp_path / "dbq")
    build_index(spark, spark.createDataFrame(pdf), out, range_size=64,
                facets=("lang",))
    idx = Index(spark, out)
    n = idx.n_docs
    text = "def return"
    full = {r[2] for r in idx.search_rows([(0, text, n)])}
    lang = {r["doc_id"]: r["lang"] for r in
            spark.read.parquet(f"{out}/docs").collect()}
    target = sorted(set(lang.values()))[0]
    want_dead = {d for d in full if lang[d] == target}
    assert want_dead and want_dead != full      # fixture sanity
    t = delete_by_query(spark, out, text, filters={"lang": target})
    assert t == len(want_dead)
    idx2 = Index(spark, out)
    got = {r[2] for r in idx2.search_rows([(0, text, n)])}
    assert got == full - want_dead
    assert match_count(idx2, text, filters={"lang": target}) == 0
    # idempotent; OOV is a no-op
    assert delete_by_query(spark, out, text,
                           filters={"lang": target}) == t
    assert delete_by_query(spark, out, "zz_totally_oov") == t
    # AND mode deletes only the conjunctive match set
    and_set = {r[2] for r in idx2.search_rows([(0, text, n)],
                                              mode="and")}
    t2 = delete_by_query(spark, out, text, mode="and")
    assert t2 == t + len(and_set - want_dead)
