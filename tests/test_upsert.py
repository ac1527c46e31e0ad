"""Document upsert (plans/upsert.py): replace-by-(repo, path) via epoch
append + key tombstones; frozen stats until compact; idempotent replay.
"""

import shutil

import pytest
from pyspark.sql import functions as F

from fixtures.gen_corpus import gen_corpus


def _patched(spark, pdf, every=5, suffix=" upserted_marker"):
    """New versions for every Nth source row: new commit (derived from
    the suffix — changed content must change the commit), content+suffix."""
    rows = pdf[pdf.index % every == 0]
    out = rows.copy()
    tag = str(sum(suffix.encode()) % 997)
    out["commit"] = "u" + tag + out["commit"].str.slice(1 + len(tag))
    out["content"] = out["content"] + suffix
    return spark.createDataFrame(out)


@pytest.fixture()
def up_setup(spark, tmp_path):
    from donkey_spark.plans.build import build_index
    pdf = gen_corpus(200, seed=3)
    corpus = spark.createDataFrame(pdf)
    out = str(tmp_path / "idx")
    build_index(spark, corpus, out, range_size=64)
    return out, pdf, corpus


def test_upsert_replaces_old_versions(spark, up_setup):
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.upsert import upsert_docs
    out, pdf, _ = up_setup
    n0 = Index(spark, out).n_docs
    patched = _patched(spark, pdf)
    n_patch = patched.count()
    info = upsert_docs(spark, out, patched)
    assert info["n_appended"] == n_patch
    assert info["n_tombstones"] == n_patch
    assert info["epoch"] == 0

    idx = Index(spark, out)
    # the marker term matches EXACTLY the new versions
    hits = idx.search_rows([(0, "upserted_marker", 10 * n_patch)])
    assert len(hits) == n_patch
    assert all(r[2] >= n0 for r in hits)          # all epoch-assigned ids
    paths = {(r[4], r[5]) for r in hits}
    assert paths == {(r["repo"], r["path"])
                     for r in patched.select("repo", "path").collect()}
    # no query may surface an old version of an upserted file
    every = idx.search_rows([(0, "def return class import", idx.n_docs)])
    by_key = {}
    for r in every:
        by_key.setdefault((r[4], r[5]), []).append(r[2])
    for key, ids in by_key.items():
        assert len(ids) == 1, f"{key} ranked {len(ids)} versions"
        if key in paths:
            assert ids[0] >= n0


def test_upsert_is_idempotent(spark, up_setup):
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.upsert import upsert_docs
    out, pdf, _ = up_setup
    patched = _patched(spark, pdf)
    upsert_docs(spark, out, patched)
    before = Index(spark, out).search_rows(
        [(0, "upserted_marker def return", 50)])
    info2 = upsert_docs(spark, out, patched)       # torn-run replay
    assert info2["n_appended"] == 0
    assert info2["epoch"] is None
    assert info2["n_tombstones"] == patched.count()   # same set, union'd
    after = Index(spark, out).search_rows(
        [(0, "upserted_marker def return", 50)])
    assert after == before


def test_upsert_twice_keeps_only_latest(spark, up_setup):
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.upsert import upsert_docs
    out, pdf, _ = up_setup
    upsert_docs(spark, out, _patched(spark, pdf, suffix=" upserted_v1"))
    info = upsert_docs(spark, out, _patched(spark, pdf,
                                            suffix=" upserted_v2"))
    assert info["epoch"] == 1
    idx = Index(spark, out)
    assert idx.search_rows([(0, "upserted_v1", 100)]) == []
    assert len(idx.search_rows([(0, "upserted_v2", 100)])) == \
        _patched(spark, pdf).count()


def test_pure_insert_and_validation(spark, up_setup):
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.upsert import upsert_docs
    out, pdf, _ = up_setup
    brand_new = spark.createDataFrame(
        [("newrepo", "brand/new.py", "c0", "py",
          "def fresh(): return upserted_marker_insert")],
        "repo string, path string, commit string, lang string, "
        "content string")
    info = upsert_docs(spark, out, brand_new)
    assert (info["n_appended"], info["n_tombstones"]) == (1, 0)
    hits = Index(spark, out).search_rows(
        [(0, "upserted_marker_insert", 5)])
    assert [(r[4], r[5]) for r in hits] == [("newrepo", "brand/new.py")]
    # two rows per (repo, path) must be refused, not mutually tombstoned
    twice = brand_new.unionByName(
        brand_new.withColumn("commit", F.lit("c1")))
    with pytest.raises(ValueError, match="multiple rows"):
        upsert_docs(spark, out, twice)
    with pytest.raises(ValueError, match="not an index"):
        upsert_docs(spark, out + "_nope", brand_new)


def test_compact_reclaims_to_canonical(spark, up_setup):
    """compact over (original ∪ new versions) must equal a fresh build
    over the patched corpus — ids, stats, and rankings."""
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.upsert import upsert_docs
    from donkey_spark.streaming.ingest import compact_index
    out, pdf, corpus = up_setup
    patched = _patched(spark, pdf)
    upsert_docs(spark, out, patched)
    full = corpus.unionByName(patched)     # old versions die by tombstone
    compact_index(spark, full, out)
    ref_dir = out + "_ref"
    keys = {(r["repo"], r["path"]) for r in
            patched.select("repo", "path").collect()}
    ref_pdf = pdf[~pdf.apply(lambda r: (r["repo"], r["path"]) in keys,
                             axis=1)]
    build_index(spark, spark.createDataFrame(ref_pdf).unionByName(patched),
                ref_dir)
    try:
        a, b = Index(spark, out), Index(spark, ref_dir)
        assert (a.n_docs, a.avgdl) == (b.n_docs, b.avgdl)
        q = [(0, "def return upserted_marker", 30)]
        assert a.search_rows(q) == b.search_rows(q)
    finally:
        shutil.rmtree(ref_dir, ignore_errors=True)


def test_upsert_preserves_facets_and_refuses_v3(spark, tmp_path):
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.upsert import upsert_docs
    pdf = gen_corpus(120, seed=9)
    corpus = spark.createDataFrame(pdf)
    fdir, pdir = str(tmp_path / "f"), str(tmp_path / "p")
    build_index(spark, corpus, fdir, range_size=64, facets=("lang",))
    patched = _patched(spark, pdf, every=4)
    upsert_docs(spark, fdir, patched)
    langs = {r["lang"] for r in patched.select("lang").collect()}
    target = sorted(langs)[0]
    hits = Index(spark, fdir).search_rows(
        [(0, "upserted_marker", 200)], filters={"lang": target})
    exp = patched.where(F.col("lang") == target).count()
    assert len(hits) == exp                # new docs carry facet postings
    # upsert into a positional (v3) index writes the epoch's positions
    # chunk: the upserted docs' NEW phrase is findable, the old content
    # (now tombstoned) never ranks
    build_index(spark, corpus, pdir, range_size=64, positions=True)
    info = upsert_docs(spark, pdir, patched)
    assert info["n_appended"] == patched.count()
    pidx = Index(spark, pdir)
    assert pidx.version == 3
    hits = pidx.search_phrase("upserted_marker", k=100)
    assert {(r[4], r[5]) for r in hits} == \
        {(r["repo"], r["path"])
         for r in patched.select("repo", "path").collect()}
