"""Facet backfill (plans/add_facet.py): adding a filter column to an
existing index must be indistinguishable from having built with it."""

import pytest
from pyspark.sql import functions as F

from fixtures.gen_corpus import gen_corpus


@pytest.fixture(scope="module")
def bf_setup(spark, tmp_path_factory):
    from donkey_spark.plans.add_facet import add_facet
    from donkey_spark.plans.build import build_index
    pdf = gen_corpus(200, seed=13)
    corpus = spark.createDataFrame(pdf)
    plain = str(tmp_path_factory.mktemp("bf") / "plain")
    built = str(tmp_path_factory.mktemp("bf") / "built")
    build_index(spark, corpus, plain, range_size=64)
    build_index(spark, corpus, built, range_size=64, facets=("lang",))
    info = add_facet(spark, plain, "lang")
    return plain, built, corpus, info


def test_backfill_equals_built_in(spark, bf_setup):
    from donkey_spark.plans.query import Index
    plain, built, _, info = bf_setup
    a, b = Index(spark, plain), Index(spark, built)
    assert a.facets == b.facets == ("lang",)
    assert info["n_postings"] > 0 and info["n_values"] >= 2
    assert (a.n_docs, a.avgdl) == (b.n_docs, b.avgdl)
    qs = [(0, "def return", 15), (1, "class import", 10)]
    for filt in ({"lang": "en"}, {"lang": ["de", "fr"]},
                 {"lang": {"not": ["en"]}}, None):
        assert a.search_rows(qs, filters=filt) == \
            b.search_rows(qs, filters=filt), filt
    # unfiltered scores are untouched by the backfill (zero-idf postings)
    assert a.search_rows(qs) == Index(spark, plain).search_rows(qs)


def test_backfill_serves_facet_counts(spark, bf_setup):
    from donkey_spark.plans.facet_counts import facet_counts
    from donkey_spark.plans.query import Index
    plain, built, _, _ = bf_setup
    a = {r["value"]: r["n_docs"] for r in facet_counts(
        Index(spark, plain), "def return", "lang").collect()}
    b = {r["value"]: r["n_docs"] for r in facet_counts(
        Index(spark, built), "def return", "lang").collect()}
    assert a == b and sum(a.values()) > 0


def test_backfill_values_dataframe_and_validation(spark, tmp_path):
    from donkey_spark.plans.add_facet import add_facet
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    pdf = gen_corpus(120, seed=17)
    out = str(tmp_path / "vals")
    build_index(spark, spark.createDataFrame(pdf), out, range_size=64)
    docs = spark.read.parquet(f"{out}/docs")
    # an arbitrary caller-computed column: doc_id parity, NULL for %3==0
    vals = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, None)
         .otherwise(F.when(F.col("doc_id") % 2 == 0, "even")
                    .otherwise("odd")).alias("value"))
    info = add_facet(spark, out, "parity", values=vals)
    assert info["n_values"] == 2
    idx = Index(spark, out)
    n = idx.n_docs
    got = idx.search_rows([(0, "def return", n)],
                          filters={"parity": "even"})
    assert got
    assert all(r[2] % 2 == 0 and r[2] % 3 != 0 for r in got)
    full = idx.search_rows([(0, "def return", n)])
    exp = [r[2] for r in full if r[2] % 2 == 0 and r[2] % 3 != 0]
    assert [r[2] for r in sorted(got, key=lambda r: r[1])] == \
        [d for d in [r[2] for r in full] if d in set(exp)]
    # NULL-valued docs also drop out of the NOT complement's positive set
    nots = idx.search_rows([(0, "def return", n)],
                           filters={"parity": {"not": ["odd"]}})
    assert {r[2] for r in nots} == \
        {r[2] for r in full} - {r[2] for r in full
                                if r[2] % 3 != 0 and r[2] % 2 == 1}
    # re-running a BACKFILLED column is a refresh (r5 review), not an
    # error — same values must converge to identical state
    before = idx.search_rows([(0, "def return", n)],
                             filters={"parity": "even"})
    info2 = add_facet(spark, out, "parity", values=vals)
    assert info2["n_postings"] == info["n_postings"]
    m = spark.read.parquet(f"{out}/meta").collect()[0]
    assert m["facets"].split(",").count("parity") == 1
    idx2 = Index(spark, out)
    assert idx2.search_rows([(0, "def return", n)],
                            filters={"parity": "even"}) == before
    dup = vals.unionByName(vals.limit(1))
    with pytest.raises(ValueError, match="multiple rows"):
        add_facet(spark, out, "parity2", values=dup)
    with pytest.raises(ValueError, match="no column"):
        add_facet(spark, out, "license")


def test_backfill_composes_with_later_epochs(spark, tmp_path):
    """Later appends index the backfilled column for NEW docs (meta
    facets govern epochs), and the journal keeps totals exact."""
    from donkey_spark.plans.add_facet import add_facet
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.upsert import upsert_docs
    pdf = gen_corpus(150, seed=23)
    out = str(tmp_path / "epochs")
    build_index(spark, spark.createDataFrame(pdf), out, range_size=64)
    add_facet(spark, out, "lang")
    newrows = pdf.iloc[:8].copy()
    newrows["commit"] = "q" + newrows["commit"].str.slice(1)
    newrows["content"] = newrows["content"] + " backfill_epoch_marker"
    info = upsert_docs(spark, out, spark.createDataFrame(newrows))
    assert info["epoch"] == -2       # upsert epochs: even negatives
    idx = Index(spark, out)
    langs = sorted(set(newrows["lang"]))
    hits = idx.search_rows([(0, "backfill_epoch_marker", 50)],
                           filters={"lang": langs})
    assert len(hits) == len(newrows)     # every new doc carries the facet
    assert idx.n_docs == 150 + 8         # journal totals stayed exact


def test_build_time_facet_cannot_be_refreshed(spark, bf_setup):
    from donkey_spark.plans.add_facet import add_facet
    _, built, _, _ = bf_setup
    # build-time facet postings live inside the batch chunks — a
    # metadata-only rebuild cannot regenerate them
    with pytest.raises(ValueError, match="indexed by the build"):
        add_facet(spark, built, "lang")


def test_values_facet_survives_later_epochs_and_refresh(spark, tmp_path):
    """r5 review: a facet backfilled from caller values= is NOT a corpus
    column — later upsert/stream epochs must SKIP it (NULL semantics for
    their docs), not crash with AnalysisException; a refresh then covers
    the new docs."""
    from donkey_spark.plans.add_facet import add_facet
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.upsert import upsert_docs
    pdf = gen_corpus(100, seed=29)
    out = str(tmp_path / "vf")
    build_index(spark, spark.createDataFrame(pdf), out, range_size=64)
    docs = spark.read.parquet(f"{out}/docs")
    vals = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, "even")
         .otherwise("odd").alias("value"))
    add_facet(spark, out, "parity", values=vals)

    new = spark.createDataFrame(
        [("nrepo", f"p/{i}.py", f"c{i}", "py",
          f"def f{i}(): return parity_epoch_marker") for i in range(6)],
        "repo string, path string, commit string, lang string, "
        "content string")
    info = upsert_docs(spark, out, new)        # must not raise
    assert info["n_appended"] == 6
    idx = Index(spark, out)
    marker = [(0, "parity_epoch_marker", 50)]
    # the epoch's docs carry NO parity value: absent from both positive
    # filters, present in the NOT complement (NULL semantics)
    assert idx.search_rows(marker, filters={"parity": ["even", "odd"]}) \
        == []
    assert len(idx.search_rows(marker,
                               filters={"parity": {"not": ["even"]}})) == 6

    # refresh with values covering the new docs closes the gap
    docs2 = spark.read.parquet(f"{out}/docs")
    vals2 = docs2.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, "even")
         .otherwise("odd").alias("value"))
    add_facet(spark, out, "parity", values=vals2)
    idx2 = Index(spark, out)
    hits = idx2.search_rows(marker, filters={"parity": ["even", "odd"]})
    assert len(hits) == 6
    assert idx2.n_docs == 106                  # totals stayed exact


def test_torn_backfill_does_not_double_count(spark, tmp_path):
    """r5 review: a run that crashed between the journal write and the
    meta write must, on re-run, OVERWRITE its journal row — a second row
    would inflate every later epoch's running totals."""
    import shutil as sh
    from donkey_spark.plans.add_facet import add_facet
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.upsert import upsert_docs
    pdf = gen_corpus(90, seed=37)
    out = str(tmp_path / "torn")
    build_index(spark, spark.createDataFrame(pdf), out, range_size=64)
    n_post_plain = int(spark.read.parquet(f"{out}/meta")
                       .collect()[0]["n_postings"])
    sh.copytree(f"{out}/meta", f"{out}_meta_save")
    info = add_facet(spark, out, "lang")
    # simulate the crash: journal row landed, meta commit did not
    sh.rmtree(f"{out}/meta")
    sh.move(f"{out}_meta_save", f"{out}/meta")

    info2 = add_facet(spark, out, "lang")      # replay
    assert info2["n_postings"] == info["n_postings"]
    journal = spark.read.parquet(f"{out}/manifest_stream")
    assert journal.where(
        F.col("status").startswith("facet:")).count() == 1
    m = spark.read.parquet(f"{out}/meta").collect()[0]
    assert int(m["n_postings"]) == n_post_plain + info["n_postings"]
    # and a later epoch's totals stay exact (the double-count surfaced
    # exactly here before the fix)
    new = spark.createDataFrame(
        [("xr", "x/1.py", "cx", "en", "def x(): return 1")],
        "repo string, path string, commit string, lang string, "
        "content string")
    upsert_docs(spark, out, new)
    assert Index(spark, out).n_docs == 91


def test_backfill_all_null_raises_cleanly(spark, tmp_path):
    """An all-null backfill has nothing to index; it must raise a clear
    ValueError BEFORE any write — the empty segments chunk it used to
    write crashed the immediate read-back with UNABLE_TO_INFER_SCHEMA
    (r5 third review)."""
    import os

    from donkey_spark.plans.add_facet import add_facet
    from donkey_spark.plans.build import build_index
    pdf = gen_corpus(40, seed=19)
    out = str(tmp_path / "nulls")
    build_index(spark, spark.createDataFrame(pdf), out, range_size=64)
    docs = spark.read.parquet(f"{out}/docs")
    vals = docs.select("doc_id",
                       F.lit(None).cast("string").alias("value"))
    with pytest.raises(ValueError, match="no non-null"):
        add_facet(spark, out, "license", values=vals)
    assert not os.path.exists(f"{out}/segments/chunk=facet_license")
    # a values frame matching no doc_id is the same emptiness
    orphan = spark.createDataFrame([(10**9, "mit")],
                                   "doc_id long, value string")
    with pytest.raises(ValueError, match="no non-null"):
        add_facet(spark, out, "license", values=orphan)


@pytest.fixture(scope="module")
def rbf_setup(spark, tmp_path_factory):
    """Plain index + range backfill of n_chars vs a build-time
    range-facet twin over the same corpus."""
    from donkey_spark.plans.add_facet import add_range_facet
    from donkey_spark.plans.build import build_index
    pdf = gen_corpus(200, seed=23)
    corpus = spark.createDataFrame(pdf)
    rich = corpus.withColumn("n_chars", F.length("content"))
    plain = str(tmp_path_factory.mktemp("rbf") / "plain")
    built = str(tmp_path_factory.mktemp("rbf") / "built")
    build_index(spark, corpus, plain, range_size=64)
    build_index(spark, rich, built, range_size=64,
                range_facets=("n_chars",))
    docs = spark.read.parquet(f"{plain}/docs")
    vals = (docs.select("doc_id", "repo", "path", "commit")
            .join(rich.select("repo", "path", "commit",
                              F.col("n_chars").alias("value")),
                  ["repo", "path", "commit"])
            .select("doc_id", "value"))
    info = add_range_facet(spark, plain, "n_chars", values=vals)
    return plain, built, info


def test_range_backfill_equals_built_in(spark, rbf_setup):
    """A backfilled range facet is indistinguishable from a build-time
    one: same meta, same filtered rankings (incl. negation and open
    ends), unfiltered scores untouched."""
    from donkey_spark.plans.query import Index
    plain, built, info = rbf_setup
    a, b = Index(spark, plain), Index(spark, built)
    assert a.range_facets == b.range_facets == ("n_chars",)
    assert a.range_step == b.range_step
    assert info["n_postings"] > 0
    assert (a.n_docs, a.avgdl) == (b.n_docs, b.avgdl)
    qs = [(0, "def return", 15), (1, "class import", 10)]
    for filt in ({"n_chars": {"range": [200, 2000]}},
                 {"n_chars": {"not": {"range": [200, 2000]}}},
                 {"n_chars": {"range": [None, 900]}}, None):
        assert a.search_rows(qs, filters=filt) == \
            b.search_rows(qs, filters=filt), filt
    assert a.search_rows(qs) == b.search_rows(qs)


def test_range_backfill_serves_binned_histograms(spark, rbf_setup):
    """range_counts works the moment meta commits — same bins as the
    build-time twin."""
    from donkey_spark.plans.facet_counts import range_counts
    from donkey_spark.plans.query import Index
    plain, built, _ = rbf_setup
    a = {(r["bin_lo"], r["bin_hi"]): r["n_docs"] for r in range_counts(
        Index(spark, plain), "def return", "n_chars", shift=8).collect()}
    b = {(r["bin_lo"], r["bin_hi"]): r["n_docs"] for r in range_counts(
        Index(spark, built), "def return", "n_chars", shift=8).collect()}
    assert a == b and sum(a.values()) > 0


def test_range_backfill_from_docs_column_and_validation(spark, tmp_path):
    """values=None takes the column from the docs table (dl is the
    numeric column docs always stores); build-time columns refuse a
    refresh; NULL/uncastable values index nothing (NOT admits them)."""
    from donkey_spark.plans.add_facet import add_range_facet
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    pdf = gen_corpus(80, seed=27)
    out = str(tmp_path / "rdl")
    build_index(spark, spark.createDataFrame(pdf), out, range_size=64)
    add_range_facet(spark, out, "dl")
    idx = Index(spark, out)
    assert idx.range_facets == ("dl",)
    docs = {r["doc_id"]: r["dl"] for r in
            spark.read.parquet(f"{out}/docs").collect()}
    n = idx.n_docs
    full = idx.search_rows([(0, "def return", n)])
    want = [r[2] for r in full if 50 <= docs[r[2]] <= 300]
    got = [r[2] for r in idx.search_rows(
        [(0, "def return", n)], filters={"dl": {"range": [50, 300]}})]
    assert got == want and 0 < len(got) < len(full)
    # a build-time range facet cannot be refreshed from metadata alone
    rich = spark.createDataFrame(pdf).withColumn(
        "n_chars", F.length("content"))
    out2 = str(tmp_path / "rbuilt")
    build_index(spark, rich, out2, range_size=64,
                range_facets=("n_chars",))
    with pytest.raises(ValueError, match="already indexed by"):
        add_range_facet(spark, out2, "n_chars")
    # NULL values index nothing; the NOT filter admits those docs
    third = spark.read.parquet(f"{out}/docs").select(
        "doc_id", F.when(F.col("doc_id") % 3 == 0,
                         F.col("dl")).alias("value"))
    add_range_facet(spark, out, "dl3", values=third)
    got3 = {r[2] for r in Index(spark, out).search_rows(
        [(0, "def return", n)],
        filters={"dl3": {"not": {"range": [0, 10**9]}}})}
    assert got3 == {r[2] for r in full if r[2] % 3 != 0}
    # all-null backfills raise before writing anything
    import os
    nulls = spark.read.parquet(f"{out}/docs").select(
        "doc_id", F.lit(None).cast("long").alias("value"))
    with pytest.raises(ValueError, match="no non-null"):
        add_range_facet(spark, out, "nope", values=nulls)
    assert not os.path.exists(f"{out}/segments/chunk=rfacet_nope")


def test_mid_stream_range_backfill_survives_next_epoch(spark, tmp_path):
    """The memo merge covers range facets too: a range column
    backfilled between micro-batches survives the next epoch's meta
    rewrite, and later epochs index it inline when the batch carries
    it."""
    from donkey_spark.plans.add_facet import add_range_facet
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    from donkey_spark.streaming.ingest import _append_epoch
    pdf = gen_corpus(60, seed=31)
    out = str(tmp_path / "rmid")
    build_index(spark, spark.createDataFrame(pdf.iloc[:40]), out,
                range_size=64)
    memo: dict = {}
    _append_epoch(spark.createDataFrame(pdf.iloc[40:50]), 0, out,
                  "varint", 128, memo=memo)
    vals = spark.read.parquet(f"{out}/docs").select(
        "doc_id", F.col("dl").alias("value"))
    add_range_facet(spark, out, "size", values=vals)  # mid-stream
    assert Index(spark, out).range_facets == ("size",)
    nxt = spark.createDataFrame(pdf.iloc[50:]).withColumn(
        "size", F.lit(10**6))              # epoch carries the column
    _append_epoch(nxt, 1, out, "varint", 128, memo=memo)
    idx = Index(spark, out)
    assert idx.range_facets == ("size",), "stale memo erased the backfill"
    n = idx.n_docs
    got = {r[2] for r in idx.search_rows(
        [(0, "def return", n)],
        filters={"size": {"range": [10**6, 10**6]}})}
    # exactly epoch 1's docs carry the sentinel value — indexed INLINE
    epoch1 = {r["doc_id"] for r in spark.read.parquet(f"{out}/docs")
              .where(F.col("chunk") == "stream1").collect()}
    full = {r[2] for r in idx.search_rows([(0, "def return", n)])}
    assert got == (epoch1 & full) and got


def test_facet_kinds_are_mutually_exclusive(spark, tmp_path):
    """A column is ONE kind of facet: add_range_facet refuses an
    equality-facet column, add_facet refuses a range-facet column —
    otherwise reconcile_meta would commit a meta where BOTH histogram
    surfaces reject the column and a streaming epoch carrying it
    projects it twice (ambiguous-column analysis error). Also: an
    index whose meta PREDATES range facets (no range_step column)
    must backfill with the default step, not crash with KeyError."""
    from donkey_spark.operators.ranges import RANGE_STEP
    from donkey_spark.plans.add_facet import add_facet, add_range_facet
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    pdf = gen_corpus(100, seed=29)
    corpus = spark.createDataFrame(pdf)
    rich = corpus.withColumn("n_chars", F.length("content"))
    out = str(tmp_path / "both")
    build_index(spark, rich, out, range_size=64, facets=("lang",),
                range_facets=("n_chars",))
    docs = spark.read.parquet(f"{out}/docs")
    svals = docs.select("doc_id", F.lit("x").alias("value"))
    nvals = docs.select("doc_id", F.col("dl").alias("value"))
    with pytest.raises(ValueError, match="EQUALITY facet"):
        add_range_facet(spark, out, "lang", values=nvals)
    with pytest.raises(ValueError, match="RANGE facet"):
        add_facet(spark, out, "n_chars", values=svals)
    # the build entry point refuses the dual registration BEFORE work
    with pytest.raises(ValueError, match="one kind of facet"):
        build_index(spark, rich, str(tmp_path / "dual"), range_size=64,
                    facets=("n_chars",), range_facets=("n_chars",))
    # pre-range-facet meta: simulate by dropping range_step from meta
    old = str(tmp_path / "old")
    build_index(spark, corpus, old, range_size=64)
    meta = spark.read.parquet(f"{old}/meta").drop(
        "range_step", "range_facets").toPandas()
    spark.createDataFrame(meta).coalesce(1).write.mode("overwrite") \
        .parquet(f"{old}/meta")
    vals = spark.read.parquet(f"{old}/docs").select(
        "doc_id", F.col("dl").alias("value"))
    add_range_facet(spark, old, "dl", values=vals)   # no KeyError
    idx = Index(spark, old)
    assert idx.range_facets == ("dl",) and idx.range_step == RANGE_STEP
    n = idx.n_docs
    got = {r[2] for r in idx.search_rows(
        [(0, "def return", n)], filters={"dl": {"range": [1, 10**9]}})}
    assert got == {r[2] for r in idx.search_rows([(0, "def return", n)])}
