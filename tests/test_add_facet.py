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
    with pytest.raises(ValueError, match="already indexed"):
        add_facet(spark, out, "parity", values=vals)
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
    assert info["epoch"] == 0
    idx = Index(spark, out)
    langs = sorted(set(newrows["lang"]))
    hits = idx.search_rows([(0, "backfill_epoch_marker", 50)],
                           filters={"lang": langs})
    assert len(hits) == len(newrows)     # every new doc carries the facet
    assert idx.n_docs == 150 + 8         # journal totals stayed exact
