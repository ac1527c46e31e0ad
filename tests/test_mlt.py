"""More-like-this tests (plans/mlt.py). The end-to-end pair is
DuckDB-checked by the ``more_like_this`` contract entry; these cover
term selection against a transparent python oracle and the exclusion /
degenerate paths."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    from donkey_spark.sources import documents_as_corpus
    out = str(tmp_path_factory.mktemp("mlt") / "idx")
    build_index(spark, documents_as_corpus(spark, SF), out)
    return Index(spark, out)


def test_mlt_terms_match_python_oracle(spark, idx):
    """Selection = top max_terms by round(tf·log1p((n−df+.5)/(df+.5)),9)
    with term-asc ties, df>0 only — recomputed here from the corpus."""
    from donkey_spark.functions.tokenize import tokenize_py
    from donkey_spark.plans.mlt import mlt_terms
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    text = docs.where(F.col("doc_id") == 7).collect()[0]["text"]
    # corpus df oracle
    rows = docs.select("text").collect()
    df = Counter()
    for r in rows:
        df.update(set(tokenize_py(r["text"])))
    n = len(rows)
    tf = Counter(tokenize_py(text))
    want = sorted(
        ((-round(c * math.log1p((n - df[t] + 0.5) / (df[t] + 0.5)), 9), t)
         for t, c in tf.items() if df[t] > 0))
    for m in (1, 4, 8):
        assert mlt_terms(idx, text, max_terms=m) == [t for _, t in want[:m]]
    assert mlt_terms(idx, "", max_terms=8) == []
    assert mlt_terms(idx, "zz_oov_token", max_terms=8) == []  # df=0 dropped


def test_more_like_this_excludes_seed_and_ranks(spark, idx):
    from donkey_spark.plans.mlt import more_like_this
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    text = docs.where(F.col("doc_id") == 7).collect()[0]["text"]
    dense = (spark.read.parquet(f"{idx.dir}/docs")
             .where(F.col("path") == "doc/7").collect()[0]["doc_id"])
    with_seed = more_like_this(idx, text, k=10).collect()
    # the seed is its own best match when not excluded
    assert with_seed[0]["doc_id"] == dense and with_seed[0]["rank"] == 1
    without = more_like_this(idx, text, k=10,
                             exclude_doc_id=int(dense)).collect()
    assert len(without) == 10
    assert dense not in [r["doc_id"] for r in without]
    # exclusion drops exactly the seed: the survivor list is the
    # unexcluded ranking minus the seed, re-ranked 1..k
    kept = [(r["doc_id"], r["score"]) for r in with_seed
            if r["doc_id"] != dense]
    assert [(r["doc_id"], r["score"]) for r in without][:len(kept)] == kept
    assert [r["rank"] for r in without] == list(range(1, 11))
    # OOV-only seed text retrieves nothing
    assert more_like_this(idx, "zz_oov_token", k=5).count() == 0
